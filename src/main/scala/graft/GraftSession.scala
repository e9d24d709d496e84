package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory: one place for the engine's Spark tuning so
  * Verify, Bench, and tests run identical configs.
  *
  * Scale stance (SURVEY §7.4.12): AQE on (runtime coalesce + skew-join),
  * shuffle partitions sized to local cores here but expected to be
  * overridden (or AQE-coalesced) on a real cluster; UTC everywhere;
  * nanos-as-long so TIMESTAMP(NANOS) parquet (events.ts) is readable.
  */
object GraftSession {
  def build(appName: String, cores: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
