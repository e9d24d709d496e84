package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. At 100 TB these
  * become multi-file partitioned datasets; `spark.read.parquet(dir)`
  * handles both shapes, and all downstream code treats the result as an
  * ordinary distributed DataFrame (no single-file assumptions).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-relation cache: `spark.read.parquet` pays file listing +
  // parquet footer schema inference on EVERY call (~100ms/table on this
  // box — measured as the dominant share of each sub-second query's wall
  // clock, since a query builds 2-5 tables). The test tables are
  // immutable driver-provided inputs, so resolving each (session, dir,
  // table) once and reusing the analyzed relation is exactly what a real
  // engine's catalog metadata cache does; the DataFrame is immutable and
  // every downstream query plans against it unchanged.
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  // Entries for stopped sessions would otherwise pin the session and its
  // analyzed plans for the JVM lifetime (test suites create many
  // sessions). Swept on every cache MISS — misses are one-per-table
  // post-warmup and the sweep is a driver-side O(entries) scan.
  private def sweepStopped(): Unit = {
    relCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    registeredDir.keySet.removeIf(s => s.sparkContext.isStopped)
  }

  /** Drop cached relations (and view registrations) for `dir` — the
    * hook for any path that rewrites a source table in place, which
    * would otherwise keep serving the stale file listing. */
  def invalidate(dir: String): Unit = {
    relCache.keySet.removeIf(k => k._2 == dir)
    registeredDir.entrySet.removeIf(e => e.getValue == dir)
  }

  /** Cheap content fingerprint of one table dir (file names + lengths
    * + mtimes, order-independent): the memo-key ingredient for any
    * driver-side cache derived from table CONTENT (BPE rules, the
    * sourceOverlap dim) — a process that regenerates a dataset dir IN
    * PLACE (DevScaleUp rewriting a /tmp replica at a different factor)
    * must get fresh derived state, not a silently stale memo hit. */
  def tableFingerprint(sfDir: String, table: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles() match {
        case null => 0L
        case fs => fs.foldLeft(0L)((acc, c) => acc ^ walk(c))
      }
      else f.getName.hashCode.toLong * 1000003L ^
        f.length() * 31L ^ f.lastModified()
    walk(new java.io.File(sfDir, s"$table.parquet"))
  }

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    relCache.computeIfAbsent((spark, sfDir, table), _ => {
      sweepStopped()
      spark.read.parquet(s"$sfDir/$table.parquet")
    })

  /** Pre-fan-out spread (shared by the explode-heavy text/dedup
    * pipelines): stages that multiply their input ~100× (shingles,
    * bigrams, rolling windows) are CPU-bound on hashing and need at
    * least cluster-width parallelism, but a small parquet file arrives
    * as ONE scan partition (single row group), serializing the whole
    * fan-out on one thread. Repartitioning the pre-explode rows costs
    * an input-sized shuffle and buys cluster-wide compute. No-op when
    * the scan is already at least cluster-wide — at 100 TB (thousands
    * of scan partitions) no shuffle is added. */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * and we rebuild a µs-precision NTZ timestamp here (the data has no
    * sub-µs component; matches what DuckDB reads natively). */
  def events(s: SparkSession, d: String): DataFrame =
    eventsTimestamps(load(s, d, "events"))

  /** Rebuild the µs NTZ timestamp from the raw nanos long. Split out so
    * callers can filter the RAW `ts` first — a predicate on the derived
    * column cannot reach the parquet scan, one on the raw long can
    * (see Relational.incrementalFilter). */
  def eventsTimestamps(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` mirrors the DuckDB
    * oracle's naming exactly (`events` gets its rebuilt µs timestamp). */
  // One registration per (session, dir): temp views persist in the
  // session, and re-registering re-lists files + re-reads 10 parquet
  // footers of driver-side work per query — at sf0.1 that was most of
  // each sql_* query's wall clock. Re-registers when the dir changes
  // (specs hop between SFs in one session).
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.put(spark, sfDir) != sfDir)
      names.foreach { n =>
        val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
        df.createOrReplaceTempView(n)
      }
}
