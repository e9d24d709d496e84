package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables — the CO-LOCATION half of the join story
  * (SURVEY §7.4: "broadcast small dims, bucket the recurring big⋈big
  * key"). Writing both fact tables bucketed+sorted by the join key
  * means every subsequent join on that key plans with ZERO exchanges
  * on either side: at 100 TB the shuffle that dominates a big join is
  * paid once at layout time and amortized over every downstream query
  * (the Hive/Iceberg bucketed-join contract, Spark-native datasource
  * bucketing here).
  *
  * The write itself hash-distributes rows into `buckets` files per
  * partition by `key` (Spark's HashPartitioning — the same function
  * the join's Exchange would use, which is WHY the scan satisfies the
  * join's required distribution), with an optional in-bucket sort
  * that lets sort-merge join skip its sorts too.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  /** Equi-join of two bucketed tables on their bucket key — plans
    * exchange-free when both sides share the bucket count. */
  def bucketedJoin(s: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    s.table(left).join(s.table(right), key)
}
