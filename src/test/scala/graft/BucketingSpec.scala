package graft

import graft.tables.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the layout-time answer to the recurring
  * big⋈big shuffle. Pins the THREE plan facts that make bucketing the
  * 100 TB strategy: both-sides-bucketed joins are exchange-free,
  * one-side-bucketed joins exchange ONLY the unbucketed side, and the
  * results are exactly the plain join's.
  */
class BucketingSpec extends SparkSpec {

  // bucket count = the session's shuffle partitions: a one-side-
  // bucketed join only keeps the bucketed side exchange-free when the
  // planned shuffle width matches the bucket count (mismatched widths
  // reshuffle BOTH sides) — the real-world rule that bucket counts are
  // chosen together with the cluster's shuffle parallelism
  private lazy val nBuckets =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  private lazy val setup: Unit = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Bucketing.writeBucketed(o, "b_orders", "o_custkey", nBuckets)
    Bucketing.writeBucketed(c, "b_customer", "o_custkey", nBuckets)
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE: final plan only exists after execution
    // AdaptiveSparkPlan prints "== Final Plan ==" followed by
    // "== Initial Plan ==" — count operators in the FINAL section only
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("both sides bucketed on the join key: zero exchanges in the join") {
    setup
    val j = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
    val p = plan(j)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$p")
  }

  test("bucketed join result equals the plain join") {
    setup
    val bucketed = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    val plainJ = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
      .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(bucketed == plainJ && bucketed.nonEmpty)
  }

  test("one side bucketed: only the unbucketed side exchanges") {
    setup
    val raw = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      // the dim is broadcast-sized at sf0.001; force the shuffle route
      // so the pin shows WHICH side pays the exchange at fact scale
      .hint("shuffle_hash")
    val j = spark.table("b_orders").join(raw, "o_custkey")
    val p = plan(j)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly 1 exchange (the unbucketed side), got $exchanges:\n$p")
  }
}
