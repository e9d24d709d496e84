package graft

import org.apache.spark.sql.functions._

/** Dev: row-count decomposition of the span pipeline at any sf dir —
  * grams, capped pairs, spans — to attribute soak-scale CPU to volume
  * vs per-row cost. Usage: sbt "runMain graft.DevSpanCounts <sfDir>" */
object DevSpanCounts {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = GraftSession.build("graft-spancounts")
    import spark.implicits._
    import org.apache.spark.sql.GraftPlanBridge
    val K = 20
    val docs = Tables.documents(spark, d)
    println(s"docs=${docs.count()} chars=${docs.agg(sum(length($"text"))).first.getLong(0)}")
    val grams = Tables.spread(docs)
      .filter(length($"text") >= K)
      .select($"doc_id", $"text",
        explode(expr(s"sequence(1, length(text) - ${K - 1})")).as("i"))
      .select($"doc_id", $"i", xxhash64(expr(s"substr(text, i, $K)")).as("h"))
    println(s"grams=${grams.count()}")
    val m = GraftPlanBridge.ofRows(spark, graft.plans.CappedPairsPlan(
      GraftPlanBridge.analyzed(
        grams.select($"h", $"doc_id", $"i".cast("long").as("i"))), 64))
    println(s"pairs=${m.count()}")
    val spans = GraftPlanBridge.ofRows(spark, graft.plans.DiagonalRunsPlan(
      GraftPlanBridge.analyzed(m), K, 30))
    println(s"spans=${spans.count()}")
    spark.stop()
  }
}
