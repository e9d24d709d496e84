package graft

import org.apache.spark.sql.functions._

/** Dev: volume decomposition of the word-3-gram shingle family at any
  * sf dir — the `DevSpanCounts` recipe applied to the jaccard/
  * containment pipeline (r9 verdict item 2: attribute the measured
  * 50×→100× wall superlinearity to candidate-pair VOLUME or prove the
  * volume linear and look elsewhere). Prints, per corpus: shingle
  * occurrence rows, distinct shingle hashes, max df, the blocking
  * join's exact output volume Σ df·(df−1)/2, and the pair-aggregate's
  * output rows (distinct sharing doc pairs).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.DevShingleCounts <sfDir>"
  */
object DevShingleCounts {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = GraftSession.build("graft-shinglecounts")
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    println(s"docs=${docs.count()}")
    val sh = Tables.spread(docs.select($"doc_id", $"text"))
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"doc_id", explode(expr(
        "array_distinct(transform(sequence(1, size(ws)-2), " +
          "i -> xxhash64(concat_ws(' ', element_at(ws,i), element_at(ws,i+1), element_at(ws,i+2)))))"))
        .as("shash"))
    val df = sh.groupBy($"shash").agg(count(lit(1)).as("df"))
      .agg(sum($"df").as("rows"), count(lit(1)).as("distinct_sh"),
        max($"df").as("max_df"),
        sum(expr("df * (df - 1) div 2")).as("join_pairs")).head
    println(s"shingle_rows=${df.getLong(0)} distinct=${df.getLong(1)} " +
      s"max_df=${df.getLong(2)} join_pairs=${df.getLong(3)}")
    val pairAgg = sh.as("a").hint("shuffle_hash").join(sh.as("b"),
        col("a.shash") === col("b.shash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
      .count()
    println(s"pair_agg_rows=$pairAgg")
    spark.stop()
  }
}
