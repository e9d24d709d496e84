package graft

import org.apache.spark.sql.functions._

/** Dev micro-bench for the substring-span pipeline's aggregation
  * shape (dedup_substring_spans / dedup_span_removal). Decomposes the
  * cost of the r8 single-shuffle CappedPairs design and A/Bs it
  * against a probe-plus-broadcast-semi-join shape that keeps the
  * corpus-sized aggregation in whole-stage codegen:
  *
  *   A  grams.count                — pure gram-generation map cost
  *   B  codegen count probe        — groupBy(h).count (Tungsten agg)
  *   C  current CappedPairs shape  — ObjectHashAggregate w/ typed buffers
  *   D  probe -> broadcast filter -> CappedPairs on survivors only
  *
  * Usage: sbt "runMain graft.DevSpanExp [sfDir]" */
object DevSpanExp {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-spanexp")
    import spark.implicits._
    val K = 20
    val DfCap = 64
    def grams = Tables.spread(Tables.documents(spark, d))
      .filter(length($"text") >= K)
      .select($"doc_id", $"text",
        explode(expr(s"sequence(1, length(text) - ${K - 1})")).as("i"))
      .select($"doc_id", $"i", xxhash64(expr(s"substr(text, i, $K)")).as("h"))
    grams.count() // warm
    def timed(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); val n = f
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    timed("A gram gen        ")(grams.count())
    timed("B codegen probe   ")(
      grams.groupBy($"h").agg(count(lit(1)).as("n"),
          min($"doc_id").as("d0"), max($"doc_id").as("d1"))
        .filter($"n".between(2, DfCap) && $"d0" =!= $"d1").count())
    val cappedPairs = udaf(new graft.functions.CappedPairs(DfCap))
    timed("C current UDAF    ")(
      grams.groupBy($"h").agg(cappedPairs($"doc_id", $"i").as("pairs"))
        .select(explode($"pairs").as("p")).count())
    timed("D probe+bcast+UDAF") {
      val dup = grams.groupBy($"h").agg(count(lit(1)).as("n"),
          min($"doc_id").as("d0"), max($"doc_id").as("d1"))
        .filter($"n".between(2, DfCap) && $"d0" =!= $"d1")
        .select($"h")
      grams.join(broadcast(dup), "h")
        .groupBy($"h").agg(cappedPairs($"doc_id", $"i").as("pairs"))
        .select(explode($"pairs").as("p")).count()
    }
    import org.apache.spark.sql.GraftColumnBridge.{column => asCol, expression => asExpr}
    def nativePairs = asCol(graft.functions.CappedPairsAgg(
      asExpr($"doc_id"), asExpr($"i".cast("long")), DfCap).toAggregateExpression())
    timed("E native agg      ")(
      grams.groupBy($"h").agg(nativePairs.as("pairs"))
        .select(explode($"pairs").as("p")).count())
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "4000000")
    timed("F native+no-fallbk")(
      grams.groupBy($"h").agg(nativePairs.as("pairs"))
        .select(explode($"pairs").as("p")).count())
    spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      spark.sparkContext.runJob(df.queryExecution.toRdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
        }).sum
    timed("G raw exchange    ")(consume(grams.repartition($"h")))
    timed("H flatMapGroups   ") {
      val ds = grams.select($"h", $"doc_id", $"i".cast("long").as("i"))
        .as[(Long, Long, Long)]
      ds.groupByKey(_._1)
        .flatMapGroups { (_, rows) =>
          val buf = new Array[Long](2 * (DfCap + 1)); var n = 0
          rows.foreach { r =>
            if (n < buf.length) { buf(n) = r._2; buf(n + 1) = r._3; n += 2 }
          }
          val k = n / 2
          if (k < 2 || k > DfCap) Iterator.empty
          else {
            val out = Seq.newBuilder[(Long, Long, Long, Long)]
            var x = 0
            while (x < k) {
              var y = 0
              while (y < k) {
                if (buf(2 * x) < buf(2 * y))
                  out += ((buf(2 * x), buf(2 * y), buf(2 * x + 1), buf(2 * y + 1)))
                y += 1
              }
              x += 1
            }
            out.result().iterator
          }
        }.count()
    }
    spark.stop()
  }
}
