package graft

import org.apache.spark.sql.functions._

/** Dev micro-bench: DECIMAL(18,4) vs 10⁴-scaled-LONG vs raw-double
  * aggregation cost on the lineitem quantity rollup — the evidence
  * behind rel_big_orders' integer-grid sum (steady, 4 cores, sf0.1:
  * decimal ~1.0 s, scaled-long ~0.60 s, double ~0.42 s; the long path
  * is exact for ≤4-decimal values, the double path is not).
  *
  * Usage: sbt "runMain graft.DevAggExp [sfDir]" */
object DevAggExp {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-aggexp")
    import spark.implicits._
    val li = Tables.lineitem(spark, d).select($"l_orderkey", $"l_quantity")
    li.count() // warm scan
    def timed(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); val n = f
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    timed("decimal")(li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("decimal(18,4)")).as("q"))
      .filter($"q" > 300).count())
    timed("scaled-long")(li.groupBy($"l_orderkey")
      .agg(sum(round($"l_quantity" * 10000).cast("long")).as("q"))
      .filter($"q" > 3000000L).count())
    timed("double")(li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q")).filter($"q" > 300).count())
    spark.stop()
  }
}
