package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev micro-bench: rel_late_suppliers (Q21) shapes, interleaved in
  * one JVM with Bench-identical hygiene + TaskCpuMeter so box drift
  * can't masquerade as a win (the r12 lesson). Result identity is
  * asserted before any timing.
  *
  *   A  committed through r13-mid: decorrelated EXISTS/NOT-EXISTS as a
  *      left-semi + left-anti self-join of the derived line table —
  *      the lineitem⋈orders subtree is planned THREE times (base,
  *      semi probe, anti probe) and the full line table shuffles for
  *      each self-reference.
  *   B  r13 candidate: both existence tests are per-ORDER set
  *      properties — one (orderkey, suppkey) pair aggregate, then an
  *      orderkey window for (n_supp, n_late_supp); EXISTS ⟺ n_supp>1,
  *      NOT-EXISTS ⟺ n_late_supp=1; numwait = Σ late_lines. One fact
  *      shuffle instead of three.
  *
  * Usage: sbt "runMain graft.DevQ21Exp [sfDir] [reps]" */
object DevQ21Exp {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.build("graft-q21exp")
    import spark.implicits._
    Tables.lineitem(spark, d).count(); Tables.orders(spark, d).count()
    Tables.supplier(spark, d).count()
    val meter = new TaskCpuMeter(spark.sparkContext)

    def l = Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(Tables.orders(spark, d).filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate".cast("date") >
          expr("cast(o_orderdate as date) + interval 90 day")).as("late"))

    def shapeA() = {
      val base = l.filter($"late")
      val multiSupp = base.as("l1").join(l.as("l2"),
        col("l2.l_orderkey") === col("l1.l_orderkey") &&
          col("l2.l_suppkey") =!= col("l1.l_suppkey"), "left_semi")
      val soleLate = multiSupp.as("l1").join(base.as("l3"),
        col("l3.l_orderkey") === col("l1.l_orderkey") &&
          col("l3.l_suppkey") =!= col("l1.l_suppkey"), "left_anti")
      soleLate
        .join(Tables.supplier(spark, d).select($"s_suppkey", $"s_name"),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name").limit(20)
    }

    def shapeB() = SparkEntry.queries("rel_late_suppliers")(spark, d)

    // result identity, full row set, before any timing
    val a = shapeA().collect().toSeq
    val b = shapeB().collect().toSeq
    require(a == b, s"RESULT MISMATCH: A=${a.take(3)}… B=${b.take(3)}…")
    println(s"identity OK: ${a.length} rows")

    def hygiene(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    for (r <- 1 to reps) {
      for ((tag, f) <- Seq("A" -> (() => shapeA()), "B" -> (() => shapeB()))) {
        val (w, c, g) = meter.timed(f().count(): Unit)
        println(f"rep $r $tag: wall $w%.3f s  cpu $c%.3f s  gc $g%.3f s")
        hygiene()
      }
    }
    spark.stop()
  }
}
