package graft

/** Dev micro-bench: rel_triangle_count session shapes, interleaved in
  * one JVM with Bench-identical hygiene + TaskCpuMeter (the r12
  * lesson: box drift must not masquerade as a win). Result identity
  * asserted before any timing.
  *
  * The r14 DevProfile decomposition shows the wall is NOT compute:
  * 2.67 s wall = 16 jobs, 2.12 s of barrier+sched (AQE materializes
  * every exchange as its own job; ~0.13 s/job floor on this box) over
  * 5.96 s of task time with zero spill. Triangle counting is a FIXED
  * join/aggregate cascade over uniformly-hashed keys (degree
  * orientation bounds outdeg ≤ √(2m), so no skew for AQE to fix and
  * no data-dependent join-strategy choice — every join is hinted
  * `merge` precisely so the plan is scale-stable) — the same shape
  * class where the shingle family measured noAqe as a win, unlike
  * pagerank whose ITERATION joins need AQE's runtime stats.
  *
  *   A  committed through r13: parent session (AQE on).
  *   B  candidate: the noAqe child (static data-sized width, one job
  *      per action instead of one per exchange).
  *
  * Usage: sbt "runMain graft.DevTriangleExp [sfDir] [reps]" */
object DevTriangleExp {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.build("graft-triexp")
    Tables.lineitem(spark, d).count()
    val meter = new TaskCpuMeter(spark.sparkContext)

    def shapeA() = SparkEntry.queries("rel_triangle_count")(spark, d)
    def shapeB() = SparkEntry.queries("rel_triangle_count")(
      GraftSession.noAqe(spark, d), d)

    val a = shapeA().collect().toSeq
    val b = shapeB().collect().toSeq
    require(a == b, s"RESULT MISMATCH: A=$a B=$b")
    println(s"identity OK: ${a.length} rows: $a")

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
