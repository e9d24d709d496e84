package graft

/** Dev micro-bench: `Lineage.cut` checkpoint storage level for the
  * iterative graph family (VERDICT r13 item 4 — the GC term of the
  * loop checkpoints), interleaved in one JVM with Bench-identical
  * hygiene + TaskCpuMeter so box drift can't masquerade as a win.
  *
  * Shapes (flipped per rep via the `graft.cutLevel` runtime conf that
  * Lineage.cut reads before the env knob):
  *   A  committed default: plain localCheckpoint at dataFactor 1
  *      (MEMORY_AND_DISK **deserialized** — every row a heap object),
  *      DISK_ONLY past the 512 MB probe point.
  *   B  MEMORY_AND_DISK_SER: serialized in-heap blocks — one byte[]
  *      per block instead of per-row objects, candidate for the GC
  *      term; pays a serialize on write + deserialize per read.
  *
  * Result identity asserted per query before any timing.
  * Usage: sbt "runMain graft.DevCutExp [sfDir] [reps] [q1,q2,...]" */
object DevCutExp {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names =
      (if (args.length > 2) args(2).split(",").toSeq
       else Seq("rel_pagerank", "rel_bfs_hops", "rel_triangle_count",
         "dedup_clusters")).filter(SparkEntry.queries.contains)
    val spark = GraftSession.build("graft-cutexp")
    Tables.lineitem(spark, d).count()
    val meter = new TaskCpuMeter(spark.sparkContext)

    def hygiene(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    def withLevel[T](lvl: String)(f: => T): T = {
      spark.conf.set("graft.cutLevel", lvl)
      try f finally spark.conf.set("graft.cutLevel", "")
    }

    for (q <- names) {
      val a = withLevel("")(SparkEntry.queries(q)(spark, d).collect().toSeq)
      hygiene()
      val b = withLevel("MEMORY_AND_DISK_SER")(
        SparkEntry.queries(q)(spark, d).collect().toSeq)
      hygiene()
      require(a == b, s"RESULT MISMATCH on $q")
      println(s"identity OK: $q (${a.length} rows)")
    }
    for (r <- 1 to reps; (tag, lvl) <- Seq(
        "A default" -> "", "B memdisk_ser" -> "MEMORY_AND_DISK_SER")) {
      for (q <- names) {
        val (w, c, g) = withLevel(lvl)(
          meter.timed(SparkEntry.queries(q)(spark, d).count(): Unit))
        println(f"rep $r $tag $q: wall $w%.3f s  cpu $c%.3f s  gc $g%.3f s")
        hygiene()
      }
    }
    spark.stop()
  }
}
