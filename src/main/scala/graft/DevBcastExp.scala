package graft

/** Dev micro-bench: the data-tiered broadcast threshold's crossing and
  * cost rows, interleaved in ONE JVM at the 100× replica so box drift
  * cannot masquerade as the win (the two full-board arms ran on
  * different control states; this is the clean per-query read).
  * `spark.sql.autoBroadcastJoinThreshold` is a runtime conf, so arms
  * flip per rep in-session:
  *   A  10 MB (Spark's default — the r13-committed behavior)
  *   B  64 MB (the r14 shipped default at dataFactor > 1)
  * Result identity asserted per query before any timing.
  * Usage: sbt "runMain graft.DevBcastExp [sfDir] [reps] [q1,q2,...]" */
object DevBcastExp {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names =
      (if (args.length > 2) args(2).split(",").toSeq
       else Seq("rel_join_anti", "rel_join_semi", "rel_setops",
         "scd2_time_travel", "rel_nation_revenue", "rel_trade_volume",
         "rel_late_lines", "rel_market_share", "rel_min_cost_supplier"))
        .filter(SparkEntry.queries.contains)
    val spark = GraftSession.build("graft-bcastexp")
    Tables.lineitem(spark, d).count()
    val meter = new TaskCpuMeter(spark.sparkContext)

    def hygiene(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    def withMb[T](mb: Int)(f: => T): T = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", s"${mb}m")
      f
    }

    for (q <- names) {
      val a = withMb(10)(SparkEntry.queries(q)(spark, d).collect().toSeq)
      hygiene()
      val b = withMb(64)(SparkEntry.queries(q)(spark, d).collect().toSeq)
      hygiene()
      require(a == b, s"RESULT MISMATCH on $q")
      println(s"identity OK: $q (${a.length} rows)")
    }
    for (r <- 1 to reps; (tag, mb) <- Seq("A 10mb" -> 10, "B 64mb" -> 64)) {
      for (q <- names) {
        val (w, c, g) = withMb(mb)(
          meter.timed(SparkEntry.queries(q)(spark, d).count(): Unit))
        println(f"rep $r $tag $q: wall $w%.3f s  cpu $c%.3f s  gc $g%.3f s")
        hygiene()
      }
    }
    spark.stop()
  }
}
