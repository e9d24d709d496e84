package graft

import scala.util.control.NonFatal

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // Warm-up: touch every table once so the first timed query doesn't
    // absorb file-listing/footer-reading costs.
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case NonFatal(_) => () }
    }
    // Each query runs once untimed (whole-stage-codegen compilation is a
    // one-off driver cost, irrelevant at scale), then once timed.
    // Failed queries report -1 in the per-query map and are excluded
    // from the headline total; fatal JVM errors abort the run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).count()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          name -> -1.0
      }
    }
    import GraftSession.jsonEscape
    val qs = results.map { case (k, v) => s"${jsonEscape(k)}:$v" }
      .mkString("{", ",", "}")
    val failures = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":${jsonEscape(sfDir)}}""")
    spark.stop()
    if (failures == results.size && results.nonEmpty) sys.exit(1)
  }
}
