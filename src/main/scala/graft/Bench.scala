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
    // Three timed iterations per query: run 1 is COLD (includes codegen
    // compilation and scan warmup — the one-off driver costs), run 3 is
    // STEADY STATE (what scales with data). The headline total and the
    // `queries` map carry steady numbers — same post-warm semantics as
    // earlier rounds, so totals stay comparable — and `queries_cold`
    // rides along so cold/steady drift is attributable per query.
    // Failed queries report -1 and are excluded from totals; fatal JVM
    // errors abort the run.
    // dev knob: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset (iteration)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      try {
        def timed(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = timed()
        timed()
        val steady = timed()
        name -> (cold, steady)
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          name -> (-1.0, -1.0)
      }
    }
    // Per-job scheduling floor: the fixed cost of ANY Spark action in
    // this JVM (job submit, task scheduling, result fetch) — the
    // constant that dominates sub-second queries vs embedded DuckDB
    // and amortizes to zero at real scale. Median of 5 trivial jobs.
    val floor = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0, 32, 1, 32).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(2)
    }
    import GraftSession.jsonEscape
    def jsonMap(sel: ((Double, Double)) => Double): String =
      results.map { case (k, v) => s"${jsonEscape(k)}:${sel(v)}" }.mkString("{", ",", "}")
    val failures = results.count(_._2._2 < 0)
    val total = results.map(_._2._2).filter(_ >= 0).sum
    val totalCold = results.map(_._2._1).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(_._2)},"queries_cold":${jsonMap(_._1)},"total_cold":$totalCold,"floor_sec":$floor,"failures":$failures,"sf":${jsonEscape(sfDir)}}"""
    println(json)
    // The stdout line is the driver contract, but captured tails have
    // truncated it before (round 2's per-query map was cut mid-stream):
    // persist the full artifact to a file alongside stdout.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), json + "\n")
    catch { case NonFatal(e) => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
    if (failures == results.size && results.nonEmpty) sys.exit(1)
  }
}
