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
    // compilation and scan warmup — the one-off driver costs); STEADY
    // is the MIN of the two post-warm runs — the standard steady-state
    // estimator (a single third-run sample carried transient box noise
    // straight into the headline; min of repeats measures the query,
    // not the neighbor's GC). Same post-warm semantics as earlier
    // rounds. `queries_cold` rides along so cold/steady drift is
    // attributable per query.
    // Failed queries report -1 and are excluded from totals; fatal JVM
    // errors abort the run.
    // dev knob: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset (iteration)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // Per-RUN hygiene, OUTSIDE the timed region: each build of a
      // checkpoint-bearing query pins localCheckpoint RDD blocks (and
      // broadcasts) in the shared BlockManager; across 93 queries × 3
      // runs that storage accrues until later runs pay eviction/GC
      // storms that have nothing to do with their own plan (observed:
      // a 1 s query measuring 78 s late in the pass; and with a single
      // end-of-query sweep, a checkpoint-heavy query's own runs 2-3
      // inherited run 1's pinned blocks — steady 5.5 s > cold 2.5 s).
      // Sweeping BETWEEN runs gives every run the identical clean
      // starting state, so steady ≤ cold structurally. blocking=true so
      // the eviction can't race into the next timed region; safe —
      // every timed() builds a fresh plan, nothing references the
      // previous run's RDDs.
      def hygiene(): Unit = {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
      }
      try {
        def timed(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = timed()
        hygiene()
        val s1 = timed()
        hygiene()
        val s2 = timed()
        val steady = math.min(s1, s2)
        if (steady > cold * 1.2)
          System.err.println(f"[bench] $name anomaly: steady $steady%.3f > cold $cold%.3f x1.2 — box noise or state leak")
        name -> (cold, steady)
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          name -> (-1.0, -1.0)
      } finally hygiene()
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
    // Box-state controls (r10 verdict item 7): fixed-shape jobs in
    // never-touched code — every bench/soak artifact self-reports
    // whether the box (and core count) matched the recorded bands, so
    // host drift is attributable without a worktree A/B. Measured
    // AFTER the board so they can't warm anything the queries use.
    val controls = BoxControls.measure(spark)
    import GraftSession.jsonEscape
    def jsonMap(sel: ((Double, Double)) => Double): String =
      results.map { case (k, v) => s"${jsonEscape(k)}:${sel(v)}" }.mkString("{", ",", "}")
    val failures = results.count(_._2._2 < 0)
    val total = results.map(_._2._2).filter(_ >= 0).sum
    val totalCold = results.map(_._2._1).filter(_ >= 0).sum
    // Full-precision artifact (cold + steady per query) goes to a file;
    // see below for why stdout gets a trimmed twin.
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(_._2)},"queries_cold":${jsonMap(_._1)},"total_cold":$totalCold,"floor_sec":$floor,"controls":${BoxControls.json(controls)},"failures":$failures,"sf":${jsonEscape(sfDir)}}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), fullJson + "\n")
    catch { case NonFatal(e) => System.err.println(s"[bench] file write failed: $e") }
    // The stdout line is the driver contract, but the driver keeps only
    // the LAST ~2000 chars of output: rounds 1-3 all recorded
    // `parsed: null` because the full-precision line outgrew that
    // window. stdout therefore carries a compact twin — steady values
    // at ms precision, cold map file-only — and if the per-query map
    // STILL doesn't fit the budget, it keeps the slowest queries (the
    // informative ones) and says how many were omitted. Never truncated
    // mid-token: the line is always valid JSON.
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString // locale-safe, sheds trailing zeros
    def compactLine(qs: Seq[(String, Double)], omitted: Int): String = {
      val m = qs.map { case (k, v) => s"${jsonEscape(k)}:${ms(v)}" }.mkString("{", ",", "}")
      val omit = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      // basename only: the full sfDir path is in the file artifact, and an
      // arbitrarily long path here could push even the zero-query fallback
      // line past the budget, breaking the always-valid-JSON guarantee.
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$m$omit,"floor_sec":${ms(floor)},"controls":${BoxControls.json(controls)},"failures":$failures,"sf":${jsonEscape(new java.io.File(sfDir).getName)}}"""
    }
    val budget = 1900 // chars; driver tail window is 2000 and this line is last — leave slack
    val steady = results.map { case (k, v) => k -> v._2 }
    val line = {
      val all = compactLine(steady, 0)
      if (all.length <= budget) all
      else {
        val bySlow = steady.sortBy(-_._2)
        // largest prefix of slowest queries that fits the budget
        val fitted = (bySlow.length to 1 by -1).iterator
          .map(n => compactLine(bySlow.take(n).sortBy(_._1), bySlow.length - n))
          .find(_.length <= budget)
        fitted.getOrElse(compactLine(Nil, bySlow.length))
      }
    }
    println(line)
    spark.stop()
    if (failures == results.size && results.nonEmpty) sys.exit(1)
  }
}
