package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only soak runner for the PRODUCTION operating point of the two
  * embedding pair-emitting operators (VERDICT r7 ask #3 follow-through).
  *
  * Why this exists: the GATED queries pin the algorithm at a fixed,
  * oracle-replicable parameterization (sim_neardup_lsh: minCos 0.4 with
  * 4×3-bit bands; sim_semantic_dedup: blocks = the label-count cluster
  * set). Fixed parameters are the right GATE but the wrong SOAK: banded
  * LSH candidate volume is n²/2^planes at any fixed plane count, and
  * fixed-k blocking is n²/k — both quadratic by construction once n
  * outgrows the parameterization, which the 20× perturbed replica
  * exposes (measured α 1.25 / 1.33). A production deployment scales the
  * knobs with the corpus — planesPerBand ~ log₂(n/bucketTarget) and
  * block count ~ n/blockTarget keep per-bucket occupancy CONSTANT, so
  * candidate volume is O(n) (the FAISS/Datasketch sizing rule, and
  * exactly what the operator docstrings prescribe: "raise planesPerBand
  * for bigger corpora — production: 4×16 bits").
  *
  * This runner times that production point at any replica size:
  *   - neardup_lsh_prod: [[graft.ext.Similarity.nearDupLsh]] at
  *     minCos 0.9 (the true near-dup threshold) with planesPerBand =
  *     max(3, ⌈log₂(n/64)⌉) — expected bucket occupancy ≈ 64 at every
  *     SF, so per-band candidates ≈ 32·n.
  *   - semantic_dedup_prod: the cluster-blocked pair kernel with blocks
  *     refined by sign-bit sub-buckets until a block holds ≈ 64 vectors
  *     (coarse quantizer × fine LSH — the IVF-within-cluster shape).
  *     Emits the 3 tightest pairs per refined block; sub-blocking is
  *     the documented production recall trade (a cross-sub-bucket pair
  *     is missed with prob ≤ the per-band LSH bound).
  *
  * NOT gated, NOT part of the bench board: parameters depend on the
  * corpus size, so no static oracle SQL can twin them. The gates pin
  * correctness of the identical kernels at the fixed point; this tool
  * pins the SCALING of the production point. Results land in
  * BASELINE.md next to the verbatim/perturbed fixed-point soaks.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.DevSoakProd [sfDir]"
  */
object DevSoakProd {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-soak-prod")
    import spark.implicits._
    import graft.ext.Similarity

    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val n = emb.count()
    def log2ceil(x: Double): Int = math.ceil(math.log(x) / math.log(2)).toInt

    // ---- production neardup: constant bucket occupancy ≈ 64
    val planes = sys.env.get("SPARK_GRAFT_SOAK_PLANES").flatMap(_.toIntOption)
      .getOrElse(math.max(3, log2ceil(n / 64.0)))
    def neardupProd(): DataFrame =
      Similarity.nearDupLsh(emb, minCos = 0.9, bands = 4,
        planesPerBand = planes)

    // ---- production semantic dedup: cluster blocks refined by
    // sign-bit sub-buckets to ≈ 64 vectors each
    val nClusters = Tables.embeddings(spark, sfDir)
      .select($"label").distinct().count()
    val subBits = math.max(0, log2ceil(n / (nClusters * 64.0)))
    def semanticProd(): DataFrame = {
      val subPlanes = Similarity.hyperplanesInt(math.max(subBits, 1), 64)
      val planesCol = typedLit(subPlanes)
      val qvecs = emb.select($"vec_id", expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000000d + 0.5d) as bigint))")
        .as("qv"),
        Similarity.gridVec($"embedding").as("_grid"))
      val sub: org.apache.spark.sql.Column =
        if (subBits == 0) lit(0)
        else (0 until subBits).map { p =>
          when(Similarity.dot(element_at(planesCol, p + 1), $"_grid") > 0,
            lit(1 << p)).otherwise(lit(0))
        }.reduce(_ + _)
      val va = graft.ext.Embeddings.clusterAssignments(spark, sfDir)
        .select($"vec_id", $"assigned_label".as("cluster"))
        .join(qvecs, "vec_id")
        .withColumn("sub", sub)
        .select($"cluster", $"sub", $"vec_id", $"qv")
        .localCheckpoint()
      val a = va.select($"cluster", $"sub", $"vec_id".as("a_id"), $"qv".as("qa"))
      val b = va.select($"cluster", $"sub", $"vec_id".as("b_id"), $"qv".as("qb"))
      a.join(b, Seq("cluster", "sub")).filter($"a_id" < $"b_id")
        .select($"cluster", $"sub", $"a_id", $"b_id",
          graft.functions.VectorExpressions.vecL2Sq($"qa", $"qb").as("d2"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"cluster", $"sub").orderBy($"d2", $"a_id", $"b_id")))
        .filter($"rk" <= 3)
    }

    def timed(fn: () => DataFrame): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = fn().count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val cold = once()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val s1 = once()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val s2 = once()
      (math.min(s1._1, s2._1), cold._2)
    }

    // optional candidate-volume diagnostics (arg 2 = "debug"): how many
    // pairs each production config actually verifies — the quantity the
    // constant-occupancy sizing is supposed to keep O(n)
    if (args.length > 1 && args(1) == "debug") {
      val cand = Similarity.nearDupLsh(emb, minCos = -1.0, bands = 4,
        planesPerBand = planes).count()
      println(s"""{"debug":"candidates","neardup_lsh_prod":$cand}""")
    }
    // stage isolation (arg 2 = "stages"): time the bucketing projection
    // alone vs the full pipeline, to attribute plane-count thresholds
    if (args.length > 1 && args(1) == "stages") {
      val planesCol = typedLit(Similarity.hyperplanesInt(4 * planes, 64))
      val unit = emb.withColumn("_grid", Similarity.gridVec($"embedding"))
      def bucket(b: Int) = (0 until planes).map { p =>
        val idx = b * planes + p
        when(Similarity.dot(element_at(planesCol, idx + 1), $"_grid") > 0,
          lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      val bucketed = unit.select($"vec_id" +: $"embedding" +:
        (0 until 4).map(b => bucket(b).as(s"bk$b")): _*)
      val t0 = System.nanoTime()
      bucketed.count()
      val t1 = System.nanoTime()
      bucketed.count()
      val t2 = System.nanoTime()
      println(s"""{"debug":"bucketing_sec","cold":${(t1-t0)/1e9},"steady":${(t2-t1)/1e9}}""")
      (0 until 4).foreach { bnd =>
        val hist = bucketed.groupBy(col(s"bk$bnd")).count()
          .agg(max($"count").as("mx"), expr("sum(count * count)").as("pairs2x"),
            count(lit(1)).as("nbuckets")).collect()(0)
        println(s"""{"debug":"band$bnd","max_bucket":${hist.getLong(0)},"sum_sq":${hist.getLong(1)},"n_buckets":${hist.getLong(2)}}""")
      }
      // wall vs task-time decomposition of the full pipeline (warm run)
      neardupProd().count()
      val jobWall = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      val jobs = scala.collection.mutable.Map[Int, Long]()
      var taskMs = 0L
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs(j.jobId) = j.time
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            jobWall += ((j.jobId, j.time - jobs.getOrElse(j.jobId, j.time)))
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            taskMs += s.stageInfo.taskMetrics.executorRunTime
        })
      val p0 = System.nanoTime()
      neardupProd().count()
      val pw = (System.nanoTime() - p0) / 1e9
      Thread.sleep(500)
      println(f"profile: wall $pw%.3f s, ${jobWall.size} jobs, " +
        f"sum job wall ${jobWall.map(_._2).sum / 1000.0}%.3f s, " +
        f"sum task ${taskMs / 1000.0}%.3f s")
      jobWall.sortBy(-_._2).take(8).foreach { case (id, ms) =>
        println(f"  job $id%3d wall ${ms / 1000.0}%7.3f s") }
      val q = neardupProd()
      q.count()
      println(q.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan")).mkString("\n"))
    }
    val (tN, rowsN) = timed(() => neardupProd())
    val (tS, rowsS) = timed(() => semanticProd())
    println(s"""{"sf":${GraftSession.jsonEscape(new java.io.File(sfDir).getName)},"n_vectors":$n,"planes_per_band":$planes,"sub_bits":$subBits,"queries":{"neardup_lsh_prod":{"sec":$tN,"rows":$rowsN},"semantic_dedup_prod":{"sec":$tS,"rows":$rowsS}}}""")
    spark.stop()
  }
}
