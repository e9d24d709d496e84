package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interleaved same-JVM A/B for text_lm_score's occ materialization
  * (r12 verdict item 4: re-run the decomposition on the POST-kernel
  * path and name the next dominant term). DevProfile post-kernel says
  * the occ reduce + localCheckpoint stage is now the largest (0.68 of
  * 1.29 s runTime at 4-core sf0.1) — the r9 measurement that pinned
  * materialize-wins (~20% wall) predates the BigramHashPairs kernel,
  * which halved the tokenize pass the materialization exists to avoid
  * re-running. This experiment re-litigates that trade post-kernel:
  *
  * COMMITTED: occ = Lineage.share(pre-reduced (doc, bh) aggregate);
  * LM and scoring both consume the checkpoint.
  * CANDIDATE N (no share): identical plan minus the share — bg is
  * recomputed by each consumer (tokenize+hash ×2, no checkpoint
  * serialize/deserialize, one fused job).
  */
object DevLmExp {
  private def committed(s: SparkSession, d: String): DataFrame =
    ext.TextAnalysis.queries("text_lm_score")(s, d)

  private def noShare(s0: SparkSession, d: String): DataFrame = {
    val s = GraftSession.noAqe(s0, d)
    import s.implicits._
    val bg = Tables.spread(Tables.documents(s, d))
      .select($"doc_id", explode(
        graft.functions.TextKernels.bigramHashPairs($"text")).as("b"))
      .select($"doc_id", $"b.bh".as("bh"), $"b.w1h".as("w1h"))
    val occ = bg.groupBy($"doc_id", $"bh")
      .agg(count(lit(1)).as("m"), max($"w1h").as("w1h"))
    val lm = occ.groupBy($"bh")
      .agg(sum($"m").as("c"), max($"w1h").as("w1h2"))
      .withColumn("cw", sum($"c").over(Window.partitionBy($"w1h2")))
      .select($"bh", expr("c * 1000000 div cw").as("p6"))
    occ.select($"doc_id", $"bh", $"m")
      .join(lm, "bh")
      .groupBy($"doc_id")
      .agg(sum($"m").as("n_bigrams"), sum($"m" * $"p6").as("sum_p6"))
      .select($"doc_id", $"n_bigrams", $"sum_p6",
        expr("sum_p6 div n_bigrams").as("avg_p6"))
      .orderBy($"doc_id")
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-lm-exp")
    Tables.documents(spark, d).count()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          cpuNs.addAndGet(s.stageInfo.taskMetrics.executorCpuTime): Unit
      })
    def timed(fn: => DataFrame): (Double, Double) = {
      org.apache.spark.GraftSchedulerBridge.drainListenerBus(spark.sparkContext)
      val c0 = cpuNs.get()
      val t0 = System.nanoTime(); fn.count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSchedulerBridge.drainListenerBus(spark.sparkContext)
      (wall, (cpuNs.get() - c0) / 1e9)
    }
    val a = committed(spark, d).collect().map(_.toSeq).toSeq
    val b = noShare(spark, d).collect().map(_.toSeq).toSeq
    println(s"results identical: ${a == b} (${a.size} rows)")
    val reps = Seq("committed (share occ)" -> (committed _),
      "candidate N (no share)" -> (noShare _)).map { case (n, f) =>
      n -> (1 to 5).map(_ => timed(f(spark, d)))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    reps.foreach { case (n, ts) =>
      println(f"$n%-24s median wall ${med(ts.map(_._1))}%.3f s  task-cpu ${med(ts.map(_._2))}%.3f s")
    }
    spark.stop()
  }
}
