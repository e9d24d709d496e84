package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interleaved same-JVM A/B for text_lm_score's occ materialization
  * (r12 verdict item 4: re-run the decomposition on the POST-kernel
  * path and name the next dominant term). The r13 run of this tool
  * measured share-less at −40% task CPU and the share was DROPPED
  * from the committed lmScore — so the roles here are now REVERSED
  * relative to that archived run (r13 review fix: after the flip the
  * old variant pair compared the committed plan against itself):
  *
  * COMMITTED (share-less, what `text_lm_score` runs today): bg is
  * recomputed by each consumer — kernel map pass ×2, one fused job,
  * no checkpoint serialize/deserialize.
  * CANDIDATE S (re-add the share): occ = Lineage.share(pre-reduced
  * (doc, bh) aggregate); LM and scoring both consume the checkpoint.
  * This is the PRE-kernel winner (r9: ~20% wall when the tokenize
  * pass was string-built and dominant) and the r13 loser; keeping it
  * runnable means the pinned decision stays reproducible on any box.
  */
object DevLmExp {
  private def committed(s: SparkSession, d: String): DataFrame =
    ext.TextAnalysis.queries("text_lm_score")(s, d)

  private def withShare(s0: SparkSession, d: String): DataFrame = {
    val s = GraftSession.noAqe(s0, d)
    import s.implicits._
    val bg = Tables.spread(Tables.documents(s, d))
      .select($"doc_id", explode(
        graft.functions.TextKernels.bigramHashPairs($"text")).as("b"))
      .select($"doc_id", $"b.bh".as("bh"), $"b.w1h".as("w1h"))
    val occ = Lineage.share(bg.groupBy($"doc_id", $"bh")
      .agg(count(lit(1)).as("m"), max($"w1h").as("w1h")))
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
    // identical protocol to Bench's queries_cpu column (TaskCpuMeter)
    val meter = new TaskCpuMeter(spark.sparkContext)
    def timed(fn: => DataFrame): (Double, Double) = {
      val (wall, cpu, _) = meter.timed(fn.count(): Unit)
      (wall, cpu)
    }
    val a = committed(spark, d).collect().map(_.toSeq).toSeq
    val b = withShare(spark, d).collect().map(_.toSeq).toSeq
    println(s"results identical: ${a == b} (${a.size} rows)")
    // rep-outer, variant-inner: a drift excursion spreads over both
    // variants instead of landing on one block (see DevKeywordsExp)
    val variants = Seq("committed (no share)" -> (committed _),
      "candidate S (share occ)" -> (withShare _))
    val samples = (1 to 5).map { _ =>
      variants.map { case (n, f) => n -> timed(f(spark, d)) }
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    variants.foreach { case (n, _) =>
      val ts = samples.map(_.find(_._1 == n).get._2)
      println(f"$n%-24s median wall ${med(ts.map(_._1))}%.3f s  task-cpu ${med(ts.map(_._2))}%.3f s")
    }
    spark.stop()
  }
}
