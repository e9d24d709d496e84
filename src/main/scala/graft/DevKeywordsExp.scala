package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interleaved same-JVM A/B for the text_keywords df-derivation shape
  * (r12: the verdict asked the keywords floor to be proven or shaved to
  * the minhash standard — this pins the plan alternatives with numbers).
  *
  * COMMITTED shape: df = unbounded COUNT window over the term-keyed
  * exchange of tf (3 tf-sized exchanges, zero joins).
  * CANDIDATE B: df = vocab-sized aggregate + broadcast hash join back
  * onto un-exchanged tf (2 tf-sized exchanges + a vocab broadcast).
  * Trades the w-keyed tf exchange for a broadcast build whose size is
  * the VOCABULARY — fine at sf0.1, the wrong dependency at 100 TB (a
  * web-corpus vocab is 10⁷-10⁸ terms; the window's state is
  * per-partition-bounded instead). MEASURED r12: 27% SLOWER.
  * CANDIDATE C (r12 verdict item 3 — the lm_score trick): tokenize to
  * xxhash64 keys at the map stage, run tf/df/the first rank cut
  * entirely HASH-KEYED (every heavy exchange carries 8-byte longs, no
  * strings), then join only the ≤3·docs-plus-ties winning (doc_id, wh)
  * rows back to term strings through a distinct (wh, w) dictionary and
  * re-rank. The committed floor pin argued the string must ride every
  * exchange because tf/df/rank all OUTPUT it; C tests the counter: it
  * only must ride the LAST one. The string tiebreak (tf desc, df asc,
  * w asc) is preserved exactly: the hash-keyed cut uses ties-preserving
  * rank() on (tf desc, df asc) — any true top-3 row has at most 2 rows
  * strictly ahead of it on the FULL order, hence at most 2 strictly
  * ahead on the (tf, df) prefix, hence rank() ≤ 3 — so the cut keeps a
  * SUPERSET of the winners, and the post-join row_number with the
  * string tiebreak runs over ~3·docs rows, not the tf table.
  * Run: alternating reps, report median wall per variant.
  */
object DevKeywordsExp {
  private def committed(s: SparkSession, d: String): DataFrame =
    ext.TextAnalysis.queries("text_keywords")(s, d)

  private def candidateB(s0: SparkSession, d: String): DataFrame = {
    val s = GraftSession.noAqe(s0, d)
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val win = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"w".asc)
    tf.join(broadcast(dfTab), "w")
      .withColumn("rank", row_number().over(win))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank".cast("int").as("rank"), $"w", $"tf", $"df")
      .orderBy($"doc_id", $"rank")
  }

  private[graft] def candidateHash(s0: SparkSession, d: String): DataFrame = {
    val s = GraftSession.noAqe(s0, d)
    import s.implicits._
    val tok = Tables.documents(s, d)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
    // every exchange below this line carries 8-byte hashes, no strings
    val tf = tok.select($"doc_id", xxhash64($"w").as("wh"))
      .groupBy($"doc_id", $"wh").agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy($"wh")))
    val cutWin = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc)
    val winners = withDf
      .withColumn("rk", rank().over(cutWin)) // ties kept: superset of top-3
      .filter($"rk" <= 3).drop("rk")
    // dictionary: map-side partial distinct collapses each partition to
    // its local vocab before the only string-bearing exchange
    val dict = tok.select(xxhash64($"w").as("wh"), $"w").distinct()
    val win = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"w".asc)
    winners.join(dict, "wh")
      .withColumn("rank", row_number().over(win))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank".cast("int").as("rank"), $"w", $"tf", $"df")
      .orderBy($"doc_id", $"rank")
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-keywords-exp")
    Tables.documents(spark, d).count()
    // wall AND task-CPU per rep (the keywords floor claim lives on the
    // per-core axis, so a candidate must be judged there too): the
    // exact protocol of Bench's queries_cpu column, via the shared
    // TaskCpuMeter.
    val meter = new TaskCpuMeter(spark.sparkContext)
    def timed(fn: => DataFrame): (Double, Double) = {
      val (wall, cpu, _) = meter.timed(fn.count(): Unit)
      (wall, cpu)
    }
    // result identity first — an A/B of different answers is meaningless
    val a = committed(spark, d).collect().map(_.toSeq).toSeq
    val b = candidateB(spark, d).collect().map(_.toSeq).toSeq
    val c = candidateHash(spark, d).collect().map(_.toSeq).toSeq
    println(s"results identical: B=${a == b} C=${a == c} (${a.size} rows)")
    // INTERLEAVED reps (rep-outer, variant-inner — r13 review: a
    // block-sequential loop lets a box-drift excursion land entirely
    // on one variant's block and fake a 20-50% plan difference; on
    // this box that failure mode is documented, so the interleaving
    // the scaladoc promises is load-bearing).
    val variants = Seq("committed (df window)" -> (committed _),
      "candidate B (broadcast)" -> (candidateB _),
      "candidate C (hash+dict)" -> (candidateHash _))
    val samples = (1 to 5).map { _ =>
      variants.map { case (n, f) => n -> timed(f(spark, d)) }
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    variants.foreach { case (n, _) =>
      val ts = samples.map(_.find(_._1 == n).get._2)
      println(f"$n%-26s median wall ${med(ts.map(_._1))}%.3f s  task-cpu ${med(ts.map(_._2))}%.3f s")
    }
    spark.stop()
  }
}
