package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interleaved same-JVM A/B for the text_keywords df-derivation shape
  * (r12: the verdict asked the keywords floor to be proven or shaved to
  * the minhash standard — this pins the one remaining plan alternative
  * with numbers).
  *
  * COMMITTED shape: df = unbounded COUNT window over the term-keyed
  * exchange of tf (3 tf-sized exchanges, zero joins).
  * CANDIDATE: df = vocab-sized aggregate + broadcast hash join back
  * onto un-exchanged tf (2 tf-sized exchanges + a vocab broadcast).
  * The candidate trades the w-keyed tf exchange for a broadcast build
  * whose size is the VOCABULARY — fine at sf0.1, the wrong dependency
  * at 100 TB (a web-corpus vocab is 10⁷-10⁸ terms; the window's state
  * is per-partition-bounded instead). Run: alternating reps, report
  * median wall per variant.
  */
object DevKeywordsExp {
  private def committed(s: SparkSession, d: String): DataFrame =
    ext.TextAnalysis.queries("text_keywords")(s, d)

  private def candidate(s0: SparkSession, d: String): DataFrame = {
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

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-keywords-exp")
    Tables.documents(spark, d).count()
    def timed(fn: => DataFrame): Double = {
      val t0 = System.nanoTime(); fn.count(); (System.nanoTime() - t0) / 1e9
    }
    // result identity first — an A/B of different answers is meaningless
    val a = committed(spark, d).collect().map(_.toSeq).toSeq
    val b = candidate(spark, d).collect().map(_.toSeq).toSeq
    println(s"results identical: ${a == b} (${a.size} rows)")
    val (ca, cb) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to 5).foreach { _ =>
      ca += timed(committed(spark, d))
      cb += timed(candidate(spark, d))
    }
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"committed (df window):    median ${med(ca.result())}%.3f s")
    println(f"candidate (broadcast df): median ${med(cb.result())}%.3f s")
    spark.stop()
  }
}
