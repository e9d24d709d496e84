package graft

/** Dev tool: print the formatted physical plan of one gated query.
  * Usage: sbt "runMain graft.DevExplainQ <query> [sfDir]" */
object DevExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-explainq")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println("=== PLAN " + name + " ===")
    df.explain("formatted")
    spark.stop()
  }
}
