package graft

/** Dev tool: print the FINAL adaptive plan of a gated query after
  * execution. Usage: sbt "runMain graft.DevExplain <query> [sfDir]" */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-devexplain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println("=== FINAL ADAPTIVE PLAN: " + name + " ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
