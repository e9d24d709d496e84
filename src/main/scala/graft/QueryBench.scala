package graft

/** Dev tool: time one gated query in isolation (steady-state) and dump
  * its formatted physical plan. Usage:
  *   sbt "runMain graft.QueryBench <queryName> [sfDir] [iters]"
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.build("graft-querybench")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
