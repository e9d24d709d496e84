package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Dev-only stage profiler: runs one gated query N times and prints
  * per-stage wall + task time for the LAST run. Not part of the driver
  * contract. Usage: runMain graft.DevProfile <query> <sfDir> [reps]
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sf = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.build("graft-dev-profile")
    val stages = ArrayBuffer[(Int, String, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(90), wall,
          si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    val q = SparkEntry.queries(name)
    var t0 = 0L
    (1 to reps).foreach { i =>
      stages.clear()
      t0 = System.nanoTime()
      q(spark, sf).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] run $i: $dt%.3f s")
    }
    Thread.sleep(500) // let the listener bus drain
    println(f"[profile] stages of last run (wall ms / task ms / tasks):")
    stages.sortBy(_._1).foreach { case (id, nm, w, t, n) =>
      println(f"[profile]   stage $id%3d $w%6d ms  task $t%6d ms  n=$n%3d  $nm")
    }
    spark.stop()
  }
}
