package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev tool: per-stage wall/task-time attribution for one gated query,
  * measured STEADY (after warmup runs) — separates data-proportional
  * stage work from the per-job scheduling floor, the split BASELINE.md's
  * DuckDB-ratio analysis needs. Usage:
  *   sbt "runMain graft.StageProfile <queryName> [sfDir] [warmups]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val warm = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.build("graft-stageprofile")
    val fn = SparkEntry.queries(name)
    (1 to warm).foreach(_ => fn(spark, sfDir).count())

    val stages = mutable.SortedMap[Int, (String, Long, Long, Int)]()
    var nJobs = 0
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          end <- si.completionTime; start <- si.submissionTime
        } yield end - start).getOrElse(0L)
        stages.synchronized {
          stages(si.stageId) =
            (si.name.takeWhile(_ != '\n'), wall, si.taskMetrics.executorRunTime, si.numTasks)
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        nJobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // drain the listener bus
    println(f"query=$name steady_wall=$wall%.3f s rows=$n jobs=$nJobs stages=${stages.size}")
    stages.foreach { case (id, (nm, w, t, k)) =>
      println(f"stage $id%4d  wall=$w%6d ms  taskSum=$t%7d ms  tasks=$k%3d  $nm")
    }
    val sumWall = stages.values.map(_._2).sum / 1000.0
    val sumTask = stages.values.map(_._3).sum / 1000.0
    println(f"sum_stage_wall=$sumWall%.3f s  sum_task_time=$sumTask%.3f s  " +
      f"driver_gap=${wall - sumWall}%.3f s (query wall minus in-stage wall: job submit, planning, result fetch)")
    spark.stop()
  }
}
