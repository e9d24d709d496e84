package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.mutable

/** Dev tool: per-JOB wall-clock decomposition of a gated query — the
  * evidence for "the residual is scheduling/AQE-barrier floor, not
  * plan waste". Every AQE stage materialization is a separate Spark
  * job; the gap between Σ(task time / slots) and job wall is
  * scheduling+barrier overhead.
  *
  * Usage: sbt "runMain graft.DevProfile <query> [sfDir]"
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-devprofile")
    // warm: tables resolved + codegen compiled outside the profiled run
    SparkEntry.queries(name)(spark, sfDir).count()

    // per-stage (task ms, n tasks, gc ms, spill bytes, shuffle r+w bytes)
    // — gc and spill are the columns that separate "more work" from
    // "same work under memory pressure" when attributing soak exponents
    case class St(taskMs: Long, n: Int, gcMs: Long, spill: Long, shuf: Long)
    val jobs = mutable.Map[Int, Long]()           // jobId -> start nanos-ish ms
    val jobWall = mutable.ArrayBuffer[(Int, Long)]()
    val stageTask = mutable.Map[Int, St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobWall += ((j.jobId, j.time - jobs.getOrElse(j.jobId, j.time)))
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val m = info.taskMetrics
        stageTask(info.stageId) = St(m.executorRunTime, info.numTasks,
          m.jvmGCTime, m.memoryBytesSpilled + m.diskBytesSpilled,
          m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    val slots = spark.sparkContext.defaultParallelism
    println(f"=== $name: wall ${wall}%.3f s, ${jobWall.size} jobs, " +
      s"${stageTask.size} stages, $slots slots ===")
    jobWall.sortBy(_._1).foreach { case (id, ms) =>
      println(f"job $id%3d  wall ${ms / 1000.0}%7.3f s")
    }
    stageTask.toSeq.sortBy(_._1).foreach { case (id, st) =>
      println(f"stage $id%3d  task ${st.taskMs / 1000.0}%7.3f s  " +
        f"gc ${st.gcMs / 1000.0}%6.3f s  spill ${st.spill / 1e6}%8.1f MB  " +
        f"shuf ${st.shuf / 1e6}%8.1f MB  (${st.n} tasks)")
    }
    val taskMs = stageTask.values.map(_.taskMs).sum
    val jobMs = jobWall.map(_._2).sum
    println(f"sum job wall   ${jobMs / 1000.0}%7.3f s")
    println(f"sum task time  ${taskMs / 1000.0}%7.3f s " +
      f"(ideal ${taskMs / 1000.0 / slots}%.3f s on $slots slots)")
    println(f"sum gc time    ${stageTask.values.map(_.gcMs).sum / 1000.0}%7.3f s")
    println(f"sum spill      ${stageTask.values.map(_.spill).sum / 1e6}%7.1f MB")
    println(f"sum shuffle    ${stageTask.values.map(_.shuf).sum / 1e6}%7.1f MB")
    println(f"barrier+sched  ${(jobMs - taskMs / slots) / 1000.0}%7.3f s")
    spark.stop()
  }
}
