package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Dev-only: decompose a stream gate's WALL into the engine's own
  * phases — query start→first batch, per-micro-batch durationMs
  * (triggerExecution and its children: queryPlanning, getBatch,
  * addBatch, walCommit, commitOffsets, latestOffset), stop, and the
  * harness's sink read — via a StreamingQueryListener, the engine's
  * own progress telemetry (guide §1: decide whether the time is
  * compute, state-store commit, or start/stop machinery BEFORE
  * touching the drain).
  *
  * Usage: sbt "runMain graft.DevStreamProf [gate] [sfDir] [reps]"
  */
object DevStreamProf {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "stream_join_enrich"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.build("graft-streamprof")

    val events = new ConcurrentLinkedQueue[String]()
    val t00 = System.nanoTime()
    def at: Double = (System.nanoTime() - t00) / 1e9
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        events.add(f"$at%8.3f START ${e.id}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        def g(k: String): Long = Option(dm.get(k)).map(_.toLong).getOrElse(-1L)
        events.add(f"$at%8.3f BATCH ${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${g("triggerExecution")} addBatch=${g("addBatch")} " +
          s"getBatch=${g("getBatch")} plan=${g("queryPlanning")} " +
          s"wal=${g("walCommit")} commit=${g("commitOffsets")} " +
          s"latest=${g("latestOffset")}")
        // state store commit detail, when the operator reports it
        p.stateOperators.foreach { so =>
          events.add(f"$at%8.3f   STATE op=${so.operatorName} " +
            s"commitMs=${so.allUpdatesTimeMs + so.commitTimeMs} " +
            s"rowsUpdated=${so.numRowsUpdated} shards=${so.numShufflePartitions}")
        }
      }
      override def onQueryIdle(e: QueryIdleEvent): Unit =
        events.add(f"$at%8.3f IDLE")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        events.add(f"$at%8.3f TERM ${e.id}")
    })

    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(which)(spark, d)
      val tQ = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      println(f"[streamprof] rep $rep $which rows=$n " +
        f"drain=${(tQ - t0) / 1e9}%.3f read=${(t1 - tQ) / 1e9}%.3f")
    }
    // drain the listener bus so every progress event is printed
    org.apache.spark.GraftSchedulerBridge.drainListenerBus(spark.sparkContext)
    events.forEach(e => println("[streamprof] " + e))
    spark.stop()
  }
}
