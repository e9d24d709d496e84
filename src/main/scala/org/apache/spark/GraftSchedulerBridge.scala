package org.apache.spark

import scala.util.control.NonFatal

/** Bridge to the spark-package-private listener bus so the bench
  * harness can DRAIN pending listener events before reading its
  * task-CPU accumulator (graft.Bench): stage-completed events are
  * delivered asynchronously, so a per-query CPU snapshot taken right
  * after an action returns would race the bus and misattribute a
  * stage's CPU to the NEXT query. Pure visibility shim, same pattern
  * as [[org.apache.spark.sql.GraftPlanBridge]].
  */
object GraftSchedulerBridge {
  /** Block until every event posted so far is delivered to all
    * listeners (bounded by the bus's own default timeout; a timeout
    * is swallowed — a rare late event costs one misattributed stage,
    * never a crashed bench leg). */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case NonFatal(_) => () }
}
