package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming under the DRIVER'S HASH GATE — until round 8
  * every streaming surface was spec-only (batch-twin equivalence in
  * StreamingSpec); these queries run a REAL `readStream →
  * writeStream` pipeline inside the gated query function and hand the
  * sink table back as the result, so the DuckDB oracle checks the
  * stream's actual output rows. Exactly the reference's streaming-job
  * contract (`cdc_to_pinot_current.py`: bounded replay of a source
  * into a queryable sink) driven through Spark's streaming engine
  * with `Trigger.AvailableNow` — the bounded-backfill trigger a
  * production pipeline uses for replay/bootstrap, so termination is
  * part of the semantics, not a test shortcut.
  *
  * Scale shape: the file source splits like the batch scan;
  * `outputMode(complete)` + a memory sink is the TEST harness tail —
  * at 100 TB the identical plan runs append-mode into the partitioned
  * parquet sink (Streams.scala lanes, spec-covered); the streaming
  * AGGREGATE itself (state store, map-side partial aggregation) is
  * what this gate pins. The aggregate is tiny-keyed (event types), so
  * complete mode re-emits a dim-sized table per epoch.
  */
object StreamGate {
  type Q = (SparkSession, String) => DataFrame

  private val ctr = new AtomicInteger()

  /** The shared replay harness: stream the events table (explicit
    * schema — a streaming source never infers), apply `transform`,
    * run it to a memory sink with bounded AvailableNow replay in
    * complete mode, and hand the sink table back. Every gate differs
    * only in its transform; the replay contract lives HERE once. */
  private def runToMemory(s: SparkSession, d: String, sinkPrefix: String)(
      transform: (() => DataFrame) => DataFrame): DataFrame = {
    val sink = s"${sinkPrefix}_${ctr.incrementAndGet()}"
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // a lane FACTORY rather than one source: the dedup gate replays
    // the feed through two independent readStream lanes
    def lane(): DataFrame = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    val q = transform(() => lane()).writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  /** Per-event-type rollup of the events table, computed BY THE
    * STREAMING ENGINE over the same parquet the oracle reads. */
  private val eventRollup: Q = (s, d) =>
    runToMemory(s, d, "stream_rollup") { lane =>
      lane().groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).as("sum_value"))
    }
      .select(col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  private val eventRollupSql =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Streaming STATEFUL DEDUP under the gate: the events source
    * replayed with every row duplicated (union of two readStream lanes
    * — a two-source replay, the at-least-once delivery model),
    * `dropDuplicates` on the key collapsing them back, then the same
    * rollup. The oracle sees plain exactly-once SQL — the gate pins
    * that streaming dedup state actually delivers exactly-once
    * semantics over a duplicated feed, not just that the query runs.
    * Scale: dropDuplicates state is keyed storage; production bounds
    * it with a watermark (dropDuplicatesWithinWatermark — the
    * Streams.dedupedIngest lane, spec-covered); bounded AvailableNow
    * replay keeps the unbounded variant exact here. */
  private val dedupRollup: Q = (s, d) =>
    runToMemory(s, d, "stream_dedup") { lane =>
      def shaped = lane()
        .select(col("event_id"), col("event_type"), col("value"))
      shaped.unionByName(shaped)
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).as("sum_value"))
    }
      .select(col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** EVENT-TIME tumbling windows through the streaming engine, under
    * the gate — T3's core op (watermark + windowed agg) promoted from
    * spec-only batch-twin checks to the hash oracle. The µs event time
    * rebuilds from the raw nanos long with integer division (`div`,
    * exact — a double division would lose precision above 2⁵³ ns) and
    * the 1-day tumbling window aligns to UTC epoch days, so the
    * oracle is a plain CAST(ts AS DATE) rollup. The watermark bounds
    * state eviction in a production append-mode run; bounded
    * AvailableNow replay + complete mode keeps emission total here so
    * the gate can check every window (append mode would hold the
    * final watermark-open windows in state — a delivery property, not
    * a data property). Scale: state is (days × event types) keyed,
    * map-side partial aggregation before the state store, identical
    * to the batch rollup's shuffle volume. */
  private val windowedCounts: Q = (s, d) =>
    runToMemory(s, d, "stream_window") { lane =>
      // eventsTimestamps handles both shapes the source can present
      // (raw nanos long → exact `div` rebuild, or an already-µs NTZ);
      // watermarks require TIMESTAMP (not NTZ) — the session runs UTC
      // so the cast is identity and windows align to UTC days
      graft.Tables.eventsTimestamps(lane())
        .select(col("ts").cast("timestamp").as("ets"), col("event_type"))
        .withWatermark("ets", "1 hour")
        .groupBy(window(col("ets"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
    }
      .select(col("window.start").cast("date").cast("string").as("day"),
        col("event_type"), col("n_events"))
      .orderBy(col("day"), col("event_type"))
  private val windowedCountsSql =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** The DSv2 topic source (S1's offset contract,
    * `sources/TopicSource.scala`) under the HASH GATE: the events
    * table is produced once per (session, sfDir) into a 4-partition
    * [[graft.sources.MemTopic]] log, then the gated query consumes it
    * through the full micro-batch protocol — initialOffset, admission
    * control, partition planning, reader factory — and aggregates.
    * The oracle reads the original parquet: the gate pins that a trip
    * through the offset/replay machinery is value-lossless (doubles
    * round-trip via Java's shortest-repr toString ↔ cast). */
  private val topicFixtures =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private val topicRollup: Q = (s, d) => {
    // evict fixtures of stopped sessions (and their topic's copy of the
    // events table) — test suites create many sessions, and the CHM key
    // would otherwise pin each session + log copy for the JVM lifetime
    val dead = topicFixtures.entrySet().iterator()
    while (dead.hasNext) {
      val e = dead.next()
      if (e.getKey._1.sparkContext.isStopped) {
        graft.sources.MemTopic.drop(e.getValue); dead.remove()
      }
    }
    val topic = topicFixtures.computeIfAbsent((s, d), _ => {
      val name = s"gate_events_${ctr.incrementAndGet()}_p${ProcessHandle.current().pid()}"
      graft.sources.MemTopic.create(name, partitions = 4)
      graft.Tables.events(s, d).select("event_id", "event_type", "value")
        .collect().foreach { r =>
          graft.sources.MemTopic.produce(name, (r.getLong(0) % 4).toInt,
            r.getLong(0).toString, s"${r.getString(1)},${r.getDouble(2)}")
        }
      name
    })
    val sink = s"stream_topic_${ctr.incrementAndGet()}"
    val q = s.readStream
      .format(classOf[graft.sources.MemTopicProvider].getName)
      .option("topic", topic)
      .load()
      .select(split(col("value"), ",").getItem(0).as("event_type"),
        split(col("value"), ",").getItem(1).cast("double").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v").cast("decimal(18,4)")).as("sum_value"))
      .writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
      .select(col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** HOPPING (sliding) windows through the streaming engine — the
    * second half of T3's window surface next to the tumbling gate:
    * 2-day windows hopping daily, so every event lands in exactly TWO
    * overlapping windows. The oracle replays that membership rule in
    * SQL (each event contributes to the windows starting at its day
    * and the day before) — the gate pins Spark's epoch-aligned hop
    * assignment, the doubled state footprint, and the aggregate
    * values, not just that the query runs. */
  private val hoppingCounts: Q = (s, d) =>
    runToMemory(s, d, "stream_hopping") { lane =>
      graft.Tables.eventsTimestamps(lane())
        .select(col("ts").cast("timestamp").as("ets"), col("event_type"))
        .withWatermark("ets", "1 hour")
        .groupBy(window(col("ets"), "2 days", "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
    }
      .select(col("window.start").cast("date").cast("string").as("win_start"),
        col("event_type"), col("n_events"))
      .orderBy(col("win_start"), col("event_type"))
  private val hoppingCountsSql =
    """WITH m AS (
      |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS win_start, event_type
      |  FROM events
      |  UNION ALL
      |  SELECT CAST(CAST(ts AS DATE) - 1 AS VARCHAR), event_type
      |  FROM events)
      |SELECT win_start, event_type, COUNT(*) AS n_events
      |FROM m GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "stream_event_rollup" -> eventRollup,
    "stream_dedup_rollup" -> dedupRollup,
    "stream_windowed_counts" -> windowedCounts,
    "stream_hopping_counts" -> hoppingCounts,
    "stream_topic_rollup" -> topicRollup)
  val oracles: Map[String, String] = Map(
    "stream_event_rollup" -> eventRollupSql,
    "stream_dedup_rollup" -> eventRollupSql,
    "stream_windowed_counts" -> windowedCountsSql,
    "stream_hopping_counts" -> hoppingCountsSql,
    // same rollup oracle: the topic trip must be value-lossless
    "stream_topic_rollup" -> eventRollupSql)
}
