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
  /** ~16 MB of compressed feed per state partition — midpoint of the
    * measured envelope (26 MB/partition completed the 50× soak, 53
    * MB/partition OOM'd at 100×), with margin for the session-window
    * gate's per-task merge buffers. Floor 4 = the committed bench
    * convention (the sf0.1 feed is 2 MB, so it resolves to the floor). */
  private val SizedStateBytes = 16L << 20

  /** Data-sized state-partition target (spec-pinned arithmetic). */
  private[graft] def sizedStateTarget(feedBytes: Long): Long =
    math.max(4L, (feedBytes + SizedStateBytes - 1) / SizedStateBytes)

  /** Feed size past which a gate drain switches its state store to
    * RocksDB (off-heap): 64 MB compressed — comfortably above the
    * 2 MB sf0.1 bench feed (the committed in-heap numbers stand) and
    * below the 105 MB 50× point, so every soak replica exercises the
    * production big-state backend. */
  private[graft] val RocksDbStateBytes = 64L << 20

  type Q = (SparkSession, String) => DataFrame

  private val ctr = new AtomicInteger()

  /** The shared replay harness: stream the events table (explicit
    * schema — a streaming source never infers), apply `transform`,
    * run it to a memory sink with bounded AvailableNow replay in
    * complete mode, and hand the sink table back. Every gate differs
    * only in its transform; the replay contract lives HERE once. */
  /** A lane FACTORY rather than one source: the dedup gate replays
    * the feed through two independent readStream lanes. The streaming
    * file source requires a DIRECTORY basePath, so the lane adapts to
    * the layout: the testdata dirs hold a single events.parquet FILE
    * (stream $d with a leaf-name glob), the scale replicas hold an
    * events.parquet DIRECTORY of part files (stream it directly —
    * the leaf-name glob over $d matched zero files there, silently
    * streaming an EMPTY feed in the pre-round-10 scale soaks). */
  private def eventsLane(s: SparkSession, d: String): () => DataFrame = {
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // resolve through the Hadoop FileSystem, NOT java.io.File: a
    // java.io probe is local-only, so an HDFS/S3 `d` would silently
    // fall into the leaf-glob lane and stream an EMPTY feed — the
    // exact failure mode the layout adaptation exists to prevent
    val path = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val isDir = fs.getFileStatus(path).isDirectory
    () => {
      val r = s.readStream.schema(schema)
      if (isDir) r.parquet(path.toString)
      else r.option("pathGlobFilter", "events.parquet").parquet(d)
    }
  }

  /** Pin `spark.sql.shuffle.partitions` small for the duration of one
    * bounded stream drain, restoring it after. A stateful operator
    * materializes one state-store instance PER shuffle partition (a
    * stream-stream join: four) and every micro-batch commits each
    * store to the checkpoint FS — at the session's CPU-sized default
    * (32) that is ~128 store commits per batch of pure fixed overhead,
    * the dominant term of the gate wall time. The gates' state key
    * spaces (event types, user ids) saturate far fewer partitions;
    * state partitioning is fixed at first run per checkpoint, and
    * every gate uses a fresh checkpoint, so this is safe.
    *
    * The pin is DATA-SIZED, not constant (the r9 100×-soak finding):
    * with a flat 4, one AvailableNow batch funnels feed/4 rows through
    * each stateful task — the session-window gate's per-task
    * merge/sort buffers OOM'd the 8 GB soak heap at a 212 MB feed
    * (the 105 MB 50× feed passed). One compressed-feed-size FS probe
    * scales the pin at ~16 MB/partition: the sf0.1 gate feed (2 MB)
    * still resolves to the committed floor of 4 (bench convention
    * unchanged — the A/B table in PLANS.md stands), soak replicas get
    * proportionally more state tasks. An explicit
    * `graft.stream.statePartitions` always wins — at real scale state
    * partitions are sized to the CLUSTER, not the feed probe. */
  private def withStatePartitions[T](s: SparkSession, feedBytes: Long = 0L)(
      body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.get(key)
    val prevProvider = s.conf.getOption(providerKey)
    // r11 (verdict item 6, 50×-measured): past the RocksDB threshold
    // the pin ALSO floors at core count — the memory-sized target alone
    // (feed/16 MB) starved the stateful stage's parallelism once state
    // stopped being the constraint (50× session gate, 32 cores:
    // 7 partitions → 24.8 s, 16 → 19.3, 24 → 17.7, 32 → 15.4,
    // 64 → 17.0 — optimum at core count, commit overhead past it).
    // Below the threshold the committed small-feed convention stands
    // (a 2 MB feed's wall is ~128 store commits of fixed overhead —
    // the r9 A/B that pinned the floor of 4; PLANS.md table).
    val target = s.conf.getOption("graft.stream.statePartitions")
      .map(_.toLong).getOrElse {
        val sized = StreamGate.sizedStateTarget(feedBytes)
        if (feedBytes > StreamGate.RocksDbStateBytes)
          math.max(sized, s.sparkContext.defaultParallelism.toLong)
        else sized
      }
    val pinned = math.min(prev.toLong, target).toString
    s.conf.set(key, pinned)
    // Data-sized state BACKEND (the second half of the r9 100×-soak
    // finding): the default HDFS-backed provider keeps every state
    // row — plus committed map versions — ON HEAP, so a complete-mode
    // session aggregate holds the whole corpus's sessions resident;
    // partition count cannot save a single-JVM run (concurrent tasks
    // hold the same total), and the 212 MB 100× feed OOM'd the 8 GB
    // heap. Past the threshold the drain runs on RocksDB (native
    // memory + local disk, the documented big-state production
    // backend); below it the committed in-heap convention stands.
    if (feedBytes > StreamGate.RocksDbStateBytes)
      s.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      s.conf.set(key, prev)
      prevProvider match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
    }
  }

  /** Compressed on-disk size of the gate feed (file or directory) via
    * the Hadoop FS — one metadata call, no Spark job, works on any
    * filesystem the session can read. */
  private def feedBytes(s: SparkSession, d: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.getContentSummary(path).getLength
  }

  /** Sinks from COMPLETED drains, dropped lazily at the next drain
    * start (the r9 100×-soak finding, part three): a memory sink holds
    * its full complete-mode result on the driver heap and lives in the
    * session catalog until someone drops it — across a bench's 3 runs
    * × 8 gates at a 212 MB feed that accreted gigabytes of dead sink
    * tables and OOM'd the JVM after the state store was already
    * off-heap. The CURRENT sink must survive its own gate's read (the
    * caller counts/dumps it after this returns), so each drain retires
    * the ones registered before it. */
  private val staleSinks = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def dropStaleSinks(s: SparkSession): Unit = {
    var name = staleSinks.poll()
    while (name != null) {
      try s.catalog.dropTempView(name) catch { case _: Throwable => () }
      name = staleSinks.poll()
    }
  }

  private def runToMemory(s: SparkSession, d: String, sinkPrefix: String,
      mode: String = "complete")(
      transform: (() => DataFrame) => DataFrame): DataFrame = {
    val sink = s"${sinkPrefix}_${ctr.incrementAndGet()}"
    val lane = eventsLane(s, d)
    dropStaleSinks(s)
    staleSinks.add(sink)
    withStatePartitions(s, feedBytes(s, d)) {
      val q = transform(() => lane()).writeStream
        .format("memory").queryName(sink)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
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
      // toLocalIterator, not collect: the fixture copies the events
      // table into the driver-JVM topic log, and at soak replicas a
      // full collect is the one place the harness materializes a
      // corpus driver-side. Streaming one partition at a time keeps
      // driver memory O(partition); produce must stay ON the driver —
      // MemTopic is a driver-JVM singleton, so task-side produce would
      // silently write to empty executor-local logs on a real cluster.
      graft.Tables.events(s, d).select("event_id", "event_type", "value")
        .toLocalIterator().forEachRemaining { r =>
          graft.sources.MemTopic.produce(name, (r.getLong(0) % 4).toInt,
            r.getLong(0).toString, s"${r.getString(1)},${r.getDouble(2)}")
        }
      name
    })
    val sink = s"stream_topic_${ctr.incrementAndGet()}"
    dropStaleSinks(s)
    staleSinks.add(sink)
    // the topic rollup's state is |event_type|-sized (tiny at any SF),
    // but the sized pin is harmless here and keeps one convention
    withStatePartitions(s, feedBytes(s, d)) {
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
    }
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

  /** GAP-BASED SESSION WINDOWS through the streaming engine, under the
    * gate — native `session_window` (T3's third window kind next to
    * the tumbling and hopping gates) promoted from spec-only
    * (StreamingSpec `sessionCounts`) to the hash oracle. 30-minute
    * inactivity gap per user, same spec as the batch gaps-and-islands
    * twin (`rel_sessions`). Boundary semantics pinned by the oracle:
    * Spark merges two events iff their gap windows OVERLAP, so a gap
    * of EXACTLY 30 min starts a new session — the oracle's split
    * condition is `>=`, not `>` (the batch twin's LAG formulation uses
    * `>`; both are exact, they are different specs). Scale: session
    * merge state is per-user and watermark-evicted in a production
    * append-mode run; bounded AvailableNow replay + complete mode
    * keeps emission total so the gate checks every session. */
  private val sessionWindows: Q = (s, d) =>
    runToMemory(s, d, "stream_sessions") { lane =>
      graft.Tables.eventsTimestamps(lane())
        .select(col("ts").cast("timestamp").as("ets"),
          col("user_id"), col("event_id"))
        .withWatermark("ets", "1 hour")
        .groupBy(session_window(col("ets"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
    }
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("first_event"), col("last_event"))
      .orderBy(col("user_id"), col("session_start_us"))
  private val sessionWindowsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessioned AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS sid
      |  FROM flagged)
      |SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start_us,
      |  COUNT(*) AS n_events,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM sessioned GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** STREAM-STREAM INNER JOIN under the gate — T6's join surface
    * promoted from spec-only batch-twin checks: two independent
    * readStream lanes over the same feed (clicks, purchases), joined
    * on the key with an event-time RANGE condition (purchase within 30
    * minutes after the click), both sides watermarked. Inner-join
    * matches emit as soon as both rows arrive (append mode — a
    * stream-stream join has no complete mode); the watermark + range
    * condition is what BOUNDS the join state in a production run: each
    * side keeps only rows younger than watermark + range, exactly the
    * state-eviction contract this gate exercises through the real
    * engine. The oracle is the plain batch self-join. */
  private val joinEnrich: Q = (s, d) =>
    runToMemory(s, d, "stream_join", mode = "append") { lane =>
      def side(tpe: String, u: String, e: String, t: String) =
        graft.Tables.eventsTimestamps(lane())
          .filter(col("event_type") === tpe)
          .select(col("user_id").as(u), col("event_id").as(e),
            col("ts").cast("timestamp").as(t))
          .withWatermark(t, "1 hour")
      side("click", "user_id", "click_id", "c_ts")
        .join(side("purchase", "p_user", "purchase_id", "p_ts"),
          expr("user_id = p_user AND p_ts >= c_ts AND " +
            "p_ts < c_ts + INTERVAL 30 MINUTES"))
    }
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .orderBy(col("click_id"), col("purchase_id"))
  private val joinEnrichSql =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
      |FROM events c JOIN events p
      |  ON p.user_id = c.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts
      | AND epoch_us(p.ts) - epoch_us(c.ts) < 1800000000
      |ORDER BY click_id, purchase_id""".stripMargin

  /** PARTITIONED PARQUET STREAMING SINK under the gate (S5, previously
    * spec-only in StreamingSpec): the events feed streamed through the
    * real FILE SINK — append mode, exactly-once via the sink's file
    * manifest log — partitioned by event_type, then the gate reads the
    * sink DIRECTORY back as a batch table (partition column recovered
    * from the directory layout) and rolls it up. The oracle is the
    * plain rollup SQL: the trip through the sink — file commit
    * protocol, partition directory encoding, double round-trip — must
    * be value-lossless. A fresh pid-scoped sink per invocation keeps
    * replays independent (the manifest makes re-runs of ONE query
    * idempotent; the gate times a single bounded backfill). */
  private val sinkPartitioned: Q = (s, d) => {
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-streamsink-${ctr.incrementAndGet()}-p${ProcessHandle.current().pid()}")
    val lane = eventsLane(s, d)
    val q = lane().select(col("event_id"), col("event_type"), col("value"))
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .partitionBy("event_type")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$out/data")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("sum_value"))
      .select(col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "stream_event_rollup" -> eventRollup,
    "stream_sink_partitioned" -> sinkPartitioned,
    "stream_dedup_rollup" -> dedupRollup,
    "stream_windowed_counts" -> windowedCounts,
    "stream_hopping_counts" -> hoppingCounts,
    "stream_session_windows" -> sessionWindows,
    "stream_join_enrich" -> joinEnrich,
    "stream_topic_rollup" -> topicRollup)
  val oracles: Map[String, String] = Map(
    "stream_event_rollup" -> eventRollupSql,
    // same rollup oracle: the file-sink trip must be value-lossless
    "stream_sink_partitioned" -> eventRollupSql,
    "stream_dedup_rollup" -> eventRollupSql,
    "stream_windowed_counts" -> windowedCountsSql,
    "stream_hopping_counts" -> hoppingCountsSql,
    "stream_session_windows" -> sessionWindowsSql,
    "stream_join_enrich" -> joinEnrichSql,
    // same rollup oracle: the topic trip must be value-lossless
    "stream_topic_rollup" -> eventRollupSql)
}
