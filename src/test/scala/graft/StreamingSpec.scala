package graft

import graft.cdc.CdcFixtures
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class StreamingSpec extends SparkSpec {
  import CdcFixtures._

  private val fixedClock = org.apache.spark.sql.functions.lit(1800000000000L)

  private def tmp(): String = Files.createTempDirectory("streamspec").toString

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), String.join("\n", lines: _*).getBytes)
  }

  test("stream-gate state partitions scale with the feed, floored at the bench convention") {
    import graft.streaming.StreamGate.sizedStateTarget
    // sf0.1 feed (2 MB) resolves to the committed floor of 4 — the
    // bench convention and the PLANS.md parts-A/B table stand
    assert(sizedStateTarget(2L << 20) == 4L)
    assert(sizedStateTarget(0L) == 4L)
    // the measured envelope: 105 MB (50× soak, passed at 4) now gets 7;
    // 212 MB (100× soak, OOM'd at 4) gets 14 — per-partition feed stays
    // ~16 MB compressed at any scale
    assert(sizedStateTarget(105L << 20) == 7L)
    assert(sizedStateTarget(212L << 20) == 14L)
    // monotone, and never drops below the floor
    assert(sizedStateTarget(1L) == 4L)
    assert(sizedStateTarget(1L << 40) == (1L << 40) / (16L << 20))
  }

  test("bronze sink: partitioned parquet with exactly-once file commits") {
    val in = tmp(); val out = tmp() + "/bronze"; val ck = tmp() + "/ck"
    val ops = randomStream(seed = 5, nKeys = 8, nOps = 60)
    writeLines(in, "b0.jsonl", withNoise(ops.map(toJson), seed = 5))
    Streams.bronzeQuery(Streams.rawFileStream(spark, in), out, ck,
      availableNow = true).awaitTermination()
    val bronze = spark.read.parquet(out)
    assert(bronze.count() == 60) // noise rows dropped
    assert(bronze.schema("after_price").dataType.typeName == "string")
    // dt partition directories exist (read back as DATE by partition
    // type inference; the directory layout is dt=yyyy-MM-dd)
    val dts = bronze.select(col("dt").cast("string")).distinct()
      .collect().map(_.getString(0))
    assert(dts.nonEmpty && dts.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")))
  }

  test("current state: last-write-wins upsert across micro-batches + restart") {
    val in = tmp(); val root = tmp() + "/current"; val ck = tmp() + "/ck"
    val ops = randomStream(seed = 9, nKeys = 6, nOps = 80, minStepMs = 1001, maxStepMs = 2000)
    val (first, second) = ops.splitAt(50)
    writeLines(in, "b0.jsonl", first.map(toJson))
    Streams.currentStateQuery(Streams.rawFileStream(spark, in), root, ck,
      availableNow = true).awaitTermination()
    // restart with a second file: checkpoint resumes, only new data reads
    writeLines(in, "b1.jsonl", second.map(toJson))
    Streams.currentStateQuery(Streams.rawFileStream(spark, in), root, ck,
      availableNow = true).awaitTermination()

    val state = new Streams.CurrentStateTable(spark, root).read()
    // one row per key ever seen
    val keys = ops.map(o => o.before.orElse(o.after).get.id).distinct
    assert(state.count() == keys.length)
    // each row reflects the op with max (ts, lsn) for that key
    val expected = ops.groupBy(o => o.before.orElse(o.after).get.id)
      .view.mapValues(_.maxBy(e => (e.tsMs, e.lsn))).toMap
    state.collect().foreach { r =>
      val fin = expected(r.getAs[Int]("id"))
      assert(r.getAs[Long]("last_updated_ts") == fin.tsMs)
      assert(r.getAs[Boolean]("is_deleted") == (fin.op == "d"))
      if (fin.op != "d")
        assert(r.getAs[Double]("price") == fin.after.get.price.toDouble)
      else assert(r.isNullAt(r.fieldIndex("price"))) // after image null on delete
    }
  }

  test("current state: replayed batch cannot regress the table (§7.4.10)") {
    val root = tmp() + "/cur"
    val table = new Streams.CurrentStateTable(spark, root)
    import spark.implicits._
    def batchOf(ops: Seq[CdcOp]) = {
      val flat = graft.cdc.Envelope.flatten(ops.map(toJson).toDF("raw_message"))
      Streams.currentProjection(flat)
    }
    val img1 = SaleImage(1, "Phone", "Electronics", "100", 1, 19800, 0L)
    val img2 = img1.copy(price = "200")
    val newer = CdcOp("u", Some(img1), Some(img2), 2000L, 2, 2)
    val older = CdcOp("c", None, Some(img1), 1000L, 1, 1)
    table.upsert(batchOf(Seq(older)))
    table.upsert(batchOf(Seq(newer)))
    table.upsert(batchOf(Seq(older))) // replay of stale batch
    val rows = table.read().collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("price") == 200.0)
  }

  test("current state: micro-batch commit rewrites only touched buckets") {
    val root = tmp() + "/cur"
    val table = new Streams.CurrentStateTable(spark, root)
    import spark.implicits._
    def batchOf(ops: Seq[CdcOp]) = Streams.currentProjection(
      graft.cdc.Envelope.flatten(ops.map(toJson).toDF("raw_message")))
    def img(k: Int, p: String) = SaleImage(k, "Phone", "Electronics", p, 1, 19800, 0L)
    table.upsert(batchOf((1 to 12).map(k => CdcOp("c", None, Some(img(k, "100")), 1000L + k, k.toLong, k.toLong))))
    table.upsert(batchOf(Seq(CdcOp("u", Some(img(3, "100")), Some(img(3, "777")), 9000L, 99, 99))))
    val v0 = table.table.manifestFiles(0).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val v1 = table.table.manifestFiles(1).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rewritten = v1.filter(_._2.exists(_.startsWith("v=00001"))).keySet
    assert(rewritten.size == 1)
    (v0.keySet - rewritten.head).foreach(p => assert(v1(p) == v0(p)))
    assert(table.read().filter($"id" === 3).first().getAs[Double]("price") == 777.0)
    assert(table.read().count() == 12)
  }

  test("auto-vacuum bounds version growth under continuous upserts") {
    val root = tmp() + "/cur"
    val table = new Streams.CurrentStateTable(spark, root, retainVersions = Some(2))
    import spark.implicits._
    def batchOf(ops: Seq[CdcOp]) = Streams.currentProjection(
      graft.cdc.Envelope.flatten(ops.map(toJson).toDF("raw_message")))
    val img = SaleImage(1, "Phone", "Electronics", "100", 1, 19800, 0L)
    (1 to 6).foreach { i =>
      table.upsert(batchOf(Seq(
        CdcOp("u", Some(img), Some(img.copy(price = s"$i")), 1000L * i, i.toLong, i.toLong))))
    }
    // six commits happened, only the newest two manifests survive
    assert(table.table.latestVersion.contains(5))
    val manifests = new java.io.File(root, "_versions").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).sorted
    assert(manifests.toSeq == Seq("00004", "00005"))
    assert(table.read().first().getAs[Double]("price") == 6.0)
  }

  test("streaming SCD2 equals the batch job for the same batch boundaries") {
    import spark.implicits._
    val ops = randomStream(seed = 55, nKeys = 8, nOps = 80,
      minStepMs = 1001, maxStepMs = 2000)
    val (b1, b2) = ops.splitAt(45)

    // streaming: two files, two runs → two micro-batches
    val in = tmp(); val sroot = tmp() + "/stab"; val sck = tmp() + "/ck"
    writeLines(in, "a.jsonl", b1.map(toJson))
    Streams.scd2Query(Streams.rawFileStream(spark, in), sroot, sck,
      availableNow = true).awaitTermination()
    writeLines(in, "b.jsonl", b2.map(toJson))
    Streams.scd2Query(Streams.rawFileStream(spark, in), sroot, sck,
      availableNow = true).awaitTermination()

    // batch: same two increments through Scd2Job
    val staging = tmp() + "/staging"
    val job = new graft.scd2.Scd2Job(spark, staging, tmp() + "/btab", tmp() + "/bck",
      () => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1800000000L)))
    Seq(b1, b2).foreach { ops =>
      graft.cdc.Envelope.toBronze(graft.cdc.Envelope.flatten(
        ops.map(toJson).toDF("raw_message")))
        .write.mode("append").partitionBy("dt").parquet(staging)
      job.run()
    }

    val streamed = new graft.scd2.VersionedTable(spark, sroot).read()
      .drop("effective_start_date")
    val cols = job.currentState.columns.sorted.map(col).toIndexedSeq
    val a = streamed.select(cols: _*).orderBy(cols: _*).collect().map(_.toSeq)
    val b = job.currentState.select(cols: _*).orderBy(cols: _*).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("streaming SCD2: re-delivered micro-batch is skipped (batchId in commit)") {
    val in = tmp(); val root = tmp() + "/tab"; val ck = tmp() + "/ck"
    val ops = randomStream(seed = 61, nKeys = 4, nOps = 30,
      minStepMs = 1001, maxStepMs = 2000)
    writeLines(in, "a.jsonl", ops.map(toJson))
    Streams.scd2Query(Streams.rawFileStream(spark, in), root, ck,
      availableNow = true).awaitTermination()
    val table = new graft.scd2.VersionedTable(spark, root)
    val vAfter = table.latestVersion
    // simulate the crash-after-commit replay: wipe the stream checkpoint
    // so batch 0 is re-delivered with the same batchId
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ck))
    Streams.scd2Query(Streams.rawFileStream(spark, in), root, ck,
      availableNow = true).awaitTermination()
    assert(table.latestVersion == vAfter, "replayed batch must not re-apply")
  }

  test("stream-stream join: watermarked state-store join equals the batch join") {
    val inL = tmp(); val inR = tmp(); val ck = tmp() + "/ck"
    // two independent CDC streams over the same key space; timestamps
    // span ~15 min so the ±5 min tolerance joins SOME pairs, not all
    val left = randomStream(seed = 91, nKeys = 5, nOps = 30,
      minStepMs = 1001, maxStepMs = 30000)
    val right = randomStream(seed = 92, nKeys = 5, nOps = 30,
      minStepMs = 1001, maxStepMs = 30000)
    Files.createDirectories(Paths.get(inL))
    Files.createDirectories(Paths.get(inR))
    Files.write(Paths.get(inL, "l.jsonl"),
      String.join("\n", left.map(toJson): _*).getBytes)
    Files.write(Paths.get(inR, "r.jsonl"),
      String.join("\n", right.map(toJson): _*).getBytes)
    val q = Streams.streamStreamJoin(
        Streams.rawFileStream(spark, inL), Streams.rawFileStream(spark, inR))
      .writeStream.format("memory").queryName("ssj")
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def batchRaw(dir: String) =
      spark.read.text(dir).withColumnRenamed("value", "raw_message")
    // withWatermark is a no-op on batch frames, so the SAME builder is
    // the batch twin — nothing is late in one availableNow pass, so the
    // state-store join must emit exactly the batch result
    val expect = Streams.streamStreamJoin(batchRaw(inL), batchRaw(inR))
    val cols = expect.columns.sorted.map(col).toIndexedSeq
    val a = spark.table("ssj").select(cols: _*).collect().map(_.toSeq.toString).sorted
    val b = expect.select(cols: _*).collect().map(_.toSeq.toString).sorted
    assert(a.nonEmpty, "join produced no rows — fixture tolerance too tight")
    assert(a.toSeq == b.toSeq, "stream-stream join drifted from batch twin")
  }

  test("stream-stream LEFT OUTER join emits unmatched rows once watermark passes") {
    val inL = tmp(); val inR = tmp(); val ck = tmp() + "/ck"
    // left keys 1..4; right covers only a prefix of the time span, so
    // some left rows have no partner within tolerance
    val left = randomStream(seed = 93, nKeys = 4, nOps = 24,
      minStepMs = 60000, maxStepMs = 120000) // ~24-48 min span
    val right = left.take(6) // partners only for the earliest rows
    // outer rows only emit when the watermark ADVANCES, which happens
    // BETWEEN micro-batches: ship the left side as two files
    // (maxFilesPerTrigger=1) whose second file is a lone sentinel 2h
    // later — batch 2's watermark then evicts batch 1's unmatched rows
    val lastTs = left.map(_.tsMs).max
    def sentinel(hoursLater: Int, lsn: Long): CdcOp = {
      val at = lastTs + hoursLater * 3600 * 1000L
      val img = SaleImage(999, "Phone", "Electronics", "1", 1, 19800, at * 1000)
      CdcOp("c", None, Some(img), at, lsn, lsn)
    }
    Files.createDirectories(Paths.get(inL))
    Files.createDirectories(Paths.get(inR))
    Files.write(Paths.get(inL, "a.jsonl"),
      String.join("\n", left.map(toJson): _*).getBytes)
    Thread.sleep(50) // distinct mtimes: file source processes oldest first
    // TWO sentinel batches: batch 2 advances the watermark past the
    // main data, batch 3 runs UNDER that watermark and performs the
    // eviction that emits the unmatched rows (watermark effects always
    // lag one batch)
    Files.write(Paths.get(inL, "b.jsonl"), toJson(sentinel(2, 900L)).getBytes)
    Thread.sleep(50)
    Files.write(Paths.get(inL, "c.jsonl"), toJson(sentinel(4, 901L)).getBytes)
    // the GLOBAL watermark is the MIN across both streams — the right
    // side needs its own late event or it pins the watermark at its
    // early data and nothing ever evicts (id 998 matches no left key)
    val rSentinel = {
      val at = lastTs + 2 * 3600 * 1000L
      val img = SaleImage(998, "Phone", "Electronics", "1", 1, 19800, at * 1000)
      CdcOp("c", None, Some(img), at, 902, 902L)
    }
    Files.write(Paths.get(inR, "r.jsonl"),
      String.join("\n", (right.map(toJson) :+ toJson(rSentinel)): _*).getBytes)
    val q = Streams.streamStreamJoin(
        Streams.rawFileStream(spark, inL, maxFilesPerTrigger = Some(1)),
        Streams.rawFileStream(spark, inR),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("ssj_outer")
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def batchRaw(dir: String) =
      spark.read.text(dir).withColumnRenamed("value", "raw_message")
    // the sentinel itself is still held in state at query end (nothing
    // later ever evicts it) — exclude it from both sides of the compare
    val expect = Streams.streamStreamJoin(batchRaw(inL), batchRaw(inR),
      joinType = "left_outer").filter(col("id") =!= 999)
    val cols = expect.columns.sorted.map(col).toIndexedSeq
    val a = spark.table("ssj_outer").filter(col("id") =!= 999).select(cols: _*)
      .collect().map(_.toSeq.toString).sorted
    val b = expect.select(cols: _*).collect().map(_.toSeq.toString).sorted
    assert(a.exists(_.contains("null")), "no unmatched left rows emitted")
    assert(a.toSeq == b.toSeq, "outer stream-stream join drifted from batch twin")
  }

  test("dedupe-by-lsn keeps snapshot rows sharing one LSN (wide key)") {
    val in = tmp(); val out = tmp() + "/bronze"; val ck = tmp() + "/ck"
    // Debezium-style initial snapshot: every 'r' record same lsn
    val rows = (1 to 5).map { k =>
      val img = SaleImage(k, "Phone", "Electronics", "100", 1, 19800, 0L)
      CdcOp("r", None, Some(img), 1718000000000L + k, 7, 42L)
    }
    writeLines(in, "snap.jsonl", rows.map(toJson) ++ rows.map(toJson)) // doubled
    Streams.bronzeQuery(Streams.rawFileStream(spark, in), out, ck,
      availableNow = true, dedupeByLsn = true).awaitTermination()
    val bronze = spark.read.parquet(out)
    assert(bronze.count() == 5) // all keys kept, duplicates dropped
  }

  test("stateful current state survives op-bearing garbage (null key dropped)") {
    val in = tmp(); val ck = tmp() + "/ck"
    val img = SaleImage(1, "Phone", "Electronics", "100", 1, 19800, 0L)
    val good = CdcOp("c", None, Some(img), 1000L, 1, 1)
    val garbage = """{"payload":{"op":"u","ts_ms":1718000000000}}"""
    writeLines(in, "g.jsonl", Seq(toJson(good), garbage))
    Streams.statefulCurrentStateQuery(Streams.rawFileStream(spark, in),
      "fmgws_garbage", ck, availableNow = true).awaitTermination()
    val rows = spark.table("fmgws_garbage").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Int]("id") == 1)
  }

  test("bronze dedupe-by-lsn: replayed envelopes land exactly once") {
    val in = tmp(); val out = tmp() + "/bronze"; val ck = tmp() + "/ck"
    val ops = randomStream(seed = 13, nKeys = 5, nOps = 30)
    val lines = ops.map(toJson)
    // simulate at-least-once delivery: every envelope delivered twice
    writeLines(in, "b0.jsonl", lines ++ lines)
    Streams.bronzeQuery(Streams.rawFileStream(spark, in), out, ck,
      availableNow = true, dedupeByLsn = true).awaitTermination()
    val bronze = spark.read.parquet(out)
    assert(bronze.count() == 30)
    assert(bronze.select("lsn").distinct().count() == 30)
  }

  test("flatMapGroupsWithState current state matches the foreachBatch merge") {
    import spark.implicits._
    val in = tmp(); val ck = tmp() + "/ck"
    val ops = randomStream(seed = 31, nKeys = 6, nOps = 70,
      minStepMs = 1001, maxStepMs = 2000)
    writeLines(in, "s0.jsonl", ops.map(toJson))
    Streams.statefulCurrentStateQuery(Streams.rawFileStream(spark, in),
      "fmgws_state", ck, availableNow = true).awaitTermination()
    // last emission per key == final upsert state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"last_updated_ts".desc, $"lsn".desc)
    val finalState = spark.table("fmgws_state")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1)
    val expected = ops.groupBy(o => o.before.orElse(o.after).get.id)
      .view.mapValues(_.maxBy(e => (e.tsMs, e.lsn))).toMap
    val rows = finalState.collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val fin = expected(r.getAs[Int]("id"))
      assert(r.getAs[Long]("last_updated_ts") == fin.tsMs)
      assert(r.getAs[Boolean]("is_deleted") == (fin.op == "d"))
    }
  }

  test("windowed op counts: watermarked tumbling windows match batch truth") {
    import spark.implicits._
    val in = tmp(); val out = tmp() + "/win"; val ck = tmp() + "/ck"
    val ops = randomStream(seed = 21, nKeys = 10, nOps = 200)
    writeLines(in, "w.jsonl", ops.map(toJson))
    // AvailableNow processes all files; a final empty batch advances the
    // watermark so completed windows emit in append mode.
    Streams.windowedOpCountsQuery(Streams.rawFileStream(spark, in), out, ck,
      availableNow = true).awaitTermination()
    writeLines(in, "w2.jsonl", Seq(toJson(ops.last.copy(
      tsMs = ops.last.tsMs + 3600000L)))) // 1h later: flushes all windows
    Streams.windowedOpCountsQuery(Streams.rawFileStream(spark, in), out, ck,
      availableNow = true).awaitTermination()

    val got = spark.read.parquet(out)
      .select($"window_start", $"op", $"n_events").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    // batch ground truth over the ORIGINAL 200 ops (the flush event's own
    // window may not have emitted yet — exclude it from the expectation)
    val flat = graft.cdc.Envelope.flatten(ops.map(toJson).toDF("raw_message"))
    val expected = flat
      .groupBy(org.apache.spark.sql.functions.window($"event_timestamp", "1 minute"), $"op")
      .count()
      .select($"window.start", $"op", $"count").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    assert(expected.subsetOf(got))
    assert(got.size <= expected.size + 1) // + at most the flush event's window
  }

  test("trending top-k: per-window rank over closed windows matches batch truth") {
    import spark.implicits._
    val in = tmp(); val out = tmp() + "/trend"; val ck = tmp() + "/ck"
    val ops = randomStream(seed = 33, nKeys = 10, nOps = 300)
    writeLines(in, "t.jsonl", ops.map(toJson))
    Streams.trendingTopKQuery(Streams.rawFileStream(spark, in), out, ck,
      k = 2, availableNow = true).awaitTermination()
    writeLines(in, "t2.jsonl", Seq(toJson(ops.last.copy(
      tsMs = ops.last.tsMs + 3600000L)))) // 1h later: flushes all windows
    Streams.trendingTopKQuery(Streams.rawFileStream(spark, in), out, ck,
      k = 2, availableNow = true).awaitTermination()

    val got = spark.read.parquet(out)
      .select($"window_start", $"op", $"n_events", $"rank")
      .as[(java.sql.Timestamp, String, Long, Int)].collect()
    // ranks are 1..k dense per window, ties broken (n desc, op)
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (1 to g.length) && g.length <= 2)
    }
    // batch ground truth: top-2 per window over the ORIGINAL ops
    val flat = graft.cdc.Envelope.flatten(ops.map(toJson).toDF("raw_message"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"window_start").orderBy($"n_events".desc, $"op")
    val expected = flat
      .groupBy(org.apache.spark.sql.functions.window($"event_timestamp", "1 minute"), $"op")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .select($"window.start".as("window_start"), $"op", $"n_events")
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rank" <= 2)
      .as[(java.sql.Timestamp, String, Long, Int)].collect().toSet
    assert(expected.subsetOf(got.toSet))
    assert(got.length <= expected.size + 2) // + at most the flush window's k
  }

  test("streaming corpus dedup: first arrival per fingerprint survives") {
    import spark.implicits._
    val in = tmp(); val out = tmp() + "/dedup"; val ck = tmp() + "/ck"
    def doc(id: Long, text: String, ts: String) =
      s"""{"doc_id":$id,"text":"$text","ingest_ts":"$ts"}"""
    // batch 1: two distinct docs; batch 2: an exact re-fetch of doc 1's
    // text (within the watermark → dropped) plus a genuinely new doc
    writeLines(in, "b1.jsonl", Seq(
      doc(1, "alpha beta gamma", "2024-01-01 10:00:00"),
      doc(2, "delta epsilon", "2024-01-01 10:00:01")))
    writeLines(in, "b2.jsonl", Seq(
      doc(3, "alpha beta gamma", "2024-01-01 10:00:05"),
      doc(4, "zeta eta", "2024-01-01 10:00:06")))
    val schema = "doc_id LONG, text STRING, ingest_ts TIMESTAMP"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    Streams.dedupedIngest(stream).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val got = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 4L), s"doc 3 is a dup of doc 1's content: $got")
    // every surviving fingerprint is unique
    val fps = spark.read.parquet(out).select($"content_fp").as[String].collect()
    assert(fps.distinct.length === fps.length)
  }

  test("transformWithState lsn monitor: replayed batches advance nothing") {
    import spark.implicits._
    val in = tmp(); val ck = tmp() + "/ck"
    val ops = randomStream(seed = 47, nKeys = 6, nOps = 40)
    val lines = ops.map(toJson)
    // at-least-once delivery: batch 1, batch 2, then batch 1 REPLAYED
    writeLines(in, "b0.jsonl", lines.take(20))
    writeLines(in, "b1.jsonl", lines.drop(20))
    writeLines(in, "b2.jsonl", lines.take(20))
    // TWS requires the RocksDB state store; scope it to this query
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      Streams.lsnMonitorQuery(
        Streams.rawFileStream(spark, in, maxFilesPerTrigger = Some(1)),
        "tws_lsn", ck, availableNow = true).awaitTermination()
    } finally prevProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
    // last emission per key == batch truth: every distinct LSN applied
    // exactly once despite the replayed prefix
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"max_lsn".desc)
    val finalState = spark.table("tws_lsn")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"id", $"n_applied", $"max_lsn")
    val expected = ops.groupBy(o => o.before.orElse(o.after).get.id)
      .view.mapValues { es =>
        val lsns = es.map(_.lsn).distinct
        (lsns.length.toLong, lsns.max)
      }.toMap
    val rows = finalState.collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, mx) = expected(r.getAs[Int]("id"))
      assert(r.getAs[Long]("n_applied") == n,
        s"key ${r.getAs[Int]("id")}: applied ${r.getAs[Long]("n_applied")} != $n")
      assert(r.getAs[Long]("max_lsn") == mx)
    }
  }

  test("transformWithState lsn monitor: state survives a checkpoint restart") {
    import spark.implicits._
    val in = tmp(); val ck = tmp() + "/ck"
    val ops = randomStream(seed = 53, nKeys = 4, nOps = 24)
    val lines = ops.map(toJson)
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // memory sinks refuse checkpoint recovery — foreachBatch supports
    // it, and it's the production sink shape anyway
    val buf = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    def run(): Unit = {
      import graft.streaming.Streams.KeyProgress
      Streams.lsnMonitor(
          Streams.currentRecords(Streams.rawFileStream(spark, in)))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[KeyProgress], _: Long) =>
          val got = df.collect().map(k => (k.id, k.n_applied, k.max_lsn))
          buf.synchronized { buf ++= got }
          ()
        }
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    try {
      // run 1: first half of the log, then the query STOPS
      writeLines(in, "b0.jsonl", lines.take(12))
      run()
      // run 2: a FRESH query on the same checkpoint sees the second
      // half PLUS a replay of the first — recovered RocksDB state must
      // ignore the replayed prefix and continue counting
      writeLines(in, "b1.jsonl", lines.drop(12) ++ lines.take(12))
      run()
    } finally prevProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
    val expected = ops.groupBy(o => o.before.orElse(o.after).get.id)
      .view.mapValues { es =>
        val lsns = es.map(_.lsn).distinct
        (lsns.length.toLong, lsns.max)
      }.toMap
    // last emission per key (highest max_lsn) == batch truth: every
    // distinct LSN counted exactly once ACROSS the restart, replays
    // ignored by the recovered state
    val finalPerKey = buf.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
    assert(finalPerKey.keySet == expected.keySet)
    finalPerKey.foreach { case (id, (_, n, mx)) =>
      assert((n, mx) == expected(id),
        s"key $id: ($n, $mx) != ${expected(id)}")
    }
  }

  test("streaming funnel: per-user stage progression across micro-batches") {
    import spark.implicits._
    import graft.streaming.Streams.{FunnelEvent, FunnelProgress}
    val in = tmp(); val ck = tmp() + "/ck"
    def ev(uid: Long, et: String, t: String) =
      s"""{"user_id":$uid,"event_type":"$et","ts":"2024-01-01 $t"}"""
    // batch 1: user 1 views; user 2 clicks WITHOUT a view (must not
    // advance); user 3 views and clicks at the SAME ts (strictly-after
    // fails → click ignored)
    writeLines(in, "b1.jsonl", Seq(
      ev(1, "view", "10:00:00"), ev(2, "click", "10:00:00"),
      ev(3, "view", "10:00:05"), ev(3, "click", "10:00:05")))
    // batch 2: user 1 converts fully; user 3 clicks properly
    writeLines(in, "b2.jsonl", Seq(
      ev(1, "click", "10:01:00"), ev(1, "purchase", "10:02:00"),
      ev(3, "click", "10:00:06")))
    val schema = "user_id LONG, event_type STRING, ts TIMESTAMP"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in).as[FunnelEvent]
    Streams.funnelProgress(stream).writeStream
      .format("memory").queryName("funnel_prog")
      .option("checkpointLocation", ck).outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    // final state = last emitted row per user
    val rows = spark.table("funnel_prog").as[FunnelProgress].collect()
    val last = rows.groupBy(_.user_id).map { case (u, rs) =>
      u -> rs.maxBy(r => (r.view_ts.size + r.click_ts.size + r.purchase_ts.size))
    }
    def ts(t: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $t")
    assert(last(1L) == FunnelProgress(1L, Some(ts("10:00:00")),
      Some(ts("10:01:00")), Some(ts("10:02:00"))))
    // user 2 never viewed: no stage may be set
    assert(last(2L) == FunnelProgress(2L, None, None, None))
    // user 3: same-ts click rejected in batch 1, later click accepted
    assert(last(3L) == FunnelProgress(3L, Some(ts("10:00:05")),
      Some(ts("10:00:06")), None))
  }

  test("streaming session windows: per-key sessions close after the gap") {
    import spark.implicits._
    val in = tmp(); val out = tmp() + "/sess"; val ck = tmp() + "/ck"
    val img = SaleImage(1, "Phone", "Electronics", "100", 1, 19800, 0L)
    val base = 1718000000L
    // key 1: two bursts separated by 10 min → 2 sessions (3 + 1 events)
    val ops = Seq(
      CdcOp("c", None, Some(img), base * 1000, 1, 1),
      CdcOp("u", Some(img), Some(img), (base + 10) * 1000, 2, 2),
      CdcOp("u", Some(img), Some(img), (base + 20) * 1000, 3, 3),
      CdcOp("u", Some(img), Some(img), (base + 620) * 1000, 4, 4),
      // flush event far in the future closes all watermark state
      CdcOp("c", None, Some(img.copy(id = 2)), (base + 7200) * 1000, 5, 5))
    writeLines(in, "s.jsonl", ops.map(toJson))
    val q = Streams.sessionCounts(
      graft.cdc.Envelope.flatten(Streams.rawFileStream(spark, in)))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sess = spark.read.parquet(out).filter($"id" === 1)
      .orderBy("session_start").collect()
    assert(sess.length == 2)
    assert(sess(0).getAs[Long]("n_events") == 3)
    assert(sess(1).getAs[Long]("n_events") == 1)
  }

  test("history sink: full audit trail with op decode and injected clock") {
    val in = tmp(); val out = tmp() + "/hist"; val ck = tmp() + "/ck"
    val img = SaleImage(1, "Phone", "Electronics", "100", 1, 19800, 0L)
    val ops = Seq(
      CdcOp("c", None, Some(img), 1000L, 1, 1),
      CdcOp("u", Some(img), Some(img.copy(price = "150")), 2000L, 2, 2),
      CdcOp("d", Some(img.copy(price = "150")), None, 3000L, 3, 3))
    writeLines(in, "h.jsonl", ops.map(toJson))
    Streams.historyQuery(Streams.rawFileStream(spark, in), out, ck, fixedClock,
      availableNow = true).awaitTermination()
    val hist = spark.read.parquet(out).orderBy("event_timestamp").collect()
    assert(hist.length == 3)
    assert(hist.map(_.getAs[String]("op_description")).toSeq ==
      Seq("CREATE", "UPDATE", "DELETE"))
    // record_id unified across op types (F4): delete keys on before image
    assert(hist.forall(_.getAs[Int]("record_id") == 1))
    assert(hist.forall(_.getAs[Long]("processing_time") == 1800000000000L))
    // delete rows keep the before image, null after image
    assert(hist(2).isNullAt(hist(2).fieldIndex("after_id")))
    assert(hist(2).getAs[String]("before_price") == "150")
  }

  test("stream-static enrichment equals the batch join; misses flow null-padded") {
    import spark.implicits._
    val in = tmp(); val ck = tmp() + "/ck"
    val ops = randomStream(seed = 77, nKeys = 6, nOps = 40)
    writeLines(in, "e0.jsonl", ops.map(toJson))
    // dim covers only keys 1..4 — keys 5..6 must survive null-padded
    val dim = Seq((1L, "gold"), (2L, "gold"), (3L, "silver"), (4L, "bronze"))
      .toDF("cust_id", "tier")
    val q = Streams.enrichStream(Streams.rawFileStream(spark, in), dim, "cust_id")
      .writeStream.format("memory").queryName("enriched")
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("enriched")
    val expect = Streams.enrichStream(
      spark.read.text(in).withColumnRenamed("value", "raw_message"), dim, "cust_id")
    val cols = expect.columns.sorted.map(col).toIndexedSeq
    assert(got.count() > 0)
    // no fact dropped: every c/r/u event appears exactly once
    assert(got.count() == expect.count())
    assert(got.select(cols: _*).collect().map(_.toSeq.toString).sorted.toSeq ==
      expect.select(cols: _*).collect().map(_.toSeq.toString).sorted.toSeq)
    // unmatched keys null-padded, matched keys carry the dim attribute
    assert(got.filter($"id" > 4 && $"tier".isNotNull).count() == 0)
    assert(got.filter($"id" <= 4 && $"tier".isNull).count() == 0)

    // a dim keyed like a stream column must not clobber it (ADVICE r5:
    // the post-join drop removed EVERY column named `id`, the stream's
    // included)
    val dimId = Seq((1L, "gold"), (2L, "silver")).toDF("id", "tier")
    val batch = Streams.enrichStream(
      spark.read.text(in).withColumnRenamed("value", "raw_message"), dimId, "id")
    assert(batch.columns.count(_ == "id") == 1, batch.columns.mkString(","))
    assert(batch.filter($"id".isNull).count() == 0,
      "stream id column was dropped by the dim-key collision")
    assert(batch.filter($"id" <= 2 && $"tier".isNull).count() == 0)
  }
}
