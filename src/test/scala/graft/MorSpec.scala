package graft

import graft.cdc.{CdcFixtures, Envelope}
import graft.scd2.{Partitioning, Scd2Job, VersionedTable}
import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

/** Merge-on-read commits (VERDICT r2 missing #3): equality-delete files
  * instead of bucket rewrites, the reference table's own write mode
  * (`scd2_spark_processor.py:155`, `write.merge.mode=merge-on-read`).
  * Contract: MOR and copy-on-write produce IDENTICAL table contents;
  * MOR never rewrites a pre-existing file; compaction folds deltas.
  */
class MorSpec extends SparkSpec {
  import CdcFixtures._
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("mor").toString

  test("mergeDeltas: update is delete-key + new row; prior files untouched") {
    val t = new VersionedTable(spark, tmp(), Partitioning.BucketBy("id", 4))
    t.overwrite((1 to 8).map(i => (i, s"v$i")).toDF("id", "v"))      // v0
    val v0files = t.manifestDetail(0).toSet
    // update id 3, insert id 9 — one delta commit
    t.mergeDeltas(
      newRows = Seq((3, "v3b"), (9, "v9")).toDF("id", "v"),
      deleteKeys = Seq(Tuple1(3)).toDF("id"),
      touched = t.partitionValues(Seq((3, ""), (9, "")).toDF("id", "v")))
    val v1 = t.manifestDetail(1)
    // every v0 file carried BY REFERENCE; the delta adds data + delete entries
    assert(v0files.subsetOf(v1.toSet), "MOR must not rewrite prior files")
    assert(v1.exists(_._3 == "x"), "delete entries recorded")
    assert(v1.count(_._3 == "x") >= 1 && v1.exists(e => e._3 == "d" && e._4 == 1))
    // read resolves: id 3 shows the new value exactly once, id 9 present
    val rows = t.read().as[(Int, String)].collect().toMap
    assert(rows.size == 9 && rows(3) == "v3b" && rows(9) == "v9" && rows(1) == "v1")
    // time travel to the pre-delta snapshot is unaffected
    assert(t.readVersion(0).as[(Int, String)].collect().toMap.apply(3) == "v3")
  }

  test("delete seq ordering: same-commit inserts survive, older rows die") {
    val t = new VersionedTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("id", "v"))                       // v0
    t.mergeDeltas(Seq((1, "b")).toDF("id", "v"), Seq(Tuple1(1)).toDF("id"), Seq("")) // v1
    t.mergeDeltas(Seq((1, "c")).toDF("id", "v"), Seq(Tuple1(1)).toDF("id"), Seq("")) // v2
    assert(t.read().as[(Int, String)].collect().toSeq == Seq((1, "c")))
    assert(t.readVersion(1).as[(Int, String)].collect().toSeq == Seq((1, "b")))
    assert(t.readVersion(0).as[(Int, String)].collect().toSeq == Seq((1, "a")))
    // compaction folds the deltas into pure data files, contents intact
    val vc = t.compact(targetFileCount = 1)
    assert(t.manifestDetail(vc).forall(_._3 == "d"), "no delete entries after compact")
    assert(t.read().as[(Int, String)].collect().toSeq == Seq((1, "c")))
    // vacuum reclaims the now-unreferenced delta files
    t.vacuum(keepVersions = 1)
    assert(t.read().as[(Int, String)].collect().toSeq == Seq((1, "c")))
  }

  test("MOR current-state upsert ≡ copy-on-write, with zero file rewrites") {
    def mkBatch(rows: Seq[(Int, String, Long, Long, Boolean)]): DataFrame =
      rows.toDF("id", "product_name", "last_updated_ts", "lsn", "is_deleted")
        .select($"id", $"product_name", lit("cat").as("category"),
          lit(1.0).as("price"), lit(1).as("quantity"), lit(0L).as("sale_date"),
          lit(0L).as("created_at"), $"last_updated_ts", $"is_deleted", $"lsn")
    val batches = Seq(
      Seq((1, "a", 100L, 1L, false), (2, "b", 100L, 2L, false)),
      Seq((1, "a2", 200L, 3L, false), (3, "c", 150L, 4L, false)),
      Seq((1, "aSTALE", 50L, 0L, false), (2, "b2", 100L, 9L, false)), // stale + lsn tiebreak
      Seq((3, "c2", 150L, 4L, true))) // equal (ts,lsn) replay-style: >= lets source win
    val cow = new Streams.CurrentStateTable(spark, tmp(), buckets = 4)
    val morT = new Streams.CurrentStateTable(spark, tmp(), buckets = 4, mor = true)
    batches.foreach { b => cow.upsert(mkBatch(b)); morT.upsert(mkBatch(b)) }
    val a = cow.read().orderBy("id").collect().toSeq
    val b = morT.read().orderBy("id").collect().toSeq
    assert(a == b, s"MOR drifted from COW:\n$a\nvs\n$b")
    // the bootstrap snapshot's files were never rewritten by MOR upserts
    val v0 = morT.table.manifestDetail(0).toSet
    val head = morT.table.currentHead.get
    assert(v0.subsetOf(morT.table.manifestDetail(head).toSet))
  }

  test("MOR read plans a constant number of scans regardless of delta commits") {
    val t = new VersionedTable(spark, tmp())
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    (1 to 6).foreach { i =>
      t.mergeDeltas(Seq((1, s"a$i")).toDF("id", "v"), Seq(Tuple1(1)).toDF("id"), Seq(""))
    }
    // contents resolve across all 6 delta generations
    assert(t.read().as[(Int, String)].collect().toMap == Map(1 -> "a6", 2 -> "b"))
    // one data scan + one delete scan via the broadcast file→seq map —
    // NOT one scan per delta commit (7 data + 6 delete generations here)
    val scans = "FileScan parquet|Scan parquet".r
      .findAllIn(t.read().queryExecution.executedPlan.toString).length
    assert(scans <= 2, s"MOR read planned $scans parquet scans, expected <= 2")
  }

  test("compactPartitions folds only the targeted partition's deltas") {
    val t = new VersionedTable(spark, tmp(), Partitioning.BucketBy("id", 4))
    t.overwrite((1 to 16).map(i => (i, s"v$i")).toDF("id", "v"))
    def delta(id: Int, v: String): Unit = {
      val rows = Seq((id, v)).toDF("id", "v")
      t.mergeDeltas(rows, Seq(Tuple1(id)).toDF("id"), t.partitionValues(rows))
      ()
    }
    // deltas across ids until at least two buckets carry delete files
    var id = 1
    while (t.partitionsWithDeltas.size < 2) { delta(id, s"v${id}b"); id += 1 }
    val withDeltas = t.partitionsWithDeltas
    val target = Seq(withDeltas.head)
    val before = t.read().orderBy("id").as[(Int, String)].collect().toSeq
    val vc = t.compactPartitions(target)
    val detail = t.manifestDetail(vc)
    // the targeted partition is delete-free; the untargeted one kept its deltas
    assert(!detail.exists(e => e._3 == "x" && e._1 == target.head))
    assert(detail.exists(e => e._3 == "x" && e._1 == withDeltas(1)))
    assert(t.read().orderBy("id").as[(Int, String)].collect().toSeq == before)
  }

  // ---- SCD2 lane: golden equivalence against the COW merge ----------
  private val fixedClock = () => Timestamp.from(Instant.ofEpochSecond(1800000000L))
  private def bronzeOf(ops: Seq[CdcOp]): DataFrame =
    Envelope.toBronze(Envelope.flatten(ops.map(toJson).toDF("raw_message")))
  private def runBatches(batches: Seq[Seq[CdcOp]], mor: Boolean): Scd2Job = {
    val staging = tmp() + "/staging"
    val job = new Scd2Job(spark, staging, tmp() + "/table", tmp() + "/ck",
      fixedClock, mor = mor)
    batches.foreach { ops =>
      bronzeOf(ops).write.mode("append").partitionBy("dt").parquet(staging)
      job.run()
    }
    job
  }
  private val t0 = 1718000000L
  private def op(kind: String, key: Int, price: String, atSec: Long, lsn: Long): CdcOp = {
    val img = SaleImage(key, "Phone", "Electronics", price, 1, 19800, atSec * 1000000)
    kind match {
      case "c" | "r" => CdcOp(kind, None, Some(img), atSec * 1000, lsn, lsn)
      case "u" => CdcOp("u", Some(img), Some(img), atSec * 1000, lsn, lsn)
      case "d" => CdcOp("d", Some(img), None, atSec * 1000, lsn, lsn)
    }
  }

  test("streaming MOR lane: scd2Query(mor) ≡ COW lane, deltas actually committed") {
    import java.nio.file.{Files => JFiles, Paths}
    def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
      JFiles.createDirectories(Paths.get(dir))
      JFiles.write(Paths.get(dir, name), String.join("\n", lines: _*).getBytes)
      ()
    }
    val ops = randomStream(seed = 77, nKeys = 6, nOps = 40,
      minStepMs = 1001, maxStepMs = 2000)
    val (b1, b2) = ops.splitAt(25)
    def lane(mor: Boolean): VersionedTable = {
      val in = tmp(); val root = tmp() + "/tab"; val ck = tmp() + "/ck"
      writeLines(in, "a.jsonl", b1.map(toJson))
      Streams.scd2Query(Streams.rawFileStream(spark, in), root, ck,
        availableNow = true, mor = mor).awaitTermination()
      writeLines(in, "b.jsonl", b2.map(toJson))
      Streams.scd2Query(Streams.rawFileStream(spark, in), root, ck,
        availableNow = true, mor = mor).awaitTermination()
      new VersionedTable(spark, root, Partitioning.BucketBy("id", 16))
    }
    val cow = lane(mor = false); val morT = lane(mor = true)
    val order = Seq("id", "effective_start_ts", "is_current", "record_hash")
    val a = cow.read().orderBy(order.map(col): _*).collect().toSeq
    val b = morT.read().orderBy(order.map(col): _*).collect().toSeq
    assert(a == b, "streaming MOR lane drifted from COW")
    val head = morT.currentHead.get
    assert(morT.manifestDetail(head).exists(_._3 == "x"),
      "second micro-batch should have committed equality-delete files")
  }

  test("MOR SCD2 ≡ COW across lifecycle batches incl delete + same-second reinsert") {
    val batches = Seq(
      (1 to 5).map(k => op("c", k, "100", t0 + k, k.toLong)),
      Seq(op("u", 1, "200", t0 + 100, 10), op("u", 2, "300", t0 + 101, 11)),
      Seq(op("d", 3, "100", t0 + 200, 20),
        op("d", 1, "200", t0 + 201, 21), op("c", 1, "200", t0 + 201, 22)), // reinsert, same second + same attrs
      Seq(op("u", 1, "500", t0 + 300, 30))) // closes the reinserted current row
    val cow = runBatches(batches, mor = false)
    val morJ = runBatches(batches, mor = true)
    val order = Seq("id", "effective_start_ts", "is_current", "record_hash",
      "effective_end_ts", "is_deleted")
    val a = cow.table.read().orderBy(order.map(col): _*).collect().toSeq
    val b = morJ.table.read().orderBy(order.map(col): _*).collect().toSeq
    assert(a == b, s"MOR SCD2 drifted from COW:\n${a.mkString("\n")}\nvs\n${b.mkString("\n")}")
    // and the MOR run never rewrote the bootstrap files
    val v0 = morJ.table.manifestDetail(0).toSet
    assert(v0.subsetOf(morJ.table.manifestDetail(morJ.table.currentHead.get).toSet))
    // compaction preserves contents
    morJ.table.compact(targetFileCount = 2)
    val c = morJ.table.read().drop("effective_start_date")
      .orderBy(order.map(col): _*).collect().toSeq
    val aNoDate = cow.table.read().drop("effective_start_date")
      .orderBy(order.map(col): _*).collect().toSeq
    assert(c == aNoDate)
  }

  test("change feed replay law: from-snapshot − deletes + inserts = to-snapshot") {
    val t = new VersionedTable(spark, tmp(), Partitioning.BucketBy("id", 4))
    t.overwrite((1 to 8).map(i => (i, s"v$i")).toDF("id", "v"))          // v0
    t.append(Seq((9, "v9"), (10, "v10")).toDF("id", "v"))                // v1
    t.mergeDeltas(Seq((3, "v3b"), (11, "v11")).toDF("id", "v"),          // v2
      Seq(Tuple1(3)).toDF("id"),
      touched = t.partitionValues(Seq((3, ""), (11, "")).toDF("id", "v")))
    t.mergeDeltas(Seq((11, "v11b")).toDF("id", "v"),                     // v3
      Seq(Tuple1(11)).toDF("id"),
      touched = t.partitionValues(Seq((11, "")).toDF("id", "v")))
    def snap(v: Int) = t.readVersion(v).as[(Int, String)].collect().toSet
    for (from <- 0 to 3; to <- from to 3) {
      val (ins, delKeys) = t.changesBetween(from, to)
      val inserted = ins.as[(Int, String)].collect().toSet
      val deletedIds = delKeys.map(_.as[Int].collect().toSet).getOrElse(Set.empty)
      val replayed = snap(from).filterNot(r => deletedIds(r._1)) ++ inserted
      assert(replayed == snap(to), s"replay law broke for ($from, $to)")
    }
    // insert-then-delete WITHIN the span never surfaces as an insert:
    // v2 added id 11, v3 deleted+replaced it — the (v1, v3) feed must
    // carry only the surviving v11b row
    val (ins13, _) = t.changesBetween(1, 3)
    assert(ins13.filter($"id" === 11).as[(Int, String)].collect().toSeq ==
      Seq((11, "v11b")))
    // rewrites (compaction) break file-level replay → throw by default,
    // proceed only on explicit opt-in
    val vc = t.compact(targetFileCount = 1)                              // v4
    intercept[IllegalStateException] { t.changesBetween(3, vc) }
    val (insR, _) = t.changesBetween(3, vc, ignoreRewrites = true)
    assert(insR.count() > 0)
    // non-ancestor pairs are rejected (branch commits can't feed trunk)
    intercept[IllegalArgumentException] { t.changesBetween(2, 1) }
  }

  test("consumer cursor: poll/ack redelivery, catch-up, and vacuum pinning") {
    val t = new VersionedTable(spark, tmp())
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"))                 // v0
    // bootstrap: first poll is the full snapshot
    val p0 = t.pollChanges("etl").get
    assert(p0.initial && p0.toV == 0 && p0.inserts.count() == 2)
    t.ackChanges("etl", p0.toV)
    assert(t.pollChanges("etl").isEmpty) // caught up
    t.append(Seq((3, "c")).toDF("id", "v"))                              // v1
    // crash between poll and ack → the SAME span is redelivered
    val p1a = t.pollChanges("etl").get
    val p1b = t.pollChanges("etl").get
    assert(!p1a.initial && p1a.fromV == 0 && p1a.toV == 1)
    assert(p1b.fromV == p1a.fromV && p1b.toV == p1a.toV)
    assert(p1a.inserts.as[(Int, String)].collect().toSeq == Seq((3, "c")))
    t.ackChanges("etl", p1a.toV)
    assert(t.pollChanges("etl").isEmpty)
    // cursors are not branches, and vacuum pins a lagging cursor's
    // version so its next poll can still resolve the span
    assert(t.branches.forall(_._1 != "cursor.etl"))
    assert(t.cursors == Seq("etl" -> 1))
    t.append(Seq((4, "d")).toDF("id", "v"))                              // v2
    t.append(Seq((5, "e")).toDF("id", "v"))                              // v3
    t.vacuum(keepVersions = 1)
    val p2 = t.pollChanges("etl").get
    assert(p2.fromV == 1 && p2.toV == 3)
    assert(p2.inserts.as[(Int, String)].collect().toSet ==
      Set((4, "d"), (5, "e")))
    t.ackChanges("etl", p2.toV)
    // acking an uncommitted version is refused
    intercept[IllegalArgumentException] { t.ackChanges("etl", 99) }
  }

  test("change-feed rollup: incremental gold equals recompute at every step") {
    import graft.scd2.ChangeFeedRollup
    val src = new VersionedTable(spark, tmp(), Partitioning.BucketBy("id", 4))
    val gold = new VersionedTable(spark, tmp())
    def touched(ids: Int*) =
      src.partitionValues(ids.map(i => (i, "", 0L)).toDF("id", "seg", "amount"))
    def check(): Unit = {
      ChangeFeedRollup.drain(spark, src, gold, "gold", "id", "seg", "amount")
      val got = gold.read().as[(String, Long, Long)].collect().toSet
      val want = src.read().groupBy($"seg")
        .agg(sum($"amount").as("s"), count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"gold drifted:\n got $got\nwant $want")
    }
    src.overwrite(Seq((1, "A", 10L), (2, "A", 20L), (3, "B", 5L))
      .toDF("id", "seg", "amount"))                                      // v0
    check()
    // update moves id 2 to another group; id 4 inserted — both spans'
    // retractions must hit the OLD row's group
    src.mergeDeltas(Seq((2, "B", 25L), (4, "C", 7L)).toDF("id", "seg", "amount"),
      Seq(Tuple1(2)).toDF("id"), touched(2, 4))                          // v1
    check()
    // two commits drained in ONE span, incl. delete-only and a key
    // updated twice (insert+delete inside the span must net out)
    src.mergeDeltas(spark.emptyDataset[(Int, String, Long)].toDF("id", "seg", "amount"),
      Seq(Tuple1(3)).toDF("id"), touched(3))                             // v2
    src.mergeDeltas(Seq((4, "C", 9L)).toDF("id", "seg", "amount"),
      Seq(Tuple1(4)).toDF("id"), touched(4))                             // v3
    src.mergeDeltas(Seq((4, "A", 11L)).toDF("id", "seg", "amount"),
      Seq(Tuple1(4)).toDF("id"), touched(4))                             // v4
    check()
    // crash between gold commit and ack: rewind the cursor, re-apply —
    // the idempotence tag recognizes the span as applied, gold does not
    // advance, and the cursor re-acks
    val goldHead = gold.currentHead.get
    val srcHead = src.currentHead.get
    src.ackChanges("gold", 1) // simulate lost ack
    ChangeFeedRollup.applyOnce(spark, src, gold, "gold", "id", "seg", "amount")
    assert(gold.currentHead.get == goldHead, "double-applied after crash replay")
    assert(src.cursor("gold").contains(srcHead))
    check()
    // crash between gold commit and ack AND the source gains a commit
    // before recovery: the redelivered span widens to a NEW toV, so
    // the idempotence tag alone cannot recognize the applied prefix —
    // recovery must fast-forward the cursor from gold's cfr tag before
    // polling, else (v1, v4] re-aggregates onto a gold that already
    // contains it (ADVICE r5: silent double-count)
    src.ackChanges("gold", 1) // lost ack again
    src.mergeDeltas(Seq((5, "B", 13L)).toDF("id", "seg", "amount"),
      Seq(Tuple1(5)).toDF("id"), touched(5))                             // v5
    ChangeFeedRollup.applyOnce(spark, src, gold, "gold", "id", "seg", "amount")
    val got = gold.read().as[(String, Long, Long)].collect().toSet
    val want = src.read().groupBy($"seg")
      .agg(sum($"amount").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"widened-span replay double-counted:\n got $got\nwant $want")
    // a non-cfr commit on gold AFTER the apply (here: an OPTIMIZE layout
    // rewrite) hides the tag from latestMeta — recovery must find it in
    // gold's HISTORY, else a lost-ack redelivery re-aggregates the span
    // (ADVICE r6: silent double-count behind optimize)
    src.ackChanges("gold", 1) // lost ack yet again
    gold.optimize(Seq("grp"))
    ChangeFeedRollup.applyOnce(spark, src, gold, "gold", "id", "seg", "amount")
    val got2 = gold.read().as[(String, Long, Long)].collect().toSet
    assert(got2 == want, s"optimize hid the cfr tag; span re-applied:\n got $got2\nwant $want")
    assert(src.cursor("gold").contains(src.currentHead.get))
  }
}
