package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.scd2.{JoinViewMaintainer, Partitioning, VersionedTable}

/** The two-source incrementally-maintained join view: gold must equal
  * the full A ⋈ B recompute after EVERY interleaving of independent
  * MOR commits, and the two-source idempotence-tag protocol must
  * survive lost acks and widened spans on either side. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("jvspec").toString

  private val cfg = JoinViewMaintainer.Config(
    consumer = "jv", joinCol = "k", aKey = "a_id", bKey = "b_id")

  private def fullJoin(a: VersionedTable, b: VersionedTable): Set[(Int, Int, Long, Long, Int)] =
    a.read().join(b.read(), "k")
      .select($"a_id", $"k", $"av", $"bv", $"b_id")
      .as[(Int, Int, Long, Long, Int)].collect().toSet

  private def goldSet(gold: VersionedTable): Set[(Int, Int, Long, Long, Int)] =
    gold.read().select($"a_id", $"k", $"av", $"bv", $"b_id")
      .as[(Int, Int, Long, Long, Int)].collect().toSet

  test("join view equals full recompute across interleaved MOR commits") {
    val a = new VersionedTable(spark, tmp(), Partitioning.BucketBy("a_id", 4))
    val b = new VersionedTable(spark, tmp(), Partitioning.BucketBy("b_id", 4))
    val gold = new VersionedTable(spark, tmp())
    def touchedA(ids: Int*) =
      a.partitionValues(ids.map(i => (i, 0, 0L)).toDF("a_id", "k", "av"))
    def touchedB(ids: Int*) =
      b.partitionValues(ids.map(i => (i, 0, 0L)).toDF("b_id", "k", "bv"))
    def check(): Unit = {
      JoinViewMaintainer.drain(spark, a, b, gold, cfg)
      assert(goldSet(gold) == fullJoin(a, b),
        s"view drifted:\n got ${goldSet(gold)}\nwant ${fullJoin(a, b)}")
    }
    // bootstrap: both snapshots
    a.overwrite(Seq((1, 10, 100L), (2, 10, 200L), (3, 20, 300L))
      .toDF("a_id", "k", "av"))                                        // A v0
    b.overwrite(Seq((7, 10, 7L), (8, 20, 8L), (9, 30, 9L))
      .toDF("b_id", "k", "bv"))                                        // B v0
    check()
    // A-side update (a 2 moves to join key 20) + insert + delete
    a.mergeDeltas(Seq((2, 20, 250L), (4, 30, 400L)).toDF("a_id", "k", "av"),
      Seq(Tuple1(2)).toDF("a_id"), touchedA(2, 4))                     // A v1
    check()
    // B-side: delete the key-10 dim row, update key 30's payload
    b.mergeDeltas(Seq((9, 30, 90L)).toDF("b_id", "k", "bv"),
      Seq(Tuple1(7), Tuple1(9)).toDF("b_id"), touchedB(7, 9))          // B v1
    check()
    // both sides pending before one drain (interleaving inside drain)
    a.mergeDeltas(Seq((5, 30, 500L)).toDF("a_id", "k", "av"),
      Seq(Tuple1(3)).toDF("a_id"), touchedA(3, 5))                     // A v2
    b.mergeDeltas(Seq((7, 30, 70L)).toDF("b_id", "k", "bv"),
      spark.emptyDataset[Tuple1[Int]].toDF("b_id"), touchedB(7))       // B v2
    check()
    // dim row moves join key: every fact row re-associates
    b.mergeDeltas(Seq((8, 30, 80L)).toDF("b_id", "k", "bv"),
      Seq(Tuple1(8)).toDF("b_id"), touchedB(8))                        // B v3
    check()
  }

  test("crash replay and widened spans on either source never double-apply") {
    val a = new VersionedTable(spark, tmp(), Partitioning.BucketBy("a_id", 4))
    val b = new VersionedTable(spark, tmp(), Partitioning.BucketBy("b_id", 4))
    val gold = new VersionedTable(spark, tmp())
    def touchedA(ids: Int*) =
      a.partitionValues(ids.map(i => (i, 0, 0L)).toDF("a_id", "k", "av"))
    def touchedB(ids: Int*) =
      b.partitionValues(ids.map(i => (i, 0, 0L)).toDF("b_id", "k", "bv"))
    a.overwrite(Seq((1, 10, 100L), (2, 20, 200L)).toDF("a_id", "k", "av")) // A v0
    b.overwrite(Seq((7, 10, 7L), (8, 20, 8L)).toDF("b_id", "k", "bv"))     // B v0
    JoinViewMaintainer.drain(spark, a, b, gold, cfg)
    a.mergeDeltas(Seq((3, 10, 300L)).toDF("a_id", "k", "av"),
      Seq(Tuple1(1)).toDF("a_id"), touchedA(1, 3))                         // A v1
    JoinViewMaintainer.drain(spark, a, b, gold, cfg)
    val want1 = fullJoin(a, b)
    assert(goldSet(gold) == want1)

    // lost ack on A: rewind the cursor to v0, re-apply — the jv tag
    // recognizes the span as applied, the view must not change
    val goldHead = gold.currentHead.get
    a.ackChanges("jv-A", 0)
    JoinViewMaintainer.applyFromA(spark, a, b, gold, cfg)
    assert(gold.currentHead.get == goldHead, "replayed A span re-applied")
    assert(goldSet(gold) == want1)

    // lost ack AND a new A commit before recovery (widened span): the
    // fast-forward from gold's tag must keep the applied prefix out
    a.ackChanges("jv-A", 0)
    a.mergeDeltas(Seq((4, 20, 400L)).toDF("a_id", "k", "av"),
      Seq(Tuple1(2)).toDF("a_id"), touchedA(2, 4))                         // A v2
    JoinViewMaintainer.drain(spark, a, b, gold, cfg)
    assert(goldSet(gold) == fullJoin(a, b),
      "widened A span double-applied onto the view")

    // same on B, with a maintenance commit hiding the tag from the head
    b.mergeDeltas(Seq((8, 10, 80L)).toDF("b_id", "k", "bv"),
      Seq(Tuple1(8)).toDF("b_id"), touchedB(8))                            // B v1
    JoinViewMaintainer.drain(spark, a, b, gold, cfg)
    b.ackChanges("jv-B", 0)
    gold.optimize(Seq("k"))
    JoinViewMaintainer.drain(spark, a, b, gold, cfg)
    assert(goldSet(gold) == fullJoin(a, b),
      "optimize hid the jv tag; B span re-applied")
  }
}
