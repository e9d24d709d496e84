package graft.scd2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view over TWO versioned sources — the
  * materialized-view shape (Delta Live Tables / Materialize) the
  * medallion flow needs one level above [[ChangeFeedRollup]]'s
  * single-source aggregate: `gold = A ⋈ B` on a shared equality
  * column, kept EXACTLY equal to `A@appliedA ⋈ B@appliedB` at every
  * commit while both sources take independent MOR commits.
  *
  * Delta algebra — one side per apply, exact by induction. Applying a
  * span `fromV→toV` of A:
  *
  *   gold′ = (gold  ANTI-JOIN  span.deleteKeys ON aKey)
  *           UNION  (span.inserts ⋈ B.readVersion(appliedB))
  *
  * and symmetrically for B. The OTHER side is read AS OF its APPLIED
  * version — time travel is what makes interleaved commits exact: the
  * apply joins against the exact snapshot the view already reflects,
  * not a racing head. Each apply moves one coordinate of
  * (appliedA, appliedB), so `gold == A@appliedA ⋈ B@appliedB` holds
  * for ANY interleaving (JoinViewSpec pins it against full recomputes,
  * including crash-replay and widened-span recovery).
  *
  * MOR updates need no special case: an update arrives as delete-key +
  * new row in one span — the retraction drops the old joined rows, the
  * insert re-joins the new ones. Span-internal churn is already folded
  * by [[VersionedTable.changesBetween]]'s replay law.
  *
  * Exactly-once: the gold commit's manifest meta records BOTH applied
  * versions (`jv-<consumer>-a<vA>-b<vB>`) atomically with the data;
  * cursors ack after. On recovery the most recent tag ANYWHERE in
  * gold's history (not just the head — maintenance commits may sit on
  * top) fast-forwards a lost-ack cursor, so a redelivered or WIDENED
  * span can never re-apply — the [[ChangeFeedRollup]] cfr protocol in
  * its two-source form.
  *
  * Scale shape: each apply reads O(span) changed rows and joins them
  * against the other side once (broadcast when the span is small — the
  * steady state); the retraction is a keyed anti-join on the view. The
  * view rewrite is `overwrite` here; a view too big to rewrite swaps
  * in partition-scoped `replacePartitions` on joinCol buckets, the
  * same upgrade path the rollup documents.
  */
object JoinViewMaintainer {

  /** @param joinCol shared equality-join column name
    * @param aKey    A's equality-delete key column (must be in gold)
    * @param bKey    B's equality-delete key column (must be in gold) */
  final case class Config(consumer: String, joinCol: String,
                          aKey: String, bKey: String)

  private def tag(c: Config, vA: Int, vB: Int) =
    s"jv-${c.consumer}-a$vA-b$vB"
  // -?: the bootstrap tag legitimately records -1 for the side that
  // has not applied yet
  private val TagRe = """jv-(.+)-a(-?\d+)-b(-?\d+)""".r

  /** Both applied versions from the most recent jv tag in gold's
    * history; (-1, -1) when the view has never been written. */
  def applied(gold: VersionedTable, c: Config): (Int, Int) =
    if (!gold.exists) (-1, -1)
    else gold.findLatestMeta {
      case TagRe(name, _, _) => name == c.consumer
      case _ => false
    }.collect {
      case TagRe(_, va, vb) => (va.toInt, vb.toInt)
    }.getOrElse((-1, -1))

  /** Apply one pending span of A (if any); returns the A version applied. */
  def applyFromA(spark: SparkSession, a: VersionedTable, b: VersionedTable,
                 gold: VersionedTable, c: Config): Option[Int] =
    applySide(spark, a, b, gold, c, aSide = true)

  /** Apply one pending span of B (if any); returns the B version applied. */
  def applyFromB(spark: SparkSession, a: VersionedTable, b: VersionedTable,
                 gold: VersionedTable, c: Config): Option[Int] =
    applySide(spark, b, a, gold, c, aSide = false)

  private def applySide(spark: SparkSession, src: VersionedTable,
                        other: VersionedTable, gold: VersionedTable,
                        c: Config, aSide: Boolean): Option[Int] = {
    val consumer = s"${c.consumer}-${if (aSide) "A" else "B"}"
    val (appA, appB) = applied(gold, c)
    val srcApplied = if (aSide) appA else appB
    // recovery fast-forward: gold's tag is the truth of what was
    // applied; a lost ack leaves the cursor behind it
    if (srcApplied > src.cursor(consumer).getOrElse(-1))
      src.ackChanges(consumer, srcApplied)
    src.pollChanges(consumer).map { p =>
      if (srcApplied >= p.toV) { // redelivered, already in the view
        src.ackChanges(consumer, p.toV)
        p.toV
      } else {
        require(other.exists,
          "join view: both sources need a first commit before draining " +
            "(the other side's schema anchors the empty pre-apply snapshot)")
        val otherApplied = if (aSide) appB else appA
        // the other side AS OF what the view reflects; empty before
        // its first apply (the view then holds no joined rows yet)
        val otherDf =
          if (otherApplied >= 0) other.readVersion(otherApplied)
          else other.read().limit(0)
        val joined = p.inserts.join(otherDf, c.joinCol)
        val srcKey = if (aSide) c.aKey else c.bKey
        val base =
          if (gold.exists && !p.initial) gold.read()
          else joined.limit(0)
        val retained = p.deleteKeys match {
          case None => base
          case Some(keys) =>
            base.join(keys.select(col(srcKey)).distinct(), Seq(srcKey), "left_anti")
        }
        val next = retained.unionByName(joined.select(retained.columns.map(col): _*))
        val (vA, vB) =
          if (aSide) (p.toV, otherApplied) else (otherApplied, p.toV)
        gold.overwrite(next, meta = Some(tag(c, vA, vB)))
        src.ackChanges(consumer, p.toV)
        p.toV
      }
    }
  }

  /** Drain every pending span of both sources (alternating until both
    * are caught up). Returns (aVersions, bVersions) applied. */
  def drain(spark: SparkSession, a: VersionedTable, b: VersionedTable,
            gold: VersionedTable, c: Config): (Seq[Int], Seq[Int]) = {
    val as = scala.collection.mutable.ArrayBuffer.empty[Int]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var progressed = true
    while (progressed) {
      val ra = applyFromA(spark, a, b, gold, c)
      val rb = applyFromB(spark, a, b, gold, c)
      ra.foreach(as += _); rb.foreach(bs += _)
      progressed = ra.isDefined || rb.isDefined
    }
    (as.toSeq, bs.toSeq)
  }
}
