package graft.scd2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained downstream aggregate (the "gold" layer of
  * the reference's medallion flow, closed over this repo's own change
  * feed): a rollup table `(group, sum_v, n_rows)` kept in sync with a
  * source [[VersionedTable]] by consuming [[VersionedTable.pollChanges]]
  * spans — each cycle reads O(changed rows), never the source table.
  *
  * Retraction logic: an update in a MOR source arrives as delete-key +
  * new row. The new row's contribution comes from `inserts`; the OLD
  * row's contribution is retracted by reading the deleted keys' rows
  * from the span's FROM version (manifest-pruned, small) and applying
  * them with negative sign. Groups whose row count reaches zero drop
  * out of the rollup.
  *
  * Exactly-once: the gold commit records `cfr-<consumer>-<toV>` in its
  * manifest meta ATOMICALLY with the data, and the source cursor is
  * acked after. A crash between commit and ack redelivers the span,
  * the tag check recognizes it as applied, and only the ack re-runs —
  * the same idempotence-tag protocol as the streaming lanes.
  *
  * Scale shape: delta aggregation is a partial-agg shuffle over the
  * span's rows only; the gold rewrite is O(groups) (a rollup is
  * aggregate-sized by construction — if a gold table were ever
  * partition-huge, swap `overwrite` for `replacePartitions` on the
  * touched groups like the SCD2 lane does).
  *
  * Works on append/MOR sources; a copy-on-write source that rewrites
  * files makes [[VersionedTable.changesBetween]] throw by design —
  * file-level deltas can't retract a rewritten file's rows.
  */
object ChangeFeedRollup {

  /** One poll → apply → ack cycle. Returns the version applied, or
    * None when the consumer is already caught up. */
  def applyOnce(spark: SparkSession, src: VersionedTable, gold: VersionedTable,
                consumer: String, keyCol: String, groupCol: String,
                valueCol: String): Option[Int] = {
    // Recovery fast-forward: if a crash landed between gold.overwrite
    // and ackChanges AND the source gained commits since, the naive
    // redelivered span widens to a NEW toV — its tag no longer matches
    // gold's, and the already-applied prefix would re-aggregate onto a
    // gold base that already contains it (silent double-count). Gold's
    // own manifest meta is the truth of what was applied: parse the
    // last applied version out of the most recent `cfr-<consumer>-<V>`
    // tag ANYWHERE in gold's history — not just the head commit, whose
    // meta any later non-cfr commit (an OPTIMIZE layout rewrite, a
    // vacuum checkpoint) would hide — and, if it is ahead of the source
    // cursor, replay ONLY the missing ack so the next poll starts
    // exactly after the applied span.
    def lastApplied: Option[Int] =
      if (!gold.exists) None
      else gold.findLatestMeta(_.startsWith(s"cfr-$consumer-"))
        .flatMap(_.stripPrefix(s"cfr-$consumer-").toIntOption)
    val applied = lastApplied
    applied.filter(v => v > src.cursor(consumer).getOrElse(-1))
      .foreach(v => src.ackChanges(consumer, v))
    src.pollChanges(consumer).map { p =>
      val tag = s"cfr-$consumer-${p.toV}"
      if (gold.exists && applied.contains(p.toV)) {
        // crash happened between gold commit and ack: already applied
        src.ackChanges(consumer, p.toV)
        p.toV
      } else {
        def signed(df: DataFrame, sign: Int): DataFrame =
          df.groupBy(col(groupCol).as("grp"))
            .agg((sum(col(valueCol)) * sign).as("sum_v"),
              (count(lit(1)) * sign).as("n_rows"))
        val plus = signed(p.inserts, 1)
        val deltas = p.deleteKeys match {
          case None => plus
          case Some(keys) =>
            val oldRows = src.readVersion(p.fromV)
              .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
            plus.unionByName(signed(oldRows, -1))
        }
        val base =
          if (gold.exists && !p.initial) gold.read()
          else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            deltas.schema)
        val next = base.unionByName(deltas)
          .groupBy(col("grp"))
          .agg(sum(col("sum_v")).as("sum_v"), sum(col("n_rows")).as("n_rows"))
          .filter(col("n_rows") > 0)
        gold.overwrite(next, meta = Some(tag))
        src.ackChanges(consumer, p.toV)
        p.toV
      }
    }
  }

  /** Drain every pending span (poll until caught up). Returns the
    * versions applied, oldest first. */
  def drain(spark: SparkSession, src: VersionedTable, gold: VersionedTable,
            consumer: String, keyCol: String, groupCol: String,
            valueCol: String): Seq[Int] =
    Iterator.continually(
      applyOnce(spark, src, gold, consumer, keyCol, groupCol, valueCol))
      .takeWhile(_.isDefined).flatten.toSeq
}
