package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed top-k aggregator (SURVEY §2.11 extension surface): keeps the k
  * best (score, id) pairs per group with map-side partial aggregation.
  *
  * Why this beats the window formulation at scale: `row_number over
  * (partition by query)` shuffles EVERY scored row to the query's
  * reducer (n_corpus rows per query); this aggregator reduces each map
  * partition to ≤ k rows before the exchange — shuffle volume drops
  * from O(corpus) to O(k × partitions).
  *
  * Ordering: score DESC, then id ASC — ties must break identically to
  * the window/oracle formulation, so scores are expected pre-rounded.
  */
final case class Scored(id: Long, score: Double)

class TopK(k: Int) extends Aggregator[Scored, mutable.ArrayBuffer[Scored], Seq[Scored]] {
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: mutable.ArrayBuffer[Scored] = mutable.ArrayBuffer.empty

  private def trim(b: mutable.ArrayBuffer[Scored]): mutable.ArrayBuffer[Scored] = {
    if (b.length > k) {
      val kept = b.sorted(ord).take(k)
      b.clear(); b ++= kept
    }
    b
  }

  override def reduce(b: mutable.ArrayBuffer[Scored], a: Scored) = {
    b += a
    // amortize: only re-sort when the buffer doubles past k
    if (b.length >= 2 * k) trim(b) else b
  }

  override def merge(x: mutable.ArrayBuffer[Scored], y: mutable.ArrayBuffer[Scored]) =
    trim(x ++= y)

  override def finish(b: mutable.ArrayBuffer[Scored]): Seq[Scored] =
    b.sorted(ord).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Scored]] =
    Encoders.kryo[mutable.ArrayBuffer[Scored]]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

/** (term, doc)-level posting fed to [[IndexStats]]: `occ` is the
  * term's occurrence count within the doc. */
final case class Posting(docId: Long, occ: Long)

/** Buffer for [[IndexStats]] — two running sums and a ≤2k id buffer. */
final case class IndexBuf(var cf: Long, var df: Long,
                          ids: mutable.ArrayBuffer[Long])

/** Per-term inverted-index stats in ONE bounded buffer: collection
  * frequency (Σ occ), document frequency (input-row count — the input
  * is the distinct (term, doc) pre-aggregate), and the k SMALLEST doc
  * ids as the posting-list head. Fusing all three into one aggregator
  * lets a single (w, doc_id)-keyed corpus exchange serve the whole
  * index build — the separate stats pass, its localCheckpoint, the
  * broadcast semi-join and the second corpus-sized exchange of the
  * unfused formulation all disappear. Per-group state stays ≤ 2k ids
  * regardless of df (amortized trim, the [[TopK]] discipline), and
  * map-side partial aggregation bounds shuffle volume at
  * O(k × partitions) per term. */
class IndexStats(k: Int)
    extends Aggregator[Posting, IndexBuf, (Long, Long, String)] {
  override def zero: IndexBuf = IndexBuf(0L, 0L, mutable.ArrayBuffer.empty)

  private def trim(b: IndexBuf): IndexBuf = {
    if (b.ids.length > k) {
      val kept = b.ids.sorted.take(k)
      b.ids.clear(); b.ids ++= kept
    }
    b
  }

  override def reduce(b: IndexBuf, a: Posting): IndexBuf = {
    b.cf += a.occ; b.df += 1; b.ids += a.docId
    if (b.ids.length >= 2 * k) trim(b) else b
  }

  override def merge(x: IndexBuf, y: IndexBuf): IndexBuf = {
    x.cf += y.cf; x.df += y.df; x.ids ++= y.ids
    trim(x)
  }

  override def finish(b: IndexBuf): (Long, Long, String) =
    (b.cf, b.df, b.ids.sorted.take(k).mkString(","))

  override def bufferEncoder: Encoder[IndexBuf] = Encoders.kryo[IndexBuf]
  override def outputEncoder: Encoder[(Long, Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)
}
