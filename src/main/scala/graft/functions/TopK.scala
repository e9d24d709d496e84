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
