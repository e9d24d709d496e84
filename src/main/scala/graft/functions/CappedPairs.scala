package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Df-capped gram-pair expansion as ONE aggregate (SURVEY §2.11
  * extension surface) — the single-shuffle engine of the substring-span
  * dedup family.
  *
  * Semantics (shared verbatim with the DuckDB oracle's relational
  * form): group char-gram occurrences (doc_id, pos) by gram hash; a
  * hash "blocks" iff it occurs 2..cap times across ≥ 2 distinct docs;
  * each blocking hash emits every cross-document occurrence pair with
  * a_id < b_id. The r7/early-r8 shapes needed a df-probe aggregate
  * PLUS a grams⋈keep join (two corpus-sized exchanges, two runs of the
  * gram map pipeline); this aggregator does both in one pass because
  * the CAP lives inside the buffer: once a group has seen cap+1 rows
  * it can never block, so the buffer stops growing — no unbounded
  * collect_list group can exist at ANY corpus size, which is exactly
  * the guarantee the join-first shape existed to provide.
  *
  * Buffer: flat Seq[Long] of (doc_id, pos) pairs, length-capped at
  * 2·(cap+1) — fixed-width array encoding, no kryo on the shuffle hot
  * path (unlike TopK, this aggregate sees ~one group per input row
  * map-side, so partial-buffer serialization IS the shuffle format).
  * Overflow is encoded by length > 2·cap; merge saturates the same
  * way, so partial merges commute.
  */
final case class GramPair(a_id: Long, b_id: Long, ai: Long, bi: Long)

class CappedPairs(cap: Int) extends Aggregator[(Long, Long), Seq[Long], Seq[GramPair]] {
  private val maxLen = 2 * (cap + 1)

  override def zero: Seq[Long] = Nil

  override def reduce(b: Seq[Long], a: (Long, Long)): Seq[Long] =
    if (b.length >= maxLen) b else a._1 +: a._2 +: b

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    val m = x ++ y
    if (m.length > maxLen) m.take(maxLen) else m
  }

  override def finish(b: Seq[Long]): Seq[GramPair] = {
    val n = b.length / 2
    if (n < 2 || n > cap) Nil
    else {
      val ds = new Array[Long](n); val ps = new Array[Long](n)
      var k = 0
      val it = b.iterator
      while (it.hasNext) { ds(k) = it.next(); ps(k) = it.next(); k += 1 }
      val out = Seq.newBuilder[GramPair]
      var x = 0
      while (x < n) {
        var y = 0
        while (y < n) {
          if (ds(x) < ds(y)) out += GramPair(ds(x), ds(y), ps(x), ps(y))
          y += 1
        }
        x += 1
      }
      out.result()
    }
  }

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[GramPair]] = ExpressionEncoder[Seq[GramPair]]()
}
