package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** All singleton + ordered-pair codes of a bitmask's set bits in one
  * codegen'd bit loop: for each set bit `a` emits `(a<<8)|255` (the
  * membership/"size" row), and for each set-bit pair `a<b` emits
  * `(a<<8)|b`. Consumers decode `ai = p >> 8`, `bi = p & 255` (255 =
  * singleton marker), so a downstream count/sum keyed on the int code
  * computes per-source set sizes and pairwise co-occurrence in ONE
  * aggregate.
  *
  * Why an `Expression` and not nested `transform`/`filter` lambdas:
  * the higher-order formulation costs ~31 µs/row interpreted (lambda
  * closures, struct allocations, a sequence() array per row — measured
  * on `dedup_source_overlap`'s 26k-mask table: 816 ms in one stage);
  * this loop is ~maxBits²/2 integer ops with one exact-sized int[]
  * allocation, and it map-side-combines to ≤ maxBits² rows per
  * partition downstream. `maxBits ≤ 62` keeps every code < 16k.
  */
case class MaskPairs(child: Expression, maxBits: Int)
    extends UnaryExpression {
  require(maxBits > 0 && maxBits <= 62, s"maxBits must be in [1,62], got $maxBits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mask_pairs requires bigint input, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    // mask to the low maxBits FIRST (r9 advisory): a stray bit ≥
    // maxBits would otherwise inflate bitCount's size arithmetic while
    // the emit loops (bounded by maxBits) never fill the tail — the
    // trailing 0 codes would decode downstream as spurious (0,0) rows
    val m = v.asInstanceOf[Long] & ((1L << maxBits) - 1)
    val nb = java.lang.Long.bitCount(m)
    val out = new Array[Int](nb + nb * (nb - 1) / 2)
    var idx = 0
    var a = 0
    while (a < maxBits) {
      if (((m >>> a) & 1L) == 1L) {
        out(idx) = (a << 8) | 255; idx += 1
        var b = a + 1
        while (b < maxBits) {
          if (((m >>> b) & 1L) == 1L) { out(idx) = (a << 8) | b; idx += 1 }
          b += 1
        }
      }
      a += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m => {
      val (mm, out, idx, nb, a, b) = (ctx.freshName("mm"), ctx.freshName("out"),
        ctx.freshName("idx"), ctx.freshName("nb"), ctx.freshName("a"),
        ctx.freshName("b"))
      s"""
         |long $mm = $m & ((1L << $maxBits) - 1); // see nullSafeEval: size must equal emitted count
         |int $nb = java.lang.Long.bitCount($mm);
         |int[] $out = new int[$nb + $nb * ($nb - 1) / 2];
         |int $idx = 0;
         |for (int $a = 0; $a < $maxBits; $a++) {
         |  if ((($mm >>> $a) & 1L) == 1L) {
         |    $out[$idx++] = ($a << 8) | 255;
         |    for (int $b = $a + 1; $b < $maxBits; $b++) {
         |      if ((($mm >>> $b) & 1L) == 1L) $out[$idx++] = ($a << 8) | $b;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaskPairs {
  import org.apache.spark.sql.GraftColumnBridge._
  /** Column API: singleton + pair codes of the mask's set bits. */
  def maskPairs(m: Column, maxBits: Int): Column =
    column(MaskPairs(expression(m), maxBits))
}
