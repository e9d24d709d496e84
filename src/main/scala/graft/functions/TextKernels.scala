package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All bigram hash pairs of a space-tokenized text in ONE byte-level
  * pass — the map kernel of `text_lm_score`:
  * `array<struct<bh: long, w1h: long>>` where, for each consecutive
  * token pair (tok_i, tok_i+1) of `split(text, ' ')`,
  * bh = xxhash64(concat_ws(' ', tok_i, tok_i+1)) and
  * w1h = xxhash64(tok_i).
  *
  * Why this is EXACTLY the composed expression and not an
  * approximation of it: splitting on a single delimiter char places
  * consecutive tokens exactly one delimiter apart in the source, so
  * the bigram string `tok_i ⧺ ' ' ⧺ tok_i+1` is byte-identical to the
  * source slice [start_i, end_{i+1}) — for ANY input, including empty
  * tokens from doubled/leading/trailing spaces (split keeps them:
  * Spark splits with limit −1). And 0x20 can never occur inside a
  * multi-byte UTF-8 sequence (continuation bytes have the high bit
  * set), so the byte scan finds exactly the character-level
  * delimiters. Both hashes therefore run DIRECTLY over the
  * UTF8String's backing bytes (XXH64.hashUnsafeBytes, seed 42 —
  * Spark's xxhash64 seed): zero string materialization, where the
  * composed `transform(sequence(…), i -> struct(xxhash64(concat_ws(…))
  * …))` allocates two UTF8Strings + one concat copy per bigram — the
  * dominant task-CPU term of the corpus pass (r12 decomposition:
  * 2.46 s task CPU at sf0.1, DuckDB NOT core-bound at 0.136 s / 4
  * threads, so the gap was per-core compute, this allocation chain).
  * FunctionsSpec pins kernel ≡ composed on adversarial inputs (empty
  * string, no spaces, doubled/leading/trailing spaces, unicode).
  *
  * A text with no space yields an empty array (explode then drops the
  * row — same rows as the old `filter(size(ws) >= 2)` guard, which
  * existed only to keep `sequence(1, size-1)` from going descending).
  * Null in → null out (UnaryExpression default).
  */
case class BigramHashPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bh", LongType, nullable = false),
    StructField("w1h", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bigram_hash_pairs requires a string input, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val (base, off, len) = (s.getBaseObject, s.getBaseOffset, s.numBytes())
    var nPairs = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 32) nPairs += 1
      i += 1
    }
    val rows = new Array[Any](nPairs)
    var tokStart = 0
    var prevStart = -1
    var k = 0
    i = 0
    while (i <= len) {
      if (i == len ||
          org.apache.spark.unsafe.Platform.getByte(base, off + i) == 32) {
        if (prevStart >= 0) {
          val bh = XXH64.hashUnsafeBytes(base, off + prevStart, i - prevStart, 42L)
          val w1h = XXH64.hashUnsafeBytes(base, off + prevStart,
            tokStart - 1 - prevStart, 42L)
          rows(k) = InternalRow(bh, w1h)
          k += 1
        }
        prevStart = tokStart
        tokStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val len = ctx.freshName("len")
      val nPairs = ctx.freshName("nPairs")
      val rows = ctx.freshName("rows")
      val tokStart = ctx.freshName("tokStart")
      val prevStart = ctx.freshName("prevStart")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val platform = "org.apache.spark.unsafe.Platform"
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |Object $base = $s.getBaseObject();
         |long $off = $s.getBaseOffset();
         |int $len = $s.numBytes();
         |int $nPairs = 0;
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($platform.getByte($base, $off + $i) == 32) $nPairs++;
         |}
         |Object[] $rows = new Object[$nPairs];
         |int $tokStart = 0;
         |int $prevStart = -1;
         |int $k = 0;
         |for (int $i = 0; $i <= $len; $i++) {
         |  if ($i == $len || $platform.getByte($base, $off + $i) == 32) {
         |    if ($prevStart >= 0) {
         |      $rows[$k++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |        new Object[]{
         |          $xxh.hashUnsafeBytes($base, $off + $prevStart, $i - $prevStart, 42L),
         |          $xxh.hashUnsafeBytes($base, $off + $prevStart, $tokStart - 1 - $prevStart, 42L)});
         |    }
         |    $prevStart = $tokStart;
         |    $tokStart = $i + 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {
  import org.apache.spark.sql.GraftColumnBridge

  /** See [[BigramHashPairs]]. */
  def bigramHashPairs(text: Column): Column =
    GraftColumnBridge.column(BigramHashPairs(GraftColumnBridge.expression(text)))
}
