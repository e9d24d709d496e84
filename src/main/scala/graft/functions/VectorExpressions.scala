package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays.
  *
  * Why an `Expression` and not `aggregate(zip_with(...))`: the
  * higher-order-function fold allocates an intermediate array and
  * interprets two lambdas per row — fine per-document, ruinous inside
  * an O(n²) pair join (millions of evaluations). This expression
  * compiles to a tight primitive loop inside whole-stage codegen: no
  * allocation, no virtual calls. Accumulation is an in-order double
  * fold, so results are bit-identical to the HOF formulation (and to
  * the DuckDB oracle).
  *
  * Nulls: null if either array is null (BinaryExpression default) or
  * if the arrays have different lengths (ragged data must surface as
  * null, not a truncated dot product); array ELEMENTS are assumed
  * non-null (embedding vectors — enforced by the parquet schema
  * upstream). Supported element types: float, double, int, long.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires numeric array inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def readElem(x: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => x.getFloat(i).toDouble
    case DoubleType => x.getDouble(i)
    case IntegerType => x.getInt(i).toDouble
    case LongType => x.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    // ragged inputs → null, never a silently-truncated dot product (the
    // DuckDB oracle errors on mismatched lengths; silent truncation
    // would return plausible-but-wrong similarities)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += readElem(x, lt, i) * readElem(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(v: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case DoubleType => s"$v.getDouble($i)"
      case IntegerType => s"(double) $v.getInt($i)"
      case _ => s"(double) $v.getLong($i)"
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${get(a, lt, i)} * ${get(b, rt, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd squared L2 distance over two LONG arrays — the
  * pair kernel of the integer-grid similarity family (semantic dedup):
  * Σ (aᵢ−bᵢ)² in pure long arithmetic, exact and order-free, so the
  * result is the same BIGINT the DuckDB oracle computes. Same
  * rationale as [[DotProduct]]: `aggregate(zip_with(...))` interprets
  * two lambdas and allocates a zipped array per pair — ruinous inside
  * a blocked O(Σc²) pair join; this compiles to a tight primitive
  * loop. Ragged inputs → null (ragged grid vectors must surface, not
  * truncate).
  */
case class LongSquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $dv = $a.getLong($i) - $b.getLong($i);
         |    $acc += $dv * $dv;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All sign-bit LSH band buckets of a vector in ONE compact loop:
  * out[b] = Σ_p (plane[b·ppb+p] · v > 0 ? 1≪p : 0), planes flattened
  * row-major into a single `double[]` reference object.
  *
  * Why an `Expression` and not a when-chain of [[DotProduct]]s: the
  * chain inlines one unrolled dot loop PER PLANE into the projection's
  * generated method, so method bytecode grows linearly with the plane
  * count — and past ~36 planes it silently crosses HotSpot's
  * DontCompileHugeMethods limit (8 KB bytecode): the method never
  * JITs, the projection runs bytecode-interpreted, and the bucketing
  * stage slows ~27× with NO Spark-side warning (measured on the 20×
  * soak replica: 0.19 s → 5.2 s when the production sizing crossed 4
  * bands × 10 planes). Production LSH sizes planes with log₂(corpus)
  * — 4×16 bits and up — so the kernel must be plane-count-invariant:
  * here the planes live in ONE reference array and the generated code
  * is a fixed-size triple loop, identical bytecode at any plane count.
  *
  * Arithmetic is the exact same in-order double fold as
  * [[DotProduct]] over the 10⁶-integer-grid vector, so bucket bits are
  * bit-identical to the when-chain formulation (and to the DuckDB
  * oracle's `list_dot_product` on the inlined plane literals).
  * Null/ragged: a vector whose length differs from the planes' dim
  * surfaces as null, never a truncated bucket. */
case class LshBandBuckets(child: Expression,
    planes: scala.collection.immutable.ArraySeq[Double],
    bands: Int, planesPerBand: Int) extends UnaryExpression {
  require(bands > 0 && planesPerBand > 0 && planesPerBand < 31,
    s"invalid band geometry $bands x $planesPerBand")
  require(planes.length % (bands * planesPerBand) == 0,
    s"planes length ${planes.length} not divisible by ${bands * planesPerBand}")

  // `planes` is an immutable IndexedSeq so case-class equals/hashCode
  // are STRUCTURAL — an Array param would fall back to reference
  // identity and silently defeat Catalyst canonicalization /
  // common-subexpression reuse between semantically equal instances.
  // The hot loops read this unwrapped array (built once per instance).
  @transient private lazy val planesArr: Array[Double] = planes match {
    case d: scala.collection.immutable.ArraySeq.ofDouble => d.unsafeArray
    case other => other.toArray // boxed-element ArraySeq: copy once
  }

  private val dim = planes.length / (bands * planesPerBand)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // the 10⁶ integer grid arrives as array<bigint> (Spark's floor
      // returns LONG); array<double> covers pre-cast callers
      case ArrayType(DoubleType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_band_buckets requires array<double|bigint> input, got $other")
    }

  private def elemIsLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val isLong = elemIsLong
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bk = 0
      var p = 0
      while (p < planesPerBand) {
        val off = (b * planesPerBand + p) * dim
        var s = 0.0
        var i = 0
        while (i < dim) {
          val e = if (isLong) x.getLong(i).toDouble else x.getDouble(i)
          s += planesArr(off + i) * e
          i += 1
        }
        if (s > 0) bk |= 1 << p
        p += 1
      }
      out(b) = bk
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planesArr, "double[]")
    val getElem =
      if (elemIsLong) (v: String, i: String) => s"(double) $v.getLong($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bk = ctx.freshName("bk")
      val off = ctx.freshName("off")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    int $bk = 0;
         |    for (int $p = 0; $p < $planesPerBand; $p++) {
         |      int $off = ($b * $planesPerBand + $p) * $dim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $s += $planesRef[$off + $i] * ${getElem(v, i)};
         |      }
         |      if ($s > 0) $bk |= 1 << $p;
         |    }
         |    $out[$b] = $bk;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftColumnBridge._
  /** Column API: Σ aᵢ·bᵢ as a codegen'd primitive loop. */
  def vecDot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  /** Column API: Σ (aᵢ−bᵢ)² over long arrays, exact integer result. */
  def vecL2Sq(a: Column, b: Column): Column =
    column(LongSquaredDistance(expression(a), expression(b)))
  /** Column API: all LSH band buckets in one plane-count-invariant
    * codegen loop (`planes` row-major, bands·planesPerBand·dim flat). */
  def lshBandBuckets(v: Column, planes: Array[Double],
      bands: Int, planesPerBand: Int): Column =
    column(LshBandBuckets(expression(v),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(planes),
      bands, planesPerBand))
}
