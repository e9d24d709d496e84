package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object VectorExpressions {
  import org.apache.spark.sql.GraftColumnBridge._
  /** Column API: Σ aᵢ·bᵢ as a codegen'd primitive loop. */
  def vecDot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  /** Column API: Σ (aᵢ−bᵢ)² over long arrays, exact integer result. */
  def vecL2Sq(a: Column, b: Column): Column =
    column(LongSquaredDistance(expression(a), expression(b)))
}
