package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Trained product-quantization codebook, baked into a [[PqEncodeExpr]] /
  * [[PqSubDistsExpr]] as plan-side state (the k-means-broadcast pattern:
  * train once with a map-combinable aggregate to |labels|·dims rows,
  * collect that bounded table to the driver, ship it to every task
  * inside the serialized expression).
  *
  * Integer-grid discipline (see Embeddings.scala header): per (label,
  * dim) the codebook stores n (member count) and sq (Σ of 1e-6-grid
  * quantized values, exact BIGINT) and derives cm = floorDiv(sq, n) —
  * the floored integer centroid mean — so a sub-distance
  * Σ_dims (q − cm)² is exact, n-independent long arithmetic,
  * identical in any engine; no division appears in a distance.
  *
  * `labels` must be ascending: argmin ties break toward the SMALLEST
  * label, matching `ROW_NUMBER() OVER (ORDER BY dist, label)` in the
  * oracle SQL.
  *
  * Value-equality fields (IndexedSeq, not Array) so expression
  * canonicalization and plan dedup keep working.
  */
case class PqCodebook(
    labels: IndexedSeq[Int],
    ns: IndexedSeq[Long],          // per label, aligned with `labels`
    sqFlat: IndexedSeq[Long],      // label-major: sqFlat(li * dims + (dim-1))
    dims: Int,
    subDim: Int) {
  @transient lazy val labelArr: Array[Int] = labels.toArray
  @transient lazy val nArr: Array[Long] = ns.toArray
  @transient lazy val sqArr: Array[Long] = sqFlat.toArray
  /** FLOORED integer centroid means, label-major like [[sqFlat]] —
    * precomputed once so the kernel hot loop does no division.
    * Math.floorDiv, not `/`: floor division is the convention BOTH
    * sides standardize on because the oracle can spell it
    * convention-proof — `(a − ((a % n) + n) % n) // n` is exactly
    * divisible, so it evaluates identically whether an engine's `//`
    * floors or truncates. A raw `SUM // COUNT` in the oracle would
    * silently flip on negative non-divisible sums if a DuckDB build
    * ever changed its `//` convention. */
  @transient lazy val cmArr: Array[Long] = {
    val out = new Array[Long](sqFlat.length)
    var li = 0
    while (li < labels.length) {
      val n = ns(li)
      var d = 0
      while (d < dims) {
        out(li * dims + d) = Math.floorDiv(sqFlat(li * dims + d), n); d += 1
      }
      li += 1
    }
    out
  }
  def numSubs: Int = (dims + subDim - 1) / subDim
}

/** Shared kernel of the PQ expressions: quantize the embedding onto
  * the 1e-6 integer grid once, then walk (sub, label) computing the
  * exact-integer sub-distance s2 = Σ_dims (q − cm)², where
  * cm = floorDiv(sq, n) is the FLOORED integer centroid mean.
  *
  * Why the mean and not the old Σ(q·n − sq)² form: that diff is
  * n·(q − mean) — its square needs n²-proportional headroom and
  * overflows Long once cells reach ~10⁵ vectors (caught by the 20×
  * scale soak). With the mean folded in first, |q − cm| ≤ ~2.2e6
  * regardless of cell size, so s2 ≤ dims·(2.2e6)² ≈ 3e14 at ANY
  * scale. Floor division is the convention-proof choice (see
  * [[PqCodebook.cmArr]]): the oracle derives the identical cm via an
  * exactly-divisible rewrite, independent of any engine's `//`
  * convention, and the ranking never needs a floating division.
  */
trait PqKernel { self: UnaryExpression =>
  def cb: PqCodebook

  protected def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq kernel requires array<float|double> input, got $other")
    }

  /** 1e-6 grid: floor(x·1e6 + 0.5) — both casts/ops IEEE-exact, the
    * same derivation the oracle SQL spells out. Null (ragged) if the
    * vector length disagrees with the codebook — silent truncation
    * would return plausible-but-wrong codes.
    */
  protected def gridded(a: ArrayData): Array[Long] = {
    if (a.numElements() != cb.dims) return null
    val isFloat = elemType == FloatType
    val q = new Array[Long](cb.dims)
    var i = 0
    while (i < cb.dims) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      q(i) = math.floor(x * 1000000d + 0.5d).toLong
      i += 1
    }
    q
  }

  /** s2 for (sub `s`, label index `li`) over the quantized vector. */
  protected def subDist(q: Array[Long], s: Int, li: Int): Long = {
    val lo = s * cb.subDim
    val hi = math.min(lo + cb.subDim, cb.dims)
    val base = li * cb.dims
    val cm = cb.cmArr
    var acc = 0L
    var d = lo
    while (d < hi) {
      val diff = q(d) - cm(base + d)
      acc += diff * diff
      d += 1
    }
    acc
  }
}

/** PQ encode as a single map-side kernel: embedding →
  * array<struct<sub, code, sub_dist2>> (argmin sub-centroid per
  * subspace). Replaces the relational formulation — posexplode(×dims)
  * → broadcast codebook join → (vec, sub, label) aggregate → argmin
  * window — whose shuffle carries dims·|labels| rows PER VECTOR (an
  * ~80× corpus amplification at 64 dims / 10 labels; at 100 TB that
  * shuffle IS the job). Here the corpus pass is map-only: scan →
  * this expression → inline. Codegen note: the generated code calls
  * back into [[encode]] via a reference obj (the StaticInvoke shape),
  * so the projection stays inside whole-stage codegen while the
  * kernel itself is one JIT-compiled loop; a hand-inlined doGenCode
  * would buy nothing — output allocation dominates, and this runs
  * once per corpus row, not once per candidate pair (contrast
  * [[DotProduct]]).
  */
case class PqEncodeExpr(child: Expression, cb: PqCodebook)
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("sub_dist2", DoubleType, nullable = false))),
    containsNull = false)

  def encode(a: ArrayData): ArrayData = {
    val q = gridded(a)
    if (q == null) return null
    val out = new Array[Any](cb.numSubs)
    var s = 0
    while (s < cb.numSubs) {
      var bestLabel = 0
      var bestDist = Long.MaxValue
      var li = 0
      while (li < cb.labelArr.length) {
        // pure-integer argmin — no division, nothing for engines to
        // disagree on; strict < over ascending labels = tie to
        // smallest label
        val dist = subDist(q, s, li)
        if (dist < bestDist) { bestDist = dist; bestLabel = cb.labelArr(li) }
        li += 1
      }
      out(s) = new GenericInternalRow(Array[Any](s, bestLabel, bestDist.toDouble))
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.encode($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All (sub, label) sub-distances for one vector — the ADC
  * lookup-table kernel (sim_knn_pq): embedding →
  * array<struct<sub, label, s2>>, dims·|labels| structs of exact
  * integers (s2 is already mean-normalized — see [[PqKernel]]). Same
  * map-only rationale as [[PqEncodeExpr]]; callers quantize s2 to the
  * ppm grid downstream so the quantization stays visible in the plan.
  */
case class PqSubDistsExpr(child: Expression, cb: PqCodebook)
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("label", IntegerType, nullable = false),
    StructField("s2", LongType, nullable = false))),
    containsNull = false)

  def dists(a: ArrayData): ArrayData = {
    val q = gridded(a)
    if (q == null) return null
    val out = new Array[Any](cb.numSubs * cb.labelArr.length)
    var k = 0
    var s = 0
    while (s < cb.numSubs) {
      var li = 0
      while (li < cb.labelArr.length) {
        out(k) = new GenericInternalRow(
          Array[Any](s, cb.labelArr(li), subDist(q, s, li)))
        k += 1
        li += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = dists(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDists", this, classOf[PqSubDistsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.dists($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqExpressions {
  import org.apache.spark.sql.GraftColumnBridge._
  /** Column API: argmin PQ codes, array<struct<sub, code, sub_dist2>>. */
  def pqEncode(emb: Column, cb: PqCodebook): Column =
    column(PqEncodeExpr(expression(emb), cb))
  /** Column API: full ADC table, array<struct<sub, label, s2>>. */
  def pqSubDists(emb: Column, cb: PqCodebook): Column =
    column(PqSubDistsExpr(expression(emb), cb))
}
