package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, SortOrder, Subtract, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator physical plans for the substring-span dedup family
  * (Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better") — the brief's extension tier (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` in `GraftSession.build`.
  *
  * Why an operator and not an aggregate: both steps of the span
  * pipeline are "stream sorted groups, emit rows" computations. The
  * aggregate formulation (groupBy + TypedImperativeAggregate, r8) pays
  * a map-side partial aggregation that cannot help — gram hashes are
  * mostly unique, so the partial pass builds a per-partition object
  * hash map (which falls back to sort-based aggregation past 128
  * keys), serializes ~one buffer per input row into the exchange, and
  * then the final pass re-sorts and re-groups the same rows.
  * DevProfile attributed 2.9 s of the 6.9 s task CPU at sf0.1 to that
  * partial pass, and the run-stitching window (sort + row_number +
  * re-aggregate) another 1.8 s. These execs declare the distribution /
  * ordering they need and let `EnsureRequirements` insert exactly ONE
  * exchange + sort each; the group walk itself is a single forward
  * pass over `InternalRow`s with O(cap) state — no hash map, no
  * boxing, no partial aggregation, spilling delegated to `SortExec`.
  * At 100 TB the shape is unchanged: two key-partitioned exchanges,
  * per-task memory constant.
  */
object SortedGroupPlans {
  private[plans] def longAttr(name: String): AttributeReference =
    AttributeReference(name, LongType, nullable = false)()

  /** Planner rule mapping the logical nodes to their execs; injected
    * via `SparkSessionExtensions.injectPlannerStrategy`. */
  object GraftStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case CappedPairsPlan(child, cap, output) =>
        CappedPairsExec(cap, output, planLater(child)) :: Nil
      case DiagonalRunsPlan(child, k, minSpan, output) =>
        DiagonalRunsExec(k, minSpan, output, planLater(child)) :: Nil
      case _ => Nil
    }
  }
}

/** Logical: df-capped cross-document pair expansion over gram
  * occurrences. Child contract (by ordinal): exactly three non-null
  * LONG columns `(h, doc_id, pos)`. Output: every a_id < b_id
  * occurrence pair of each hash group that has 2..cap occurrences —
  * the same semantics as [[graft.functions.CappedPairsAgg]] (the
  * ScalaTest spec pins the two equal row-for-row).
  */
case class CappedPairsPlan(
    child: LogicalPlan,
    cap: Int,
    override val output: Seq[Attribute]) extends UnaryNode {
  // ordinal contract: no expression references, but the child's whole
  // output is consumed — without this, ColumnPruning would project the
  // child down to nothing
  override def references: AttributeSet = child.outputSet
  override def producedAttributes: AttributeSet = outputSet
  override protected def withNewChildInternal(c: LogicalPlan): CappedPairsPlan =
    copy(child = c)
}

object CappedPairsPlan {
  import SortedGroupPlans.longAttr
  def apply(child: LogicalPlan, cap: Int): CappedPairsPlan =
    CappedPairsPlan(child, cap,
      Seq(longAttr("a_id"), longAttr("b_id"), longAttr("ai"), longAttr("bi")))
}

/** Logical: stitch consecutive gram matches into maximal shared spans.
  * Child contract (by ordinal): four non-null LONG columns
  * `(a_id, b_id, ai, bi)` — one row per matching K-gram occurrence
  * pair. Two rows belong to the same span iff they share (a_id, b_id,
  * ai−bi) and their `ai`s are consecutive; a maximal run of n windows
  * is a shared span of n+K−1 chars. Output: one row per maximal run
  * with span_chars ≥ minSpan: `(a_id, b_id, diag, span_chars,
  * b_start)`.
  */
case class DiagonalRunsPlan(
    child: LogicalPlan,
    k: Int,
    minSpan: Int,
    override val output: Seq[Attribute]) extends UnaryNode {
  override def references: AttributeSet = child.outputSet
  override def producedAttributes: AttributeSet = outputSet
  override protected def withNewChildInternal(c: LogicalPlan): DiagonalRunsPlan =
    copy(child = c)
}

object DiagonalRunsPlan {
  import SortedGroupPlans.longAttr
  def apply(child: LogicalPlan, k: Int, minSpan: Int): DiagonalRunsPlan =
    DiagonalRunsPlan(child, k, minSpan,
      Seq(longAttr("a_id"), longAttr("b_id"), longAttr("diag"),
        longAttr("span_chars"), longAttr("b_start")))
}

/** Physical pair expansion: requires clustering on h (ordinal 0) and
  * an h-ascending sort, then walks each hash group once. Group state
  * saturates at cap+1 occurrences (a saturated group can never emit),
  * so per-task memory is O(cap) at ANY corpus size; a group emits at
  * most cap·(cap−1)/2 rows, materialized as raw longs (not rows) so
  * the emit buffer is ≤ 4·cap² longs.
  */
case class CappedPairsExec(
    cap: Int,
    override val output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(child.output.head)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(child.output.head, Ascending) :: Nil)

  override protected def doExecute(): RDD[InternalRow] = {
    val capLocal = cap
    child.execute().mapPartitions({ it =>
      new Iterator[InternalRow] {
        private val maxN = capLocal + 1
        private val ds = new Array[Long](maxN)
        private val ps = new Array[Long](maxN)
        private var n = 0
        private var curH = 0L
        private var open = false
        // pending pairs as flat (a,b,ai,bi) longs — group arrays are
        // reused across groups, so pair VALUES are materialized here
        private var pend = new Array[Long](256)
        private var pendN = 0
        private var pendI = 0
        private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
        private val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
          LongType, LongType, LongType, LongType))

        private def closeGroup(): Unit = {
          if (n >= 2 && n <= capLocal) {
            var x = 0
            while (x < n) {
              val dx = ds(x)
              var y = 0
              while (y < n) {
                if (dx < ds(y)) {
                  if (pendN + 4 > pend.length) {
                    val g = new Array[Long](pend.length * 2)
                    System.arraycopy(pend, 0, g, 0, pendN); pend = g
                  }
                  pend(pendN) = dx; pend(pendN + 1) = ds(y)
                  pend(pendN + 2) = ps(x); pend(pendN + 3) = ps(y)
                  pendN += 4
                }
                y += 1
              }
              x += 1
            }
          }
          n = 0
        }

        override def hasNext: Boolean = {
          while (pendI >= pendN && (it.hasNext || open)) {
            pendI = 0; pendN = 0
            var advanced = false
            while (!advanced && it.hasNext) {
              val r = it.next()
              val h = r.getLong(0)
              if (!open) { curH = h; open = true }
              else if (h != curH) {
                closeGroup()
                curH = h
                if (pendN > 0) advanced = true
              }
              if (n < maxN) { ds(n) = r.getLong(1); ps(n) = r.getLong(2); n += 1 }
              else n = maxN + 1 // saturated: group can never emit
            }
            if (!advanced && !it.hasNext && open) { closeGroup(); open = false }
          }
          pendI < pendN
        }

        override def next(): InternalRow = {
          row.setLong(0, pend(pendI)); row.setLong(1, pend(pendI + 1))
          row.setLong(2, pend(pendI + 2)); row.setLong(3, pend(pendI + 3))
          pendI += 4
          proj(row)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): CappedPairsExec =
    copy(child = c)
}

/** Physical run-stitching: requires clustering on (a_id, b_id) and a
  * sort by (a_id, b_id, ai−bi, ai), then emits one row per maximal
  * consecutive-ai run with span ≥ minSpan. State is O(1) per task;
  * at most one output row is produced per input row, streamed without
  * buffering.
  */
case class DiagonalRunsExec(
    k: Int,
    minSpan: Int,
    override val output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(child.output(0), child.output(1))) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(
      SortOrder(child.output(0), Ascending),
      SortOrder(child.output(1), Ascending),
      SortOrder(Subtract(child.output(2), child.output(3)), Ascending),
      SortOrder(child.output(2), Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val kL = k; val minSpanL = minSpan
    child.execute().mapPartitions({ it =>
      new Iterator[InternalRow] {
        private var open = false
        private var curA = 0L; private var curB = 0L; private var curD = 0L
        private var prevAi = 0L; private var startBi = 0L; private var len = 0L
        private var outReady = false
        private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
        private val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
          LongType, LongType, LongType, LongType, LongType))

        // stage the closed run into `row` iff it clears the span floor
        private def closeRun(): Unit = {
          val span = len + kL - 1
          if (span >= minSpanL) {
            row.setLong(0, curA); row.setLong(1, curB); row.setLong(2, curD)
            row.setLong(3, span); row.setLong(4, startBi)
            outReady = true
          }
        }

        override def hasNext: Boolean = {
          while (!outReady && (it.hasNext || open)) {
            if (it.hasNext) {
              val r = it.next()
              val a = r.getLong(0); val b = r.getLong(1)
              val ai = r.getLong(2); val bi = r.getLong(3)
              val d = ai - bi
              if (open && a == curA && b == curB && d == curD && ai == prevAi + 1) {
                len += 1; prevAi = ai
              } else {
                if (open) closeRun()
                curA = a; curB = b; curD = d
                prevAi = ai; startBi = bi; len = 1; open = true
              }
            } else { closeRun(); open = false }
          }
          outReady
        }

        override def next(): InternalRow = { outReady = false; proj(row) }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): DiagonalRunsExec =
    copy(child = c)
}
