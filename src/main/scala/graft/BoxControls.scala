package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Box-state control measurements (r10 verdict item 7): three
  * fixed-shape jobs whose code no operator round ever touches, timed
  * alongside every bench/soak leg so the artifact SELF-REPORTS the
  * box's compute/shuffle/scan state. Host drift has repeatedly
  * consumed attribution effort (r10: rel_triangle_count +20% traced to
  * drift only after a worktree A/B of the round-start commit; the span
  * family's 119 vs 155 s 100× legs) — a leg whose controls sit outside
  * their recorded bands is a drifted/mis-configured box, and per-query
  * deltas measured on it are suspect until the controls re-enter band.
  * The cpu control also exposes the core-count trap (a 4-core leg read
  * as a 32-core regression burned rounds 10 and 12): its value scales
  * ~linearly with session cores.
  *
  * Controls are CONSTANT-SHAPE by construction — synthetic inputs of
  * fixed size (never the leg's sfDir, which varies 10×–100× between
  * soak points) plus one parquet scan pinned to the fixed sf0.1
  * dataset. Each is the median of 3 runs; failures report -1 rather
  * than aborting the leg.
  */
object BoxControls {
  /** Fixed dataset for the scan control — deliberately NOT the leg's
    * sfDir (soak replicas vary in size; the control must not). */
  private val ScanDir = "/root/testdata/sf0.1"

  def measure(spark: SparkSession): Seq[(String, Double)] = {
    val par = spark.sparkContext.defaultParallelism
    def med3(fn: () => Unit): Double =
      try {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(1)
      } catch { case NonFatal(_) => -1.0 }
    Seq(
      // raw hash throughput over 200M longs, cluster-wide: CPU + JIT
      // state + core count (head() forces the aggregate — count() would
      // let Catalyst prune the hash column and measure nothing; bit_xor,
      // not sum: ANSI mode makes a 200M-term long SUM overflow-throw)
      "ctl_cpu" -> med3(() => spark.range(0L, 200000000L, 1L, par)
        .select(expr("bit_xor(xxhash64(id))")).head()),
      // one full 4M-row exchange into 64k keys: shuffle write/fetch
      // machinery, disk, and scheduler state. The exchange is pinned to
      // a FIXED 64 partitions via repartition-on-the-group-key (the
      // groupBy reuses that partitioning, no second exchange), so the
      // control's shape does not vary with the leg's session width —
      // r11's first cut ran at session width and read as band drift
      // between width-sweep legs.
      "ctl_shuffle" -> med3(() => spark.range(0L, 4000000L, 1L, par)
        .select(pmod(xxhash64(col("id")), lit(65536L)).as("k"))
        .repartition(64, col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c"))).head()),
      // parquet scan + decode of the FIXED sf0.1 lineitem (~600k rows):
      // page cache, I/O, and vectorized-reader state
      "ctl_scan" -> med3(() => spark.read.parquet(s"$ScanDir/lineitem.parquet")
        .agg(sum(col("l_extendedprice"))).head()))
  }

  def json(controls: Seq[(String, Double)]): String =
    controls.map { case (k, v) =>
      s"${GraftSession.jsonEscape(k)}:${math.rint(v * 1000) / 1000}"
    }.mkString("{", ",", "}")
}
