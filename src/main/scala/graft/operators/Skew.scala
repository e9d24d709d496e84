package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §7.4.12: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join split handles most
  * cases at runtime; explicit salting remains the tool when one key
  * dominates so badly that a single task would still own it (the
  * classic power-law `user_id` at 100 TB).
  *
  * `saltedJoin` shards each hot key into `salt` sub-keys: the big side
  * gets a deterministic shard from a row hash, the small side is
  * replicated `salt`× — the join result is exactly the plain join, but
  * the hot key's rows spread over `salt` tasks.
  *
  * `saltedJoinAuto` sizes the width from the DATA (r9 verdict item 4 —
  * the fixed 8-way salt was the engine's last fixed-parameter
  * operator): a one-column probe aggregate measures the hottest key's
  * row count, and [[saltWidth]] picks the smallest width that spreads
  * that key down to ≈ one average shuffle partition's share. On a
  * uniform key distribution this resolves to salt = 1 — i.e. the plain
  * join, with zero replication paid — while a power-law key gets
  * exactly the fan-out it needs and no more (every extra way of salt
  * multiplies the SMALL side's shuffled volume). The probe is one
  * map-combined aggregate over the key column (shuffles distinct keys,
  * not rows); a production deployment with table statistics would read
  * the same two numbers off the catalog instead.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1)
    val bigCols = big.columns
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(bigCols.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val smallSalted = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** Width formula, driver-side pure function (spec-pinned like
    * `Dedup.jaccardAutoCap`): smallest salt spreading the hottest
    * key's `maxKeyRows` down to the average partition's share of
    * `totalRows` over `shuffleParts` partitions, clamped to
    * [1, shuffleParts] (wider than the shuffle cannot add parallel
    * consumers). Uniform data ⇒ maxKeyRows ≈ totalRows/#keys ≪
    * avgPerPartition ⇒ 1: the auto path degrades to the plain join. */
  private[graft] def saltWidth(maxKeyRows: Long, totalRows: Long,
                               shuffleParts: Int): Int = {
    require(shuffleParts >= 1)
    if (totalRows <= 0L || maxKeyRows <= 0L) 1
    else {
      val avgPerPartition = math.max(1L, totalRows / shuffleParts)
      math.min(shuffleParts.toLong,
        math.max(1L, (maxKeyRows + avgPerPartition - 1) / avgPerPartition)).toInt
    }
  }

  /** The stats probe behind [[saltedJoinAuto]]: one map-combined
    * key-histogram aggregate (column-pruned to `key`) → [[saltWidth]].
    * Callers that join the same table repeatedly should memoize this
    * per table snapshot (the gate does, fingerprint-keyed like
    * `Dedup.sourceDimMemo`) — a production deployment reads the same
    * two numbers off the catalog's table statistics instead of
    * re-scanning. */
  def probeSaltWidth(big: DataFrame, key: String): Int = {
    val probe = big.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("n")).head
    val (mx, n) =
      if (probe.isNullAt(0)) (0L, 0L) else (probe.getLong(0), probe.getLong(1))
    val parts = big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    saltWidth(mx, n, parts)
  }

  /** Data-sized salting: probe the big side's key histogram (the same
    * stats-driven sizing shape as the LSH plane count and the jaccard
    * df auto-cap), then join with [[saltWidth]] ways. Result is
    * EXACTLY the plain inner join at any width (the ExtSpec law). */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, key: String): DataFrame =
    saltedJoin(big, small, key, probeSaltWidth(big, key))
}
