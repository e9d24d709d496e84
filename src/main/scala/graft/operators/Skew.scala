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
}
