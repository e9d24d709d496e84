package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build a deterministic N× scale replica of a test sf dir
  * for scaling soaks (VERDICT r6 ask #8 — empirical wall-vs-SF
  * exponents, the evidence behind the "survives 100×" plan claims).
  *
  * Usage: sbt "runMain graft.DevScaleUp [srcDir] [dstDir] [factor] [mode]"
  * (defaults: /root/testdata/sf0.1 → /tmp/graft_sf1 ×10, mode=verbatim)
  *
  * mode=perturb additionally applies a PER-REPLICA SIGNED PERMUTATION
  * of embedding dimensions (replica 0 identity). A signed permutation
  * is an orthogonal transform, so WITHIN-replica dot products, norms,
  * and cosines are preserved EXACTLY — each replica's near-dup pair
  * density is identical to the base corpus — while CROSS-replica
  * cosines of formerly-identical vectors become ~N(0, 1/√dims) and
  * essentially never cross a near-dup threshold. This is the honest
  * scale-up for the pair-emitting family: the verbatim replica gives
  * every vector N identical twins, so the sim_neardup_lsh OUTPUT
  * itself grows quadratically and the soak exponent measures the
  * replica artifact, not the algorithm (the r7 α=1.06 flag).
  *
  * Construction — N key-shifted replicas, NOT a row-duplicated blowup:
  * - Every BIGINT entity key shifts by replica·(max(key)+1), with ONE
  *   base per key domain (o_orderkey's base shared by l_orderkey,
  *   c_custkey's by o_custkey and events.user_id, …) so every join
  *   stays exactly as selective as at 1×; replicas are disjoint
  *   subgraphs (graph queries scale by nodes/edges, never densify).
  * - Document text gets a per-replica CONSTANT-WIDTH two-letter word
  *   suffix (EVERY replica tagged, so all replicas are isomorphic),
  *   preserving shingle/bigram df distributions per replica instead
  *   of every shingle's df multiplying by N (which would
  *   quadratically distort the blocking joins — a different workload,
  *   not a bigger one), and making every text-derived volume EXACTLY
  *   proportional to the factor. The r11 span-family attribution
  *   (dev/span_attrib_r11.txt) caught the old `"x"+replica` suffix
  *   inflating chars superlinearly (digits widen with the replica
  *   index: ×11.48 chars for factor 100 vs 10), which leaked a
  *   spurious α≈1.13 into every text-family soak exponent; a
  *   verbatim replica 0 costs a further intercept (untagged gram
  *   alignment pairs ~14× less than a tagged replica's). Two base-26
  *   letters give 676 distinct fixed-width tags. n_chars is
  *   recomputed to match.
  * - Dimension enums (region, nation, lang, source, event_type,
  *   flags) replicate verbatim — group-by cardinalities stay fixed,
  *   as they do in real corpus growth.
  * - events.ts stays the raw nanos LONG it arrives as under
  *   nanosAsLong=true; Tables.eventsTimestamps rebuilds it identically
  *   from the replica.
  */
object DevScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val n = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "verbatim"
    require(mode == "verbatim" || mode == "perturb", s"unknown mode $mode")
    val spark = GraftSession.build("graft-scaleup")
    import spark.implicits._

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.drop("_r").repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t done")
    }
    def reps(df: DataFrame): DataFrame =
      df.withColumn("_r", explode(lit((0 until n).toArray).cast("array<long>")))
    def keyBase(t: String, c: String): Long =
      read(t).agg(max(col(c))).head.getLong(0) + 1L

    val custB = keyBase("customer", "c_custkey")
    val suppB = keyBase("supplier", "s_suppkey")
    val partB = keyBase("part", "p_partkey")
    val ordB = keyBase("orders", "o_orderkey")
    val evB = keyBase("events", "event_id")
    val docB = keyBase("documents", "doc_id")
    val vecB = keyBase("embeddings", "vec_id")
    def sh(c: String, b: Long) = (col(c) + col("_r") * b).as(c)

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(reps(read("customer")).select(sh("c_custkey", custB), $"c_name",
      $"c_nationkey", $"c_acctbal", $"c_mktsegment", $"_r"), "customer")
    write(reps(read("supplier")).select(sh("s_suppkey", suppB), $"s_name",
      $"s_nationkey", $"s_acctbal", $"_r"), "supplier")
    write(reps(read("part")).select(sh("p_partkey", partB), $"p_name",
      $"p_brand", $"p_type", $"p_size", $"p_retailprice", $"_r"), "part")
    write(reps(read("orders")).select(sh("o_orderkey", ordB),
      sh("o_custkey", custB), $"o_orderstatus", $"o_totalprice",
      $"o_orderdate", $"o_orderpriority", $"_r"), "orders")
    write(reps(read("lineitem")).select(sh("l_orderkey", ordB),
      sh("l_partkey", partB), sh("l_suppkey", suppB), $"l_linenumber",
      $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax",
      $"l_returnflag", $"l_linestatus", $"l_shipdate", $"_r"), "lineitem")
    write(reps(read("events")).select(sh("event_id", evB), $"ts",
      sh("user_id", custB), $"event_type", $"value", $"props", $"_r"),
      "events")
    require(n <= 676, s"two-letter replica tags support <=676 replicas, got $n")
    // constant-width per-replica tag: "aa".."zz" for replicas 0..675.
    // EVERY replica is tagged (including 0): all replicas are then
    // isomorphic — same text lengths, same gram alignment, same df
    // histogram — so every text-derived volume is EXACTLY proportional
    // to the factor. (A verbatim replica 0 costs an intercept: its
    // untagged gram alignment pairs ~14× less than a tagged replica's,
    // which alone read as a spurious α 1.04 on the 10×→100× pair fit.)
    val tag = concat(
      chr(lit('a'.toInt) + ($"_r" / 26).cast("int")),
      chr(lit('a'.toInt) + ($"_r" % 26).cast("int")))
    val docText = array_join(
      transform(split($"text", " "), w => concat(w, tag)), " ")
    write(reps(read("documents"))
      .select(sh("doc_id", docB), docText.as("text"), $"lang", $"source", $"_r")
      .withColumn("n_chars", length($"text")), "documents")
    val embedded = reps(read("embeddings"))
    val embCol = if (mode == "perturb") {
      val elemType = read("embeddings").schema("embedding").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      val dims = 64
      // replica 0 identity; others a seeded signed permutation
      // (orthogonal ⇒ within-replica geometry exactly preserved)
      val perms = (0 until n).map { r =>
        if (r == 0) (1 to dims).toSeq
        else new scala.util.Random(1000003L * r).shuffle((1 to dims).toVector)
      }
      val signs = (0 until n).map { r =>
        if (r == 0) Seq.fill(dims)(1.0d)
        else { val rr = new scala.util.Random(7000003L * r)
          Seq.fill(dims)(if (rr.nextBoolean()) 1.0d else -1.0d) }
      }
      // a when-chain of plain element_at/sign expressions per replica
      // (no nested-array literals — flat, codegen-friendly)
      def permuted(r: Int) = array((0 until dims).map { d =>
        (element_at(col("embedding"), perms(r)(d)) * lit(signs(r)(d)))
          .cast(elemType)
      }: _*)
      (1 until n).foldLeft(when(col("_r") === 0, col("embedding"))) {
        (acc, r) => acc.when(col("_r") === r, permuted(r))
      }.as("embedding")
    } else $"embedding"
    write(embedded.select(sh("vec_id", vecB), embCol, $"label", $"_r"),
      "embeddings")
    spark.stop()
  }
}
