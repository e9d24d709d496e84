package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Per-operator invariants for the relational surface. The strong check
  * (hash-match vs DuckDB) is the driver's Verify gate; these specs pin
  * semantics that would fail silently there (determinism, aliasing,
  * key uniqueness) and keep `sbt test` meaningful offline.
  */
class RelationalSpec extends SparkSpec {

  private def run(name: String) = Relational.queries(name)(spark, sfDir)

  test("every query has an oracle") {
    assert(Relational.queries.keySet == Relational.oracles.keySet)
  }

  test("all queries execute and are non-empty") {
    Relational.queries.keys.foreach { n =>
      assert(run(n).count() > 0, s"$n returned no rows")
    }
  }

  test("pricing summary groups are the 6 flag/status pairs") {
    val rows = run("rel_pricing_summary").collect()
    assert(rows.length == 6)
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags == Set(("A","F"),("A","O"),("N","F"),("N","O"),("R","F"),("R","O")))
  }

  test("revenue rollup is sorted by revenue desc") {
    val rev = run("rel_revenue_rollup").select("revenue").collect().map(_.getDouble(0))
    assert(rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("market share is a lawful ratio; trade volume covers both directions") {
    import spark.implicits._
    val ms = run("rel_market_share").collect()
    assert(ms.nonEmpty)
    ms.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0, s"share $share out of [0,1]")
    }
    val tv = run("rel_trade_volume")
    val dirs = tv.select($"supp_region", $"cust_region").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs == Set(("ASIA", "EUROPE"), ("EUROPE", "ASIA")),
      s"expected both trade directions, got $dirs")
    assert(tv.filter($"volume" <= 0.0).count() == 0)
  }

  test("argmax yields exactly one row per user") {
    val df = run("rel_argmax_latest")
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("window lead: last event per key has null next pointers") {
    val df = run("rel_window_lead")
    val nUsers = df.select("user_id").distinct().count()
    assert(df.filter(col("next_event_id").isNull).count() == nUsers)
  }

  test("semi and anti join partition the filtered customer space") {
    val semi = run("rel_join_semi").count()
    val anti = Relational.queries("rel_join_anti")(spark, sfDir).count()
    // semi(>400k) ⊇ complement of anti(>450k) is not exact; instead check
    // anti(>450k) + semi'(>450k) == customers via a direct computation.
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter($"o_totalprice" > 450000.0)
    val semi450 = c.join(o, $"c_custkey" === $"o_custkey", "left_semi").count()
    assert(semi450 + anti == c.count())
    assert(semi > 0)
  }

  test("union keeps both operation types and all source rows") {
    val df = run("rel_union_ops")
    val byOp = df.groupBy("operation_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp.keySet == Set("UPSERT", "DELETE"))
    val ev = Tables.events(spark, sfDir)
    val expected = ev.filter(col("event_type")
      .isin("click", "view", "purchase", "error")).count()
    assert(byOp.values.sum == expected)
  }

  test("hash fingerprint is deterministic md5 hex") {
    val h = run("rel_hash_fingerprint").select("record_hash").first().getString(0)
    assert(h.matches("[0-9a-f]{32}"))
    val again = run("rel_hash_fingerprint").select("record_hash").first().getString(0)
    assert(h == again)
  }

  test("incremental filter is strictly greater than the checkpoint") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val ck = java.time.LocalDateTime.parse("2024-01-15T00:00:00")
    val total = run("rel_incremental_filter").agg(sum("n")).first().getLong(0)
    val expected = ev.filter($"ts" > lit(ck)).count()
    assert(total == expected)
  }

  test("funnel stages are monotone and strictly ordered in time") {
    import spark.implicits._
    val f = run("rel_funnel").cache()
    val views = f.count()
    val clicks = f.filter($"click_ts".isNotNull)
    val purchases = f.filter($"purchase_ts".isNotNull)
    // each stage is a subset of the previous one
    assert(views >= clicks.count() && clicks.count() >= purchases.count())
    // a purchase_ts implies a click_ts (no stage skipping)
    assert(purchases.filter($"click_ts".isNull).count() == 0)
    // stage timestamps are STRICTLY increasing per user
    assert(clicks.filter($"click_ts" <= $"view_ts").count() == 0)
    assert(purchases.filter($"purchase_ts" <= $"click_ts").count() == 0)
    f.unpersist()
  }

  test("retention cohorts: active week is never before the cohort week") {
    import spark.implicits._
    val r = run("rel_retention").cache()
    assert(r.filter($"week" < $"cohort_week").count() == 0)
    // each cohort's first active week is the cohort week itself
    val firsts = r.groupBy($"cohort_week").agg(min($"week").as("w"))
    assert(firsts.filter($"w" =!= $"cohort_week").count() == 0)
    r.unpersist()
  }

  test("salted join result equals the plain join") {
    import spark.implicits._
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_plain"))
    val salted = run("rel_salted_join")
    val joined = salted.join(plain, "c_mktsegment")
    assert(joined.filter($"n_orders" =!= $"n_plain").count() == 0)
    assert(salted.count() == plain.count())
  }

  test("pagerank: node universe, damping floor, and score conservation bound") {
    import spark.implicits._
    val pr = run("rel_pagerank").cache()
    // node set = every endpoint of the undirected trade graph
    val e0 = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
    val nodes = e0.select($"src".as("n")).union(e0.select($"dst".as("n")))
      .distinct().count()
    assert(pr.count() == nodes)
    // damping: every score >= the teleport floor 150000, and no score
    // exceeds total injected mass (nodes × 1e6 micro-units)
    assert(pr.filter($"score" < 150000L).count() == 0)
    assert(pr.agg(max($"score")).first().getLong(0) < nodes * 1000000L)
    pr.unpersist()
  }

  test("recursive CTE BFS equals an independent DataFrame-composed BFS") {
    import spark.implicits._
    // the SQL surface (Spark 4 WITH RECURSIVE, byte-identical text to
    // the DuckDB dialect) against a hand-rolled bounded BFS — two
    // entirely different execution paths, one truth
    val viaSql = operators.SqlSurface.recursiveReach(spark, sfDir)
      .collect().map(_.toSeq)
    val e0 = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
      .localCheckpoint()
    val r0 = Tables.customer(spark, sfDir)
      .filter($"c_custkey" % 997 === 1)
      .select(($"c_custkey" * 2).as("root"), ($"c_custkey" * 2).as("node"),
        lit(0).as("depth"))
    val levels = Iterator.iterate(r0)(prev =>
      prev.join(edges, $"node" === $"src")
        .select($"root", $"dst".as("node"), ($"depth" + 1).as("depth")))
      .take(3).toSeq
    val viaDf = levels.reduce(_ unionByName _)
      .groupBy($"root", $"node").agg(min($"depth").as("depth"))
      .groupBy($"root", $"depth")
      .agg(countDistinct($"node").as("n_nodes"))
      .orderBy($"root", $"depth")
      .collect().map(_.toSeq)
    assert(viaSql.nonEmpty)
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("returned revenue is the true top-20 of the unlimited aggregate") {
    import spark.implicits._
    val q10 = run("rel_returned_revenue").collect()
    assert(q10.length <= 20)
    // revenue non-increasing down the list
    val revs = q10.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // recompute the full aggregate without the limit and check the edge
    val full = Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderdate" >= lit("1996-07-01 00:00:00").cast("timestamp_ntz") &&
            $"o_orderdate" < lit("1996-10-01 00:00:00").cast("timestamp_ntz")),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,4)") *
        (lit(1) - $"l_discount").cast("decimal(18,4)")).as("rev"))
      .orderBy($"rev".desc, $"c_custkey")
      .limit(20).collect()
    assert(q10.map(_.getLong(0)).toSeq == full.map(_.getLong(0)).toSeq)
  }

  test("sketch union: merge law holds in the gate; per-scope accuracy " +
      "within tolerance (probabilistic — lives here, not in the oracle)") {
    import spark.implicits._
    // the gate pins only the deterministic merge law (union estimate ==
    // direct-build estimate); the ACCURACY claim is probabilistic —
    // lgK=12 HLL is ~1.6% rse once a scope leaves exact sparse mode —
    // so it is asserted here where a failure names the broken bound
    // instead of flaking a hash gate
    val out = run("rel_sketch_union").collect()
    assert(out.forall(_.getBoolean(2)),
      "HLL merge law violated: union-of-sketches estimate differs from" +
        " the directly-built global sketch estimate")
    val perType = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))).as("est"),
        countDistinct($"user_id").as("exact"))
      .collect()
    perType.foreach { r =>
      val est = r.getLong(1).toDouble; val exact = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"HLL lgK=12 estimate for ${r.getString(0)} off by more than 5%:" +
          s" est=$est exact=$exact (rse ~1.6%, so this is a >3-sigma event" +
          s" — suspect a sketch/library change, not noise)")
    }
  }
}
