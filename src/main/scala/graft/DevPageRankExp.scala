package graft

import org.apache.spark.sql.functions._

/** Dev micro-bench: pagerank iteration shapes, interleaved in one JVM
  * so box drift can't masquerade as a win (the r12 lesson). Shapes:
  *   A  r8 committed: distinct-union checkpoint, per-iteration
  *      edge re-exchange + edge-sized deg join
  *   B  r9 candidate: mirror map-side, repartition(src)+dedupe+persist,
  *      per-node contributions, node-sized deg join
  * Each rep unpersists/clears like Bench's hygiene so both pay their
  * own materialization. Usage: sbt "runMain graft.DevPageRankExp [sfDir]" */
object DevPageRankExp {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-prexp")
    import spark.implicits._
    Tables.lineitem(spark, d).count(); Tables.orders(spark, d).count()

    def hygiene(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }

    def shapeA(): Long = {
      val e0 = Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(spark, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .distinct()
      val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
        .localCheckpoint()
      val deg = edges.groupBy($"src".as("node")).agg(count(lit(1)).as("outdeg"))
      val init = deg.select($"node", lit(1000000L).as("score"))
      val scores = (1 to 3).foldLeft(init) { (sc, _) =>
        edges
          .join(sc.withColumnRenamed("node", "src"), "src")
          .join(deg.withColumnRenamed("node", "src")
            .withColumnRenamed("outdeg", "sdeg"), "src")
          .select($"dst".as("node"),
            floor($"score".cast("double") / $"sdeg").cast("long").as("c"))
          .groupBy($"node")
          .agg((lit(150000L) +
            floor(lit(0.85) * sum($"c").cast("double")).cast("long")).as("score"))
      }
      scores.orderBy($"node").count()
    }

    def shapeB(): Long =
      SparkEntry.queries("rel_pagerank")(spark, d).count()

    // C: like B but NO persist — the repartition exchange materializes
    // once and is REUSED by all 4 consumers (no columnar cache encode);
    // each consumer re-runs only the exchange-free dedupe aggregate
    def shapeC(): Long = {
      val e0 = Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(spark, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(explode(array(
          struct(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst")),
          struct(($"l_suppkey" * 2 + 1).as("src"), ($"o_custkey" * 2).as("dst"))))
          .as("e"))
        .select($"e.src", $"e.dst")
      val edges = e0.repartition($"src").dropDuplicates("src", "dst")
      val deg = edges.groupBy($"src".as("node")).agg(count(lit(1)).as("outdeg"))
      val init = deg.select($"node", lit(1000000L).as("score"), $"outdeg")
      val scores = (1 to 3).foldLeft(init) { (st, _) =>
        edges
          .join(st.select($"node".as("src"),
              floor($"score".cast("double") / $"outdeg").cast("long").as("c"))
            .hint("shuffle_hash"), "src")
          .groupBy($"dst".as("node"))
          .agg((lit(150000L) +
            floor(lit(0.85) * sum($"c").cast("double")).cast("long")).as("score"))
          .join(deg.hint("shuffle_hash"), "node")
      }
      scores.select($"node", $"score").orderBy($"node").count()
    }

    // F: r8 checkpoint build kept verbatim; only the ITERATION is
    // reworked (per-node contributions + node-sized deg join)
    def shapeF(): Long = {
      val e0 = Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(spark, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .distinct()
      val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
        .localCheckpoint()
      val deg = edges.groupBy($"src".as("node")).agg(count(lit(1)).as("outdeg"))
      val init = deg.select($"node", lit(1000000L).as("score"), $"outdeg")
      val scores = (1 to 3).foldLeft(init) { (st, _) =>
        edges
          .join(st.select($"node".as("src"),
              floor($"score".cast("double") / $"outdeg").cast("long").as("c"))
            .hint("shuffle_hash"), "src")
          .groupBy($"dst".as("node"))
          .agg((lit(150000L) +
            floor(lit(0.85) * sum($"c").cast("double")).cast("long")).as("score"))
          .join(deg.hint("shuffle_hash"), "node")
      }
      scores.select($"node", $"score").orderBy($"node").count()
    }

    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      hygiene()
    }
    (1 to 4).foreach { i =>
      timed(s"A r8-committed  rep$i")(shapeA())
      timed(s"B r9-persist    rep$i")(shapeB())
      timed(s"C r9-reuse-xchg rep$i")(shapeC())
      timed(s"F r9-iter-only  rep$i")(shapeF())
    }
    spark.stop()
  }
}
