package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `spark.sql` entry point (SURVEY §3.4): the reference's served
  * query surface is plain SQL (Pinot/Trino, README.MD:277-327); here
  * the SAME SQL text runs through Spark's parser AND is the DuckDB
  * oracle — dialect-shared ANSI SQL, zero drift by construction.
  * Exercises parse → analyze (view resolution) → optimize → execute,
  * which the DataFrame-built queries never touch.
  */
object SqlSurface {
  type Q = (SparkSession, String) => DataFrame

  private def sqlQ(sql: String): Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(sql)
  }

  // A5/A6 current-state rollup shape (README.MD:281-286, 318-327).
  private val rollupSql =
    """SELECT c_mktsegment, COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus <> 'F'
      |GROUP BY c_mktsegment
      |ORDER BY total_revenue DESC, c_mktsegment""".stripMargin

  // Point-lookup audit trail (README.MD:288-295): one key, time order.
  private val auditSql =
    """SELECT event_id, user_id, event_type, value
      |FROM events WHERE user_id = 42
      |ORDER BY ts, event_id""".stripMargin

  // Versioned-history scan shape (README.MD:297-303).
  private val historySql =
    """SELECT user_id, COUNT(*) AS n_events,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM events GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // Correlated EXISTS subquery — exercises Catalyst decorrelation
  // (rewritten to a semi join; the reference's Trino federation-style
  // predicates take this path).
  private val correlatedSql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 1.8 FROM orders))
      |ORDER BY c_custkey""".stripMargin

  // Recursive CTE (Spark 4's WITH RECURSIVE — the reference's served
  // engines, Trino/Pinot+Presto, parse the same shape): bounded-depth
  // BFS over the customer↔supplier trade graph, min-depth per node,
  // reach counts per root/depth. Verified EXACTLY equal to DuckDB's
  // recursive evaluation and to an independent DataFrame-composed BFS
  // (RelationalSpec). Deliberately NOT a gated bench query: Spark's
  // recursive executor re-compiles the step plan and re-evaluates the
  // non-recursive CTE members every iteration — a fixed ~15 s overhead
  // at ANY data size (measured: 15.1 s at sf0.01 vs 18.8 s at sf0.1,
  // DuckDB 0.1/1 s), which would dominate the bench artifact without
  // measuring anything data-proportional. The iterative DataFrame
  // formulation (rel_pagerank's shape) is the production path for
  // fixed-depth graph walks; this surface documents SQL-dialect parity.
  val recursiveReachSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT src, dst FROM edges
      |      UNION ALL SELECT dst AS src, src AS dst FROM edges),
      |reach(root, node, depth) AS (
      |  SELECT c_custkey * 2, c_custkey * 2, 0
      |  FROM customer WHERE c_custkey % 997 = 1
      |  UNION ALL
      |  SELECT r.root, e.dst, r.depth + 1
      |  FROM reach r JOIN e ON e.src = r.node
      |  WHERE r.depth < 2)
      |SELECT root, depth, COUNT(DISTINCT node) AS n_nodes
      |FROM (SELECT root, node, MIN(depth) AS depth
      |      FROM reach GROUP BY root, node) m
      |GROUP BY root, depth ORDER BY root, depth""".stripMargin

  /** Executes [[recursiveReachSql]] — see the non-gating rationale above. */
  def recursiveReach: Q = sqlQ(recursiveReachSql)

  // DDL ROUNDTRIP under the gate (D1–D3, previously spec-only in
  // CatalogSpec): CREATE NAMESPACE + a PARTITIONED managed table
  // created via SQL CTAS from a deterministic orders slice, read back
  // THROUGH THE CATALOG and aggregated — parse → analyze → catalog
  // write → partition-directory encoding → catalog read, all
  // value-checked by the oracle recomputing from the source table.
  // Memoized per (session, sfDir). WEAK session keys — a strong-keyed
  // map would pin every SparkSession (and its SessionState) for the
  // JVM's life. The namespace carries a random UUID, not an
  // identityHashCode: hash collisions between two live sessions would
  // let one DROP and recreate the other's fixture table. Each created
  // namespace registers a JVM-shutdown DROP ... CASCADE so managed
  // CTAS tables don't accumulate in the warehouse across runs.
  private val ddlFixtures = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  // ONE static shutdown hook draining weak (session, namespace) pairs —
  // a per-fixture hook would strongly capture the session (defeating
  // the WeakHashMap's weak keys above) and accumulate one thread per
  // fixture for the JVM's life. Collected or stopped sessions are
  // skipped: their managed tables live under a per-PID tmp warehouse
  // (GraftSession) that the OS reclaims.
  private val ddlCleanup = java.util.Collections.synchronizedList(
    new java.util.ArrayList[(java.lang.ref.WeakReference[SparkSession], String)]())
  private lazy val ddlCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      ddlCleanup.forEach { case (ref, ns) =>
        val s = ref.get()
        if (s != null && !s.sparkContext.isStopped)
          try s.sql(s"DROP NAMESPACE IF EXISTS $ns CASCADE")
          catch { case _: Throwable => () }
      }))
  private val ddlSelect =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM %s WHERE o_orderkey %% 7 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin
  private val ddlRoundtrip: Q = (s, d) => {
    Tables.registerAll(s, d)
    val perSession = {
      val got = ddlFixtures.get(s)
      if (got != null) got
      else ddlFixtures.synchronized {
        var m = ddlFixtures.get(s)
        if (m == null) {
          m = new java.util.concurrent.ConcurrentHashMap[String, String]()
          ddlFixtures.put(s, m)
        }
        m
      }
    }
    val tbl = perSession.computeIfAbsent(d, _ => {
      val ns = s"graft_ddl_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val t = s"$ns.orders_slice"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
      s.sql(s"""CREATE TABLE $t USING parquet PARTITIONED BY (o_orderstatus) AS
               |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
               |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin)
      ddlCleanupHook
      ddlCleanup.add((new java.lang.ref.WeakReference(s), ns))
      t
    })
    // the slice filter is already baked into the table; keep the same
    // predicate in the read so the text matches the oracle's shape
    s.sql(ddlSelect.format(tbl))
  }
  private val ddlRoundtripSql = ddlSelect.format("orders")

  val queries: Map[String, Q] = Map(
    "sql_ddl_roundtrip" -> ddlRoundtrip,
    "sql_segment_rollup" -> sqlQ(rollupSql),
    "sql_audit_trail" -> sqlQ(auditSql),
    "sql_history_scan" -> sqlQ(historySql),
    "sql_correlated_exists" -> sqlQ(correlatedSql))

  /** The oracle IS the executed SQL — byte-identical text. */
  val oracles: Map[String, String] = Map(
    "sql_ddl_roundtrip" -> ddlRoundtripSql,
    "sql_segment_rollup" -> rollupSql,
    "sql_audit_trail" -> auditSql,
    "sql_history_scan" -> historySql,
    "sql_correlated_exists" -> correlatedSql)
}
