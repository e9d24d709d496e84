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

  val queries: Map[String, Q] = Map(
    "sql_segment_rollup" -> sqlQ(rollupSql),
    "sql_audit_trail" -> sqlQ(auditSql),
    "sql_history_scan" -> sqlQ(historySql),
    "sql_correlated_exists" -> sqlQ(correlatedSql))

  /** The oracle IS the executed SQL — byte-identical text. */
  val oracles: Map[String, String] = Map(
    "sql_segment_rollup" -> rollupSql,
    "sql_audit_trail" -> auditSql,
    "sql_history_scan" -> historySql,
    "sql_correlated_exists" -> correlatedSql)
}
