package graft.cdc

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable slice of the CDC parse path: JSON field extraction
  * with cast + null-on-missing semantics (`cdc_to_pinot_current.py:83-114`,
  * P1/P2) exercised against the driver's `events.props` JSON column.
  * Full-envelope parsing (nested before/after images, op filter,
  * malformed input) is covered by `EnvelopeSpec` fixtures.
  */
object CdcQueries {
  type Q = (SparkSession, String) => DataFrame

  private val jsonExtract: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id", $"event_type",
        get_json_object($"props", "$.k").cast("int").as("k"),
        get_json_object($"props", "$.missing").as("missing_field"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        count($"missing_field").as("n_missing_present"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }
  private val jsonExtractSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  COUNT(json_extract_string(props, '$.missing')) AS n_missing_present,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map("cdc_json_extract" -> jsonExtract)
  val oracles: Map[String, String] = Map("cdc_json_extract" -> jsonExtractSql)
}
