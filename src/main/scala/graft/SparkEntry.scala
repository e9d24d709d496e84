package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query surfaces. Every key in [[queries]]
  * with a matching key in [[oracleSql]] is hash-compared against DuckDB
  * by the driver; keys without an oracle get a weaker rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("rel_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Tpch.queries ++
      operators.SqlSurface.queries ++
      scd2.Scd2Queries.queries ++ cdc.CdcQueries.queries ++
      ext.TextAnalysis.queries ++ ext.Dedup.queries ++
      ext.Similarity.queries ++ ext.Multimodal.queries ++
      ext.Embeddings.queries ++ sources.Federated.queries ++
      sources.FileFormats.queries ++ streaming.StreamGate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Tpch.oracles ++
      operators.SqlSurface.oracles ++
      scd2.Scd2Queries.oracles ++ cdc.CdcQueries.oracles ++
      ext.TextAnalysis.oracles ++ ext.Dedup.oracles ++
      ext.Similarity.oracles ++ ext.Multimodal.oracles ++
      ext.Embeddings.oracles ++ sources.Federated.oracles ++
      sources.FileFormats.oracles ++ streaming.StreamGate.oracles
}
