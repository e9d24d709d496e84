package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/DDL surface (SURVEY D1–D6): namespace creation, current-
  * database selection, managed-table registration, temp views — the
  * reference's Nessie/Iceberg catalog bootstrap
  * (`libs/scd2_spark_processor.py:117-177`) mapped onto Spark's
  * built-in session catalog. Branch/merge semantics (D8) remain a
  * non-goal; table versioning/time travel live in
  * [[graft.scd2.VersionedTable]].
  */
object CatalogOps {

  /** CREATE NAMESPACE IF NOT EXISTS + USE (D1/D4). */
  def ensureNamespace(spark: SparkSession, name: String): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name")
    spark.sql(s"USE $name")
  }

  /** Register a spec'd table in the catalog (DDL emission → execution);
    * idempotent like the reference's IF NOT EXISTS DDL. */
  def createTable(spark: SparkSession, spec: TableSpec): Unit =
    spark.sql(spec.ddl())

  /** Save a DataFrame as a managed table and read it back through the
    * catalog (the `writeTo(...).append()` / `spark.table` round trip). */
  def saveAndRead(spark: SparkSession, df: DataFrame, table: String): DataFrame = {
    df.write.mode("overwrite").saveAsTable(table)
    spark.table(table)
  }
}
