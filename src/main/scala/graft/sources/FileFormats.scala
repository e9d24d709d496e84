package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet batch source formats under the hash gate — the
  * interchange lanes every lakehouse ingests from (CSV exports, JSON
  * event dumps, ORC from legacy Hive warehouses; the reference's stack
  * ingests CSV/JSON via its connector configs, `README.MD` ingest
  * section). Each gated query WRITES a fixture in the foreign format
  * from the parquet table once per (JVM, sfDir) — pid-discriminated
  * path, the scd2_changefeed memoization pattern — then reads it back
  * through the real `spark.read.csv/json/orc` lane with an EXPLICIT
  * schema (schema inference is a second full scan and
  * non-deterministic under type drift — never at 100 TB) and runs an
  * aggregate the DuckDB oracle reproduces from the original parquet.
  * The gate therefore proves lossless round-trips: shortest-repr
  * DOUBLE text round-trips exactly in CSV/JSON (Java `Double.toString`
  * guarantee), ORC is binary-exact.
  *
  * Scale shape: all three reads are splittable scans (CSV/JSON by line
  * ranges, ORC by stripes) feeding map-side-combined aggregates — one
  * exchange each at any size. Timestamps stay OUT of the text lanes
  * deliberately: cross-format timestamp parsing is the classic silent
  * corruption and belongs to the parquet/ORC lanes.
  */
object FileFormats {
  type Q = (SparkSession, String) => DataFrame

  private val built = new ConcurrentHashMap[(SparkSession, String), String]()

  /** Write supplier.csv / nation.json / lineitem.orc fixtures once per
    * (session, sfDir); returns the fixture root. */
  private def fixture(s: SparkSession, d: String): String =
    built.computeIfAbsent((s, d), _ => {
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-fileformats-${Integer.toHexString(d.hashCode)}-p${ProcessHandle.current().pid()}")
        .getAbsolutePath
      graft.Tables.supplier(s, d)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .write.mode("overwrite").option("header", "true").csv(s"$root/supplier_csv")
      graft.Tables.nation(s, d).select("n_nationkey", "n_name")
        .write.mode("overwrite").json(s"$root/nation_json")
      graft.Tables.lineitem(s, d)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").orc(s"$root/lineitem_orc")
      root
    })

  private val supplierCsvSchema = StructType(Seq(
    StructField("s_suppkey", LongType), StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
  private val nationJsonSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType)))
  private val lineitemOrcSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_returnflag", StringType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType)))

  /** CSV supplier dim ⋈ JSON nation dim: per-nation supplier count and
    * exact DECIMAL balance total, both sides read through the text
    * lanes. */
  private val csvJson: Q = (s, d) => {
    val root = fixture(s, d)
    val sup = s.read.schema(supplierCsvSchema).option("header", "true")
      .csv(s"$root/supplier_csv")
    val nat = s.read.schema(nationJsonSchema).json(s"$root/nation_json")
    sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(18,4)")).cast("double").as("total_acctbal"))
      .orderBy(col("n_name"))
  }
  private val csvJsonSql =
    """SELECT n_name, COUNT(*) AS n_suppliers,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ORC lineitem scan: the classic returnflag rollup through the ORC
    * lane (binary round-trip, stripe-splittable scan). */
  private val orcScan: Q = (s, d) => {
    val root = fixture(s, d)
    s.read.schema(lineitemOrcSchema).orc(s"$root/lineitem_orc")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_price"))
      .orderBy(col("l_returnflag"))
  }
  private val orcScanSql =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "src_csv_json" -> csvJson,
    "src_orc_scan" -> orcScan)
  val oracles: Map[String, String] = Map(
    "src_csv_json" -> csvJsonSql,
    "src_orc_scan" -> orcScanSql)
}
