package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External ingestion sources (SURVEY S1/S4) — the reference's actual
  * ingest edges, re-expressed as Spark source configs:
  *
  *  - Kafka: the CDC topic feed every streaming lane consumes
  *    (`/root/reference/scripts/cdc_to_parquet.py:77-88`: bootstrap
  *    servers + topic + `CAST(value AS STRING)`, earliest offsets).
  *  - JDBC: the operational-database snapshot/backfill read
  *    (`/root/reference/libs/scd2_spark_processor.py:68` ships the
  *    Postgres driver for exactly this).
  *
  * This sandbox ships no Kafka connector jar, so [[Kafka.available]]
  * reports which lane can run and the streaming lanes default to the
  * file-backed stand-in with identical downstream semantics; the
  * builder itself is complete and option construction is spec-pinned,
  * so a deployment with `spark-sql-kafka` on the classpath changes one
  * call site and nothing else.
  */
final case class KafkaSourceConfig(
    bootstrapServers: String,
    topic: String,
    /** "earliest" for backfill, "latest" for tail — the reference pins
      * earliest so a restarted job replays the topic (the downstream
      * lanes are idempotent, SURVEY T2). */
    startingOffsets: String = "earliest",
    /** Backpressure: bound each micro-batch — REQUIRED at scale or the
      * first batch after downtime is the whole topic backlog. */
    maxOffsetsPerTrigger: Option[Long] = None,
    failOnDataLoss: Boolean = true,
    /** Pass-through for kafka.* security/client tuning. */
    extraOptions: Map[String, String] = Map.empty)

object Kafka {
  val ProviderClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  /** True when the Kafka connector jar is on the classpath. */
  def available: Boolean =
    try { Class.forName(ProviderClass); true }
    catch { case _: ClassNotFoundException => false }

  def readerOptions(c: KafkaSourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "subscribe" -> c.topic,
      "startingOffsets" -> c.startingOffsets,
      "failOnDataLoss" -> c.failOnDataLoss.toString
    ) ++
      c.maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString) ++
      c.extraOptions

  /** Raw CDC stream off Kafka: one `raw_message` STRING per record
    * (value bytes cast, the Debezium JSON envelope), shaped exactly
    * like `Streams.rawFileStream` so every downstream lane is
    * source-agnostic. With `includeMetadata` the Kafka coordinates ride
    * along for audit/dedup (offset is the Kafka-native LSN analog). */
  def rawKafkaStream(spark: SparkSession, config: KafkaSourceConfig,
                     includeMetadata: Boolean = false): DataFrame = {
    val raw = spark.readStream.format("kafka")
      .options(readerOptions(config))
      .load()
    if (includeMetadata)
      raw.selectExpr("CAST(value AS STRING) AS raw_message",
        "topic", "partition", "offset", "timestamp AS kafka_timestamp")
    else raw.selectExpr("CAST(value AS STRING) AS raw_message")
  }
}

/** JDBC source config (SURVEY S4). The scale knobs are the partitioned
  * read: `partitionColumn` + bounds + `numPartitions` turn the single
  * serial cursor into N range-partitioned parallel cursors — without
  * them a 100 GB operational table funnels through one connection.
  */
final case class JdbcSourceConfig(
    url: String,
    /** Table name, or a pushed-down subquery `(SELECT ...) t`. */
    table: String,
    driver: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    /** Numeric/date column to range-partition the read on (the PK in
      * the reference's sales table). */
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Option[Int] = None,
    fetchSize: Int = 10000,
    extraOptions: Map[String, String] = Map.empty)

object Jdbc {
  def readerOptions(c: JdbcSourceConfig): Map[String, String] =
    Map(
      "url" -> c.url,
      "dbtable" -> c.table,
      "fetchsize" -> c.fetchSize.toString
    ) ++
      c.driver.map("driver" -> _) ++
      c.user.map("user" -> _) ++
      c.password.map("password" -> _) ++
      c.partitionColumn.map("partitionColumn" -> _) ++
      c.lowerBound.map(b => "lowerBound" -> b.toString) ++
      c.upperBound.map(b => "upperBound" -> b.toString) ++
      c.numPartitions.map(n => "numPartitions" -> n.toString) ++
      c.extraOptions

  /** Batch read of an operational table — the SCD2 bootstrap/backfill
    * path. Filters/column pruning push into the remote SQL via
    * Catalyst's JDBC pushdown. */
  def read(spark: SparkSession, config: JdbcSourceConfig): DataFrame =
    spark.read.format("jdbc").options(readerOptions(config)).load()
}

/** Multi-catalog federation under the hash gate — the reference's
  * Trino Iceberg↔Postgres acceptance shape (`README.MD:316-327`): one
  * plan joining an OPERATIONAL-database dimension against a lakehouse
  * parquet fact. The dimension lives in an in-memory Derby instance
  * (loaded from the nation table at query start — the 25-row
  * bootstrap a real deployment does once); the query reads it back
  * THROUGH the JDBC source and broadcasts it into the customer scan.
  * Scale shape: the dim is broadcast (operational tables are dim-
  * sized by definition), the fact never leaves its parquet scan
  * partitioning until the one aggregate exchange, and the JDBC read
  * would range-partition on the key for a big operational table
  * ([[Jdbc.read]]'s partitionColumn knobs, spec-pinned). */
object Federated {
  type Q = (SparkSession, String) => DataFrame
  import org.apache.spark.sql.functions._

  private val federatedJoin: Q = (s, d) => {
    val url = s"jdbc:derby:memory:graftfed${Integer.toHexString(d.hashCode)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE nation_dim")
      catch { case _: java.sql.SQLException => () } // first run: no table yet
      st.execute("CREATE TABLE nation_dim (n_nationkey BIGINT, n_name VARCHAR(64))")
      st.close()
      val ps = conn.prepareStatement("INSERT INTO nation_dim VALUES (?, ?)")
      graft.Tables.nation(s, d).select("n_nationkey", "n_name").collect().foreach { r =>
        ps.setLong(1, r.getAs[Number](0).longValue); ps.setString(2, r.getString(1)); ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    } finally conn.close()
    // Derby folds unquoted identifiers to upper case; re-alias so the
    // output schema matches the oracle
    val dim = Jdbc.read(s, JdbcSourceConfig(url, "nation_dim",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver")))
      .select(col("N_NATIONKEY").as("n_nationkey"), col("N_NAME").as("n_name"))
    val fact = graft.Tables.customer(s, d)
    fact.join(broadcast(dim), fact("c_nationkey") === dim("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("total_acctbal"))
      .orderBy(col("n_name"))
  }
  private val federatedJoinSql =
    """SELECT n.n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map("rel_federated_join" -> federatedJoin)
  val oracles: Map[String, String] = Map("rel_federated_join" -> federatedJoinSql)
}
