package graft.tables

import graft.scd2.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Declarative table definition → physical DDL + policies: the
  * config-as-code layer (SURVEY D9/D10), re-deriving the reference's
  * YAML→Pinot-config generator
  * (`/root/reference/scripts/pinot_auto/generate_pinot_configs.py:33-141`,
  * `pinot_tables.yaml:6-250`) as typed Scala. A spec captures what the
  * YAML captured — columns by role, key + comparison column for upsert
  * resolution, partitioning, retention — and emits Spark artifacts
  * (StructType, CREATE TABLE DDL, properties) instead of Pinot JSON.
  */
final case class ColumnSpec(name: String, dataType: DataType,
                            role: ColumnRole = ColumnRole.Dimension,
                            /** Pinot datetime format string (the YAML's
                              * time_col format, `pinot_tables.yaml:26-29`);
                              * meaningful for Datetime-role columns. The
                              * unit token feeds BOTH the schema field's
                              * format/granularity and the table config's
                              * timeType (r9 advisory: timeType was a
                              * hardcoded literal — correct for every
                              * current spec, silently wrong for a future
                              * non-millis time column). */
                            timeFormat: String = "1:MILLISECONDS:EPOCH",
                            /** Explicit schema-granularity override
                              * (Pinot treats granularity as a field
                              * INDEPENDENT of the format — r10 advisory;
                              * the generator's YAML carries both). None
                              * → derived as the format's `<n>:<UNIT>`
                              * prefix, the generator's own default. */
                            granularityOverride: Option[String] = None) {
  // r10 advisory: a malformed format ("MILLISECONDS") used to throw a
  // bare ArrayIndexOutOfBounds at JSON-emit time — require the Pinot
  // shape `<size>:<UNIT>:<EPOCH|SIMPLE_DATE_FORMAT[:pattern]>` up front
  // with a message naming the column.
  require(timeFormat.matches("""\d+:[A-Z]+:(EPOCH|SIMPLE_DATE_FORMAT(:.+)?)"""),
    s"column $name: timeFormat '$timeFormat' is not of the Pinot shape " +
      "'<size>:<UNIT>:<EPOCH|SIMPLE_DATE_FORMAT[:pattern]>'")

  /** Unit token of the datetime format ("1:MILLISECONDS:EPOCH" →
    * "MILLISECONDS") — Pinot's `timeType`. */
  def timeUnit: String = timeFormat.split(":")(1)

  /** Schema granularity: the explicit override when given, else the
    * format's `<size>:<UNIT>` prefix. */
  def granularity: String =
    granularityOverride.getOrElse(timeFormat.split(":").take(2).mkString(":"))
}

sealed trait ColumnRole
object ColumnRole {
  case object Dimension extends ColumnRole
  case object Metric extends ColumnRole
  case object Datetime extends ColumnRole
}

final case class RetentionSpec(timeColumn: String, days: Int)

final case class TableSpec(
    name: String,
    columns: Seq[ColumnSpec],
    primaryKey: Option[String] = None,
    /** Upsert resolution column (Pinot `comparisonColumn`,
      * `pinot_tables.yaml:32-36`): last-write-wins per key. */
    comparisonColumn: Option[String] = None,
    partitionBy: Seq[String] = Nil,
    retention: Option[RetentionSpec] = None,
    properties: Map[String, String] = Map.empty) {

  def schema: StructType =
    StructType(columns.map(c => StructField(c.name, c.dataType)))

  /** CREATE TABLE DDL (what the generator's JSON was for Pinot). */
  def ddl(format: String = "parquet"): String = {
    val cols = columns.map(c => s"  ${c.name} ${c.dataType.sql}").mkString(",\n")
    val part = if (partitionBy.isEmpty) ""
      else s"\nPARTITIONED BY (${partitionBy.mkString(", ")})"
    val props = properties ++
      retention.map(r => "graft.retention.days" -> r.days.toString) ++
      retention.map(r => "graft.retention.column" -> r.timeColumn) ++
      primaryKey.map("graft.upsert.key" -> _) ++
      comparisonColumn.map("graft.upsert.comparisonColumn" -> _)
    val tbl = if (props.isEmpty) ""
      else "\nTBLPROPERTIES (" + props.toSeq.sorted
        .map { case (k, v) => s"'$k'='$v'" }.mkString(", ") + ")"
    s"CREATE TABLE IF NOT EXISTS $name (\n$cols\n) USING $format$part$tbl"
  }

  /** Empty DataFrame with this spec's schema (table bootstrap). */
  def emptyFrame(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  // ---- Pinot-style physical-config JSON emission -------------------
  // The reference generator's OUTPUT shape
  // (`generate_pinot_configs.py:33-141`): a schema JSON (columns split
  // by role, primary key for upsert tables) and a table-config JSON
  // (segments/retention, upsert resolution, stream ingestion, routing).
  // The semantics already live in this spec — DDL + properties are the
  // engine-native form — this emitter closes the byte-level interface
  // for an operator migrating off the reference's Pinot deployment.
  // JSON is hand-built with deterministic field order (stable diffs,
  // no extra dependency), matching the generator's key names exactly.

  private def esc(s: String): String = graft.GraftSession.jsonEscape(s)

  private def pinotType(t: DataType): String = t match {
    case IntegerType => "INT"
    case LongType => "LONG"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType | StringType => "STRING"
    case other => throw new IllegalArgumentException(
      s"no Pinot type mapping for $other (column of table $name)")
  }

  /** Pinot schema JSON (`generate_pinot_configs.py:33-71`): columns
    * split by role; upsert tables carry `primaryKeyColumns`. */
  def pinotSchemaJson: String = {
    def field(c: ColumnSpec) =
      s"""{"name":${esc(c.name)},"dataType":${esc(pinotType(c.dataType))}}"""
    def dtField(c: ColumnSpec) =
      s"""{"name":${esc(c.name)},"dataType":${esc(pinotType(c.dataType))},""" +
        s""""format":${esc(c.timeFormat)},""" +
        s""""granularity":${esc(c.granularity)}}"""
    val dims = columns.filter(_.role == ColumnRole.Dimension).map(field)
    val mets = columns.filter(_.role == ColumnRole.Metric).map(field)
    val dts = columns.filter(_.role == ColumnRole.Datetime).map(dtField)
    // primaryKeyColumns is an upsert-mode artifact: the generator only
    // emits it when mode=='upsert' (generate_pinot_configs.py:43-45),
    // and upsert mode requires a comparison column — gate on BOTH so a
    // pk-without-comparisonColumn spec yields a non-upsert schema that
    // matches its non-upsert table config.
    val pk = primaryKey.filter(_ => comparisonColumn.isDefined).map(k =>
      s""""primaryKeyColumns":[${esc(k)}],""").getOrElse("")
    s"""{"schemaName":${esc(name)},$pk""" +
      s""""dimensionFieldSpecs":[${dims.mkString(",")}],""" +
      s""""metricFieldSpecs":[${mets.mkString(",")}],""" +
      s""""dateTimeFieldSpecs":[${dts.mkString(",")}]}"""
  }

  /** Pinot table-config JSON (`generate_pinot_configs.py:74-141`):
    * segments/retention block keyed on the first datetime column,
    * upsert block when the spec resolves by key, one Kafka stream
    * config map, and strict-replica-group routing for upsert tables —
    * the generator's exact key names and defaults. */
  def pinotTableJson(broker: String, topic: String,
      tableType: String = "REALTIME", replication: Int = 1,
      flushThresholdRows: Int = 100000): String = {
    val timeCol = columns.find(_.role == ColumnRole.Datetime).map(_.name)
      .orElse(retention.map(_.timeColumn))
      .getOrElse(throw new IllegalArgumentException(
        s"table $name has no datetime column for segmentsConfig"))
    val ret = retention.map(r =>
      s""""retentionTimeUnit":"DAYS","retentionTimeValue":${esc(r.days.toString)},""")
      .getOrElse("")
    val upsert =
      if (primaryKey.isDefined && comparisonColumn.isDefined)
        s""""upsertConfig":{"mode":"FULL","comparisonColumn":${esc(comparisonColumn.get)}},"""
      else ""
    val routing =
      if (primaryKey.isDefined && comparisonColumn.isDefined)
        s""","routing":{"instanceSelectorType":"strictReplicaGroup"}"""
      else ""
    val stream =
      s"""{"streamType":"kafka",""" +
        s""""stream.kafka.consumer.type":"lowlevel",""" +
        s""""stream.kafka.topic.name":${esc(topic)},""" +
        s""""stream.kafka.broker.list":${esc(broker)},""" +
        s""""stream.kafka.consumer.factory.class.name":"org.apache.pinot.plugin.stream.kafka20.KafkaConsumerFactory",""" +
        s""""stream.kafka.decoder.class.name":"org.apache.pinot.plugin.stream.kafka.KafkaJSONMessageDecoder",""" +
        s""""realtime.segment.flush.threshold.rows":${esc(flushThresholdRows.toString)},""" +
        s""""stream.kafka.consumer.prop.auto.offset.reset":"smallest"}"""
    // timeType is DERIVED from the datetime column's format string
    // ("1:MILLISECONDS:EPOCH" → "MILLISECONDS"), matching the YAML's
    // time_column.type (pinot_tables.yaml:26-29) — r9 advisory: the
    // literal was correct for every current spec but silently wrong
    // for a future non-millis column. The generator emits it alongside
    // timeColumnName plus a fixed segment-assignment strategy
    // (generate_pinot_configs.py:90-99). A retention-only time column
    // (no ColumnSpec) keeps the generator's MILLISECONDS default.
    val timeType = columns.find(_.role == ColumnRole.Datetime)
      .map(_.timeUnit).getOrElse("MILLISECONDS")
    s"""{"tableName":${esc(name)},"tableType":${esc(tableType)},""" +
      s""""segmentsConfig":{"timeColumnName":${esc(timeCol)},""" +
      s""""timeType":${esc(timeType)},$ret""" +
      s""""segmentPushType":"APPEND",""" +
      s""""segmentAssignmentStrategy":"BalanceNumSegmentAssignmentStrategy",""" +
      s""""schemaName":${esc(name)},""" +
      s""""replication":${esc(replication.toString)},"replicasPerPartition":${esc(replication.toString)}},""" +
      s""""tenants":{},""" +
      s""""tableIndexConfig":{"loadMode":"MMAP","nullHandlingEnabled":true},""" +
      upsert +
      s""""ingestionConfig":{"streamIngestionConfig":{"streamConfigMaps":[$stream]}},""" +
      s""""metadata":{}$routing}"""
  }
}

object TableSpec {
  import ColumnRole._

  /** The engine's standard tables, declared once — mirrors the
    * reference's `pinot_tables.yaml` (current/history) and the SCD2 +
    * checkpoint DDL (`scd2_spark_processor.py:135-177`). */
  val salesCurrent: TableSpec = TableSpec(
    name = "sales_current",
    columns = Seq(
      ColumnSpec("id", IntegerType),
      ColumnSpec("product_name", StringType),
      ColumnSpec("category", StringType),
      ColumnSpec("price", DoubleType, Metric),
      ColumnSpec("quantity", IntegerType, Metric),
      ColumnSpec("sale_date", LongType),
      ColumnSpec("created_at", LongType),
      ColumnSpec("last_updated_ts", LongType, Datetime),
      ColumnSpec("is_deleted", BooleanType),
      // stored tiebreaker: last-write-wins resolution on equal
      // last_updated_ts compares lsn, so the streamed table keeps it
      // (keeps DDL and the streaming CurrentStateTable schema-identical)
      ColumnSpec("lsn", LongType)),
    primaryKey = Some("id"),
    comparisonColumn = Some("last_updated_ts"),
    retention = Some(RetentionSpec("last_updated_ts", 30)))

  val salesHistory: TableSpec = TableSpec(
    name = "sales_history",
    columns = Seq(
      ColumnSpec("record_id", IntegerType),
      ColumnSpec("op", StringType),
      ColumnSpec("op_description", StringType),
      ColumnSpec("event_timestamp", LongType, Datetime),
      ColumnSpec("processing_time", LongType, Datetime)),
    retention = Some(RetentionSpec("event_timestamp", 90)))

  val salesScd2: TableSpec = TableSpec(
    name = "sales_scd2",
    columns = Seq(
      ColumnSpec("id", IntegerType),
      ColumnSpec("product_name", StringType),
      ColumnSpec("category", StringType),
      ColumnSpec("price", DoubleType, Metric),
      ColumnSpec("quantity", IntegerType, Metric),
      ColumnSpec("sale_date", IntegerType),
      ColumnSpec("created_at", LongType),
      ColumnSpec("effective_start_ts", TimestampType, Datetime),
      ColumnSpec("effective_end_ts", TimestampType, Datetime),
      ColumnSpec("is_current", BooleanType),
      ColumnSpec("record_hash", StringType),
      ColumnSpec("is_deleted", BooleanType),
      // derived partition column (the reference's hidden days() transform
      // made explicit, SURVEY D2) — must be in the schema or the emitted
      // PARTITIONED BY DDL is unexecutable
      ColumnSpec("effective_start_date", DateType)),
    primaryKey = Some("id"),
    partitionBy = Seq("effective_start_date"),
    properties = Map("write.format.default" -> "parquet",
      "write.parquet.compression-codec" -> "snappy"))
}

/** Retention enforcement (D10): the reference declares 30/90-day
  * retention in YAML and lets Pinot enforce it; here the maintenance
  * job is explicit — drop expired rows into a new snapshot, then
  * vacuum old snapshot versions past the time-travel horizon.
  */
object Retention {
  /** Rows with `timeColumn` (epoch millis) older than `now - days` are
    * dropped; rows with a NULL time column are KEPT (a null-rejecting
    * predicate would silently purge them — retention only removes rows
    * proven expired). Returns the new version.
    *
    * This is the O(table) full-rewrite fallback for tables whose
    * partitioning carries no time information (e.g. id-bucketed
    * current-state tables, where expired rows are scattered across
    * every bucket). Date-partitioned tables — the layout Pinot's
    * retention manager assumes and the reference's history lanes use —
    * should call [[enforceDatePartitioned]] instead: O(expired
    * metadata), not O(data). */
  def enforce(table: VersionedTable, spec: RetentionSpec, nowMs: Long): Int = {
    val cutoff = nowMs - spec.days.toLong * 86400000L
    table.overwrite(table.read()
      .filter(col(spec.timeColumn).isNull || col(spec.timeColumn) >= cutoff))
  }

  /** Metadata-only retention for tables partitioned by the UTC DAY of
    * `spec.timeColumn` (`Partitioning.ByColumn` over an ISO-date column
    * derived as `to_date(from_unixtime(timeColumn/1000))` — the
    * reference's `days()` hidden transform made explicit):
    *
    *  - partitions whose whole day lies before the cutoff are DROPPED
    *    from the manifest — zero data I/O, their files vanish at the
    *    next [[VersionedTable.vacuum]];
    *  - the single partition containing the cutoff instant is rewritten
    *    row-filtered (skipped entirely when the cutoff is midnight);
    *  - live-day and null-date partitions carry forward by reference
    *    (NULL time column means "not proven expired" — kept, matching
    *    [[enforce]]).
    *
    * Cost is O(expired partitions) manifest metadata plus at most one
    * day of data rewrite — the shape that holds at 100 TB. Returns the
    * new version (the current head when nothing expired). */
  def enforceDatePartitioned(table: VersionedTable, spec: RetentionSpec,
                             nowMs: Long): Int = {
    val cutoff = nowMs - spec.days.toLong * 86400000L
    val cutoffDay = java.time.Instant.ofEpochMilli(cutoff)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val head = table.currentHead.getOrElse(
      throw new IllegalStateException("retention on an empty table"))
    def dayOf(p: String): Option[java.time.LocalDate] =
      try Some(java.time.LocalDate.parse(p))
      catch { case _: java.time.format.DateTimeParseException => None }
    val parts = table.manifestFiles(head).map(_._1).distinct
    val expired = parts.filter(p => dayOf(p).exists(_.isBefore(cutoffDay)))
    // midnight cutoff ⇒ every row of the cutoff-day partition survives
    val boundary =
      if (cutoff % 86400000L == 0L) Nil
      else parts.filter(p => dayOf(p).contains(cutoffDay))
    if (expired.isEmpty && boundary.isEmpty) return head
    val keepRow = col(spec.timeColumn).isNull || col(spec.timeColumn) >= cutoff
    if (expired.isEmpty) {
      // nothing to drop wholesale: rewrite the boundary day only if it
      // actually holds expired rows — repeated enforcement at the same
      // cutoff must not churn new versions (one-partition probe, cheap)
      val dead = table.readPartitions(boundary).filter(!keepRow).limit(1).count()
      if (dead == 0L) return head
    }
    val survivors =
      if (boundary.isEmpty) table.read().filter(lit(false)) // schema-only, optimizes to an empty relation
      else table.readPartitions(boundary).filter(keepRow)
    table.replacePartitions(survivors, expired ++ boundary)
  }
}
