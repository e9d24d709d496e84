package graft

import graft.scd2.VersionedTable
import graft.tables.{ColumnSpec, Retention, RetentionSpec, TableSpec}
import org.apache.spark.sql.types._
import java.nio.file.Files

class TableSpecSpec extends SparkSpec {

  test("spec emits schema and DDL with upsert + retention properties") {
    val spec = TableSpec.salesCurrent
    assert(spec.schema.fieldNames.toSeq ==
      Seq("id", "product_name", "category", "price", "quantity",
        "sale_date", "created_at", "last_updated_ts", "is_deleted", "lsn"))
    val ddl = spec.ddl()
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS sales_current"))
    assert(ddl.contains("price DOUBLE"))
    assert(ddl.contains("'graft.upsert.key'='id'"))
    assert(ddl.contains("'graft.upsert.comparisonColumn'='last_updated_ts'"))
    assert(ddl.contains("'graft.retention.days'='30'"))
    assert(!ddl.contains("PARTITIONED BY"))
  }

  test("pinot physical-config JSON: valid JSON, generator's exact shape") {
    import spark.implicits._
    val spec = TableSpec.salesCurrent
    val schemaJson = spec.pinotSchemaJson
    val tableJson = spec.pinotTableJson(
      broker = "kafka:9092", topic = "sales_current_topic")
    // both documents must PARSE as JSON (Spark's reader corrupt-record
    // column stays absent), not merely look like it
    val parsedSchema = spark.read
      .option("mode", "FAILFAST").json(Seq(schemaJson).toDS)
    val parsedTable = spark.read
      .option("mode", "FAILFAST").json(Seq(tableJson).toDS)
    // schema doc: role split + upsert primary key
    val s = parsedSchema.collect()(0)
    assert(parsedSchema.schema.fieldNames.contains("primaryKeyColumns"))
    assert(s.getAs[scala.collection.Seq[String]]("primaryKeyColumns")
      .toList == List("id"))
    assert(s.getAs[String]("schemaName") == "sales_current")
    assert(schemaJson.contains(""""name":"price","dataType":"DOUBLE""""))
    assert(schemaJson.contains(
      """"name":"last_updated_ts","dataType":"LONG","format":"1:MILLISECONDS:EPOCH""""))
    // table doc: segments/retention, upsert resolution, stream map, routing
    val t = parsedTable.collect()(0)
    assert(t.getAs[String]("tableName") == "sales_current")
    assert(tableJson.contains(""""timeType":"MILLISECONDS""""))
    assert(tableJson.contains(
      """"segmentAssignmentStrategy":"BalanceNumSegmentAssignmentStrategy""""))
    assert(tableJson.contains(""""retentionTimeUnit":"DAYS","retentionTimeValue":"30""""))
    assert(tableJson.contains(""""comparisonColumn":"last_updated_ts""""))
    assert(tableJson.contains(""""stream.kafka.topic.name":"sales_current_topic""""))
    assert(tableJson.contains(""""instanceSelectorType":"strictReplicaGroup""""))
    // a non-upsert spec emits NEITHER the upsert block nor the routing
    val hist = TableSpec.salesHistory.pinotTableJson("kafka:9092", "audit")
    assert(!hist.contains("upsertConfig") && !hist.contains("routing"))
    spark.read.option("mode", "FAILFAST").json(Seq(hist).toDS).collect()
    // pk without a comparison column is NOT upsert mode: the schema doc
    // must omit primaryKeyColumns (generator ties it to mode=='upsert')
    val pkOnly = spec.copy(comparisonColumn = None)
    assert(!pkOnly.pinotSchemaJson.contains("primaryKeyColumns"))
    assert(!pkOnly.pinotTableJson("kafka:9092", "t").contains("upsertConfig"))
    // timeType derives from the datetime column's format (r9 advisory:
    // no hardcoded MILLISECONDS) — a seconds-grain column flows through
    // schema format, granularity, AND the table config's timeType
    val secSpec = spec.copy(columns = spec.columns.map(c =>
      if (c.role == graft.tables.ColumnRole.Datetime)
        c.copy(timeFormat = "1:SECONDS:EPOCH") else c))
    assert(secSpec.pinotSchemaJson.contains(
      """"format":"1:SECONDS:EPOCH","granularity":"1:SECONDS""""))
    val secTable = secSpec.pinotTableJson("kafka:9092", "t")
    assert(secTable.contains(""""timeType":"SECONDS""""))
    spark.read.option("mode", "FAILFAST")
      .json(Seq(secSpec.pinotSchemaJson).toDS).collect()
    // r10 advisory: malformed formats fail AT CONSTRUCTION with a
    // message naming the column, not ArrayIndexOutOfBounds at JSON-emit
    val bad = intercept[IllegalArgumentException](
      graft.tables.ColumnSpec("ts", org.apache.spark.sql.types.LongType,
        graft.tables.ColumnRole.Datetime, timeFormat = "MILLISECONDS"))
    assert(bad.getMessage.contains("ts") && bad.getMessage.contains("MILLISECONDS"))
    // SIMPLE_DATE_FORMAT passes the shape check; granularity is
    // independently overridable (the generator's YAML carries both)
    val sdf = graft.tables.ColumnSpec("day", org.apache.spark.sql.types.StringType,
      graft.tables.ColumnRole.Datetime,
      timeFormat = "1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd",
      granularityOverride = Some("1:HOURS"))
    assert(sdf.timeUnit == "DAYS" && sdf.granularity == "1:HOURS")
    val sdfSpec = spec.copy(columns = spec.columns.map(c =>
      if (c.role == graft.tables.ColumnRole.Datetime)
        sdf.copy(name = c.name) else c))
    assert(sdfSpec.pinotSchemaJson.contains(""""granularity":"1:HOURS""""))
  }

  test("scd2 spec declares partitioning like the reference DDL") {
    val ddl = TableSpec.salesScd2.ddl()
    assert(ddl.contains("PARTITIONED BY (effective_start_date)"))
    assert(ddl.contains("'write.parquet.compression-codec'='snappy'"))
  }

  test("empty frame bootstrap matches the declared schema") {
    val df = TableSpec.salesHistory.emptyFrame(spark)
    assert(df.count() == 0)
    assert(df.schema == TableSpec.salesHistory.schema)
  }

  test("compaction rewrites to few files; clustered write sorts within files") {
    import spark.implicits._
    val root = Files.createTempDirectory("compact").toString
    val t = new VersionedTable(spark, root)
    // many small files: 32 shuffle partitions → many part files
    t.overwrite((1 to 10000).map(i => (i % 997, i.toLong)).toDF("k", "v")
      .repartition(32))
    val before = new java.io.File(root, "v=00000").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before > 4)
    val v = t.compact(targetFileCount = 2, clusterBy = Seq("k"))
    assert(v == 1)
    val after = new java.io.File(root, "v=00001").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after <= 2)
    assert(t.read().count() == 10000)
    // clustered: rows within each file are sorted by k
    import org.apache.spark.sql.functions._
    val disorder = t.read()
      .withColumn("f", input_file_name())
      .withColumn("prev", lag($"k", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"f")
          .orderBy(monotonically_increasing_id())))
      .filter($"prev".isNotNull && $"prev" > $"k")
    assert(disorder.count() == 0)
  }

  test("crash resilience: a data dir without a commit marker is invisible") {
    import spark.implicits._
    val root = Files.createTempDirectory("crash").toString
    val t = new VersionedTable(spark, root)
    t.overwrite(Seq((1, "a")).toDF("id", "v"))
    // simulate a writer crash: v=00001 data written, marker never created
    Seq((2, "b")).toDF("id", "v").write.parquet(s"$root/v=00001")
    assert(t.latestVersion.contains(0))
    assert(t.read().count() == 1)
    // the next real commit claims version 1... the orphan dir exists, so
    // overwrite mode replaces it atomically-enough for a single writer
    t.overwrite(Seq((3, "c")).toDF("id", "v"))
    assert(t.latestVersion.contains(1))
    assert(t.read().select("id").first().getInt(0) == 3)
  }

  test("schema evolution: append with a new column null-fills history") {
    import spark.implicits._
    val root = Files.createTempDirectory("evolve").toString
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "v"))
    // evolution is opt-in: default append fails loudly on schema drift
    intercept[org.apache.spark.sql.AnalysisException] {
      t.append(Seq((2, "b", 9.5)).toDF("id", "v", "score"))
    }
    t.append(Seq((2, "b", 9.5)).toDF("id", "v", "score"), mergeSchema = true)
    val rows = t.read().orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("ByColumn partitioning: odd values and NULL round-trip the manifest") {
    import spark.implicits._
    import graft.scd2.Partitioning
    val root = Files.createTempDirectory("bycol").toString
    val t = new VersionedTable(spark, root, Partitioning.ByColumn("k"))
    // reserved manifest keys, sentinel lookalikes, spaces, and NULL as
    // partition VALUES — the round-2 review's corruption candidates
    val df = Seq(
      (Some("meta"), 1), (Some("schema"), 2), (Some("parent"), 3),
      (Some("file"), 4), (Some("-"), 5), (Some("a b"), 6), (None, 7))
      .toDF("k", "v")
    t.overwrite(df)
    assert(t.read().count() == 7)
    assert(t.read().filter($"k".isNull).select("v").first().getInt(0) == 7)
    // partition-scoped rewrite of the "-" partition only
    t.replacePartitions(Seq((Some("-"), 50)).toDF("k", "v"), touched = Seq("-"))
    val after = t.read().collect().map(r => Option(r.getString(0)) -> r.getInt(1)).toMap
    assert(after(Some("-")) == 50, "'-' partition must be replaced, not duplicated")
    assert(t.read().count() == 7)
    assert(after(Some("meta")) == 1 && after(None) == 7)
    // NULL partition is individually addressable too
    t.replacePartitions(Seq((None: Option[String], 70)).toDF("k", "v"),
      touched = Seq(VersionedTable.NullPart))
    assert(t.read().filter($"k".isNull).select("v").first().getInt(0) == 70)
    assert(t.read().count() == 7)
  }

  test("retention drops expired rows; vacuum expires old versions") {
    import spark.implicits._
    val root = Files.createTempDirectory("ret").toString
    val t = new VersionedTable(spark, root)
    val now = 1800000000000L
    val day = 86400000L
    t.overwrite(Seq(
      (1, now - 100 * day), (2, now - 31 * day), (3, now - 5 * day), (4, now))
      .toDF("id", "last_updated_ts"))
    val v1 = Retention.enforce(t, RetentionSpec("last_updated_ts", 30), now)
    assert(v1 == 1)
    assert(t.read().select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4))
    // pre-retention state still time-travelable...
    assert(t.readVersion(0).count() == 4)
    // ...until vacuumed past the horizon
    val expired = t.vacuum(keepVersions = 1)
    assert(expired == Seq(0))
    assert(t.read().count() == 2)
    intercept[Exception] { t.readVersion(0).count() }
  }

  test("date-partitioned retention: expired partitions drop metadata-only (D10)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("retdate").toString
    val t = new VersionedTable(spark, root, graft.scd2.Partitioning.ByColumn("d"))
    val day = 86400000L
    val now = 1800000000000L + day / 2          // midday → a real boundary day
    val cutoff = now - 30 * day
    val rows = Seq(
      (1, Some(cutoff - 35 * day)),             // fully expired day
      (2, Some(cutoff - 2 * day)),              // fully expired day
      (3, Some(cutoff - 3600000L)),             // boundary day, expired half
      (4, Some(cutoff + 3600000L)),             // boundary day, surviving half
      (5, Some(now)),                           // live day
      (6, None))                                // NULL ts → kept, null partition
    t.overwrite(rows.toDF("id", "ts")
      .withColumn("d", to_date(from_unixtime($"ts" / 1000))))
    val v0 = t.manifestFiles(0).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val v1num = Retention.enforceDatePartitioned(t, RetentionSpec("ts", 30), now)
    assert(v1num == 1)
    assert(t.read().select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(4, 5, 6))
    val v1 = t.manifestFiles(1).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val boundaryDay = java.time.Instant.ofEpochMilli(cutoff)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    // expired-day partitions vanished from the manifest
    assert(!v1.keySet.exists(p => p != boundaryDay && p < boundaryDay &&
      !p.startsWith("__")), s"expired partitions must be dropped: ${v1.keySet}")
    // only the boundary partition's files were rewritten; every other
    // surviving partition carries its v0 files BY REFERENCE
    (v1.keySet - boundaryDay).foreach { part =>
      assert(v1(part) == v0(part), s"partition $part must carry forward untouched")
      assert(!v1(part).exists(_.startsWith("v=00001")))
    }
    assert(v1(boundaryDay).forall(_.startsWith("v=00001")))
    // nothing left to expire → no-op returns the current head
    assert(Retention.enforceDatePartitioned(t, RetentionSpec("ts", 30), now) == 1)
    // vacuum reclaims the dropped partitions' data files
    t.vacuum(keepVersions = 1)
    assert(t.read().count() == 3)
  }
}
