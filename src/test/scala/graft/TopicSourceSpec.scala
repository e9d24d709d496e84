package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{MemTopic, MemTopicProvider}

/** The Kafka offset contract (S1) exercised against Spark's REAL
  * streaming engine through the in-sandbox [[MemTopic]] DSv2 source:
  * checkpointed resume, admission-controlled backpressure, latest-only
  * subscription, and retention-induced data loss — the semantics the
  * connector-jar-less sandbox could previously not test at all. */
class TopicSourceSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("topicspec").toString

  private val fmt = classOf[MemTopicProvider].getName

  private def stream(topic: String, opts: Map[String, String] = Map.empty): DataFrame =
    opts.foldLeft(spark.readStream.format(fmt).option("topic", topic)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  private def drain(df: DataFrame, out: String, ck: String): Unit =
    df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()

  test("earliest replay, then checkpointed resume delivers only new records") {
    val t = "t_resume"; MemTopic.create(t, partitions = 2)
    try {
      (0 until 10).foreach(i => MemTopic.produce(t, i % 2, s"k$i", s"v$i"))
      val out = tmp() + "/sink"; val ck = tmp() + "/ck"
      drain(stream(t), out, ck)
      assert(spark.read.parquet(out).count() == 10)
      // restart from the SAME checkpoint after more production: the
      // committed per-partition offsets resume, nothing re-reads
      (10 until 15).foreach(i => MemTopic.produce(t, i % 2, s"k$i", s"v$i"))
      drain(stream(t), out, ck)
      val rows = spark.read.parquet(out)
      assert(rows.count() == 15)
      assert(rows.select("key").distinct().count() == 15) // no duplicates
    } finally MemTopic.drop(t)
  }

  test("maxOffsetsPerTrigger bounds every micro-batch (backpressure)") {
    val t = "t_ratelimit"; MemTopic.create(t, partitions = 2)
    try {
      (0 until 100).foreach(i => MemTopic.produce(t, i % 2, s"k$i", s"v$i"))
      val out = tmp() + "/sink"; val ck = tmp() + "/ck"
      val q = stream(t, Map("maxOffsetsPerTrigger" -> "30"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4, s"expected >=4 rate-limited batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 30),
        s"per-batch rows: ${batches.map(_.numInputRows).mkString(",")}")
      assert(spark.read.parquet(out).count() == 100) // drains to the bound
    } finally MemTopic.drop(t)
  }

  test("startingOffsets=latest skips history, then consumes forward") {
    val t = "t_latest"; MemTopic.create(t, partitions = 1)
    try {
      (0 until 10).foreach(i => MemTopic.produce(t, 0, s"old$i", "x"))
      val out = tmp() + "/sink"; val ck = tmp() + "/ck"
      drain(stream(t, Map("startingOffsets" -> "latest")), out, ck)
      // sink dir may not even exist when zero rows were committed
      val afterFirst = scala.util.Try(spark.read.parquet(out).count()).getOrElse(0L)
      assert(afterFirst == 0, s"latest must skip the 10 historical records, got $afterFirst")
      (0 until 3).foreach(i => MemTopic.produce(t, 0, s"new$i", "y"))
      drain(stream(t, Map("startingOffsets" -> "latest")), out, ck)
      val keys = spark.read.parquet(out).select("key")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(keys == Seq("new0", "new1", "new2"))
    } finally MemTopic.drop(t)
  }

  test("admission control apportions the budget fairly across partitions") {
    // a greedy partition-order fill would hand all 50 to partition 0
    // and starve partition 1; fair shares drain the small partition
    // completely and give the large one the remaining budget
    import graft.sources.{MemTopicStream, TopicOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val t = "t_fair"; MemTopic.create(t, partitions = 2)
    try {
      (0 until 1000).foreach(i => MemTopic.produce(t, 0, s"a$i", "v"))
      (0 until 10).foreach(i => MemTopic.produce(t, 1, s"b$i", "v"))
      val stream = new MemTopicStream(t,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap()))
      val end = stream.latestOffset(TopicOffset(Map(0 -> 0L, 1 -> 0L)),
        ReadLimit.maxRows(50)).asInstanceOf[TopicOffset]
      assert(end.offsets(1) == 10, s"small partition must drain: $end")
      assert(end.offsets(0) == 40, s"large partition gets the rest: $end")
    } finally MemTopic.drop(t)
  }

  test("CDC bronze pipeline runs end-to-end on the topic lane (S1 parity)") {
    // the reference's cdc_to_parquet shape: Kafka value column →
    // envelope flatten → partitioned bronze. The topic lane feeds the
    // SAME downstream contract as the file lane (raw_message string),
    // so the whole bronze pipeline runs unchanged on this source.
    import graft.cdc.CdcFixtures._
    val t = "t_cdc"; MemTopic.create(t, partitions = 2)
    try {
      val ops = randomStream(seed = 11, nKeys = 6, nOps = 40)
      ops.map(toJson).zipWithIndex.foreach { case (j, i) =>
        MemTopic.produce(t, i % 2, s"k$i", j)
      }
      val raw = stream(t)
        .select(org.apache.spark.sql.functions.col("value").as("raw_message"))
      val out = tmp() + "/bronze"; val ck = tmp() + "/ck"
      graft.streaming.Streams.bronzeQuery(raw, out, ck, availableNow = true)
        .awaitTermination()
      val bronze = spark.read.parquet(out)
      assert(bronze.count() == 40)
      assert(bronze.columns.contains("op") && bronze.columns.contains("dt"))
    } finally MemTopic.drop(t)
  }

  test("retention past the committed offset: failOnDataLoss fails, =false skips to earliest") {
    val t = "t_loss"; MemTopic.create(t, partitions = 1)
    try {
      (0 until 20).foreach(i => MemTopic.produce(t, 0, s"k$i", "v"))
      val out = tmp() + "/sink"; val ck = tmp() + "/ck"
      drain(stream(t), out, ck) // commits offset 20
      (20 until 30).foreach(i => MemTopic.produce(t, 0, s"k$i", "v"))
      MemTopic.truncateBefore(t, 0, 25) // records 20..25 are GONE
      val failing = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        drain(stream(t), out, ck)
      }
      assert(failing.getMessage.contains("data loss") ||
        Option(failing.getCause).exists(_.getMessage.contains("data loss")))
      // same checkpoint, failOnDataLoss=false: skip to earliest=25
      drain(stream(t, Map("failOnDataLoss" -> "false")), out, ck)
      val keys = spark.read.parquet(out).select("key")
        .collect().map(_.getString(0)).toSet
      assert((25 until 30).forall(i => keys.contains(s"k$i")))
      assert((20 until 25).forall(i => !keys.contains(s"k$i"))) // lost span stays lost
      assert(keys.size == 25) // 20 original + 5 surviving
    } finally MemTopic.drop(t)
  }
}
