package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** An in-memory partitioned log with KAFKA'S offset semantics, exposed
  * as a full DataSourceV2 micro-batch streaming source — the testable
  * twin of the S1 Kafka lane (`/root/reference/libs/cdc_to_parquet.py:
  * 77-88`: subscribe, startingOffsets, failOnDataLoss,
  * maxOffsetsPerTrigger). No Kafka connector jar ships in this
  * sandbox, so the reference's OFFSET CONTRACT — resume from the
  * committed offset after restart, per-trigger admission control
  * (backpressure), retention-induced data loss detection — was the one
  * genuinely untested behavior. This source implements that contract
  * against Spark's real streaming engine: checkpointed offsets go
  * through `initialOffset`/`deserializeOffset`, rate limiting through
  * `SupportsAdmissionControl.latestOffset(start, limit)`, bounded
  * replay through `SupportsTriggerAvailableNow`, and a retention
  * truncation surfaces exactly Kafka's failOnDataLoss choice: fail the
  * query, or skip to earliest and continue.
  *
  * The log lives in a JVM-local registry — correct under local[N]
  * (driver and executors share the JVM; exactly this repo's test
  * model). A cluster deployment would swap [[MemTopic]]'s array for
  * the broker RPC and change NOTHING in the Spark-facing classes —
  * the offset/planning/reader protocol is the part under test.
  */
object MemTopic {
  final case class Rec(offset: Long, key: String, value: String)

  private final class Part {
    val recs = ArrayBuffer.empty[Rec]
    var logStart = 0L // earliest retained offset (retention trim moves it)
    var logEnd = 0L   // next offset to assign
  }
  private val topics = new ConcurrentHashMap[String, Array[Part]]()

  def create(topic: String, partitions: Int): Unit =
    topics.put(topic, Array.fill(partitions)(new Part))

  def drop(topic: String): Unit = topics.remove(topic)

  private def part(topic: String, p: Int): Part = {
    val t = topics.get(topic)
    require(t != null, s"unknown topic $topic")
    t(p)
  }

  def numPartitions(topic: String): Int = {
    val t = topics.get(topic)
    require(t != null, s"unknown topic $topic")
    t.length
  }

  def produce(topic: String, p: Int, key: String, value: String): Long = {
    val pt = part(topic, p)
    pt.synchronized {
      val off = pt.logEnd
      pt.recs += Rec(off, key, value)
      pt.logEnd = off + 1
      off
    }
  }

  /** Retention: drop every record with offset < `before` (like a Kafka
    * segment deletion). Consumers holding a committed offset below the
    * new logStart hit the data-loss path on their next plan. */
  def truncateBefore(topic: String, p: Int, before: Long): Unit = {
    val pt = part(topic, p)
    pt.synchronized {
      pt.recs.filterInPlace(_.offset >= before)
      if (before > pt.logStart) pt.logStart = math.min(before, pt.logEnd)
    }
  }

  def earliest(topic: String, p: Int): Long = {
    val pt = part(topic, p); pt.synchronized(pt.logStart)
  }
  def latest(topic: String, p: Int): Long = {
    val pt = part(topic, p); pt.synchronized(pt.logEnd)
  }
  def fetch(topic: String, p: Int, from: Long, until: Long): Seq[Rec] = {
    val pt = part(topic, p)
    pt.synchronized(pt.recs.filter(r => r.offset >= from && r.offset < until).toSeq)
  }

  val SCHEMA: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))
}

/** Checkpointable offset: per-partition next-offset-to-read, serialized
  * as canonical JSON (sorted partition keys, no library dependency). */
final case class TopicOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}
object TopicOffset {
  // -? : the codec is total over Long offsets (FunctionsSpec property)
  private val Entry = """"(\d+)":(-?\d+)""".r
  def parse(json: String): TopicOffset = {
    val parsed = TopicOffset(Entry.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
    // STRICT: a scraped-but-partial parse of a corrupted checkpoint
    // would silently default missing partitions to offset 0 downstream
    // and re-deliver their whole history. Our own json() is canonical,
    // and the engine only ever hands back what json() produced — so
    // anything that fails the exact round-trip is corruption and must
    // fail the query, like Kafka's source does.
    require(parsed.json() == json.filterNot(_.isWhitespace),
      s"corrupt topic offset JSON: '$json'")
    parsed
  }
}

/** `spark.readStream.format(classOf[MemTopicProvider].getName)`.
  * Options: `topic` (required), `startingOffsets` earliest|latest
  * (default earliest), `maxOffsetsPerTrigger` (rows per micro-batch),
  * `failOnDataLoss` true|false (default true). */
class MemTopicProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemTopic.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new MemTopicTable(properties.get("topic"))
}

class MemTopicTable(topic: String) extends Table with SupportsRead {
  require(topic != null, "option 'topic' is required")
  override def name(): String = s"memtopic:$topic"
  override def schema(): StructType = MemTopic.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MemTopic.SCHEMA
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MemTopicStream(topic, options)
      }
    }
}

class MemTopicStream(topic: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val failOnDataLoss =
    options.getBoolean("failOnDataLoss", true)
  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)
  private val startingOffsets =
    options.getOrDefault("startingOffsets", "earliest").toLowerCase

  // AvailableNow bound: snapshot of `latest` taken once at query start;
  // the run drains to exactly this point and terminates
  @volatile private var availableNowBound: Option[TopicOffset] = None

  private def partitions: Range = 0 until MemTopic.numPartitions(topic)
  private def snapshotLatest: TopicOffset =
    TopicOffset(partitions.map(p => p -> MemTopic.latest(topic, p)).toMap)
  private def snapshotEarliest: TopicOffset =
    TopicOffset(partitions.map(p => p -> MemTopic.earliest(topic, p)).toMap)

  override def initialOffset(): Offset = startingOffsets match {
    case "latest" => snapshotLatest
    case "earliest" => snapshotEarliest
    case other => throw new IllegalArgumentException(
      s"startingOffsets must be earliest|latest, got $other")
  }

  override def deserializeOffset(json: String): Offset = TopicOffset.parse(json)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(snapshotLatest)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  // admission control is in charge; the engine never calls the plain
  // variant once SupportsAdmissionControl is implemented (Kafka's
  // connector does the same)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[TopicOffset].offsets
    val avail = availableNowBound.getOrElse(snapshotLatest).offsets
    limit match {
      case mr: ReadMaxRows =>
        // FAIR admission (Kafka-style apportioning): distribute the
        // budget over partitions with backlog in equal shares, then
        // redistribute any leftover — a greedy partition-order fill
        // would starve the higher partitions forever when partition 0
        // alone produces more than maxRows per trigger
        val backlog = partitions.map { p =>
          val lo = from.getOrElse(p, 0L)
          p -> math.max(avail.getOrElse(p, lo) - lo, 0L)
        }.toMap
        val take = scala.collection.mutable.Map(
          partitions.map(p => p -> 0L): _*)
        var budget = mr.maxRows()
        var hungry = partitions.filter(p => backlog(p) > 0)
        while (budget > 0 && hungry.nonEmpty) {
          val share = math.max(budget / hungry.size, 1L)
          hungry.foreach { p =>
            if (budget > 0) {
              val t = math.min(share, math.min(backlog(p) - take(p), budget))
              take(p) += t; budget -= t
            }
          }
          hungry = hungry.filter(p => take(p) < backlog(p))
        }
        TopicOffset(partitions.map { p =>
          p -> (from.getOrElse(p, 0L) + take(p))
        }.toMap)
      case _ => TopicOffset(avail)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[TopicOffset].offsets
    val until = end.asInstanceOf[TopicOffset].offsets
    partitions.map { p =>
      val lo = from.getOrElse(p, 0L)
      val hi = until.getOrElse(p, lo)
      val earliest = MemTopic.earliest(topic, p)
      // Kafka's failOnDataLoss contract: a committed offset below the
      // retained log start means records are gone. Fail loudly by
      // default; with failOnDataLoss=false skip to earliest.
      val safeLo =
        if (lo >= earliest) lo
        else if (failOnDataLoss) throw new IllegalStateException(
          s"data loss: topic $topic partition $p committed offset $lo " +
            s"< earliest retained $earliest (set failOnDataLoss=false to skip)")
        else math.min(earliest, hi)
      TopicInputPartition(topic, p, safeLo, hi): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class TopicInputPartition(topic: String, p: Int,
    from: Long, until: Long) extends InputPartition

class TopicReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val tp = partition.asInstanceOf[TopicInputPartition]
    // local-mode JVM sharing makes the registry directly readable; a
    // cluster implementation fetches from the broker here
    val recs = MemTopic.fetch(tp.topic, tp.p, tp.from, tp.until).iterator
    new PartitionReader[InternalRow] {
      private var cur: MemTopic.Rec = _
      override def next(): Boolean = { val h = recs.hasNext; if (h) cur = recs.next(); h }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        tp.p, cur.offset, UTF8String.fromString(cur.key),
        UTF8String.fromString(cur.value)))
      override def close(): Unit = ()
    }
  }
}
