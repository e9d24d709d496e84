package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages. (Driver north star; absent from the reference.)
  *
  * The actual codec step is STUBBED with a deterministic fake (no
  * image/audio libraries ship in this container — see the builder
  * mandate): `fakeDecode` derives pseudo width/height/duration from the
  * payload's md5, so every Spark-side concern — schema, binary
  * encoding, per-partition batched decode, frame-explosion shape,
  * partitioning — is real and tested while the codec itself is
  * swappable. In PySpark this stage is `mapInPandas` over Arrow
  * batches; the Scala-native equivalent used here is `mapPartitions`
  * over a typed Dataset (same batch-per-partition execution shape, no
  * Python worker hop).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, content_key: String,
      width: Int, height: Int, duration_ms: Long)
  final case class Frame(media_id: Long, frame_no: Int, frame_key: String)

  /** Kind assignment by id — ONE definition shared by the typed
    * pipeline and the oracle-checked metadata query (the ExtSpec
    * cross-checks are only meaningful if both agree). */
  private def kindCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (id % 3 + 1).cast("int"))

  /** Synthesize a media table from `documents` (text bytes stand in for
    * codec payloads; kind assigned deterministically). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id".as("media_id"),
        kindCol($"doc_id").as("kind"),
        $"text".cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** STUB codec: deterministic pseudo-decode from the payload digest.
    * A real deployment swaps the body for an actual decoder; the
    * signature, batching, and schema stay. */
  def fakeDecode(rec: MediaRecord): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(rec.payload)
    def u8(i: Int): Int = md(i) & 0xff
    val hex = md.map("%02x".format(_)).mkString
    MediaFeatures(
      media_id = rec.media_id,
      kind = rec.kind,
      n_bytes = rec.payload.length.toLong,
      content_key = hex.substring(0, 8),
      width = 16 * (u8(0) % 64 + 1),
      height = 16 * (u8(1) % 64 + 1),
      duration_ms = if (rec.kind == "image") 0L else 1000L * (u8(2) % 300 + 1))
  }

  /** Decode stage: per-partition batched map (the `mapInPandas` shape). */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(fakeDecode))
  }

  /** Resize stage: recompute target dimensions preserving aspect ratio
    * (the codec-free half of a real resize; the pixel work is part of
    * the stubbed codec). Pure per-row math — stays in the same stage
    * as decode, no shuffle. */
  def resize(feats: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      val scale = maxDim.toDouble / math.max(f.width, f.height)
      if (scale >= 1.0) f
      else f.copy(
        width = math.max(1, math.round(f.width * scale).toInt),
        height = math.max(1, math.round(f.height * scale).toInt))
    }
  }

  /** Frame sampling: explode ~1 frame per 10 s of fake duration (video
    * only) — the row-multiplying stage whose partitioning matters at
    * scale (frames inherit the parent's partition; no shuffle). */
  def sampleFrames(feats: Dataset[MediaFeatures]): Dataset[Frame] = {
    import feats.sparkSession.implicits._
    feats.filter(_.kind == "video").flatMap { f =>
      val n = math.max(1, (f.duration_ms / 10000L).toInt)
      (0 until n).map(i => Frame(f.media_id, i, s"${f.content_key}-$i"))
    }
  }

  // Oracle-checkable slice: binary length + md5 content key + kind
  // assignment — the metadata layer every downstream stage keys on.
  private val meta: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id".as("media_id"),
        kindCol($"doc_id").as("kind"),
        octet_length($"text".cast("binary")).cast("long").as("n_bytes"),
        substring(md5($"text"), 1, 8).as("content_key"))
      .orderBy($"media_id")
  }
  private val metaSql =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  substr(md5(text), 1, 8) AS content_key
      |FROM documents ORDER BY media_id""".stripMargin

  // Frame-sampling under the oracle gate: the whole typed pipeline
  // (mediaTable → mapPartitions decode → flatMap frame explosion) is
  // md5-deterministic, so DuckDB replays it from the hex digest — the
  // stub codec's byte-2 duration arithmetic included. This gates the
  // row-MULTIPLYING stage's output (count per video + key scheme), the
  // part of the multimodal lane whose shape matters at scale.
  private val frames: Q = (s, d) => {
    import s.implicits._
    sampleFrames(decode(mediaTable(s, d))).toDF()
      .select($"media_id", $"frame_no".cast("int").as("frame_no"), $"frame_key")
      .orderBy($"media_id", $"frame_no")
  }
  private val framesSql =
    """WITH m AS (
      |  SELECT doc_id AS media_id, md5(text) AS h, substr(md5(text),1,8) AS ck
      |  FROM documents WHERE doc_id % 3 = 2),
      |v AS (
      |  SELECT media_id, ck,
      |    (strpos('0123456789abcdef', substr(h,5,1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(h,6,1)) - 1) AS b2
      |  FROM m),
      |f AS (
      |  SELECT media_id, ck,
      |    greatest(1, CAST((1000 * (b2 % 300 + 1)) // 10000 AS INT)) AS n
      |  FROM v)
      |SELECT media_id, CAST(i AS INT) AS frame_no,
      |  ck || '-' || CAST(i AS VARCHAR) AS frame_key
      |FROM f, unnest(generate_series(0, n - 1)) t(i)
      |ORDER BY media_id, frame_no""".stripMargin

  // Payload validation under the oracle gate — the ingest-time sniff
  // every media pipeline runs before paying a decode: per kind, byte
  // accounting plus a MAGIC-BYTE check (here: first payload byte,
  // hex-encoded; "printable" stands in for a real per-format magic
  // table, which would be a broadcast lookup in the same plan). All
  // binary-side ops (binary substring, hex, octet length) — the column
  // family the other two gates don't touch. Fixed-width uppercase hex
  // compares lexicographically == numerically, so the printable
  // predicate is engine-exact. One partial-agg shuffle to |kinds| rows.
  private val validate: Q = (s, d) => {
    import s.implicits._
    val m = Tables.documents(s, d).select(
      kindCol($"doc_id").as("kind"),
      octet_length($"text".cast("binary")).cast("long").as("n_bytes"),
      hex(substring($"text".cast("binary"), 1, 1)).as("magic"))
    m.groupBy($"kind")
      .agg(count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        min($"n_bytes").as("min_bytes"),
        max($"n_bytes").as("max_bytes"),
        countDistinct($"magic").as("n_distinct_magic"),
        sum(when($"magic" >= "20" && $"magic" <= "7E", 1L).otherwise(0L))
          .as("n_printable"))
      .orderBy($"kind")
  }
  private val validateSql =
    """WITH m AS (
      |  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |           WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    substr(upper(hex(encode(text))), 1, 2) AS magic
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  MIN(n_bytes) AS min_bytes, MAX(n_bytes) AS max_bytes,
      |  COUNT(DISTINCT magic) AS n_distinct_magic,
      |  CAST(SUM(CASE WHEN magic >= '20' AND magic <= '7E' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_printable
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  val queries: Map[String, Q] = Map(
    "multimodal_meta" -> meta,
    "multimodal_frames" -> frames,
    "multimodal_validate" -> validate)
  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> metaSql,
    "multimodal_frames" -> framesSql,
    "multimodal_validate" -> validateSql)
}
