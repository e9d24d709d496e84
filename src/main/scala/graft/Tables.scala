package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. At 100 TB these
  * become multi-file partitioned datasets; `spark.read.parquet(dir)`
  * handles both shapes, and all downstream code treats the result as an
  * ordinary distributed DataFrame (no single-file assumptions).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-relation cache: `spark.read.parquet` pays file listing +
  // parquet footer schema inference on EVERY call (~100ms/table on this
  // box — measured as the dominant share of each sub-second query's wall
  // clock, since a query builds 2-5 tables). The test tables are
  // immutable driver-provided inputs, so resolving each (session, dir,
  // table) once and reusing the analyzed relation is exactly what a real
  // engine's catalog metadata cache does; the DataFrame is immutable and
  // every downstream query plans against it unchanged.
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  // Entries for stopped sessions would otherwise pin the session and its
  // analyzed plans for the JVM lifetime (test suites create many
  // sessions). Swept on every cache MISS — misses are one-per-table
  // post-warmup and the sweep is a driver-side O(entries) scan.
  private def sweepStopped(): Unit = {
    relCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    registeredDir.keySet.removeIf(s => s.sparkContext.isStopped)
  }

  // Fingerprint-keyed catalog-stats memos elsewhere (Dedup.dfHistMemo /
  // sourceDimMemo, Relational.saltWidthMemo, TextAnalysis.bpeRulesMemo)
  // register a hook here so invalidate() reaches them too: their values
  // are computed THROUGH relCache's relation, so a dir rewrite must
  // clear both layers together or a fresh fingerprint key could memoize
  // a value computed from the stale cached relation.
  private val invalidateHooks =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  /** Register a callback invoked by [[invalidate]] with the CANONICAL
    * path of the rewritten dir. Memos keyed `canonicalPath#fingerprint`
    * drop every entry under that prefix. */
  def onInvalidate(hook: String => Unit): Unit = invalidateHooks.add(hook)

  /** Drop cached relations (and view registrations, and registered
    * derived-stats memos) for `dir` — the REQUIRED hook for any
    * in-process path that rewrites a source table in place, which
    * would otherwise keep serving the stale file listing. (DevScaleUp
    * runs as its own JVM, so cross-process regeneration is naturally
    * fresh; this contract is for same-process rewrites.) */
  def invalidate(dir: String): Unit = {
    relCache.keySet.removeIf(k => k._2 == dir)
    registeredDir.entrySet.removeIf(e => e.getValue == dir)
    val canon = new java.io.File(dir).getCanonicalPath
    invalidateHooks.forEach(h => h(canon))
  }

  /** Cheap content fingerprint of one table dir — an ORDER-DEPENDENT
    * FNV-1a-style fold over the sorted (relative path, length, mtime)
    * entries: the memo-key ingredient for any driver-side cache derived
    * from table CONTENT (BPE rules, the sourceOverlap dim). The r10
    * XOR fold let two identical (name, length, mtime) leaves cancel to
    * 0 and missed same-second in-place rewrites that preserve lengths;
    * the ordered fold kills the cancellation class (mtime-granularity
    * collisions remain theoretically possible — [[invalidate]] is the
    * belt for same-process rewrites). */
  def tableFingerprint(sfDir: String, table: String): Long = {
    val root = new java.io.File(sfDir, s"$table.parquet")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(files)
      else Seq(f)
    val prefix = root.getPath.length
    files(root).foldLeft(-3750763034362895579L) { (h, f) => // FNV-1a offset
      val p = 1099511628211L // FNV-1a prime
      (((h ^ f.getPath.drop(prefix).hashCode) * p
        ^ f.length()) * p ^ f.lastModified()) * p
    }
  }

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    relCache.computeIfAbsent((spark, sfDir, table), _ => {
      sweepStopped()
      spark.read.parquet(s"$sfDir/$table.parquet")
    })

  /** Pre-fan-out spread (shared by the explode-heavy text/dedup
    * pipelines): stages that multiply their input ~100× (shingles,
    * bigrams, rolling windows) are CPU-bound on hashing and need at
    * least cluster-width parallelism, but a small parquet file arrives
    * as ONE scan partition (single row group), serializing the whole
    * fan-out on one thread. Repartitioning the pre-explode rows costs
    * an input-sized shuffle and buys cluster-wide compute. No-op when
    * the scan is already at least cluster-wide — at 100 TB (thousands
    * of scan partitions) no shuffle is added. */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * and we rebuild a µs-precision NTZ timestamp here (the data has no
    * sub-µs component; matches what DuckDB reads natively). */
  def events(s: SparkSession, d: String): DataFrame =
    eventsTimestamps(load(s, d, "events"))

  /** Rebuild the µs NTZ timestamp from the raw nanos long. Split out so
    * callers can filter the RAW `ts` first — a predicate on the derived
    * column cannot reach the parquet scan, one on the raw long can
    * (see Relational.incrementalFilter). */
  def eventsTimestamps(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` mirrors the DuckDB
    * oracle's naming exactly (`events` gets its rebuilt µs timestamp). */
  // One registration per (session, dir): temp views persist in the
  // session, and re-registering re-lists files + re-reads 10 parquet
  // footers of driver-side work per query — at sf0.1 that was most of
  // each sql_* query's wall clock. Re-registers when the dir changes
  // (specs hop between SFs in one session).
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.put(spark, sfDir) != sfDir)
      names.foreach { n =>
        val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
        df.createOrReplaceTempView(n)
      }
}
