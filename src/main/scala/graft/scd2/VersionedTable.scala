package graft.scd2

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Zero-dependency versioned parquet table: snapshot-per-version dirs
  * with an atomically-renamed commit marker. Stands in for the
  * reference's Iceberg-on-Nessie table (`scd2_spark_processor.py:135-159`)
  * since no Delta/Iceberg runtime ships in this environment; the API is
  * deliberately the lakehouse-shaped subset we need:
  *
  *  - `overwrite` = commit a new snapshot (what Delta MERGE produces)
  *  - `append`    = commit previous snapshot ∪ new rows
  *  - `read(asOfVersion)` = time travel (README.MD:308-313 / D7)
  *
  * Layout: `<root>/v=00042/part-*.parquet` + `<root>/_versions/00042`
  * marker (empty file, atomic create). Readers resolve the max marker,
  * so a crashed half-written snapshot (no marker yet) is invisible —
  * single-writer commit semantics like the reference's single batch job.
  *
  * Scale: snapshots are written `partitionBy(partitionCols)` (the
  * reference's `days(effective_start_ts)` hidden partitioning becomes an
  * explicit date column, SURVEY D2); a 100 TB deployment swaps this
  * class for Delta/Iceberg — callers only use the 4 methods above.
  */
final class VersionedTable(spark: SparkSession, root: String,
                           partitionCols: Seq[String] = Nil) {
  private val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def markerDir = new Path(root, "_versions")
  private def dataDir(v: Int) = new Path(root, f"v=$v%05d")

  def latestVersion: Option[Int] = {
    if (!fs.exists(markerDir)) None
    else {
      val vs = fs.listStatus(markerDir).map(_.getPath.getName.toInt)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def exists: Boolean = latestVersion.isDefined

  def read(): DataFrame = readVersion(
    latestVersion.getOrElse(throw new IllegalStateException(s"empty table at $root")))

  /** Time travel: read the table as of a committed version. */
  def readVersion(v: Int): DataFrame =
    spark.read.parquet(dataDir(v).toString)

  /** Commit `df` as the next full snapshot; returns the new version.
    * `clusterBy` sorts within partitions before writing so parquet
    * row-group min/max stats become tight — the zone-map data-skipping
    * that makes point/range predicates on the cluster keys prune whole
    * row groups at scan time (Delta OPTIMIZE ZORDER's cheap cousin).
    * `meta` is stored INSIDE the commit marker (atomically with the
    * commit), so writers can key idempotence on it — see
    * [[latestMeta]] and the streaming SCD2 lane. */
  def overwrite(df: DataFrame, clusterBy: Seq[String] = Nil,
                meta: Option[String] = None): Int = {
    val v = latestVersion.getOrElse(-1) + 1
    val out =
      if (clusterBy.nonEmpty)
        df.sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
      else df
    val writer = out.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dataDir(v).toString)
    fs.mkdirs(markerDir)
    val marker = fs.create(new Path(markerDir, f"$v%05d"), true)
    meta.foreach(m => marker.write(m.getBytes("UTF-8")))
    marker.close()
    v
  }

  /** The `meta` stored with the newest commit (empty if none). */
  def latestMeta: Option[String] = latestVersion.flatMap { v =>
    val p = new Path(markerDir, f"$v%05d")
    val in = fs.open(p)
    try {
      val bytes = in.readAllBytes()
      if (bytes.isEmpty) None else Some(new String(bytes, "UTF-8"))
    } finally in.close()
  }

  /** Compaction (Delta OPTIMIZE / Iceberg rewrite_data_files analog):
    * rewrite the current snapshot into ~`targetFileCount` files —
    * the maintenance job that fixes streaming's small-file problem.
    * Optionally clusters while compacting. Returns the new version. */
  def compact(targetFileCount: Int, clusterBy: Seq[String] = Nil): Int =
    overwrite(read().coalesce(math.max(1, targetFileCount)), clusterBy)

  /** Append rows as a new snapshot (reference `writeTo(...).append()`).
    * Note each snapshot is a full rewrite (the zero-dep trade-off; a
    * Delta/Iceberg swap makes this O(new rows)) — only the LOGICAL
    * history is preserved across versions.
    *
    * `mergeSchema = true` opts into evolution: columns present on only
    * one side are allowed and null-filled (Delta's per-write
    * `mergeSchema` analog). Off by default so a typo'd or renamed
    * column fails loudly instead of silently null-filling. */
  def append(df: DataFrame, mergeSchema: Boolean = false): Int =
    overwrite(
      if (exists) read().unionByName(df, allowMissingColumns = mergeSchema)
      else df)

  /** Expire old snapshots (Iceberg `expire_snapshots` / Delta VACUUM
    * analog, SURVEY D10): keep the newest `keepVersions`, delete the
    * rest's data and markers. Time travel past the horizon then fails
    * by design. */
  def vacuum(keepVersions: Int): Seq[Int] = {
    require(keepVersions >= 1, "must keep at least the current version")
    latestVersion match {
      case None => Nil
      case Some(latest) =>
        val all = fs.listStatus(markerDir).map(_.getPath.getName.toInt).sorted
        val expire = all.filter(_ <= latest - keepVersions)
        expire.foreach { v =>
          fs.delete(dataDir(v), true)
          fs.delete(new Path(markerDir, f"$v%05d"), false)
        }
        expire.toSeq
    }
  }
}
