package graft

import graft.scd2.VersionedTable
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Metadata-layer scalability (VERDICT r2 #6): per-micro-batch commits
  * grow the commit log into the thousands, and head resolution, reads,
  * and vacuum must stay fast — O(listing + retained manifests), never
  * O(all manifest contents). Manifests are plain text files, so the log
  * is FABRICATED by copying a real committed manifest 2k times — the
  * metadata layer is exercised at scale without 2k Spark write jobs.
  */
class ManifestScaleSpec extends SparkSpec {
  import spark.implicits._

  test("optimistic concurrency: rename onto an existing manifest fails") {
    // commit() assumes the FS contract that rename does NOT clobber an
    // existing destination — that's what makes the last writer of a
    // racing pair fail loudly instead of silently replacing the
    // winner's manifest. Pin the assumption on the running FS.
    val root = Files.createTempDirectory("race").toString
    val t = new VersionedTable(spark, root)
    t.overwrite(Seq((1, "a")).toDF("id", "v")) // commits _versions/00000
    val hpath = new org.apache.hadoop.fs.Path(root)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root, "_versions/.tmp-racer")
    val out = fs.create(tmp, true)
    try out.write("loser".getBytes) finally out.close()
    val target = new org.apache.hadoop.fs.Path(root, "_versions/00000")
    assert(!fs.rename(tmp, target),
      "rename clobbered a committed manifest — optimistic concurrency is broken")
    // the winner's manifest is intact
    assert(t.read().as[(Int, String)].collect().toSeq == Seq((1, "a")))
  }

  test("2k-version commit log: resolve/read/vacuum stay sub-second-ish") {
    val root = Files.createTempDirectory("mscale").toString
    val t = new VersionedTable(spark, root)
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"))             // v0
    t.overwrite(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))   // v1
    val src = Paths.get(root, "_versions", "00001")
    (2 until 2000).foreach { v =>
      Files.copy(src, Paths.get(root, "_versions", f"$v%05d"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def timed[A](what: String, bound: Double)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      assert(s < bound, s"$what took $s s (bound $bound)")
      r
    }
    // head resolution lists the dir but reads NO manifest bodies.
    // Bounds are regression fences against O(versions²) blowups, not
    // precise SLOs: a 2× margin over the observed ~0.3–0.5 s clean
    // timing absorbs host-contention noise (a shared box measured this
    // FS listing at 1.09 s under neighbor load) while still failing
    // loudly on any complexity regression.
    assert(timed("latestVersion", 2.0)(t.latestVersion).contains(1999))
    assert(timed("latestMeta", 2.0)(t.latestMeta).isEmpty)
    assert(timed("read", 5.0)(t.read().count()) == 3)
    // vacuum reads only the RETAINED manifests (5), deletes the rest
    val expired = timed("vacuum", 5.0)(t.vacuum(keepVersions = 5))
    assert(expired.size == 1995)
    assert(t.read().count() == 3)
    // v0's data files were referenced only by expired manifests → gone
    intercept[Exception] { t.readVersion(0).count() }
    // post-vacuum the log is bounded again
    assert(timed("latestVersion after vacuum", 0.5)(t.latestVersion).contains(1999))
  }
}
