package graft

import graft.scd2.VersionedTable
import java.nio.file.Files

/** Nessie-style branch semantics over the manifest table (SURVEY D8):
  * the reference's create-branch → run-job → validate → merge-to-main
  * flow (`scd2_spark_processor.py:101-103`), with the Nessie contract
  * that only fast-forward merges succeed.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = new VersionedTable(spark, Files.createTempDirectory("branch").toString)

  test("branch, commit, validate, fast-forward to main (D8 flow)") {
    val t = tbl()
    t.overwrite(Seq((1, "a")).toDF("id", "v"))               // v0
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"))     // v1
    t.createBranch("exp")
    t.commitToBranch("exp",
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))     // v2, exp only
    // trunk pinned at the branch point; branch sees its commit
    assert(t.read().count() == 2)
    assert(t.readBranch("exp").count() == 3)
    assert(t.branches.toMap == Map("main" -> 1, "exp" -> 2))
    // validated → merge advances main to the branch head
    t.fastForward("main", "exp")
    assert(t.read().count() == 3)
    // trunk keeps working after the merge
    t.overwrite(Seq((9, "z")).toDF("id", "v"))
    assert(t.read().collect().map(_.getInt(0)).toSeq == Seq(9))
    t.deleteBranch("exp")
    assert(t.branches.map(_._1) == Seq("main"))
    // commit log: newest first, parents reflect the branch topology
    val h = t.history()
    assert(h.map(_._1) == Seq(3, 2, 1, 0))
    assert(h.find(_._1 == 2).get._2.contains(1)) // exp commit's parent
    assert(h.find(_._1 == 3).get._2.contains(2)) // trunk commit after FF
  }

  test("diverged branches are not fast-forwardable (rebase required)") {
    val t = tbl()
    t.overwrite(Seq((1, "a")).toDF("id", "v"))               // v0
    t.createBranch("exp")
    t.commitToBranch("exp", Seq((2, "b")).toDF("id", "v"))   // v1 on exp
    t.overwrite(Seq((3, "c")).toDF("id", "v"))               // v2 on main
    val e = intercept[IllegalArgumentException] { t.fastForward("main", "exp") }
    assert(e.getMessage.contains("not fast-forwardable"))
    // the other direction is not FF either (main moved past the fork)
    intercept[IllegalArgumentException] { t.fastForward("exp", "main") }
  }

  test("vacuum never reclaims a branch head") {
    val t = tbl()
    t.overwrite(Seq((1, "a")).toDF("id", "v"))               // v0
    t.overwrite(Seq((2, "b")).toDF("id", "v"))               // v1
    t.createBranch("keepme", at = Some(0))
    t.overwrite(Seq((3, "c")).toDF("id", "v"))               // v2
    t.overwrite(Seq((4, "d")).toDF("id", "v"))               // v3
    val expired = t.vacuum(keepVersions = 1)
    assert(!expired.contains(0), "pinned branch head must survive vacuum")
    assert(t.readBranch("keepme").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(t.read().collect().map(_.getInt(0)).toSeq == Seq(4))
    intercept[Exception] { t.readVersion(1).count() } // unpinned horizon gone
  }

  test("lost main ref fails safe: trunk never resolves to a branch commit") {
    val root = Files.createTempDirectory("refloss").toString
    val t = new VersionedTable(spark, root)
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"))     // v0
    t.createBranch("exp")                                    // main → 0
    t.overwrite(Seq((3, "c"), (4, "d"), (5, "e")).toDF("id", "v")) // v1; bak-main = 0
    t.commitToBranch("exp", (1 to 9).toDF("id").withColumn("v", $"id".cast("string"))) // v2, branch ahead of main
    val refs = new java.io.File(root, "_refs")
    // simulate a crash inside setRef's delete→rename window: the main
    // ref file is gone, but the backup written BEFORE the window survives
    assert(new java.io.File(refs, "main").delete())
    assert(t.refHead("main").contains(0), "backup must resolve the pre-advance head")
    assert(t.read().count() == 2, "trunk must read main's last durable head, not v2")
    // recovery writes go through setRef and re-materialize the ref file
    t.overwrite(Seq((6, "f")).toDF("id", "v"))               // v3
    assert(new java.io.File(refs, "main").exists())
    assert(t.read().collect().map(_.getInt(0)).toSeq == Seq(6))
    // total ref loss (ref AND backup) with a branch present: reads
    // throw rather than silently serving the branch's v2
    assert(new java.io.File(refs, "main").delete())
    assert(new java.io.File(refs, ".bak-main").delete())
    val e = intercept[IllegalStateException] { t.read() }
    assert(e.getMessage.contains("main ref lost"))
  }
}
