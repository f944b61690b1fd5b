package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col

/** Merge-on-read DELETE via deletion vectors: position sidecars instead of
  * file rewrites, transparent application in every reader, vector
  * materialization through compact, exact row-level change-feed events
  * from the vector diff, and sidecar lifecycle under vacuum. */
class SnapshotDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-dv-spec").resolve("tbl").toString

  private def content(root: String, v: Option[Int] = None): Set[(Int, String)] =
    SnapshotTable.read(spark, root, v).as[(Int, String)].collect().toSet

  test("MoR delete rewrites NO data file, readers apply the vector, " +
      "time travel still sees the rows") {
    val root = freshRoot()
    SnapshotTable.write((1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    val filesBefore = SnapshotTable.readManifest(root, 1).files
    val (v2, touched, deleted) = SnapshotTable.deleteWhereMoR(spark, root,
      col("k").between(10, 19))
    assert(v2 == 2 && touched == 1 && deleted == 10L)
    val m2 = SnapshotTable.readManifest(root, 2)
    assert(m2.files == filesBefore, "merge-on-read must not rewrite data files")
    assert(m2.dvs.keySet == filesBefore.toSet)
    assert(content(root) == (1 to 100).filterNot(i => i >= 10 && i <= 19)
      .map(i => (i, s"v$i")).toSet)
    // the vector belongs to v2: the pinned v1 snapshot still has every row
    assert(content(root, Some(1)).size == 100)
  }

  test("vectors accumulate across deletes; re-deleting the same rows is a " +
      "no-op; pruned reads stay exact") {
    val root = freshRoot()
    SnapshotTable.write((1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root, statsCols = Seq("k"))
    SnapshotTable.deleteWhereMoR(spark, root, col("k") <= 5)
    val (v3, _, d3) = SnapshotTable.deleteWhereMoR(spark, root,
      col("k").between(50, 54))
    assert(v3 == 3 && d3 == 5L)
    // same condition again: every match is already deleted → no commit
    val (v4, t4, d4) = SnapshotTable.deleteWhereMoR(spark, root,
      col("k").between(50, 54))
    assert(v4 == 3 && t4 == 0 && d4 == 0L)
    assert(content(root).size == 90)
    val (pruned, _) = SnapshotTable.readPruned(spark, root, "k", 1, 60)
    assert(pruned.where(col("k") <= 60).as[(Int, String)].collect().toSet
      == (6 to 49).map(i => (i, s"v$i")).toSet
        ++ (55 to 60).map(i => (i, s"v$i")))
  }

  test("compact MATERIALIZES vectors: packed files carry live rows only, " +
      "entries drop, the commit stays silent in the feed") {
    val root = freshRoot()
    (0 until 4).foreach { j =>
      SnapshotTable.write((1 to 100).filter(_ % 4 == j)
        .map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), root,
        mode = if (j == 0) "overwrite" else "append")
    }
    SnapshotTable.deleteWhereMoR(spark, root, col("k") % 10 === 0) // v5
    val before = content(root)
    assert(before.size == 90)
    val vC = SnapshotTable.compact(spark, root, targetBytes = 1L << 20) // v6
    val mC = SnapshotTable.readManifest(root, vC)
    assert(mC.op == "compact" && mC.dvs.isEmpty, s"vectors must materialize")
    assert(mC.files.size < 4)
    assert(content(root) == before)
    // the feed: inserts at v2..v4, MoR deletes at v5, NOTHING for compact
    val feed = SnapshotTable.readChanges(spark, root, 1)
      .select(col("k"), col("_change_type"), col("_change_version"))
      .as[(Int, String, Int)].collect()
    assert(feed.count(_._3 == vC) == 0, "compact must stay feed-silent")
    assert(feed.filter(_._2 == "delete").map(_._1).toSet
      == (1 to 100).filter(_ % 10 == 0).toSet)
    assert(feed.filter(e => e._2 == "delete").forall(_._3 == 5))
  }

  test("copy-on-write delete and merge read THROUGH existing vectors") {
    val root = freshRoot()
    SnapshotTable.write((1 to 50).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    SnapshotTable.deleteWhereMoR(spark, root, col("k") <= 10)       // v2: MoR
    // CoW delete on the same file: kept rows = live ∧ ¬cond, entry drops
    val (v3, rewritten, _) = SnapshotTable.deleteWhere(spark, root,
      col("k").between(20, 25))
    assert(v3 > 2 && rewritten == 1)
    assert(SnapshotTable.readManifest(root, v3).dvs.isEmpty)
    assert(content(root) == (11 to 50).filterNot(i => i >= 20 && i <= 25)
      .map(i => (i, s"v$i")).toSet)
    // merge over a vectored table: matched keys replace LIVE rows only
    val root2 = freshRoot()
    SnapshotTable.write((1 to 20).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root2)
    SnapshotTable.deleteWhereMoR(spark, root2, col("k") <= 5)
    SnapshotTable.merge(Seq((3, "BACK"), (10, "UP")).toDF("k", "v"),
      root2, Seq("k"))
    assert(SnapshotTable.readManifest(root2,
      SnapshotTable.latestVersion(root2)).dvs.isEmpty)
    assert(content(root2) == ((6 to 20).filterNot(_ == 10)
      .map(i => (i, s"v$i")).toSet + ((3, "BACK")) + ((10, "UP"))))
  }

  test("vector diff feed is exact when deletes accumulate on one file") {
    val root = freshRoot()
    SnapshotTable.write((1 to 30).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    SnapshotTable.deleteWhereMoR(spark, root, col("k") <= 3)            // v2
    SnapshotTable.deleteWhereMoR(spark, root, col("k").between(10, 12)) // v3
    val feed = SnapshotTable.readChanges(spark, root, 1)
      .select(col("k"), col("_change_type"), col("_change_version"))
      .as[(Int, String, Int)].collect().toSet
    // each commit reports ONLY its own newly-deleted rows — the v3 vector
    // carries v2's positions too (replacement semantics), the diff nets it
    assert(feed == Set((1, "delete", 2), (2, "delete", 2), (3, "delete", 2),
      (10, "delete", 3), (11, "delete", 3), (12, "delete", 3)))
  }

  test("vacuum keeps sidecars of surviving manifests, sweeps dropped and " +
      "orphaned ones") {
    val root = freshRoot()
    SnapshotTable.write((1 to 20).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)                                            // v1
    SnapshotTable.deleteWhereMoR(spark, root, col("k") <= 2)         // v2
    SnapshotTable.deleteWhereMoR(spark, root, col("k") === 10)       // v3
    val dDir = Paths.get(root, "_deletes")
    val orphan = dDir.resolve("deadbeef-part-0.parquet")
    Files.write(orphan, Array[Byte](1))
    Thread.sleep(5)
    SnapshotTable.vacuum(root, keepVersions = 2, orphanRetentionMs = 0L)
    assert(!Files.exists(orphan))
    // v3's pointer (and v2's — still referenced by the surviving v2
    // manifest) remain readable
    assert(content(root) == (3 to 20).filterNot(_ == 10)
      .map(i => (i, s"v$i")).toSet)
    assert(content(root, Some(2)) == (3 to 20).map(i => (i, s"v$i")).toSet)
    // drop to head only: v2's manifest goes; the head's sidecar survives
    SnapshotTable.vacuum(root, keepVersions = 1, orphanRetentionMs = 0L)
    assert(content(root) == (3 to 20).filterNot(_ == 10)
      .map(i => (i, s"v$i")).toSet)
  }
}
