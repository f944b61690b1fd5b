package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions.{col, lit, upper}

/** Merge-on-read UPDATE: old positions enter deletion vectors, postimage
  * rows append as new files — no data file rewritten. Covers read-through
  * of prior vectors, both change-feed granularities, stats on appended
  * postimages, compact materialization, and the no-match no-op. */
class SnapshotMorUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-morupd-spec").resolve("tbl").toString

  private def content(root: String, v: Option[Int] = None): Set[(Int, String)] =
    SnapshotTable.read(spark, root, v).as[(Int, String)].collect().toSet

  test("MoR update rewrites NO data file: vectors mask old rows, appended " +
      "files carry postimages, time travel sees the originals") {
    val root = freshRoot()
    SnapshotTable.write((1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    val before = SnapshotTable.readManifest(root, 1).files
    val (v2, touched, updated) = SnapshotTable.updateWhereMoR(spark, root,
      col("k").between(10, 19), Map("v" -> upper(col("v"))))
    assert(v2 == 2 && touched == 1 && updated == 10L)
    val m2 = SnapshotTable.readManifest(root, 2)
    assert(before.forall(m2.files.contains),
      "merge-on-read update must keep every original file")
    assert(m2.files.size > before.size, "postimages must append as new files")
    assert(m2.dvs.keySet == before.toSet)
    assert(content(root) == (1 to 100).map { i =>
      (i, if (i >= 10 && i <= 19) s"V$i" else s"v$i")
    }.toSet)
    assert(content(root, Some(1)) == (1 to 100).map(i => (i, s"v$i")).toSet)
  }

  test("update reads through prior vectors (deleted rows never resurrect " +
      "as postimages); no-match commits nothing") {
    val root = freshRoot()
    SnapshotTable.write((1 to 50).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    SnapshotTable.deleteWhereMoR(spark, root, col("k") <= 10)        // v2
    val (v3, _, updated) = SnapshotTable.updateWhereMoR(spark, root,
      col("k") <= 20, Map("v" -> upper(col("v"))))
    assert(v3 == 3 && updated == 10L,
      "only the 10 LIVE matches (11..20) may update")
    assert(content(root) == (11 to 50).map { i =>
      (i, if (i <= 20) s"V$i" else s"v$i")
    }.toSet)
    // all matches dv-dead → no-op, version unchanged
    val (v4, t4, u4) = SnapshotTable.updateWhereMoR(spark, root,
      col("k") <= 10, Map("v" -> lit("x")))
    assert(v4 == 3 && t4 == 0 && u4 == 0L)
  }

  test("uncaptured feed: exact row-level delete (vector diff) + insert " +
      "(appended postimages); captured feed: update pre/post pairs") {
    val root = freshRoot()
    SnapshotTable.write((1 to 30).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    SnapshotTable.updateWhereMoR(spark, root, col("k") === 7,
      Map("v" -> lit("SEVEN")))                                      // v2
    val feed = SnapshotTable.readChanges(spark, root, 1)
      .select(col("k"), col("v"), col("_change_type"), col("_change_version"))
      .as[(Int, String, String, Int)].collect().toSet
    assert(feed == Set((7, "v7", "delete", 2), (7, "SEVEN", "insert", 2)),
      s"uncaptured MoR update must net to 2 exact events, got $feed")
    val root2 = freshRoot()
    SnapshotTable.write((1 to 30).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root2)
    SnapshotTable.updateWhereMoR(spark, root2, col("k") === 7,
      Map("v" -> lit("SEVEN")), changeCapture = true)
    val feed2 = SnapshotTable.readChanges(spark, root2, 1)
      .select(col("k"), col("v"), col("_change_type"), col("_change_version"))
      .as[(Int, String, String, Int)].collect().toSet
    assert(feed2 == Set((7, "v7", "update_preimage", 2),
      (7, "SEVEN", "update_postimage", 2)))
  }

  test("appended postimages carry fresh stats (pruned reads stay exact); " +
      "compact materializes the vectors and packs everything") {
    val root = freshRoot()
    SnapshotTable.write((1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root, statsCols = Seq("k"))
    SnapshotTable.updateWhereMoR(spark, root, col("k").between(90, 95),
      Map("v" -> upper(col("v"))))                                   // v2
    val m2 = SnapshotTable.readManifest(root, 2)
    val appended = m2.files.filterNot(
      SnapshotTable.readManifest(root, 1).files.toSet)
    assert(appended.nonEmpty &&
      appended.forall(f => m2.stats.get(f).exists(_.contains("k"))),
      "appended postimage files must carry footer stats")
    val (pruned, (kept, total)) =
      SnapshotTable.readPruned(spark, root, "k", 90, 95)
    assert(total == 2 &&
      pruned.where(col("k").between(90, 95)).as[(Int, String)]
        .collect().toSet == (90 to 95).map(i => (i, s"V$i")).toSet)
    val expect = content(root)
    val vC = SnapshotTable.compact(spark, root, targetBytes = 1L << 20)
    val mC = SnapshotTable.readManifest(root, vC)
    assert(mC.dvs.isEmpty && content(root) == expect)
  }

  test("sequential MoR updates on one file accumulate vectors; the feed " +
      "attributes each version's own rows exactly") {
    val root = freshRoot()
    SnapshotTable.write((1 to 20).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    SnapshotTable.updateWhereMoR(spark, root, col("k") === 3,
      Map("v" -> lit("three")))                                      // v2
    SnapshotTable.updateWhereMoR(spark, root, col("k") === 3,
      Map("v" -> upper(col("v"))))                                   // v3: THREE
    assert(content(root) == ((1 to 20).filterNot(_ == 3)
      .map(i => (i, s"v$i")).toSet + ((3, "THREE"))))
    val feed = SnapshotTable.readChanges(spark, root, 1)
      .select(col("k"), col("v"), col("_change_type"), col("_change_version"))
      .as[(Int, String, String, Int)].collect().toSet
    assert(feed == Set(
      (3, "v3", "delete", 2), (3, "three", "insert", 2),
      (3, "three", "delete", 3), (3, "THREE", "insert", 3)))
  }
}
