package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions.{col, concat, lit, upper}

/** Copy-on-write UPDATE (`updateWhere`): stats-pruned hit-file rewrite,
  * SQL NULL-condition semantics, declared-type casts, row-level change
  * capture (preimage/postimage), and reads THROUGH existing deletion
  * vectors — the third leg of the DML triangle next to deleteWhere and
  * deleteWhereMoR. */
class SnapshotUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-update-spec").resolve("tbl").toString

  private def content(root: String): Set[(Int, String)] =
    SnapshotTable.read(spark, root).as[(Int, String)].collect().toSet

  test("update rewrites ONLY files with matches; pruned files keep their " +
      "bytes; non-matching rows in hit files pass through unchanged") {
    val root = freshRoot()
    // two files: keys 1-50 and 51-100, stats on k
    (0 until 2).foreach { j =>
      SnapshotTable.write((1 to 100).filter(i => (i > 50) == (j == 1))
        .map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), root,
        mode = if (j == 0) "overwrite" else "append", statsCols = Seq("k"))
    }
    val before = SnapshotTable.readManifest(root, 2).files
    val (v3, rewritten, skipped) = SnapshotTable.updateWhere(spark, root,
      col("k").between(10, 12), Map("v" -> upper(col("v"))),
      pruneHint = Some(("k", 10.0, 12.0)))
    assert(v3 == 3 && rewritten == 1 && skipped == 1)
    val m3 = SnapshotTable.readManifest(root, 3)
    // the 51-100 file survives verbatim; the 1-50 file is replaced
    assert(m3.files.toSet.intersect(before.toSet) == Set(before(1)))
    assert(content(root) == (1 to 100).map { i =>
      (i, if (i >= 10 && i <= 12) s"V$i" else s"v$i")
    }.toSet)
    // fresh stats ride the rewritten file: a pruned read still skips
    val (pruned, (keptFiles, totalFiles)) =
      SnapshotTable.readPruned(spark, root, "k", 60, 70)
    assert(keptFiles == 1 && totalFiles == 2 &&
      pruned.where(col("k").between(60, 70)).count() == 11)
  }

  test("no-match update commits NOTHING; assignments to unknown columns " +
      "are rejected; values cast to the column's declared type") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    val (v, rw, _) = SnapshotTable.updateWhere(spark, root,
      col("k") === 99, Map("v" -> lit("x")))
    assert(v == 1 && rw == 0, "a no-match update must not commit")
    intercept[IllegalArgumentException] {
      SnapshotTable.updateWhere(spark, root, col("k") === 1,
        Map("nope" -> lit(1)))
    }
    // int column assigned a double expression: cast lands as the
    // declared IntegerType, not a schema change
    SnapshotTable.updateWhere(spark, root, col("k") === 2,
      Map("k" -> (col("k") * lit(10.5))))
    val m = SnapshotTable.readManifest(root, SnapshotTable.latestVersion(root))
    assert(m.schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(content(root) == Set((1, "a"), (21, "b")))
  }

  test("NULL condition rows pass through (SQL semantics), and assignment " +
      "expressions may read any table column") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, "a"), (2, null), (3, "c")).toDF("k", "v"), root)
    // condition references v: NULL v → condition NULL → row NOT updated
    SnapshotTable.updateWhere(spark, root, col("v") =!= "c",
      Map("v" -> concat(col("v"), lit("!"), col("k"))))
    assert(content(root) == Set((1, "a!1"), (2, null), (3, "c")))
  }

  test("captured update replays preimage/postimage exactly; uncaptured " +
      "falls back to the honest file-diff feed") {
    val root = freshRoot()
    SnapshotTable.write((1 to 500).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    SnapshotTable.updateWhere(spark, root, col("k") === 7,
      Map("v" -> lit("SEVEN")), changeCapture = true)
    val feed = SnapshotTable.readChanges(spark, root, 1)
      .select(col("k"), col("v"), col("_change_type"), col("_change_version"))
      .as[(Int, String, String, Int)].collect().toSeq.sorted
    assert(feed == Seq((7, "SEVEN", "update_postimage", 2),
      (7, "v7", "update_preimage", 2)))
    // same update uncaptured: the file-diff feed reports the whole rewrite
    val root2 = freshRoot()
    SnapshotTable.write((1 to 500).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root2)
    SnapshotTable.updateWhere(spark, root2, col("k") === 7,
      Map("v" -> lit("SEVEN")))
    assert(SnapshotTable.readChanges(spark, root2, 1).count() == 1000L)
  }

  test("update reads THROUGH deletion vectors: dv-deleted rows neither " +
      "update nor resurrect, and the rewritten file's vector dies") {
    val root = freshRoot()
    SnapshotTable.write((1 to 40).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root)
    SnapshotTable.deleteWhereMoR(spark, root, col("k") <= 10) // v2
    val (v3, rewritten, _) = SnapshotTable.updateWhere(spark, root,
      col("k") <= 20, Map("v" -> upper(col("v"))))
    assert(v3 == 3 && rewritten == 1)
    assert(SnapshotTable.readManifest(root, 3).dvs.isEmpty,
      "rewritten file must shed its deletion vector")
    assert(content(root) == (11 to 40).map { i =>
      (i, if (i <= 20) s"V$i" else s"v$i")
    }.toSet)
    // a file whose only matches are dv-deleted keeps its bytes
    val root2 = freshRoot()
    SnapshotTable.write((1 to 30).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), root2)
    SnapshotTable.deleteWhereMoR(spark, root2, col("k") <= 5)
    val (v, rw, sk) = SnapshotTable.updateWhere(spark, root2,
      col("k") <= 5, Map("v" -> lit("x")))
    assert(v == 2 && rw == 0 && sk == 1,
      "dv-dead matches must not trigger a rewrite")
  }
}
