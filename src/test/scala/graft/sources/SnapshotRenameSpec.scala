package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Column-mapping rename: one metadata commit, zero rewrites, every path
  * (read, time travel, append, merge, stats pruning, fastStats, CDC,
  * restore, clone, compact) keeps working across the rename. */
class SnapshotRenameSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-rename-spec").resolve("tbl").toString

  test("rename is metadata-only: same data files, new logical name") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, 10.0), (2, 20.0)).toDF("k", "price"), root,
      statsCols = Seq("price"))
    val before = SnapshotTable.readManifest(root, 1)
    val v2 = SnapshotTable.renameColumn(root, "price", "amount")
    assert(v2 == 2)
    val after = SnapshotTable.readManifest(root, 2)
    assert(after.files == before.files)            // zero rewrites
    assert(after.schema.fieldNames.toSeq == Seq("k", "amount"))
    assert(after.colmap == Map("amount" -> "price"))
    val got = SnapshotTable.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "amount"))
    assert(got.as[(Int, Double)].collect().toSet == Set((1, 10.0), (2, 20.0)))
    // time travel reads v1 under its own (pre-rename) schema
    assert(SnapshotTable.read(spark, root, Some(1)).columns.toSeq
      == Seq("k", "price"))
  }

  test("appends after a rename stage physical names; old and new files scan together") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, 10.0)).toDF("k", "price"), root,
      statsCols = Seq("price"))
    SnapshotTable.renameColumn(root, "price", "amount")
    SnapshotTable.write(Seq((2, 20.0)).toDF("k", "amount"), root,
      mode = "append", statsCols = Seq("amount"))
    val got = SnapshotTable.read(spark, root).as[(Int, Double)].collect().toSet
    assert(got == Set((1, 10.0), (2, 20.0)))
    // the appended file carries the PHYSICAL name on disk: a raw scan of
    // the new file must expose column "price", not "amount"
    val m = SnapshotTable.readManifest(root, 3)
    val newFile = (m.files.toSet --
      SnapshotTable.readManifest(root, 1).files.toSet).head
    val raw = spark.read.parquet(s"$root/data/$newFile")
    assert(raw.columns.toSeq == Seq("k", "price"))
    // stats envelopes keyed physical → pruning by the LOGICAL name works
    // across both pre- and post-rename files
    val (pruned, (kept, total)) =
      SnapshotTable.readPruned(spark, root, "amount", 15.0, 25.0)
    assert(total == 2 && kept == 1)
    assert(pruned.as[(Int, Double)].collect().toSet == Set((2, 20.0)))
    // metadata-only aggregates see through the mapping too
    val Some((n, agg)) = SnapshotTable.fastStats(root, Seq("amount"))
    assert(n == 2L && agg("amount") == ((10.0, 20.0)))
  }

  test("merge, CDC capture, and the change feed work across a rename") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, 10.0), (2, 20.0)).toDF("k", "amount"), root)
    SnapshotTable.renameColumn(root, "amount", "price")
    SnapshotTable.merge(Seq((2, 25.0), (3, 30.0)).toDF("k", "price"), root,
      keyCols = Seq("k"), changeCapture = true)
    assert(SnapshotTable.read(spark, root).as[(Int, Double)].collect().toSet
      == Set((1, 10.0), (2, 25.0), (3, 30.0)))
    // captured row-level changes replay under the LOGICAL schema
    val ch = SnapshotTable.readChanges(spark, root, 2, Some(3))
      .select(col("k"), col("price"), col("_change_type"))
      .as[(Int, Double, String)].collect().toSet
    assert(ch == Set((2, 20.0, "update_preimage"), (2, 25.0, "update_postimage"),
      (3, 30.0, "insert")))
    // file-diff feed across the rename boundary renders each version
    // under its own schema: v1→v2 is metadata-only (no events)
    val all = SnapshotTable.readChanges(spark, root, 1, Some(2))
    assert(all.where(col("_change_type").isNotNull).count() == 0)
  }

  test("restore and clone carry the column mapping") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, 1.5)).toDF("k", "x"), root)
    SnapshotTable.renameColumn(root, "x", "y")
    SnapshotTable.write(Seq((2, 2.5)).toDF("k", "y"), root, mode = "append")
    val cloneRoot = freshRoot()
    SnapshotTable.clone(root, cloneRoot)
    assert(SnapshotTable.read(spark, cloneRoot).columns.toSeq == Seq("k", "y"))
    assert(SnapshotTable.read(spark, cloneRoot).as[(Int, Double)]
      .collect().toSet == Set((1, 1.5), (2, 2.5)))
    // restore to the pre-rename v1: logical name reverts WITH its data
    SnapshotTable.restore(root, 1)
    val r = SnapshotTable.read(spark, root)
    assert(r.columns.toSeq == Seq("k", "x"))
    assert(r.as[(Int, Double)].collect().toSet == Set((1, 1.5)))
    // and restoring forward again (to the renamed v3) brings the map back
    SnapshotTable.restore(root, 3)
    assert(SnapshotTable.read(spark, root).columns.toSeq == Seq("k", "y"))
  }

  test("compact preserves the mapping (rewritten files keep physical names)") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, 1.0)).toDF("k", "v"), root)
    SnapshotTable.renameColumn(root, "v", "w")
    (2 to 5).foreach(i => SnapshotTable.write(
      Seq((i, i.toDouble)).toDF("k", "w"), root, mode = "append"))
    SnapshotTable.compact(spark, root, targetBytes = Long.MaxValue)
    val m = SnapshotTable.readManifest(root, SnapshotTable.latestVersion(root))
    assert(m.colmap == Map("w" -> "v"))
    assert(SnapshotTable.read(spark, root).as[(Int, Double)].collect().toSet
      == (1 to 5).map(i => (i, i.toDouble)).toSet)
    val raw = spark.read.parquet(m.files.map(f => s"$root/data/$f"): _*)
    assert(raw.columns.toSeq == Seq("k", "v"))
  }

  test("rename guards: existing names, borrowed physical names, CHECK refs") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, 1.0, "a")).toDF("k", "v", "s"), root)
    SnapshotTable.renameColumn(root, "v", "w")
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(root, "w", "k"))       // name taken
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(root, "s", "v"))       // physical of w
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(root, "missing", "z")) // no such column
    // a fresh column may not take a borrowed physical name either
    intercept[IllegalArgumentException](
      SnapshotTable.write(Seq((1, 1.0, "a", 9L)).toDF("k", "w", "s", "v"),
        root, mode = "append", mergeSchema = true))
    // CHECK constraints pin their columns
    SnapshotTable.addCheckConstraint(spark, root, "pos", "w >= 0")
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(root, "w", "value"))
    SnapshotTable.dropCheckConstraint(root, "pos")
    SnapshotTable.renameColumn(root, "w", "value")
    assert(SnapshotTable.read(spark, root).columns.contains("value"))
    // renaming back to the physical name clears the mapping entry
    SnapshotTable.renameColumn(root, "value", "v")
    assert(SnapshotTable.readManifest(root,
      SnapshotTable.latestVersion(root)).colmap.isEmpty)
  }

  test("generated columns: omitted → materialized, wrong values refused") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1L, 12.0, 1L), (2L, 25.0, 2L))
      .toDF("k", "v", "v_bucket"), root)
    SnapshotTable.addGeneratedColumn(spark, root, "v_bucket",
      "CAST(v AS BIGINT) DIV 10")
    // append WITHOUT the column: materialized from the expression
    SnapshotTable.write(Seq((3L, 37.0)).toDF("k", "v"), root, mode = "append")
    val got = SnapshotTable.read(spark, root)
      .as[(Long, Double, Long)].collect().toSet
    assert(got == Set((1L, 12.0, 1L), (2L, 25.0, 2L), (3L, 37.0, 3L)))
    // append WITH a wrong value: refused
    intercept[IllegalArgumentException](SnapshotTable.write(
      Seq((4L, 50.0, 99L)).toDF("k", "v", "v_bucket"), root, mode = "append"))
    // merge materializes too
    SnapshotTable.merge(Seq((2L, 99.0)).toDF("k", "v"), root, Seq("k"))
    assert(SnapshotTable.read(spark, root).where($"k" === 2L)
      .as[(Long, Double, Long)].head() == ((2L, 99.0, 9L)))
    // registration with a violated base is refused
    intercept[IllegalArgumentException](SnapshotTable.addGeneratedColumn(
      spark, root, "k", "CAST(v AS BIGINT)"))
    // renames of pinned columns are refused until dropped
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(root, "v", "value"))
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(root, "v_bucket", "b"))
    SnapshotTable.dropGeneratedColumn(root, "v_bucket")
    SnapshotTable.renameColumn(root, "v", "value")
    assert(SnapshotTable.read(spark, root).columns.contains("value"))
  }

  test("overwrite resets the mapping; old versions keep theirs") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, 1.0)).toDF("k", "v"), root)
    SnapshotTable.renameColumn(root, "v", "w")
    SnapshotTable.write(Seq((9, 9.0)).toDF("a", "b"), root)
    val head = SnapshotTable.readManifest(root, 3)
    assert(head.colmap.isEmpty)
    assert(SnapshotTable.read(spark, root).columns.toSeq == Seq("a", "b"))
    // the renamed v2 still time-travels under its mapping
    assert(SnapshotTable.read(spark, root, Some(2)).columns.toSeq
      == Seq("k", "w"))
  }
}
