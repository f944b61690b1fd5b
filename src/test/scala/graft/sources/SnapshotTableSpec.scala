package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-snapshot-spec").resolve("tbl").toString

  test("overwrite chains versions; time travel reads pinned snapshots") {
    val root = freshRoot()
    val v1 = SnapshotTable.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    val v2 = SnapshotTable.write(Seq((3, "c")).toDF("k", "v"), root)
    assert(v1 == 1 && v2 == 2)
    assert(SnapshotTable.read(spark, root).as[(Int, String)].collect().toSet
      == Set((3, "c")))
    // snapshot isolation: v1 is still fully readable after the overwrite
    assert(SnapshotTable.read(spark, root, Some(1)).as[(Int, String)]
      .collect().toSet == Set((1, "a"), (2, "b")))
  }

  test("append accumulates rows across versions and shares data files") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, "a")).toDF("k", "v"), root)
    SnapshotTable.write(Seq((2, "b")).toDF("k", "v"), root, mode = "append")
    SnapshotTable.write(Seq((3, "c")).toDF("k", "v"), root, mode = "append")
    assert(SnapshotTable.read(spark, root).as[(Int, String)].collect().toSet
      == Set((1, "a"), (2, "b"), (3, "c")))
    // the v2 manifest's files are a strict subset of v3's (shared, not copied)
    val m2 = SnapshotTable.readManifest(root, 2)
    val m3 = SnapshotTable.readManifest(root, 3)
    assert(m2.files.toSet.subsetOf(m3.files.toSet))
  }

  test("a losing committer re-bases and commits the next version") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, "a")).toDF("k", "v"), root)
    // simulate a concurrent winner: pre-create v2 by hand
    val winner = Seq((9, "z")).toDF("k", "v")
    SnapshotTable.write(winner, root, mode = "append") // commits v2
    // now an appender that started from v1 must land at v3 with v2's rows kept
    val v = SnapshotTable.write(Seq((2, "b")).toDF("k", "v"), root, mode = "append")
    assert(v == 3)
    assert(SnapshotTable.read(spark, root).as[(Int, String)].collect().toSet
      == Set((1, "a"), (9, "z"), (2, "b")))
  }

  test("manifest schema pins the read schema (evolution-safe)") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, "a")).toDF("k", "v"), root)
    SnapshotTable.write(Seq((1L, "a", true)).toDF("k", "v", "flag"), root)
    assert(SnapshotTable.read(spark, root, Some(1)).columns.toSeq == Seq("k", "v"))
    assert(SnapshotTable.read(spark, root).columns.toSeq == Seq("k", "v", "flag"))
  }

  test("vacuum drops old versions but keeps files shared with live ones") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, "a")).toDF("k", "v"), root)             // v1
    SnapshotTable.write(Seq((2, "b")).toDF("k", "v"), root, "append")   // v2
    SnapshotTable.write(Seq((3, "c")).toDF("k", "v"), root)             // v3 overwrite
    SnapshotTable.vacuum(root, keepVersions = 1)
    // v3 still reads; v1/v2 manifests gone; v1's data file (unshared) deleted
    assert(SnapshotTable.read(spark, root).as[(Int, String)].collect().toSet
      == Set((3, "c")))
    assert(SnapshotTable.latestVersion(root) == 3)
    intercept[Exception](SnapshotTable.readManifest(root, 1))
    val dataFiles = Files.list(Paths.get(root, "data")).count()
    assert(dataFiles == SnapshotTable.readManifest(root, 3).files.size)
  }
}
