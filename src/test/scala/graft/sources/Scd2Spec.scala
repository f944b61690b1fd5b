package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** SCD Type-2 history folded from the row-level change feed: arrivals
  * open intervals, replacements/deletes close them, re-inserts reopen. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-scd2-spec").resolve("tbl").toString

  test("merge/delete/re-insert fold into the right intervals") {
    val root = freshRoot()
    SnapshotTable.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)  // v1
    SnapshotTable.merge(Seq((2, "B"), (3, "c")).toDF("k", "v"), root,
      keyCols = Seq("k"), changeCapture = true)                        // v2
    SnapshotTable.deleteWhere(spark, root, col("k") === 1,
      changeCapture = true)                                            // v3
    SnapshotTable.merge(Seq((1, "a2")).toDF("k", "v"), root,
      keyCols = Seq("k"), changeCapture = true)                        // v4
    val hist = Scd2.buildFrom(SnapshotTable.read(spark, root, Some(1)), 1,
      SnapshotTable.readChanges(spark, root, 1), Seq("k"))
      .as[(Int, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(hist == Seq(
      (1, "a", 1L, Some(3L), false),   // closed by the delete
      (1, "a2", 4L, None, true),       // re-insert reopens
      (2, "b", 1L, Some(2L), false),   // replaced by the merge
      (2, "B", 2L, None, true),
      (3, "c", 2L, None, true)))
    // every key has at most one current row; intervals don't overlap
    val byKey = hist.groupBy(_._1)
    byKey.values.foreach { rows =>
      assert(rows.count(_._5) <= 1)
      rows.sortBy(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(a._4.exists(_ <= b._3)) // closed, no overlap
        case _ =>
      }
    }
  }

  test("layout independence: the fold only depends on feed content") {
    val root = freshRoot()
    SnapshotTable.write((1 to 50).map(i => (i, s"v$i")).toDF("k", "v"), root)
    SnapshotTable.merge((10 to 30).map(i => (i, s"w$i")).toDF("k", "v"), root,
      keyCols = Seq("k"), changeCapture = true)
    val base = SnapshotTable.read(spark, root, Some(1))
    val f = SnapshotTable.readChanges(spark, root, 1)
    val a = Scd2.buildFrom(base, 1, f.repartition(7), Seq("k")).collect().toSeq
    val b = Scd2.buildFrom(base, 1, f.repartition(1), Seq("k")).collect().toSeq
    assert(a == b && a.size == 50 + 21)
  }
}
