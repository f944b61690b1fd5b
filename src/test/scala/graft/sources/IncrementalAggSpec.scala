package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def roots(): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory("ia-spec").toString
    (d + "/base", d + "/sum")
  }

  private def summaryRows(root: String): Set[(String, Long, String)] =
    SnapshotTable.read(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString))
      .toSet

  test("applyChanges folds a captured merge+delete: incremental == batch, " +
      "emptied groups physically deleted") {
    val (root, sroot) = roots()
    val base = Seq((1L, "a", 10.50), (2L, "a", 5.25), (3L, "b", 7.00),
      (4L, "c", 1.75)).toDF("id", "grp", "amt")
    SnapshotTable.write(base.coalesce(1), root)                         // v1
    SnapshotTable.write(
      IncrementalAgg.summarize(SnapshotTable.read(spark, root),
        Seq("grp"), Seq("amt" -> "total")).coalesce(1), sroot)
    // update id=2 (a: 5.25 → 8.00) and insert id=5 into b, then drop all
    // of group c — both captured row-level
    SnapshotTable.merge(Seq((2L, "a", 8.00), (5L, "b", 2.00))
      .toDF("id", "grp", "amt"), root, Seq("id"), changeCapture = true) // v2
    SnapshotTable.deleteWhere(spark, root, col("grp") === "c",
      changeCapture = true)                                             // v3
    IncrementalAgg.applyChanges(spark, root, sroot, fromVersion = 1,
      Seq("grp"), Seq("amt" -> "total"))
    val inc = summaryRows(sroot)
    val batch = IncrementalAgg.summarize(SnapshotTable.read(spark, root),
      Seq("grp"), Seq("amt" -> "total")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString))
      .toSet
    assert(inc == batch, s"incremental $inc != batch $batch")
    assert(inc == Set(("a", 2L, "18.50"), ("b", 2L, "9.00")))
    assert(!inc.exists(_._1 == "c"), "emptied group must leave the row set")
  }

  test("applyChanges folds a pure insert into an existing group") {
    val (root, sroot) = roots()
    val base = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd",
      i.toDouble)).toDF("id", "grp", "amt")
    SnapshotTable.write(base.coalesce(1), root)                         // v1
    SnapshotTable.write(
      IncrementalAgg.summarize(SnapshotTable.read(spark, root),
        Seq("grp"), Seq("amt" -> "total")).coalesce(1), sroot)
    SnapshotTable.merge(Seq((41L, "odd", 1.00)).toDF("id", "grp", "amt"),
      root, Seq("id"), changeCapture = true)                            // v2
    IncrementalAgg.applyChanges(spark, root, sroot, fromVersion = 1,
      Seq("grp"), Seq("amt" -> "total"))
    val inc = summaryRows(sroot)
    assert(inc == Set(("even", 20L, "420.00"), ("odd", 21L, "401.00")))
  }

  test("applyChanges folds merge-on-read delete events (vector-diff feed, " +
      "no explicit capture)") {
    val (root, sroot) = roots()
    val base = Seq((1L, "a", 3.00), (2L, "a", 4.00), (3L, "b", 5.00))
      .toDF("id", "grp", "amt")
    SnapshotTable.write(base.coalesce(1), root)                         // v1
    SnapshotTable.write(
      IncrementalAgg.summarize(SnapshotTable.read(spark, root),
        Seq("grp"), Seq("amt" -> "total")).coalesce(1), sroot)
    // MoR delete: no cdc files — readChanges derives exact row-level
    // delete events from the deletion-vector diff
    SnapshotTable.deleteWhereMoR(spark, root, col("id") === 2L)         // v2
    IncrementalAgg.applyChanges(spark, root, sroot, fromVersion = 1,
      Seq("grp"), Seq("amt" -> "total"))
    assert(summaryRows(sroot) == Set(("a", 1L, "3.00"), ("b", 1L, "5.00")))
  }

  private def mmRows(root: String): Set[(String, Long, String, Double, Double)] =
    SnapshotTable.read(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString,
        r.getDouble(3), r.getDouble(4)))
      .toSet

  test("applyChangesWithMinMax: retracted extremum rescans its group, " +
      "arrivals fold monotonically") {
    val (root, sroot) = roots()
    val mm = Seq(("amt", "amt_min", "amt_max"))
    val base = Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "a", 7.0),
      (4L, "b", 2.0), (5L, "b", 9.0)).toDF("id", "grp", "amt")
    SnapshotTable.write(base.coalesce(1), root)                         // v1
    SnapshotTable.write(IncrementalAgg.summarizeWithMinMax(
      SnapshotTable.read(spark, root), Seq("grp"), Seq("amt" -> "total"), mm)
      .coalesce(1), sroot)
    // group a: DELETE its max (10.0 → rescan must find 7.0) and its min
    // (5.0 → rescan must find... both retracted, survivor is 7.0);
    // group b: INSERT 11.0 (monotone fold, no rescan — max moves up
    // without touching the base)
    SnapshotTable.deleteWhere(spark, root,
      col("id") === 1L || col("id") === 2L, changeCapture = true)       // v2
    SnapshotTable.merge(Seq((6L, "b", 11.0)).toDF("id", "grp", "amt"),
      root, Seq("id"), changeCapture = true)                            // v3
    IncrementalAgg.applyChangesWithMinMax(spark, root, sroot,
      fromVersion = 1, Seq("grp"), Seq("amt" -> "total"), mm)
    val inc = mmRows(sroot)
    assert(inc == Set(("a", 1L, "7.00", 7.0, 7.0),
      ("b", 3L, "22.00", 2.0, 11.0)), s"got $inc")
    val batch = IncrementalAgg.summarizeWithMinMax(
      SnapshotTable.read(spark, root), Seq("grp"), Seq("amt" -> "total"), mm)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDouble(3), r.getDouble(4))).toSet
    assert(inc == batch)
  }

  test("applyChangesWithMinMax: a non-extremal retraction needs no rescan " +
      "and an emptied group leaves the row set") {
    val (root, sroot) = roots()
    val mm = Seq(("amt", "amt_min", "amt_max"))
    val base = Seq((1L, "a", 1.0), (2L, "a", 5.0), (3L, "a", 9.0),
      (4L, "c", 3.0)).toDF("id", "grp", "amt")
    SnapshotTable.write(base.coalesce(1), root)                         // v1
    SnapshotTable.write(IncrementalAgg.summarizeWithMinMax(
      SnapshotTable.read(spark, root), Seq("grp"), Seq("amt" -> "total"), mm)
      .coalesce(1), sroot)
    // delete a's MIDDLE value (5.0: strictly inside [1,9] — extrema hold)
    // and ALL of c (group empties)
    SnapshotTable.deleteWhere(spark, root,
      col("id") === 2L || col("grp") === "c", changeCapture = true)     // v2
    IncrementalAgg.applyChangesWithMinMax(spark, root, sroot,
      fromVersion = 1, Seq("grp"), Seq("amt" -> "total"), mm)
    assert(mmRows(sroot) == Set(("a", 2L, "10.00", 1.0, 9.0)))
  }

  private def dRows(root: String): Set[(String, Long, String, Long)] =
    SnapshotTable.read(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString,
        r.getLong(3)))
      .toSet

  test("applyChangesWithDistinct: value fully leaves a group, value " +
      "survives via another row, new value arrives — incremental == batch") {
    val (root, sroot) = roots()
    val droot = sroot + "_detail"
    // group a: cust 100 twice (one delete leaves it PRESENT), cust 200
    // once (its delete REMOVES it); group b: cust 300
    val base = Seq((1L, "a", 100L, 2.00), (2L, "a", 100L, 3.00),
      (3L, "a", 200L, 4.00), (4L, "b", 300L, 5.00))
      .toDF("id", "grp", "cust", "amt")
    SnapshotTable.write(base.coalesce(1), root)                          // v1
    SnapshotTable.write(IncrementalAgg.summarizeWithDistinct(
      SnapshotTable.read(spark, root), Seq("grp"), Seq("amt" -> "total"),
      ("cust", "custs")).coalesce(1), sroot)
    IncrementalAgg.seedDistinctDetail(spark, root, droot, Seq("grp"), "cust")
    // delete one of cust 100's rows AND cust 200's only row; insert a
    // NEW cust 400 into b
    SnapshotTable.deleteWhere(spark, root,
      col("id") === 2L || col("id") === 3L, changeCapture = true)        // v2
    SnapshotTable.merge(Seq((5L, "b", 400L, 1.00))
      .toDF("id", "grp", "cust", "amt"), root, Seq("id"),
      changeCapture = true)                                              // v3
    IncrementalAgg.applyChangesWithDistinct(spark, root, sroot, droot,
      fromVersion = 1, Seq("grp"), Seq("amt" -> "total"), ("cust", "custs"))
    val inc = dRows(sroot)
    assert(inc == Set(("a", 1L, "2.00", 1L), ("b", 2L, "6.00", 2L)),
      s"got $inc")
    val batch = IncrementalAgg.summarizeWithDistinct(
      SnapshotTable.read(spark, root), Seq("grp"), Seq("amt" -> "total"),
      ("cust", "custs")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString,
        r.getLong(3))).toSet
    assert(inc == batch)
    // detail rows: only live (group, value) pairs survive
    assert(SnapshotTable.read(spark, droot).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      == Set(("a", 100L, 1L), ("b", 300L, 1L), ("b", 400L, 1L)))
  }

  test("applyChangesWithDistinct: NULL values never count, an emptied " +
      "group leaves the row set, untouched groups keep their counts") {
    val (root, sroot) = roots()
    val droot = sroot + "_detail"
    val base = Seq((1L, "a", Some(7L), 1.00), (2L, "a", None, 2.00),
      (3L, "c", Some(9L), 3.00), (4L, "q", Some(5L), 4.00))
      .toDF("id", "grp", "cust", "amt")
    SnapshotTable.write(base.coalesce(1), root)                          // v1
    SnapshotTable.write(IncrementalAgg.summarizeWithDistinct(
      SnapshotTable.read(spark, root), Seq("grp"), Seq("amt" -> "total"),
      ("cust", "custs")).coalesce(1), sroot)
    IncrementalAgg.seedDistinctDetail(spark, root, droot, Seq("grp"), "cust")
    // a NULL-valued insert into a (count moves, distinct must not) and a
    // full delete of group c; group q is untouched by the window
    SnapshotTable.merge(Seq((5L, "a", Option.empty[Long], 1.50))
      .toDF("id", "grp", "cust", "amt"), root, Seq("id"),
      changeCapture = true)                                              // v2
    SnapshotTable.deleteWhere(spark, root, col("grp") === "c",
      changeCapture = true)                                              // v3
    IncrementalAgg.applyChangesWithDistinct(spark, root, sroot, droot,
      fromVersion = 1, Seq("grp"), Seq("amt" -> "total"), ("cust", "custs"))
    val inc = dRows(sroot)
    assert(inc == Set(("a", 3L, "4.50", 1L), ("q", 1L, "4.00", 1L)),
      s"got $inc")
    assert(inc == IncrementalAgg.summarizeWithDistinct(
      SnapshotTable.read(spark, root), Seq("grp"), Seq("amt" -> "total"),
      ("cust", "custs")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString,
        r.getLong(3))).toSet)
  }

  test("applyChanges with an empty change window is a no-op commit-wise") {
    val (root, sroot) = roots()
    SnapshotTable.write(Seq((1L, "a", 2.00)).toDF("id", "grp", "amt")
      .coalesce(1), root)
    SnapshotTable.write(
      IncrementalAgg.summarize(SnapshotTable.read(spark, root),
        Seq("grp"), Seq("amt" -> "total")).coalesce(1), sroot)
    val before = SnapshotTable.latestVersion(sroot)
    val v = IncrementalAgg.applyChanges(spark, root, sroot,
      fromVersion = SnapshotTable.latestVersion(root),
      Seq("grp"), Seq("amt" -> "total"))
    assert(v == before && SnapshotTable.latestVersion(sroot) == before)
    assert(summaryRows(sroot) == Set(("a", 1L, "2.00")))
  }
}
