package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GROUPS-frame emulation vs a hand-computed reference implementation of
  * the SQL:2016 semantics on a tie-heavy fixture (the w6 query carries the
  * cross-engine hash check against DuckDB's native EXCLUDE machinery). */
class GroupsFramesSpec extends SparkSpec {
  import spark.implicits._

  // one partition, values with peer groups: [1,1], [3], [4,4,4], [9]
  private val rows = Seq(
    (1L, 1, 10L), (2L, 1, 20L), (3L, 3, 30L),
    (4L, 4, 40L), (5L, 4, 50L), (6L, 4, 60L), (7L, 9, 70L))
  private lazy val df = rows.toDF("id", "v", "x")
    .withColumn("part", lit("p"))

  /** Reference: GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING per row, with
    * each EXCLUDE mode, computed naively on the driver. */
  private def reference: Map[Long, (Long, Option[Long], Option[Long], Option[Long], Long)] = {
    val sorted = rows.sortBy(_._2)
    val groups = sorted.map(_._2).distinct.zipWithIndex.toMap
    rows.map { case (id, v, x) =>
      val g = groups(v)
      val frame = sorted.filter(r => math.abs(groups(r._2) - g) <= 1)
      val sumAll = frame.map(_._3).sum
      val peerSum = frame.filter(_._2 == v).map(_._3).sum
      val xgrp = frame.filterNot(_._2 == v) match {
        case Nil => None; case f => Some(f.map(_._3).sum) }
      val xrow = frame.filterNot(_._1 == id) match {
        case Nil => None; case f => Some(f.map(_._3).sum) }
      val xties = Some(sumAll - peerSum + x)
      id -> (sumAll, xgrp, xrow, xties, frame.size.toLong)
    }.toMap
  }

  test("groupsBetween + EXCLUDE helpers match the SQL:2016 reference") {
    import GroupsFrames._
    val part = Seq(col("part"))
    val base = withGroupOrdinal(df, "grp", part, Seq(col("v")))
    val frame = groupsBetween(part, col("grp"), -1, 1)
    val peers = groupsBetween(part, col("grp"), 0, 0)
    val got = base.select(col("id"),
        sum(col("x")).over(frame).as("s"),
        excludeGroup(sum, col("x"), frame, peers).as("xg"),
        excludeCurrentRow(sum, col("x"), frame).as("xr"),
        excludeTies(sum, col("x"), frame, peers).as("xt"),
        count(lit(1)).over(frame).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))).toMap
    assert(got == reference, s"\ngot  $got\nwant $reference")
  }

  test("excludeGroupMin/Max compose exactly from the disjoint adjacent frames") {
    import GroupsFrames._
    val part = Seq(col("part"))
    val base = withGroupOrdinal(df, "grp", part, Seq(col("v")))
    val got = base.select(col("id"),
        excludeGroupMin(col("x"), part, col("grp"), -1, 1).as("mn"),
        excludeGroupMax(col("x"), part, col("grp"), -1, 1).as("mx"))
      .collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val sorted = rows.sortBy(_._2)
    val groups = sorted.map(_._2).distinct.zipWithIndex.toMap
    val want = rows.map { case (id, v, _) =>
      val g = groups(v)
      val others = sorted.filter(r =>
        math.abs(groups(r._2) - g) <= 1 && r._2 != v).map(_._3)
      id -> (others.minOption, others.maxOption)
    }.toMap
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("EXCLUDE GROUP / CURRENT ROW yield NULL when the frame empties") {
    import GroupsFrames._
    val part = Seq(col("part"))
    // single peer group: the whole frame IS the group
    val one = Seq((1L, 5, 10L), (2L, 5, 20L)).toDF("id", "v", "x")
      .withColumn("part", lit("p"))
    val base = withGroupOrdinal(one, "grp", part, Seq(col("v")))
    val frame = groupsBetween(part, col("grp"), -1, 1)
    val peers = groupsBetween(part, col("grp"), 0, 0)
    val r = base.select(
        excludeGroup(sum, col("x"), frame, peers).as("xg"),
        excludeCurrentRow(sum, col("x"), frame).as("xr"),
        excludeTies(sum, col("x"), frame, peers).as("xt"))
      .collect()
    assert(r.forall(_.isNullAt(0)), "EXCLUDE GROUP over a lone group must be NULL")
    // two rows in the frame: excluding current row leaves the other
    assert(r.map(x => x.getLong(1)).toSet == Set(10L, 20L))
    assert(r.map(x => x.getLong(2)).toSet == Set(10L, 20L)) // ties leave, self stays
  }
}
