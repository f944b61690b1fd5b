package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortSpec extends SparkSpec {
  import spark.implicits._

  test("taggedUnion standardizes, tags and unions by name") {
    val study = Seq(("s1", 2.0), ("s2", 4.0)).toDF("id", "suv")
    val control = Seq(("c1", 1.0)).toDF("pid", "suv_ctrl")
    val out = Cohort.taggedUnion(
      study, Seq(col("id") -> "patient", col("suv") -> "suv"),
      control, Seq(col("pid") -> "patient", col("suv_ctrl") -> "suv"))
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet
    assert(rows == Set(("s1", 2.0, 1), ("s2", 4.0, 1), ("c1", 1.0, 0)))
  }

  test("crossCohortAgg equals literal cross-join + duplication-invariant aggs") {
    val left = Seq(1.0, 2.0, 3.0).toDF("x")
    val right = Seq(10.0, 20.0).toDF("y")
    val rewrite = Cohort.crossCohortAgg(
      left, Seq((AggSpec.median, "x", "mx"), (AggSpec.max, "x", "maxx")),
      right, Seq((AggSpec.min, "y", "miny")))
    // the reference's literal plan (dataSummaries1.scala:480): crossJoin then agg
    val literal = left.crossJoin(right)
      .agg(percentile($"x", lit(0.5)).cast("double").as("mx"),
        max($"x").cast("double").as("maxx"), min($"y").cast("double").as("miny"))
    assert(rewrite.collect().toSeq == literal.collect().toSeq)
  }

  test("crossCohortAgg refuses duplication-variant aggregates") {
    val d = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException] {
      Cohort.crossCohortAgg(d, Seq((AggSpec.sum, "x", "s")), d,
        Seq((AggSpec.min, "x", "m")))
    }
  }

  test("unionAll tags frames with source name") {
    val a = Seq(1).toDF("v"); val b = Seq(2).toDF("v")
    val out = Cohort.unionAll(Seq(a, b), Some("src"), Seq("A", "B"))
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "A"), (2, "B")))
  }
}
