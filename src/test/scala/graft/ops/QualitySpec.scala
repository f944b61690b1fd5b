package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(5.0), Some(1.0)),
    (Some(150.0), Some(2.0)),   // out of [0,100]
    (None, Some(3.0)),          // null
    (Some(50.0), Some(1000.0)), // extreme → z-score outlier for b
    (Some(60.0), Some(2.5)),
    (Some(70.0), Some(1.5))
  ).toDF("a", "b")

  test("range + null + zscore checks fuse into one report") {
    val rep = Quality.report(df, Seq(
      Quality.RangeCheck(Seq("a"), 0, 100),
      Quality.NotNullCheck(Seq("a", "b")),
      Quality.ZScoreCheck(Seq("b"), z = 2.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep(("outside range", "a")) == 1)
    assert(rep(("null values", "a")) == 1)
    assert(rep(("null values", "b")) == 0)
    assert(rep(("z-score outliers", "b")) == 1)
  }

  test("violationsOnly filters zero rows like the reference") {
    val rep = Quality.report(df,
      Seq(Quality.NotNullCheck(Seq("a", "b"))), violationsOnly = true)
    assert(rep.collect().map(_.getString(1)).toSeq == Seq("a"))
  }

  test("zscore matches manual computation") {
    val vals = Seq(1.0, 2.0, 3.0, 1000.0)
    val d2 = vals.toDF("x")
    val m = vals.sum / vals.size
    val sd = math.sqrt(vals.map(v => (v - m) * (v - m)).sum / vals.size)
    val manual = vals.count(v => math.abs((v - m) / sd) > 1.0)
    val rep = Quality.report(d2, Seq(Quality.ZScoreCheck(Seq("x"), z = 1.0)))
      .collect().head.getLong(2)
    assert(rep == manual)
  }
}
