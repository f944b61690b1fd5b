package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("forwardFillGrid builds the hourly grid and carries the latest value") {
    val df = Seq(
      ("a", "2024-01-01 10:15:00", 1.0),
      ("a", "2024-01-01 12:40:00", 2.0),
      ("b", "2024-01-01 11:05:00", 9.0)
    ).toDF("k", "ts_s", "v").withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val got = Resample.forwardFillGrid(df, "k", "ts", "v")
      .select($"k", date_format($"grid_ts", "HH:mm").as("h"), $"last_value")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.get(2))))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      // a: grid 10:00-12:00; 10:00 precedes the first event → null
      ("a", "10:00", None), ("a", "11:00", Some(1.0)), ("a", "12:00", Some(1.0)),
      // b: single-instant span → one grid row, before its event → null
      ("b", "11:00", None)))
  }
}
