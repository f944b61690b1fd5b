package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOn(dayCounts: Seq[(String, Int)]) =
    dayCounts.flatMap { case (d, n) => Seq.fill(n)(d) }.toDF("d")
      .select(to_timestamp(col("d")).as("ts"))

  test("meanShiftDailyDF finds a planted level shift exactly") {
    // counts 1,1,1,5,5,5 → D_t = 6·cum − 18t peaks at t=3 (|−36|)
    val df = eventsOn(Seq("2024-01-01" -> 1, "2024-01-02" -> 1,
      "2024-01-03" -> 1, "2024-01-04" -> 5, "2024-01-05" -> 5,
      "2024-01-06" -> 5)).repartition(4)
    val r = Changepoint.meanShiftDailyDF(df, col("ts"))
      .select(col("split_day").cast("string"), col("t"), col("n_days"),
        col("total"), col("cum_left"), col("d"), col("mean_before"),
        col("mean_after"))
      .as[(String, Long, Long, Long, Long, Long, Double, Double)].head()
    assert(r == (("2024-01-03", 3L, 6L, 18L, 3L, -36L, 1.0, 5.0)), r.toString)
  }

  test("ties break to the earliest split; split leaves both segments non-empty") {
    // constant series: every D_t = 0 → earliest t wins, t < n
    val df = eventsOn(Seq("2024-02-01" -> 2, "2024-02-02" -> 2,
      "2024-02-03" -> 2))
    val r = Changepoint.meanShiftDailyDF(df, col("ts"))
      .select(col("t"), col("d")).as[(Long, Long)].head()
    assert(r == ((1L, 0L)))
    // single-day series: no valid split → empty result
    val one = eventsOn(Seq("2024-03-01" -> 4))
    assert(Changepoint.meanShiftDailyDF(one, col("ts")).count() == 0L)
  }

  test("layout-proof: result identical on 1 and 8 partitions") {
    val rnd = new scala.util.Random(11)
    val days = (1 to 28).map(i => (f"2024-04-$i%02d", 1 + rnd.nextInt(9)))
    val a = Changepoint.meanShiftDailyDF(eventsOn(days).repartition(1), col("ts"))
      .collect().toSeq
    val b = Changepoint.meanShiftDailyDF(eventsOn(days).repartition(8), col("ts"))
      .collect().toSeq
    assert(a == b)
  }
}
