package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequentialSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(dailyRates: Seq[(String, Int, Int)]) =
    // (day, successes, failures) → one row per trial
    dailyRates.flatMap { case (d, s, f) =>
      Seq.fill(s)((d + " 12:00:00", true)) ++ Seq.fill(f)((d + " 12:00:00", false))
    }.toDF("tss", "ok").select(to_timestamp(col("tss")).as("ts"), col("ok"))

  test("SPRT: high-rate data crosses the upper bound and latches") {
    // p0 = 0.2 vs p1 = 0.4; feed 60% success — llr climbs
    val df = mkEvents(Seq(
      ("2024-01-01", 12, 8), ("2024-01-02", 12, 8), ("2024-01-03", 12, 8),
      ("2024-01-04", 2, 18) // a bad day AFTER crossing must not unlatch
    )).repartition(4)
    val r = Sequential.sprtDF(df, "ts", lit(true), col("ok"), 0.2, 0.4)
      .collect()
    // driver replay
    val c1 = math.log(0.4 / 0.2); val c0 = math.log(0.6 / 0.8)
    val up = math.log(0.95 / 0.05)
    var run = 0.0; var everUp = false
    val days = Seq((12, 20), (12, 20), (12, 20), (2, 20))
    days.zip(r).foreach { case ((x, n), got) =>
      run += x * c1 + (n - x) * c0
      everUp ||= run >= up
      assert(got.getLong(1) == n && got.getLong(2) == x)
      assert(math.abs(got.getDouble(4) - run) < 1e-5)
      assert(got.getBoolean(5) == everUp)
    }
    // crossed by day 3, still latched on day 4 even though llr dropped
    assert(r(2).getBoolean(5) && r(3).getBoolean(5))
    assert(r(2).getString(7) == "accept_h1")
  }

  test("SPRT: low-rate data crosses the lower bound; middle rate continues") {
    val lo = mkEvents(Seq(("2024-01-01", 1, 39), ("2024-01-02", 1, 39)))
    val rLo = Sequential.sprtDF(lo, "ts", lit(true), col("ok"), 0.2, 0.4).collect()
    assert(rLo.last.getBoolean(6) && rLo.last.getString(7) == "accept_h0")
    // a rate between p0 and p1 stays in the band for a short run
    val mid = mkEvents(Seq(("2024-01-01", 3, 7), ("2024-01-02", 3, 7)))
    val rMid = Sequential.sprtDF(mid, "ts", lit(true), col("ok"), 0.2, 0.4).collect()
    assert(rMid.forall(_.getString(7) == "continue"))
  }

  test("SPRT: trial filter excludes the other arm; layout-proof") {
    val rng = new scala.util.Random(61)
    val rows = Seq.fill(3000)((
      f"2024-01-${rng.nextInt(28) + 1}%02d 08:00:00",
      rng.nextInt(2) == 1, rng.nextInt(5) == 0))
    val df = rows.toDF("tss", "arm", "ok")
      .select(to_timestamp(col("tss")).as("ts"), col("arm"), col("ok"))
    val a = Sequential.sprtDF(df.repartition(1), "ts", col("arm"), col("ok"), 0.18, 0.22)
      .collect()
    val b = Sequential.sprtDF(df.repartition(13), "ts", col("arm"), col("ok"), 0.18, 0.22)
      .collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getLong(1)).sum == rows.count(_._2))
  }
}
