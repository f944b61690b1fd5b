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

  test("cusumDetect: reflection identity equals the stateful recurrence") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    val rng = new scala.util.Random(97)
    val counts = Seq.fill(80)(rng.nextInt(6))          // per-hour event counts
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("k", Timestamp.valueOf(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:10:00")))
    } ++ Seq(("k", Timestamp.valueOf("2024-01-04 10:00:00"))) // lone extra hour
    val df = rows.toDF("etype", "t").repartition(5)
    // target 2.5 events/hour (doubled 5), threshold 4 (doubled 8)
    val out = Resample.cusumDetect(df, "etype", "t", "hour",
      target2 = 5L, threshold2 = 8L).collect()
    // driver recurrence over the hours that HAVE events (present buckets)
    val present = counts.zipWithIndex.filter(_._1 > 0).map(_._1) :+ 1
    var s = 0L
    present.zip(out).foreach { case (c, row) =>
      s = math.max(0L, s + 2L * c - 5L)
      assert(row.getLong(2) == c.toLong)
      assert(row.getLong(3) == s, s"bucket ${row.get(1)}")
      assert(row.getBoolean(4) == (s >= 8L))
    }
    assert(out.length == present.length)
  }

  test("rollingAnomaly: hand-computed spike against steady prior hours") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // key k: hours 0-3 have 2 events each, hour 4 has 8 (the spike)
    val rows = (for (h <- 0 to 3; m <- Seq(5, 35)) yield ("k", ts(h, m))) ++
      (1 to 8).map(i => ("k", ts(4, i)))
    val df = rows.toDF("etype", "t").repartition(3)
    val out = Resample.rollingAnomaly(df, "etype", "t", "hour",
      lookback = 24, zThreshold = 3.0).collect()
    assert(out.length == 5)
    // first two buckets: no/one prior → z null
    assert(out(0).getLong(3) == 0L && out(1).getLong(3) == 1L)
    assert(out(0).isNullAt(4) && out(1).isNullAt(4))
    // constant window: variance 0 → z null
    assert(out(2).isNullAt(4) && out(3).isNullAt(4))
    // the spike: prior = {2,2,2,2}, mean 2, sd 0 → still null variance!
    // (constant priors) — so z stays null but the count is visible
    assert(out(4).getLong(2) == 8L && out(4).isNullAt(4))
    // now a noisy prior: counts 1,3,1,3 then 9 → mean 2, var 4/3, sd 1.1547
    val rows2 = (for (h <- 0 to 3; m <- 0 until (if (h % 2 == 0) 1 else 3))
      yield ("n", ts(h, m))) ++ (1 to 9).map(i => ("n", ts(4, i)))
    val out2 = Resample.rollingAnomaly(rows2.toDF("etype", "t"), "etype", "t",
      "hour", 24, 3.0).collect()
    val last = out2.last
    val zRef = (9.0 - 2.0) / math.sqrt((4.0 * 20 - 8 * 8) / (4.0 * 3))
    assert(math.abs(last.getDouble(4) - zRef) < 1e-6)
    assert(last.getBoolean(5))
  }

  test("retentionCohorts: hand-computed triangle") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // u1 first on d1, active d1,d2,d4; u2 first on d1, active d1,d2;
    // u3 first on d2, active d2 only. Duplicate same-day events collapse.
    val df = Seq(
      (1L, ts(1, 9)), (1L, ts(1, 12)), (1L, ts(2, 9)), (1L, ts(4, 9)),
      (2L, ts(1, 9)), (2L, ts(2, 23)),
      (3L, ts(2, 9)), (3L, ts(2, 10))).toDF("u", "t")
    val r = Resample.retentionCohorts(df, "u", "t", horizon = 14)
      .select(col("cohort").cast("string"), col("k"), col("n_users"),
        col("cohort_size"), col("pct"))
      .as[(String, Int, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0), ("2024-01-01", 1, 2L, 2L, 1.0),
      ("2024-01-01", 3, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0)))
  }

  test("acfCounts: alternating counts give acf(1) < 0 < acf(2)") {
    import java.sql.Timestamp
    // hourly buckets with counts 1,3,1,3,... → strong negative lag-1,
    // strong positive lag-2 autocorrelation
    val events = (0 until 24).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 3
      Seq.fill(n)(("a", Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")))
    }
    val r = Resample.acfCounts(events.toDF("k", "t"), "k", "t", "hour",
        maxLag = 2).as[(String, Long, Long, Double)].collect()
    assert(r.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("a", 1L, 24L), ("a", 2L, 24L)))
    assert(r(0)._4 < -0.8 && r(1)._4 > 0.8)
  }

  test("acfCounts: distributed equals the driver estimator; constant series → 0") {
    import java.sql.Timestamp
    val rng = new scala.util.Random(13)
    val counts = Seq.tabulate(50)(h => 1 + rng.nextInt(5))
    val events = counts.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)(("x", Timestamp.valueOf(
        f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:10:00")))
    } ++ (0 until 10).flatMap(h =>
      Seq.fill(2)(("const", Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"))))
    val r = Resample.acfCounts(events.toDF("k", "t").repartition(9),
        "k", "t", "hour", maxLag = 3)
      .as[(String, Long, Long, Double)].collect()
    val cbar = counts.sum.toDouble / counts.size
    (1 to 3).foreach { k =>
      val num = (0 until counts.size - k)
        .map(t => (counts(t) - cbar) * (counts(t + k) - cbar)).sum
      val den = counts.map(c => (c - cbar) * (c - cbar)).sum
      val got = r.find(t => t._1 == "x" && t._2 == k.toLong).get._4
      assert(math.abs(got - num / den) < 1e-6, s"lag $k")
    }
    r.filter(_._1 == "const").foreach(t => assert(t._4 == 0.0))
  }

  test("activityIslands: consecutive runs segment, gaps split, counts sum") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // key a: hours 1,2,3 then a gap then 6; key b: single hour
    val df = Seq(
      ("a", ts(1, 5)), ("a", ts(1, 40)), ("a", ts(2, 0)), ("a", ts(3, 59)),
      ("a", ts(6, 0)),
      ("b", ts(9, 30))).toDF("k", "t")
    val r = Resample.activityIslands(df, "k", "t", "hour")
      .as[(String, Long, Long, Long, Long)].collect()
    def ep(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      .toInstant.getEpochSecond
    assert(r.toSeq == Seq(
      ("a", ep(1), ep(3), 3L, 4L),
      ("a", ep(6), ep(6), 1L, 1L),
      ("b", ep(9), ep(9), 1L, 1L)))
    intercept[IllegalArgumentException](
      Resample.activityIslands(df, "k", "t", "week"))
  }

  test("twapDaily: hand-computed gaps; the day's last event carries no weight") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // value 10 holds 1h, value 20 holds 30min, value 99 is the tail (dropped)
    // twap = (10·60 + 20·30) / 90 = 13.333333
    val df = Seq(
      ("a", 1L, ts(9, 0), 10.0), ("a", 2L, ts(10, 0), 20.0),
      ("a", 3L, ts(10, 30), 99.0)).toDF("k", "id", "t", "v")
    val r = Resample.twapDaily(df, "k", "t", "id", "v")
      .as[(String, String, Long, Double)].collect()
    assert(r.toSeq == Seq(("a", "2024-01-01", 2L, 13.333333)))
  }

  test("twapDaily: equal timestamps break by id; days are independent") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val df = Seq(
      // day 1: two events at the SAME instant (ids 1,2), then id 3
      ("a", 1L, ts(1, 9), 10.0), ("a", 2L, ts(1, 9), 50.0),
      ("a", 3L, ts(1, 10), 0.0),
      // day 2: single event → no gaps → day absent
      ("a", 4L, ts(2, 9), 77.0)).toDF("k", "id", "t", "v")
    val r = Resample.twapDaily(df, "k", "t", "id", "v")
      .as[(String, String, Long, Double)].collect()
    // id 1 → id 2 gap 0µs (weight 0); id 2 → id 3 gap 1h
    // twap = (10·0 + 50·3600e6)/(3600e6) = 50
    assert(r.toSeq == Seq(("a", "2024-01-01", 2L, 50.0)))
  }

  test("retentionCohorts: horizon bounds k and NULLs drop") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 09:00:00")
    val df = Seq((Some(1L), Some(ts(1))), (Some(1L), Some(ts(9))),
      (None, Some(ts(1))), (Some(2L), None)).toDF("u", "t")
    val r = Resample.retentionCohorts(df, "u", "t", horizon = 3)
      .select(col("k")).as[Int].collect()
    assert(r.toSeq == Seq(0)) // day 9 (k=8) is past the horizon
  }

  test("transitionMatrix: hand-built sequences; rows normalize to 1") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    // user 1: a→b→a ; user 2: a→b — transitions a→b ×2, b→a ×1
    val df = Seq((1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"),
      (1L, ts(3), 12L, "a"), (2L, ts(1), 20L, "a"), (2L, ts(2), 21L, "b"))
      .toDF("u", "t", "id", "kind")
    val r = Resample.transitionMatrix(df, "u", "t", "id", "kind")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(r == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
    // equal timestamps: the tie column makes pairing deterministic
    val tie = Seq((1L, ts(1), 2L, "x"), (1L, ts(1), 1L, "y"))
      .toDF("u", "t", "id", "kind")
    val rt = Resample.transitionMatrix(tie, "u", "t", "id", "kind")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rt == Seq(("y", "x", 1L, 1.0)))
  }

  test("ewmaDaily: LONG numerator equals the α=1/2 adjusted recurrence") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")
    // key a days 1..4, two events on day 2 (sum within day first)
    val df = Seq(("a", ts(1, 9), 10.0), ("a", ts(2, 9), 5.0),
      ("a", ts(2, 10), 7.0), ("a", ts(4, 9), 20.0)).toDF("k", "t", "v")
    val r = Resample.ewmaDaily(df, "k", "t", "v")
      .as[(String, String, String, Long, Double)].collect().toSeq
    // adjusted EWMA over present buckets x = (10, 12, 20):
    // s1=10, s2=(10+2·12)/3, s3=(10+2·12+4·20)/7
    def rnd(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == Seq(
      ("a", "2024-03-01", "2024-03-01", 1L, 10.0),
      ("a", "2024-03-01", "2024-03-02", 2L, rnd(34.0 / 3)),
      ("a", "2024-03-01", "2024-03-04", 3L, rnd(114.0 / 7))))
    // layout independence: the numerator is an integer window sum
    val rng = new scala.util.Random(13)
    val big = (1 to 300).map { i =>
      ("k" + (i % 3), ts(1 + rng.nextInt(28), rng.nextInt(24)),
        rng.nextInt(5000) / 100.0)
    }
    val a = Resample.ewmaDaily(big.toDF("k", "t", "v").repartition(1),
      "k", "t", "v").collect().toSeq
    val b = Resample.ewmaDaily(big.toDF("k", "t", "v").repartition(11),
      "k", "t", "v").collect().toSeq
    assert(a == b)
  }

  test("dowSeasonality: weekly square wave recovers its own pattern") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // 28 days; Mondays (2024-01-01, 08, 15, 22) carry 80, others 10:
    // each interior 7-day window sums to 140, mean 20 → monday seasonal
    // = 80-20 = 60, other days = -10
    val rows = (1 to 28).map(d => ("k", ts(d), if ((d - 1) % 7 == 0) 80.0 else 10.0))
    val r = Resample.dowSeasonality(rows.toDF("k", "t", "v"), "k", "t", "v")
      .as[(String, Long, Long, Double)].collect().toSeq
    // 2024-01-01 is a Monday → dow = (19723+4) % 7
    val mondayDow = (19723 + 4) % 7
    r.foreach { case (_, dow, nDays, seasonal) =>
      assert(nDays >= 3L)
      if (dow == mondayDow) assert(seasonal == 60.0)
      else assert(seasonal == -10.0, s"dow=$dow")
    }
    assert(r.size == 7)
  }

  test("ljungBoxDF: matches a direct ACF fold; alternating series rejects") {
    import java.sql.Timestamp
    // hourly counts [5,1,5,1,...] for 12 hours — strong lag-1 structure
    val cs = Seq(5, 1, 5, 1, 5, 1, 5, 1, 5, 1, 5, 1)
    val rows = cs.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("p", Timestamp.valueOf(f"2024-03-01 $h%02d:30:00")))
    }
    val r = Resample.ljungBoxDF(rows.toDF("k", "t").repartition(4),
      "k", "t", "hour", maxLag = 3).collect()
    assert(r.length == 3)
    // direct fold over the same counts
    val n = cs.length; val s = cs.sum
    val m = cs.map(c => n.toLong * c - s)
    val den = m.map(x => x.toDouble * x).sum
    def rho(k: Int) =
      m.dropRight(k).zip(m.drop(k)).map { case (a, b) => a.toDouble * b }.sum / den
    val q3 = n * (n + 2.0) *
      (1 to 3).map(k => rho(k) * rho(k) / (n - k)).sum
    assert(math.abs(r.last.getDouble(4) - q3) < 1e-4, s"q_run=${r.last.getDouble(4)} vs $q3")
    assert(math.abs(r.head.getDouble(3) - rho(1)) < 1e-5, "acf lag 1")
    assert(r.last.getDouble(4) > 7.81, "alternating series must reject χ²(3)")
  }

  test("seasonalNaiveBacktest: hand case — linear ramp scores 7 vs 1") {
    import java.sql.Timestamp
    // day d (1..10) carries d events: lag-7 error is 7/day, lag-1 is 1/day
    val rows = for {
      d <- 1 to 10; i <- 1 to d
    } yield ("k", Timestamp.valueOf(f"2024-01-$d%02d 0${i % 10}:00:00"))
    val r = Resample.seasonalNaiveBacktest(
      rows.toDF("k", "t").repartition(5), "k", "t", season = 7)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    // scored days: 8, 9, 10 (need both day-7 and day-1)
    assert(r.toSeq == Seq(("k", 3L, 21L, 3L, 7.0, 7.0)))
    // a missing day breaks pairings instead of silently mis-lagging
    val gappy = rows.filter { case (_, ts) => !ts.toString.startsWith("2024-01-09") }
    val r2 = Resample.seasonalNaiveBacktest(
      gappy.toDF("k", "t"), "k", "t", season = 7)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    // day 9 gone: day 9 unscored AND day 10 loses its lag-1 → only day 8
    assert(r2.head._2 == 1L, r2.mkString(","))
    intercept[IllegalArgumentException](
      Resample.seasonalNaiveBacktest(rows.toDF("k", "t"), "k", "t", season = 1))
  }
}
