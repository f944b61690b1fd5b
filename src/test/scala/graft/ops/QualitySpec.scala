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

  test("iqrOutliers: hand-computed type-1 quantiles, fences, and census") {
    // one group, values 1..8 plus outlier 100: n=9, rank ⌈9/4⌉=3 → q25=3,
    // rank ⌈27/4⌉=7 → q75=7, IQR=4, fences [-3, 13] → only 100 is outside
    val d2 = ((1 to 8).map(_.toDouble) :+ 100.0).map(v => (v, "g"))
      .toDF("x", "grp")
    val r = Quality.iqrOutliers(d2, "x", "grp")
      .as[(String, Long, Double, Double, Double, Double, Long, Long)].head()
    assert(r == (("g", 9L, 3.0, 7.0, -3.0, 13.0, 0L, 1L)))
  }

  test("iqrOutliers: distributed equals a driver replay per group") {
    val rng = new scala.util.Random(41)
    val data = Seq.fill(900)(
      (math.round(rng.nextGaussian() * 500) / 100.0 + (rng.nextInt(3) * 10),
        s"g${rng.nextInt(3)}"))
    val df2 = data.toDF("x", "grp").repartition(7)
    val got = Quality.iqrOutliers(df2, "x", "grp")
      .as[(String, Long, Double, Double, Double, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    data.groupBy(_._2).foreach { case (g, xs) =>
      val v2 = xs.map(x => math.round(x._1 * 200)).sorted
      val n = v2.size
      val q25 = v2((n + 3) / 4 - 1); val q75 = v2((3 * n + 3) / 4 - 1)
      val lo = q25 - 3 * (q75 - q25) / 2; val hi = q75 + 3 * (q75 - q25) / 2
      val r = got(g)
      assert(r._2 == n.toLong)
      assert(r._3 == q25 / 200.0 && r._4 == q75 / 200.0)
      assert(r._7 == v2.count(_ < lo).toLong, s"below in $g")
      assert(r._8 == v2.count(_ > hi).toLong, s"above in $g")
    }
  }

  test("quantileBands: exact type-1 ranks on a hand grid") {
    // key A: values 1..20 → n=20, p50 at rank 10 → 10.0, p95 at rank 19
    val rows = (1 to 20).map(v => ("A", v.toDouble)) ++
      Seq(("B", 5.0), ("B", 5.0), ("B", 7.0))
    val r = Quality.quantileBands(rows.toDF("k", "v"), Seq("k"), "v")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(r.toSeq == Seq(
      ("A", 20L, 10.0, 19.0, 20.0),
      ("B", 3L, 5.0, 7.0, 7.0)))
  }

  test("quantileBands: distributed equals driver type-1 quantiles") {
    val rng = new scala.util.Random(23)
    val rows = Seq.fill(900)((s"g${rng.nextInt(4)}",
      math.round(rng.nextDouble() * 10000) / 100.0))
    val r = Quality.quantileBands(rows.toDF("k", "v").repartition(7),
      Seq("k"), "v").as[(String, Long, Double, Double, Double)].collect()
    val byK = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    r.foreach { case (k, n, p50, p95, vmax) =>
      val vs = byK(k)
      assert(n == vs.size.toLong)
      assert(p50 == vs((vs.size + 1) / 2 - 1))
      assert(p95 == vs((19 * vs.size + 19) / 20 - 1))
      assert(vmax == vs.last)
    }
  }

  test("madOutliers: hand case and driver replay per group") {
    // group g: {1, 2, 3, 4, 100} → med 3, |d| = {2,1,0,1,97} → MAD 1,
    // rule |x−3| > 3 → only 100 flags
    val hand = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _))
    val r = Quality.madOutliers(hand.toDF("k", "v"), "v", "k")
      .as[(String, Long, Double, Double, Long)].head()
    assert(r == (("g", 5L, 3.0, 1.0, 1L)))
    // randomized replay: interpolating medians + 3·MAD rule on the driver
    val rng = new scala.util.Random(19)
    val rows = (1 to 400).map(i =>
      ("k" + (i % 3), math.rint(rng.nextDouble() * 5000) / 100.0))
    val got = Quality.madOutliers(rows.toDF("k", "v").repartition(7), "v", "k")
      .as[(String, Long, Double, Double, Long)].collect()
    got.foreach { case (k, n, medv, madv, nout) =>
      val vs = rows.filter(_._1 == k).map(v => math.rint(v._2 * 200).toLong)
        .sorted
      def med(s: Seq[Long]): Double =
        (s((s.size + 1) / 2 - 1) + s((s.size + 2) / 2 - 1)) / 2.0
      val m = med(vs)
      val ds = vs.map(v => math.abs(v - m) * 2).map(_.toLong).sorted
      val mad2 = med(ds)
      assert(n == vs.size.toLong)
      assert(medv == BigDecimal(m / 200.0).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(madv == BigDecimal(mad2 / 400.0).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(nout == vs.count(v => math.abs(v - m) * 2 > 3 * mad2))
    }
  }

  test("trimmedMeans: hand case with an outlier and a tie across the cut") {
    import spark.implicits._
    // grp a: 1..9 + 100 → k=1 trims {1, 100}; winsor clamps to {2, 9}
    // grp b: two 1s straddle the trim cut — cell overlap arithmetic
    val rows =
      (Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 100).map(v => ("a", v.toDouble)) ++
        Seq(1, 1, 2, 3, 4, 5, 6, 7, 8, 9).map(v => ("b", v.toDouble)))
    val r = graft.ops.Quality.trimmedMeans(
      rows.toDF("g", "v").repartition(3), "v", "g", trimPct = 10)
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(r == Seq(
      ("a", 10L, 1L, 14.5, 5.5, 5.5, 2.0, 9.0),
      ("b", 10L, 1L, 4.6, 4.5, 4.5, 1.0, 8.0)))
  }
}
