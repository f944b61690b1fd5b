package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TTestSpec extends SparkSpec {
  import spark.implicits._

  // driver-side Welch reference over raw doubles
  private def welchRef(as: Seq[Double], bs: Seq[Double]): (Double, Double) = {
    val na = as.size.toDouble; val nb = bs.size.toDouble
    val ma = as.sum / na; val mb = bs.sum / nb
    val va = as.map(x => (x - ma) * (x - ma)).sum / (na - 1)
    val vb = bs.map(x => (x - mb) * (x - mb)).sum / (nb - 1)
    val sea = va / na; val seb = vb / nb
    val t = (ma - mb) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1) + seb * seb / (nb - 1))
    (t, df)
  }

  test("Welch: hand-checkable equal-variance case") {
    // A = {1, 2, 3}, B = {4, 5, 6}: means 2 / 5, both variances 1,
    // se² = 2/3, t = -3/sqrt(2/3), df = 4
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (4.0, false), (5.0, false), (6.0, false)).toDF("x", "a")
    val r = TTest.welchDF(df, "x", col("a"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 == 3L && r._2 == 3L)
    assert(r._3 == 2.0 && r._4 == 5.0)
    assert(math.abs(r._5 - (-3.0 / math.sqrt(2.0 / 3.0))) < 5e-7)
    assert(math.abs(r._6 - 4.0) < 5e-5)
  }

  test("Welch: distributed equals the driver reference on messy data") {
    val rng = new scala.util.Random(23)
    // .5-grid values: exact in DECIMAL(12,2), so the power-sum path is
    // the production shape (no representation slack in the reference)
    val as = Seq.fill(400)(math.round(rng.nextGaussian() * 20) / 2.0 + 50)
    val bs = Seq.fill(300)(math.round(rng.nextGaussian() * 16) / 2.0 + 53)
    val df = (as.map((_, true)) ++ bs.map((_, false))).toDF("x", "a")
      .repartition(8)
    val r = TTest.welchDF(df, "x", col("a"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    val (t, wdf) = welchRef(as, bs)
    assert(r._1 == 400L && r._2 == 300L)
    assert(math.abs(r._3 - as.sum / 400) < 5e-7)
    assert(math.abs(r._4 - bs.sum / 300) < 5e-7)
    assert(math.abs(r._5 - t) < 5e-7)
    assert(math.abs(r._6 - wdf) < 5e-4)
  }

  test("Jarque-Bera: distributed equals the driver moment formula") {
    val rng = new scala.util.Random(29)
    val vals = Seq.fill(800)(math.round(rng.nextGaussian() * 800 + 5000) / 100.0)
    val df = vals.toDF("x").repartition(7)
    val r = TTest.jarqueBeraDF(df, "x")
      .as[(Long, Double, Double, Double)].head()
    val n = vals.size.toDouble
    val mu = vals.sum / n
    def cm(p: Int) = vals.map(v => math.pow(v - mu, p)).sum / n
    val skew = cm(3) / math.pow(cm(2), 1.5)
    val kurt = cm(4) / (cm(2) * cm(2)) - 3.0
    val jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    assert(r._1 == 800L)
    assert(math.abs(r._2 - skew) < 1e-6)
    assert(math.abs(r._3 - kurt) < 1e-6)
    assert(math.abs(r._4 - jb) < 1e-2)
  }

  test("Jarque-Bera: symmetric two-point data has zero skew, kurtosis -2") {
    // x ∈ {0, 1} equally: m2 = 1/4, m3 = 0, m4 = 1/16 → kurt_excess = -2
    val df = (Seq.fill(50)(0.0) ++ Seq.fill(50)(1.0)).toDF("x")
    val r = TTest.jarqueBeraDF(df, "x")
      .as[(Long, Double, Double, Double)].head()
    assert(r._2 == 0.0 && r._3 == -2.0)
  }

  test("Welch: NULL values and NULL flags drop") {
    val df = Seq((Some(1.0), Some(true)), (Some(2.0), Some(true)),
      (None, Some(true)), (Some(3.0), None),
      (Some(4.0), Some(false)), (Some(6.0), Some(false))).toDF("x", "a")
    val r = TTest.welchDF(df, "x", col("a"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 == 2L && r._2 == 2L && r._3 == 1.5 && r._4 == 5.0)
  }

  test("grubbsDF: hand-computed single-group G; NULLs drop") {
    val df = Seq((Some(1.0), Some("A")), (Some(2.0), Some("A")),
      (Some(3.0), Some("A")), (Some(10.0), Some("A")),
      (None, Some("A")), (Some(99.0), None)).toDF("x", "g")
    val r = TTest.grubbsDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double, Double)].head()
    // n=4, mean=4, ss=114, var=(114-64)/3, sd=sqrt(50/3)
    val sd = math.sqrt(50.0 / 3.0)
    assert(r._1 == "A" && r._2 == 4L && r._3 == 4.0)
    assert(r._4 == math.rint(sd * 1e6) / 1e6)
    assert(r._5 == 10.0 && r._6 == 1.0)
    assert(math.abs(r._7 - (10.0 - 4.0) / sd) < 1e-6)
  }

  test("cohensDDF: hand-computed pooled effect size") {
    import org.apache.spark.sql.functions._
    // A: 1,3 (mean 2, ssq 2); B: 5,9 (mean 7, ssq 8); sp = sqrt(10/2)
    val df = Seq((1.0, true), (3.0, true), (5.0, false), (9.0, false))
      .toDF("x", "a").repartition(3)
    val r = TTest.cohensDDF(df, "x", col("a"))
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    def rd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sp = math.sqrt(10.0 / 2.0)
    val d = (2.0 - 7.0) / sp
    assert(r._1 == 2L && r._2 == 2L && r._3 == 2.0 && r._4 == 7.0)
    assert(r._5 == rd(sp) && r._6 == rd(d))
    assert(r._7 == rd(d * (1.0 - 3.0 / (4.0 * 4 - 9.0))))
  }

  test("Normal.quantile: known values, symmetry, monotonicity") {
    assert(math.abs(Normal.quantile(0.975) - 1.959963985) < 1e-7)
    assert(math.abs(Normal.quantile(0.9975) - 2.807033768) < 1e-7)
    assert(math.abs(Normal.quantile(0.01) + 2.326347874) < 1e-7)
    assert(math.abs(Normal.quantile(0.5)) < 1e-12)
    // tails (the Acklam tail branch) and symmetry
    assert(math.abs(Normal.quantile(0.001) + Normal.quantile(0.999)) < 1e-7)
    assert(Normal.quantile(1e-6) < Normal.quantile(1e-3))
    intercept[IllegalArgumentException](Normal.quantile(0.0))
  }

  test("pairwiseWelchDF: each pair matches welchDF on the same two groups") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 60).map { i =>
      val g = Seq("g1", "g2", "g3")(i % 3)
      val x = (i % 11).toDouble + (if (g == "g2") 5.0 else 0.0) +
        (if (g == "g3") 2.5 else 0.0)
      (g, x)
    }
    val df = rows.toDF("g", "x").repartition(4)
    val pw = TTest.pairwiseWelchDF(df, "x", "g", critZ = 2.807033768343804)
      .collect()
    assert(pw.length == 3) // 3 choose 2
    for (row <- pw) {
      val (ga, gb) = (row.getString(0), row.getString(1))
      val solo = TTest.welchDF(df.where(col("g").isin(ga, gb)), "x",
        col("g") === ga).head()
      assert(row.getLong(2) == solo.getLong(0), s"$ga/$gb n_a")
      assert(row.getDouble(4) == solo.getDouble(2), s"$ga/$gb mean_a")
      assert(row.getDouble(6) == solo.getDouble(4), s"$ga/$gb t")
      assert(row.getDouble(7) == solo.getDouble(5), s"$ga/$gb df")
      assert(row.getBoolean(8) == (math.abs(solo.getDouble(4)) > 2.807033768343804))
    }
  }
}
