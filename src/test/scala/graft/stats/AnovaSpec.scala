package graft.stats

import graft.SparkSpec

class AnovaSpec extends SparkSpec {
  import spark.implicits._

  test("one-way ANOVA: hand-computed balanced example") {
    // A = {1,2,3}, B = {4,5,6}: ssw = 2 + 2 = 4, grand mean 3.5,
    // ssb = 3·1.5² + 3·1.5² = 13.5, F = (13.5/1)/(4/4) = 13.5
    val df = Seq((1.0, "A"), (2.0, "A"), (3.0, "A"),
      (4.0, "B"), (5.0, "B"), (6.0, "B")).toDF("x", "g")
    val rows = Anova.onewayDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("A", "B"))
    assert(rows.map(_._2).toSeq == Seq(3L, 3L))
    assert(rows.map(_._3).toSeq == Seq(2.0, 5.0))
    assert(rows.last._4 == 4.0)     // ssw
    assert(rows.last._5 == 13.5)    // ssb
    assert(rows.last._6 == 13.5)    // F
  }

  test("one-way ANOVA: distributed equals the driver formula on messy data") {
    val rng = new scala.util.Random(43)
    // .25-grid values are exact in DECIMAL(12,2)
    val data = Seq.fill(700)(
      (math.round(rng.nextGaussian() * 40) / 4.0 + rng.nextInt(4) * 2,
        s"g${rng.nextInt(4)}"))
    val df = data.toDF("x", "g").repartition(9)
    val rows = Anova.onewayDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val groups = data.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val n = data.size.toDouble; val k = groups.size.toDouble
    val m = data.map(_._1).sum / n
    val ssw = groups.values.map { xs =>
      val mg = xs.sum / xs.size; xs.map(x => (x - mg) * (x - mg)).sum }.sum
    val ssb = groups.values.map { xs =>
      val mg = xs.sum / xs.size; xs.size * (mg - m) * (mg - m) }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(rows.last._4 - ssw) < 5e-4)
    assert(math.abs(rows.last._5 - ssb) < 5e-4)
    assert(math.abs(rows.last._6 - f) < 5e-6)
    rows.foreach { r =>
      assert(r._2 == groups(r._1).size.toLong)
      assert(math.abs(r._3 - groups(r._1).sum / groups(r._1).size) < 5e-7)
    }
  }

  test("Brown–Forsythe: hand-computed example with even/odd groups") {
    // A = {1,2,3}: lower median 2, z = {1,0,1} → n=3, s=2, ss=2
    // B = {4,5,6,7}: lower median 5, z = {1,0,1,2} → n=4, s=4, ss=6
    // ssw = (2−4/3) + (6−16/4) = 8/3; m = 6/7
    // ssb = 3·(2/3−6/7)² + 4·(1−6/7)² = 4/21
    // W = (4/21)/( (8/3)/5 ) = 5/14
    val df = Seq((1.0, "A"), (2.0, "A"), (3.0, "A"),
      (4.0, "B"), (5.0, "B"), (6.0, "B"), (7.0, "B")).toDF("x", "g")
    val rows = Anova.brownForsytheDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("A", 3L, 2.0), ("B", 4L, 5.0)))
    assert(math.abs(rows.last._5 - 8.0 / 3) < 5e-5)
    assert(math.abs(rows.last._6 - 4.0 / 21) < 5e-5)
    assert(math.abs(rows.last._7 - 5.0 / 14) < 5e-7)
  }

  test("Brown–Forsythe: distributed equals the driver formula on messy data") {
    val rng = new scala.util.Random(47)
    val data = Seq.fill(600)(
      (math.round(rng.nextGaussian() * 40) / 4.0 + rng.nextInt(3) * 3,
        s"g${rng.nextInt(3)}"))
    val df = data.toDF("x", "g").repartition(7)
    val rows = Anova.brownForsytheDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    val groups = data.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def lowerMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val devs = groups.view.mapValues(xs =>
      xs.map(x => math.abs(x - lowerMedian(xs)))).toMap
    val n = data.size.toDouble; val k = groups.size.toDouble
    val m = devs.values.flatten.sum / n
    val ssw = devs.values.map { zs =>
      val mg = zs.sum / zs.size; zs.map(z => (z - mg) * (z - mg)).sum }.sum
    val ssb = devs.values.map { zs =>
      val mg = zs.sum / zs.size; zs.size * (mg - m) * (mg - m) }.sum
    val w = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(rows.last._5 - ssw) < 5e-4)
    assert(math.abs(rows.last._6 - ssb) < 5e-4)
    assert(math.abs(rows.last._7 - w) < 5e-6)
    rows.foreach { r =>
      assert(r._2 == groups(r._1).size.toLong)
      assert(r._3 == lowerMedian(groups(r._1)))
    }
  }

  test("Brown–Forsythe: NULL values and NULL groups drop") {
    val df = Seq((Some(1.0), Some("A")), (None, Some("A")),
      (Some(2.0), None), (Some(2.0), Some("A")), (Some(9.0), Some("B")),
      (Some(7.0), Some("B"))).toDF("x", "g")
    val rows = Anova.brownForsytheDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq(("A", 2L), ("B", 2L)))
  }

  test("NULL values and NULL groups drop") {
    val df = Seq((Some(1.0), Some("A")), (None, Some("A")),
      (Some(2.0), None), (Some(2.0), Some("A")), (Some(9.0), Some("B")),
      (Some(7.0), Some("B"))).toDF("x", "g")
    val rows = Anova.onewayDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq(("A", 2L), ("B", 2L)))
  }

  test("bartlettDF: hand-computed T on three groups") {
    val data = Map(
      "A" -> Seq(1.0, 2.0, 3.0, 4.0),
      "B" -> Seq(2.0, 4.0, 6.0, 8.0, 10.0),
      "C" -> Seq(5.0, 5.5, 6.0))
    val df = data.toSeq.flatMap { case (g, xs) => xs.map(x => (x, g)) }
      .toDF("x", "g").repartition(3)
    val rows = Anova.bartlettDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    // textbook Bartlett from per-group sample variances
    def v(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val ks = Seq("A", "B", "C")
    val n = ks.map(data(_).size.toDouble)
    val vs = ks.map(g => v(data(g)))
    val bigN = n.sum; val k = 3.0
    val sp2 = ks.indices.map(i => (n(i) - 1) * vs(i)).sum / (bigN - k)
    val tNum = (bigN - k) * math.log(sp2) -
      ks.indices.map(i => (n(i) - 1) * math.log(vs(i))).sum
    val c = 1.0 + (n.map(x => 1.0 / (x - 1)).sum - 1.0 / (bigN - k)) /
      (3.0 * (k - 1))
    assert(math.abs(rows.last._7 - tNum / c) < 1e-5)
    // per-group sample variances surface exactly
    ks.indices.foreach(i => assert(math.abs(rows(i)._3 - vs(i)) < 1e-6))
  }

  test("iccOneWayDF: exact hand cases (perfect, negative, exclusion)") {
    import org.apache.spark.sql.functions._
    // perfect between-group separation: MSW = 0, ICC = 1
    val perfect = Seq((1L, 2L), (1L, 2L), (2L, 6L), (2L, 6L))
      .toDF("g", "y").repartition(3)
    val r1 = Anova.iccOneWayDF(perfect, col("g"), col("y"), k = 2)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].head()
    // A = 16 + 144 = 160, T = 16, Q = 80; MSB = 16, MSW = 0
    assert(r1 == ((2L, 2L, 160L, 16L, 80L, 16.0, 0.0, 1.0)), r1.toString)
    // all-within variance: MSB = 0 -> ICC negative; size-3 group excluded
    val within = Seq((1L, 1L), (1L, 3L), (2L, 2L), (2L, 2L),
      (3L, 9L), (3L, 9L), (3L, 9L)).toDF("g", "y")
    val r2 = Anova.iccOneWayDF(within, col("g"), col("y"), k = 2)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].head()
    // groups 1,2 only: A = 32, T = 8, Q = 18; MSB = 0, MSW = 1 -> ICC = -1
    assert(r2 == ((2L, 2L, 32L, 8L, 18L, 0.0, 1.0, -1.0)), r2.toString)
  }
}
