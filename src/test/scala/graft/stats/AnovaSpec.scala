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

  test("NULL values and NULL groups drop") {
    val df = Seq((Some(1.0), Some("A")), (None, Some("A")),
      (Some(2.0), None), (Some(2.0), Some("A")), (Some(9.0), Some("B")),
      (Some(7.0), Some("B"))).toDF("x", "g")
    val rows = Anova.onewayDF(df, "x", "g")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq(("A", 2L), ("B", 2L)))
  }
}
