package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def driverQuantile(vs: Seq[Double], num: Int, den: Int): Double = {
    val cents = vs.map(v => math.round(v * 100)).sorted
    val rank = ((num.toLong * cents.size + den - 1) / den).toInt
    cents(rank - 1) / 100.0
  }

  test("sketch-bracketed quantiles are EXACT and partitioning-independent") {
    val rng = new scala.util.Random(17)
    val vs = Seq.fill(20000)(math.round(rng.nextGaussian() * 5000 +
      rng.nextInt(3) * 20000) / 100.0)
    val qs = Seq((1, 2), (19, 20), (99, 100))
    val expected = qs.map { case (a, b) => driverQuantile(vs, a, b) }
    for (parts <- Seq(1, 7, 32)) {
      val r = SketchQuantiles.quantiles(vs.toDF("v").repartition(parts),
          "v", qs, k = 64)
        .select("q_num", "n", "value").as[(Long, Long, Double)].collect()
      assert(r.map(_._2).forall(_ == vs.size.toLong))
      assert(r.map(_._3).toSeq == expected, s"parts=$parts")
    }
  }

  test("adversarial sorted input and heavy duplication stay exact") {
    val vs = (1 to 10000).map(_.toDouble) ++ Seq.fill(5000)(42.0)
    val qs = Seq((1, 4), (1, 2), (3, 4))
    val expected = qs.map { case (a, b) => driverQuantile(vs, a, b) }
    val r = SketchQuantiles.quantiles(
        vs.toDF("v").repartition(11), "v", qs, k = 32)
      .select("value").as[Double].collect()
    assert(r.toSeq == expected)
  }

  test("p100 is the exact max (keep-larger keeps it); tiny inputs work") {
    val vs = Seq(3.25, 1.0, 99.75, 7.5)
    val r = SketchQuantiles.quantiles(vs.toDF("v"), "v",
        Seq((1, 1), (1, 4)), k = 8)
      .select("q_num", "q_den", "target_rank", "value")
      .as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 4L, 1L, 1.0), (1L, 1L, 4L, 99.75)))
  }

  test("NULLs drop; empty input refuses loudly") {
    val vs = Seq(Some(5.0), None, Some(1.0)).toDF("v")
    val r = SketchQuantiles.quantiles(vs, "v", Seq((1, 2)))
      .select("n", "value").as[(Long, Double)].collect()
    assert(r.toSeq == Seq((2L, 1.0)))
    val e = intercept[IllegalArgumentException] {
      SketchQuantiles.quantiles(Seq.empty[Option[Double]].toDF("v"), "v",
        Seq((1, 2)))
    }
    assert(e.getMessage.contains("no non-null rows"))
  }
}
