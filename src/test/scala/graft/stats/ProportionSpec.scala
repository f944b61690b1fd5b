package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProportionSpec extends SparkSpec {
  import spark.implicits._

  test("wilsonDF matches the driver formula, including the y=0 / y=n edges") {
    val rows = Seq.fill(40)(("a", 1)) ++ Seq.fill(60)(("a", 0)) ++
      Seq.fill(25)(("z", 1)) ++                    // all successes
      Seq.fill(30)(("e", 0))                       // no successes
    val r = Proportion.wilsonDF(rows.toDF("g", "s"), "g", col("s") === 1)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    def wilson(n: Double, y: Double): (Double, Double) = {
      val z = Proportion.z95; val z2 = z * z
      val p = y / n
      val d = 1.0 + z2 / n
      val c = (p + z2 / (2.0 * n)) / d
      val h = (z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) / d
      (c - h, c + h)
    }
    Seq(("a", 100L, 40L), ("z", 25L, 25L), ("e", 30L, 0L)).foreach {
      case (g, n, y) =>
        val (lo, hi) = wilson(n.toDouble, y.toDouble)
        val got = r(g)
        assert(got._2 == n && got._3 == y)
        assert(math.abs(got._5 - lo) < 1e-6, s"$g lo")
        assert(math.abs(got._6 - hi) < 1e-6, s"$g hi")
        assert(got._5 >= 0.0 && got._6 <= 1.0) // never leaves [0,1]
    }
    // interval contains the point estimate and is wider for smaller n
    assert(r("a")._5 < 0.4 && 0.4 < r("a")._6)
  }

  test("wilsonDF: NULL groups/labels drop") {
    val rows = Seq((Some("a"), Some(1)), (None, Some(1)), (Some("a"), None))
    val r = Proportion.wilsonDF(rows.toDF("g", "s"), "g", col("s") === 1)
      .collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L)
  }
}
