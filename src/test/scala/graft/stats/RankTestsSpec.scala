package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  test("Mann-Whitney: hand-computed ties example") {
    // A = {1, 2, 2}, B = {2, 3} → U_A = 1.0 (one tie pair at ½ each of two
    // a=2 vs b=2), tie term = 3³-3 = 24, z = -2 / sqrt(2.4)
    val df = Seq((1.0, true), (2.0, true), (2.0, true), (2.0, false),
      (3.0, false)).toDF("x", "a")
    val r = RankTests.mannWhitneyDF(df, "x", col("a"))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 == 3L && r._2 == 2L && r._3 == 2L && r._4 == 24L)
    assert(math.abs(r._5 - (-2.0 / math.sqrt(2.4))) < 1e-12)
  }

  test("Mann-Whitney: distributed equals the O(n^2) pair definition") {
    val rng = new scala.util.Random(7)
    val as = Seq.fill(200)(rng.nextInt(12).toDouble)
    val bs = Seq.fill(300)(rng.nextInt(12).toDouble + rng.nextInt(2))
    val df = (as.map((_, true)) ++ bs.map((_, false))).toDF("x", "a")
      .repartition(7) // arbitrary layout; sharded prefix must not care
    val r = RankTests.mannWhitneyDF(df, "x", col("a"))
      .as[(Long, Long, Long, Long, Double)].head()
    val u2Ref = (for (a <- as; b <- bs) yield
      if (a > b) 2L else if (a == b) 1L else 0L).sum
    assert((r._1, r._2, r._3) == (200L, 300L, u2Ref))
    val n = 500.0
    val t = (as ++ bs).groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * t * t - t).sum
    assert(r._4 == t)
    val zRef = (u2Ref / 2.0 - 200.0 * 300.0 / 2.0) /
      math.sqrt(200.0 * 300.0 * ((n + 1.0) - t / (n * (n - 1.0))) / 12.0)
    assert(math.abs(r._5 - zRef) < 1e-12)
  }

  test("KS: hand-computed example and pair-free exactness") {
    // A = {1, 3}, B = {2, 3}: ECDF gap peaks at v=1 (1/2 - 0) → D = 1/2
    val df = Seq((1.0, true), (3.0, true), (2.0, false), (3.0, false))
      .toDF("x", "a")
    val r = RankTests.ksDF(df, "x", col("a"))
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((2L, 2L, 2L, 0.5)))
  }

  test("KS: distributed equals the driver ECDF sweep on messy data") {
    val rng = new scala.util.Random(11)
    val as = Seq.fill(150)(rng.nextGaussian())
    val bs = Seq.fill(250)(rng.nextGaussian() + 0.3)
    val df = (as.map((_, true)) ++ bs.map((_, false))).toDF("x", "a")
      .repartition(5)
    val r = RankTests.ksDF(df, "x", col("a"))
      .as[(Long, Long, Long, Double)].head()
    val values = (as ++ bs).distinct.sorted
    val dNumRef = values.map { v =>
      val ia = as.count(_ <= v).toLong
      val ib = bs.count(_ <= v).toLong
      math.abs(ia * 250L - ib * 150L)
    }.max
    assert((r._1, r._2, r._3) == ((150L, 250L, dNumRef)))
    assert(r._4 == dNumRef.toDouble / (150.0 * 250.0))
  }

  test("NULL values and NULL group flags drop before counting") {
    val df = Seq((Some(1.0), Some(true)), (None, Some(true)),
      (Some(2.0), None), (Some(2.0), Some(false))).toDF("x", "a")
    val r = RankTests.mannWhitneyDF(df, "x", col("a"))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 == 1L && r._2 == 1L)
  }
}
