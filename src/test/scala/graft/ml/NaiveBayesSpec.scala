package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("fitScoreCells: hand-computed Laplace log-odds; layout-proof") {
    // 8 rows, 2 binary features; counts small enough to verify by hand
    val rows = Seq(
      (1, 1, true), (1, 1, true), (1, 0, true), (0, 1, true),
      (0, 0, false), (0, 0, false), (0, 1, false), (1, 0, false))
    val df = rows.toDF("a", "b", "y").repartition(3)
    val out = NaiveBayes.fitScoreCells(df, col("y"),
      Seq("fa" -> col("a"), "fb" -> col("b")))
      .as[(Int, Int, Long, Long, Double, Long)].collect()
    // N1 = 4, N0 = 4; feature a: c(a=1|1)=3, c(a=1|0)=1, K=2; feature b:
    // c(b=1|1)=3, c(b=1|0)=1, K=2
    def term(c1: Long, c0: Long): Double =
      (math.log(c1 + 1.0) - math.log(4.0 + 2)) -
        (math.log(c0 + 1.0) - math.log(4.0 + 2))
    def lo(a: Int, b: Int): Double = {
      val pa = if (a == 1) term(3, 1) else term(1, 3)
      val pb = if (b == 1) term(3, 1) else term(1, 3)
      (math.log(4.0) - math.log(4.0)) + pa + pb
    }
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    out.foreach { r =>
      assert(math.abs(r._5 - lo(r._1, r._2)) < 1e-6)
      assert(r._6 == (if (math.rint(lo(r._1, r._2) * 1e6) / 1e6 > 0) 1L else 0L))
    }
    // cell census: n and y1 match the raw data
    val n11 = out.find(r => r._1 == 1 && r._2 == 1).get
    assert(n11._3 == 2L && n11._4 == 2L)
    // bit-identical on another layout (counts are exact)
    val out1 = NaiveBayes.fitScoreCells(df.repartition(1), col("y"),
      Seq("fa" -> col("a"), "fb" -> col("b")))
      .as[(Int, Int, Long, Long, Double, Long)].collect()
    assert(out1.toSeq == out.toSeq)
  }

  test("fitScoreCells: NULL features and labels drop") {
    val df = Seq(
      (Some(1), Some(true)), (Some(0), Some(false)),
      (None, Some(true)), (Some(1), None)).toDF("a", "y")
    val out = NaiveBayes.fitScoreCells(df, col("y"), Seq("fa" -> col("a")))
      .collect()
    assert(out.map(_.getLong(2)).sum == 2L) // only the 2 complete rows
  }
}
