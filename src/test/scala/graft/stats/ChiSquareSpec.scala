package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChiSquareSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed 2x2 table matches the textbook chi-squared") {
    // | 10 20 |  margins rt = 30, 30; ct = 25, 35; N = 60
    // | 15 15 |  chi2 = sum (O - E)^2 / E = 60*(10*15-20*15)^2/(30*30*25*35)
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(15)(("b", "x")) ++ Seq.fill(15)(("b", "y"))
    val df = rows.toDF("r", "c")
    val out = ChiSquare.contingencyDF(df, "r", "c")
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 15L), ("b", "y", 15L)))
    val expected = Map(("a", "x") -> 30.0 * 25 / 60, ("a", "y") -> 30.0 * 35 / 60,
      ("b", "x") -> 30.0 * 25 / 60, ("b", "y") -> 30.0 * 35 / 60)
    out.foreach(t => assert(math.abs(t._4 - expected((t._1, t._2))) < 1e-12))
    // 2x2 closed form: N (ad - bc)^2 / (r1 r2 c1 c2)
    val chi2Ref = 60.0 * math.pow(10.0 * 15 - 20.0 * 15, 2) /
      (30.0 * 30 * 25 * 35)
    assert(math.abs(out.last._6 - chi2Ref) < 1e-12)
    // independence sanity: a uniform table scores exactly zero
    val flat = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("r", "c")
    assert(ChiSquare.contingencyDF(flat, "r", "c")
      .agg(max(col("chi2_running"))).head.getDouble(0) == 0.0)
  }

  test("Cramér's V: perfect association gives 1, independence gives 0") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    assert(ChiSquare.cramersVDF(perfect, "r", "c")
      .select(col("v")).as[Double].head() == 1.0)
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("r", "c")
    assert(ChiSquare.cramersVDF(indep, "r", "c")
      .select(col("v")).as[Double].head() == 0.0)
  }
}
