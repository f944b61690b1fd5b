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

  test("Cohen's kappa: perfect agreement 1, chance-level 0, textbook value") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(ChiSquare.cohenKappaDF(perfect, "a", "b").head().getDouble(3) == 1.0)
    // chance: a and b independent uniform → kappa 0
    val chance = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")).toDF("a", "b")
    assert(ChiSquare.cohenKappaDF(chance, "a", "b").head().getDouble(3) == 0.0)
    // textbook 2×2: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    val df = (Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))).toDF("a", "b")
      .repartition(3)
    val r = ChiSquare.cohenKappaDF(df, "a", "b").head()
    // n=50 agree=35 pe_num = 25*30 + 25*20 = 1250
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((50L, 35L, 1250L)))
    assert(math.abs(r.getDouble(3) - (50.0 * 35 - 1250) / (2500.0 - 1250)) < 1e-6)
  }

  test("mutual information: independence gives 0, identity gives full entropy") {
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("r", "c")
    val ri = ChiSquare.mutualInformationDF(indep, "r", "c").head()
    assert(ri.getDouble(1) == 0.0 && ri.getDouble(4) == 0.0)
    // identity mapping: MI = H_r = H_c = ln(2), NMI = 1
    val ident = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("r", "c")
    val rd = ChiSquare.mutualInformationDF(ident, "r", "c").head()
    assert(math.abs(rd.getDouble(1) - math.log(2)) < 1e-6)
    assert(math.abs(rd.getDouble(2) - math.log(2)) < 1e-6)
    assert(math.abs(rd.getDouble(4) - 1.0) < 1e-6)
  }

  test("mutual information: distributed equals the driver sweep on skewed data") {
    val rng = new scala.util.Random(53)
    val data = Seq.fill(4000) {
      val r = rng.nextInt(4)
      val c = if (rng.nextInt(3) == 0) r % 3 else rng.nextInt(3)
      (s"r$r", s"c$c")
    }
    val df = data.toDF("r", "c").repartition(7)
    val got = ChiSquare.mutualInformationDF(df, "r", "c").head()
    val n = data.size.toDouble
    val cellCounts = data.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val rCounts = data.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val cCounts = data.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val mi = cellCounts.map { case ((r, c), o) =>
      o / n * math.log(o * n / (rCounts(r) * cCounts(c))) }.sum
    val hr = rCounts.values.map(t => -t / n * math.log(t / n)).sum
    val hc = cCounts.values.map(t => -t / n * math.log(t / n)).sum
    assert(got.getLong(0) == 4000L)
    assert(math.abs(got.getDouble(1) - mi) < 1e-6)
    assert(math.abs(got.getDouble(2) - hr) < 1e-6)
    assert(math.abs(got.getDouble(3) - hc) < 1e-6)
    assert(math.abs(got.getDouble(4) - mi / math.sqrt(hr * hc)) < 1e-6)
  }

  test("featureInfoGainDF: perfect, independent, and per-feature NULLs") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(400) {
      val y = rng.nextInt(2)
      (s"y$y",                              // copy: IG = H(y)
        s"i${rng.nextInt(3)}",              // independent: IG ≈ 0
        if (rng.nextInt(10) == 0) None else Some(s"p$y"), // copy w/ nulls
        s"lab$y")
    }
    val df = rows.toDF("copy", "indep", "part", "y")
    val r = ChiSquare.featureInfoGainDF(df, col("y"),
        Seq("copy" -> col("copy"), "indep" -> col("indep"),
          "part" -> col("part")))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    // a feature that copies the label carries the label's full entropy
    assert(math.abs(r("copy")._3 - r("copy")._4) < 1e-6)
    assert(r("copy")._5 == 1.0)
    assert(r("copy")._2 == 400L)
    // independent feature: tiny IG, u_coef near 0
    assert(r("indep")._3 < 0.02 && r("indep")._5 < 0.02)
    // per-feature NULL drop: n reflects only the non-null rows
    assert(r("part")._2 == rows.count(_._3.isDefined).toLong)
    assert(r("part")._5 == 1.0)
  }

  test("featureInfoGainDF single feature equals mutualInformationDF") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(9)
    val df = Seq.fill(300)((s"x${rng.nextInt(4)}", s"y${rng.nextInt(3)}"))
      .toDF("x", "y").repartition(7)
    val a = ChiSquare.featureInfoGainDF(df, col("y"), Seq("x" -> col("x")))
      .select("info_gain").as[Double].head()
    val b = ChiSquare.mutualInformationDF(df, "x", "y")
      .select("mi").as[Double].head()
    assert(a == b)
  }

  test("fleissKappaDF: Fleiss hand case; wrong-m subjects excluded") {
    // m=3: s1 AAA (sq 9), s2 AAB (5), s3 BBB (9), s4 ABC (3); s5 has only
    // 2 ratings → excluded. ssq = 26, cat totals A=6 B=5 C=1 → c2 = 62.
    val df = Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "B"), (3L, "B"),
      (4L, "A"), (4L, "B"), (4L, "C"),
      (5L, "A"), (5L, "A"))
      .toDF("subj", "cat").repartition(5)
    val r = ChiSquare.fleissKappaDF(df, col("subj"), col("cat"), m = 3)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 == 4L && r._2 == 3L && r._3 == 26L && r._4 == 62L)
    // P̄ = 14/24, Pe = 62/144, κ = (P̄−Pe)/(1−Pe) ≈ 0.268293
    assert(r._5 == 0.583333 && r._6 == 0.430556)
    assert(math.abs(r._7 - 0.268293) < 1e-6, r.toString)
  }

  test("gTestDF: hand-computed 2x2 G; consistent with 2n·MI") {
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y")))
      .toDF("r", "c").repartition(6)
    val got = ChiSquare.gTestDF(df, "r", "c")
      .as[(Long, Long, Long, Double)].head()
    assert(got._1 == 100L && got._2 == 2L && got._3 == 2L)
    val expect = 2.0 * (10 * math.log(1000.0 / 1200) +
      20 * math.log(2000.0 / 1800) + 30 * math.log(3000.0 / 2800) +
      40 * math.log(4000.0 / 4200))
    assert(math.abs(got._4 - expect) < 1e-5, s"${got._4} vs $expect")
    // identity: G = 2n·MI (nats) on the same cells
    val mi = ChiSquare.mutualInformationDF(df, "r", "c")
      .select("mi").as[Double].head()
    assert(math.abs(got._4 - 2 * 100 * mi) < 1e-4)
  }

  test("fleissKappaDF: perfect agreement gives kappa 1") {
    val df = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"))
      .toDF("subj", "cat")
    val r = ChiSquare.fleissKappaDF(df, col("subj"), col("cat"), m = 2)
      .select("kappa").as[Double].head()
    assert(r == 1.0)
  }
}
