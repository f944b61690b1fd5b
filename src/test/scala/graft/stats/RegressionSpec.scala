package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("olsSimpleDF: hand-computed fit; NULLs drop; layout-proof") {
    val pts = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 5.0))
    val df = (pts.map { case (x, y) => (Some(x), Some(y)) } ++
      Seq((None, Some(9.0)), (Some(9.0), None)))
      .toDF("x", "y").repartition(3)
    val r = Regression.olsSimpleDF(df, col("x"), col("y"))
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    // closed form over the raw points
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val cxy = n * sxy - sx * sy; val cxx = n * sxx - sx * sx
    val cyy = n * syy - sy * sy
    val slope = cxy / cxx
    assert(r._1 == 4L)
    assert(math.abs(r._2 - slope) < 1e-6)
    assert(math.abs(r._3 - (sy / n - slope * sx / n)) < 1e-6)
    assert(math.abs(r._4 - cxy * cxy / (cxx * cyy)) < 1e-6)
    assert(math.abs(r._5 - math.sqrt((cyy - slope * cxy) / (n * (n - 2)))) < 1e-6)
    // bit-identical on a different layout (exact sums → same fixed tree)
    val r1 = Regression.olsSimpleDF(df.repartition(1), col("x"), col("y"))
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(r1 == r)
  }

  test("durbinWatsonDailyDF: hand series (mean cancels in the lag diffs)") {
    val df = Seq(
      ("2024-01-01", 1.0), ("2024-01-02", 2.0),
      ("2024-01-03", 3.0), ("2024-01-04", 2.0),
      // two rows on one day aggregate before differencing
      ("2024-01-02", 0.0)).toDF("d", "x")
      .select(to_date(col("d")).as("d"), col("x")).repartition(2)
    val r = Regression.durbinWatsonDailyDF(df, col("d"), col("x"))
      .as[(Long, Double, Double)].head()
    // daily cents: 100, 200, 300, 200 → diffs 100, 100, -100
    // num = 30000; n·Σc² − S² = 4·180000 − 640000 = 80000 → DW = 1.5
    assert(r._1 == 4L)
    assert(r._2 == 2.0)   // mean daily = 800 / (100·4)
    assert(r._3 == 1.5)
  }

  test("olsFitMulti + olsSummaryDF: exact-plane recovery; layout-proof") {
    // y = 1 + 2·x0 + 3·x1 exactly → β recovered, SSE ~ 0, r2 = 1
    val pts = Seq((1.0, 1.0, 6.0), (2.0, 1.0, 8.0), (1.0, 2.0, 9.0),
      (3.0, 2.0, 13.0), (2.0, 3.0, 14.0))
    val df = (pts.map { case (a, b, y) => (Some(a), Some(b), Some(y)) } ++
      Seq((None, Some(1.0), Some(2.0)), (Some(1.0), Some(1.0), None)))
      .toDF("x0", "x1", "y").repartition(3)
    val xs = Seq[(String, org.apache.spark.sql.Column)](
      "x0" -> col("x0"), "x1" -> col("x1"))
    val fit = Regression.olsFitMulti(df, col("y"), xs)
    assert(math.abs(fit.beta(0) - 1.0) < 1e-9)
    assert(math.abs(fit.beta(1) - 2.0) < 1e-9)
    assert(math.abs(fit.beta(2) - 3.0) < 1e-9)
    val s = Regression.olsSummaryDF(
      Regression.olsMoments(df, col("y"), xs), fit.beta)
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(s._1 == 5L)
    assert(math.abs(s._5) < 1e-9)  // sse
    assert(s._6 == 1.0)            // r2 rounds to exactly 1
    // β is a pure function of the data multiset: layout-proof
    val fit1 = Regression.olsFitMulti(df.repartition(1), col("y"), xs)
    assert(fit1.beta.toSeq == fit.beta.toSeq)
  }

  test("nestedSseExpr: sub-model SSE off the FULL moment frame matches its own fit") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 240).map { i =>
      val a = i % 3; val b = i % 2
      val y = 10.0 + 3.0 * a + 5.0 * b + (if (a == 1 && b == 1) 4.0 else 0.0) +
        ((i % 7) - 3) * 0.25
      (y, a, b)
    }
    val df = rows.toDF("y", "a", "b").repartition(5)
    val xsA = Seq("a1" -> (col("a") === 1).cast("int"),
      "a2" -> (col("a") === 2).cast("int"))
    val xsB = Seq("b1" -> (col("b") === 1).cast("int"))
    val xsAB = Seq("a1b1" -> ((col("a") === 1).cast("int") * (col("b") === 1).cast("int")),
      "a2b1" -> ((col("a") === 2).cast("int") * (col("b") === 1).cast("int")))
    val full = xsA ++ xsB ++ xsAB
    val fitA = Regression.olsFitMulti(df, col("y"), xsA)
    val fitF = Regression.olsFitMulti(df, col("y"), full)
    val moFull = Regression.olsMoments(df, col("y"), full)
    // sub-model SSE via the full frame == the same β's SSE via its OWN frame
    val sseSub = moFull.select(
      Regression.nestedSseExpr(fitA.beta, 0 until 2).as("s")).head().getDouble(0)
    val moA = Regression.olsMoments(df, col("y"), xsA)
    val sseOwn = Regression.olsSummaryDF(moA, fitA.beta)
      .select(col("sse")).head().getDouble(0)
    assert(math.abs(sseSub - sseOwn) < 1e-6 * math.max(1.0, sseOwn), s"$sseSub vs $sseOwn")
    // nesting: more covariates never fit worse; the full model nails the
    // structure up to the periodic noise term
    val sseF = moFull.select(
      Regression.nestedSseExpr(fitF.beta, 0 until 5).as("s")).head().getDouble(0)
    assert(sseF <= sseSub + 1e-9)
    // fit-from-full-row is BIT-identical to a dedicated sub-model pass
    val fitA2 = Regression.olsFitFromMomentsRow(moFull.head(),
      xsA.map(_._1), 0 until 2)
    assert(fitA2.beta.toSeq == fitA.beta.toSeq)
    val fitF2 = Regression.olsFitFromMomentsRow(moFull.head(),
      full.map(_._1), 0 until 5)
    assert(fitF2.beta.toSeq == fitF.beta.toSeq)
    intercept[IllegalArgumentException](
      Regression.nestedSseExpr(fitA.beta, 0 until 3))
  }

  test("ridgeFitMulti: λ=0 is OLS; λ>0 shrinks slopes, not the intercept") {
    val pts = Seq((1.0, 1.0, 6.0), (2.0, 1.0, 8.0), (1.0, 2.0, 9.0),
      (3.0, 2.0, 13.0), (2.0, 3.0, 14.0))
    val df = pts.toDF("x0", "x1", "y").repartition(2)
    val xs = Seq[(String, org.apache.spark.sql.Column)](
      "x0" -> col("x0"), "x1" -> col("x1"))
    val ols = Regression.olsFitMulti(df, col("y"), xs)
    val r0 = Regression.ridgeFitMulti(df, col("y"), xs, lambda = 0.0)
    assert(r0.beta.toSeq == ols.beta.toSeq)
    val r = Regression.ridgeFitMulti(df, col("y"), xs, lambda = 5.0)
    // slopes shrink toward zero relative to OLS (both positive here)
    assert(r.beta(1) < ols.beta(1) && r.beta(1) > 0)
    assert(r.beta(2) < ols.beta(2) && r.beta(2) > 0)
    // hand-check against a direct penalized normal-equations solve
    val n = pts.size.toDouble
    val s0 = pts.map(_._1).sum; val s1 = pts.map(_._2).sum
    val s00 = pts.map(p => p._1 * p._1).sum
    val s01 = pts.map(p => p._1 * p._2).sum
    val s11 = pts.map(p => p._2 * p._2).sum
    val sy = pts.map(_._3).sum
    val s0y = pts.map(p => p._1 * p._3).sum
    val s1y = pts.map(p => p._2 * p._3).sum
    val a = Array(
      Array(n, s0, s1),
      Array(s0, s00 + 5.0, s01),
      Array(s1, s01, s11 + 5.0))
    val expect = graft.ml.Logistic.solve(a, Array(sy, s0y, s1y))
    assert(r.beta.zip(expect).forall { case (u, v) => math.abs(u - v) < 1e-9 })
    // layout-proof
    val r1 = Regression.ridgeFitMulti(df.repartition(1), col("y"), xs, 5.0)
    assert(r1.beta.toSeq == r.beta.toSeq)
  }

  test("Breusch–Pagan: saturated hand case has R²=1, LM = n") {
    // x=0: y ∈ {1,3} → mean 2, e² = 1,1; x=1: y ∈ {0,8} → mean 4, e² = 16,16
    // e² constant within cells → aux SSE = 0 → R² = 1 → LM = n = 4
    val df = Seq((0, 1L), (0, 3L), (1, 0L), (1, 8L)).toDF("x", "y")
      .repartition(3)
    val xs = Seq[(String, org.apache.spark.sql.Column)]("x" -> (col("x") === 1))
    val cells = Regression.bpCellsDF(df, col("y"), xs)
    val fit = Regression.bpFit(cells, 1)
    assert(math.abs(fit.beta(0) - 2.0) < 1e-9)
    assert(math.abs(fit.beta(1) - 2.0) < 1e-9) // mean diff 4 − 2
    assert(math.abs(fit.gamma(0) - 1.0) < 1e-9)  // mean e² | x=0
    assert(math.abs(fit.gamma(1) - 15.0) < 1e-9) // 16 − 1
    val rows = Regression.bpSummaryDF(cells, Seq("x"), fit)
      .select("x", "n", "u2", "bp_running")
      .as[(Int, Long, Double, Option[Double])].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0, 2L, 2.0), (1, 2L, 32.0)))
    // first chain row: single-cell TSS = 0 → NULL (both engines' ÷0)
    assert(rows.head._4.isEmpty)
    assert(math.abs(rows.last._4.get - 4.0) < 1e-9) // LM = n·R² = 4·1
  }

  test("Breusch–Pagan matches a row-level driver replay on random cells") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(120)((rnd.nextInt(2), rnd.nextInt(2),
      (1 + rnd.nextInt(9)).toLong))
    val df = rows.toDF("a", "b", "y").repartition(4)
    val xs = Seq[(String, org.apache.spark.sql.Column)](
      "a" -> (col("a") === 1), "b" -> (col("b") === 1))
    val cells = Regression.bpCellsDF(df, col("y"), xs)
    val fit = Regression.bpFit(cells, 2)
    val lm = Regression.bpSummaryDF(cells, Seq("a", "b"), fit)
      .select("bp_running").as[Double].collect().last
    // driver replay over RAW rows
    def x(r: (Int, Int, Long), i: Int) =
      if (i == 0) 1.0 else if (i == 1) r._1.toDouble else r._2.toDouble
    val a = Array.tabulate(3, 3)((i, j) => rows.map(r => x(r, i) * x(r, j)).sum)
    val bv = Array.tabulate(3)(i => rows.map(r => r._3 * x(r, i)).sum)
    val beta = graft.ml.Logistic.solve(a.map(_.clone()), bv)
    val e2 = rows.map(r => {
      val e = r._3 - (beta(0) + beta(1) * r._1 + beta(2) * r._2); e * e
    })
    val gv = Array.tabulate(3)(i => rows.zip(e2).map { case (r, u) => u * x(r, i) }.sum)
    val gamma = graft.ml.Logistic.solve(a.map(_.clone()), gv)
    val ghat = rows.map(r => gamma(0) + gamma(1) * r._1 + gamma(2) * r._2)
    val sse = e2.zip(ghat).map { case (u, g) => (u - g) * (u - g) }.sum
    val mean = e2.sum / e2.size
    val tss = e2.map(u => (u - mean) * (u - mean)).sum
    val expect = e2.size * (1.0 - sse / tss)
    assert(math.abs(lm - expect) < 1e-6, s"lm $lm vs driver $expect")
  }

  test("partialCorrDF: closed form matches a driver replay; layout-proof") {
    val pts = Seq((1.0, 2.0, 1.0), (2.0, 1.0, 2.0), (3.0, 4.0, 3.0),
      (4.0, 3.0, 4.0), (5.0, 6.0, 4.0), (6.0, 5.0, 6.0))
    val df = pts.toDF("x", "y", "z").repartition(3)
    val r = Regression.partialCorrDF(df, col("x"), col("y"), col("z"))
      .as[(Long, Double, Double, Double, Double)].head()
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val sa = a.sum; val sb = b.sum
      val saa = a.map(v => v * v).sum; val sbb = b.map(v => v * v).sum
      val sab = a.zip(b).map { case (u, v) => u * v }.sum
      (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    val (xs, ys, zs) = (pts.map(_._1), pts.map(_._2), pts.map(_._3))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val pcor = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    assert(r._1 == 6L)
    assert(math.abs(r._2 - rxy) < 1e-6)
    assert(math.abs(r._3 - rxz) < 1e-6)
    assert(math.abs(r._4 - ryz) < 1e-6)
    assert(math.abs(r._5 - pcor) < 1e-6)
    val r1 = Regression.partialCorrDF(df.repartition(1),
      col("x"), col("y"), col("z"))
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r1 == r)
  }

  test("crossCorrDailyDF: perfect linear alignment at lag 1") {
    val dx = Seq(("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 3.0),
      ("2024-01-04", 4.0), ("2024-01-05", 5.0)).toDF("d", "x")
      .select(to_date(col("d")).as("d"), col("x"))
    // y_{d+1} = 2·x_d exactly; y misaligned at lag 0 (quadratic in day)
    val dy = Seq(("2024-01-02", 2.0), ("2024-01-03", 4.0), ("2024-01-04", 6.0),
      ("2024-01-05", 8.0), ("2024-01-06", 10.0)).toDF("d", "y")
      .select(to_date(col("d")).as("d"), col("y"))
    val r = Regression.crossCorrDailyDF(dx, col("d"), col("x"),
      dy, col("d"), col("y"), maxLag = 2)
      .as[(Long, Long, Double)].collect()
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_._2).toSeq == Seq(4L, 5L, 4L)) // overlap days per lag
    assert(r(1)._3 == 1.0)                        // exact at the true lag
    // lag 0/2 are also linear on the overlap here — spot-check magnitude
    assert(r(0)._3 == 1.0 && r(2)._3 == 1.0)
  }
}
