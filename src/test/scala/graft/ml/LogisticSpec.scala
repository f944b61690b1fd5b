package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogisticSpec extends SparkSpec {
  import spark.implicits._

  test("saturated model reproduces the empirical cell rates exactly") {
    // one binary feature + intercept = 2 params = 2 cells: the MLE's
    // fitted probabilities must equal y/n per cell (saturated fit)
    val rows = Seq.fill(40)((0, 1)) ++ Seq.fill(60)((0, 0)) ++ // x=0: 40%
      Seq.fill(70)((1, 1)) ++ Seq.fill(30)((1, 0))             // x=1: 70%
    val df = rows.toDF("x", "y").repartition(5)
    val fit = Logistic.irlsFitCells(df, col("y") === 1, Seq("x" -> col("x")))
    assert(fit.converged)
    def p(x: Double) = 1.0 / (1.0 + math.exp(-(fit.beta(0) + fit.beta(1) * x)))
    assert(math.abs(p(0) - 0.4) < 1e-7)
    assert(math.abs(p(1) - 0.7) < 1e-7)
  }

  test("fit is bit-deterministic across partitionings") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(500)((rng.nextInt(2), rng.nextInt(3),
      if (rng.nextDouble() < 0.5) 1 else 0))
    val f1 = Logistic.irlsFitCells(rows.toDF("a", "b", "y").repartition(3),
      col("y") === 1, Seq("a" -> col("a"), "b" -> col("b")))
    val f2 = Logistic.irlsFitCells(rows.toDF("a", "b", "y").repartition(17),
      col("y") === 1, Seq("a" -> col("a"), "b" -> col("b")))
    assert(f1.beta.toSeq == f2.beta.toSeq)
  }

  test("two-feature fit matches a driver Newton reference") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(2000) {
      val a = rng.nextInt(2); val b = rng.nextInt(2)
      val eta = -0.5 + 1.2 * a - 0.8 * b
      (a, b, if (rng.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1 else 0)
    }
    val fit = Logistic.irlsFitCells(rows.toDF("a", "b", "y").repartition(9),
      col("y") === 1, Seq("a" -> col("a"), "b" -> col("b")))
    assert(fit.converged)
    // reference: cell rates → the saturated 2x2 design has 3 params for
    // 4 cells, so just sanity-check against plain per-cell log-odds
    // monotonicity and the gradient being ~0 at the fitted beta
    val cells = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(v => (v.size.toDouble, v.count(_._3 == 1).toDouble)).toMap
    val grad = new Array[Double](3)
    cells.foreach { case ((a, b), (n, y)) =>
      val eta = fit.beta(0) + fit.beta(1) * a + fit.beta(2) * b
      val mu = 1.0 / (1.0 + math.exp(-eta))
      val r = y - n * mu
      grad(0) += r; grad(1) += r * a; grad(2) += r * b
    }
    assert(grad.forall(g => math.abs(g) < 1e-5), grad.toSeq.toString)
  }

  test("complete separation stays finite via the ridge") {
    val rows = Seq.fill(50)((0, 0)) ++ Seq.fill(50)((1, 1))
    val fit = Logistic.irlsFitCells(rows.toDF("x", "y").toDF("x", "y"),
      col("y") === 1, Seq("x" -> col("x")), maxIter = 30)
    assert(fit.beta.forall(b => !b.isNaN && !b.isInfinite))
  }

  test("margin Column equals marginSql on the same frame") {
    val fit = Logistic.LogisticFit(Seq("a", "b"),
      Array(0.123456789, -1.5, 2.25), 1, converged = true)
    val df = Seq((0, 1), (1, 0), (1, 1)).toDF("a", "b")
    val viaCol = df.select(Logistic.margin(fit).as("m")).as[Double].collect()
    val viaSql = df.selectExpr(Logistic.marginSql(fit) + " AS m")
      .as[Double].collect()
    assert(viaCol.toSeq == viaSql.toSeq)
  }

  test("poisson: saturated model reproduces the empirical cell means") {
    // one binary feature + intercept = 2 params = 2 cells: the MLE's
    // fitted rate must equal y/n per cell
    val rows = Seq.fill(100)((0, 2)) ++ // x=0: mean count 2
      Seq.fill(50)((1, 5))              // x=1: mean count 5
    val df = rows.toDF("x", "c").repartition(5)
    val fit = Logistic.poissonFitCells(df, col("c"), Seq("x" -> col("x")))
    assert(fit.converged)
    assert(math.abs(math.exp(fit.beta(0)) - 2.0) < 1e-7)
    assert(math.abs(math.exp(fit.beta(0) + fit.beta(1)) - 5.0) < 1e-7)
  }

  test("poisson: fit is bit-deterministic across partitionings") {
    val rng = new scala.util.Random(13)
    val rows = Seq.fill(500)((rng.nextInt(2), rng.nextInt(3), rng.nextInt(9)))
    val f1 = Logistic.poissonFitCells(rows.toDF("a", "b", "c").repartition(3),
      col("c"), Seq("a" -> col("a"), "b" -> col("b")))
    val f2 = Logistic.poissonFitCells(rows.toDF("a", "b", "c").repartition(17),
      col("c"), Seq("a" -> col("a"), "b" -> col("b")))
    assert(f1.beta.toSeq == f2.beta.toSeq)
  }

  test("NULL labels and NULL features drop; cell cap trips loudly") {
    val df = Seq((Some(1), Some(1)), (None, Some(1)), (Some(0), None))
      .toDF("x", "y")
    val fit = Logistic.irlsFitCells(df, col("y") === 1,
      Seq("x" -> col("x")))
    assert(fit.beta.length == 2)
    val big = (1 to 100).map(i => (i, i % 2)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Logistic.irlsFitCells(big, col("y") === 1, Seq("x" -> col("x")),
        maxCells = 10)
    }
    assert(e.getMessage.contains("maxCells"))
  }
}
