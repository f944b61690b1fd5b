package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Logistic regression via IRLS on the grouped CELL frame
  * (NOT-IN-REFERENCE §2.9 extension — the classification sibling of the
  * reference's tree fits, re-expressed as a bounded driver protocol).
  *
  * With categorical/binned features the binomial likelihood factors over
  * the DISTINCT feature combinations, so the corpus reduces to one
  * map-side-combined `groupBy(features).agg(n, y)` — the IRLS loop then
  * runs driver-side on the cell frame (bounded by the feature-cardinality
  * product, `require`-capped), never on rows. This is EXACT maximum
  * likelihood, not an approximation: grouping Bernoulli rows with equal
  * covariates into binomial cells leaves the likelihood unchanged.
  *
  * Determinism: cells are canonically sorted before every accumulation,
  * the Newton solve is Gaussian elimination with partial pivoting over a
  * fixed index order, and a fixed 1e-9 ridge keeps separable data finite
  * — the fitted β is a pure function of the cell multiset, bit-identical
  * on any partitioning. The coefficients export as `Double.toString`
  * literals (round-trip exact), and [[margin]]/[[marginSql]] build the
  * IDENTICAL explicit left-to-right linear chain in Spark and SQL, so a
  * relational replay of the scores hash-matches (the m4/m5
  * exported-artifact oracle doctrine). */
object Logistic {

  /** `names` are feature column names; `beta` is (intercept +: names). */
  case class LogisticFit(names: Seq[String], beta: Array[Double],
      iters: Int, converged: Boolean)

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Fit on the cell frame of `features` (each a 0/1-or-small-int
    * expression). Rows with a NULL label or NULL feature drop. */
  def irlsFitCells(df: DataFrame, label: Column,
      features: Seq[(String, Column)], maxCells: Int = 65536,
      maxIter: Int = 50, tol: Double = 1e-12): LogisticFit = {
    require(features.nonEmpty, "irlsFitCells needs at least one feature")
    val sel = features.map { case (n, c) => c.cast("int").as(n) }
    val notNull = features.map(_._2.isNotNull).reduce(_ && _) &&
      label.isNotNull
    val cellsDF = df.where(notNull)
      .groupBy(sel: _*)
      .agg(count(lit(1)).as("__n"), sum(label.cast("int")).as("__y"))
    val raw = cellsDF.limit(maxCells + 1).collect()
    require(raw.length <= maxCells,
      s"cell frame exceeds maxCells=$maxCells — bin the features coarser")
    require(raw.nonEmpty, "no non-null rows to fit on")
    val p = features.size
    // canonical order: the fit is a function of the cell MULTISET
    import scala.math.Ordering.Implicits._
    val cells = raw.map { r =>
      (Array.tabulate(p)(i => r.getInt(i).toDouble),
        r.getLong(p).toDouble, r.getLong(p + 1).toDouble)
    }.sortBy(_._1.toSeq)
    val dim = p + 1
    val beta = new Array[Double](dim)
    var iters = 0; var converged = false
    while (iters < maxIter && !converged) {
      val g = new Array[Double](dim)
      val h = Array.ofDim[Double](dim, dim)
      cells.foreach { case (x, n, y) =>
        var eta = beta(0)
        var i = 0
        while (i < p) { eta += beta(i + 1) * x(i); i += 1 }
        val mu = sigmoid(eta)
        val w = n * mu * (1.0 - mu)
        val r = y - n * mu
        def xi(j: Int): Double = if (j == 0) 1.0 else x(j - 1)
        var a = 0
        while (a < dim) {
          g(a) += r * xi(a)
          var b = 0
          while (b < dim) { h(a)(b) += w * xi(a) * xi(b); b += 1 }
          a += 1
        }
      }
      // fixed ridge: keeps separated cells finite and the solve stable
      var d = 0
      while (d < dim) { h(d)(d) += 1e-9; d += 1 }
      val delta = solve(h, g)
      var j = 0; var maxStep = 0.0
      while (j < dim) {
        beta(j) += delta(j)
        maxStep = math.max(maxStep, math.abs(delta(j))); j += 1
      }
      iters += 1
      if (maxStep < tol) converged = true
    }
    LogisticFit(features.map(_._1), beta, iters, converged)
  }

  /** Poisson log-linear regression via Newton on the SAME cell frame
    * (counts ~ categorical/binned covariates). The Poisson likelihood
    * also factors over distinct covariate combinations: a cell with n
    * rows and total count y contributes gradient `(y − n·e^η)·x` and
    * Hessian `n·e^η·x x'` — so one `groupBy(features).agg(n, Σy)` is the
    * full sufficient-statistics reduction and the loop never sees rows.
    * Same determinism contract as [[irlsFitCells]]: canonical cell sort,
    * partial-pivot solve, fixed 1e-9 ridge; reuses [[LogisticFit]] so
    * [[margin]]/[[marginSql]] replay η = log μ relationally. */
  def poissonFitCells(df: DataFrame, countCol: Column,
      features: Seq[(String, Column)], maxCells: Int = 65536,
      maxIter: Int = 50, tol: Double = 1e-12): LogisticFit = {
    require(features.nonEmpty, "poissonFitCells needs at least one feature")
    val sel = features.map { case (n, c) => c.cast("int").as(n) }
    val notNull = features.map(_._2.isNotNull).reduce(_ && _) &&
      countCol.isNotNull
    val cellsDF = df.where(notNull)
      .groupBy(sel: _*)
      .agg(count(lit(1)).as("__n"), sum(countCol.cast("long")).as("__y"))
    val raw = cellsDF.limit(maxCells + 1).collect()
    require(raw.length <= maxCells,
      s"cell frame exceeds maxCells=$maxCells — bin the features coarser")
    require(raw.nonEmpty, "no non-null rows to fit on")
    val p = features.size
    import scala.math.Ordering.Implicits._
    val cells = raw.map { r =>
      (Array.tabulate(p)(i => r.getInt(i).toDouble),
        r.getLong(p).toDouble, r.getLong(p + 1).toDouble)
    }.sortBy(_._1.toSeq)
    val dim = p + 1
    val beta = new Array[Double](dim)
    // start at the empty-model MLE: β0 = ln(Σy / Σn) — keeps e^η sane
    val totN = cells.map(_._2).sum; val totY = cells.map(_._3).sum
    require(totY > 0.0, "Poisson fit needs a positive total count")
    beta(0) = math.log(totY / totN)
    var iters = 0; var converged = false
    while (iters < maxIter && !converged) {
      val g = new Array[Double](dim)
      val h = Array.ofDim[Double](dim, dim)
      cells.foreach { case (x, n, y) =>
        var eta = beta(0)
        var i = 0
        while (i < p) { eta += beta(i + 1) * x(i); i += 1 }
        val mu = n * math.exp(eta)
        val r = y - mu
        def xi(j: Int): Double = if (j == 0) 1.0 else x(j - 1)
        var a = 0
        while (a < dim) {
          g(a) += r * xi(a)
          var b = 0
          while (b < dim) { h(a)(b) += mu * xi(a) * xi(b); b += 1 }
          a += 1
        }
      }
      var d = 0
      while (d < dim) { h(d)(d) += 1e-9; d += 1 }
      val delta = solve(h, g)
      var j = 0; var maxStep = 0.0
      while (j < dim) {
        beta(j) += delta(j)
        maxStep = math.max(maxStep, math.abs(delta(j))); j += 1
      }
      iters += 1
      if (maxStep < tol) converged = true
    }
    LogisticFit(features.map(_._1), beta, iters, converged)
  }

  /** Gaussian elimination with partial pivoting — deterministic over the
    * fixed index order; mutates copies only. Shared with the OLS normal-
    * equation solve ([[graft.stats.Regression.olsFitMulti]]). */
  private[graft] def solve(hIn: Array[Array[Double]], gIn: Array[Double]): Array[Double] = {
    val n = gIn.length
    val a = Array.tabulate(n, n)((i, j) => hIn(i)(j))
    val b = gIn.clone()
    var col = 0
    while (col < n) {
      var piv = col; var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < n) {
        if (math.abs(a(r)(col)) > best) { best = math.abs(a(r)(col)); piv = r }
        r += 1
      }
      require(best > 0.0, "singular IRLS Hessian despite ridge")
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      var r2 = col + 1
      while (r2 < n) {
        val f = a(r2)(col) / a(col)(col)
        var c2 = col
        while (c2 < n) { a(r2)(c2) -= f * a(col)(c2); c2 += 1 }
        b(r2) -= f * b(col)
        r2 += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** The linear predictor η as an EXPLICIT left-to-right chain over the
    * fit's own feature names — `((β0 + β1·x1) + β2·x2) + …`. */
  def margin(fit: LogisticFit): Column =
    fit.names.zipWithIndex.foldLeft(lit(fit.beta(0))) { case (acc, (n, i)) =>
      acc + lit(fit.beta(i + 1)) * col(n).cast("double")
    }

  /** The identical chain as SQL text (Double.toString round-trips). */
  def marginSql(fit: LogisticFit): String =
    fit.names.zipWithIndex.foldLeft(s"(${fit.beta(0)})") { case (acc, (n, i)) =>
      s"($acc + (${fit.beta(i + 1)}) * CAST($n AS DOUBLE))"
    }
}
