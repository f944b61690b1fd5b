package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Least-squares gradient boosting with depth-1 stumps on the cell frame
  * (NOT-IN-REFERENCE §2.9 extension — the boosting sibling of the
  * reference's single decision tree, re-expressed as the r37/Poisson
  * bounded-driver-protocol: with binary/binned features the squared-error
  * objective depends on the data only through per-cell `(n, Σy)`, so ONE
  * map-side-combined `groupBy(features)` is the complete sufficient-
  * statistics reduction and every boosting round runs driver-side on the
  * cell frame — never on rows).
  *
  * Each round greedily picks the binary feature whose stump most reduces
  * the weighted residual SSE (ties break on the LOWEST feature index),
  * then updates per-cell scores with shrinkage-scaled leaf means.
  * Determinism: cells sort canonically before the fit, every
  * accumulation runs in that fixed order, and the fitted stumps export
  * as `Double.toString` literals — [[scoreColumn]]/[[scoreSql]] build
  * the IDENTICAL explicit left-to-right CASE chain in Spark and SQL, so
  * a relational replay of the scores hash-matches (the m4/r37
  * exported-artifact oracle doctrine). */
object GradientBoost {

  /** One stump on a BINARY feature: add `gamma0` where the feature is 0,
    * `gamma1` where it is 1 (shrinkage already applied). */
  case class Stump(feature: String, gamma0: Double, gamma1: Double)

  /** `f0` is the global target mean; stumps apply in order. */
  case class GbtFit(f0: Double, stumps: Seq[Stump])

  /** Fit `rounds` stumps on the cell frame of binary `features`
    * (each a boolean/0-1 expression). NULL target/feature rows drop. */
  def fitCells(df: DataFrame, target: Column,
      features: Seq[(String, Column)], rounds: Int = 4,
      shrinkage: Double = 0.5, maxCells: Int = 65536): GbtFit = {
    require(features.nonEmpty, "fitCells needs at least one feature")
    require(rounds >= 1, "need at least one boosting round")
    val sel = features.map { case (n, c) => c.cast("int").as(n) }
    val notNull = features.map(_._2.isNotNull).reduce(_ && _) &&
      target.isNotNull
    val raw = df.where(notNull)
      .groupBy(sel: _*)
      .agg(count(lit(1)).as("__n"),
        sum(target.cast("decimal(12,2)")).as("__y"))
      .limit(maxCells + 1).collect()
    require(raw.length <= maxCells,
      s"cell frame exceeds maxCells=$maxCells — bin the features coarser")
    require(raw.nonEmpty, "no non-null rows to fit on")
    val p = features.size
    import scala.math.Ordering.Implicits._
    val cells = raw.map { r =>
      (Array.tabulate(p)(i => r.getInt(i)),
        r.getLong(p).toDouble, r.getDecimal(p + 1).doubleValue)
    }.sortBy(_._1.toSeq)
    val totN = cells.map(_._2).sum
    val f0 = cells.map(_._3).sum / totN
    // per-cell current residual MEANS (r_c = ȳ_c − score_c)
    val res = cells.map { case (_, n, sy) => sy / n - f0 }
    val stumps = collection.mutable.ArrayBuffer[Stump]()
    var round = 0
    while (round < rounds) {
      var bestJ = -1; var bestSse = Double.MaxValue
      var bestG0 = 0.0; var bestG1 = 0.0
      var j = 0
      while (j < p) {
        var n0 = 0.0; var s0 = 0.0; var n1 = 0.0; var s1 = 0.0
        var c = 0
        while (c < cells.length) {
          val (x, n, _) = cells(c)
          if (x(j) == 0) { n0 += n; s0 += n * res(c) }
          else { n1 += n; s1 += n * res(c) }
          c += 1
        }
        val g0 = if (n0 > 0) s0 / n0 else 0.0
        val g1 = if (n1 > 0) s1 / n1 else 0.0
        var sse = 0.0
        c = 0
        while (c < cells.length) {
          val (x, n, _) = cells(c)
          val g = if (x(j) == 0) g0 else g1
          val d = res(c) - g
          sse += n * d * d
          c += 1
        }
        if (sse < bestSse - 1e-15) {
          bestSse = sse; bestJ = j; bestG0 = g0; bestG1 = g1
        }
        j += 1
      }
      val g0s = shrinkage * bestG0; val g1s = shrinkage * bestG1
      stumps += Stump(features(bestJ)._1, g0s, g1s)
      var c = 0
      while (c < cells.length) {
        res(c) -= (if (cells(c)._1(bestJ) == 0) g0s else g1s)
        c += 1
      }
      round += 1
    }
    GbtFit(f0, stumps.toSeq)
  }

  /** The boosted score as an EXPLICIT left-to-right chain of CASE terms
    * over the fit's own feature names. */
  def scoreColumn(fit: GbtFit): Column =
    fit.stumps.foldLeft(lit(fit.f0)) { (acc, s) =>
      acc + when(col(s.feature) === 1, lit(s.gamma1)).otherwise(lit(s.gamma0))
    }

  /** The identical chain as SQL text — every coefficient rides as
    * `CAST('<Double.toString>' AS DOUBLE)` (round-trip exact in both
    * engines; a bare literal would parse as DECIMAL and change the
    * arithmetic). */
  def scoreSql(fit: GbtFit): String =
    fit.stumps.foldLeft(s"CAST('${fit.f0}' AS DOUBLE)") { (acc, s) =>
      s"($acc + (CASE WHEN ${s.feature} = 1 " +
        s"THEN CAST('${s.gamma1}' AS DOUBLE) " +
        s"ELSE CAST('${s.gamma0}' AS DOUBLE) END))"
    }
}
