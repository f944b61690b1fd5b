package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (NOT-IN-REFERENCE §2.9
  * extension — the probabilistic VERIFY stage of an entity-resolution /
  * dedup pipeline: cheap blocking proposes candidate pairs, per-field
  * agreement patterns + an EM-fitted mixture dispose them into
  * match / possible / non-match classes; Fellegi & Sunter 1969,
  * Winkler 1988).
  *
  * Scale shape: the corpus-sized work is the candidate join (whatever
  * blocking produced it — here the [[Dedup.minHashMd5Pairs]] banded LSH
  * stream) plus ONE groupBy that reduces the pair stream to the
  * AGREEMENT-PATTERN frame — at most 2^k rows for k comparators. The EM
  * fit then runs driver-side on that bounded frame (the r37 IRLS
  * doctrine: canonical cell order, fixed iterations, exact-long counts —
  * bit-deterministic on any partitioning), and scoring is a per-pattern
  * projection of JVM-interpolated literals: every weight is a fixed
  * left-to-right sum of per-field log-ratio constants and every
  * posterior a fixed product/division tree — NO transcendentals in the
  * replay, so the whole query hash-matches relationally.
  */
object Linkage {

  /** An EM-fitted Fellegi–Sunter mixture: match prevalence `p`, per-field
    * match agreement probabilities `m(i)` and non-match (chance)
    * agreement probabilities `u(i)`. */
  case class FsFit(p: Double, m: Array[Double], u: Array[Double],
      iters: Int, converged: Boolean)

  /** Reduce a candidate-pair stream to the agreement-pattern frame: one
    * row per distinct pattern of the `comparators` booleans, with its
    * pair count `n` — ≤ 2^k rows regardless of corpus size (NULL
    * comparisons count as disagreement, the conservative FS convention). */
  def agreementPatternDF(pairs: DataFrame,
      comparators: Seq[(String, Column)]): DataFrame = {
    require(comparators.nonEmpty && comparators.size <= 16,
      s"1..16 comparators, got ${comparators.size}")
    val gs = comparators.map { case (nm, c) =>
      when(c, 1L).otherwise(0L).as(nm) }
    pairs.select(gs: _*)
      .groupBy(comparators.map(c => col(c._1)): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** EM fit of the two-class independent-Bernoulli mixture over the
    * pattern frame. Driver-side over the ≤ 2^k canonically-sorted cells
    * (exact-long counts ride in; every float op is a fixed-order driver
    * loop — bit-identical on any partitioning). Parameters clamp to
    * [1e-6, 1−1e-6] each step; init is `p = 0.1`, `m_i = 0.85`,
    * `u_i = clamp(overall agreement rate of field i)` — deterministic.
    * After convergence the MATCH class is canonicalized as the one with
    * the higher total agreement propensity (`Σm ≥ Σu`), so label
    * swapping can't flip the sign of the weights. */
  def emFit(patterns: DataFrame, fields: Seq[String],
      maxIter: Int = 500, tol: Double = 1e-13): FsFit = {
    val k = fields.size
    require(k >= 1 && k <= 16, s"1..16 fields, got $k")
    val raw = patterns
      .select((fields.map(col) :+ col("n")): _*)
      .limit((1 << k) + 1).collect()
    require(raw.length <= (1 << k),
      s"pattern frame exceeds 2^$k rows — comparator columns must be 0/1")
    require(raw.nonEmpty, "no candidate pairs to fit on")
    // canonical cell order: pattern bits as a binary string
    val cells = raw.map { r =>
      (Array.tabulate(k)(i => r.getLong(i)), r.getLong(k))
    }.sortBy(_._1.mkString)
    val total = cells.map(_._2).sum.toDouble

    def clamp(x: Double): Double = math.min(1.0 - 1e-6, math.max(1e-6, x))
    var p = 0.1
    val m = Array.fill(k)(0.85)
    val u = Array.tabulate(k) { i =>
      clamp(cells.map { case (g, n) => g(i) * n }.sum.toDouble / total)
    }
    var iters = 0; var converged = false
    while (iters < maxIter && !converged) {
      var delta = 0.0
      // E-step: per-cell match responsibility (fixed product order)
      val w = cells.map { case (g, _) =>
        var pm = p; var pu = 1.0 - p
        var i = 0
        while (i < k) {
          pm *= (if (g(i) == 1L) m(i) else 1.0 - m(i))
          pu *= (if (g(i) == 1L) u(i) else 1.0 - u(i))
          i += 1
        }
        pm / (pm + pu)
      }
      // M-step
      var sw = 0.0; var swu = 0.0
      val sm = new Array[Double](k); val su = new Array[Double](k)
      cells.indices.foreach { j =>
        val (g, n) = cells(j); val nj = n.toDouble
        sw += nj * w(j); swu += nj * (1.0 - w(j))
        var i = 0
        while (i < k) {
          if (g(i) == 1L) { sm(i) += nj * w(j); su(i) += nj * (1.0 - w(j)) }
          i += 1
        }
      }
      val pNew = clamp(sw / total)
      delta = math.abs(pNew - p); p = pNew
      var i = 0
      while (i < k) {
        val mNew = clamp(if (sw > 0.0) sm(i) / sw else m(i))
        val uNew = clamp(if (swu > 0.0) su(i) / swu else u(i))
        delta = math.max(delta, math.max(math.abs(mNew - m(i)), math.abs(uNew - u(i))))
        m(i) = mNew; u(i) = uNew
        i += 1
      }
      iters += 1
      if (delta < tol) converged = true
    }
    // canonicalize: the match class has the higher agreement propensity
    if (m.sum < u.sum) {
      var i = 0
      while (i < k) { val t = m(i); m(i) = u(i); u(i) = t; i += 1 }
      p = 1.0 - p
    }
    FsFit(p, m, u, iters, converged)
  }

  /** Per-pattern FS scores at a FITTED (exported) parameter set: the
    * log-likelihood-ratio `weight` (a fixed left-to-right sum of
    * JVM-computed per-field constants — `ln` never evaluates in-engine),
    * the match `posterior` (a fixed literal product/division tree), and
    * the three-way `decision` at the given posterior thresholds. Output
    * `(fields..., n, weight, posterior, decision)` ordered by the
    * pattern bits. */
  def scoreDF(patterns: DataFrame, fields: Seq[String], fit: FsFit,
      upper: Double = 0.9, lower: Double = 0.1): DataFrame = {
    val k = fields.size
    require(fit.m.length == k && fit.u.length == k)
    val weight = fields.zipWithIndex.map { case (f, i) =>
      when(col(f) === 1L, lit(math.log(fit.m(i) / fit.u(i))))
        .otherwise(lit(math.log((1.0 - fit.m(i)) / (1.0 - fit.u(i)))))
    }.reduceLeft(_ + _)
    val pm = fields.zipWithIndex.foldLeft(lit(fit.p): Column) { case (acc, (f, i)) =>
      acc * when(col(f) === 1L, lit(fit.m(i))).otherwise(lit(1.0 - fit.m(i)))
    }
    val pu = fields.zipWithIndex.foldLeft(lit(1.0 - fit.p): Column) { case (acc, (f, i)) =>
      acc * when(col(f) === 1L, lit(fit.u(i))).otherwise(lit(1.0 - fit.u(i)))
    }
    val posterior = pm / (pm + pu)
    patterns
      .withColumn("weight", round(weight, 6))
      .withColumn("posterior", round(posterior, 6))
      .withColumn("decision",
        when(posterior >= upper, lit("match"))
          .when(posterior >= lower, lit("possible"))
          .otherwise(lit("non_match")))
      .orderBy(fields.map(col): _*)
  }
}
