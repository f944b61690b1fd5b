package graft.stats

/** Cost-optimal ROC threshold (SURVEY §2.8 R6): the reference calls
  * `ThresholdROC::thres2(k1, k2, rho)` with default settings
  * (`Hypothesis testing R.r:566-574`) to pick SUV/TBR cutoffs.
  *
  * `thres2`'s default method is the two-state equal-variance binormal
  * estimator (Skaltsa et al. 2010, Biom. J.): with sample means m1 (k1,
  * non-diseased), m2 (k2, diseased), pooled SD s, prevalence ρ and default
  * costs, the threshold solves
  *     c* = (m1 + m2)/2 + s² · ln(R) / (m2 − m1),   R = (1 − ρ)/ρ.
  * Also provided: a nonparametric sweep maximizing cost-weighted Youden for
  * when normality clearly fails.
  */
object Roc {

  /** Equal-variance binormal threshold. Estimator semantics: k1 =
    * non-diseased sample, k2 = diseased sample, rho = disease prevalence.
    * NOTE the reference calls `thres2(trueOnes, falseOnes, 0.01)` — i.e.
    * STUDY (diseased) cohort in the k1 position
    * (`Hypothesis testing R.r:572-573`); `MedicalPipeline.statsStage`
    * mirrors that call order for behavioral parity, which flips the sign of
    * the s²·ln(R)/(m2−m1) correction relative to the estimator's intended
    * usage. Independent callers (e.g. the r4 query) should pass
    * non-diseased first. */
  def thres2Equal(k1: Array[Double], k2: Array[Double], rho: Double): Double = {
    require(k1.length > 1 && k2.length > 1, "need ≥2 observations per group")
    val m1 = mean(k1); val m2 = mean(k2)
    val s2 = (sumSq(k1, m1) + sumSq(k2, m2)) / (k1.length + k2.length - 2)
    val r = (1 - rho) / rho
    (m1 + m2) / 2 + s2 * math.log(r) / (m2 - m1)
  }

  /** Nonparametric alternative: sweep candidate cutoffs (midpoints of sorted
    * pooled values), minimize ρ·(1−sens) + (1−ρ)·(1−spec). Sorted arrays +
    * binary search per candidate — O(n log n) total; the naive per-candidate
    * recount is O(n²) and dominates wall time from a few thousand values. */
  def empiricalThreshold(nonDiseased: Array[Double], diseased: Array[Double],
      rho: Double): Double = {
    val nd = nonDiseased.sorted
    val dz = diseased.sorted
    val cuts = (nd ++ dz).distinct.sorted
    if (cuts.length < 2) return cuts.head // all values identical: degenerate cut
    def countGE(a: Array[Double], c: Double): Int = {
      var lo = 0; var hi = a.length
      while (lo < hi) { val mid = (lo + hi) >>> 1; if (a(mid) < c) lo = mid + 1 else hi = mid }
      a.length - lo
    }
    cuts.sliding(2).map { p => (p(0) + p(1)) / 2 }.minBy { c =>
      val sens = countGE(dz, c).toDouble / dz.length
      val spec = (nd.length - countGE(nd, c)).toDouble / nd.length
      rho * (1 - sens) + (1 - rho) * (1 - spec)
    }
  }

  private def mean(a: Array[Double]): Double = a.sum / a.length
  private def sumSq(a: Array[Double], m: Double): Double =
    a.map(v => (v - m) * (v - m)).sum
}
