package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Welch's unequal-variance t-test (NOT-IN-REFERENCE §2.8 extension —
  * the parametric sibling of the reference's permutation test, which
  * compares the same two cohorts by resampling; reference cohort split:
  * `Hypothesis testing R.r:20-55`).
  *
  * Exactness discipline: the corpus reduces to SIX exact aggregates in
  * ONE map-side-combined pass (per-group n / Σx / Σx² with the value as
  * DECIMAL(12,2), so the power sums are order-independent integer-scaled
  * arithmetic — the q6 exact-moments doctrine), and every derived number
  * (means, variances, t, Welch–Satterthwaite df) is a fixed expression
  * tree over those six, so a relational replay reproduces each output
  * bit-for-bit before the final rounding.
  *
  * Scale shape: one aggregate, one output row — nothing else. */
object TTest {

  /** One row `(n_a, n_b, mean_a, mean_b, t, df)` — Welch's t statistic
    * for `valueCol` between the `isA` and NOT-`isA` cohorts (rows with a
    * NULL value or NULL flag drop, the two-sample convention). Sample
    * (n−1) variances; `t` positive when cohort A's mean is larger. */
  def welchDF(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val x = col(valueCol).cast("decimal(12,2)")
    val a = isA === lit(true)
    val agg = df.where(col(valueCol).isNotNull && isA.isNotNull)
      .agg(
        sum(when(a, 1L).otherwise(0L)).as("n_a"),
        sum(when(!a, 1L).otherwise(0L)).as("n_b"),
        sum(when(a, x).otherwise(lit(null))).as("sa0"),
        sum(when(!a, x).otherwise(lit(null))).as("sb0"),
        sum(when(a, x * x).otherwise(lit(null))).as("ssa0"),
        sum(when(!a, x * x).otherwise(lit(null))).as("ssb0"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val sa = col("sa0").cast("double"); val sb = col("sb0").cast("double")
    val ssa = col("ssa0").cast("double"); val ssb = col("ssb0").cast("double")
    val ma = sa / na; val mb = sb / nb
    val va = (ssa - sa * sa / na) / (na - lit(1.0))
    val vb = (ssb - sb * sb / nb) / (nb - lit(1.0))
    val sea = va / na; val seb = vb / nb
    val se2 = sea + seb
    agg.select(col("n_a"), col("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      round((ma - mb) / sqrt(se2), 6).as("t"),
      round(se2 * se2 /
        (sea * sea / (na - lit(1.0)) + seb * seb / (nb - lit(1.0))), 4).as("df"))
  }

  /** Pairwise Welch post-hoc with Bonferroni control — the step AFTER a
    * significant ANOVA (r23 says "the k means differ somewhere"; this
    * says WHERE). One corpus-sized groupBy to the per-group exact
    * DECIMAL power-sum frame, then a k(k−1)/2 inequality self-join on
    * that dimension-sized frame (deliberate loop-join shape) and the
    * [[welchDF]] trees per pair. `critZ` is the Bonferroni-adjusted
    * two-sided normal critical value z_{α/(2m)} — a JVM literal from
    * [[Normal.quantile]] identical in the SQL replay (with per-group n
    * in the thousands, t ≈ z to far beyond the decision margin).
    *
    * One row per pair `(g_a, g_b, n_a, n_b, mean_a, mean_b, t, df,
    * sig_bonf)` ordered by the pair key. */
  def pairwiseWelchDF(df: DataFrame, valueCol: String, groupCol: String,
      critZ: Double): DataFrame = {
    val x = col(valueCol).cast("decimal(12,2)")
    val cells = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n0"), sum(x).as("s0"), sum(x * x).as("ss0"))
    val a = cells.select(col("g").as("g_a"), col("n0").as("na0"),
      col("s0").as("sa0"), col("ss0").as("ssa0"))
    val b = cells.select(col("g").as("g_b"), col("n0").as("nb0"),
      col("s0").as("sb0"), col("ss0").as("ssb0"))
    val j = a.join(b, col("g_a") < col("g_b"))
    val na = col("na0").cast("double"); val nb = col("nb0").cast("double")
    val sa = col("sa0").cast("double"); val sb = col("sb0").cast("double")
    val ssa = col("ssa0").cast("double"); val ssb = col("ssb0").cast("double")
    val ma = sa / na; val mb = sb / nb
    val va = (ssa - sa * sa / na) / (na - lit(1.0))
    val vb = (ssb - sb * sb / nb) / (nb - lit(1.0))
    val sea = va / na; val seb = vb / nb
    val se2 = sea + seb
    val tStat = (ma - mb) / sqrt(se2)
    j.select(col("g_a"), col("g_b"),
      col("na0").as("n_a"), col("nb0").as("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      round(tStat, 6).as("t"),
      round(se2 * se2 /
        (sea * sea / (na - lit(1.0)) + seb * seb / (nb - lit(1.0))), 4).as("df"),
      (abs(tStat) > lit(critZ)).as("sig_bonf"))
      .orderBy(col("g_a"), col("g_b"))
  }

  /** Cohen's d and Hedges' g — the standardized effect sizes a bare
    * [[welchDF]] t can't convey (t grows with n; d doesn't). Same exact
    * DECIMAL power-sum aggregate, pooled-SD d, small-sample-corrected
    * g = d·(1 − 3/(4N − 9)). One row
    * `(n_a, n_b, mean_a, mean_b, sd_pooled, d, g)`. */
  def cohensDDF(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val x = col(valueCol).cast("decimal(12,2)")
    val a = isA === lit(true)
    val agg = df.where(col(valueCol).isNotNull && isA.isNotNull)
      .agg(
        sum(when(a, 1L).otherwise(0L)).as("n_a"),
        sum(when(!a, 1L).otherwise(0L)).as("n_b"),
        sum(when(a, x).otherwise(lit(null))).as("sa0"),
        sum(when(!a, x).otherwise(lit(null))).as("sb0"),
        sum(when(a, x * x).otherwise(lit(null))).as("ssa0"),
        sum(when(!a, x * x).otherwise(lit(null))).as("ssb0"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val sa = col("sa0").cast("double"); val sb = col("sb0").cast("double")
    val ssa = col("ssa0").cast("double"); val ssb = col("ssb0").cast("double")
    val ma = sa / na; val mb = sb / nb
    val ssqa = ssa - sa * sa / na // (n−1)·s² exactly
    val ssqb = ssb - sb * sb / nb
    val sp = sqrt((ssqa + ssqb) / (na + nb - lit(2.0)))
    val d = (ma - mb) / sp
    val g = d * (lit(1.0) - lit(3.0) /
      (lit(4.0) * (na + nb) - lit(9.0)))
    agg.select(col("n_a"), col("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      round(sp, 6).as("sd_pooled"), round(d, 6).as("d"),
      round(g, 6).as("g"))
  }

  /** Jarque–Bera normality statistic — the moment-based sanity check the
    * §2.8 parametric tests ([[welchDF]], ANOVA) implicitly assume.
    *
    * Exactness: values scale to CENT integers, the four raw power sums
    * accumulate as DECIMAL (cent⁴ stays far inside DECIMAL(38,0) for
    * money-ranged columns; order-independent integer arithmetic), and
    * the central moments, skewness, excess kurtosis, and JB statistic
    * are one fixed double tree over them — skew/kurtosis are
    * scale-invariant, so the cent scaling cancels exactly. One
    * map-side-combined pass, one row `(n, skew, kurt_excess, jb)`. */
  def jarqueBeraDF(df: DataFrame, valueCol: String): DataFrame = {
    val xc = (col(valueCol).cast("decimal(12,2)") * 100).cast("decimal(10,0)")
    val x2 = (xc * xc).cast("decimal(19,0)")
    val agg = df.where(col(valueCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(xc).as("s1d"), sum(x2).as("s2d"),
        sum(x2 * xc).as("s3d"), sum(x2 * x2).as("s4d"))
    val n = col("n").cast("double")
    val s1 = col("s1d").cast("double"); val s2 = col("s2d").cast("double")
    val s3 = col("s3d").cast("double"); val s4 = col("s4d").cast("double")
    val mu = s1 / n
    val m2 = s2 / n - mu * mu
    val m3 = s3 / n - lit(3.0) * mu * (s2 / n) + lit(2.0) * mu * mu * mu
    val m4 = s4 / n - lit(4.0) * mu * (s3 / n) +
      lit(6.0) * mu * mu * (s2 / n) - lit(3.0) * mu * mu * mu * mu
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurtEx = m4 / (m2 * m2) - lit(3.0)
    agg.select(col("n"),
      round(skew, 6).as("skew"),
      round(kurtEx, 6).as("kurt_excess"),
      round(n / lit(6.0) * (skew * skew + kurtEx * kurtEx / lit(4.0)), 4)
        .as("jb"))
  }

  /** Grubbs' extreme-outlier statistic per group:
    * `G = max(x_max − mean, mean − x_min) / s` — the single-most-extreme
    * sibling of the census outliers (q10 IQR, q18 MAD) that ties the
    * flagged point back to a parametric test statistic.
    *
    * Exactness: ONE map-side-combined pass collects per-group
    * `(n, Σx, Σx², max, min)` with DECIMAL(12,2) values (exact,
    * order-independent), then G is a fixed double tree — `greatest` of
    * two exact differences over the sample SD. One row per group ordered
    * by key: `(grp, n_g, mean_g, sd_g, x_max, x_min, g_stat)`. */
  def grubbsDF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(12,2)")
    val agg = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_g"), sum(x).as("s0"), sum(x * x).as("ss0"),
        max(x).as("mx0"), min(x).as("mn0"))
    val n = col("n_g").cast("double")
    val s = col("s0").cast("double"); val ss = col("ss0").cast("double")
    val mx = col("mx0").cast("double"); val mn = col("mn0").cast("double")
    val mean = s / n
    val sd = sqrt((ss - s * s / n) / (n - lit(1.0)))
    agg.select(col("grp"), col("n_g"),
      round(mean, 6).as("mean_g"), round(sd, 6).as("sd_g"),
      col("mx0").cast("double").as("x_max"),
      col("mn0").cast("double").as("x_min"),
      round(greatest(mx - mean, mean - mn) / sd, 6).as("g_stat"))
      .orderBy(col("grp"))
  }
}
