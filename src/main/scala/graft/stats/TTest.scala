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
}
