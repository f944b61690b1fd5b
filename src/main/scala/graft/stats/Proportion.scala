package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Proportion estimation (NOT-IN-REFERENCE §2.8 extension — the interval
  * the reference's rate tables imply but never compute). */
object Proportion {

  /** z for a central 95% normal interval — interpolated as the SAME JVM
    * literal into the SQL replay (the NOTES_r2 libm doctrine). */
  val z95: Double = 1.959963984540054

  /** Wilson score 95% confidence interval per group — the
    * small-and-skewed-safe replacement for the Wald interval (never
    * leaves [0,1], behaves at y=0/y=n).
    *
    * One map-side-combined groupBy to (n, y) per group; the interval is
    * ONE fixed double tree per group row —
    * `center = (p̂ + z²/2n) / (1 + z²/n)`,
    * `half = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)` — built identically
    * in the SQL replay, so it hash-matches. NULL groups/labels drop. */
  def wilsonDF(df: DataFrame, groupCol: String, success: Column): DataFrame = {
    val z = z95
    val z2 = z * z
    val base = df.where(col(groupCol).isNotNull && success.isNotNull)
      .groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n"), sum(success.cast("int")).as("y"))
    val n = col("n").cast("double")
    val y = col("y").cast("double")
    val phat = y / n
    val denom = lit(1.0) + lit(z2) / n
    val center = (phat + lit(z2) / (lit(2.0) * n)) / denom
    val half = (lit(z) * sqrt(phat * (lit(1.0) - phat) / n +
      lit(z2) / (lit(4.0) * n * n))) / denom
    base.select(col("grp"), col("n"), col("y"),
      round(phat, 6).as("p_hat"),
      round(center - half, 6).as("lo"),
      round(center + half, 6).as("hi"))
      .orderBy(col("grp"))
  }
}
