package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance-reduced experiment readout (NOT-IN-REFERENCE §2.8
  * extension — the A/B-experimentation sibling of the reference's
  * two-cohort tests; reference cohort split: `Hypothesis testing
  * R.r:20-55`). Deng et al. 2013: with a pre-period covariate x and
  * outcome y, `y − θ(x − E[x])` with `θ = cov(x,y)/var(x)` has variance
  * `(1 − ρ²)·var(y)` and an unchanged treatment-effect expectation.
  *
  * Exactness discipline (the TTest/q6 doctrine): one global aggregate of
  * the six exact DECIMAL power sums (n, Σx, Σy, Σxx, Σxy, Σyy) and one
  * per-arm aggregate of (n, Σx, Σy); θ, ρ², and the adjusted means are
  * fixed double trees over those sums, so a relational replay reproduces
  * every output bit-for-bit before the final rounding.
  *
  * Scale shape: unit frames are small relative to the event corpus the
  * caller reduced them from (one row per experimental unit); the global
  * 1-row frame rides a broadcast cross join onto the k-arm frame —
  * nothing corpus-sized crosses the driver. */
object Cuped {

  /** Per-arm CUPED readout over a UNIT frame (one row per unit):
    * `(arm, n, mean_y, mean_y_cuped, theta, rho2)` ordered by arm.
    * Rows with a NULL arm, x, or y drop. `theta`/`rho2` are global
    * (identical on every row) — kept as columns so the replay checks
    * them. Values are exact at DECIMAL(18,2); means/θ/ρ² are doubles
    * rounded to 6. */
  def cupedDF(units: DataFrame, armCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val x = xCol.cast("decimal(18,2)")
    val y = yCol.cast("decimal(18,2)")
    val clean = units.where(armCol.isNotNull && xCol.isNotNull &&
      yCol.isNotNull)
    val globals = clean.agg(
      count(lit(1)).as("n_all"),
      sum(x).as("gsx"), sum(y).as("gsy"),
      sum(x * x).as("gsxx"), sum(x * y).as("gsxy"),
      sum(y * y).as("gsyy"))
    val arms = clean.groupBy(armCol.as("arm"))
      .agg(count(lit(1)).as("n"), sum(x).as("asx"), sum(y).as("asy"))
    val j = arms.crossJoin(broadcast(globals))
    val nAll = col("n_all").cast("double")
    def d(c: String) = col(c).cast("double")
    val cxy = nAll * d("gsxy") - d("gsx") * d("gsy")
    val cxx = nAll * d("gsxx") - d("gsx") * d("gsx")
    val cyy = nAll * d("gsyy") - d("gsy") * d("gsy")
    val theta = cxy / cxx
    val rho2 = cxy * cxy / (cxx * cyy)
    val nA = col("n").cast("double")
    val meanY = d("asy") / nA
    val adj = meanY - theta * (d("asx") / nA - d("gsx") / nAll)
    j.select(col("arm"), col("n"),
      round(meanY, 6).as("mean_y"),
      round(adj, 6).as("mean_y_cuped"),
      round(theta, 6).as("theta"),
      round(rho2, 6).as("rho2"))
      .orderBy(col("arm"))
  }
}
