package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential (anytime-valid) testing at corpus scale (NOT-IN-REFERENCE
  * §2.8 extension — the streaming-era sibling of the reference's fixed-n
  * hypothesis battery: a pipeline that monitors a conversion rate daily
  * cannot use a fixed-n test without alpha inflation; Wald's SPRT gives
  * error-controlled early stopping).
  */
object Sequential {

  /** Wald sequential probability ratio test for a Bernoulli rate,
    * `H0: p = p0` vs `H1: p = p1`, folded over DAYS: the corpus reduces
    * to the (day, trials, successes) frame in one map-side groupBy, the
    * per-day log-likelihood-ratio increment is the closed form
    * `x·ln(p1/p0) + (n−x)·ln((1−p1)/(1−p0))` with both constants
    * evaluated ONCE in the JVM and interpolated (no engine libm), and
    * the running LLR/decision ride the dimension-sized day window (the
    * r27 running-chain doctrine — a relational replay is bit-exact
    * before the round-6).
    *
    * Output, one row per day ordered by day: `(day, n, x, llr_day,
    * llr_run, crossed_up, crossed_dn, decision)` — `crossed_*` latch
    * once the running LLR ever left Wald's `[ln(β/(1−α)),
    * ln((1−β)/α)]` band, `decision` reads the CURRENT llr_run
    * (`accept_h1` / `accept_h0` / `continue`). */
  def sprtDF(df: DataFrame, timeCol: String, isTrial: Column,
      isSuccess: Column, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(p0 > 0.0 && p0 < 1.0 && p1 > 0.0 && p1 < 1.0 && p0 != p1,
      "p0/p1 must be distinct rates in (0,1)")
    require(alpha > 0.0 && alpha < 1.0 && beta > 0.0 && beta < 1.0)
    val c1 = math.log(p1 / p0)
    val c0 = math.log((1.0 - p1) / (1.0 - p0))
    val up = math.log((1.0 - beta) / alpha)
    val dn = math.log(beta / (1.0 - alpha))
    val day = df.where(col(timeCol).isNotNull && isTrial && isSuccess.isNotNull)
      .select(to_date(col(timeCol)).as("day"),
        when(isSuccess, 1L).otherwise(0L).as("s"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("x"))
    val ord = Window.partitionBy().orderBy(col("day").asc)
    val runW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // day frame: the deliberate dimension-sized global window
    day
      .withColumn("__llr", col("x").cast("double") * lit(c1) +
        (col("n") - col("x")).cast("double") * lit(c0))
      .withColumn("__run", sum(col("__llr")).over(runW))
      .withColumn("crossed_up",
        max(when(col("__run") >= lit(up), 1L).otherwise(0L)).over(runW) === 1L)
      .withColumn("crossed_dn",
        max(when(col("__run") <= lit(dn), 1L).otherwise(0L)).over(runW) === 1L)
      .select(col("day"), col("n"), col("x"),
        round(col("__llr"), 6).as("llr_day"),
        round(col("__run"), 6).as("llr_run"),
        col("crossed_up"), col("crossed_dn"),
        when(col("__run") >= lit(up), lit("accept_h1"))
          .when(col("__run") <= lit(dn), lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
      .orderBy(col("day"))
  }
}
