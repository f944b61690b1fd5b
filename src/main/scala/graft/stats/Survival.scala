package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event (survival) analysis at corpus scale (NOT-IN-REFERENCE
  * §2.8 extension — the survival siblings of the reference's hypothesis
  * battery in `Hypothesis testing R.r`; a medical analytics engine without
  * Kaplan–Meier and the log-rank test stops short of the clinic).
  *
  * Both estimators reduce the corpus to VALUE-LEVEL (distinct time) counts
  * in one map-side-combined groupBy — the only corpus-sized shuffle — then
  * need the number-at-risk at each time, i.e. `N − (subjects leaving before
  * t)`: an exclusive prefix sum in time order, run via the repo's sharded
  * two-phase pattern ([[RankTests.withExclusivePrefixCols]]), no global
  * sort. Everything cumulative is INTEGER; the per-time expectation /
  * variance terms are single exact-operand double divisions; the only
  * accumulated doubles ride RUNNING chains in time order (the r19
  * fixed-chain doctrine) so a relational replay reproduces them
  * bit-for-bit. The KM survival curve itself is the one transcendental
  * surface (a running `exp(Σ ln(ratio))` product — the t13-perplexity
  * precedent), rounded to 6 decimals on output.
  */
object Survival {

  /** Distinct-time frame `(t, d, c)` with event deaths `d` and censored
    * losses `c`, plus exclusive prefix `cum` of subjects leaving strictly
    * before `t`. NULL time/event rows drop. */
  private def timeCounts(df: DataFrame, timeCol: String, eventCol: Column): DataFrame = {
    val tc = df.where(col(timeCol).isNotNull && eventCol.isNotNull)
      .select(col(timeCol).cast("long").as("v"),
        when(eventCol, 1L).otherwise(0L).as("e"))
      .groupBy(col("v"))
      .agg(sum(col("e")).as("d"), (count(lit(1)) - sum(col("e"))).as("c"))
      .withColumn("leave", col("d") + col("c"))
    RankTests.withExclusivePrefixCols(tc, Seq("leave" -> "cum"))
  }

  /** Kaplan–Meier product-limit estimator: one row per distinct time,
    * `(t, n_risk, d, c, survival)` ordered by `t`. `n_risk` is the exact
    * integer count still at risk at `t` (subjects with time ≥ t), `d`/`c`
    * the events / censorings AT `t`, and `survival = Π_{t_i ≤ t}
    * (1 − d_i/n_i)` via the running log-sum chain (a ratio of exact-long
    * doubles; `ln`/`exp` follow the t13 round-6 convention). Once some
    * time exhausts its risk set (`d = n_risk`) survival pins to exactly
    * 0.0 from that row on — no `ln(0)` is ever evaluated. */
  def kaplanMeierDF(df: DataFrame, timeCol: String, eventCol: Column): DataFrame = {
    val tc = timeCounts(df, timeCol, eventCol)
    val total = tc.agg(sum(col("leave"))).head().getLong(0)
    val runW = Window.partitionBy().orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // value-level frame: distinct times only — the deliberate
    // dimension-sized global window (the w2/r19 whitelist family)
    val nRisk = lit(total) - col("cum")
    val ratio = (nRisk - col("d")).cast("double") / nRisk.cast("double")
    tc
      .withColumn("n_risk", nRisk)
      .withColumn("__lnr", when(col("d") < col("n_risk"), log(ratio)).otherwise(lit(0.0)))
      .withColumn("__dead", min(col("n_risk") - col("d")).over(runW))
      .withColumn("survival",
        when(col("__dead") === 0L, lit(0.0))
          .otherwise(round(exp(sum(col("__lnr")).over(runW)), 6)))
      .select(col("v").as("t"), col("n_risk"), col("d"), col("c"), col("survival"))
      .orderBy(col("t"))
  }

  /** Two-group log-rank (Mantel–Cox) test: one row per EVENT time (d > 0),
    * ordered by `t`, carrying the exact integer risk sets and event counts
    * `(t, n1, n2, d1, d2)`, the per-time expectation `e1` and hypergeometric
    * variance `var1` (single-division fixed trees over exact longs), and the
    * RUNNING totals `o1_run`/`e1_run`/`v_run` whose LAST row yields the
    * statistic `chi2_running = (o1_run − e1_run)² / v_run` — every chain a
    * fixed left-to-right sum in time order, no transcendentals anywhere.
    *
    * Plan: corpus → (time, group) leave/death counts in one map-side
    * groupBy, TWO sharded exclusive prefixes (one per group) giving each
    * group's number-at-risk, then the dimension-sized event-time frame. */
  /** Shared two-group distinct-time frame `(v, d1, d2, n1, n2)`: per-time
    * event counts and exact integer risk sets for the G1 / not-G1 arms —
    * one corpus-sized map-side groupBy plus TWO sharded exclusive
    * prefixes; everything downstream ([[logRankDF]], [[coxBinaryFit]],
    * [[coxScoreDF]]) is dimension-sized. */
  private[graft] def twoGroupTimeFrame(df: DataFrame, timeCol: String,
      eventCol: Column, isG1: Column): DataFrame = {
    val tc = df.where(col(timeCol).isNotNull && eventCol.isNotNull && isG1.isNotNull)
      .select(col(timeCol).cast("long").as("v"),
        when(eventCol, 1L).otherwise(0L).as("e"),
        when(isG1, 1L).otherwise(0L).as("g"))
      .groupBy(col("v"))
      .agg(sum(col("e") * col("g")).as("d1"),
        sum(col("e") * (lit(1L) - col("g"))).as("d2"),
        sum(col("g")).as("leave1"),
        (count(lit(1)) - sum(col("g"))).as("leave2"))
    val pref = RankTests.withExclusivePrefixCols(
      tc, Seq("leave1" -> "cum1", "leave2" -> "cum2"))
    val totals = pref.agg(sum(col("leave1")), sum(col("leave2"))).head()
    val (t1, t2) = (totals.getLong(0), totals.getLong(1))
    pref.select(col("v"), col("d1"), col("d2"),
      (lit(t1) - col("cum1")).as("n1"), (lit(t2) - col("cum2")).as("n2"))
  }

  def logRankDF(df: DataFrame, timeCol: String, eventCol: Column, isG1: Column): DataFrame = {
    val pref = twoGroupTimeFrame(df, timeCol, eventCol, isG1)
    val n1 = col("n1"); val n2 = col("n2")
    val d = col("d1") + col("d2")
    val n = n1 + n2
    val dD = d.cast("double"); val nD = n.cast("double")
    val e1 = dD * n1.cast("double") / nD
    val var1 = when(n > 1L,
      dD * n1.cast("double") / nD * (n2.cast("double") / nD) *
        ((nD - dD) / (nD - lit(1.0)))).otherwise(lit(0.0))
    val runW = Window.partitionBy().orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // event-time frame: distinct death times only (dimension-sized)
    pref
      .where(d > 0L)
      .withColumn("e1", e1).withColumn("var1", var1)
      .withColumn("o1_run", sum(col("d1")).over(runW))
      .withColumn("e1_run", sum(col("e1")).over(runW))
      .withColumn("v_run", sum(col("var1")).over(runW))
      .select(col("v").as("t"), col("n1"), col("n2"), col("d1"), col("d2"),
        round(col("e1"), 6).as("e1"), round(col("var1"), 6).as("var1"),
        col("o1_run"), round(col("e1_run"), 6).as("e1_run"),
        round(col("v_run"), 6).as("v_run"),
        when(col("v_run") > 0.0,
          round((col("o1_run").cast("double") - col("e1_run")) *
            (col("o1_run").cast("double") - col("e1_run")) / col("v_run"), 6))
          .otherwise(lit(0.0)).as("chi2_running"))
      .orderBy(col("t"))
  }

  /** Nelson–Aalen cumulative-hazard estimator `H(t) = Σ_{t_i ≤ t} d_i/n_i`
    * with its variance `Σ d_i/n_i²` — the hazard-scale twin of
    * [[kaplanMeierDF]] that needs NO transcendentals at all: every term is
    * a single division of exact longs and the accumulations are running
    * chains in time order (the r27 doctrine), so the replay is bit-exact
    * before the round-6. One row per distinct time, ordered:
    * `(t, n_risk, d, c, h_cum, var_cum)`. Same plan shape as KM: one
    * corpus-sized groupBy, the sharded leave-prefix, a dimension-sized
    * running window over distinct times. */
  /** A fitted single-binary-covariate Cox model: log hazard ratio `beta`
    * with its model-based SE (1/√I at the optimum). */
  case class CoxFit(beta: Double, se: Double, iters: Int, converged: Boolean)

  /** Cox proportional-hazards fit for ONE binary covariate with Breslow
    * tie handling — the regression completion of the §2.8 survival triad
    * (KM estimates, log-rank tests, Cox quantifies).
    *
    * With a binary covariate the partial likelihood depends on the data
    * ONLY through the event-time frame `(d1, d, n1, n2)` — the same
    * bounded frame [[logRankDF]] builds — so the corpus reduces in one
    * groupBy + sharded prefixes, and Newton–Raphson runs driver-side on
    * the canonically time-sorted frame (the r37 IRLS doctrine: a bounded
    * protocol, `require`-capped, bit-deterministic on any partitioning:
    * `ll = Σ β·d1 − d·ln(n1·e^β + n2)`). A fixed 1e-9 ridge on the
    * information keeps separated data finite. */
  def coxBinaryFit(eventFrame: DataFrame, maxEventTimes: Int = 65536,
      maxIter: Int = 50, tol: Double = 1e-12): CoxFit = {
    val raw = eventFrame.where(col("d1") + col("d2") > 0L)
      .select(col("v"), col("d1"), col("d2"), col("n1"), col("n2"))
      .limit(maxEventTimes + 1).collect()
    require(raw.length <= maxEventTimes,
      s"event-time frame exceeds maxEventTimes=$maxEventTimes — coarsen the time unit")
    require(raw.nonEmpty, "no event times to fit on")
    val rows = raw.map(r => (r.getLong(0), r.getLong(1).toDouble,
      (r.getLong(1) + r.getLong(2)).toDouble,
      r.getLong(3).toDouble, r.getLong(4).toDouble)).sortBy(_._1)
    var beta = 0.0; var info = 1e-9; var iters = 0; var converged = false
    while (iters < maxIter && !converged) {
      val eb = math.exp(beta)
      var u = 0.0; var i2 = 1e-9
      rows.foreach { case (_, d1, d, n1, n2) =>
        val r1 = n1 * eb; val denom = r1 + n2
        u += d1 - d * (r1 / denom)
        i2 += d * (r1 / denom) * (n2 / denom)
      }
      val step = u / i2
      beta += step; info = i2; iters += 1
      if (math.abs(step) < tol) converged = true
    }
    CoxFit(beta, 1.0 / math.sqrt(info), iters, converged)
  }

  /** Per-event-time Cox diagnostics AT a given β (the fitted β rides in
    * as a literal — the m4/r48 exported-artifact oracle contract): score
    * and information contributions plus their RUNNING chains in time
    * order, the running partial log-likelihood, and the constant
    * `beta`/`hr`/`z_running` columns. `e^β` is evaluated ONCE in the JVM
    * and interpolated (`expBeta`) so no engine libm enters the replay
    * except the per-time `ln(denom)` (the r26 round-6 convention). */
  def coxScoreDF(eventFrame: DataFrame, beta: Double): DataFrame = {
    val eb = lit(math.exp(beta))
    val d = col("d1") + col("d2")
    val r1 = col("n1").cast("double") * eb
    val denom = r1 + col("n2").cast("double")
    val runW = Window.partitionBy().orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventFrame
      .where(d > 0L)
      .withColumn("__u", col("d1").cast("double") - d.cast("double") * (r1 / denom))
      .withColumn("__i", d.cast("double") * (r1 / denom) *
        (col("n2").cast("double") / denom))
      .withColumn("__ll", lit(beta) * col("d1").cast("double") -
        d.cast("double") * log(denom))
      .select(col("v").as("t"), col("n1"), col("n2"), col("d1"), col("d2"),
        round(sum(col("__u")).over(runW), 6).as("u_run"),
        round(sum(col("__i")).over(runW), 6).as("i_run"),
        // per-row term exact at 6; the running loglik only at 3 — its
        // ~1e5 magnitude is where engine windowed-sum association shows
        round(col("__ll"), 6).as("ll_t"),
        round(sum(col("__ll")).over(runW), 3).as("ll_run"),
        lit(beta).as("beta"),
        lit(math.exp(beta)).as("hr"),
        round(lit(beta) * sqrt(sum(col("__i")).over(runW)), 6).as("z_running"))
      .orderBy(col("t"))
  }

  def nelsonAalenDF(df: DataFrame, timeCol: String, eventCol: Column): DataFrame = {
    val tc = timeCounts(df, timeCol, eventCol)
    val total = tc.agg(sum(col("leave"))).head().getLong(0)
    val runW = Window.partitionBy().orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nRisk = lit(total) - col("cum")
    tc
      .withColumn("n_risk", nRisk)
      .withColumn("__h", col("d").cast("double") / col("n_risk").cast("double"))
      .withColumn("__v", col("d").cast("double") /
        (col("n_risk").cast("double") * col("n_risk").cast("double")))
      .select(col("v").as("t"), col("n_risk"), col("d"), col("c"),
        round(sum(col("__h")).over(runW), 6).as("h_cum"),
        round(sum(col("__v")).over(runW), 8).as("var_cum"))
      .orderBy(col("t"))
  }
}
