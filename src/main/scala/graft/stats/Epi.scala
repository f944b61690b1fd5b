package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified 2×2 epidemiology: per-stratum odds ratio / relative risk and
  * the Mantel–Haenszel pooled estimate + Cochran–Mantel–Haenszel test
  * (NOT-IN-REFERENCE §2.8 extension — the confounder-adjusted sibling of
  * the reference's 2×2 Fisher exact test, `Hypothesis testing R.r`'s
  * epidemiological counterpart).
  *
  * The corpus reduces to one map-side-combined groupBy producing the
  * stratum-level 2×2 cell counts `(a, b, c, d)` — exposed/outcome,
  * exposed/no-outcome, unexposed/outcome, unexposed/no-outcome — all exact
  * LONGs. Every per-stratum measure is a fixed expression tree of single
  * correctly-rounded double operations over those longs, and the pooled
  * MH/CMH terms accumulate as RUNNING chains in stratum order (the r19
  * fixed-chain doctrine), so the whole frame replays bit-for-bit: no
  * transcendentals anywhere. The per-stratum frame is dimension-sized. */
object Epi {

  /** Breslow–Day test for HOMOGENEITY of odds ratios across strata — the
    * validity check behind [[mantelHaenszelDF]]'s pooling (a significant
    * BD says the per-stratum ORs genuinely differ and one pooled number
    * misleads). One row per stratum, ordered:
    * `(stratum, a, b, c, d, a_exp, bd_term, bd_running)` — the LAST row's
    * `bd_running` is the statistic (χ², k−1 df).
    *
    * Under the pooled ψ (the MH estimate — its chains replay exactly, the
    * last link extracted by `max_by` on the stratum rank), each stratum's
    * expected a-cell solves the OR quadratic in closed form
    * (`ã = (tt − √(tt² − 4(ψ−1)ψ·n1·m1)) / (2(ψ−1))`, the linear
    * `n1·m1/T` limit at ψ = 1), the variance is the harmonic form
    * `1/(1/ã + 1/b̃ + 1/c̃ + 1/d̃)`, and every expression is a fixed
    * left-to-right tree over exact-long margins, so the whole frame
    * replays bit-for-bit. Degenerate strata (a zero margin → disc/variance
    * undefined) emit NULL terms and contribute 0 to the chain. */
  def breslowDayDF(df: DataFrame, stratumCol: String,
      exposed: Column, outcome: Column): DataFrame = {
    val cells = cells2x2(df, stratumCol, exposed, outcome)
    val nD = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val mhNum = col("a").cast("double") * col("d").cast("double") / nD
    val mhDen = col("b").cast("double") * col("c").cast("double") / nD
    val runW = Window.partitionBy().orderBy(col("stratum").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pooled ψ: the r29 chains' LAST link (max_by on the stratum rank)
    val chains = cells
      .withColumn("__mhn", sum(mhNum).over(runW))
      .withColumn("__mhd", sum(mhDen).over(runW))
      .withColumn("__rn", row_number().over(
        Window.partitionBy().orderBy(col("stratum").asc)))
    val pooled = chains.agg(
      (max_by(col("__mhn"), col("__rn")) / max_by(col("__mhd"), col("__rn")))
        .as("__psi"))
    val j = cells.crossJoin(pooled)
    val n1 = col("a") + col("b"); val n0 = col("c") + col("d")
    val m1 = col("a") + col("c")
    val t = n1 + n0
    val psi = col("__psi")
    val tt = psi * (n1 + m1).cast("double") + (n0 - m1).cast("double")
    val disc = tt * tt -
      lit(4.0) * (psi - lit(1.0)) * psi * (n1 * m1).cast("double")
    val aExp = when(psi === 1.0,
        (n1 * m1).cast("double") / t.cast("double"))
      .otherwise((tt - sqrt(disc)) / (lit(2.0) * (psi - lit(1.0))))
    val bExp = n1.cast("double") - aExp
    val cExp = m1.cast("double") - aExp
    val dExp = (n0 - m1).cast("double") + aExp
    val inv = lit(1.0) / aExp + lit(1.0) / bExp + lit(1.0) / cExp +
      lit(1.0) / dExp
    // nested CASE: sqrt(disc) must never evaluate under disc < 0 (DuckDB
    // errors on negative sqrt and SQL AND does not short-circuit)
    val valid = col("a") > 0L && col("b") > 0L && col("c") > 0L &&
      col("d") > 0L && disc >= 0.0
    val term = when(valid,
      when(aExp > 0.0 && bExp > 0.0 && cExp > 0.0 && dExp > 0.0,
        (col("a").cast("double") - aExp) * (col("a").cast("double") - aExp) * inv))
    j.withColumn("__aexp", when(valid, aExp))
      .withColumn("__term", term)
      .withColumn("bd_running",
        sum(coalesce(col("__term"), lit(0.0))).over(runW))
      .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
        round(col("__aexp"), 6).as("a_exp"),
        round(col("__term"), 6).as("bd_term"),
        round(col("bd_running"), 6).as("bd_running"))
      .orderBy(col("stratum"))
  }

  /** McNemar's test for PAIRED binary outcomes — did the condition flip
    * within subjects? (The 2×2 sibling of the signed-rank test; a chi²
    * on marginal proportions would wrongly treat the pair legs as
    * independent.) One row
    * `(n00, n01, n10, n11, chi2, chi2_cc)`: the four concordance cells
    * as exact LONGs from ONE map-side aggregate, the statistic
    * `(b−c)²/(b+c)` over the discordant cells and its continuity-
    * corrected variant `(|b−c|−1)²/(b+c)` as fixed trees (NULL when no
    * discordant pairs exist — the test is undefined, not zero). */
  def mcnemarDF(df: DataFrame, first: Column, second: Column): DataFrame = {
    val src = df.where(first.isNotNull && second.isNotNull)
      .select(when(first, 1L).otherwise(0L).as("x"),
        when(second, 1L).otherwise(0L).as("y"))
    val agg = src.agg(
      sum((lit(1L) - col("x")) * (lit(1L) - col("y"))).as("n00"),
      sum((lit(1L) - col("x")) * col("y")).as("n01"),
      sum(col("x") * (lit(1L) - col("y"))).as("n10"),
      sum(col("x") * col("y")).as("n11"))
    val b = col("n01"); val c = col("n10")
    val disc = (b + c).cast("double")
    val chi2 = when(b + c > 0L,
      round((b - c).cast("double") * (b - c).cast("double") / disc, 6))
    val cc = when(b + c > 0L,
      round((abs(b - c) - lit(1L)).cast("double") *
        (abs(b - c) - lit(1L)).cast("double") / disc, 6))
    agg.select(col("n00"), col("n01"), col("n10"), col("n11"),
      chi2.as("chi2"), cc.as("chi2_cc"))
  }

  /** Cochran–Armitage test for TREND — does a binary outcome rate move
    * monotonically with an ordered integer dose? (The dose–response
    * question a 2×2 chain can't answer.) One row
    * `(n, r, sw_n, sw_r, sw2_n, z)`: total count, outcome count, and the
    * three dose-weighted sums Σw·n, Σw·r, Σw²·n — all exact LONGs from ONE
    * map-side-combined aggregate over the corpus (no shuffle beyond the
    * 1-row reduction, no windows) — plus the closed-form
    * `z = (N·Σwr − Σwn·R) / sqrt(R(N−R)(N·Σw²n − (Σwn)²)/N)` as a fixed
    * double tree over them, so a replay is bit-identical. `doseCol` must
    * be integral scores; NULL dose/outcome rows drop. */
  def cochranArmitageDF(df: DataFrame, doseCol: String, outcome: Column): DataFrame = {
    val src = df.where(col(doseCol).isNotNull && outcome.isNotNull)
      .select(col(doseCol).cast("long").as("w"),
        when(outcome, 1L).otherwise(0L).as("y"))
    val agg = src.agg(
      count(lit(1)).as("n"), sum(col("y")).as("r"),
      sum(col("w")).as("sw_n"), sum(col("w") * col("y")).as("sw_r"),
      sum(col("w") * col("w")).as("sw2_n"))
    val nD = col("n").cast("double"); val rD = col("r").cast("double")
    val swnD = col("sw_n").cast("double"); val swrD = col("sw_r").cast("double")
    val sw2D = col("sw2_n").cast("double")
    val z = (nD * swrD - swnD * rD) /
      sqrt(rD * (nD - rD) * (nD * sw2D - swnD * swnD) / nD)
    agg.select(col("n"), col("r"), col("sw_n"), col("sw_r"), col("sw2_n"),
      round(z, 6).as("z"))
  }

  /** Incidence-rate ratio for two exposure arms under person-time —
    * events per unit follow-up, the epidemiological rate comparison
    * (returns per shipping-day, infections per patient-year). One row
    * `(a, b, t1, t2, irr, z)`: arm event counts and person-time totals
    * (exact LONGs from ONE map-side aggregate), `irr = a·t2 / (b·t1)`
    * (one division), and the conditional score z — events split
    * binomially by person-time share under H₀, so
    * `z = (a·T − n·t1) / sqrt(n·t1·t2)` with `n = a+b`, `T = t1+t2` —
    * a fixed tree over the four longs (the triple product multiplies as
    * doubles to dodge long overflow). `timeCol` must be positive
    * integral person-time units. */
  def rateRatioDF(df: DataFrame, isG1: Column, event: Column,
      timeCol: String): DataFrame = {
    val src = df.where(isG1.isNotNull && event.isNotNull &&
        col(timeCol).isNotNull && col(timeCol) > 0)
      .select(when(isG1, 1L).otherwise(0L).as("g"),
        when(event, 1L).otherwise(0L).as("e"),
        col(timeCol).cast("long").as("t"))
    val agg = src.agg(
      sum(col("e") * col("g")).as("a"),
      sum(col("e") * (lit(1L) - col("g"))).as("b"),
      sum(col("t") * col("g")).as("t1"),
      sum(col("t") * (lit(1L) - col("g"))).as("t2"))
    val a = col("a").cast("double"); val b = col("b").cast("double")
    val t1 = col("t1").cast("double"); val t2 = col("t2").cast("double")
    val n = (col("a") + col("b")).cast("double")
    val tT = (col("t1") + col("t2")).cast("double")
    agg.select(col("a"), col("b"), col("t1"), col("t2"),
      when(col("b") * col("t1") > 0L, round(a * t2 / (b * t1), 6)).as("irr"),
      when(col("a") + col("b") > 0L && col("t1") > 0L && col("t2") > 0L,
        round((a * tT - n * t1) / sqrt(n * t1 * t2), 6)).as("z"))
  }

  /** One row per stratum, ordered by stratum, with the 2×2 cells, the
    * per-stratum `odds_ratio` (ad/bc, NULL when bc = 0) and `risk_ratio`
    * (a(c+d) / ((a+b)c), NULL when c = 0), and the running MH/CMH state:
    * `or_mh_run` (Σad/n / Σbc/n), `a_run`, `e_run` = Σ(a+b)(a+c)/n,
    * `v_run` = Σ(a+b)(c+d)(a+c)(b+d)/(n²(n−1)), and
    * `cmh_running = (a_run − e_run)²/v_run` — the LAST row carries the
    * pooled estimate and test statistic. NULL stratum/flag rows drop. */
  /** Stratum-level 2×2 cell counts `(stratum, a, b, c, d)` — the one
    * corpus-sized (map-side-combined) aggregate both stratified tests
    * share. */
  private def cells2x2(df: DataFrame, stratumCol: String,
      exposed: Column, outcome: Column): DataFrame =
    df.where(col(stratumCol).isNotNull && exposed.isNotNull && outcome.isNotNull)
      .select(col(stratumCol).cast("string").as("stratum"),
        when(exposed, 1L).otherwise(0L).as("x"),
        when(outcome, 1L).otherwise(0L).as("y"))
      .groupBy(col("stratum"))
      .agg(sum(col("x") * col("y")).as("a"),
        sum(col("x") * (lit(1L) - col("y"))).as("b"),
        sum((lit(1L) - col("x")) * col("y")).as("c"),
        sum((lit(1L) - col("x")) * (lit(1L) - col("y"))).as("d"))

  def mantelHaenszelDF(df: DataFrame, stratumCol: String,
      exposed: Column, outcome: Column): DataFrame = {
    val cells = cells2x2(df, stratumCol, exposed, outcome)
    val a = col("a").cast("double"); val b = col("b").cast("double")
    val c = col("c").cast("double"); val d = col("d").cast("double")
    val n = col("a") + col("b") + col("c") + col("d")
    val nD = n.cast("double")
    val orS = when(col("b") * col("c") > 0L, round(a * d / (b * c), 6))
    val rrS = when(col("c") > 0L, round(a * (c + d) / ((a + b) * c), 6))
    // MH numerator/denominator and CMH expectation/variance terms: integer
    // margin products stay exact as doubles (< 2^53), one division each;
    // the 4-margin variance numerator multiplies as doubles to dodge
    // long overflow — same left-to-right tree in the SQL replay.
    val mhNum = a * d / nD
    val mhDen = b * c / nD
    val eTerm = (col("a") + col("b")).cast("double") *
      (col("a") + col("c")).cast("double") / nD
    val vTerm = when(n > 1L,
      (col("a") + col("b")).cast("double") * (col("c") + col("d")).cast("double") *
        (col("a") + col("c")).cast("double") * (col("b") + col("d")).cast("double") /
        (nD * nD * (nD - lit(1.0)))).otherwise(lit(0.0))
    val runW = Window.partitionBy().orderBy(col("stratum").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // stratum-level frame: the deliberate dimension-sized global window
    cells
      .withColumn("__mhn", sum(mhNum).over(runW))
      .withColumn("__mhd", sum(mhDen).over(runW))
      .withColumn("a_run", sum(col("a")).over(runW))
      .withColumn("__er", sum(eTerm).over(runW))
      .withColumn("__vr", sum(vTerm).over(runW))
      .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
        orS.as("odds_ratio"), rrS.as("risk_ratio"),
        when(col("__mhd") > 0.0, round(col("__mhn") / col("__mhd"), 6)).as("or_mh_run"),
        col("a_run"), round(col("__er"), 6).as("e_run"),
        round(col("__vr"), 6).as("v_run"),
        when(col("__vr") > 0.0,
          round((col("a_run").cast("double") - col("__er")) *
            (col("a_run").cast("double") - col("__er")) / col("__vr"), 6))
          .otherwise(lit(0.0)).as("cmh_running"))
      .orderBy(col("stratum"))
  }

  /** Cochran's Q — k-related-samples test for BINARY outcomes (the binary
    * sibling of [[graft.stats.RankTests.friedmanDF]]): blocks with one 0/1
    * outcome per treatment, `Q = (k−1)·(k·ΣCⱼ² − N²) / (k·ΣRᵢ − ΣRᵢ²)`
    * with Cⱼ treatment totals and Rᵢ block row totals — every sum an exact
    * LONG off ONE aggregate over the block frame, the statistic one fixed
    * double tree (NULL when the denominator degenerates: all-0/all-1
    * blocks only). `outcomes` are the per-treatment boolean columns of a
    * pre-pivoted block frame, in treatment order. */
  def cochranQDF(blocks: DataFrame, outcomes: Seq[Column]): DataFrame = {
    val k = outcomes.size
    require(k >= 2, s"cochranQ needs >=2 treatments, got $k")
    val xs = outcomes.map(_.cast("long"))
    val r = xs.reduce(_ + _)
    val cSums = xs.zipWithIndex.map { case (x, j) => sum(x).as(s"c${j + 1}") }
    val agg = blocks.agg(count(lit(1)).as("n_blocks"),
      (cSums :+ sum(r).as("sr") :+ sum(r * r).as("sr2")): _*)
    val cCols = (1 to k).map(j => col(s"c$j"))
    val sumC2 = cCols.map(c => c.cast("double") * c.cast("double"))
      .reduce(_ + _)
    val nTot = cCols.map(_.cast("double")).reduce(_ + _)
    val den = lit(k.toDouble) * col("sr").cast("double") -
      col("sr2").cast("double")
    agg.select((col("n_blocks") +: cCols) :+
      when(den > lit(0.0),
        round(lit((k - 1).toDouble) *
          (lit(k.toDouble) * sumC2 - nTot * nTot) / den, 6)).as("q"): _*)
  }

  /** DerSimonian–Laird random-effects META-ANALYSIS of per-study odds
    * ratios (NOT-IN-REFERENCE §2.8 extension — the multi-site pooling
    * [[mantelHaenszelDF]] is NOT licensed to do when [[breslowDayDF]]
    * rejects homogeneity: MH assumes one common OR; DL estimates the
    * between-study variance τ² and widens the pooled interval by it).
    *
    * One corpus-sized groupBy to the study-level 2×2 frame, then fixed
    * expression trees over the exact-long cells: Haldane–Anscombe +0.5 on
    * every cell, `y = ln(a⁺d⁺/(b⁺c⁺))`, `v = 1/a⁺+1/b⁺+1/c⁺+1/d⁺`. The
    * fixed-effect sums Σw, Σwy, Σwy², Σw² accumulate as RUNNING chains in
    * study order (the r19 doctrine — double addition is order-dependent,
    * so the chain pins the order both engines use), the last link is
    * extracted by `max_by` on the study rank and broadcast back, Cochran's
    * `Q = Σwy² − (Σwy)²/Σw`, `τ² = max(0, (Q − (k−1))/(Σw − Σw²/Σw))`,
    * and a SECOND chain folds the random-effects weights `w* = 1/(v+τ²)`.
    *
    * One row per study ordered by key: `(study, a, b, c, d, y, v, q,
    * tau2, fe_run, re_run, re_se_run)` — `fe_run`/`re_run` are the
    * running pooled log-ORs (fixed / random effects), `re_se_run` the
    * running RE standard error; the LAST row carries the final pooled
    * estimates. The study frame is dimension-sized (its global windows
    * are the deliberate w2 shape). */
  def dersimonianLairdDF(df: DataFrame, stratumCol: String,
      exposed: Column, outcome: Column): DataFrame = {
    val cells = cells2x2(df, stratumCol, exposed, outcome)
    val ah = col("a").cast("double") + lit(0.5)
    val bh = col("b").cast("double") + lit(0.5)
    val ch = col("c").cast("double") + lit(0.5)
    val dh = col("d").cast("double") + lit(0.5)
    val base = cells
      .withColumn("y", log(ah * dh / (bh * ch)))
      .withColumn("v",
        lit(1.0) / ah + lit(1.0) / bh + lit(1.0) / ch + lit(1.0) / dh)
    val runW = Window.partitionBy().orderBy(col("stratum").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rnW = Window.partitionBy().orderBy(col("stratum").asc)
    val chains = base
      .withColumn("__w", lit(1.0) / col("v"))
      .withColumn("__sw", sum(col("__w")).over(runW))
      .withColumn("__swy", sum(col("__w") * col("y")).over(runW))
      .withColumn("__swy2", sum(col("__w") * col("y") * col("y")).over(runW))
      .withColumn("__sw2", sum(col("__w") * col("__w")).over(runW))
      .withColumn("__rn", row_number().over(rnW))
    val q = max_by(col("__swy2"), col("__rn")) -
      max_by(col("__swy"), col("__rn")) * max_by(col("__swy"), col("__rn")) /
        max_by(col("__sw"), col("__rn"))
    val pooled = chains.agg(
      q.as("__q"),
      greatest(lit(0.0),
        (q - (count(lit(1)) - lit(1L)).cast("double")) /
          (max_by(col("__sw"), col("__rn")) -
            max_by(col("__sw2"), col("__rn")) / max_by(col("__sw"), col("__rn"))))
        .as("__tau2"))
    chains.crossJoin(broadcast(pooled))
      .withColumn("__wr", lit(1.0) / (col("v") + col("__tau2")))
      .withColumn("__swr", sum(col("__wr")).over(runW))
      .withColumn("__swyr", sum(col("__wr") * col("y")).over(runW))
      .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
        round(col("y"), 6).as("y"), round(col("v"), 6).as("v"),
        round(col("__q"), 6).as("q"), round(col("__tau2"), 6).as("tau2"),
        round(col("__swy") / col("__sw"), 6).as("fe_run"),
        round(col("__swyr") / col("__swr"), 6).as("re_run"),
        round(lit(1.0) / sqrt(col("__swr")), 6).as("re_se_run"))
      .orderBy(col("stratum"))
  }

  /** Simpson's-paradox audit: per-stratum odds-ratio DIRECTION vs the
    * pooled (stratum-collapsed) direction — the aggregation trap
    * [[mantelHaenszelDF]] exists to avoid, made visible. A stratum is
    * `flipped` when its association points the OPPOSITE way from the
    * pooled table. FULLY integer: OR > 1 ⟺ a·d > b·c, so every
    * direction is a cross-product sign and no division ever happens.
    * One corpus groupBy to the stratum frame, a 1-row pooled broadcast.
    *
    * Per stratum ordered by key: `(stratum, a, b, c, d, dir, pooled_dir,
    * flipped)` with dir ∈ {-1, 0, 1}. */
  def simpsonAuditDF(df: DataFrame, stratumCol: Column,
      exposure: Column, outcome: Column): DataFrame = {
    val base = df.where(stratumCol.isNotNull && exposure.isNotNull &&
        outcome.isNotNull)
      .select(stratumCol.as("stratum"),
        exposure.cast("boolean").as("e"), outcome.cast("boolean").as("o"))
    val cells = base.groupBy(col("stratum")).agg(
      sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
      sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("d"))
    def dir(a: Column, b: Column, c: Column, d: Column): Column =
      when(a * d > b * c, 1).when(a * d < b * c, -1).otherwise(0)
    val pooled = cells.agg(sum(col("a")).as("pa"), sum(col("b")).as("pb"),
        sum(col("c")).as("pc"), sum(col("d")).as("pd"))
      .select(dir(col("pa"), col("pb"), col("pc"), col("pd"))
        .as("pooled_dir"))
    cells.crossJoin(broadcast(pooled))
      .withColumn("dir", dir(col("a"), col("b"), col("c"), col("d")))
      .withColumn("flipped",
        col("dir") =!= 0 && col("pooled_dir") =!= 0 &&
          col("dir") =!= col("pooled_dir"))
      .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
        col("dir"), col("pooled_dir"), col("flipped"))
      .orderBy(col("stratum"))
  }
}
