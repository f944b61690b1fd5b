package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-way ANOVA F (NOT-IN-REFERENCE §2.8 extension — the k-group
  * parametric sibling: [[TTest]] compares two means, [[RankTests
  * .kruskalWallisDF]] compares k distributions rank-wise, this compares k
  * means variance-wise).
  *
  * The corpus reduces to (n_g, Σx, Σx²) per group in ONE map-side-
  * combined pass with the value as DECIMAL(12,2) (exact power sums, the
  * q6 doctrine). Everything after lives on the k-row group frame: grand
  * totals as dimension-sized windows and the between/within sums of
  * squares as RUNNING chains in group order (the r19/r20 fixed-chain
  * doctrine), so the F statistic's FP association is reproducible
  * bit-for-bit by a relational replay. */
object Anova {

  /** One row per group ordered by group key:
    * `(grp, n_g, mean_g, ssw_running, ssb_running, f_running)` — within
    * SS `Σ_g (Σx² − (Σx)²/n_g)` and between SS `Σ_g n_g·(m_g − m)²`
    * accumulate left-to-right; the LAST row's `f_running` is
    * `(ssb/(k−1)) / (ssw/(N−k))`. NULL values/groups drop. */
  def onewayDF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(12,2)")
    val perGroup = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_g"), sum(x).as("s0"), sum(x * x).as("ss0"))
    val aw = Window.partitionBy()
    val runW = Window.partitionBy().orderBy(col("grp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ng = col("n_g").cast("double")
    val s = col("s0").cast("double"); val ss = col("ss0").cast("double")
    // grand totals staged first: window results can't nest inside the
    // running-chain window's aggregate argument
    val staged = perGroup.select(col("grp"), col("n_g"), col("s0"), col("ss0"),
      sum(col("n_g")).over(aw).cast("double").as("bigN"),
      count(lit(1)).over(aw).cast("double").as("k"),
      (sum(col("s0")).over(aw).cast("double") /
        sum(col("n_g")).over(aw).cast("double")).as("m"))
    val mg = s / ng
    val ssw = sum(ss - s * s / ng).over(runW)
    val ssb = sum(ng * (mg - col("m")) * (mg - col("m"))).over(runW)
    staged
      .select(col("grp"), col("n_g"),
        round(mg, 6).as("mean_g"),
        // raw doubles: round(·,4) at SS magnitudes (~1e13) is a lossy
        // multiply/divide in DuckDB but exact decimal in Spark — the two
        // agree only when the round-trip is clean, so don't round at all
        ssw.as("ssw_running"),
        ssb.as("ssb_running"),
        round((ssb / (col("k") - lit(1.0))) /
          (ssw / (col("bigN") - col("k"))), 6).as("f_running"))
      .orderBy(col("grp"))
  }

  /** One-way random-effects intraclass correlation ICC(1,1) (Shrout &
    * Fleiss 1979) over groups of a FIXED size `k` with an INTEGER
    * response — how much of the variance lives BETWEEN groups (order
    * effects, rater effects, cluster effects). Groups whose size ≠ k are
    * excluded (the balanced-design statistic). One row
    * `(n_groups, k, a, t, q, msb, msw, icc)`.
    *
    * FULLY exact: with per-group integer sums sy, the three LONGs
    * `A = Σ sy²`, `T = Σ y`, `Q = Σ y²` carry everything —
    * `N·k·(N−1)·MSB = N·A − T²` and `k·N·(k−1)·MSW = k·Q − A` are exact
    * integer identities, so MSB/MSW/ICC are fixed double trees over three
    * longs. One corpus groupBy + a 1-row reduce; no windows. */
  def iccOneWayDF(df: DataFrame, groupCol: Column, yCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"ICC needs groups of size >= 2, got $k")
    val y = yCol.cast("long")
    val perGroup = df.where(groupCol.isNotNull && yCol.isNotNull)
      .groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n_g"), sum(y).as("sy"), sum(y * y).as("syy"))
      .where(col("n_g") === k.toLong)
    val agg = perGroup.agg(count(lit(1)).as("n_groups"),
      sum(col("sy") * col("sy")).as("a"),
      sum(col("sy")).as("t"), sum(col("syy")).as("q"))
    val nD = col("n_groups").cast("double")
    val kD = lit(k.toDouble)
    val msb = (col("n_groups") * col("a") - col("t") * col("t")).cast("double") /
      (nD * kD * (nD - lit(1.0)))
    val msw = (col("q") * k - col("a")).cast("double") /
      (kD * nD * (kD - lit(1.0)))
    agg.select(col("n_groups"), lit(k.toLong).as("k"),
      col("a"), col("t"), col("q"),
      round(msb, 6).as("msb"), round(msw, 6).as("msw"),
      round((msb - msw) / (msb + (kD - lit(1.0)) * msw), 6).as("icc"))
  }

  /** Brown–Forsythe homogeneity-of-variance test (the robust Levene
    * variant: deviations from the group MEDIAN, not the mean — the
    * variance-equality gate [[onewayDF]]/[[TTest.welchDF]] implicitly
    * assume, made checkable).
    *
    * The corpus reduces to value-level cells in HALF-CENT integers (the
    * q10 quantile doctrine), the group median is the exact type-1 lower
    * median read off the cell cumsum, and the absolute deviations
    * `|v − med|` therefore stay integers end to end — the per-group power
    * sums are exact DECIMAL(38,0) integers, cast to double ONCE, and the
    * W statistic is the same staged + running-chain tree as [[onewayDF]],
    * so the whole test replays bit-for-bit relationally.
    *
    * One row per group ordered by group key:
    * `(grp, n_g, med, mad_mean, ssw_running, ssb_running, w_running)` —
    * the LAST row's `w_running` is Brown–Forsythe's W (the one-way F on
    * the deviations). NULL values/groups drop. */
  def brownForsytheDF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val cells = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        (col(valueCol).cast("decimal(12,2)") * 200).cast("long").as("v2"))
      .groupBy(col("grp"), col("v2")).agg(count(lit(1)).as("c"))
    val cw = Window.partitionBy(col("grp")).orderBy(col("v2").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nw = Window.partitionBy(col("grp"))
    val med = cells
      .withColumn("ci", sum(col("c")).over(cw))
      .withColumn("n", sum(col("c")).over(nw))
      .withColumn("medc", when(col("ci") >= expr("(n + 1) DIV 2"), col("v2")))
      .groupBy(col("grp")).agg(min(col("medc")).as("med2"))
    // deviations are integer half-cents; z² ≤ ~4e14 fits a long, the
    // c-weighted sums go through DECIMAL(38,0) so no overflow at any sf
    val z = cells.join(med, "grp")
      .select(col("grp"), col("med2"), abs(col("v2") - col("med2")).as("z2"),
        col("c"))
    val perGroup = z.groupBy(col("grp"), col("med2")).agg(
      sum(col("c")).as("n_g"),
      sum((col("c") * col("z2")).cast("decimal(38,0)")).as("s0"),
      sum((col("z2") * col("z2")).cast("decimal(38,0)") * col("c")).as("ss0"))
    val aw = Window.partitionBy()
    val runW = Window.partitionBy().orderBy(col("grp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ng = col("n_g").cast("double")
    // exact integer sums → double once, then half-cent → value units
    val s = col("s0").cast("double") / lit(200.0)
    val ss = col("ss0").cast("double") / lit(40000.0)
    val staged = perGroup.select(col("grp"), col("med2"), col("n_g"),
      col("s0"), col("ss0"),
      sum(col("n_g")).over(aw).cast("double").as("bigN"),
      count(lit(1)).over(aw).cast("double").as("k"),
      (sum(col("s0")).over(aw).cast("double") / lit(200.0) /
        sum(col("n_g")).over(aw).cast("double")).as("m"))
    val mg = s / ng
    val ssw = sum(ss - s * s / ng).over(runW)
    val ssb = sum(ng * (mg - col("m")) * (mg - col("m"))).over(runW)
    staged
      .select(col("grp"), col("n_g"),
        (col("med2").cast("double") / lit(200.0)).as("med"),
        round(mg, 6).as("mad_mean"),
        // raw doubles: round(·,4) at SS magnitudes (~1e13) is a lossy
        // multiply/divide in DuckDB but exact decimal in Spark — the two
        // agree only when the round-trip is clean, so don't round at all
        ssw.as("ssw_running"),
        ssb.as("ssb_running"),
        round((ssb / (col("k") - lit(1.0))) /
          (ssw / (col("bigN") - col("k"))), 6).as("w_running"))
      .orderBy(col("grp"))
  }

  /** Bartlett's homogeneity-of-variance test — the parametric (and more
    * powerful, normality-assuming) sibling of [[brownForsytheDF]]:
    * `T = [(N−k)·ln(Sp²) − Σ_g (n_g−1)·ln(s_g²)] / C` with
    * `C = 1 + (Σ_g 1/(n_g−1) − 1/(N−k)) / (3(k−1))`.
    *
    * Same shape as [[onewayDF]]: one corpus pass to exact per-group power
    * sums, then everything on the k-row group frame — grand totals staged
    * as dimension-sized windows, the three group accumulations (`Σ(n_g−1)
    * s_g²`, `Σ(n_g−1)ln s_g²`, `Σ 1/(n_g−1)`) as RUNNING chains in group
    * order so the replay reproduces the FP association; `ln` on exact-
    * operand doubles follows the r26 round-6 convention. One row per
    * group; the LAST row's `t_running` is Bartlett's T (χ², k−1 df). */
  def bartlettDF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(12,2)")
    val perGroup = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_g"), sum(x).as("s0"), sum(x * x).as("ss0"))
    val aw = Window.partitionBy()
    val runW = Window.partitionBy().orderBy(col("grp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ng = col("n_g").cast("double")
    val s = col("s0").cast("double"); val ss = col("ss0").cast("double")
    val vg = (ss - s * s / ng) / (ng - lit(1.0))
    val staged = perGroup.select(col("grp"), col("n_g"), col("s0"), col("ss0"),
      sum(col("n_g")).over(aw).cast("double").as("bigN"),
      count(lit(1)).over(aw).cast("double").as("k"))
    val sw = sum((ng - lit(1.0)) * vg).over(runW)
    val lnv = sum((ng - lit(1.0)) * log(vg)).over(runW)
    val invn = sum(lit(1.0) / (ng - lit(1.0))).over(runW)
    val dfw = col("bigN") - col("k")
    staged
      .select(col("grp"), col("n_g"), round(vg, 6).as("var_g"),
        // raw running doubles (the r23/r38 no-round rule at SS magnitudes)
        sw.as("sw_running"), lnv.as("lnv_running"),
        round(invn, 6).as("invn_running"),
        round((dfw * log(sw / dfw) - lnv) /
          (lit(1.0) + (invn - lit(1.0) / dfw) /
            (lit(3.0) * (col("k") - lit(1.0)))), 6).as("t_running"))
      .orderBy(col("grp"))
  }
}
