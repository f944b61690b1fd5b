package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chi-squared test of independence over an R×C contingency table
  * (NOT-IN-REFERENCE §2.8 extension — the large-sample sibling of the
  * reference's Fisher exact test, which is 2×2-only by design).
  *
  * The corpus-sized work is ONE map-side-combined groupBy to the cell
  * counts; margins and the statistic are cell-level windows (R×C rows).
  * Exactness discipline: each cell's contribution is
  * `(O·N − rt·ct)² / (N·rt·ct)` — the numerator stays an exact LONG cast
  * to an exact double (< 2^53 for any table under ~90M rows per margin
  * product; beyond that use DECIMAL margins), and the chi² total is a
  * RUNNING sum in (row, col) order, so its FP association is a fixed
  * left-to-right chain both engines reproduce bit-for-bit (the n6
  * explicit-chain doctrine; a plain `sum()` over cells would re-associate
  * nondeterministically). */
object ChiSquare {

  /** Per-cell rows `(rCol, cCol, o, expected, contrib, chi2_running)`
    * ordered by (row, col); the LAST row's `chi2_running` is the full
    * statistic. NULL categories drop. */
  def contingencyDF(df: DataFrame, rCol: String, cCol: String): DataFrame = {
    val cells = df
      .where(col(rCol).isNotNull && col(cCol).isNotNull)
      .groupBy(col(rCol), col(cCol)).agg(count(lit(1)).as("o"))
    val rw = Window.partitionBy(col(rCol))
    val cw = Window.partitionBy(col(cCol))
    val aw = Window.partitionBy()
    val runW = Window.partitionBy().orderBy(col(rCol).asc, col(cCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cell-level frame: R×C rows, the deliberate dimension-sized global
    // windows (the w2 whitelist family)
    cells
      .withColumn("__rt", sum(col("o")).over(rw))
      .withColumn("__ct", sum(col("o")).over(cw))
      .withColumn("__n", sum(col("o")).over(aw))
      .withColumn("expected",
        col("__rt").cast("double") * col("__ct").cast("double") /
          col("__n").cast("double"))
      .withColumn("__num", col("o") * col("__n") - col("__rt") * col("__ct"))
      .withColumn("contrib",
        (col("__num").cast("double") * col("__num").cast("double")) /
          (col("__n").cast("double") * col("__rt").cast("double") *
            col("__ct").cast("double")))
      .withColumn("chi2_running", sum(col("contrib")).over(runW))
      .select(col(rCol), col(cCol), col("o"),
        col("expected"), col("contrib"), col("chi2_running"))
      .orderBy(col(rCol), col(cCol))
  }

  /** Mutual information between two categorical columns (nats), with the
    * marginal entropies and the sqrt-normalized NMI — the feature-relevance
    * score a selection pipeline ranks columns by (chi² grows with n and
    * table size; NMI ∈ [0,1] compares across pairs). One row
    * `(n, mi, h_r, h_c, nmi)`.
    *
    * Exactness: the corpus reduces to the R×C cell counts in one map-side
    * groupBy; each MI term is `(o/n)·ln(o·n / (rt·ct))` — exact-long
    * products (< 2^63 for any table under ~3B rows), single divisions, one
    * `ln` (the t13 round-6 convention) — and MI / both entropies
    * accumulate as RUNNING chains in cell / margin order (the r19
    * doctrine), so the result replays bit-for-bit. Observed cells have
    * o > 0, and structurally-missing cells contribute exactly 0 to MI, so
    * no completion pass is needed (unlike [[cramersVDF]]). */
  def mutualInformationDF(df: DataFrame, rCol: String, cCol: String): DataFrame = {
    val cells = df
      .where(col(rCol).isNotNull && col(cCol).isNotNull)
      .groupBy(col(rCol), col(cCol)).agg(count(lit(1)).as("o"))
    val rw = Window.partitionBy(col(rCol))
    val cw = Window.partitionBy(col(cCol))
    val aw = Window.partitionBy()
    val runW = Window.partitionBy().orderBy(col(rCol).asc, col(cCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cell-level frame: R×C rows (the deliberate dimension-sized windows)
    val m = cells
      .withColumn("__rt", sum(col("o")).over(rw))
      .withColumn("__ct", sum(col("o")).over(cw))
      .withColumn("__n", sum(col("o")).over(aw))
    val miTerm = col("o").cast("double") / col("__n").cast("double") *
      log((col("o") * col("__n")).cast("double") /
        (col("__rt") * col("__ct")).cast("double"))
    // MI terms can be NEGATIVE (cells under independence expectation), so
    // the chain is non-monotone: take the LAST link via max_by on the cell
    // rank, not max (the r19/r25 shortcut only works for chi²'s ≥0 terms)
    val withMi = m
      .withColumn("__mi_run", sum(miTerm).over(runW))
      .withColumn("__rn", row_number().over(
        Window.partitionBy().orderBy(col(rCol).asc, col(cCol).asc)))
    val agg = withMi.agg(sum(col("o")).as("n0"),
      max_by(col("__mi_run"), col("__rn")).as("mi0"))
    // marginal entropies: each margin is its own dimension-sized frame
    // with its own running chain in key order
    def entropy(keyCol: String): DataFrame = {
      val marg = cells.groupBy(col(keyCol)).agg(sum(col("o")).as("mt"))
      val mw = Window.partitionBy()
      val mRun = Window.partitionBy().orderBy(col(keyCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hTerm = lit(0.0) - col("mt").cast("double") / col("__n").cast("double") *
        log(col("mt").cast("double") / col("__n").cast("double"))
      marg.withColumn("__n", sum(col("mt")).over(mw))
        .withColumn("__h_run", sum(hTerm).over(mRun))
        .agg(max(col("__h_run")).as(s"h_$keyCol"))
    }
    val hr = entropy(rCol).withColumnRenamed(s"h_$rCol", "hr0")
    val hc = entropy(cCol).withColumnRenamed(s"h_$cCol", "hc0")
    // 1-row × 1-row cross joins (the j1 deliberate family)
    agg.crossJoin(hr).crossJoin(hc)
      .select(col("n0").as("n"), round(col("mi0"), 6).as("mi"),
        round(col("hr0"), 6).as("h_r"), round(col("hc0"), 6).as("h_c"),
        when(col("hr0") * col("hc0") > 0.0,
          round(col("mi0") / sqrt(col("hr0") * col("hc0")), 6))
          .otherwise(lit(0.0)).as("nmi"))
  }

  /** Information-gain feature ranking — [[mutualInformationDF]] swept
    * across MANY candidate features against one label in a single job:
    * the feature-selection census an ML pipeline runs before training
    * (IG(x) = H(y) − H(y|x) = MI(x,y); `u_coef = MI/H(y)` is Theil's
    * uncertainty coefficient, the [0,1] normalized form).
    *
    * One stacked explode builds (feature, x, y) cells for every feature
    * at once, and — unlike the single-pair r30 — every window here is
    * PARTITIONED by feature, so nothing is ever global: the MI running
    * chain, its max_by last-link, and the label-entropy chain all ride
    * feature-keyed frames. Rows with a NULL feature value drop for that
    * feature only. Chains are in (x,y) key order (the r30 doctrine), so
    * a relational replay is bit-exact. */
  def featureInfoGainDF(df: DataFrame, labelCol: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "featureInfoGainDF needs features")
    val cells = df.select(explode(array(features.map { case (n, c) =>
        struct(lit(n).as("feat"), c.cast("string").as("x"),
          labelCol.cast("string").as("y")) }: _*)).as("cell"))
      .select(col("cell.feat"), col("cell.x"), col("cell.y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("feat"), col("x"), col("y")).agg(count(lit(1)).as("o"))
    val fw = Window.partitionBy(col("feat"))
    val xw = Window.partitionBy(col("feat"), col("x"))
    val yw = Window.partitionBy(col("feat"), col("y"))
    val runW = Window.partitionBy(col("feat"))
      .orderBy(col("x").asc, col("y").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rnW = Window.partitionBy(col("feat")).orderBy(col("x").asc, col("y").asc)
    val m = cells
      .withColumn("rt", sum(col("o")).over(xw))
      .withColumn("ct", sum(col("o")).over(yw))
      .withColumn("n", sum(col("o")).over(fw))
    val miTerm = col("o").cast("double") / col("n").cast("double") *
      log((col("o") * col("n")).cast("double") /
        (col("rt") * col("ct")).cast("double"))
    val mi = m.withColumn("mi_run", sum(miTerm).over(runW))
      .withColumn("rn", row_number().over(rnW))
      .groupBy(col("feat"))
      .agg(sum(col("o")).as("n"), max_by(col("mi_run"), col("rn")).as("mi0"))
    // label entropy per feature (n differs per feature when a feature has
    // NULLs); terms ≥ 0 so max IS the chain's last link
    val ymarg = cells.groupBy(col("feat"), col("y")).agg(sum(col("o")).as("mt"))
    val yRun = Window.partitionBy(col("feat")).orderBy(col("y").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hTerm = lit(0.0) - col("mt").cast("double") / col("n").cast("double") *
      log(col("mt").cast("double") / col("n").cast("double"))
    val hy = ymarg.withColumn("n", sum(col("mt")).over(fw))
      .withColumn("h_run", sum(hTerm).over(yRun))
      .groupBy(col("feat")).agg(max(col("h_run")).as("hy0"))
    mi.join(hy, "feat")
      .select(col("feat").as("feature"), col("n"),
        round(col("mi0"), 6).as("info_gain"),
        round(col("hy0"), 6).as("h_label"),
        when(col("hy0") > 0.0, round(col("mi0") / col("hy0"), 6))
          .otherwise(lit(0.0)).as("u_coef"))
      .orderBy(col("feature"))
  }

  /** Cohen's kappa — chance-corrected agreement between two raters over
    * the same category space (the inter-rater reliability measure a
    * labeling pipeline reports). One row `(n, agree, pe_num, kappa)`.
    *
    * FULLY exact: with `agree` = matching-label count and
    * `pe_num = Σ_cat n_a(cat)·n_b(cat)`, kappa telescopes to the integer
    * ratio `(n·agree − pe_num) / (n² − pe_num)` — three longs and ONE
    * double division, no chains, no transcendentals. Margin products stay
    * exact for tables under ~3B rows; the corpus reduces in one map-side
    * aggregate plus two margin groupBys over the category frame. */
  def cohenKappaDF(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
    val agg = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val ma = base.groupBy(col("a")).agg(count(lit(1)).as("na"))
    val mb = base.groupBy(col("b")).agg(count(lit(1)).as("nb"))
    val pe = ma.join(mb, ma("a") === mb("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    // 1-row × 1-row cross join (the j1 deliberate family)
    agg.crossJoin(pe).select(col("n"), col("agree"), col("pe_num"),
      round((col("n") * col("agree") - col("pe_num")).cast("double") /
        (col("n") * col("n") - col("pe_num")).cast("double"), 6).as("kappa"))
  }

  /** G-test (likelihood-ratio χ², Sokal & Rohlf): `G = 2·Σ O·ln(O/E)`
    * over the OBSERVED cells of the R×C contingency frame — the
    * information-theoretic twin of [[contingencyDF]]'s Pearson χ²
    * (G = 2n·MI in nats, which is why it's the natural test for the
    * r30 MI machinery). Zero-observed cells contribute exactly 0, so
    * unlike Pearson no missing-mass completion is needed. One row
    * `(n, r, c, g)`.
    *
    * Per-cell contribution is `2·O·ln((O·n)/(rt·ct))` with the argument
    * staged as one LONG/LONG division (both products exact); the G chain
    * runs over the cell order and its LAST link is taken by `max_by` on
    * the cell rank — contributions are SIGNED (O < E gives negatives), so
    * the r19 max shortcut would be wrong (the r30 lesson). */
  def gTestDF(df: DataFrame, rCol: String, cCol: String): DataFrame = {
    val cells = df
      .where(col(rCol).isNotNull && col(cCol).isNotNull)
      .groupBy(col(rCol), col(cCol)).agg(count(lit(1)).as("o"))
    val rw = Window.partitionBy(col(rCol))
    val cw = Window.partitionBy(col(cCol))
    val aw = Window.partitionBy()
    val runW = Window.partitionBy().orderBy(col(rCol).asc, col(cCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__rt", sum(col("o")).over(rw))
      .withColumn("__ct", sum(col("o")).over(cw))
      .withColumn("__n", sum(col("o")).over(aw))
      .withColumn("contrib",
        lit(2.0) * col("o").cast("double") *
          log((col("o") * col("__n")).cast("double") /
            (col("__rt") * col("__ct")).cast("double")))
      .withColumn("__g_run", sum(col("contrib")).over(runW))
      .agg(sum(col("o")).as("n"),
        countDistinct(col(rCol)).as("r"),
        countDistinct(col(cCol)).as("c"),
        max_by(col("__g_run"), struct(col(rCol), col(cCol))).as("__g"))
      .select(col("n"), col("r"), col("c"), round(col("__g"), 6).as("g"))
  }

  /** Fleiss' kappa — chance-corrected agreement among a FIXED number `m`
    * of raters per subject (Fleiss 1971); the multi-rater generalization
    * of [[cohenKappaDF]] for labeling-pipeline consensus audits. Subjects
    * with a rating count ≠ m are excluded (the statistic assumes constant
    * m). One row `(n_subjects, m, ssq, c2, pbar, pe, kappa)`.
    *
    * FULLY exact: with `ssq = Σ_i Σ_j n_ij²` and `c2 = Σ_j (Σ_i n_ij)²`,
    * `P̄ = (ssq − N·m)/(N·m·(m−1))` and `P̄e = c2/(N·m)²` — two longs and
    * a fixed double tree; no chains, no transcendentals. Plan: one
    * (subject, cat) groupBy, a subject-level reduce to (m_i, Σn_ij²), the
    * eligible filter, category margins over eligible subjects, 1-row
    * combine. */
  def fleissKappaDF(df: DataFrame, subjectCol: Column, catCol: Column,
      m: Int): DataFrame = {
    require(m >= 2, s"Fleiss' kappa needs >= 2 raters per subject, got $m")
    val base = df.where(subjectCol.isNotNull && catCol.isNotNull)
      .select(subjectCol.as("subj"), catCol.cast("string").as("cat"))
    val nij = base.groupBy(col("subj"), col("cat"))
      .agg(count(lit(1)).as("nij"))
    val perSubj = nij.groupBy(col("subj"))
      .agg(sum(col("nij")).as("mi"), sum(col("nij") * col("nij")).as("sq"))
      .where(col("mi") === m.toLong)
    val agg = perSubj.agg(count(lit(1)).as("n_subjects"),
      sum(col("sq")).as("ssq"))
    val c2 = nij.join(perSubj.select(col("subj")), Seq("subj"))
      .groupBy(col("cat")).agg(sum(col("nij")).as("cj"))
      .agg(coalesce(sum(col("cj") * col("cj")), lit(0L)).as("c2"))
    // 1-row × 1-row cross join (the j1 deliberate family)
    val nD = col("n_subjects").cast("double")
    val pbar = (col("ssq") - col("n_subjects") * m).cast("double") /
      (nD * lit(m.toDouble) * lit((m - 1).toDouble))
    val pe = col("c2").cast("double") /
      ((nD * lit(m.toDouble)) * (nD * lit(m.toDouble)))
    agg.crossJoin(c2)
      .select(col("n_subjects"), lit(m.toLong).as("m"), col("ssq"),
        col("c2"), round(pbar, 6).as("pbar"), round(pe, 6).as("pe"),
        round((pbar - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  /** Cramér's V effect size — the [0,1]-normalized strength the raw chi²
    * can't convey (chi² grows with n; V doesn't). One row
    * `(n, r, c, chi2, v)`.
    *
    * [[contingencyDF]] emits OBSERVED cells only; a structurally-missing
    * cell (O = 0) still owes chi² its expectation `rt·ct/n`. Since
    * Σ_all-cells E = n exactly, the missing mass is `n − Σ_observed E` —
    * recovered here as a SECOND running chain over the same cell order
    * (both chains' last links taken via max over their non-negative
    * partial sums), so the completed chi² and V replay bit-for-bit.
    * `V = sqrt(chi2 / (n·min(r−1, c−1)))`. */
  def cramersVDF(df: DataFrame, rCol: String, cCol: String): DataFrame = {
    val runW = Window.partitionBy().orderBy(col(rCol).asc, col(cCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = contingencyDF(df, rCol, cCol)
      .withColumn("__exp_run", sum(col("expected")).over(runW))
    val nD = col("n").cast("double")
    val chi2Full = col("chi2o") + (nD - col("expo"))
    cells.agg(
        sum(col("o")).as("n"),
        countDistinct(col(rCol)).as("r"),
        countDistinct(col(cCol)).as("c"),
        max(col("chi2_running")).as("chi2o"),
        max(col("__exp_run")).as("expo"))
      .select(col("n"), col("r"), col("c"),
        round(chi2Full, 6).as("chi2"),
        round(sqrt(chi2Full / (nD *
          least(col("r") - 1, col("c") - 1).cast("double"))), 6).as("v"))
  }
}
