package graft.stats

import org.apache.spark.sql.DataFrame
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
