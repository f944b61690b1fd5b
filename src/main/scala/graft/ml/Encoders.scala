package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-encoding operators (NOT-IN-REFERENCE §2.9 extension — the
  * feature-engineering step between the reference's cleaning surface and
  * its model fits). */
object Encoders {

  /** Smoothed target (mean) encoding — the high-cardinality-categorical
    * workhorse: each category maps to a shrunk estimate of the label
    * mean, `enc = (n_c·mean_c + m·prior) / (n_c + m)`, pulling rare
    * categories toward the global prior (m = `smoothing` pseudo-counts).
    *
    * Exactness: multiplying through by N makes the estimate the single
    * division of two EXACT integers —
    * `enc = (y_c·N + m·Y) / (N·(n_c + m))` with y_c/n_c the category's
    * positive/total counts and Y/N the global ones; products ride
    * DECIMAL(38,0) so no overflow at any corpus size.
    *
    * Plan: one map-side-combined groupBy to the category frame plus a
    * broadcast 1-row global aggregate (the j1/t18 shape) — the corpus is
    * scanned twice and shuffled once, keyed by category.
    *
    * Returns `(cat, n, y_sum, enc)` ordered by category; NULL categories
    * and NULL labels drop. */
  def targetEncode(df: DataFrame, catCol: String, label: Column,
      smoothing: Long = 10L): DataFrame = {
    require(smoothing >= 0, s"smoothing must be ≥0, got $smoothing")
    val base = df.where(col(catCol).isNotNull && label.isNotNull)
      .select(col(catCol).cast("string").as("cat"), label.cast("int").as("y"))
    val perCat = base.groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("y_sum"))
    val global = base.agg(count(lit(1)).as("big_n"), sum(col("y")).as("big_y"))
    perCat.crossJoin(broadcast(global))
      .select(col("cat"), col("n"), col("y_sum"),
        round((col("y_sum").cast("decimal(38,0)") * col("big_n") +
            lit(smoothing) * col("big_y")).cast("double") /
          (col("big_n").cast("decimal(38,0)") *
            (col("n") + lit(smoothing))).cast("double"), 6).as("enc"))
      .orderBy(col("cat"))
  }
}
