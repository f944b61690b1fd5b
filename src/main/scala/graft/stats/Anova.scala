package graft.stats

import org.apache.spark.sql.DataFrame
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
        round(ssw, 4).as("ssw_running"),
        round(ssb, 4).as("ssb_running"),
        round((ssb / (col("k") - lit(1.0))) /
          (ssw / (col("bigN") - col("k"))), 6).as("f_running"))
      .orderBy(col("grp"))
  }
}
