package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact categorical Naive Bayes, trained and scored in one relational
  * plan (NOT-IN-REFERENCE §2.9 extension — the generative sibling of
  * [[Logistic]]'s discriminative cell-frame fit).
  *
  * Every sufficient statistic of categorical NB is a COUNT, so the whole
  * model is exact integers: ONE corpus-sized `GROUPING SETS` pass (the
  * Summarize engine doctrine) collects the cell×class, per-feature×class,
  * and class-marginal counts together; everything downstream lives on
  * value-level frames. The Laplace-smoothed log-odds
  * `ln(N₁/N₀) + Σᵢ ln((cᵢ₁+1)/(N₁+Kᵢ)) − ln((cᵢ₀+1)/(N₀+Kᵢ))` is a FIXED
  * left-to-right tree of `ln` over exact-integer doubles (the r26
  * convention), so a relational replay reproduces scores and argmax
  * bit-for-bit; the predicted class reads off the ROUND-6 log-odds so
  * both engines decide from the value they output. */
object NaiveBayes {

  /** Score every distinct feature combination (the cell frame): one row
    * per cell ordered by the features, carrying the cell census `(n, y1)`,
    * the fixed-tree `log_odds`, and `pred` (1 iff round-6 log-odds > 0).
    * Rows with a NULL label or feature drop. Features are small-int
    * expressions (0/1 bins or codes); the per-feature frames are
    * value-level, broadcast back onto the cells. */
  def fitScoreCells(df: DataFrame, label: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "fitScoreCells needs at least one feature")
    val names = features.map(_._1)
    val k = names.size
    val notNull = features.map(_._2.isNotNull).reduce(_ && _) && label.isNotNull
    val base = df.where(notNull)
      .select(features.map { case (n, c) => c.cast("int").as(n) } :+
        label.cast("int").as("__y"): _*)
    val yc = col("__y")
    // grouping_id bit weights: column j of (f₀…f_{k−1}, y) carries 2^(k−j)
    def gidOf(grouped: Set[Int]): Long =
      names.indices.filterNot(grouped).map(j => 1L << (k - j)).sum
    val sets: Seq[Seq[Column]] =
      Seq(names.map(col) :+ yc) ++
        names.indices.map(i => Seq(col(names(i)), yc)) :+ Seq(yc)
    val counts = base.groupingSets(sets, names.map(col) :+ yc: _*)
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
    val cells = counts.where(col("gid") === 0L)
      .groupBy(names.map(col): _*)
      .agg(sum(col("cnt")).as("n"), sum(col("cnt") * yc).as("y1"))
    val prior = counts.where(col("gid") === gidOf(Set.empty))
      .agg(coalesce(sum(when(yc === 1, col("cnt"))), lit(0L)).as("n1"),
        coalesce(sum(when(yc === 0, col("cnt"))), lit(0L)).as("n0"))
    // per-feature conditional frames: value-level; the distinct-value
    // count Kᵢ rides a deliberate (tiny-frame) global window
    val featFrames = names.indices.map { i =>
      counts.where(col("gid") === gidOf(Set(i)))
        .groupBy(col(names(i)))
        .agg(coalesce(sum(when(yc === 1, col("cnt"))), lit(0L)).as(s"c1_$i"),
          coalesce(sum(when(yc === 0, col("cnt"))), lit(0L)).as(s"c0_$i"))
        .withColumn(s"k_$i", count(lit(1)).over(Window.partitionBy()))
    }
    var scored = cells.crossJoin(broadcast(prior))
    names.indices.foreach { i =>
      scored = scored.join(broadcast(featFrames(i)), names(i))
    }
    val priorTerm = log(col("n1").cast("double")) - log(col("n0").cast("double"))
    val lo = names.indices.foldLeft(priorTerm) { (acc, i) =>
      acc + ((log((col(s"c1_$i") + lit(1L)).cast("double")) -
        log((col("n1") + col(s"k_$i")).cast("double"))) -
        (log((col(s"c0_$i") + lit(1L)).cast("double")) -
          log((col("n0") + col(s"k_$i")).cast("double"))))
    }
    scored
      .select(names.map(col) ++ Seq(col("n"), col("y1"),
        round(lo, 6).as("log_odds"),
        when(round(lo, 6) > 0.0, 1L).otherwise(0L).as("pred")): _*)
      .orderBy(names.map(col): _*)
  }
}
