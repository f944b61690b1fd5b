package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-bracketed EXACT quantiles — the scale path for percentiles
  * that never global-sorts and never shuffles the corpus by value:
  *
  *  1. ONE pass builds a mergeable MRL sketch
  *     ([[graft.expressions.MrlQuantileSketch]]): bounded state per
  *     partition, only sketches cross the network, a self-tracked
  *     certified rank envelope `±err`.
  *  2. The sketch's envelope turns each target rank into a VALUE BRACKET
  *     `(lo, hi]` (driver-side, on the ≤ k·levels summary — a bounded
  *     protocol).
  *  3. A second pass verifies the brackets against EXACT counts
  *     (`count(≤ lo) < rank ≤ count(≤ hi)`; a violated envelope fails
  *     loudly — the a11 certificate doctrine) and reads the exact type-1
  *     quantile off the bracket's cell cumsum — cells are rank-width-
  *     bounded (≈ 2·err rows), never corpus-sized.
  *
  * The output is therefore the EXACT quantile — bit-identical on any
  * partitioning even though the sketch itself is partitioning-dependent —
  * at two linear scans + one tiny shuffle, versus the one full
  * value-shuffle of the direct cell-cumsum form ([[Quality
  * .quantileBands]]): the right trade at 100 TB where the distinct-value
  * cell frame is itself enormous.
  *
  * Targets are RATIONAL (`num/den`) so the rank `⌈q·n⌉ = (num·n + den −
  * 1) DIV den` is integer on both engines. Values are cent integers
  * (DECIMAL(12,2)·100). Returns one row per target:
  * `(q_num, q_den, n, target_rank, value)` value in original units. */
object SketchQuantiles {

  def quantiles(df: DataFrame, valueCol: String, qs: Seq[(Int, Int)],
      k: Int = 256): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile target")
    qs.foreach { case (num, den) =>
      require(num > 0 && num <= den, s"bad quantile $num/$den") }
    val spark = df.sparkSession
    import spark.implicits._
    val vc = (col(valueCol).cast("decimal(12,2)") * 100).cast("long").as("vc")
    val base = df.where(col(valueCol).isNotNull).select(vc)

    // pass 1: the sketch (bounded state; one row to the driver)
    val sk = base.agg(graft.expressions.MrlQuantileSketch
      .mrlSketch(col("vc"), k).as("s")).head().getStruct(0)
    val n = sk.getLong(0)
    val err = sk.getLong(1)
    require(n > 0, "no non-null rows to compute quantiles over")
    val items = sk.getSeq[Row](2).map(r => (r.getLong(0), r.getLong(1)))

    // brackets from the certified envelope: prefix ± err
    val prefixes = items.scanLeft(0L)(_ + _._2).tail
    val targets = qs.map { case (num, den) =>
      val rank = (num.toLong * n + den - 1) / den
      // lo: largest item with prefix + err < rank (count(≤lo) provably < rank)
      val loIdx = items.indices.lastIndexWhere(i => prefixes(i) + err < rank)
      val lo = if (loIdx < 0) Long.MinValue else items(loIdx)._1
      // hi: smallest item with prefix − err ≥ rank; the max item is exact
      // under keep-larger compaction, so it is always a valid fallback
      val hiIdx = items.indices.indexWhere(i => prefixes(i) - err >= rank)
      val hi = if (hiIdx < 0) items.last._1 else items(hiIdx)._1
      (num, den, rank, lo, hi)
    }

    // pass 2a: exact certificate — count(≤lo) < rank AND count(≤hi) ≥ rank
    val certAggs = targets.zipWithIndex.flatMap { case ((_, _, _, lo, hi), j) =>
      Seq(
        sum(when(col("vc") <= lo, 1L).otherwise(0L)).as(s"below_$j"),
        sum(when(col("vc") <= hi, 1L).otherwise(0L)).as(s"upto_$j"))
    }
    val cert = base.agg(certAggs.head, certAggs.tail: _*).head()
    val bases = targets.zipWithIndex.map { case ((num, den, rank, _, _), j) =>
      val below = cert.getLong(2 * j)
      val upto = cert.getLong(2 * j + 1)
      require(below < rank && upto >= rank,
        s"sketch envelope violated for q=$num/$den: " +
          s"count≤lo=$below, count≤hi=$upto, rank=$rank (err=$err, n=$n)")
      (num, den, rank, below)
    }

    // pass 2b: exact type-1 quantile off the bracket cell cumsum —
    // each bracket holds ≤ ~2·err ranks, never the corpus
    val tagged = base.select(col("vc"), explode(array(
      targets.zipWithIndex.map { case ((_, _, _, lo, hi), j) =>
        when(col("vc") > lo && col("vc") <= hi, lit(j)).otherwise(lit(-1))
      }: _*)).as("j")).where(col("j") >= 0)
    val cells = tagged.groupBy(col("j"), col("vc")).agg(count(lit(1)).as("c"))
    val cw = Window.partitionBy(col("j")).orderBy(col("vc").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranksDf = bases.zipWithIndex.map { case ((num, den, rank, below), j) =>
      (j, num, den, rank, below)
    }.toDF("j", "q_num", "q_den", "target_rank", "below")
    cells
      .withColumn("ci", sum(col("c")).over(cw))
      .join(broadcast(ranksDf), "j")
      .where(col("below") + col("ci") >= col("target_rank"))
      .groupBy(col("q_num"), col("q_den"), col("target_rank"))
      .agg(min(col("vc")).as("vc"))
      .select(col("q_num").cast("long").as("q_num"),
        col("q_den").cast("long").as("q_den"), lit(n).as("n"),
        col("target_rank"),
        (col("vc").cast("double") / lit(100.0)).as("value"))
      .orderBy(col("q_num").cast("double") / col("q_den").cast("double"))
  }
}
