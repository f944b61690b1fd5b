package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling (NOT-IN-REFERENCE extension): project an event
  * stream onto a fixed per-key time grid, carrying the latest observation
  * forward (gap filling). Composed from existing operators — per-key grid =
  * one aggregation + `sequence` explode, the fill = [[AsOfJoin]] (one
  * shuffle, no range nested-loop) — so the scale properties are inherited:
  * shuffle keyed by (key), grid size = span/step per key, never row-count².
  */
object Resample {

  /** One row per (key, grid instant) from floor(min ts) to floor(max ts) in
    * `step` intervals, with the latest `valCol` at-or-before each instant
    * (NULL before the first observation). `truncUnit` must floor-align with
    * `step` (e.g. "hour" + "INTERVAL 1 HOUR"). */
  def forwardFillGrid(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, truncUnit: String = "hour",
      step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val b = df.select(col(keyCol), col(tsCol), col(valCol))
      .where(col(tsCol).isNotNull)
    val spans = b.groupBy(col(keyCol))
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("__lo"),
        date_trunc(truncUnit, max(col(tsCol))).as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), expr(step))).as("__grid_ts"))
    AsOfJoin.asofBackward(grid, b, Seq(keyCol), "__grid_ts", tsCol,
        Seq(valCol -> "last_value"))
      .withColumnRenamed("__grid_ts", "grid_ts")
  }
}
