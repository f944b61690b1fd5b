package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling (NOT-IN-REFERENCE extension — the `ANALYZE TABLE` /
  * data-catalog surface a 100 TB lakehouse runs before anything else;
  * reference kinship: the §2.6 quality report counts, generalized to
  * per-column census form).
  *
  * One row per profiled column: row count, non-null count, EXACT distinct
  * count, min/max, and the modal value with its frequency (ties broken by
  * smallest value — deterministic, engine-independent).
  *
  * Plan: TWO jobs regardless of column count. Pass 1 is a single
  * conditional aggregation (counts + min/max for every column at once).
  * Pass 2 stacks the columns into (column, value) CELLS via one explode —
  * k·rows intermediate, map-side combined into per-(column, value) counts
  * before the only shuffle — then per-column distincts and modes come
  * from the CELL frame (value-level, never row-level) with windows
  * PARTITIONED by column. Values profile as strings (the cast is part of
  * the contract: cross-type min/max and modes need one total order). */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    // pass 1: one aggregation row — totals, nulls, extrema
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(count(s).as(s"__nn_$c"), min(s).as(s"__mn_$c"), max(s).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = one.getLong(0)
    val base = cols.zipWithIndex.map { case (c, i) =>
      (c, one.getLong(1 + 3 * i), one.getString(2 + 3 * i), one.getString(3 + 3 * i))
    }
    import spark.implicits._
    val baseDf = base.toDF("column", "n_nonnull", "min_value", "max_value")
    // pass 2: stacked cells → per-(column, value) counts → distinct + mode
    val cells = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*))
        .as("cell"))
      .select(col("cell.column"), col("cell.value"))
      .where(col("value").isNotNull)
      .groupBy(col("column"), col("value")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("column"))
      .orderBy(col("cnt").desc, col("value").asc)
    val perCol = cells
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("column"))
      .agg(count(lit(1)).as("n_distinct"),
        max(when(col("__rn") === 1, col("value"))).as("top_value"),
        max(when(col("__rn") === 1, col("cnt"))).as("top_count"))
    baseDf.join(perCol, Seq("column"), "left")
      .select(col("column"), lit(nRows).as("n_rows"), col("n_nonnull"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"), col("top_value"),
        coalesce(col("top_count"), lit(0L)).as("top_count"))
      .orderBy(col("column"))
  }
}
