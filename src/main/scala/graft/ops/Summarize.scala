package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{array, col, explode, grouping, lit, struct, when}

/** Named aggregation functions for the summary engine (SURVEY §2.5 A1-A6).
  *
  * The reference builds its median by constructing the internal Catalyst
  * `ApproximatePercentile` node directly (`utils.scala:226-234`); the public
  * `percentile` / `percentile_approx` functions cover that since Spark 3.1 —
  * no internal-API poke, and the expression stays codegen-friendly.
  */
final case class AggSpec(name: String, fn: Column => Column)

object AggSpec {
  val sum: AggSpec = AggSpec("sum", F.sum)
  /** Exact interpolated median (`utils.scala:226-234,240`). Exact `percentile`
    * matches the DuckDB oracle's `quantile_cont`; at very large scale swap to
    * [[approxMedian]] (t-digest sketch, constant memory per group). */
  val median: AggSpec = AggSpec("median", c => F.percentile(c, lit(0.5)))
  def approxMedian(accuracy: Int = 10000): AggSpec =
    AggSpec("median", c => F.percentile_approx(c, lit(0.5), lit(accuracy)))
  val min: AggSpec = AggSpec("min", F.min)
  val max: AggSpec = AggSpec("max", F.max)
  /** Non-null count (`utils.scala:247`). */
  val count: AggSpec = AggSpec("count", F.count)
  /** Count of `true` in a boolean column, nulls ignored — the reference's
    * `regexp_replace`-through-strings trick (`utils.scala:243`) reduced to
    * `count_if`. */
  val countTrues: AggSpec = AggSpec("countTrues", c => F.count_if(c.cast("boolean")))
  val avg: AggSpec = AggSpec("avg", F.avg)
}

/** The categorized-aggregation "summary engine" — the reference's centerpiece
  * (`createTableCategorized` + `setModificationToCol`, `utils.scala:183-220`).
  *
  * Semantics: for aggregations × metrics × ({All} ++ categories), emit one row
  * per (category value, aggregation name) with output schema
  * `Division, DivisionCategory, aggregation, <metric columns>`.
  *
  * The reference computes this as a window-aggregate-per-category followed by
  * `.distinct()` (`utils.scala:188,209`) — one full shuffle per category per
  * aggregation, plus a distinct shuffle to collapse duplicated rows: O(cats ×
  * aggs) passes over the data.
  *
  * Here it is a single `GROUPING SETS ((), (cat1), (cat2), …)` pass: ONE
  * shuffle over the input computes every aggregation × metric at once (partial
  * aggregation map-side, so the shuffle carries only group states, not rows),
  * and the aggregation-name dimension is unpivoted afterwards on the tiny
  * aggregated result. `cube`/`rollup` would be wrong — the reference never
  * produces cross-category combinations, only single-category sets.
  */
object Summarize {

  /** @param metrics (inputColumn, outputName) pairs
    * @param cats    (categoryColumn, divisionLabel) pairs; the label is what
    *                the reference passes as the human-readable division name
    */
  def summarize(
      df: DataFrame,
      aggs: Seq[AggSpec],
      metrics: Seq[(String, String)],
      cats: Seq[(String, String)]): DataFrame = {
    require(aggs.nonEmpty && metrics.nonEmpty, "need at least one aggregation and metric")

    val catCols = cats.map { case (c, _) => col(c) }
    // the empty set = the reference's global "All" branch (utils.scala:211-218)
    val sets: Seq[Seq[Column]] = Seq.empty[Column] +: cats.map { case (c, _) => Seq(col(c)) }

    // every (agg, metric) cell in one pass; cast to double so the later
    // unpivot unions type-uniform columns (count:Long vs sum:Double etc.)
    val cells = for { a <- aggs; (m, out) <- metrics }
      yield a.fn(col(m)).cast("double").as(s"${a.name}__$out")
    // grouping() flags disambiguate "category value is NULL" from "column not
    // in this grouping set"
    val flags = cats.map { case (c, _) => grouping(col(c)).as(s"__grouping__$c") }
    val aggExprs = cells ++ flags

    val grouped =
      if (cats.isEmpty) df.agg(aggExprs.head, aggExprs.tail: _*)
      else df.groupingSets(sets, catCols: _*).agg(aggExprs.head, aggExprs.tail: _*)

    val division =
      cats.foldRight(lit("All")) { case ((c, label), rest) =>
        when(col(s"__grouping__$c") === 0, lit(label)).otherwise(rest)
      }.as("Division")
    val divisionCategory =
      cats.foldRight(lit("All")) { case ((c, _), rest) =>
        when(col(s"__grouping__$c") === 0, col(c).cast("string")).otherwise(rest)
      }.as("DivisionCategory")

    // unpivot aggregation names via explode — ONE projection over the
    // aggregated frame (a union of per-agg projections would re-execute the
    // grouping-sets subplan once per aggregation unless exchange reuse
    // happens to kick in)
    val structs = aggs.map { a =>
      struct(lit(a.name).as("aggregation") +:
        metrics.map { case (_, out) => col(s"${a.name}__$out").as(out) }: _*)
    }
    grouped
      .select(division, divisionCategory, explode(array(structs: _*)).as("__r"))
      .select(col("Division") +: col("DivisionCategory") +:
        col("__r.aggregation").as("aggregation") +:
        metrics.map { case (_, out) => col(s"__r.$out").as(out) }: _*)
  }
}
