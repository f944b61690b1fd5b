package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed count+sum rollup from a
  * [[SnapshotTable]] row-level change feed — the materialized-view pattern
  * that keeps a 100 TB rollup affordable: applying the deltas of the 0.1%
  * of rows that changed costs O(|changes|), where the batch recompute the
  * result is provably equal to costs O(|corpus|).
  *
  * Contract: the summary table's schema is `groupCols ++ (countName:
  * BIGINT) ++ sumCols aliases: DECIMAL(28,2)`; build it once with
  * [[summarize]], keep it current with [[applyChanges]] after each batch
  * of base commits. Sums are carried as DECIMAL end to end, so the
  * incremental total is EXACTLY the batch recompute (decimal addition is
  * associative and order-independent; double sums would drift with
  * accumulation order) — the s14 oracle certifies that equality
  * relationally.
  *
  * Exactness needs the applied feed slice to be row-level: commit base
  * merges/deletes with `changeCapture = true` (append and overwrite
  * file-diff events are row-exact already — NOTES_r10). Maintained
  * aggregates must form a commutative group under +/−: count and sum
  * qualify (avg = sum/count at read time); min/max do NOT (a deleted
  * extremum cannot be un-min'd) — [[applyChangesWithMinMax]] maintains
  * them with the standard retraction hybrid: monotone fold for arrivals,
  * per-group base rescan ONLY for the groups whose current extremum was
  * retracted.
  */
object IncrementalAgg {
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Batch-build the summary frame the incremental path maintains:
    * one exact count + DECIMAL(28,2) sum per group. */
  def summarize(base: DataFrame, groupCols: Seq[String],
      sumCols: Seq[(String, String)], countName: String = "n"): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countName),
        sumCols.map { case (c, a) =>
          sum(dec(c)).cast("decimal(28,2)").as(a) }: _*)

  /** [[summarize]] plus exact MIN/MAX per group: `minMaxCols` maps a value
    * column to its (minAlias, maxAlias) pair (stored as the value column's
    * own type — extrema are exact picks, no FP-association hazard). */
  def summarizeWithMinMax(base: DataFrame, groupCols: Seq[String],
      sumCols: Seq[(String, String)], minMaxCols: Seq[(String, String, String)],
      countName: String = "n"): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countName),
        sumCols.map { case (c, a) =>
          sum(dec(c)).cast("decimal(28,2)").as(a) } ++
        minMaxCols.flatMap { case (c, mn, mx) =>
          Seq(min(col(c)).as(mn), max(col(c)).as(mx)) }: _*)

  /** [[applyChanges]] for summaries that ALSO carry min/max — the standard
    * retraction hybrid: arrivals fold monotonically
    * (least/greatest against the stored extremum), and only the groups
    * whose CURRENT extremum was retracted (a delete/preimage ≤ stored min
    * or ≥ stored max) rescan their slice of the base — O(|changed groups'
    * rows|), never the whole table, and only when a retraction actually
    * threatens the extremum. Count/sum behave exactly as in
    * [[applyChanges]]. */
  def applyChangesWithMinMax(spark: SparkSession, baseRoot: String,
      summaryRoot: String, fromVersion: Int, groupCols: Seq[String],
      sumCols: Seq[(String, String)], minMaxCols: Seq[(String, String, String)],
      countName: String = "n"): Int = {
    require(minMaxCols.nonEmpty, "use applyChanges when no min/max is kept")
    val feed = SnapshotTable.readChanges(spark, baseRoot, fromVersion)
    if (feed.isEmpty) return SnapshotTable.latestVersion(summaryRoot)
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val aggExprs =
      Seq(sum(col("__sign")).as("__dn")) ++
      sumCols.map { case (c, a) =>
        sum(col("__sign") * dec(c)).cast("decimal(28,2)").as(s"__d_$a") } ++
      minMaxCols.flatMap { case (c, mn, mx) => Seq(
        min(when(col("__sign") === 1L, col(c))).as(s"__arr_$mn"),
        max(when(col("__sign") === 1L, col(c))).as(s"__arr_$mx"),
        min(when(col("__sign") === -1L, col(c))).as(s"__ret_$mn"),
        max(when(col("__sign") === -1L, col(c))).as(s"__ret_$mx")) }
    val deltas = feed.withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    val cur = SnapshotTable.read(spark, summaryRoot)
    val joined = deltas.join(cur, groupCols, "left")
    val threatened = minMaxCols.map { case (_, mn, mx) =>
      (col(s"__ret_$mn").isNotNull && col(mn).isNotNull &&
        col(s"__ret_$mn") <= col(mn)) ||
      (col(s"__ret_$mx").isNotNull && col(mx).isNotNull &&
        col(s"__ret_$mx") >= col(mx))
    }.reduce(_ || _)
    val marked = joined.withColumn("__rescan", coalesce(threatened, lit(false)))
    val rescanKeys = marked.where(col("__rescan"))
      .select(groupCols.map(col): _*)
    val rsAggs = minMaxCols.flatMap { case (c, mn, mx) =>
      Seq(min(col(c)).as(s"__rs_$mn"), max(col(c)).as(s"__rs_$mx")) }
    val rescanAgg = SnapshotTable.read(spark, baseRoot)
      .join(broadcast(rescanKeys), groupCols, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(rsAggs.head, rsAggs.tail: _*)
    val upserts = marked.join(rescanAgg, groupCols, "left")
      .select(groupCols.map(col) ++
        Seq((coalesce(col(countName), lit(0L)) + col("__dn")).as(countName)) ++
        sumCols.map { case (_, a) =>
          (coalesce(col(a), lit(0).cast("decimal(28,2)")) + col(s"__d_$a"))
            .cast("decimal(28,2)").as(a) } ++
        minMaxCols.flatMap { case (_, mn, mx) => Seq(
          when(col("__rescan"), col(s"__rs_$mn"))
            .otherwise(least(col(mn), col(s"__arr_$mn"))).as(mn),
          when(col("__rescan"), col(s"__rs_$mx"))
            .otherwise(greatest(col(mx), col(s"__arr_$mx"))).as(mx)) }: _*)
    val v = SnapshotTable.merge(upserts, summaryRoot, groupCols)
    val (v2, _, _) = SnapshotTable.deleteWhere(spark, summaryRoot,
      col(countName) === 0)
    math.max(v, v2)
  }

  /** Fold the base table's changes SINCE `fromVersion` (exclusive — pass
    * the base version the summary currently reflects; versions
    * fromVersion+1 .. head are folded, `readChanges` semantics) into the
    * summary table: inserts/update_postimages count +1, deletes/
    * update_preimages −1, per-group delta sums merge into the existing
    * rows (absent groups start at zero), and groups the changes emptied
    * are physically deleted so the summary's ROW SET also equals the
    * batch recompute's. Returns the summary's new version. */
  def applyChanges(spark: SparkSession, baseRoot: String, summaryRoot: String,
      fromVersion: Int, groupCols: Seq[String],
      sumCols: Seq[(String, String)], countName: String = "n"): Int = {
    val feed = SnapshotTable.readChanges(spark, baseRoot, fromVersion)
    if (feed.isEmpty) return SnapshotTable.latestVersion(summaryRoot)
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val deltas = feed.withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        sumCols.map { case (c, a) =>
          sum(col("__sign") * dec(c)).cast("decimal(28,2)").as(s"__d_$a") }: _*)
    val cur = SnapshotTable.read(spark, summaryRoot)
    // only CHANGED groups are touched: the upsert frame is delta-sized,
    // untouched summary rows never rewrite (merge's keep side)
    val upserts = deltas.join(cur, groupCols, "left")
      .select(groupCols.map(col) ++
        Seq((coalesce(col(countName), lit(0L)) + col("__dn")).as(countName)) ++
        sumCols.map { case (_, a) =>
          (coalesce(col(a), lit(0).cast("decimal(28,2)")) + col(s"__d_$a"))
            .cast("decimal(28,2)").as(a) }: _*)
    val v = SnapshotTable.merge(upserts, summaryRoot, groupCols)
    val (v2, _, _) = SnapshotTable.deleteWhere(spark, summaryRoot,
      col(countName) === 0)
    math.max(v, v2)
  }
}
