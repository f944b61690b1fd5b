package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (NOT-IN-REFERENCE extension; the steering's canonical
  * "operator Spark lacks"): for every left row, attach the latest right row
  * with `rightTime <= leftTime`, per key.
  *
  * Spark-first composition (preference order (a) — no custom plan node
  * needed): tag and union both sides, ONE shuffle partitioned by key and
  * sorted by (time, side), then a running `last_value(ignoreNulls)` window
  * carries each right row forward to the left rows that follow it. This is
  * O(n log n) per key partition with a single exchange — the naive
  * range-join formulation plans a nested loop over |L|×|R| per key.
  * Right-side ties on the same timestamp resolve deterministically by the
  * carried struct's field order (lexicographically largest carried row wins
  * — put an id column first in `rightValues` to tie-break by id). Right rows
  * sort before left rows at equal times, i.e. `<=` semantics like
  * DuckDB/pandas ASOF.
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side (its latest row at-or-before wins)
    * @param keys        equi-join key column names (present on both sides)
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param rightValues right columns to carry (name → output name)
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightValues: Seq[(String, String)]): DataFrame = {
    require(rightValues.nonEmpty, "asofBackward needs at least one right column to carry")
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)

    // the carried right columns travel as ONE struct: the running last() must
    // pick a whole right ROW, never mix columns from different right rows,
    // and a matched right row whose carried column is NULL must yield NULL
    // (ignoreNulls on individual columns would resurrect older values)
    val rStruct = struct(rightValues.map { case (in, out) => col(in).as(out) }: _*)
    val l = left.select(
      keyCols ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) :+
        lit(null).as("__r"): _*)
    val r = right.select(
      keyCols ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(s"__l_$c")) :+
        rStruct.as("__r"): _*)

    // right rows (side=0) sort before left rows at the same timestamp →
    // a same-instant right row IS visible to the left row (<= semantics);
    // right-right timestamp ties resolve by the carried struct's field order
    // (lexicographically largest wins) so the running last() is deterministic
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = false)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))

    carried.where(col("__side") === 1).select(
      keyCols ++
        Seq(col("__t").as(leftTime)) ++
        leftCols.filterNot(k => keys.contains(k) || k == leftTime)
          .map(c => col(s"__l_$c").as(c)) ++
        rightValues.map { case (_, out) => col(s"__c.$out").as(out) }: _*)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row
    * at-or-after its timestamp (`>=` semantics — a same-instant right row
    * matches), per key. pandas `merge_asof(direction='forward')`;
    * the mirror of [[asofBackward]] — same union + one partitioned
    * running window, just iterated in DESCENDING time order, so the plan
    * shape (one shuffle on the key, no range join) is identical.
    *
    * Right-right timestamp ties resolve by the carried struct's field
    * order (lexicographically largest wins) — callers needing a
    * deterministic oracle should pre-dedup the right side to one row per
    * (key, time). */
  def asofForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightValues: Seq[(String, String)]): DataFrame = {
    require(rightValues.nonEmpty, "asofForward needs at least one right column to carry")
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)
    val rStruct = struct(rightValues.map { case (in, out) => col(in).as(out) }: _*)
    val l = left.select(
      keyCols ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) :+
        lit(null).as("__r"): _*)
    val r = right.select(
      keyCols ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(s"__l_$c")) :+
        rStruct.as("__r"): _*)
    // DESC time: right rows at the same instant iterate BEFORE left rows
    // (side asc), so a same-time right row is visible (>= semantics)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").desc, col("__side").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = false)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    carried.where(col("__side") === 1).select(
      keyCols ++
        Seq(col("__t").as(leftTime)) ++
        leftCols.filterNot(k => keys.contains(k) || k == leftTime)
          .map(c => col(s"__l_$c").as(c)) ++
        rightValues.map { case (_, out) => col(s"__c.$out").as(out) }: _*)
  }
}
