package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** SQL:2016 GROUPS window frames + EXCLUDE clauses for Spark, which
  * natively supports neither (frames are ROWS/RANGE only, no exclusion).
  * Both emulate EXACTLY:
  *
  *  - `dense_rank` over the partition's order is gapless, so an integer
  *    RANGE frame over the dense-rank column IS a GROUPS frame: peer
  *    groups g−lo .. g+hi. (w6's contract, hash-verified against DuckDB's
  *    native frame-EXCLUDE evaluation.)
  *  - EXCLUDE GROUP / CURRENT ROW / TIES are frame-aggregate corrections:
  *    subtract the peer-group aggregate (RANGE 0..0) or the row's own
  *    value. For non-subtractable aggregates (min/max), compose from the
  *    adjacent disjoint frames instead.
  *  - an EXCLUDE that empties the frame yields NULL (the standard's
  *    semantics), guarded here by surviving-row counts.
  *
  * Usage: add the group ordinal once with [[withGroupOrdinal]], then build
  * frames with [[groupsBetween]] and the exclude helpers. All inputs for
  * sums should be exact types (DECIMAL/long) so the subtractions are
  * lossless — the same discipline as every other exact-sum operator here.
  */
object GroupsFrames {

  /** Add `ordinalCol` = dense_rank over (partition, order) — the gapless
    * group index every GROUPS frame is built on. One window pass. */
  def withGroupOrdinal(df: org.apache.spark.sql.DataFrame, ordinalCol: String,
      partitionBy: Seq[Column], orderBy: Seq[Column]): org.apache.spark.sql.DataFrame =
    df.withColumn(ordinalCol,
      dense_rank().over(Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*))
        .cast("long"))

  /** The WindowSpec for GROUPS BETWEEN `lo` PRECEDING AND `hi` FOLLOWING
    * over the ordinal added by [[withGroupOrdinal]]. */
  def groupsBetween(partitionBy: Seq[Column], ordinal: Column,
      lo: Long, hi: Long): WindowSpec =
    Window.partitionBy(partitionBy: _*).orderBy(ordinal).rangeBetween(lo, hi)

  /** agg over the frame EXCLUDE GROUP: frame minus the whole peer group;
    * NULL when no non-NULL input survives (SQL's empty-input semantics for
    * sum). `agg` must be a VALUE-ADDITIVE aggregate (sum over exact types).
    *
    * NULL discipline (all three exclude helpers): a NULL input row
    * contributes nothing to a SQL aggregate, so exclusions subtract
    * `coalesce(value, 0)` — never the raw value, which would NULL the whole
    * result — and the survives-guard counts NON-NULL inputs the aggregate
    * would actually see (`count(value)`), not frame rows. */
  def excludeGroup(aggCol: Column => Column, value: Column,
      frame: WindowSpec, peerFrame: WindowSpec): Column =
    when(count(value).over(frame) === count(value).over(peerFrame), lit(null))
      .otherwise(coalesce(aggCol(value).over(frame), lit(0)) -
        coalesce(aggCol(value).over(peerFrame), lit(0)))

  /** agg over the frame EXCLUDE CURRENT ROW; NULL when the row was the
    * frame's only non-NULL input (or the frame had none). */
  def excludeCurrentRow(aggCol: Column => Column, value: Column,
      frame: WindowSpec): Column =
    when(count(value).over(frame) -
        when(value.isNotNull, lit(1)).otherwise(lit(0)) === 0, lit(null))
      .otherwise(coalesce(aggCol(value).over(frame), lit(0)) -
        coalesce(value, lit(0)))

  /** agg over the frame EXCLUDE TIES: peers leave, the current row stays.
    * NULL when neither the current row nor any non-peer frame row carries a
    * non-NULL input — the standard's empty-aggregate semantics. */
  def excludeTies(aggCol: Column => Column, value: Column,
      frame: WindowSpec, peerFrame: WindowSpec): Column = {
    val survivors = count(value).over(frame) - count(value).over(peerFrame) +
      when(value.isNotNull, lit(1)).otherwise(lit(0))
    when(survivors === 0, lit(null))
      .otherwise(coalesce(aggCol(value).over(frame), lit(0)) -
        coalesce(aggCol(value).over(peerFrame), lit(0)) +
        coalesce(value, lit(0)))
  }

  /** min/max over GROUPS lo..hi EXCLUDE GROUP — non-subtractable
    * aggregates compose from the two DISJOINT adjacent frames instead
    * (groups lo..−1 and +1..hi); `least`/`greatest` of two window minima
    * is exact, and an emptied side contributes NULL which both ignore.
    * NULL overall when both sides are empty — the standard's semantics. */
  def excludeGroupMin(value: Column, partitionBy: Seq[Column], ordinal: Column,
      lo: Long, hi: Long): Column =
    disjointCompose(isMin = true, value, partitionBy, ordinal, lo, hi)

  def excludeGroupMax(value: Column, partitionBy: Seq[Column], ordinal: Column,
      lo: Long, hi: Long): Column =
    disjointCompose(isMin = false, value, partitionBy, ordinal, lo, hi)

  private def disjointCompose(isMin: Boolean, value: Column,
      partitionBy: Seq[Column], ordinal: Column, lo: Long, hi: Long): Column = {
    require(lo <= -1 || hi >= 1, "EXCLUDE GROUP over a group-only frame is always NULL")
    def agg(c: Column) = if (isMin) min(c) else max(c)
    val before =
      if (lo <= -1) Some(agg(value).over(groupsBetween(partitionBy, ordinal, lo, -1)))
      else None
    val after =
      if (hi >= 1) Some(agg(value).over(groupsBetween(partitionBy, ordinal, 1, hi)))
      else None
    (before, after) match {
      case (Some(b), Some(a)) => // least/greatest skip NULLs (emptied side)
        if (isMin) least(b, a) else greatest(b, a)
      case (Some(b), None) => b
      case (None, Some(a)) => a
      case (None, None) => lit(null)
    }
  }
}
