package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join by BINNED BLOCKING — the scale-safe plan for
  * `l.start ≤ r.end AND r.start ≤ l.end`, which Spark would otherwise
  * execute as a broadcast-nested-loop (every pair tested, O(|L|·|R|); the
  * same trap as the naive as-of join, `ops.AsOfJoin`).
  *
  * Each interval explodes into the fixed-width bins it touches; candidates
  * join ON THE BIN (hash-partitioned equi join — shuffle bounded by bin
  * co-occupancy, never all-pairs), the exact overlap predicate filters
  * row-locally, and each overlapping pair is emitted EXACTLY ONCE by its
  * OWNING bin — the bin containing the overlap's start, the same
  * single-emission contract as the LSH owning band — so no distinct()
  * shuffle is needed.
  *
  * `binWidth` (in the interval unit, e.g. epoch-micros) trades explode
  * fan-out (intervals spanning many bins) against bin occupancy (too-wide
  * bins put unrelated intervals together). Set it near the typical
  * interval length; at 100 TB both knobs stay linear in the data.
  */
object IntervalJoin {

  /** Overlapping (left, right) interval pairs. Both inputs carry
    * `startCol` / `endCol` as LONGs (epoch micros or any integer
    * timeline), inclusive bounds; the right side's bounds are renamed to
    * `<startCol>_r` / `<endCol>_r` in the output (other columns must be
    * caller-disjoint). Every pair with `lStart ≤ rEnd ∧ rStart ≤ lEnd`
    * appears exactly once. */
  def overlapJoin(left: DataFrame, right: DataFrame,
      startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val rs = s"${startCol}_r"; val re = s"${endCol}_r"
    // bins are keyed by their START VALUE (floor-aligned to binWidth) in
    // pure LONG arithmetic — `x - pmod(x, w)` is the exact floor alignment
    // for any long, negative included. The earlier `floor(x / w)` form went
    // through DOUBLE division, which mis-bins (and silently drops pairs)
    // once |x| leaves the 2^53 exact-integer range — real at 100 TB with
    // arbitrary integer timelines.
    def align(x: Column) = (x - pmod(x, lit(binWidth))).cast("long")
    def bins(s: Column, e: Column) =
      explode(sequence(align(s), align(e), lit(binWidth)))
    val lb = left.withColumn("__bin", bins(col(startCol), col(endCol)))
    val rb = right.withColumnRenamed(startCol, rs).withColumnRenamed(endCol, re)
      .withColumn("__rbin", bins(col(rs), col(re)))
    // owning bin = the bin holding max(lStart, rStart) — the first bin
    // where BOTH intervals are present; row-local, no dedup shuffle
    lb.join(rb, col("__bin") === col("__rbin") &&
        col(startCol) <= col(re) && col(rs) <= col(endCol) &&
        col("__bin") === align(greatest(col(startCol), col(rs))))
      .drop("__bin", "__rbin")
  }
}
