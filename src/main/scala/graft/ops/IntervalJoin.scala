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

  /** Point-in-interval LOOKUP against a dimension of NON-OVERLAPPING
    * `[lo, hi]` long ranges — the IP-geolocation / tax-bracket /
    * rate-card join. A BETWEEN join plans as a broadcast nested loop
    * testing every (point, interval) pair; this is ZERO-shuffle on the
    * fact side instead: the dim's sorted interval STARTS broadcast as
    * one long array, each point binary-searches its candidate row-
    * locally ([[graft.expressions.SortedLowerBound]], whole-stage
    * codegen), and the index equi-joins back to the broadcast dim for
    * the carried columns. Non-overlap makes the latest-lo interval THE
    * unique candidate, so the lookup is exact — `require`-checked on the
    * collected dim (a bounded protocol: the dim must be
    * dimension-sized, capped at `maxIntervals`).
    *
    * Points outside every interval keep NULL carried columns and
    * `in_range = false` (left-join semantics). `dimValues` maps dim
    * column → output name. */
  def pointLookup(points: DataFrame, pointCol: String,
      dim: DataFrame, loCol: String, hiCol: String,
      dimValues: Seq[(String, String)],
      maxIntervals: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = points.sparkSession
    val bounds = dim.select(col(loCol).cast("long"), col(hiCol).cast("long"))
      .limit(maxIntervals + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(bounds.nonEmpty, "pointLookup needs a non-empty interval dim")
    require(bounds.length <= maxIntervals,
      s"interval dim exceeds maxIntervals=$maxIntervals")
    bounds.foreach { case (lo, hi) =>
      require(lo <= hi, s"interval [$lo, $hi] is inverted") }
    bounds.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => require(lo2 > hi1,
        s"pointLookup requires non-overlapping intervals — [.., $hi1] " +
          s"and [$lo2, ..] overlap; use overlapJoin for overlapping dims")
      case _ => ()
    }
    val bcLos = spark.sparkContext.broadcast(bounds.map(_._1))
    // the dim re-sorted with its index — dimension-sized global window
    val dimIdx = dim
      .withColumn("__idx",
        row_number().over(Window.orderBy(col(loCol).asc)) - 1)
      .select(Seq(col("__idx"), col(hiCol).cast("long").as("__hi")) ++
        dimValues.map { case (c, out) => col(c).as(out) }: _*)
    val probed = points.withColumn("__idx",
      graft.expressions.SortedLowerBound.lowerBound(
        bcLos, col(pointCol).cast("long")))
    val joined = probed.join(broadcast(dimIdx), Seq("__idx"), "left")
    val matched = col("__hi").isNotNull &&
      col(pointCol).cast("long") <= col("__hi")
    dimValues.foldLeft(joined) { case (d, (_, out)) =>
      d.withColumn(out, when(matched, col(out)))
    }.withColumn("in_range", coalesce(matched, lit(false)))
      .drop("__idx", "__hi")
  }
}
