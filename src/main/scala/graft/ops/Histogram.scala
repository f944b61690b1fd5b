package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EQUI-DEPTH histogram (the h1 equi-width query's sibling, and the
  * structure behind range-partition planning and percentile-bucket
  * feature encodings): k buckets holding ≈ n/k rows each, boundaries
  * falling where the data is dense.
  *
  * Exactness: money values scale to cent LONGs, the cumulative rank is
  * the [[graft.stats.RankTests]] sharded prefix sum over value-level
  * counts, and the bucket of a value is `(cum·k) DIV n` — pure integer
  * floor division, so bucket edges and counts hash-replay exactly. A
  * value with multiplicity > n/k overflows its bucket rather than
  * splitting (values are atomic — the classic equi-depth caveat).
  *
  * Plan: one corpus-sized map-side-combined groupBy to value cells, the
  * sharded prefix (no global sort), one tiny totals job, one k-row
  * aggregate. */
object Histogram {

  def equiDepth(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need a positive bucket count, got $k")
    val cells = df.where(col(valueCol).isNotNull)
      .select((col(valueCol).cast("decimal(12,2)") * 100).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val pref = graft.stats.RankTests.withExclusivePrefixCols(cells, Seq("c" -> "cum"))
    val n = pref.agg(sum(col("c"))).head().getLong(0)
    require(n > 0, "equiDepth needs at least one non-null row")
    pref
      .withColumn("bucket", expr(s"cum * ${k}L DIV ${n}L"))
      .groupBy(col("bucket"))
      .agg((min(col("v")).cast("double") / lit(100.0)).as("lo"),
        (max(col("v")).cast("double") / lit(100.0)).as("hi"),
        sum(col("c")).as("cnt"))
      .orderBy(col("bucket"))
  }
}
