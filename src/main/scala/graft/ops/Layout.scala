package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-ORDER clustering, the open-table-format
  * answer (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) to the question a
  * single sort column can't: "prune scans on EITHER of two predicates".
  *
  * A file sorted by `l_partkey` has tight per-file min/max on partkey —
  * partkey predicates skip almost everything — but every file spans the
  * whole suppkey range, so suppkey predicates scan 100% of files. Mapping
  * rows to the Z-curve (bit-interleave of the per-column bucket ordinals)
  * and range-partitioning on that single value gives every file a small
  * HYPER-RECTANGLE of the key space: per-file min/max stay tight on EVERY
  * interleaved column at once, and parquet's row-group/file stats prune
  * multi-dimensional boxes. At 100 TB this is the difference between a
  * full scan and touching a handful of files for point-ish queries on
  * secondary dimensions.
  *
  * Plan shape: ONE stats aggregate (min/max per column), then one range
  * shuffle on the z-value with an in-partition sort — exactly the cost of
  * any global sort-for-layout, no extra passes. Bucketing is linear
  * between the observed min/max; heavily skewed columns can pre-transform
  * (log, rank-bucket) before z-ordering, the standard practice.
  */
object Layout {

  /** Bit-interleaved Z-value of `cols`, each linearly bucketed into
    * 2^`bits` cells between its (min, max). Columns beyond ~3 dilute the
    * curve (the usual guidance); bits·cols must fit a long (≤ 60). */
  def zvalue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int): Column = {
    require(cols.nonEmpty && cols.size == mins.size && mins.size == maxs.size)
    require(bits * cols.size <= 60, s"z-value needs ${bits * cols.size} bits")
    val cells = (1L << bits) - 1
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val range = maxs(i) - mins(i)
      // constant column → bucket 0; nulls sort first (bucket 0)
      if (range <= 0) lit(0L)
      else least(lit(cells), greatest(lit(0L),
        floor((coalesce(c.cast("double"), lit(mins(i))) - mins(i))
          / range * cells).cast("long")))
    }
    // interleave: bit j of bucket i lands at position j*nCols + i
    val n = cols.size
    (0 until bits).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Return `df` clustered on the Z-curve of `zCols`: one min/max stats
    * job, then partition on the z-value into `outPartitions` and sort
    * within partitions — written out, each file covers a tight
    * hyper-rectangle of the key space (LayoutSpec measures the pruning).
    * Content is untouched (the p8 oracle proves it relationally).
    *
    * With explicit `outPartitions`, slabs are DETERMINISTIC equal-width
    * z-ranges (`slab = z DIV ceil(2^totalBits / P)`, an identity
    * partitioner — no sampling): file boundaries align exactly with the
    * curve's top bits, so the same input always produces the same files
    * and a k-th-fraction predicate prunes to its exact slab set.
    * `repartitionByRange`'s sampled boundaries (the 0 default) shift
    * with the RDD-id seed and can land mid-slab, keeping extra files.
    * The trade: equal-width slabs assume the bucketed z is roughly
    * uniform (the equi-width bucketing gives that for non-degenerate
    * data); a heavily clustered key set should use the sampled path. */
  def zorder(df: DataFrame, zCols: Seq[String], bits: Int = 12,
      outPartitions: Int = 0): DataFrame = {
    val aggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = zCols.indices.map(i => Option(stats.get(2 * i))
      .map(_.toString.toDouble).getOrElse(0.0))
    val maxs = zCols.indices.map(i => Option(stats.get(2 * i + 1))
      .map(_.toString.toDouble).getOrElse(0.0))
    val z = zvalue(zCols.map(col), mins, maxs, bits)
    val withZ = df.withColumn("__z", z)
    if (outPartitions > 0) {
      val span = 1L << (bits * zCols.size)
      val width = (span + outPartitions - 1) / outPartitions.toLong
      val keyed = withZ.withColumn("__slab",
        expr(s"__z DIV $width").cast("int"))
      val schema = keyed.schema
      val part = new org.apache.spark.Partitioner {
        override def numPartitions: Int = outPartitions
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      }
      val rdd = keyed.rdd.map(r => (r.getAs[Int]("__slab"), r))
        .partitionBy(part).map(_._2)
      keyed.sparkSession.createDataFrame(rdd, schema)
        .sortWithinPartitions(col("__z")).drop("__z", "__slab")
    } else {
      withZ.repartitionByRange(col("__z"))
        .sortWithinPartitions(col("__z")).drop("__z")
    }
  }
}
