package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-sample RANK statistics (NOT-IN-REFERENCE extension of
  * the §2.8 hypothesis-testing family — the nonparametric siblings of the
  * reference's permutation/Fisher tests, at corpus scale).
  *
  * Both tests reduce the data to VALUE-LEVEL counts first (one map-side-
  * combined groupBy — the only corpus-sized shuffle), then need cumulative
  * counts in value order. That prefix sum is the classic global-sort trap;
  * here it runs as the repo's two-phase sharded-global pattern
  * ([[FDR.adjustDF]]'s doctrine): contiguous range shards, per-shard
  * windows, driver-computed exclusive shard bases delivered via
  * [[graft.ops.ShardLookup]]. Everything cumulative is INTEGER arithmetic
  * — exactly decomposable across shards, no FP-association drift — and
  * each statistic leaves integers only in the final closed-form
  * expression, so a relational replay reproduces it bit-for-bit.
  */
object RankTests {

  /** Value-level counts: one row per distinct value with group-A and
    * group-B multiplicities. `isA` must be boolean; NULL values and NULL
    * group flags drop (SQL two-sample semantics: membership unknown →
    * excluded). */
  private def valueCounts(df: DataFrame, valueCol: String, isA: Column): DataFrame =
    df.where(col(valueCol).isNotNull && isA.isNotNull)
      .select(col(valueCol).cast("double").as("v"),
        when(isA, 1L).otherwise(0L).as("g"))
      .groupBy(col("v"))
      .agg(sum(col("g")).as("na"), (count(lit(1)) - sum(col("g"))).as("nb"))

  /** Attach EXCLUSIVE cumulative counts `cuma`/`cumb` (rows strictly below
    * `v`) to the value-level frame — integer-exact two-phase sharded
    * prefix sum, no global sort. The eager localCheckpoint pins the range
    * partitioning so shard assignment cannot drift between the base-stats
    * job and the final pass (the [[FDR]] doctrine). */
  private def withExclusivePrefix(vc: DataFrame): DataFrame = {
    val sharded = vc.repartitionByRange(col("v").asc)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint()
    val shardTotals = sharded.groupBy(col("__shard"))
      .agg(sum(col("na")).as("sa"), sum(col("nb")).as("sb"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    // exclusive prefix over shards: one row per shard, driver arithmetic
    val bases = shardTotals.scanLeft((0, (0L, 0L))) { case ((_, (pa, pb)), (s, (a, b))) =>
      (s, (pa + a, pb + b))
    }.init.zip(shardTotals).map { case ((_, acc), (s, _)) => (s, acc) }.toMap
    // scanLeft.init pairs shard s with the sum of all PRIOR shards
    val w = Window.partitionBy(col("__shard")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = sharded
      .withColumn("__ca", coalesce(sum(col("na")).over(w), lit(0L)))
      .withColumn("__cb", coalesce(sum(col("nb")).over(w), lit(0L)))
    val withBaseA = graft.ops.ShardLookup.attachLong(withIn, col("__shard"),
      bases.map { case (s, (a, _)) => s -> a }, "__ba", 0L)
    graft.ops.ShardLookup.attachLong(withBaseA, col("__shard"),
      bases.map { case (s, (_, b)) => s -> b }, "__bb", 0L)
      .withColumn("cuma", col("__ba") + col("__ca"))
      .withColumn("cumb", col("__bb") + col("__cb"))
      .drop("__shard", "__ca", "__cb", "__ba", "__bb")
  }

  /** Tie-corrected Mann–Whitney U (normal approximation, no continuity
    * correction — R's `wilcox.test(correct = FALSE)` convention): one row
    * `(n_a, n_b, u2, tie_term, z)` where `u2` = 2·U_A exactly (U_A counts
    * B-below-A pairs with ties at ½, so doubling keeps it integral) and
    * `tie_term` = Σ(t³−t) over tied values. All four are exact LONGs;
    * `z` is the one double, produced by a fixed left-to-right expression
    * over them so a replay evaluates bit-identically. */
  def mannWhitneyDF(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val pref = withExclusivePrefix(valueCounts(df, valueCol, isA))
    val agg = pref.agg(
      sum(col("na")).as("n_a"),
      sum(col("nb")).as("n_b"),
      sum(col("na") * (lit(2L) * col("cumb") + col("nb"))).as("u2"),
      sum((col("na") + col("nb")) * (col("na") + col("nb")) *
        (col("na") + col("nb")) - (col("na") + col("nb"))).as("tie_term"))
    agg.select(col("n_a"), col("n_b"), col("u2"), col("tie_term"),
      zExpr(col("n_a"), col("n_b"), col("u2"), col("tie_term")).as("z"))
  }

  /** The closed-form z as ONE fixed expression tree (shared shape with the
    * SQL replay): ((u2/2 − na·nb/2) / sqrt(na·nb·((N+1) − T/(N·(N−1)))/12)). */
  private def zExpr(na: Column, nb: Column, u2: Column, t: Column): Column = {
    val n = (na + nb).cast("double")
    (u2.cast("double") / lit(2.0) - na.cast("double") * nb.cast("double") / lit(2.0)) /
      sqrt(na.cast("double") * nb.cast("double") *
        ((n + lit(1.0)) - t.cast("double") / (n * (n - lit(1.0)))) / lit(12.0))
  }

  /** Two-sample Kolmogorov–Smirnov D, EXACT: the max over values of
    * |ECDF_A − ECDF_B| returned as the integer numerator over the common
    * denominator n_a·n_b — `D = d_num / (n_a·n_b)` with no float in the
    * extremum search, so the statistic hash-replays exactly. One row
    * `(n_a, n_b, d_num, d)`. */
  def ksDF(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val pref = withExclusivePrefix(valueCounts(df, valueCol, isA))
    // inclusive cumulatives at each value: exclusive prefix + own count
    val inc = pref
      .withColumn("__ia", col("cuma") + col("na"))
      .withColumn("__ib", col("cumb") + col("nb"))
    // the cross-multiplied extremum needs the totals first — one tiny
    // totals job, then the integer max with the totals inlined as literals
    val totals = pref.agg(sum(col("na")), sum(col("nb"))).head()
    val (nA, nB) = (totals.getLong(0), totals.getLong(1))
    inc.agg(max(abs(col("__ia") * lit(nB) - col("__ib") * lit(nA))).as("d_num"))
      .select(lit(nA).as("n_a"), lit(nB).as("n_b"), col("d_num"),
        (col("d_num").cast("double") / lit((nA * nB).toDouble)).as("d"))
  }
}
