package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PERMANOVA with Jaccard distances + beta-dispersion check (SURVEY §2.8 R4;
  * the reference defines `myPermanova` — `adonis(frame ~ group, perm=999)`
  * over `vegdist(..., 'jaccard')` plus `betadisper`/`permutest` — at
  * `Hypothesis testing R.r:375-388` but never calls it on real data and
  * excludes its results (`README.md:438`). Implemented as the optional
  * operator the survey prescribes.
  *
  * Driver-local math over the collected boolean matrix (cohort-sized in the
  * reference); the pseudo-F permutation follows Anderson (2001): F =
  * (SS_between/(g-1)) / (SS_within/(n-g)) with SS terms from pairwise
  * squared distances, group labels permuted.
  */
object Permanova {

  final case class Result(pseudoF: Double, pValue: Double,
      dispersionPValue: Double)

  /** Jaccard distance between boolean vectors: 1 - |a∩b| / |a∪b| (0 when
    * both empty, matching vegdist). */
  private[stats] def jaccard(a: Array[Boolean], b: Array[Boolean]): Double = {
    var inter = 0; var union = 0
    var i = 0
    while (i < a.length) {
      if (a(i) && b(i)) inter += 1
      if (a(i) || b(i)) union += 1
      i += 1
    }
    if (union == 0) 0.0 else 1.0 - inter.toDouble / union
  }

  private def pseudoF(d2: Array[Array[Double]], groups: Array[Int]): Double = {
    val n = groups.length
    val g = groups.distinct.length
    // total SS = sum of squared dists / n; within SS per group
    var ssTotal = 0.0
    for (i <- 0 until n; j <- i + 1 until n) ssTotal += d2(i)(j)
    ssTotal /= n
    var ssWithin = 0.0
    groups.distinct.foreach { grp =>
      val idx = (0 until n).filter(groups(_) == grp)
      var ss = 0.0
      for (ii <- idx.indices; jj <- ii + 1 until idx.size)
        ss += d2(idx(ii))(idx(jj))
      ssWithin += ss / idx.size
    }
    val ssBetween = ssTotal - ssWithin
    (ssBetween / (g - 1)) / (ssWithin / (n - g))
  }

  /** Distributed EXACT pseudo-F twin of [[test]] — no driver collect, no
    * Monte Carlo: just the observed Anderson (2001) statistic, computed from
    * the pairwise squared Jaccard distances as relational algebra so it is
    * replayable (and oracle-checkable) on any SQL engine.
    *
    * Shape: pairwise distances come from a triangular self-join
    * (`a.id < b.id`) — PERMANOVA is inherently O(n²) in the cohort, and the
    * cohort side of the reference's design is small (it collects the whole
    * frame to R), so Spark broadcasts one side and the pair stream never
    * materializes; the d² sums aggregate map-side. The group-size divisors
    * join in from a per-group count (one tiny shuffle). Everything except
    * the final divisions is exact integer arithmetic ((union−inter)²/union²
    * per pair), so cross-engine agreement at 6 decimals is routine.
    *
    * Output (1 row): `n, g, ss_total, ss_within, pseudo_f` (rounded to 6).
    *
    * @param broadcastMaxRows broadcast the build side only when the cohort
    *   has at most this many rows (checked with an early-stopping
    *   `limit(max+1).count`). Above it the hint is dropped and the
    *   inequality join degrades to a block-partitioned cartesian product —
    *   O(n²) work, as PERMANOVA inherently is, but spread over executors
    *   instead of OOMing the driver with an oversized broadcast.
    */
  def pseudoFDF(df: DataFrame, idCol: String, groupCol: String,
      featureCols: Seq[String], broadcastMaxRows: Long = 500000L): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(broadcastMaxRows >= 0, s"broadcastMaxRows must be ≥0, got $broadcastMaxRows")
    val base = df.select(
      col(idCol).as("id") +: col(groupCol).cast("string").as("grp") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("boolean").cast("int").as(s"f$i")
        }: _*)
    def side(tag: String) = base.select(
      col("id").as(s"id$tag") +: col("grp").as(s"g$tag") +:
        featureCols.indices.map(i => col(s"f$i").as(s"f$i$tag")): _*)
    val inter = featureCols.indices
      .map(i => col(s"f${i}a") * col(s"f${i}b")).reduce(_ + _)
    val union = featureCols.indices
      .map(i => greatest(col(s"f${i}a"), col(s"f${i}b"))).reduce(_ + _)
    // d·d, not pow(d,2): Java Math.pow and SQL power() may differ in the
    // last ulp; an IEEE multiply is identical everywhere
    val dist = lit(1.0) - inter.cast("double") / union
    // size guard: limit(max+1).count stops scanning once the threshold is
    // crossed, so the check is cheap on any input size
    val probe =
      if (broadcastMaxRows >= Int.MaxValue - 1) Int.MaxValue
      else (broadcastMaxRows + 1).toInt
    val fitsBroadcast = base.limit(probe).count() <= broadcastMaxRows
    val buildSide = if (fitsBroadcast) broadcast(side("b")) else side("b")
    val pairs = side("a")
      .join(buildSide, col("ida") < col("idb"))
      .select(col("ga"), col("gb"),
        when(union === 0, lit(0.0)).otherwise(dist * dist).as("d2"))
    val counts = base.agg(count(lit(1)).as("n"), countDistinct(col("grp")).as("g"))
    val sizes = base.groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
    // ONE pass over the O(n²) pair stream: bucket same-group pairs by group
    // (cross-group pairs land in the null bucket), then both SS terms fall
    // out of the g+1 bucket sums — the self-join is never re-executed
    val sums = pairs
      .groupBy(when(col("ga") === col("gb"), col("ga")).as("grp_w"))
      .agg(sum(col("d2")).as("ssg"))
      .join(broadcast(sizes), col("grp_w") === col("grp"), "left_outer")
      .agg(sum(col("ssg")).as("ss_tot_raw"),
        sum(when(col("grp_w").isNotNull, col("ssg") / col("cnt"))).as("ss_within"))
    counts.crossJoin(sums)
      .select(col("n"), col("g"),
        round(col("ss_tot_raw") / col("n"), 6).as("ss_total"),
        round(col("ss_within"), 6).as("ss_within"),
        round(((col("ss_tot_raw") / col("n") - col("ss_within")) / (col("g") - 1)) /
          (col("ss_within") / (col("n") - col("g"))), 6).as("pseudo_f"))
  }

  /** Distributed EXACT beta-dispersion twin of the `betadisper` leg of
    * [[test]] — the last O(n²)-DRIVER stat, re-expressed over the same
    * pairwise stream as [[pseudoFDF]] so the distance matrix never
    * materializes anywhere: each point's dispersion (mean Jaccard distance
    * to its own-group members) comes from a directed same-group self-join
    * aggregated per point, then per group.
    *
    * Cross-engine exactness: with k features every Jaccard distance is a
    * rational with denominator ≤ k, so `scale = lcm(1..k)` makes
    * `scale·d` an INTEGER per pair — sums are exact integer arithmetic in
    * any order (no FP-association drift), and the single final division
    * happens once per output row. Within a group every member has the
    * same pair count (gsize−1), so the group mean needs only the group's
    * integer total: mean = Σsᵢ / (scale·(gsize−1)·gsize).
    *
    * Output, one row per group of size ≥ 2 (singletons have no pairs and
    * no defined dispersion): `grp, gsize, mean_disp, max_disp` (6 dp). */
  def dispersionDF(df: DataFrame, idCol: String, groupCol: String,
      featureCols: Seq[String], broadcastMaxRows: Long = 500000L): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    val k = featureCols.size
    val scale = (1 to k).foldLeft(1L) { (acc, i) =>
      val g = BigInt(acc).gcd(BigInt(i)).toLong; acc / g * i
    }
    val base = df.select(
      col(idCol).as("id") +: col(groupCol).cast("string").as("grp") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("boolean").cast("int").as(s"f$i")
        }: _*)
    def side(tag: String) = base.select(
      col("id").as(s"id$tag") +: col("grp").as(s"g$tag") +:
        featureCols.indices.map(i => col(s"f$i").as(s"f$i$tag")): _*)
    val inter = featureCols.indices
      .map(i => col(s"f${i}a") * col(s"f${i}b")).reduce(_ + _)
    val union = featureCols.indices
      .map(i => greatest(col(s"f${i}a"), col(s"f${i}b"))).reduce(_ + _)
    // scale·d = scale·(union−inter)/union is integer (union | scale); the
    // double division is exact because the true quotient IS that integer
    val num = when(union === 0, lit(0L))
      .otherwise(((lit(scale) * (union - inter)) / union).cast("long"))
    val probe =
      if (broadcastMaxRows >= Int.MaxValue - 1) Int.MaxValue
      else (broadcastMaxRows + 1).toInt
    val fitsBroadcast = base.limit(probe).count() <= broadcastMaxRows
    val buildSide = if (fitsBroadcast) broadcast(side("b")) else side("b")
    // DIRECTED same-group pairs: each point sees all gsize−1 partners
    val perPoint = side("a")
      .join(buildSide, col("ida") =!= col("idb") && col("ga") === col("gb"))
      .groupBy(col("ida"), col("ga"))
      .agg(sum(num).as("s"), count(lit(1)).as("cnt"))
    perPoint
      .groupBy(col("ga").as("grp"))
      .agg((max(col("cnt")) + 1).as("gsize"), sum(col("s")).as("stot"),
        max(col("s")).as("smax"))
      .select(col("grp"), col("gsize"),
        round(col("stot").cast("double") /
          (lit(scale) * (col("gsize") - 1) * col("gsize")), 6).as("mean_disp"),
        round(col("smax").cast("double") /
          (lit(scale) * (col("gsize") - 1)), 6).as("max_disp"))
  }

  /** @param df frame of boolean feature columns + a group column
    * @param groupCol the dependent grouping (reference's referenceColumnName)
    */
  def test(df: DataFrame, groupCol: String, featureCols: Seq[String],
      nPerm: Int = 999, seed: Long = 42L): Result = {
    val rows = df.select((groupCol +: featureCols).map(c => col(c)): _*)
      .na.drop().collect()
    val groupsRaw = rows.map(_.get(0).toString)
    val labels = groupsRaw.distinct.sorted
    val groups = groupsRaw.map(labels.indexOf(_))
    val feats = rows.map(r => featureCols.indices.map(i =>
      r.get(i + 1) match {
        case b: Boolean => b
        case x: Number => x.doubleValue() != 0.0
        case other => other.toString.toBoolean
      }).toArray)
    val n = feats.length
    require(labels.length >= 2 && n > labels.length, "need ≥2 groups and more rows than groups")
    val d2 = Array.tabulate(n, n)((i, j) => {
      val d = jaccard(feats(i), feats(j)); d * d
    })
    val obs = pseudoF(d2, groups)
    val rng = new scala.util.Random(seed)
    var ge = 0
    val perm = groups.clone()
    for (_ <- 1 to nPerm) {
      // Fisher–Yates
      var i = perm.length - 1
      while (i > 0) {
        val j = rng.nextInt(i + 1)
        val t = perm(i); perm(i) = perm(j); perm(j) = t
        i -= 1
      }
      if (pseudoF(d2, perm) >= obs) ge += 1
    }
    val p = (1.0 + ge) / (1.0 + nPerm)

    // beta-dispersion check (betadisper + permutest): distances to group
    // centroid approximated by mean distance to own-group members; permuted
    // one-way test on those dispersions
    val disp = (0 until n).map { i =>
      val idx = (0 until n).filter(j => j != i && groups(j) == groups(i))
      if (idx.isEmpty) 0.0 else idx.map(j => math.sqrt(d2(i)(j))).sum / idx.size
    }.toArray
    val dispP = PermutationTest.twoSided(
      disp.zipWithIndex.filter(x => groups(x._2) == 0).map(_._1),
      disp.zipWithIndex.filter(x => groups(x._2) != 0).map(_._1),
      nPerm, seed)
    Result(obs, p, dispP)
  }
}
