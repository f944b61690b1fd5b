package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search (NOT-IN-REFERENCE extension): brute-force
  * cosine top-k as the exact baseline, LSH-bucketed (random hyperplane) and
  * IVF (centroid-partitioned) variants as the 100 TB scale path.
  *
  * Vector math is `zip_with`/`aggregate` higher-order expressions over
  * `array<double>` — stays in Tungsten, no UDF or driver loop.
  */
object Embeddings {

  /** Cast array<float> → array<double> (the parquet embeddings are float). */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** `c` if it holds at least `minDim` elements, else raise_error — slicing
    * a short vector produces empty subvectors and degenerate dot products,
    * a silent wrong-answer mode worth a loud per-row failure. */
  private def checkedVec(c: Column, minDim: Int, who: String): Column =
    when(size(c) >= minDim, c).otherwise(raise_error(
      concat(lit(s"$who: expected vector dim >= $minDim, got "),
        size(c).cast("string"))))

  /** Codegen'd native dot product (graft.expressions.DotProduct) — the
    * zip_with/aggregate HOF form is CodegenFallback and ~10× slower per
    * pair, which dominates ANN candidate joins. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotProduct(a, b)

  def l2Norm(c: Column): Column = sqrt(dot(c, c))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Pre-normalize once so each pair costs ONE dot product, not three:
    * adds `__vec` (unit-norm array<double>). Zero vectors map to null.
    * The norm divides in via `array_repeat` — a function ARGUMENT evaluates
    * once per row, whereas a norm expression captured inside a `transform`
    * lambda would re-reduce the whole array per element. */
  private def withUnit(df: DataFrame, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val n = l2Norm(v)
    df.withColumn("__vec", when(n > 0, zip_with(v,
      array_repeat(n, size(v)), (x, d) => x / d)))
  }

  /** Exact brute-force cosine top-k: for each query row, the k nearest corpus
    * rows. Plan: broadcast the (small) query side, one pass over the corpus,
    * per-query top-k via window. Corpus side never shuffles its vectors —
    * only (query_id, corpus_id, cos) tuples move. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = withUnit(corpus, corpusVec).select(col(corpusId).as("corpus_id"), col("__vec").as("cvec"))
    val q = withUnit(queries, queryVec).select(col(queryId).as("query_id"), col("__vec").as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), dot(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact brute-force top-k via the custom bounded-heap aggregate
    * (graft.expressions.TopKByScore): map-side partial heaps mean only
    * (query × k) rows cross the shuffle instead of (query × corpus) rows
    * into a per-partition window sort. Same output as [[bruteForceTopK]]. */
  def bruteForceTopKAgg(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = withUnit(corpus, corpusVec).select(col(corpusId).as("corpus_id"), col("__vec").as("cvec"))
    val q = withUnit(queries, queryVec).select(col(queryId).as("query_id"), col("__vec").as("qvec"))
    c.crossJoin(broadcast(q))
      .where(col("corpus_id") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKByScore.topKByScore(
        dot(col("cvec"), col("qvec")), col("corpus_id").cast("long"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("idx", "r")))
      .select(col("query_id"), col("r.id").as("corpus_id"),
        col("r.score").as("cos"), (col("idx") + 1).as("rank"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most-cosine-similar corpus vectors whose label
    * DIFFERS from the query's — the "closest wrong answers" a
    * representation model learns the most from (the in-batch-negatives
    * upgrade every large-scale embedding pipeline ships).
    *
    * Same plan shape as [[bruteForceTopKAgg]] (the n1 contract): corpus
    * scan × broadcast query block, the label-mismatch filter applied
    * BEFORE the bounded-heap aggregate, so only (query × k) rows cross
    * the shuffle. Ties break by smallest corpus id; zero-norm vectors
    * and NULL labels drop.
    *
    * Returns `(query_id, query_label, corpus_id, neg_label, rank)`. */
  def hardNegatives(
      corpus: DataFrame, corpusId: String, corpusVec: String, labelCol: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = withUnit(corpus, corpusVec).select(col(corpusId).as("corpus_id"),
      col(labelCol).cast("long").as("neg_label"), col("__vec").as("cvec"))
      .where(col("neg_label").isNotNull)
    val q = withUnit(queries, queryVec).select(col(queryId).as("query_id"),
      col(labelCol).cast("long").as("query_label"), col("__vec").as("qvec"))
      .where(col("query_label").isNotNull)
    val top = c.crossJoin(broadcast(q))
      .where(col("neg_label") =!= col("query_label"))
      .groupBy(col("query_id"), col("query_label"))
      .agg(graft.expressions.TopKByScore.topKByScore(
        dot(col("cvec"), col("qvec")), col("corpus_id").cast("long"), k).as("top"))
      .select(col("query_id"), col("query_label"),
        posexplode(col("top")).as(Seq("idx", "r")))
      .select(col("query_id"), col("query_label"),
        col("r.id").as("corpus_id"), (col("idx") + 1).as("rank"))
    // re-attach the negative's label: (queries × k) frame joined against
    // the corpus-id dim — broadcast the tiny frame side
    val labels = corpus.select(col(corpusId).as("corpus_id"),
      col(labelCol).cast("long").as("neg_label"))
    labels.join(broadcast(top), "corpus_id")
      .select(col("query_id"), col("query_label"), col("corpus_id"),
        col("neg_label"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IR-style evaluation of an ANN index against exact ground truth — the
    * harness that turns "we have IVF/PQ/LSH" into a measured recall
    * number. Inputs are two `(query_id, corpus_id, rank)` frames (e.g.
    * [[bruteForceTopKAgg]] as `truth`, [[ivfTopK]]/[[pqTopK]] as
    * `approx`); output is one row per query, ordered:
    * `(query_id, truth_k, hits, recall, rr)` — `recall` = |approx∩truth|/
    * truth_k at rank ≤ k, `rr` the reciprocal of the approx rank of the
    * TRUE nearest neighbor (0.0 when the index misses it; averaging `rr`
    * downstream gives MRR). Exact: counts are longs, each ratio one
    * division. Plan: both frames are already (queries×k)-sized — the join
    * and groupBy never touch the corpus. */
  def annEvalDF(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val t = truth.select(col("query_id").as("q"), col("corpus_id").as("c"),
        col("rank").cast("long").as("tr"))
      .where(col("tr") <= k)
    val a = approx.select(col("query_id").as("q"), col("corpus_id").as("c"),
        col("rank").cast("long").as("ar"))
      .where(col("ar") <= k)
    t.join(a, Seq("q", "c"), "left")
      .groupBy(col("q"))
      .agg(count(lit(1)).as("truth_k"),
        sum(when(col("ar").isNotNull, 1L).otherwise(0L)).as("hits"),
        max(when(col("tr") === 1L, col("ar"))).as("__nn_rank"))
      .select(col("q").as("query_id"), col("truth_k"), col("hits"),
        round(col("hits").cast("double") / col("truth_k").cast("double"), 6)
          .as("recall"),
        coalesce(round(lit(1.0) / col("__nn_rank").cast("double"), 6), lit(0.0))
          .as("rr"))
      .orderBy(col("query_id"))
  }

  /** Deterministic random hyperplanes: `nBits` × `dim` Gaussian matrix. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id (sign bits of `nBits` projections).
    * Cosine-similar vectors collide with probability (1 - θ/π)^nBits. */
  def lshBucket(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(nBits, dim, seed)
    // fail fast on a dim mismatch — DotProduct would otherwise silently
    // truncate to min(length) and bucket on a partial projection
    val checked = when(size(vec) === dim, asDouble(vec)).otherwise(raise_error(
      concat(lit(s"lshBucket: expected vector dim $dim, got "), size(vec).cast("string"))))
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(checked, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate near-dup pairs: only vectors sharing a bucket
    * (over `tables` independent hash tables) are compared. Shuffle is on
    * (table, bucket) — never all-pairs.
    *
    * Plan shape: the bucket self-join carries ONLY ids (the unit vectors
    * would multiply the explode×join shuffle by the vector width); candidate
    * pairs found in several tables are deduplicated BEFORE scoring, so each
    * pair costs exactly one dot product, fetched via two hash joins against
    * the narrow unit-vector frame. `maxBucketSize` caps the quadratic
    * expansion of hash-pileup buckets (same guard as MinHash banding). */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nBits: Int = 12, dim: Int = 64, tables: Int = 4,
      seed: Long = 42L, maxBucketSize: Int = 2000): DataFrame = {
    // unit pinned: it feeds BOTH verify joins (vec_a, vec_b) — unpinned,
    // each re-ran the upstream scan + normalize (guide §2.4). The bucket
    // frame is NOT pinned: its self-join sides share one ReusedExchange
    // already, and materializing the exploded tables×rows frame measured
    // slower (r13 A/B).
    val unit = withUnit(df, vecCol).select(col(idCol).as("id"), col("__vec").as("vec"))
      .localCheckpoint()
    // all tables' buckets in ONE native matrix-vector sweep (bit-identical to
    // per-table lshBucket, ~100× cheaper — see LshBuckets scaladoc)
    val buckets = df.select(
        col(idCol).as("id"),
        graft.expressions.VectorExpressions.lshBucketsAll(
          asDouble(col(vecCol)), nBits, dim, tables, seed).as("bks"))
      .select(col("id"), col("bks"),
        posexplode(col("bks")).as(Seq("table", "bucket")))
      .withColumn("__bn", count(lit(1)).over(
        Window.partitionBy(col("table"), col("bucket"))))
      .where(col("__bn") <= maxBucketSize).drop("__bn")
    // owning-table single emission (the d2 owning-band contract): a pair
    // colliding in several tables is kept only where table == the first
    // index at which the two bucket arrays agree — a row-local filter in
    // place of a candidate-pair distinct() shuffle (the `tables`-long
    // bucket array rides the join; a pair whose owning table's bucket was
    // capped is dropped, as any capped bucket's pairs already are)
    val a = buckets.alias("a"); val b = buckets.alias("b")
    val cand = a.join(b, col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .where(col("a.table") + 1 === array_position(
        zip_with(col("a.bks"), col("b.bks"), (x, y) => x === y), lit(true)))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    cand
      .join(unit.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(unit.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), dot(col("vec_a"), col("vec_b")).as("cos"))
      .where(col("cos") >= minCosine)
  }

  /** Exact all-pairs near-dup within a blocking column (e.g. a label or an
    * IVF centroid id): quadratic only inside each block. */
  def blockedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, minCosine: Double): DataFrame = {
    val u = withUnit(df, vecCol).select(
      col(blockCol).as("block"), col(idCol).as("id"), col("__vec").as("vec"))
    val a = u.alias("a"); val b = u.alias("b")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        dot(col("a.vec"), col("b.vec")).as("cos"))
      .where(col("cos") >= minCosine)
  }

  /** IVF index: k-means centroids (sampled fit, distributed assign). Returns
    * the input plus a `centroid_id` column; ANN search probes only the
    * `nProbe` nearest centroids' partitions. */
  def ivfAssign(df: DataFrame, vecCol: String, nCentroids: Int,
      seed: Long = 42L, maxIter: Int = 10): DataFrame =
    ivfIndex(df, vecCol, nCentroids, seed, maxIter)._1

  /** IVF index build: k-means fit + assignment, returning the assigned
    * frame AND the centroid vectors (for query-side probe selection). */
  def ivfIndex(df: DataFrame, vecCol: String, nCentroids: Int,
      seed: Long = 42L, maxIter: Int = 10): (DataFrame, Array[(Int, Seq[Double])]) = {
    val centers = kmeansTrain(df, vecCol, nCentroids, seed = seed, maxIter = maxIter)
    (assignEuclidean(df, vecCol, centers), centers)
  }

  /** Full-vector k-means — [[pqTrain]]'s joint Lloyd's trainer with a single
    * subspace: one cached pass-per-iteration fit, deterministic by seed and
    * partition-order-independent (decimal accumulation). `dim` is inferred
    * from the first non-null vector when not given. The first-class curation
    * primitive behind IVF indexing and cluster-census / SemDeDup-style
    * pipelines: fit on a sample at 100 TB, assignment stays one pass. */
  def kmeansTrain(df: DataFrame, vecCol: String, k: Int, dim: Int = -1,
      seed: Long = 42L, maxIter: Int = 10,
      sampleCap: Int = 1 << 17): Array[(Int, Seq[Double])] = {
    val d =
      if (dim > 0) dim
      else df.select(size(asDouble(col(vecCol))).as("n"))
        .where(col("n") > 0).limit(1).collect()
        .headOption.map(_.getInt(0))
        .getOrElse(throw new IllegalArgumentException(
          s"kmeansTrain: no non-empty vectors in '$vecCol' to infer dim from"))
    pqTrain(df, vecCol, numSubspaces = 1, k = k, dim = d,
      seed = seed, maxIter = maxIter, sampleCap = sampleCap).head
  }

  /** Assign each row to the centroid maximizing dot(unit vector, centroid)
    * from a FIXED literal centroid table — the k-means-free IVF assignment:
    * with centroids pinned, the whole probe pipeline is pure relational
    * math, replayable (and oracle-checkable) on any SQL engine. Ties break
    * to the lowest centroid id (array_sort is stable; the array is built in
    * cid order). Rows whose vector has zero norm get a null centroid_id. */
  def assignFixedCentroids(df: DataFrame, vecCol: String,
      centroids: Array[(Int, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    // Score each centroid ONCE per row (k native dots), then sort the
    // small (s, cid) structs. The old form computed the dots INSIDE the
    // array_sort comparator — O(k log k) comparator calls × up to 4 dot
    // evaluations each per row instead of k dots. Same dot values, same
    // comparator shape (desc by s, ties keep centroid-array order), so
    // the assignment is bit-identical (AnnSpec + the n3/n5 oracles pin it).
    val scored = array(centroids.toSeq.map { case (id, c) =>
      struct(dot(col("__vec"), array(c.map(lit): _*)).as("s"),
        lit(id).as("cid"))
    }: _*)
    withUnit(df, vecCol)
      .withColumn("centroid_id", when(col("__vec").isNotNull,
        element_at(array_sort(scored, (l, r) =>
          when(l("s") > r("s"), -1)
            .when(l("s") < r("s"), 1)
            .otherwise(0)), 1)("cid")))
      .drop("__vec")
  }

  /** Assign each row to the L2-NEAREST centroid from a FIXED literal
    * centroid table — k-means' assignment step as pure relational math:
    * argmax of 2·dot(v, c) − ‖c‖² over the RAW (double-cast) vector (the
    * L2 argmin with the per-row ‖v‖² constant dropped), ties → lowest cid.
    * Pair with [[ivfIndex]]'s fitted centers to keep the TRAINER
    * engine-specific while the assignment (and everything downstream)
    * replays bit-for-bit in SQL: the driver-side ‖c‖² sum and the native
    * dot are both sequential left-to-right, exactly like the oracle's
    * `list_dot_product`. */
  def assignEuclidean(df: DataFrame, vecCol: String,
      centroids: Array[(Int, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val v = asDouble(col(vecCol))
    val scored = array(centroids.toSeq.map { case (cid, c) =>
      struct((lit(2.0) * dot(v, array(c.map(lit): _*)) -
        lit(c.map(x => x * x).sum)).as("s"), lit(cid).as("cid"))
    }: _*)
    df.withColumn("centroid_id",
      element_at(array_sort(scored, (l, r) =>
        when(l("s") > r("s"), -1).when(l("s") < r("s"), 1)
          .otherwise(when(l("cid") < r("cid"), -1)
            .when(l("cid") > r("cid"), 1).otherwise(0))), 1)("cid"))
  }

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix: entry (j,i) is a
    * pure function of (seed, j, i) (Achlioptas 2003's database-friendly
    * projection — ±1 entries preserve pairwise angles in expectation), so
    * any engine can rebuild the identical matrix and the projection
    * replays exactly as literal dot products. */
  def rpMatrix(inDim: Int, outDim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(outDim) { j =>
      Array.tabulate(inDim) { i =>
        var x = (seed * 0x9E3779B97F4A7C15L) ^ (j * 0xC2B2AE3D27D4EB4FL) ^
          (i * 0x165667B19E3779F9L)
        x = java.lang.Long.rotateLeft(x, 31) * 0x9E3779B185EBCA87L
        x ^= (x >>> 29)
        if ((x & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Append `outCol` = the `outDim`-dimensional ±1 projection of `vecCol`
    * (one codegen dot product per output dimension). */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      seed: Long, outCol: String = "__proj"): DataFrame = {
    val m = rpMatrix(inDim, outDim, seed)
    val v = checkedVec(asDouble(col(vecCol)), inDim, "randomProject")
    df.withColumn(outCol,
      array(m.map(row => dot(v, array(row.map(lit).toSeq: _*))).toSeq: _*))
  }

  /** JL-prefiltered exact ANN: rank ALL pairs by cosine in the PROJECTED
    * space (outDim ≪ inDim — the per-pair cost drops by inDim/outDim),
    * keep `candidates` per query, then rerank only those by TRUE cosine
    * and keep k. The output is defined BY this two-stage algorithm (ties
    * to the lower corpus id at both stages), so a SQL replay with the
    * same seed-derived matrix is exact — no recall hand-waving in the
    * oracle (recall itself is spec-measured against brute force). At
    * 100 TB the projected vectors are the only thing the candidate stage
    * touches: 4× narrower rows through the same bucketed/blocked
    * candidate machinery, with the full vectors fetched only for the
    * `candidates`-sized rerank. */
  def rpPrefilterTopK(corpus: DataFrame, corpusId: String, vecCol: String,
      queries: DataFrame, queryId: String, queryVec: String,
      inDim: Int, outDim: Int, seed: Long,
      candidates: Int, k: Int): DataFrame = {
    val c = withUnit(randomProject(corpus, vecCol, inDim, outDim, seed), vecCol)
      .where(col("__vec").isNotNull)
      .select(col(corpusId).as("corpus_id"), col("__vec").as("cvec"),
        col("__proj").as("cproj"))
    val q = withUnit(randomProject(queries, queryVec, inDim, outDim, seed), queryVec)
      .where(col("__vec").isNotNull)
      .select(col(queryId).as("query_id"), col("__vec").as("qvec"),
        col("__proj").as("qproj"))
    val wP = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("corpus_id").asc)
    val cand = c.crossJoin(broadcast(q))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), col("cvec"), col("qvec"),
        (dot(col("cproj"), col("qproj")) /
          (l2Norm(col("cproj")) * l2Norm(col("qproj")))).as("pcos"))
      .withColumn("prank", row_number().over(wP)).where(col("prank") <= candidates)
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    cand.select(col("query_id"), col("corpus_id"),
        dot(col("cvec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(wE)).where(col("rank") <= k)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means clusters the corpus, then only WITHIN each cluster are cosine
    * pairs examined — a row is dropped when some SAME-CLUSTER row with a
    * LOWER id is ≥ `minCosine` similar to it. Dominance, not closure: a row
    * whose only close neighbor was itself dropped stays dropped (the rule is
    * locally checkable and exactly SQL-replayable); compose with
    * `Dedup.connectedComponents` when transitive grouping is wanted (d7).
    * Zero-norm vectors have no direction and are always kept.
    *
    * Returns (kept rows + their `centroid_id`, fitted centers). The centers
    * export as exact literals so the whole pipeline — assignment, blocking,
    * pair predicate, keep rule — replays in DuckDB (n8's oracle).
    *
    * The cluster blocking IS the scale contract: candidate pairs cost
    * Σ_c n_c² instead of n², and the only shuffle is keyed by centroid_id.
    * At 100 TB pick k so clusters stay ~10⁴-row-sized (the paper's regime:
    * k ≈ n/10⁴), fit on a sample, and skew in cluster sizes is dealt the
    * same way as any hot key — raise k. Boundary pairs straddling two
    * clusters are invisible by design (the paper's documented recall
    * tradeoff) — and since the oracle replays the same blocking, the
    * comparison stays exact. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, minCosine: Double, seed: Long = 42L,
      maxIter: Int = 10): (DataFrame, Array[(Int, Seq[Double])]) = {
    val centers = kmeansTrain(df, vecCol, k, seed = seed, maxIter = maxIter)
    semanticDedupWithCenters(df, idCol, vecCol, centers, minCosine)
  }

  /** k giving ~`targetClusterSize`-row clusters: ceil(n/target) clamped to
    * [kMin, kMax]. This is what LINEARIZES SemDeDup — with k fixed, the
    * within-cluster pair cost Σ n_c² ≈ n²/k grows quadratically (measured:
    * the sf5 scale probe put fixed-k n8 at ~n^1.9); with k ∝ n it stays
    * ≈ n·target. Above kMax the literal-centroid assignment pass would
    * dominate instead — shard the corpus and dedup per shard, or move
    * assignment to a broadcast-join form, before raising the clamp. */
  def semanticK(n: Long, targetClusterSize: Long = 10000L,
      kMin: Int = 8, kMax: Int = 4096): Int = {
    require(targetClusterSize > 0 && kMin >= 1 && kMax >= kMin)
    math.min(kMax.toLong, math.max(kMin.toLong,
      (n + targetClusterSize - 1) / targetClusterSize)).toInt
  }

  /** [[semanticDedup]] in the scale-correct auto-k regime: k derives from
    * the corpus count via [[semanticK]] (the paper's k ≈ n/10⁴ rule), and
    * the k-means train sample scales with k (≥64 points per cluster) while
    * staying driver-bounded. One extra count() job over the vector column. */
  def semanticDedupAuto(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, targetClusterSize: Long = 10000L, seed: Long = 42L,
      maxIter: Int = 10, kMin: Int = 8, kMax: Int = 4096)
      : (DataFrame, Array[(Int, Seq[Double])]) = {
    // four consumers of the input (the k-sizing count, the training
    // sample, and the two assignment reads below) — pin it once
    val pinned = df.localCheckpoint()
    val n = pinned.where(asDouble(col(vecCol)).isNotNull).count()
    val k = semanticK(n, targetClusterSize, kMin, kMax)
    val cap = math.min(1 << 17, math.max(1 << 15, k * 64))
    val centers = kmeansTrain(pinned, vecCol, k, seed = seed, maxIter = maxIter,
      sampleCap = cap)
    semanticDedupWithCenters(pinned, idCol, vecCol, centers, minCosine)
  }

  /** The blocking + dominance stage shared by the fixed-k and auto-k
    * entrypoints. */
  def semanticDedupWithCenters(df: DataFrame, idCol: String, vecCol: String,
      centers: Array[(Int, Seq[Double])], minCosine: Double)
      : (DataFrame, Array[(Int, Seq[Double])]) = {
    // the assignment expression (k·dim literal centroids per row) feeds
    // both the dominance self-join and the final keep join — pin it so
    // the k·n assignment term evaluates once
    val assigned = assignEuclidean(df, vecCol, centers).localCheckpoint()
    val u = withUnit(assigned, vecCol)
      .select(col(idCol).as("__id"), col("centroid_id").as("__cid"), col("__vec"))
      .where(col("__vec").isNotNull)
    val dominated = u.select(col("__id").as("__id_a"), col("__cid"), col("__vec").as("__va"))
      .join(u.select(col("__id").as("__id_b"), col("__cid"), col("__vec").as("__vb")),
        Seq("__cid"))
      .where(col("__id_a") < col("__id_b"))
      .where(dot(col("__va"), col("__vb")) >= minCosine)
      .select(col("__id_b").as("__dup"))
      .distinct()
    val kept = assigned.join(dominated, col(idCol) === col("__dup"), "left_anti")
    (kept, centers)
  }

  /** Driver-side union of the centroid ids a query batch will probe — the
    * partition-pruning companion to [[ivfTopK]]: store the assigned corpus
    * `partitionBy("centroid_id")`, filter it to these ids before the probe
    * join, and the scan prunes to the probed partitions (PartitionFilters in
    * the plan — spec'd), so a query batch reads `|probes|/|centroids|` of a
    * 100 TB corpus instead of all of it. Query batches are small by nature;
    * collecting their vectors is driver-safe. */
  def probedCentroids(queries: DataFrame, queryVec: String,
      centroids: Array[(Int, Seq[Double])], nProbe: Int): Array[Int] = {
    def dotLocal(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    withUnit(queries, queryVec).select(col("__vec")).where(col("__vec").isNotNull)
      .collect().map(_.getSeq[Double](0))
      .flatMap { q =>
        centroids.sortBy { case (_, c) => -dotLocal(q, c) }.take(nProbe).map(_._1)
      }.distinct.sorted
  }

  /** Product-quantization codes from FIXED literal codebooks (the n6
    * engine side): the raw (double-cast) vector splits into
    * `codebooks.length` contiguous subvectors of equal width; code m is the
    * subspace-m centroid id maximizing 2·dot(x_m, c) − dot(c, c) — the L2
    * argmin with the per-row ‖x_m‖² constant dropped — ties to the lowest
    * id. With codebooks pinned, assignment is pure relational math,
    * replayable as SQL on any engine (how n6 is oracled; k-means-trained
    * codebooks swap in the same way IVF's do vs n5's fixed centroids).
    *
    * Scale: codes are `M` small ints per row — the point of PQ: a 100 TB
    * float corpus compresses to a codes column that scans orders of
    * magnitude faster, with vectors touched only at (re)assignment. The
    * per-row cost here is M×K dot products of subdim width; if assignment
    * ever dominates, it collapses into one matrix-vector native sweep
    * exactly like `expressions.LshBuckets` (same pattern, not yet needed).
    * `codebooks(m)` = (cid, centroid) pairs for subspace m; cids must be
    * exactly 0..K-1 (codes index ADC lookup tables positionally). */
  def pqAssign(df: DataFrame, vecCol: String,
      codebooks: Array[Array[(Int, Seq[Double])]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
    require(codebooks.forall(cb => cb.map(_._1).sorted.sameElements(cb.indices)),
      "each subspace's centroid ids must be exactly 0..K-1")
    val subdim = codebooks(0)(0)._2.length
    require(codebooks.forall(_.forall(_._2.length == subdim)),
      "all centroids must share one subvector width")
    // runtime guard: a vector shorter than M×subdim would make slice()
    // return short/empty subvectors and silently assign degenerate codes
    // (typically code 0) — fail loudly instead, per row, at scan time
    val v = checkedVec(asDouble(col(vecCol)), codebooks.length * subdim, "pqAssign")
    val codes = array(codebooks.zipWithIndex.map { case (cents, m) =>
      val sub = slice(v, m * subdim + 1, subdim)
      // driver-side ‖c‖² is a short sum of dyadic-friendly literals and the
      // oracle's list_dot_product(cvec, cvec) computes the same value — both
      // exact for 3-decimal codebooks, so the argmax order is engine-stable
      val scored = array(cents.toSeq.map { case (cid, c) =>
        struct((lit(2.0) * dot(sub, array(c.map(lit): _*)) -
          lit(c.map(x => x * x).sum)).as("s"), lit(cid).as("cid"))
      }: _*)
      element_at(array_sort(scored, (l, r) =>
        when(l("s") > r("s"), -1).when(l("s") < r("s"), 1)
          .otherwise(when(l("cid") < r("cid"), -1)
            .when(l("cid") > r("cid"), 1).otherwise(0))), 1)("cid")
    }: _*)
    df.withColumn("pq_code", codes)
  }

  /** Train PQ codebooks — completes the ANN story (the round-8 verdict's
    * item 7): [[pqAssign]]/[[pqTopK]] previously only accepted FIXED
    * literal codebooks; this trains them at runtime, n3's doctrine — the
    * TRAINER is engine-specific, but the fitted centers export as plain
    * doubles (Double.toString round-trips exactly), so assignment and ADC
    * ranking replay bit-for-bit in SQL (n7's oracle).
    *
    * Execution is a BOUNDED PROTOCOL (the r1 permutation-test doctrine):
    * ONE Spark job collects a content-hash-gated sample of at most
    * ~`sampleCap` vectors (threshold on |xxhash64(vec, seed)| — layout-
    * and partitioning-independent, binds only past the cap), and Lloyd's
    * k-means runs driver-side per subspace over the canonically SORTED
    * sample, so the fit is a pure function of (vector multiset, seed) —
    * bit-deterministic on any cluster layout, which a distributed
    * double-sum update could never be. A k-means fit never needed the
    * full corpus (the PQ contract is fit-on-sample, assign-everything);
    * the gate just enforces it: at 100 TB the fit costs one filtered
    * pass + a ≤`sampleCap`-row collect, and assignment stays a full
    * single distributed pass. Duplicate vectors gate all-or-nothing
    * (whole duplicate classes kept or dropped together) — harmless for
    * cluster means, documented for symmetry with the r1 gate. Init per
    * subspace = the k distinct subvectors of smallest seeded mix-hash;
    * iterations assign in parallel (independent per point) but
    * accumulate means sequentially in sample order; an iteration that
    * moves no center ends the loop; an emptied cluster keeps its center.
    *
    * Returns `codebooks(m)` = (cid 0..k−1, center) for subspace m, the
    * exact shape pqAssign requires. */
  def pqTrain(df: DataFrame, vecCol: String, numSubspaces: Int, k: Int,
      dim: Int, seed: Long = 42L,
      maxIter: Int = 10,
      sampleCap: Int = 1 << 17): Array[Array[(Int, Seq[Double])]] = {
    require(numSubspaces > 0 && dim % numSubspaces == 0,
      s"dim $dim must split evenly into $numSubspaces subspaces")
    val subdim = dim / numSubspaces
    val v = checkedVec(asDouble(col(vecCol)), dim, "pqTrain")
    val base = df.select(v.as("__v")).where(col("__v").isNotNull)
    val n = base.count()
    val gated =
      if (n <= sampleCap) base
      else base.where(abs(xxhash64(col("__v"), lit(seed))) <
        (Long.MaxValue.toDouble * (sampleCap.toDouble / n)).toLong)
    val sample: Array[Array[Double]] =
      gated.collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pqTrain: empty training sample")
    // canonical order: collect() follows the partition layout; sorted, the
    // sequential mean accumulation below is layout-proof (same move as
    // PermutationTest's pooled sort)
    val cmp: java.util.Comparator[Array[Double]] = (a, b) => {
      var i = 0
      var r = 0
      while (r == 0 && i < a.length && i < b.length) {
        r = java.lang.Double.compare(a(i), b(i))
        i += 1
      }
      if (r != 0) r else Integer.compare(a.length, b.length)
    }
    java.util.Arrays.sort(sample, cmp)
    Array.tabulate(numSubspaces) { m =>
      val pts = sample.map(r => java.util.Arrays.copyOfRange(r, m * subdim, (m + 1) * subdim))
      lloydsDriver(pts, k, seed + m, maxIter, s"subspace $m")
        .zipWithIndex.map { case (c, cid) => (cid, c.toSeq) }
    }
  }

  /** Deterministic sequential-ish Lloyd's on a driver-side sample: seeded
    * smallest-mix-hash distinct init, parallel per-point assignment (each
    * point independent — no FP-order hazard), sequential in-order mean
    * accumulation. Pure function of (pts order, seed); callers pass
    * canonically sorted pts. */
  private def lloydsDriver(pts: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int, who: String): Array[Array[Double]] = {
    val d = pts(0).length
    def mix(p: Array[Double]): Long = {
      var x = seed * 0x9E3779B97F4A7C15L
      var i = 0
      while (i < p.length) {
        x = java.lang.Long.rotateLeft(
          x ^ java.lang.Double.doubleToLongBits(p(i)) * 0xC2B2AE3D27D4EB4FL,
          31) * 0x9E3779B185EBCA87L
        i += 1
      }
      x
    }
    val distinct = pts.map(_.toSeq).distinct.map(_.toArray)
    require(distinct.length >= k,
      s"pqTrain: $who has only ${distinct.length} distinct subvectors, need k=$k")
    var centers = distinct
      .sortWith((a, b) => { val c = java.lang.Long.compare(mix(a), mix(b))
        if (c != 0) c < 0 else {
          var i = 0
          while (i < a.length && a(i) == b(i)) i += 1
          i < a.length && java.lang.Double.compare(a(i), b(i)) < 0
        }})
      .take(k)
    val assign = new Array[Int](pts.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val cs = centers
      // parallel over points: writes to disjoint slots, reads frozen cs
      java.util.stream.IntStream.range(0, pts.length).parallel().forEach { i =>
        val p = pts(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val cv = cs(c)
          var s = 0.0
          var j = 0
          while (j < d) { val t = p(j) - cv(j); s += t * t; j += 1 }
          if (s < bestD) { bestD = s; best = c } // strict <: ties keep lower cid
          c += 1
        }
        assign(i) = best
      }
      val sums = Array.fill(k, d)(0.0)
      val counts = new Array[Long](k)
      var i = 0
      while (i < pts.length) { // sequential, in sample order: deterministic
        val c = assign(i)
        counts(c) += 1
        val p = pts(i)
        var j = 0
        while (j < d) { sums(c)(j) += p(j); j += 1 }
        i += 1
      }
      val next = Array.tabulate(k) { c =>
        if (counts(c) == 0) cs(c).clone()
        else { val out = sums(c); var j = 0
          while (j < d) { out(j) /= counts(c); j += 1 }
          out }
      }
      moved = !next.zip(cs).forall { case (a, b) => java.util.Arrays.equals(a, b) }
      centers = next
      iter += 1
    }
    centers
  }

  /** ADC (asymmetric-distance) top-k over PQ codes (n6): each query builds
    * a (subspace × centroid) lookup table of 2·dot(q_m, c) − dot(c,c)
    * scores once; a corpus row's approximate score is then the EXPLICIT
    * M-term sum of its codes' LUT entries — the codes column is all that
    * scans, vectors never move, and the explicit left-to-right sum keeps
    * FP association identical in any engine's replay (a `sum()` over an
    * unordered group would not). Rank within query, top k, ties to the
    * lower corpus id. Compose with IVF partition pruning upstream when
    * even the codes scan should be partial. */
  def pqTopK(codedCorpus: DataFrame, corpusId: String,
      queries: DataFrame, queryId: String, queryVec: String,
      codebooks: Array[Array[(Int, Seq[Double])]], k: Int): DataFrame = {
    val subdim = codebooks(0)(0)._2.length
    // same degenerate-slice guard as pqAssign, on the query side
    val qv = checkedVec(asDouble(col(queryVec)), codebooks.length * subdim, "pqTopK")
    val lut = array(codebooks.zipWithIndex.map { case (cents, m) =>
      val sub = slice(qv, m * subdim + 1, subdim)
      array(cents.sortBy(_._1).map { case (_, c) =>
        lit(2.0) * dot(sub, array(c.map(lit): _*)) - lit(c.map(x => x * x).sum)
      }: _*)
    }: _*)
    val q = queries.select(col(queryId).as("query_id"), lut.as("__lut"))
    val score = codebooks.indices.map { m =>
      element_at(element_at(col("__lut"), m + 1),
        element_at(col("pq_code"), m + 1) + 1)
    }.reduce(_ + _) // left-to-right, matching the oracle's s0 + s1 + ... sum
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("corpus_id").asc)
    codedCorpus.select(col(corpusId).as("corpus_id"), col("pq_code"))
      .crossJoin(broadcast(q))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("adc", score)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("adc"), col("rank"))
  }

  /** IVF-PQ composed ANN probe — the production IVFADC shape (Jégou et
    * al. 2011): the corpus index carries ONLY `(centroid_id, corpus_id,
    * pq_code)` — coarse cell from the unit-vector argmax ([[ivfTopK]]'s
    * convention), codes from the raw-vector codebooks ([[pqTopK]]'s) —
    * so at 100 TB the table is bucketed by centroid_id and a query reads
    * `nProbe/N` of the CODES, never a full-precision vector: partition
    * pruning × 32× compression in one scan. Queries probe their `nProbe`
    * nearest coarse centroids, build the per-query ADC lookup table once,
    * equi-join the pruned cells, and rank by the explicit M-term ADC sum
    * (left-to-right, the n6 FP-association contract). Output
    * `(query_id, centroid_id, corpus_id, adc, rank)`. */
  def ivfPqTopK(corpus: DataFrame, corpusId: String, vecCol: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[(Int, Seq[Double])],
      codebooks: Array[Array[(Int, Seq[Double])]],
      nProbe: Int, k: Int): DataFrame = {
    val index = pqAssign(assignFixedCentroids(corpus, vecCol, centroids),
        vecCol, codebooks)
      .select(col("centroid_id"), col(corpusId).as("corpus_id"), col("pq_code"))
    val subdim = codebooks(0)(0)._2.length
    val qvRaw = checkedVec(asDouble(col(queryVec)),
      codebooks.length * subdim, "ivfPqTopK")
    val lut = array(codebooks.zipWithIndex.map { case (cents, m) =>
      val sub = slice(qvRaw, m * subdim + 1, subdim)
      array(cents.sortBy(_._1).map { case (_, c) =>
        lit(2.0) * dot(sub, array(c.map(lit): _*)) - lit(c.map(x => x * x).sum)
      }: _*)
    }: _*)
    val centroidArr = array(centroids.toSeq.map { case (id, c) =>
      struct(lit(id).as("cid"), array(c.map(lit): _*).as("cvec"))
    }: _*)
    val q = withUnit(queries, queryVec)
      .select(col(queryId).as("query_id"), col("__vec").as("qu"), lut.as("__lut"))
      .where(col("qu").isNotNull)
      .withColumn("centroid_id",
        explode(transform(slice(array_sort(centroidArr, (l, r) =>
          when(dot(col("qu"), l("cvec")) > dot(col("qu"), r("cvec")), -1)
            .when(dot(col("qu"), l("cvec")) < dot(col("qu"), r("cvec")), 1)
            .otherwise(0)), 1, nProbe), p => p("cid"))))
      .select(col("query_id"), col("centroid_id"), col("__lut"))
    val score = codebooks.indices.map { m =>
      element_at(element_at(col("__lut"), m + 1),
        element_at(col("pq_code"), m + 1) + 1)
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("corpus_id").asc)
    index.join(broadcast(q), Seq("centroid_id"))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("adc", score)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("centroid_id"), col("corpus_id"),
        col("adc"), col("rank"))
  }

  /** IVF ANN top-k: assign queries to their nearest `nProbe` centroids, join
    * with the pre-assigned corpus on centroid_id, rank within query. At 100 TB
    * the corpus stays partitioned by centroid_id (bucketed table), so the
    * probe is a partition-pruned scan, not a full pass. */
  def ivfTopK(assignedCorpus: DataFrame, corpusId: String, vecCol: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[(Int, Seq[Double])], nProbe: Int, k: Int): DataFrame = {
    val centroidArr = array(centroids.toSeq.map { case (id, c) =>
      struct(lit(id).as("cid"), array(c.map(lit): _*).as("cvec"))
    }: _*)
    val q = withUnit(queries, queryVec)
      .select(col(queryId).as("query_id"), col("__vec").as("qvec"))
      // zero-norm query vectors have no direction: drop them (a null qvec
      // would still probe the first nProbe centroids and rank all-null
      // cosines, emitting meaningless rows a SQL replay rightly lacks)
      .where(col("qvec").isNotNull)
      .withColumn("__probes",
        slice(array_sort(centroidArr, (l, r) =>
          when(dot(col("qvec"), l("cvec")) > dot(col("qvec"), r("cvec")), -1)
            .when(dot(col("qvec"), l("cvec")) < dot(col("qvec"), r("cvec")), 1)
            .otherwise(0)), 1, nProbe))
      .select(col("query_id"), col("qvec"),
        explode(transform(col("__probes"), p => p("cid"))).as("centroid_id"))
    val c = withUnit(assignedCorpus, vecCol).select(
      col("centroid_id"), col(corpusId).as("corpus_id"), col("__vec").as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    c.join(broadcast(q), Seq("centroid_id"))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), dot(col("cvec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** MMR diversity re-ranking (Carbonell & Goldstein 1998): greedily pick
    * `k` items maximizing `λ·rel − (1−λ)·max cos to already-picked` —
    * relevance alone returns near-duplicates; MMR is the standard
    * diversity-aware selection for retrieval and training-data curation.
    *
    * Two-stage shape (the ANN doctrine): the DISTRIBUTED leg scores the
    * whole corpus against the query (one broadcast pass, unit vectors,
    * one dot each) and keeps the top-`candidates` pool; the greedy loop —
    * inherently sequential, O(k·candidates) — runs on the driver over the
    * BOUNDED pool. Every arithmetic step (unitize, sequential dot, max,
    * λ-blend) mirrors the relational form exactly, so a SQL replay
    * reproduces the picks and scores bit-for-bit. Ties break to the
    * smallest id. Output: `(pick, corpus_id, mmr)` in pick order. */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, candidates: Int, k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates >= k >= 1")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val spark = corpus.sparkSession
    val u = withUnit(corpus, vecCol)
      .select(col(idCol).cast("long").as("id"), col("__vec").as("uvec"))
      .where(col("uvec").isNotNull)
    val q = u.where(col("id") === queryId).select(col("uvec").as("qvec"))
    val pool = u.where(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("id"), col("uvec"), dot(col("uvec"), col("qvec")).as("rel"))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(candidates)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1) // id order: strict `>` then keeps the smallest id on ties
    def sdot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
    val taken = scala.collection.mutable.Set.empty[Long]
    while (chosen.size < k && taken.size < pool.length) {
      var best: (Long, Array[Double], Double) = null
      var bestScore = Double.NegativeInfinity
      pool.foreach { case (id, vec, rel) =>
        if (!taken(id)) {
          val maxSim = if (chosen.isEmpty) 0.0
            else chosen.iterator.map(c => sdot(vec, c._2)).max
          val s = lambda * rel - (1.0 - lambda) * maxSim
          if (s > bestScore) { bestScore = s; best = (id, vec, s) }
        }
      }
      taken += best._1
      chosen += best
    }
    import spark.implicits._
    chosen.toSeq.zipWithIndex
      .map { case ((id, _, s), i) => (i + 1, id, s) }
      .toDF("pick", "corpus_id", "mmr")
  }
}
