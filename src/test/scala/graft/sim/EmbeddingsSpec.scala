package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Seq(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Seq(0.0f, 0.95f, 0.05f))  // close to 2
  ).toDF("vec_id", "embedding")

  test("cosine of identical / orthogonal / opposite vectors") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(-2.0, 1.0))).toDF("a", "b", "c")
    val cab = df.select(Embeddings.cosine($"a", $"b")).as[Double].head()
    val cac = df.select(Embeddings.cosine($"a", $"c")).as[Double].head()
    assert(math.abs(cab - 1.0) < 1e-12)
    assert(math.abs(cac) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    val top = Embeddings.bruteForceTopK(vecs, "vec_id", "embedding",
      vecs.where($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .orderBy($"rank")
      .collect().map(r => (r.getAs[Long]("corpus_id"), r.getAs[Int]("rank")))
    assert(top.toSeq == Seq((1L, 1), (2L, 2))) // nearest first, never itself
  }

  test("lshNearDupPairs finds high-cosine pairs") {
    val pairs = Embeddings.lshNearDupPairs(vecs, "vec_id", "embedding",
      minCosine = 0.9, nBits = 2, dim = 3, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 0L && b == 3L }) // opposite never passes
  }

  test("blockedNearDupPairs is quadratic only within blocks") {
    val withBlock = vecs.withColumn("block", when($"vec_id" <= 1, 0).otherwise(1))
    val pairs = Embeddings.blockedNearDupPairs(withBlock, "vec_id", "embedding",
      "block", minCosine = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (2L, 4L)))
  }

  test("ivfAssign + ivfTopK recover nearest neighbors through centroid probe") {
    val assigned = Embeddings.ivfAssign(vecs, "embedding", nCentroids = 2)
    assert(assigned.columns.contains("centroid_id"))
    val model = assigned.select($"centroid_id",
        Embeddings.asDouble($"embedding").as("v"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val centroids = model.groupBy(_._1).map { case (cid, rows) =>
      val sums = rows.map(_._2.toVector).toVector.transpose.map(_.sum / rows.length)
      (cid, sums: Seq[Double])
    }.toArray
    val top = Embeddings.ivfTopK(assigned, "vec_id", "embedding",
      vecs.where($"vec_id" === 0), "vec_id", "embedding",
      centroids, nProbe = 1, k = 1)
      .collect().map(r => r.getAs[Long]("corpus_id"))
    assert(top.toSeq == Seq(1L))
  }

  test("partitioned IVF corpus: the probe scan prunes to probed centroids") {
    val (assigned, centroids) = Embeddings.ivfIndex(vecs, "embedding", nCentroids = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/corpus"
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val queries = vecs.where($"vec_id" === 0)
    val probes = Embeddings.probedCentroids(queries, "embedding", centroids, nProbe = 1)
    assert(probes.length == 1)
    val pruned = corpus.where($"centroid_id".isin(probes.map(Integer.valueOf): _*))
    // partition pruning reaches the scan: only the probed directories read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"), plan)
    // and the probe over the pruned corpus returns the same neighbors
    val full = Embeddings.ivfTopK(assigned, "vec_id", "embedding",
      queries, "vec_id", "embedding", centroids, nProbe = 1, k = 1)
      .collect().map(r => r.getAs[Long]("corpus_id")).toSeq
    val prunedTop = Embeddings.ivfTopK(pruned, "vec_id", "embedding",
      queries, "vec_id", "embedding", centroids, nProbe = 1, k = 1)
      .collect().map(r => r.getAs[Long]("corpus_id")).toSeq
    assert(prunedTop == full && full == Seq(1L))
  }

  test("pqTrain fits per-subspace codebooks pqAssign accepts; deterministic by seed") {
    // two well-separated clusters per 2-dim subspace: trained centers must
    // land near them and codes must separate the clusters
    val rng = new scala.util.Random(17)
    val rows = (0 until 200).map { i =>
      val hi = i % 2 == 0
      (i.toLong, Seq.tabulate(4)(d =>
        ((if (hi) 5.0 else -5.0) + rng.nextGaussian() * 0.1).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val books = Embeddings.pqTrain(df, "embedding",
      numSubspaces = 2, k = 2, dim = 4, seed = 9L)
    assert(books.length == 2 && books.forall(_.length == 2))
    assert(books.forall(_.forall(_._2.length == 2)))
    // shape contract pqAssign enforces: cids exactly 0..k-1
    assert(books.forall(cb => cb.map(_._1).sorted.sameElements(cb.indices)))
    // each subspace's two centers straddle the two planted clusters
    books.foreach { cb =>
      val means = cb.map(_._2.sum / 2).sorted
      assert(means(0) < -4 && means(1) > 4, s"centers missed the clusters: ${cb.toSeq}")
    }
    // deterministic: same seed, same fit
    val again = Embeddings.pqTrain(df, "embedding",
      numSubspaces = 2, k = 2, dim = 4, seed = 9L)
    assert(books.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // codes separate the clusters: rows of one cluster share a code vector
    val coded = Embeddings.pqAssign(df, "embedding", books)
      .select($"vec_id", $"pq_code").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    val byCluster = coded.groupBy(_._1 % 2).view.mapValues(_.map(_._2).distinct)
    assert(byCluster(0L).size == 1 && byCluster(1L).size == 1)
    assert(byCluster(0L).head != byCluster(1L).head)
  }

  test("kmeansTrain infers dim and equals the explicit-dim single-subspace fit") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 100).map { i =>
      val hi = i % 2 == 0
      (i.toLong, Seq.tabulate(4)(_ =>
        ((if (hi) 3.0 else -3.0) + rng.nextGaussian() * 0.05).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val inferred = Embeddings.kmeansTrain(df, "embedding", k = 2, seed = 11L)
    val explicit = Embeddings.pqTrain(df, "embedding",
      numSubspaces = 1, k = 2, dim = 4, seed = 11L).head
    assert(inferred.toSeq == explicit.toSeq)
    // the two centers straddle the planted ±3 clusters
    val means = inferred.map(_._2.sum / 4).sorted
    assert(means(0) < -2 && means(1) > 2, s"centers missed clusters: ${inferred.toSeq}")
  }

  test("JL random projection preserves planted nearest neighbors through " +
      "the prefilter") {
    val rng = new scala.util.Random(31)
    // 60 random unit-ish vectors + a planted twin for each of 4 queries
    val base = (0 until 60).map(i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat)))
    val twins = (0 until 4).map(i =>
      (100L + i, base(i)._2.map(x => x + 0.01f)))
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 4)
    val got = Embeddings.rpPrefilterTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding",
      inDim = 16, outDim = 8, seed = 5L, candidates = 16, k = 1)
      .select($"query_id", $"corpus_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Embeddings.bruteForceTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1)
      .select($"query_id", $"corpus_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the planted twin is the true top-1 and survives the prefilter
    (0 until 4).foreach { i =>
      assert(exact(i.toLong) == 100L + i)
      assert(got(i.toLong) == exact(i.toLong),
        s"query $i: prefilter ${got(i.toLong)} vs exact ${exact(i.toLong)}")
    }
    // deterministic matrix: same seed, same entries
    assert(Embeddings.rpMatrix(16, 8, 5L).map(_.toSeq).toSeq ==
      Embeddings.rpMatrix(16, 8, 5L).map(_.toSeq).toSeq)
  }

  test("pqTrain's sample gate binds deterministically and fits still separate") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 1000).map { i =>
      val hi = i % 2 == 0
      (i.toLong, Seq.tabulate(4)(_ =>
        ((if (hi) 4.0 else -4.0) + rng.nextGaussian() * 0.1).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val capped = Embeddings.pqTrain(df, "embedding",
      numSubspaces = 1, k = 2, dim = 4, seed = 7L, sampleCap = 100)
    // deterministic under the gate: the content-hash threshold selects the
    // same sample on any layout, so the fit is bit-identical
    val again = Embeddings.pqTrain(df, "embedding",
      numSubspaces = 1, k = 2, dim = 4, seed = 7L, sampleCap = 100)
    assert(capped.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // and a ~10% sample of well-separated clusters still recovers them
    val means = capped.head.map(_._2.sum / 4).sorted
    assert(means(0) < -3 && means(1) > 3, s"gated fit missed clusters: ${capped.head.toSeq}")
  }

  test("semanticDedup drops higher-id near-dups inside a cluster only") {
    val rows = Seq(
      // cluster A (around +5): 1 and 2 near-identical (cos ≈ 1), 3 in the
      // same L2 cluster but pointing differently (cos < τ vs 1)
      (1L, Seq(5.0f, 5.0f, 0.1f, 0.0f)),
      (2L, Seq(5.0f, 5.0f, 0.1001f, 0.0f)),
      (3L, Seq(4.0f, 6.0f, 0.0f, 0.0f)),
      // cluster B (around −5): twins 4 and 5
      (4L, Seq(-5.0f, -5.0f, 0.0f, 0.2f)),
      (5L, Seq(-5.0f, -5.0f, 0.0f, 0.2002f)),
      // zero-norm: no direction, always kept
      (6L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val (kept, centers) = Embeddings.semanticDedup(df, "vec_id", "embedding",
      k = 2, minCosine = 0.99, seed = 3L)
    assert(centers.length == 2)
    val keptIds = kept.select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds == Seq(1L, 3L, 4L, 6L), s"kept: $keptIds")
    // kept rows carry their cluster: twins' survivors are in different
    // clusters than each other (A vs B)
    val cids = kept.select($"vec_id", $"centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cids(1L) != cids(4L))
    // determinism: same seed, same survivors
    val (kept2, _) = Embeddings.semanticDedup(df, "vec_id", "embedding",
      k = 2, minCosine = 0.99, seed = 3L)
    assert(kept2.select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq == keptIds)
  }

  test("semanticK scales k with the corpus; auto path equals fixed-k at the clamp") {
    // the linearizing rule: ceil(n/target) clamped to [kMin, kMax]
    assert(Embeddings.semanticK(1000L, targetClusterSize = 500L) == 8) // kMin
    assert(Embeddings.semanticK(200000L, targetClusterSize = 500L) == 400)
    assert(Embeddings.semanticK(100000000L, targetClusterSize = 500L) == 4096) // kMax
    assert(Embeddings.semanticK(10001L, targetClusterSize = 10000L, kMin = 1) == 2)
    // at the kMin clamp the auto path trains the same k → same survivors
    val rows = Seq(
      (1L, Seq(5.0f, 5.0f, 0.1f, 0.0f)),
      (2L, Seq(5.0f, 5.0f, 0.1001f, 0.0f)),
      (3L, Seq(4.0f, 6.0f, 0.0f, 0.0f)),
      (4L, Seq(-5.0f, -5.0f, 0.0f, 0.2f)),
      (5L, Seq(-5.0f, -5.0f, 0.0f, 0.2002f)),
      (6L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val (fixedKept, _) = Embeddings.semanticDedup(df, "vec_id", "embedding",
      k = 2, minCosine = 0.99, seed = 3L)
    val (autoKept, autoCenters) = Embeddings.semanticDedupAuto(df, "vec_id",
      "embedding", minCosine = 0.99, targetClusterSize = 3L, seed = 3L,
      kMin = 2)
    assert(autoCenters.length == 2) // ceil(6/3) = 2
    assert(autoKept.select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq ==
      fixedKept.select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("mmrSelect: first pick is the most relevant, near-dup of it is deferred") {
    // query q = e0. Candidates: a ≈ q (rel .99+), a2 ≈ a (near-dup),
    // b orthogonal-ish but diverse. Pure relevance would pick (a, a2);
    // MMR at λ=0.5 must pick a first, then prefer the DIVERSE b over a2.
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),            // query
      (1L, Array(0.99f, 0.1f, 0f, 0f)),       // a: most relevant
      (2L, Array(0.98f, 0.12f, 0f, 0f)),      // a2: near-dup of a
      (3L, Array(0.6f, 0f, 0.8f, 0f)))        // b: diverse, lower rel
      .toDF("vec_id", "embedding")
    val picks = Embeddings.mmrSelect(df, "vec_id", "embedding",
        queryId = 0L, candidates = 3, k = 3, lambda = 0.5)
      .select($"pick", $"corpus_id").as[(Int, Long)].collect().toSeq
    assert(picks.map(_._2) == Seq(1L, 3L, 2L), s"got $picks")
  }

  test("mmrSelect: lambda 1 reduces to pure relevance ranking") {
    val rng = new scala.util.Random(5)
    val df = (0L to 30L).map(i =>
      (i, Array.fill(8)(rng.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val mmr = Embeddings.mmrSelect(df, "vec_id", "embedding",
        queryId = 0L, candidates = 10, k = 5, lambda = 1.0)
      .select($"pick", $"corpus_id").as[(Int, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq
    val rel = Embeddings.bruteForceTopK(df, "vec_id", "embedding",
        df.where($"vec_id" === 0L), "vec_id", "embedding", k = 5)
      .orderBy($"rank").select($"corpus_id").as[Long].collect().toSeq
    assert(mmr == rel)
  }

  test("annEvalDF: recall and reciprocal rank from hand-built rank frames") {
    val truth = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 50L, 1L), (2L, 60L, 2L), (2L, 70L, 3L))
      .toDF("query_id", "corpus_id", "rank")
    // q1: index finds 10 (at rank 2) and 30, misses 20 → recall 2/3, rr 1/2
    // q2: index misses the true NN 50 entirely → recall 1/3, rr 0
    val approx = Seq((1L, 40L, 1L), (1L, 10L, 2L), (1L, 30L, 3L),
      (2L, 60L, 1L), (2L, 80L, 2L), (2L, 90L, 3L))
      .toDF("query_id", "corpus_id", "rank")
    val r = Embeddings.annEvalDF(truth, approx, k = 3)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r(0)._1 == 1L && r(0)._2 == 3L && r(0)._3 == 2L)
    assert(math.abs(r(0)._4 - 2.0 / 3) < 1e-6 && r(0)._5 == 0.5)
    assert(r(1)._1 == 2L && r(1)._3 == 1L && r(1)._5 == 0.0)
  }

  test("annEvalDF: a perfect index scores recall 1 and rr 1 everywhere") {
    val frame = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 30L, 1L), (2L, 40L, 2L))
      .toDF("query_id", "corpus_id", "rank")
    Embeddings.annEvalDF(frame, frame, k = 2).collect().foreach { row =>
      assert(row.getDouble(3) == 1.0 && row.getDouble(4) == 1.0)
    }
  }

  test("hardNegatives: same-label neighbors are excluded, ranks are by cosine") {
    // query 0 (label 0) at e1; its nearest SAME-label vector 1 must not
    // appear; among label-1 vectors, 10 (cos≈1 direction) beats 11 beats 12
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.14f, 0f, 0f), 0),   // closest overall, same label
      (10L, Array(0.9f, 0.43f, 0f, 0f), 1),
      (11L, Array(0.6f, 0.8f, 0f, 0f), 1),
      (12L, Array(0f, 1f, 0f, 0f), 1))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val r = Embeddings.hardNegatives(df, "vec_id", "embedding", "label",
        df.where(col("vec_id") === 0L), "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(r.toSeq == Seq((0L, 0L, 10L, 1L, 1), (0L, 0L, 11L, 1L, 2)))
  }

  test("hardNegatives: NULL labels and zero-norm vectors drop") {
    val df = Seq(
      (0L, Array(1f, 0f), Some(0)),
      (1L, Array(0.9f, 0.1f), None),          // null label: never a negative
      (2L, Array(0f, 0f), Some(1)),           // zero norm: dropped
      (3L, Array(0.5f, 0.5f), Some(1))).toDF("vec_id", "embedding", "label")
    val r = Embeddings.hardNegatives(df, "vec_id", "embedding", "label",
        df.where(col("vec_id") === 0L), "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(r.toSeq == Seq((0L, 0L, 3L, 1L, 1)))
  }
}
