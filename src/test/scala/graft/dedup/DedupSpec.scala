package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
    (4L, "completely unrelated text about spark query engines and distributed joins here"),
    (5L, "another separate document mentioning catalyst optimizer rules and codegen stages")
  ).toDF("doc_id", "text")

  test("exactDupGroups finds the duplicate group") {
    val groups = Dedup.exactDupGroups(docs, "text", "doc_id")
    val dup = groups.where($"n_dups" > 1).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keep_id") == 1L)
    assert(dup.head.getAs[Long]("n_dups") == 2L)
  }

  test("exactDedup keeps lowest id and preserves schema") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.count() == 4)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 4L, 5L))
  }

  test("incrementalDedup: drops base-known content, keeps first within delta") {
    val base = docs.where($"doc_id" <= 2)          // content of doc 1/2 known
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"), // in base → drop
      (11L, "a brand new document that the base corpus has never seen before"),
      (12L, "a brand new document that the base corpus has never seen before"), // delta-dup → 11 wins
      (13L, "completely unrelated text about spark query engines and distributed joins here")
    ).toDF("doc_id", "text").repartition(3)
    val out = Dedup.incrementalDedup(delta, base, "text", "doc_id")
    assert(out.columns.toSeq == delta.columns.toSeq)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(11L, 13L))
  }

  test("incrementalDedup: bloom acceleration is invisible at any fpp") {
    val rng = new scala.util.Random(61)
    val texts = Seq.tabulate(300)(i => s"document number $i with filler ${rng.nextInt(50)}")
    val base = texts.take(200).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // delta: 100 genuinely new + 50 copies of base content + 20 delta-dups
    val delta = (texts.drop(200).zipWithIndex.map { case (t, i) => (1000L + i, t) } ++
      texts.take(50).zipWithIndex.map { case (t, i) => (2000L + i, t) } ++
      texts.drop(200).take(20).zipWithIndex.map { case (t, i) => (3000L + i, t) })
      .toDF("doc_id", "text").repartition(7)
    val expected = delta.join(base.select(md5($"text").as("h")).distinct(),
        md5(delta("text")) === col("h"), "left_anti")
      .groupBy(md5($"text")).agg(min($"doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    for (fpp <- Seq(0.3, 0.03)) {
      val got = Dedup.incrementalDedup(delta, base, "text", "doc_id", fpp = fpp)
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"fpp=$fpp")
    }
  }

  test("clusterAwareSplit: clusters land whole, singletons hash by own id") {
    val rows = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.clusterAwareSplit(rows, "doc_id", pairs, "id_a", "id_b",
      evalRate = 0.5).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("split_key"), r.getAs[String]("split"))).toMap
    // cluster {1,2,3} keyed by representative 1; {10,11} by 10
    assert(Seq(1L, 2L, 3L).map(byId(_)).distinct.size == 1)
    assert(byId(1L)._1 == 1L)
    assert(Seq(10L, 11L).map(byId(_)).distinct.size == 1)
    assert(byId(10L)._1 == 10L)
    // singleton rule is exactly the md5-prefix hash sample on the own id
    def side(key: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      if (hex < "8000") "eval" else "train"
    }
    (4L to 9L).foreach(i => assert(byId(i)._2 == side(i), s"id $i"))
    assert(byId(2L)._2 == side(1L))
  }

  test("clusterAwareSplit: no near-dup pair ever crosses the split") {
    val rng = new scala.util.Random(83)
    val rows = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(7)
    val pairs = Seq.fill(120)((rng.nextInt(500) + 1L, rng.nextInt(500) + 1L))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val out = Dedup.clusterAwareSplit(rows, "doc_id", pairs, "id_a", "id_b")
    val sideOf = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.collect().foreach { r =>
      assert(sideOf(r.getLong(0)) == sideOf(r.getLong(1)),
        s"pair ${r.getLong(0)}-${r.getLong(1)} crosses the split")
    }
  }

  test("shingles builds distinct word n-grams") {
    val df = Seq("a b c d").toDF("t")
    val got = df.select(Dedup.shingles($"t", 3)).as[Seq[String]].head()
    assert(got.toSet == Set("a b c", "b c d"))
    // short doc: whole text as single shingle
    val short = Seq("a b").toDF("t")
    assert(short.select(Dedup.shingles($"t", 3)).as[Seq[String]].head() == Seq("a b"))
  }

  test("native shingles ≡ the HOF formulation on edge cases and random text") {
    val rng = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "δélta", "e", "zz", "alpha")
    val cases = Seq(
      "", " ", "\t\n ", "one", "one two", "a b c d",
      "a  b\tc\nd", " lead and trail ", "a a a a a", "x  y z w"
    ) ++ Seq.fill(30)(Seq.fill(rng.nextInt(12))(
      words(rng.nextInt(words.length))).mkString(" "))
    for (n <- Seq(1, 2, 3, 5)) {
      val df = cases.toDF("t")
      val got = df.select(Dedup.shingles($"t", n)).as[Seq[String]].collect()
      val want = df.select(Dedup.shinglesHof($"t", n)).as[Seq[String]].collect()
      cases.indices.foreach { i =>
        assert(got(i) == want(i),
          s"n=$n text='${cases(i)}': native ${got(i)} vs hof ${want(i)}")
      }
    }
  }

  test("native shingle hashes: distinct count matches string shingles, sorted, collision-free here") {
    val both = docs.select(
      size(Dedup.shingles($"text", 3)).as("ns"),
      graft.expressions.ShingleHashExpr.shingleHashes($"text", 3).as("hs"))
      .collect()
    both.foreach { r =>
      val hs = r.getSeq[Long](1)
      assert(hs.length == r.getInt(0))      // same distinct cardinality
      assert(hs == hs.sorted)               // sorted output
    }
    // short text: whole token sequence as one shingle
    val short = Seq("a b").toDF("t")
      .select(graft.expressions.ShingleHashExpr.shingleHashes($"t", 3))
      .as[Seq[Long]].head()
    assert(short.length == 1)
    // empty text: empty array
    val empty = Seq("   ").toDF("t")
      .select(graft.expressions.ShingleHashExpr.shingleHashes($"t", 3))
      .as[Seq[Long]].head()
    assert(empty.isEmpty)
  }

  test("native minhash signature matches the HOF formulation") {
    val hashed = docs.select(
      transform(Dedup.shingles($"text", 3), s => xxhash64(s)).as("hs"))
    val both = hashed.select(
      Dedup.minHashSignatureFromHashes($"hs", k = 32, seed = 7L).as("hof"),
      Dedup.minHashSignatureNative($"hs", k = 32, seed = 7L).as("nat"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (hof, nat) => assert(hof == nat) }
  }

  test("minHash est_jaccard tracks true jaccard") {
    val cands = Dedup.minHashCandidates(docs, "doc_id", "text", k = 128, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact dup pair must be found with estimate 1.0
    assert(cands((1L, 2L)) == 1.0)
    // near-dup (12 of 14 trigram shingles shared → j ≈ 0.71) estimated high
    val nearest = Seq(cands.get((1L, 3L)), cands.get((2L, 3L))).flatten
    assert(nearest.nonEmpty && nearest.forall(_ > 0.4))
  }

  test("minHashNearDups thresholds candidates") {
    val out = Dedup.minHashNearDups(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L)))
  }

  test("simHash64 identical docs collide, unrelated docs differ") {
    val sigs = docs.select($"doc_id", Dedup.simHash64("text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    val ham13 = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val ham14 = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(ham13 < ham14) // near dup closer than unrelated
  }

  test("simHashNearDups finds the exact-dup pair at hamming 0") {
    val out = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out((1L, 2L)) == 0)
  }

  test("ngramJaccardPairs computes exact jaccard") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) > 0.5 && out((1L, 3L)) < 1.0)
    assert(out((4L, 5L)) == 0.0)
  }

  test("ngramContainmentPairs: a quoted subset scores 1.0 where jaccard is low") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon"
    val long = short + " zeta eta theta iota kappa lambda mu nu xi omicron " +
      "pi rho sigma tau upsilon phi chi psi omega one two three four five"
    val pair = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val c = Dedup.ngramContainmentPairs(pair, "doc_id", "text",
        n = 3, window = 4, minContain = 0.9)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(c.length == 1)
    val (ia, ib, inter, na, nb, cont) = c.head
    assert((ia, ib) == (1L, 2L) && cont == 1.0 && inter == na && nb > na)
    val j = Dedup.ngramJaccardPairs(pair, "doc_id", "text", n = 3, window = 4)
      .collect().head.getDouble(2)
    assert(j < 0.2) // Jaccard misses what containment catches
    // threshold drops sub-minContain pairs
    val none = Dedup.ngramContainmentPairs(
      Seq((1L, "a b c d e"), (2L, "v w x y z")).toDF("doc_id", "text"),
      "doc_id", "text", n = 3, window = 4, minContain = 0.5).collect()
    assert(none.isEmpty)
  }

  test("bestOfCluster: highest score survives per cluster, singletons keep") {
    import spark.implicits._
    // cluster {1,2,3} via chain; 10 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.1))
      .toDF("doc_id", "quality")
    val r = Dedup.bestOfCluster(scored, "doc_id", pairs, "id_a", "id_b",
        "quality")
      .select("doc_id", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    // tie between 2 and 3 at 0.9 → smaller id 2 wins
    assert(r(1L)._2 == 1L && !r(1L)._3)
    assert(r(2L)._2 == 1L && r(2L)._3)
    assert(r(3L)._2 == 1L && !r(3L)._3)
    assert(r(10L)._2 == 10L && r(10L)._3) // singleton keeps itself
  }

  test("connectedComponents closes transitive chains to min-id labels") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    // triangle 20-21-22, and node 30 only via reversed edge 31->30
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (31L, 30L)).toDF("id_a", "id_b")
    // both execution paths must agree: driver union-find (default for small
    // edge lists) and distributed min-label propagation (forced via threshold)
    for (threshold <- Seq(5000000L, 0L)) {
      val comps = Dedup.connectedComponents(edges, "id_a", "id_b",
          driverMaxEdges = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L), comps.toString)
      assert(comps(10L) == 10L && comps(11L) == 10L)
      assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
      assert(comps(30L) == 30L && comps(31L) == 30L)
      assert(comps.size == 11)
    }
  }

  test("large-star/small-star: O(log n) rounds on a long path, equals union-find") {
    import spark.implicits._
    val n = 512 // path diameter 511: label propagation would need ~511 rounds
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val uf = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = edges.select(col("id_a").as("a"), col("id_b").as("b"))
    val (labelsDF, rounds) = Dedup.ccAlternating(e, maxIter = 25)
    val labels = labelsDF.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == uf, "distributed labels must equal union-find labels")
    assert(labels.values.toSet == Set(1L))
    assert(rounds <= 12, s"expected O(log 512) ≈ ≤12 rounds, got $rounds")
  }

  test("ccAlternating throws (not silently-wrong labels) when maxIter is hit") {
    import spark.implicits._
    val edges = (1 until 64).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    intercept[IllegalStateException](Dedup.ccAlternating(edges, maxIter = 1))
  }

  test("minHashMd5Pairs: identical docs agree on all slots, unrelated on few") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content talking about spark query engines instead"),
      (4L, "unrelated sentence with nothing shared across any of the others here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashMd5Pairs(docs, "doc_id", "text", minAgree = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 8, s"identical docs must agree on all 8 slots: $pairs")
    assert(pairs((3L, 4L)) < 4, s"unrelated docs should agree on few slots: $pairs")
  }

  test("simHashMd5 equals a driver-side recomputation of the same contract") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),
      (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def expected(text: String): Long = {
      val hs = text.split(" ").map(t => java.lang.Long.parseLong(md5hex(t).take(8), 16))
      (0 until 32).map { bit =>
        val v = hs.map(h => if (((h >> bit) & 1L) == 1L) 1 else -1).sum
        if (v >= 0) 1L << bit else 0L
      }.sum
    }
    val got = Dedup.simHashMd5(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == expected("alpha beta gamma alpha"), got.toString)
    assert(got(1L) == got(2L))
    assert(got(3L) == expected("delta epsilon zeta"))
    assert(got(1L) != got(3L))
  }

  test("releaseCheckpoints frees the materialized signature storage") {
    // track the exact checkpointed RDD ids of THIS frame: suites share one
    // session and run in parallel, so global persistent-RDD counts race
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text", 0.5)
    pairs.collect()
    val ckptIds = pairs.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(ckptIds.nonEmpty, "expected a localCheckpoint leaf in the plan")
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(ckptIds.forall(persisted),
      s"checkpointed RDDs $ckptIds should be persisted, saw $persisted")
    Dedup.releaseCheckpoints(pairs)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(ckptIds.forall(id => !after(id)),
      s"checkpoint blocks $ckptIds should be unpersisted, saw $after")
  }

  test("dedupByPairs keeps one representative per component plus singletons") {
    import spark.implicits._
    val rows = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByPairs(rows, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L)) // 1 reps {1,2,3}, 4 singleton, 5 reps {5,6}
  }

  test("editVerifiedPairs keeps only candidates within the edit budget, with the exact distance") {
    import spark.implicits._
    val near = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, near),
      (2L, near.replace("lazy", "hazy")),          // 1 substitution
      (3L, near + " and tomorrow"),                // 13 inserts
      (4L, "completely different content talking about spark query engines instead"),
      (5L, "unrelated sentence with nothing shared across any of the others here"))
      .toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        minAgree = 1, maxDist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    assert(got((1L, 2L)) == 1, s"one substitution: $got")
    assert(got((1L, 3L)) == 13, s"suffix insert: $got")
    assert(got((2L, 3L)) == 14, s"both edits: $got")
    // candidate pairs past the budget are REJECTED by the verify stage
    assert(!got.keySet.exists { case (a, b) => a >= 4L || b >= 4L },
      s"far-apart texts must not survive verification: $got")
    // a tighter budget drops the 13/14-distance pairs too
    val tight = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        minAgree = 1, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == Set((1L, 2L)))
  }

  test("sortedNeighborhoodPairs: prefix-sharing near-dups pair, cross-block dups don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),   // shares prefix w/ 1
      (3L, "alpha beta gamma delta epsilon zeta"),       // exact dup of 1
      (4L, "totally different content over here folks"),
      (5L, "zz unrelated trailing block text")).toDF("doc_id", "text")
    val r = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        keyLen = 24, blockLen = 2, window = 3, n = 3, minJaccard = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val pairs = r.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((1L, 2L)) &&
      pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L))
    assert(r.find(t => (t._1, t._2) == ((1L, 3L))).get._4 == 1.0)
    // layout independence: per-block ranks don't depend on partitioning
    val a = Dedup.sortedNeighborhoodPairs(docs.repartition(7), "doc_id",
      "text", keyLen = 24, blockLen = 2, window = 3).collect().toSeq
    assert(a == Dedup.sortedNeighborhoodPairs(docs.repartition(1), "doc_id",
      "text", keyLen = 24, blockLen = 2, window = 3).collect().toSeq)
  }
}
