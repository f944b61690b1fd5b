package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleStats: K4 is all triangles, a path has none") {
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("u", "v")
    val r = Graph.triangleStats(k4, "u", "v").collect()
    assert(r.length == 4)
    r.foreach { row =>
      assert(row.getLong(1) == 3L && row.getLong(2) == 3L)
      assert(row.getDouble(3) == 1.0)
    }
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val p = Graph.triangleStats(path, "u", "v").collect()
    assert(p.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 1L, 0L)))
    assert(p.forall(_.getDouble(3) == 0.0))
  }

  test("triangleStats: duplicate/reversed/self edges normalize away") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 3L))
      .toDF("u", "v")
    val r = Graph.triangleStats(messy, "u", "v").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L)))
  }

  test("triangleStats: distributed equals the driver enumeration") {
    val rng = new scala.util.Random(113)
    val edges = Seq.fill(300)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val df = edges.toDF("u", "v").repartition(7)
    val got = Graph.triangleStats(df, "u", "v").collect()
    val canon = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val adj = canon.toSeq.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { row =>
      val id = row.getLong(0)
      val nbrs = adj(id)
      assert(row.getLong(1) == nbrs.size.toLong)
      val t = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => canon((math.min(x, y), math.max(x, y))) }
      assert(row.getLong(2) == t.toLong, s"node $id")
      if (nbrs.size >= 2)
        assert(math.abs(row.getDouble(3) -
          2.0 * t / (nbrs.size.toDouble * (nbrs.size - 1))) < 1e-6)
    }
    assert(got.length == adj.size)
  }

  test("pageRank: hand-computed path graph, two iterations") {
    // P3 (1-2-3), damping 85/100, micro-rank units:
    //   iter1: r1 = 150000 + 85·(1000000 DIV 2)/100       = 575000
    //          r2 = 150000 + 85·(1000000+1000000)/100     = 1850000
    //   iter2: r1 = 150000 + 85·(1850000 DIV 2)/100       = 936250
    //          r2 = 150000 + 85·(575000+575000)/100       = 1127500
    val p3 = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val r = Graph.pageRank(p3, "u", "v", iters = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 1L, 936250L, 0.93625),
      (2L, 2L, 1127500L, 1.1275), (3L, 1L, 936250L, 0.93625)))
  }

  test("pageRank: distributed equals the driver power iteration") {
    val rng = new scala.util.Random(31)
    val edges = (Seq.tabulate(120)(i => (i.toLong, (i + 1).toLong % 120)) ++
      Seq.fill(200)((rng.nextInt(120).toLong, rng.nextInt(120).toLong)))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("u", "v").repartition(7)
    val got = Graph.pageRank(df, "u", "v", iters = 4)
      .as[(Long, Long, Long, Double)].collect()
    // driver replay with identical floor arithmetic
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var rank = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 4) {
      val in = adj.keys.map { n =>
        n -> adj(n).map(m => rank(m) / adj(m).size).sum
      }.toMap
      rank = in.map { case (n, c) => n -> (150000L + 85L * c / 100L) }
    }
    assert(got.length == adj.size)
    got.foreach { case (id, deg, micro, rankd) =>
      assert(deg == adj(id).size.toLong)
      assert(micro == rank(id), s"node $id")
      assert(rankd == micro.toDouble / 1000000.0)
    }
  }

  test("edgeJaccard: clique edges score 1, bridges score 0, mixed is exact") {
    // triangle {1,2,3} + pendant 4 on 1 + isolated edge {8,9}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (8L, 9L))
      .toDF("u", "v").repartition(3)
    val r = Graph.edgeJaccard(edges, "u", "v").collect()
      .map(row => ((row.getLong(0), row.getLong(1)),
        (row.getLong(2), row.getLong(3), row.getLong(4),
          Option(row.get(5)).map(_.asInstanceOf[Double])))).toMap
    // (2,3): common {1}, union (2-1)+(2-1)-1 = 1 → inside the clique
    assert(r((2L, 3L)) == ((2L, 2L, 1L, Some(1.0))))
    // (1,2): N(1)\{2}={3,4}, N(2)\{1}={3} → 1 / 2
    assert(r((1L, 2L)) == ((3L, 2L, 1L, Some(0.5))))
    // (1,4): pendant — no shared neighborhood
    assert(r((1L, 4L)) == ((3L, 1L, 0L, Some(0.0))))
    // (8,9): both degree-1 → empty union, NULL by contract
    assert(r((8L, 9L)) == ((1L, 1L, 0L, None)))
    assert(r.size == 5)
  }

  test("pageRank: K3 is symmetric and floor truncation is visible") {
    // K3: every node's contribution is r DIV 2; iter1:
    // r = 150000 + 85·(2·(1000000 DIV 2)) DIV 100 = 1000000 (exact here)
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val r = Graph.pageRank(k3, "u", "v", iters = 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.map(_._3).distinct.length == 1)
    assert(r.head._3 == 1000000L)
  }
}
