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
}
