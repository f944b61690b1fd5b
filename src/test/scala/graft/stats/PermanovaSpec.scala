package graft.stats

import graft.SparkSpec

class PermanovaSpec extends SparkSpec {
  import spark.implicits._

  test("jaccard distance basics") {
    assert(Permanova.jaccard(Array(true, true, false), Array(true, false, false)) == 0.5)
    assert(Permanova.jaccard(Array(true), Array(true)) == 0.0)
    assert(Permanova.jaccard(Array(false), Array(false)) == 0.0) // both-empty → 0
    assert(Permanova.jaccard(Array(true, false), Array(false, true)) == 1.0)
  }

  test("separated groups give small p, identical-distribution groups large p") {
    val rng = new scala.util.Random(5)
    // group A: features mostly on; group B: mostly off
    val rows = (1 to 40).map { i =>
      val a = i <= 20
      def biased(p: Double) = rng.nextDouble() < p
      (if (a) "A" else "B",
        biased(if (a) 0.9 else 0.1), biased(if (a) 0.9 else 0.1),
        biased(if (a) 0.85 else 0.15))
    }.toDF("grp", "f1", "f2", "f3")
    val sep = Permanova.test(rows, "grp", Seq("f1", "f2", "f3"), nPerm = 199, seed = 1)
    assert(sep.pValue < 0.05, s"p=${sep.pValue}")
    assert(sep.pseudoF > 1.0)

    val nullRows = (1 to 40).map { i =>
      (if (i <= 20) "A" else "B",
        rng.nextBoolean(), rng.nextBoolean(), rng.nextBoolean())
    }.toDF("grp", "f1", "f2", "f3")
    val noSig = Permanova.test(nullRows, "grp", Seq("f1", "f2", "f3"), nPerm = 199, seed = 1)
    assert(noSig.pValue > 0.05, s"p=${noSig.pValue}")
  }

  test("pseudoFDF (distributed) equals the driver-side pseudo-F exactly") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 30).map { i =>
      (i.toLong, if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C",
        rng.nextBoolean(), rng.nextBoolean(), rng.nextBoolean(), rng.nextBoolean())
    }.toDF("id", "grp", "f1", "f2", "f3", "f4")
    val driver = Permanova.test(rows, "grp", Seq("f1", "f2", "f3", "f4"),
      nPerm = 9, seed = 1).pseudoF
    val dist = Permanova.pseudoFDF(rows, "id", "grp", Seq("f1", "f2", "f3", "f4"))
      .select("n", "g", "pseudo_f")
      .as[(Long, Long, Double)].collect().head
    assert(dist._1 == 30L && dist._2 == 3L)
    assert(math.abs(dist._3 - driver) < 1e-6, s"df=$dist driver=$driver")
  }

  test("pseudoFDF non-broadcast path (guard tripped) equals the broadcast path") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 25).map { i =>
      (i.toLong, if (i % 2 == 0) "A" else "B",
        rng.nextBoolean(), rng.nextBoolean(), rng.nextBoolean())
    }.toDF("id", "grp", "f1", "f2", "f3")
    val cols = Seq("f1", "f2", "f3")
    val bc = Permanova.pseudoFDF(rows, "id", "grp", cols)
      .collect().head.toSeq
    // broadcastMaxRows=0 forces the degraded (cartesian) plan
    val noBc = Permanova.pseudoFDF(rows, "id", "grp", cols, broadcastMaxRows = 0L)
      .collect().head.toSeq
    assert(bc == noBc, s"broadcast=$bc cartesian=$noBc")
  }
}
