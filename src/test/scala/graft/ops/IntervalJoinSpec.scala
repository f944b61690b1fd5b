package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // random intervals over a 10_000-unit timeline, lengths 0-500 — many
  // bin-spanning intervals and boundary touches (inclusive bounds)
  private lazy val (leftRows, rightRows) = {
    val rng = new scala.util.Random(41)
    def mk(n: Int, off: Int) = (1 to n).map { i =>
      val s = rng.nextInt(10000).toLong
      (off + i.toLong, s, s + rng.nextInt(500))
    }
    (mk(300, 0), mk(300, 1000))
  }

  private def naive: Set[(Long, Long)] =
    (for {
      (li, ls, le) <- leftRows; (ri, rs, re) <- rightRows
      if ls <= re && rs <= le
    } yield (li, ri)).toSet

  test("binned overlap join ≡ naive all-pairs filter, each pair exactly once") {
    val l = leftRows.toDF("l_id", "s", "e")
    val r = rightRows.toDF("r_id", "s", "e")
    for (binWidth <- Seq(64L, 500L, 5000L)) { // narrow, typical, coarse
      val got = IntervalJoin.overlapJoin(l, r, "s", "e", binWidth)
        .select($"l_id", $"r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, s"bin $binWidth: duplicate emissions")
      assert(got.toSet == naive, s"bin $binWidth: wrong pair set")
    }
  }

  test("the plan is a hash equi join on the bin — no nested loop") {
    val l = leftRows.toDF("l_id", "s", "e")
    val r = rightRows.toDF("r_id", "s", "e")
    val plan = IntervalJoin.overlapJoin(l, r, "s", "e", 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a loop join:\n$plan")
  }

  test("inclusive boundary: touching endpoints overlap") {
    val l = Seq((1L, 100L, 200L)).toDF("l_id", "s", "e")
    val r = Seq((2L, 200L, 300L), (3L, 201L, 300L)).toDF("r_id", "s", "e")
    val got = IntervalJoin.overlapJoin(l, r, "s", "e", 1000L)
      .select($"l_id", $"r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // 200 touches; 201 does not
  }

  test("pointLookup: exact containment, boundaries, misses, gaps") {
    val dim = Seq((0L, 99L, "low"), (100L, 499L, "mid"), (700L, 999L, "high"))
      .toDF("lo", "hi", "bracket")
    val pts = Seq(-5L, 0L, 99L, 100L, 499L, 500L, 650L, 700L, 999L, 1000L)
      .toDF("p")
    val r = IntervalJoin.pointLookup(pts, "p", dim, "lo", "hi",
        Seq("bracket" -> "bracket"))
      .select("p", "bracket", "in_range")
      .as[(Long, Option[String], Boolean)].collect().map(t => t._1 -> t).toMap
    assert(r(-5L)._2.isEmpty && !r(-5L)._3)
    assert(r(0L)._2.contains("low") && r(99L)._2.contains("low"))
    assert(r(100L)._2.contains("mid") && r(499L)._2.contains("mid"))
    assert(r(500L)._2.isEmpty && !r(500L)._3)   // gap between mid and high
    assert(r(650L)._2.isEmpty)
    assert(r(700L)._2.contains("high") && r(999L)._2.contains("high"))
    assert(r(1000L)._2.isEmpty && !r(1000L)._3) // past the last interval
  }

  test("pointLookup: distributed equals a driver BETWEEN scan") {
    val rng = new scala.util.Random(53)
    // non-overlapping random brackets with gaps
    var cur = 0L
    val dim = Seq.fill(40) {
      val lo = cur + 1 + rng.nextInt(50)
      val hi = lo + rng.nextInt(100)
      cur = hi
      (lo, hi, s"b${lo}")
    }
    val pts = Seq.fill(2000)(rng.nextInt(cur.toInt + 100).toLong)
    val got = IntervalJoin.pointLookup(pts.toDF("p").repartition(9), "p",
        dim.toDF("lo", "hi", "name"), "lo", "hi", Seq("name" -> "name"))
      .select("p", "name").as[(Long, Option[String])].collect()
    got.foreach { case (p, name) =>
      val ref = dim.find(d => d._1 <= p && p <= d._2).map(_._3)
      assert(name == ref, s"point $p")
    }
    assert(got.length == pts.length)
  }

  test("pointLookup: overlapping dim refuses loudly") {
    val dim = Seq((0L, 100L, "a"), (50L, 150L, "b")).toDF("lo", "hi", "v")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.pointLookup(Seq(1L).toDF("p"), "p", dim, "lo", "hi",
        Seq("v" -> "v"))
    }
    assert(e.getMessage.contains("non-overlapping"))
  }
}
