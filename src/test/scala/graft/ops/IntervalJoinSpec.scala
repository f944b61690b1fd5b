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
}
