package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the multi-key row-hash-salted join and hot-key monitor
  * (single-key + bucketed layout live in PartitioningSpec). */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("multi-key saltedJoin equals the plain inner join, incl. a hot key and misses") {
    val rng = new scala.util.Random(5)
    // key 7 is hot on the left; keys 100+ have no right-side match
    val left = Seq.fill(300)((if (rng.nextDouble() < 0.5) 7L else rng.nextInt(110).toLong,
      rng.nextInt(1000))).toDF("k", "lv")
    val right = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select($"k", $"lv", $"rv")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = Partitioning.saltedJoin(left, right, Seq("k"), salts = 8)
      .select($"k", $"lv", $"rv")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("saltedJoin with multi-column keys and overlapping value column names") {
    val left = Seq((1L, "a", 10), (1L, "b", 20), (2L, "a", 30)).toDF("k1", "k2", "v")
    val right = Seq((1L, "a", 99), (2L, "a", 77)).toDF("k1", "k2", "v")
    val got = Partitioning.saltedJoin(left, right, Seq("k1", "k2"), salts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).sorted
    assert(got.toSeq == Seq((1L, "a", 10, 99), (2L, "a", 30, 77)))
  }

  test("skewIsolatedJoin equals the plain inner join and broadcasts the hot slice") {
    val rng = new scala.util.Random(9)
    val left = Seq.fill(400)((if (rng.nextDouble() < 0.6) 3L else rng.nextInt(50).toLong,
      rng.nextInt(100))).toDF("k", "lv")
    val right = (0L until 40L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select($"k", $"lv", $"rv")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val iso = Partitioning.skewIsolatedJoin(left, right, Seq("k"), hotKeyLimit = 2)
    val got = iso.select($"k", $"lv", $"rv")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(got.toSeq == plain.toSeq)
    assert(iso.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("hotKeys surfaces the heaviest keys first") {
    val df = (Seq.fill(50)(1L) ++ Seq.fill(10)(2L) ++ Seq(3L)).toDF("k")
    val top = Partitioning.hotKeys(df, Seq("k"), topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == Seq((1L, 50L), (2L, 10L)))
  }
}
