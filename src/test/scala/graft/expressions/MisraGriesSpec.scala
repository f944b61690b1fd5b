package graft.expressions

import graft.SparkSpec
import graft.ops.HeavyHitters
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // 5 hot keys x 1000 rows + 20k singleton cold keys, shuffled layout
  private def skewed() = {
    val hot = (0 until 5).flatMap(h => Seq.fill(1000)(s"hot_$h"))
    val cold = (0 until 20000).map(i => s"cold_$i")
    new scala.util.Random(42).shuffle(hot ++ cold).toDF("k").repartition(8)
  }

  test("every key above n/(counters+1) survives; estimates undercount " +
      "by at most n/(counters+1)") {
    val df = skewed()
    val m = 64
    val n = df.count()
    val sketch = df.agg(MisraGriesSketch.mgSketch(col("k"), m).as("s"))
      .head().getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= m)
    val bound = n / (m + 1)
    (0 until 5).foreach { h =>
      val key = s"hot_$h"
      assert(sketch.contains(key), s"$key (f=1000 > $bound) must survive")
      val est = sketch(key)
      assert(est <= 1000 && est >= 1000 - bound,
        s"$key est $est outside [${1000 - bound}, 1000]")
    }
    // no counter may OVERcount: estimates are <= true frequency
    val truth = df.groupBy("k").count().as[(String, Long)].collect().toMap
    sketch.foreach { case (k, est) =>
      assert(est <= truth(k), s"$k overcounted: $est > ${truth(k)}")
    }
  }

  test("the merge reduction keeps the guarantee on any partitioning") {
    val base = skewed()
    val m = 64
    Seq(1, 4, 32).foreach { p =>
      val sketch = base.repartition(p)
        .agg(MisraGriesSketch.mgSketch(col("k"), m).as("s"))
        .head().getSeq[Row](0).map(_.getString(0)).toSet
      (0 until 5).foreach { h =>
        assert(sketch(s"hot_$h"), s"hot_$h lost at partitions=$p")
      }
    }
  }

  test("topKExact returns the true top-k with exact counts and a " +
      "holding certificate on skewed data") {
    val df = skewed()
    val r = HeavyHitters.topKExact(df, "k", k = 5, counters = 64)
    assert(r.provablyExact, "certificate must hold: 1000 * 64 > 25000")
    val got = r.rows.as[(String, Long)].collect().toSeq
    assert(got == (0 until 5).map(h => (s"hot_$h", 1000L)),
      s"got $got")
    assert(r.totalRows == 25000L)
  }

  test("the certificate honestly fails on near-uniform high-cardinality " +
      "data") {
    val df = (0 until 20000).map(i => s"u_${i % 2000}").toDF("k")
      .repartition(8)
    val r = HeavyHitters.topKExact(df, "k", k = 5, counters = 64)
    // every key has f = 10; 10 * 64 = 640 <= 20000 -> not provable
    assert(!r.provablyExact)
  }

  test("null keys are ignored") {
    val df = (Seq.fill(100)(Some("a")) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("k")
    val sketch = df.agg(MisraGriesSketch.mgSketch(col("k"), 8).as("s"))
      .head().getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1))
    assert(sketch == Seq("a" -> 100L))
  }
}
