package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("itemPairs: hand graph — dup rows, minCount, basket cap") {
    // b4 has a duplicate (basket, item) row (counts once);
    // b5 exceeds maxBasketSize=3 and drops whole
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L),
      (4L, 1L), (4L, 1L), (4L, 2L),
      (5L, 10L), (5L, 11L), (5L, 12L), (5L, 13L))
      .toDF("bk", "it").repartition(3)
    val r = Cooccurrence.itemPairs(rows, "bk", "it",
      minCount = 2L, maxBasketSize = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // totals after cap: n_1=3 (b1,b2,b4), n_2=4, n_3=2
    // pairs: (1,2)=3, (2,3)=2; (1,3)=1 drops below minCount
    assert(r.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      Seq((1L, 2L, 3L, 3L, 4L), (2L, 3L, 2L, 4L, 2L)))
    assert(math.abs(r(0)._6 - 3.0 / math.sqrt(12.0)) < 1e-6)
    assert(math.abs(r(1)._6 - 2.0 / math.sqrt(8.0)) < 1e-6)
  }

  test("itemPairs: NULL baskets and items drop") {
    val rows = Seq(
      (Some(1L), Some(1L)), (Some(1L), Some(2L)),
      (Some(2L), Some(1L)), (Some(2L), Some(2L)),
      (None, Some(1L)), (Some(3L), None))
      .toDF("bk", "it")
    val r = Cooccurrence.itemPairs(rows, "bk", "it", minCount = 2L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(r.map(t => (t._1, t._2, t._3)) == Seq((1L, 2L, 2L)))
  }
}
