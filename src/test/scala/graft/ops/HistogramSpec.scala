package graft.ops

import graft.SparkSpec

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("equiDepth: uniform distinct values split into equal buckets") {
    val df = (1 to 100).map(i => i.toDouble).toDF("x").repartition(7)
    val got = Histogram.equiDepth(df, "x", k = 4)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq((0L, 1.0, 25.0, 25L), (1L, 26.0, 50.0, 25L),
      (2L, 51.0, 75.0, 25L), (3L, 76.0, 100.0, 25L)))
  }

  test("equiDepth: a heavy value overflows its bucket, never splits") {
    // 10 rows of value 5 all carry cum=0 → bucket 0 takes all 10;
    // the remaining singletons spread over the later buckets
    val df = (Seq.fill(10)(5.0) ++ Seq(6.0, 7.0, 8.0, 9.0, 10.0)).toDF("x")
    val got = Histogram.equiDepth(df, "x", k = 5)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(got.head._1 == 0L && got.head._4 == 10L)
    assert(got.map(_._4).sum == 15L)     // counts conserved
    assert(got.flatMap(r => Seq(r._2, r._3)).forall(v => v >= 5.0 && v <= 10.0))
  }

  test("equiDepth: bucket bounds tile the value range in order") {
    val rng = new scala.util.Random(53)
    val df = Seq.fill(600)(math.round(rng.nextGaussian() * 500) / 100.0)
      .toDF("x").repartition(9)
    val got = Histogram.equiDepth(df, "x", k = 8)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    got.foreach(r => assert(r._2 <= r._3))
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2)  // disjoint, ordered
      case _ =>
    }
    assert(got.map(_._4).sum == 600L)
  }
}
