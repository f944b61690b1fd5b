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

  test("heatmap2d: bins cover the range, max folds into the top cell") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (for (x <- 0 to 15; y <- 0 to 15) yield (x.toDouble, y.toDouble))
      .toDF("x", "y").repartition(5)
    val r = Histogram.heatmap2d(df, "x", "y", nx = 4, ny = 4).collect()
    // 16×16 uniform grid into 4×4 bins → every cell holds 16 points
    assert(r.length == 16)
    r.foreach(row => assert(row.getLong(2) == 16L))
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet ==
      (for (a <- 0L to 3L; b <- 0L to 3L) yield (a, b)).toSet)
    // constant dimension collapses to bin 0; nulls drop
    val const = Seq((Some(1.0), Some(5.0)), (Some(2.0), Some(5.0)),
      (None, Some(5.0))).toDF("x", "y")
    val c = Histogram.heatmap2d(const, "x", "y", nx = 2, ny = 2).collect()
    assert(c.forall(_.getLong(1) == 0L))
    assert(c.map(_.getLong(2)).sum == 2L)
  }
}
