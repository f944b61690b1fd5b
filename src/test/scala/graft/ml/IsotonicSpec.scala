package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  test("pavaWeighted pools adjacent violators (hand case)") {
    // y = 3, 1, 2 with unit weights: PAVA pools 3,1 → 2,2 then stays
    val got = Isotonic.pavaWeighted(Array(1, 1, 1), Array(3.0, 1.0, 2.0))
    assert(got.toSeq == Seq(2.0, 2.0, 2.0))
    // weighted: 1.0 (w=3), 0.0 (w=1) → pooled mean 0.75
    val g2 = Isotonic.pavaWeighted(Array(3, 1), Array(1.0, 0.0))
    assert(g2.toSeq == Seq(0.75, 0.75))
    // already monotone → untouched
    val g3 = Isotonic.pavaWeighted(Array(1, 2, 1), Array(0.1, 0.2, 0.9))
    assert(g3.toSeq == Seq(0.1, 0.2, 0.9))
  }

  test("fitCells (relational minimax) equals driver PAVA on random cells") {
    val rnd = new scala.util.Random(42)
    val cells = (0 until 25).map { i =>
      val w = 1 + rnd.nextInt(9)
      (i.toLong, w.toLong, rnd.nextInt(w + 1).toLong) // sy ≤ w
    }
    val df = cells.toDF("cell", "w", "sy").repartition(4)
    val got = Isotonic.fitCells(df)
      .select("cell", "iso").as[(Long, Double)].collect().toMap
    val pava = Isotonic.pavaWeighted(
      cells.map(_._2.toDouble).toArray,
      cells.map(c => c._3.toDouble / c._2).toArray)
    cells.zipWithIndex.foreach { case ((cell, _, _), i) =>
      val expect = BigDecimal(pava(i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(cell) - expect) < 1e-6,
        s"cell $cell: got ${got(cell)}, pava $expect")
    }
  }

  test("fitCells is monotone and respects block means") {
    val df = Seq((0L, 10L, 9L), (1L, 10L, 2L), (2L, 10L, 4L))
      .toDF("cell", "w", "sy")
    val got = Isotonic.fitCells(df)
      .select("cell", "rate", "iso").as[(Long, Double, Double)]
      .collect().sortBy(_._1)
    // rates 0.9, 0.2, 0.4 → all pool to (9+2+4)/30 = 0.5
    assert(got.map(_._3).toSeq == Seq(0.5, 0.5, 0.5))
    assert(got.map(_._2).toSeq == Seq(0.9, 0.2, 0.4))
    // monotone by construction
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("cells builds the bounded frame with null guards") {
    val df = Seq((Some(1.0), Some(true)), (Some(1.0), Some(false)),
      (Some(2.0), Some(true)), (None, Some(true)), (Some(2.0), None))
      .toDF("s", "y")
    val got = Isotonic.cells(df, col("s"), col("y"))
      .as[(Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1.0, 2L, 1L), (2.0, 1L, 1L)))
  }
}
