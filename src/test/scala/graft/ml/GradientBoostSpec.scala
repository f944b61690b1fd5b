package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GradientBoostSpec extends SparkSpec {
  import spark.implicits._

  test("one feature, shrinkage 1, one round = saturated cell means") {
    val rows = Seq.fill(40)((0, 10.0)) ++ Seq.fill(60)((1, 30.0))
    val df = rows.toDF("x", "y").repartition(5)
    val fit = GradientBoost.fitCells(df, col("y"), Seq("x" -> col("x")),
      rounds = 1, shrinkage = 1.0)
    val s = fit.stumps.head
    assert(s.feature == "x")
    assert(math.abs(fit.f0 + s.gamma0 - 10.0) < 1e-9)
    assert(math.abs(fit.f0 + s.gamma1 - 30.0) < 1e-9)
  }

  test("boosting reduces residual SSE round over round; deterministic") {
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(1000) {
      val a = rng.nextInt(2); val b = rng.nextInt(2); val c = rng.nextInt(2)
      (a, b, c, 2.0 * a + 5.0 * b - 3.0 * c + rng.nextInt(3))
    }
    val feats = Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"))
    def sseOf(fit: GradientBoost.GbtFit): Double = {
      val score = rows.map { case (a, b, c, _) =>
        fit.f0 + fit.stumps.map(s =>
          if ((s.feature match { case "a" => a; case "b" => b; case _ => c })
            == 1) s.gamma1 else s.gamma0).sum
      }
      rows.zip(score).map { case ((_, _, _, y), sc) =>
        (y - sc) * (y - sc) }.sum
    }
    val df3 = rows.toDF("a", "b", "c", "y").repartition(3)
    val fits = (1 to 5).map(r => GradientBoost.fitCells(df3, col("y"),
      feats, rounds = r, shrinkage = 0.5))
    val sses = fits.map(sseOf)
    assert(sses.zip(sses.tail).forall { case (x, z) => z < x })
    // bit-identical on another layout
    val f17 = GradientBoost.fitCells(
      rows.toDF("a", "b", "c", "y").repartition(17), col("y"), feats,
      rounds = 5, shrinkage = 0.5)
    assert(f17.f0 == fits.last.f0)
    assert(f17.stumps == fits.last.stumps)
  }

  test("ties break on the lowest feature index; Spark chain == SQL chain") {
    val rows = Seq.fill(30)((0, 0, 1.0)) ++ Seq.fill(30)((1, 1, 3.0))
    val df = rows.toDF("a", "b", "y").repartition(3)
    val fit = GradientBoost.fitCells(df, col("y"),
      Seq("a" -> col("a"), "b" -> col("b")), rounds = 2, shrinkage = 0.5)
    assert(fit.stumps.head.feature == "a")
    val viaCol = df.select(GradientBoost.scoreColumn(fit).as("s"))
      .as[Double].collect()
    val viaSql = df.selectExpr(GradientBoost.scoreSql(fit) + " AS s")
      .as[Double].collect()
    assert(viaCol.toSeq == viaSql.toSeq)
  }
}
