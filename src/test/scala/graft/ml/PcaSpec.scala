package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen: 2x2 hand case — eigenpairs of [[2,1],[1,2]]") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.zip(vecs).sortBy(-_._1)
    assert(math.abs(sorted(0)._1 - 3.0) < 1e-12)
    assert(math.abs(sorted(1)._1 - 1.0) < 1e-12)
    val v0 = sorted(0)._2
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12) // (1,1) direction
  }

  private def syntheticEmb(n: Int): Seq[(Int, Array[Float])] =
    // dominant variance along (1,1,0,0)/sqrt2, noise elsewhere — all
    // dyadic-ish rationals so quantization is tame
    (0 until n).map { i =>
      val t = (i % 17) - 8          // strong signal
      val u = (i % 5) - 2           // weak signal
      val e = Array(
        (t * 0.1 + u * 0.01).toFloat, (t * 0.1 - u * 0.01).toFloat,
        (u * 0.02).toFloat, ((i % 3 - 1) * 0.005).toFloat)
      (i % 3, e)
    }

  test("fitFromMoments: eigen property, orthonormal loadings, dominant direction") {
    val df = syntheticEmb(200).toDF("label", "embedding").repartition(5)
    val qdf = df.select(col("label") +: Pca.quantCols("embedding", 4): _*)
    val moments = Pca.momentAgg(qdf, 4)
    val fit = Pca.fitFromMoments(moments, dim = 4, k = 2)
    // rebuild C from the same exact moments, independently
    val r = moments.collect()(0)
    val n = r.getLong(0).toDouble
    val s = Array.tabulate(4)(i => r.getLong(r.fieldIndex(s"s$i")).toDouble)
    val c = Array.tabulate(4, 4) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      r.getDecimal(r.fieldIndex(s"p_${a}_$b")).doubleValue() / n -
        (s(i) / n) * (s(j) / n)
    }
    val scale = c.map(_.map(math.abs).max).max
    for (ki <- 0 until 2) {
      val w = fit.w(ki); val lam = fit.lambdaQ(ki)
      // C w = lambda w
      for (i <- 0 until 4) {
        val cw = (0 until 4).map(j => c(i)(j) * w(j)).sum
        assert(math.abs(cw - lam * w(i)) < 1e-9 * scale, s"eigen k=$ki i=$i")
      }
      // unit norm
      assert(math.abs(w.map(x => x * x).sum - 1.0) < 1e-12)
    }
    // orthogonality + descending order
    val dot = (0 until 4).map(i => fit.w(0)(i) * fit.w(1)(i)).sum
    assert(math.abs(dot) < 1e-10)
    assert(fit.lambdaQ(0) >= fit.lambdaQ(1))
    // dominant direction is (1,1,0,0)/sqrt2 up to sign (canonical: positive)
    assert(math.abs(fit.w(0)(0) - math.sqrt(0.5)) < 0.02, fit.w(0).mkString(","))
    assert(math.abs(fit.w(0)(1) - math.sqrt(0.5)) < 0.02)
  }

  test("fit is bit-identical across partitionings (exact integer moments)") {
    val base = syntheticEmb(150).toDF("label", "embedding")
    val fits = Seq(1, 7, 32).map { p =>
      val qdf = base.repartition(p)
        .select(col("label") +: Pca.quantCols("embedding", 4): _*)
      Pca.fitFromMoments(Pca.momentAgg(qdf, 4), dim = 4, k = 2)
    }
    val f0 = fits.head
    fits.tail.foreach { f =>
      assert(f.lambdaQ.toSeq == f0.lambdaQ.toSeq)
      assert(f.w.map(_.toSeq).toSeq == f0.w.map(_.toSeq).toSeq)
      assert(f.s.toSeq == f0.s.toSeq && f.n == f0.n)
    }
  }
}
