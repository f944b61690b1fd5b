package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CupedSpec extends SparkSpec {
  import spark.implicits._

  test("cupedDF: matches a driver replay of the closed form; layout-proof") {
    // y ≈ 2x + arm effect: the covariate soaks up most variance
    val units = Seq(
      (0, 1.0, 3.0), (0, 2.0, 5.0), (0, 3.0, 7.0),
      (1, 2.0, 6.0), (1, 3.0, 8.0), (1, 4.0, 10.0))
    val df = units.toDF("arm", "x", "y").repartition(3)
    val r = Cuped.cupedDF(df, col("arm"), col("x"), col("y"))
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    // driver replay
    val n = units.size.toDouble
    val sx = units.map(_._2).sum; val sy = units.map(_._3).sum
    val sxx = units.map(u => u._2 * u._2).sum
    val sxy = units.map(u => u._2 * u._3).sum
    val syy = units.map(u => u._3 * u._3).sum
    val cxy = n * sxy - sx * sy; val cxx = n * sxx - sx * sx
    val cyy = n * syy - sy * sy
    val theta = cxy / cxx
    val rho2 = cxy * cxy / (cxx * cyy)
    val byArm = units.groupBy(_._1).view.mapValues { us =>
      val na = us.size.toDouble
      val my = us.map(_._3).sum / na
      val mx = us.map(_._2).sum / na
      (us.size.toLong, my, my - theta * (mx - sx / n))
    }.toMap
    assert(r.map(_._1).toSeq == Seq(0, 1))
    r.foreach { case (arm, cnt, my, adj, th, r2) =>
      val (en, emy, eadj) = byArm(arm)
      assert(cnt == en)
      assert(math.abs(my - emy) < 1e-6)
      assert(math.abs(adj - eadj) < 1e-6)
      assert(math.abs(th - theta) < 1e-6)
      assert(math.abs(r2 - rho2) < 1e-6)
    }
    // adjusted means preserve the overall outcome mean's weighted sum
    val pooledRaw = r.map(v => v._2 * v._3).sum
    val pooledAdj = r.map(v => v._2 * v._4).sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-4)
    // bit-identical on another layout (exact sums → same fixed trees)
    val r1 = Cuped.cupedDF(df.repartition(1), col("arm"), col("x"), col("y"))
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    assert(r1.toSeq == r.toSeq)
  }

  test("cupedDF: NULL arm/x/y rows drop") {
    val df = Seq(
      (Some(0), Some(1.0), Some(2.0)), (Some(1), Some(2.0), Some(4.0)),
      (Some(0), Some(3.0), Some(5.0)), (Some(1), Some(4.0), Some(9.0)),
      (None, Some(1.0), Some(1.0)), (Some(0), None, Some(1.0)),
      (Some(1), Some(1.0), None))
      .toDF("arm", "x", "y")
    val r = Cuped.cupedDF(df, col("arm"), col("x"), col("y"))
      .select(sum("n")).as[Long].head()
    assert(r == 4L)
  }
}
