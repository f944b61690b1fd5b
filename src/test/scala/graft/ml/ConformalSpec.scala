package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  // y = 3x + noise: the guarantee is about COVERAGE, not the model
  private def synth(n: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      val x = (rng.nextInt(5000) + 1) / 100.0
      (i.toLong, x, 3.0 * x + rng.nextGaussian() * 7.0 + 2.0)
    }.toDF("id", "x", "y")
  }

  test("split conformal: held-out coverage meets the 1-alpha guarantee") {
    val df = synth(40000, seed = 3).repartition(8)
    val r = Conformal.splitConformalDF(df, col("id").cast("string"),
      col("x"), col("y")).head()
    val nTest = r.getAs[Long]("n_test").toDouble
    assert(nTest > 5000)
    // finite-sample guarantee: coverage ≥ 1−α − O(1/√n) slack
    assert(r.getAs[Double]("coverage05") >= 0.94,
      s"cov05=${r.getAs[Double]("coverage05")}")
    assert(r.getAs[Double]("coverage10") >= 0.89)
    assert(r.getAs[Double]("coverage20") >= 0.78)
    // intervals must not be degenerate-wide: coverage shouldn't be 1.0
    // at alpha=0.2 on noisy data (the quantile actually cuts the tail)
    assert(r.getAs[Double]("coverage20") < 0.9)
    // rank arithmetic: k = ceil((n_cal+1)(1-alpha))
    val nCal = r.getAs[Long]("n_cal")
    assert(r.getAs[Long]("k05") == math.ceil((nCal + 1) * 0.95).toLong)
    assert(r.getAs[Long]("k10") == math.ceil((nCal + 1) * 0.90).toLong)
    assert(r.getAs[Long]("k20") == math.ceil((nCal + 1) * 0.80).toLong)
    // widths are nested: tighter alpha → wider interval
    assert(r.getAs[Long]("q05_cents") >= r.getAs[Long]("q10_cents"))
    assert(r.getAs[Long]("q10_cents") >= r.getAs[Long]("q20_cents"))
  }

  test("Mondrian conformal: per-group coverage holds even with unequal noise") {
    // group B is 5x noisier — a marginal quantile would under-cover it
    val rng = new scala.util.Random(21)
    val df = Seq.tabulate(40000) { i =>
      val g = if (i % 2 == 0) "A" else "B"
      val x = (rng.nextInt(5000) + 1) / 100.0
      val sd = if (g == "A") 2.0 else 10.0
      (i.toLong, g, x, 3.0 * x + rng.nextGaussian() * sd)
    }.toDF("id", "g", "x", "y").repartition(8)
    val r = Conformal.mondrianConformalDF(df, col("id").cast("string"),
      col("g"), col("x"), col("y")).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Double]("coverage10") >= 0.88,
        s"${row.getString(0)}: ${row.getAs[Double]("coverage10")}")
      // group-conditional: the noisy group's interval must be wider
    }
    val byG = r.map(row => row.getString(0) -> row.getAs[Long]("q10_cents")).toMap
    assert(byG("B") > byG("A") * 2,
      s"noisy group must get the wider interval: $byG")
    // no global window in the plan (the scale property)
    val plan = Conformal.mondrianConformalDF(df, col("id").cast("string"),
      col("g"), col("x"), col("y")).queryExecution.sparkPlan
    val globals = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty)
  }

  test("split conformal: q is the exact k-th smallest calibration residual; layout-proof") {
    val df = synth(6000, seed = 9)
    val a = Conformal.splitConformalDF(df.repartition(1),
      col("id").cast("string"), col("x"), col("y")).head()
    val b = Conformal.splitConformalDF(df.repartition(13),
      col("id").cast("string"), col("x"), col("y")).head()
    assert(a.toSeq == b.toSeq)
    // independent driver replay of the whole chain
    val rows = df.select(col("id").cast("string"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def hex1(s: String): Char = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString.charAt(0)
    }
    def cents(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tagged = rows.map { case (k, x, y) => (hex1(k), cents(x), cents(y)) }
    val train = tagged.filter(_._1 <= '9')
    val sx = train.map(t => BigDecimal(t._2)).sum.toDouble
    val sy = train.map(t => BigDecimal(t._3)).sum.toDouble
    val sxx = train.map(t => BigDecimal(t._2) * BigDecimal(t._2)).sum.toDouble
    val sxy = train.map(t => BigDecimal(t._2) * BigDecimal(t._3)).sum.toDouble
    val nd = train.size.toDouble
    val slope = BigDecimal(
      (nd * sxy - sx * sy) / (nd * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val icept = BigDecimal(
      sy / nd - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * (sx / nd))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(a.getAs[Double]("slope") - slope) < 2e-6)
    val calRes = tagged.filter(t => t._1 >= 'a' && t._1 <= 'c')
      .map(t => math.floor(math.abs(t._3 - (slope * t._2 + icept)) * 100.0).toLong)
      .sorted
    val k10 = math.ceil((calRes.length + 1) * 0.9).toInt
    assert(a.getAs[Long]("n_cal") == calRes.length)
    assert(a.getAs[Long]("q10_cents") == calRes(k10 - 1))
  }
}
