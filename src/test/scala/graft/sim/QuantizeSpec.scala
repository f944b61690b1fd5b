package graft.sim

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 profile: hand-computed codes, bounds, and error census") {
    // dim 0: values 0..4 → vmin 0, vmax 4; code = floor(v*255/4 + .5)
    // dim 1: constant → code 0, err 0
    val df = Seq(
      (Seq(0.0f, 7.0f)), (Seq(1.0f, 7.0f)), (Seq(2.0f, 7.0f)),
      (Seq(3.0f, 7.0f)), (Seq(4.0f, 7.0f))).toDF("emb")
    val r = Quantize.int8ProfileDF(df, "emb").collect()
    assert(r.length == 2)
    val d0 = r(0); val d1 = r(1)
    assert(d0.getLong(0) == 0L && d0.getLong(1) == 5L)
    assert(d0.getDouble(2) == 0.0 && d0.getDouble(3) == 4.0)
    val codes = Seq(0.0, 1.0, 2.0, 3.0, 4.0)
      .map(v => math.floor(v * 255.0 / 4.0 + 0.5).toLong)
    assert(d0.getLong(4) == codes.sum)
    assert(d0.getLong(5) == 0L && d0.getLong(6) == 255L)
    val maxErr = Seq(0.0, 1.0, 2.0, 3.0, 4.0).map { v =>
      val c = math.floor(v * 255.0 / 4.0 + 0.5)
      math.abs(v - (0.0 + c * 4.0 / 255.0))
    }.max
    assert(math.abs(d0.getDouble(7) - maxErr) < 1e-6)
    assert(d1.getLong(0) == 1L && d1.getLong(4) == 0L &&
      d1.getLong(6) == 0L && d1.getDouble(7) == 0.0)
  }

  test("int8 profile: codes stay in [0,255] and reconstruction error is bounded") {
    val rng = new scala.util.Random(47)
    val df = Seq.fill(300)(Seq.fill(8)(rng.nextFloat() * 10 - 5)).toDF("emb")
      .repartition(5)
    val r = Quantize.int8ProfileDF(df, "emb").collect()
    assert(r.length == 8)
    r.foreach { row =>
      assert(row.getLong(1) == 300L)
      assert(row.getLong(5) >= 0L && row.getLong(6) <= 255L)
      // nearest-code error ≤ half a quantization step
      val step = (row.getDouble(3) - row.getDouble(2)) / 255.0
      assert(row.getDouble(7) <= step / 2 + 1e-9)
    }
  }
}
