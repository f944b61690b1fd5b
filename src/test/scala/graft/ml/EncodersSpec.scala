package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodersSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncode: hand-computed shrinkage toward the prior") {
    // global: N=10, Y=4 → prior 0.4; smoothing m=10
    // cat a: n=5, y=4 → enc = (4·10 + 10·4)/(10·(5+10)) = 80/150 = 0.533333
    // cat b: n=5, y=0 → enc = (0 + 40)/(10·15) = 0.266667
    val rows = Seq.fill(4)(("a", 1)) ++ Seq.fill(1)(("a", 0)) ++
      Seq.fill(5)(("b", 0))
    val r = Encoders.targetEncode(rows.toDF("c", "y"), "c", col("y") === 1)
      .as[(String, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("a", 5L, 4L, 0.533333), ("b", 5L, 0L, 0.266667)))
  }

  test("targetEncode: smoothing=0 is the raw mean; rare cats shrink harder") {
    val rows = Seq.fill(100)(("big", 1)) ++ Seq.fill(100)(("big", 0)) ++
      Seq(("rare", 1))
    val raw = Encoders.targetEncode(rows.toDF("c", "y"), "c",
      col("y") === 1, smoothing = 0L).as[(String, Long, Long, Double)]
      .collect().map(t => t._1 -> t._4).toMap
    assert(raw("big") == 0.5 && raw("rare") == 1.0)
    val sm = Encoders.targetEncode(rows.toDF("c", "y"), "c",
      col("y") === 1, smoothing = 20L).as[(String, Long, Long, Double)]
      .collect().map(t => t._1 -> t._4).toMap
    // prior = 101/201 ≈ 0.5025; rare pulls nearly to prior, big barely moves
    assert(math.abs(sm("rare") - 101.0 / 201.0) < 0.03)
    assert(math.abs(sm("big") - 0.5) < 0.01)
    assert(sm("rare") < raw("rare") && sm("big") > raw("big"))
  }

  test("woeIvDF: hand case — two categories, smoothed WoE and IV chain") {
    // cat a: 8 good / 2 bad; cat b: 2 good / 8 bad → G = B = 10
    val rows = Seq.fill(8)(("a", 0)) ++ Seq.fill(2)(("a", 1)) ++
      Seq.fill(2)(("b", 0)) ++ Seq.fill(8)(("b", 1))
    val r = Encoders.woeIvDF(rows.toDF("c", "y").repartition(3), "c",
      col("y") === 1).collect()
    assert(r.length == 2)
    val wa = math.log((8.5 / 10.0) / (2.5 / 10.0))
    val wb = math.log((2.5 / 10.0) / (8.5 / 10.0))
    val ca = (8.5 / 10.0 - 2.5 / 10.0) * wa
    val cb = (2.5 / 10.0 - 8.5 / 10.0) * wb
    assert(r(0).getString(0) == "a" && r(0).getLong(1) == 10L &&
      r(0).getLong(2) == 8L && r(0).getLong(3) == 2L)
    assert(math.abs(r(0).getDouble(4) - wa) < 1e-6)
    assert(math.abs(r(1).getDouble(4) - wb) < 1e-6)
    assert(math.abs(r(0).getDouble(5) - ca) < 1e-6)
    // symmetric cats contribute equally; last row's iv_run is the total IV
    assert(math.abs(r(1).getDouble(6) - (ca + cb)) < 1e-6)
    assert(r(1).getDouble(6) > 0.3, "a flip this strong is a 'strong' feature")
  }

  test("targetEncode: NULL categories and NULL labels drop") {
    val rows = Seq((Some("a"), Some(1)), (None, Some(1)), (Some("a"), None))
    val r = Encoders.targetEncode(rows.toDF("c", "y"), "c", col("y") === 1)
      .as[(String, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("a", 1L, 1L, 1.0)))
  }
}
