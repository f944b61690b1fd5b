package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Quantifies a9's sketch estimates against exact answers on testdata —
  * the same "measure the approximation, don't just run it" discipline as
  * the MinHash/SimHash/LSH recall specs. Bounds are the published ones:
  * `approx_count_distinct(rsd = 0.02)` → 3σ ≈ 6 %; DataSketches HLL at the
  * default lgK → well under 5 % at these cardinalities; `percentile_approx
  * (accuracy = 1000)` → rank error ≤ n/1000, checked as a quantile window. */
class SketchAccuracySpec extends SparkSpec {

  private lazy val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")

  test("approx_count_distinct and HLL sketch estimates sit within bounds") {
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("hll_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .collect()(0)
    val exactOrders = r.getLong(0).toDouble
    val exactParts = r.getLong(2).toDouble
    assert(math.abs(r.getLong(1) - exactOrders) / exactOrders < 0.05,
      s"hll ${r.getLong(1)} vs exact $exactOrders")
    assert(math.abs(r.getLong(3) - exactParts) / exactParts < 0.06,
      s"approx ${r.getLong(3)} vs exact $exactParts")
  }

  test("percentile_approx(accuracy=1000) lands inside the rank-error window") {
    val r = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95"),
      percentile(col("l_extendedprice"), lit(0.94)).as("lo"),
      percentile(col("l_extendedprice"), lit(0.96)).as("hi"))
      .collect()(0)
    assert(r.getDouble(0) >= r.getDouble(1) && r.getDouble(0) <= r.getDouble(2),
      s"p95≈${r.getDouble(0)} outside [${r.getDouble(1)}, ${r.getDouble(2)}]")
  }
}
