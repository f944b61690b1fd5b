package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on the bucketed key") {
    val a = (1 to 1000).map(i => (i.toLong % 50, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong % 50, s"b$i")).toDF("k", "vb")
    Partitioning.writeBucketed(a, "bucketed_a", "k", 8)
    Partitioning.writeBucketed(b, "bucketed_b", "k", 8)
    val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == 1000L * 1000 / 50) // 20k matches
  }

  test("keySkewReportDF: hand-computed Gini/top-k/p99; uniform keys score ~0") {
    // 4 keys with counts 1, 1, 3, 5 → n_rows 10, n_keys 4
    // sorted counts (1,1,3,5): Σ i·x = 1 + 2 + 9 + 20 = 32
    // gini = 2·32/(4·10) − 5/4 = 1.6 − 1.25 = 0.35
    val df = (Seq.fill(1)(1L) ++ Seq.fill(1)(2L) ++ Seq.fill(3)(3L) ++
      Seq.fill(5)(4L)).toDF("k").repartition(3)
    val r = Partitioning.keySkewReportDF(df, "k").head()
    assert(r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("max_count") == 5L)
    assert(r.getAs[Long]("p99_count") == 5L) // k99 = ceil(4·.99) = 4 → 4th count
    assert(r.getAs[Long]("top10_count") == 10L) // ≤10 keys → all mass
    assert(r.getAs[Double]("top10_share") == 1.0)
    assert(math.abs(r.getAs[Double]("gini") - 0.35) < 1e-9)
    // perfectly uniform: gini exactly (2·Σi·c)/(n·nc) − (n+1)/n = 0
    val uni = (1L to 64L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val u = Partitioning.keySkewReportDF(uni, "k").head()
    assert(math.abs(u.getAs[Double]("gini")) < 1e-9)
    assert(u.getAs[Long]("p99_count") == 3L)
    assert(u.getAs[Long]("top10_count") == 30L)
    // layout-proof
    val a = Partitioning.keySkewReportDF(df.repartition(1), "k").head()
    assert(a.toSeq == r.toSeq)
  }

  test("saltedJoin produces exactly the plain-join result") {
    // skewed: one key holds most rows
    val skewed = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong + 1, "cold"))).toDF("k", "side")
    val dim = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Partitioning.saltedJoin(skewed, dim, "k", salts = 4,
      saltSource = col("side"))
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
