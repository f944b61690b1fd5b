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
