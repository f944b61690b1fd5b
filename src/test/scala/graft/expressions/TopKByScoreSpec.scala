package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val scored = {
    val rng = new scala.util.Random(9)
    (1 to 5000).map { i =>
      (s"g${i % 7}", rng.nextDouble() * 100, i.toLong)
    }.toDF("key", "score", "id").repartition(8)
  }

  test("topKByScore equals the window row_number formulation") {
    val viaAgg = scored.groupBy($"key")
      .agg(TopKByScore.topKByScore($"score", $"id", 5).as("top"))
      .select($"key", explode($"top").as("r"))
      .select($"key", $"r.id".as("id"), $"r.score".as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaWindow = scored.withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy($"score".desc, $"id".asc)))
      .where($"rn" <= 5)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("result is score-descending with ascending-id tiebreak, bounded by k") {
    val ties = Seq(("g", 1.0, 3L), ("g", 1.0, 1L), ("g", 1.0, 2L), ("g", 0.5, 9L))
      .toDF("key", "score", "id")
    val top = ties.groupBy($"key")
      .agg(TopKByScore.topKByScore($"score", $"id", 3).as("top"))
      .select(explode($"top").as("r")).select($"r.id").as[Long].collect()
    assert(top.toSeq == Seq(1L, 2L, 3L))
  }

  test("nulls are skipped, groups smaller than k return all rows") {
    val df = Seq(("g", Some(2.0), 1L), ("g", None, 2L)).toDF("key", "score", "id")
    val top = df.groupBy($"key")
      .agg(TopKByScore.topKByScore($"score", $"id", 10).as("top"))
      .select(size($"top")).as[Int].head()
    assert(top == 1)
  }

  test("partial aggregation is planned (ObjectHashAggregate partial+final)") {
    val plan = scored.groupBy($"key")
      .agg(TopKByScore.topKByScore($"score", $"id", 5).as("top"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("bruteForceTopKAgg matches bruteForceTopK") {
    import graft.sim.Embeddings
    val rng = new scala.util.Random(4)
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(8)(rng.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val qs = vecs.where($"vec_id" < 3)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"corpus_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue())).toSet
    val a = norm(Embeddings.bruteForceTopK(vecs, "vec_id", "embedding", qs, "vec_id", "embedding", 4))
    val b = norm(Embeddings.bruteForceTopKAgg(vecs, "vec_id", "embedding", qs, "vec_id", "embedding", 4))
    assert(a == b)
  }
}
