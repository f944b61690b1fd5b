package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches the HOF formulation (codegen + interpreted)") {
    val df = (1 to 100).map(i =>
      (Seq.tabulate(8)(j => (i + j).toDouble), Seq.tabulate(8)(j => (i * j).toDouble)))
      .toDF("a", "b")
    val native = df.select(VectorExpressions.dotProduct($"a", $"b")).as[Double].collect()
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      .as[Double].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("DotProduct null propagation and empty arrays") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("a", "b")
    val got = df.select(VectorExpressions.dotProduct($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, Some(0.0)))
  }

  test("DotProduct rejects non-double-array inputs at analysis") {
    val df = Seq(("x", 1)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.dotProduct($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("graft_dot_product") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("LshBuckets matches the per-table lshBucket Column formulation") {
    val rng = new scala.util.Random(7)
    val dim = 16
    val df = (1 to 50).map(_ => Seq.fill(dim)(rng.nextGaussian())).toDF("v")
    val native = df.select(
        VectorExpressions.lshBucketsAll($"v", nBits = 10, dim = dim,
          tables = 3, seed = 42L).as("b"))
      .as[Seq[Long]].collect()
    val columnForm = df.select(array((0 until 3).map(t =>
        graft.sim.Embeddings.lshBucket($"v", nBits = 10, dim = dim,
          seed = 42L + t)): _*).as("b"))
      .as[Seq[Long]].collect()
    assert(native.toSeq == columnForm.toSeq)
  }

  test("LshBuckets throws on a dim mismatch and propagates null") {
    val df = Seq(Some(Seq(1.0, 2.0)), None).toDF("v")
    val e = intercept[Exception] {
      df.select(VectorExpressions.lshBucketsAll($"v", 4, 3, 1)).collect()
    }
    assert(e.getMessage.contains("expected vector dim 3") ||
      e.getCause != null && e.getCause.getMessage.contains("expected vector dim 3"))
    val ok = Seq(Some(Seq(1.0, 2.0)), None).toDF("v")
      .select(VectorExpressions.lshBucketsAll($"v", 4, 2, 1).as("b")).collect()
    assert(!ok(0).isNullAt(0) && ok(1).isNullAt(0))
  }

  test("whole-stage codegen is active for DotProduct plans") {
    // spark.range source so ConvertToLocalRelation can't pre-fold the plan
    val df = spark.range(10)
      .select(array($"id".cast("double")).as("a"),
        array(($"id" * 2).cast("double")).as("b"))
    val q = df.select(VectorExpressions.dotProduct($"a", $"b").as("d"))
    // "*(n)" marks a WholeStageCodegen span in the executed-plan string —
    // a CodegenFallback expression would print an unstarred Project
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(q.as[Double].collect().toSeq == (0 until 10).map(i => 2.0 * i * i))
  }
}
