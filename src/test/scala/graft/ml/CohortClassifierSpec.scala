package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable synthetic cohort: label follows x > 0 with noise dims
  private lazy val data = {
    val rng = new scala.util.Random(11)
    (1 to 300).map { i =>
      val x = rng.nextGaussian() + (if (i % 2 == 0) 2.5 else -2.5)
      val noise = rng.nextGaussian()
      val flag = if (rng.nextBoolean()) 1 else 0
      (if (i % 2 == 0) 1 else 0, x, noise, flag)
    }.toDF("label", "x", "noise", "flag")
  }

  test("trainEvaluate learns a separable signal with high AUC") {
    val res = CohortClassifier.trainEvaluate(data, CohortClassifier.Config(
      labelCol = "label", numericCols = Seq("x", "noise"), binaryCols = Seq("flag")))
    assert(res.auc > 0.9, s"auc=${res.auc}")
    assert(res.accuracy > 0.85, s"acc=${res.accuracy}")
    // the informative feature dominates importances (reference publishes the
    // analogous TBR-dominant result, README.md:785-792)
    val imp = res.featureImportances.toMap
    assert(imp("x") > imp("noise"))
    assert(imp("x") > imp.getOrElse("flag", 0.0))
  }

  test("null labels dropped, numeric nulls imputed") {
    val withNulls = data.withColumn("x",
      when(rand(1) < 0.1, lit(null)).otherwise($"x"))
    val res = CohortClassifier.trainEvaluate(withNulls, CohortClassifier.Config(
      labelCol = "label", numericCols = Seq("x", "noise"), binaryCols = Seq("flag")))
    assert(res.auc > 0.8)
  }

  test("fused single-pass metrics equal the stock evaluators") {
    // train once, score once, then compare the engine's fused AUC/accuracy
    // against BinaryClassificationEvaluator / MulticlassClassificationEvaluator
    // on the identical predictions
    val cfg = CohortClassifier.Config(
      labelCol = "label", numericCols = Seq("x", "noise"), binaryCols = Seq("flag"))
    val prepared = data.select($"label".cast("double").as("label"),
      $"x".cast("double").as("x"), $"noise".cast("double").as("noise"),
      $"flag".cast("double").as("flag"))
    val Array(train, test) = prepared.coalesce(8).cache().randomSplit(Array(0.7, 0.3), 0L)
    val model = CohortClassifier.pipeline(cfg).fit(train)
    val res = CohortClassifier.trainEvaluate(data, cfg) // same seed/split internally
    val pred = model.transform(test)
    val stockAuc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC").evaluate(pred)
    val stockAcc = new org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator()
      .setLabelCol("label").setMetricName("accuracy").evaluate(pred)
    assert(math.abs(res.auc - stockAuc) < 1e-9, s"${res.auc} vs $stockAuc")
    assert(math.abs(res.accuracy - stockAcc) < 1e-9, s"${res.accuracy} vs $stockAcc")
  }

  test("tune searches the reference grid within budget and beats a stump") {
    val res = CohortClassifier.tune(data, CohortClassifier.Config(
      labelCol = "label", numericCols = Seq("x", "noise"), binaryCols = Seq("flag")),
      budget = 6)
    assert(res.auc > 0.85)
    assert(CohortClassifier.MaxDepthChoices.contains(
      res.bestParams("maxDepth").asInstanceOf[Int]))
  }
}
