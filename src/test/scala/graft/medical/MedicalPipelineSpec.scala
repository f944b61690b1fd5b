package graft.medical

import graft.SparkSpec
import graft.pipeline.Runner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden end-to-end: the full reference pipeline over the fixture cohorts
  * (SURVEY §5 "golden end-to-end" + §7.2 minimum slice). */
class MedicalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val study = MedicalPipeline.cleanStudy(MedicalFixtures.studyRaw(spark))
  private lazy val control = MedicalPipeline.cleanControl(MedicalFixtures.controlRaw(spark))
  private lazy val twoPoint = MedicalPipeline.cleanTwoPoint(MedicalFixtures.twoPointRaw(spark))

  test("cleaning: types repaired, not-null filters applied") {
    assert(study.count() == 29) // one null-Płeć row dropped
    assert(study.schema("SUV (max) w miejscu zapalenia").dataType == DoubleType)
    assert(study.schema("Data badania").dataType == DateType)
    assert(study.schema("cukrzyca").dataType == BooleanType)
    assert(study.schema("Gorączka").dataType == BooleanType)
    assert(control.count() == 24)
    assert(control.schema("cukrzyca").dataType == BooleanType)
    assert(twoPoint.count() == 11)
    assert(twoPoint.schema("SUV (max) w miejscu zapalenia44").dataType == DoubleType)
  }

  test("quality reports catch the planted violations") {
    val rep = MedicalPipeline.qualityStudy(study)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep(("outside range", "SUV (max) w miejscu zapalenia")) >= 1) // the 85.0
    assert(rep(("outside range", "tumor to background ratio")) >= 1)     // the 1.4
    assert(rep(("null values", "Płeć")) == 0) // filtered at clean
    val crep = MedicalPipeline.qualityControl(control)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(crep(("z-score outliers", "SUV protezy")) >= 1) // the 40.0
    assert(MedicalPipeline.qualityTwoPoint(twoPoint).count() > 0)
  }

  test("all 18 summary tables build with the Division/Category/agg shape") {
    val sums = MedicalPipeline.summaries(study, control, twoPoint)
    assert(sums.size == 18)
    val shaped = sums.filterNot(s =>
      Set("SuvStudyVsCrontrol", "TechnicalDataInStudyAndControlGroup")(s._1))
    shaped.foreach { case (name, df) =>
      assert(df.columns.take(3).toSeq ==
        Seq("Division", "DivisionCategory", "aggregation"), s"shape of $name")
      assert(df.where($"Division" === "All").count() > 0, s"All row in $name")
      assert(df.count() > 0, name)
    }
    // cross-cohort tables are 1-row wide frames
    assert(sums("SuvStudyVsCrontrol").count() == 1)
    assert(sums("TechnicalDataInStudyAndControlGroup").count() == 1)
    // spot-check a value: global sum of 'krew +' equals direct aggregation
    val micro = sums("MicrobiologicDataStudyGroup")
      .where($"Division" === "All" && $"aggregation" === "sum")
      .select($"`krew +`").as[Double].head()
    val direct = study.agg(sum($"`krew +`")).as[Long].head().toDouble
    assert(micro == direct)
  }

  test("cohort prep: imagingFrame and numbsFrame schemas match the reference") {
    val imaging = MedicalPipeline.imagingFrame(study)
    assert(imaging.columns.toSeq == Seq("IrregularBorders", "FocalAccumulation",
      "GasBubbles", "Thrombus", "Fluid", "FluidFatAttenuation",
      "InflammatoryMass", "puruletFistula", "activeLymphNodes",
      "pseudoAneurysm", "SuvInFocus", "TBR"))
    val numbs = MedicalPipeline.cohortNumbsFrame(study, control)
    assert(numbs.columns.toSet == Set("SuvInFocus", "TBR",
      "simplifiedClassification", "prosthesisType", "ageInYearsWhenSurgery",
      "gender", "isStudy", "isMale"))
    assert(numbs.where($"isStudy" === 1).count() == 29)
    assert(numbs.where($"isStudy" === 0).count() == 24)
    // study classification normalized to Y/B
    assert(numbs.select("simplifiedClassification").distinct()
      .as[String].collect().toSet.subsetOf(Set("Y", "B")))
  }

  test("stats stage: p-values in range, thresholds finite, SABHA selective") {
    val imaging = MedicalPipeline.imagingFrame(study)
    val numbs = MedicalPipeline.cohortNumbsFrame(study, control)
    val res = MedicalPipeline.statsStage(imaging, numbs, nPerm = 199, seed = 7)
    assert(res.imagingPValues.nonEmpty)
    res.imagingPValues.foreach { case (_, pSuv, pTbr) =>
      assert((pSuv >= 0 && pSuv <= 1) || pSuv == 2.0)
      assert((pTbr >= 0 && pTbr <= 1) || pTbr == 2.0)
    }
    assert(res.ageTestP >= 0 && res.ageTestP <= 1)
    assert(res.prosthesisTypeP > 0 && res.prosthesisTypeP <= 1)
    assert(res.locationP > 0 && res.locationP <= 1)
    assert(!res.thresholdSuv.isNaN && !res.thresholdTbr.isNaN)
  }

  test("ml stage trains and reports importances for the 6 features") {
    val numbs = MedicalPipeline.cohortNumbsFrame(study, control)
    val res = MedicalPipeline.mlStage(numbs)
    assert(res.featureImportances.map(_._1).toSet == Set("SuvInFocus", "TBR",
      "ageInYearsWhenSurgery", "isStentgraft", "isY", "isMale"))
    assert(res.accuracy > 0 && res.auc >= 0)
  }

  test("full DAG through Runner with catalog persistence between stages") {
    import graft.sources.Catalog
    val wh = java.nio.file.Files.createTempDirectory("graft-med").toString
    val cat = new Catalog(spark, "medMeta")
    var summaryCount = 0L
    val results = Runner.run(spark, Seq(
      Runner.Stage("cleanStudy")(s =>
        MedicalPipeline.cleanStudy(MedicalFixtures.studyRaw(s))
          .write.mode("overwrite").parquet(s"$wh/study")),
      Runner.Stage("cleanControl")(s =>
        MedicalPipeline.cleanControl(MedicalFixtures.controlRaw(s))
          .write.mode("overwrite").parquet(s"$wh/control")),
      Runner.Stage("qualityStudy", dependsOn = Seq("cleanStudy"))(s =>
        MedicalPipeline.qualityStudy(s.read.parquet(s"$wh/study"))
          .write.mode("overwrite").parquet(s"$wh/qualityStudy")),
      Runner.Stage("summaries", dependsOn = Seq("cleanStudy", "cleanControl"))(s => {
        val sums = MedicalPipeline.summaries(
          s.read.parquet(s"$wh/study"), s.read.parquet(s"$wh/control"),
          MedicalPipeline.cleanTwoPoint(MedicalFixtures.twoPointRaw(s)))
        cat.createTableWithMeta("SuvVsVisualScales",
          "sum+median of SUVs by visual scales", sums("SuvVsVisualScales"))
        summaryCount = sums("SuvVsVisualScales").count()
      })))
    assert(results.forall(_.ok), results.filterNot(_.ok).map(_.error).mkString)
    assert(summaryCount > 0)
    assert(cat.table("SuvVsVisualScales").count() == summaryCount)
    assert(cat.metadata.where($"tableName" === "SuvVsVisualScales").count() == 1)
  }

  test("division tables round-trip through the catalog and drive projections") {
    val divisions = MedicalPipeline.studyDivisions(spark)
    assert(divisions.columns.toSeq == Seq("divisionName", "listOfColumnNames"))
    val labs = MedicalPipeline.frameForDivision(study, divisions, "labInflammation")
    assert(labs.columns.toSeq == Seq("CRP(6 mcy)", "WBC(6 mcy)"))
    intercept[NoSuchElementException] {
      MedicalPipeline.columnsOfDivision(divisions, "missing")
    }
  }

  test("runner isolates failures: dependents skip, independents continue") {
    val results = Runner.run(spark, Seq(
      Runner.Stage("boom")(_ => throw new RuntimeException("x")),
      Runner.Stage("child", dependsOn = Seq("boom"))(_ => ()),
      Runner.Stage("independent")(_ => ())))
    assert(!results.find(_.name == "boom").get.ok)
    assert(!results.find(_.name == "child").get.ok)
    assert(results.find(_.name == "independent").get.ok)
  }
}
