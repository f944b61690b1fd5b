package graft.medical

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

/** Golden end-to-end (SURVEY §5): every summary table from the fixed-seed
  * fixture cohorts is diffed against a checked-in golden TSV — mirroring the
  * reference's "the delta tables are the output" correctness model.
  *
  * Regenerate after INTENTIONAL semantic changes with:
  *   GRAFT_REGEN_GOLDENS=1 sbt "testOnly graft.medical.GoldenSpec"
  */
class GoldenSpec extends SparkSpec {

  private val goldenDir = "src/test/resources/goldens"

  private lazy val tables: Map[String, DataFrame] = {
    val study = MedicalPipeline.cleanStudy(MedicalFixtures.studyRaw(spark))
    val control = MedicalPipeline.cleanControl(MedicalFixtures.controlRaw(spark))
    val twoPoint = MedicalPipeline.cleanTwoPoint(MedicalFixtures.twoPointRaw(spark))
    MedicalPipeline.summaries(study, control, twoPoint) +
      ("qualityStudy" -> MedicalPipeline.qualityStudy(study)) +
      ("qualityControl" -> MedicalPipeline.qualityControl(control))
  }

  /** Canonical serialization: sorted rows, numbers at fixed precision. */
  private def canonical(df: DataFrame): Seq[String] = {
    def fmt(v: Any): String = v match {
      case null => "NULL"
      case d: Double => if (d.isNaN) "NaN" else f"$d%.6f"
      case f: Float => f"${f.toDouble}%.6f"
      case other => other.toString
    }
    val header = df.columns.mkString("\t")
    val rows = df.collect().map((r: Row) =>
      r.toSeq.map(fmt).mkString("\t")).sorted
    header +: rows.toSeq
  }

  test("all summary + quality tables match their checked-in goldens") {
    val regen = sys.env.contains("GRAFT_REGEN_GOLDENS")
    val dir = new java.io.File(goldenDir)
    if (regen) dir.mkdirs()
    val failures = tables.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      val file = new java.io.File(dir, s"$name.tsv")
      val got = canonical(df)
      if (regen) {
        java.nio.file.Files.write(file.toPath,
          got.mkString("\n").getBytes("UTF-8"))
        None
      } else if (!file.exists()) {
        Some(s"$name: golden missing (run with GRAFT_REGEN_GOLDENS=1)")
      } else {
        val want = new String(java.nio.file.Files.readAllBytes(file.toPath),
          "UTF-8").split("\n").toSeq
        if (got == want) None
        else Some(s"$name: mismatch\n  got:  ${got.diff(want).take(3).mkString(" | ")}" +
          s"\n  want: ${want.diff(got).take(3).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
