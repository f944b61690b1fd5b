package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear-model counterpart of [[TreeScorer]] — fit a logistic regression
  * in-engine, export (intercept, coefficients) as plain doubles, and score
  * WITHOUT the ML runtime as an explicit left-associated arithmetic chain,
  * replayable bit-for-bit in SQL (the m4/m5 outcome-oracle doctrine: the
  * fit TRAJECTORY is engine-specific, the fitted artifact's inference is
  * hash-verified cross-engine).
  *
  * The margin `((intercept + c1·x1) + c2·x2) + …` is built in the same
  * association order on both sides — Spark's Column `+` fold and SQL's
  * left-associative `+` produce the identical IEEE double — and
  * `Double.toString` literals round-trip exactly, so `margin > 0`
  * classifications match down to the last ulp. */
object LinearScorer {

  /** Exported model: feature names paired with their coefficients, in
    * scoring order. */
  final case class LinearSpec(intercept: Double, coefs: Seq[(String, Double)])

  /** Fit binomial logistic regression on raw feature columns (no scaler —
    * spark.ml standardizes internally and returns original-scale
    * coefficients). */
  def fitLogistic(train: DataFrame, features: Seq[String], labelCol: String,
      maxIter: Int = 100, reg: Double = 0.0): LinearSpec = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
    val prepared = assembler.transform(
        train.select((labelCol +: features).map(col): _*).na.drop())
      .select(col(labelCol).cast("double").as("label"), col("features"))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(reg).setStandardization(true)
      .fit(prepared)
    LinearSpec(model.intercept, features.zip(model.coefficients.toArray))
  }

  /** The decision margin as a Column — explicit left-assoc chain. */
  def margin(spec: LinearSpec): Column =
    spec.coefs.foldLeft(lit(spec.intercept)) { case (acc, (f, c)) =>
      acc + lit(c) * col(f)
    }

  /** The identical margin as SQL text for the DuckDB replay. */
  def marginSql(spec: LinearSpec): String =
    spec.coefs.foldLeft(spec.intercept.toString) { case (acc, (f, c)) =>
      s"($acc + ${c.toString} * $f)"
    }
}
