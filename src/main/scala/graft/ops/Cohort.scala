package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort-comparison operators (SURVEY §2.3 J1/J2, §2.4).
  *
  * Behavior from `HypothesisTestingPrediction.scala:78-122` (tagged union) and
  * `dataSummaries1.scala:478-491,547-558` (condition-less join feeding
  * duplication-invariant aggregates).
  */
object Cohort {

  /** J2 — standardize each cohort to a shared schema, tag with a 0/1 literal,
    * union. The reference uses positional `union` after carefully ordered
    * selects (`HypothesisTestingPrediction.scala:120`); `unionByName` removes
    * the ordering hazard. Narrow op: no shuffle.
    */
  def taggedUnion(
      study: DataFrame, studyCols: Seq[(Column, String)],
      control: DataFrame, controlCols: Seq[(Column, String)],
      tagCol: String = "isStudy"): DataFrame = {
    def std(df: DataFrame, cols: Seq[(Column, String)], tag: Int) =
      df.select(cols.map { case (c, n) => c.as(n) }: _*).withColumn(tagCol, lit(tag))
    std(study, studyCols, 1).unionByName(std(control, controlCols, 0))
  }

  /** J1 rewrite — the reference cross-joins two whole cohorts so one `select`
    * can aggregate columns of both (`dataSummaries1.scala:480,549`), relying on
    * the aggregates being duplication-invariant (median/min/max). The
    * equivalent scale-safe plan: aggregate each side down to ONE row first,
    * then cross-join the 1-row results — identical output, no |A|×|B| blowup.
    *
    * Refuses duplication-VARIANT aggregates (sum/count/avg), for which the
    * literal cross-join and this rewrite both produce garbage vs. intent.
    */
  def crossCohortAgg(
      left: DataFrame, leftAggs: Seq[(AggSpec, String, String)],
      right: DataFrame, rightAggs: Seq[(AggSpec, String, String)]): DataFrame = {
    val variant = Set("sum", "count", "countTrues", "avg")
    val bad = (leftAggs ++ rightAggs).map(_._1.name).filter(variant)
    require(bad.isEmpty,
      s"duplication-variant aggregates over a cross join are ill-defined: ${bad.mkString(",")}")
    def side(df: DataFrame, aggs: Seq[(AggSpec, String, String)]) = {
      val exprs = aggs.map { case (a, c, out) => a.fn(col(c)).cast("double").as(out) }
      df.agg(exprs.head, exprs.tail: _*)
    }
    side(left, leftAggs).crossJoin(side(right, rightAggs))
  }

  /** U2 — n-ary union (`utils.scala:189`, `dataSummaries1.scala:39-43`),
    * optionally tagging each input with a source-name column first. */
  def unionAll(frames: Seq[DataFrame], tagCol: Option[String] = None,
      tags: Seq[String] = Seq.empty): DataFrame = {
    val tagged = tagCol match {
      case Some(tc) => frames.zip(tags).map { case (f, t) => f.withColumn(tc, lit(t)) }
      case None => frames
    }
    tagged.reduce(_ unionByName _)
  }
}
