package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated inner equi-join (NOT-IN-REFERENCE extension; the 100 TB
  * shuffle-skew tool). A hot join key sends its entire partition to one
  * reducer; salting splits each left key into `saltFactor` sub-keys and
  * replicates the right side once per salt, so a hot key's work spreads over
  * `saltFactor` reducers. Results are identical to the plain join (spec'd).
  *
  * AQE's `skewJoin` rebalances at runtime and should be the FIRST answer;
  * explicit salting remains for deterministic layouts AQE can't split (e.g.
  * a single giant key inside one map output block, or non-sort-merge plans).
  * `saltFactor` multiplies the RIGHT side's shuffle volume — use the
  * smaller/dimension side as `right`, and keep the factor modest (8-32).
  */
object SkewJoin {

  /** Inner equi-join on `keys` with left-side salting. Output columns:
    * left columns then right columns (join keys once, from the left). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // deterministic salt: hash of the whole left row spreads a hot key's
    // rows uniformly without an RNG (reproducible plans, retriable tasks)
    val leftSalted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val rightSalted = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    val rightRenamed = right.columns.filterNot(keys.contains).foldLeft(rightSalted) {
      (df, c) => df.withColumnRenamed(c, s"__r_$c")
    }
    leftSalted.join(rightRenamed, keys :+ "__salt")
      .drop("__salt")
      .select(left.columns.map(col) ++
        right.columns.filterNot(keys.contains).map(c => col(s"__r_$c").as(c)): _*)
  }

  /** Top-N hot keys of a frame by frequency — the monitoring companion:
    * feed its output into a broadcast-isolate strategy (filter hot keys into
    * a broadcast join, sort-merge the long tail) when even salting is too
    * blunt. */
  def hotKeys(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)
}
