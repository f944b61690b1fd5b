package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB path: bucketed co-located joins
  * (no shuffle at join time — the dominant cost for repeated fact⋈fact
  * joins) and salted joins for skewed keys (beyond what AQE skew-split
  * handles, e.g. one mega-key).
  */
object Partitioning {

  /** Persist bucketed + sorted by the join key: repeated joins/aggregations
    * on `key` against an equally-bucketed table plan as zero-Exchange
    * sort-merge joins. Bucket count is a layout contract — both sides must
    * match. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * deterministic salt in [0, salts); the small side is replicated `salts`
    * times so every (key, salt) partition finds its match. Replication
    * multiplies the small side's shuffle volume by `salts` — use only when a
    * handful of keys dominate (or AQE's skew handling is unavailable, e.g.
    * under a non-AQE shuffle). Salt is derived from stable row content, not
    * rand(), so replays/retries stay deterministic. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int, saltSource: Column): DataFrame = {
    val saltedBig = skewed.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val replicated = other
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
