package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.expressions.MisraGriesSketch.mgSketch

/** EXACT top-k hot keys without a full-cardinality shuffle — the two-pass
  * heavy-hitter protocol over the [[graft.expressions.MisraGriesSketch]]
  * aggregate.
  *
  * [[graft.ops.Partitioning.hotKeys]] (exact groupBy count) shuffles one
  * row per DISTINCT key; on a 100 TB fact with billions of distinct keys
  * that shuffle dominates the job even though only the handful of heavy
  * keys matter. Here pass 1 aggregates a bounded Misra–Gries sketch
  * (`counters` entries per partition state, only sketches cross the
  * network) whose guarantee is: every key with true frequency >
  * n/(counters+1) survives into the final sketch. Pass 2 then counts
  * EXACTLY just the ≤ `counters` surviving candidates — a row-local
  * `isin` filter, so the second shuffle carries at most `counters`
  * distinct keys.
  *
  * The result is certified: `provablyExact` holds iff the k-th candidate
  * count strictly clears n/counters (a key the sketch dropped can have
  * true count at most n/(counters+1) < n/counters), in which case the
  * returned top-k IS the true top-k with exact counts. On near-uniform
  * data the certificate honestly fails — heavy-hitter queries are only
  * cheap when heavy hitters exist.
  */
object HeavyHitters {
  /** Top-k report: `rows` = (key, n_rows), count-desc / key-asc;
    * `provablyExact` = the certificate above. Driver state is bounded by
    * `counters` (sketch entries + candidate counts) — the bounded-collect
    * protocol, same doctrine as Vocab.buildVocab's top-N. */
  final case class TopK(rows: DataFrame, totalRows: Long,
      candidates: Int, provablyExact: Boolean)

  def topKExact(df: DataFrame, keyCol: String, k: Int,
      counters: Int = 256): TopK = {
    require(k > 0 && counters >= k,
      s"need counters >= k, got counters=$counters k=$k")
    val spark = df.sparkSession
    // pass 1: sketch + total row count in ONE scan
    val first = df.agg(mgSketch(col(keyCol), counters).as("__sketch"),
      count(lit(1)).as("__n")).head()
    val n = first.getLong(1)
    val cand = first.getSeq[Row](0).map(_.getString(0))
    if (cand.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_rows",
            org.apache.spark.sql.types.LongType, nullable = false))))
      return TopK(empty, n, 0, provablyExact = n == 0)
    }
    // pass 2: exact counts of the candidates only (row-local filter, the
    // shuffle carries <= counters distinct keys)
    val exact = df.where(col(keyCol).isin(cand: _*))
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(k)
      .collect()
    // certificate in exact integer arithmetic: kth * counters > n means
    // kth > n/counters >= n/(counters+1) >= any dropped key's count.
    // Fewer candidates than k can still be exact — then the candidate
    // set itself must be complete, which only the trivial n==0 case
    // certifies without outside knowledge.
    val exactTopK = exact.length >= k &&
      exact.last.getLong(1) * counters > n
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(exact.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = false))))
    TopK(rows, n, cand.size, exactTopK)
  }
}
