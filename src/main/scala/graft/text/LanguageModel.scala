package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring (NOT-IN-REFERENCE extension):
  * the classic "train a cheap LM on the corpus, flag low-likelihood docs"
  * quality signal (the KenLM-perplexity filter of CCNet/RefinedWeb, here as
  * an add-k-smoothed bigram model so every number is a deterministic
  * function of exact counts — fully SQL-replayable, no binary model file).
  *
  * Scale shape (three key-partitioned shuffles, nothing global):
  *   1. bigram counts: explode → groupBy(bigram) with map-side combine; the
  *      result is vocabulary-sized, orders of magnitude below corpus size;
  *   2. context (first-token) counts: same, smaller;
  *   3. scoring: the per-doc bigram stream joins both count tables on their
  *      natural keys and one groupBy(doc) sums log-probabilities map-side.
  *      The count-table joins carry NO broadcast hint on purpose: a small
  *      vocabulary broadcasts automatically (AQE sees the post-agg size),
  *      but a web-scale corpus has billions of distinct bigrams — forcing
  *      the hint there would OOM the driver, while the unhinted plan
  *      degrades gracefully to a hash join on the key the stream already
  *      shuffles on. Only the 1-row vocab count is hint-broadcast.
  */
object LanguageModel {

  /** Score every document by the mean log-probability of its token bigrams
    * under the corpus's own add-k bigram model (self-perplexity):
    * P(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·V), V = distinct-bigram count.
    *
    * Returns `(id, n_bigrams, avg_logprob, ppl)`; docs with <2 tokens have
    * no bigrams and are dropped (they carry no model evidence).
    */
  def scoreBigram(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val toks = TextOps.tokens(lower(col(textCol)))
    // docBigrams feeds three consumers on different keys, but pinning it
    // was MEASURED SLOWER (r13 A/B: 1.39 -> 1.69 s at sf0.1): the
    // exploded bigram-string frame is bigger than the source text, so
    // materializing it costs more than re-running tokenize per consumer.
    val docBigrams = df.select(col(idCol).as("__id"),
        explode(zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
    val bigramCounts = docBigrams.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_bigram"))
    val contextCounts = docBigrams
      .groupBy(split(col("bigram"), " ").getItem(0).as("w1"))
      .agg(count(lit(1)).as("c_context"))
    val vocab = bigramCounts.agg(count(lit(1)).as("v"))
    docBigrams
      .join(bigramCounts, Seq("bigram"))
      .join(contextCounts,
        split(col("bigram"), " ").getItem(0) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("__id"),
        log((col("c_bigram") + k) / (col("c_context") + col("v") * k)).as("lp"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("sum_lp"))
      .select(col("__id").as(idCol), col("n_bigrams"),
        round(col("sum_lp") / col("n_bigrams"), 6).as("avg_logprob"),
        round(exp(-col("sum_lp") / col("n_bigrams")), 6).as("ppl"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): train the add-k
    * bigram model on a REFERENCE slice (`trainFilter`, CCNet's "Wikipedia"),
    * score EVERY document under it, and bucket by FIXED mean-log-prob
    * thresholds — head / middle / tail. Fixed thresholds are the paper's
    * actual design (precomputed per-language cutoffs), and they keep the
    * plan free of any global sort or quantile pass: bucketing is a row-local
    * comparison after the per-doc score.
    *
    * Unlike [[scoreBigram]], the count joins are LEFT joins: bigrams unseen
    * in training score the smoothed floor k/(c_ctx + kV) (unseen context →
    * 1/V), which is the whole point of a train/apply split.
    *
    * Cross-engine exactness: the per-doc log-prob sum is an ORDERED running
    * chain over bigram position (window partitioned by doc — row-group
    * local, never a global sort), so both engines add the same doubles in
    * the same order and the bucket comparisons see bit-identical values
    * (the r26 ln-chain doctrine; a bare `sum()` would be partition-order
    * dependent exactly at the bucket boundaries).
    *
    * Returns `(id, n_bigrams, avg_logprob, bucket)`; docs with <2 tokens
    * carry no evidence and drop. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      trainFilter: Column, k: Double = 0.5,
      headLp: Double, midLp: Double): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    require(headLp > midLp, s"head threshold must exceed middle: $headLp <= $midLp")
    def bigramsOf(d: DataFrame): DataFrame = {
      val toks = TextOps.tokens(lower(col(textCol)))
      d.select(col(idCol).as("__id"),
        posexplode(zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as(Seq("pos", "bigram")))
    }
    val trainBigrams = bigramsOf(df.filter(trainFilter))
    val bigramCounts = trainBigrams.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_bigram"))
    val contextCounts = trainBigrams
      .groupBy(split(col("bigram"), " ").getItem(0).as("w1"))
      .agg(count(lit(1)).as("c_context"))
    val vocab = bigramCounts.agg(count(lit(1)).as("v"))
    val scored = bigramsOf(df)
      .join(bigramCounts, Seq("bigram"), "left")
      .join(contextCounts.withColumnRenamed("w1", "__w1"),
        split(col("bigram"), " ").getItem(0) === col("__w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("__id"), col("pos"),
        log((coalesce(col("c_bigram"), lit(0L)) + k) /
          (coalesce(col("c_context"), lit(0L)) + col("v") * k)).as("lp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    scored
      .withColumn("cum_lp", sum(col("lp")).over(w))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        max_by(col("cum_lp"), col("pos")).as("sum_lp"))
      .select(col("__id").as(idCol), col("n_bigrams"),
        round(col("sum_lp") / col("n_bigrams"), 6).as("avg_logprob"),
        when(col("sum_lp") >= col("n_bigrams") * headLp, lit("head"))
          .when(col("sum_lp") >= col("n_bigrams") * midLp, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
