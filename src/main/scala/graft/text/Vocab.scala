package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary + token-id encoding (NOT-IN-REFERENCE extension, the
  * tokenizer-vocab step between "clean documents" and "token streams" in a
  * training-data pipeline): the vocabulary is the top-`topN` whitespace
  * tokens by corpus frequency (ties → lexicographically smaller token), ids
  * are frequency ranks 0..N−1, and encoding maps every token position to
  * its id (out-of-vocabulary → −1 so positions stay aligned).
  *
  * Scale: the count is ONE map-side-combined groupBy over exploded tokens;
  * the vocabulary is bounded by `topN` BY CONSTRUCTION, so collecting it to
  * the driver and broadcasting the token→id map as a literal is the honest
  * 100 TB design (a vocab never grows with the corpus — the cap is the
  * point). Encoding is then a per-row map lookup — no join, no shuffle on
  * the corpus side.
  */
object Vocab {

  /** The top-`topN` (token, id, freq) vocabulary, id = frequency rank
    * (0-based, ties → token asc). Deterministic total order. */
  def buildVocab(df: DataFrame, textCol: String, topN: Int): Array[(String, Long, Long)] = {
    require(topN > 0, s"topN must be positive, got $topN")
    df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok").asc)
      .limit(topN)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (r.getString(0), i.toLong, r.getLong(1)) }
  }

  /** Encode every token position against a (token → id) vocabulary map:
    * one row per (id, pos, token_id), OOV → −1. The map rides as a literal
    * (broadcast-equivalent); the corpus never shuffles. */
  def encodeTokens(df: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long]): DataFrame = {
    val lookup =
      if (vocab.isEmpty) lit(-1L)
      else coalesce(element_at(typedLit(vocab), col("__tok")), lit(-1L))
    df.select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .select(col(idCol), col("__pos").cast("long").as("pos"),
        lookup.as("token_id"))
  }

  /** Feature hashing (the "hashing trick") — fixed-width signed token
    * features with NO vocabulary pass: every token maps straight to one of
    * `dim` buckets with a ±1 sign, so the featurizer is stateless (new
    * tokens never resize anything) and one groupBy away from a sparse
    * feature frame `(id, bucket, v, n_tokens)`.
    *
    * The bucket/sign derive from md5 hex characters (char-code mix
    * `(u1·31 + u2) mod dim`, sign from the third nibble's parity) — the
    * d8/d9 doctrine: an engine-portable hash so the whole featurizer
    * replays in any SQL engine; a production variant would swap in
    * xxhash64 % dim (engine-specific, same shape, one expression).
    *
    * Plan: one explode → one map-side-combined groupBy keyed (id, bucket)
    * — ≤ dim rows per doc survive; no joins, no windows, nothing global. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    require(dim > 1, s"dim must be >1, got $dim")
    val h = md5(col("__tok"))
    df.select(col(idCol),
        explode(TextOps.tokens(lower(col(textCol)))).as("__tok"))
      .select(col(idCol),
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % dim)
          .cast("long").as("bucket"),
        when(ascii(substring(h, 3, 1)) % 2 === 0, 1L).otherwise(-1L).as("sgn"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sgn")).as("v"), count(lit(1)).as("n_tokens"))
      .orderBy(col(idCol), col("bucket"))
  }
}
