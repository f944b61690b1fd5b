package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding merge-rule training + corpus encoding
  * (NOT-IN-REFERENCE extension — the tokenizer-training step of an LLM
  * data pipeline, one level below [[Vocab]]'s whole-word ids).
  *
  * Semantics are CANONICAL BPE (Sennrich et al. 2016): start from
  * characters, repeatedly merge the most frequent adjacent symbol pair
  * (weighted by word frequency), each merge applied leftmost-greedy to
  * every word. Ties break deterministically (count desc, then pair
  * lexicographic asc); training stops early when no pair reaches
  * `minCount`.
  *
  * Scale design (the [[Vocab]] doctrine): the corpus-sized work is ONE
  * map-side-combined word-frequency groupBy; training then runs on the
  * top-`dictSize` (word, freq) dictionary — bounded BY CONSTRUCTION, so
  * the driver-side merge loop is a bounded protocol, exactly how
  * production tokenizer trainers cap their word dicts. Encoding applies
  * the k merges as k chained codegen'd `replace` calls over DISTINCT
  * words (never row-by-row over the corpus), so the corpus-sized side
  * stays a scan + one groupBy.
  *
  * String representation (shared with the DuckDB oracle replay): a word's
  * symbol stream is `" s1  s2  ...  sk "` — TWO spaces between symbols,
  * one at each end. A merge (a,b) is `replace(s, " a  b ", " ab ")`:
  * because adjacent pair occurrences share no characters in this format
  * (each match consumes the second space before `a` and the first after
  * `b`), a single left-to-right non-overlapping replace-all — the exact
  * semantics of both Spark's and DuckDB's `replace` — merges every
  * occurrence leftmost-greedy, which IS the BPE merge step. Symbols never
  * contain whitespace (tokens come from a whitespace split), so matches
  * can only align on symbol boundaries.
  */
object Bpe {

  /** Lower-cased `[a-z]+` word frequencies of a corpus — the one
    * corpus-sized job (map-side combine, single shuffle on the word). The
    * charset filter keeps the delimiter representation unambiguous and
    * the dict language-clean; `maxWordLen` drops degenerate
    * concatenations. */
  def wordFrequencies(df: DataFrame, textCol: String,
      maxWordLen: Int = 20): DataFrame =
    df.select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .where(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Train `numMerges` merge rules on the top-`dictSize` words of
    * `wordFreq` (ties → word asc; deterministic). Returns the merges in
    * rank order, possibly fewer than requested when no adjacent pair
    * reaches `minCount` any more. */
  def train(wordFreq: DataFrame, numMerges: Int, dictSize: Int = 2048,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges > 0 && dictSize > 0)
    // bounded collect: the dict is capped by construction
    val dict: Array[(Array[String], Long)] = wordFreq
      .orderBy(col("freq").desc, col("w").asc)
      .limit(dictSize)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val words = dict.map(_._1.to(mutable.ArrayBuffer))
    val freqs = dict.map(_._2)
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val w = words(i); val f = freqs(i)
        var j = 0
        while (j + 1 < w.length) {
          val p = (w(j), w(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          j += 1
        }
        i += 1
      }
      val best = counts.iterator.filter(_._2 >= minCount)
        .reduceOption { (x, y) =>
          val cmp = java.lang.Long.compare(x._2, y._2)
          if (cmp > 0) x
          else if (cmp < 0) y
          else {
            val o = Ordering.Tuple2[String, String].compare(x._1, y._1)
            if (o <= 0) x else y
          }
        }
      best match {
        case None => exhausted = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          val ab = a + b
          var i2 = 0
          while (i2 < words.length) {
            val w = words(i2)
            // leftmost-greedy single pass: exactly the replace semantics
            var j = 0
            while (j + 1 < w.length) {
              if (w(j) == a && w(j + 1) == b) { w(j) = ab; w.remove(j + 1) }
              j += 1
            }
            i2 += 1
          }
      }
    }
    merges.toSeq
  }

  /** The seed symbol stream of a word: one symbol per character in the
    * shared two-space-delimited format (`"cat"` → `" c  a  t "`). */
  def seed(w: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(w, "(.)", "$1  ")), lit(" "))

  /** Apply trained merges in rank order as chained replace-all calls —
    * codegen'd string ops, no shuffle, no UDF. */
  def applyMerges(s: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(s) { case (acc, (a, b)) =>
      replace(acc, lit(s" $a  $b "), lit(s" ${a + b} "))
    }

  /** Corpus subword-token frequencies under the trained merges: encodes
    * each DISTINCT word once (the scale path — corpus weight rides the
    * `freq` column) and sums occurrence-weighted token counts. Output
    * (token, n), deterministic under `ORDER BY token`. */
  def encodeCounts(wordFreq: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    wordFreq
      .select(col("freq"),
        split(trim(applyMerges(seed(col("w")), merges)), "  ").as("toks"))
      .select(col("freq"), explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("n"))
}
