package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (NOT-IN-REFERENCE extension — the reference has no text corpus surface;
  * these are the engine's LLM-data-pipeline operators over the `documents`
  * table).
  *
  * Everything is built from `org.apache.spark.sql.functions` (codegen'd
  * expressions, no UDFs): a 100 TB corpus pass stays inside whole-stage
  * codegen with zero serialization detours.
  */
object TextOps {

  /** Whitespace tokens, empty-safe: trim → split on runs of whitespace →
    * drop empties (leading/trailing artifacts). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= lit(""))

  /** Whitespace token count (the "BPE-ish regex" variant is [[subwordCount]]). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Subword-ish token count: splits on whitespace AND word/number boundaries
    * the way byte-pair pretokenizers do (letters runs, digit runs, punct). */
  def subwordCount(c: Column): Column =
    size(filter(split(c,
        "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\\s+|(?=[^a-zA-Z0-9\\s])|(?<=[^a-zA-Z0-9\\s])"),
      t => t =!= lit("")))

  /** Ratio of punctuation characters to all characters (0 for empty). */
  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, lit(0.0)).otherwise(
      (len - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double") / len)
  }

  /** Fraction of tokens that are in `stopwords` (0 for empty docs). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLength(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** English-ish stopwords used by the quality score and language ID. */
  val EnglishStops: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be")

  /** Heuristic quality score in [0,1]: length sweet-spot × low punctuation ×
    * some stopword presence × sane mean word length. Mirrors the usual
    * pretraining-filter recipe (length/punct/stopword ratios); weights are
    * fixed so the score is deterministic and oracle-checkable. */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lengthScore = least(nTok / lit(20.0), lit(1.0)) // <20 tokens → penalized
    val punctScore = greatest(lit(1.0) - punctRatio(c) * 4, lit(0.0))
    val stopScore = least(stopwordRatio(c, EnglishStops) * 5, lit(1.0))
    val mtl = meanTokenLength(c)
    val wordLenScore = when(mtl >= 2 && mtl <= 12, lit(1.0)).otherwise(lit(0.5))
    lengthScore * lit(0.4) + punctScore * lit(0.3) +
      stopScore * lit(0.2) + wordLenScore * lit(0.1)
  }

  /** Per-language discriminative stopword sets for the n-gram/stopword
    * language-ID heuristic. */
  val LangStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que", "por", "con", "para"))

  /** Stopword-vote language ID: count tokens hitting each language's stopword
    * set; argmax with a fixed tie-break order (list order above); no hits at
    * all → "unknown". CJK short-circuit: any Han characters → "zh". */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scores = LangStops.map { case (lang, stops) =>
      val arr = array(stops.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in list order: earlier langs win ties (checked first)
    val chain = scores.foldLeft(Option.empty[Column]) { case (acc, (lang, s)) =>
      val cond = s === best && best > 0
      Some(acc match {
        case None => when(cond, lit(lang))
        case Some(w) => w.when(cond, lit(lang))
      })
    }.get.otherwise(lit("unknown"))
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(chain)
  }

  /** Staged language ID: tokens and the four stopword scores materialize as
    * columns (one pass each), then the argmax chain reads attributes. The
    * single-expression [[langId]] re-evaluates every score per when-branch —
    * interpreted HOFs get no common-subexpression elimination, so on a
    * corpus pass this version is ~5× cheaper. Identical output. */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
      out: String): org.apache.spark.sql.DataFrame = {
    val scoreCols = LangStops.map { case (lang, _) => s"__s_$lang" }
    val withScores = LangStops.foldLeft(
      df.withColumn("__toks", tokens(col(textCol)))) {
      case (acc, (lang, stops)) =>
        val arr = array(stops.map(lit): _*)
        acc.withColumn(s"__s_$lang",
          size(filter(col("__toks"), t => array_contains(arr, t))))
    }.withColumn("__best", greatest(scoreCols.map(col): _*))
    val chain = LangStops.map(_._1).foldLeft(Option.empty[Column]) {
      case (acc, lang) =>
        val cond = col(s"__s_$lang") === col("__best") && col("__best") > 0
        Some(acc match {
          case None => when(cond, lit(lang))
          case Some(w) => w.when(cond, lit(lang))
        })
    }.get.otherwise(lit("unknown"))
    withScores
      .withColumn(out,
        when(col(textCol).rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(chain))
      .drop("__toks" +: "__best" +: scoreCols: _*)
  }

  /** Staged quality score — same motivation as [[withLangId]]: tokens and
    * ratio components materialize once. Identical arithmetic/output to
    * [[qualityScore]]. */
  def withQualityScore(df: org.apache.spark.sql.DataFrame, textCol: String,
      out: String): org.apache.spark.sql.DataFrame = {
    val c = col(textCol)
    val stops = array(EnglishStops.map(lit): _*)
    df.withColumn("__toks", tokens(c))
      .withColumn("__ntok", size(col("__toks")).cast("double"))
      .withColumn("__pr", {
        val len = length(c)
        when(len === 0, lit(0.0)).otherwise(
          (len - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double") / len)
      })
      .withColumn("__sr",
        when(col("__ntok") === 0, lit(0.0)).otherwise(
          size(filter(col("__toks"), t => array_contains(stops, t))).cast("double") /
            size(col("__toks"))))
      .withColumn("__mtl",
        when(col("__ntok") === 0, lit(0.0)).otherwise(
          aggregate(col("__toks"), lit(0L), (acc, t) => acc + length(t)).cast("double") /
            size(col("__toks"))))
      .withColumn(out,
        least(col("__ntok") / lit(20.0), lit(1.0)) * lit(0.4) +
          greatest(lit(1.0) - col("__pr") * 4, lit(0.0)) * lit(0.3) +
          least(col("__sr") * 5, lit(1.0)) * lit(0.2) +
          when(col("__mtl") >= 2 && col("__mtl") <= 12, lit(1.0)).otherwise(lit(0.5)) * lit(0.1))
      .drop("__toks", "__ntok", "__pr", "__sr", "__mtl")
  }

  /** Flesch reading-ease readability census — the classic text-quality
    * signal (low-ease legalese and fragment spam both fall out of a
    * training mix's target band). Heuristic counts, all INTEGER and
    * regex-replayable cross-engine:
    * `words` = whitespace tokens, `sentences` = max(1, runs of [.!?]),
    * `syllables` = max(words, vowel-group runs of the lowercased text)
    * (every word carries ≥1 syllable), then
    * `flesch = 206.835 − 1.015·(w/s) − 84.6·(syl/w)` — one fixed double
    * tree, rounded to 3. Empty/token-less docs get NULL flesch.
    * Row-local; nothing shuffles. */
  def withReadability(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val c = col(textCol)
    df.withColumn("words", tokenCount(c).cast("long"))
      .withColumn("sentences",
        greatest(regexp_count(c, lit("[.!?]+")), lit(1)).cast("long"))
      .withColumn("syllables",
        greatest(regexp_count(lower(c), lit("[aeiouy]+")),
          tokenCount(c)).cast("long"))
      .withColumn("flesch",
        when(col("words") > 0, round(
          lit(206.835) -
            lit(1.015) * (col("words").cast("double") /
              col("sentences").cast("double")) -
            lit(84.6) * (col("syllables").cast("double") /
              col("words").cast("double")), 3)))
  }

  /** PII redaction for training corpora: emails, SSN-shaped ids, IPv4
    * addresses, then long phone-like digit runs, each replaced by a typed
    * placeholder. Order matters — the earlier, more specific patterns must
    * not be partially consumed by the greedier phone pattern. Patterns stick
    * to RE2-compatible syntax (no lookaround/backrefs) so the same regexes
    * run identically on other engines. A codegen'd `regexp_replace` chain:
    * one corpus pass, no UDF. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email, "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>")
    val ip = regexp_replace(ssn, "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d\\- ]{7,}\\d", "<PHONE>")
  }

  /** Rolling-hash document fingerprint (winnowing-lite): minimum `xxhash64`
    * over character `w`-shingles. Two documents sharing long substrings are
    * likely to share the minimizing shingle → same fingerprint. */
  def fingerprint(c: Column, w: Int = 16): Column = {
    val n = length(c)
    when(n < w, xxhash64(c)).otherwise(
      array_min(transform(sequence(lit(1), n - lit(w - 1)),
        i => xxhash64(c.substr(i, lit(w))))))
  }

  /** Cross-engine twin of [[fingerprint]]: minimum md5 hex digest over the
    * same character `w`-shingles. md5 is md5 everywhere and hex strings
    * compare byte-wise in every engine, so this variant is verifiable
    * against any SQL engine; keep [[fingerprint]] (xxhash64) as the fast
    * path — one 64-bit hash per shingle vs a 128-bit digest + hex encode. */
  def fingerprintMd5(c: Column, w: Int = 16): Column = {
    val n = length(c)
    when(n < w, md5(c)).otherwise(
      array_min(transform(sequence(lit(1), n - lit(w - 1)),
        i => md5(c.substr(i, lit(w))))))
  }

  /** The Gopher quality-filter stop words (Rae et al. 2021 Appendix A):
    * a doc must contain at least 2 DISTINCT members to pass the stop-word
    * rule (presence, not frequency — unlike [[stopwordRatio]]). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules census (Rae et al. 2021 Appendix A) —
    * the doc-level pretraining filter battery, each rule a named boolean
    * plus the `keep` conjunction. NOT-IN-REFERENCE extension; kinship:
    * [[qualityScore]] is the soft score, this is the hard gate; the
    * repetition rules of the same paper live in `Corpus` (t6 doctrine).
    *
    * Every rule comparison is INTEGER arithmetic (cross-multiplied
    * ratios), so the flags replay bit-exactly on any SQL engine; the only
    * doubles are the reported `mean_wl` (one division + round, display
    * only). Row-local — one codegen corpus pass, nothing shuffles.
    *
    * Rules (thresholds parameterized; paper defaults in parens):
    *  - `r_words`: word count in [minWords, maxWords] (50, 100 000)
    *  - `r_meanlen`: mean word chars in [3, 10] — as 3n ≤ Σlen ≤ 10n
    *  - `r_symbol`: ('#' + '…'-as-"...") symbols ≤ 0.1 per word
    *  - `r_bullet`: ≤ 90% of lines start with a bullet, AND ≤ 30% end
    *    with an ellipsis
    *  - `r_alpha`: ≥ 80% of words contain an alphabetic character
    *  - `r_stops`: ≥ 2 distinct [[GopherStops]] present
    */
  def gopherRules(df: org.apache.spark.sql.DataFrame, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stops: Seq[String] = GopherStops)
      : org.apache.spark.sql.DataFrame = {
    require(stops.nonEmpty, "stop-word rule needs a non-empty list")
    val text = col(textCol)
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val alphaWords =
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val stopsArr = array(stops.map(lit): _*)
    val stopHits =
      size(filter(stopsArr, s => array_contains(toks, s))).cast("long")
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val symbols = hashes.cast("long") + ellipses
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines,
      l => l.rlike("^\\s*[-*\\u2022]"))).cast("long")
    val ellipsisLines = size(filter(lines,
      l => l.rlike("\\.\\.\\.$"))).cast("long")
    df.withColumn("n_words", nWords)
      .withColumn("mean_wl",
        when(nWords > 0, round(sumLen.cast("double") / nWords, 6)))
      .withColumn("stop_hits", stopHits)
      .withColumn("r_words", nWords >= minWords && nWords <= maxWords)
      .withColumn("r_meanlen",
        nWords > 0 && sumLen >= nWords * 3 && sumLen <= nWords * 10)
      .withColumn("r_symbol", symbols * 10 <= nWords)
      .withColumn("r_bullet",
        bulletLines * 10 <= nLines * 9 && ellipsisLines * 10 <= nLines * 3)
      .withColumn("r_alpha", alphaWords * 5 >= nWords * 4)
      .withColumn("r_stops", stopHits >= 2)
      .withColumn("keep",
        col("r_words") && col("r_meanlen") && col("r_symbol") &&
          col("r_bullet") && col("r_alpha") && col("r_stops"))
  }
}
