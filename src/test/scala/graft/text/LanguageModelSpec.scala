package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("scoreBigram reproduces hand-computed add-k probabilities") {
    // corpus bigrams: "a b" ×2 (docs 1,2), "b a" ×1 (doc 2) → V = 2
    // contexts: c(a·) = 2, c(b·) = 1
    val docs = Seq((1L, "a b"), (2L, "a b a")).toDF("doc_id", "text")
    val got = LanguageModel.scoreBigram(docs, "doc_id", "text", k = 0.5)
      .orderBy($"doc_id")
      .select("doc_id", "n_bigrams", "avg_logprob", "ppl")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val pAB = (2 + 0.5) / (2 + 0.5 * 2) // P(b|a) = 2.5/3
    val pBA = (1 + 0.5) / (1 + 0.5 * 2) // P(a|b) = 1.5/2
    val lp1 = math.log(pAB)
    val lp2 = (math.log(pAB) + math.log(pBA)) / 2
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.map(_._2) == Seq(1L, 2L))
    assert(math.abs(got(0)._3 - r6(lp1)) < 1e-9, got.toString)
    assert(math.abs(got(1)._3 - r6(lp2)) < 1e-9, got.toString)
    assert(math.abs(got(0)._4 - r6(math.exp(-lp1))) < 1e-9, got.toString)
  }

  test("scoreBigram drops docs with fewer than two tokens") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"))
      .toDF("doc_id", "text")
    val ids = LanguageModel.scoreBigram(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(3L))
  }

  test("repetitive text scores higher (lower perplexity) than unique text") {
    val docs = Seq(
      (1L, "x y x y x y x y x y x y"),
      (2L, "q w e r t z u i o p a s"))
      .toDF("doc_id", "text")
    val m = LanguageModel.scoreBigram(docs, "doc_id", "text")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(m(1L) < m(2L), m.toString) // frequent bigrams → low perplexity
  }

  test("perplexityBuckets: train/apply split with hand-computed scores") {
    val docs = Seq(
      (1L, "a b a b a b", "en"), // train: bigrams (a b)x3? no: a b,b a,a b,b a,a b
      (2L, "a b a c", "en"),     // train: a b, b a, a c
      (3L, "z z z", "xx"),       // apply only: unseen bigram AND context
      (4L, "a b a b", "xx"))     // apply only: seen bigrams
      .toDF("doc_id", "text", "lang")
    // train counts: "a b"->4, "b a"->3, "a c"->1; V=3; ctx a->5, b->3
    val got = LanguageModel.perplexityBuckets(docs, "doc_id", "text",
        trainFilter = col("lang") === "en", k = 0.5,
        headLp = -0.5, midLp = -1.0)
      .select("doc_id", "n_bigrams", "avg_logprob", "bucket")
      .as[(Long, Long, Double, String)].collect().map(t => t._1 -> t).toMap
    // doc3: two "z z" bigrams, unseen: lp = ln(0.5 / (0 + 1.5)) each
    val lpUnseen = math.log(0.5 / 1.5)
    assert(got(3L)._2 == 2L && got(3L)._4 == "tail")
    assert(math.abs(got(3L)._3 - lpUnseen) < 1e-6, got(3L).toString)
    // doc4: (a b), (b a), (a b): 2*ln(4.5/6.5) + ln(3.5/4.5), avg / 3
    val avg4 = (2 * math.log(4.5 / 6.5) + math.log(3.5 / 4.5)) / 3
    assert(got(4L)._2 == 3L && got(4L)._4 == "head")
    assert(math.abs(got(4L)._3 - avg4) < 1e-6, got(4L).toString)
    // training docs score too (they're part of the apply set)
    assert(got.contains(1L) && got.contains(2L))
  }
}
