package graft.text

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  // corpus: doc 1 has the term twice in 4 tokens, doc 2 once in 4, doc 3 none
  private def corpus = Seq(
    (1L, "cat dog cat bird"),
    (2L, "cat fish lizard newt"),
    (3L, "horse cow pig goat")).toDF("doc_id", "text")

  test("bm25TopK reproduces the hand-computed score") {
    val got = Search.bm25TopK(corpus, "doc_id", "text", Seq("cat"), k = 10)
      .select("doc_id", "n_terms_matched", "score")
      .as[(Long, Long, Double)].collect().toSeq
    val n = 3.0; val df = 2.0; val avgdl = 4.0; val dl = 4.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double) = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    // doc 1 (tf=2) outranks doc 2 (tf=1); doc 3 excluded
    assert(got.map(_._1) == Seq(1L, 2L), got.toString)
    assert(got.map(_._2) == Seq(1L, 1L))
    assert(math.abs(got(0)._3 - s(2)) < 1e-6, got.toString)
    assert(math.abs(got(1)._3 - s(1)) < 1e-6, got.toString)
  }

  test("multi-term queries sum per-term scores; rare terms weigh more") {
    val docs = Seq(
      (1L, "rare common pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common pad pad pad"),
      (4L, "common pad pad pad")).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("rare", "common"), k = 10)
      .select("doc_id", "n_terms_matched").as[(Long, Long)].collect().toSeq
    assert(got.head == ((1L, 2L)), got.toString) // both terms + rare idf → top
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("k bounds the result and ties break by doc id") {
    val docs = Seq(
      (5L, "t x"), (3L, "t x"), (9L, "t x")).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("t"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 5L), got.toString)
  }

  test("dedup of repeated query terms (no double counting)") {
    val a = Search.bm25TopK(corpus, "doc_id", "text", Seq("cat", "cat"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val b = Search.bm25TopK(corpus, "doc_id", "text", Seq("cat"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("tfIdfTopTerms: hand-computed scores and ranks") {
    // 3 docs; "rare" appears only in doc 1 (tf 2), "common" in all three
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common common x"),
      (3L, "common y")).toDF("doc_id", "text")
    val r = Search.tfIdfTopTerms(docs, "doc_id", "text", topK = 2)
      .as[(Long, String, Long, Long, Double, Long)].collect()
    def score(tf: Long, dft: Long): Double =
      BigDecimal(tf.toDouble * (math.log(4.0 / (dft + 1.0)) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDoc = r.groupBy(_._1)
    // doc 1: rare (tf 2, df 1) beats common (tf 1, df 3)
    assert(byDoc(1L).map(t => (t._2, t._3, t._4, t._6)).toSeq ==
      Seq(("rare", 2L, 1L, 1L), ("common", 1L, 3L, 2L)))
    assert(byDoc(1L).head._5 == score(2, 1))
    // doc 2: common (tf 2) vs x (tf 1, df 1): 2·idf(3) vs 1·idf(1)
    val doc2 = byDoc(2L).map(t => (t._2, t._6)).toSeq
    assert(doc2.toSet == Set(("common", doc2.find(_._1 == "common").get._2),
      ("x", doc2.find(_._1 == "x").get._2)))
    r.foreach(t => assert(t._6 <= 2L))
  }

  test("tfIdfTopTerms: empty tokens and NULL text drop; ties break by term") {
    val docs = Seq((1L, Some("b  a")), (2L, None)).toDF("doc_id", "text")
    val r = Search.tfIdfTopTerms(docs, "doc_id", "text", topK = 5)
      .as[(Long, String, Long, Long, Double, Long)].collect()
    // doc 2 gone; doc 1 has terms a and b, equal scores, 'a' ranks first
    assert(r.map(_._1).forall(_ == 1L))
    assert(r.map(t => (t._2, t._6)).toSeq == Seq(("a", 1L), ("b", 2L)))
  }

  test("hybridRrf: both-list docs outrank single-list docs; terms replay") {
    // docs 1..4; lexical query hits 1,2; dense query vec aligns with 2,3
    val docs = Seq((1L, "cat dog"), (2L, "cat fish"), (3L, "horse cow"),
      (4L, "pig goat")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),  // query vector
      (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.1f)),
      (3L, Seq(1.0f, 0.3f)),
      (4L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Search.hybridRrf(docs, "doc_id", "text", emb, "vec_id",
        "embedding", Seq("cat"), queryVecId = 0L, kPerList = 3, rrfK = 60,
        topK = 10)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    // lex list: docs 1,2 (tie → id asc); dense top-3 vs (1,0): 2, 3, 1
    val exp = Seq(
      (2L, Some(2L), Some(1L), 1.0 / 62 + 1.0 / 61),
      (1L, Some(1L), Some(3L), 1.0 / 61 + 1.0 / 63),
      (3L, None: Option[Long], Some(2L), 0.0 + 1.0 / 62))
    assert(r == exp)
  }
}
