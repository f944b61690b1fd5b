package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a c a b"),
    (2L, "b c d"),
    (3L, "  a   e  ")).toDF("doc_id", "text")

  test("buildVocab ranks by frequency desc with token-asc ties") {
    // freqs: a=4, b=3, c=2, d=1, e=1 (d before e on the tie)
    val v = Vocab.buildVocab(docs, "text", topN = 4)
    assert(v.toSeq == Seq(("a", 0L, 4L), ("b", 1L, 3L), ("c", 2L, 2L), ("d", 3L, 1L)))
  }

  test("encodeTokens preserves positions and marks OOV as -1") {
    val vmap = Vocab.buildVocab(docs, "text", topN = 4).map(v => (v._1, v._2)).toMap
    val got = Vocab.encodeTokens(docs, "doc_id", "text", vmap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq(
      (1L, 0L, 0L), (1L, 1L, 1L), (1L, 2L, 0L), (1L, 3L, 2L), (1L, 4L, 0L), (1L, 5L, 1L),
      (2L, 0L, 1L), (2L, 1L, 2L), (2L, 2L, 3L),
      (3L, 0L, 0L), (3L, 1L, -1L))) // "e" fell outside topN=4 → OOV
  }

  test("empty vocab encodes everything as OOV; topN larger than vocab is fine") {
    val all = Vocab.buildVocab(docs, "text", topN = 1000)
    assert(all.length == 5)
    val oov = Vocab.encodeTokens(docs, "doc_id", "text", Map.empty)
      .select(countDistinct($"token_id")).collect()(0).getLong(0)
    assert(oov == 1) // only -1
  }

  test("hashedFeatures: driver md5 replay; same token always lands together") {
    val docs = Seq((1L, "Cat dog cat  bird"), (2L, "cat CAT fish"))
      .toDF("doc_id", "text")
    val r = Vocab.hashedFeatures(docs, "doc_id", "text", dim = 16)
      .as[(Long, Long, Long, Long)].collect().toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def feat(tok: String): (Long, Long) = {
      val h = md5hex(tok)
      (((h(0).toInt * 31 + h(1).toInt) % 16).toLong,
        if (h(2).toInt % 2 == 0) 1L else -1L)
    }
    val toks = Map(1L -> Seq("cat", "dog", "cat", "bird"),
      2L -> Seq("cat", "cat", "fish"))
    val exp = toks.toSeq.flatMap { case (id, ts) =>
      ts.map(feat).groupBy(_._1).map { case (b, fs) =>
        (id, b, fs.map(_._2).sum, fs.size.toLong)
      }
    }.sortBy(t => (t._1, t._2))
    assert(r == exp)
  }
}
