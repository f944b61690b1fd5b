package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("chunkMap lays out the token stream and maps docs to chunk spans") {
    val docs = Seq(
      (1L, "a b c"),          // 3 tokens, offset 0, chunks 0..0
      (2L, "d e f g h"),      // 5 tokens, offset 3, spans chunks 0..1 (budget 4)
      (3L, ""),               // 0 tokens, offset 8, degenerate span 2..2
      (4L, "i j"))            // 2 tokens, offset 8, chunks 2..2
      .toDF("doc_id", "text")
    val got = Corpus.chunkMap(docs, "doc_id", "text", budget = 4)
      .orderBy($"doc_id")
      .select("doc_id", "n_tokens", "start_offset", "start_chunk", "end_chunk")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0L, 0L, 0L),
      (2L, 5L, 3L, 0L, 1L),
      (3L, 0L, 8L, 2L, 2L),
      (4L, 2L, 8L, 2L, 2L)), got.toString)
  }

  test("contamination flags train docs sharing n-gram shingles with eval") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix text the quick brown fox jumps and more words here"),
      (2L, "completely unrelated content with no overlap at all whatsoever"),
      (3L, "the quick brown fox jumps over the lazy dog verbatim copy"))
      .toDF("doc_id", "text")
    val got = Corpus.contamination(train, "doc_id", eval, "doc_id", "text",
        n = 5, minShared = 1)
      .orderBy($"train_id")
      .select("train_id", "eval_id", "shared_shingles")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 shares exactly one 5-gram ("the quick brown fox jumps");
    // doc 3 contains all five of the eval doc's 5-grams; doc 2 none
    assert(got == Seq((1L, 100L, 1L), (3L, 100L, 5L)), got.toString)
  }

  test("contamination broadcast the eval side (no shuffle of the corpus scan)") {
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val plan = Corpus.contamination(train, "doc_id", eval, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
