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

  test("chunkExplode covers every token, overlaps by size-stride, short tail kept") {
    val rng = new scala.util.Random(9)
    val docs = (1 to 50).map { i =>
      (i.toLong, Seq.tabulate(rng.nextInt(40))(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val got = Corpus.chunkExplode(docs, "doc_id", "text", size = 8, stride = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    (1 to 50).foreach { i =>
      val chunks = got(i.toLong).sortBy(_._2)
      val toks = docs.where(col("doc_id") === i).collect()(0).getString(1)
        .trim.split("\\s+").filter(_.nonEmpty)
      // chunk ids are consecutive ordinals from 0
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
      // reassembling chunk c's tokens = the slice starting at c*stride
      chunks.foreach { case (_, cid, text, n) =>
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        assert(words.length == n)
        assert(words.toSeq == toks.slice((cid * 5).toInt, (cid * 5).toInt + 8).toSeq,
          s"doc $i chunk $cid")
      }
      // coverage: the last chunk reaches the final token; empty docs emit
      // exactly one empty chunk
      if (toks.isEmpty) assert(chunks.map(_._3).toSeq == Seq(""))
      else assert(chunks.last._2 * 5 + chunks.last._4 == toks.length)
    }
  }

  test("chunkMap offsets are independent of the input partition layout") {
    // the sharded two-phase cumsum must yield the same exact offsets no
    // matter how the input arrives partitioned (token counts are longs, so
    // the decomposition is exact — assert bit-equality)
    val rng = new scala.util.Random(5)
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(20))("w").mkString(" "), i % 13)
    }.toDF("doc_id", "text", "grp")
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.chunkMap(df, "doc_id", "text", budget = 16, orderCol = Some("grp"))
        .select("doc_id", "n_tokens", "start_offset", "start_chunk", "end_chunk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1)
    val a = run(docs)
    val b = run(docs.repartition(7))
    val c = run(docs.coalesce(1))
    assert(a.sameElements(b) && a.sameElements(c))
    // and the offsets tile the token stream exactly: sorted by offset, each
    // doc starts where the previous ended
    val byOff = a.sortBy(_._3)
    byOff.sliding(2).foreach {
      case Array((_, n1, o1, _, _), (_, _, o2, _, _)) => assert(o1 + n1 == o2)
      case _ =>
    }
  }

  test("chunkMap with a non-unique orderCol: ties don't overlap offsets") {
    // both docs share order=1; the RANGE-frame bug summed BOTH into each
    // peer's running offset, giving (3,3) instead of disjoint (0,3)
    val docs = Seq(
      (1L, "a b c", 1), (2L, "d e", 1), (3L, "f", 2))
      .toDF("doc_id", "text", "ord")
    val got = Corpus.chunkMap(docs, "doc_id", "text", budget = 4,
        orderCol = Some("ord"))
      .orderBy($"doc_id")
      .select("doc_id", "start_offset")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 3L), (3L, 5L)), got.toString)
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

  test("lineDedup removes lines shared by >=minDocs docs and reassembles in order") {
    val docs = Seq(
      (1L, "unique one\nboilerplate footer\nunique two"),
      (2L, "other text\nboilerplate footer"),
      (3L, "boilerplate footer"),
      (4L, "totally unique"))
      .toDF("doc_id", "text")
    val got = Corpus.lineDedup(docs, "doc_id", "text", sep = "\n", minDocs = 2)
      .orderBy($"doc_id")
      .select("doc_id", "clean_text", "n_units", "n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "unique one\nunique two", 3L, 1L),
      (2L, "other text", 2L, 1L),
      (3L, "", 1L, 1L), // every line was boilerplate → empty doc retained
      (4L, "totally unique", 1L, 0L)), got.toString)
  }

  test("lineDedup minDocs=3 keeps lines shared by only two docs") {
    val docs = Seq(
      (1L, "shared\nmine"), (2L, "shared\nyours"))
      .toDF("doc_id", "text")
    val got = Corpus.lineDedup(docs, "doc_id", "text", sep = "\n", minDocs = 3)
      .agg(sum($"n_removed")).as[Long].collect().head
    assert(got == 0L)
  }

  test("spanDedup strips duplicated aligned token spans, keeps unique spans") {
    // docs 1 and 2 share their first 4-token span verbatim; doc 1's tail
    // span is unique; doc 3 is all-unique; empty doc survives as one row
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "p q r s t u"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.spanDedup(docs, "doc_id", "text", span = 4, minDocs = 2)
      .orderBy($"doc_id")
      .select("doc_id", "clean_text", "n_units", "n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "e f", 2L, 1L),
      (2L, "x y", 2L, 1L),
      (3L, "p q r s t u", 2L, 0L),
      // the lone empty doc's sentinel empty-unit is unique → kept
      (4L, "", 1L, 0L)), got.toString)
  }

  test("spanDedup identical docs lose all content (exact-dup boilerplate)") {
    val docs = Seq((1L, "w x y z"), (2L, "w x y z")).toDF("doc_id", "text")
    val got = Corpus.spanDedup(docs, "doc_id", "text", span = 2, minDocs = 2)
      .select("clean_text").as[String].collect().toSeq
    assert(got == Seq("", ""))
  }

  test("keynessCensus: hand-computed Dunning G2 with direction") {
    import org.apache.spark.sql.functions.col
    // target slice says "cat" a lot; background says "dog"
    val docs = Seq(
      ("cat cat cat dog", true), ("cat cat rat rat", true),
      ("dog dog dog rat", false), ("dog rat rat rat", false))
      .toDF("text", "tgt").repartition(3)
    val r = Corpus.keynessCensus(docs, "text", col("tgt"), minTotal = 1L)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    // totals: target 8 tokens, background 8 tokens
    def g2(a: Long, b: Long): Double = {
      val (ad, bd, ta, tb) = (a.toDouble, b.toDouble, 8.0, 8.0)
      val e1 = ta * ((ad + bd) / (ta + tb)); val e2 = tb * ((ad + bd) / (ta + tb))
      2.0 * ((if (a > 0) ad * math.log(ad / e1) else 0.0) +
        (if (b > 0) bd * math.log(bd / e2) else 0.0))
    }
    assert(r("cat")._2 == 5L && r("cat")._3 == 0L)
    assert(math.abs(r("cat")._4 - g2(5, 0)) < 1e-4)
    assert(r("cat")._5 > 0)            // over-represented in target
    assert(r("dog")._5 < 0)            // under-represented
    assert(math.abs(r("dog")._4 - g2(1, 4)) < 1e-4)
    // rat: 2 vs 4 → negative direction
    assert(r("rat")._2 == 2L && r("rat")._3 == 4L && r("rat")._5 < 0)
  }

  test("tokenEntropyDF: hand-computed entropy, ttr, degenerate docs") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a a b"), (2L, "x y z"), (3L, "q q q"), (4L, ""))
      .toDF("doc_id", "text")
    val r = Corpus.tokenEntropyDF(df, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    def rd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: m = {a:2, b:1}; H = ln 3 - (2 ln 2)/3
    assert(r(1L)._2 == 3L && r(1L)._3 == 2L)
    assert(r(1L)._5 == rd(math.log(3) - 2 * math.log(2) / 3), r(1L).toString)
    // uniform doc: H = ln 3; repeated doc: H = 0; empty doc drops
    assert(r(2L)._5 == rd(math.log(3)))
    assert(r(3L)._5 == 0.0 && r(3L)._4 == rd(1.0 / 3))
    assert(!r.contains(4L))
  }

  test("zipfFitDF: an exact power law fits with slope -1, r2 = 1") {
    import org.apache.spark.sql.functions._
    // freqs 12, 6, 4, 3 = 12/rank -> ln freq = ln 12 - 1*ln rank exactly
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val r = Corpus.zipfFitDF(Seq((1L, text)).toDF("doc_id", "text"),
        "text", k = 4)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == 4L && r._2 == 12L)
    assert(math.abs(r._3 - (-1.0)) < 1e-9, r.toString)
    assert(math.abs(r._4 - math.log(12.0)) < 1e-6)
    assert(r._5 == 1.0)
  }
}
