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
}
