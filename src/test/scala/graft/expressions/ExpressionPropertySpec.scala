package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks: every native codegen expression must agree with its
  * built-in / higher-order-function reference formulation on random inputs
  * (generators sampled directly — the scalatest/scalacheck bridge artifact
  * isn't in the offline cache). */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.listOf(Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "x1", "zz", "q")).map(_.mkString(" "))

  test("sortedIntersectCount ≡ size(array_intersect) on random sorted distinct arrays") {
    val arrGen = for {
      a <- Gen.listOf(Gen.alphaStr.map(_.take(6)))
      b <- Gen.listOf(Gen.alphaStr.map(_.take(6)))
    } yield (a.distinct.sorted, b.distinct.sorted)
    samples(arrGen, 40).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val native = df.select(SortedIntersectCount.sortedIntersectCount($"a", $"b"))
        .as[Int].head()
      val builtin = df.select(size(array_intersect($"a", $"b"))).as[Int].head()
      assert(native == builtin, s"$a ∩ $b")
    }
  }

  test("sigAgreement ≡ zip_with count on random long arrays") {
    val gen = for {
      n <- Gen.choose(0, 40)
      a <- Gen.listOfN(n, Gen.choose(0L, 5L))
      b <- Gen.listOfN(n, Gen.choose(0L, 5L))
    } yield (a, b)
    samples(gen, 40).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val native = df.select(SigAgreement.sigAgreement($"a", $"b")).as[Int].head()
      val hof = df.select(aggregate(zip_with($"a", $"b",
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v))
        .as[Int].head()
      assert(native == hof, s"$a vs $b")
    }
  }

  test("minhash signature: native ≡ HOF on random word docs") {
    samples(wordGen, 25).filter(_.nonEmpty).foreach { doc =>
      val df = Seq(doc).toDF("t")
        .select(transform(graft.dedup.Dedup.shingles($"t", 2), s => xxhash64(s)).as("hs"))
      val (nat, hof) = df.select(
        graft.dedup.Dedup.minHashSignatureNative($"hs", 24, 5L),
        graft.dedup.Dedup.minHashSignatureFromHashes($"hs", 24, 5L))
        .as[(Seq[Long], Seq[Long])].head()
      assert(nat == hof, doc)
    }
  }

  test("shingle hashes: cardinality ≡ distinct string shingles; NFC idempotent") {
    samples(wordGen, 25).foreach { doc =>
      val df = Seq(doc).toDF("t")
      val (nHashes, nStrings) = df.select(
        size(ShingleHashExpr.shingleHashes($"t", 3)),
        size(array_distinct(graft.dedup.Dedup.shingles($"t", 3))))
        .as[(Int, Int)].head()
      // empty doc: native yields 0, string form yields 1 ("" whole-text shingle)
      if (doc.trim.nonEmpty) assert(nHashes == nStrings, doc)
      val (once, twice) = df.select(
        NfcNormalizeExpr.nfc($"t"),
        NfcNormalizeExpr.nfc(NfcNormalizeExpr.nfc($"t"))).as[(String, String)].head()
      assert(once == twice)
    }
  }
}
