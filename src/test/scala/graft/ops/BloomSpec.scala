package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1L to 10000L).map(i => (i, i % 97)).toDF("k", "payload")
  private lazy val dim = (1L to 10000L by 50).map(i => (i, s"d$i")).toDF("dk", "name")

  test("semiFilter never drops a matching row (no false negatives)") {
    val pre = Bloom.semiFilter(fact, dim, "k", "dk", expectedItems = 1000L)
      .select("k").as[Long].collect().toSet
    val truth = dim.select("dk").as[Long].collect().toSet
    assert(truth.subsetOf(pre), s"bloom dropped matches: ${truth -- pre}")
    // and it actually filters: at fpp 3% the pass-through set is far
    // smaller than the fact (200 true + ~3% of 9800 false positives)
    assert(pre.size < 2000, s"bloom filtered nothing: ${pre.size} of 10000")
  }

  test("prefilteredJoin ≡ plain inner join (false positives die in the join)") {
    val got = Bloom.prefilteredJoin(fact, dim, "k", "dk",
        expectedItems = 1000L)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    val want = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    assert(got == want)
  }

  test("membership expression agrees between interpreted eval and codegen") {
    val bloom = dim.stat.bloomFilter("dk", 1000L, 0.03)
    val c = graft.expressions.BloomMightContainExpr.mightContain(col("k"), bloom)
    val viaCodegen = fact.where(c).select("k").as[Long].collect().toSet
    // interpreted path: eval the expression row-by-row on the driver
    val viaEval = (1L to 10000L).filter(bloom.mightContainLong).toSet
    assert(viaCodegen == viaEval)
  }

  test("oversized sketch is refused with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Bloom.semiFilter(fact, dim, "k", "dk",
        expectedItems = 1L << 30, fpp = 0.001, maxSketchBytes = 1L << 20)
    }
    assert(e.getMessage.contains("raise fpp"))
  }

  test("auto-sized semiFilter counts the dim and matches the explicit size") {
    val auto = Bloom.semiFilterAuto(fact, dim, "k", "dk")
      .select("k").as[Long].collect().toSet
    val truth = dim.select("dk").as[Long].collect().toSet
    assert(truth.subsetOf(auto), s"auto-sized bloom dropped: ${truth -- auto}")
    // sized for the real 200-key dim, the pass-through is 200 + ~3% noise
    assert(auto.size < 800, s"auto-sizing produced a useless sketch: ${auto.size}")
    // nulls don't count toward the size (and don't crash the builder)
    val dimWithNulls = dim.select(
      when($"dk" > 5000L, lit(null).cast("long")).otherwise($"dk").as("dk"),
      $"name")
    val got = Bloom.prefilteredJoinAuto(fact, dimWithNulls, "k", "dk")
      .select("k", "name").as[(Long, String)].collect().toSet
    val want = fact.join(dimWithNulls, fact("k") === dimWithNulls("dk"))
      .select("k", "name").as[(Long, String)].collect().toSet
    assert(got == want)
  }

  test("undersized sketch degrades silently — the measured footgun " +
      "auto-sizing exists to prevent") {
    // the dim has 200 keys; size the sketch for 20 (items = 10x expected).
    // No row is LOST (false negatives are impossible), but the measured
    // fpp explodes past the 3% nominal, so the pre-filter passes most of
    // the fact through and the shuffle saving evaporates.
    val under = Bloom.semiFilter(fact, dim, "k", "dk", expectedItems = 20L)
      .select("k").as[Long].collect().toSet
    val truth = dim.select("dk").as[Long].collect().toSet
    assert(truth.subsetOf(under), "undersizing must never drop matches")
    val nonMatches = 10000 - truth.size
    val measuredFpp = (under.size - truth.size).toDouble / nonMatches
    assert(measuredFpp > 0.10,
      s"expected a badly degraded fpp at 10x overload, measured $measuredFpp")
    // the auto-sized sketch on the same data stays near nominal
    val auto = Bloom.semiFilterAuto(fact, dim, "k", "dk")
      .select("k").as[Long].collect().toSet
    val autoFpp = (auto.size - truth.size).toDouble / nonMatches
    assert(autoFpp < 0.06, s"auto-sized fpp should be ~nominal, got $autoFpp")
  }

  test("non-long key is a type-check error, not a runtime surprise") {
    val bloom = dim.stat.bloomFilter("dk", 100L, 0.03)
    val err = intercept[Exception] {
      dim.where(graft.expressions.BloomMightContainExpr
        .mightContain(col("name"), bloom)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("long"))
  }
}
