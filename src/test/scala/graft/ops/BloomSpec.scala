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

  test("non-long key is a type-check error, not a runtime surprise") {
    val bloom = dim.stat.bloomFilter("dk", 100L, 0.03)
    val err = intercept[Exception] {
      dim.where(graft.expressions.BloomMightContainExpr
        .mightContain(col("name"), bloom)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("long"))
  }
}
