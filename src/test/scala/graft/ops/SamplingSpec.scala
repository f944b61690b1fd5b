package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 4000L).toDF("id")

  test("hashSample rate is approximately honored and deterministic") {
    val a = Sampling.hashSample(ids, $"id", 0.25).as[Long].collect().toSet
    val b = Sampling.hashSample(ids, $"id", 0.25).as[Long].collect().toSet
    assert(a == b)                                  // deterministic
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.03) // ≈ rate
  }

  test("hashSample is stable under repartitioning (unlike df.sample)") {
    val base = Sampling.hashSample(ids, $"id", 0.1).as[Long].collect().toSet
    val repart = Sampling.hashSample(ids.repartition(7), $"id", 0.1)
      .as[Long].collect().toSet
    assert(base == repart)
  }

  test("hashSample decisions are monotone in rate (nested samples)") {
    val small = Sampling.hashSample(ids, $"id", 0.1).as[Long].collect().toSet
    val large = Sampling.hashSample(ids, $"id", 0.3).as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("rates at/near 1.0 keep (almost) everything — no hex-width inversion") {
    // a naive threshold would be the 5-char "10000", which compares SMALLER
    // than 4-char prefixes like "ffff" and would invert the filter
    assert(Sampling.hexThreshold(1.0) == "ffff")
    val kept = Sampling.stratifiedHashSample(
      ids.withColumn("s", lit("all")), $"s", $"id", Map("all" -> 0.999999))
      .count()
    assert(kept >= 3999)
  }

  test("sub-granularity positive rates fail fast instead of sampling nothing") {
    intercept[IllegalArgumentException](Sampling.hexThreshold(1e-6))
    // the boundary cases stay legal; [1/131072, 1/65536) rounds UP to one
    // granule rather than throwing (it keeps rows, just coarsely)
    assert(Sampling.hexThreshold(0.0) == "0000")
    assert(Sampling.hexThreshold(1.0 / 65536) == "0001")
    assert(Sampling.hexThreshold(1.0 / 131072) == "0001")
    intercept[IllegalArgumentException](Sampling.hexThreshold(0.999 / 131072))
  }

  test("stratifiedHashSample applies per-stratum rates and drops unlisted strata") {
    val df = ids.withColumn("s", when($"id" % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedHashSample(df, $"s", $"id",
      Map("even" -> 0.5)).select($"id").as[Long].collect()
    assert(got.forall(_ % 2 == 0))
    assert(math.abs(got.length / 2000.0 - 0.5) < 0.05)
  }
}
