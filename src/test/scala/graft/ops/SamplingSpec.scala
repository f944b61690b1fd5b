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

  test("mixtureSample hits per-stratum token budgets, drops unlisted strata") {
    val docs = ids.select($"id",
      concat(lit("s"), ($"id" % 4).cast("string")).as("src"),
      (($"id" % 50) + 10).as("ntok")) // ~34.5k tokens per stratum
    val out = Sampling.mixtureSample(docs, $"src", $"id", $"ntok",
      Map("s0" -> 1000000L, "s1" -> 10000L, "s2" -> 3000L))
    val kept = out.groupBy($"src").agg(sum($"ntok").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("s3"), "unlisted stratum must be dropped")
    val total0 = docs.where($"src" === "s0").agg(sum($"ntok")).head.getLong(0)
    assert(kept("s0") == total0, "rate ≥ 1 keeps the whole stratum")
    // budget adherence within hash-uniformity noise (±20%)
    assert(math.abs(kept("s1") - 10000.0) / 10000 < 0.2, kept.toString)
    assert(math.abs(kept("s2") - 3000.0) / 3000 < 0.2, kept.toString)
    // layout independence: same rows under a different partitioning
    val repart = Sampling.mixtureSample(docs.repartition(7), $"src", $"id", $"ntok",
      Map("s0" -> 1000000L, "s1" -> 10000L, "s2" -> 3000L))
      .select($"id").as[Long].collect().toSet
    assert(out.select($"id").as[Long].collect().toSet == repart)
    // a positive sub-granularity budget keeps ≥ 0 rows via the 1-granule
    // floor instead of failing or silently zeroing
    val tiny = Sampling.mixtureSample(docs, $"src", $"id", $"ntok", Map("s1" -> 1L))
    assert(tiny.count() <= 5, "one hash granule keeps ~1/65536 of rows")
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

  test("systematicSample: equals the driver grid replay, exactly k picks") {
    val rng = new scala.util.Random(31)
    val data = (0L until 800L).map(i => (i, 1L + rng.nextInt(200).toLong))
    val df = data.toDF("id", "w").repartition(11) // layout must not matter
    val k = 37
    val got = Sampling.systematicSample(df, "id", "w", k)
      .select($"id", $"picks").as[(Long, Long)].collect().sortBy(_._1)
    // driver replay of the grid rule on the exact cumulative line
    val w0 = data.map(_._2).sum
    var cum = 0L
    val ref = data.flatMap { case (id, w) =>
      val lo = cum * k / w0; val hi = (cum + w) * k / w0; cum += w
      if (hi > lo) Some((id, hi - lo)) else None
    }
    assert(got.toSeq == ref)
    // no row outweighs a bucket here → exactly k selections total
    assert(got.map(_._2).sum == k.toLong)
  }

  test("systematicSample: a heavier-than-bucket row absorbs several picks") {
    val data = Seq((0L, 10L), (1L, 1000L), (2L, 10L), (3L, 20L))
    val got = Sampling.systematicSample(data.toDF("id", "w"), "id", "w", 10)
      .select($"id", $"picks").as[(Long, Long)].collect().toMap
    assert(got(1L) >= 9L)          // the 96%-weight row owns ~all buckets
    assert(got.values.sum == 10L)  // boundaries are conserved regardless
  }

  test("systematicSample drops zero weights and refuses W < k") {
    val df = Seq((0L, 5L), (1L, 0L), (2L, 5L)).toDF("id", "w")
    val got = Sampling.systematicSample(df, "id", "w", 2)
      .select($"id").as[Long].collect()
    assert(!got.contains(1L))
    intercept[IllegalArgumentException](
      Sampling.systematicSample(df, "id", "w", 11).collect())
  }

  test("kfold: deterministic, layout-independent, covers all folds, driver ≡") {
    val ids = (1L to 400L).toSeq
    val a = Sampling.kfold(ids.toDF("id"), col("id"), 4)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    val b = Sampling.kfold(ids.toDF("id").repartition(13), col("id"), 4)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSet == Set(0L, 1L, 2L, 3L))
    // driver replay of the hex-digit rule
    val md = java.security.MessageDigest.getInstance("MD5")
    ids.foreach { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val fold = "0123456789abcdef".indexOf(hex.charAt(0)) % 4
      assert(a(id) == fold.toLong, s"id $id")
    }
    // roughly balanced (hex digit is uniform)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    sizes.values.foreach(s => assert(s > 60 && s < 140))
    intercept[IllegalArgumentException](
      Sampling.kfold(ids.toDF("id"), col("id"), 5))
  }

  test("weightedReservoir: matches a direct ES top-k, layout-independent") {
    val rows = (1 to 300).map(i => (i.toLong, (i % 7 + 1).toDouble * 10.0))
    // independent computation: same hash-uniform, same key, plain Scala
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = rows.map { case (id, w) =>
      val u = (java.lang.Long.parseLong(md5hex(id.toString).take(13), 16)
        .toDouble + 0.5) / 4503599627370496.0
      (id, w, math.log(u) / w)
    }.sortBy(t => (-t._3, t._1)).take(25).map(_._1)
    Seq(1, 7, 32).foreach { p =>
      val got = Sampling.weightedReservoir(
          rows.toDF("id", "w").repartition(p), "id", "w", k = 25)
        .select("id").as[Long].collect().toSeq
      assert(got == expect, s"partitions=$p")
    }
  }

  test("weightedReservoir: heavier weight can only improve a row's rank") {
    val base = (1 to 100).map(i => (i.toLong, 10.0))
    val keyOf = Sampling.weightedReservoir(base.toDF("id", "w"), "id", "w", 100)
      .select("id", "es_key").as[(Long, Double)].collect().toMap
    // bump one row's weight 100x: its es_key must strictly rise (ln u < 0)
    val bumped = base.map { case (id, w) => (id, if (id == 42L) w * 100 else w) }
    val keyOf2 = Sampling.weightedReservoir(bumped.toDF("id", "w"), "id", "w", 100)
      .select("id", "es_key").as[(Long, Double)].collect().toMap
    assert(keyOf2(42L) > keyOf(42L))
    assert(keyOf2(7L) == keyOf(7L)) // untouched rows keep their keys
    // non-positive weights and null ids drop
    val r = Sampling.weightedReservoir(
      Seq((1L, 0.0), (2L, -3.0), (3L, 5.0)).toDF("id", "w"), "id", "w", 10)
    assert(r.count() == 1L)
  }
}
