package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // planted two-class mixture: matches agree on most fields, non-matches
  // agree by chance — EM should separate them from the pattern frame alone
  private def plantedPairs(nMatch: Int, nNon: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    val rows = Seq.fill(nMatch) {
      (rng.nextDouble() < 0.95, rng.nextDouble() < 0.9, rng.nextDouble() < 0.85)
    } ++ Seq.fill(nNon) {
      (rng.nextDouble() < 0.10, rng.nextDouble() < 0.2, rng.nextDouble() < 0.15)
    }
    rows.toDF("c1", "c2", "c3")
  }

  private val comparators = Seq(
    "g1" -> col("c1"), "g2" -> col("c2"), "g3" -> col("c3"))

  test("agreementPatternDF: bounded frame, counts partition the pair stream") {
    val df = plantedPairs(500, 4500, seed = 7).repartition(6)
    val pat = Linkage.agreementPatternDF(df, comparators).collect()
    assert(pat.length <= 8)
    assert(pat.map(_.getLong(3)).sum == 5000L)
  }

  test("emFit: recovers the planted mixture and is layout-proof") {
    val df = plantedPairs(2000, 18000, seed = 11)
    val pat = Linkage.agreementPatternDF(df.repartition(5), comparators)
    val fit = Linkage.emFit(pat, comparators.map(_._1))
    assert(fit.converged)
    // prevalence ~0.1, match probs high, chance probs low (EM tolerance
    // is loose — the classes just have to land on the right side)
    assert(fit.p > 0.02 && fit.p < 0.35, s"p=${fit.p}")
    fit.m.zip(fit.u).zipWithIndex.foreach { case ((mi, ui), i) =>
      assert(mi > ui + 0.2, s"field $i: m=$mi u=$ui")
    }
    // bit-deterministic on any partitioning
    val fits = Seq(1, 3, 17).map { np =>
      Linkage.emFit(
        Linkage.agreementPatternDF(df.repartition(np), comparators),
        comparators.map(_._1))
    }
    assert(fits.forall(f => f.p == fits.head.p &&
      f.m.sameElements(fits.head.m) && f.u.sameElements(fits.head.u)))
  }

  test("scoreDF: weights/posteriors replay the fit; decisions follow thresholds") {
    val df = plantedPairs(2000, 18000, seed = 13).repartition(4)
    val pat = Linkage.agreementPatternDF(df, comparators)
    val fit = Linkage.emFit(pat, comparators.map(_._1))
    val r = Linkage.scoreDF(pat, comparators.map(_._1), fit).collect()
    r.foreach { row =>
      val g = (0 to 2).map(row.getLong)
      val w = g.zipWithIndex.map { case (gi, i) =>
        if (gi == 1L) math.log(fit.m(i) / fit.u(i))
        else math.log((1.0 - fit.m(i)) / (1.0 - fit.u(i)))
      }.reduceLeft(_ + _)
      assert(math.abs(row.getDouble(4) - w) < 1e-6)
      var pm = fit.p; var pu = 1.0 - fit.p
      g.zipWithIndex.foreach { case (gi, i) =>
        pm *= (if (gi == 1L) fit.m(i) else 1.0 - fit.m(i))
        pu *= (if (gi == 1L) fit.u(i) else 1.0 - fit.u(i))
      }
      val post = pm / (pm + pu)
      assert(math.abs(row.getDouble(5) - post) < 1e-6)
      val want = if (post >= 0.9) "match" else if (post >= 0.1) "possible"
        else "non_match"
      assert(row.getString(6) == want)
    }
    // the all-agree pattern must score as a match, all-disagree as non-match
    val byPat = r.map(row =>
      ((0 to 2).map(row.getLong).toList, row.getString(6))).toMap
    assert(byPat.get(List(1L, 1L, 1L)).forall(_ == "match"))
    assert(byPat.get(List(0L, 0L, 0L)).forall(_ == "non_match"))
  }
}
