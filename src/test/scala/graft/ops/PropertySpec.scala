package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks from SURVEY §5: grouping-set rewrite ≡ the
  * reference's window+distinct original, duplication-invariance of the
  * cross-join rewrite, countTrues ≡ filter-count, permutation-p bounds.
  * (Generators sampled directly — the scalatest/scalacheck bridge artifact
  * isn't in the offline cache.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    samples(g, n).foreach(body)

  private val smallFrame = for {
    n <- Gen.choose(1, 25)
    rows <- Gen.listOfN(n, for {
      cat <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-50.0, 50.0)
    } yield (cat, math.rint(v * 4) / 4))
  } yield rows

  test("summarize ≡ window-aggregate + distinct on random frames") {
    forAll(smallFrame, 8) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("cat", "v")
        val engine = Summarize.summarize(df, Seq(AggSpec.sum, AggSpec.max),
          Seq("v" -> "v"), Seq("cat" -> "C"))
          .where($"Division" === "C")
          .collect().map(r => (r.getString(1), r.getString(2), r.getDouble(3))).toSet
        val reference = Seq("sum" -> sum($"v"), "max" -> max($"v")).map {
          case (name, agg) =>
            df.select($"cat".cast("string"), lit(name).as("aggregation"),
              agg.over(org.apache.spark.sql.expressions.Window.partitionBy($"cat"))
                .cast("double").as("v"))
              .distinct()
              .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        }.reduce(_ ++ _).toSet
        assert(engine == reference)
      }
    }
  }

  test("crossCohortAgg invariant under row duplication (the J1 soundness property)") {
    forAll(smallFrame, 8) { rows =>
      if (rows.nonEmpty) {
        val left = rows.toDF("cat", "v")
        val right = Seq(("x", 1.0), ("y", 9.0)).toDF("cat", "v")
        val aggs = Seq((AggSpec.median, "v", "m"), (AggSpec.min, "v", "lo"),
          (AggSpec.max, "v", "hi"))
        val once = Cohort.crossCohortAgg(left, aggs, right,
          Seq((AggSpec.max, "v", "rhi"))).collect().toSeq
        // duplicating every left row (what a literal cross join does to the
        // right side and vice versa) must not change the aggregates
        val dup = Cohort.crossCohortAgg(left.union(left), aggs, right,
          Seq((AggSpec.max, "v", "rhi"))).collect().toSeq
        assert(once == dup)
      }
    }
  }

  test("countTrues equals filter-count on random boolean columns") {
    forAll(Gen.listOf(Gen.option(Gen.oneOf(true, false))), 10) { bs =>
      if (bs.nonEmpty) {
        val df = bs.toDF("b")
        val viaAgg = Summarize.summarize(df, Seq(AggSpec.countTrues),
          Seq("b" -> "b"), Seq.empty).collect().head.getDouble(3)
        val viaFilter = df.where($"b" === true).count().toDouble
        assert(viaAgg == viaFilter)
      }
    }
  }

  test("permutation p always in [0,1] and symmetric in group order") {
    import graft.stats.PermutationTest
    forAll(Gen.zip(Gen.listOfN(6, Gen.choose(-10.0, 10.0)),
      Gen.listOfN(5, Gen.choose(-10.0, 10.0))), 10) { case (a, b) =>
      val p1 = PermutationTest.twoSided(a.toArray, b.toArray, nPerm = 99, seed = 3)
      val p2 = PermutationTest.twoSided(b.toArray, a.toArray, nPerm = 99, seed = 3)
      assert(p1 >= 0.0 && p1 <= 1.0)
      assert(math.abs(p1 - p2) < 1e-12) // exact path: fully symmetric
    }
  }
}
