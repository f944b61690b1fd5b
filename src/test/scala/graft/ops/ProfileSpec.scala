package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, distincts, extrema, deterministic mode") {
    val df = Seq(
      (Some("b"), Some(2)), (Some("a"), Some(2)), (Some("a"), None),
      (None, Some(1)), (Some("c"), Some(2)), (Some("a"), Some(3)))
      .toDF("s", "k")
    val rows = Profile.profile(df, Seq("s", "k"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    val s = rows("s")
    assert(s._2 == 6L && s._3 == 5L && s._4 == 3L)       // rows, nonnull, distinct
    assert(s._5 == "a" && s._6 == "c")                   // extrema
    assert(s._7 == "a" && s._8 == 3L)                    // mode
    val k = rows("k")
    assert(k._2 == 6L && k._3 == 5L && k._4 == 3L)
    assert(k._5 == "1" && k._6 == "3")
    assert(k._7 == "2" && k._8 == 3L)
  }

  test("profile: mode ties break to the SMALLEST value (layout-proof)") {
    // two values tie at count 2 — the smaller string must win on any layout
    val df = Seq("y", "x", "y", "x", "z").toDF("v").repartition(5)
    val r = Profile.profile(df, Seq("v"))
      .as[(String, Long, Long, Long, String, String, String, Long)].head()
    assert(r._7 == "x" && r._8 == 2L)
  }

  test("profile: all-null column reports zero distincts and null mode") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("k", "v")
    val r = Profile.profile(df, Seq("v"))
      .as[(String, Long, Long, Long, Option[String], Option[String],
        Option[String], Long)].head()
    assert(r._2 == 2L && r._3 == 0L && r._4 == 0L)
    assert(r._5.isEmpty && r._6.isEmpty && r._7.isEmpty && r._8 == 0L)
  }

  test("benford: digit census, expectation, and chi2 match the driver sweep") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(101)
    // values spanning magnitudes; sub-1 and null rows must drop
    val vals = Seq.fill(2000)(math.pow(10, rng.nextDouble() * 3) + 1.0) ++
      Seq(0.5, 0.99) // dropped: leading zero digits
    val df = (vals.map(Option(_)) :+ None).toDF("x").repartition(5)
    val r = Profile.benfordDF(df, "x").collect()
    val digits = vals.filter(_ >= 1.0)
      .map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toString.head.toString)
    val byD = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = digits.size.toDouble
    var chi2 = 0.0
    r.foreach { row =>
      val d = row.getString(0)
      assert(row.getLong(1) == byD(d), s"digit $d count")
      val e = total * math.log10(1.0 + 1.0 / d.toInt)
      assert(math.abs(row.getDouble(2) - e) < 1e-3)
      chi2 += (byD(d) - e) * (byD(d) - e) / e
      assert(math.abs(row.getDouble(4) - chi2) < 1e-4)
    }
    assert(r.map(_.getString(0)).toSeq == (1 to 9).map(_.toString))
  }

  test("fdDiscovery: holding and violated dependencies, hand-computed") {
    // id → cat holds (each id has one cat); cat → id violated
    // (cat "a" maps to ids 1 and 2); id is also a key for val except
    // id 3 which maps to two vals → id → val violated with 1 extra pair
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"),
      (2L, "a", "y"), (3L, "b", "z"), (3L, "b", "w")).toDF("id", "cat", "v")
    val r = Profile.fdDiscovery(df, Seq("id", "cat", "v"))
      .as[(String, String, Long, Long, Boolean, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    val idCat = r(("id", "cat"))
    assert(idCat._3 == 3L && idCat._4 == 3L && idCat._5 && idCat._6 == 0L
      && idCat._7 == 1.0)
    val catId = r(("cat", "id"))
    assert(catId._3 == 2L && catId._4 == 3L && !catId._5 && catId._6 == 1L)
    val idV = r(("id", "v"))
    assert(idV._3 == 3L && idV._4 == 4L && !idV._5 && idV._6 == 1L
      && idV._7 == 0.75)
    assert(r.size == 6) // all ordered pairs of 3 columns
  }

  test("psiDF: identical cohorts score ~0, a shifted cohort scores high") {
    // i=2v (ref) and i=2v+1 (cur) land in the same bin → identical shares
    val same = (1 to 200).map(i => ((i / 2) % 10 * 10.0, i % 2 == 0))
    val rSame = Profile.psiDF(same.toDF("v", "ref"), "v", functions.col("ref"), 10.0)
      .collect()
    assert(math.abs(rSame.last.getDouble(4)) < 1e-9) // psi_running ≈ 0
    // current cohort shifted two bins up
    val shifted = (1 to 200).map { i =>
      if (i % 2 == 0) (i % 10 * 10.0, true) else (i % 10 * 10.0 + 20.0, false)
    }
    val rShift = Profile.psiDF(shifted.toDF("v", "ref"), "v", functions.col("ref"), 10.0)
      .collect()
    assert(rShift.last.getDouble(4) > 0.25)
    // driver replay of the smoothed-share formula on the shifted case
    val bins = shifted.map { case (v, ref) => (math.floor(v / 10.0).toLong, ref) }
    val ks = bins.map(_._1).distinct.sorted
    val nRef = bins.count(_._2).toDouble; val nCur = bins.count(!_._2).toDouble
    val k = ks.size.toDouble
    val psi = ks.map { b =>
      val p = (bins.count(x => x._1 == b && x._2) + 0.5) / (nRef + k / 2.0)
      val q = (bins.count(x => x._1 == b && !x._2) + 0.5) / (nCur + k / 2.0)
      (p - q) * math.log(p / q)
    }.sum
    assert(math.abs(rShift.last.getDouble(4) - psi) < 1e-5)
  }

  test("psiByPeriodDF: ref period chains to exactly 0, drifted periods rise") {
    // period 1 = ref; period 2 identical distribution; period 3 shifted
    val rows = (1 to 300).flatMap { i =>
      val v = (i % 10) * 10.0
      Seq((1L, v), (2L, v), (3L, v + 30.0))
    }
    val r = Profile.psiByPeriodDF(rows.toDF("p", "v").repartition(7), "v",
      functions.col("p"), 10.0).collect()
    val lastPer = r.groupBy(_.getLong(0)).view
      .mapValues(_.maxBy(_.getLong(1)).getDouble(5)).toMap
    assert(lastPer(1L) == 0.0, "self-drift must chain to exact 0")
    assert(math.abs(lastPer(2L)) < 1e-9, "identical period ≈ 0")
    assert(lastPer(3L) > 0.5, s"shifted period must score, got ${lastPer(3L)}")
    // the grid is complete: every period carries every bin
    val binsPerPeriod = r.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(binsPerPeriod.values.toSet.size == 1)
  }

  test("corrMatrix: driver replay, perfect/anti correlation, pairwise NULLs") {
    val rng = new scala.util.Random(37)
    val rows = Seq.fill(400) {
      val x = rng.nextInt(100) / 4.0
      (x, -2.0 * x + 7.0,                                   // corr = −1
        if (rng.nextInt(5) == 0) None else Some(rng.nextInt(50) / 2.0))
    }
    val df = rows.toDF("x", "y", "z").repartition(6)
    val r = Profile.corrMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(r(("x", "y"))._3 == 400L && r(("x", "y"))._4.get == -1.0)
    // pairwise-complete: (x,z) counts only rows where z is present
    val xz = r(("x", "z"))
    assert(xz._3 == rows.count(_._3.isDefined).toLong)
    // driver replay of the (x,z) fixed tree
    val cc = rows.collect { case (x, _, Some(z)) => (x, z) }
    val n = cc.size.toDouble
    val sx = cc.map(_._1).sum; val sz = cc.map(_._2).sum
    val sxx = cc.map(p => p._1 * p._1).sum
    val szz = cc.map(p => p._2 * p._2).sum
    val sxz = cc.map(p => p._1 * p._2).sum
    val ref = (n * sxz - sx * sz) /
      math.sqrt((n * sxx - sx * sx) * (n * szz - sz * sz))
    assert(math.abs(xz._4.get - ref) < 1e-6)
  }

  test("corrMatrix: constant column yields NULL corr") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b")
    val r = Profile.corrMatrix(df, Seq("a", "b"))
      .as[(String, String, Long, Option[Double])].head()
    assert(r._3 == 3L && r._4.isEmpty)
  }

  test("fdDiscovery: NULLs drop per-pair and don't break other pairs") {
    val df = Seq((Some(1L), Some("a")), (Some(2L), None), (None, Some("b")))
      .toDF("id", "cat")
    val r = Profile.fdDiscovery(df, Seq("id", "cat"))
      .as[(String, String, Long, Long, Boolean, Long, Double)].collect()
    // only the (1,"a") row survives for both directions
    assert(r.forall(t => t._3 == 1L && t._4 == 1L && t._5))
  }

  test("fkAudit: orphans, NULL keys, and clean relations count right") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profile.fkAudit("child.fk->parent", child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Double)].head()
    // 4 child rows: two hit key 1, one orphan (9), one NULL
    assert(r == (("child.fk->parent", 4L, 1L, 1L, 0.25)))
    // duplicate parent keys must not multiply child rows
    val dupParent = Seq(1L, 1L, 2L).toDF("pk")
    val r2 = Profile.fkAudit("x", child, "fk", dupParent, "pk")
      .as[(String, Long, Long, Long, Double)].head()
    assert(r2._2 == 4L && r2._4 == 1L)
  }

  test("pkAudit: dup keys, NULL keys, and multiplicity census") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    val r = Profile.pkAudit("t(k)", df, Seq("k"))
      .as[(String, Long, Long, Long, Long, Long)].head()
    // 6 rows, 2 NULL, keys {1×3, 2×1} → 2 keys, 1 dup, max mult 3
    assert(r == (("t(k)", 6L, 2L, 2L, 1L, 3L)))
  }
}
