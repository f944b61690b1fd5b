package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EpiSpec extends SparkSpec {
  import spark.implicits._

  test("simpsonAuditDF: the kidney-stone flip — both strata oppose the pool") {
    // classic: treatment better in BOTH strata, worse pooled
    def rows(s: Long, e: Boolean, o: Boolean, n: Int) =
      Seq.fill(n)((s, e, o))
    val df = (rows(1L, true, true, 81) ++ rows(1L, true, false, 6) ++
      rows(1L, false, true, 234) ++ rows(1L, false, false, 36) ++
      rows(2L, true, true, 192) ++ rows(2L, true, false, 71) ++
      rows(2L, false, true, 55) ++ rows(2L, false, false, 25))
      .toDF("s", "e", "o").repartition(4)
    val r = Epi.simpsonAuditDF(df, col("s"), col("e"), col("o"))
      .as[(Long, Long, Long, Long, Long, Int, Int, Boolean)]
      .collect().sortBy(_._1)
    assert(r.length == 2)
    assert(r(0) == ((1L, 81L, 6L, 234L, 36L, 1, -1, true)), r(0).toString)
    assert(r(1) == ((2L, 192L, 71L, 55L, 25L, 1, -1, true)), r(1).toString)
  }

  test("dersimonianLairdDF: two-study hand case matches a direct fold") {
    def rows(s: String, e: Boolean, o: Boolean, n: Int) =
      Seq.fill(n)((s, e, o))
    val df = (rows("s1", true, true, 10) ++ rows("s1", true, false, 5) ++
      rows("s1", false, true, 4) ++ rows("s1", false, false, 10) ++
      rows("s2", true, true, 3) ++ rows("s2", true, false, 12) ++
      rows("s2", false, true, 9) ++ rows("s2", false, false, 5))
      .toDF("s", "e", "o").repartition(4)
    val r = Epi.dersimonianLairdDF(df, "s", col("e"), col("o"))
      .collect().sortBy(_.getString(0))
    assert(r.length == 2)
    // independent direct fold (no windows): same formulas, plain Scala
    val cells = Seq(("s1", 10.0, 5.0, 4.0, 10.0), ("s2", 3.0, 12.0, 9.0, 5.0))
    val yv = cells.map { case (_, a, b, c, d) =>
      val (ah, bh, ch, dh) = (a + 0.5, b + 0.5, c + 0.5, d + 0.5)
      (math.log(ah * dh / (bh * ch)), 1 / ah + 1 / bh + 1 / ch + 1 / dh)
    }
    val w = yv.map(t => 1.0 / t._2)
    val sw = w.sum; val swy = w.zip(yv).map(t => t._1 * t._2._1).sum
    val swy2 = w.zip(yv).map(t => t._1 * t._2._1 * t._2._1).sum
    val sw2 = w.map(x => x * x).sum
    val q = swy2 - swy * swy / sw
    val tau2 = math.max(0.0, (q - 1.0) / (sw - sw2 / sw))
    val wr = yv.map(t => 1.0 / (t._2 + tau2))
    val re = wr.zip(yv).map(t => t._1 * t._2._1).sum / wr.sum
    val last = r(1)
    assert(math.abs(last.getDouble(5) - yv(1)._1) < 1e-5, "y")
    assert(math.abs(last.getDouble(6) - yv(1)._2) < 1e-5, "v")
    assert(math.abs(last.getDouble(7) - q) < 1e-5, "q")
    assert(math.abs(last.getDouble(8) - tau2) < 1e-5, "tau2")
    assert(math.abs(last.getDouble(9) - swy / sw) < 1e-5, "fe_run")
    assert(math.abs(last.getDouble(10) - re) < 1e-5, "re_run")
    assert(math.abs(last.getDouble(11) - 1.0 / math.sqrt(wr.sum)) < 1e-5, "re_se")
    // heterogeneous studies: tau2 strictly positive, RE pulled toward the
    // unweighted mean relative to FE
    assert(last.getDouble(8) > 0.0)
  }

  test("dersimonianLairdDF: homogeneous studies collapse tau2 to 0, RE == FE") {
    val df = (Seq.fill(8)(("a", true, true)) ++ Seq.fill(4)(("a", true, false)) ++
      Seq.fill(4)(("a", false, true)) ++ Seq.fill(8)(("a", false, false)) ++
      Seq.fill(8)(("b", true, true)) ++ Seq.fill(4)(("b", true, false)) ++
      Seq.fill(4)(("b", false, true)) ++ Seq.fill(8)(("b", false, false)))
      .toDF("s", "e", "o").repartition(3)
    val last = Epi.dersimonianLairdDF(df, "s", col("e"), col("o"))
      .collect().maxBy(_.getString(0))
    assert(last.getDouble(8) == 0.0, "tau2")          // Q < k-1 → clamped
    assert(last.getDouble(9) == last.getDouble(10), "fe == re at tau2=0")
  }

  test("simpsonAuditDF: aligned strata are not flipped; zero cross is dir 0") {
    val df = (Seq.fill(4)((1L, true, true)) ++ Seq.fill(4)((1L, false, false)) ++
      Seq.fill(2)((2L, true, true)) ++ Seq.fill(2)((2L, false, false)))
      .toDF("s", "e", "o")
    val r = Epi.simpsonAuditDF(df, col("s"), col("e"), col("o"))
      .select("dir", "pooled_dir", "flipped")
      .as[(Int, Int, Boolean)].collect()
    assert(r.forall(t => t._1 == 1 && t._2 == 1 && !t._3))
    // a stratum with an empty margin: a*d == b*c == 0 → dir 0, not flipped
    val z = Seq((1L, true, true), (1L, false, true))
      .toDF("s", "e", "o")
    val rz = Epi.simpsonAuditDF(z, col("s"), col("e"), col("o"))
      .select("dir", "flipped").as[(Int, Boolean)].head()
    assert(rz == ((0, false)))
  }
}
