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
