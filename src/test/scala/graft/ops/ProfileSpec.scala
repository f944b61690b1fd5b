package graft.ops

import graft.SparkSpec

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
}
