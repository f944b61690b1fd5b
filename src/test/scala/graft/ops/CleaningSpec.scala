package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("advancedCasting casts listed columns, preserves order and others") {
    val df = Seq(("1,5", "x", "3"), ("2,25", "y", "4")).toDF("a", "b", "c")
    val out = Cleaning.commaDecimalToDouble(df, Seq("a"))
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.schema("a").dataType == DoubleType)
    assert(out.select("a").as[Double].collect().toSeq == Seq(1.5, 2.25))
    assert(out.select("b").as[String].collect().toSeq == Seq("x", "y"))
  }

  test("booleanFromString: trueString→true, other→false, null→null") {
    val df = Seq(Some("prawda"), Some("PRAWDA"), Some(""), Some("nie"), None)
      .toDF("flag")
    val out = Cleaning.booleanFromString(df, "prawda", Seq("flag"))
    assert(out.schema("flag").dataType == BooleanType)
    assert(out.as[Option[Boolean]].collect().toSeq ==
      Seq(Some(true), Some(true), Some(false), Some(false), None))
  }

  test("booleanFromInt casts 0/1 to boolean") {
    val df = Seq(Some(1), Some(0), None).toDF("b")
    val out = Cleaning.booleanFromInt(df, Seq("b"))
    assert(out.as[Option[Boolean]].collect().toSeq ==
      Seq(Some(true), Some(false), None))
  }

  test("castToDate parses ISO dates") {
    val df = Seq("2024-01-31", "bogus").toDF("d")
    val out = Cleaning.castToDate(df, Seq("d"))
    assert(out.schema("d").dataType == DateType)
    val got = out.as[Option[java.sql.Date]].collect()
    assert(got(0).contains(java.sql.Date.valueOf("2024-01-31")))
    assert(got(1).isEmpty)
  }

  test("renameByMap and renameByIndex rename in one projection") {
    val df = Seq((1, 2, 3)).toDF("x", "y", "z")
    assert(Cleaning.renameByMap(df, Map("y" -> "why")).columns.toSeq ==
      Seq("x", "why", "z"))
    assert(Cleaning.renameByIndex(df, Map(0 -> "first", 2 -> "third")).columns.toSeq ==
      Seq("first", "y", "third"))
  }

  test("selectRenamed projects with aliases") {
    val df = Seq((1, "a")).toDF("n", "s")
    val out = Cleaning.selectRenamed(df, Seq("s" -> "label", "n" -> "num"))
    assert(out.columns.toSeq == Seq("label", "num"))
  }
}
