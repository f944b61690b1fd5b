package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("TSV round-trip: single-file write, schema'd and inferred reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tsv").toString + "/out"
    val df = Seq(("ała", 1, 2.5), ("b", 2, 3.5)).toDF("name", "n", "x")
    Sources.writeTsv(df, dir)
    // exactly one part file (coalesce(1), reference interchange format)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val schema = StructType(Seq(StructField("name", StringType),
      StructField("n", IntegerType), StructField("x", DoubleType)))
    val back = Sources.readTsv(spark, dir, Some(schema))
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    val inferred = Sources.readTsv(spark, dir)
    assert(inferred.schema("n").dataType == IntegerType) // inference worked
  }

  test("JSON-lines round-trip: schema'd and inferred reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/out"
    val df = Seq(("ała", 1, 2.5), ("b", 2, 3.5)).toDF("name", "n", "x")
    Sources.writeJsonl(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val schema = StructType(Seq(StructField("name", StringType),
      StructField("n", IntegerType), StructField("x", DoubleType)))
    val back = Sources.readJsonl(spark, dir, Some(schema))
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    val inferred = Sources.readJsonl(spark, dir)
    assert(inferred.schema("n").dataType == LongType) // JSON integers infer long
  }

  test("ORC round-trip preserves types, values, and nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, Some(2.5), "a"), (2L, None, "b"),
      (3L, Some(-0.25), null)).toDF("id", "x", "s")
    Sources.writeOrc(df, dir)
    val back = Sources.readOrc(spark, dir)
    // file sources re-read everything as nullable; names/types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    // schema'd read pins types without footer inference
    val pinned = Sources.readOrc(spark, dir, Some(df.schema))
    assert(pinned.count() == 3)
  }

  test("fromRows builds a frame without an RDD detour") {
    val schema = StructType(Seq(StructField("divisionName", StringType),
      StructField("listOfColumnNames", ArrayType(StringType))))
    val df = Sources.fromRows(spark,
      Seq(Seq("imaging", Seq("a", "b")), Seq("labs", Seq("c"))), schema)
    assert(df.count() == 2)
    assert(df.where($"divisionName" === "imaging")
      .select("listOfColumnNames").as[Seq[String]].head() == Seq("a", "b"))
  }
}
