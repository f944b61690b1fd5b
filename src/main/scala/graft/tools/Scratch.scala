package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch microbench (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.codegen.maxFields", "1024")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val o = graft.Tables.orders(spark, dir).select(
      ((col("o_totalprice") > 250000) =!= (col("o_orderpriority") === "1-URGENT"))
        .cast("double").as("label"),
      col("o_totalprice"),
      (col("o_orderpriority") === "1-URGENT").cast("double").as("is_urgent"),
      year(col("o_orderdate")).cast("double").as("order_year"),
      col("o_orderkey"))
    o.count()
    val h1 = substring(md5(col("o_orderkey").cast("string")), 1, 1)
    val isTest = h1 < lit("5")
    val feats = Seq("o_totalprice", "is_urgent", "order_year")
    var s1: graft.ml.TreeScorer.TreeSpec = null
    var s2: graft.ml.TreeScorer.TreeSpec = null
    (1 to 3).foreach { i =>
      time(s"fit-asis $i") {
        s1 = graft.ml.CohortClassifier.fitTreeSpec(
          o.where(!isTest), feats, "label", maxDepth = 4) }
      time(s"fit-spread $i") {
        s2 = graft.ml.CohortClassifier.fitTreeSpec(
          o.where(!isTest).repartition(32), feats, "label", maxDepth = 4) }
      println(s"SPEC-EQUAL $i: ${s1 == s2}")
    }
    spark.stop()
  }
}
