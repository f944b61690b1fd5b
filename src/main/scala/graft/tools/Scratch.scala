package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch microbench (not part of the engine surface).
  * Currently: SPEC-EQUAL check for the m21/m22/m23 input pin — does
  * `localCheckpoint()` on the shared `o` projection change any fitted
  * MLlib tree? It must NOT: the checkpoint materializes the SAME
  * partitions in the SAME row order, and MLlib's findSplits sampling is
  * a pure function of (seed, partitionIndex, row order). A FAIL here
  * means the pin is NOT result-identical and must not ship. */
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
    val o = graft.Tables.load(spark, dir, "orders").select(
      ((col("o_totalprice") > 250000) =!= (col("o_orderpriority") === "1-URGENT"))
        .cast("double").as("label"),
      col("o_totalprice"),
      (col("o_orderpriority") === "1-URGENT").cast("double").as("is_urgent"),
      year(col("o_orderdate")).cast("double").as("order_year"),
      col("o_orderkey"))
    val h1 = substring(md5(col("o_orderkey").cast("string")), 1, 1)
    val h2 = substring(md5(col("o_orderkey").cast("string")), 2, 1)
    val isTest = h1 < lit("5")
    val gates = Seq(("25", h2 < lit("4")), ("50", h2 < lit("8")),
      ("100", lit(true)))
    val feats = Seq("o_totalprice", "is_urgent", "order_year")
    val pinned = o.localCheckpoint()
    println(s"partitions unpinned=${o.rdd.getNumPartitions} " +
      s"pinned=${pinned.rdd.getNumPartitions}")
    var ok = true
    gates.foreach { case (pct, gate) =>
      val a = graft.ml.CohortClassifier.fitTreeSpec(
        o.where(!isTest && gate), feats, "label", maxDepth = 4)
      val b = graft.ml.CohortClassifier.fitTreeSpec(
        pinned.where(!isTest && gate), feats, "label", maxDepth = 4)
      val eq = a == b
      ok &&= eq
      println(s"SPEC-EQUAL pct=$pct: $eq")
      if (!eq) { println(s"  unpinned: $a"); println(s"  pinned:   $b") }
    }
    println(if (ok) "SPEC-EQUAL: ALL PASS" else "SPEC-EQUAL: FAIL")
    spark.stop()
  }
}
