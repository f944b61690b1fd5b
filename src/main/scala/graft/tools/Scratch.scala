package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch microbench (not part of the engine surface).
  * Currently: cost of the spread-helpers' `df.rdd.getNumPartitions`
  * planning probe (r12 verdict item 7) — is the per-call tax worth a
  * cache? */
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
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.4f s"); r
    }
    val li = graft.Tables.lineitem(spark, dir)
    // warm: parquet footer, session
    li.count()
    // the probe as the helpers run it, on a fresh narrow projection each
    // time (each bench pass builds a fresh DF → fresh QueryExecution)
    (1 to 3).foreach { round =>
      time(s"probe x10 round $round") {
        (1 to 10).foreach { i =>
          val cents = li.select((col("l_extendedprice").cast("decimal(12,2)")
            * 100).cast("long").as("_c"))
          cents.rdd.getNumPartitions: Unit
        }
      }
    }
    // same but via queryExecution.toRdd (no deserializer attachment)
    (1 to 2).foreach { round =>
      time(s"toRdd x10 round $round") {
        (1 to 10).foreach { i =>
          val cents = li.select((col("l_extendedprice").cast("decimal(12,2)")
            * 100).cast("long").as("_t"))
          cents.queryExecution.toRdd.getNumPartitions: Unit
        }
      }
    }
    spark.stop()
  }
}
