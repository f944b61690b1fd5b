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
    val li = graft.Tables.lineitem(spark, dir)
    li.count()
    val valueCol = "l_extendedprice"; val groupCol = "l_returnflag"
    (1 to 3).foreach { i =>
      val proj = li.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
        .select(col(groupCol).cast("string").as("grp"),
          (col(valueCol).cast("decimal(12,2)") * 200).cast("long").as("v2"))
      time(s"cells-partialagg $i") {
        proj.groupBy(col("grp"), col("v2")).agg(count(lit(1)).as("c"))
          .write.format("noop").mode("overwrite").save() }
      time(s"cells-repart-first $i") {
        proj.repartition(32, col("grp"), col("v2"))
          .groupBy(col("grp"), col("v2")).agg(count(lit(1)).as("c"))
          .write.format("noop").mode("overwrite").save() }
      time(s"cells-spread-rr $i") {
        proj.repartition(32)
          .groupBy(col("grp"), col("v2")).agg(count(lit(1)).as("c"))
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
