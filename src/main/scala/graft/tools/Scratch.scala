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
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("SCRATCH_MAXFIELDS", "100"))
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val o0 = graft.Tables.orders(spark, dir)
    o0.count()
    val o = o0.where(col("o_totalprice").isNotNull &&
      col("o_orderpriority").isNotNull && col("o_orderstatus").isNotNull)
    val y = col("o_totalprice")
    val xsA = Seq("1", "2", "3", "4").map(l => (s"a_$l",
      (substring(col("o_orderpriority"), 1, 1) === l).cast("int")))
    val xsB = Seq("F", "O").map(l => (s"b_$l",
      (col("o_orderstatus") === l).cast("int")))
    val xsAB = for { (an, ac) <- xsA; (bn, bc) <- xsB }
      yield (s"${an}_$bn", (ac * bc))
    val xsFull = xsA ++ xsB ++ xsAB
    val R = graft.stats.Regression
    (1 to 3).foreach { i =>
      time(s"olsMoments-plan $i") { R.olsMoments(o, y, xsFull) }
      time(s"olsMoments-collect $i") { R.olsMoments(o, y, xsFull).head() }
      time(s"olsMoments-checkpoint $i") {
        R.olsMoments(o, y, xsFull).localCheckpoint().head() }
      time(s"full-r76 $i") {
        graft.SparkEntry.queries("r76_two_way_anova")(spark, dir).count() }
    }
    spark.stop()
  }
}
