package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the join/exchange/window skeleton of named
  * `SparkEntry` queries so plan regressions (a banded join degrading to a
  * nested loop, an unexpected extra shuffle) are visible without the UI.
  *
  * Usage: `sbt "runMain graft.tools.ExplainQ <sfDir> <query>[,<query>...]"`
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_FULL=1 prints the whole executed plan instead of the skeleton
    val full = sys.env.get("SPARK_GRAFT_FULL").contains("1")
    try names.foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(s"== $n")
      if (full) println(plan)
      else plan.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Window") || l.contains("Cartesian"))
        .foreach(l => println("  " + l.trim.take(160)))
    } finally spark.stop()
  }
}
