package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // fresh warehouse per JVM: bucketed saveAsTable must not land in cwd
      // nor collide with a previous run's in-memory-catalog leftovers
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet footers, shuffle machinery) so the
    // first measured query doesn't absorb startup cost
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // optional comma-separated subset for isolated perf work (dev only —
    // the driver runs the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // (name, seconds, succeeded) — failed queries are reported as "error"
    // and excluded from the total so a broken query can't shrink the number.
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case t: Throwable => System.err.println(s"BENCH FAIL $name: $t"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // The per-query map (~2.4 KB for 80+ queries) overflows the consumer's
    // fixed-size tail capture, so it goes to a side file; the final stdout
    // line carries only the short total record plus a pointer to that file.
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) fmt(v) else "\"error\"")
    }.mkString("{", ",", "}")
    // a failed side-file write (read-only cwd, bad override path) must not
    // take the metric line down with it — fall back to the temp dir
    val queriesFile = {
      val primary = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "bench_queries.json")).toAbsolutePath
      val bytes = qs.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      try { java.nio.file.Files.write(primary, bytes); primary }
      catch { case _: java.io.IOException =>
        val alt = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "bench_queries.json")
        try { java.nio.file.Files.write(alt, bytes); alt }
        catch { case _: java.io.IOException => primary /* report intent */ }
      }
    }
    // total = sum of the ROUNDED per-query values so it cross-checks exactly
    // against the side file's entries
    val total = results.filter(_._3).map(r => fmt(r._2).toDouble).sum
    val nFailed = results.count(!_._3)
    // any failure invalidates the run: value:null so consumers comparing the
    // total alone can't mistake a smaller (incomplete) sum for a speedup
    val value = if (nFailed > 0) "null" else fmt(total)
    // stop Spark BEFORE emitting the metric so shutdown logging cannot land
    // after it: the JSON must be the final stdout line for tail capture
    spark.stop()
    println(s"""{"metric":"total","value":$value,"unit":"sec","failed":$nFailed,"sf":"$sfDir","queries_file":"$queriesFile"}""")
  }
}
