package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables / object-store paths; the
  * single-directory layout here mirrors `/root/testdata/sf*`. Reads go through
  * `spark.read.parquet` so Catalyst gets full pushdown (filters, column
  * pruning, partition pruning) into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a scan across all cores for CPU-bound per-row work. A single
    * small parquet file arrives as ONE input split, serializing e.g. a
    * 64-hash MinHash signature pass onto one thread; at real scale inputs
    * come pre-split, but compute-heavy stages must never inherit accidental
    * single-partition layouts. The shuffle this inserts moves only the
    * scanned columns and is amortized by the downstream per-row work. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** [[spread]] only when the plan would otherwise run on materially fewer
    * partitions than the session parallelism — the scale-adaptive form: a
    * single-file local scan (1 split) gets fanned out, while a pre-split
    * production input (partitions ≥ cores) passes through untouched, so
    * the repartition can never become a pointless full-data shuffle at
    * scale. Use on a NARROW projection so the inserted shuffle moves only
    * the columns the downstream aggregate needs (guide: project before
    * the exchange). */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  /** Scale-adaptive fan-out for a `groupBy(keys)` whose key space barely
    * collapses (value-level cells ≈ input rows, so map-side partial
    * aggregation buys nothing): when the input arrived as a single local
    * split, hash-repartition it on the GROUP KEYS at the session shuffle
    * partition count — `EnsureRequirements` then recognises the
    * partitioning and the aggregate runs 32-way behind ONE exchange with
    * no single-core partial-agg hash build. On a pre-split production
    * input this is a no-op and the groupBy keeps its normal partial-agg
    * plan (the safe default when keys DO collapse). */
  def spreadForGroupBy(df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target)
      df.repartition(
        df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** Normalize the events `ts` column to plain TimestampType whatever the
    * parquet generation stored:
    *  - TIMESTAMP(NANOS) reads as a raw long under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` → integer DIV to µs
    *    (not double division: ns epochs ~1.7e18 exceed double's mantissa);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ in
    *    a session that infers NTZ (our sessions set
    *    `spark.sql.parquet.inferTimestampNTZ.enabled=false`, so this branch
    *    only fires under a FOREIGN session, e.g. the driver's smoke check)
    *    → cast, which under the UTC session timezone preserves the wall
    *    clock as the same instant unix_micros/epoch_us agree on. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
