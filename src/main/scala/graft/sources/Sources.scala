package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY §2.1 S1-S10).
  *
  * The reference reads tab-delimited CSV with header + inferSchema
  * (`utils.scala:30-37,43-50`) and writes single-file TSV via `coalesce(1)`
  * (`studyGrScalaA.scala:125`). Inference costs an extra pass over every
  * file and is nondeterministic across dirty data, so the engine keeps it
  * behind a flag and prefers explicit schemas (SURVEY §7.4).
  */
object Sources {

  /** S1/S2 — TSV import. With `schema` given, single-pass deterministic read;
    * otherwise reference-style inference (two passes). */
  def readTsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.format("csv")
      .option("header", "true")
      .option("delimiter", "\t")
    schema match {
      case Some(s) => base.schema(s).load(path)
      case None => base.option("inferSchema", "true").load(path)
    }
  }

  /** S6 — single-file TSV sink (`coalesce(1)` + header + tab). The
    * single-file collapse is the reference's interchange requirement; at
    * scale pass `singleFile = false` to keep natural partitioning. */
  def writeTsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("header", "true")
      .option("delimiter", "\t")
      .csv(path)
  }

  /** JSON-lines source (extension): schema'd single-pass read, or inference
    * (which scans every file once extra — same trade-off as TSV). */
  def readJsonl(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None => spark.read.json(path)
    }

  /** JSON-lines sink (extension). `singleFile` mirrors [[writeTsv]]. */
  def writeJsonl(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(path)
  }

  /** ORC source (extension): Spark-native columnar alternative to parquet —
    * schema'd reads skip footer inference; predicate pushdown and column
    * pruning work exactly as for parquet (the ORC reader publishes the
    * same stats surface). */
  def readOrc(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).orc(path)
      case None => spark.read.orc(path)
    }

  /** ORC sink (extension). `singleFile` mirrors [[writeTsv]]. */
  def writeOrc(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").orc(path)
  }

  /** S7 — local rows → DataFrame (no RDD detour; `studyGrScalaA.scala:182`
    * parallelizes first for no benefit). */
  def fromRows(spark: SparkSession, rows: Seq[Seq[Any]], schema: StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row.fromSeq(r)).asJava, schema)
  }
}
