package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog with metadata registration (SURVEY §2.1 S4/S5): the
  * reference's `createTablesWithMeta` (`utils.scala:162-171`) overwrite-saves
  * a frame as a named table AND appends a (tableName, tableDescription,
  * time_stamp) row to `myPhdStatisticsMetaData` by reading the metadata
  * table, unioning, and overwriting it *in the same plan* — safe only on
  * Delta snapshots, a corruption hazard on plain parquet
  * (SURVEY §7.4 "metadata self-overwrite"). The engine materializes the
  * previous snapshot (collect — the metadata table is rows-per-table tiny)
  * before the overwrite: same observable behavior, safe mechanism.
  */
class Catalog(spark: SparkSession, metaTable: String = "myPhdStatisticsMetaData") {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  /** S5 — save `frame` as `tableName` (overwrite, mergeSchema) and register
    * the metadata row. */
  def createTableWithMeta(tableName: String, description: String, frame: DataFrame): Unit = {
    frame.write.mode(SaveMode.Overwrite)
      .option("mergeSchema", "true")
      .saveAsTable(tableName)
    val newRow = Seq((tableName, description)).toDF("tableName", "tableDescription")
      .withColumn("time_stamp", current_timestamp())
    val prior =
      if (spark.catalog.tableExists(metaTable))
        // materialize before overwriting the same table (driver-side; tiny)
        Some(spark.createDataFrame(
          spark.table(metaTable).collect().toSeq.asJava,
          spark.table(metaTable).schema))
      else None
    val all = prior.map(_.unionByName(newRow)).getOrElse(newRow)
      // latest registration wins per table name, like repeated runs in the
      // reference accumulate (it never dedups; we keep every row for parity)
    all.write.mode(SaveMode.Overwrite).saveAsTable(metaTable)
  }

  /** S4 — read a registered table. */
  def table(name: String): DataFrame = spark.table(name)

  /** The metadata frame itself. */
  def metadata: DataFrame = spark.table(metaTable)
}
