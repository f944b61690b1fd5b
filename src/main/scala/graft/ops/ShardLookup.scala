package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-shard driver-computed lookup attachment — the delivery mechanism for
  * the two-phase sharded-global pattern's base maps (exclusive prefix
  * counts, later-shard suffix mins: `FDR.adjustDF`, `FDR.sabhaSelectDF`,
  * `Corpus.chunkMap`).
  *
  * Below [[literalThreshold]] entries the map inlines as a `typedLit` plan
  * literal — zero extra plan nodes, constant-folded lookups. Above it, a
  * partition-count-sized literal would bloat the serialized plan (100k+
  * shards ⇒ multi-MB expression trees shipped to every task), so the map
  * ships ONCE as a broadcast-joined two-column DataFrame instead — the
  * classic small-dim broadcast, bounded by the shard count, never a
  * shuffle of the fact side. Both paths produce bit-identical columns
  * (property-pinned in ShardLookupSpec); the threshold is a plan-size
  * knob, not a semantics knob (documented in SCALING.md).
  */
object ShardLookup {

  /** Above this many map entries, deliver via broadcast join instead of a
    * plan-literal map. ~10k entries keeps the literal's serialized form
    * well under a megabyte; beyond that the broadcast path's one extra
    * plan node is the cheaper shape. */
  val literalThreshold: Int = 10000

  /** `df` + column `outName` = `m(shardCol)` (or `default` where absent).
    * Long-valued variant (rank/offset bases). */
  def attachLong(df: DataFrame, shardCol: Column, m: Map[Int, Long],
      outName: String, default: Long,
      threshold: Int = literalThreshold): DataFrame =
    attach(df, shardCol, m.toSeq, outName, LongType, lit(default), threshold)

  /** Double-valued variant (suffix mins; `default` is typically +∞). */
  def attachDouble(df: DataFrame, shardCol: Column, m: Map[Int, Double],
      outName: String, default: Double,
      threshold: Int = literalThreshold): DataFrame =
    attach(df, shardCol, m.toSeq, outName, DoubleType, lit(default), threshold)

  private def attach(df: DataFrame, shardCol: Column,
      entries: Seq[(Int, Any)], outName: String, valueType: DataType,
      default: Column, threshold: Int): DataFrame = {
    if (entries.isEmpty) df.withColumn(outName, default)
    else if (entries.size <= threshold) {
      val litMap = map(entries.flatMap { case (k, v) =>
        Seq(lit(k), lit(v)) }: _*)
      // element_at on a map literal: null on missing key → default
      df.withColumn(outName, coalesce(element_at(litMap, shardCol), default))
    } else {
      val spark = df.sparkSession
      val schema = StructType(Seq(
        StructField("__lk_shard", IntegerType, nullable = false),
        StructField(outName, valueType, nullable = false)))
      val lookup = spark.createDataFrame(
        java.util.Arrays.asList(entries.map(e => Row(e._1, e._2)): _*), schema)
      // left join + coalesce ≡ the literal path's missing-key default; the
      // explicit broadcast hint pins the plan shape independent of stats
      df.join(broadcast(lookup), shardCol === col("__lk_shard"), "left")
        .withColumn(outName, coalesce(col(outName), default))
        .drop("__lk_shard")
    }
  }
}
