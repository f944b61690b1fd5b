package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 — fold a [[SnapshotTable]] row-level
  * change feed into a full dimension HISTORY: one row per (key, version
  * interval) with `valid_from`/`valid_to` commit versions and an
  * `is_current` flag. The classic warehouse pattern for "what did this
  * dimension row look like when the fact landed" joins, built here from
  * the same CDC surface the incremental views consume ([[IncrementalAgg]])
  * — no second source of truth.
  *
  * Semantics: `insert` and `update_postimage` events OPEN a version at
  * their commit version; an OPEN version CLOSES at the next arrival's
  * version (replacement) or at a `delete` event's version (termination) —
  * `valid_to` is exclusive and NULL while current. `update_preimage`
  * events are ignored (the preceding arrival already carries those
  * values); a key re-inserted after a delete simply opens a new interval.
  * Append/overwrite commits need no capture (their file-diff events are
  * row-exact); commit merges/deletes with `changeCapture = true`.
  *
  * Plan: one window PARTITIONED by the dimension key over the FEED
  * (O(|changes|) rows, never the base table) — the lead() pairing closes
  * intervals in commit order; deletes sort after arrivals inside a
  * version for determinism, then drop. Nothing global, nothing
  * corpus-sized.
  */
object Scd2 {

  /** [[build]] seeded from a base snapshot: `readChanges(root, v)` emits
    * changes AFTER version `v`, so the dimension's starting population —
    * the table read AT `baseVersion` (time travel) — joins the fold as
    * version-`baseVersion` arrivals. This is the production shape: seed
    * once from a snapshot, then fold the feed forever. */
  def buildFrom(base: DataFrame, baseVersion: Int, feed: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val seeded = base
      .withColumn("_change_type", lit("insert"))
      .withColumn("_change_version", lit(baseVersion))
    build(seeded.unionByName(feed, allowMissingColumns = true), keyCols)
  }

  /** Build the SCD2 history frame from `feed` (a [[SnapshotTable.readChanges]]
    * result). Output: all attribute columns, then `valid_from` (BIGINT),
    * `valid_to` (BIGINT, NULL while open) and `is_current`, ordered by
    * (keys, valid_from). */
  def build(feed: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val attrs = feed.columns.filterNot(c =>
      c == "_change_type" || c == "_change_version").toSeq
    val ev = feed
      .where(col("_change_type").isin("insert", "update_postimage", "delete"))
      .withColumn("__is_del", (col("_change_type") === "delete").cast("int"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_change_version").asc, col("__is_del").asc)
    ev.withColumn("__nxt", lead(col("_change_version"), 1).over(w))
      .where(col("__is_del") === 0)
      .select(attrs.map(col) ++ Seq(
        col("_change_version").cast("long").as("valid_from"),
        col("__nxt").cast("long").as("valid_to"),
        col("__nxt").isNull.as("is_current")): _*)
      .orderBy(keyCols.map(col) :+ col("valid_from"): _*)
  }
}
