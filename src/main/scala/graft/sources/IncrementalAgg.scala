package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed count+sum rollup from a
  * [[SnapshotTable]] row-level change feed — the materialized-view pattern
  * that keeps a 100 TB rollup affordable: applying the deltas of the 0.1%
  * of rows that changed costs O(|changes|), where the batch recompute the
  * result is provably equal to costs O(|corpus|).
  *
  * Contract: the summary table's schema is `groupCols ++ (countName:
  * BIGINT) ++ sumCols aliases: DECIMAL(28,2)`; build it once with
  * [[summarize]], keep it current with [[applyChanges]] after each batch
  * of base commits. Sums are carried as DECIMAL end to end, so the
  * incremental total is EXACTLY the batch recompute (decimal addition is
  * associative and order-independent; double sums would drift with
  * accumulation order) — the s14 oracle certifies that equality
  * relationally.
  *
  * Exactness needs the applied feed slice to be row-level: commit base
  * merges/deletes with `changeCapture = true` (append and overwrite
  * file-diff events are row-exact already — NOTES_r10). Maintained
  * aggregates must form a commutative group under +/−: count and sum
  * qualify (avg = sum/count at read time); min/max do NOT (a deleted
  * extremum cannot be un-min'd) — [[applyChangesWithMinMax]] maintains
  * them with the standard retraction hybrid: monotone fold for arrivals,
  * per-group base rescan ONLY for the groups whose current extremum was
  * retracted.
  */
object IncrementalAgg {
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** txn key recording the base version a summary has folded through —
    * stamped ATOMICALLY with each fold's merge commit, so the watermark
    * and the fold can never disagree (the Delta SetTransaction pattern). */
  val foldedThroughKey = "graft.foldedThrough"

  /** Seed (or re-seed) the summary from the base's CURRENT head with one
    * batch recompute, stamping the watermark in the same commit. Returns
    * the base version the summary now reflects. */
  def seedSummary(spark: SparkSession, baseRoot: String, summaryRoot: String,
      groupCols: Seq[String], sumCols: Seq[(String, String)],
      countName: String = "n"): Int = {
    val head = SnapshotTable.latestVersion(baseRoot)
    SnapshotTable.write(
      summarize(SnapshotTable.read(spark, baseRoot), groupCols, sumCols,
        countName).coalesce(1),
      summaryRoot, mode = "overwrite",
      txn = Map(foldedThroughKey -> head.toString))
    head
  }

  /** EXACTLY-ONCE fold step: read the summary's own durable watermark,
    * fold base changes (watermark, head] and advance the watermark in the
    * same atomic commit. A crash anywhere leaves a consistent pair — a
    * fold that never committed left no stamp (the window refolds in full
    * on the next call), a fold that committed advanced the stamp (the
    * window can never refold) — so calling this after every batch of base
    * commits maintains the view exactly once regardless of retries. A
    * window containing no change events (e.g. only compacts) leaves the
    * watermark in place: the refold of an empty window is free.
    * Returns the base version now folded through. */
  def foldOnce(spark: SparkSession, baseRoot: String, summaryRoot: String,
      groupCols: Seq[String], sumCols: Seq[(String, String)],
      countName: String = "n"): Int = {
    val w = SnapshotTable.lastTxn(summaryRoot, foldedThroughKey)
      .getOrElse(throw new IllegalStateException(
        s"summary at $summaryRoot carries no '$foldedThroughKey' stamp — " +
          "seed it with seedSummary first"))._2.toInt
    val head = SnapshotTable.latestVersion(baseRoot)
    if (head > w)
      applyChanges(spark, baseRoot, summaryRoot, fromVersion = w, groupCols,
        sumCols, countName, toVersion = Some(head),
        txn = Map(foldedThroughKey -> head.toString))
    head
  }

  /** Batch-build the summary frame the incremental path maintains:
    * one exact count + DECIMAL(28,2) sum per group. */
  def summarize(base: DataFrame, groupCols: Seq[String],
      sumCols: Seq[(String, String)], countName: String = "n"): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countName),
        sumCols.map { case (c, a) =>
          sum(dec(c)).cast("decimal(28,2)").as(a) }: _*)

  /** [[summarize]] plus exact MIN/MAX per group: `minMaxCols` maps a value
    * column to its (minAlias, maxAlias) pair (stored as the value column's
    * own type — extrema are exact picks, no FP-association hazard). */
  def summarizeWithMinMax(base: DataFrame, groupCols: Seq[String],
      sumCols: Seq[(String, String)], minMaxCols: Seq[(String, String, String)],
      countName: String = "n"): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countName),
        sumCols.map { case (c, a) =>
          sum(dec(c)).cast("decimal(28,2)").as(a) } ++
        minMaxCols.flatMap { case (c, mn, mx) =>
          Seq(min(col(c)).as(mn), max(col(c)).as(mx)) }: _*)

  /** [[summarize]] plus exact COUNT(DISTINCT value) per group (NULLs
    * ignored, SQL semantics). */
  def summarizeWithDistinct(base: DataFrame, groupCols: Seq[String],
      sumCols: Seq[(String, String)], distinctCol: (String, String),
      countName: String = "n"): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countName),
        sumCols.map { case (c, a) =>
          sum(dec(c)).cast("decimal(28,2)").as(a) } :+
        countDistinct(col(distinctCol._1)).as(distinctCol._2): _*)

  /** Seed the DETAIL table behind [[applyChangesWithDistinct]]: one row
    * per live (group, value) pair with its multiplicity `__m` — the
    * standard exact distinct-view auxiliary (size = number of distinct
    * pairs, the irreducible state for exactness under retraction: an HLL
    * can fold arrivals but can never retract). NULL values are excluded,
    * matching COUNT(DISTINCT). The seed commit stamps the detail's OWN
    * [[foldedThroughKey]] watermark — the distinct fold mutates two
    * tables, and only per-table watermarks make the pair exactly-once. */
  def seedDistinctDetail(spark: SparkSession, baseRoot: String,
      detailRoot: String, groupCols: Seq[String], valueCol: String): Int = {
    val head = SnapshotTable.latestVersion(baseRoot)
    val detail = SnapshotTable.read(spark, baseRoot)
      .where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__m"))
    SnapshotTable.write(detail.coalesce(1), detailRoot, mode = "overwrite",
      txn = Map(foldedThroughKey -> head.toString))
  }

  /** Seed detail THEN summary from the base's current head, both stamped
    * with the same watermark. Detail first: a crash in between leaves the
    * summary unstamped, so the seeding branch re-runs in full (overwrite
    * seeds are idempotent). Returns the base version both now reflect. */
  def seedSummaryWithDistinct(spark: SparkSession, baseRoot: String,
      summaryRoot: String, detailRoot: String, groupCols: Seq[String],
      sumCols: Seq[(String, String)], distinctCol: (String, String),
      countName: String = "n"): Int = {
    val head = SnapshotTable.latestVersion(baseRoot)
    seedDistinctDetail(spark, baseRoot, detailRoot, groupCols,
      distinctCol._1)
    SnapshotTable.write(
      summarizeWithDistinct(SnapshotTable.read(spark, baseRoot), groupCols,
        sumCols, distinctCol, countName).coalesce(1),
      summaryRoot, mode = "overwrite",
      txn = Map(foldedThroughKey -> head.toString))
    head
  }

  /** [[foldOnce]] for the distinct-carrying view: exactly-once across
    * BOTH tables via their independent watermarks (see
    * [[applyChangesWithDistinct]]'s detail-window rule). */
  def foldOnceWithDistinct(spark: SparkSession, baseRoot: String,
      summaryRoot: String, detailRoot: String, groupCols: Seq[String],
      sumCols: Seq[(String, String)], distinctCol: (String, String),
      countName: String = "n"): Int = {
    val w = SnapshotTable.lastTxn(summaryRoot, foldedThroughKey)
      .getOrElse(throw new IllegalStateException(
        s"summary at $summaryRoot carries no '$foldedThroughKey' stamp — " +
          "seed it with seedSummaryWithDistinct first"))._2.toInt
    val head = SnapshotTable.latestVersion(baseRoot)
    if (head > w)
      applyChangesWithDistinct(spark, baseRoot, summaryRoot, detailRoot,
        fromVersion = w, groupCols, sumCols, distinctCol, countName,
        toVersion = Some(head),
        txn = Map(foldedThroughKey -> head.toString))
    head
  }

  /** [[applyChanges]] for summaries that ALSO carry an exact
    * COUNT(DISTINCT) — the aggregate that is NOT a commutative group
    * (a retracted value might or might not still be present in other
    * rows), maintained exactly with the two-level fold:
    *
    *  1. the change feed folds into the (group, value)→multiplicity
    *     DETAIL table (multiplicities ARE a commutative group), emptied
    *     pairs physically deleted;
    *  2. the distinct count of each group the window TOUCHED is then
    *     re-read from the detail table — a semi-join-pruned scan of the
    *     changed groups' pairs only, O(|changed groups' distinct
    *     values|), never the base table.
    *
    * Count/sum behave exactly as in [[applyChanges]]. The summary and
    * detail tables must both have been seeded from the same base version
    * ([[summarizeWithDistinct]] + [[seedDistinctDetail]]). */
  def applyChangesWithDistinct(spark: SparkSession, baseRoot: String,
      summaryRoot: String, detailRoot: String, fromVersion: Int,
      groupCols: Seq[String], sumCols: Seq[(String, String)],
      distinctCol: (String, String), countName: String = "n",
      toVersion: Option[Int] = None,
      txn: Map[String, String] = Map.empty): Int = {
    val (vCol, dAlias) = distinctCol
    val to = toVersion.getOrElse(SnapshotTable.latestVersion(baseRoot))
    val feed = SnapshotTable.readChanges(spark, baseRoot, fromVersion,
      Some(to))
    if (feed.isEmpty) return SnapshotTable.latestVersion(summaryRoot)
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val signed = feed.withColumn("__sign", sign)
    // 1. detail fold — windowed by the detail's OWN watermark: the fold
    // mutates two tables, so a crash after the detail commit but before
    // the summary commit must not refold the detail on the retry. The
    // detail window is (its own watermark, to]; legacy unstamped detail
    // tables fall back to the caller's window.
    val pairKeys = groupCols :+ vCol
    val wd = SnapshotTable.lastTxn(detailRoot, foldedThroughKey)
      .map(_._2.toInt).getOrElse(fromVersion)
    if (wd < to) {
      val dSigned =
        if (wd == fromVersion) signed
        else SnapshotTable.readChanges(spark, baseRoot, wd, Some(to))
          .withColumn("__sign", sign)
      val dDeltas = dSigned.where(col(vCol).isNotNull)
        .groupBy(pairKeys.map(col): _*)
        .agg(sum(col("__sign")).as("__dm"))
      val detailCur = SnapshotTable.read(spark, detailRoot)
      val dUpserts = dDeltas.join(detailCur, pairKeys, "left")
        .select(pairKeys.map(col) :+
          (coalesce(col("__m"), lit(0L)) + col("__dm")).as("__m"): _*)
      SnapshotTable.merge(dUpserts, detailRoot, pairKeys,
        txn = Map(foldedThroughKey -> to.toString))
      SnapshotTable.deleteWhere(spark, detailRoot, col("__m") === 0L)
    }
    // 2. count/sum deltas per group, as in applyChanges
    val deltas = signed
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        sumCols.map { case (c, a) =>
          sum(col("__sign") * dec(c)).cast("decimal(28,2)").as(s"__d_$a") }: _*)
    // 3. fresh distinct counts for the touched groups from the NEW detail
    val dCounts = SnapshotTable.read(spark, detailRoot)
      .join(broadcast(deltas.select(groupCols.map(col): _*)), groupCols,
        "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__dc"))
    val cur = SnapshotTable.read(spark, summaryRoot)
    val upserts = deltas.join(cur, groupCols, "left")
      .join(dCounts, groupCols, "left")
      .select(groupCols.map(col) ++
        Seq((coalesce(col(countName), lit(0L)) + col("__dn")).as(countName)) ++
        sumCols.map { case (_, a) =>
          (coalesce(col(a), lit(0).cast("decimal(28,2)")) + col(s"__d_$a"))
            .cast("decimal(28,2)").as(a) } :+
        coalesce(col("__dc"), lit(0L)).as(dAlias): _*)
    val v = SnapshotTable.merge(upserts, summaryRoot, groupCols, txn = txn)
    val (v2, _, _) = SnapshotTable.deleteWhere(spark, summaryRoot,
      col(countName) === 0)
    math.max(v, v2)
  }

  /** [[applyChanges]] for summaries that ALSO carry min/max — the standard
    * retraction hybrid: arrivals fold monotonically
    * (least/greatest against the stored extremum), and only the groups
    * whose CURRENT extremum was retracted (a delete/preimage ≤ stored min
    * or ≥ stored max) rescan their slice of the base — O(|changed groups'
    * rows|), never the whole table, and only when a retraction actually
    * threatens the extremum. Count/sum behave exactly as in
    * [[applyChanges]]. */
  def applyChangesWithMinMax(spark: SparkSession, baseRoot: String,
      summaryRoot: String, fromVersion: Int, groupCols: Seq[String],
      sumCols: Seq[(String, String)], minMaxCols: Seq[(String, String, String)],
      countName: String = "n"): Int = {
    require(minMaxCols.nonEmpty, "use applyChanges when no min/max is kept")
    val feed = SnapshotTable.readChanges(spark, baseRoot, fromVersion)
    if (feed.isEmpty) return SnapshotTable.latestVersion(summaryRoot)
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val aggExprs =
      Seq(sum(col("__sign")).as("__dn")) ++
      sumCols.map { case (c, a) =>
        sum(col("__sign") * dec(c)).cast("decimal(28,2)").as(s"__d_$a") } ++
      minMaxCols.flatMap { case (c, mn, mx) => Seq(
        min(when(col("__sign") === 1L, col(c))).as(s"__arr_$mn"),
        max(when(col("__sign") === 1L, col(c))).as(s"__arr_$mx"),
        min(when(col("__sign") === -1L, col(c))).as(s"__ret_$mn"),
        max(when(col("__sign") === -1L, col(c))).as(s"__ret_$mx")) }
    val deltas = feed.withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    val cur = SnapshotTable.read(spark, summaryRoot)
    val joined = deltas.join(cur, groupCols, "left")
    val threatened = minMaxCols.map { case (_, mn, mx) =>
      (col(s"__ret_$mn").isNotNull && col(mn).isNotNull &&
        col(s"__ret_$mn") <= col(mn)) ||
      (col(s"__ret_$mx").isNotNull && col(mx).isNotNull &&
        col(s"__ret_$mx") >= col(mx))
    }.reduce(_ || _)
    val marked = joined.withColumn("__rescan", coalesce(threatened, lit(false)))
    val rescanKeys = marked.where(col("__rescan"))
      .select(groupCols.map(col): _*)
    val rsAggs = minMaxCols.flatMap { case (c, mn, mx) =>
      Seq(min(col(c)).as(s"__rs_$mn"), max(col(c)).as(s"__rs_$mx")) }
    val rescanAgg = SnapshotTable.read(spark, baseRoot)
      .join(broadcast(rescanKeys), groupCols, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(rsAggs.head, rsAggs.tail: _*)
    val upserts = marked.join(rescanAgg, groupCols, "left")
      .select(groupCols.map(col) ++
        Seq((coalesce(col(countName), lit(0L)) + col("__dn")).as(countName)) ++
        sumCols.map { case (_, a) =>
          (coalesce(col(a), lit(0).cast("decimal(28,2)")) + col(s"__d_$a"))
            .cast("decimal(28,2)").as(a) } ++
        minMaxCols.flatMap { case (_, mn, mx) => Seq(
          when(col("__rescan"), col(s"__rs_$mn"))
            .otherwise(least(col(mn), col(s"__arr_$mn"))).as(mn),
          when(col("__rescan"), col(s"__rs_$mx"))
            .otherwise(greatest(col(mx), col(s"__arr_$mx"))).as(mx)) }: _*)
    val v = SnapshotTable.merge(upserts, summaryRoot, groupCols)
    val (v2, _, _) = SnapshotTable.deleteWhere(spark, summaryRoot,
      col(countName) === 0)
    math.max(v, v2)
  }

  /** Fold the base table's changes SINCE `fromVersion` (exclusive — pass
    * the base version the summary currently reflects; versions
    * fromVersion+1 .. head are folded, `readChanges` semantics) into the
    * summary table: inserts/update_postimages count +1, deletes/
    * update_preimages −1, per-group delta sums merge into the existing
    * rows (absent groups start at zero), and groups the changes emptied
    * are physically deleted so the summary's ROW SET also equals the
    * batch recompute's. Returns the summary's new version. */
  def applyChanges(spark: SparkSession, baseRoot: String, summaryRoot: String,
      fromVersion: Int, groupCols: Seq[String],
      sumCols: Seq[(String, String)], countName: String = "n",
      toVersion: Option[Int] = None,
      txn: Map[String, String] = Map.empty): Int = {
    val feed = SnapshotTable.readChanges(spark, baseRoot, fromVersion, toVersion)
    if (feed.isEmpty) return SnapshotTable.latestVersion(summaryRoot)
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val deltas = feed.withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        sumCols.map { case (c, a) =>
          sum(col("__sign") * dec(c)).cast("decimal(28,2)").as(s"__d_$a") }: _*)
    val cur = SnapshotTable.read(spark, summaryRoot)
    // only CHANGED groups are touched: the upsert frame is delta-sized,
    // untouched summary rows never rewrite (merge's keep side)
    val upserts = deltas.join(cur, groupCols, "left")
      .select(groupCols.map(col) ++
        Seq((coalesce(col(countName), lit(0L)) + col("__dn")).as(countName)) ++
        sumCols.map { case (_, a) =>
          (coalesce(col(a), lit(0).cast("decimal(28,2)")) + col(s"__d_$a"))
            .cast("decimal(28,2)").as(a) }: _*)
    // the txn stamp (e.g. "folded through base version V") commits
    // ATOMICALLY with the summary change — the exactly-once anchor
    val v = SnapshotTable.merge(upserts, summaryRoot, groupCols, txn = txn)
    val (v2, _, _) = SnapshotTable.deleteWhere(spark, summaryRoot,
      col(countName) === 0)
    math.max(v, v2)
  }
}
