package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks (SURVEY §2 "quality operator family"; behavior from
  * the `test data quality and ouliers` notebooks and `utils.scala:115-152`).
  *
  * Output shape matches the reference's report tables
  * (`stydyGrB.scala:77-79`): `(description, columnName, number)`.
  *
  * The reference runs one Spark ACTION per checked column per check — a full
  * table scan each (`utils.scala:122,134,149`), and for z-scores two global
  * windows per column (`:146-148`). At 100 TB that is catastrophic. Here every
  * check over every column fuses into:
  *   - pass 1: one conditional aggregation computing all range/null violation
  *     counts AND the mean/stddev needed by the z-score checks; the 1-row
  *     result is collected to the driver eagerly;
  *   - pass 2 (only if z-score checks exist): one more conditional aggregation
  *     with the pass-1 moments inlined as literal constants (no cached plan to
  *     leak, no re-scan, no join).
  * Two scans total regardless of how many columns/checks, each fully
  * codegen'd, no shuffle at all (global aggregation = partial agg + 1-row
  * exchange).
  *
  * NOTE: because pass 1 collects, [[report]] triggers a Spark job AT CALL
  * TIME — it is not a lazy plan like most operators here.
  */
object Quality {

  sealed trait Check
  /** Count of values outside [lo, hi] (`utils.scala:115-124`). */
  final case class RangeCheck(columns: Seq[String], lo: Double, hi: Double,
      description: String = "outside range") extends Check
  /** Count of NULLs (`utils.scala:128-136`). */
  final case class NotNullCheck(columns: Seq[String],
      description: String = "null values") extends Check
  /** Count of |z| > z threshold outliers (`utils.scala:143-152`). */
  final case class ZScoreCheck(columns: Seq[String], z: Double = 3.0,
      description: String = "z-score outliers") extends Check

  /** Run all checks in ≤2 passes; returns `(description, columnName, number)`
    * rows, one per (check, column). Pass `violationsOnly = true` to mirror the
    * reference's `.filter(_._3 > 0)` (`stydyGrB.scala:65`).
    */
  def report(df: DataFrame, checks: Seq[Check], violationsOnly: Boolean = false): DataFrame = {
    val spark = df.sparkSession

    final case class Cell(description: String, column: String, expr: Column, key: String)
    var i = 0
    def fresh(): String = { i += 1; s"__q$i" }

    val simpleCells: Seq[Cell] = checks.flatMap {
      case RangeCheck(cols, lo, hi, d) => cols.map { c =>
        Cell(d, c, count(when(col(c) < lo || col(c) > hi, 1)), fresh())
      }
      case NotNullCheck(cols, d) => cols.map { c =>
        Cell(d, c, count(when(col(c).isNull, 1)), fresh())
      }
      case _: ZScoreCheck => Seq.empty
    }
    val zChecks = checks.collect { case z: ZScoreCheck => z }
    val momentCols: Seq[String] = zChecks.flatMap(_.columns).distinct

    // pass 1: all simple counts + all moments, one global aggregation.
    // The result is a single row, so materialize it to the driver — both
    // downstream consumers (the simple-count report and the z-score pass) read
    // it as constants, avoiding a cached plan (leak) or a re-scan.
    val momentExprs = momentCols.flatMap { c =>
      Seq(avg(col(c)).as(s"__avg__$c"), stddev_pop(col(c)).as(s"__std__$c"))
    }
    val pass1Exprs = simpleCells.map(c => c.expr.as(c.key)) ++ momentExprs
    require(pass1Exprs.nonEmpty, "no checks given")
    val pass1Row = df.agg(pass1Exprs.head, pass1Exprs.tail: _*).collect()(0)

    val simpleReport =
      if (simpleCells.isEmpty) None
      else {
        import spark.implicits._
        Some(simpleCells.map { c =>
          (c.description, c.column, pass1Row.getAs[Long](c.key))
        }.toDF("description", "columnName", "number"))
      }

    val zReport =
      if (zChecks.isEmpty) None
      else {
        // pass 2: z-score counts with pass-1 moments inlined as literals
        def momentLit(key: String): Column =
          lit(pass1Row.getAs[java.lang.Double](key)).cast("double")
        val zCells = zChecks.flatMap { zc => zc.columns.map { c =>
          val z = abs((col(c) - momentLit(s"__avg__$c")) / momentLit(s"__std__$c"))
          Cell(zc.description, c, count(when(z > zc.z, 1)), fresh())
        }}
        val pass2 = df.agg(zCells.head.expr.as(zCells.head.key),
               zCells.tail.map(c => c.expr.as(c.key)): _*)
        Some(unpivot(pass2, zCells.map(c => (c.description, c.column, c.key))))
      }

    val full = (simpleReport.toSeq ++ zReport.toSeq).reduce(_ unionByName _)
    if (violationsOnly) full.where(col("number") > 0) else full
  }

  /** (description, columnName, key) triples over a 1-row frame → long rows. */
  private def unpivot(oneRow: DataFrame, cells: Seq[(String, String, String)]): DataFrame = {
    val structs = cells.map { case (d, c, k) =>
      struct(lit(d).as("description"), lit(c).as("columnName"),
        coalesce(col(k), lit(0L)).cast("long").as("number"))
    }
    oneRow.select(explode(array(structs: _*)).as("r")).select(col("r.*"))
  }

  /** Per-group Tukey-fence outlier census over EXACT rank quantiles — the
    * reference's z-score outlier idea (`utils.scala:143-152`) made robust
    * (IQR fences don't need normality) and integer-exact end to end.
    *
    * Quantiles are type-1 (value at rank ⌈q·n⌉ — a DATA value, never an
    * interpolation), found on the value-level count frame: money values
    * scale to HALF-CENT integers (×200), so the fences
    * `q25 − 3·IQR/2` / `q75 + 3·IQR/2` are pure LONG arithmetic (IQR is a
    * multiple of 200, so DIV 2 is exact) and every outlier comparison is
    * an integer compare — no FP anywhere until the final /200 display
    * division, which both engines round identically.
    *
    * Plan: ONE corpus-sized groupBy to (group, value) cells; cumulative
    * counts as a window PARTITIONED by group over the value-level frame
    * (never data-sized, never global); fences as a k-row frame joined
    * back to the CELLS (no second corpus scan) for the conditional
    * outlier sums.
    *
    * GROUP-CARDINALITY CONTRACT: the fence frame (one row per group) is
    * broadcast back into the cell census, so `groupCol` must be
    * dimension-like — bounded cardinality (≲ millions of groups), NOT a
    * key that grows with the corpus. The hint is deliberate: the planner
    * cannot see that the aggregate output is k rows, and without it a
    * 100 TB cell frame would shuffle for a sort-merge join against k
    * rows (r12 A/B: q10 2.22→1.17 s). For unbounded group keys use a
    * plain join (drop the hint) — the fences themselves stay exact. */
  def iqrOutliers(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // two consumers (fence ranks, outlier census) — pin the value-level
    // cells once so the post-shuffle aggregate doesn't re-run per branch
    val cells = graft.Tables.spreadForGroupBy(
      df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
        .select(col(groupCol).cast("string").as("grp"),
          (col(valueCol).cast("decimal(12,2)") * 200).cast("long").as("v2")),
      col("grp"), col("v2"))
      .groupBy(col("grp"), col("v2")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val cw = Window.partitionBy(col("grp")).orderBy(col("v2").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nw = Window.partitionBy(col("grp"))
    val fences = cells
      .withColumn("ci", sum(col("c")).over(cw))
      .withColumn("n", sum(col("c")).over(nw))
      .withColumn("q25c", when(col("ci") >= expr("(n + 3) DIV 4"), col("v2")))
      .withColumn("q75c", when(col("ci") >= expr("(3 * n + 3) DIV 4"), col("v2")))
      .groupBy(col("grp"), col("n"))
      .agg(min(col("q25c")).as("q25_2"), min(col("q75c")).as("q75_2"))
      .withColumn("lo2", col("q25_2") - expr("3 * (q75_2 - q25_2) DIV 2"))
      .withColumn("hi2", col("q75_2") + expr("3 * (q75_2 - q25_2) DIV 2"))
    cells.join(broadcast(fences), "grp")
      .groupBy(col("grp"), col("n"), col("q25_2"), col("q75_2"),
        col("lo2"), col("hi2"))
      .agg(
        coalesce(sum(when(col("v2") < col("lo2"), col("c"))), lit(0L)).as("n_below"),
        coalesce(sum(when(col("v2") > col("hi2"), col("c"))), lit(0L)).as("n_above"))
      .select(col("grp"), col("n"),
        (col("q25_2").cast("double") / lit(200.0)).as("q25"),
        (col("q75_2").cast("double") / lit(200.0)).as("q75"),
        (col("lo2").cast("double") / lit(200.0)).as("lo_fence"),
        (col("hi2").cast("double") / lit(200.0)).as("hi_fence"),
        col("n_below"), col("n_above"))
  }

  /** Per-group p50/p95/max distribution bands — the latency-dashboard
    * census over any keyed value stream (compose the key from e.g.
    * (event_type, day) to get a monitoring time series).
    *
    * Exactness: the q10/[[iqrOutliers]] machinery — values become CENT
    * integers, the group reduces to value-level cells, and the
    * quantiles are exact type-1 ranks read off the cell cumsum
    * (`p50 = smallest v with cum ≥ ⌈n/2⌉`, `p95 at ⌈0.95·n⌉`) — pure
    * integer arithmetic until the single final /100. Cells shuffle once,
    * keyed by group; nothing is row-count-sized downstream. */
  def quantileBands(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "quantileBands needs at least one key column")
    val keys = keyCols.map(col)
    val cells = graft.Tables.spreadForGroupBy(
      df.where(col(valueCol).isNotNull &&
          keyCols.map(col(_).isNotNull).reduce(_ && _))
        .select(keys :+
          (col(valueCol).cast("decimal(12,2)") * 100).cast("long").as("vc"): _*),
      keys :+ col("vc"): _*)
      .groupBy(keys :+ col("vc"): _*).agg(count(lit(1)).as("c"))
    val cw = Window.partitionBy(keys: _*).orderBy(col("vc").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nw = Window.partitionBy(keys: _*)
    cells
      .withColumn("ci", sum(col("c")).over(cw))
      .withColumn("n", sum(col("c")).over(nw))
      .withColumn("p50c", when(col("ci") >= expr("(n + 1) DIV 2"), col("vc")))
      .withColumn("p95c", when(col("ci") >= expr("(19 * n + 19) DIV 20"), col("vc")))
      .groupBy(keys :+ col("n"): _*)
      .agg(min(col("p50c")).as("p50c"), min(col("p95c")).as("p95c"),
        max(col("vc")).as("maxc"))
      .select(keys ++ Seq(col("n"),
        (col("p50c").cast("double") / lit(100.0)).as("p50"),
        (col("p95c").cast("double") / lit(100.0)).as("p95"),
        (col("maxc").cast("double") / lit(100.0)).as("vmax")): _*)
      .orderBy(keys: _*)
  }

  /** Per-group MAD (median-absolute-deviation) robust outlier census —
    * the breakdown-point-0.5 sibling of [[iqrOutliers]] (IQR fences move
    * with 25% contamination; the MAD rule survives up to half the group
    * being junk).
    *
    * Integer exactness throughout: values land in DOUBLED-cent units
    * (`v2 = 200·x`, always even), so the interpolating median
    * `(v@⌈n/2⌉ + v@⌈(n+1)/2⌉) DIV 2` is exact LONG arithmetic; absolute
    * deviations `d = |v2 − med|` are integers, the deviation median runs
    * the same cell machinery in re-doubled units (`2d`, even again), and
    * the outlier rule `|x − med| > 3·MAD` compares as `2d > 3·mad2`
    * (both sides carry the same 400× unit factor) —
    * pure integer. FP appears only in the final display divisions
    * (one each), which both engines round identically.
    *
    * Plan: ONE corpus-sized groupBy to (group, value) cells; medians from
    * cell cumsums PARTITIONED by group (never global); the deviation pass
    * REGROUPS THE CELLS (k·|distinct| rows, no second corpus scan) and
    * the final census joins two k-row frames back to the deviation
    * cells.
    *
    * GROUP-CARDINALITY CONTRACT: the med/mad frames (one row per group)
    * are broadcast back into the cell joins — same contract as
    * [[iqrOutliers]]: `groupCol` must be dimension-like (bounded
    * cardinality), never a corpus-growing key. */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The cell frame feeds FOUR consumers (median window, deviation
    // regroup, census joins): only its Exchange is plan-reused, so the
    // post-shuffle aggregate would re-run per consumer — pin the cells
    // once (value-level rows, never data-sized state per partition).
    // Same for the deviation cells (two consumers).
    val cells = graft.Tables.spreadForGroupBy(
      df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
        .select(col(groupCol).cast("string").as("grp"),
          (col(valueCol).cast("decimal(12,2)") * 200).cast("long").as("v2")),
      col("grp"), col("v2"))
      .groupBy(col("grp"), col("v2")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    def cellMedian(cf: DataFrame, vCol: String): DataFrame = {
      val cw = Window.partitionBy(col("grp")).orderBy(col(vCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nw = Window.partitionBy(col("grp"))
      cf.withColumn("ci", sum(col("c")).over(cw))
        .withColumn("n", sum(col("c")).over(nw))
        .withColumn("m1", when(col("ci") >= expr("(n + 1) DIV 2"), col(vCol)))
        .withColumn("m2", when(col("ci") >= expr("(n + 2) DIV 2"), col(vCol)))
        .groupBy(col("grp"), col("n"))
        .agg(((min(col("m1")) + min(col("m2"))) / lit(2)).cast("long").as("med"))
    }
    val med = cellMedian(cells, "v2").select(col("grp"), col("n"), col("med"))
      .localCheckpoint()
    val devCells = cells.join(broadcast(med.select(col("grp"), col("med"))), "grp")
      .withColumn("d2", abs(col("v2") - col("med")) * 2L)
      .groupBy(col("grp"), col("d2")).agg(sum(col("c")).as("c"))
      .localCheckpoint()
    val mad = cellMedian(devCells, "d2")
      .select(col("grp"), col("med").as("mad2"))
    devCells.join(broadcast(mad), "grp")
      .join(broadcast(med.select(col("grp"), col("n"), col("med"))), "grp")
      .groupBy(col("grp"), col("n"), col("med"), col("mad2"))
      .agg(coalesce(sum(when(col("d2") > col("mad2") * 3L, col("c"))),
        lit(0L)).as("n_outliers"))
      .select(col("grp"), col("n"),
        round(col("med").cast("double") / lit(200.0), 3).as("median_v"),
        round(col("mad2").cast("double") / lit(400.0), 4).as("mad_v"),
        col("n_outliers"))
      .orderBy(col("grp"))
  }

  /** Per-group TRIMMED and WINSORIZED means — the robust-aggregation
    * siblings of [[iqrOutliers]]: trim drops the lowest/highest
    * `trimPct`% of ROWS (by rank), winsorize clamps them to the boundary
    * order statistics instead.
    *
    * Integer exactness (the q10 doctrine): values become CENT longs, the
    * corpus reduces to (group, value) cells once, and every rank
    * decision is pure LONG arithmetic off the cell cumsum —
    * `k = n·trimPct DIV 100` rows trim from each tail, a cell's kept
    * multiplicity is its overlap `min(ci, n−k) − max(ci−c, k)` with the
    * kept rank interval, and the clamp values are the type-1 order
    * statistics at ranks k+1 / n−k. The three sums (raw / trimmed
    * interior / winsorized = interior + k·lo_clamp + k·hi_clamp) stay
    * LONG; FP appears only in the final display divisions.
    *
    * Plan: one corpus-sized groupBy to cells; windows PARTITIONED by
    * group over the value-level frame; one k-row join back to the cells
    * — no second corpus scan, nothing global. */
  def trimmedMeans(df: DataFrame, valueCol: String, groupCol: String,
      trimPct: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trimPct >= 0 && trimPct < 50, "trimPct must be in [0, 50)")
    val cells = graft.Tables.spreadForGroupBy(
      df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
        .select(col(groupCol).cast("string").as("grp"),
          (col(valueCol).cast("decimal(12,2)") * 100).cast("long").as("vc")),
      col("grp"), col("vc"))
      .groupBy(col("grp"), col("vc")).agg(count(lit(1)).as("c"))
    val cw = Window.partitionBy(col("grp")).orderBy(col("vc").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nw = Window.partitionBy(col("grp"))
    // the ranked cell frame feeds two consumers (clamps, kept-mass sums)
    // — pin it so the cumsum windows run once (value-level rows)
    val ranked = cells
      .withColumn("ci", sum(col("c")).over(cw))
      .withColumn("n", sum(col("c")).over(nw))
      .withColumn("k", expr(s"n * $trimPct DIV 100"))
      .localCheckpoint()
    val clamps = ranked
      .withColumn("loc", when(col("ci") >= col("k") + 1L, col("vc")))
      .withColumn("hic", when(col("ci") >= col("n") - col("k"), col("vc")))
      .groupBy(col("grp"), col("n"), col("k"))
      .agg(min(col("loc")).as("lo_clamp_c"), min(col("hic")).as("hi_clamp_c"))
    val sums = ranked
      .withColumn("kept", greatest(lit(0L),
        least(col("ci"), col("n") - col("k")) -
          greatest(col("ci") - col("c"), col("k"))))
      .groupBy(col("grp"))
      .agg(sum(col("c") * col("vc")).as("raw_sum"),
        sum(col("kept") * col("vc")).as("trim_sum"))
    clamps.join(sums, "grp")
      .select(col("grp"), col("n"), col("k"),
        round(col("raw_sum").cast("double") /
          (col("n").cast("double") * 100.0), 6).as("mean"),
        round(col("trim_sum").cast("double") /
          ((col("n") - col("k") * 2L).cast("double") * 100.0), 6)
          .as("trimmed_mean"),
        round((col("trim_sum") + col("k") * col("lo_clamp_c") +
            col("k") * col("hi_clamp_c")).cast("double") /
          (col("n").cast("double") * 100.0), 6).as("winsor_mean"),
        (col("lo_clamp_c").cast("double") / 100.0).as("lo_clamp"),
        (col("hi_clamp_c").cast("double") / 100.0).as("hi_clamp"))
      .orderBy(col("grp"))
  }
}
