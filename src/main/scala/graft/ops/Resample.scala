package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling (NOT-IN-REFERENCE extension): project an event
  * stream onto a fixed per-key time grid, carrying the latest observation
  * forward (gap filling). Composed from existing operators — per-key grid =
  * one aggregation + `sequence` explode, the fill = [[AsOfJoin]] (one
  * shuffle, no range nested-loop) — so the scale properties are inherited:
  * shuffle keyed by (key), grid size = span/step per key, never row-count².
  */
object Resample {

  /** Rolling z-score anomaly flags over a keyed event stream — the
    * monitoring primitive: bucket events per (key, time bucket), then
    * score each bucket's count against the mean/stddev of its `lookback`
    * PRIOR buckets (rows-based frame over buckets present — a silent
    * hour contributes no row; compose with [[forwardFillGrid]] upstream
    * when gaps must count as zero).
    *
    * Exactness: bucket counts and the window's power sums are LONGs; the
    * sample-variance z is ONE fixed tree — `(c − s1/n) /
    * sqrt((n·s2 − s1²)/(n(n−1)))` — rounded to 6, and the flag reads the
    * ROUNDED z so a relational replay agrees bit-for-bit. z is NULL until
    * 2 prior buckets exist or when the window is constant.
    *
    * Plan: one map-side-combined groupBy to the bucket frame, one
    * PARTITIONED sliding window — nothing global, corpus shuffles once. */
  def rollingAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      truncUnit: String = "hour", lookback: Int = 24,
      zThreshold: Double = 3.0): DataFrame = {
    require(lookback >= 2, s"lookback must be ≥2, got $lookback")
    val counts = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"), date_trunc(truncUnit, col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket_ts").asc)
      .rowsBetween(-lookback.toLong, -1L)
    val n = count(lit(1)).over(w)
    val s1 = sum(col("c")).over(w)
    val s2 = sum(col("c") * col("c")).over(w)
    val z = when(n >= 2L && (n * s2 - s1 * s1) > 0L,
      round((col("c").cast("double") - s1.cast("double") / n.cast("double")) /
        sqrt((n * s2 - s1 * s1).cast("double") /
          (n * (n - 1L)).cast("double")), 6))
    counts
      .withColumn("prior_n", n)
      .withColumn("z", z)
      .withColumn("is_anomaly",
        when(col("z").isNotNull, abs(col("z")) > lit(zThreshold)))
      .orderBy(col("key"), col("bucket_ts"))
  }

  /** One-sided CUSUM change-point detection over a keyed event stream —
    * the sequential drift detector ([[rollingAnomaly]] catches spikes;
    * CUSUM accumulates small sustained shifts). The textbook recurrence
    * `S_t = max(0, S_{t−1} + (c_t − k))` is stateful, but the reflection
    * identity `S_t = P_t − min(0, min_{j≤t} P_j)` (with `P` the plain
    * prefix sum of `c − k`) turns it into two PARTITIONED running windows
    * — no stateful scan, no recursion, scale-safe.
    *
    * Everything is doubled-unit LONG arithmetic (`target2` = 2k,
    * `threshold2` = 2h) so a half-count reference value stays exact.
    * Returns `(key, bucket_ts, c, cusum2, alarm)`; the detector does NOT
    * reset after an alarm (alarms persist while the doubled statistic
    * stays ≥ `threshold2` — the common monitoring read). */
  def cusumDetect(df: DataFrame, keyCol: String, tsCol: String,
      truncUnit: String = "hour", target2: Long, threshold2: Long): DataFrame = {
    require(threshold2 > 0, s"threshold2 must be positive, got $threshold2")
    val counts = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"), date_trunc(truncUnit, col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket_ts").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0L)
    counts
      .withColumn("__p", sum(lit(2L) * col("c") - lit(target2)).over(w))
      .withColumn("__m", least(lit(0L), min(col("__p")).over(w)))
      .withColumn("cusum2", col("__p") - col("__m"))
      .withColumn("alarm", col("cusum2") >= lit(threshold2))
      .select(col("key"), col("bucket_ts"), col("c"), col("cusum2"), col("alarm"))
      .orderBy(col("key"), col("bucket_ts"))
  }

  /** One row per (key, grid instant) from floor(min ts) to floor(max ts) in
    * `step` intervals, with the latest `valCol` at-or-before each instant
    * (NULL before the first observation). `truncUnit` must floor-align with
    * `step` (e.g. "hour" + "INTERVAL 1 HOUR"). */
  def forwardFillGrid(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, truncUnit: String = "hour",
      step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val b = df.select(col(keyCol), col(tsCol), col(valCol))
      .where(col(tsCol).isNotNull)
    val spans = b.groupBy(col(keyCol))
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("__lo"),
        date_trunc(truncUnit, max(col(tsCol))).as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), expr(step))).as("__grid_ts"))
    AsOfJoin.asofBackward(grid, b, Seq(keyCol), "__grid_ts", tsCol,
        Seq(valCol -> "last_value"))
      .withColumnRenamed("__grid_ts", "grid_ts")
  }

  /** Cohort retention triangle — the product-analytics census: users
    * cohorted by their FIRST active day, then for each (cohort, k =
    * days-since-first) the count of cohort members active on day k and
    * its share of the cohort size (`pct = n_users / cohort_size`).
    *
    * Exactness: activity collapses to distinct (user, day) rows, the
    * first-day frame is a per-user `min`, and after the equi-join every
    * row is a unique (user, day) pair so `count(*)` IS the distinct user
    * count — no approximate distinct, and the single final division is
    * the only double op. Horizon bounds the output to cohorts × (h+1)
    * rows.
    *
    * Plan: one shuffle to (user, day) distinct, one map-side-combined
    * min by user, one equi-join on user (both sides user-keyed — AQE can
    * plan it shuffle-free off the distinct's partitioning), one
    * dimension-sized aggregate. Nothing is ever keyed by the full event
    * stream's cardinality. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String,
      horizon: Int = 14): DataFrame = {
    require(horizon >= 0, s"horizon must be ≥0, got $horizon")
    val activity = df.where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val first = activity.groupBy(col("u")).agg(min(col("d")).as("cohort"))
    val joined = activity.join(first, "u")
      .select(col("cohort"), datediff(col("d"), col("cohort")).as("k"))
      .where(col("k") <= horizon)
    val counts = joined.groupBy(col("cohort"), col("k"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = counts.where(col("k") === 0)
      .select(col("cohort"), col("n_users").as("cohort_size"))
    counts.join(sizes, "cohort")
      .select(col("cohort"), col("k"), col("n_users"), col("cohort_size"),
        round(col("n_users").cast("double") /
          col("cohort_size").cast("double"), 6).as("pct"))
      .orderBy(col("cohort"), col("k"))
  }

  /** Integer-exact autocorrelation of per-bucket event counts at lags
    * `1..maxLag` — seasonality/persistence detection for a keyed event
    * stream (a daily cycle shows as a peak at lag 24 on hourly buckets).
    *
    * The standard ACF estimator `r_k = Σ(c_t−c̄)(c_{t+k}−c̄) / Σ(c_t−c̄)²`
    * is made EXACT by scaling through by n²: with `m_t = n·c_t − S`
    * (integers; S = Σc), `r_k = Σ m_t·m_{t+k} / Σ m_t²` — every sum is
    * DECIMAL(38,0) integer arithmetic over PARTITIONED lead windows, and
    * the single division per (key, lag) is the only double op. Buckets
    * present only (a silent hour contributes no bucket; compose with
    * [[forwardFillGrid]] upstream when gaps must count as zero).
    *
    * Plan: one map-side-combined groupBy to the bucket frame, one
    * key-partitioned window pass computing all `maxLag` leads at once,
    * one explode to (key, lag) products — everything downstream of the
    * first shuffle is bucket-frame-sized. */
  def acfCounts(df: DataFrame, keyCol: String, tsCol: String,
      truncUnit: String = "hour", maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1,64], got $maxLag")
    val counts = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        date_trunc(truncUnit, col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("c"))
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
    val ow = kw.orderBy(col("bucket_ts").asc)
    val m = counts
      .withColumn("n", count(lit(1)).over(kw))
      .withColumn("s", sum(col("c")).over(kw))
      .withColumn("m", col("n") * col("c") - col("s"))
    val withLeads = (1 to maxLag).foldLeft(m) { (d, k) =>
      d.withColumn(s"__l$k", lead(col("m"), k).over(ow))
    }
    val prods = withLeads.select(col("key"), col("n"), col("m"),
      explode(array((1 to maxLag).map(k =>
        struct(lit(k).as("lag"), col(s"__l$k").as("ml"))): _*)).as("p"))
      .select(col("key"), col("n"), col("m"), col("p.lag"), col("p.ml"))
    val den = m.groupBy(col("key"))
      .agg(sum(col("m").cast("decimal(19,0)") * col("m")).as("den"))
    prods.where(col("ml").isNotNull)
      .groupBy(col("key"), col("lag"), col("n"))
      .agg(sum(col("m").cast("decimal(19,0)") * col("ml")).as("num"))
      .join(den, "key")
      .select(col("key"), col("lag").cast("long").as("lag"),
        col("n").as("n_buckets"),
        when(col("den") > 0,
          round(col("num").cast("double") / col("den").cast("double"), 6))
          .otherwise(lit(0.0)).as("acf"))
      .orderBy(col("key"), col("lag"))
  }

  /** Ljung–Box portmanteau test — "is there ANY autocorrelation in the
    * first K lags?", the whiteness check run before trusting [[acfCounts]]
    * lags individually (K near-zero lags can still jointly reject).
    * `Q_K = n(n+2)·Σ_{k≤K} ρ_k²/(n−k)`, χ²(K) under the null.
    *
    * Exactness: the centered products ride the same integer-scaled
    * moments as [[acfCounts]] (m = n·c − S per bucket, HUGEINT/decimal
    * sums), each ρ_k is ONE integer→double division at FULL precision
    * (the rounded acf is re-derived for display only), and the Q chain
    * runs in lag order PARTITIONED by key — the q15 stacked shape, no
    * global window.
    *
    * One row per (key, lag) ordered: `(key, lag, n_buckets, acf, q_run)`
    * — the lag-K row's `q_run` is Q_K. */
  def ljungBoxDF(df: DataFrame, keyCol: String, tsCol: String,
      truncUnit: String = "hour", maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1,64], got $maxLag")
    val counts = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        date_trunc(truncUnit, col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("c"))
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
    val ow = kw.orderBy(col("bucket_ts").asc)
    val m = counts
      .withColumn("n", count(lit(1)).over(kw))
      .withColumn("s", sum(col("c")).over(kw))
      .withColumn("m", col("n") * col("c") - col("s"))
    val withLeads = (1 to maxLag).foldLeft(m) { (d, k) =>
      d.withColumn(s"__l$k", lead(col("m"), k).over(ow))
    }
    val prods = withLeads.select(col("key"), col("n"), col("m"),
      explode(array((1 to maxLag).map(k =>
        struct(lit(k).as("lag"), col(s"__l$k").as("ml"))): _*)).as("p"))
      .select(col("key"), col("n"), col("m"), col("p.lag"), col("p.ml"))
    val den = m.groupBy(col("key"))
      .agg(sum(col("m").cast("decimal(19,0)") * col("m")).as("den"))
    val j = prods.where(col("ml").isNotNull)
      .groupBy(col("key"), col("lag"), col("n"))
      .agg(sum(col("m").cast("decimal(19,0)") * col("ml")).as("num"))
      .join(den, "key")
    val rho = when(col("den") > 0,
      col("num").cast("double") / col("den").cast("double")).otherwise(lit(0.0))
    val nD = col("n").cast("double")
    val term = rho * rho / (col("n") - col("lag")).cast("double")
    val runW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("lag").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    j.withColumn("__term", term)
      .withColumn("q_run", nD * (nD + lit(2.0)) * sum(col("__term")).over(runW))
      .select(col("key"), col("lag").cast("long").as("lag"),
        col("n").as("n_buckets"), round(rho, 6).as("acf"),
        round(col("q_run"), 6).as("q_run"))
      .orderBy(col("key"), col("lag"))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE time buckets per key
    * — uptime/outage segmentation, session-like activity spans on
    * bucketed data. The classic relational trick: bucket index minus the
    * per-key row_number is CONSTANT within a consecutive run, so one
    * partitioned window + one aggregate segments the stream — no
    * stateful scan, pure integers.
    *
    * Returns `(key, start_ts, end_ts, n_buckets, n_events)` per island
    * (epoch-second bounds), ordered. One shuffle to the bucket frame,
    * one partitioned window. */
  def activityIslands(df: DataFrame, keyCol: String, tsCol: String,
      truncUnit: String = "hour"): DataFrame = {
    val stepMicros = truncUnit match {
      case "minute" => 60000000L
      case "hour" => 3600000000L
      case "day" => 86400000000L
      case other => throw new IllegalArgumentException(
        s"unsupported truncUnit '$other' (minute/hour/day)")
    }
    val counts = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        date_trunc(truncUnit, col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket_ts").asc)
    counts
      .withColumn("idx", expr(s"unix_micros(bucket_ts) DIV ${stepMicros}L"))
      .withColumn("grp", col("idx") - row_number().over(w))
      .groupBy(col("key"), col("grp"))
      .agg(min(col("bucket_ts")).cast("long").as("start_ts"),
        max(col("bucket_ts")).cast("long").as("end_ts"),
        count(lit(1)).as("n_buckets"), sum(col("c")).as("n_events"))
      .select(col("key"), col("start_ts"), col("end_ts"), col("n_buckets"),
        col("n_events"))
      .orderBy(col("key"), col("start_ts"))
  }

  /** Time-weighted average value per (key, day) — the TWAP/metrics-
    * averaging primitive: each observation holds until the NEXT one in
    * the same day, so its weight is that gap in microseconds; the day's
    * last observation carries no weight (half-open contract — compose
    * with a day-boundary sentinel upstream when the tail must count).
    *
    * Exactness: values become CENT integers, gaps are exact µs LONGs
    * from a lead window ordered by (ts, id) — the id tie-break makes the
    * pairing deterministic under equal timestamps — and the weighted sum
    * rides DECIMAL(38,0); the single final division (then /100 for
    * units) is the only double op.
    *
    * Plan: one shuffle keyed by (key, day), one partitioned lead window,
    * one map-side-combined aggregate. */
  def twapDaily(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        col(tsCol).as("ts"), col(idCol).as("id"),
        (col(valCol).cast("decimal(12,2)") * 100).cast("long").as("vc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"), col("day"))
      .orderBy(col("ts").asc, col("id").asc)
    base
      .withColumn("gap", unix_micros(lead(col("ts"), 1).over(w)) -
        unix_micros(col("ts")))
      .where(col("gap").isNotNull)
      .groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("vc").cast("decimal(19,0)") * col("gap")).as("wsum"),
        sum(col("gap")).as("gsum"))
      .select(col("key"), col("day").cast("string").as("day"), col("n_gaps"),
        round(col("wsum").cast("double") / col("gsum").cast("double") /
          lit(100.0), 6).as("twap"))
      .orderBy(col("key"), col("day"))
  }

  /** First-order Markov transition matrix over a keyed event stream —
    * the sequence-mining census (what follows what, per-step transition
    * probabilities): successive event kinds within each sequence key
    * (user/session) pair up via ONE partitioned `lead`, the pairs reduce
    * to the kind² transition frame, and row-normalized probabilities come
    * from a window PARTITIONED over that dimension-sized frame.
    *
    * Exactness: counts are LONGs; each probability is ONE integer→double
    * division (correctly rounded in any engine) rounded to 6.
    *
    * Plan: corpus shuffles ONCE keyed by the sequence key for the lead
    * window (high-cardinality key → parallel), then collapses map-side to
    * at most |kinds|² rows; the normalizing window runs on that frame,
    * never on data. The `(ts, tieCol)` order is total (tieCol unique), so
    * the pairing is deterministic on any partitioning. */
  def transitionMatrix(df: DataFrame, seqCol: String, tsCol: String,
      tieCol: String, kindCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(seqCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = df.where(col(seqCol).isNotNull && col(tsCol).isNotNull &&
        col(kindCol).isNotNull)
      .select(col(seqCol), col(tsCol), col(tieCol),
        col(kindCol).cast("string").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .where(col("dst").isNotNull)
    val tr = pairs.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val nw = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    tr.withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(nw).cast("double"), 6))
      .orderBy(col("src"), col("dst"))
  }

  /** Per-key daily EWMA (α = 1/2, adjusted form) — the smoothed trend line
    * a monitoring dashboard draws over [[rollingAnomaly]]'s raw buckets.
    *
    * Exactness without recurrences: with α = 1/2 the adjusted EWMA is
    * `Σᵢ xᵢ·2^(i−1) / (2^t − 1)` over the t present buckets so far — the
    * numerator is a LONG running sum of integer terms (order-independent,
    * partition-proof) and the whole statistic leaves integers in ONE
    * final double division, rounded to 6. Bucket sums go through DECIMAL
    * cents first so the xᵢ are exact.
    *
    * The weight 2^(i−1) is bounded by partitioning per (key, month):
    * i ≤ 31 always, structurally. Exact while max-daily-cents·2³¹ < 2⁶³
    * (≈ sf 1000 on this generator); past that swap the LONG numerator for
    * DECIMAL(38,0) — the shape is unchanged.
    *
    * Plan: one map-side-combined groupBy to the (key, month, day) frame,
    * then two windows PARTITIONED by (key, month) over that dimension-
    * sized frame — nothing global, corpus shuffles once. */
  def ewmaDaily(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val daily = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        date_trunc("month", col(tsCol)).cast("date").as("month"),
        to_date(col(tsCol)).as("day"))
      .agg(sum((col(valCol).cast("decimal(12,2)") * 100).cast("long")).as("vc"))
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"), col("month")).orderBy(col("day").asc)
    val rw = ow.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0L)
    daily
      .withColumn("i", row_number().over(ow).cast("long"))
      .withColumn("wsum", sum(col("vc") * expr("shiftleft(1L, cast(i - 1 as int))")).over(rw))
      .select(col("key"), col("month").cast("string").as("month"),
        col("day").cast("string").as("day"), col("i"),
        round(col("wsum").cast("double") /
          (expr("shiftleft(1L, cast(i as int))") - lit(1L)).cast("double") /
          lit(100.0), 6).as("ewma"))
      .orderBy(col("key"), col("day"))
  }

  /** Day-of-week seasonality census — STL-lite: detrend each daily bucket
    * against its 7-day CENTERED moving average, then average the
    * detrended residuals per (key, weekday). The weekly-pattern detector
    * ([[acfCounts]] says "period 7 exists"; this says what the pattern
    * IS).
    *
    * Exactness: the residual stays RATIONAL — `detr7 = 7·xᵢ − Σ₇ x`
    * (LONG; the /7 never happens row-wise), so the per-weekday mean is
    * `Σ detr7 / (7·cnt)` — integer sums, then one fixed two-division
    * display chain. Only INTERIOR days (full 7-day window over present
    * buckets) contribute, so every residual has the same denominator.
    * Weekday index is collation-proof arithmetic: `(days-since-epoch + 4)
    * mod 7` (0 = Sunday) — no locale, no engine dayofweek convention.
    *
    * Plan: one map-side-combined groupBy to the (key, day) frame, one
    * PARTITIONED ±3-row sliding window, one dimension-sized (key × 7)
    * regroup. Corpus shuffles once. */
  def dowSeasonality(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val daily = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valCol).cast("decimal(12,2)") * 100).cast("long")).as("vc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("day").asc)
      .rowsBetween(-3L, 3L)
    daily
      .withColumn("w7", sum(col("vc")).over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .where(col("n7") === 7L)
      .withColumn("detr7", col("vc") * 7L - col("w7"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01")) + lit(4), lit(7)).cast("long"))
      .groupBy(col("key"), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("detr7")).as("s"))
      .select(col("key"), col("dow"), col("n_days"),
        round(col("s").cast("double") /
          (col("n_days") * 7L).cast("double") / lit(100.0), 6).as("seasonal"))
      .orderBy(col("key"), col("dow"))
  }

  /** Seasonal-naive forecast BACKTEST — the pipeline health-check before
    * any fancier forecaster ships: predict each day's event count with
    * the count from `season` days earlier, score against the 1-day naive
    * baseline. `mase` here is the relative MAE vs that lag-1 naive on the
    * same scored days (< 1 ⟺ the weekly pattern carries real signal).
    *
    * Exactness: day counts are LONGs, absolute errors are LONGs, the two
    * error sums are order-free integer aggregates, and each output is one
    * integer→double division — bit-replayable anywhere.
    *
    * Plan: one map-side-combined groupBy to the (key, day) frame, then
    * two CALENDAR self-joins on (key, day−lag) — gap-aware, unlike a row
    * lag: a missing day yields no (wrong) pairing — and one regroup to
    * key-level. All three frames are day-frame-sized; the corpus shuffles
    * once. Days lacking either prior observation drop (inner joins).
    *
    * One row per key: `(key, n_scored, sae_seasonal, sae_naive,
    * mae_seasonal, mase)` ordered; `mase` NULL when the naive is perfect. */
  def seasonalNaiveBacktest(df: DataFrame, keyCol: String, tsCol: String,
      season: Int = 7): DataFrame = {
    require(season >= 2, s"season must be >= 2 (lag 1 is the baseline), got $season")
    val c = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val ps = c.select(col("key"), date_add(col("day"), season).as("day"),
      col("cnt").as("pred_s"))
    val pn = c.select(col("key"), date_add(col("day"), 1).as("day"),
      col("cnt").as("pred_n"))
    c.join(ps, Seq("key", "day")).join(pn, Seq("key", "day"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("cnt") - col("pred_s"))).as("sae_seasonal"),
        sum(abs(col("cnt") - col("pred_n"))).as("sae_naive"))
      .select(col("key"), col("n_scored"), col("sae_seasonal"),
        col("sae_naive"),
        round(col("sae_seasonal").cast("double") /
          col("n_scored").cast("double"), 6).as("mae_seasonal"),
        when(col("sae_naive") > 0L,
          round(col("sae_seasonal").cast("double") /
            col("sae_naive").cast("double"), 6)).as("mase"))
      .orderBy(col("key"))
  }
}
