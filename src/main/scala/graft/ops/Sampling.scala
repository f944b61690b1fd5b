package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (NOT-IN-REFERENCE
  * extension). `df.sample()` draws per-partition from a seeded RNG — the
  * selected rows CHANGE whenever partitioning changes, which breaks
  * reproducibility across cluster sizes and engine versions. Content-hash
  * sampling decides per ROW from a stable key, so the same rows are chosen
  * on any layout, any engine (md5 is md5 everywhere), and re-runs are
  * incremental-friendly: adding new rows never flips old decisions. */
object Sampling {

  /** Hex-prefix threshold for `rate` over the first 4 md5 nibbles. Clamped
    * to "ffff": a 5-char "10000" would compare lexicographically SMALLER
    * than most 4-char hex prefixes and invert the filter, so rates within
    * 1/131072 of 1.0 keep 65535/65536 of rows (documented granularity). */
  private[ops] def hexThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    // a positive rate below half the 1/65536 granularity rounds to "0000"
    // and silently keeps ZERO rows — fail fast instead of sampling nothing.
    // Rates in [1/131072, 1/65536) round UP to one granule and stay legal.
    require(rate == 0 || math.round(rate * 65536) > 0,
      f"rate $rate%g rounds to 0 at the 1/65536 sampling granularity (would keep 0 rows); " +
        "use rate = 0 for none or widen the key-hash prefix")
    f"${math.min(65535L, math.round(rate * 65536)).toInt}%04x"
  }

  /** Keep rows whose md5(key) falls below the rate threshold —
    * a deterministic ~`rate` sample, stable under repartitioning.
    * Granularity is 1/65536; exact fraction depends on hash uniformity. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    if (rate >= 1.0) df
    else df.where(substring(md5(key.cast("string")), 1, 4) < lit(hexThreshold(rate)))

  /** Per-stratum rates: rows in strata not listed are dropped (the
    * `sampleBy` contract), but decisions stay content-hash-deterministic.
    * A rate ≥ 1.0 keeps the WHOLE stratum (no hash filter). */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "need at least one stratum rate")
    val hex = substring(md5(key.cast("string")), 1, 4)
    val cond = rates.map { case (s, r) =>
      if (r >= 1.0) stratum === s
      else stratum === s && hex < lit(hexThreshold(r))
    }.reduce(_ || _)
    df.where(cond)
  }
}
