package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) L2 regression for probability
  * calibration — the classic PAVA fit expressed RELATIONALLY via the
  * minimax identity, so the whole fit stays on the cluster with no driver
  * loop at all (NOT-IN-REFERENCE extension; kinship: m11 calibrates per
  * tree leaf, this calibrates any monotone score; r3's SABHA uses the
  * same PAVA under ADMM).
  *
  * The minimax identity (Barlow et al. 1972, Thm 1.7): the isotonic fit at
  * cell t equals `max_{i ≤ t} min_{j ≥ t} mean(y over cells i..j)`
  * (weighted). That makes the fit a pure function of the CELL frame —
  * distinct score values with their (count, positives) — which is the
  * r37 sufficient-statistics doctrine: one corpus-sized groupBy, then
  * everything downstream is cell-level. With k distinct cells the pair
  * frame is O(k²) and the (i,t,j) scan O(k³) rows of integer arithmetic —
  * trivial for a calibration axis (k ≲ hundreds), regardless of corpus
  * size. Every mean is one long/long division; min/max over those doubles
  * is order-independent, so the result replays bit-exactly in any SQL
  * engine — no exported artifact needed.
  */
object Isotonic {

  /** The bounded cell frame: one corpus pass, `(cell, w, sy)` with
    * `w` = rows and `sy` = positive labels per distinct score cell. */
  def cells(df: DataFrame, scoreCell: Column, label: Column): DataFrame =
    df.where(scoreCell.isNotNull && label.isNotNull)
      .groupBy(scoreCell.as("cell"))
      .agg(count(lit(1)).as("w"),
        sum(label.cast("long")).as("sy"))

  /** Isotonic calibration over the cell frame: returns
    * `(cell, w, rate, iso)` ordered by cell, where `rate = sy/w` is the
    * raw per-cell positive rate and `iso` its isotonic fit (both rounded
    * to 6; the minimax comparisons run on the RAW doubles). */
  def fitCells(cellFrame: DataFrame): DataFrame = {
    val c = cellFrame.select(col("cell"), col("w"), col("sy"))
    // inclusive cumulative (cw, cy) per cell via a cell-level self-join —
    // k² rows, no global window
    val cum = c.as("a").join(c.as("b"), col("b.cell") <= col("a.cell"))
      .groupBy(col("a.cell").as("cell"))
      .agg(max(col("a.w")).as("w"), max(col("a.sy")).as("sy"),
        sum(col("b.w")).as("cw"), sum(col("b.sy")).as("cy"))
    // range means m(i,j) = (cy_j − cy_i + sy_i) / (cw_j − cw_i + w_i)
    val lo = cum.select(col("cell").as("i"),
      (col("cw") - col("w")).as("cwe"), (col("cy") - col("sy")).as("cye"))
    val hi = cum.select(col("cell").as("j"), col("cw").as("cwj"),
      col("cy").as("cyj"))
    val means = lo.join(hi, col("j") >= col("i"))
      .select(col("i"), col("j"),
        ((col("cyj") - col("cye")).cast("double") /
          (col("cwj") - col("cwe")).cast("double")).as("m"))
    // for each (i, t): the inner min over j ≥ t; then per t the outer max
    // over i ≤ t. The t grid is the cell set itself.
    val grid = c.select(col("cell").as("t"))
    val inner = means.join(grid, col("t") >= col("i") && col("t") <= col("j"))
      .groupBy(col("i"), col("t")).agg(min(col("m")).as("inner_min"))
    val iso = inner.groupBy(col("t").as("cell"))
      .agg(max(col("inner_min")).as("iso0"))
    c.join(iso, Seq("cell"))
      .select(col("cell"), col("w"),
        round(col("sy").cast("double") / col("w").cast("double"), 6)
          .as("rate"),
        round(col("iso0"), 6).as("iso"))
      .orderBy(col("cell"))
  }

  /** Weighted pool-adjacent-violators, driver-side — the spec's
    * equivalence reference for [[fitCells]] (the minimax identity). */
  private[graft] def pavaWeighted(w: Array[Double], y: Array[Double])
      : Array[Double] = {
    require(w.length == y.length)
    val n = y.length
    if (n == 0) return Array.empty
    // blocks as (weight, mean, count) — merge backwards while decreasing
    val bw = new Array[Double](n); val bm = new Array[Double](n)
    val bc = new Array[Int](n)
    var top = -1
    for (k <- 0 until n) {
      top += 1; bw(top) = w(k); bm(top) = y(k); bc(top) = 1
      while (top > 0 && bm(top - 1) > bm(top)) {
        val tw = bw(top - 1) + bw(top)
        bm(top - 1) = (bm(top - 1) * bw(top - 1) + bm(top) * bw(top)) / tw
        bw(top - 1) = tw; bc(top - 1) += bc(top); top -= 1
      }
    }
    val out = new Array[Double](n); var pos = 0
    for (b <- 0 to top; _ <- 0 until bc(b)) { out(pos) = bm(b); pos += 1 }
    out
  }
}
