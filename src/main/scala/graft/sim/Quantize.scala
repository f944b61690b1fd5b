package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension affine int8 quantization of an embedding column — the
  * storage-compression step an embedding corpus needs at 100 TB (4×
  * smaller than float32, 8× than float64; ADC-style scoring reads codes
  * only). NOT-IN-REFERENCE extension of the §2.9 vector family.
  *
  * Contract: `code = floor((v − vmin)·255/(vmax − vmin) + 0.5)` per
  * dimension (nearest-code rounding via `floor(x + 0.5)` — `round()`
  * half-up/half-even conventions differ across engines, `floor` doesn't),
  * `dequant = vmin + code·(vmax − vmin)/255`. Every operation is a single
  * correctly-rounded double op over float-exact inputs, so the codes and
  * the per-dim error census replay bit-for-bit relationally.
  *
  * Plan: two passes over the vectors — one map-side-combined groupBy to
  * the D-row min/max frame, then a narrow second pass with the stats
  * BROADCAST back, aggregating per-dim code stats (map-side to D groups).
  * The corpus never shuffles; no corpus-sized window. */
object Quantize {

  /** Per-dimension profile `(dim, n, vmin, vmax, code_sum, code_min,
    * code_max, max_abs_err)` ordered by `dim`. Constant dimensions
    * (vmax = vmin) code to 0 with zero error. NULL vectors drop. */
  def int8ProfileDF(df: DataFrame, vecCol: String): DataFrame = {
    val ex = df.where(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("v"))
    val stats = ex.groupBy(col("dim"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        count(lit(1)).as("n"))
    val joined = ex.join(broadcast(stats), "dim")
    val span = col("vmax") - col("vmin")
    val code = when(col("vmax") > col("vmin"),
        floor((col("v") - col("vmin")) * lit(255.0) / span + lit(0.5)))
      .otherwise(lit(0.0)).cast("long")
    val deq = col("vmin") + col("code").cast("double") * span / lit(255.0)
    joined
      .withColumn("code", code)
      .withColumn("err", abs(col("v") - deq))
      .groupBy(col("dim"), col("n"), col("vmin"), col("vmax"))
      .agg(sum(col("code")).as("code_sum"),
        min(col("code")).as("code_min"),
        max(col("code")).as("code_max"),
        round(max(col("err")), 6).as("max_abs_err"))
      .select(col("dim"), col("n"), col("vmin"), col("vmax"),
        col("code_sum"), col("code_min"), col("code_max"), col("max_abs_err"))
      .orderBy(col("dim"))
  }
}
