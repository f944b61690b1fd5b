package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Sign (1-bit) quantization: pack the vector's sign bits into
    * `ceil(dim/wordBits)` longs, MSB-first within each word via the pure
    * `acc·2 + bit` chain (no shift builtins needed, and 32-bit words keep
    * every intermediate far below 2^63 — engines that ERROR on BIGINT
    * overflow replay it safely). Bit = 1 iff the coordinate is > 0.
    * 32× smaller than float32 — the memory-bound ANN trick: Hamming
    * distance over words approximates angular distance (Charikar 2002). */
  def signWords(vec: Column, dim: Int, wordBits: Int = 32): Column = {
    require(dim > 0 && wordBits > 0 && wordBits <= 32)
    val nWords = (dim + wordBits - 1) / wordBits
    array((0 until nWords).map { w =>
      val hi = math.min((w + 1) * wordBits, dim)
      (w * wordBits until hi).foldLeft(lit(0L)) { (acc, i) =>
        acc * 2 + when(element_at(vec, i + 1) > 0.0, lit(1L)).otherwise(lit(0L))
      }
    }: _*)
  }

  /** Hamming distance between two sign-word arrays: Σ popcount(xor). */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Binary-quantized top-k with exact rerank: for each query row, the k
    * Hamming-nearest corpus rows (rank_h; ties → smaller corpus id), each
    * then re-ranked by EXACT cosine within the candidate set (rank_c).
    * The scan side carries only `ceil(dim/32)` longs per row — the
    * 100 TB shape: full-precision vectors are touched only for the k·|Q|
    * survivors. Hamming is integer-exact; the cosine rerank replays via
    * the same sequential dot-product arithmetic both engines share.
    *
    * The Hamming pass is DUPLICATE-RATE GATED (r13, closing the r12
    * verdict's n20 item): one exact aggregate measures how much the
    * corpus's sign words collapse, and
    *
    *  - dup-HEAVY corpora (near-dup cliques quantize identically, ≥25%
    *    collapse) rank DISTINCT CELLS: the per-query rank shuffle carries
    *    cells×|Q| rows instead of |C|×|Q|, and only cells whose
    *    strictly-closer mass is ≤ k fan back out to rows — the r12 cell
    *    path (sf1 clique data: 1.87 → 1.57 s);
    *  - dup-LIGHT corpora (cells ≈ rows) rank rows DIRECTLY — the cell
    *    machinery there is a pure extra groupBy + second window + join
    *    per query (sf0.1 isolated best-of-5: 1.63 s celled vs 1.15 s
    *    direct).
    *
    * Both branches produce IDENTICAL rows (QuantizeSpec pins it): the
    * gate is a plan choice, and the exact countDistinct makes it a pure
    * function of the data multiset. */
  def binaryTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int): DataFrame = {
    val cw = corpus.where(col(corpusVec).isNotNull)
      .select(col(corpusId).as("corpus_id"),
        signWords(col(corpusVec), dim).as("__cw"))
    val q = queries.where(col(queryVec).isNotNull)
      .select(col(queryId).as("query_id"),
        signWords(col(queryVec), dim).as("__qw"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
    val st = cw.agg(count(lit(1)).as("nr"),
      count_distinct(col("__cw")).as("nc")).head()
    val (nRows, nCells) = (st.getLong(0), st.getLong(1))
    val survivors = if (nCells * 4 <= nRows * 3) {
      val cells = cw.groupBy(col("__cw"))
        .agg(count(lit(1)).as("__cn"), min(col("corpus_id")).as("__cmin"))
      // cumulative mass of strictly-closer cells ((hamming, min-id) is a
      // total order on cells); a cell can still contribute to the row-level
      // top-k iff < k+1 rows precede it
      val beforeW = w.orderBy(col("hamming").asc, col("__cmin").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val keptCells = cells.join(broadcast(q), lit(true))
        .select(col("__cw"), col("query_id"), col("__cn"), col("__cmin"),
          hamming(col("__cw"), col("__qw")).as("hamming"))
        .withColumn("__before", coalesce(sum(col("__cn")).over(beforeW), lit(0L)))
        .where(col("__before") <= k)
        .select(col("query_id"), col("__cw"), col("hamming"))
      // fan the kept cells back out to rows (broadcast equi-join on the
      // sign words — the corpus never shuffles), apply the self-exclusion,
      // and rank the ≤ (k + boundary-cell)-row per-query frame exactly
      cw.join(broadcast(keptCells), Seq("__cw"))
        .where(col("corpus_id") =!= col("query_id"))
        .select(col("corpus_id"), col("query_id"), col("hamming"))
        .withColumn("rank_h", row_number().over(
          w.orderBy(col("hamming").asc, col("corpus_id").asc)))
        .where(col("rank_h") <= k)
    } else {
      cw.join(broadcast(q), col("corpus_id") =!= col("query_id"))
        .select(col("corpus_id"), col("query_id"),
          hamming(col("__cw"), col("__qw")).as("hamming"))
        .withColumn("rank_h", row_number().over(
          w.orderBy(col("hamming").asc, col("corpus_id").asc)))
        .where(col("rank_h") <= k)
    }
    // rerank join-back: survivors (k·|Q| rows) broadcast onto the corpus
    // scan — an equi-join, no corpus shuffle; query vectors re-attach from
    // the already-small broadcast query side
    val cv = corpus.where(col(corpusVec).isNotNull)
      .select(col(corpusId).as("corpus_id"), col(corpusVec).as("__cv"))
    val qv = queries.where(col(queryVec).isNotNull)
      .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    cv.join(broadcast(survivors), "corpus_id")
      .join(broadcast(qv), "query_id")
      .withColumn("cos", graft.sim.Embeddings.cosine(
        graft.sim.Embeddings.asDouble(col("__cv")),
        graft.sim.Embeddings.asDouble(col("__qv"))))
      .withColumn("rank_c", row_number().over(
        w.orderBy(col("cos").desc, col("corpus_id").asc)))
      .select(col("query_id"), col("corpus_id"), col("hamming"),
        col("rank_h").cast("long").as("rank_h"),
        col("rank_c").cast("long").as("rank_c"))
      .orderBy(col("query_id"), col("rank_h"))
  }
}
