package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.text.TextOps

/** Deduplication operators for large-scale training-data pipelines
  * (NOT-IN-REFERENCE extension): exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by a *bucketing* key
  * (content hash, LSH band bucket, SimHash chunk) so candidate generation is
  * a hash-partitioned `groupBy`/equi-join, never an O(n²) cross join. The
  * only quadratic work is within-bucket pair expansion, which LSH band
  * parameters keep small by construction.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups by content hash: (hash, keep_id = min id, n). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the lowest-id row per distinct content. One shuffle on
    * the content hash; no window needed (min-struct beats row_number: partial
    * aggregation map-side vs full sort per partition). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val rest = df.columns.filter(_ != idCol).map(c => col("__keep." + c).as(c))
    df.groupBy(md5(col(textCol)).as("__h"))
      .agg(min_by(struct(df.columns.map(col): _*), col(idCol)).as("__keep"))
      .select(col("__keep." + idCol).as(idCol) +: rest.toSeq: _*)
      .drop("__h")
  }

  // -------------------------------------------------------------- minhash

  /** Distinct word n-gram shingles of a text column. */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(c)
    when(size(toks) < n, array_distinct(array(concat_ws(" ", toks))))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Deterministic (a, b) permutation constants for k MinHash functions. */
  private def perms(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(k)((rng.nextLong() | 1L, rng.nextLong()))
  }

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** MinHash signature (array<long>, length k) over a shingle array.
    * h_j(s) = ((a_j * xxhash64(s) + b_j) wrapping) mod p — long wrap is
    * deterministic, which is all a hash family needs. */
  def minHashSignature(shinglesCol: Column, k: Int = 64, seed: Long = 42L): Column = {
    val hs = transform(shinglesCol, s => xxhash64(s))
    val sig = perms(k, seed).map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * lit(a) + lit(b), lit(MersennePrime))))
    }
    array(sig: _*)
  }

  /** Hash each of `bands` signature slices to a bucket id. Docs sharing ANY
    * band bucket become candidate pairs (standard banding: P[candidate] =
    * 1-(1-j^r)^b for true Jaccard j, r = k/bands). */
  def bandHashes(sigCol: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands
    array((0 until bands).map { b =>
      xxhash64(concat_ws(",", lit(b.toString),
        concat_ws(",", transform(slice(sigCol, b * r + 1, r), _.cast("string")))))
    }: _*)
  }

  /** MinHash+LSH near-duplicate candidate pairs with signature-estimated
    * Jaccard. Output: (id_a, id_b, est_jaccard), id_a < id_b.
    *
    * Plan shape: one projection computes signatures (no shuffle), one
    * explode×groupBy-style equi-join on (band, bucket) generates candidates
    * (shuffle on bucket — bounded by band collisions, never all-pairs), one
    * aggregate dedups pairs found in multiple bands.
    */
  def minHashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      seed: Long = 42L): DataFrame = {
    val sigDf = df.select(
        col(idCol).as("id"),
        minHashSignature(shingles(col(textCol), shingleN), k, seed).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(bandHashes(col("sig"), k, bands)).as(Seq("band", "bucket")))
    val a = sigDf.alias("a")
    val b = sigDf.alias("b")
    val k_ = k.toDouble
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (aggregate(zip_with(col("a.sig"), col("b.sig"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v) / lit(k_)).as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
  }

  /** Near-duplicate pairs above an estimated-Jaccard threshold. */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      seed: Long = 42L): DataFrame =
    minHashCandidates(df, idCol, textCol, shingleN, k, bands, seed)
      .where(col("est_jaccard") >= threshold)

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 votes from each
    * token's xxhash64, sign → bit. Near-dups have small Hamming distance.
    * Pure SQL higher-order functions (column-typed shift amounts need the
    * SQL `shiftright`, which accepts expressions for both args). */
  def simHash64(textColName: String): Column = {
    val toksSql = s"filter(split(trim(`$textColName`), '\\\\s+'), x -> x != '')"
    val votes = // array<long> length 64: sum of ±1 per bit
      s"""transform(sequence(0, 63), b ->
            aggregate($toksSql, 0L,
              (acc, t) -> acc + CASE WHEN (shiftright(xxhash64(t), CAST(b AS INT)) & 1) = 1
                                     THEN 1 ELSE -1 END))"""
    val fold =
      s"""aggregate(zip_with($votes, transform(sequence(0, 63), b -> shiftleft(1L, CAST(b AS INT))),
                             (v, p) -> CASE WHEN v > 0 THEN p ELSE 0L END),
                    0L, (acc, x) -> acc + x)"""
    expr(fold)
  }

  /** SimHash near-duplicate candidates: docs sharing at least one of four
    * 16-bit chunks (pigeonhole: any pair within Hamming distance 3 shares a
    * chunk), verified by exact Hamming distance ≤ `maxHamming`. */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), simHash64(textCol).as("sig"))
      .select(col("id"), col("sig"), posexplode(array(
        (0 until 4).map(i => expr(s"shiftright(sig, ${i * 16}) & 65535")): _*))
        .as(Seq("chunk", "chunk_val")))
    val a = withSig.alias("a"); val b = withSig.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("hamming")).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Exact n-gram Jaccard for a bounded candidate window (|id_b - id_a| ≤
    * `window`). The bounded band keeps the join linear; unbounded exact
    * Jaccard at scale should go through [[minHashCandidates]] first and
    * verify only candidates. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, window: Long = 25): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    val a = sh.alias("a"); val b = sh.alias("b")
    a.join(b, col("b.id") > col("a.id") && col("b.id") <= col("a.id") + window)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
  }
}
