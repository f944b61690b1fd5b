package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item–item co-occurrence similarity (NOT-IN-REFERENCE §2.9 extension —
  * the set-based recommender primitive next to [[Embeddings]]' dense
  * cosine and `AssociationRules`' thresholded rules: the FULL pairwise
  * similarity frame, exact, from basket co-membership alone).
  *
  * `cos(a,b) = n_ab / √(n_a·n_b)` over binary basket-membership vectors —
  * every number is an integer count, so the one final divide is the only
  * FP step and a relational replay hash-matches.
  *
  * Scale shape: baskets dedup to (basket, item) edges; the pair join is a
  * SELF-JOIN ON THE BASKET KEY, so fan-out is C(k,2) per basket, bounded
  * by `maxBasketSize` (oversized baskets — carts-of-everything, crawler
  * sessions — are dropped BEFORE the join; at 100 TB they are the entire
  * skew story). Item totals join back at item-pair granularity; no
  * all-pairs product anywhere. */
object Cooccurrence {

  /** `(item_a, item_b, n_ab, n_a, n_b, cosine)` for unordered item pairs
    * co-occurring in at least `minCount` baskets, `item_a < item_b`,
    * ordered by the pair. NULL baskets/items drop; duplicate (basket,
    * item) rows count once; baskets above `maxBasketSize` drop whole.
    *
    * Plan shape (r13): the basket-size gate is a count WINDOW on the same
    * `bk` partitioning the self-join needs anyway — one exchange serves
    * the gate and both join sides (the old groupBy+join spent two) — and
    * the gated edge frame is PINNED: it feeds three consumers (item
    * totals, both self-join sides), each of which would otherwise re-run
    * the corpus distinct. `broadcastTotals` broadcasts the item-totals
    * side into the two back-joins (zero exchanges); callers must only set
    * it when the ITEM vocabulary is bounded (catalog-sized — n19's
    * partkeys), never for open-ended vocabularies. */
  def itemPairs(df: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 2L, maxBasketSize: Int = 100,
      broadcastTotals: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = {
      val e0 = df.where(col(basketCol).isNotNull && col(itemCol).isNotNull)
        .select(col(basketCol).as("bk"), col(itemCol).as("it")).distinct()
      e0.withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("bk"))))
        .where(col("__bsz") <= maxBasketSize).drop("__bsz")
    }.localCheckpoint()
    val totals0 = e.groupBy(col("it")).agg(count(lit(1)).as("n_item"))
    val totals = if (broadcastTotals) broadcast(totals0) else totals0
    val pairs = e.select(col("bk"), col("it").as("item_a"))
      .join(e.select(col("bk"), col("it").as("item_b")), "bk")
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    pairs
      .join(totals.select(col("it").as("item_a"), col("n_item").as("n_a")),
        "item_a")
      .join(totals.select(col("it").as("item_b"), col("n_item").as("n_b")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(col("n_ab").cast("double") /
          sqrt((col("n_a") * col("n_b")).cast("double")), 6).as("cosine"))
      .orderBy(col("item_a"), col("item_b"))
  }
}
