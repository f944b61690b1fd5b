package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.BloomMightContainExpr

/** Bloom-filter semi-join pre-filtering — the shuffle-reduction pattern for
  * a fact⋈dim join where the dim side is too large to broadcast-hash-join
  * but its KEY SET fits a bloom sketch. Build once over the dim keys
  * (`Dataset.stat.bloomFilter`, a distributed treeAggregate; the sketch —
  * not the keys — comes back to the driver), then drop fact rows whose key
  * cannot be present BEFORE the join's shuffle. At fact ≫ matches, the
  * shuffle moves `fpp` of the non-matching rows instead of all of them.
  *
  * Spark's own runtime bloom filter (`spark.sql.optimizer.runtime
  * .bloomFilter.enabled`) injects the same shape automatically when the
  * creation side is already filtered and stats make it look worthwhile;
  * this operator is for the cases the optimizer cannot see — a dim whose
  * selectivity comes from upstream computation, a reused filter across
  * several fact scans, or a pipeline that builds the sketch once per day.
  *
  * Scale guard: the sketch's size is `expectedItems`-driven (~1.2 bytes
  * per item at 3% fpp). `maxSketchBytes` refuses a bloom too big to ship
  * per-task (Spark's own runtime filter caps at 8 MB by default) — raise
  * it deliberately or raise `fpp` instead.
  */
object Bloom {

  /** Approximate pre-filter: rows of `fact` whose `factKey` (long) might be
    * in `dim`'s `dimKey` set. False positives pass through (fpp-bounded);
    * false negatives cannot occur. */
  def semiFilter(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03,
      maxSketchBytes: Long = 64L << 20): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bytes = bloom.bitSize() / 8
    require(bytes <= maxSketchBytes,
      s"bloom sketch is $bytes bytes (> $maxSketchBytes): raise fpp or " +
        "maxSketchBytes, or broadcast-join instead")
    fact.where(BloomMightContainExpr.mightContain(col(factKey), bloom))
  }

  /** Exact inner join with the bloom pre-filter in front: identical result
    * to `fact.join(dim, fact(factKey) === dim(dimKey))` — the join removes
    * the sketch's false positives — but only might-match fact rows reach
    * the join's exchange. */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pre = semiFilter(fact, dim, factKey, dimKey, expectedItems, fpp)
    pre.join(dim, pre(factKey) === dim(dimKey))
  }

  /** Count the dim's non-null keys for bloom sizing. A distinct-free,
    * column-pruned count — one cheap scan of one column, and the price of
    * NOT guessing: a sketch sized for 1/10th of the real key set doesn't
    * fail, it silently degrades (measured in BloomSpec: ~40% actual fpp for
    * a nominal 3% at items = 10x expected), which defeats the pre-filter's
    * whole purpose while still paying for the scan and the sketch. */
  private def sizeFor(dim: DataFrame, dimKey: String): Long =
    dim.select(dimKey).where(col(dimKey).isNotNull).count().max(1L)

  /** Auto-sized variant: derives `expectedItems` from a count of the dim's
    * non-null keys, trading one extra dim scan for a sketch whose actual
    * fpp matches the nominal one. Use the explicit-size overload when the
    * caller already knows the cardinality (a catalog stat, a previous
    * count) and wants to skip the scan. NOTE: deliberately NOT an
    * `(..., fpp: Double)` overload next to `(..., expectedItems: Long)` —
    * numeric widening would let a count literal silently resolve as fpp. */
  def semiFilterAuto(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, fpp: Double = 0.03): DataFrame =
    semiFilter(fact, dim, factKey, dimKey, sizeFor(dim, dimKey), fpp)

  def prefilteredJoinAuto(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, fpp: Double = 0.03): DataFrame =
    prefilteredJoin(fact, dim, factKey, dimKey, sizeFor(dim, dimKey), fpp)
}
