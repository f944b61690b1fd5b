package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators (NOT-IN-REFERENCE extension, same
  * family as the dedup/text ops): sequence packing and benchmark
  * decontamination — the two steps between "clean documents" and "training
  * batches" in an LLM data pipeline.
  */
object Corpus {

  /** Concat-then-chunk packing map: documents are laid out in `orderCol`
    * order as one continuous token stream and cut into fixed `budget`-token
    * training sequences (the standard pretraining packing). Returns the
    * provenance map — per document its token offset and the first/last
    * chunk ids it lands in — which is what attribution, dedup-audit, and
    * loss-masking downstream need.
    *
    * Scale: ONE global ordered window computes the running offset; the rows
    * are per-DOCUMENT (not per token), so this sorts the doc-metadata frame
    * only. Beyond single-sort scale, partition the corpus into shards
    * upstream (shard column + per-shard offsets, then add exact shard base
    * offsets — same two-phase cumsum every distributed scan uses). */
  def chunkMap(df: DataFrame, idCol: String, textCol: String,
      budget: Int, orderCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val ord = col(orderCol.getOrElse(idCol))
    val w = Window.orderBy(ord)
    df.select(col(idCol), TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("start_chunk", (col("start_offset") / budget).cast("long"))
      .withColumn("end_chunk",
        (greatest(col("start_offset") + col("n_tokens") - 1, col("start_offset"))
          / budget).cast("long"))
  }

  /** Benchmark decontamination: training docs sharing at least `minShared`
    * distinct word `n`-gram shingles with any eval doc. The join key is the
    * shingle STRING (exact, engine-neutral); the eval side of an n-gram
    * contamination check is benchmark-sized — broadcast it so the scan of
    * the training corpus never shuffles. Output: one row per contaminated
    * (train, eval) pair with the shared-shingle count. */
  def contamination(train: DataFrame, trainId: String,
      eval: DataFrame, evalId: String, textCol: String,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    def sh(df: DataFrame, id: String, as: String) =
      df.select(col(id).as(as),
        explode(graft.dedup.Dedup.shingles(col(textCol), n)).as("s"))
    sh(train, trainId, "train_id")
      .join(broadcast(sh(eval, evalId, "eval_id")), Seq("s"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .where(col("shared_shingles") >= minShared)
  }
}
