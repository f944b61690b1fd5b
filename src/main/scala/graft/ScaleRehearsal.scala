package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 scale rehearsal: synthesize a `replicas`× (default 10×) copy of the
  * sf0.1 `documents`/`embeddings` tables and run the three heaviest
  * pipelines — d2 MinHash near-dup, n2 embedding LSH, t11 corpus report —
  * printing wall seconds, row counts, and plan health (loop joins, hash
  * exchange count) per query.
  *
  * Replicas are id-offset and DETERMINISTICALLY PERTURBED (a text suffix;
  * small per-dim vector noise), so each source row becomes a near-dup
  * clique of `replicas` members. That is deliberately adversarial: the
  * LSH band/chunk buckets and the candidate-pair stages see clique pileups
  * ~`replicas`× denser than a neutral scale-up, exercising exactly the
  * mega-bucket caps and owning-band emission the 100 TB story relies on.
  * Synthetic data is written OUTSIDE the repo (default: the temp dir) and
  * is a rehearsal input only — correctness always runs on the driver's
  * testdata.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1)
      else sys.props("java.io.tmpdir") + "/graft-sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // generate once; gated on the _SUCCESS marker of the table written LAST
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, "embeddings.parquet", "_SUCCESS"))) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val docOff = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
      (0 until replicas).map { i =>
        docs.select(
          (col("doc_id") + lit(i.toLong * docOff)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(col("text"), lit(s" rehearsal replica $i"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val vecOff = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
      (0 until replicas).map { i =>
        emb.select(
          (col("vec_id") + lit(i.toLong * vecOff)).as("vec_id"),
          (if (i == 0) col("embedding")
           else transform(col("embedding"), (x, j) =>
             (x + ((((col("vec_id") * lit(i.toLong) + j.cast("long")) % 13) - 6)
               .cast("float") / lit(400.0f)))
               .cast("float"))).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"REHEARSAL generated ${replicas}x tables under $out")
    }

    Seq("d2_minhash_neardup", "n2_ann_lsh", "t11_corpus_report",
        "t12_chunk_explode", "t13_vocab_encode", "n6_pq_probe").foreach { q =>
      // construction inside the timer, exactly like Bench: queries with
      // driver-side stages (t13's vocab collect, n3's fit) run jobs there
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, out)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val loops = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(f"REHEARSAL $q%-22s $sec%8.2f s  rows=$n%-8d loopJoin=$loops hashExchanges=$hashEx")
    }
    spark.stop()
  }
}
