package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-dup detection: the continuous-ingest counterpart
  * of `Dedup.minHashMd5Pairs` (d8). Each arriving document computes its
  * md5-slice MinHash signature ROW-LOCALLY (no aggregation — the signature
  * is a per-row expression, so the only stateful operator in the stream is
  * the bucket store), fans out into `bands` band-key rows, and each
  * (band, key) bucket keeps the documents seen in it. A new arrival whose
  * full signature agrees with a stored one on ≥ `minAgree` of `k` slots
  * emits a (doc_id, dup_of, agree) match.
  *
  * State bounding (the 100 TB contract): buckets expire `lateness` of EVENT
  * time after their last arrival (event-time timeout under the watermark),
  * and each bucket holds at most `maxBucketSize` docs — the same mega-bucket
  * cap as the batch path (an over-full bucket is a hash pileup with no
  * near-dup signal). Unbounded-history near-dup of a stream belongs in the
  * batch engine by design.
  *
  * The same banding S-curve as batch MinHash applies: a pair agreeing on
  * `agree/k` of slots collides in some band with probability
  * 1-(1-(agree/k)^rowsPerBand)^bands.
  *
  * A pair colliding in SEVERAL bands is emitted exactly once, by its OWNING
  * band — the lowest band index on which the two full signatures' band keys
  * agree, recomputable locally in every colliding bucket from the stored
  * signatures (matching the batch twin's one-row-per-pair contract). If the
  * owning band's bucket dropped the earlier doc to the `maxBucketSize` cap,
  * that pair is lost, as any capped bucket's pairs already are. */
object StreamingNearDup {

  final case class DocArrival(doc_id: Long, ts: java.sql.Timestamp,
      band: Int, key: String, sig: Seq[String])
  final case class Match(doc_id: Long, dup_of: Long, agree: Int)
  /** Bucket store (public: the state encoder's generated code must reach
    * the accessors). */
  final case class Bucket(ids: Seq[Long], sigs: Seq[Seq[String]])

  /** `docs` needs (doc_id: long, ts: timestamp, text: string). `k` md5
    * slices grouped into `bands` bands of `k/bands` rows each. */
  def matches(docs: DataFrame, k: Int = 8, bands: Int = 4, n: Int = 3,
      minAgree: Int = 6, lateness: String = "1 hour",
      maxBucketSize: Int = 50): Dataset[Match] = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    require(k >= 1 && k <= 8, s"k 4-hex slices must fit one md5 digest, got $k")
    import docs.sparkSession.implicits._
    val rowsPerBand = k / bands
    // row-local signature: one md5 per shingle, slice minima per slot
    val h = transform(graft.dedup.Dedup.shingles(col("text"), n),
      s => md5(s))
    val sig = array((0 until k).map(j =>
      array_min(transform(h, x => x.substr(j * 4 + 1, 4)))): _*)
    val banded = docs
      .select(col("doc_id"), col("ts"), sig.as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          concat_ws("", (0 until rowsPerBand).map(r =>
            col("sig").getItem(b * rowsPerBand + r)): _*)): _*))
          .as(Seq("band", "key")))
      .withWatermark("ts", lateness)
      .as[DocArrival]
    // lowest band on which the two signatures' band keys agree — the band
    // that OWNS (solely emits) the pair; defined whenever the pair collides
    // anywhere, so `.get` is safe at every call site below
    def owningBand(x: Seq[String], y: Seq[String]): Int =
      (0 until bands).find(b => (0 until rowsPerBand)
        .forall(r => x(b * rowsPerBand + r) == y(b * rowsPerBand + r))).get
    banded
      .groupByKey(a => (a.band, a.key))
      .flatMapGroupsWithState[Bucket, Match](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (bandKey: (Int, String), rows: Iterator[DocArrival], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = rows.toSeq.sortBy(a => (a.ts.getTime, a.doc_id))
            var bucket = state.getOption.getOrElse(Bucket(Nil, Nil))
            val out = Seq.newBuilder[Match]
            arrivals.foreach { a =>
              var i = 0
              while (i < bucket.ids.size) {
                if (bucket.ids(i) != a.doc_id &&
                    owningBand(a.sig, bucket.sigs(i)) == bandKey._1) {
                  val agree = bucket.sigs(i).zip(a.sig).count(p => p._1 == p._2)
                  if (agree >= minAgree) out += Match(a.doc_id, bucket.ids(i), agree)
                }
                i += 1
              }
              if (bucket.ids.size < maxBucketSize && !bucket.ids.contains(a.doc_id))
                bucket = Bucket(bucket.ids :+ a.doc_id, bucket.sigs :+ a.sig)
            }
            state.update(bucket)
            // expire the bucket `lateness` past this batch's newest arrival;
            // the timeout must sit beyond the current watermark, which the
            // watermark delay on ts guarantees for in-order buckets
            state.setTimeoutTimestamp(arrivals.map(_.ts.getTime).max, lateness)
            out.result().iterator
          }
      }
  }
}
