package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  /** 24 hourly buckets: baseline ~3/hour, then a sustained +2 shift. */
  private val counts: Seq[(Long, Long)] =
    (0 until 12).map(h => (h.toLong, 3L + (h % 2))) ++
      (12 until 24).map(h => (h.toLong, 5L + (h % 2)))

  test("streaming CUSUM equals the batch reflection identity, latch persists") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    // target2 = 7 (k = 3.5), threshold2 = 10 (h = 5)
    val q = StreamingCusum.cusumUpdates(input.toDS(), target2 = 7L,
      threshold2 = 10L)
      .writeStream.format("memory").queryName("cusum_test")
      .outputMode("update").start()
    try {
      counts.grouped(5).foreach { b =>
        input.addData(b.map { case (h, c) => ("m", h * 3600L * 1000000L, c) }: _*)
        q.processAllAvailable()
      }
      val last = spark.table("cusum_test")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3),
          r.getBoolean(4))).maxBy(_._1)
      // direct batch recurrence over the same sequence
      var s = 0L; var alarmedEver = false
      counts.foreach { case (_, c) =>
        s = math.max(0L, s + 2L * c - 7L)
        if (s >= 10L) alarmedEver = true
      }
      assert(last._1 == 24L)
      assert(last._2 == s, s"streaming ${last._2} vs batch $s")
      assert(last._3 == (s >= 10L) && last._4 == alarmedEver)
      assert(alarmedEver, "the sustained shift must alarm")
    } finally q.stop()
  }

  test("streaming CUSUM final state equals cusumDetect's last row per key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    // raw events whose hourly counts are the `counts` sequence
    val rows = counts.flatMap { case (h, c) =>
      (1L to c).map(i => ("k", Timestamp.valueOf(f"2024-04-01 ${h % 24}%02d:0${i % 6}:00")))
    }
    val batch = graft.ops.Resample.cusumDetect(rows.toDF("k", "t"),
      "k", "t", "hour", target2 = 7L, threshold2 = 10L).collect()
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingCusum.cusumUpdates(input.toDS(), 7L, 10L)
      .writeStream.format("memory").queryName("cusum_replay_test")
      .outputMode("update").start()
    try {
      batch.foreach { r =>
        input.addData(("k", r.getTimestamp(1).getTime * 1000L, r.getLong(2)))
        q.processAllAvailable()
      }
      val fin = spark.table("cusum_replay_test")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .maxBy(_._1)
      val bl = batch.last
      assert(fin._1 == batch.length.toLong)
      assert(fin._2 == bl.getLong(3), s"cusum2 ${fin._2} vs ${bl.getLong(3)}")
      assert(fin._3 == bl.getBoolean(4))
    } finally q.stop()
  }

  test("batchReplay equals the live fold's final state (shared recurrence)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ds = counts.map { case (h, c) => ("m", h * 3600L * 1000000L, c) }
      .toDS()
    val replay = StreamingCusum.batchReplay(ds, target2 = 7L, threshold2 = 10L)
      .collect().head
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingCusum.cusumUpdates(input.toDS(), 7L, 10L)
      .writeStream.format("memory").queryName("cusum_br_test")
      .outputMode("update").start()
    try {
      // an uneven batching, including duplicate bucket_ts rows in-batch
      counts.grouped(7).foreach { b =>
        val dup = b.flatMap { case (h, c) =>
          if (c > 1) Seq(("m", h * 3600L * 1000000L, c - 1L),
            ("m", h * 3600L * 1000000L, 1L))
          else Seq(("m", h * 3600L * 1000000L, c))
        }
        input.addData(dup: _*)
        q.processAllAvailable()
      }
      val live = spark.table("cusum_br_test")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3),
          r.getBoolean(4))).maxBy(_._1)
      assert((replay.n_buckets, replay.cusum2, replay.alarm_now,
        replay.alarmed_ever) == live)
    } finally q.stop()
  }
}
