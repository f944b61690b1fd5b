package graft.streaming

import graft.SparkSpec

class StreamingSprtSpec extends SparkSpec {
  import spark.implicits._

  private val c1 = math.log(0.4 / 0.2)
  private val c0 = math.log(0.6 / 0.8)
  private val up = math.log(0.95 / 0.05)

  test("streaming SPRT: totals-exact LLR, latched crossing across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingSprt.sprtUpdates(input.toDS(), p0 = 0.2, p1 = 0.4)
      .writeStream.format("memory").queryName("sprt_test")
      .outputMode("update").start()
    try {
      // three high-rate batches climb over the upper bound, then a bad
      // batch — the flag must stay latched while the decision column
      // reflects the CURRENT statistic
      val batches = Seq((12L, 20L), (12L, 20L), (12L, 20L), (2L, 60L))
      var n = 0L; var x = 0L
      batches.foreach { case (s, t) =>
        input.addData(("m", t, s)); q.processAllAvailable()
        n += t; x += s
        val rows = spark.table("sprt_test")
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
            r.getBoolean(4), r.getString(6)))
        val last = rows.maxBy(_._1) // n is monotone → latest update
        assert(last._1 == n && last._2 == x)
        // totals-exact: bit-equal to the closed form, no chained drift
        assert(last._3 == x.toDouble * c1 + (n - x).toDouble * c0)
      }
      val finals = spark.table("sprt_test")
        .collect().map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4),
          r.getString(6))).maxBy(_._1)
      // batch 3 crossed up; batch 4's statistic fell back under the bound
      assert(finals._3, "crossed_up must stay latched")
      assert(finals._2 < up && finals._4 == "continue")
    } finally q.stop()
  }

  test("streaming SPRT: independent keys keep independent state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingSprt.sprtUpdates(input.toDS(), p0 = 0.2, p1 = 0.4)
      .writeStream.format("memory").queryName("sprt_keys_test")
      .outputMode("update").start()
    try {
      input.addData(("hi", 40L, 24L), ("lo", 40L, 1L))
      q.processAllAvailable()
      val byKey = spark.table("sprt_keys_test")
        .collect().map(r => r.getString(0) -> r.getString(6)).toMap
      assert(byKey("hi") == "accept_h1", byKey.toString)
      assert(byKey("lo") == "accept_h0", byKey.toString)
    } finally q.stop()
  }

  test("streaming SPRT final state equals the r70 batch replay's last row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // day-frame counts from a deterministic cohort, fed in day order
    val rng = new scala.util.Random(77)
    val rows = Seq.fill(2000)((
      f"2024-02-${rng.nextInt(10) + 1}%02d 09:00:00", rng.nextInt(5) == 0))
    val df = rows.toDF("tss", "ok")
      .select(to_timestamp(col("tss")).as("ts"), col("ok"))
    val batch = graft.stats.Sequential
      .sprtDF(df, "ts", lit(true), col("ok"), 0.18, 0.22).collect()
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingSprt.sprtUpdates(input.toDS(), p0 = 0.18, p1 = 0.22)
      .writeStream.format("memory").queryName("sprt_replay_test")
      .outputMode("update").start()
    try {
      batch.foreach { r =>
        input.addData(("m", r.getLong(1), r.getLong(2)))
        q.processAllAvailable()
      }
      val last = spark.table("sprt_replay_test")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4), r.getBoolean(5), r.getString(6))).maxBy(_._1)
      val bl = batch.last
      assert(last._1 == batch.map(_.getLong(1)).sum)
      assert(last._2 == batch.map(_.getLong(2)).sum)
      // llr_run rounds to 6 in the batch chain; totals form agrees there
      assert(math.abs(last._3 - bl.getDouble(4)) < 2e-6)
      assert(last._4 == bl.getBoolean(5) && last._5 == bl.getBoolean(6))
      assert(last._6 == bl.getString(7))
    } finally q.stop()
  }

  test("batchReplay equals the live one-batch-per-look fold (shared foldLook)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val looks = Seq((0L, 20L, 12L), (1L, 20L, 12L), (2L, 20L, 12L), (3L, 60L, 2L))
    val replay = StreamingSprt.batchReplay(
      looks.map { case (l, t, s) => ("m", l, t, s) }.toDS(),
      p0 = 0.2, p1 = 0.4).collect().head
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingSprt.sprtUpdates(input.toDS(), p0 = 0.2, p1 = 0.4)
      .writeStream.format("memory").queryName("sprt_br_test")
      .outputMode("update").start()
    try {
      looks.foreach { case (_, t, s) =>
        input.addData(("m", t, s)); q.processAllAvailable()
      }
      val live = spark.table("sprt_br_test")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4), r.getBoolean(5), r.getString(6))).maxBy(_._1)
      assert((replay.n, replay.x, replay.llr, replay.crossedUp,
        replay.crossedDn, replay.decision) == live)
      assert(replay.crossedUp, "the high-rate looks must latch crossed_up")
      assert(replay.decision == "continue", "the bad look pulls the statistic back")
    } finally q.stop()
  }
}
