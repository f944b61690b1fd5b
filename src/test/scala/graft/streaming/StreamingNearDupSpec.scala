package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest tonight"

  test("near-identical docs match across micro-batches; unrelated do not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingNearDup.matches(input.toDF(), minAgree = 6)
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      input.addData(Doc(1L, ts("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      input.addData(
        // one word changed -> most shingles shared -> high slot agreement
        Doc(2L, ts("2024-01-01 10:05:00"), base.replace("dark", "damp")),
        Doc(3L, ts("2024-01-01 10:06:00"),
          "completely unrelated content about spark catalyst plans and "
            + "shuffle exchanges in distributed queries"))
      q.processAllAvailable()
      // one row per PAIR (not per colliding band): no .distinct needed
      val got = spark.table("neardup_test").as[StreamingNearDup.Match]
        .collect().map(m => (m.doc_id, m.dup_of)).toSeq
      assert(got == Seq((2L, 1L)), got.toString)
    } finally q.stop()
  }

  test("exact duplicate agrees on all k slots in every band") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingNearDup.matches(input.toDF(), minAgree = 8)
      .writeStream.format("memory").queryName("neardup_exact")
      .outputMode("append").start()
    try {
      input.addData(Doc(1L, ts("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      input.addData(Doc(2L, ts("2024-01-01 10:01:00"), base))
      q.processAllAvailable()
      val got = spark.table("neardup_exact").as[StreamingNearDup.Match].collect()
      // all 4 bands collide, but band 0 OWNS the pair -> exactly one emission
      assert(got.toSeq == Seq(StreamingNearDup.Match(2L, 1L, 8)), got.mkString(","))
    } finally q.stop()
  }

  test("batchReplay equals the streaming operator's emissions on the same corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, base),
      (2L, base.replace("dark", "damp")),
      (3L, "completely unrelated content about spark catalyst plans and " +
        "shuffle exchanges in distributed queries"),
      (4L, base), // exact dup of 1 (and near-dup of 2)
      (5L, "another unrelated short text"))
    val input = MemoryStream[Doc]
    val q = StreamingNearDup.matches(input.toDF(), minAgree = 6)
      .writeStream.format("memory").queryName("neardup_replay")
      .outputMode("append").start()
    try {
      // arrival order = doc_id order, one batch per doc (worst-case state churn)
      docs.zipWithIndex.foreach { case ((id, text), i) =>
        input.addData(Doc(id, ts(f"2024-01-01 10:${i}%02d:00"), text))
        q.processAllAvailable()
      }
      val streamed = spark.table("neardup_replay").as[StreamingNearDup.Match]
        .collect().map(m => (m.doc_id, m.dup_of, m.agree)).toSet
      val replayed = StreamingNearDup.batchReplay(
          docs.toDF("doc_id", "text"), minAgree = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == replayed, s"stream $streamed vs replay $replayed")
      assert(replayed.nonEmpty)
    } finally q.stop()
  }

  test("bucket state expires past the watermark: an old doc stops matching") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingNearDup.matches(input.toDF(), minAgree = 6, lateness = "1 hour")
      .writeStream.format("memory").queryName("neardup_expiry")
      .outputMode("append").start()
    try {
      input.addData(Doc(1L, ts("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      // an unrelated doc 3h later pushes the watermark to ~12:00 — past
      // doc 1's bucket timeout (10:00 + 1h), so its state is reclaimed
      input.addData(Doc(2L, ts("2024-01-01 13:00:00"),
        "completely unrelated content about spark catalyst plans and " +
          "shuffle exchanges in distributed queries"))
      q.processAllAvailable()
      // an exact duplicate of doc 1 arriving now finds NO stored signature:
      // bounded state means old near-dups are a batch job, not stream state
      input.addData(Doc(3L, ts("2024-01-01 13:30:00"), base))
      q.processAllAvailable()
      val got = spark.table("neardup_expiry").as[StreamingNearDup.Match].collect()
      assert(got.isEmpty, got.mkString(","))
    } finally q.stop()
  }

  test("signature agreement matches the batch d8 operator on the same docs") {
    // the streaming signature (row-local) must equal the batch signature
    // (aggregation-based) — same shingles, same md5 slices
    val docs = Seq((1L, base), (2L, base.replace("dark", "damp")))
      .toDF("doc_id", "text")
    val batchAgree = graft.dedup.Dedup
      .minHashMd5Pairs(docs, "doc_id", "text", minAgree = 0)
      .select("agree").as[Int].collect().head
    val h = transform(graft.dedup.Dedup.shingles(col("text"), 3), s => md5(s))
    val sig = array((0 until 8).map(j =>
      array_min(transform(h, x => x.substr(j * 4 + 1, 4)))): _*)
    val sigs = docs.select(sig.as("sig")).as[Seq[String]].collect()
    val streamAgree = sigs(0).zip(sigs(1)).count(p => p._1 == p._2)
    assert(streamAgree == batchAgree)
  }
}
