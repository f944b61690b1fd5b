package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** The streaming state ops under the RocksDB state store — round-8 verdict
  * item 4: the default HDFSBackedStateStore holds every key on-heap, so
  * large key cardinality is an executor-memory ceiling; RocksDB spills to
  * local disk. The suite re-runs the soak contracts under the provider at
  * a state size that PRESSURES the default store (thousands of live keys
  * per micro-batch window) and asserts the provider actually engaged via
  * its rocksdb* progress metrics — a silently-ignored conf would pass the
  * plateau check on the wrong store. */
class RocksDBStateSpec extends SparkSpec {

  // own session: newSession() isolates the provider conf from the parallel
  // suites sharing this SparkContext (never mutate the shared session)
  private val rocks = EventStream.withRocksDBStateStore(spark)
  import rocks.implicits._

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  private def tsAt(minute: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime + minute * 60000L)

  test("streamingExactDedup under RocksDB: provider engaged, state plateaus at pressure") {
    implicit val sqlCtx = rocks.sqlContext
    val input = MemoryStream[Doc]
    val q = EventStream.streamingExactDedup(input.toDF(), lateness = "5 minutes")
      .writeStream.format("memory").queryName("rocksdb_dedup_soak")
      .outputMode("append").start()
    val sizes = Seq.newBuilder[Long]
    try {
      val batches = 40
      val perBatch = 500 // ~3k live hashes inside the watermark window
      (0 until batches).foreach { b =>
        input.addData((0 until perBatch).map { i =>
          Doc(b.toLong * perBatch + i, tsAt(b), s"rocks soak $b/$i " +
            (0 to 6).map(j => s"w${b * 131 + i * 17 + j}").mkString(" "))
        })
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          sizes += p.stateOperators.map(_.numRowsTotal).sum
          // the provider proof: RocksDB emits rocksdb* custom metrics the
          // default store never reports
          assert(p.stateOperators.exists(_.customMetrics.asScala.keys
              .exists(_.startsWith("rocksdb"))),
            s"no rocksdb metrics in progress — wrong provider engaged:\n$p")
        }
      }
      val s = sizes.result()
      assert(s.size >= batches * 3 / 4, "too few progress samples")
      val early = s.slice(s.size / 4, s.size / 2).max
      val late = s.slice(s.size * 3 / 4, s.size).max
      assert(late <= early * 3 / 2 + 10,
        s"RocksDB dedup state grows: early $early late $late\n$s")
      // watermark bound: ~500/min alive ~6 min ⇒ ~3k; 4x headroom vs the
      // 20k of unbounded accumulation
      assert(s.max <= 12000L, s"state ${s.max} exceeds watermark bound\n$s")
    } finally q.stop()
  }

  test("event-time sessionization under RocksDB closes the same sessions as default store") {
    implicit val sqlCtx = rocks.sqlContext
    val input = MemoryStream[EventStream.SessionEvent]
    val q = EventStream.sessionizeEventTime(input.toDS(), gapMs = 2 * 60000L)
      .writeStream.format("memory").queryName("rocksdb_sessions")
      .outputMode("append").start()
    try {
      // two events for user 1 inside the gap, then silence; advance the
      // watermark far enough (ts - 1h lateness > session end + gap)
      input.addData(
        EventStream.SessionEvent(1L, tsAt(0), 2.0),
        EventStream.SessionEvent(1L, tsAt(1), 3.0))
      q.processAllAvailable()
      input.addData(EventStream.SessionEvent(2L, tsAt(90), 1.0))
      q.processAllAvailable()
      input.addData(EventStream.SessionEvent(2L, tsAt(180), 1.0))
      q.processAllAvailable()
      val closed = rocks.table("rocksdb_sessions")
        .as[EventStream.ClosedSession].collect()
      assert(closed.exists(c => c.user_id == 1L && c.n_events == 2L &&
          c.total_value == 5.0),
        s"user 1's session did not close under RocksDB: ${closed.toSeq}")
    } finally q.stop()
  }

}
