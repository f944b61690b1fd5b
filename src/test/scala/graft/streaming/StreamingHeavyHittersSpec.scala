package graft.streaming

import graft.SparkSpec

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish deterministic workload: item i appears with weight
    * proportional to its index gap — item "hot" dominates. */
  private def workload: Seq[(String, Long)] =
    Seq.fill(60)(("hot", 5L)) ++
      (1 to 40).map(i => (s"warm${i % 4}", 3L)) ++
      (1 to 120).map(i => (s"cold$i", 1L))

  test("streaming MG: lower-bound counters, exact spill accounting, k cap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val q = StreamingHeavyHitters.mgUpdates(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("mg_test")
      .outputMode("update").start()
    try {
      val batches = workload.grouped(50).toSeq
      batches.foreach { b =>
        input.addData(b.map { case (i, w) => ("s", i, w) }: _*)
        q.processAllAvailable()
      }
      val rows = spark.table("mg_test")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val processedMax = rows.map(_._3).max
      val finals = rows.filter(_._3 == processedMax)
      val total = workload.map(_._2).sum
      assert(processedMax == total, "exact processed weight")
      assert(finals.length <= 8, "counter budget respected")
      val spilled = finals.head._4
      assert(spilled <= total / 9, "MG spill bound: processed/(k+1)")
      val truth = workload.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      finals.foreach { case (item, lb, _, sp) =>
        assert(lb <= truth(item), s"$item counter must lower-bound truth")
        assert(lb >= truth(item) - sp, s"$item within the spill band")
      }
      // the dominant item is guaranteed present and top-ranked
      assert(finals.maxBy(_._2)._1 == "hot")
    } finally q.stop()
  }

  test("streaming MG: guarantee holds under a different batch split; keys independent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val q = StreamingHeavyHitters.mgUpdates(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("mg_split_test")
      .outputMode("update").start()
    try {
      // one giant batch for key a, item-at-a-time for key b — same data
      input.addData(workload.map { case (i, w) => ("a", i, w) }: _*)
      q.processAllAvailable()
      workload.grouped(7).foreach { b =>
        input.addData(b.map { case (i, w) => ("b", i, w) }: _*)
        q.processAllAvailable()
      }
      val truth = workload.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val total = workload.map(_._2).sum
      Seq("a", "b").foreach { key =>
        val rows = spark.table("mg_split_test")
          .collect().filter(_.getString(0) == key)
          .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        val processedMax = rows.map(_._3).max
        assert(processedMax == total, s"key $key processed")
        val finals = rows.filter(_._3 == processedMax)
        assert(finals.length <= 8)
        finals.foreach { case (item, lb, _, sp) =>
          assert(lb <= truth(item) && lb >= truth(item) - sp, s"$key/$item")
        }
        assert(finals.maxBy(_._2)._1 == "hot", s"key $key keeps the hot item")
      }
    } finally q.stop()
  }

  test("batchReplay equals the live single-batch fold (shared foldBatch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val replay = StreamingHeavyHitters.batchReplay(
      workload.map { case (i, w) => ("s", i, w) }.toDS(), k = 8)
      .collect().map(u => (u.item, u.count_lb, u.processed, u.spilled)).toSet
    val input = MemoryStream[(String, String, Long)]
    val q = StreamingHeavyHitters.mgUpdates(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("mg_br_test")
      .outputMode("update").start()
    try {
      // ONE batch: the live fold sees the same multiset as batchReplay,
      // so the table is bit-identical (across different batchings only
      // the guarantee holds, not table equality — the split test above)
      input.addData(workload.map { case (i, w) => ("s", i, w) }: _*)
      q.processAllAvailable()
      val live = spark.table("mg_br_test")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(replay == live)
    } finally q.stop()
  }

  test("batchReplay over pre-summed (key,item) cells equals raw-row replay") {
    // the e29 fast path feeds batchReplay the truth aggregate instead of
    // raw rows — foldBatch's own first step IS that per-item sum, so the
    // fold input multiset (and the whole sketch) must be bit-identical
    val raw = workload.map { case (i, w) => ("s", i, w) } ++
      workload.map { case (i, w) => ("t", i, w * 2) }
    val summed = raw.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toSeq
      .map { case ((k, i), w) => (k, i, w) }
    def run(rows: Seq[(String, String, Long)]) =
      StreamingHeavyHitters.batchReplay(rows.toDS(), k = 8)
        .collect().map(u => (u.key, u.item, u.count_lb, u.processed,
          u.spilled)).toSet
    assert(run(raw) == run(summed))
  }
}
