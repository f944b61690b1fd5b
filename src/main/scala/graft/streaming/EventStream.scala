package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (NOT-IN-REFERENCE extension — the reference has no streaming at all,
  * SURVEY §2.10; this is the engine's scale path for continuous ingest).
  *
  * Batch/stream parity: every transform is expressed on DataFrame so the
  * identical code runs over `spark.read` (batch backfill) and
  * `spark.readStream` (live) — the Structured Streaming model.
  */
object EventStream {

  /** Tumbling-window aggregation with a watermark: count + sum(value) per
    * (window, event_type). Late rows beyond `lateness` are dropped and their
    * state reclaimed — unbounded-state-safe at any scale. */
  def hourlyRollup(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  final case class SessionUpdate(user_id: Long, n_events: Long,
      total_value: Double, session_end: Boolean)
  private final case class SessionState(n: Long, total: Double)

  /** Per-user sessionization via `mapGroupsWithState` with a processing-time
    * gap timeout: custom state machine the windowed API can't express
    * (KeyValueGroupedDataset state ops, SURVEY steering). State is one small
    * struct per active user — shuffle is on user_id only. */
  def sessionize(events: Dataset[(Long, Double)], gap: String = "30 minutes"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(user, s.n, s.total, session_end = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
            val batch = rows.toSeq
            val next = SessionState(prev.n + batch.size, prev.total + batch.map(_._2).sum)
            state.update(next)
            state.setTimeoutDuration(gap)
            SessionUpdate(user, next.n, next.total, session_end = false)
          }
      }
  }

  /** Wire a parquet-directory stream of events through the rollup to an
    * in-memory (testing) or file sink. Returns the started query. */
  def startFileStream(spark: SparkSession, inputDir: String, queryName: String,
      schema: org.apache.spark.sql.types.StructType) = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    hourlyRollup(stream)
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append())
      .start()
  }
}
