package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.cache.SnapshotTable

/** Structured-Streaming surface. The reference has no stream engine
  * (SURVEY §2.12) — its closest notions are interval-scheduled batch
  * refresh and Arrow result streaming. These operators are the
  * Spark-native extension of that model:
  *
  *  - [[cursorAppendStream]]: the streaming form of an append-mode
  *    cache refresh — `readStream` over a growing file source, each
  *    micro-batch committed as an append snapshot via foreachBatch,
  *    `Trigger.AvailableNow` for catch-up-then-stop semantics (the
  *    scheduled-refresh replacement that never re-reads old files);
  *  - [[windowedEventCounts]]: event-time windowed aggregation with a
  *    watermark bounding state (late rows beyond the watermark are
  *    dropped, state for closed windows is evicted — the only design
  *    that survives an unbounded 100 TB/day event stream);
  *  - [[runningUserTotals]]: keyed custom state via mapGroupsWithState
  *    (running per-user aggregates across micro-batches, with a state
  *    timeout so idle keys age out instead of accreting forever).
  */
object Streaming {

  // ---- cursor-append cache ingestion ------------------------------------

  /** Stream new parquet files from `sourceDir` into `table` as append
    * snapshots: one snapshot per non-empty micro-batch. Returns the
    * started query (AvailableNow: processes what exists, then stops). */
  def cursorAppendStream(
      spark: SparkSession,
      sourceDir: String,
      schemaSource: String,
      table: SnapshotTable,
      checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(schemaSource).schema
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          table.refreshAppend(batch)
          ()
        }
      }
      .start()
  }

  // ---- watermarked windowed aggregation ---------------------------------

  /** Event-time tumbling-window counts per event type with a watermark.
    * State is bounded: windows older than (max event time - watermark)
    * close and evict; later-arriving rows for them are dropped. */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(
        col("window.start").as("window_start"),
        col(typeCol), col("n"), round(col("total"), 2).as("total"))

  // ---- custom keyed state ------------------------------------------------

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, events: Long, total: Double)

  /** Running per-user totals across micro-batches via
    * mapGroupsWithState. With `idleTimeout` set, idle keys age out so
    * the state store stays proportional to the ACTIVE key set, not the
    * all-time key set — that is the production configuration for an
    * unbounded user population. (Processing-time timeouts make the
    * engine fire periodic empty batches to expire state, so
    * deterministic drain-style tests use the no-timeout form.) */
  def runningUserTotals(
      events: Dataset[UserEvent],
      idleTimeout: Option[String] = None): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](timeoutConf) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
            var n = prev.events
            var tot = prev.total
            rows.foreach { e => n += 1; tot += e.value }
            val next = UserTotal(userId, n, tot)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }
}
