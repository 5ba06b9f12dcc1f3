package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream processing over the `events` table (§2.10 extension —
  * the reference is batch-only, so this is the engine's Structured
  * Streaming surface).
  *
  * The same transforms run in batch and streaming: `withEventTime`
  * normalizes the long-nanos `ts` into a TimestampType event-time
  * column, `hourlyStats` is a tumbling-window aggregate, and
  * `slidingStats` a sliding window. In streaming mode the caller adds
  * `readStream` + `withWatermark` (see `hourlyStatsStreaming`).
  *
  * Scale: windowed aggregates shuffle on (window, event_type) — at
  * 100 TB/day the watermark bounds state, and partial aggregation
  * happens map-side before the shuffle.
  */
object EventStreams {

  /** events schema as read with spark.sql.legacy.parquet.nanosAsLong. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** long-nanos → TimestampType event time (micros truncation). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour stats per event type (batch or streaming input). */
  def hourlyStats(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"),
        col("n"),
        col("total"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingStats(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("event_time"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Streaming variant: 2-hour watermark drops late data and bounds
    * state; append output mode emits finalized windows only.
    */
  def hourlyStatsStreaming(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"),
        col("n"),
        col("total"))

  /** File-source streaming read of an events parquet directory. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Gap-based sessionization (30-min inactivity gap) as a batch window
    * plan: flag gap starts with lag, running-sum the flags into session
    * ids, aggregate per (user, session). The streaming twin is a
    * `flatMapGroupsWithState` over user_id with an event-time timeout;
    * the batch form is the oracle-checkable reference semantics.
    */
  def sessionize(events: DataFrame, gapMicros: Long = 30L * 60 * 1000000L): DataFrame = {
    // all arithmetic in epoch micros so batch and oracle agree exactly
    val withTus = events.withColumn("tus", expr("ts div 1000"))
    val byUser  = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    withTus
      .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_tus").isNull || col("tus") - col("prev_tus") > gapMicros, 1L).otherwise(0L))
      .withColumn(
        "session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("tus")).as("session_start_us"),
        max(col("tus")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        graft.operators.Ops.dsum(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }
}
