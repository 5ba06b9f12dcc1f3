package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Typed event row (epoch-micros time) for stateful streaming ops.
  * Carries the watermarked `event_time` attribute so the watermark tag
  * survives into the typed plan.
  */
case class SessionEvent(
    event_id: Long,
    user_id: Long,
    tus: Long,
    value: Double,
    event_time: java.sql.Timestamp)

/** Emitted session (same shape as the batch `sessionize` output minus
  * the per-user sequence number, which is meaningless under streaming
  * out-of-order arrival).
  */
case class SessionOut(
    user_id: Long,
    session_start_us: Long,
    session_end_us: Long,
    n_events: Long,
    total_value: Double)

/** Open-session state carried between micro-batches. */
case class SessionState(startUs: Long, endUs: Long, n: Long, total: Double)

/** Typed event row for windowed top-n state (hour bucket precomputed). */
case class HourTypeEvent(hour_us: Long, event_type: String, event_time: java.sql.Timestamp)

/** Finalized heavy-hitter row emitted when a window closes. */
case class TopNOut(hour_us: Long, event_type: String, n: Long, rank: Long)

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

  /** events schema for the long-nanos fixture form (timestamp[ns]
    * parquet read under spark.sql.legacy.parquet.nanosAsLong, and the
    * in-memory test fixtures). Batch/streaming transforms below accept
    * EITHER this shape or a native TIMESTAMP `ts` — see Ops.tsMicros.
    */
  /** events schema for the native-timestamp generation (timestamp[us]
    * parquet, the driver testdata's encoding): identical to
    * `eventSchema` except `ts` is TIMESTAMP. Pass as the
    * `emptyDirFallback` of `readEventStream` when starting a stream on
    * a not-yet-populated directory whose producers write native
    * timestamps — with no files to probe, the encoding is a deployment
    * fact the caller must declare.
    */
  lazy val eventSchemaTs: StructType = StructType(eventSchema.map {
    case f if f.name == "ts" => f.copy(dataType = TimestampType)
    case f                   => f
  })

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** event time as TimestampType, from long nanos or native timestamp. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(graft.operators.Ops.tsMicros(events)))

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

  /** File-source streaming read of an events parquet directory. The
    * required up-front schema is derived from the directory itself (one
    * driver-side footer read) rather than pinned to `eventSchema`, so
    * the stream types `ts` correctly for BOTH testdata generations
    * (long nanos vs native timestamp) — a pinned LongType schema over
    * timestamp[us] files would fail the scan. Downstream transforms
    * are encoding-agnostic via Ops.tsMicros.
    *
    * When the directory is empty or not yet populated (the usual
    * file-source deployment: start the stream first, files arrive
    * later) the probe cannot infer anything, so we fall back to
    * `emptyDirFallback` (default `eventSchema`, the long-nanos shape) —
    * the stream starts and picks up files as they land. Producers that
    * will land native-timestamp files into an empty directory pass
    * `eventSchemaTs`; with zero files on disk the encoding cannot be
    * probed, only declared. Both startup paths are pinned in
    * StreamingSpec ("stream started on an EMPTY directory ...").
    */
  def readEventStream(
      spark: SparkSession,
      dir: String,
      emptyDirFallback: StructType = eventSchema): DataFrame = {
    val schema = scala.util.Try(spark.read.parquet(dir).schema)
      .filter(_.nonEmpty)
      .getOrElse(emptyDirFallback)
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension. Stateless — the dim is (re)resolved per micro-batch and
    * broadcast, so dim updates between batches are picked up and no
    * watermark or join state is needed. The 100 TB shape for "attach
    * catalog metadata to a firehose".
    */
  def enrichStream(events: DataFrame, dim: DataFrame, eventKey: String, dimKey: String): DataFrame =
    withEventTime(events).join(
      org.apache.spark.sql.functions.broadcast(dim),
      col(eventKey) === col(dimKey),
      "left")

  /** Stream-stream interval join: error events matched to same-user
    * clicks within ±`band`. Both sides carry watermarks and the join
    * condition is time-bounded in BOTH directions, so Spark can expire
    * buffered rows once the watermark passes — the only stream-stream
    * join shape whose state stays bounded on unbounded inputs. The
    * batch twin is Ops.bandedRangeJoin (oracle-checked by
    * st05_range_join).
    */
  def nearbyClicksStream(events: DataFrame, band: String = "30 minutes"): DataFrame = {
    val e = withEventTime(events)
    val errors = e
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("event_time").as("err_time"))
      .withWatermark("err_time", "1 hour")
    val clicks = e
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_time").as("click_time"), col("value"))
      .withWatermark("click_time", "1 hour")
    errors
      .join(
        clicks,
        expr(
          s"""user_id = c_user_id AND
             |click_time BETWEEN err_time - interval $band AND err_time + interval $band""".stripMargin))
      .select(col("err_id"), col("user_id"), col("click_time"), col("value"))
  }

  /** Gap-based sessionization (30-min inactivity gap) as a batch window
    * plan: flag gap starts with lag, running-sum the flags into session
    * ids, aggregate per (user, session). The streaming twin is a
    * `flatMapGroupsWithState` over user_id with an event-time timeout;
    * the batch form is the oracle-checkable reference semantics.
    */
  def sessionize(events: DataFrame, gapMicros: Long = 30L * 60 * 1000000L): DataFrame = {
    // all arithmetic in epoch micros so batch and oracle agree exactly
    val withTus = events.withColumn("tus", graft.operators.Ops.tsMicros(events))
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

  /** Streaming twin of `sessionize`: custom per-user state via
    * flatMapGroupsWithState. A session closes either when a same-batch
    * event arrives past the gap, or when the event-time watermark
    * passes sessionEnd + gap (state timeout) — so state size is bounded
    * by (active users × one open session), the property that lets this
    * run indefinitely at cluster scale.
    */
  def sessionizeStream(events: DataFrame, gapMicros: Long = 30L * 60 * 1000000L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = withEventTime(events)
      .withWatermark("event_time", "1 hour")
      .withColumn("tus", graft.operators.Ops.tsMicros(events))
      .select(col("event_id"), col("user_id"), col("tus"), col("value"), col("event_time"))
      .as[SessionEvent]

    def update(
        userId: Long,
        it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s   = state.get
        val out = SessionOut(userId, s.startUs, s.endUs, s.n, s.total)
        state.remove()
        Iterator.single(out)
      } else {
        val sorted = it.toSeq.sortBy(e => (e.tus, e.event_id))
        val closed = Seq.newBuilder[SessionOut]
        var st     = state.getOption
        sorted.foreach { e =>
          st match {
            case Some(s) if e.tus - s.endUs > gapMicros =>
              closed += SessionOut(userId, s.startUs, s.endUs, s.n, s.total)
              st = Some(SessionState(e.tus, e.tus, 1L, e.value))
            case Some(s) =>
              st = Some(SessionState(s.startUs, math.max(s.endUs, e.tus), s.n + 1, s.total + e.value))
            case None =>
              st = Some(SessionState(e.tus, e.tus, 1L, e.value))
          }
        }
        st.foreach { s =>
          state.update(s)
          // close via timeout when the watermark passes endUs + gap
          state.setTimeoutTimestamp(s.endUs / 1000 + gapMicros / 1000)
        }
        closed.result().iterator
      }
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Streaming windowed top-n heavy hitters — the streaming twin of the
    * batch st09 query: per 1-hour tumbling window, the top `n` event
    * types by count, emitted ONCE when the event-time watermark passes
    * the window end (so every emission is final — append mode, no
    * retractions).
    *
    * State per open window is the per-type count map; with a bounded
    * type vocabulary that is exact. For unbounded key domains swap the
    * map for a SpaceSaving/Misra-Gries summary of fixed width — the
    * emission logic is unchanged. Keyed by window start, so state
    * count = open windows × distinct types, independent of stream
    * length — the property that lets this run indefinitely.
    */
  def windowedTopNStream(events: DataFrame, n: Int = 3, watermark: String = "2 hours"): Dataset[TopNOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    val tus    = graft.operators.Ops.tsMicros(events)
    val typed = withEventTime(events)
      .withWatermark("event_time", watermark)
      .withColumn("hour_us", tus - pmod(tus, lit(hourUs)))
      .select(col("hour_us"), col("event_type"), col("event_time"))
      .as[HourTypeEvent]

    def update(
        hourUsKey: Long,
        it: Iterator[HourTypeEvent],
        state: GroupState[Map[String, Long]]): Iterator[TopNOut] = {
      if (state.hasTimedOut) {
        val counts = state.get
        state.remove()
        counts.toSeq
          .sortBy { case (t, c) => (-c, t) }
          .take(n)
          .zipWithIndex
          .map { case ((t, c), i) => TopNOut(hourUsKey, t, c, i + 1L) }
          .iterator
      } else {
        val merged = it.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) { (m, e) =>
          m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
        }
        state.update(merged)
        // finalize when the watermark passes the window end
        state.setTimeoutTimestamp((hourUsKey + hourUs) / 1000)
        Iterator.empty
      }
    }

    typed
      .groupByKey(_.hour_us)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
