package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The events table's `ts` has shipped as BOTH timestamp[ns] parquet
  * (surfacing as long epoch nanos under nanosAsLong) and timestamp[us]
  * parquet (surfacing as TIMESTAMP_NTZ). Round 6 lost 13 queries to a
  * raw `ts div 1000` that assumed the first encoding. Every event-time
  * read now goes through Ops.tsMicros; this spec pins the contract:
  * identical results whichever physical type the scan yields.
  */
class TsEncodingSpec extends SparkTestBase {
  import spark.implicits._

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Fixture in long-nanos form (what the ns-parquet scan yields). */
  private lazy val nanosDf: DataFrame = {
    val min = 60L * 1000000000L // nanos per minute
    Seq(
      (1L, 10 * min, 7L, "view", 1.0, "{}"),
      (2L, 12 * min, 7L, "click", 2.5, "{}"),
      (3L, 55 * min, 7L, "purchase", 9.0, "{}"),
      (4L, 11 * min, 8L, "view", 0.5, "{}"),
      (5L, 95 * min, 8L, "error", 0.0, "{}"),
    ).toDF(cols: _*)
  }

  /** Same rows in TIMESTAMP_NTZ form (what the us-parquet scan yields). */
  private lazy val ntzDf: DataFrame =
    nanosDf.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))

  test("tsMicros yields identical epoch micros for nanos-long and NTZ encodings") {
    val a = nanosDf.select(operators.Ops.tsMicros(nanosDf).as("tus")).collect().map(_.getLong(0))
    val b = ntzDf.select(operators.Ops.tsMicros(ntzDf).as("tus")).collect().map(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.head == 10L * 60 * 1000000L)
    // and for plain TimestampType (LTZ) too — UTC session makes it agree
    val ltz = nanosDf.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampType))
    val c = ltz.select(operators.Ops.tsMicros(ltz).as("tus")).collect().map(_.getLong(0))
    assert(a.sameElements(c))
  }

  test("tsMicros floors pre-epoch nanos like unix_micros does (no 1µs divergence)") {
    // div truncates toward zero but unix_micros floors; the nanos path
    // must floor too or negative timestamps diverge across encodings.
    val negNanos = Seq(
      (1L, -1500L, 7L, "view", 1.0, "{}"),   // -1.5µs → floor = -2µs
      (2L, -1000L, 7L, "view", 1.0, "{}"),   // exact  → -1µs
      (3L, -999L, 7L, "view", 1.0, "{}"),    // -0.999µs → floor = -1µs
      (4L, 1500L, 7L, "view", 1.0, "{}"),    // +1.5µs → 1µs
    ).toDF(cols: _*)
    val got = negNanos.select(operators.Ops.tsMicros(negNanos).as("tus"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-2L, -1L, -1L, 1L))
    val viaTs = negNanos
      .withColumn("ts", timestamp_micros(operators.Ops.tsMicros(negNanos)).cast(TimestampNTZType))
    val got2 = viaTs.select(operators.Ops.tsMicros(viaTs).as("tus"))
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == got)
  }

  test("tsMicros picks the long path only for LongType") {
    assert(nanosDf.schema("ts").dataType == LongType)
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
  }

  test("sessionize and hourlyStats agree across encodings") {
    val sa = streaming.EventStreams.sessionize(nanosDf).collect()
    val sb = streaming.EventStreams.sessionize(ntzDf).collect()
    assert(sa.sameElements(sb))
    val ha = streaming.EventStreams.hourlyStats(nanosDf).orderBy("hour_start", "event_type").collect()
    val hb = streaming.EventStreams.hourlyStats(ntzDf).orderBy("hour_start", "event_type").collect()
    assert(ha.sameElements(hb))
  }
}
