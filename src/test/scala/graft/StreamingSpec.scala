package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming semantics: streaming windowed agg matches the
  * batch transform; watermark finalizes and drops late data.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in nanos

  private def ev(id: Long, tsNanos: Long, typ: String, value: Double) =
    (id, tsNanos, id % 3, typ, value, "{}")

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("file-source stream over the real events parquet matches batch hourlyStats") {
    // the driver's events.parquet — whatever timestamp encoding this
    // testdata generation shipped. readEventStream derives its required
    // schema from the directory (a pinned long-nanos schema would fail
    // the scan on timestamp[us] files), and the streaming aggregate
    // must equal the batch one row-for-row.
    val src = new java.io.File(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_stream").toFile
    java.nio.file.Files.copy(src.toPath, new java.io.File(dir, "events.parquet").toPath)
    val q = EventStreams
      .hourlyStats(EventStreams.readEventStream(spark, dir.getAbsolutePath))
      .writeStream.outputMode("complete").format("memory")
      .queryName("file_hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_hourly_out")
        .select(col("hour_start"), col("event_type"), col("n"), col("total"))
        .collect().toSet
      val batch = EventStreams
        .hourlyStats(spark.read.parquet(s"$sfDir/events.parquet"))
        .select(col("hour_start"), col("event_type"), col("n"), col("total"))
        .collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming hourly agg equals batch on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      ev(1, 10L * 1000000000L, "click", 1.0),
      ev(2, 20L * 1000000000L, "click", 2.0),
      ev(3, H + 5L, "view", 3.0),
      ev(4, 3 * H, "click", 4.0), // advances watermark past hours 0 and 1
    )
    val stream = MemoryStream[(Long, Long, Long, String, Double, String)]
    val sdf    = stream.toDF().toDF(cols: _*)
    val q = EventStreams
      .hourlyStatsStreaming(sdf)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("hourly_out")
      .start()
    try {
      stream.addData(data.take(3))
      q.processAllAvailable()
      stream.addData(data.drop(3)) // watermark now 3H - 2h = 1H ⇒ hour-0 final
      q.processAllAvailable()
      stream.addData(Seq(ev(5, 15L * 1000000000L, "click", 99.0))) // late: hour 0 closed
      q.processAllAvailable()

      val streamed = spark.table("hourly_out")
        .select(col("event_type"), col("n"), col("total"))
        .as[(String, Long, Double)].collect().toSet
      // hour 0 finalized without the late event
      assert(streamed.contains(("click", 2L, 3.0)))
      assert(!streamed.exists { case (t, _, v) => t == "click" && v > 100 })

      val batch = EventStreams
        .hourlyStats(data.toDF(cols: _*))
        .filter(col("event_type") === "click" && col("n") === 2)
        .select(col("total")).as[Double].collect()
      assert(batch.sameElements(Array(3.0))) // identical window result
    } finally q.stop()
  }

  test("stream-stream interval join matches batch banded range join") {
    implicit val sqlCtx = spark.sqlContext
    val M = 60L * 1000000000L // one minute in nanos
    val data = Seq(
      ev(1, 10 * M, "error", 0.0),  // user 1
      ev(3, 20 * M, "click", 5.0),  // user 0 — other user, must not match
      ev(4, 25 * M, "click", 7.0),  // user 1, within 30 min of err 1
      ev(7, 55 * M, "click", 9.0),  // user 1, 45 min after err 1: out of band
      ev(9, 300 * M, "view", 0.0),  // advances both watermarks
    )
    val stream = MemoryStream[(Long, Long, Long, String, Double, String)]
    val sdf    = stream.toDF().toDF(cols: _*)
    val q = EventStreams
      .nearbyClicksStream(sdf, "30 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("nearby_out")
      .start()
    try {
      stream.addData(data)
      q.processAllAvailable()
      val got = spark.table("nearby_out")
        .select(col("err_id"), col("user_id"), col("value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 1L, 7.0)))
      // batch twin over the same rows
      val ev2   = data.toDF(cols: _*).withColumn("tus", expr("ts div 1000"))
      val errs  = ev2.filter(col("event_type") === "error").select(col("event_id").as("err_id"), col("user_id"), col("tus"))
      val clks  = ev2.filter(col("event_type") === "click").select(col("user_id"), col("tus").as("c_tus"), col("value"))
      val batch = graft.operators.Ops
        .bandedRangeJoin(errs.withColumnRenamed("user_id", "k"), clks.withColumnRenamed("user_id", "k"), Seq("k"), "tus", "c_tus", 1800000000L)
        .select(col("err_id"), col("k").as("user_id"), col("value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dim per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim    = Seq((0L, "bronze"), (1L, "gold")).toDF("cust_id", "tier")
    val stream = MemoryStream[(Long, Long, Long, String, Double, String)]
    val q = EventStreams
      .enrichStream(stream.toDF().toDF(cols: _*), dim, "user_id", "cust_id")
      .select(col("event_id"), col("user_id"), col("tier"))
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try {
      stream.addData(Seq(ev(1, 1000L, "click", 1.0), ev(2, 2000L, "view", 2.0), ev(3, 3000L, "view", 3.0)))
      q.processAllAvailable()
      val got = spark.table("enrich_out").as[(Long, Long, String)].collect().toSet
      // ev ids 1,2,3 → user_id = id % 3 = 1, 2, 0
      assert(got == Set((1L, 1L, "gold"), (2L, 2L, null), (3L, 0L, "bronze")))
    } finally q.stop()
  }

  test("sessionizeStream closes sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val min = 60L * 1000000000L
    val stream = MemoryStream[(Long, Long, Long, String, Double, String)]
    val q = graft.streaming.EventStreams
      .sessionizeStream(stream.toDF().toDF(cols: _*))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .start()
    try {
      // NB: keep event times well past epoch 0 — rows whose event time
      // equals the initial zero watermark are dropped as late.
      val base = 1000 * min
      // user 7: two events 10min apart (one session), then 40min later
      stream.addData(Seq((1L, base, 7L, "a", 1.0, "{}"), (2L, base + 10 * min, 7L, "a", 2.0, "{}")))
      q.processAllAvailable()
      stream.addData(Seq((3L, base + 50 * min, 7L, "a", 3.0, "{}"))) // gap close in-stream
      q.processAllAvailable()
      // far-future event advances watermark (1h delay) beyond 50min+30min gap
      stream.addData(Seq((9L, base + 500 * min, 8L, "a", 9.0, "{}")))
      q.processAllAvailable()
      stream.addData(Seq((10L, base + 900 * min, 8L, "a", 9.0, "{}"))) // fire timeouts
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .select(col("user_id"), col("n_events"), col("total_value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got.contains((7L, 2L, 3.0))) // first session closed by in-stream gap
      assert(got.contains((7L, 1L, 3.0))) // second closed by watermark timeout
    } finally q.stop()
  }

  test("sessionizeStream is correct under the RocksDB state store provider") {
    // ARCHITECTURE.md names RocksDB as the cluster state-store backend
    // (state larger than executor heap, incremental checkpoints); this
    // runs the same sessionization contract against the real provider —
    // config proof, not narrative. The provider class is read at query
    // start from the session conf.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val min = 60L * 1000000000L
    val stream = MemoryStream[(Long, Long, Long, String, Double, String)]
    val q = graft.streaming.EventStreams
      .sessionizeStream(stream.toDF().toDF(cols: _*))
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_rocksdb_out").start()
    try {
      val base = 1000 * min
      stream.addData(Seq((1L, base, 7L, "a", 1.0, "{}"), (2L, base + 10 * min, 7L, "a", 2.0, "{}")))
      q.processAllAvailable()
      stream.addData(Seq((3L, base + 50 * min, 7L, "a", 3.0, "{}"))) // gap close in-stream
      q.processAllAvailable()
      stream.addData(Seq((9L, base + 500 * min, 8L, "a", 9.0, "{}")))
      q.processAllAvailable()
      stream.addData(Seq((10L, base + 900 * min, 8L, "a", 9.0, "{}"))) // fire timeouts
      q.processAllAvailable()
      // the query must actually be running on RocksDB, not a silent fallback
      assert(q.lastProgress.stateOperators.nonEmpty)
      val got = spark.table("sessions_rocksdb_out")
        .select(col("user_id"), col("n_events"), col("total_value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got.contains((7L, 2L, 3.0)))
      assert(got.contains((7L, 1L, 3.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streamingExactDedup keeps first-seen docs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Long) = new java.sql.Timestamp(3600_000L + m * 60_000L)
    val q = graft.dedup.Dedup
      .streamingExactDedup(
        stream.toDF().toDF("doc_id", "text", "event_time"), "text", "event_time")
      .select(col("doc_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      stream.addData(Seq((1L, "hello world", ts(0)), (2L, "HELLO  world ", ts(1))))
      q.processAllAvailable()
      stream.addData(Seq((3L, "hello world", ts(2)), (4L, "fresh doc", ts(3))))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").as[Long].collect().toSet
      assert(kept.contains(1L) && !kept.contains(2L)) // same-batch normalized dup dropped
      assert(!kept.contains(3L))                      // cross-batch dup dropped (state)
      assert(kept.contains(4L))
    } finally q.stop()
  }

  test("streamingIncrementalDedup drops corpus dups and in-stream dups") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "already ingested doc")).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Long) = new java.sql.Timestamp(3600_000L + m * 60_000L)
    val q = graft.dedup.Dedup
      .streamingIncrementalDedup(
        stream.toDF().toDF("doc_id", "text", "event_time"), corpus, "text", "event_time")
      .select(col("doc_id"))
      .writeStream.outputMode("append").format("memory").queryName("incdedup_out").start()
    try {
      stream.addData(Seq(
        (1L, "ALREADY ingested  doc", ts(0)), // corpus dup modulo normalization
        (2L, "new stream doc", ts(1))))
      q.processAllAvailable()
      stream.addData(Seq(
        (3L, "new  STREAM doc", ts(2)), // in-stream cross-batch dup of 2
        (4L, "genuinely fresh", ts(3))))
      q.processAllAvailable()
      val kept = spark.table("incdedup_out").as[Long].collect().toSet
      assert(kept == Set(2L, 4L))
    } finally q.stop()
  }

  test("windowedTopNStream emits final top-3 per hour once the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, String, Double, String)]
    val q = EventStreams
      .windowedTopNStream(stream.toDF().toDF(cols: _*), n = 3)
      .writeStream.outputMode("append").format("memory").queryName("topn_out").start()
    try {
      // NB: event times must sit past the initial zero watermark or the
      // rows drop as late (cf. sessionizeStream test). Target hour 100.
      val base   = 100 * H
      val hourUs = 100L * 3600L * 1000000L
      // hour 100: click x3, view x2, error x1, scroll x1 -> top3 click,view + tie(error,scroll)->error
      stream.addData(Seq(
        ev(1, base + 1L, "click", 0), ev(2, base + 2L, "click", 0), ev(3, base + 3L, "click", 0),
        ev(4, base + 4L, "view", 0), ev(5, base + 5L, "view", 0),
        ev(6, base + 6L, "error", 0), ev(7, base + 7L, "scroll", 0)))
      q.processAllAvailable()
      assert(spark.table("topn_out").isEmpty) // hour 100 still open
      stream.addData(Seq(ev(8, base + 4 * H, "view", 0))) // watermark -> 102H: hour 100 closes
      q.processAllAvailable()
      stream.addData(Seq(ev(9, base + 5 * H, "view", 0))) // extra batch fires pending timeouts
      q.processAllAvailable()
      val got = spark.table("topn_out")
        .filter(col("hour_us") === hourUs)
        .select("event_type", "n", "rank").as[(String, Long, Long)].collect().toSet
      assert(got == Set(("click", 3L, 1L), ("view", 2L, 2L), ("error", 1L, 3L)))
      // late event for hour 100 after close: no retraction, no new emission
      stream.addData(Seq(ev(10, base + 10L, "click", 0)))
      q.processAllAvailable()
      assert(spark.table("topn_out").filter(col("hour_us") === hourUs).count() == 3)
    } finally q.stop()
  }

  test("stream started on an EMPTY directory picks up long-nanos files landing later") {
    // The deployment pattern readEventStream's schema fallback exists
    // for: the stream starts BEFORE any producer has written a file,
    // then files land mid-stream and rows must flow.
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_stream").toFile
    val sdf = EventStreams.readEventStream(spark, dir.getAbsolutePath)
    assert(sdf.schema("ts").dataType == org.apache.spark.sql.types.LongType) // fallback engaged
    val q = EventStreams
      .hourlyStats(sdf)
      .writeStream.outputMode("complete").format("memory")
      .queryName("empty_start_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_start_out").isEmpty) // started clean on zero files
      val data = Seq(
        ev(1, 10L * 1000000000L, "click", 1.0),
        ev(2, 20L * 1000000000L, "click", 2.0),
        ev(3, H + 5L, "view", 3.0)).toDF(cols: _*)
      val staging = java.nio.file.Files.createTempDirectory("graft_stage").toFile
      data.coalesce(1).write.mode("overwrite").parquet(staging.getAbsolutePath)
      val part = staging.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, new java.io.File(dir, "batch0.parquet").toPath)
      q.processAllAvailable()
      val streamed = spark.table("empty_start_out")
        .select(col("hour_start"), col("event_type"), col("n"), col("total"))
        .collect().toSet
      val batch = EventStreams.hourlyStats(data)
        .select(col("hour_start"), col("event_type"), col("n"), col("total"))
        .collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream started on an EMPTY directory with eventSchemaTs streams native-timestamp files") {
    // Same startup pattern, other testdata generation: producers land
    // timestamp[us] files (the driver's events.parquet) into a
    // directory that was empty at stream start. The caller declares the
    // encoding via the fallback; ts must type as TIMESTAMP end-to-end.
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_stream_ts").toFile
    val sdf = EventStreams.readEventStream(spark, dir.getAbsolutePath, EventStreams.eventSchemaTs)
    assert(sdf.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val q = EventStreams
      .hourlyStats(sdf)
      .writeStream.outputMode("complete").format("memory")
      .queryName("empty_start_ts_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_start_ts_out").isEmpty)
      val src = new java.io.File(s"$sfDir/events.parquet")
      java.nio.file.Files.copy(src.toPath, new java.io.File(dir, "events.parquet").toPath)
      q.processAllAvailable()
      val streamed = spark.table("empty_start_ts_out")
        .select(col("hour_start"), col("event_type"), col("n"), col("total"))
        .collect().toSet
      val batch = EventStreams
        .hourlyStats(spark.read.parquet(src.getAbsolutePath))
        .select(col("hour_start"), col("event_type"), col("n"), col("total"))
        .collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize splits on >30min gaps and aggregates per session") {
    val min = 60L * 1000000000L
    val data = Seq(
      ev(1, 0L, "a", 1.0),
      ev(2, 10 * min, "a", 2.0),     // same session (10 min gap)
      ev(3, 50 * min, "a", 3.0),     // new session (40 min gap)
    ).map { case (id, ts, _, t, v, p) => (id, ts, 7L, t, v, p) }
    val got = EventStreams.sessionize(data.toDF(cols: _*))
      .select("session_seq", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 3.0), (2L, 1L, 3.0)))
  }

  test("streaming index maintenance: micro-batch appends keep the index query-consistent") {
    import graft.retrieval.Postings
    implicit val sqlCtx = spark.sqlContext
    val base = Seq(
      (1L, "spark merge join spark"),
      (2L, "hash table scan row"),
      (3L, "spark spark filter sort"))
    val batchA = Seq((10L, "merge spark window"), (11L, "row batch merge merge"))
    val batchB = Seq((20L, "spark merge merge scan"), (21L, "filter only words"))
    val dir  = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sidx_ckpt").toString
    Postings.writeIndex(base.toDF("doc_id", "text"), "doc_id", "text", "t_sidx_a", dir, buckets = 4)
    val stream = MemoryStream[(Long, String)]
    val q = Postings
      .maintainFromStream(stream.toDF().toDF("doc_id", "text"), "doc_id", "text", "t_sidx_a")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      stream.addData(batchA); q.processAllAvailable()
      stream.addData(batchB); q.processAllAvailable()
      Postings.writeIndex(
        (base ++ batchA ++ batchB).toDF("doc_id", "text"), "doc_id", "text", "t_sidx_b", dir2, buckets = 4)
      val terms = Seq("spark", "merge")
      def top(name: String) = Postings
        .bm25TopK(Postings.postingsTable(spark, name), Postings.statsTable(spark, name), terms, 10)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(top("t_sidx_a") == top("t_sidx_b"),
        "stream-grown index diverged from a from-scratch build over the same docs")
      // idempotent replay: re-appending an already-committed batch id
      // is a no-op (foreachBatch redelivery after failure)
      val before = Postings.postingsTable(spark, "t_sidx_a").count()
      Postings.appendBatch(batchA.toDF("doc_id", "text"), "doc_id", "text", "t_sidx_a", batchId = 0L)
      assert(Postings.postingsTable(spark, "t_sidx_a").count() == before)
      assert(top("t_sidx_a") == top("t_sidx_b"))
      // and the stats table records exactly base + 2 committed batches
      assert(Postings.statsTable(spark, "t_sidx_a").count() == 3)
    } finally {
      q.stop()
      Postings.dropIndex(spark, "t_sidx_a")
      Postings.dropIndex(spark, "t_sidx_b")
    }
  }

  test("streaming POSITIONAL maintenance: phrase answers stay consistent; replay is a no-op") {
    import graft.retrieval.Postings
    implicit val sqlCtx = spark.sqlContext
    val base = Seq(
      (1L, "spark merge join spark merge"),
      (2L, "hash table scan row"),
      (3L, "spark merge filter sort"))
    val batchA = Seq((10L, "merge spark window"), (11L, "row spark merge merge"))
    val batchB = Seq((20L, "spark merge merge scan"), (21L, "filter only words"))
    val dir  = java.nio.file.Files.createTempDirectory("graft_spidx").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_spidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_spidx_ckpt").toString
    Postings.writePositionalIndex(base.toDF("doc_id", "text"), "doc_id", "text", "t_spidx_a", dir, buckets = 4)
    val stream = MemoryStream[(Long, String)]
    val q = Postings
      .maintainPositionalFromStream(stream.toDF().toDF("doc_id", "text"), "doc_id", "text", "t_spidx_a")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      stream.addData(batchA); q.processAllAvailable()
      stream.addData(batchB); q.processAllAvailable()
      Postings.writePositionalIndex(
        (base ++ batchA ++ batchB).toDF("doc_id", "text"), "doc_id", "text", "t_spidx_b", dir2, buckets = 4)
      def top(name: String) = Postings
        .phraseTopK(Postings.positionalTable(spark, name), Seq("spark", "merge"), 10)
        .collect().toSeq
      assert(top("t_spidx_a") == top("t_spidx_b") && top("t_spidx_a").nonEmpty,
        "stream-grown positional index diverged from a from-scratch build")
      // idempotent replay: re-appending a committed batch id is a no-op
      val before = Postings.positionalTable(spark, "t_spidx_a").count()
      Postings.appendPositionalBatch(batchA.toDF("doc_id", "text"), "doc_id", "text", "t_spidx_a", batchId = 0L)
      assert(Postings.positionalTable(spark, "t_spidx_a").count() == before)
      // marker log records exactly the 2 committed batches
      assert(spark.table("t_spidx_a_posmarkers").count() == 2)
      // idempotent appends against an index with no marker log refuse loudly
      val e = intercept[IllegalArgumentException](
        Postings.appendPositionalBatch(batchA.toDF("doc_id", "text"), "doc_id", "text", "t_spidx_missing", batchId = 0L))
      assert(e.getMessage.contains("no marker table"))
    } finally {
      q.stop()
      Postings.dropIndex(spark, "t_spidx_a")
      Postings.dropIndex(spark, "t_spidx_b")
    }
  }

  test("streaming percolation: arrival-time matches accumulate to the batch index answer") {
    import graft.retrieval.Postings
    implicit val sqlCtx = spark.sqlContext
    val standing = Seq(
      1L -> Seq("spark", "merge"),
      2L -> Seq("row"),
      3L -> Seq("filter", "sort", "fast"))
    val batchA = Seq((10L, "merge spark window"), (11L, "row batch merge"))
    val batchB = Seq(
      (20L, "fast sort filter fast"),
      (21L, "spark only"),
      (22L, null.asInstanceOf[String]))
    val dir  = java.nio.file.Files.createTempDirectory("graft_perc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_perc_ckpt").toString
    val sink = s"perc_sink_${ProcessHandle.current().pid()}"
    val stream = MemoryStream[(Long, String)]
    // stateless matcher straight on the stream — no index, no state store
    val q = Postings
      .percolate(stream.toDF().toDF("doc_id", "text"), "doc_id", "text", standing)
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      stream.addData(batchA); q.processAllAvailable()
      stream.addData(batchB); q.processAllAvailable()
      val streamed = spark.table(sink)
        .as[(Long, Long)].collect().toSeq.sorted
      // the same docs, indexed and percolated in one batch pass
      Postings.writeIndex(
        (batchA ++ batchB).toDF("doc_id", "text"), "doc_id", "text", "t_perc_i", dir, buckets = 4)
      val batch = Postings
        .matchQueries(Postings.postingsTable(spark, "t_perc_i"), standing)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(streamed == batch && streamed.nonEmpty,
        s"arrival-time percolation diverged from the batch index answer: $streamed vs $batch")
      // expected matches, by hand: q1 hits 10 and 11? (11 lacks spark) — just 10;
      // q2 hits 11; q3 hits 20 only
      assert(streamed == Seq((1L, 10L), (2L, 11L), (3L, 20L)))
    } finally {
      q.stop()
      Postings.dropIndex(spark, "t_perc_i")
      spark.sql(s"DROP VIEW IF EXISTS $sink")
    }
  }

  test("streaming maintenance refreshes the FORWARD table too: facets see streamed docs") {
    import graft.retrieval.Postings
    implicit val sqlCtx = spark.sqlContext
    val base = Seq(
      (1L, "spark merge join spark", "en"),
      (2L, "hash table scan row", "de"),
      (3L, "spark spark filter sort", "en"))
    val batchA = Seq((10L, "merge spark window", "fr"), (11L, "row batch merge merge", "en"))
    val dir  = java.nio.file.Files.createTempDirectory("graft_sfwd").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_sfwd").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sfwd_ckpt").toString
    Postings.writeIndex(
      base.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_sfwd_a", dir,
      buckets = 4, metaCols = Seq("lang"))
    // seed the owner session's relation cache with the PRE-stream file
    // list — exactly the state the refresh must invalidate
    assert(Postings.forwardTable(spark, "t_sfwd_a").count() == 3)
    val stream = MemoryStream[(Long, String, String)]
    val q = Postings
      .maintainFromStream(stream.toDF().toDF("doc_id", "text", "lang"), "doc_id", "text", "t_sfwd_a")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      stream.addData(batchA); q.processAllAvailable()
      Postings.writeIndex(
        (base ++ batchA).toDF("doc_id", "text", "lang"), "doc_id", "text", "t_sfwd_b", dir2,
        buckets = 4, metaCols = Seq("lang"))
      def facets(name: String) = Postings
        .facetCounts(
          Postings.postingsTable(spark, name), Postings.forwardTable(spark, name),
          Seq("spark", "merge"), Seq("lang"))
        .as[(String, Long)].collect().toSeq
      assert(facets("t_sfwd_a") == facets("t_sfwd_b") && facets("t_sfwd_a").nonEmpty,
        "owner-session facet counts missed streamed docs (stale forward-table cache)")
    } finally {
      q.stop()
      Postings.dropIndex(spark, "t_sfwd_a")
      Postings.dropIndex(spark, "t_sfwd_b")
    }
  }

  test("streaming DELETION maintenance: tombstone micro-batches; append+delete streams share the index without id collisions") {
    import graft.retrieval.Postings
    implicit val sqlCtx = spark.sqlContext
    val base = Seq(
      (1L, "spark merge join spark"),
      (2L, "hash table scan row"),
      (3L, "spark spark filter sort"),
      (4L, "merge row spark merge"),
      (5L, "vector merge spark table"))
    val dead = Seq(base(2), base(4)) // docs 3 and 5
    val live = base.filterNot(d => Set(3L, 5L)(d._1))
    val dir  = java.nio.file.Files.createTempDirectory("graft_sdel").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_sdel").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdel_ckpt").toString
    Postings.writeIndex(base.toDF("doc_id", "text"), "doc_id", "text", "t_sdel_a", dir, buckets = 4)
    Postings.writeIndex(live.toDF("doc_id", "text"), "doc_id", "text", "t_sdel_b", dir2, buckets = 4)
    val stream = MemoryStream[(Long, String)]
    val q = Postings
      .maintainDeletesFromStream(stream.toDF().toDF("doc_id", "text"), "doc_id", "text", "t_sdel_a")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      stream.addData(Seq(dead.head)); q.processAllAvailable()
      stream.addData(Seq(dead(1)));   q.processAllAvailable()
      def top(name: String) = Postings
        .bm25TopK(Postings.livePostings(spark, name), Postings.statsTable(spark, name),
          Seq("spark", "merge"), 10)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(top("t_sdel_a") == top("t_sdel_b") && top("t_sdel_a").nonEmpty,
        "stream-deleted index diverged from a fresh build over survivors")
      // replay of a committed delete batch id is a whole-batch no-op
      val tombs = Postings.tombstones(spark, "t_sdel_a").count()
      Postings.deleteBatch(Seq(dead.head).toDF("doc_id", "text"), "doc_id", "text", "t_sdel_a", batchId = 0L)
      assert(Postings.tombstones(spark, "t_sdel_a").count() == tombs)
      // SIGN-SEPARATED marker spaces: an APPEND with the same batch id 0
      // (a second stream's own zero-based ids) must still apply
      val extra = Seq((10L, "spark merge vector"))
      Postings.appendBatch(extra.toDF("doc_id", "text"), "doc_id", "text", "t_sdel_a", batchId = 0L)
      Postings.appendBatch(extra.toDF("doc_id", "text"), "doc_id", "text", "t_sdel_b", batchId = 0L)
      assert(top("t_sdel_a") == top("t_sdel_b") && top("t_sdel_a").exists(_._1 == 10L),
        "append with a batch id already used by a DELETE stream was wrongly skipped")
      // and the delete replay STILL no-ops after that append
      Postings.deleteBatch(Seq(dead.head).toDF("doc_id", "text"), "doc_id", "text", "t_sdel_a", batchId = 0L)
      assert(top("t_sdel_a") == top("t_sdel_b"))
    } finally {
      q.stop()
      Postings.dropIndex(spark, "t_sdel_a")
      Postings.dropIndex(spark, "t_sdel_b")
    }
  }
}
