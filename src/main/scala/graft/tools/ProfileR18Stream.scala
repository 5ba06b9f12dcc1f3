package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-18 streaming measurement: jobs per `maintainFromStream`
  * micro-batch — including the at-least-once REPLAY shape (same batch
  * redelivered after a restart), which through r17 still paid the
  * replay-probe job plus N owner-session catalog refreshes despite
  * writing nothing. Run against both the r17 worktree and this tree to
  * get the committed before/after delta.
  *
  * Usage: sbt "runMain graft.tools.ProfileR18Stream [sfDir]"
  */
object ProfileR18Stream {
  def main(args: Array[String]): Unit = {
    val dir  = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })
    def count(label: String)(body: => Unit): Unit = {
      Thread.sleep(200)
      val j0 = jobs
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"STREAM $label%-38s ${dt}%6.2f s  jobs=${jobs - j0}%3d")
    }

    val t    = graft.Tables(spark, dir)
    val docs = t.documents.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val half = docs.length / 2
    val name = s"r18stream_${System.nanoTime()}"
    val path = s"/tmp/graft_r18stream/$name"
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 8)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = graft.retrieval.Postings.maintainFromStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", name)
      .option("checkpointLocation", s"$path/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())

    count("micro-batch 0 (fresh append)") {
      mem.addData(docs.take(half / 2))
      val q = stream.start(); q.awaitTermination()
    }
    count("micro-batch 1 (fresh append)") {
      mem.addData(docs.slice(half / 2, half))
      val q = stream.start(); q.awaitTermination()
    }
    // the at-least-once REPLAY shape: re-deliver batch ids 0..1 through
    // a fresh checkpoint (same data, same ids) — appendBatch must no-op
    // on the replay markers
    val mem2 = MemoryStream[(Long, String)]
    val replay = graft.retrieval.Postings.maintainFromStream(
      mem2.toDF().toDF("doc_id", "text"), "doc_id", "text", name)
      .option("checkpointLocation", s"$path/ckpt_replay")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    count("micro-batch 0 REPLAYED (no-op)") {
      mem2.addData(docs.take(half / 2))
      val q = replay.start(); q.awaitTermination()
    }
    graft.retrieval.Postings.dropIndex(spark, name)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    spark.stop()
  }
}
