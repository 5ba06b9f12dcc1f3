package graft

import graft.sources.{IndexLifecycle, Layout}
import org.apache.spark.sql.functions._

/** Focused regression legs for the round-18 optimization work — each
  * pins an internals change that removed a job or a directory listing
  * against the semantics the slower r17 form guaranteed:
  *
  *  - `Layout.createEmptyTable` (the zero-JOB replacement for the
  *    zero-row writes in writeEmptyTombs/writeEmptyMarkers/clearTombs)
  *    must produce a table that reads empty, accepts insertInto, and
  *    OVERWRITES stale files from a previous build at the same path;
  *  - `Layout.parquetDirStatsAt` must fail CLOSED (rows == -1, so
  *    callers fall back to the probe job) on a nested/unexpected
  *    layout instead of undercounting (ADVICE r17), while bookkeeping
  *    entries (`_`/`.` prefixed) stay ignored;
  *  - the fused guard probes (`liveView`, `requireNotTombstoned`)
  *    must issue ONE directory listing per call — emptiness and the
  *    broadcast size gate used to pay two listings of the same dir.
  */
class R18OptimizationSpec extends SparkTestBase {
  import spark.implicits._

  private def freshName(tag: String) = s"r18opt_${tag}_${System.nanoTime()}"

  test("createEmptyTable: reads empty, accepts appends, overwrites stale files") {
    val name = freshName("empty")
    val path = s"/tmp/graft_r18opt/$name"
    // a previous build's stale rows at the same path…
    Seq((99L, 1L)).toDF("doc_id", "batch_id")
      .write.mode("overwrite").option("path", path).saveAsTable(name)
    assert(spark.table(name).count() === 1L)
    // …must NOT survive the empty-table (re)creation
    IndexLifecycle.writeEmptyTombs(spark, name, path, "doc_id")
    assert(spark.table(name).count() === 0L)
    assert(Layout.parquetRowCount(spark, name) === 0L)
    assert(!IndexLifecycle.tombsLive(spark, name))
    // the metadata-only table accepts the normal append path
    IndexLifecycle.appendTombs(
      Seq(1L, 2L).toDF("doc_id"), "doc_id", name, "doc_id", batchId = 1L)
    assert(spark.table(name).as[(Long, Long)].collect().toSet === Set((1L, 1L), (2L, 1L)))
    assert(IndexLifecycle.tombsLive(spark, name))
    // clearTombs' metadata-only rebuild: empty again, schema preserved
    IndexLifecycle.clearTombs(spark, name, "doc_id")
    assert(spark.table(name).columns.toSeq === Seq("doc_id", "batch_id"))
    assert(spark.table(name).count() === 0L)
    assert(Layout.parquetRowCount(spark, name) === 0L)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("parquetDirStatsAt fails closed on nested layouts, ignores bookkeeping") {
    val name = freshName("nested")
    val path = s"/tmp/graft_r18opt/$name"
    IndexLifecycle.writeEmptyTombs(spark, name, path, "doc_id")
    IndexLifecycle.appendTombs(
      Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id", name, "doc_id", batchId = 1L)
    val dir = new org.apache.hadoop.fs.Path(path)
    assert(Layout.parquetRowCountAt(spark, dir) === 3L)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bookkeeping entries (_SUCCESS already exists) stay ignored —
    // an underscore-prefixed subdir too (the _bucket_compact shape)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "_scratch_like"))
    assert(Layout.parquetRowCountAt(spark, dir) === 3L)
    // a DATA subdirectory breaks the flat-layout contract: the probe
    // must report -1 (fall back to the slow-correct job), never an
    // authoritative undercount — tombsLive then still sees the rows
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "part=0"))
    assert(Layout.parquetRowCountAt(spark, dir) === -1L)
    assert(IndexLifecycle.tombsLive(spark, name), "fallback probe must see the rows")
    // a foreign data file trips the same distrust
    fs.delete(new org.apache.hadoop.fs.Path(dir, "part=0"), true)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "data.csv"), true)
    out.write('x'); out.close()
    assert(Layout.parquetRowCountAt(spark, dir) === -1L)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("liveView and requireNotTombstoned issue ONE directory listing per guard") {
    val name = freshName("listing")
    val path = s"/tmp/graft_r18opt/$name"
    IndexLifecycle.writeEmptyTombs(spark, name, path, "doc_id")
    IndexLifecycle.appendTombs(
      Seq(7L).toDF("doc_id"), "doc_id", name, "doc_id", batchId = 1L)
    val df  = Seq((7L, "x"), (8L, "y")).toDF("doc_id", "v")
    val ids = Seq((8L, "z")).toDF("doc_id", "v")

    val before = Layout.dirListings.get()
    val live = IndexLifecycle.liveView(spark, name, "doc_id", df, "doc_id")
    val afterPlan = Layout.dirListings.get()
    assert(afterPlan - before === 1L, "liveView guard must list the tombs dir exactly once")
    assert(live.select("doc_id").as[Long].collect().toSeq === Seq(8L))

    val b2 = Layout.dirListings.get()
    IndexLifecycle.requireNotTombstoned(spark, name, "doc_id", ids, "doc_id", "spec")
    assert(Layout.dirListings.get() - b2 === 1L,
      "requireNotTombstoned guard must list the tombs dir exactly once")
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
