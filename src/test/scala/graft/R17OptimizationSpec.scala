package graft

import graft.retrieval.Postings
import org.apache.spark.sql.functions._

/** Focused regression legs for the round-17 optimization work — each
  * pins an internals change that removed a pass or a job against the
  * semantics the slower r16 form guaranteed:
  *
  *  - append/delete batch stats now ride the write as observe()
  *    metrics instead of a separate statsRow pass — the stats TABLE
  *    VALUES must equal statsRow's fold bit-for-bit, including the
  *    edge batches (null-text rows screened, zero-token docs counted
  *    in n_docs with 0 dl, empty batches committing NO marker);
  *  - `Layout.parquetRowCount` (the footer-metadata emptiness probe
  *    that replaced the limit-1 job in tombsLive/liveView/
  *    requireNotTombstoned) must agree with a real count on plain
  *    tables across their lifecycle (fresh-empty, appended, cleared).
  */
class R17OptimizationSpec extends SparkTestBase {
  import spark.implicits._

  private def freshName(tag: String) = s"r17opt_${tag}_${System.nanoTime()}"

  test("append/delete stats via observe equal statsRow's fold, edge docs included") {
    val name = freshName("obs")
    val path = s"/tmp/graft_r17opt/${name}"
    val base = Seq(
      (1L, "alpha beta beta"),
      (2L, "gamma")
    ).toDF("doc_id", "text")
    Postings.writeIndex(base, "doc_id", "text", name, path, buckets = 4)

    // edge batch: a normal doc, a ZERO-TOKEN doc (counts in n_docs,
    // adds 0 to sum_dl), and a NULL-text doc (screened out entirely)
    val batch = Seq(
      (3L, "alpha delta"),
      (4L, "   "),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val expected = Postings.statsRow(batch, "doc_id", "text", 7L).collect().head
    Postings.appendBatch(batch, "doc_id", "text", name, batchId = 7L)
    val written = spark.table(s"${name}_stats").filter(col("batch_id") === 7L).collect()
    assert(written.length === 1)
    assert(written.head.getLong(0) === expected.getLong(0), "n_docs")
    // (ADVICE r17: the old disjunction was vacuous when both sides
    // were non-null — compare nullity, THEN values when non-null)
    assert(written.head.isNullAt(1) === expected.isNullAt(1), "sum_dl nullity")
    if (!expected.isNullAt(1))
      assert(written.head.getLong(1) === expected.getLong(1), "sum_dl")
    // the fold itself: 2 screened docs, dl 2 + 0
    assert(written.head.getLong(0) === 2L)
    assert(written.head.getLong(1) === 2L)

    // delete batch stats (negative marker) — same fold, negated
    val del = Seq((3L, "alpha delta")).toDF("doc_id", "text")
    val delExpected = Postings.statsRow(del, "doc_id", "text", 9L).collect().head
    Postings.deleteBatch(del, "doc_id", "text", name, batchId = 9L)
    val delWritten = spark.table(s"${name}_stats").filter(col("batch_id") === 9L).collect()
    assert(delWritten.length === 1)
    assert(delWritten.head.getLong(0) === -delExpected.getLong(0))
    assert(delWritten.head.getLong(1) === -delExpected.getLong(1))

    // EMPTY batches (all-null text) commit neither rows nor markers
    val empty = Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    Postings.appendBatch(empty, "doc_id", "text", name, batchId = 11L)
    Postings.deleteBatch(empty, "doc_id", "text", name, batchId = 12L)
    assert(spark.table(s"${name}_stats")
      .filter(col("batch_id").isin(11L, 12L)).isEmpty, "empty batches must not mark")

    Postings.dropIndex(spark, name)
  }

  test("footer row count agrees with a real count across a plain table's lifecycle") {
    val name = freshName("rows")
    val path = s"/tmp/graft_r17opt/${name}"
    graft.sources.IndexLifecycle.writeEmptyTombs(spark, name, path, "doc_id")
    assert(graft.sources.Layout.parquetRowCount(spark, name) === 0L)
    assert(!graft.sources.IndexLifecycle.tombsLive(spark, name))

    graft.sources.IndexLifecycle.appendTombs(
      Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id", name, "doc_id", batchId = 1L)
    assert(graft.sources.Layout.parquetRowCount(spark, name) ===
      spark.table(name).count())
    assert(graft.sources.IndexLifecycle.tombsLive(spark, name))

    // coalesce preserves the count; clear takes it back to zero
    graft.sources.Layout.coalescePlain(spark, name)
    assert(graft.sources.Layout.parquetRowCount(spark, name) === 3L)
    graft.sources.IndexLifecycle.clearTombs(spark, name, "doc_id")
    assert(graft.sources.Layout.parquetRowCount(spark, name) === 0L)
    assert(!graft.sources.IndexLifecycle.tombsLive(spark, name))
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
