package graft

import graft.retrieval.Postings
import graft.similarity.Knn
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The index fsck (`Postings.checkIndex` / `Knn.checkIvfIndex`):
  * green across a full healthy lifecycle, and each injected
  * corruption flips EXACTLY the check built to catch it.
  */
class IndexCheckSpec extends SparkTestBase {
  import spark.implicits._

  private def checkMap(df: org.apache.spark.sql.DataFrame): Map[String, Boolean] =
    df.select("check", "ok").as[(String, Boolean)].collect().toMap

  private val docs = Seq(
    (1L, "spark merge join spark", "en"),
    (2L, "hash table scan row", "de"),
    (3L, "spark spark filter sort merge", "en"),
    (4L, "merge row spark merge", "fr"),
    (5L, "vector merge spark table", "en"),
    (6L, "   ", "de"), // token-less: counts in N, no postings
    (7L, "spark merge scan", "de"))

  test("posting-index fsck: green through build/append/delete/compact; torn delete and bogus stats flip the right checks") {
    val dir = Files.createTempDirectory("graft_fsck").toString
    val name = "t_fsck_a"
    try {
      Postings.writeIndex(
        docs.take(4).toDF("doc_id", "text", "lang"), "doc_id", "text", name, dir,
        buckets = 4, metaCols = Seq("lang"))
      Postings.writePositionalIndex(
        docs.take(4).toDF("doc_id", "text", "lang"), "doc_id", "text", name, s"$dir/pos", buckets = 4)
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity), "fresh build not green")
      Postings.appendBatch(
        docs.drop(4).toDF("doc_id", "text", "lang"), "doc_id", "text", name, batchId = 1L)
      Postings.deleteBatch(
        docs.filter(d => Set(3L, 5L)(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", name, batchId = 2L)
      val afterDelete = checkMap(Postings.checkIndex(spark, name))
      assert(afterDelete.values.forall(identity), s"tombstoned-at-rest state not green: $afterDelete")
      Postings.compactIndex(spark, name)
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity), "post-compaction not green")

      // TORN delete: tombstones landed, the negative stats row did not
      // (the documented crash window) — fsck must report exactly the
      // stats invariant broken, i.e. "a delete replay is owed"
      Seq((1L, 9L)).toDF("doc_id", "batch_id").write.mode("append").insertInto(s"${name}_tombs")
      val torn = checkMap(Postings.checkIndex(spark, name))
      assert(!torn("sum_dl_equals_live_tf_sum"), "torn delete not detected")
      assert(torn("stats_total_nonnegative") && torn("marker_log_unique"))
      // replaying the batch (the documented repair) restores green
      Postings.deleteBatch(
        docs.filter(_._1 == 1L).toDF("doc_id", "text", "lang"), "doc_id", "text", name, batchId = 9L)
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity),
        "replayed torn delete must restore a green fsck")

      // bogus stats row (simulated lost postings / operator mistake)
      spark.range(1)
        .select(lit(5L).as("n_docs"), lit(100L).as("sum_dl"), lit(-1L).as("batch_id"))
        .write.mode("append").insertInto(s"${name}_stats")
      val bogus = checkMap(Postings.checkIndex(spark, name))
      assert(!bogus("sum_dl_equals_live_tf_sum"), "bogus stats row not detected")
    } finally Postings.dropIndex(spark, name)
  }

  test("legacy single-column marker log refuses loudly instead of mis-reading replay state") {
    // a pre-r14 index persisted its marker log as bare (batch_id);
    // under the kind-separated contract that log is unreadable —
    // committed appends would be invisible to a kind-filtered replay
    // check, so a replayed batch would silently re-apply. The
    // lifecycle refuses with the rebuild message instead.
    val dir = Files.createTempDirectory("graft_legacy").toString
    try {
      spark.range(0).select(col("id").as("batch_id"))
        .write.mode("overwrite").option("path", s"$dir/m").saveAsTable("t_legacy_markers")
      val e1 = intercept[IllegalArgumentException] {
        graft.sources.IndexLifecycle.markerPresent(spark, "t_legacy_markers", 0L, "a")
      }
      assert(e1.getMessage.contains("legacy") && e1.getMessage.contains("rebuild"))
      val e2 = intercept[IllegalArgumentException] {
        graft.sources.IndexLifecycle.writeMarker(spark, "t_legacy_markers", 0L, "d")
      }
      assert(e2.getMessage.contains("legacy"))
    } finally spark.sql("DROP TABLE IF EXISTS t_legacy_markers")
  }

  test("IVF fsck: green through the lifecycle; duplicate vector, foreign cell, drifted norm flip the right checks") {
    val dir = Files.createTempDirectory("graft_fsckv").toString
    val name = "t_fsck_v"
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", name, dir, buckets = 4)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", name, batchId = 1L)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", name, batchId = 2L)
      assert(checkMap(Knn.checkIvfIndex(spark, name)).values.forall(identity),
        "tombstoned-at-rest IVF state not green")
      Knn.compactIvfIndex(spark, name)
      assert(checkMap(Knn.checkIvfIndex(spark, name)).values.forall(identity), "post-compaction not green")

      // corruption rows are built from a COLLECTED local copy (an
      // insertInto whose source reads the target table is its own
      // hazard, not the one under test)
      def oneRow() = {
        val t = Knn.ivfTable(spark, name)
        spark.createDataFrame(java.util.Arrays.asList(t.limit(1).collect(): _*), t.schema)
      }

      // duplicate vector row (a replay that somehow bypassed the
      // marker log): vector_unique flips, nothing else
      oneRow().write.mode("append").insertInto(s"${name}_ivf")
      val dup = checkMap(Knn.checkIvfIndex(spark, name))
      assert(!dup("vector_unique") && dup("cells_from_model") && dup("norms_consistent"))

      // foreign cell (no centroid can route a query to it): fresh id
      // so vector_unique isolates — only cells_from_model flips further
      oneRow()
        .select(lit(999L).as("cell"), lit(999999L).as("n_id"), col("nv"), col("nn"))
        .write.mode("append").insertInto(s"${name}_ivf")
      val foreign = checkMap(Knn.checkIvfIndex(spark, name))
      assert(!foreign("cells_from_model") && foreign("norms_consistent"))

      // drifted norm: norms_consistent flips
      oneRow()
        .select(col("cell"), lit(999998L).as("n_id"), col("nv"), (col("nn") + 1.0).as("nn"))
        .write.mode("append").insertInto(s"${name}_ivf")
      assert(!checkMap(Knn.checkIvfIndex(spark, name))("norms_consistent"))
    } finally Knn.dropIvfIndex(spark, name)
  }
}
