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
      Seq((1L, 9L)).toDF("doc_id", "batch_id")
        .withColumn("pb", lit(null).cast("array<int>")).withColumn("xb", lit(null).cast("array<int>"))
        .write.mode("append").insertInto(s"${name}_tombs")
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

  test("repairIndex heals every derived corruption: torn delete, dict undercount, forward orphans, marker dups") {
    val dirA = Files.createTempDirectory("graft_rep").toString
    val dirB = Files.createTempDirectory("graft_rep").toString
    val name = "t_rep_a"
    val twin = "t_rep_b"
    def repMap(df: org.apache.spark.sql.DataFrame): Map[String, (Boolean, String)] =
      df.select("repair", "applied", "detail").as[(String, Boolean, String)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
    try {
      Postings.writeIndex(
        docs.take(6).toDF("doc_id", "text", "lang"), "doc_id", "text", name, dirA,
        buckets = 4, metaCols = Seq("lang"))
      Postings.writePositionalIndex(
        docs.take(6).toDF("doc_id", "text", "lang"), "doc_id", "text", name, s"$dirA/pos", buckets = 4)
      Postings.appendBatch(
        docs.drop(6).toDF("doc_id", "text", "lang"), "doc_id", "text", name, batchId = 1L)
      Postings.appendPositionalBatch(
        docs.drop(6).toDF("doc_id", "text", "lang"), "doc_id", "text", name, batchId = 1L)
      // the clean twin: the lifecycle repair must converge to — same
      // corpus with docs 2 and 6 genuinely deleted (live view)
      Postings.writeIndex(
        docs.filterNot(d => Set(2L, 6L)(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", twin, dirB, buckets = 4, metaCols = Seq("lang"))

      // on a HEALTHY index every repair is a no-op
      val noop = repMap(Postings.repairIndex(spark, name))
      assert(noop.values.forall(!_._1), s"healthy index must need no repairs: $noop")

      // ---- torn delete: tombstones for docs 2 (4 tokens) and 6
      // (token-less — only the forward row makes it traceable) landed,
      // the negative stats marker did not ----
      Seq((2L, 9L), (6L, 9L)).toDF("doc_id", "batch_id")
        .withColumn("pb", lit(null).cast("array<int>")).withColumn("xb", lit(null).cast("array<int>"))
        .write.mode("append").insertInto(s"${name}_tombs")
      assert(!checkMap(Postings.checkIndex(spark, name))("sum_dl_equals_live_tf_sum"))
      val r1 = repMap(Postings.repairIndex(spark, name))
      assert(r1("torn_delete_stats")._1, s"torn delete not repaired: $r1")
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity),
        "fsck not green after the torn-delete repair")
      // the restored stats equal a genuine deleteBatch's: survivor
      // totals match the clean twin's
      def totals(n: String) = Postings.statsTable(spark, n)
        .agg(sum(col("n_docs")), sum(col("sum_dl"))).as[(Long, Long)].head()
      assert(totals(name) == totals(twin), s"repaired stats ${totals(name)} != twin ${totals(twin)}")
      def bm25(n: String) = Postings.bm25TopK(
        Postings.livePostings(spark, n), Postings.statsTable(spark, n),
        Seq("spark", "merge", "vector"), 10).as[(Long, Long, Long, Double)].collect().toSeq
      assert(bm25(name) == bm25(twin) && bm25(name).nonEmpty,
        "post-repair ranking diverged from the genuine-delete twin")

      // ---- dictionary under-count: a negative partial makes the df
      // sum under-cover the live postings ----
      val mergeRow = Postings.dictTable(spark, name).filter(col("term") === "merge")
        .limit(1).collect().head
      spark.range(1)
        .select(
          lit(mergeRow.getLong(0)).as("term_h"), lit("merge").as("term"),
          lit(-mergeRow.getLong(2)).as("df"))
        .write.mode("append").insertInto(s"${name}_dict")
      assert(!checkMap(Postings.checkIndex(spark, name))("dict_df_covers_live_postings"))
      val r2 = repMap(Postings.repairIndex(spark, name))
      assert(r2("dict_recount")._1)
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity))
      // recounted df == the twin's (same live corpus)
      assert(Postings.termDfs(spark, name, Seq("spark", "merge", "scan")) ==
        Postings.termDfs(spark, twin, Seq("spark", "merge", "scan")))

      // ---- forward orphans: recreate the forward table minus doc 5 ----
      val kept = Postings.forwardTable(spark, name).filter(col("doc_id") =!= 5L)
      val keptLocal = spark.createDataFrame(
        java.util.Arrays.asList(kept.collect(): _*), kept.schema)
      spark.sql(s"DROP TABLE ${name}_forward")
      graft.sources.Layout.bucketize(
        keptLocal, s"${name}_forward", s"$dirA/forward2", Seq("doc_id"), 4)
      assert(!checkMap(Postings.checkIndex(spark, name))("forward_covers_posting_docs"))
      // without the corpus the repair is reported, not applied
      val r3a = repMap(Postings.repairIndex(spark, name))
      assert(!r3a("forward_orphans")._1 && r3a("forward_orphans")._2.contains("corpus"))
      val r3 = repMap(Postings.repairIndex(
        spark, name, corpus = Some(docs.toDF("doc_id", "text", "lang"))))
      assert(r3("forward_orphans")._1)
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity))
      assert(Postings.liveForward(spark, name).as[(Long, String)].collect().toSet ==
        Postings.liveForward(spark, twin).as[(Long, String)].collect().toSet,
        "re-fetched forward rows diverged from the twin")

      // ---- duplicated marker: replay idempotence restored by dedup ----
      Seq((1L, "a")).toDF("batch_id", "kind").write.mode("append")
        .insertInto(s"${name}_posmarkers")
      assert(!checkMap(Postings.checkIndex(spark, name))("marker_log_unique"))
      val r4 = repMap(Postings.repairIndex(spark, name))
      assert(r4("marker_dedup")._1)
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity))
      // and the replay check still holds: committed batch 1 stays a no-op
      val posRows = Postings.positionalTable(spark, name).count()
      Postings.appendPositionalBatch(
        docs.drop(6).toDF("doc_id", "text", "lang"), "doc_id", "text", name, batchId = 1L)
      assert(Postings.positionalTable(spark, name).count() == posRows)
    } finally {
      Postings.dropIndex(spark, name)
      Postings.dropIndex(spark, twin)
    }
  }

  test("pending dict-delta staging: fsck flags it; repairIndex condemns it and recounts to exactness") {
    // a crashed retirement leaves its staged dict credit on disk —
    // reads stay correct and the dict conservative, but a credit is
    // owed. The repair never APPLIES a found staging (whether its
    // rewrite committed is unknowable at rest — a wrong apply would
    // undercount): it condemns + recounts.
    val dir  = Files.createTempDirectory("graft_ddp").toString
    val name = "t_ddp_a"
    try {
      Postings.writeIndex(
        docs.toDF("doc_id", "text", "lang"), "doc_id", "text", name, dir,
        buckets = 4, metaCols = Seq("lang"))
      val dictLoc = graft.sources.Layout.baseGen(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(s"${name}_dict")).location.toString)
      Seq((123L, "qqq_bogus", -5L)).toDF("term_h", "term", "df")
        .write.parquet(s"$dictLoc.dictdelta")
      val flagged = checkMap(Postings.checkIndex(spark, name))
      assert(!flagged("dict_delta_pending"), "pending staging not flagged")
      assert(flagged.filterNot(_._1 == "dict_delta_pending").values.forall(identity),
        s"only the staging check may be red: $flagged")
      val r = Postings.repairIndex(spark, name)
        .select("repair", "applied").as[(String, Boolean)].collect().toMap
      assert(r("dict_delta_resolve"), s"pending staging not resolved: $r")
      assert(checkMap(Postings.checkIndex(spark, name)).values.forall(identity),
        "fsck not green after the staging repair")
      // the bogus staged rows never reached the dictionary, and the
      // recount restored exact per-term df
      assert(Postings.dictTable(spark, name).filter(col("term") === "qqq_bogus").isEmpty,
        "condemned staging rows reached the dictionary")
      val dictSums = Postings.dictTable(spark, name)
        .groupBy(col("term_h"), col("term")).agg(sum(col("df")).as("df"))
        .filter(col("df") =!= 0L)
      val liveDf = Postings.livePostings(spark, name)
        .groupBy(col("term_h"), col("term")).agg(count(lit(1)).as("df"))
      assert(dictSums.except(liveDf).isEmpty && liveDf.except(dictSums).isEmpty,
        "dictionary not exact after the recount repair")
    } finally Postings.dropIndex(spark, name)
  }

  test("repairIvfIndex turns every red IVF check green; healthy index is a no-op") {
    val dir = Files.createTempDirectory("graft_repv").toString
    val name = "t_rep_v"
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      Knn.writeIvfIndex(emb, cents, "vec_id", "embedding", name, dir, buckets = 4)
      Knn.appendIvfBatch(emb.limit(0), "vec_id", "embedding", name, batchId = 1L) // marker table exercised
      val healthy = Knn.repairIvfIndex(spark, name)
        .select("repair", "applied").as[(String, Boolean)].collect().toMap
      assert(healthy.values.forall(!identity(_)), s"healthy IVF index must need no repairs: $healthy")
      val cleanRows = Knn.ivfTable(spark, name)
        .select(col("cell"), col("n_id"), col("nn")).as[(Long, Long, Double)].collect().toSet

      def oneRow() = {
        val t = Knn.ivfTable(spark, name)
        spark.createDataFrame(java.util.Arrays.asList(t.limit(1).collect(): _*), t.schema)
      }
      // all three structural corruptions at once + a duplicated marker
      oneRow().write.mode("append").insertInto(s"${name}_ivf") // duplicate id
      oneRow()
        .select(lit(999L).as("cell"), lit(999999L).as("n_id"), col("nv"), col("nn"))
        .write.mode("append").insertInto(s"${name}_ivf") // foreign cell
      oneRow()
        .select(col("cell"), lit(999998L).as("n_id"), col("nv"), (col("nn") + 1.0).as("nn"))
        .write.mode("append").insertInto(s"${name}_ivf") // drifted norm
      Seq((7L, "a"), (7L, "a")).toDF("batch_id", "kind")
        .write.mode("append").insertInto(s"${name}_ivfmarkers") // dup marker
      val red = checkMap(Knn.checkIvfIndex(spark, name))
      assert(!red("vector_unique") && !red("cells_from_model") &&
        !red("norms_consistent") && !red("marker_log_unique"))

      val rep = Knn.repairIvfIndex(spark, name)
        .select("repair", "applied").as[(String, Boolean)].collect().toMap
      assert(rep("ivf_rewrite") && rep("marker_dedup"), s"repairs not applied: $rep")
      val green = checkMap(Knn.checkIvfIndex(spark, name))
      assert(green.values.forall(identity), s"fsck not green after repairIvfIndex: $green")
      // the original vectors are untouched (the two injected fresh ids
      // are structurally valid after repair and remain — a repair can
      // heal invariants, not unknow data)
      val repaired = Knn.ivfTable(spark, name)
        .select(col("cell"), col("n_id"), col("nn")).as[(Long, Long, Double)].collect().toSet
      assert(cleanRows.subsetOf(repaired), "repair lost healthy rows")
      assert(repaired.size == cleanRows.size + 2)
    } finally Knn.dropIvfIndex(spark, name)
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

  test("crashed bucket compaction: fsck flags the committed journal, repairIndex replays it to convergence") {
    // the crash window BETWEEN the journal write and the file swap —
    // simulated exactly as compactBuckets leaves it: the replacement
    // file complete under _bucket_compact/ (a byte-copy of the
    // fragment, so the data is row-identical), the journal committed,
    // neither delete nor rename performed.
    val dir  = Files.createTempDirectory("graft_jcrash").toString
    val name = "t_jcrash_a"
    try {
      Postings.writeIndex(
        docs.toDF("doc_id", "text", "lang"), "doc_id", "text", name, dir,
        buckets = 4, metaCols = Seq("lang"))
      def bm25() = Postings
        .bm25TopK(Postings.livePostings(spark, name), Postings.statsTable(spark, name),
          Seq("spark", "merge"), 20)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val before = bm25()

      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(s"${name}_postings"))
      val loc = new java.io.File(meta.location)
      val frag = loc.listFiles.filter(_.getName.endsWith(".parquet")).minBy(_.getName)
      val scratch = new java.io.File(loc, "_bucket_compact")
      scratch.mkdirs()
      val repl = new java.io.File(scratch, s"replay-${frag.getName}")
      java.nio.file.Files.copy(frag.toPath, repl.toPath)
      java.nio.file.Files.write(
        new java.io.File(loc, "_bucket_compact_journal").toPath,
        s"D ${frag.getName}\nM ${repl.getName}".getBytes("UTF-8"))

      val red = checkMap(Postings.checkIndex(spark, name))
      assert(!red("bucket_journal_pending"), "fsck missed the committed journal")
      assert(red.filterNot(_._1 == "bucket_journal_pending").values.forall(identity),
        s"journal crash must flip ONLY the journal check: $red")

      val repairs = Postings.repairIndex(spark, name)
        .select("repair", "applied").as[(String, Boolean)].collect().toMap
      assert(repairs("bucket_journal_replay"), "repairIndex did not replay the journal")
      val green = checkMap(Postings.checkIndex(spark, name))
      assert(green.values.forall(identity), s"fsck red after journal replay: $green")
      assert(bm25() == before && before.nonEmpty,
        "reads diverged across the crash-and-replay (replacement was a byte-copy)")
      assert(!new java.io.File(loc, "_bucket_compact_journal").exists())
      assert(!scratch.exists())
    } finally Postings.dropIndex(spark, name)
  }
}
