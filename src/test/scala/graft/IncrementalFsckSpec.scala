package graft

import graft.retrieval.Postings
import graft.similarity.Knn
import graft.sources.{FsckWatermark, Layout}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Round-17 maintenance-cadence fsck (`checkIndexIncremental` /
  * `checkIvfIndexIncremental`) — the VERDICT r16 #1 "done" criteria,
  * pinned:
  *   1. incremental-green == full-green on a touched subset (the
  *      scoped pass re-verifies exactly the buckets that moved);
  *   2. corruption in a TOUCHED bucket goes red incrementally, with
  *      the same check name the full pass raises, and the watermark
  *      does not advance;
  *   3. fingerprint-evading corruption in an UNTOUCHED bucket is
  *      invisible to the incremental pass (the documented trust
  *      boundary) and is caught by the next FULL `checkIndex`.
  * Plus the r16 #2 rebucket-coherence row + auto-resume, and the
  * ADVICE overflow guard on the growth policies.
  */
class IncrementalFsckSpec extends SparkTestBase {
  import spark.implicits._

  private def checkMap(df: org.apache.spark.sql.DataFrame): Map[String, Boolean] =
    df.select("check", "ok").as[(String, Boolean)].collect().toMap

  private def scopeDetail(df: org.apache.spark.sql.DataFrame): String =
    df.filter(col("check") === "fsck_scope").select("detail").as[String].head()

  private val docs = (1L to 40L).map { i =>
    (i, s"spark merge w$i join t${i % 7} hash vector scan row filter b${i % 11}", s"l${i % 3}")
  }

  private def dupBucketFile(table: String, preferUntouchedOf: Set[Int] = Set.empty): Int = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val dir = new org.apache.hadoop.fs.Path(meta.location)
    val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .find(s => Layout.bucketIdOf(s.getPath.getName).exists(b => !preferUntouchedOf.contains(b)))
      .getOrElse(fail(s"no parquet file to duplicate in $table"))
    val dst = new org.apache.hadoop.fs.Path(dir, "dup-" + f.getPath.getName)
    org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs, dst, false, spark.sparkContext.hadoopConfiguration)
    spark.catalog.refreshTable(table)
    Layout.bucketIdOf(f.getPath.getName).get
  }

  test("incremental fsck: full fallback records a watermark; an idle index re-checks zero buckets; a small append re-checks a strict subset, green == full") {
    val dir  = Files.createTempDirectory("graft_ifsck").toString
    val name = "t_ifsck_a"
    try {
      Postings.writeIndex(
        docs.take(30).toDF("doc_id", "text", "lang"), "doc_id", "text", name, dir,
        buckets = 16, metaCols = Seq("lang"))
      // run 1: no watermark — must BE the full check, then record
      val r1 = Postings.checkIndexIncremental(spark, name)
      assert(checkMap(r1).values.forall(identity), s"run 1 not green: ${checkMap(r1)}")
      assert(scopeDetail(r1).contains("full: no (or unreadable) watermark"))
      assert(scopeDetail(r1).contains("watermark recorded"))
      // run 2: nothing moved — zero touched buckets
      val r2 = Postings.checkIndexIncremental(spark, name)
      assert(checkMap(r2).values.forall(identity), s"idle re-check not green: ${checkMap(r2)}")
      assert(scopeDetail(r2).contains("incremental: postings 0/16"), scopeDetail(r2))
      // a one-doc append touches only that doc's terms' buckets
      Postings.appendBatch(
        Seq((99L, "spark merge", "l0")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", name, batchId = 1L)
      val r3 = Postings.checkIndexIncremental(spark, name)
      val m3 = checkMap(r3)
      assert(m3.values.forall(identity), s"post-append incremental not green: $m3")
      val touched = "incremental: postings (\\d+)/16".r.findFirstMatchIn(scopeDetail(r3))
        .map(_.group(1).toInt).getOrElse(fail(s"no touched count in: ${scopeDetail(r3)}"))
      assert(touched >= 1 && touched < 16,
        s"a 2-term append must touch a strict subset of 16 buckets, got $touched")
      // incremental green == full green, same check verdicts on the shared names
      val full = checkMap(Postings.checkIndex(spark, name))
      (m3.keySet intersect full.keySet).foreach(k =>
        assert(m3(k) == full(k), s"incremental/full disagree on $k"))
      // a delete changes the tombstone set → corpus-wide (column-pruned)
      // aggregate recompute, still green, and the next idle run is 0-touched again
      Postings.deleteBatch(
        Seq((3L, docs(2)._2, "l0")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", name, batchId = 2L)
      val r4 = Postings.checkIndexIncremental(spark, name)
      assert(checkMap(r4).values.forall(identity), s"post-delete incremental not green: ${checkMap(r4)}")
      assert(scopeDetail(r4).contains("tombstones CHANGED"), scopeDetail(r4))
      val r5 = Postings.checkIndexIncremental(spark, name)
      assert(checkMap(r5).values.forall(identity))
      assert(scopeDetail(r5).contains("incremental: postings 0/16") && scopeDetail(r5).contains("tombstones unchanged"),
        scopeDetail(r5))
    } finally {
      FsckWatermark.delete(spark, FsckWatermark.path(spark, s"${name}_postings"))
      Postings.dropIndex(spark, name)
    }
  }

  test("incremental fsck: corruption in a touched bucket goes red with the full check's name and the watermark does not advance") {
    val dir  = Files.createTempDirectory("graft_ifsck").toString
    val name = "t_ifsck_b"
    try {
      Postings.writeIndex(
        docs.take(20).toDF("doc_id", "text", "lang"), "doc_id", "text", name, dir, buckets = 8)
      assert(checkMap(Postings.checkIndexIncremental(spark, name)).values.forall(identity))
      // duplicate one bucket file: its fingerprint moves (touched), and the
      // duplicated rows break Σtf == sum_dl exactly as the full check sees it
      dupBucketFile(s"${name}_postings")
      val red = Postings.checkIndexIncremental(spark, name)
      val m   = checkMap(red)
      assert(!m("sum_dl_equals_live_tf_sum"), s"duplicated bucket file not caught: $m")
      assert(scopeDetail(red).contains("watermark NOT advanced"), scopeDetail(red))
      assert(!checkMap(Postings.checkIndex(spark, name))("sum_dl_equals_live_tf_sum"))
      // the un-advanced watermark keeps the evidence window open: the next
      // incremental run still sees the bucket as touched and stays red
      assert(!checkMap(Postings.checkIndexIncremental(spark, name))("sum_dl_equals_live_tf_sum"))
    } finally {
      FsckWatermark.delete(spark, FsckWatermark.path(spark, s"${name}_postings"))
      Postings.dropIndex(spark, name)
    }
  }

  test("incremental fsck trust boundary: fingerprint-evading corruption in an untouched bucket stays green incrementally and is caught by the full pass") {
    val dir  = Files.createTempDirectory("graft_ifsck").toString
    val name = "t_ifsck_c"
    val postT = s"${name}_postings"
    try {
      Postings.writeIndex(
        docs.take(20).toDF("doc_id", "text", "lang"), "doc_id", "text", name, dir, buckets = 8)
      assert(checkMap(Postings.checkIndexIncremental(spark, name)).values.forall(identity))
      // corrupt a bucket, then simulate fingerprint evasion (an in-place
      // byte mutation that preserves name/length/mtime) by re-anchoring
      // the watermark's fingerprints at the corrupted file set while
      // keeping the recorded (pre-corruption) aggregates
      dupBucketFile(postT)
      val p   = FsckWatermark.path(spark, postT)
      val old = FsckWatermark.read(spark, p).getOrElse(fail("watermark missing"))
      val (nb, files) = FsckWatermark.bucketFileSets(spark, postT)
      val tm = old.tables(postT)
      val patched = tm.copy(buckets = files.map { case (b, fs) =>
        b -> tm.buckets.getOrElse(b, FsckWatermark.BucketMark(fs, 0L, 0L)).copy(files = fs)
      })
      FsckWatermark.write(spark, p, old.copy(tables = old.tables + (postT -> patched)))
      // the incremental pass trusts the watermark: green, zero touched
      val inc = Postings.checkIndexIncremental(spark, name)
      assert(checkMap(inc).values.forall(identity),
        s"fingerprint-evading corruption should be invisible incrementally: ${checkMap(inc)}")
      assert(scopeDetail(inc).contains(s"incremental: postings 0/$nb"), scopeDetail(inc))
      // the periodic FULL pass holds no watermark trust — red
      assert(!checkMap(Postings.checkIndex(spark, name))("sum_dl_equals_live_tf_sum"),
        "the full pass must catch what the incremental pass is documented to miss")
    } finally {
      FsckWatermark.delete(spark, FsckWatermark.path(spark, postT))
      Postings.dropIndex(spark, name)
    }
  }

  test("IVF incremental fsck: full fallback, zero-touched idle, scoped append, touched-bucket duplicate goes red") {
    val dir  = Files.createTempDirectory("graft_ifsck").toString
    val name = "t_ifsck_iv"
    val ivfT = s"${name}_ivf"
    try {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val ed = e.select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(Knn.dot(col("v"), col("v"))))
      val cents = ed.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      Knn.writeIvfIndex(
        e.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", name, dir, buckets = 8)
      val r1 = Knn.checkIvfIndexIncremental(spark, name)
      assert(checkMap(r1).values.forall(identity), s"run 1 not green: ${checkMap(r1)}")
      assert(scopeDetail(r1).contains("full: no (or unreadable) watermark"))
      val r2 = Knn.checkIvfIndexIncremental(spark, name)
      assert(checkMap(r2).values.forall(identity))
      assert(scopeDetail(r2).contains("incremental: 0/8"), scopeDetail(r2))
      Knn.appendIvfBatch(
        e.filter(col("vec_id") === 1), "vec_id", "embedding", name, batchId = 1L)
      val r3 = Knn.checkIvfIndexIncremental(spark, name)
      val m3 = checkMap(r3)
      assert(m3.values.forall(identity), s"post-append incremental not green: $m3")
      val full = checkMap(Knn.checkIvfIndex(spark, name))
      (m3.keySet intersect full.keySet).foreach(k =>
        assert(m3(k) == full(k), s"incremental/full disagree on $k"))
      // a duplicated cell-bucket file is an intra-bucket duplicate id —
      // exactly what the decomposed vector_unique catches
      dupBucketFile(ivfT)
      val red = checkMap(Knn.checkIvfIndexIncremental(spark, name))
      assert(!red("vector_unique"), s"duplicated ivf bucket file not caught: $red")
      assert(!checkMap(Knn.checkIvfIndex(spark, name))("vector_unique"))
    } finally {
      FsckWatermark.delete(spark, FsckWatermark.path(spark, ivfT))
      Knn.dropIvfIndex(spark, name)
    }
  }

  test("torn bucket-count migration: bucket_spec_coherent goes red, answers stay correct, maintainIncremental auto-resumes to coherence") {
    val dirA = Files.createTempDirectory("graft_reb").toString
    val name = "t_ifsck_reb"
    try {
      val d = docs.toDF("doc_id", "text", "lang")
      Postings.writeIndex(d, "doc_id", "text", name, dirA, buckets = 4, metaCols = Seq("lang"))
      Postings.writePositionalIndex(d, "doc_id", "text", name, s"$dirA/pos", buckets = 4)
      Postings.deleteBatch(
        d.filter(col("doc_id") % 7 === 3), "doc_id", "text", name, batchId = 1L)
      def bm25() = Postings.bm25TopK(
        Postings.livePostings(spark, name), Postings.statsTable(spark, name),
        Seq("merge", "hash", "vector"), 10).as[(Long, Long, Long, Double)].collect().toSeq
      val before = bm25()
      // simulate the crash window: rebucketIndex swapped the postings
      // table to 16 and died before the positional/forward swaps (the
      // tombstone-drop rides the swap; the set stays live — clearTombs
      // is strictly last)
      Layout.rebucket(
        spark, s"${name}_postings", 16,
        graft.sources.IndexLifecycle.dropTombstonedTransform(
          spark, s"${name}_tombs", "doc_id", "doc_id"))
      val torn = checkMap(Postings.checkIndex(spark, name))
      assert(!torn("bucket_spec_coherent"), s"mixed bucket counts not flagged: $torn")
      assert(bm25() == before, "answers must survive the torn-migration state")
      // any maintenance entry point auto-resumes
      assert(Postings.maintainIncremental(spark, name, maxFilesPerBucket = 64, maxTombstones = Long.MaxValue),
        "maintenance must report the resume ran")
      val healed = checkMap(Postings.checkIndex(spark, name))
      assert(healed.values.forall(identity), s"post-resume fsck not green: $healed")
      Seq(s"${name}_postings", s"${name}_pospostings", s"${name}_forward").foreach { t =>
        assert(Layout.numBuckets(spark, t) == 16, s"$t not migrated to 16 buckets")
      }
      assert(bm25() == before, "answers must survive the resumed migration")
    } finally Postings.dropIndex(spark, name)
  }

  test("shrink-side rebucket policy: an over-bucketed index (corpus contracted) migrates down to the byte floor; answers unchanged; no-op when healthy or disabled") {
    val dir  = Files.createTempDirectory("graft_shrk").toString
    val name = "t_ifsck_shr"
    try {
      val d = docs.toDF("doc_id", "text", "lang")
      Postings.writeIndex(d, "doc_id", "text", name, dir, buckets = 64)
      def bm25() = Postings.bm25TopK(
        Postings.livePostings(spark, name), Postings.statsTable(spark, name),
        Seq("merge", "hash", "vector"), 10).as[(Long, Long, Long, Double)].collect().toSeq
      val before = bm25()
      val bytes = graft.sources.Layout.parquetBytes(spark, s"${name}_postings")
      // disabled shrink (min=0) and healthy bounds: no-ops
      assert(Postings.rebucketIfMisSized(spark, name,
        maxBytesPerBucket = bytes, minBytesPerBucket = 0L).isEmpty)
      assert(Postings.rebucketIfMisSized(spark, name,
        maxBytesPerBucket = bytes, minBytesPerBucket = 1L).isEmpty,
        "a per-bucket byte count above the floor must not shrink")
      // a floor above the per-bucket bytes shrinks — to the smallest
      // division that restores it, never past the grow bound, floored
      // at minBuckets
      val migrated = Postings.rebucketIfMisSized(spark, name,
        maxBytesPerBucket = bytes, minBytesPerBucket = bytes, minBuckets = 4)
      assert(migrated.contains(4), s"expected shrink to the 4-bucket floor, got $migrated")
      assert(graft.sources.Layout.numBuckets(spark, s"${name}_postings") == 4)
      assert(bm25() == before, "answers must survive the shrink migration")
      // idempotent: the shrunken index is inside both bounds
      assert(Postings.rebucketIfMisSized(spark, name,
        maxBytesPerBucket = bytes, minBytesPerBucket = bytes / 64, minBuckets = 4).isEmpty)
    } finally Postings.dropIndex(spark, name)
  }

  test("IVF shrink-side rebucket policy: migrates down to the byte floor, answers bit-identical, idempotent") {
    val dir  = Files.createTempDirectory("graft_shrk").toString
    val name = "t_ifsck_ivshr"
    try {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val ed = e.select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(Knn.dot(col("v"), col("v"))))
      val cents = ed.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      Knn.writeIvfIndex(e, cents, "vec_id", "embedding", name, dir, buckets = 32)
      def topk() = Knn.ivfTopK(spark, name, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rank"))
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      val before = topk()
      val bytes = graft.sources.Layout.parquetBytes(spark, s"${name}_ivf")
      assert(Knn.rebucketIvfIfMisSized(spark, name,
        maxBytesPerBucket = bytes, minBytesPerBucket = 1L).isEmpty)
      val migrated = Knn.rebucketIvfIfMisSized(spark, name,
        maxBytesPerBucket = bytes, minBytesPerBucket = bytes, minBuckets = 8)
      assert(migrated.contains(8), s"expected shrink to the 8-bucket floor, got $migrated")
      assert(graft.sources.Layout.numBuckets(spark, s"${name}_ivf") == 8)
      assert(topk() == before, "answers must survive the IVF shrink migration")
      assert(Knn.rebucketIvfIfMisSized(spark, name,
        maxBytesPerBucket = bytes, minBytesPerBucket = bytes / 32, minBuckets = 8).isEmpty)
    } finally Knn.dropIvfIndex(spark, name)
  }

  test("shrunkenBucketCount: smallest division restoring the floor, never past the grow bound, floored at minBuckets") {
    // bytes/64 under the floor, bytes/16 at it → one division short of 16? No:
    // 64→16 restores min → stop at 16
    assert(Layout.shrunkenBucketCount(64, 1600L, 100L, 1000L, 4, 4) == 16)
    // the grow bound blocks the last division (1600/4 = 400 > maxBytes 300)
    assert(Layout.shrunkenBucketCount(16, 1600L, 1000L, 300L, 4, 1) == 16)
    // floor at minBuckets even while under-filled
    assert(Layout.shrunkenBucketCount(64, 10L, 100L, Long.MaxValue, 4, 16) == 16)
    // healthy: no shrink
    assert(Layout.shrunkenBucketCount(64, 6400L, 100L, Long.MaxValue, 4, 4) == 64)
  }

  test("growth policies: the candidate count is computed in Long arithmetic, capped loudly — no overflow spin") {
    // the ADVICE r16 shape: an extreme bytes/bound ratio must fail fast,
    // never wrap Int and loop forever
    val ex = intercept[IllegalArgumentException] {
      Layout.grownBucketCount(16, Long.MaxValue, 1L, 4)
    }
    assert(ex.getMessage.contains("maxBytesPerBucket"))
    // the normal ladder: smallest 16·4^k restoring the bound
    assert(Layout.grownBucketCount(16, 1000L, 10L, 4) == 256)
    assert(Layout.grownBucketCount(16, 160L, 10L, 4) == 16)
  }
}
