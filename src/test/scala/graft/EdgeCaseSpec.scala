package graft

import graft.dedup.Dedup
import graft.operators.Ops
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: empty tables, single rows, all-identical
  * corpora, undersized groups. Every operator must return the
  * mathematically right (often empty) result, never throw — at 100 TB
  * a partition-level retry will eventually feed something degenerate
  * to every operator.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private val docCols = Seq("doc_id", "text")

  test("empty corpus flows through the whole near-dup pipeline") {
    val empty = Seq.empty[(Long, String)].toDF(docCols: _*)
    val arrs  = Dedup.shingleArrays(empty, "doc_id", "text", 3)
    assert(Dedup.jaccardPairs(arrs, "doc_id", 0.5).isEmpty)
    assert(Dedup.containmentPairs(arrs, "doc_id", 0.8).isEmpty)
    assert(Dedup.minhashLshPairs(empty, "doc_id", "text").isEmpty)
    assert(Dedup.simhashPairs(empty, "doc_id", "text", 3).isEmpty)
    assert(Dedup.exactDedup(empty, "doc_id", "text").isEmpty)
    assert(Dedup.dedupComponents(Seq.empty[(Long, Long)].toDF("id1", "id2")).isEmpty)
  }

  test("round-4 operators survive empty and sub-width inputs") {
    val empty = Seq.empty[(Long, String)].toDF(docCols: _*)
    val short = Seq((1L, "two tokens"), (2L, "a b c d")).toDF(docCols: _*) // < k+w-1 run
    assert(Dedup.winnowFingerprints(empty, "doc_id", "text").isEmpty)
    // doc 1 has <3 tokens (no shingles); doc 2 has 2 hashes < window 4
    assert(Dedup.winnowFingerprints(short, "doc_id", "text", 3, 4).isEmpty)
    val arrsE = Dedup.shingleArrays(empty, "doc_id", "text", 3)
    assert(Dedup.rowMinhashBands(arrsE, "doc_id", 8, 2).isEmpty)
    val embE = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.similarity.Knn.semDedup(embE, "vec_id", "embedding", 0.9).isEmpty)
    val one = Seq((5L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val kept = graft.similarity.Knn.semDedup(one, "vec_id", "embedding", 0.9)
      .select("is_kept").as[Boolean].collect()
    assert(kept.sameElements(Array(true))) // a lone vector is never dropped
  }

  test("incremental dedup ops handle empty corpus and empty batch") {
    val empty = Seq.empty[(Long, String)].toDF(docCols: _*)
    val one   = Seq((1L, "alpha beta gamma delta epsilon")).toDF(docCols: _*)
    // empty corpus: everything in the batch is unseen
    assert(Dedup.incrementalExactDedup(empty, one, "doc_id", "text").count() == 1)
    // empty batch: nothing survives, nothing throws
    assert(Dedup.incrementalExactDedup(one, empty, "doc_id", "text").isEmpty)
    assert(Dedup.crossNearDupPairs(empty, one, "doc_id", "text").isEmpty)
    assert(Dedup.crossNearDupPairs(one, empty, "doc_id", "text").isEmpty)
    // batch identical to corpus: fully suppressed
    assert(Dedup.incrementalExactDedup(one, one.select(col("doc_id") + 10, col("text")).toDF(docCols: _*),
      "doc_id", "text").isEmpty)
  }

  test("incremental dedup drops null text on both sides (NOT-IN oracle agreement)") {
    val corpus = Seq((1L, Some("alpha beta")), (2L, None)).toDF(docCols: _*)
    val batch  = Seq((10L, Some("alpha beta")), (11L, Some("fresh text")), (12L, None)).toDF(docCols: _*)
    val got = Dedup.incrementalExactDedup(corpus, batch, "doc_id", "text")
    // null-text rows vanish (not kept-as-unseen); the one genuinely
    // fresh document survives — matching SQL NOT IN over non-null hashes
    assert(got.select("doc_id").as[Long].collect().toSeq == Seq(11L))
  }

  test("centroid-blocked embedding ops survive empty corpora and empty batches") {
    import graft.similarity.Knn
    val embE = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val emb  = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f))).toDF("vec_id", "embedding")
    val e = emb.select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    // empty corpus through the centroid path: no rows, no throw
    assert(Dedup.embeddingNearDupLsh(embE, "vec_id", "embedding", 0.5,
      centroids = Some(cents), probes = 2).isEmpty)
    assert(Knn.semDedup(embE, "vec_id", "embedding", 0.5,
      centroids = Some(cents), probes = 2).isEmpty)
    // empty ARRIVING batch against a real index: empty result
    val idx = Knn.indexCorpus(emb, cents, "vec_id", "embedding")
    val centSeq = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    assert(Knn.streamingEmbeddingMatches(embE, idx, centSeq, "vec_id", "embedding", 0.5).isEmpty)
    // real batch against an EMPTY corpus index: empty result
    val idxE = Knn.indexCorpus(embE, cents, "vec_id", "embedding")
    assert(Knn.streamingEmbeddingMatches(emb, idx.limit(0), centSeq, "vec_id", "embedding", 0.5).isEmpty)
    assert(idxE.isEmpty)
  }

  test("collapseRuns (d43) is total on empty and whitespace-only docs") {
    import graft.functions.TextAnalysis
    import graft.operators.TrainingQueries
    // ADVICE r4: the previous sequence(1, size) form built a descending
    // [1, 0] on zero-token docs and crashed element_at; the index-filter
    // form must return an empty keep-set instead.
    val docs = Seq((1L, ""), (2L, "   \t  "), (3L, "a a b b b c"), (4L, "x")).toDF(docCols: _*)
    val got = docs
      .select(col("doc_id"), TrainingQueries.collapseRuns(TextAnalysis.tokens(col("text"))).as("kept"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L) == Seq("a", "b", "c"))
    assert(got(4L) == Seq("x"))
  }

  test("single document produces no pairs but survives every operator") {
    val one  = Seq((1L, "alpha beta gamma delta")).toDF(docCols: _*)
    val arrs = Dedup.shingleArrays(one, "doc_id", "text", 3)
    assert(Dedup.jaccardPairs(arrs, "doc_id", 0.5).isEmpty)
    assert(Dedup.simhashPairs(one, "doc_id", "text", 3).isEmpty)
    assert(Dedup.exactDedup(one, "doc_id", "text").count() == 1)
  }

  test("all-identical corpus: every pair found, one component, one keeper") {
    val n    = 6
    val docs = (1 to n).map(i => (i.toLong, "same exact text for everyone here")).toDF(docCols: _*)
    val arrs = Dedup.shingleArrays(docs, "doc_id", "text", 3)
    val pairs = Dedup.jaccardPairs(arrs, "doc_id", 0.5)
    assert(pairs.count() == n * (n - 1) / 2)
    assert(pairs.agg(min(col("jac"))).as[Double].head() == 1.0)
    val comp = Dedup.dedupComponents(pairs)
    assert(comp.filter(col("is_representative")).count() == 1)
    assert(Dedup.dropNearDuplicates(docs, "doc_id", pairs).count() == 1)
  }

  test("documents shorter than the shingle width vanish from the index, keep fingerprint row") {
    val docs = Seq((1L, "two words"), (2L, "a much longer document with many words")).toDF(docCols: _*)
    val arrs = Dedup.shingleArrays(docs, "doc_id", "text", 3)
    // doc 1 has an empty shingle set: no pairs, no index rows
    assert(Dedup.explodeShingles(arrs, "doc_id").filter(col("doc_id") === 1).isEmpty)
    assert(Dedup.jaccardPairs(arrs, "doc_id", 0.5).isEmpty)
  }

  test("bandedRangeJoin with an empty side returns empty, not error") {
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "lt")
    val r = Seq.empty[(Long, Long, Long)].toDF("rid", "k", "rt")
    assert(Ops.bandedRangeJoin(l, r, Seq("k"), "lt", "rt", 10L).isEmpty)
    assert(Ops.bandedRangeJoin(r.toDF("lid", "k", "lt"), l.toDF("rid", "k", "rt"), Seq("k"), "lt", "rt", 10L).isEmpty)
  }

  test("topKPerGroup with k larger than any group returns whole groups ranked") {
    val df  = Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (2L, 1.0, 20L)).toDF("k", "ord", "id")
    val got = Ops.topKPerGroup(df, "k", "ord", "id", 100)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == Set((1L, 1L, 7.0, 11L), (1L, 2L, 5.0, 10L), (2L, 1L, 1.0, 20L)))
  }

  test("x02e rank-and-interpolate: n=1 groups collapse, 2-row groups interpolate bit-exactly") {
    // the two boundary shapes of type-7 interpolation: a single-row
    // group (pos=0, lo=hi, hi_rk clamped to n) must return its value at
    // every p; a 2-row group must interpolate lo + (hi-lo)*p with the
    // exact IEEE arithmetic the query and its DuckDB oracle share
    val dir = java.nio.file.Files.createTempDirectory("graft_x02e_edge").toFile
    Seq(
      (1L, 0L, 1L, "a", 42.5, "{}"),
      (2L, 0L, 1L, "b", 10.0, "{}"),
      (3L, 0L, 2L, "b", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    val got = SparkEntry.queries("x02e_exact_quantiles")(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    def interp(lo: Double, hi: Double, p: Double, n: Long): Double = {
      val pos = p * (n - 1).toDouble
      lo + (hi - lo) * (pos - math.floor(pos))
    }
    val exp = Seq(
      ("a", 0L, 42.5), ("a", 1L, 42.5), ("a", 2L, 42.5),
      ("b", 0L, interp(10.0, 20.0, 0.5, 2)),
      ("b", 1L, interp(10.0, 20.0, 0.9, 2)),
      ("b", 2L, interp(10.0, 20.0, 0.99, 2)))
    assert(got == exp, s"got $got")
  }

  test("asofJoin with no prior right rows keeps null matches") {
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "lt")
    val r = Seq((9L, 1L, 200L)).toDF("rid", "k", "rt") // only AFTER the left row
    val got = Ops.asofJoin(l, r, Seq("k"), "lt", "rt")
    assert(got.count() == 1)
    assert(got.filter(col("matched").isNull).count() == 1)
  }
}
