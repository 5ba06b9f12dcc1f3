package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text search and DataTables-style endpoint queries
  * (SURVEY §2.9, §3.3 honorable mention).
  */
object SearchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Minimum distance of any raw classic-BM25 score in `scored` to a
    * 5-decimal rounding half-boundary — the d65 margin-guard
    * statistic. An EMPTY match set aggregates min(...) to NULL, which
    * is trivially safe (there is no score to sit near a boundary):
    * read via isNullAt so the guard's `require` never throws an
    * opaque NPE and the callers' explicit empty-page fallbacks stay
    * reachable.
    */
  private[graft] def roundingGridMargin(scored: DataFrame): Double = {
    val row = scored
      .agg(min(abs((col("score") * 1e5) % 1.0 - 0.5)).as("m"))
      .first()
    if (row.isNullAt(0)) Double.MaxValue else row.getDouble(0)
  }

  /** §2.9 — cross-relation text search: the reference builds a
    * SearchVector over FK/M2M hop fields
    * (/root/reference/search_util/search_fields.py:20-39) and filters
    * icontains. Here: customer + nation + region blob, term "asia".
    * The seven sequential per-entity queries of the reference run as one
    * parallel plan; small dims broadcast.
    */
  val q31_text_search: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val blob = Ops.searchBlob(Seq(col("c_name"), col("c_mktsegment"), col("n_name"), col("r_name")))
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(blob.contains("asia"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
      .dropDuplicates("c_custkey")
      .orderBy(col("c_custkey"))
  }

  /** DataTables endpoint shape (/root/reference/tantalus/views.py:1173-1398):
    * annotate countDistinct, OR-of-icontains search, order on the
    * computed column, page cap 50. The reference's per-row N+1
    * render_column lookups fold into the one plan.
    *
    * The search predicate is applied BEFORE the per-order distinct
    * count, and the fact-side aggregation is restricted to matched
    * orders with a semi-join — the count-distinct (the expensive,
    * shuffling half of this plan) runs over only the rows the page can
    * ever show. Catalyst cannot do this rewrite itself (the filter
    * sits above a left join on the aggregated side); result-identical
    * because the left join keeps exactly the matched keys' counts.
    */
  val q32_datatables: Q = (s, dir) => {
    val t = Tables(s, dir)
    val matched = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .filter(
        lower(concat_ws(" ", col("c_name"), col("o_orderstatus"), col("o_orderpriority")))
          .contains("urgent"))
      .select(col("o_orderkey"), col("c_name"))
    val counts = t.lineitem
      .join(matched.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
    matched
      .join(counts, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("c_name"),
        coalesce(col("n_parts"), lit(0L)).as("n_parts"))
      .orderBy(col("n_parts").desc, col("o_orderkey"))
      .limit(50)
  }

  /** P14 — the validated predicate layer applied end-to-end: declared
    * (field, lookup) allowlist compiled to a filter chain, exactly the
    * RestrictedQueryMixin + FilterSet flow of the REST API
    * (/root/reference/tantalus/api/views.py:53-82).
    */
  val q36_restricted_filters: Q = (s, dir) => {
    val t = Tables(s, dir)
    import Predicates.{Lookup, Pred}
    val allowed = Map(
      "c_mktsegment" -> Set[Lookup](Lookup.Exact, Lookup.In),
      "c_acctbal"    -> Set[Lookup](Lookup.Gte, Lookup.Lte),
      "c_name"       -> Set[Lookup](Lookup.IContains))
    Predicates(
      t.customer,
      allowed,
      Seq(
        Pred("c_mktsegment", Lookup.In, Seq[Any]("BUILDING", "MACHINERY")),
        Pred("c_acctbal", Lookup.Gte, 0.0),
        Pred("c_name", Lookup.IContains, "1")))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** BM25-style ranked retrieval over the documents corpus — the
    * relevance-scored search a training-data pipeline uses to pull
    * topical subsets (the reference's search is boolean icontains; this
    * is the ranked upgrade). Okapi shape with two deliberate twists
    * that make the result ORACLE-EXACT (bit-identical doubles, like
    * x02e's interpolation):
    *
    *   - log-free idf surrogate `(N - df + 0.5) / (df + 0.5)` — the
    *     argument of the classic `ln(1 + …)` idf, which is monotone in
    *     it, so each TERM's weighting is order-preserving in isolation;
    *     the MULTI-TERM sum of surrogate weights defines its own
    *     ranking rather than reproducing Okapi BM25's (a per-term
    *     monotone transform does not commute with the sum). The payoff
    *     is avoiding transcendentals whose last bits differ across libm
    *     implementations (ln is not portable bit-for-bit; +,*,/ are
    *     IEEE-exact in both engines given identical inputs);
    *   - a FIXED-ORDER term sum (s1 + s2 + s3, left-assoc in both
    *     engines) — double addition is not associative, so the sum
    *     order is part of the contract.
    *
    * Every input is an integer (tf, dl, N, df, sum_dl) and every double
    * op appears in the same tree shape in the DuckDB oracle, so the
    * driver gate hash-matches the scores bit-for-bit. Plan shape at
    * scale: per-doc tf/dl are fused per-row array expressions (no
    * explode, no shuffle), the corpus stats are ONE map-side-combined
    * aggregation producing a single broadcast row, and the top-50 is a
    * TakeOrderedAndProject — never a global sort.
    */
  private val bm25Terms = Seq("vector", "spark", "merge")

  /** The BM25 scored frame shared by d45 (ranked list) and d46 (fusion
    * arm): (doc_id, dl, tf_*, score) for every document.
    */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    def tf(term: String) =
      size(filter(col("tk"), x => x === lit(term))).cast("long").as(s"tf_$term")
    val scored = t.documents
      .filter(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("tk"))
      .select(Seq(col("doc_id"), size(col("tk")).cast("long").as("dl")) ++ bm25Terms.map(tf): _*)
    val statCols =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
        bm25Terms.map(tm => sum(when(col(s"tf_$tm") > 0, 1L).otherwise(0L)).as(s"df_$tm"))
    val stats = scored.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def termScore(tm: String) = {
      val tfd = col(s"tf_$tm").cast("double")
      val dfc = col(s"df_$tm")
      val idf = ((col("n_docs") - dfc) + lit(0.5)) / (dfc + lit(0.5))
      val tfw = (tfd * lit(2.2)) /
        (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
      idf * tfw
    }
    scored
      .crossJoin(broadcast(stats)) // one row: N, sum_dl, per-term df
      .withColumn(
        "score",
        bm25Terms.map(termScore).reduceLeft(_ + _)) // fixed-order sum — part of the contract
      .select(
        Seq(col("doc_id"), col("dl")) ++ bm25Terms.map(tm => col(s"tf_$tm")) :+ col("score"): _*)
  }

  val d45_bm25_search: Q = (s, dir) =>
    bm25Scored(s, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 arm (d45's
    * top-50) with an embedding-cosine arm (exact top-50 neighbors of
    * query vector 0) — the standard way a curation pipeline combines
    * lexical and semantic relevance without calibrating their
    * incomparable score scales. `rrf = 1/(60 + r_text) + 1/(60 + r_vec)`
    * over INTEGER ranks, a list absence contributing 0 — every double
    * op from integer inputs in the same tree shape as the oracle, so
    * the fusion hash-matches bit-for-bit (ranks match because both
    * arms' orderings already hash-match: d45's scores and e01's cosine
    * machinery). Scale shape: each arm is a distributed top-k
    * (TakeOrderedAndProject / per-query WindowGroupLimit); the ranking
    * windows run over the 50-row truncated frames, never the corpus.
    */
  /** The lexical arm both fusion queries share: d45's top-50 with its
    * integer rank (the global window reads the 50-row truncated frame).
    */
  private def textArmRanked(s: SparkSession, dir: String): DataFrame =
    d45_bm25_search(s, dir) // top-50, corpus-scale part is TakeOrdered
      .withColumn(
        "r_text",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long")) // 50-row frame: the global window reads bounded input
      .select(col("doc_id").as("id"), col("r_text"))

  /** RRF fusion of a ranked text arm and a ranked vector arm —
    * `1/(60 + r)` per present arm, fixed-order sum, top-20.
    */
  private def rrfFuse(text: DataFrame, vec: DataFrame): DataFrame =
    text
      .join(vec, Seq("id"), "full_outer")
      .withColumn(
        "rrf",
        coalesce(lit(1.0) / (lit(60L) + col("r_text")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60L) + col("r_vec")), lit(0.0)))
      .orderBy(col("rrf").desc, col("id"))
      .limit(20)

  val d46_hybrid_rrf: Q = (s, dir) => {
    val t = Tables(s, dir)
    val vec = graft.similarity.Knn
      .bruteTopK(t.embeddings.filter(col("vec_id") === 0), t.embeddings, "vec_id", "embedding", 50)
      .select(col("n_id").as("id"), col("rank").as("r_vec"))
    rrfFuse(textArmRanked(s, dir), vec)
  }

  /** d46 with the semantic arm production-shaped (VERDICT r10 #5): the
    * vector arm searches a trained-centroid IVF index
    * (`Knn.indexCorpus` — at scale: persisted, pre-partitioned by cell)
    * with the query multi-probing its top-3 cells
    * (`Knn.assignCellsMulti`), instead of `Knn.bruteTopK`'s full corpus
    * scan. Per query the work drops to probes/K of the corpus (the
    * candidates join is an equi-join on the cell key, broadcast probe
    * set + one broadcast query row — nothing index-side shuffles), at
    * the price of approximate top-50: probed-arm recall vs the exact
    * arm is measured and floor-gated in RetrievalSpec (the e06
    * pattern). Oracle-exact like d46: the oracle replicates the argmax
    * cell assignment, the probe set, the candidate top-50, and the
    * fused RRF with identical IEEE trees and tie-breaks.
    */
  val d48_hybrid_rrf_ivf: Q = (s, dir) => {
    val t = Tables(s, dir)
    import graft.similarity.Knn
    val e = t.embeddings
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val indexed = Knn.indexCorpus(t.embeddings, cents, "vec_id", "embedding") // (cell, n_id, nv, nn)
    val q      = e.filter(col("vec_id") === 0)
    val qCells = Knn.assignCellsMulti(q, cents, "vec_id", probes = 3).select(col("cell"))
    val cand = indexed
      .join(broadcast(qCells), Seq("cell"))
      .crossJoin(broadcast(q.select(col("v").as("qv"), col("nrm").as("qn")))) // one row
      .filter(col("n_id") =!= 0L)
      .withColumn("cos", Knn.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .select(col("n_id"), col("cos"))
      .orderBy(col("cos").desc, col("n_id"))
      .limit(50)
    val vec = cand
      .withColumn(
        "r_vec",
        row_number().over(Window.orderBy(col("cos").desc, col("n_id"))).cast("long"))
      .select(col("n_id").as("id"), col("r_vec"))
    rrfFuse(textArmRanked(s, dir), vec)
  }

  /** d47's ad-hoc terms — DIFFERENT from d45's compile-time set on
    * purpose: the index answers whatever arrives at runtime.
    */
  private val d47Terms = Seq("scan", "filter", "window", "batch")

  /** JVM-exit cleanup for pid-suffixed index dirs (shared registry —
    * see `sources.Scratch`): without it every gate/bench process
    * leaves a dead copy of the index under /tmp.
    */
  private def cleanupAtExit(path: String): Unit = graft.sources.Scratch.cleanupAtExit(path)

  /** Index-backed parameterized retrieval (the production shape of d45,
    * VERDICT r10 #1): build/refresh the persisted posting-list index
    * (bucketed by term hash — `retrieval.Postings`), then answer an
    * AD-HOC terms list from the index alone. The gated query includes
    * the index build so the round trip (write → bucketed read → score)
    * is what the oracle checks; a production pipeline builds once and
    * amortizes — every per-query stage here touches only the queried
    * terms' postings plus an O(#batches) stats row, never the corpus
    * (zero-index-side-shuffle and append-maintenance proofs in
    * RetrievalSpec).
    */
  val d47_indexed_search: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    // pid-suffixed table name AND path: two JVMs (gate + bench) running
    // the same sf concurrently must not race on the overwrite — one
    // would delete bucket files the other is mid-read on. Within one
    // JVM passes run sequentially, so a stable per-process suffix is
    // exactly the right granularity.
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_bm25_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d47_indexed_search_p$pid"
    cleanupAtExit(path)
    val t      = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(t.documents, "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      d47Terms, 50)
  }

  /** Exact phrase search over a POSITIONAL posting index (the phrase/
    * proximity capability the frequency index can't express): docs
    * containing the consecutive token sequence, ranked by
    * overlap-correct occurrence count. Like d47, the gated query
    * includes the index build so the oracle checks the full round trip
    * (positional write → bucketed read → array-shift adjacency); a
    * production pipeline builds once. The phrase's term postings are
    * the only index rows touched.
    */
  val d49_phrase_search: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_phrase_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d49_phrase_search_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writePositionalIndex(t.documents, "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.phraseTopK(
      graft.retrieval.Postings.livePositional(s, name), Seq("table", "hash"), 50)
  }

  /** Once-per-process index builds for the `_prod` bench variants: the
    * gated d47/d49 time the full write→read round trip every run; a
    * production pipeline builds ONCE and amortizes (write-once/
    * read-many is the index's entire reason to exist). The memo keys
    * on (canonical dir, kind) — first touch builds, every later call
    * answers from the persisted tables, so Bench's min-of-passes
    * reports the amortized QUERY cost while the build cost stays
    * visible in the round-trip queries. Oracle outputs are identical
    * to the round-trip forms (same tables, same terms).
    */
  private val indexMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ensureIndex(s: SparkSession, dir: String, kind: String)(
      build: (String, String) => Unit): String =
    indexMemo.computeIfAbsent(
      {
        val canon = try new java.io.File(dir).getCanonicalPath catch { case _: Throwable => dir }
        s"$canon::$kind"
      },
      _ => {
        val sfName = new java.io.File(dir).getName
        val pid    = ProcessHandle.current().pid()
        val name   = s"graft_${kind}_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
        val path   = s"/tmp/graft_fixtures/$sfName/${kind}_prod_p$pid"
        cleanupAtExit(path)
        build(name, path)
        name
      })

  /** d47's production shape: answer the same ad-hoc terms from the
    * already-persisted index (built once per process). This is the
    * latency a curation user's SECOND-and-later searches pay — the
    * number that justifies the index over d45's full scan.
    */
  val d47p_indexed_prod: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      d47Terms, 50)
  }

  /** d49's production shape: phrase search over the already-persisted
    * positional index.
    */
  val d49p_phrase_prod: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "phraseprod") { (n, p) =>
      graft.retrieval.Postings.writePositionalIndex(t.documents, "doc_id", "text", n, p, buckets = 16)
    }
    graft.retrieval.Postings.phraseTopK(
      graft.retrieval.Postings.livePositional(s, name), Seq("table", "hash"), 50)
  }

  /** Incremental index maintenance AT THE GATE (not just in
    * RetrievalSpec): build the posting index on half the corpus, grow
    * it with `appendBatch` over the other half, then answer from the
    * grown index. The oracle is full-corpus SQL with no knowledge of
    * the split — a hash match proves append-only maintenance (new
    * bucket files + a partial stats row, nothing rewritten) reproduces
    * from-scratch semantics exactly: df derives from the postings, N
    * and sum_dl sum the per-batch partial rows.
    */
  val d50_index_append: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_append_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d50_index_append_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", name)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("group", "order", "row"), 50)
  }

  /** Index compaction AT THE GATE: build the posting index on a third
    * of the corpus, grow it with two committed `appendBatch` batches
    * (each append adds its own file fragments to every bucket), then
    * COMPACT — one file per bucket, per-bucket sort restored,
    * dictionary recounted from survivors, stats commit markers untouched
    * (`Postings.compactIndex`) — and answer from the compacted index.
    * The oracle is full-corpus SQL blind to the build/append/compact
    * history, so a hash match proves the maintenance pass is
    * semantically invisible; the plan-property proofs (bucket pruning
    * and zero index-side shuffle survive compaction) live in
    * RetrievalSpec.
    */
  val d55_index_compact: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_compact_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d55_index_compact_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 3 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 3 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 3 === 2), "doc_id", "text", name, batchId = 2L)
    graft.retrieval.Postings.compactIndex(s, name)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("table", "batch", "window"), 50)
  }

  /** Proximity-ranked retrieval over the positional index (built once
    * per process, shared with d49p): docs where 'vector' and 'merge'
    * co-occur, ranked by pairs-within-3 density then closest gap. The
    * scores are the codegen'd two-pointer kernels
    * (`sorted_pairs_within` / `sorted_min_abs_gap`, O(|a|+|b|)) — the
    * oracle computes the same integers the O(|a|·|b|) way.
    */
  val d52_proximity_search: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "phraseprod") { (n, p) =>
      graft.retrieval.Postings.writePositionalIndex(t.documents, "doc_id", "text", n, p, buckets = 16)
    }
    graft.retrieval.Postings.proximityTopK(
      graft.retrieval.Postings.livePositional(s, name), "vector", "merge", window = 3, k = 50)
  }

  /** Prefix (wildcard) search: resolve `s%` against the persisted term
    * DICTIONARY (distinct-terms-sized — the index's lexicographic side
    * channel, since term-hash bucketing deliberately destroys order),
    * then rank with the resolved list through the normal zero-shuffle
    * posting join. The oracle resolves the same prefix DYNAMICALLY by
    * full scan, so the hash match proves dictionary resolution ==
    * full-scan resolution — including at sf1, where the amplifier's
    * marker tokens grow the matching set 10× (6 terms → 60).
    */
  val d53_prefix_search: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      graft.retrieval.Postings.prefixTerms(s, name, "s"), 50)
  }

  /** Boolean search over the persisted index: (spark AND merge) AND NOT
    * slow — the must-side is relational division over the posting join
    * (the reference's conjunctive tag search, forms.py:537-652,
    * re-expressed against an inverted index), the not-side an
    * anti-join. No corpus scan, no scoring — set semantics.
    */
  val d54_boolean_search: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.booleanSearch(
      graft.retrieval.Postings.livePostings(s, name),
      must = Seq("spark", "merge"), mustNot = Seq("slow"))
  }

  /** Stop-term-screened retrieval: before touching any posting list,
    * the query asks the DICTIONARY which of its terms are ubiquitous
    * (df above ⌊4N/5⌋ — idf contribution ≈0, posting list ≈ the
    * corpus) and drops them (`Postings.screenStopTerms` — a
    * dictionary-sized read; at 100 TB the posting list of a stop term
    * is billions of rows and the screen is what keeps it unread). The
    * oracle replicates the decision from its own full-scan df with
    * the same integer cutoff arithmetic, and the CASE-zeroed
    * contributions are IEEE-identical to the engine's dropped-term
    * fold (x + 0.0 == x for the non-negative contributions), so the
    * hash match proves dictionary screening == full-scan screening.
    */
  val d56_screened_search: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val stats  = graft.retrieval.Postings.statsTable(s, name)
    val nDocs  = stats.agg(sum(col("n_docs")).as("n")).first().getLong(0)
    val cutoff = 4L * nDocs / 5L
    val (kept, _) = graft.retrieval.Postings.screenStopTerms(
      s, name, Seq("batch", "scan", "vector", "spark"), cutoff)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name), stats, kept, 50)
  }

  /** Fuzzy (typo-tolerant) search: the query's misspelled terms
    * ("vectr", "mrge", "sow") resolve against the persisted term
    * DICTIONARY by edit distance ≤ 1 (`Postings.fuzzyTerms` — native
    * `levenshtein` behind a length pre-screen, dictionary-sized read),
    * then the resolved list ("merge","row","slow","vector") drives the
    * normal zero-shuffle posting join. The oracle resolves the SAME
    * typos dynamically by full corpus scan with its own levenshtein,
    * so the hash match proves dictionary resolution == full-scan
    * resolution — the same dynamic-resolution proof shape as d53.
    */
  val d58_fuzzy_search: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      graft.retrieval.Postings.fuzzyTerms(s, name, Seq("vectr", "mrge", "sow")), 50)
  }

  /** The standing-query set shared by the gated batch percolation
    * (d59, over the index) and StreamingSpec's index-free arrival-time
    * matcher — conjunctive alerts of mixed selectivity.
    */
  val standingQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "merge"),
    2L -> Seq("vector", "scan"),
    3L -> Seq("window", "batch", "group"),
    4L -> Seq("slow", "fast"),
    5L -> Seq("hash", "join"),
    6L -> Seq("stream", "table"),
    7L -> Seq("filter", "sort"),
    8L -> Seq("data", "query", "row"))

  /** Batch multi-query retrieval (standing-query percolation): all 8
    * standing queries answered in ONE pruned pass over the posting
    * index (`Postings.matchQueries` — relational division vectorized
    * across queries; the union of standing terms drives the bucket
    * pruning and the broadcast join, zero index-side exchange). The
    * oracle evaluates each query by full-scan `list_has_all`; the
    * all-integer output hash-matches by construction.
    */
  val d59_multiquery_search: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.matchQueries(
      graft.retrieval.Postings.livePostings(s, name), standingQueries)
  }

  /** Faceted search: the (lang, source) breakdown of every doc
    * matching any of the query terms — the inverted side finds the
    * match set through the pruned zero-shuffle join, the doc_id-
    * bucketed FORWARD table decorates it with metadata (only the slim
    * match set exchanges; the corpus text is never rescanned), and
    * the facet aggregation runs map-side-partial over |matches| rows.
    * The oracle recomputes facets by full scan; all-integer output.
    */
  val d60_faceted_search: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.facetCounts(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.liveForward(s, name),
      Seq("spark", "vector"), Seq("lang", "source"))
  }

  /** Scored multi-query retrieval: per-query BM25 top-10 for the same
    * 8 standing queries, one pruned index pass (`Postings.
    * bm25MultiTopK` — the ranked form of d59's percolation: one scan
    * of the union of terms, one (query_id, doc_id)-keyed shuffle, a
    * per-query window over the aggregated frame). Oracle evaluates
    * every query by full scan with the same IEEE score tree and the
    * same rank cut.
    */
  val d61_multiquery_ranked: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.bm25MultiTopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      standingQueries, 10)
  }

  /** Snippet (KWIC) extraction for a ranked result page: BM25 top-10
    * from the persisted index, then a ±3-token window around each
    * doc's FIRST query-term occurrence, sliced from the document text.
    * The fetch stage is the 100 TB shape every search engine has: the
    * ranked ids are k-BOUNDED (10 — collected driver-side by design),
    * so the corpus fetch is a literal `doc_id IN (...)` pushed into
    * the scan (row-group pruned point reads), never a corpus join.
    * All array arithmetic is native (`array_position`, `slice`,
    * `concat_ws`) and 1-based on both engines, so the snippet strings
    * hash-match the oracle exactly.
    */
  val d62_snippets: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val terms = Seq("vector", "merge")
    val top = graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      terms, 10)
    // k-bounded (10) driver collect: the id list becomes a pushed
    // IN filter on the corpus scan — the point-fetch stage
    val ids = top.select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    t.documents
      .filter(col("doc_id").isin(ids: _*))
      .select(
        col("doc_id").cast("long").as("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("tk"))
      // array_position yields 0 for "absent" — nullif() it so least()
      // (null-skipping on both engines) picks the first PRESENT term
      .withColumn(
        "pos",
        least(terms.map(tm => nullif(array_position(col("tk"), tm), lit(0L))): _*)
          .cast("long"))
      .withColumn("start", greatest(col("pos") - 3, lit(1L)))
      .select(
        col("doc_id"),
        col("pos"),
        concat_ws(" ", slice(col("tk"), col("start").cast("int"), lit(7))).as("snippet"))
      .orderBy(col("doc_id"))
  }

  /** Search-after (keyset) pagination over ranked results: page 2
    * (ranks 11–20) fetched with the CURSOR from page 1's last row —
    * `Postings.bm25TopKAfter`'s (score, doc_id) predicate, not an
    * OFFSET that re-ranks and discards page 1. Page N costs page 1
    * (same pruned scan + TakeOrderedAndProject). The oracle takes
    * ranks 11–20 of the full-scan ranking — equal because the order
    * (score DESC, doc_id) is a strict total order and the score
    * doubles are bit-exact across engines.
    */
  val d63_search_after: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val pt = graft.retrieval.Postings.livePostings(s, name)
    val st = graft.retrieval.Postings.statsTable(s, name)
    // page 1 (k-bounded driver collect — its last row is the cursor);
    // an empty page 1 means there is no page 2: return the empty frame
    // rather than dereferencing a cursor that doesn't exist
    val page1 = graft.retrieval.Postings.bm25TopK(pt, st, d47Terms, 10).collect()
    if (page1.isEmpty) graft.retrieval.Postings.bm25TopK(pt, st, d47Terms, 10).limit(0)
    else {
      val last = page1.last
      graft.retrieval.Postings.bm25TopKAfter(
        pt, st, d47Terms, 10,
        afterScore = last.getAs[Double]("score"), afterDoc = last.getAs[Long]("doc_id"))
    }
  }

  /** Document deletion AT THE GATE (the full index lifecycle: build →
    * append → DELETE → query): build the posting index on the even
    * half, grow it with a committed append of the odd half, then
    * DELETE every doc with doc_id % 7 == 3 (`Postings.deleteBatch` —
    * tombstone rows + one negative partial stats row under the same
    * marker-last commit discipline as appends) and answer from the
    * live view. The oracle is full-scan SQL over the SURVIVING corpus
    * (doc_id % 7 <> 3) with no knowledge of the index history — a
    * hash match proves tombstone deletion reproduces hard-delete
    * semantics exactly: the anti-join removes the docs from every
    * match set, df derives from the live postings, and the negative
    * stats row restores the survivor-exact N and sum_dl that every
    * idf and length norm depend on.
    */
  val d64_index_delete: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_delete_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d64_index_delete_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.deleteBatch(
      t.documents.filter(col("doc_id") % 7 === 3), "doc_id", "text", name, batchId = 2L)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("merge", "hash", "vector"), 50)
  }

  /** Deletion on a POSITIONAL-only index at the gate — the branch d64
    * cannot exercise: with no stats table, the tombstone rows
    * themselves carry the replay marker (`deleteBatch`'s tombs-as-
    * marker path), and the phrase reader's adjacency arithmetic runs
    * over the anti-joined live view. Oracle = d49's overlap-correct
    * full-scan phrase SQL over the SURVIVING corpus only.
    */
  val d67_phrase_delete: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_phrdel_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d67_phrase_delete_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writePositionalIndex(
      t.documents, "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.deleteBatch(
      t.documents.filter(col("doc_id") % 5 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.phraseTopK(
      graft.retrieval.Postings.livePositional(s, name), Seq("table", "hash"), 50)
  }

  /** Faceted search over the DENORMALIZED-facets index — the shape the
    * round-13 A/B ADOPTED for facet-dominated workloads
    * (ProfileR13Facets, paired m20/m80: 2.5–2.7× faster than the
    * forward-table join AND flat, e=0.08 vs 0.14, for +19% postings
    * bytes): the matched postings already carry (lang, source), so
    * decoration is one doc_id dedup + a map-side-partial facet agg —
    * no forward table, no join at all. d60 keeps the forward shape
    * gated (it remains the general decoration surface — snippets
    * metadata, per-doc filters); this gate pins the adopted facet
    * path on the same shared index (built denormFacets = true).
    */
  val d66_faceted_denorm: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    graft.retrieval.Postings.facetCountsDenorm(
      graft.retrieval.Postings.livePostings(s, name), Seq("spark", "vector"), Seq("lang", "source"))
  }

  /** CLASSIC (ln-idf) BM25 scoring mode — the Lucene-style ordering a
    * user coming from a Lucene-class engine expects (the surrogate is
    * per-term rank-equivalent but its multi-term SUM defines its own
    * ranking). The transcendental score cannot be hash-gated raw: JVM
    * `Math.log` vs DuckDB/glibc `ln` measured 1-ulp-divergent on
    * ~0.05% of realistic idf arguments (round-13 experiment, pinned in
    * `Postings.bm25AllClassic`'s scaladoc). The gate therefore returns
    * ALL matching docs (membership is integer-exact — no rank or LIMIT
    * boundary for a 1-ulp shift to flip) with the score rounded to 5
    * decimals on BOTH engines, and REFUSES loudly if any raw score
    * sits within 1e-8 grid units of the rounding grid's half-boundaries — the
    * margin check turns the one remaining failure mode into an
    * explicit error instead of a silent hash flip. Bit-exactness of
    * the engine's ln arithmetic itself is pinned against a plain-Scala
    * reference in RetrievalSpec.
    */
  val d65_classic_bm25: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val pt    = graft.retrieval.Postings.livePostings(s, name)
    val st    = graft.retrieval.Postings.statsTable(s, name)
    val terms = Seq("vector", "merge", "scan")
    val margin = roundingGridMargin(graft.retrieval.Postings.bm25ScoredClassic(pt, st, terms))
    // threshold = 100x the measured cross-engine divergence (~1e-10
    // grid units); expected min distance is ~0.5/n_matches (uniform
    // order statistics), so the loud refusal stays ~4e-3 even at sf1
    require(
      margin > 1e-8,
      f"classic-BM25 score within $margin%.2e grid units of a rounding half-boundary — " +
        "the 5-decimal oracle round is not safe for this corpus")
    graft.retrieval.Postings.bm25AllClassic(pt, st, terms)
  }

  /** d64's production shape (the d47p pattern applied to the deletion
    * gate, VERDICT r13 #3): the full build → append → delete lifecycle
    * runs ONCE per process (`ensureIndex` memo), and the gated query
    * times only the READ over the already-tombstoned live view — the
    * latency a curation pipeline pays for every search AFTER a
    * redaction, which is the amortized shape the index exists for.
    * d64 stays gated unchanged (the lifecycle round trip IS its
    * proof); this twin gates the read against the same survivor-only
    * oracle.
    */
  val d64p_delete_prod: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "delprod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", n, p, buckets = 16)
      graft.retrieval.Postings.appendBatch(
        t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", n, batchId = 1L)
      graft.retrieval.Postings.deleteBatch(
        t.documents.filter(col("doc_id") % 7 === 3), "doc_id", "text", n, batchId = 2L)
    }
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("merge", "hash", "vector"), 50)
  }

  /** d67's production shape: phrase search over an already-deleted
    * positional-only index (built + tombstoned once per process);
    * same survivor oracle as d67.
    */
  val d67p_phrase_delete_prod: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "phrdelprod") { (n, p) =>
      graft.retrieval.Postings.writePositionalIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16)
      graft.retrieval.Postings.deleteBatch(
        t.documents.filter(col("doc_id") % 5 === 1), "doc_id", "text", n, batchId = 1L)
    }
    graft.retrieval.Postings.phraseTopK(
      graft.retrieval.Postings.livePositional(s, name), Seq("table", "hash"), 50)
  }

  /** CLASSIC-mode keyset pagination (VERDICT r13 #5): page 2 of the
    * ln-idf ranking, with BOTH the rank and the cursor cut taken on
    * the 5-decimal ROUNDED grid — the proof that the d65 epsilon-
    * oracle technique composes with rank cuts. Raw transcendental
    * scores cannot carry a page boundary (a 1-ulp libm divergence
    * could swap two docs around the cut); on the rounded grid, the
    * d65 margin guard makes every score bit-identical across engines,
    * `(score_r DESC, doc_id)` is a strict total order, and so the
    * oracle's rank-11..20 window lands on the identical row set.
    */
  val d68_classic_after: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val pt    = graft.retrieval.Postings.livePostings(s, name)
    val st    = graft.retrieval.Postings.statsTable(s, name)
    val terms = Seq("vector", "merge", "scan")
    // the d65 margin guard: REFUSE if any raw score sits near a
    // rounding half-boundary (the one failure mode of the 5-decimal
    // grid), so a silent cross-engine hash flip becomes a loud error
    val margin = roundingGridMargin(graft.retrieval.Postings.bm25ScoredClassic(pt, st, terms))
    require(
      margin > 1e-8,
      f"classic-BM25 score within $margin%.2e grid units of a rounding half-boundary — " +
        "the 5-decimal keyset cut is not safe for this corpus")
    val page1 = graft.retrieval.Postings.bm25TopKClassicRounded(pt, st, terms, 10).collect()
    if (page1.isEmpty)
      graft.retrieval.Postings.bm25TopKClassicRounded(pt, st, terms, 10).limit(0)
    else {
      val last = page1.last
      graft.retrieval.Postings.bm25TopKClassicAfter(
        pt, st, terms, 10,
        afterScoreR = last.getAs[Double]("score_r"), afterDoc = last.getAs[Long]("doc_id"))
    }
  }

  /** Persisted-IVF ANN (the embedding twin of d47/d50's round trip):
    * build the cell-bucketed IVF index on HALF the vectors, append the
    * other half under the FROZEN centroid model, then answer e04's
    * exact query from the grown index — the oracle is e04's SQL over
    * the full corpus, blind to the build/append split, so the hash
    * match proves (a) persisted == in-session IVF and (b) append under
    * a frozen model == from-scratch build. The top-k join is a
    * BUCKETED SELF-JOIN on the cell key: both sides read
    * co-partitioned, zero exchange under the join (DedupKnnSpec plan
    * assert).
    */
  val e10_ann_ivf_indexed: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_ivf_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/e10_ann_ivf_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    val e = t.embeddings
      .select(col("vec_id"), graft.similarity.Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(graft.similarity.Knn.dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    graft.similarity.Knn.writeIvfIndex(
      t.embeddings.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", name, path, buckets = 8)
    graft.similarity.Knn.appendIvfBatch(
      t.embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", name)
    // the PRUNED production read (round 13): the 5-query batch assigns
    // under the frozen model and pushes its literal cell IN into the
    // bucketed scan — scan cost tracks the queried cells, never the
    // index (DedupKnnSpec plan assert; assignment and norms recompute
    // the identical IEEE trees the index stored, so the oracle is
    // unchanged from the unpruned self-join form)
    graft.similarity.Knn
      .ivfTopK(s, name, t.embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF vector deletion AT THE GATE (the embedding twin of d64's
    * lifecycle): build the persisted IVF index on the even half under
    * the frozen 8-centroid model, append the odd half (committed),
    * DELETE every vector with vec_id % 9 == 2 (`Knn.deleteIvfBatch` —
    * tombstones anti-joined by the pruned read), and answer the
    * 5-query top-k from the live view. The oracle is e04's full-scan
    * SQL restricted to SURVIVING candidates (queries may still be
    * deleted vectors — you can search WITH any vector; you just can't
    * retrieve one), blind to the build/append/delete history.
    */
  val e11_ivf_delete: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_ivfdel_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/e11_ivf_delete_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    val e = t.embeddings
      .select(col("vec_id"), graft.similarity.Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(graft.similarity.Knn.dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    graft.similarity.Knn.writeIvfIndex(
      t.embeddings.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", name, path, buckets = 8)
    graft.similarity.Knn.appendIvfBatch(
      t.embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", name, batchId = 1L)
    graft.similarity.Knn.deleteIvfBatch(
      t.embeddings.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", name, batchId = 2L)
    graft.similarity.Knn
      .ivfTopK(s, name, t.embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** CLASSIC-mode ranked multi-query retrieval (the second rank-cut
    * composition of the d65 epsilon-oracle technique, next to d68's
    * keyset form): per-query ln-idf top-10 for the same 8 standing
    * queries, with every per-query rank cut taken on the 5-decimal
    * ROUNDED grid. Under the margin guard (now over ALL (query, doc)
    * raw scores — ~8× d65's population, so the loud-refusal
    * probability stays ~a few percent at sf1 and a refusal is an
    * explicit error, never a silent flip) the rounded scores are
    * cross-engine bit-identical and `(score_r DESC, doc_id)` is a
    * strict per-query total order, so all 8 top-10 row sets are
    * engine-independent.
    */
  val d69_classic_multiquery: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val pt = graft.retrieval.Postings.livePostings(s, name)
    val st = graft.retrieval.Postings.statsTable(s, name)
    val margin =
      roundingGridMargin(graft.retrieval.Postings.bm25MultiScoredClassic(pt, st, standingQueries))
    require(
      margin > 1e-8,
      f"classic multi-query score within $margin%.2e grid units of a rounding half-boundary — " +
        "the 5-decimal per-query rank cut is not safe for this corpus")
    graft.retrieval.Postings.bm25MultiTopKClassicRounded(pt, st, standingQueries, 10)
  }

  /** e11's production shape (the d64p twin for vectors): the IVF
    * build → append → delete lifecycle runs once per process; the
    * gated query times only the pruned `ivfTopK` read over the
    * tombstoned live view. Same survivor oracle as e11.
    */
  val e11p_ivf_delete_prod: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "ivfdelprod") { (n, p) =>
      val e = t.embeddings
        .select(col("vec_id"), graft.similarity.Knn.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(graft.similarity.Knn.dot(col("v"), col("v"))))
      val cents = e
        .filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      graft.similarity.Knn.writeIvfIndex(
        t.embeddings.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", n, p, buckets = 8)
      graft.similarity.Knn.appendIvfBatch(
        t.embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", n, batchId = 1L)
      graft.similarity.Knn.deleteIvfBatch(
        t.embeddings.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", n, batchId = 2L)
    }
    graft.similarity.Knn
      .ivfTopK(s, name, t.embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** BUCKET-SCOPED compaction AT THE GATE (VERDICT r14 #1): the d64
    * lifecycle (build even half → committed append of the odd half →
    * delete doc_id % 7 == 3) followed by
    * `Postings.compactFragmentedBuckets` — the incremental maintenance
    * pass that rewrites ONLY policy-triggered buckets and leaves the
    * tombstone set live (a doc's postings span many term buckets; only
    * the full compaction may clear it). The oracle is d64's survivor
    * full-scan SQL, blind to the whole index history — a hash match
    * proves the bucket-scoped rewrite is invisible to every query
    * while it collapses the fragmented buckets' files (the
    * only-touched-buckets and later-full-compact≡fresh-build
    * properties are spec-pinned in RetrievalSpec).
    */
  val d70_bucket_compact: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_bcomp_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d70_bucket_compact_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.deleteBatch(
      t.documents.filter(col("doc_id") % 7 === 3), "doc_id", "text", name, batchId = 2L)
    graft.retrieval.Postings.compactFragmentedBuckets(s, name, maxFilesPerBucket = 1)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("merge", "hash", "vector"), 50)
  }

  /** CLASSIC-mode faceted search on the rounded grid (VERDICT r14 #5):
    * facet counts over the ln-idf top-20 — the proof the d65
    * epsilon-oracle technique composes with DECORATION, not just
    * pagination. The rank cut is taken on the 5-decimal grid under the
    * margin guard (cross-engine bit-identical scores + strict total
    * order ⇒ the top-20 row SET is engine-independent), so the facet
    * aggregation downstream of the cut is over the identical docs on
    * both engines and the all-integer counts hash-match. Decoration is
    * the d62 point-fetch shape: the k-bounded ranked ids become a
    * pushed `IN` on the doc_id-bucketed forward table — row-group
    * pruned point reads, never a corpus join.
    */
  val d71_classic_facets: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val pt    = graft.retrieval.Postings.livePostings(s, name)
    val st    = graft.retrieval.Postings.statsTable(s, name)
    val terms = Seq("vector", "merge", "scan")
    val margin = roundingGridMargin(graft.retrieval.Postings.bm25ScoredClassic(pt, st, terms))
    require(
      margin > 1e-8,
      f"classic-BM25 score within $margin%.2e grid units of a rounding half-boundary — " +
        "the 5-decimal rank cut under the facet aggregation is not safe for this corpus")
    val top = graft.retrieval.Postings.bm25TopKClassicRounded(pt, st, terms, 20)
    val ids = top.select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    graft.retrieval.Postings.liveForward(s, name)
      .filter(col("doc_id").isin(ids: _*))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("source"))
  }

  /** CLASSIC-mode snippet (KWIC) extraction on the rounded grid — the
    * second decoration consumer from VERDICT r14 #5 (facets landed as
    * d71): a ±3-token window around each top-10 doc's first query-term
    * occurrence, downstream of the ln-idf rank cut. The cut is taken
    * on the 5-decimal grid under the margin guard (cross-engine
    * bit-identical rounded scores + strict total order ⇒ the top-10
    * row SET is engine-independent), so the string-valued snippet
    * stage operates on the identical docs on both engines and the
    * snippets hash-match exactly (all array arithmetic native and
    * 1-based on both: `array_position`/`slice`/`concat_ws`). Fetch is
    * the d62 point-fetch shape — the k-bounded ranked ids become a
    * pushed `IN` on the corpus scan, never a corpus join.
    */
  val d72_classic_snippets: Q = (s, dir) => {
    val t = Tables(s, dir)
    val name = ensureIndex(s, dir, "bm25prod") { (n, p) =>
      graft.retrieval.Postings.writeIndex(
        t.documents, "doc_id", "text", n, p, buckets = 16, metaCols = Seq("lang", "source"),
        denormFacets = true)
    }
    val pt    = graft.retrieval.Postings.livePostings(s, name)
    val st    = graft.retrieval.Postings.statsTable(s, name)
    val terms = Seq("vector", "merge", "scan")
    val margin = roundingGridMargin(graft.retrieval.Postings.bm25ScoredClassic(pt, st, terms))
    require(
      margin > 1e-8,
      f"classic-BM25 score within $margin%.2e grid units of a rounding half-boundary — " +
        "the 5-decimal rank cut under the snippet stage is not safe for this corpus")
    val top = graft.retrieval.Postings.bm25TopKClassicRounded(pt, st, terms, 10)
    // k-bounded (10) driver collect: the id list becomes a pushed
    // IN filter on the corpus scan — the point-fetch stage
    val ids = top.select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    if (ids.isEmpty) {
      t.documents
        .select(
          col("doc_id").cast("long").as("doc_id"),
          lit(null).cast("long").as("pos"),
          lit(null).cast("string").as("snippet"))
        .limit(0)
    } else {
      t.documents
        .filter(col("doc_id").isin(ids: _*))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          graft.functions.TextAnalysis.tokens(col("text")).as("tk"))
        // array_position yields 0 for "absent" — nullif() it so least()
        // (null-skipping on both engines) picks the first PRESENT term
        .withColumn(
          "pos",
          least(terms.map(tm => nullif(array_position(col("tk"), tm), lit(0L))): _*)
            .cast("long"))
        .withColumn("start", greatest(col("pos") - 3, lit(1L)))
        .select(
          col("doc_id"),
          col("pos"),
          concat_ws(" ", slice(col("tk"), col("start").cast("int"), lit(7))).as("snippet"))
        .orderBy(col("doc_id"))
    }
  }

  /** Tombstone RETIREMENT at the gate (round 15): d64's full lifecycle
    * (build even half → append odd half → delete every 7th) followed by
    * `maintainIncremental` with a zero tombstone budget — the
    * never-full-rewrite maintenance policy: the tombstoned docs'
    * physical rows are dropped by rewriting exactly the buckets that
    * hold them (trace-scan → `Layout.compactBuckets`), the set clears,
    * and fragmentation defrags bucket-locally — no generation swap
    * anywhere. The oracle is d64's survivor full-scan SQL VERBATIM,
    * blind to the whole maintenance history: a hash match proves
    * retirement is invisible to every query while it bounds the
    * tombstone set (physical-drop and post-clear re-ingest parity are
    * spec-pinned in RetrievalSpec).
    */
  val d73_tombstone_retire: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_retire_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d73_tombstone_retire_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.deleteBatch(
      t.documents.filter(col("doc_id") % 7 === 3), "doc_id", "text", name, batchId = 2L)
    graft.retrieval.Postings.maintainIncremental(
      s, name, maxFilesPerBucket = 1, maxTombstones = 0L)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("merge", "hash", "vector"), 50)
  }

  /** Dict-EXACT retirement at the gate (round 15 — the dict-credit
    * seam closed): d73's lifecycle (build even half → append odd half
    * → delete every 7th) followed by tombstone retirement, and the
    * output is the DICTIONARY itself — per query term, the summed df
    * and its stop/keep classification under the ⌊4N/5⌋ cutoff over
    * the survivor N (the exact read `screenStopTerms` makes before
    * every screened query). The oracle recomputes each term's df from
    * the survivor corpus by full scan, blind to the whole
    * build/append/delete/retire history: a hash match proves
    * retirement left the dictionary EXACT — the staged negative
    * partials credited every dropped posting row — because any
    * residual overcount shifts a df VALUE, not just a downstream
    * ranking. (Before the r15 dict credit, this query fails: the
    * deleted docs' terms keep their pre-delete df until a full
    * compaction.)
    */
  val d74_screened_retire: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_dictret_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d74_screened_retire_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.deleteBatch(
      t.documents.filter(col("doc_id") % 7 === 3), "doc_id", "text", name, batchId = 2L)
    graft.retrieval.Postings.maintainIncremental(
      s, name, maxFilesPerBucket = 1, maxTombstones = 0L)
    val terms = Seq("batch", "scan", "vector", "spark")
    val nDocs = graft.retrieval.Postings.statsTable(s, name)
      .agg(sum(col("n_docs"))).head().getLong(0)
    val cutoff = 4L * nDocs / 5L
    val dfs = graft.retrieval.Postings.termDfs(s, name, terms)
    import s.implicits._
    terms.map(tm => (tm, dfs.getOrElse(tm, 0L), dfs.getOrElse(tm, 0L) <= cutoff))
      .toDF("term", "df", "kept")
      .orderBy(col("term"))
  }

  /** IVF tombstone RETIREMENT at the gate — e11's lifecycle followed
    * by `maintainIvfIncremental` with a zero tombstone budget: the
    * tombstoned vectors' cell buckets are rewritten (a vector lives in
    * ONE cell bucket, so the touched set is minimal by construction),
    * the set clears, fragmentation defrags — never a generation swap.
    * The delete carries the VECTORS (the unified curation shape), so
    * the tombstone rows ride cell-bucket masks and the retirement is
    * SCAN-FREE — touched buckets come from the slim set alone (the
    * ids-only trace-scan fallback is spec-pinned in DedupKnnSpec).
    * Oracle: e11's survivor SQL verbatim, blind to the maintenance.
    */
  val e13_ivf_retire: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_ivfret_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/e13_ivf_retire_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    val e = t.embeddings
      .select(col("vec_id"), graft.similarity.Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(graft.similarity.Knn.dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    graft.similarity.Knn.writeIvfIndex(
      t.embeddings.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", name, path, buckets = 8)
    graft.similarity.Knn.appendIvfBatch(
      t.embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", name, batchId = 1L)
    graft.similarity.Knn.deleteIvfBatch(
      t.embeddings.filter(col("vec_id") % 9 === 2).select(col("vec_id"), col("embedding")),
      "vec_id", name, batchId = 2L, vecCol = Some("embedding"))
    graft.similarity.Knn.maintainIvfIncremental(
      s, name, maxFilesPerBucket = 1, maxTombstones = 0L)
    graft.similarity.Knn
      .ivfTopK(s, name, t.embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF MODEL-REFRESH migration AT THE GATE (VERDICT r14 #4): build
    * the index on the even half under model A (centroids = vectors
    * 0..7), append the odd half committed, then `retrainIvfIndex` to
    * model B (vectors 8..15) — the explicit generation-swap migration
    * that re-assigns every live vector under the new model. The oracle
    * is e04's full-scan SQL with model B's centroid set over the full
    * corpus, blind to the build/append/retrain history — a hash match
    * proves retrained ≡ a fresh build under the new model (recall
    * motivation and bit-for-bit table equality are spec-pinned in
    * DedupKnnSpec).
    */
  val e12_ivf_retrain: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_ivfrt_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/e12_ivf_retrain_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    val e = t.embeddings
      .select(col("vec_id"), graft.similarity.Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(graft.similarity.Knn.dot(col("v"), col("v"))))
    def model(lo: Long, hi: Long) = e
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    graft.similarity.Knn.writeIvfIndex(
      t.embeddings.filter(col("vec_id") % 2 === 0), model(0, 8), "vec_id", "embedding", name, path, buckets = 8)
    graft.similarity.Knn.appendIvfBatch(
      t.embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", name, batchId = 1L)
    graft.similarity.Knn.retrainIvfIndex(s, name, model(8, 16))
    graft.similarity.Knn
      .ivfTopK(s, name, t.embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** BUCKET-COUNT migration at the gate (round 16 — VERDICT r15 #2):
    * d64's full lifecycle (build even half at 16 buckets → committed
    * append of the odd half → delete every 7th) followed by
    * `Postings.rebucketIndex(name, 64)` — the generation-swap
    * migration a 100×-grown corpus needs when its frozen bucket count
    * caps parallelism and makes every bucket-local maintenance pass
    * 1/16th-of-the-index-sized. The oracle is d64's survivor full-scan
    * SQL VERBATIM, blind to the whole history: a hash match proves the
    * migration is invisible to every query — survivors carried exactly
    * (tombstones dropped physically, set cleared), stats and dict
    * survivor-exact — while the physical layout moves to 64 buckets
    * (≡-fresh-build and marginal-cost properties are spec-pinned in
    * RetrievalSpec / ladder-measured in ProfileR16Rebucket).
    */
  val d75_rebucket: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_rebkt_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d75_rebucket_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.deleteBatch(
      t.documents.filter(col("doc_id") % 7 === 3), "doc_id", "text", name, batchId = 2L)
    graft.retrieval.Postings.rebucketIndex(s, name, newBuckets = 64)
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("merge", "hash", "vector"), 50)
  }

  /** IVF bucket-count migration at the gate — e13's lifecycle (build
    * even half at 8 cell buckets → committed append → vector-carrying
    * delete) followed by `Knn.rebucketIvfIndex(name, 32)`: the frozen
    * centroid MODEL stays (assignment unchanged), only the cell-file
    * placement moves to 32 buckets; tombstoned vectors drop physically
    * and the delete-time `cb` masks retire with the set. Oracle: e11's
    * survivor SQL verbatim, blind to the migration.
    */
  val e14_ivf_rebucket: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_ivfrb_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/e14_ivf_rebucket_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    val e = t.embeddings
      .select(col("vec_id"), graft.similarity.Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(graft.similarity.Knn.dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    graft.similarity.Knn.writeIvfIndex(
      t.embeddings.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", name, path, buckets = 8)
    graft.similarity.Knn.appendIvfBatch(
      t.embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", name, batchId = 1L)
    graft.similarity.Knn.deleteIvfBatch(
      t.embeddings.filter(col("vec_id") % 9 === 2).select(col("vec_id"), col("embedding")),
      "vec_id", name, batchId = 2L, vecCol = Some("embedding"))
    graft.similarity.Knn.rebucketIvfIndex(s, name, newBuckets = 32)
    graft.similarity.Knn
      .ivfTopK(s, name, t.embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** The growth POLICY at the gate (round 17 — VERDICT r16 #4): d75's
    * lifecycle, but the migration is triggered by
    * `rebucketIfOvergrown` under a tight per-bucket byte bound — the
    * scheduler-facing call an operator actually runs every maintenance
    * window — not by an explicit `rebucketIndex`. The bound is derived
    * from the index's own measured bytes (⌈bytes/48⌉), which lands the
    * smallest 16·4^k restoring it at 64 across every scale factor, so
    * the gate deterministically exercises probe → target computation →
    * migration; the `require` turns a policy no-op into a loud red.
    * Oracle: d64's survivor full-scan SQL VERBATIM — the
    * policy-triggered migration must be exactly as invisible as d75's
    * explicit one.
    */
  val d76_rebucket_policy: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_rbkpol_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/d76_rebucket_policy_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    graft.retrieval.Postings.writeIndex(
      t.documents.filter(col("doc_id") % 2 === 0), "doc_id", "text", name, path, buckets = 16)
    graft.retrieval.Postings.appendBatch(
      t.documents.filter(col("doc_id") % 2 === 1), "doc_id", "text", name, batchId = 1L)
    graft.retrieval.Postings.deleteBatch(
      t.documents.filter(col("doc_id") % 7 === 3), "doc_id", "text", name, batchId = 2L)
    val bytes = graft.sources.Layout.parquetBytes(s, s"${name}_postings")
    val migrated = graft.retrieval.Postings.rebucketIfOvergrown(
      s, name, maxBytesPerBucket = (bytes + 47L) / 48L)
    require(migrated.contains(64),
      s"growth policy must migrate 16->64 under the derived bound, got $migrated")
    graft.retrieval.Postings.bm25TopK(
      graft.retrieval.Postings.livePostings(s, name),
      graft.retrieval.Postings.statsTable(s, name),
      Seq("merge", "hash", "vector"), 50)
  }

  /** IVF growth policy at the gate — e14's lifecycle with the 8→32
    * migration triggered by `rebucketIvfIfOvergrown` under a
    * ⌈bytes/24⌉ bound (smallest 8·4^k restoring it = 32 at every SF);
    * oracle: e11's survivor SQL verbatim, blind to the policy.
    */
  val e15_ivf_rebucket_policy: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val name   = "graft_ivfrbp_" + sfName.replaceAll("[^A-Za-z0-9]", "_") + s"_p$pid"
    val path   = s"/tmp/graft_fixtures/$sfName/e15_ivf_rebucket_policy_p$pid"
    cleanupAtExit(path)
    val t = Tables(s, dir)
    val e = t.embeddings
      .select(col("vec_id"), graft.similarity.Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(graft.similarity.Knn.dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    graft.similarity.Knn.writeIvfIndex(
      t.embeddings.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", name, path, buckets = 8)
    graft.similarity.Knn.appendIvfBatch(
      t.embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", name, batchId = 1L)
    graft.similarity.Knn.deleteIvfBatch(
      t.embeddings.filter(col("vec_id") % 9 === 2).select(col("vec_id"), col("embedding")),
      "vec_id", name, batchId = 2L, vecCol = Some("embedding"))
    val bytes = graft.sources.Layout.parquetBytes(s, s"${name}_ivf")
    val migrated = graft.similarity.Knn.rebucketIvfIfOvergrown(
      s, name, maxBytesPerBucket = (bytes + 23L) / 24L)
    require(migrated.contains(32),
      s"IVF growth policy must migrate 8->32 under the derived bound, got $migrated")
    graft.similarity.Knn
      .ivfTopK(s, name, t.embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "q31_text_search" -> q31_text_search,
    "q32_datatables"  -> q32_datatables,
    "q36_restricted_filters" -> q36_restricted_filters,
    "d45_bm25_search" -> d45_bm25_search,
    "d46_hybrid_rrf"  -> d46_hybrid_rrf,
    "d47_indexed_search" -> d47_indexed_search,
    "d48_hybrid_rrf_ivf" -> d48_hybrid_rrf_ivf,
    "d49_phrase_search" -> d49_phrase_search,
    "d50_index_append"  -> d50_index_append,
    "d47p_indexed_prod" -> d47p_indexed_prod,
    "d49p_phrase_prod"  -> d49p_phrase_prod,
    "d52_proximity_search" -> d52_proximity_search,
    "d53_prefix_search" -> d53_prefix_search,
    "d54_boolean_search" -> d54_boolean_search,
    "d55_index_compact" -> d55_index_compact,
    "d56_screened_search" -> d56_screened_search,
    "d58_fuzzy_search" -> d58_fuzzy_search,
    "d59_multiquery_search" -> d59_multiquery_search,
    "d60_faceted_search" -> d60_faceted_search,
    "d61_multiquery_ranked" -> d61_multiquery_ranked,
    "d62_snippets" -> d62_snippets,
    "d63_search_after" -> d63_search_after,
    "d64_index_delete" -> d64_index_delete,
    "d65_classic_bm25" -> d65_classic_bm25,
    "d66_faceted_denorm" -> d66_faceted_denorm,
    "d67_phrase_delete" -> d67_phrase_delete,
    "d64p_delete_prod" -> d64p_delete_prod,
    "d67p_phrase_delete_prod" -> d67p_phrase_delete_prod,
    "d68_classic_after" -> d68_classic_after,
    "d69_classic_multiquery" -> d69_classic_multiquery,
    "d70_bucket_compact" -> d70_bucket_compact,
    "d71_classic_facets" -> d71_classic_facets,
    "d72_classic_snippets" -> d72_classic_snippets,
    "d73_tombstone_retire" -> d73_tombstone_retire,
    "d74_screened_retire" -> d74_screened_retire,
    "d75_rebucket" -> d75_rebucket,
    "d76_rebucket_policy" -> d76_rebucket_policy,
    "e13_ivf_retire" -> e13_ivf_retire,
    "e14_ivf_rebucket" -> e14_ivf_rebucket,
    "e15_ivf_rebucket_policy" -> e15_ivf_rebucket_policy,
    "e10_ann_ivf_indexed" -> e10_ann_ivf_indexed,
    "e11_ivf_delete" -> e11_ivf_delete,
    "e11p_ivf_delete_prod" -> e11p_ivf_delete_prod,
    "e12_ivf_retrain" -> e12_ivf_retrain,
  )

  /** Classic-mode oracle: the same full-scan template with
    * `LN(1 + idf_arg)` and a 5-decimal round, ALL matching docs (no
    * LIMIT — membership is integer-exact; rows are hash-compared as a
    * sorted set, so no ordering boundary exists for a 1-ulp libm
    * divergence to flip).
    */
  private def bm25ClassicOracleSql(terms: Seq[String], corpusWhere: String): String = {
    val tf = terms
      .map(t => s"         CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n")
    val dfs = terms
      .map(t => s"         SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n")
    val nm = terms.map(t => s"(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)").mkString("\n            + ")
    val score = terms
      .map(t =>
        s"""LN(1 + (((n_docs - df_$t) + 0.5) / (df_$t + 0.5)))
           |           * ((CAST(tf_$t AS DOUBLE) * 2.2)
           |              / (CAST(tf_$t AS DOUBLE)
           |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
           |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))""".stripMargin)
      .mkString("\n         + ")
    s"""WITH tk AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
       |  FROM documents WHERE $corpusWhere),
       |tf AS (
       |  SELECT doc_id,
       |         CAST(len(tk) AS BIGINT) AS dl,
       |$tf
       |  FROM tk),
       |st AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
       |$dfs
       |  FROM tf)
       |SELECT doc_id, dl, n_matched, ROUND(score, 5) AS score_r FROM (
       |  SELECT doc_id, dl,
       |         CAST($nm AS BIGINT) AS n_matched,
       |         $score
       |         AS score
       |  FROM tf, st) s
       |WHERE n_matched > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle-SQL generator for the BM25 full-scan template every index
    * gate uses (d47/d50/d55 are hand-written literals kept verbatim;
    * new gates generate the identical shape). `corpusWhere` is the
    * surviving-corpus predicate — `text IS NOT NULL` for the full
    * corpus, plus the delete predicate for d64-style lifecycle gates.
    * The score sum is left-associated in `terms` order, the same IEEE
    * tree as the engine's rank-sorted fold (absent terms contribute
    * exact 0.0 and x + 0.0 == x).
    */
  private def bm25OracleSql(terms: Seq[String], corpusWhere: String, k: Int): String = {
    val tf = terms
      .map(t => s"         CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n")
    val dfs = terms
      .map(t => s"         SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n")
    val nm = terms.map(t => s"(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)").mkString("\n            + ")
    val score = terms
      .map(t =>
        s"""(((n_docs - df_$t) + 0.5) / (df_$t + 0.5))
           |           * ((CAST(tf_$t AS DOUBLE) * 2.2)
           |              / (CAST(tf_$t AS DOUBLE)
           |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
           |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))""".stripMargin)
      .mkString("\n         + ")
    s"""WITH tk AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
       |  FROM documents WHERE $corpusWhere),
       |tf AS (
       |  SELECT doc_id,
       |         CAST(len(tk) AS BIGINT) AS dl,
       |$tf
       |  FROM tk),
       |st AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
       |$dfs
       |  FROM tf)
       |SELECT doc_id, dl, n_matched, score FROM (
       |  SELECT doc_id, dl,
       |         CAST($nm AS BIGINT) AS n_matched,
       |         $score
       |         AS score
       |  FROM tf, st) s
       |WHERE n_matched > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  val oracles: Map[String, String] = oraclesBase ++ Map(
    // the _prod variants answer from the persisted index but must give
    // the exact same result as the round-trip forms — same oracle SQL
    "d47p_indexed_prod" -> oraclesBase("d47_indexed_search"),
    "d49p_phrase_prod"  -> oraclesBase("d49_phrase_search"),
    // e10: e04's oracle verbatim — the persisted/grown index must give
    // exactly the in-session IVF answer over the full corpus
    "e10_ann_ivf_indexed" -> ExtendedQueries.oracles("e04_ann_ivf"),
    // d64: full-scan SQL over the SURVIVING corpus only — blind to the
    // build/append/delete history; a hash match proves tombstone
    // deletion == hard deletion (match sets, df, N, sum_dl all
    // survivor-exact)
    "d64_index_delete" -> bm25OracleSql(
      Seq("merge", "hash", "vector"),
      "text IS NOT NULL AND doc_id % 7 <> 3", 50),
    // d65: ln-idf classic mode — ALL matching docs, 5-decimal-rounded
    // score (see d65's scaladoc for why raw transcendental doubles
    // cannot be hash-gated and how the margin guard closes the gap)
    "d65_classic_bm25" -> bm25ClassicOracleSql(
      Seq("vector", "merge", "scan"), "text IS NOT NULL"),
    // d66: identical facet semantics to d60 — same full-scan oracle;
    // only the index-side shape (denormalized, join-free) differs
    "d66_faceted_denorm" -> oraclesBase("d60_faceted_search"),
    // d67: d49's overlap-correct phrase SQL over the SURVIVING corpus
    // only — a hash match proves positional tombstone deletion (the
    // tombs-as-marker branch) == hard deletion for phrase semantics
    "d67_phrase_delete" -> oraclesBase("d49_phrase_search").replace(
      "FROM documents WHERE text IS NOT NULL",
      "FROM documents WHERE text IS NOT NULL AND doc_id % 5 <> 1"),
    // e11: e04's oracle restricted to SURVIVING candidates — the
    // tombstoned index must answer exactly like a corpus that never
    // contained the deleted vectors (the frozen model still quantizes
    // with all 8 original centroids; queries may be deleted vectors)
    "e11_ivf_delete" -> ExtendedQueries.oracles("e04_ann_ivf").replace(
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id",
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id AND t.vec_id % 9 <> 2"),
    // d63: ranks 11-20 of d47's full-scan ranking — the keyset cursor
    // lands on the identical cut because the order is a strict total
    // order over bit-exact doubles
    "d63_search_after" -> oraclesBase("d47_indexed_search").replace(
      "ORDER BY score DESC, doc_id LIMIT 50",
      """QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) BETWEEN 11 AND 20
        |ORDER BY score DESC, doc_id""".stripMargin),
    // the deletion _prod twins answer from the once-per-process
    // pre-deleted index but must give exactly the round-trip gates'
    // results — same survivor-only oracles
    "d64p_delete_prod" -> bm25OracleSql(
      Seq("merge", "hash", "vector"),
      "text IS NOT NULL AND doc_id % 7 <> 3", 50),
    "d67p_phrase_delete_prod" -> oraclesBase("d49_phrase_search").replace(
      "FROM documents WHERE text IS NOT NULL",
      "FROM documents WHERE text IS NOT NULL AND doc_id % 5 <> 1"),
    "e11p_ivf_delete_prod" -> ExtendedQueries.oracles("e04_ann_ivf").replace(
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id",
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id AND t.vec_id % 9 <> 2"),
    // d68: ranks 11-20 of the classic ranking ON THE ROUNDED GRID —
    // under the margin guard the rounded scores are cross-engine
    // identical, so (score_r DESC, doc_id) ranks identically and the
    // keyset cursor lands on the same cut (see bm25TopKClassicRounded)
    "d68_classic_after" -> bm25ClassicOracleSql(
      Seq("vector", "merge", "scan"), "text IS NOT NULL").replace(
      "WHERE n_matched > 0\nORDER BY doc_id",
      """WHERE n_matched > 0
        |QUALIFY row_number() OVER (ORDER BY ROUND(score, 5) DESC, doc_id) BETWEEN 11 AND 20
        |ORDER BY ROUND(score, 5) DESC, doc_id""".stripMargin),
    // d69: d61's per-query ranking in CLASSIC mode on the rounded
    // grid — LN(1 + idf_arg) on the identical argument double, the
    // rank cut and the output both on ROUND(score, 5)
    "d69_classic_multiquery" -> oraclesBase("d61_multiquery_ranked")
      .replace(
        "(((n_docs - dfs.df) + 0.5) / (dfs.df + 0.5))",
        "LN(1 + (((n_docs - dfs.df) + 0.5) / (dfs.df + 0.5)))")
      .replace(
        "SELECT query_id, doc_id, dl, n_matched, score FROM s",
        "SELECT query_id, doc_id, dl, n_matched, ROUND(score, 5) AS score_r FROM s")
      .replace(
        "QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) <= 10",
        "QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ROUND(score, 5) DESC, doc_id) <= 10")
      .replace(
        "ORDER BY query_id, score DESC, doc_id",
        "ORDER BY query_id, ROUND(score, 5) DESC, doc_id"),
    // d70: d64's survivor full-scan oracle VERBATIM — bucket-scoped
    // compaction must be invisible to every query (same terms, same
    // delete predicate; only the index's physical file layout differs)
    "d70_bucket_compact" -> bm25OracleSql(
      Seq("merge", "hash", "vector"),
      "text IS NOT NULL AND doc_id % 7 <> 3", 50),
    // d71: facet counts downstream of the classic rounded-grid top-20 —
    // the rank cut on ROUND(score, 5) lands on the identical row set
    // (margin-guarded), so the all-integer facet counts hash-match
    "d71_classic_facets" -> {
      val inner = bm25ClassicOracleSql(Seq("vector", "merge", "scan"), "text IS NOT NULL")
      s"""WITH ranked AS (
         |  SELECT doc_id FROM ($inner) q
         |  QUALIFY row_number() OVER (ORDER BY score_r DESC, doc_id) <= 20)
         |SELECT d.lang AS lang, d.source AS source, CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents d JOIN ranked ON d.doc_id = ranked.doc_id
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin
    },
    // e12: e04's oracle with model B's centroid set (vectors 8..15)
    // over the full corpus — blind to the build/append/retrain history
    "e12_ivf_retrain" -> ExtendedQueries.oracles("e04_ann_ivf").replace(
      "WHERE vec_id < 8",
      "WHERE vec_id >= 8 AND vec_id < 16"),
    // d73: d64's survivor full-scan oracle VERBATIM — tombstone
    // retirement (bucket-scoped physical drop + set clear) must be
    // invisible to every query, exactly like d70's defrag pass
    "d73_tombstone_retire" -> bm25OracleSql(
      Seq("merge", "hash", "vector"),
      "text IS NOT NULL AND doc_id % 7 <> 3", 50),
    // d74: the dictionary itself as the gate — per-term survivor df by
    // full scan with the same ⌊4N/5⌋ integer cutoff; a hash match
    // proves the retirement-time dict credit left summed df EXACT
    "d74_screened_retire" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL AND doc_id % 7 <> 3),
        |st AS (SELECT COUNT(*) AS n_docs FROM tk),
        |df AS (
        |  SELECT 'batch' AS term,
        |         CAST(SUM(CASE WHEN list_contains(tk, 'batch') THEN 1 ELSE 0 END) AS BIGINT) AS df FROM tk
        |  UNION ALL
        |  SELECT 'scan' AS term,
        |         CAST(SUM(CASE WHEN list_contains(tk, 'scan') THEN 1 ELSE 0 END) AS BIGINT) AS df FROM tk
        |  UNION ALL
        |  SELECT 'vector' AS term,
        |         CAST(SUM(CASE WHEN list_contains(tk, 'vector') THEN 1 ELSE 0 END) AS BIGINT) AS df FROM tk
        |  UNION ALL
        |  SELECT 'spark' AS term,
        |         CAST(SUM(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS df FROM tk)
        |SELECT term, df, df <= (4 * n_docs) // 5 AS kept
        |FROM df, st
        |ORDER BY term""".stripMargin,
    // e13: e11's survivor oracle VERBATIM — IVF retirement likewise
    "e13_ivf_retire" -> ExtendedQueries.oracles("e04_ann_ivf").replace(
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id",
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id AND t.vec_id % 9 <> 2"),
    // d75: d64's survivor oracle VERBATIM — the 16→64 bucket-count
    // migration must be invisible to every query (only the physical
    // file placement moves; survivors, stats and dict carried exactly)
    "d75_rebucket" -> bm25OracleSql(
      Seq("merge", "hash", "vector"),
      "text IS NOT NULL AND doc_id % 7 <> 3", 50),
    // e14: e11's survivor oracle VERBATIM — the IVF 8→32 cell-bucket
    // migration likewise (model frozen, assignment unchanged)
    "e14_ivf_rebucket" -> ExtendedQueries.oracles("e04_ann_ivf").replace(
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id",
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id AND t.vec_id % 9 <> 2"),
    // d76: d64's survivor oracle VERBATIM — the POLICY-triggered
    // migration (rebucketIfOvergrown under a measured-bytes bound)
    // must be exactly as invisible as d75's explicit one
    "d76_rebucket_policy" -> bm25OracleSql(
      Seq("merge", "hash", "vector"),
      "text IS NOT NULL AND doc_id % 7 <> 3", 50),
    // e15: e11's survivor oracle VERBATIM — the IVF policy twin
    "e15_ivf_rebucket_policy" -> ExtendedQueries.oracles("e04_ann_ivf").replace(
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id",
      "ON q.cell = t.cell AND t.vec_id <> q.vec_id AND t.vec_id % 9 <> 2"),
    // d72: KWIC snippets downstream of the classic rounded-grid top-10 —
    // the rank cut on ROUND(score, 5) lands on the identical row set
    // (margin-guarded), so the string-valued snippets hash-match
    "d72_classic_snippets" -> {
      val inner = bm25ClassicOracleSql(Seq("vector", "merge", "scan"), "text IS NOT NULL")
      s"""WITH ranked AS (
         |  SELECT doc_id FROM ($inner) q
         |  QUALIFY row_number() OVER (ORDER BY score_r DESC, doc_id) <= 10),
         |tk2 AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
         |  FROM documents JOIN ranked USING (doc_id)),
         |pos AS (
         |  SELECT doc_id, tk,
         |         CAST(least(nullif(list_position(tk, 'vector'), 0),
         |                    nullif(list_position(tk, 'merge'),  0),
         |                    nullif(list_position(tk, 'scan'),   0)) AS BIGINT) AS pos
         |  FROM tk2)
         |SELECT doc_id, pos,
         |       array_to_string(list_slice(tk, CAST(greatest(pos - 3, 1) AS INT),
         |                                  CAST(greatest(pos - 3, 1) + 6 AS INT)), ' ') AS snippet
         |FROM pos
         |ORDER BY doc_id""".stripMargin
    })

  private lazy val oraclesBase: Map[String, String] = Map(
    "q36_restricted_filters" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  AND c_acctbal >= 0.0
        |  AND lower(c_name) LIKE '%1%'
        |ORDER BY c_custkey""".stripMargin,
    "q31_text_search" ->
      """SELECT DISTINCT c_custkey, c_name, n_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE lower(concat_ws(' ', c_name, c_mktsegment, n_name, r_name)) LIKE '%asia%'
        |ORDER BY c_custkey""".stripMargin,
    "q32_datatables" ->
      """SELECT o.o_orderkey, c.c_name, COALESCE(lc.n_parts, 0) AS n_parts
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN (SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS n_parts
        |           FROM lineitem GROUP BY l_orderkey) lc
        |       ON o.o_orderkey = lc.l_orderkey
        |WHERE lower(concat_ws(' ', c.c_name, o.o_orderstatus, o.o_orderpriority)) LIKE '%urgent%'
        |ORDER BY n_parts DESC, o.o_orderkey LIMIT 50""".stripMargin,
    // mirror of d45: identical IEEE expression tree, fixed-order term
    // sum, integer-sourced doubles — scores hash-match bit-for-bit
    "d45_bm25_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'vector')) AS BIGINT) AS tf_vector,
        |         CAST(len(list_filter(tk, x -> x = 'spark'))  AS BIGINT) AS tf_spark,
        |         CAST(len(list_filter(tk, x -> x = 'merge'))  AS BIGINT) AS tf_merge
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector,
        |         SUM(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
        |         SUM(CASE WHEN tf_merge  > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM tf)
        |SELECT doc_id, dl, tf_vector, tf_spark, tf_merge,
        |       (((n_docs - df_vector) + 0.5) / (df_vector + 0.5))
        |         * ((CAST(tf_vector AS DOUBLE) * 2.2)
        |            / (CAST(tf_vector AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       + (((n_docs - df_spark) + 0.5) / (df_spark + 0.5))
        |         * ((CAST(tf_spark AS DOUBLE) * 2.2)
        |            / (CAST(tf_spark AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       + (((n_docs - df_merge) + 0.5) / (df_merge + 0.5))
        |         * ((CAST(tf_merge AS DOUBLE) * 2.2)
        |            / (CAST(tf_merge AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       AS score
        |FROM tf, st
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    // mirror of d46: both arms' orderings hash-match (d45 scores, e01
    // cosine machinery), so the integer ranks and the fixed-order RRF
    // sum are bit-exact
    "d46_hybrid_rrf" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'vector')) AS BIGINT) AS tf_vector,
        |         CAST(len(list_filter(tk, x -> x = 'spark'))  AS BIGINT) AS tf_spark,
        |         CAST(len(list_filter(tk, x -> x = 'merge'))  AS BIGINT) AS tf_merge
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector,
        |         SUM(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
        |         SUM(CASE WHEN tf_merge  > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM tf),
        |sc AS (
        |  SELECT doc_id,
        |       (((n_docs - df_vector) + 0.5) / (df_vector + 0.5))
        |         * ((CAST(tf_vector AS DOUBLE) * 2.2)
        |            / (CAST(tf_vector AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       + (((n_docs - df_spark) + 0.5) / (df_spark + 0.5))
        |         * ((CAST(tf_spark AS DOUBLE) * 2.2)
        |            / (CAST(tf_spark AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       + (((n_docs - df_merge) + 0.5) / (df_merge + 0.5))
        |         * ((CAST(tf_merge AS DOUBLE) * 2.2)
        |            / (CAST(tf_merge AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       AS score
        |  FROM tf, st),
        |t50 AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 50),
        |txt AS (SELECT doc_id AS id,
        |               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_text
        |        FROM t50),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |             list_reduce(list_transform(list_zip(q.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b) AS dot,
        |             sqrt(list_reduce(list_transform(list_zip(q.v, q.v), s -> s[1] * s[2]), (a, b) -> a + b)) AS qn,
        |             sqrt(list_reduce(list_transform(list_zip(c.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b)) AS cn
        |      FROM e q, e c WHERE q.vec_id = 0 AND c.vec_id <> q.vec_id),
        |vec AS (SELECT n_id AS id,
        |               CAST(row_number() OVER (ORDER BY dot / (qn * cn) DESC, n_id) AS BIGINT) AS r_vec
        |        FROM p QUALIFY r_vec <= 50)
        |SELECT id, t.r_text, v.r_vec,
        |       COALESCE(CAST(1.0 AS DOUBLE) / (60 + t.r_text), CAST(0.0 AS DOUBLE))
        |     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.r_vec), CAST(0.0 AS DOUBLE)) AS rrf
        |FROM txt t FULL JOIN vec v USING (id)
        |ORDER BY rrf DESC, id LIMIT 20""".stripMargin,
    // mirror of d48: d46's text arm + an IVF-probed vector arm — the
    // oracle replicates the argmax cell assignment (first-8 centroids),
    // the query's top-3 probe cells, the probed candidate top-50, and
    // the RRF fusion with identical IEEE trees and tie-breaks
    "d48_hybrid_rrf_ivf" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'vector')) AS BIGINT) AS tf_vector,
        |         CAST(len(list_filter(tk, x -> x = 'spark'))  AS BIGINT) AS tf_spark,
        |         CAST(len(list_filter(tk, x -> x = 'merge'))  AS BIGINT) AS tf_merge
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector,
        |         SUM(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
        |         SUM(CASE WHEN tf_merge  > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM tf),
        |sc AS (
        |  SELECT doc_id,
        |       (((n_docs - df_vector) + 0.5) / (df_vector + 0.5))
        |         * ((CAST(tf_vector AS DOUBLE) * 2.2)
        |            / (CAST(tf_vector AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       + (((n_docs - df_spark) + 0.5) / (df_spark + 0.5))
        |         * ((CAST(tf_spark AS DOUBLE) * 2.2)
        |            / (CAST(tf_spark AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       + (((n_docs - df_merge) + 0.5) / (df_merge + 0.5))
        |         * ((CAST(tf_merge AS DOUBLE) * 2.2)
        |            / (CAST(tf_merge AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |       AS score
        |  FROM tf, st),
        |t50 AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 50),
        |txt AS (SELECT doc_id AS id,
        |               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_text
        |        FROM t50),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |n AS (SELECT vec_id, v,
        |             sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (a, b) -> a + b)) AS nrm
        |      FROM e),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |asg AS (SELECT vec_id, v, nrm, c_id AS cell FROM (
        |          SELECT n.vec_id, n.v, n.nrm, c.c_id,
        |                 row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |                   (list_reduce(list_transform(list_zip(n.v, c.cv), s -> s[1] * s[2]), (a, b) -> a + b)
        |                    / (n.nrm * c.cn)) DESC, c.c_id) AS rn
        |          FROM n, c) WHERE rn = 1),
        |qv AS (SELECT v, nrm FROM n WHERE vec_id = 0),
        |qc AS (SELECT c_id AS cell FROM (
        |         SELECT c.c_id,
        |                row_number() OVER (ORDER BY
        |                  (list_reduce(list_transform(list_zip(q.v, c.cv), s -> s[1] * s[2]), (a, b) -> a + b)
        |                   / (q.nrm * c.cn)) DESC, c.c_id) AS rn
        |         FROM qv q, c) WHERE rn <= 3),
        |cand AS (SELECT a.vec_id AS n_id,
        |                (list_reduce(list_transform(list_zip(q.v, a.v), s -> s[1] * s[2]), (x, y) -> x + y)
        |                 / (q.nrm * a.nrm)) AS cos
        |         FROM asg a, qc, qv q
        |         WHERE a.cell = qc.cell AND a.vec_id <> 0),
        |vec AS (SELECT n_id AS id,
        |               CAST(row_number() OVER (ORDER BY cos DESC, n_id) AS BIGINT) AS r_vec
        |        FROM (SELECT * FROM cand ORDER BY cos DESC, n_id LIMIT 50))
        |SELECT id, t.r_text, v.r_vec,
        |       COALESCE(CAST(1.0 AS DOUBLE) / (60 + t.r_text), CAST(0.0 AS DOUBLE))
        |     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.r_vec), CAST(0.0 AS DOUBLE)) AS rrf
        |FROM txt t FULL JOIN vec v USING (id)
        |ORDER BY rrf DESC, id LIMIT 20""".stripMargin,
    // mirror of d47: the oracle recomputes the same ranking from the
    // RAW documents (it has no posting index) with d45's IEEE tree per
    // term — the index path matches bit-for-bit because absent terms
    // contribute exact 0.0 and the fold adds present terms in the same
    // rank order
    "d47_indexed_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'scan'))   AS BIGINT) AS tf_scan,
        |         CAST(len(list_filter(tk, x -> x = 'filter')) AS BIGINT) AS tf_filter,
        |         CAST(len(list_filter(tk, x -> x = 'window')) AS BIGINT) AS tf_window,
        |         CAST(len(list_filter(tk, x -> x = 'batch'))  AS BIGINT) AS tf_batch
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf_scan   > 0 THEN 1 ELSE 0 END) AS df_scan,
        |         SUM(CASE WHEN tf_filter > 0 THEN 1 ELSE 0 END) AS df_filter,
        |         SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
        |         SUM(CASE WHEN tf_batch  > 0 THEN 1 ELSE 0 END) AS df_batch
        |  FROM tf)
        |SELECT doc_id, dl, n_matched, score FROM (
        |  SELECT doc_id, dl,
        |         CAST((CASE WHEN tf_scan   > 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_filter > 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_window > 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_batch  > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |         (((n_docs - df_scan) + 0.5) / (df_scan + 0.5))
        |           * ((CAST(tf_scan AS DOUBLE) * 2.2)
        |              / (CAST(tf_scan AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         + (((n_docs - df_filter) + 0.5) / (df_filter + 0.5))
        |           * ((CAST(tf_filter AS DOUBLE) * 2.2)
        |              / (CAST(tf_filter AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         + (((n_docs - df_window) + 0.5) / (df_window + 0.5))
        |           * ((CAST(tf_window AS DOUBLE) * 2.2)
        |              / (CAST(tf_window AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         + (((n_docs - df_batch) + 0.5) / (df_batch + 0.5))
        |           * ((CAST(tf_batch AS DOUBLE) * 2.2)
        |              / (CAST(tf_batch AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         AS score
        |  FROM tf, st) s
        |WHERE n_matched > 0
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    // positional phrase semantics, overlap-correct: one row per token
    // position, phrase occurrences = adjacent-position joins
    "d49_phrase_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |pos AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(tk) + 1), i -> {'pos': i, 'term': tk[i]})) AS e
        |  FROM tk),
        |p AS (SELECT doc_id, e.pos AS pos, e.term AS term FROM pos)
        |SELECT a.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_occ,
        |       CAST(min(a.pos) AS BIGINT) AS first_pos
        |FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.term = 'table' AND b.term = 'hash'
        |GROUP BY a.doc_id
        |ORDER BY n_occ DESC, a.doc_id LIMIT 50""".stripMargin,
    // proximity: same integers the quadratic way (flattened pair
    // distances) — the engine computes them with O(|a|+|b|) kernels
    "d52_proximity_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |pos AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(tk) + 1), i -> {'pos': i, 'term': tk[i]})) AS e
        |  FROM tk),
        |p AS (SELECT doc_id, e.pos AS pos, e.term AS term FROM pos),
        |pa AS (SELECT doc_id, list(pos ORDER BY pos) AS la FROM p WHERE term = 'vector' GROUP BY doc_id),
        |pb AS (SELECT doc_id, list(pos ORDER BY pos) AS lb FROM p WHERE term = 'merge' GROUP BY doc_id),
        |g AS (
        |  SELECT pa.doc_id AS doc_id,
        |         flatten(list_transform(la, x -> list_transform(lb, y -> abs(x - y)))) AS ds
        |  FROM pa JOIN pb ON pa.doc_id = pb.doc_id)
        |SELECT doc_id,
        |       CAST(len(list_filter(ds, d -> d <= 3)) AS BIGINT) AS n_near,
        |       CAST(list_min(ds) AS BIGINT) AS min_gap
        |FROM g
        |ORDER BY n_near DESC, min_gap, doc_id LIMIT 50""".stripMargin,
    // DYNAMIC prefix resolution: the oracle discovers the matching
    // terms by full scan; the engine resolves the same prefix against
    // its persisted dictionary. Score fold ordered by alphabetical term
    // rank on both sides (same IEEE tree; list_reduce's c1+c2+... tree
    // equals the engine's 0.0+c1+c2+... since 0.0+x == x).
    "d53_prefix_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        |tr AS (SELECT term, row_number() OVER (ORDER BY term) AS trank
        |       FROM (SELECT DISTINCT term FROM u WHERE term LIKE 's%')),
        |dls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
        |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dls),
        |tf AS (SELECT u.doc_id AS doc_id, tr.term AS term, tr.trank AS trank,
        |              CAST(count(*) AS BIGINT) AS tf
        |       FROM u JOIN tr USING (term) GROUP BY 1, 2, 3),
        |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |c AS (
        |  SELECT tf.doc_id AS doc_id, tf.trank AS trank,
        |         (((n_docs - dfs.df) + 0.5) / (dfs.df + 0.5))
        |           * ((CAST(tf.tf AS DOUBLE) * 2.2)
        |              / (CAST(tf.tf AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dls.dl AS DOUBLE)
        |                                         / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
        |           AS contrib
        |  FROM tf JOIN dfs USING (term) JOIN dls ON tf.doc_id = dls.doc_id, st)
        |SELECT c.doc_id AS doc_id, dls.dl AS dl,
        |       CAST(count(*) AS BIGINT) AS n_matched,
        |       list_reduce(list(contrib ORDER BY trank), (x, y) -> x + y) AS score
        |FROM c JOIN dls ON c.doc_id = dls.doc_id
        |GROUP BY c.doc_id, dls.dl
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    // DYNAMIC fuzzy resolution (same proof shape as d53): the oracle
    // discovers the edit-distance-1 neighbors of the typo terms by
    // full scan; the engine resolves them against its persisted
    // dictionary. Both fold scores in alphabetical term-rank order.
    "d58_fuzzy_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        |tr AS (SELECT term, row_number() OVER (ORDER BY term) AS trank
        |       FROM (SELECT DISTINCT term FROM u
        |             WHERE levenshtein(term, 'vectr') <= 1
        |                OR levenshtein(term, 'mrge')  <= 1
        |                OR levenshtein(term, 'sow')   <= 1)),
        |dls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
        |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dls),
        |tf AS (SELECT u.doc_id AS doc_id, tr.term AS term, tr.trank AS trank,
        |              CAST(count(*) AS BIGINT) AS tf
        |       FROM u JOIN tr USING (term) GROUP BY 1, 2, 3),
        |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |c AS (
        |  SELECT tf.doc_id AS doc_id, tf.trank AS trank,
        |         (((n_docs - dfs.df) + 0.5) / (dfs.df + 0.5))
        |           * ((CAST(tf.tf AS DOUBLE) * 2.2)
        |              / (CAST(tf.tf AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dls.dl AS DOUBLE)
        |                                         / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
        |           AS contrib
        |  FROM tf JOIN dfs USING (term) JOIN dls ON tf.doc_id = dls.doc_id, st)
        |SELECT c.doc_id AS doc_id, dls.dl AS dl,
        |       CAST(count(*) AS BIGINT) AS n_matched,
        |       list_reduce(list(contrib ORDER BY trank), (x, y) -> x + y) AS score
        |FROM c JOIN dls ON c.doc_id = dls.doc_id
        |GROUP BY c.doc_id, dls.dl
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    // every standing query scored by full scan (same IEEE contribution
    // tree and rank-ordered fold as d53; per-query rank cut identical
    // because the doubles are bit-exact); the engine answers all 8 in
    // one pruned index pass
    "d61_multiquery_ranked" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        |tr(query_id, term, trank) AS (VALUES
        |  (CAST(1 AS BIGINT), 'spark', 0),  (CAST(1 AS BIGINT), 'merge', 1),
        |  (CAST(2 AS BIGINT), 'vector', 0), (CAST(2 AS BIGINT), 'scan', 1),
        |  (CAST(3 AS BIGINT), 'window', 0), (CAST(3 AS BIGINT), 'batch', 1), (CAST(3 AS BIGINT), 'group', 2),
        |  (CAST(4 AS BIGINT), 'slow', 0),   (CAST(4 AS BIGINT), 'fast', 1),
        |  (CAST(5 AS BIGINT), 'hash', 0),   (CAST(5 AS BIGINT), 'join', 1),
        |  (CAST(6 AS BIGINT), 'stream', 0), (CAST(6 AS BIGINT), 'table', 1),
        |  (CAST(7 AS BIGINT), 'filter', 0), (CAST(7 AS BIGINT), 'sort', 1),
        |  (CAST(8 AS BIGINT), 'data', 0),   (CAST(8 AS BIGINT), 'query', 1), (CAST(8 AS BIGINT), 'row', 2)),
        |dls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
        |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dls),
        |tf AS (SELECT u.doc_id AS doc_id, tr.query_id AS query_id, tr.term AS term,
        |              tr.trank AS trank, CAST(count(*) AS BIGINT) AS tf
        |       FROM u JOIN tr USING (term) GROUP BY 1, 2, 3, 4),
        |dfs AS (SELECT query_id, term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1, 2),
        |c AS (
        |  SELECT tf.query_id AS query_id, tf.doc_id AS doc_id, tf.trank AS trank,
        |         (((n_docs - dfs.df) + 0.5) / (dfs.df + 0.5))
        |           * ((CAST(tf.tf AS DOUBLE) * 2.2)
        |              / (CAST(tf.tf AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dls.dl AS DOUBLE)
        |                                         / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
        |           AS contrib
        |  FROM tf JOIN dfs USING (query_id, term) JOIN dls ON tf.doc_id = dls.doc_id, st),
        |s AS (
        |  SELECT c.query_id AS query_id, c.doc_id AS doc_id, dls.dl AS dl,
        |         CAST(count(*) AS BIGINT) AS n_matched,
        |         list_reduce(list(contrib ORDER BY trank), (x, y) -> x + y) AS score
        |  FROM c JOIN dls ON c.doc_id = dls.doc_id
        |  GROUP BY c.query_id, c.doc_id, dls.dl)
        |SELECT query_id, doc_id, dl, n_matched, score FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) <= 10
        |ORDER BY query_id, score DESC, doc_id""".stripMargin,
    // the oracle re-derives the same BM25 top-10 by full scan (d50's
    // per-term-column IEEE tree), then slices the same 7-token window
    // anchored at max(first_hit - 3, 1); list_position returns 0 for
    // an absent term on BOTH engines, nullif'd so the null-skipping
    // least() picks the first PRESENT term
    "d62_snippets" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'vector')) AS BIGINT) AS tf_a,
        |         CAST(len(list_filter(tk, x -> x = 'merge'))  AS BIGINT) AS tf_b
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf_a > 0 THEN 1 ELSE 0 END) AS df_a,
        |         SUM(CASE WHEN tf_b > 0 THEN 1 ELSE 0 END) AS df_b
        |  FROM tf),
        |top AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           (((n_docs - df_a) + 0.5) / (df_a + 0.5))
        |             * ((CAST(tf_a AS DOUBLE) * 2.2)
        |                / (CAST(tf_a AS DOUBLE)
        |                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |           + (((n_docs - df_b) + 0.5) / (df_b + 0.5))
        |             * ((CAST(tf_b AS DOUBLE) * 2.2)
        |                / (CAST(tf_b AS DOUBLE)
        |                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |           AS score
        |    FROM tf, st
        |    WHERE tf_a > 0 OR tf_b > 0
        |    ORDER BY score DESC, doc_id LIMIT 10) t),
        |pos AS (
        |  SELECT tk.doc_id AS doc_id, tk.tk AS tk,
        |         CAST(least(nullif(list_position(tk.tk, 'vector'), 0),
        |                    nullif(list_position(tk.tk, 'merge'),  0)) AS BIGINT) AS pos
        |  FROM tk JOIN top USING (doc_id))
        |SELECT doc_id, pos,
        |       array_to_string(list_slice(tk, CAST(greatest(pos - 3, 1) AS INT),
        |                                  CAST(greatest(pos - 3, 1) + 6 AS INT)), ' ') AS snippet
        |FROM pos
        |ORDER BY doc_id""".stripMargin,
    // facets recomputed by full scan; the engine joins its match set
    // to the doc_id-bucketed forward table instead
    "d60_faceted_search" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, source,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
        |FROM tk
        |WHERE list_contains(tk, 'spark') OR list_contains(tk, 'vector')
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // each standing query evaluated by full scan; the engine answers
    // all of them in one pruned pass over the posting index
    "d59_multiquery_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |q(query_id, terms) AS (VALUES
        |  (CAST(1 AS BIGINT), ['spark', 'merge']),
        |  (CAST(2 AS BIGINT), ['vector', 'scan']),
        |  (CAST(3 AS BIGINT), ['window', 'batch', 'group']),
        |  (CAST(4 AS BIGINT), ['slow', 'fast']),
        |  (CAST(5 AS BIGINT), ['hash', 'join']),
        |  (CAST(6 AS BIGINT), ['stream', 'table']),
        |  (CAST(7 AS BIGINT), ['filter', 'sort']),
        |  (CAST(8 AS BIGINT), ['data', 'query', 'row']))
        |SELECT q.query_id AS query_id, tk.doc_id AS doc_id
        |FROM tk, q
        |WHERE list_has_all(tk.tk, q.terms)
        |ORDER BY query_id, doc_id""".stripMargin,
    "d54_boolean_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl
        |FROM tk
        |WHERE list_contains(tk, 'spark') AND list_contains(tk, 'merge')
        |  AND NOT list_contains(tk, 'slow')
        |ORDER BY doc_id""".stripMargin,
    // full-corpus SQL, blind to the build/append split — a hash match
    // proves the grown index == a from-scratch build
    "d50_index_append" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'group')) AS BIGINT) AS tf_group,
        |         CAST(len(list_filter(tk, x -> x = 'order')) AS BIGINT) AS tf_order,
        |         CAST(len(list_filter(tk, x -> x = 'row'))   AS BIGINT) AS tf_row
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf_group > 0 THEN 1 ELSE 0 END) AS df_group,
        |         SUM(CASE WHEN tf_order > 0 THEN 1 ELSE 0 END) AS df_order,
        |         SUM(CASE WHEN tf_row   > 0 THEN 1 ELSE 0 END) AS df_row
        |  FROM tf)
        |SELECT doc_id, dl, n_matched, score FROM (
        |  SELECT doc_id, dl,
        |         CAST((CASE WHEN tf_group > 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_order > 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_row   > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |         (((n_docs - df_group) + 0.5) / (df_group + 0.5))
        |           * ((CAST(tf_group AS DOUBLE) * 2.2)
        |              / (CAST(tf_group AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         + (((n_docs - df_order) + 0.5) / (df_order + 0.5))
        |           * ((CAST(tf_order AS DOUBLE) * 2.2)
        |              / (CAST(tf_order AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         + (((n_docs - df_row) + 0.5) / (df_row + 0.5))
        |           * ((CAST(tf_row AS DOUBLE) * 2.2)
        |              / (CAST(tf_row AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         AS score
        |  FROM tf, st) s
        |WHERE n_matched > 0
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    // full-corpus SQL, blind to the build/append/COMPACT history — a
    // hash match proves compaction is semantically invisible
    "d55_index_compact" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'table'))  AS BIGINT) AS tf_table,
        |         CAST(len(list_filter(tk, x -> x = 'batch'))  AS BIGINT) AS tf_batch,
        |         CAST(len(list_filter(tk, x -> x = 'window')) AS BIGINT) AS tf_window
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf_table  > 0 THEN 1 ELSE 0 END) AS df_table,
        |         SUM(CASE WHEN tf_batch  > 0 THEN 1 ELSE 0 END) AS df_batch,
        |         SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
        |  FROM tf)
        |SELECT doc_id, dl, n_matched, score FROM (
        |  SELECT doc_id, dl,
        |         CAST((CASE WHEN tf_table  > 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_batch  > 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |         (((n_docs - df_table) + 0.5) / (df_table + 0.5))
        |           * ((CAST(tf_table AS DOUBLE) * 2.2)
        |              / (CAST(tf_table AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         + (((n_docs - df_batch) + 0.5) / (df_batch + 0.5))
        |           * ((CAST(tf_batch AS DOUBLE) * 2.2)
        |              / (CAST(tf_batch AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         + (((n_docs - df_window) + 0.5) / (df_window + 0.5))
        |           * ((CAST(tf_window AS DOUBLE) * 2.2)
        |              / (CAST(tf_window AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |         AS score
        |  FROM tf, st) s
        |WHERE n_matched > 0
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    // replicates the stop-term screen from full-scan df with the same
    // ⌊4N/5⌋ integer cutoff; CASE-zeroed contributions are
    // IEEE-identical to the engine's dropped-term fold
    "d56_screened_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id,
        |         CAST(len(tk) AS BIGINT) AS dl,
        |         CAST(len(list_filter(tk, x -> x = 'batch'))  AS BIGINT) AS tf_batch,
        |         CAST(len(list_filter(tk, x -> x = 'scan'))   AS BIGINT) AS tf_scan,
        |         CAST(len(list_filter(tk, x -> x = 'vector')) AS BIGINT) AS tf_vector,
        |         CAST(len(list_filter(tk, x -> x = 'spark'))  AS BIGINT) AS tf_spark
        |  FROM tk),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         (4 * COUNT(*)) // 5 AS cutoff,
        |         SUM(CASE WHEN tf_batch  > 0 THEN 1 ELSE 0 END) AS df_batch,
        |         SUM(CASE WHEN tf_scan   > 0 THEN 1 ELSE 0 END) AS df_scan,
        |         SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector,
        |         SUM(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark
        |  FROM tf)
        |SELECT doc_id, dl, n_matched, score FROM (
        |  SELECT doc_id, dl,
        |         CAST((CASE WHEN tf_batch  > 0 AND df_batch  <= cutoff THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_scan   > 0 AND df_scan   <= cutoff THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_vector > 0 AND df_vector <= cutoff THEN 1 ELSE 0 END)
        |            + (CASE WHEN tf_spark  > 0 AND df_spark  <= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |         (CASE WHEN df_batch <= cutoff THEN
        |           (((n_docs - df_batch) + 0.5) / (df_batch + 0.5))
        |             * ((CAST(tf_batch AS DOUBLE) * 2.2)
        |                / (CAST(tf_batch AS DOUBLE)
        |                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN df_scan <= cutoff THEN
        |           (((n_docs - df_scan) + 0.5) / (df_scan + 0.5))
        |             * ((CAST(tf_scan AS DOUBLE) * 2.2)
        |                / (CAST(tf_scan AS DOUBLE)
        |                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN df_vector <= cutoff THEN
        |           (((n_docs - df_vector) + 0.5) / (df_vector + 0.5))
        |             * ((CAST(tf_vector AS DOUBLE) * 2.2)
        |                / (CAST(tf_vector AS DOUBLE)
        |                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN df_spark <= cutoff THEN
        |           (((n_docs - df_spark) + 0.5) / (df_spark + 0.5))
        |             * ((CAST(tf_spark AS DOUBLE) * 2.2)
        |                / (CAST(tf_spark AS DOUBLE)
        |                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                                           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |          ELSE 0.0 END)
        |         AS score
        |  FROM tf, st) s
        |WHERE n_matched > 0
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
  )
}
