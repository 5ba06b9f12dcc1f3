package graft.operators

import graft.Tables
import graft.dedup.Dedup
import graft.functions.TextAnalysis
import graft.similarity.Knn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 training-pipeline operators: the measurement and curation
  * layer on top of the dedup / ANN / quality primitives —
  *
  *   - e06: ANN recall@k against the exact top-k (the tuning loop every
  *     approximate index needs before a 100 TB commit),
  *   - e07: one distributed k-means (Lloyd) update step — IVF coarse-
  *     quantizer training as a DataFrame aggregation,
  *   - d28: corpus mixture report (doc/token shares per source ×
  *     language — the "data card" of a training mix),
  *   - d29: quality-ranked representative per near-dup cluster (keep
  *     the BEST document, not the smallest id),
  *   - d30: bigram LM statistics per language,
  *   - d31: snapshot diff (added/removed/changed/unchanged by content
  *     hash — the reference's curation-version diff semantics,
  *     /root/reference/tantalus/views.py:1090-1092, applied to a
  *     document corpus).
  *
  * Every query ships a DuckDB oracle; doubles are ratios of exact
  * integers or decimal-summed before division, so comparisons are
  * bit-exact.
  */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, lang, source, text,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents)""".stripMargin

  // must match TextAnalysis.BpePattern over lower(text)
  private val bpeLen =
    """CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0)) AS BIGINT)"""

  // ---------- e06: ANN recall measurement ----------

  /** Recall@5 of the sign-cell bucketed ANN (e02's index) against the
    * exact brute-force top-5, per query vector. The index-quality gate:
    * at 100 TB you run this on a hash-sampled slice (d13) to pick
    * bits/nprobe before the full pass; the exact side stays feasible
    * because the sample is small, while the verdict transfers to the
    * full index (same data distribution).
    */
  val e06_ann_recall: Q = (s, dir) => {
    val t     = Tables(s, dir)
    val q     = t.embeddings.filter(col("vec_id") < 5)
    val exact = Knn.bruteTopK(q, t.embeddings, "vec_id", "embedding", 5)
      .select(col("q_id"), col("n_id"))
    val ann = Knn.bucketedTopK(q, t.embeddings, "vec_id", "embedding", 5, bits = 3)
      .select(col("q_id"), col("n_id"))
    val hits = exact
      .join(ann, Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_hit"))
    exact
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact").cast("double"))
      .select(col("q_id"), col("n_exact"), col("n_hit"), col("recall"))
      .orderBy(col("q_id"))
  }

  // ---------- e07: k-means update step (IVF training) ----------

  /** One Lloyd iteration of IVF coarse-quantizer training: centroids
    * seeded from the first 8 vectors, every corpus vector assigned to
    * its max-cosine centroid (broadcast centroids — map-side), then the
    * per-cell update statistics: member count, mean cosine-to-centroid
    * (the inertia signal), and the first three coordinates of the NEW
    * centroid (the mean vector). One shuffle, grouped by cell — the
    * iteration a 100 TB pipeline repeats to convergence with only the
    * (k × dim) centroid table ever leaving the executors.
    *
    * Per-row doubles are cast to DECIMAL(28,12) before the sum so
    * accumulation is exact and order-independent (same trick as
    * Ops.dsum), then divided by the exact count. Output means round to
    * 9 dp: float coordinates are dyadic rationals (2^-k terminates in
    * "...5"), so the 12-dp decimal CAST can land exactly on a rounding
    * half-boundary where Spark (HALF_UP) and an oracle engine
    * (half-even) disagree by 1e-12 — observed once at sf0.1. The
    * quotient mean essentially never terminates at 9 dp, so rounding
    * the output (identically on both sides) removes the boundary
    * without giving up order-independent accumulation.
    */
  val e07_kmeans_step: Q = (s, dir) => {
    val t = Tables(s, dir)
    val e = t.embeddings
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(Knn.dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id"))
    val assigned = e
      .crossJoin(broadcast(cents))
      .withColumn("ccos", Knn.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(
        col("c_id").as("cell"),
        col("ccos"),
        element_at(col("v"), 1).as("x1"),
        element_at(col("v"), 2).as("x2"),
        element_at(col("v"), 3).as("x3"))
    def dsum12(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(28,12)")).cast("double")
    assigned
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n"),
        dsum12(col("ccos")).as("s_cos"),
        dsum12(col("x1")).as("s1"),
        dsum12(col("x2")).as("s2"),
        dsum12(col("x3")).as("s3"))
      .select(
        col("cell"),
        col("n"),
        round(col("s_cos") / col("n").cast("double"), 9).as("mean_cos"),
        round(col("s1") / col("n").cast("double"), 9).as("m1"),
        round(col("s2") / col("n").cast("double"), 9).as("m2"),
        round(col("s3") / col("n").cast("double"), 9).as("m3"))
      .orderBy(col("cell"))
  }

  // ---------- d28: corpus mixture report ----------

  /** The training-mix "data card": per (source, language) document and
    * BPE-token counts with their global shares. One aggregation; the
    * global totals come from an unpartitioned window over the (tiny)
    * aggregated frame, never over the raw corpus.
    */
  val d28_mixture_report: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val wAll = Window.partitionBy()
    t.documents
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.bpeTokenCount(col("text"))).as("total_bpe"))
      .withColumn(
        "doc_share",
        col("n_docs").cast("double") / sum(col("n_docs")).over(wAll).cast("double"))
      .withColumn(
        "bpe_share",
        col("total_bpe").cast("double") / sum(col("total_bpe")).over(wAll).cast("double"))
      .orderBy(col("source"), col("lang"))
  }

  // ---------- d29: best-quality representative per near-dup cluster ----------

  /** Near-dup clusters (SimHash hamming ≤ 3 graph, connected
    * components) with the representative chosen by QUALITY — highest
    * BPE token count, ties to the smaller doc_id — instead of d12's
    * smallest-id convention. This is the curation decision an actual
    * dedup pass ships: keep the best member of each duplicate family.
    *
    * Scale shape: components run over the DISTINCT-sketch graph (see
    * Dedup.simhashClusters — cost scales with distinct hashes, never
    * with the quadratic duplicate-pair count), then doc labels lift
    * through the hash. The doc partition is identical to doc-level
    * pair components — two docs connect iff their hashes are equal or
    * within hamming 3 — so relabeling each cluster with its min doc_id
    * reproduces the pair-graph convention the oracle computes.
    */
  val d29_cluster_best: Q = (s, dir) => {
    val t = Tables(s, dir)
    val h = Dedup.simhash60(t.documents, "doc_id", "text")
    val hashGroups = h.groupBy(col("simhash")).agg(count(lit(1)).as("gs"))
    val edges = Dedup
      .simhashHashPairs(hashGroups.select(col("simhash")), maxDist = 3)
      .select(col("h1").as("id1"), col("h2").as("id2"))
    val hcomp = Dedup
      .dedupComponents(edges)
      .select(col("id").as("simhash"), col("component").as("hc"))
    // a doc is clustered iff its sketch has a near neighbor (hc) or is
    // shared by >= 2 docs; singleton sketches never enter the graph
    val clustered = h
      .join(hashGroups, "simhash")
      .join(hcomp, Seq("simhash"), "left")
      .withColumn("ckey", coalesce(col("hc"), col("simhash")))
      .filter(col("hc").isNotNull || col("gs") >= 2)
    val toks = t.documents.select(col("doc_id"), TextAnalysis.bpeTokenCount(col("text")).as("bpe"))
    // Per-cluster stats as a hash aggregation, NOT cluster-key windows:
    // near-dup cluster sizes are exactly the skewed quantity at scale
    // (boilerplate families can be O(millions) of members), and a
    // whole-partition window would sort every cluster inside one task.
    // groupBy gets map-side partial aggregation and never sorts;
    // max_by(doc_id, struct(bpe, -doc_id)) reproduces the window's
    // "highest bpe, ties to the smaller doc_id" representative choice.
    clustered
      .join(toks, "doc_id")
      .groupBy(col("ckey"))
      .agg(
        min(col("doc_id")).as("component"),
        max_by(col("doc_id"), struct(col("bpe"), negate(col("doc_id")))).as("best_doc"),
        max(col("bpe")).as("best_bpe"),
        count(lit(1)).as("n_members"),
        sum(col("bpe")).as("total_bpe"))
      .select(col("component"), col("best_doc"), col("best_bpe"),
        col("n_members"), col("total_bpe"))
      .orderBy(col("component"))
  }

  // ---------- d30: bigram LM statistics ----------

  /** Top-5 token bigrams per language by count — the n-gram LM
    * statistic feeding contamination screens and quality LMs. The
    * bigram explode is narrow (no shuffle until the count), and the
    * per-language top-k is a window over the aggregated counts.
    */
  val d30_bigram_stats: Q = (s, dir) => {
    val t = Tables(s, dir)
    val big = Ops.spread(t.documents, col("doc_id"))
      .select(col("lang"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(
        col("lang"),
        explode(expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"))
          .as("bigram"))
    val wTop = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    big
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("bigram"), col("n"), col("rank"))
      .orderBy(col("lang"), col("rank"))
  }

  // ---------- d51: collocation extraction (lift) ----------

  /** Top-50 collocations by LIFT — bigram association strength
    * normalized by the marginals: lift(w1,w2) = C12·B / (C1·C2) where
    * C12 counts the bigram, C1/C2 the marginal first/second-slot
    * counts, B the total bigram mass. Raw-count bigram stats (d30)
    * surface what is FREQUENT; lift surfaces what CO-OCCURS more than
    * the marginals predict — the phrase-mining / stopword-pair screen a
    * curation pipeline runs before tokenizer or quality-LM training.
    * (Rank-equivalent to PMI — log is monotone — but computed as ONE
    * double division of exact integer products, so engine and oracle
    * agree bit-for-bit with no transcendentals.)
    *
    * Scale shape: the token explode is the only wide stage and it
    * partial-aggregates straight to the (w1, w2) count frame — at most
    * |vocab|² rows regardless of corpus size. The marginals and total
    * then DERIVE from that tiny frame (no second pass over the corpus)
    * and join back broadcast. min-count filter (n_pair >= 5) mirrors
    * the support threshold every collocation miner applies.
    */
  val d51_collocations: Q = (s, dir) => {
    val t = Tables(s, dir)
    // persisted: the count frame feeds FOUR consumers (c1, c2, total,
    // and the scored join) — without the pin each would re-run the
    // corpus explode. It is at most |vocab|^2 rows, so the pin is free.
    val c12 = graft.Caches.persistOnce(
      Ops.spread(t.documents, col("doc_id"))
        .select(TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(
          explode(expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
            .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n_pair")))
    val c1  = c12.groupBy(col("w1")).agg(sum(col("n_pair")).as("c1"))
    val c2  = c12.groupBy(col("w2")).agg(sum(col("n_pair")).as("c2"))
    val tot = c12.agg(sum(col("n_pair")).as("total"))
    c12
      .join(broadcast(c1), Seq("w1"))
      .join(broadcast(c2), Seq("w2"))
      .crossJoin(broadcast(tot)) // one row
      .withColumn(
        "lift",
        (col("n_pair") * col("total")).cast("double") / (col("c1") * col("c2")).cast("double"))
      .filter(col("n_pair") >= 5)
      .select(col("w1"), col("w2"), col("n_pair"), col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(50)
  }

  // ---------- d31: snapshot diff ----------

  /** Corpus snapshot diff by content hash: v_old (simulated prior
    * snapshot: 10% of docs missing, every 13th truncated) vs v_new
    * (5.9% retired) — each doc labeled added / removed / changed /
    * unchanged. Full outer join on the id, comparing hashes only: at
    * 100 TB the diff never moves text, just 16-byte digests. This is
    * the reference's curation-version diff (added = new − old,
    * deleted = old − new, unchanged = old ∩ new;
    * /root/reference/tantalus/views.py:1090-1092) as one relational
    * pass instead of three python set operations.
    */
  val d31_snapshot_diff: Q = (s, dir) => {
    val t = Tables(s, dir)
    val vOld = t.documents
      .filter(col("doc_id") % 10 =!= 7)
      .select(
        col("doc_id"),
        md5(when(col("doc_id") % 13 === 0, substring(col("text"), 1, 50)).otherwise(col("text")))
          .as("h_old"))
    val vNew = t.documents
      .filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("h_new"))
    vOld
      .join(vNew, Seq("doc_id"), "full_outer")
      .withColumn(
        "status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged"))
      .select(col("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }

  /** e09 — incremental embedding near-dup: an ARRIVING batch matched
    * against the already-ingested corpus through the trained centroid
    * index. This runs the exact plan of the STREAMING matcher
    * (`Knn.streamingEmbeddingMatches` is stateless DataFrame ops;
    * stream ≡ batch is spec-proven in DedupKnnSpec), so this row puts
    * the streaming operator's semantics under the driver's oracle
    * gate — the embedding twin of d26/d32's text-side incremental
    * dedup. Corpus index and centroid table are built once and reused
    * across batches in production; arriving vectors never join more
    * than probes/k of the corpus.
    */
  val e09_incremental_embed_dedup: Q = (s, dir) => {
    val t        = Tables(s, dir)
    val corpus   = t.embeddings.filter(col("vec_id") % 5 =!= 0)
    val incoming = t.embeddings.filter(col("vec_id") % 5 === 0)
    val n        = corpus.count().toDouble
    val k        = math.max(math.ceil(math.sqrt(n)), math.ceil(n / 1000.0)).toInt
    val e = corpus
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val centsDf = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val idx = Knn.indexCorpus(corpus, centsDf, "vec_id", "embedding")
    val cents = centsDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    Knn
      .streamingEmbeddingMatches(incoming, idx, cents, "vec_id", "embedding",
        threshold = 0.4, probes = 4)
      .orderBy(col("q_id"), col("n_id"))
  }

  val queries: Map[String, Q] = Map(
    "e06_ann_recall"     -> e06_ann_recall,
    "e07_kmeans_step"    -> e07_kmeans_step,
    "e09_incremental_embed_dedup" -> e09_incremental_embed_dedup,
    "d28_mixture_report" -> d28_mixture_report,
    "d29_cluster_best"   -> d29_cluster_best,
    "d30_bigram_stats"   -> d30_bigram_stats,
    "d31_snapshot_diff"  -> d31_snapshot_diff,
    "d51_collocations"   -> d51_collocations,
  )

  val oracles: Map[String, String] = Map(
    "e09_incremental_embed_dedup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n0 AS (SELECT vec_id, v,
        |              sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (x, y) -> x + y)) AS nrm
        |       FROM e),
        |corp AS (SELECT * FROM n0 WHERE vec_id % 5 <> 0),
        |inc AS (SELECT * FROM n0 WHERE vec_id % 5 = 0),
        |kk AS (SELECT GREATEST(CAST(ceil(sqrt(COUNT(*))) AS BIGINT),
        |                       CAST(ceil(COUNT(*) / 1000.0) AS BIGINT)) AS k FROM corp),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM (
        |        SELECT vec_id, v, nrm, row_number() OVER (ORDER BY vec_id) AS rn FROM corp), kk
        |      WHERE rn <= k),
        |asgc AS (SELECT vec_id AS n_id, v AS nv, nrm AS nn, c_id AS cell FROM (
        |          SELECT corp.vec_id, corp.v, corp.nrm, c.c_id,
        |                 row_number() OVER (PARTITION BY corp.vec_id ORDER BY
        |                   list_reduce(list_transform(list_zip(corp.v, c.cv), s -> s[1] * s[2]), (x, y) -> x + y)
        |                            / (corp.nrm * c.cn) DESC, c.c_id) AS rn
        |          FROM corp CROSS JOIN c) WHERE rn = 1),
        |asgq AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS cell FROM (
        |          SELECT inc.vec_id, inc.v, inc.nrm, c.c_id,
        |                 row_number() OVER (PARTITION BY inc.vec_id ORDER BY
        |                   list_reduce(list_transform(list_zip(inc.v, c.cv), s -> s[1] * s[2]), (x, y) -> x + y)
        |                            / (inc.nrm * c.cn) DESC, c.c_id) AS rn
        |          FROM inc CROSS JOIN c) WHERE rn <= 4),
        |m AS (SELECT q.q_id, a.n_id,
        |             list_reduce(list_transform(list_zip(q.qv, a.nv), s -> s[1] * s[2]), (x, y) -> x + y)
        |               / (q.qn * a.nn) AS cos
        |      FROM asgq q JOIN asgc a ON q.cell = a.cell)
        |SELECT q_id, n_id, cos FROM m WHERE cos >= 0.4 ORDER BY q_id, n_id""".stripMargin,
    "e06_ann_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n0 AS (SELECT vec_id, v,
        |              sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (a, b) -> a + b)) AS nrm
        |       FROM e),
        |px AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |              list_reduce(list_transform(list_zip(q.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b)
        |                / (q.nrm * c.nrm) AS cos
        |       FROM n0 q, n0 c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |ex AS (SELECT q_id, n_id FROM (
        |         SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |         FROM px) WHERE rank <= 5),
        |b AS (SELECT vec_id, v, nrm,
        |             CAST(CASE WHEN v[1] > 0 THEN 4 ELSE 0 END
        |                + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END
        |                + CASE WHEN v[3] > 0 THEN 1 ELSE 0 END AS BIGINT) AS cell
        |      FROM n0),
        |pa AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |              list_reduce(list_transform(list_zip(q.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b)
        |                / (q.nrm * c.nrm) AS cos
        |       FROM b q JOIN b c ON q.cell = c.cell AND c.vec_id <> q.vec_id
        |       WHERE q.vec_id < 5),
        |an AS (SELECT q_id, n_id FROM (
        |         SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |         FROM pa) WHERE rank <= 5)
        |SELECT q_id, COUNT(*) AS n_exact,
        |       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM an
        |                                  WHERE an.q_id = ex.q_id AND an.n_id = ex.n_id)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM an
        |                                  WHERE an.q_id = ex.q_id AND an.n_id = ex.n_id)
        |                     THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
        |FROM ex GROUP BY q_id ORDER BY q_id""".stripMargin,
    "e07_kmeans_step" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n0 AS (SELECT vec_id, v,
        |              sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (a, b) -> a + b)) AS nrm
        |       FROM e),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n0 WHERE vec_id < 8),
        |p AS (SELECT n0.vec_id, n0.v, c.c_id,
        |             list_reduce(list_transform(list_zip(n0.v, c.cv), s -> s[1] * s[2]), (x, y) -> x + y)
        |               / (n0.nrm * c.cn) AS ccos
        |      FROM n0 CROSS JOIN c),
        |a AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn FROM p),
        |sel AS (SELECT c_id AS cell, ccos, v[1] AS x1, v[2] AS x2, v[3] AS x3 FROM a WHERE rn = 1)
        |SELECT cell, COUNT(*) AS n,
        |       round(CAST(SUM(CAST(ccos AS DECIMAL(28,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS mean_cos,
        |       round(CAST(SUM(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS m1,
        |       round(CAST(SUM(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS m2,
        |       round(CAST(SUM(CAST(x3 AS DECIMAL(28,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS m3
        |FROM sel GROUP BY cell ORDER BY cell""".stripMargin,
    "d28_mixture_report" ->
      s"""SELECT source, lang, n_docs, total_bpe,
         |       CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE) AS doc_share,
         |       CAST(total_bpe AS DOUBLE) / CAST(SUM(total_bpe) OVER () AS DOUBLE) AS bpe_share
         |FROM (
         |  SELECT source, lang, COUNT(*) AS n_docs,
         |         CAST(SUM($bpeLen) AS BIGINT) AS total_bpe
         |  FROM documents GROUP BY source, lang)
         |ORDER BY source, lang""".stripMargin,
    "d29_cluster_best" ->
      s"""WITH RECURSIVE $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |th AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM tok),
         |bits AS (SELECT doc_id, j,
         |                SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) bj
         |         GROUP BY doc_id, j),
         |sh2 AS (SELECT doc_id,
         |               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
         |        FROM bits GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         |          FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
         |          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
         |          UNION SELECT id2, id1 FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
         |bpe AS (SELECT doc_id, $bpeLen AS bpe FROM documents),
         |lab AS (SELECT comp.component, comp.id AS doc_id, bpe.bpe
         |        FROM comp JOIN bpe ON bpe.doc_id = comp.id)
         |SELECT component, best_doc, best_bpe, n_members, total_bpe FROM (
         |  SELECT component, doc_id AS best_doc, bpe AS best_bpe,
         |         COUNT(*) OVER (PARTITION BY component) AS n_members,
         |         CAST(SUM(bpe) OVER (PARTITION BY component) AS BIGINT) AS total_bpe,
         |         row_number() OVER (PARTITION BY component ORDER BY bpe DESC, doc_id) AS rn
         |  FROM lab) WHERE rn = 1 ORDER BY component""".stripMargin,
    "d30_bigram_stats" ->
      s"""WITH $toksCte,
         |b AS (SELECT lang,
         |             unnest(CASE WHEN len(t) >= 2
         |               THEN list_transform(generate_series(1, len(t) - 1),
         |                                   i -> concat(t[i], ' ', t[i+1]))
         |               ELSE [] END) AS bigram
         |      FROM toks),
         |c AS (SELECT lang, bigram, COUNT(*) AS n FROM b GROUP BY 1, 2)
         |SELECT lang, bigram, n, rank FROM (
         |  SELECT lang, bigram, n,
         |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS BIGINT) AS rank
         |  FROM c)
         |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    "d31_snapshot_diff" ->
      """WITH v_old AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 13 = 0 THEN substr(text, 1, 50) ELSE text END) AS h_old
        |  FROM documents WHERE doc_id % 10 <> 7),
        |v_new AS (
        |  SELECT doc_id, md5(text) AS h_new
        |  FROM documents WHERE doc_id % 17 <> 3)
        |SELECT COALESCE(v_old.doc_id, v_new.doc_id) AS doc_id,
        |       CASE WHEN v_old.doc_id IS NULL THEN 'added'
        |            WHEN v_new.doc_id IS NULL THEN 'removed'
        |            WHEN h_old <> h_new THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM v_old FULL OUTER JOIN v_new ON v_old.doc_id = v_new.doc_id
        |ORDER BY doc_id""".stripMargin,
    // lift = C12*B / (C1*C2): exact integer products, one double
    // division — bit-exact across engines, rank-equivalent to PMI
    "d51_collocations" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(tk)), i -> {'w1': tk[i], 'w2': tk[i + 1]})) AS b
        |  FROM tk WHERE len(tk) >= 2),
        |c12 AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS n_pair
        |  FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |c2 AS (SELECT w2, CAST(SUM(n_pair) AS BIGINT) AS c2 FROM c12 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS total FROM c12)
        |SELECT w1, w2, n_pair,
        |       CAST(n_pair * total AS DOUBLE) / CAST(c1.c1 * c2.c2 AS DOUBLE) AS lift
        |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), tot
        |WHERE n_pair >= 5
        |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin,
  )
}
