package graft.operators

import graft.Tables
import graft.dedup.Dedup
import graft.functions.TextAnalysis
import graft.operators.Ops.dsum
import graft.similarity.Knn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents`,
  * `embeddings` and `events` tables: dedup (exact / n-gram Jaccard /
  * MinHash-LSH / SimHash), similarity search (brute-force + IVF-style
  * bucketed ANN), text analysis (lang-ID, quality, token stats),
  * multimodal column plumbing, event-time bucketing, and write-path
  * upsert/soft-delete semantics. Every query ships a DuckDB oracle —
  * including MinHash, via the dialect-portable md5-based hash60.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------- shared DuckDB CTE fragments ----------

  private[operators] val toksCte =
    """toks AS (
      |  SELECT doc_id, lang, source, text,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents)""".stripMargin

  // shingles are carried as their 60-bit md5 hash (= Hashing.hash60 /
  // Dedup.shingleArrays representation): 8-byte join/intersection keys
  private[operators] val shCte =
    """sh AS (
      |  SELECT DISTINCT doc_id, CAST('0x' || substr(md5(s0), 1, 15) AS BIGINT) AS s FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |      THEN list_transform(generate_series(1, len(t) - 2),
      |                          i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
      |      ELSE [] END) AS s0
      |    FROM toks))""".stripMargin

  // ---------- dedup ----------

  /** Exact dedup by normalized content hash; keeps group metadata. */
  val d01_dedup_exact: Q = (s, dir) => {
    val t = Tables(s, dir)
    Dedup
      .exactDedup(t.documents, "doc_id", "text")
      .select(col("doc_id"), col("content_hash"), col("group_size"), col("keeper"), col("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** Exact 3-gram Jaccard near-dup pairs via prefix-filtered blocking.
    * The per-doc shingle-array frame feeds every plan branch (document
    * frequencies, prefix index, verification sets) — persist it once
    * (one narrow row per doc), the caller's cache decision (Spark-ML
    * style); the exploded inverted index derives from it shuffle-free.
    */
  val d02_ngram_jaccard: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val arrs = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).transform(graft.Caches.persistOnce)
    Dedup.jaccardPairs(arrs, "doc_id", 0.5).orderBy(col("id1"), col("id2"))
  }

  /** d02's semantics through the RARITY-ordered PPJoin variant
    * (Dedup.prefixCandidatesRarity): canonical order = (document
    * frequency asc, shingle), so stop-shingles never sit in any
    * prefix — the skew-hardened candidate path a Zipf-heavy corpus
    * needs at 100 TB. Value-identical to d02 by the PPJoin losslessness
    * argument (complete for ANY fixed total order), which this row
    * proves under the oracle gate with the same brute-force SQL.
    */
  val d44_jaccard_rarity: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val arrs = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).transform(graft.Caches.persistOnce)
    Dedup
      .verifyJaccard(Dedup.prefixCandidatesRarity(arrs, "doc_id", 0.5), arrs, "doc_id", 0.5)
      .orderBy(col("id1"), col("id2"))
  }

  /** MinHash(16) + LSH(8 bands of 2) candidates, exact-Jaccard verified.
    *
    * Signatures + bands come from the per-row fused path
    * (`Dedup.rowMinhashBands`, MinhashSigExpr): the signature is a pure
    * function of the doc's own shingle set, so nothing explodes and
    * nothing aggregates before the ONE candidate shuffle — value-
    * identical to the exploded/aggregated forms (spec-proven).
    */
  val d03_minhash_lsh: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val arrs = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).transform(graft.Caches.persistOnce)
    val cand = Dedup.lshCandidates(Dedup.rowMinhashBands(arrs, "doc_id", 16, 2), "doc_id")
    Dedup.verifyJaccard(cand, arrs, "doc_id", 0.5).orderBy(col("id1"), col("id2"))
  }

  /** 60-bit SimHash per document. */
  val d04_simhash: Q = (s, dir) => {
    val t = Tables(s, dir)
    Dedup.simhash60(t.documents, "doc_id", "text").orderBy(col("doc_id"))
  }

  // ---------- text analysis ----------

  /** Heuristic marker-based language-ID vs the labeled lang column. */
  val d05_lang_id: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.documents
      .select(
        col("doc_id"),
        col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Quality-score components: length, token, stopword, punct metrics. */
  val d06_quality: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.documents
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.meanTokenLength(col("text")).as("mean_tok_len"),
        TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Corpus token statistics per source. */
  val d07_token_stats: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.documents
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
        sum(TextAnalysis.bpeTokenCount(col("text"))).as("total_bpe_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(length(col("text")).cast("long")).cast("double") / count(lit(1))).as("avg_len"))
      .orderBy(col("source"))
  }

  /** Embedding-cosine near-dup pairs (exact baseline; sign-LSH is the
    * scale path — see Dedup.embeddingNearDupPairs).
    */
  val d09_embed_neardup: Q = (s, dir) => {
    val t = Tables(s, dir)
    Dedup
      .embeddingNearDupPairs(t.embeddings, "vec_id", "embedding", 0.45)
      .orderBy(col("id1"), col("id2"))
  }

  /** Near-dup cluster assignment: connected components over the exact
    * Jaccard pair graph (min-label propagation), each doc labeled with
    * its component representative. The oracle recomputes components via
    * a recursive transitive-closure CTE.
    */
  val d12_dedup_clusters: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val arrs = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).transform(graft.Caches.persistOnce)
    Dedup
      .dedupComponents(Dedup.jaccardPairs(arrs, "doc_id", 0.5))
      .orderBy(col("id"))
  }

  /** tf-idf-style distinctive terms: top-3 terms per doc ranked by
    * (term frequency desc, document frequency asc, term) — the integer-
    * deterministic form of tf-idf ranking (no float log, so the oracle
    * comparison is exact by construction).
    */
  val d11_top_terms: Q = (s, dir) => {
    val t = Tables(s, dir)
    // tf is doc-LOCAL (TermCountsExpr): every token of a doc is already
    // in its row, so the tf table needs no (doc, term) exchange at all
    // — the only corpus-wide aggregations left are the df count and the
    // per-doc ranking. The narrow (doc, term, tf) frame feeds both df
    // and the rank join; persisting it avoids re-tokenizing the corpus
    // for the second consumer (Caches.scoped drops it after the run).
    val tf = Ops.spread(t.documents, col("doc_id"))
      .select(
        col("doc_id"),
        explode(graft.functions.ShingleExpressions.termCounts(TextAnalysis.tokens(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .transform(graft.Caches.persistOnce)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df"), col("term"))
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Document fingerprint: min-hash60 over the shingle set (+ set size);
    * docs with fewer than 3 tokens keep a null fingerprint.
    */
  val d08_fingerprint: Q = (s, dir) => {
    val t  = Tables(s, dir)
    // shingleSet already emits hash60(shingle) — the fingerprint is its min
    val sh = Dedup.shingleSet(t.documents, "doc_id", "text", 3)
    val fp = sh
      .groupBy(col("doc_id"))
      .agg(min(col("s")).as("fingerprint"), count(lit(1)).as("n_shingles"))
    t.documents
      .select(col("doc_id"))
      .join(fp, Seq("doc_id"), "left")
      .withColumn("n_shingles", coalesce(col("n_shingles"), lit(0L)))
      .orderBy(col("doc_id"))
  }

  // ---------- similarity search ----------

  /** Exact brute-force cosine top-10 for query vectors vec_id < 5. */
  val e01_knn_brute: Q = (s, dir) => {
    val t = Tables(s, dir)
    Knn
      .bruteTopK(t.embeddings.filter(col("vec_id") < 5), t.embeddings, "vec_id", "embedding", 10)
      .orderBy(col("q_id"), col("rank"))
  }

  /** ANN: sign-bit IVF cell (8 cells), top-5 within the query's cell. */
  val e02_ann_bucketed: Q = (s, dir) => {
    val t = Tables(s, dir)
    Knn
      .bucketedTopK(t.embeddings.filter(col("vec_id") < 5), t.embeddings, "vec_id", "embedding", 5, bits = 3)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Multi-probe ANN (probe own cell + Hamming-1 cells): the recall
    * knob between e02's nprobe=1 and e01's exact scan.
    */
  val e03_ann_multiprobe: Q = (s, dir) => {
    val t = Tables(s, dir)
    Knn
      .multiProbeTopK(t.embeddings.filter(col("vec_id") < 5), t.embeddings, "vec_id", "embedding", 5, bits = 3)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Composed training-data filter: exact-dedup keeper ∧ token budget ∧
    * quality thresholds ∧ language allowlist — the operators chained the
    * way a corpus-preparation pipeline actually uses them.
    */
  val d10_corpus_filter: Q = (s, dir) => {
    val t = Tables(s, dir)
    Dedup
      .exactDedup(t.documents, "doc_id", "text")
      .filter(
        col("is_kept") &&
          TextAnalysis.tokenCount(col("text")) >= 10 &&
          TextAnalysis.stopwordRatio(col("text")) >= 0.05 &&
          TextAnalysis.punctRatio(col("text")) <= 0.1 &&
          col("lang").isin("en", "de"))
      .select(
        col("doc_id"),
        col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sampling by content hash: per-language
    * keep rates applied as `hash60(text) % 100 < rate`. Unlike RNG
    * sampling this is reproducible across runs, engines, partitionings
    * and retries — the only sampling that composes with a 100 TB
    * pipeline's idempotence requirements.
    */
  val d13_hash_sample: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val slot = graft.functions.Hashing.hash60(col("text")) % 100
    val rate = when(col("lang") === "en", 50).otherwise(10)
    t.documents
      .filter(slot < rate)
      .select(col("doc_id"), col("lang"), slot.cast("long").as("slot"))
      .orderBy(col("doc_id"))
  }

  // ---------- multimodal plumbing ----------

  /** Opaque-binary media column with typed metadata (S10-style nested
    * schema): byte length, content-addressed key, head sample.
    */
  val mm01_media_meta: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.documents
      .select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
        substring(md5(col("text")), 1, 16).as("content_key"),
        substring(col("text"), 1, 16).as("head16"))
      .orderBy(col("doc_id"))
  }

  // ---------- event-time bucketing (batch form of the streaming agg) ----------

  /** Hourly tumbling-window counts/sums per event type — the batch
    * equivalent of streaming.EventStreams.hourlyStats (same transform).
    * ts arrives as long nanos (nanosAsLong read).
    */
  val st01_event_hourly: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.events
      .select(
        date_format(timestamp_micros(graft.operators.Ops.tsMicros(t.events)), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("value"))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Sliding 1-hour windows every 15 minutes (batch form of the
    * streaming sliding aggregate; each event lands in 4 windows).
    */
  val st03_sliding_window: Q = (s, dir) => {
    val t = Tables(s, dir)
    graft.streaming.EventStreams
      .slidingStats(t.events)
      .select(
        date_format(col("win_start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"),
        col("n"))
      .orderBy(col("ws"), col("event_type"))
  }

  /** As-of join over the event stream: every error event matched to the
    * same user's most recent prior (or simultaneous) purchase. Oracle is
    * DuckDB's native ASOF LEFT JOIN; Spark-side is the composed
    * single-shuffle union+last_value plan (Ops.asofJoin).
    */
  val st04_asof_join: Q = (s, dir) => {
    val t = Tables(s, dir)
    val ev = t.events.withColumn("tus", graft.operators.Ops.tsMicros(t.events))
    val errors    = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("tus"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("tus").as("p_tus"), col("value"))
    Ops
      .asofJoin(errors, purchases, Seq("user_id"), "tus", "p_tus", tieCols = Seq("p_event_id"))
      .select(
        col("left.event_id").as("event_id"),
        col("left.user_id").as("user_id"),
        col("left.tus").as("err_tus"),
        col("matched.p_event_id").as("purchase_event_id"),
        col("matched.p_tus").as("purchase_tus"),
        col("matched.value").as("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Gap-based sessionization (30-min inactivity), batch form of the
    * streaming flatMapGroupsWithState semantics.
    */
  val st02_sessionize: Q = (s, dir) => {
    val t = Tables(s, dir)
    graft.streaming.EventStreams.sessionize(t.events)
  }

  // ---------- write-path semantics ----------

  /** M1 upsert: incoming rows win, others survive. */
  val wp01_upsert: Q = (s, dir) => {
    val t        = Tables(s, dir)
    val existing = t.customer.select(col("c_custkey"), col("c_name"))
    val incoming = t.customer
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), upper(col("c_name")).as("c_name"))
    WritePath.upsert(existing, incoming, Seq("c_custkey")).orderBy(col("c_custkey"))
  }

  /** M4 soft-delete cascade: lineitems of 'F' orders flagged deleted on
    * top of their own returned-flag state.
    */
  val wp02_softdelete_cascade: Q = (s, dir) => {
    val t = Tables(s, dir)
    val instances = t.lineitem.select(
      col("l_orderkey"),
      col("l_linenumber"),
      (col("l_returnflag") === "R").as("is_deleted"))
    val deletedKeys =
      t.orders.filter(col("o_orderstatus") === "F").select(col("o_orderkey").as("l_orderkey"))
    WritePath
      .softDeleteCascade(instances, deletedKeys, "l_orderkey")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val queries: Map[String, Q] = Map(
    "d01_dedup_exact"   -> d01_dedup_exact,
    "d02_ngram_jaccard" -> d02_ngram_jaccard,
    "d44_jaccard_rarity" -> d44_jaccard_rarity,
    "d03_minhash_lsh"   -> d03_minhash_lsh,
    "d04_simhash"       -> d04_simhash,
    "d05_lang_id"       -> d05_lang_id,
    "d06_quality"       -> d06_quality,
    "d07_token_stats"   -> d07_token_stats,
    "d08_fingerprint"   -> d08_fingerprint,
    "d09_embed_neardup" -> d09_embed_neardup,
    "e01_knn_brute"     -> e01_knn_brute,
    "e02_ann_bucketed"  -> e02_ann_bucketed,
    "e03_ann_multiprobe" -> e03_ann_multiprobe,
    "d10_corpus_filter" -> d10_corpus_filter,
    "d11_top_terms"     -> d11_top_terms,
    "d12_dedup_clusters" -> d12_dedup_clusters,
    "d13_hash_sample"   -> d13_hash_sample,
    "mm01_media_meta"   -> mm01_media_meta,
    "st01_event_hourly" -> st01_event_hourly,
    "st02_sessionize"   -> st02_sessionize,
    "st03_sliding_window" -> st03_sliding_window,
    "st04_asof_join"    -> st04_asof_join,
    "wp01_upsert"       -> wp01_upsert,
    "wp02_softdelete_cascade" -> wp02_softdelete_cascade,
  )

  // ---------- oracles ----------

  private def langScoreSql: String = {
    def occ(m: String) =
      s"CAST((length(pt) - length(replace(pt, '$m', ''))) / ${m.length} AS BIGINT)"
    TextAnalysis.LangMarkers
      .map { case (l, ms) => ms.map(occ).mkString(" + ") + s" AS s_$l" }
      .mkString(",\n  ")
  }

  val oracles: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT doc_id, content_hash,
        |       COUNT(*) OVER (PARTITION BY content_hash) AS group_size,
        |       MIN(doc_id) OVER (PARTITION BY content_hash) AS keeper,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY content_hash) AS is_kept
        |FROM (SELECT doc_id,
        |             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "d02_ngram_jaccard" ->
      s"""WITH $toksCte,
         |$shCte,
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT i.id1, i.id2, i.inter / (s1.n + s2.n - i.inter) AS jac
         |FROM inter i
         |JOIN sizes s1 ON s1.doc_id = i.id1
         |JOIN sizes s2 ON s2.doc_id = i.id2
         |WHERE i.inter / (s1.n + s2.n - i.inter) >= 0.5
         |ORDER BY id1, id2""".stripMargin,
    "d44_jaccard_rarity" ->
      s"""WITH $toksCte,
         |$shCte,
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT i.id1, i.id2, i.inter / (s1.n + s2.n - i.inter) AS jac
         |FROM inter i
         |JOIN sizes s1 ON s1.doc_id = i.id1
         |JOIN sizes s2 ON s2.doc_id = i.id2
         |WHERE i.inter / (s1.n + s2.n - i.inter) >= 0.5
         |ORDER BY id1, id2""".stripMargin,
    "d03_minhash_lsh" ->
      s"""WITH $toksCte,
         |$shCte,
         |mh AS (SELECT doc_id, i,
         |              MIN(CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 15) AS BIGINT)) AS mh
         |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) hi
         |       GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |                 string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i) AS sig
         |          FROM mh GROUP BY doc_id, i // 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT i.id1, i.id2, i.inter / (s1.n + s2.n - i.inter) AS jac
         |FROM inter i
         |JOIN sizes s1 ON s1.doc_id = i.id1
         |JOIN sizes s2 ON s2.doc_id = i.id2
         |WHERE i.inter / (s1.n + s2.n - i.inter) >= 0.5
         |  AND EXISTS (SELECT 1 FROM cand c WHERE c.id1 = i.id1 AND c.id2 = i.id2)
         |ORDER BY id1, id2""".stripMargin,
    "d04_simhash" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |th AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM tok),
         |bits AS (SELECT doc_id, j,
         |                SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) bj
         |         GROUP BY doc_id, j)
         |SELECT doc_id,
         |       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d05_lang_id" ->
      s"""WITH p AS (SELECT doc_id, lang, text,
         |                  ' ' || lower(text) || ' ' AS pt FROM documents),
         |sc AS (SELECT doc_id, lang, text,
         |  $langScoreSql
         |FROM p)
         |SELECT doc_id, lang,
         |       CASE WHEN greatest(s_en, s_es, s_de, s_fr) > 0 AND s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         |            WHEN greatest(s_en, s_es, s_de, s_fr) > 0 AND s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         |            WHEN greatest(s_en, s_es, s_de, s_fr) > 0 AND s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         |            WHEN greatest(s_en, s_es, s_de, s_fr) > 0 AND s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
         |            ELSE 'und' END AS lang_pred,
         |       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
         |FROM sc ORDER BY doc_id""".stripMargin,
    "d06_quality" ->
      s"""WITH $toksCte
         |SELECT doc_id,
         |       CAST(length(text) AS BIGINT) AS len_chars,
         |       CAST(len(t) AS BIGINT) AS n_tokens,
         |       CASE WHEN len(t) = 0 THEN 0.0
         |            ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len(t) END AS mean_tok_len,
         |       CASE WHEN len(t) = 0 THEN 0.0
         |            ELSE CAST(len(list_filter(t, x -> x IN ('the','a','an','of','to','and','in','is','it','that'))) AS DOUBLE) / len(t) END AS stopword_ratio,
         |       CASE WHEN length(text) = 0 THEN 0.0
         |            ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio
         |FROM toks ORDER BY doc_id""".stripMargin,
    "d07_token_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens,
        |       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0))) AS BIGINT) AS total_bpe_tokens,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS avg_len
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "d09_embed_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |             sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (x, y) -> x + y)) AS nrm
        |      FROM e),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |             list_reduce(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]), (x, y) -> x + y)
        |               / (a.nrm * b.nrm) AS cos
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, cos FROM p WHERE cos >= 0.45 ORDER BY id1, id2""".stripMargin,
    "d08_fingerprint" ->
      s"""WITH $toksCte,
         |$shCte,
         |fp AS (SELECT doc_id,
         |              MIN(s) AS fingerprint,
         |              COUNT(*) AS n_shingles
         |       FROM sh GROUP BY doc_id)
         |SELECT d.doc_id, fp.fingerprint, COALESCE(fp.n_shingles, 0) AS n_shingles
         |FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "d12_dedup_clusters" ->
      s"""WITH RECURSIVE $toksCte,
         |$shCte,
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pairs AS (SELECT i.id1, i.id2 FROM inter i
         |          JOIN sizes s1 ON s1.doc_id = i.id1
         |          JOIN sizes s2 ON s2.doc_id = i.id2
         |          WHERE i.inter / (s1.n + s2.n - i.inter) >= 0.5),
         |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
         |          UNION SELECT id2, id1 FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
         |SELECT id, component, id = component AS is_representative FROM (
         |  SELECT a AS id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a)
         |ORDER BY id""".stripMargin,
    "d11_top_terms" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
         |SELECT doc_id, term, tf, df, rank FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         |         CAST(row_number() OVER (PARTITION BY tf.doc_id
         |              ORDER BY tf.tf DESC, dfreq.df, tf.term) AS BIGINT) AS rank
         |  FROM tf JOIN dfreq USING (term))
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "e01_knn_brute" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |             list_reduce(list_transform(list_zip(q.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b) AS dot,
        |             sqrt(list_reduce(list_transform(list_zip(q.v, q.v), s -> s[1] * s[2]), (a, b) -> a + b)) AS qn,
        |             sqrt(list_reduce(list_transform(list_zip(c.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b)) AS cn
        |      FROM e q, e c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
        |SELECT q_id, n_id,
        |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot / (qn * cn) DESC, n_id) AS BIGINT) AS rank,
        |       dot / (qn * cn) AS cos
        |FROM p QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "e02_ann_bucketed" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |b AS (SELECT vec_id, v,
        |             CAST(CASE WHEN v[1] > 0 THEN 4 ELSE 0 END
        |                + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END
        |                + CASE WHEN v[3] > 0 THEN 1 ELSE 0 END AS BIGINT) AS cell
        |      FROM e),
        |p AS (SELECT q.vec_id AS q_id, q.cell AS cell, c.vec_id AS n_id,
        |             list_reduce(list_transform(list_zip(q.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b) AS dot,
        |             sqrt(list_reduce(list_transform(list_zip(q.v, q.v), s -> s[1] * s[2]), (a, b) -> a + b)) AS qn,
        |             sqrt(list_reduce(list_transform(list_zip(c.v, c.v), s -> s[1] * s[2]), (a, b) -> a + b)) AS cn
        |      FROM b q JOIN b c ON q.cell = c.cell AND c.vec_id <> q.vec_id
        |      WHERE q.vec_id < 5)
        |SELECT q_id, cell, n_id,
        |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot / (qn * cn) DESC, n_id) AS BIGINT) AS rank,
        |       dot / (qn * cn) AS cos
        |FROM p QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "e03_ann_multiprobe" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |b AS (SELECT vec_id, v,
        |             CAST(CASE WHEN v[1] > 0 THEN 4 ELSE 0 END
        |                + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END
        |                + CASE WHEN v[3] > 0 THEN 1 ELSE 0 END AS BIGINT) AS cell
        |      FROM e),
        |qp AS (SELECT vec_id, v, unnest([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4)]) AS probe
        |       FROM b WHERE vec_id < 5),
        |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |             list_reduce(list_transform(list_zip(q.v, c.v), s -> s[1] * s[2]), (x, y) -> x + y) AS dot,
        |             sqrt(list_reduce(list_transform(list_zip(q.v, q.v), s -> s[1] * s[2]), (x, y) -> x + y)) AS qn,
        |             sqrt(list_reduce(list_transform(list_zip(c.v, c.v), s -> s[1] * s[2]), (x, y) -> x + y)) AS cn
        |      FROM qp q JOIN b c ON q.probe = c.cell AND c.vec_id <> q.vec_id)
        |SELECT q_id, n_id,
        |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot / (qn * cn) DESC, n_id) AS BIGINT) AS rank,
        |       dot / (qn * cn) AS cos
        |FROM p QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "d10_corpus_filter" ->
      """WITH h AS (SELECT doc_id, lang, source, text,
        |                  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
        |           FROM documents),
        |k AS (SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY ch) AS is_kept FROM h),
        |t2 AS (SELECT doc_id, source, lang, text,
        |              list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |       FROM k WHERE is_kept)
        |SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens
        |FROM t2
        |WHERE len(t) >= 10
        |  AND (CASE WHEN len(t) = 0 THEN 0.0
        |            ELSE CAST(len(list_filter(t, x -> x IN ('the','a','an','of','to','and','in','is','it','that'))) AS DOUBLE) / len(t) END) >= 0.05
        |  AND (CASE WHEN length(text) = 0 THEN 0.0
        |            ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END) <= 0.1
        |  AND lang IN ('en', 'de')
        |ORDER BY doc_id""".stripMargin,
    "d13_hash_sample" ->
      """SELECT doc_id, lang,
        |       (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100) AS slot
        |FROM documents
        |WHERE (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100)
        |      < (CASE WHEN lang = 'en' THEN 50 ELSE 10 END)
        |ORDER BY doc_id""".stripMargin,
    "mm01_media_meta" ->
      """SELECT doc_id,
        |       octet_length(CAST(text AS BLOB)) AS byte_len,
        |       substr(md5(text), 1, 16) AS content_key,
        |       substr(text, 1, 16) AS head16
        |FROM documents ORDER BY doc_id""".stripMargin,
    "st01_event_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "st03_sliding_window" ->
      """WITH x AS (SELECT event_type, ts, time_bucket(INTERVAL '15 minutes', ts) AS tb FROM events),
        |w AS (SELECT event_type,
        |             unnest([tb, tb - INTERVAL '15 minutes',
        |                     tb - INTERVAL '30 minutes', tb - INTERVAL '45 minutes']) AS ws
        |      FROM x)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS ws, event_type, COUNT(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "st04_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tus FROM events),
        |err AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'error'),
        |pur AS (SELECT event_id AS p_event_id, user_id, tus AS p_tus, value FROM e
        |        WHERE event_type = 'purchase')
        |SELECT err.event_id, err.user_id, err.tus AS err_tus,
        |       pur.p_event_id AS purchase_event_id,
        |       pur.p_tus AS purchase_tus,
        |       pur.value AS purchase_value
        |FROM err ASOF LEFT JOIN pur
        |  ON err.user_id = pur.user_id AND err.tus >= pur.p_tus
        |ORDER BY event_id""".stripMargin,
    "st02_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value,
        |                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |           FROM events),
        |f AS (SELECT user_id, event_id, tus, value,
        |             CASE WHEN prev IS NULL OR tus - prev > 30*60*1000000 THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |g AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM f)
        |SELECT user_id, session_seq,
        |       MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "wp01_upsert" ->
      """WITH incoming AS (SELECT c_custkey, upper(c_name) AS c_name
        |                  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT c_custkey, c_name FROM incoming
        |UNION ALL
        |SELECT c.c_custkey, c.c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.c_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "wp02_softdelete_cascade" ->
      """SELECT l.l_orderkey, l.l_linenumber,
        |       CASE WHEN EXISTS (SELECT 1 FROM orders o
        |                         WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
        |            THEN TRUE ELSE l.l_returnflag = 'R' END AS is_deleted
        |FROM lineitem l ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
