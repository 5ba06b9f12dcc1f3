package graft.operators

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 coverage extensions: pivot / ranking-window / gaps-and-
  * islands / SCD2 analytics over the TPC-H-ish tables, plus the
  * next tier of training-data pipeline operators (containment near-dup,
  * MinHash-estimate diagnostics, Zipf term statistics, IVF ANN) and
  * approx sketches (no SQL oracle — driver records rows-only).
  */
object ExtendedQueries {

  type Q = (SparkSession, String) => DataFrame

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, lang, source, text,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents)""".stripMargin

  // shingles carried as their 60-bit md5 hash — must match
  // Dedup.shingleArrays / PipelineQueries.shCte
  private val shCte =
    """sh AS (
      |  SELECT DISTINCT doc_id, CAST('0x' || substr(md5(s0), 1, 15) AS BIGINT) AS s FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |      THEN list_transform(generate_series(1, len(t) - 2),
      |                          i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
      |      ELSE [] END) AS s0
      |    FROM toks))""".stripMargin

  // ---------- relational analytics ----------

  /** Pivot (crosstab): order counts by priority × status. Spark's
    * native pivot with an explicit value list — one aggregation, no
    * per-value scans (the reference's stats pages loop N×M queries;
    * /root/reference/tantalus/views.py:1744-1769).
    */
  val q43_pivot: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))
  }

  /** Ranking-function family: dense_rank / percent_rank / cume_dist /
    * ntile quartiles per nation by balance (deterministic tie-break on
    * the key).
    */
  val q44_rank_funcs: Q = (s, dir) => {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        col("c_acctbal"),
        dense_rank().over(w).cast("long").as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
  }

  /** Gaps-and-islands: maximal runs of consecutive active DAYS per
    * user (day_num − row_number is constant within an island). The
    * whole computation is partitioned by user — no global sort.
    */
  val q45_islands: Q = (s, dir) => {
    val t = Tables(s, dir)
    val days = t.events
      .select(col("user_id"), to_date(timestamp_micros(Ops.tsMicros(t.events))).as("day"))
      .distinct()
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
    days
      .withColumn("grp", col("day_num") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(
        date_format(min(col("day")), "yyyy-MM-dd").as("island_start"),
        date_format(max(col("day")), "yyyy-MM-dd").as("island_end"),
        count(lit(1)).as("n_days"))
      .select(col("user_id"), col("island_start"), col("island_end"), col("n_days"))
      .orderBy(col("user_id"), col("island_start"))
  }

  /** SCD2-style validity intervals: each event's value holds from its
    * own timestamp until the user's next event (open-ended for the
    * latest). One lead() pass per user partition — the reference's
    * history tables (SURVEY §2.12 M6) as intervals instead of rows.
    */
  val wp03_scd2_intervals: Q = (s, dir) => {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    t.events
      .withColumn("tus", Ops.tsMicros(t.events))
      .select(col("user_id"), col("event_id"), col("value"), col("tus").as("valid_from"))
      .withColumn("tus", col("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("event_id"), col("value"), col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** GROUPING SETS through the SQL front end — arbitrary grouping
    * combinations in one pass (the generalization of q19/q38's
    * rollup/cube), exercising `spark.sql` + temp views end to end.
    */
  val q47_grouping_sets: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders.createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** Correlated EXISTS / NOT EXISTS subqueries through the SQL front
    * end — Catalyst decorrelates both into one semi + one anti join
    * (customers with an open order but no finished one).
    */
  val q48_exists_subquery: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.createOrReplaceTempView("customer_v")
    t.orders.createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_name FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders_v o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Funnel analysis: per user, first view → first subsequent click →
    * first subsequent purchase, with the stage reached. Three
    * conditional-min aggregations chained by time — each stage one
    * shuffle on user_id, no window over the whole event stream.
    */
  val st07_funnel: Q = (s, dir) => {
    val t  = Tables(s, dir)
    val e  = t.events.select(col("user_id"), col("event_type"), Ops.tsMicros(t.events).as("tus"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("tus") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("tus") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn(
        "stage",
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L)
          .otherwise(1L))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"), col("stage"))
      .orderBy(col("user_id"))
  }

  /** Top-3 orders per customer via the bounded-buffer TopKAgg — same
    * result as a row_number window (the oracle) but the shuffle carries
    * at most k rows per (group, partition), not the whole fact table.
    */
  val q49_topk_group: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops
      .topKPerGroup(
        t.orders.select(col("o_custkey"), col("o_totalprice"), col("o_orderkey")),
        "o_custkey", "o_totalprice", "o_orderkey", 3)
      .orderBy(col("o_custkey"), col("rank"))
  }

  // ---------- pipeline extensions ----------

  /** Out-of-vocabulary ratio per document against the corpus's top-20
    * vocabulary (df-ranked, deterministic tie-break) — the quality
    * signal pipelines use to drop gibberish before training. The vocab
    * table is aggregated-tiny by construction, so its global rank
    * window and the broadcast join back are both safe at any corpus
    * size.
    */
  val d19_oov_ratio: Q = (s, dir) => {
    val t   = Tables(s, dir)
    val tok = Ops.spread(t.documents, col("doc_id"))
      .select(col("doc_id"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
    val vocab = tok
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("r", row_number().over(Window.orderBy(col("df").desc, col("term"))))
      .filter(col("r") <= 20)
      .select(col("term"), lit(1L).as("in_vocab"))
    tok
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        coalesce(sum(col("in_vocab")), lit(0L)).as("n_in_vocab"))
      .withColumn("oov_ratio", (col("n_tokens") - col("n_in_vocab")).cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test assignment by content hash (90/5/5):
    * reproducible across runs, partitionings, engines, and retries —
    * and stable under corpus growth (a document's split never changes
    * when other documents arrive), which random splitting cannot give.
    */
  val d20_split: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val slot = graft.functions.Hashing.hash60(col("text")) % 100
    val split = when(slot < 90, "train").when(slot < 95, "val").otherwise("test")
    t.documents
      .select(col("doc_id"), col("lang"), split.as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))
  }

  /** Benchmark-contamination check: for every held-out document (the
    * deterministic hash split's bottom decile — same hash60 slots as
    * d20_split), the fraction of its 3-gram shingles that appear
    * anywhere in the training split. The decontamination gate every
    * training-data pipeline runs before evaluation. Scale shape: the
    * train side collapses to DISTINCT shingle hashes (long keys), the
    * held-out side is tiny by construction, and the overlap is one
    * semi-join on the hash — no doc×doc comparison anywhere.
    */
  val d21_contamination: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val slot = graft.functions.Hashing.hash60(col("text")) % 100
    val docs  = t.documents.withColumn("slot", slot)
    val bench = docs.filter(col("slot") < 10).drop("slot")
    val train = docs.filter(col("slot") >= 10).drop("slot")
    val bArrs = Dedup.shingleArrays(bench, "doc_id", "text", 3)
    val trainSh = Dedup.shingleSet(train, "doc_id", "text", 3).select(col("s")).distinct()
    val hits = Dedup.explodeShingles(bArrs, "doc_id")
      .join(trainSh, Seq("s"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"))
    bArrs
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination", col("n_hit").cast("double") / col("n"))
      .orderBy(col("doc_id"))
  }

  /** Intra-document repetition / lexical-diversity metrics: token and
    * type counts, type-token ratio, and the most-frequent token's share
    * — the Gopher-style repetition signals used to drop degenerate
    * (looping, keyword-stuffed) documents before training. One
    * two-level aggregation, partitioned by doc then reduced.
    */
  val d22_repetition: Q = (s, dir) => {
    val t = Tables(s, dir)
    // Fully doc-local (TfStatsExpr): token count, type count and max-tf
    // come out of ONE hash-map pass over the row's own tokens, so the
    // whole metric frame is embarrassingly parallel — ZERO shuffles
    // before the presentation sort, where the exploded groupBy form
    // paid a token-level exchange. Zero-token docs are dropped to match
    // the exploded form (they produced no (doc, term) rows there).
    Ops.spread(t.documents, col("doc_id"))
      .select(
        col("doc_id"),
        graft.functions.ShingleExpressions.tfStats(
          graft.functions.TextAnalysis.tokens(col("text"))).as("st"))
      .filter(col("st").getItem(0) > 0)
      .select(
        col("doc_id"),
        col("st").getItem(0).as("n_tokens"),
        col("st").getItem(1).as("n_types"),
        col("st").getItem(2).as("max_tf"))
      .withColumn("ttr", col("n_types").cast("double") / col("n_tokens"))
      .withColumn("top_ratio", col("max_tf").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget document chunking: each document split into
    * fixed-width token windows (width 64, stride 48 — 16-token overlap
    * so no boundary context is lost), the transform that turns a raw
    * corpus into training-sequence candidates. Pure explode over a
    * start-offset sequence — embarrassingly parallel, no shuffle until
    * the caller's sink.
    */
  val d23_chunking: Q = (s, dir) => {
    val t              = Tables(s, dir)
    val (width, stride) = (64, 48)
    Ops.spread(t.documents, col("doc_id"))
      .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .filter(col("n") > 0)
      .select(
        col("doc_id"), col("t"), col("n"),
        posexplode(sequence(lit(0L), col("n") - 1, lit(stride.toLong))).as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long"),
        col("start"),
        least(lit(width.toLong), col("n") - col("start")).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("t"), col("start") + lit(1), lit(width))).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Greedy contiguous sequence packing: documents packed in doc-id
    * order into fixed token-budget bins (512 BPE tokens), separately
    * per source shard — how training batches are assembled from a
    * deduplicated corpus. The running-sum window partitions by source,
    * so packing parallelizes across shards (a global pack order would
    * serialize the corpus through one partition at 100 TB).
    */
  val d24_packing: Q = (s, dir) => {
    val t      = Tables(s, dir)
    val budget = 512L
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.documents
      .select(col("source"), col("doc_id"),
        graft.functions.TextAnalysis.bpeTokenCount(col("text")).as("tok"))
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget))
      .groupBy(col("source"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** End-to-end corpus-preparation pipeline, composed from the
    * individual operators exactly as a training-data run would chain
    * them: exact-dedup keepers → quality gate (token budget + punct
    * ratio) → near-dup cluster drop (jaccard components, keep the
    * representative) → per-(source, lang) document and BPE-token
    * accounting. One composed plan — the intermediate "tables" never
    * materialize anywhere but the shuffle.
    */
  val d25_corpus_pipeline: Q = (s, dir) => {
    val t  = Tables(s, dir)
    val ta = graft.functions.TextAnalysis
    // ONE documents scan: the 4-column projection the whole pipeline
    // needs, persisted once — the exact-dedup subtree and the shingle
    // subtree both read the cached projection instead of re-scanning
    // the table (at 100 TB both subtrees are column-pruned scans, but a
    // composed run still pays the IO twice without this).
    val base = t.documents.select(col("doc_id"), col("text"), col("source"), col("lang")).transform(graft.Caches.persistOnce)
    val kept = Dedup
      .exactDedup(base, "doc_id", "text")
      .filter(col("is_kept"))
      .filter(ta.tokenCount(col("text")) >= 10 && ta.punctRatio(col("text")) <= 0.1)
    val arrs = Dedup.shingleArrays(base, "doc_id", "text", 3).transform(graft.Caches.persistOnce)
    val losers = Dedup
      .dedupComponents(Dedup.jaccardPairs(arrs, "doc_id", 0.5))
      .filter(!col("is_representative"))
      .select(col("id"))
    kept
      .join(losers, kept("doc_id") === losers("id"), "left_anti")
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(ta.bpeTokenCount(col("text"))).as("total_bpe"))
      .orderBy(col("source"), col("lang"))
  }

  /** Incremental ingest dedup: the corpus split by content-hash slot
    * into an "already ingested" half and an "arriving batch"; the
    * batch survives only where its normalized content hash is unseen,
    * first-wins within the batch. The corpus side reduces to its
    * distinct hash set — nothing re-reads ingested text.
    */
  val d26_incremental_dedup: Q = (s, dir) => {
    val t        = Tables(s, dir)
    val slot     = graft.functions.Hashing.hash60(col("text")) % 100
    val docs     = t.documents.withColumn("slot", slot)
    val corpus   = docs.filter(col("slot") < 50).drop("slot")
    val incoming = docs.filter(col("slot") >= 50).drop("slot")
    Dedup
      .incrementalExactDedup(corpus, incoming, "doc_id", "text")
      .select(col("doc_id"), col("content_hash"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic fixed-SIZE stratified sample: exactly k=25 docs per
    * language, selected by content-hash rank — the reproducible
    * counterpart of `ORDER BY random() LIMIT k` that survives retries,
    * partitioning, engine swaps, and corpus growth reshuffling only
    * the hash-marginal docs. Rank is a per-stratum window; strata
    * partition the corpus so the sort never goes global.
    */
  val d27_fixed_sample: Q = (s, dir) => {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("lang"))
      .orderBy(graft.functions.Hashing.hash60(col("text")), col("doc_id"))
    t.documents
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 25)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("doc_id"))
  }

  /** Zipf profile of the corpus: frequency-of-frequencies of terms
    * (how many distinct terms occur k times) — the shape statistic for
    * vocabulary pruning and stopword-cutoff decisions.
    */
  val d14_zipf: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops.spread(t.documents, col("doc_id"))
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("occurrences"))
      .groupBy(col("occurrences"))
      .agg(count(lit(1)).as("n_terms"))
      .orderBy(col("occurrences"))
  }

  /** Containment near-dup pairs at 0.8 — catches one-document-embeds-
    * another duplicates that symmetric Jaccard misses.
    */
  val d15_containment: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val arrs = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).transform(graft.Caches.persistOnce)
    Dedup.containmentPairs(arrs, "doc_id", 0.8).orderBy(col("id1"), col("id2"))
  }

  /** MinHash sketch quality diagnostic: for every LSH-verified pair,
    * the signature-agreement estimate (matching minhashes / k) next to
    * exact Jaccard — the operator a pipeline uses to tune k and band
    * geometry before committing a 100 TB pass.
    */
  val d16_minhash_est: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val arrs = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).transform(graft.Caches.persistOnce)
    // ONE persisted k-minima signature pass (MinhashSigExpr is 16 MD5s
    // per shingle — the single most expensive per-row step here) feeds
    // BOTH the LSH bands and the signature-agreement estimate; the
    // narrow (doc_id, 16×long) projection is cheap to cache and the
    // runner clears it when the query returns (Caches.scala)
    val sigDf = arrs
      .filter(size(col("set")) > 0)
      .select(
        col("doc_id"),
        graft.functions.ShingleExpressions.minhashSignature(col("set"), 16).as("__sig_arr"))
      .transform(graft.Caches.persistOnce)
    val cand  = Dedup.lshCandidates(Dedup.bandsFromSigCol(sigDf, "doc_id", 16, 2), "doc_id")
    val pairs = Dedup.verifyJaccard(cand, arrs, "doc_id", 0.5)
    val sigs  = sigDf.select(col("doc_id"), col("__sig_arr").as("sig"))
    pairs
      .join(sigs.select(col("doc_id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("doc_id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn(
        "est_jac",
        size(filter(zip_with(col("sig1"), col("sig2"), (a, b) => a === b), x => x))
          .cast("double") / 16.0)
      .select(col("id1"), col("id2"), col("jac"), col("est_jac"))
      .orderBy(col("id1"), col("id2"))
  }

  /** SimHash near-dup pairs within hamming distance 3 via banded
    * hamming-LSH (4×15-bit bands, pigeonhole-complete) + exact popcount
    * verification. The oracle brute-forces all pairs — feasible at
    * oracle SF only; the Spark plan never leaves band-bucket blocks.
    */
  val d18_simhash_pairs: Q = (s, dir) => {
    val t = Tables(s, dir)
    Dedup.simhashPairs(t.documents, "doc_id", "text", maxDist = 3).orderBy(col("id1"), col("id2"))
  }

  /** IVF ANN with data-derived coarse centroids (first 8 vectors):
    * every corpus vector assigned to its nearest centroid once
    * (broadcast centroids — the assignment is a map-side pass, then
    * the per-query search is an equi-join on the cell key). nprobe=1.
    */
  val e04_ann_ivf: Q = (s, dir) => {
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
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("cell"))
    val qs = assigned
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("cell"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    qs.join(
        assigned.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"), col("cell")),
        Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", Knn.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("cell"), col("n_id"), col("rank"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Banded range join: for every error event, the count and value sum
    * of same-user clicks within ±30 minutes. Equi-join on (user,
    * time-bucket) with a 3-bucket probe — no inequality-join cross
    * product (see Ops.bandedRangeJoin).
    */
  val st05_range_join: Q = (s, dir) => {
    val t  = Tables(s, dir)
    val ev = t.events.withColumn("tus", Ops.tsMicros(t.events))
    val errs = ev
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("tus"))
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("tus").as("c_tus"), col("value"))
    Ops
      .bandedRangeJoin(errs, clicks, Seq("user_id"), "tus", "c_tus", 1800000000L)
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(lit(1)).as("n_nearby"), Ops.dsum(col("value")).as("click_value"))
      .orderBy(col("event_id"))
  }

  /** Time-series resample + forward fill: each user's last event value
    * per hour, densified onto the user's own hourly grid with gaps
    * carried forward — partitioned per user end to end.
    */
  val st06_resample_ffill: Q = (s, dir) => {
    val t  = Tables(s, dir)
    val ev = t.events.select(
      col("user_id"),
      col("ts"),
      col("event_id"),
      col("value"),
      date_trunc("hour", timestamp_micros(Ops.tsMicros(t.events))).as("hour"))
    val wLast = Window.partitionBy(col("user_id"), col("hour")).orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hour"), col("value").as("hour_value"))
    val grid = hourly
      .groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val wFill = Window
      .partitionBy(col("user_id"))
      .orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled_value", last(col("hour_value"), ignoreNulls = true).over(wFill))
      .select(col("user_id"), date_format(col("hour"), "yyyy-MM-dd HH").as("hour"), col("filled_value"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Salted two-phase aggregation producing byte-identical results to
    * the plain GROUP BY oracle — the hot-key shuffle fix proven
    * semantics-preserving.
    */
  val q46_salted_agg: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops
      .saltedCountSum(t.lineitem, Seq("l_returnflag"), col("l_extendedprice"), salts = 16)
      .orderBy(col("l_returnflag"))
  }

  /** Denylist redaction (the PII-scrub shape): mask a term list with a
    * placeholder and count replacements per document — regex masking
    * over the corpus, the pre-training scrub pass.
    */
  val d17_redact: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val deny = "\\b(customer|vector|stream)\\b"
    t.documents
      .select(
        col("doc_id"),
        regexp_replace(col("text"), deny, "[MASK]").as("redacted"),
        size(regexp_extract_all(col("text"), lit(deny), lit(0))).cast("long").as("n_masked"))
      .orderBy(col("doc_id"))
  }

  /** Embedding near-dup via trained-centroid blocking — the scale path
    * of d09: ⌈√N⌉ seed centroids (e04/e07's first-k convention), each
    * vector assigned to its max-cosine centroid (broadcast, map-side),
    * then an equi-join on the cell key instead of the all-pairs cross
    * product, exactly verified within blocks. Cell cardinality grows
    * as √N with the corpus, so shuffle parallelism and per-cell pair
    * cost both scale — the fix for the fixed-8-cell sign-LSH cap.
    * probes=4 multi-assignment recovers boundary-straddling pairs
    * (recall 0.36 → 0.86 on this corpus at sf0.01, measured against
    * the exact d09 pair set) at probes²/√N of the all-pairs cost.
    */
  val e05_embed_neardup_lsh: Q = (s, dir) => {
    val t = Tables(s, dir)
    val n = t.embeddings.count().toDouble
    // ⌈√N⌉ below 10⁶ vectors, then ⌈N/1000⌉: capping MEAN CELL WIDTH
    // at ~1000 keeps total verify cost ≈ N·width·probes² — linear in N
    // — where pure √N cells would grow it as N^1.5
    val k = math.max(math.ceil(math.sqrt(n)), math.ceil(n / 1000.0)).toLong
    val e = t.embeddings
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e
      .filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    Dedup
      .embeddingNearDupLsh(t.embeddings, "vec_id", "embedding", 0.45, centroids = Some(cents), probes = 4)
      .orderBy(col("id1"), col("id2"))
  }

  /** NOT IN subquery — the null-aware anti join (distinct physical
    * operator from plain LeftAnti: must keep three-valued-logic
    * semantics if the subquery could produce nulls).
    */
  val q50_not_in: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.createOrReplaceTempView("customer_v")
    t.orders.createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_name FROM customer_v
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Value-based RANGE window frame: each event's rolling 1-hour sum
    * and count per user — frame bounds in event-time units, not row
    * counts (q40's rowsBetween twin).
    */
  val q51_range_frame: Q = (s, dir) => {
    val t = Tables(s, dir)
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("tus"))
      .rangeBetween(-3600000000L, 0)
    t.events
      .select(col("user_id"), col("event_id"), Ops.tsMicros(t.events).as("tus"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(Ops.dec(col("value"))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("tus"), col("n_1h"), col("sum_1h"))
      .orderBy(col("user_id"), col("tus"), col("event_id"))
  }

  /** Multimodal frame sampling through the oracle: 4 evenly-spaced
    * 8-byte frames sliced from each binary payload, hex-encoded for
    * comparison. Spark slices the real binary column
    * (Multimodal.frameSample); the oracle slices the source text and
    * encodes — equal because the corpus payload is its UTF-8 bytes.
    */
  val mm02_frame_sample: Q = (s, dir) => {
    val t     = Tables(s, dir)
    val media = graft.multimodal.Multimodal.toMediaTable(t.documents, "doc_id", "text")
    graft.multimodal.Multimodal
      .frameSample(media, frameBytes = 8, nFrames = 4)
      .select(col("media_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        hex(col("frame")).as("frame_hex"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  // ---------- approx sketches (no SQL oracle: rows-only check) ----------

  /** Suite-scope memo of the tiny exact-twin RESULTS (x02e: 15 rows,
    * x03e: 21 rows). The sketches' self-evidencing witness joins reuse
    * these rows instead of recomputing the full exact plan inside the
    * sketch query (VERDICT r10 #4: the suite was computing exact
    * quantiles twice). The twin QUERIES themselves always compute
    * honestly — they are the benchmark of exactness's cost; only the
    * witness side of the sketch queries reads the memo. Keyed by sf
    * dir (testdata directories are immutable within a process), and
    * the memoized values are exactly the twin's rows, so the sketch
    * queries' output hashes are unchanged.
    */
  private val twinMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (org.apache.spark.sql.types.StructType, java.util.List[org.apache.spark.sql.Row])]()

  private def memoTwin(s: SparkSession, dir: String, key: String, build: Q): DataFrame = {
    // canonical path: "/x/sf0.1" and "/x/sf0.1/" must share an entry.
    // The memo further assumes the dir's DATA is immutable for the
    // process lifetime (true of the driver's testdata dirs); a dir
    // regenerated in-place mid-session would serve stale witness rows.
    val canon =
      try new java.io.File(dir).getCanonicalPath
      catch { case _: Throwable => dir }
    val entry = twinMemo.computeIfAbsent(
      s"$canon::$key",
      _ => {
        val df = build(s, dir)
        (df.schema, java.util.Arrays.asList(df.collect(): _*))
      })
    s.createDataFrame(entry._2, entry._1)
  }

  /** HyperLogLog++ distinct users per event type. The driver's gate can
    * only rows-check this (sketch bits have no DuckDB twin), so the
    * output is SELF-EVIDENCING: each row carries the exact distinct
    * count and the relative error, making the artifact itself prove the
    * estimate sits inside the rsd envelope. At 100 TB you drop the
    * exact column (it costs the key shuffle the sketch exists to
    * avoid); here it is the per-row accuracy witness.
    */
  val x01_approx_distinct: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .withColumn(
        "rel_err",
        abs(col("approx_users") - col("exact_users")).cast("double") / col("exact_users"))
      .orderBy(col("event_type"))
  }

  /** The PRODUCTION plan of x01 (VERDICT r10 #7): sketch only, no exact
    * witness — the form a 100 TB run executes, benched as its own row
    * so the artifact records both costs (x01 = witnessed, x01p = what
    * you actually pay). rows-only gate like every sketch.
    */
  val x01p_approx_distinct_prod: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** Sketch COLUMNS as first-class data (Apache DataSketches HLL via
    * Spark's hll_sketch_agg): one distinct-content sketch per source,
    * stored as binary, then merged with hll_union_agg into the
    * corpus-level estimate WITHOUT re-scanning documents. The pattern
    * that replaces nightly full-corpus COUNT(DISTINCT) at 100 TB:
    * per-partition sketches persist with the data and union in
    * milliseconds. Rows-only check (sketch estimates have no
    * DuckDB-identical oracle, cf. x01/x02).
    */
  val x03_sketch_union: Q = (s, dir) => {
    val t = Tables(s, dir)
    val perSource = t.documents
      .groupBy(col("source"))
      .agg(hll_sketch_agg(graft.functions.Hashing.hash60(col("text"))).as("sketch"))
    val per = perSource.select(
      col("source"),
      hll_sketch_estimate(col("sketch")).as("est_distinct"))
    val total = perSource
      .agg(hll_union_agg(col("sketch")).as("sk"))
      .select(lit("__all__").as("source"), hll_sketch_estimate(col("sk")).as("est_distinct"))
    // self-evidencing (cf. x01): join the registered exact twin — the
    // SAME 60-bit hashes counted exactly — so every estimate row carries
    // its exact answer and relative error in the gate artifact itself.
    // The twin's rows come from the suite-scope memo (computed at most
    // once per sf dir), so this query's plan is sketch + a 21-row local
    // relation — the 100 TB shape modulo the witness column.
    val exact = memoTwin(s, dir, "x03e", x03e_exact_union)
      .select(col("source"), col("n_distinct").as("exact_distinct"))
    per
      .unionByName(total)
      .join(exact, Seq("source"))
      .withColumn(
        "rel_err",
        abs(col("est_distinct") - col("exact_distinct")) / col("exact_distinct"))
      .orderBy(col("source"))
  }

  /** The PRODUCTION plan of x03 (VERDICT r10 #7): per-source sketches
    * unioned into the corpus estimate, NO exact-twin witness join — the
    * sketch-persist/union-in-milliseconds form a 100 TB run executes.
    */
  val x03p_sketch_union_prod: Q = (s, dir) => {
    val t = Tables(s, dir)
    val perSource = t.documents
      .groupBy(col("source"))
      .agg(hll_sketch_agg(graft.functions.Hashing.hash60(col("text"))).as("sketch"))
    val per = perSource.select(
      col("source"),
      hll_sketch_estimate(col("sketch")).as("est_distinct"))
    val total = perSource
      .agg(hll_union_agg(col("sketch")).as("sk"))
      .select(lit("__all__").as("source"), hll_sketch_estimate(col("sk")).as("est_distinct"))
    per.unionByName(total).orderBy(col("source"))
  }

  /** Mergeable approximate quantiles of order value per event type,
    * self-evidencing (cf. x01): each estimate row joins its registered
    * exact-twin value (x02e's rank-and-interpolate quantile) so the
    * gate artifact carries the sketch-vs-exact delta per (type, q).
    * `rel_err` is null when the exact quantile is 0 — the absolute
    * `delta` column is the witness there.
    */
  val x02_approx_quantiles: Q = (s, dir) => {
    val t = Tables(s, dir)
    val approx = t.events
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
      .select(col("event_type"), posexplode(col("qs")).as(Seq("q_idx", "q_value")))
      .select(col("event_type"), col("q_idx").cast("long").as("q_idx"), col("q_value"))
    // witness rows from the suite-scope memo (computed at most once per
    // sf dir) — the sketch query itself never re-runs the exact
    // rank-and-interpolate plan (VERDICT r10 #4)
    val exact = memoTwin(s, dir, "x02e", x02e_exact_quantiles)
      .select(col("event_type"), col("q_idx"), col("q_value").as("exact_value"))
    approx
      .join(exact, Seq("event_type", "q_idx"))
      .withColumn("delta", col("q_value") - col("exact_value"))
      .withColumn("rel_err", abs(col("delta")) / abs(nullif(col("exact_value"), lit(0.0))))
      .orderBy(col("event_type"), col("q_idx"))
  }

  // ---------- exact twins of the sketches (hash-checked oracles) ----------
  //
  // x01/x02/x03 are inherently `no_oracle` in the driver artifact (DuckDB
  // cannot replicate Spark's HLL/KLL bits). These three twins pin the EXACT
  // answers the sketches approximate, as ordinary hash-checked rows, so the
  // artifact itself carries the sketch-vs-exact comparison; the numeric
  // delta between each sketch and its twin is bounded in SketchAccuracySpec.
  // At 100 TB you run the sketch, not the twin — exact distinct/quantiles
  // need a full shuffle/sort of the key space, which is exactly the cost the
  // mergeable sketches exist to avoid; the twins are the correctness anchor.

  /** Exact twin of x01: per-type exact COUNT(DISTINCT user_id). */
  val x01e_exact_distinct: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.events
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** Exact twin of x02: interpolated (type-7 / quantile_cont) quantiles,
    * computed with an explicit rank-and-interpolate plan rather than
    * Spark's `percentile`, so the oracle can evaluate the IDENTICAL
    * IEEE expression `lo + (hi - lo) * (pos - floor(pos))` and the
    * doubles hash-match bit-for-bit — engine-internal interpolation
    * orderings are not portable, the formula is. The per-type sort is
    * the inherent cost of exactness (cf. x02's mergeable sketch).
    */
  val x02e_exact_quantiles: Q = (s, dir) => {
    import s.implicits._
    val t = Tables(s, dir)
    val ranked = t.events
      .select(col("event_type"), col("value"))
      // Null guard: Spark windows default NULLS FIRST, DuckDB's ORDER BY
      // defaults NULLS LAST, and max(rk)=n counts null rows — a single NULL
      // value would silently diverge the twin. Filter identically here and
      // in the oracle so the plan is null-robust, not data-dependent.
      .filter(col("value").isNotNull)
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy(col("event_type")).orderBy(col("value"))).cast("long"))
    val ps = Seq((0L, 0.5), (1L, 0.9), (2L, 0.99)).toDF("q_idx", "p")
    val bounds = ranked
      .groupBy(col("event_type").as("et"))
      .agg(max(col("rk")).as("n"))
      .crossJoin(broadcast(ps))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("lo_rk", floor(col("pos")) + 1)
      .withColumn("hi_rk", least(floor(col("pos")) + 2, col("n")))
    ranked
      .join(
        broadcast(bounds),
        col("event_type") === col("et") && (col("rk") === col("lo_rk") || col("rk") === col("hi_rk")))
      .groupBy(col("event_type"), col("q_idx"), col("pos"))
      .agg(
        min(when(col("rk") === col("lo_rk"), col("value"))).as("lo"),
        min(when(col("rk") === col("hi_rk"), col("value"))).as("hi"))
      .select(
        col("event_type"),
        col("q_idx"),
        (col("lo") + (col("hi") - col("lo")) * (col("pos") - floor(col("pos")).cast("double")))
          .as("q_value"))
      .orderBy(col("event_type"), col("q_idx"))
  }

  /** Exact twin of x03: per-source and corpus-level exact distinct
    * content counts over the same hash60 key the sketches consume.
    */
  val x03e_exact_union: Q = (s, dir) => {
    val t = Tables(s, dir)
    val h = t.documents.select(col("source"), graft.functions.Hashing.hash60(col("text")).as("h"))
    val per = h.groupBy(col("source")).agg(countDistinct(col("h")).as("n_distinct"))
    val total = h
      .agg(countDistinct(col("h")).as("n_distinct"))
      .select(lit("__all__").as("source"), col("n_distinct"))
    per.unionByName(total).orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q43_pivot"           -> q43_pivot,
    "q44_rank_funcs"      -> q44_rank_funcs,
    "q45_islands"         -> q45_islands,
    "wp03_scd2_intervals" -> wp03_scd2_intervals,
    "d14_zipf"            -> d14_zipf,
    "d15_containment"     -> d15_containment,
    "d16_minhash_est"     -> d16_minhash_est,
    "e04_ann_ivf"         -> e04_ann_ivf,
    "d18_simhash_pairs"   -> d18_simhash_pairs,
    "st05_range_join"     -> st05_range_join,
    "st06_resample_ffill" -> st06_resample_ffill,
    "q46_salted_agg"      -> q46_salted_agg,
    "q47_grouping_sets"   -> q47_grouping_sets,
    "q49_topk_group"      -> q49_topk_group,
    "d19_oov_ratio"       -> d19_oov_ratio,
    "d20_split"           -> d20_split,
    "q48_exists_subquery" -> q48_exists_subquery,
    "st07_funnel"         -> st07_funnel,
    "d17_redact"          -> d17_redact,
    "mm02_frame_sample"   -> mm02_frame_sample,
    "e05_embed_neardup_lsh" -> e05_embed_neardup_lsh,
    "q50_not_in"          -> q50_not_in,
    "q51_range_frame"     -> q51_range_frame,
    "x01_approx_distinct" -> x01_approx_distinct,
    "x02_approx_quantiles" -> x02_approx_quantiles,
    "x03_sketch_union"    -> x03_sketch_union,
    "x01p_approx_distinct_prod" -> x01p_approx_distinct_prod,
    "x03p_sketch_union_prod"    -> x03p_sketch_union_prod,
    "x01e_exact_distinct" -> x01e_exact_distinct,
    "x02e_exact_quantiles" -> x02e_exact_quantiles,
    "x03e_exact_union"    -> x03e_exact_union,
    "d21_contamination"   -> d21_contamination,
    "d22_repetition"      -> d22_repetition,
    "d23_chunking"        -> d23_chunking,
    "d24_packing"         -> d24_packing,
    "d25_corpus_pipeline" -> d25_corpus_pipeline,
    "d26_incremental_dedup" -> d26_incremental_dedup,
    "d27_fixed_sample"    -> d27_fixed_sample,
  )

  val oracles: Map[String, String] = Map(
    "x01e_exact_distinct" ->
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS exact_users,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "x02e_exact_quantiles" ->
      """WITH r AS (SELECT event_type, value,
        |                  CAST(row_number() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS rk
        |           FROM events WHERE value IS NOT NULL),
        |n AS (SELECT event_type AS et, MAX(rk) AS n FROM r GROUP BY 1),
        |p AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0.5 AS DOUBLE)),
        |                            (CAST(1 AS BIGINT), CAST(0.9 AS DOUBLE)),
        |                            (CAST(2 AS BIGINT), CAST(0.99 AS DOUBLE))) AS t(q_idx, p)),
        |b AS (SELECT n.et, p.q_idx, p.p * CAST(n.n - 1 AS DOUBLE) AS pos,
        |             CAST(floor(p.p * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 1 AS lo_rk,
        |             LEAST(CAST(floor(p.p * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 2, n.n) AS hi_rk
        |      FROM n CROSS JOIN p),
        |j AS (SELECT r.event_type, b.q_idx, b.pos,
        |             MIN(CASE WHEN r.rk = b.lo_rk THEN r.value END) AS lo,
        |             MIN(CASE WHEN r.rk = b.hi_rk THEN r.value END) AS hi
        |      FROM b JOIN r ON r.event_type = b.et AND r.rk IN (b.lo_rk, b.hi_rk)
        |      GROUP BY 1, 2, 3)
        |SELECT event_type, q_idx, lo + (hi - lo) * (pos - floor(pos)) AS q_value
        |FROM j ORDER BY event_type, q_idx""".stripMargin,
    "x03e_exact_union" ->
      """WITH h AS (SELECT source, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
        |           FROM documents),
        |per AS (SELECT source, COUNT(DISTINCT h) AS n_distinct FROM h GROUP BY 1
        |        UNION ALL
        |        SELECT '__all__' AS source, COUNT(DISTINCT h) AS n_distinct FROM h)
        |SELECT source, n_distinct FROM per ORDER BY source""".stripMargin,
    "q43_pivot" ->
      """SELECT o_orderpriority,
        |       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q44_rank_funcs" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |       percent_rank() OVER w AS prank,
        |       cume_dist() OVER w AS cdist,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin,
    "q45_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |d2 AS (SELECT user_id, day,
        |              (day - DATE '1970-01-01') - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |       FROM days)
        |SELECT user_id,
        |       strftime(MIN(day), '%Y-%m-%d') AS island_start,
        |       strftime(MAX(day), '%Y-%m-%d') AS island_end,
        |       COUNT(*) AS n_days
        |FROM d2 GROUP BY user_id, grp ORDER BY user_id, island_start""".stripMargin,
    "wp03_scd2_intervals" ->
      """SELECT user_id, event_id, value,
        |       epoch_us(ts) AS valid_from,
        |       lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS valid_to,
        |       lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
        |FROM events ORDER BY user_id, valid_from, event_id""".stripMargin,
    "d21_contamination" ->
      s"""WITH $toksCte,
         |$shCte,
         |slots AS (SELECT doc_id,
         |                 (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100) AS slot
         |          FROM documents),
         |bsh AS (SELECT sh.doc_id, sh.s FROM sh JOIN slots USING (doc_id) WHERE slot < 10),
         |tsh AS (SELECT DISTINCT s FROM sh JOIN slots USING (doc_id) WHERE slot >= 10),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM bsh GROUP BY doc_id),
         |hits AS (SELECT doc_id, COUNT(*) AS n_hit FROM bsh
         |         WHERE s IN (SELECT s FROM tsh) GROUP BY doc_id)
         |SELECT z.doc_id, z.n, COALESCE(h.n_hit, 0) AS n_hit,
         |       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / z.n AS contamination
         |FROM sizes z LEFT JOIN hits h USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "d22_repetition" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
         |SELECT doc_id,
         |       CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |       COUNT(*) AS n_types,
         |       MAX(tf) AS max_tf,
         |       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS ttr,
         |       CAST(MAX(tf) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS top_ratio
         |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d27_fixed_sample" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |         CAST(row_number() OVER (PARTITION BY lang
        |              ORDER BY CAST('0x' || substr(md5(text), 1, 15) AS BIGINT), doc_id) AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 25 ORDER BY doc_id""".stripMargin,
    "d26_incremental_dedup" ->
      """WITH s AS (SELECT doc_id, text, lang, source,
        |                  (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100) AS slot,
        |                  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
        |           FROM documents),
        |ex AS (SELECT DISTINCT content_hash FROM s WHERE slot < 50),
        |inc AS (SELECT doc_id, content_hash, lang, source,
        |               MIN(doc_id) OVER (PARTITION BY content_hash) AS keeper
        |        FROM s WHERE slot >= 50)
        |SELECT doc_id, content_hash, lang, source FROM inc
        |WHERE doc_id = keeper
        |  AND content_hash NOT IN (SELECT content_hash FROM ex)
        |ORDER BY doc_id""".stripMargin,
    "d25_corpus_pipeline" ->
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
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
         |hsh AS (SELECT doc_id, source, lang, text,
         |               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ch
         |        FROM documents),
         |keep AS (SELECT k.doc_id, k.source, k.lang, k.text FROM (
         |           SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY ch) AS is_kept FROM hsh) k
         |         JOIN toks ON toks.doc_id = k.doc_id
         |         WHERE k.is_kept
         |           AND len(toks.t) >= 10
         |           AND (CASE WHEN length(k.text) = 0 THEN 0.0
         |                ELSE CAST(length(regexp_replace(lower(k.text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
         |                     / length(k.text) END) <= 0.1
         |           AND k.doc_id NOT IN (SELECT id FROM comp WHERE id <> component))
         |SELECT source, lang, COUNT(*) AS n_docs,
         |       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]+', 0))) AS BIGINT) AS total_bpe
         |FROM keep GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "d23_chunking" ->
      s"""WITH $toksCte,
         |c AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks WHERE len(t) > 0),
         |idx AS (SELECT doc_id, t, n, unnest(generate_series(0, n - 1, 48)) AS start FROM c)
         |SELECT doc_id,
         |       CAST(start // 48 AS BIGINT) AS chunk_idx,
         |       CAST(start AS BIGINT) AS start,
         |       CAST(least(64, n - start) AS BIGINT) AS n_chunk_tokens,
         |       array_to_string(t[start + 1 : start + 64], ' ') AS chunk_text
         |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,
    "d24_packing" ->
      """WITH tc AS (SELECT source, doc_id,
        |                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0)) AS BIGINT) AS tok
        |            FROM documents),
        |cb AS (SELECT source, doc_id, tok,
        |              COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |       FROM tc)
        |SELECT source, CAST(cum_before // 512 AS BIGINT) AS bin,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(tok) AS BIGINT) AS bin_tokens,
        |       MIN(doc_id) AS first_doc,
        |       MAX(doc_id) AS last_doc
        |FROM cb GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "d14_zipf" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
         |tf AS (SELECT term, COUNT(*) AS occurrences FROM tok GROUP BY term)
         |SELECT occurrences, COUNT(*) AS n_terms FROM tf GROUP BY 1 ORDER BY occurrences""".stripMargin,
    "d15_containment" ->
      s"""WITH $toksCte,
         |$shCte,
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT i.id1, i.id2, i.inter / least(s1.n, s2.n) AS cont
         |FROM inter i
         |JOIN sizes s1 ON s1.doc_id = i.id1
         |JOIN sizes s2 ON s2.doc_id = i.id2
         |WHERE i.inter / least(s1.n, s2.n) >= 0.8
         |ORDER BY id1, id2""".stripMargin,
    "d16_minhash_est" ->
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
         |          GROUP BY 1, 2),
         |pairs AS (SELECT i.id1, i.id2, i.inter / (s1.n + s2.n - i.inter) AS jac
         |          FROM inter i
         |          JOIN sizes s1 ON s1.doc_id = i.id1
         |          JOIN sizes s2 ON s2.doc_id = i.id2
         |          WHERE i.inter / (s1.n + s2.n - i.inter) >= 0.5
         |            AND EXISTS (SELECT 1 FROM cand c WHERE c.id1 = i.id1 AND c.id2 = i.id2)),
         |agree AS (SELECT p.id1, p.id2,
         |                 CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16.0 AS est_jac
         |          FROM pairs p
         |          JOIN mh a ON a.doc_id = p.id1
         |          JOIN mh b ON b.doc_id = p.id2 AND b.i = a.i
         |          GROUP BY p.id1, p.id2)
         |SELECT p.id1, p.id2, p.jac, g.est_jac
         |FROM pairs p JOIN agree g ON g.id1 = p.id1 AND g.id2 = p.id2
         |ORDER BY p.id1, p.id2""".stripMargin,
    "d18_simhash_pairs" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |th AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM tok),
         |bits AS (SELECT doc_id, j,
         |                SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) bj
         |         GROUP BY doc_id, j),
         |sh2 AS (SELECT doc_id,
         |               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
         |        FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
         |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id1, id2""".stripMargin,
    "st05_range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tus FROM events),
        |err AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'error'),
        |clk AS (SELECT user_id, tus AS c_tus, value FROM e WHERE event_type = 'click')
        |SELECT err.event_id, err.user_id, COUNT(*) AS n_nearby,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM err JOIN clk
        |  ON err.user_id = clk.user_id AND abs(err.tus - clk.c_tus) <= 1800000000
        |GROUP BY 1, 2 ORDER BY event_id""".stripMargin,
    "st06_resample_ffill" ->
      """WITH e AS (SELECT user_id, ts, event_id, value, date_trunc('hour', ts) AS hour FROM events),
        |hourly AS (SELECT user_id, hour, value AS hour_value FROM (
        |             SELECT user_id, hour, value,
        |                    row_number() OVER (PARTITION BY user_id, hour ORDER BY ts DESC, event_id DESC) AS rn
        |             FROM e) WHERE rn = 1),
        |span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span),
        |j AS (SELECT g.user_id, g.hour, h.hour_value
        |      FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour = g.hour)
        |SELECT user_id, strftime(hour, '%Y-%m-%d %H') AS hour,
        |       last_value(hour_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |         ROWS UNBOUNDED PRECEDING) AS filled_value
        |FROM j ORDER BY user_id, hour""".stripMargin,
    "q46_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q49_topk_group" ->
      """SELECT o_custkey,
        |       CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
        |       o_totalprice, o_orderkey
        |FROM orders QUALIFY rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "d20_split" ->
      """WITH h AS (SELECT doc_id, lang,
        |                  (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100) AS slot
        |           FROM documents),
        |a AS (SELECT doc_id, lang,
        |             CASE WHEN slot < 90 THEN 'train'
        |                  WHEN slot < 95 THEN 'val' ELSE 'test' END AS split
        |      FROM h)
        |SELECT split, lang, COUNT(*) AS n_docs
        |FROM a GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "d19_oov_ratio" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
         |vocab AS (SELECT term FROM (
         |            SELECT term, row_number() OVER (ORDER BY COUNT(*) DESC, term) AS r
         |            FROM tok GROUP BY term) WHERE r <= 20),
         |j AS (SELECT tok.doc_id, CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END AS in_v
         |      FROM tok LEFT JOIN vocab v ON v.term = tok.term)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |       CAST(SUM(in_v) AS BIGINT) AS n_in_vocab,
         |       CAST(COUNT(*) - SUM(in_v) AS DOUBLE) / COUNT(*) AS oov_ratio
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "e05_embed_neardup_lsh" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |             sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (x, y) -> x + y)) AS nrm
        |      FROM e),
        |kk AS (SELECT GREATEST(CAST(ceil(sqrt(COUNT(*))) AS BIGINT), CAST(ceil(COUNT(*) / 1000.0) AS BIGINT)) AS k FROM e),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n, kk WHERE vec_id < k),
        |asg AS (SELECT vec_id, v, nrm, c_id AS cell FROM (
        |          SELECT n.vec_id, n.v, n.nrm, c.c_id,
        |                 row_number() OVER (PARTITION BY n.vec_id
        |                   ORDER BY list_reduce(list_transform(list_zip(n.v, c.cv), s -> s[1] * s[2]), (x, y) -> x + y)
        |                            / (n.nrm * c.cn) DESC, c.c_id) AS rn
        |          FROM n CROSS JOIN c)
        |        WHERE rn <= 4),
        |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2,
        |                a.v AS v1, b.v AS v2, a.nrm AS n1, b.nrm AS n2
        |         FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id),
        |p AS (SELECT id1, id2,
        |             list_reduce(list_transform(list_zip(v1, v2), s -> s[1] * s[2]), (x, y) -> x + y)
        |               / (n1 * n2) AS cos
        |      FROM cand)
        |SELECT id1, id2, cos FROM p WHERE cos >= 0.45 ORDER BY id1, id2""".stripMargin,
    "q50_not_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q51_range_frame" ->
      """SELECT user_id, event_id, epoch_us(ts) AS tus,
        |       COUNT(*) OVER w AS n_1h,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, tus, event_id""".stripMargin,
    "mm02_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |                  octet_length(encode(text)) AS n_bytes FROM documents),
        |f AS (SELECT media_id, i AS frame_idx,
        |             substring(text,
        |                       CAST(floor(i * greatest(n_bytes - 8, 1) / 4 + 1) AS INT),
        |                       8) AS frame
        |      FROM m CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) gi)
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx, hex(encode(frame)) AS frame_hex
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "q47_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    "q48_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "st07_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |v AS (SELECT user_id, MIN(tus) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.tus) AS t_click
        |      FROM e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.tus > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.tus) AS t_purchase
        |      FROM e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.tus > c.t_click GROUP BY 1)
        |SELECT v.user_id AS user_id, v.t_view, c.t_click, p.t_purchase,
        |       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
        |                 WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY user_id""".stripMargin,
    "d17_redact" ->
      """SELECT doc_id,
        |       regexp_replace(text, '\b(customer|vector|stream)\b', '[MASK]', 'g') AS redacted,
        |       CAST(len(regexp_extract_all(text, '\b(customer|vector|stream)\b', 0)) AS BIGINT) AS n_masked
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e04_ann_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |             sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (x, y) -> x + y)) AS nrm
        |      FROM e),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |asg AS (SELECT vec_id, v, nrm, c_id AS cell FROM (
        |          SELECT n.vec_id, n.v, n.nrm, c.c_id,
        |                 row_number() OVER (PARTITION BY n.vec_id
        |                   ORDER BY list_reduce(list_transform(list_zip(n.v, c.cv), s -> s[1] * s[2]), (x, y) -> x + y)
        |                            / (n.nrm * c.cn) DESC, c.c_id) AS rn
        |          FROM n CROSS JOIN c)
        |        WHERE rn = 1),
        |p AS (SELECT q.vec_id AS q_id, q.cell AS cell, t.vec_id AS n_id,
        |             list_reduce(list_transform(list_zip(q.v, t.v), s -> s[1] * s[2]), (x, y) -> x + y)
        |               / (q.nrm * t.nrm) AS cos
        |      FROM asg q JOIN asg t ON q.cell = t.cell AND t.vec_id <> q.vec_id
        |      WHERE q.vec_id < 5)
        |SELECT q_id, cell, n_id,
        |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank,
        |       cos
        |FROM p QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,
  )
}
