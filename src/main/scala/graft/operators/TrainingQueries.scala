package graft.operators

import graft.Tables
import graft.functions.{Hashing, TextAnalysis}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 batch 3 — training-data curation operators:
  *
  *   - d34: Gopher-style duplicate-n-gram quality rules (the repetition
  *     filters of Rae et al. 2021 §A1.1: fraction of n-gram occurrences
  *     belonging to within-doc repeated n-grams, n = 2 and 3),
  *   - d35: deterministic global corpus shuffle + fixed-shard export
  *     layout (hash-ordered permutation, the pre-training data-order
  *     step — no RNG, stable under reruns),
  *   - d37: temperature-based source mixing (alpha = 0.5 upsampling of
  *     rare strata, integer-exact rate arithmetic),
  *   - mm03: typed header-field extraction from binary media columns
  *     (big-endian uint32 at fixed byte offsets — the IHDR-shaped
  *     parse an image ingester runs before decode),
  *   - q53: keyset (cursor) pagination — the scale-correct alternative
  *     to OFFSET paging: page depth never changes the plan's cost
  *     (filter on last-seen key + TakeOrderedAndProject), unlike
  *     Ops.paginate whose cost is O(page end).
  */
object TrainingQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------- d34: duplicate-n-gram repetition rules ----------

  /** Per doc: total n-gram occurrences (n2/n3), occurrences belonging
    * to n-grams repeated within the doc (d2/d3), their fractions, and
    * the Gopher-style flag. A document's grams are a pure function of
    * its own row, so the whole statistic is doc-LOCAL
    * (DupRunStatsExpr): one sort + run-length scan per (doc, n) over
    * the fused 60-bit gram hashes — ZERO shuffles before the
    * presentation sort, where the exploded groupBy form paid a
    * gram-level exchange. Grams are carried as their 60-bit content
    * hash, the SAME sketch representation every other shingle pipeline
    * uses (duplicate-count semantics are hash-collision-safe at the
    * documented 2^-60 rate).
    */
  val d34_dup_ngrams: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val se   = graft.functions.ShingleExpressions
    val frac2 = col("d2").cast("double") / col("n2")
    val frac3 = col("d3").cast("double") / col("n3")
    graft.operators.Ops.spread(t.documents, col("doc_id"))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .select(
        col("doc_id"),
        se.dupRunStats(se.shingleHashes(col("t"), 2)).as("s2"),
        se.dupRunStats(se.shingleHashes(col("t"), 3)).as("s3"))
      .select(
        col("doc_id"),
        col("s2").getItem(0).as("n2"),
        col("s2").getItem(1).as("d2"),
        col("s3").getItem(0).as("n3"),
        col("s3").getItem(1).as("d3"))
      .filter(col("n2") > 0 && col("n3") > 0)
      .select(
        col("doc_id"),
        col("n2"),
        col("d2"),
        col("n3"),
        col("d3"),
        frac2.as("frac2"),
        frac3.as("frac3"),
        (frac2 > 0.05 || frac3 > 0.02).as("flagged"))
      .orderBy(col("doc_id"))
  }

  // ---------- d35: deterministic global shuffle + sharding ----------

  /** Hash-ordered corpus permutation assigned to 16 fixed output
    * shards: shard = hash60(doc_id) mod 16, position = rank within the
    * shard by (hash, doc_id). Reruns and corpus re-partitions give the
    * identical layout (no RNG); at cluster scale the per-shard
    * row_number is a partitioned window — each shard sorts
    * independently, there is no global sort. Writing with
    * `partitionBy(shard)` then makes each shard one output directory.
    */
  val d35_global_shuffle: Q = (s, dir) => {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    t.documents
      .select(col("doc_id"), Hashing.hash60(col("doc_id").cast("string")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(16L)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .orderBy(col("shard"), col("pos"))
  }

  // ---------- d37: temperature-based source mixing ----------

  /** Temperature-weighted mixture sampling over language strata
    * (alpha = 0.5): stratum weight w = floor(sqrt(n) * 1e6), sampling
    * rate ∝ w / n scaled so the expected sample is half the corpus,
    * capped at 1. Rare strata are upsampled relative to their share —
    * the standard multilingual-pretraining mix (e.g. mT5's alpha-scaled
    * sampling). All rate arithmetic after the (exactly-rounded, hence
    * deterministic) sqrt is 64-bit integer — rates are ppm-of-2^20
    * numerators, membership is an integer hash compare, so engine and
    * oracle agree bit-for-bit with no float-sum order sensitivity.
    * The rate numerator grows as ~5e11 * n^1.5 (w ≈ sqrt(n)·1e6), which
    * would pass 2^63 near n ≈ 7e4 docs per stratum — so the product is
    * computed in exact wide integers on both sides (decimal(38,0) here,
    * HUGEINT in the oracle), good to ~10^38: no overflow at any
    * realistic corpus size, and `div` still returns an exact long ppm.
    */
  val d37_temperature_mix: Q = (s, dir) => {
    val t     = Tables(s, dir)
    val stats = t.documents.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val w     = stats.withColumn("w", floor(sqrt(col("n_docs").cast("double")) * 1000000).cast("long"))
    val tot   = w.agg(sum(col("n_docs")).as("n_total"), sum(col("w")).as("sumw"))
    val rates = w
      .crossJoin(broadcast(tot))
      .withColumn(
        "rate_ppm",
        least(
          lit(1048576L),
          expr("(cast(1048576 as decimal(38,0)) * w * (n_total div 2)) div (cast(sumw as decimal(38,0)) * n_docs)")))
      .select(col("lang"), col("n_docs"), col("rate_ppm"))
    val sampled = t.documents
      .join(broadcast(rates), "lang")
      .filter(pmod(Hashing.hash60(col("doc_id").cast("string")), lit(1048576L)) < col("rate_ppm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
    rates
      .join(sampled, Seq("lang"), "left")
      .select(
        col("lang"),
        col("n_docs"),
        col("rate_ppm"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  // ---------- mm03: binary header-field extraction ----------

  /** Typed field extraction from an opaque binary payload: magic bytes
    * and two big-endian uint32 fields at fixed offsets (the PNG-IHDR
    * shape: width/height at bytes 17-24). Pure Column expressions over
    * the binary column — substring + hex + base-16 parse, no UDF — so
    * the parse runs inside whole-stage codegen and the payload is never
    * shuffled.
    */
  val mm03_binary_header: Q = (s, dir) => {
    val t     = Tables(s, dir)
    val media = Multimodal.toMediaTable(t.documents, "doc_id", "text")
    def be32(off: Int) =
      conv(hex(substring(col("payload"), off, 4)), 16, 10).cast("long")
    media
      .filter(col("n_bytes") >= 24)
      .select(
        col("media_id"),
        hex(substring(col("payload"), 1, 4)).as("magic_hex"),
        be32(17).as("field_a"),
        be32(21).as("field_b"))
      .orderBy(col("media_id"))
  }

  // ---------- d43: inline stutter collapse ----------

  /** Within-doc repetition SCRUBBING (a transform, not just a metric —
    * the C4-style cleanup step): collapse runs of consecutive
    * identical tokens, report per-doc original/kept counts and the
    * rebuilt head. Entirely per-row array expressions — narrow,
    * shuffle-free; only docs that actually shrank are emitted.
    *
    * Element i is kept iff i == 0 or it differs from its predecessor;
    * computed by the fused native expression (CollapseRunsExpr — one
    * JVM pass of adjacent comparisons; trivially total on empty
    * arrays). The composable twin `collapseRunsComposed` is the lambda
    * form the native expression must match (property-spec-checked
    * against a fold-based reference as well).
    */
  def collapseRuns(arr: Column): Column =
    graft.functions.ShingleExpressions.collapseRuns(arr)

  /** Composable-built-ins twin of `collapseRuns` (reference semantics). */
  def collapseRunsComposed(arr: Column): Column =
    filter(arr, (x, i) => i === 0 || x =!= element_at(arr, i))

  val d43_collapse_repeats: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val kept = collapseRuns(col("t"))
    t.documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .withColumn("kept", kept)
      .filter(size(col("t")) > size(col("kept")))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_orig"),
        size(col("kept")).cast("long").as("n_kept"),
        substring(array_join(col("kept"), " "), 1, 40).as("head40"))
      .orderBy(col("doc_id"))
  }

  // ---------- wp04: time-travel snapshot ----------

  /** Time-travel read over an event-sourced log
    * (`WritePath.snapshotAsOf`): orders as per-customer state history,
    * reconstructed as of 1996-07-01 — latest order per customer at or
    * before the date, customers whose latest row is a cancellation
    * ('F' here, standing in for a delete marker) drop out of the
    * snapshot. The shape every history/versioned catalog read reduces
    * to (reference: django-simple-history shadow tables).
    */
  val wp04_snapshot_asof: Q = (s, dir) => {
    val t = Tables(s, dir)
    WritePath
      .snapshotAsOf(
        t.orders,
        keyCols = Seq("o_custkey"),
        timeCol = "o_orderdate",
        tieCols = Seq("o_orderkey"),
        asOf = lit("1996-07-01").cast("timestamp"),
        deleteMarker = col("o_orderstatus") === "F")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      .orderBy(col("o_custkey"))
  }

  // ---------- q53: keyset pagination ----------

  /** Cursor pagination after last-seen key 500: a pushed-down range
    * filter + distributed top-100 (TakeOrderedAndProject). Unlike
    * OFFSET paging (q21 / Ops.paginate), cost is independent of how
    * deep the caller has paged — this is the pagination the reference's
    * API should expose at 100 TB.
    */
  val q53_keyset_pagination: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .filter(col("o_orderkey") > 500L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(100)
  }

  // ---------- e08: SemDeDup embedding dedup ----------

  /** SemDeDup (cluster-then-dedup) over the embeddings table, blocked
    * by the TRAINED coarse quantizer: ⌈√N⌉ seed centroids (first-k
    * convention, the e04/e07 seeding), every vector assigned to its
    * max-cosine centroid, within-cell cosine >= 0.4 drops the larger
    * id. Keep/drop decisions per vector — the embedding-space twin of
    * d12's text near-dup clustering (Knn.semDedup). Cell count scales
    * as √N with the corpus — at sf0.01 that is 23 cells, at 100 TB
    * ~√N — so join parallelism and per-cell pair cost grow with the
    * data instead of being capped at the sign-cell 8; probes=4
    * multi-assignment catches dominated vectors whose dominator sits
    * across a cell boundary.
    */
  val e08_semdedup: Q = (s, dir) => {
    import graft.similarity.Knn
    val t = Tables(s, dir)
    val n = t.embeddings.count().toDouble
    // same cell-count rule as e05: √N up to 10⁶ vectors, then N/1000
    // so mean cell width (and per-cell pair cost) stays bounded
    val k = math.max(math.ceil(math.sqrt(n)), math.ceil(n / 1000.0)).toLong
    val e = t.embeddings
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e
      .filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    Knn
      .semDedup(t.embeddings, "vec_id", "embedding", threshold = 0.4, centroids = Some(cents), probes = 4)
      .orderBy(col("vec_id"))
  }

  // ---------- d38: BPE merge step ----------

  /** One BPE-training iteration over the corpus: global counts of
    * adjacent character pairs within words, top-20 by (count desc,
    * pair). Pair counts are per-occurrence additive, so the corpus
    * aggregates to its (heavy-tailed, tiny) word-frequency table FIRST
    * and only distinct words explode into character pairs — the explode
    * is O(vocabulary), not O(corpus tokens) (measured ~2× at sf0.1;
    * the gap widens with corpus size since vocab grows ~log-linearly).
    * The top-k runs over the (tiny) pair-count frame.
    */
  val d38_bpe_merge: Q = (s, dir) => {
    val t = Tables(s, dir)
    val wcnt = t.documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("m"))
      .filter(length(col("w")) >= 2)
    val pairs = wcnt.select(
      col("m"),
      explode(
        transform(
          sequence(lit(1), length(col("w")) - 1),
          i => concat(col("w").substr(i, lit(1)), col("w").substr(i + 1, lit(1))))).as("pair"))
    val wTop = Window.orderBy(col("n").desc, col("pair"))
    pairs
      .groupBy(col("pair"))
      .agg(sum(col("m")).as("n"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 20)
      .orderBy(col("rank"))
  }

  // ---------- d42: adaptive (distribution-relative) quality cutoff ----------

  /** Relative quality filtering: instead of a fixed token-count
    * threshold, each language keeps documents at or above its own 25th
    * percentile of BPE token count — the cutoff adapts to the
    * per-stratum distribution (short-text languages aren't mass-dropped
    * by a global constant). Exact interpolated percentile per lang
    * (tiny frame) broadcast back against the corpus; output is the
    * per-lang threshold and kept/total accounting. Spark `percentile`
    * and DuckDB `quantile_cont` share the interpolation definition, so
    * the thresholds compare exactly (cf. q37).
    */
  val d42_adaptive_cutoff: Q = (s, dir) => {
    val t = Tables(s, dir)
    val tc = t.documents.select(
      col("lang"),
      TextAnalysis.bpeTokenCount(col("text")).as("n_tok"))
    val th = tc.groupBy(col("lang")).agg(expr("percentile(n_tok, 0.25)").as("p25"))
    tc.join(broadcast(th), "lang")
      .groupBy(col("lang"))
      .agg(
        first(col("p25")).as("p25"),
        count(lit(1)).as("n_total"),
        count(when(col("n_tok") >= col("p25"), 1)).as("n_kept"))
      .orderBy(col("lang"))
  }

  // ---------- q54: correlated scalar subquery ----------

  /** Correlated scalar subquery through the SQL front end — Catalyst
    * decorrelates the per-row MAX into ONE aggregate + left outer join
    * (where the reference's ORM would issue an N+1 query per row).
    */
  val q54_correlated_scalar: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders.createOrReplaceTempView("orders_v")
    t.lineitem.createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT o.o_orderkey, o.o_totalprice,
        |       (SELECT MAX(l.l_shipdate) FROM lineitem_v l
        |        WHERE l.l_orderkey = o.o_orderkey) AS last_ship
        |FROM orders_v o WHERE o.o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin)
  }

  // ---------- d39: truncation / prefix duplicates ----------

  /** Documents that are exact PREFIXES of other documents — the
    * truncation-duplicate class that Jaccard misses at low containment
    * and exact dedup misses entirely. Candidates block on the first
    * 3 tokens (equi-join key — a true prefix pair always shares them),
    * then verify with a startsWith compare; equal-text pairs order by
    * id so each pair appears once. Candidate fan-out is bounded by
    * first-3-token collisions, never O(N²).
    */
  val d39_prefix_dups: Q = (s, dir) => {
    val t = Tables(s, dir)
    val k = t.documents
      .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        col("text"),
        concat_ws(
          " ",
          element_at(col("toks"), 1),
          element_at(col("toks"), 2),
          element_at(col("toks"), 3)).as("key3"))
    val a = k.select(col("doc_id").as("short_id"), col("text").as("a_text"), col("key3"))
    val b = k.select(col("doc_id").as("long_id"), col("text").as("b_text"), col("key3"))
    a.join(b, "key3")
      .filter(col("short_id") =!= col("long_id"))
      .filter(length(col("a_text")) <= length(col("b_text")))
      .filter(col("b_text").startsWith(col("a_text")))
      .filter(length(col("a_text")) < length(col("b_text")) || col("short_id") < col("long_id"))
      .select(
        col("short_id"),
        col("long_id"),
        length(col("a_text")).cast("long").as("short_len"),
        length(col("b_text")).cast("long").as("long_len"))
      .orderBy(col("short_id"), col("long_id"))
  }

  // ---------- d40: winnowing fingerprints ----------

  /** Winnowing document fingerprints (`Dedup.winnowFingerprints`,
    * k=3, w=4): any shared run of >= 6 tokens between two docs shares
    * a fingerprint, at ~1/4 the density of full shingling.
    */
  val d40_winnowing: Q = (s, dir) => {
    val t = Tables(s, dir)
    graft.dedup.Dedup
      .winnowFingerprints(t.documents, "doc_id", "text", k = 3, w = 4)
      .orderBy(col("doc_id"), col("fp"))
  }

  // ---------- d41: cross-source overlap matrix ----------

  /** Corpus data-card diagnostic: pairwise shingle overlap between
    * sources — exact Jaccard per source pair over distinct 3-gram hash
    * sets. ONE shingle-keyed aggregation replaces the former
    * distinct + self-join: `collect_set(source)` per shingle dedupes
    * map-side AND bounds every posting row at |sources|, then source
    * pairs expand group-locally (sorted set ⇒ src_a < src_b for free)
    * into a |sources|²-keyed count. No shingle-keyed join remains, and
    * the one wide exchange carries each distinct (shingle, source-set)
    * row exactly once. The corpus-level twin of d02's per-doc near-dup
    * search.
    */
  val d41_source_overlap: Q = (s, dir) => {
    val t = Tables(s, dir)
    val grouped = graft.operators.Ops.spread(t.documents, col("doc_id"))
      .select(col("source"), TextAnalysis.tokens(col("text")).as("t"))
      // fused 3-gram hashes (ShingleHash60Expr); <3-token docs yield an
      // empty array which explode drops, same as the old when-guard
      .select(
        col("source"),
        explode(graft.functions.ShingleExpressions.shingleHashes(col("t"), 3)).as("s"))
      .groupBy(col("s"))
      .agg(array_sort(collect_set(col("source"))).as("ds"))
      .transform(graft.Caches.persistOnce)
    val sizes = grouped
      .select(explode(col("ds")).as("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
    val inter = grouped
      .filter(size(col("ds")) >= 2)
      // two-level explode (see Dedup.pairsWithinGroups): peak row size
      // stays O(|sources|)
      .select(posexplode(col("ds")).as(Seq("i", "src_a")), col("ds"))
      .select(
        col("src_a"),
        explode(slice(col("ds"), col("i") + 2, greatest(size(col("ds")), lit(1)))).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .select(
        col("src_a"),
        col("src_b"),
        col("n_shared"),
        (col("n_shared").cast("double") / (col("na") + col("nb") - col("n_shared"))).as("jac"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val queries: Map[String, Q] = Map(
    "e08_semdedup"          -> e08_semdedup,
    "d38_bpe_merge"         -> d38_bpe_merge,
    "q54_correlated_scalar" -> q54_correlated_scalar,
    "d39_prefix_dups"       -> d39_prefix_dups,
    "d40_winnowing"         -> d40_winnowing,
    "d41_source_overlap"    -> d41_source_overlap,
    "d42_adaptive_cutoff"   -> d42_adaptive_cutoff,
    "wp04_snapshot_asof"    -> wp04_snapshot_asof,
    "d43_collapse_repeats"  -> d43_collapse_repeats,
    "d34_dup_ngrams"       -> d34_dup_ngrams,
    "d35_global_shuffle"   -> d35_global_shuffle,
    "d37_temperature_mix"  -> d37_temperature_mix,
    "mm03_binary_header"   -> mm03_binary_header,
    "q53_keyset_pagination" -> q53_keyset_pagination,
  )

  val oracles: Map[String, String] = Map(
    "e08_semdedup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |             sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]), (x, y) -> x + y)) AS nrm
        |      FROM e),
        |kk AS (SELECT GREATEST(CAST(ceil(sqrt(COUNT(*))) AS BIGINT), CAST(ceil(COUNT(*) / 1000.0) AS BIGINT)) AS k FROM e),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n, kk WHERE vec_id < k),
        |asg AS (SELECT vec_id, v, c_id AS cell, rn FROM (
        |        SELECT n.vec_id, n.v, c.c_id,
        |               row_number() OVER (PARTITION BY n.vec_id
        |                 ORDER BY list_reduce(list_transform(list_zip(n.v, c.cv), s -> s[1] * s[2]), (x, y) -> x + y)
        |                          / (n.nrm * c.cn) DESC, c.c_id) AS rn
        |        FROM n CROSS JOIN c)
        |      WHERE rn <= 4),
        |b AS (SELECT vec_id, v, cell FROM asg WHERE rn = 1),
        |p AS (SELECT bb.vec_id AS drop_id
        |      FROM asg a JOIN asg bb ON a.cell = bb.cell AND a.vec_id < bb.vec_id
        |      WHERE list_reduce(list_transform(list_zip(a.v, bb.v), s -> s[1] * s[2]), (x, y) -> x + y)
        |            / (sqrt(list_reduce(list_transform(list_zip(a.v, a.v), s -> s[1] * s[2]), (x, y) -> x + y))
        |             * sqrt(list_reduce(list_transform(list_zip(bb.v, bb.v), s -> s[1] * s[2]), (x, y) -> x + y)))
        |            >= 0.4)
        |SELECT b.vec_id, b.cell, (d.drop_id IS NULL) AS is_kept
        |FROM b LEFT JOIN (SELECT DISTINCT drop_id FROM p) d ON b.vec_id = d.drop_id
        |ORDER BY vec_id""".stripMargin,
    "d38_bpe_merge" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |pairs AS (
        |  SELECT unnest(CASE WHEN len(w) >= 2
        |                THEN list_transform(generate_series(1, len(w) - 1),
        |                     i -> substr(w, CAST(i AS INT), 1) || substr(w, CAST(i AS INT) + 1, 1))
        |                ELSE [] END) AS pair
        |  FROM toks),
        |cnt AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair)
        |SELECT pair, CAST(n AS BIGINT) AS n,
        |       CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
        |FROM cnt QUALIFY rank <= 20 ORDER BY rank""".stripMargin,
    "q54_correlated_scalar" ->
      """SELECT o.o_orderkey, o.o_totalprice,
        |       (SELECT MAX(l.l_shipdate) FROM lineitem l
        |        WHERE l.l_orderkey = o.o_orderkey) AS last_ship
        |FROM orders o WHERE o.o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,
    "d42_adaptive_cutoff" ->
      """WITH tc AS (SELECT lang,
        |                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0)) AS BIGINT) AS n_tok
        |            FROM documents),
        |th AS (SELECT lang, quantile_cont(n_tok, 0.25) AS p25 FROM tc GROUP BY lang)
        |SELECT tc.lang AS lang, ANY_VALUE(th.p25) AS p25, COUNT(*) AS n_total,
        |       CAST(COUNT(CASE WHEN tc.n_tok >= th.p25 THEN 1 END) AS BIGINT) AS n_kept
        |FROM tc JOIN th ON tc.lang = th.lang
        |GROUP BY tc.lang ORDER BY tc.lang""".stripMargin,
    "d39_prefix_dups" ->
      """WITH t AS (SELECT doc_id, text,
        |                  list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |           FROM documents),
        |k AS (SELECT doc_id, text, concat_ws(' ', toks[1], toks[2], toks[3]) AS key3
        |      FROM t WHERE len(toks) >= 3)
        |SELECT a.doc_id AS short_id, b.doc_id AS long_id,
        |       CAST(len(a.text) AS BIGINT) AS short_len, CAST(len(b.text) AS BIGINT) AS long_len
        |FROM k a JOIN k b ON a.key3 = b.key3 AND a.doc_id <> b.doc_id
        |WHERE len(a.text) <= len(b.text) AND strpos(b.text, a.text) = 1
        |  AND (len(a.text) < len(b.text) OR a.doc_id < b.doc_id)
        |ORDER BY short_id, long_id""".stripMargin,
    "d40_winnowing" ->
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |hs AS (SELECT doc_id,
        |              CASE WHEN len(t) >= 3
        |                THEN list_transform(generate_series(1, len(t) - 2),
        |                     i -> CAST('0x' || substr(md5(concat_ws(' ', t[i], t[i+1], t[i+2])), 1, 15) AS BIGINT))
        |                ELSE [] END AS h
        |       FROM toks)
        |SELECT doc_id, unnest(CASE WHEN len(h) >= 4
        |         THEN list_distinct(list_transform(generate_series(1, len(h) - 3),
        |              i -> list_min(h[i:i+3])))
        |         ELSE [] END) AS fp
        |FROM hs ORDER BY doc_id, fp""".stripMargin,
    "d41_source_overlap" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |sh AS (SELECT DISTINCT source, unnest(CASE WHEN len(t) >= 3
        |         THEN list_transform(generate_series(1, len(t) - 2),
        |              i -> CAST('0x' || substr(md5(concat_ws(' ', t[i], t[i+1], t[i+2])), 1, 15) AS BIGINT))
        |         ELSE [] END) AS s
        |       FROM toks),
        |sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        |          GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b, CAST(i.n_shared AS BIGINT) AS n_shared,
        |       CAST(i.n_shared AS DOUBLE) / (sa.n + sb.n - i.n_shared) AS jac
        |FROM inter i JOIN sizes sa ON sa.source = i.src_a
        |             JOIN sizes sb ON sb.source = i.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "d34_dup_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, n, unnest(CASE WHEN len(t) >= n
        |           THEN list_transform(generate_series(1, len(t) - n + 1),
        |                i -> concat_ws(' ', t[i], t[i+1], CASE WHEN n = 3 THEN t[i+2] ELSE NULL END))
        |           ELSE [] END) AS gram
        |  FROM toks CROSS JOIN (SELECT unnest([2,3]) AS n) nn),
        |cnt AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY 1,2,3),
        |agg AS (SELECT doc_id,
        |               SUM(CASE WHEN n=2 THEN c END) AS n2,
        |               SUM(CASE WHEN n=2 AND c>=2 THEN c ELSE 0 END) AS d2,
        |               SUM(CASE WHEN n=3 THEN c END) AS n3,
        |               SUM(CASE WHEN n=3 AND c>=2 THEN c ELSE 0 END) AS d3
        |        FROM cnt GROUP BY doc_id)
        |SELECT doc_id, CAST(n2 AS BIGINT) AS n2, CAST(d2 AS BIGINT) AS d2,
        |       CAST(n3 AS BIGINT) AS n3, CAST(d3 AS BIGINT) AS d3,
        |       CAST(d2 AS DOUBLE)/n2 AS frac2, CAST(d3 AS DOUBLE)/n3 AS frac3,
        |       (CAST(d2 AS DOUBLE)/n2 > 0.05 OR CAST(d3 AS DOUBLE)/n3 > 0.02) AS flagged
        |FROM agg WHERE n2 > 0 AND n3 > 0 ORDER BY doc_id""".stripMargin,
    "d35_global_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |                  CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) AS h
        |           FROM documents)
        |SELECT doc_id, h, h % 16 AS shard,
        |       CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,
    "d37_temperature_mix" ->
      """WITH s AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_docs,
        |             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS w FROM s),
        |tot AS (SELECT SUM(n_docs) AS n_total, SUM(w) AS sumw FROM w),
        |r AS (SELECT lang, n_docs,
        |             least(1048576, (CAST(1048576 AS HUGEINT) * w * (n_total // 2)) // (CAST(sumw AS HUGEINT) * n_docs)) AS rate_ppm
        |      FROM w CROSS JOIN tot),
        |k AS (SELECT d.lang AS klang, COUNT(*) AS n_sampled
        |      FROM documents d JOIN r ON d.lang = r.lang
        |      WHERE CAST('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15) AS BIGINT) % 1048576
        |              < r.rate_ppm
        |      GROUP BY d.lang)
        |SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs, CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
        |       CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled
        |FROM r LEFT JOIN k ON r.lang = k.klang ORDER BY lang""".stripMargin,
    "mm03_binary_header" ->
      """SELECT doc_id AS media_id,
        |       hex(encode(substr(text, 1, 4))) AS magic_hex,
        |       CAST('0x'||hex(encode(substr(text, 17, 4))) AS BIGINT) AS field_a,
        |       CAST('0x'||hex(encode(substr(text, 21, 4))) AS BIGINT) AS field_b
        |FROM documents WHERE octet_length(encode(text)) >= 24 ORDER BY media_id""".stripMargin,
    "q53_keyset_pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey > 500 ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "d43_collapse_repeats" ->
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |c AS (SELECT doc_id, t,
        |             list_filter(list_transform(generate_series(1, len(t)),
        |                         i -> CASE WHEN i = 1 OR t[i] <> t[i-1] THEN t[i] END),
        |                         x -> x IS NOT NULL) AS kept
        |      FROM toks)
        |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_orig, CAST(len(kept) AS BIGINT) AS n_kept,
        |       substr(array_to_string(kept, ' '), 1, 40) AS head40
        |FROM c WHERE len(t) > len(kept) ORDER BY doc_id""".stripMargin,
    "wp04_snapshot_asof" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders WHERE o_orderdate <= TIMESTAMP '1996-07-01')
        |WHERE rn = 1 AND o_orderstatus <> 'F'
        |ORDER BY o_custkey""".stripMargin,
  )
}
