package graft.dedup

import graft.functions.{Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-corpus pipelines.
  *
  * Scale design: every method is a pure DataFrame transform whose only
  * wide stages are key-partitioned shuffles (shingle, band signature,
  * pair). Nothing collects to the driver, so the same plans run on a
  * 1000-executor cluster: candidate generation is always blocked
  * (inverted index or LSH band), never an n² cross join.
  */
object Dedup {

  /** Whitespace/case normalization applied before exact hashing. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Lossless early-exit floor for the bounded intersect merge
    * (sortedIntersectAtLeast). `ceil(x * t)` in IEEE double arithmetic
    * can overshoot the true integer bound by 1 when `x * t` rounds up
    * past an integer (t = 0.2, 0.4, 0.67, 0.8, 0.9, ... — verified
    * numerically), which would make the merge return -1 for pairs
    * sitting EXACTLY on the threshold. Subtracting 1 makes the floor
    * conservative at every threshold: a floor one too low only
    * completes a few extra merges, and the exact jac/cont filter
    * downstream restores tightness, so survivors stay bit-identical to
    * the unbounded merge at ANY threshold, not just FP-lucky ones.
    */
  private def earlyExitFloor(x: Column): Column = ceil(x) - 1

  /** Exact dedup by normalized-content hash: every row annotated with
    * its content hash, duplicate-group size, and the kept representative
    * (min id). Filter `is_kept` to materialize the deduplicated corpus.
    *
    * Skew note: group stats come from a narrow groupBy (map-side
    * partial aggregation) joined back on the hash, NOT from a window
    * over `content_hash` — duplicate-family size is exactly the skewed
    * quantity at corpus scale (one boilerplate page can have millions
    * of copies), and a hash-keyed window would sort every hot family
    * inside a single task. The join-back is equally keyed by the hash
    * but AQE skew-join can split a hot hash across tasks; a window
    * partition cannot be split.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Spread single-split corpora first: the normalize+md5 pass runs
    // BELOW the first exchange on both the row side and the stats
    // side, so on a one-split input every byte of text would otherwise
    // be regexp-normalized twice on one core. Derived hash(id) key,
    // not repartition(col(id)) — see shingleArrays.
    val spreadDocs =
      if (docs.rdd.getNumPartitions > 1) docs
      else docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions, hash(col(idCol)))
    // The hashed frame feeds BOTH the stats aggregation and the
    // annotate join, so normalize+md5 runs once per subtree. Measured
    // (round 7, sf0.1): the whole md5 pass is 0.07 s of d01's ~0.7 s —
    // the query's cost is the fixed two-exchange overhead of the
    // skew-safe shape, not the double hash. A persist() here was tried
    // and reverted: no bench gain at small SF, and at corpus scale
    // materializing every row+hash costs more than recomputing an
    // embarrassingly parallel hash below each exchange.
    val hashed = spreadDocs.withColumn("content_hash", md5(normalized(col(textCol))))
    val stats = hashed
      .select(col("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("keeper"))
    hashed
      .join(stats, Seq("content_hash"))
      .withColumn("is_kept", col(idCol) === col("keeper"))
      .select(docs.columns.map(col) ++
        Seq(col("content_hash"), col("group_size"), col("keeper"), col("is_kept")): _*)
  }

  /** Streaming incremental exact dedup: first-seen document per
    * normalized content hash survives, later arrivals drop. With
    * `boundedState` the per-hash state expires once the event-time
    * watermark passes (dropDuplicatesWithinWatermark) — the only form
    * that runs indefinitely at corpus-firehose scale; the unbounded
    * form is exact across the whole stream but its state grows with
    * distinct documents.
    */
  def streamingExactDedup(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermark: String = "1 hour",
      boundedState: Boolean = true): DataFrame = {
    // Same degenerate-input contract as the batch forms: null text is
    // dropped up front, so a null hash can neither occupy dedup state
    // nor pass as "first seen" on every micro-batch.
    val hashed = docs
      .filter(col(textCol).isNotNull)
      .withColumn("content_hash", md5(normalized(col(textCol))))
      .withWatermark(eventTimeCol, watermark)
    if (boundedState) hashed.dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }

  /** Streaming form of `incrementalExactDedup`: a document stream
    * deduplicated against a STATIC already-ingested corpus (stream-
    * static left-anti join on the content hash — stateless, the corpus
    * hash set is broadcast or shuffled once per micro-batch) and then
    * within the stream itself (watermark-bounded first-seen state).
    * The corpus frame should be the pre-distinct hash projection at
    * scale; this derives it defensively.
    */
  def streamingIncrementalDedup(
      stream: DataFrame,
      corpus: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame = {
    // Null-text rows are filtered on BOTH sides, matching the batch
    // twin `incrementalExactDedup` below: left_anti would otherwise
    // keep stream rows with a null hash (null never matches), so the
    // two APIs would disagree on degenerate input.
    val seen = corpus
      .filter(col(textCol).isNotNull)
      .withColumn("content_hash", md5(normalized(col(textCol))))
      .select(col("content_hash"))
      .distinct()
    stream
      .filter(col(textCol).isNotNull)
      .withColumn("content_hash", md5(normalized(col(textCol))))
      .withWatermark(eventTimeCol, watermark)
      .join(seen, Seq("content_hash"), "left_anti")
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** Incremental exact dedup: the incoming batch deduplicated against
    * an already-ingested corpus — content-hash anti-join against the
    * corpus's distinct hashes, then first-wins (min id) within the
    * batch. The daily-ingest shape at 100 TB: the corpus side reduces
    * to its distinct hash set (one narrow column, prunable to just the
    * hash index), and nothing ever re-reads corpus text.
    */
  def incrementalExactDedup(
      corpus: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // Null text is dropped on BOTH sides up front: a SQL `NOT IN`
    // oracle returns zero rows when any null hash exists on either
    // side, while left_anti would keep null-hash rows (null never
    // matches) — filtering makes the engine and a NOT-IN oracle agree
    // on degenerate input.
    val hashed = (df: DataFrame) =>
      df.filter(col(textCol).isNotNull).withColumn("content_hash", md5(normalized(col(textCol))))
    val seen  = hashed(corpus).select(col("content_hash")).distinct()
    val after = hashed(incoming).join(seen, Seq("content_hash"), "left_anti")
    // First-wins within the batch as ONE hash aggregation (min_by over
    // the whole row) — no content_hash window (hot-family skew, see
    // exactDedup) and no self-join back, so the incoming batch is
    // scanned once.
    val payload = after.columns.filterNot(_ == "content_hash")
    after
      .groupBy(col("content_hash"))
      .agg(min_by(struct(payload.map(col): _*), col(idCol)).as("r"))
      .select(payload.map(c => col(s"r.`$c`").as(c)) :+ col("content_hash"): _*)
      .select(after.columns.map(col): _*)
  }

  /** Cross-batch near-dup pairs: MinHash-LSH candidates restricted to
    * (incoming × corpus) — band signatures equi-join ACROSS the two
    * sides only, never within either, then exact-Jaccard verification.
    * How an incremental pipeline near-dedups an arriving batch against
    * an existing corpus without ever re-pairing the corpus with
    * itself; the corpus band index is computed once and reusable
    * (pre-partitioned by band signature) across batches.
    */
  def crossNearDupPairs(
      corpus: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    // each side's shingle-array frame feeds both its band index and the
    // verification join — persist them once (Spark-ML style caching of
    // the one narrow per-doc frame) or the whole sketch subtree
    // recomputes per consumer
    val cArrs = shingleArrays(corpus, idCol, textCol, shingleN).transform(graft.Caches.persistOnce)
    val iArrs = shingleArrays(incoming, idCol, textCol, shingleN).transform(graft.Caches.persistOnce)
    crossNearDupPairsFromArrays(cArrs, iArrs, idCol, k, rowsPerBand, threshold)
  }

  /** `crossNearDupPairs` over precomputed (ideally persisted)
    * `shingleArrays` frames — the reusable-index form: a long-lived
    * corpus band index amortizes across daily batches.
    */
  def crossNearDupPairsFromArrays(
      cArrs: DataFrame,
      iArrs: DataFrame,
      idCol: String,
      k: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame =
    crossNearDupPairsFromIndex(
      corpusBandIndex(cArrs, idCol, k, rowsPerBand), cArrs, iArrs, idCol, k, rowsPerBand, threshold)

  /** The corpus band index as a narrow writable frame (band, sig, id) —
    * the artifact a long-lived incremental pipeline PERSISTS once and
    * reuses every batch. Write it with
    * `Layout.bucketize(idx, table, path, Seq("band", "sig"), buckets)`:
    * the bucketed layout co-partitions the index by the band-join key,
    * so each arriving batch's candidate join shuffles ONLY the batch —
    * zero index-side exchange, proven by plan assert in LayoutSpec.
    */
  def corpusBandIndex(
      cArrs: DataFrame,
      idCol: String,
      k: Int = 16,
      rowsPerBand: Int = 2): DataFrame =
    rowMinhashBands(cArrs, idCol, k, rowsPerBand)
      .select(col("band"), col("sig"), col(idCol))

  /** `crossNearDupPairsFromArrays` against a PRECOMPUTED corpus band
    * index (typically `corpusBandIndex` persisted bucketed by
    * (band, sig)): candidates come from (incoming bands ⋈ index), so
    * neither the corpus text nor its signatures recompute per batch,
    * and with a bucketed index the join has no index-side shuffle.
    * `cArrs` supplies only the verification arrays (at scale: the
    * persisted shingle-array frame, bucketed by id).
    */
  def crossNearDupPairsFromIndex(
      bandIndex: DataFrame,
      cArrs: DataFrame,
      iArrs: DataFrame,
      idCol: String,
      k: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    // per-row fused signatures/bands (MinhashSigExpr) — value-identical
    // to lshBands∘minhashSignaturesAgg∘explodeShingles (spec-proven),
    // with no explode and no aggregation before the band join
    val cand = rowMinhashBands(iArrs, idCol, k, rowsPerBand)
      .select(col("band"), col("sig"), col(idCol).as("incoming_id"))
      .join(bandIndex.select(col("band"), col("sig"), col(idCol).as("corpus_id")), Seq("band", "sig"))
      .select(col("incoming_id"), col("corpus_id"))
      .distinct()
    cand
      .join(iArrs.select(col(idCol).as("incoming_id"), col("set").as("set1"), col("n").as("n1")), "incoming_id")
      .join(cArrs.select(col(idCol).as("corpus_id"), col("set").as("set2"), col("n").as("n2")), "corpus_id")
      // bounded merge (cf. verifyJaccard): -1 rows are provably below
      // the jaccard floor, survivors carry the exact count
      .withColumn(
        "inter",
        graft.functions.ShingleExpressions.sortedIntersectAtLeast(
          col("set1"), col("set2"),
          earlyExitFloor((col("n1") + col("n2")) * (threshold / (1.0 + threshold)))))
      .filter(col("inter") >= 0)
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("incoming_id"), col("corpus_id"), col("jac"))
  }

  /** Per-document distinct shingle ARRAY (sorted) + size — one narrow
    * row per doc. The exploded inverted index (`shingleSet`) and the
    * verification sets both derive from this without any shuffle, so a
    * pipeline that persists ONE thing persists this.
    *
    * Shingles are stored as their 60-bit content hash (`Hashing.hash60`,
    * md5-portable), not as strings: every downstream shuffle (inverted
    * index, candidate pairs, verification arrays) carries 8-byte longs
    * instead of ~60-byte n-gram strings, and set intersection compares
    * longs — measured ~2-3× on the whole near-dup family, and the only
    * sane representation at 100 TB. Oracles hash identically, so a
    * (astronomically unlikely, deterministic) collision affects both
    * engines the same way.
    */
  def shingleArrays(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // Spread single-split corpora BEFORE the per-shingle hashing (a
    // small corpus file arrives as one input split, and everything up
    // to the first shuffle would otherwise run on one core) — but
    // spread ROUND-ROBIN, never repartition(col(id)): a user-specified
    // hash partitioning on the id satisfies the verify joins'
    // distribution requirement, so EnsureRequirements inserts no
    // exchange there and AQE can neither skew-split nor coalesce a
    // REPARTITION_BY_COL shuffle. Spreading by hash(id) — a DERIVED
    // key, distinct from clustering(id) — leaves the join exchanges to
    // EnsureRequirements, which AQE CAN split when a hot candidate key
    // (one doc near-duplicating 10^5 others) lands on one reducer —
    // proven by ProfileR6Scale's skew audit. (Round-robin would also
    // work but pays a full-payload sortBeforeRepartition.)
    val spread =
      if (docs.rdd.getNumPartitions > 1) docs
      else docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions, hash(col(idCol)))
    spread
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("t")) // materialize once
      // fused build+hash+sort+distinct (ShingleHash60Expr): same values
      // as array_sort(array_distinct(transform(shingles, hash60))), one
      // pass, no per-shingle string allocation
      .select(col(idCol), graft.functions.ShingleExpressions.shingleHashSet(col("t"), n).as("set"))
      .withColumn("n", size(col("set")).cast("long"))
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * algorithm): hash every k-gram in POSITION order, take the min hash
    * of each sliding window of w consecutive k-gram hashes, emit each
    * doc's distinct window-mins as (id, fp) rows. Guarantee: two docs
    * sharing a run of >= k + w - 1 tokens share a fingerprint, at ~1/w
    * the index density of full shingling. Entirely per-row array
    * expressions (transform / slice / array_min) — narrow, no shuffle;
    * downstream joins/groups see an inverted index w× smaller than the
    * full shingle index.
    */
  def winnowFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4): DataFrame = {
    val empt = array().cast("array<bigint>")
    val hs = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("t"))
      // fused position-ordered k-gram hashes (< k tokens → empty array,
      // same as the composed when-guard)
      .select(col(idCol), graft.functions.ShingleExpressions.shingleHashes(col("t"), k).as("h"))
    hs.select(
      col(idCol),
      explode(
        when(
          size(col("h")) >= w,
          array_distinct(
            transform(sequence(lit(1), size(col("h")) - (w - 1)), i => array_min(slice(col("h"), i, lit(w))))))
          .otherwise(empt)).as("fp"))
  }

  /** Distinct word-n-gram shingle set, exploded to (id, shingle) rows —
    * the inverted-index representation all near-dup ops build on.
    * Documents with fewer than n tokens vanish (empty shingle set).
    */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    explodeShingles(shingleArrays(docs, idCol, textCol, n), idCol)

  /** Inverted index (id, s) rows from a `shingleArrays` frame — narrow
    * (explode only), no shuffle.
    */
  def explodeShingles(arrs: DataFrame, idCol: String): DataFrame =
    arrs.select(col(idCol), explode(col("set")).as("s"))

  /** Exact n-gram Jaccard near-dup pairs (id1 < id2, jac >= threshold)
    * from a `shingleArrays` frame.
    *
    * Scale path (PPJoin-style prefix filtering): a pair can reach
    * jaccard >= t only if the two sets share an element among each set's
    * first `n - ceil(t*n) + 1` shingles in a global canonical order.
    * Default order = the hash order the arrays are ALREADY sorted in,
    * so prefix extraction is a narrow slice/posexplode over the
    * persisted arrays — candidates cost one shuffle (the prefix-posting
    * groupBy) instead of the rarity variant's four. Hash order scatters
    * hot shingles uniformly through prefixes; on Zipf-skewed corpora
    * where a stop-shingle would blow up posting groups, use
    * `prefixCandidatesRarity`, which spends 3 extra shuffles (global
    * document frequencies + per-doc rarity window) to keep hot
    * shingles out of every prefix.
    */
  def jaccardPairs(arrs: DataFrame, idCol: String, threshold: Double): DataFrame =
    verifyJaccard(prefixCandidates(arrs, idCol, threshold), arrs, idCol, threshold)

  /** All unordered id pairs within each group of a grouped id-array
    * column `ds` (sorted): pairs are generated group-locally after ONE
    * shuffle of the index — no self-join, no second pass. Skew note: a
    * group of g members emits g·(g-1)/2 pairs inside one TASK (explode
    * pipelines within the partition that holds the group row); keys
    * with bounded fan-in (rarity prefixes, distinct-sketch band
    * buckets) tolerate that, but blocking keys a duplicate FAMILY can
    * saturate need `pairsWithinGroupsSalted`, which spreads one
    * group's quadratic emission across the cluster.
    */
  private def pairsWithinGroups(grouped: DataFrame): DataFrame =
    grouped
      .filter(size(col("ds")) >= 2)
      // two-level explode: anchor each member, then pair it with the
      // array tail after it — peak row size stays O(g) where the
      // single-row nested-transform form materialized the whole g²/2
      // pair array at once (OOM on hot blocking keys)
      .select(posexplode(col("ds")).as(Seq("i", "id1")), col("ds"))
      .select(col("id1"), explode(slice(col("ds"), col("i") + 2, greatest(size(col("ds")), lit(1)))).as("id2"))
      .distinct()

  /** Salted two-stage form of `pairsWithinGroups` — identical output
    * (DedupKnnSpec equality over random groups and chunk sizes), but a
    * hot group's g²/2 pair emission is DISTRIBUTED: the sorted member
    * array splits into ceil(g/chunk) consecutive chunks, every chunk
    * pair (i <= j) becomes one bounded task row (<= 2·chunk ids), and a
    * round-robin repartition spreads those task rows across the
    * cluster before the explodes run. A group with 1M members under
    * chunk=4096 yields ~30k independent tasks instead of one
    * multi-week task; a group within one chunk degenerates to the
    * original plan (single diagonal task). Chunks are consecutive
    * slices of the SORTED array, so cross-chunk pairs inherit
    * id1 < id2 for free and the output contract is unchanged.
    */
  def pairsWithinGroupsSalted(grouped: DataFrame, chunk: Int = 4096): DataFrame = {
    val width = grouped.sparkSession.sessionState.conf.numShufflePartitions
    val nc    = ceil(size(col("ds")).cast("double") / chunk).cast("int")
    val tasks = grouped
      .filter(size(col("ds")) >= 2)
      .select(
        col("ds"),
        explode(
          flatten(
            transform(
              sequence(lit(0), nc - 1),
              i => transform(sequence(i, nc - 1), j => struct(i.as("i"), j.as("j")))))).as("ij"))
      .select(
        slice(col("ds"), col("ij.i") * chunk + 1, lit(chunk)).as("ca"),
        slice(col("ds"), col("ij.j") * chunk + 1, lit(chunk)).as("cb"),
        (col("ij.i") === col("ij.j")).as("diag"))
      // round-robin: the whole point — one hot group's chunk-pair tasks
      // land on different executors (a keyless exchange, so AQE keeps
      // control of every later keyed shuffle and PlanCheck's pinned-
      // layout flag stays silent)
      .repartition(width)
    val diag = tasks
      .filter(col("diag"))
      .select(posexplode(col("ca")).as(Seq("i", "id1")), col("ca"))
      .select(col("id1"), explode(slice(col("ca"), col("i") + 2, greatest(size(col("ca")), lit(1)))).as("id2"))
    val cross = tasks
      .filter(!col("diag"))
      .select(explode(col("ca")).as("id1"), col("cb"))
      .select(col("id1"), explode(col("cb")).as("id2"))
    diag.unionByName(cross).distinct()
  }

  /** Prefix-filtered candidate pairs (complete for jaccard >= t) in the
    * arrays' own sorted-hash canonical order, with the PPJoin positional
    * refinement: a shared prefix shingle at ranks (r1, r2) can witness a
    * qualifying pair only if `1 + min(n1-r1, n2-r2)` reaches the
    * required overlap `alpha = ceil(t/(1+t) * (n1+n2))` — algebraically
    * `r1 <= n1-alpha+1 AND r2 <= n2-alpha+1`, which is already the
    * TIGHT per-pair prefix bound (the prefix lemma's exact form with
    * the pair's own alpha, not the worst-case-partner plen), so neither
    * PPJoin's shorter "index prefix" nor the accumulated multi-
    * occurrence bound can prune further per occurrence. The accumulated
    * per-pair form (collect all shared prefix ranks, bound overlap by
    * `m + min(suffix)` at the m-th) WAS implemented and measured
    * (tools/ProfileR10Ppjoin, round 10): it cuts candidates only 4.8%
    * (hash order scatters shared shingles — nearly all false-positive
    * pairs share exactly one prefix shingle) while replacing the slim
    * `.distinct()` with a collect_list aggregation that ran 2-5x slower
    * at the m80 rung — rejected; the verify-side bounded merge
    * (`sortedIntersectAtLeast`) is where the sub-threshold mass gets
    * cheap. A qualifying pair always survives via its first shared
    * prefix shingle in the common order, so the filter is lossless for
    * ANY fixed total order. Using the order the arrays are already
    * sorted in makes prefix extraction shuffle-free: slice + posexplode
    * off the persisted `shingleArrays` frame, then ONE shuffle (the
    * posting-list groupBy) produces candidates.
    */
  def prefixCandidates(arrs: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val prefix = arrs
      // +2 not +1: the lemma's ⌈n·t⌉ must be the bound the downstream
      // DOUBLE comparison (jac >= t) enforces, which FP rounding can put
      // 1 below ceil(fp product) — one extra prefix element guarantees
      // completeness at every threshold (cf. earlyExitFloor)
      .withColumn("plen", (col("n") - ceil(col("n") * threshold) + 2).cast("int"))
      .select(col(idCol), col("n"), posexplode(slice(col("set"), lit(1), col("plen"))).as(Seq("p", "s")))
      .select(col(idCol), col("s"), (col("p") + 1).as("rnk"), col("n"))
    val grouped = prefix
      .groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col(idCol).as("id"), col("rnk"), col("n")))).as("ds"))
    positionalFilter(grouped, threshold)
  }

  /** Shared tail of the PPJoin candidate generators: posting groups →
    * occurrence pairs → length + positional filters → distinct pairs.
    * `grouped` rows are (s, ds: array<struct<id, rnk, n>>) with ranks in
    * the family's canonical order; the bound only uses that both docs'
    * prefix ranks increase with one shared total order, so it holds for
    * the hash order AND the rarity order alike.
    */
  private def positionalFilter(grouped: DataFrame, threshold: Double): DataFrame = {
    val frac = threshold / (1.0 + threshold)
    grouped
      .filter(size(col("ds")) >= 2)
      // two-level explode (see pairsWithinGroups): peak row size O(g)
      .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
      .select(col("a"), explode(slice(col("ds"), col("i") + 2, greatest(size(col("ds")), lit(1)))).as("b"))
      // length filter: jac >= t forces min(n1,n2) >= t * max(n1,n2)
      // (inter <= min and inter >= t * union >= t * max) — the 0.5
      // slack (sub-integer, so it admits no extra integer sizes in
      // exact arithmetic) absorbs FP rounding of the product, keeping
      // the filter lossless under the downstream DOUBLE comparison
      .filter(least(col("a.n"), col("b.n")) >= greatest(col("a.n"), col("b.n")) * threshold - 0.5)
      // positional filter: remaining-suffix upper bound must reach the
      // required overlap ceil(t/(1+t) * (n1+n2)); -1 for the same
      // FP-conservatism as earlyExitFloor — verify restores tightness
      .filter(
        lit(1) + least(
          col("a.n") - col("a.rnk"),
          col("b.n") - col("b.rnk")) >= ceil((col("a.n") + col("b.n")) * frac) - 1)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Rarity-ordered PPJoin candidates: identical contract to
    * `prefixCandidates`, but the canonical order is (document frequency
    * asc, shingle) so hot shingles never sit in any prefix. Costs a
    * global df aggregation, a df join, and a per-doc ranking window on
    * the full inverted index — worth it exactly when the corpus has
    * stop-shingles hot enough to make a posting group's pair fan-out
    * (g·(g-1)/2) the bottleneck.
    */
  def prefixCandidatesRarity(arrs: DataFrame, idCol: String, threshold: Double): DataFrame = {
    // doc size n rides along the explode, so the single window computes
    // only the streaming-friendly row_number (no whole-partition frame)
    val sh    = arrs.select(col(idCol), col("n"), explode(col("set")).as("s"))
    val freq  = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDocRarity =
      Window.partitionBy(col(idCol)).orderBy(col("df"), col("s"))
    val prefix = sh
      .join(freq, "s")
      .withColumn("rnk", row_number().over(byDocRarity))
      // +2 for FP-conservatism — see prefixCandidates
      .withColumn("plen", col("n") - ceil(col("n") * threshold) + 2)
      .filter(col("rnk") <= col("plen"))
      .select(col(idCol), col("s"), col("rnk"), col("n"))
    val grouped = prefix
      .groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col(idCol).as("id"), col("rnk"), col("n")))).as("ds"))
    positionalFilter(grouped, threshold)
  }

  /** Containment near-dup pairs (id1 < id2, cont >= threshold) where
    * cont = |A ∩ B| / min(|A|, |B|) — catches subset/quotation
    * duplicates that Jaccard misses when one document embeds another.
    *
    * Prefix filtering adapted to containment: if overlap >= t·min(n_a,
    * n_b), the SMALLER set has at most ceil(t·n)-1 < overlap elements
    * outside its first `n - ceil(t·n) + 1` shingles in a fixed total
    * order, so some shared shingle sits in the smaller set's prefix.
    * Candidates are therefore prefix-postings ⋈ FULL postings (the
    * larger side may witness anywhere). The canonical order is the hash
    * order the arrays are already sorted in — ranks fall out of one
    * narrow posexplode (no global df pass, no ranking window); on
    * corpora with stop-shingles hot enough to dominate posting lists,
    * a rarity order (cf. prefixCandidatesRarity) bounds the prefix
    * side's fan-out at the price of those 3 extra shuffles.
    */
  def containmentPairs(arrs: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val ranked = arrs
      .select(col(idCol), col("n"), posexplode(col("set")).as(Seq("p", "s")))
      .select(col(idCol), col("s"), (col("p") + 1).as("rnk"), col("n"))
    val prefix = ranked
      // +2 for FP-conservatism — see prefixCandidates
      .filter(col("rnk") <= col("n") - ceil(col("n") * threshold) + 2)
      .select(col(idCol).as("pid"), col("s"), col("n").as("pn"))
    val cand = prefix
      .join(ranked.select(col(idCol).as("fid"), col("s"), col("n").as("fn")), "s")
      // completeness only needs the probe side to be the smaller set
      // (ties by id) — requiring it halves the candidate fan-out
      .filter(col("pn") < col("fn") || (col("pn") === col("fn") && col("pid") =!= col("fid")))
      .select(
        least(col("pid"), col("fid")).as("id1"),
        greatest(col("pid"), col("fid")).as("id2"))
      .distinct()
    cand
      .join(arrs.select(col(idCol).as("id1"), col("set").as("set1"), col("n").as("n1")), "id1")
      .join(arrs.select(col(idCol).as("id2"), col("set").as("set2"), col("n").as("n2")), "id2")
      // cont >= t ⟺ inter >= ceil(t * min(n1, n2)) — same early-exit
      // contract as verifyJaccard: -1 rows are provably sub-threshold,
      // survivors carry the exact count
      .withColumn(
        "inter",
        graft.functions.ShingleExpressions.sortedIntersectAtLeast(
          col("set1"), col("set2"), earlyExitFloor(least(col("n1"), col("n2")) * threshold)))
      .filter(col("inter") >= 0)
      .withColumn("cont", col("inter").cast("double") / least(col("n1"), col("n2")))
      .filter(col("cont") >= threshold)
      .select(col("id1"), col("id2"), col("cont"))
  }

  /** MinHash signatures as one array per doc (index-ordered) — the
    * sketch-join representation for signature-agreement estimation.
    * Direct aggregator output: the k minima accumulate in one buffer
    * per doc (no k× explode, no second re-group shuffle).
    */
  def minhashSignatureArrays(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    sh.select(col(idCol).cast("long"), col("s"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinHashAgg(k).toColumn.name("sig"))
      .toDF(idCol, "sig")
  }

  /** Exact-Jaccard verification of candidate pairs against the per-doc
    * shingle arrays (sorted, distinct): size(array_intersect) / union
    * size. Takes the `shingleArrays` frame directly — the sets already
    * exist, so no collect_list re-aggregation shuffle.
    */
  def verifyJaccard(cand: DataFrame, arrs: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val sets = arrs.select(col(idCol), col("set"), col("n"))
    val frac = threshold / (1.0 + threshold)
    cand
      .join(sets.select(col(idCol).as("id1"), col("set").as("set1"), col("n").as("n1")), "id1")
      .join(sets.select(col(idCol).as("id2"), col("set").as("set2"), col("n").as("n2")), "id2")
      // jac >= t ⟺ inter >= ceil(t/(1+t) * (n1+n2)); the bounded merge
      // aborts (-1) the moment a candidate provably can't reach that,
      // cutting sub-threshold merges — the overwhelming majority of
      // verify rows — to ~1/3 of the full two-pointer pass at t=0.5.
      // Survivors complete the merge, so output rows are bit-identical.
      .withColumn(
        "inter",
        graft.functions.ShingleExpressions.sortedIntersectAtLeast(
          col("set1"), col("set2"), earlyExitFloor((col("n1") + col("n2")) * frac)))
      .filter(col("inter") >= 0)
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id1"), col("id2"), col("jac"))
  }

  /** MinHash signatures: k independent hash-family members over the
    * shingle set, min per (doc, i). Composable-built-ins form: explodes
    * k× and min-reduces — one shuffle on (doc, i).
    */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int): DataFrame =
    sh.withColumn("i", explode(array((0 until k).map(lit): _*)))
      .withColumn("h", Hashing.hash60(concat(col("i").cast("string"), lit(":"), col("s").cast("string"))))
      .groupBy(col(idCol), col("i"))
      .agg(min(col("h")).as("mh"))

  /** Sketch-aggregator form of `minhashSignatures`: identical output,
    * but the k running minima live in ONE buffer per doc
    * (functions.MinHashAgg), so the shuffle carries docs, not
    * docs × k × shingles. Preferred at scale.
    */
  def minhashSignaturesAgg(sh: DataFrame, idCol: String, k: Int): DataFrame =
    minhashSignatureArrays(sh, idCol, k)
      .select(col(idCol), posexplode(col("sig")).as(Seq("i", "mh")))

  /** LSH banding: group signature rows into bands of `rowsPerBand`,
    * band key = ordered concat of the member min-hashes.
    */
  def lshBands(mh: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", floor(col("i") / rowsPerBand).cast("long"))
      .groupBy(col(idCol), col("band"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("i"), col("mh")))),
            x => x.getField("mh").cast("string")),
          "_").as("sig"))

  /** Stateless per-row MinHash signature + LSH bands straight off a
    * `shingleArrays` frame — value-identical to `minhashSignaturesAgg`
    * + `lshBands` (spec-checked), but computed with per-row array
    * expressions and NO aggregation. That makes it legal on unbounded
    * STREAMS (no output-mode/watermark constraints) and cheaper
    * whenever per-row array math beats a shuffle (the signature is a
    * pure function of the doc's own shingle set). Empty-set docs drop,
    * matching the aggregated form where they never produce sketch rows.
    */
  def rowMinhashBands(
      arrs: DataFrame,
      idCol: String,
      k: Int,
      rowsPerBand: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    // fused k-minima signature (MinhashSigExpr): one JVM pass per row
    // instead of k × |set| interpreted lambda hops; value-identical to
    // the composed form (spec-proven against the aggregated path)
    val sig = graft.functions.ShingleExpressions.minhashSignature(col("set"), k)
    bandsFromSigCol(
      arrs.filter(size(col("set")) > 0).withColumn("__sig_arr", sig),
      idCol, k, rowsPerBand, carryCols)
  }

  /** LSH band rows derived from an ALREADY-MATERIALIZED signature
    * column `__sig_arr` (array<long>, length k). Split out of
    * `rowMinhashBands` so callers that need the signature for more
    * than banding (e.g. the d16 signature-agreement estimate) can
    * persist ONE k-minima MD5 pass and derive bands from it, instead
    * of paying the 16-MD5s-per-shingle sketch twice.
    */
  def bandsFromSigCol(
      sigged: DataFrame,
      idCol: String,
      k: Int,
      rowsPerBand: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    val nBands = k / rowsPerBand
    sigged
      .select(
        (col(idCol) +: carryCols.map(col)) :+
          explode(
            transform(
              sequence(lit(0), lit(nBands - 1)),
              b =>
                struct(
                  b.cast("long").as("band"),
                  array_join(
                    transform(
                      slice(col("__sig_arr"), b * rowsPerBand + 1, lit(rowsPerBand)),
                      x => x.cast("string")),
                    "_").as("sig")))).as("bs"): _*)
      .select(
        (col(idCol) +: carryCols.map(col)) :+ col("bs.band").as("band") :+ col("bs.sig").as("sig"): _*)
  }

  /** Streaming near-dup matcher: arriving docs whose MinHash band
    * signature collides with a STATIC corpus band index, verified by
    * exact Jaccard against the corpus shingle arrays. Entirely
    * STATELESS per micro-batch — per-row sketching (`rowMinhashBands`)
    * + stream-static equi-joins — so it runs indefinitely with zero
    * state store; the corpus band index and array frame are computed
    * once (persist/pre-partition them) and reused every batch. A pair
    * colliding in multiple bands emits once per colliding band;
    * callers needing exactly-once pairs dedupe in `foreachBatch`
    * (keeping the streaming plan itself aggregation-free).
    */
  def streamingNearDupMatches(
      stream: DataFrame,
      corpusArrs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val sArrs = stream
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("t"))
      .select(col(idCol), graft.functions.ShingleExpressions.shingleHashSet(col("t"), shingleN).as("set"))
      .withColumn("n", size(col("set")).cast("long"))
    val cBands = rowMinhashBands(corpusArrs, idCol, k, rowsPerBand)
      .select(col("band"), col("sig"), col(idCol).as("corpus_id"))
    // the stream's shingle set rides THROUGH the band explode (carry
    // cols) — re-joining the stream against itself for verification
    // would turn this into a stream-stream join needing watermark state
    rowMinhashBands(sArrs, idCol, k, rowsPerBand, carryCols = Seq("set", "n"))
      .select(col(idCol).as("incoming_id"), col("set").as("set1"), col("n").as("n1"), col("band"), col("sig"))
      .join(cBands, Seq("band", "sig"))
      .join(
        corpusArrs.select(col(idCol).as("corpus_id"), col("set").as("set2"), col("n").as("n2")),
        "corpus_id")
      // bounded merge (cf. verifyJaccard): -1 rows are provably below
      // the jaccard floor, survivors carry the exact count
      .withColumn(
        "inter",
        graft.functions.ShingleExpressions.sortedIntersectAtLeast(
          col("set1"), col("set2"),
          earlyExitFloor((col("n1") + col("n2")) * (threshold / (1.0 + threshold)))))
      .filter(col("inter") >= 0)
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("incoming_id"), col("corpus_id"), col("jac"))
  }

  /** Candidate pairs = documents agreeing on at least one full band
    * (group-local pair generation per (band, sig) bucket). SALTED
    * expansion: band buckets are exactly the blocking key a duplicate
    * family saturates (identical documents agree on EVERY band, so one
    * boilerplate family of g copies makes 8 buckets of size g), hence
    * the chunked task spread rather than the plain group-local form.
    */
  def lshCandidates(bands: DataFrame, idCol: String): DataFrame =
    pairsWithinGroupsSalted(
      bands
        .groupBy(col("band"), col("sig"))
        .agg(array_sort(collect_list(col(idCol))).as("ds")))

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    * candidates → exact-Jaccard verification of candidates only.
    * Signatures + bands are the per-row fused path (`rowMinhashBands`,
    * MinhashSigExpr) — value-identical to the exploded/aggregated
    * forms (spec-proven), with no shuffle before candidate generation.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val arrs = shingleArrays(docs, idCol, textCol, shingleN)
    val cand = lshCandidates(rowMinhashBands(arrs, idCol, k, rowsPerBand), idCol)
    // exact-jaccard verification of the (small) candidate set only
    verifyJaccard(cand, arrs, idCol, threshold)
  }

  /** Embedding-cosine near-dup pairs (id1 < id2, cos >= threshold).
    * Exact all-pairs with per-row precomputed norms and the codegen'd
    * sequential dot product — the correctness baseline. Scale path: the
    * same verification applied to sign-LSH candidate buckets
    * (similarity.Knn.signCell blocks candidates to ~N²/2^bits), exactly
    * how minhashLshPairs relates to jaccardPairs.
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.similarity.Knn
    val e = emb.select(col(idCol).as("id"), Knn.asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(Knn.dot(col("v"), col("v"))))
    val a = e.select(col("id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = e.select(col("id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", Knn.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Cell-blocked embedding near-dup: candidates are pairs sharing a
    * coarse-quantizer cell, verified with the exact cosine. The scale
    * path for `embeddingNearDupPairs`: an equi-join on the cell key
    * instead of the all-pairs cross product, so the corpus can be
    * pre-partitioned by cell.
    *
    * The cell key is the TRAINED IVF assignment when `centroids` is
    * given (`Knn.assignCells` — ~√N centroids from iterating the
    * k-means step, so cell count, join parallelism and per-cell pair
    * cost all scale with the corpus); without a model it falls back to
    * the sign-bit cell of the first `bits` dimensions — 2^bits FIXED
    * blocks, demo-only (at 100 TB that caps shuffle parallelism at
    * 2^bits and bounds recall to same-cell pairs). Recall knobs:
    * more/fewer centroids, or probe neighbor cells
    * (Knn.multiProbeTopK) near cell boundaries.
    */
  def embeddingNearDupLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 3,
      centroids: Option[DataFrame] = None,
      probes: Int = 1): DataFrame = {
    import graft.similarity.Knn
    val raw = emb
      .select(col(idCol).as("id"), Knn.asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(Knn.dot(col("v"), col("v"))))
    val e = centroids match {
      case Some(c) if probes <= 1 => Knn.assignCells(raw, c, "id")
      case Some(c) =>
        raw.join(Knn.assignCellsMulti(raw, c, "id", probes).select(col("id"), col("cell")), Seq("id"))
      case None => raw.withColumn("cell", Knn.signCell(col("v"), bits))
    }
    val a = e.select(col("cell"), col("id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = e.select(col("cell"), col("id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
    val verified = a
      .join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      // verify IN the join projection: the cosine is map-side work on
      // the joined row, so duplicate candidates (a pair sharing up to
      // probes² cells) cost only redundant arithmetic — never a
      // shuffle. Deduping candidates BEFORE the verify would shuffle
      // every candidate with BOTH vector payloads attached, which the
      // 20× scale probe measured at ~15× the whole query's cost.
      .withColumn("cos", Knn.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
    // dedup AFTER: only matched pairs move, three slim columns, and
    // the duplicate copies carry bit-identical cos values
    if (probes > 1) verified.dropDuplicates("id1", "id2") else verified
  }

  /** Connected components over near-dup pairs: every document labeled
    * with its component's smallest id. Documents that appear in no pair
    * are absent (they are their own representative by definition).
    *
    * Hybrid execution, sized by the EDGE set — which after LSH/prefix
    * blocking is orders of magnitude smaller than the corpus (it holds
    * only verified near-dup pairs, and the sketch-level variants shrink
    * it further to distinct-hash pairs):
    *   - up to `driverEdgeLimit` edges (default 4M ≈ 64 MB of longs):
    *     collect to the driver and union-find in O(E α(E)) — one job,
    *     no iteration. The same cutoff a 1000-executor run wants: a
    *     driver round-trip beats 3-6 shuffle rounds whenever the graph
    *     fits, and a graph that small is the common case even at
    *     100 TB corpus scale.
    *   - above the limit: iterative min-label propagation, O(component
    *     diameter) rounds of one equi-join each (near-dup components
    *     are clique-ish, so 2-3 rounds typical), lineage cut per round
    *     with localCheckpoint so the plan stays bounded.
    */
  def dedupComponents(
      pairs: DataFrame,
      maxIter: Int = 10,
      driverEdgeLimit: Long = 4L * 1000 * 1000): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgePairs = pairs.select(col("id1").cast("long"), col("id2").cast("long"))
    // one probing job decides the path AND delivers the edges when
    // small: collect limit+1 rows — overflow means "go distributed"
    val es = edgePairs.limit((driverEdgeLimit + 1).toInt).as[(Long, Long)].collect()
    if (es.length <= driverEdgeLimit) {
      // union-find, union-by-min-root with path compression: the root
      // of every set is its minimum member, so find() IS the label
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
      return spark
        .createDataFrame(rows)
        .toDF("id", "component")
        .withColumn("is_representative", col("id") === col("component"))
    }
    val edges = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var iter      = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("nbr_min"))
      val updated = labels
        .join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(
          col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
          (col("nbr_min") < col("component")).as("changed"))
        .localCheckpoint(true)
      converged = updated.filter(col("changed")).isEmpty
      labels = updated.select(col("id"), col("component"))
      iter += 1
    }
    labels.withColumn("is_representative", col("id") === col("component"))
  }

  /** Materialize the near-dup-free corpus: drop every document that
    * belongs to a component but is not its representative.
    */
  def dropNearDuplicates(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = dedupComponents(pairs).filter(!col("is_representative")).select(col("id"))
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }

  /** SimHash near-dup pairs: documents whose 60-bit simhashes differ in
    * at most `maxDist` bits. Banded hamming-LSH blocking: split the 60
    * bits into `maxDist + 1` bands — a pair within distance d ≤ maxDist
    * has all d differing bits in at most d bands, so by pigeonhole some
    * band is IDENTICAL; candidates are generated group-locally per
    * (band index, band value) bucket and verified with the exact
    * popcount. Complete, and never compares documents that disagree on
    * every band — the hamming-space analogue of minhash-LSH banding.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    val h = simhash60(docs, idCol, textCol)
    // one narrow (simhash, ids) row per DISTINCT sketch, consumed four
    // times below (band join, within-group pairs, both cross joins) —
    // persist it or the per-token MD5 sketching recomputes per consumer
    val groups = h
      .groupBy(col("simhash"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .transform(graft.Caches.persistOnce)
    val hashPairs = simhashHashPairs(groups.select(col("simhash")), maxDist)
    // dist-0 doc pairs: all pairs within each identical-hash group
    val within = pairsWithinGroups(groups.select(col("ids").as("ds")))
      .withColumn("dist", lit(0L))
    // cross-hash doc pairs: every doc of h1 × every doc of h2
    val cross = hashPairs
      .join(groups.select(col("simhash").as("h1"), col("ids").as("ids1")), "h1")
      .join(groups.select(col("simhash").as("h2"), col("ids").as("ids2")), "h2")
      .select(explode(col("ids1")).as("a"), col("ids2"), col("dist"))
      .select(col("a"), explode(col("ids2")).as("bb"), col("dist"))
      .select(least(col("a"), col("bb")).as("id1"), greatest(col("a"), col("bb")).as("id2"), col("dist"))
    within.unionByName(cross)
  }

  /** Banded hamming-LSH over DISTINCT simhash values: pairs of hashes
    * (h1 < h2) within `maxDist`. Running the band join on distinct
    * sketches — not documents — is what survives low-entropy corpora,
    * where thousands of documents legitimately share one sketch: the
    * band index scales with |distinct hashes| and identical-hash
    * groups never enter it at all.
    */
  def simhashHashPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    val bands     = maxDist + 1
    val bandWidth = 60 / bands
    val hb = hashes.withColumn("b", explode(array((0 until bands).map(lit): _*)))
      .withColumn("bv", expr(s"shiftright(simhash, b * $bandWidth) % ${1L << bandWidth}"))
    pairsWithinGroups(
      hb.groupBy(col("b"), col("bv"))
        .agg(array_sort(collect_list(col("simhash"))).as("ds")))
      .select(col("id1").as("h1"), col("id2").as("h2"))
      .withColumn("dist", bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .filter(col("dist") <= maxDist && col("dist") > 0)
  }

  /** Near-dup clustering by sketch, never enumerating within-group
    * pairs: connected components over the DISTINCT-hash graph
    * (edges = hash pairs within maxDist), then every document labeled
    * through its hash — the 100 TB form of simhash dedup, whose cost
    * scales with distinct sketches + cross-hash edges, not with the
    * (quadratic) duplicate-pair count.
    */
  def simhashClusters(docs: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val h     = simhash60(docs, idCol, textCol)
    val edges = simhashHashPairs(h.select(col("simhash")).distinct(), maxDist)
      .select(col("h1").as("id1"), col("h2").as("id2"))
    val comp = dedupComponents(edges)
      .select(col("id").as("simhash"), col("component").as("hash_component"))
    h.join(comp, Seq("simhash"), "left")
      .withColumn("cluster", coalesce(col("hash_component"), col("simhash")))
      .select(col(idCol), col("simhash"), col("cluster"))
  }

  /** 60-bit SimHash per document (token-frequency weighted). Bits 0-59
    * only, keeping the value positive in a signed 64-bit long on every
    * engine. Emits one row per document that has at least one token.
    *
    * Per-ROW native execution (functions.Simhash60Expr): the sketch is
    * a pure function of the document's own tokens, so it computes in
    * the row projection — no (doc, token) explode, no shuffle at all
    * (the earlier SimHashAgg aggregation shuffled one buffer per doc;
    * the 60×-bit-explode form before that was worse still). Distinct
    * tokens hash once, weighted by occurrence count — identical sums
    * in integer arithmetic, spec-proven against the aggregator and the
    * composed reference form.
    */
  def simhash60(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The per-row form needs no shuffle on already-parallel input; only
    // spread the rows when the source arrives as a single split (tiny
    // fixture parquet), otherwise a full-width repartition of the text
    // payload would contradict the shuffle-free design above. Spread
    // by hash(id), not repartition(col(id)) — a repartition keyed on
    // the id itself pins the partitioning and blinds AQE downstream
    // (see shingleArrays).
    val spread =
      if (docs.rdd.getNumPartitions > 1) docs
      else docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions, hash(col(idCol)))
    spread
      .select(
        col(idCol).cast("long").as(idCol),
        graft.functions.ShingleExpressions.simhash60(TextAnalysis.tokens(col(textCol))).as("simhash"))
      .filter(col("simhash").isNotNull)
  }

  /** Aggregator form of `simhash60` (functions.SimHashAgg — one
    * 60-counter buffer per doc): kept as the incremental/streaming
    * building block and as the equality twin the per-row expression is
    * spec-checked against.
    */
  def simhash60Agg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .repartition(col(idCol))
      .select(col(idCol).cast("long"), explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.SimHashAgg().toColumn.name("simhash"))
      .toDF(idCol, "simhash")
  }

  /** Composable-built-ins twin of `simhash60` (reference semantics):
    * explode tokens × 60 bit positions, sum ±1 per (doc, bit), fold
    * bits. Kept as the oracle-shaped form the aggregator must match.
    */
  def simhash60Composed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .repartition(col(idCol)) // parallelize the 60x bit explode (see shingleSet)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("w"))
    tok
      .withColumn("h", Hashing.hash60(col("w")))
      .withColumn("j", explode(array((0 until 60).map(lit): _*)))
      .withColumn("bit", expr("CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("bit")).as("s"))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
          .as("simhash"))
  }
}
