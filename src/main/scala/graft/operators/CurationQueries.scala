package graft.operators

import graft.Tables
import graft.dedup.Dedup
import graft.functions.{Hashing, TextAnalysis}
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 batch 2 — curation / analytics operators:
  *
  *   - st08: FORWARD as-of join (next-event attribution — the mirror
  *     of st04's latest-prior semantics, same single-shuffle plan),
  *   - st09: windowed top-n per hour (heavy hitters over event-time
  *     windows — the batch twin of a streaming top-n dashboard),
  *   - q52: cohort retention matrix (first-touch cohort × day offset ×
  *     distinct users — the reference's usage-over-time reporting shape
  *     generalized),
  *   - d32: incremental cross-batch near-dedup with an oracle —
  *     `Dedup.crossNearDupPairs` (incoming × corpus candidates only)
  *     hash-checked end to end,
  *   - d33: weight-proportional sampling without replacement
  *     (Efraimidis–Spirakis), made INTEGER-EXACT: per-doc key = max of
  *     `w` per-replica hashes — the max of w iid uniforms orders
  *     identically to u^(1/w) in distribution, and comparisons are
  *     long comparisons, so engine and oracle agree bit-for-bit. The
  *     explode is O(total weight); for unbounded weights the float
  *     E-S form (pow(u, 1/w) keys) replaces it at the cost of
  *     cross-engine float determinism.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------- st08: forward as-of join ----------

  /** Every error event matched to the same user's EARLIEST subsequent
    * (or simultaneous) purchase — next-conversion-after-failure
    * attribution. Same one-shuffle union+first_value plan as st04,
    * mirrored; oracle is DuckDB's native forward ASOF (`<=`).
    */
  val st08_asof_forward: Q = (s, dir) => {
    val t  = Tables(s, dir)
    val ev = t.events.withColumn("tus", Ops.tsMicros(t.events))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("tus"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("tus").as("p_tus"), col("value"))
    Ops
      .asofJoin(errors, purchases, Seq("user_id"), "tus", "p_tus",
        tieCols = Seq("p_event_id"), direction = "forward")
      .select(
        col("left.event_id").as("event_id"),
        col("left.user_id").as("user_id"),
        col("left.tus").as("err_tus"),
        col("matched.p_event_id").as("purchase_event_id"),
        col("matched.p_tus").as("purchase_tus"),
        col("matched.value").as("purchase_value"))
      .orderBy(col("event_id"))
  }

  // ---------- st09: windowed top-n ----------

  /** Top-3 event types per 1-hour tumbling window by count (ties to the
    * lexicographically smaller type). The rank window partitions by the
    * hour over the ALREADY-AGGREGATED frame — one corpus-wide shuffle
    * (the windowed groupBy, map-side combined), then a per-hour sort of
    * at most |event types| rows.
    */
  val st09_windowed_topn: Q = (s, dir) => {
    val t = Tables(s, dir)
    val hourly = EventStreams
      .withEventTime(t.events)
      .groupBy(window(col("event_time"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("win")).orderBy(col("n").desc, col("event_type"))
    hourly
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("n"),
        col("rank"))
      .orderBy(col("hour"), col("rank"))
  }

  // ---------- q52: cohort retention ----------

  /** First-touch cohort retention: users bucketed by their first active
    * day, then distinct active users per (cohort day, day offset). Two
    * user-keyed aggregations and one user-keyed join — co-partitioned,
    * so the join adds no extra shuffle after the distinct; nothing is
    * ever collected.
    */
  val q52_cohort_retention: Q = (s, dir) => {
    val t = Tables(s, dir)
    val days = EventStreams
      .withEventTime(t.events)
      .select(col("user_id"), to_date(col("event_time")).as("d"))
      .distinct()
    val firstTouch = days.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    days
      .join(firstTouch, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")).cast("long"))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"), col("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  // ---------- d32: cross-batch near-dedup (oracle-checked) ----------

  /** Incremental near-dedup of an arriving batch (doc_id % 5 == 0)
    * against the existing corpus (the rest): MinHash(16)+LSH band
    * candidates restricted to incoming × corpus, exact-Jaccard
    * verified. The corpus band index never pairs with itself — the
    * daily-ingest shape whose cost scales with the batch, not the
    * corpus (Dedup.crossNearDupPairs).
    */
  val d32_cross_neardup: Q = (s, dir) => {
    val t        = Tables(s, dir)
    val corpus   = t.documents.filter(col("doc_id") % 5 =!= 0)
    val incoming = t.documents.filter(col("doc_id") % 5 === 0)
    Dedup
      .crossNearDupPairs(corpus, incoming, "doc_id", "text",
        shingleN = 3, k = 16, rowsPerBand = 2, threshold = 0.5)
      .orderBy(col("incoming_id"), col("corpus_id"))
  }

  // ---------- d33: weighted sample without replacement ----------

  /** Deterministic weight-proportional sample (top-25) with weight =
    * whitespace token count: per-doc key = MAX over j in 1..w of
    * hash60(doc_id ':' j), ranked descending. Distributionally
    * Efraimidis–Spirakis (max of w uniforms ~ u^(1/w)) with pure
    * integer comparisons. Plan: weight-linear explode, map-side-combined
    * MAX (shuffle carries one row per doc), then a distributed top-k
    * (TakeOrderedAndProject) — never a global sort.
    */
  val d33_weighted_sample: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops.spread(t.documents, col("doc_id"))
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("w"))
      .filter(col("w") > 0)
      .select(col("doc_id"), col("w"), explode(sequence(lit(1L), col("w"))).as("j"))
      .select(
        col("doc_id"),
        col("w"),
        Hashing.hash60(concat(col("doc_id").cast("string"), lit(":"), col("j").cast("string")))
          .as("hj"))
      .groupBy(col("doc_id"), col("w"))
      .agg(max(col("hj")).as("k"))
      .orderBy(col("k").desc, col("doc_id"))
      .limit(25)
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "st08_asof_forward"   -> st08_asof_forward,
    "st09_windowed_topn"  -> st09_windowed_topn,
    "q52_cohort_retention" -> q52_cohort_retention,
    "d32_cross_neardup"   -> d32_cross_neardup,
    "d33_weighted_sample" -> d33_weighted_sample,
  )

  val oracles: Map[String, String] = Map(
    "st08_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tus FROM events),
        |err AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'error'),
        |pur AS (SELECT event_id AS p_event_id, user_id, tus AS p_tus, value FROM e
        |        WHERE event_type = 'purchase')
        |SELECT err.event_id, err.user_id, err.tus AS err_tus,
        |       pur.p_event_id AS purchase_event_id,
        |       pur.p_tus AS purchase_tus,
        |       pur.value AS purchase_value
        |FROM err ASOF LEFT JOIN pur
        |  ON err.user_id = pur.user_id AND err.tus <= pur.p_tus
        |ORDER BY event_id""".stripMargin,
    "st09_windowed_topn" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS wh, event_type, COUNT(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT strftime(wh, '%Y-%m-%d %H') AS hour, event_type, n, rank FROM (
        |  SELECT wh, event_type, n,
        |         CAST(row_number() OVER (PARTITION BY wh ORDER BY n DESC, event_type) AS BIGINT) AS rank
        |  FROM h)
        |WHERE rank <= 3 ORDER BY hour, rank""".stripMargin,
    "q52_cohort_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS cohort_day FROM d GROUP BY user_id)
        |SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
        |       CAST(d.d - f.cohort_day AS BIGINT) AS day_offset,
        |       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "d32_cross_neardup" ->
      s"""WITH ${PipelineQueries.toksCte},
         |${PipelineQueries.shCte},
         |mh AS (SELECT doc_id, i,
         |              MIN(CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 15) AS BIGINT)) AS mh
         |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) hi
         |       GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |                 string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i) AS sig
         |          FROM mh GROUP BY doc_id, i // 2),
         |cand AS (SELECT DISTINCT a.doc_id AS incoming_id, b.doc_id AS corpus_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
         |         WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS incoming_id, b.doc_id AS corpus_id, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s
         |          WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
         |          GROUP BY 1, 2)
         |SELECT i.incoming_id, i.corpus_id,
         |       i.inter / (s1.n + s2.n - i.inter) AS jac
         |FROM inter i
         |JOIN sizes s1 ON s1.doc_id = i.incoming_id
         |JOIN sizes s2 ON s2.doc_id = i.corpus_id
         |WHERE i.inter / (s1.n + s2.n - i.inter) >= 0.5
         |  AND EXISTS (SELECT 1 FROM cand c
         |              WHERE c.incoming_id = i.incoming_id AND c.corpus_id = i.corpus_id)
         |ORDER BY incoming_id, corpus_id""".stripMargin,
    "d33_weighted_sample" ->
      """WITH t AS (SELECT doc_id,
        |                  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS w
        |           FROM documents),
        |j AS (SELECT doc_id, w, unnest(generate_series(1, w)) AS j FROM t WHERE w > 0),
        |k AS (SELECT doc_id, w,
        |             MAX(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT)) AS k
        |      FROM j GROUP BY doc_id, w)
        |SELECT doc_id, w, k FROM (
        |  SELECT doc_id, w, k, row_number() OVER (ORDER BY k DESC, doc_id) AS rn FROM k)
        |WHERE rn <= 25 ORDER BY doc_id""".stripMargin,
  )
}
