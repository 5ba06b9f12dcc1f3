package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Determinism and partitioning-invariance: the engine's correctness
  * story at cluster scale rests on results NOT depending on physical
  * execution — partition counts, task interleaving, retries. These
  * specs pin that: representative queries (decimal money aggregation,
  * window ranking, near-dup pairs, hash sampling) produce identical
  * row multisets under different shuffle partitioning and across
  * repeated runs.
  */
class InvarianceSpec extends SparkTestBase {

  /** Canonical fingerprint of a result: sorted rows as strings. */
  private def fingerprint(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val names = Seq(
    "q14_sum_coalesce",   // decimal-exact money sums
    "q22_latest_per_key", // window ranking
    "q37_percentiles",    // exact percentiles
    "d02_ngram_jaccard",  // near-dup pipeline (floats + joins)
    "d13_hash_sample",    // hash-deterministic sampling
    "q49_topk_group",     // bounded-buffer aggregator
    "d24_packing",        // running-sum window binning (order-sensitive)
    "d21_contamination",  // hash split + semi-join overlap
    "d37_temperature_mix", // integer-exact rates: no float-sum order sensitivity
    "d33_weighted_sample", // integer-exact E-S keys + distributed top-k
    "d40_winnowing",      // per-row array pipeline
    "d42_adaptive_cutoff", // exact percentile thresholds
    "e05_embed_neardup_lsh", // centroid blocking + multi-probe pair dedup
    "e09_incremental_embed_dedup", // literal-centroid probe + stream-static join
    "d45_bm25_search",    // integer-sourced double scoring (fixed-order term sum)
    "d46_hybrid_rrf",     // rank fusion: integer ranks must survive repartitioning
    "d49_phrase_search",  // positional index round trip + array-shift adjacency
    "d50_index_append",   // build+append must not depend on physical execution
    "d51_collocations",   // integer-product lift: one double division, no float sums
    "d52_proximity_search", // two-pointer kernels over map-collected position arrays
    "d53_prefix_search",  // dictionary resolution + alphabetical-rank score fold
    "d58_fuzzy_search",   // edit-distance resolution + alphabetical-rank score fold
    "d59_multiquery_search", // vectorized division across standing queries
    "d60_faceted_search", // pinned-width match set + forward decoration join
    "d61_multiquery_ranked", // per-query score folds + per-query window rank cut
    "d62_snippets",       // k-bounded fetch + array slicing (string output)
    "d63_search_after",   // double-valued cursor predicate must cut identically
  )

  for (name <- names) test(s"$name is identical at 2 vs 4 shuffle partitions and across runs") {
    val fn = SparkEntry.queries(name)
    // each run scoped: a repeat run must RECOMPUTE, not read the prior
    // run's cached subtrees (comparing a cache to itself proves nothing)
    val base  = Caches.scoped(spark)(fingerprint(fn(spark, sfDir)))
    val again = Caches.scoped(spark)(fingerprint(fn(spark, sfDir)))
    assert(base == again, s"$name not deterministic across runs")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val repartitioned = Caches.scoped(spark)(fingerprint(fn(spark, sfDir)))
      assert(base == repartitioned, s"$name changed under different shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("the width-policy confs are semantics-free: advisory size and initial width") {
    // The round-8 deployment dial (Graft.session's wide-start + AQE
    // coalesce policy, and the advisory-size override for
    // memory-amplifying operators) must be pure provisioning: results
    // bit-identical at any setting. Pin it on the two queries the dial
    // exists for — the densifier (st06) and the set-aggregation
    // buffer (q18) — plus a windowed retention query.
    val dialNames = Seq("st06_resample_ffill", "q18_agg_equality", "q52_cohort_retention")
    val advKey    = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val initKey   = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val prevAdv   = spark.conf.getOption(advKey)
    val prevInit  = spark.conf.getOption(initKey)
    def restore(k: String, v: Option[String]): Unit =
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    for (name <- dialNames) {
      val fn   = SparkEntry.queries(name)
      val base = Caches.scoped(spark)(fingerprint(fn(spark, sfDir)))
      try {
        spark.conf.set(advKey, "1m")
        spark.conf.set(initKey, "64")
        val dialed = Caches.scoped(spark)(fingerprint(fn(spark, sfDir)))
        assert(base == dialed, s"$name changed under the advisory/width dial")
      } finally { restore(advKey, prevAdv); restore(initKey, prevInit) }
      // the round-9 job-scoped dial, including the sub-1m path that
      // also lowers AQE's coalesce floor: still pure provisioning
      val viaApi = Graft.withAdvisory(spark, "4k") {
        Caches.scoped(spark)(fingerprint(fn(spark, sfDir)))
      }
      assert(viaApi == base, s"$name changed under Graft.withAdvisory(4k)")
      assert(
        spark.conf.getOption(advKey) == prevAdv &&
          spark.conf.getOption("spark.sql.adaptive.coalescePartitions.minPartitionSize").forall(
            _ != "4k"),
        s"withAdvisory did not restore confs after $name")
    }
  }

  test("Graft.session ships the shuffle-width policy (wide start + window-sort advisory)") {
    // SparkTestBase builds this session THROUGH Graft.session, so the
    // factory's round-8 defaults must be visible here: shuffles start
    // 32x wider than the base width (AQE coalesces down -> width
    // follows data) and the coalesce target is sized for window-sort
    // task memory, not the 64m scan-side default.
    val init = spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum").toInt
    val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
    assert(init == 32 * base, s"initialPartitionNum=$init, expected ${32 * base}")
    assert(spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") == "16m")
  }

  test("decimal money sum is partition-count invariant on a skewed frame") {
    import spark.implicits._
    val df = (1 to 10000).map(i => ("k", i / 100.0)).toDF("k", "v")
    def total(parts: Int): Double =
      df.repartition(parts)
        .groupBy(col("k"))
        .agg(operators.Ops.dsum(col("v")).as("s"))
        .select("s").as[Double].head()
    val t8 = total(8)
    assert(Seq(1, 3, 32).forall(p => total(p) == t8))
  }
}
