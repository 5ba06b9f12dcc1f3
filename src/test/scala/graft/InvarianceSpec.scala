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
