package graft

/** Cache-lifecycle contract: query builders may persist shared
  * subtrees (shingle arrays, sketch groups), and the CONSUMER releases
  * them by wrapping build + action in `Caches.scoped` — the pattern
  * Verify and Bench use per query. This spec runs every persist-using
  * query through that pattern and asserts the session holds zero
  * cached blocks afterwards, so a long-lived session can run the whole
  * inventory without accumulating cache.
  */
class CacheHygieneSpec extends SparkTestBase {

  // every query whose builder (or a library call inside it) persists:
  // shingle-array frames (d02/d03/d12/d15/d16/d25/d44), the cross-batch
  // corpus+incoming index (d32), the distinct-sketch groups (d18)
  private val persistingQueries = Seq(
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "d12_dedup_clusters",
    "d15_containment",
    "d16_minhash_est",
    "d18_simhash_pairs",
    "d25_corpus_pipeline",
    "d32_cross_neardup",
    "d44_jaccard_rarity")

  test("Caches.scoped leaves no cached blocks after each persisting query") {
    persistingQueries.foreach { name =>
      Caches.scoped(spark) {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        assert(n >= 0, s"$name did not run")
        // while the query is in scope its builder's persists ARE
        // registered (the contract being released below)
        assert(!spark.sharedState.cacheManager.isEmpty, s"$name persists nothing — drop it from this spec")
      }
      assert(
        spark.sharedState.cacheManager.isEmpty,
        s"$name leaked cached blocks past its Caches.scoped run")
    }
  }

  test("a non-persisting query keeps the cache empty without scoping") {
    SparkEntry.queries("d01_dedup_exact")(spark, sfDir).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
