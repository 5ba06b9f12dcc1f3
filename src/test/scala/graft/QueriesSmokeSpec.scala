package graft

/** Every declared query runs at sf0.001 and returns a sane result.
  * (DuckDB value equivalence is covered by Verify + tools/check.py —
  * this guards compile/runtime health of the whole inventory.)
  */
class QueriesSmokeSpec extends SparkTestBase {

  // queries whose correct result may legitimately be empty at sf0.001
  private val mayBeEmpty = Set("q08_anti_join", "d02_ngram_jaccard", "d03_minhash_lsh")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      // scoped like the Verify/Bench mains: builder persists are
      // released per query, so suites sharing the session never
      // collide on identical cached plans
      val n = Caches.scoped(spark)(fn(spark, sfDir).count())
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("short query ids are unique (Bench's compact tail line keys on them)") {
    // Bench's final stdout line — the one the driver's 2000-char tail
    // capture actually parses — keys its per-query map on the id prefix
    // before the first '_'. A collision would silently drop a timing.
    val ids = SparkEntry.queries.keySet.toSeq.map(_.takeWhile(_ != '_'))
    val dups = ids.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"colliding short query ids: $dups")
  }

  test("every query has an oracle (sketches exempt: no DuckDB-identical result exists)") {
    // approx sketches (HLL, t-digest-style quantiles) are engine-specific
    // by construction — the driver records a rows-only check for them
    val sketchOnly = Set(
      "x01_approx_distinct", "x02_approx_quantiles", "x03_sketch_union",
      // production-shape sketch variants (r11): same estimator plans
      // minus the exact-witness join — equally engine-specific
      "x01p_approx_distinct_prod", "x03p_sketch_union_prod")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- sketchOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
