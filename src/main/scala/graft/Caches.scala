package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Cache-lifetime discipline for long-lived sessions.
  *
  * Query builders persist narrow intermediate frames that feed several
  * consumers inside ONE query's plan (shingle arrays feeding the band
  * index and both verification joins, distinct-sketch groups feeding
  * the band join and the pair expansion). Those handles intentionally
  * outlive the builder, because the CALLER runs the consuming action —
  * a builder that unpersisted before returning would hand back a plan
  * whose shared subtrees recompute.
  *
  * `scoped` is the consuming side of that contract: build AND run the
  * query inside `body`; every block persisted during it is dropped on
  * the way out. A long-lived session (REPL, service loop, the
  * Verify/Bench mains) that wraps each query run this way never
  * accumulates cached blocks across queries — without it, leftover
  * blocks sit until LRU memory pressure evicts them, competing with
  * the NEXT query's shuffles for unified memory.
  */
object Caches {

  /** Run one query's build + consume, then drop every cached block the
    * session holds. Clearing the whole session cache (rather than
    * tracking individual handles) is deliberate: queries are
    * independent — each reads its tables fresh — so after a query's
    * action completes, ANY remaining cached block is a leak by
    * definition, including ones persisted deep inside library calls.
    */
  def scoped[A](spark: SparkSession)(body: => A): A =
    try body
    finally spark.catalog.clearCache()

  /** Persist with explicit ownership: the FIRST builder to cache a
    * given plan in the current scope owns it; later builders of the
    * same plan reuse the registered cache instead of re-registering it
    * (CacheManager would warn `Asked to cache already cached data` and
    * keep the original anyway — this makes the reuse deliberate).
    * `Dataset.storageLevel` consults CacheManager by normalized-plan
    * equality, which is exactly the condition under which `persist()`
    * would collide. Builders that persist shared subtrees (shingle
    * arrays, sketch groups, tf frames) route through here; `scoped`
    * remains the release side of the contract.
    */
  def persistOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df
}
