package graft

import graft.tools.PlanCheck

/** Plan-quality regression gate: every query's physical plan is swept
  * for scale anti-patterns (CartesianProduct, BroadcastNestedLoopJoin,
  * global windows / single-partition exchanges over RAW input) and
  * must stay inside the explicit allowlist of intentional cases. A new
  * operator that accidentally plans a cross join or funnels the corpus
  * through one task fails here before it ever reaches a benchmark.
  */
class PlanQualitySpec extends SparkTestBase {

  /** The intentional exceptions, each with its reason. */
  private val allowed: Map[String, Set[String]] = Map(
    // exact-ANN baselines / centroid assignment: broadcast-few-rows
    // cross joins by design (the scale paths are e02/e03/e05/e08)
    "e01_knn_brute"      -> Set("BroadcastNestedLoopJoin"),
    "e04_ann_ivf"        -> Set("BroadcastNestedLoopJoin"),
    "e05_embed_neardup_lsh" -> Set("BroadcastNestedLoopJoin"),
    "e06_ann_recall"     -> Set("BroadcastNestedLoopJoin"),
    "e07_kmeans_step"    -> Set("BroadcastNestedLoopJoin"),
    "e08_semdedup"       -> Set("BroadcastNestedLoopJoin"),
    "e09_incremental_embed_dedup" -> Set("BroadcastNestedLoopJoin"),
    "d09_embed_neardup"  -> Set("BroadcastNestedLoopJoin"),
    // one-row totals frames cross-joined back (broadcast)
    "d37_temperature_mix" -> Set("BroadcastNestedLoopJoin"),
    // bounded-input global windows: final ranking over already-
    // aggregated or already-truncated frames
    "d19_oov_ratio"      -> Set("GlobalWindow(small)"),
    "d28_mixture_report" -> Set("GlobalWindow(small)"),
    "d38_bpe_merge"      -> Set("GlobalWindow(small)"),
    "q21_pagination"     -> Set("GlobalWindow(small)", "GlobalWindowLimit(small)"),
  )

  test("no query plans a scale anti-pattern outside the allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val flags = PlanCheck.flagsOf(fn(spark, sfDir).queryExecution.executedPlan).toSet
      val extra = flags -- allowed.getOrElse(name, Set.empty)
      if (extra.nonEmpty) Some(s"$name: ${extra.mkString(",")}") else None
    }
    assert(offenders.isEmpty, s"unexpected plan anti-patterns:\n${offenders.mkString("\n")}")
  }
}
