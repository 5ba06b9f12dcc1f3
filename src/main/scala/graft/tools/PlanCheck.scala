package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_COL, REPARTITION_BY_NUM, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, SinglePartition}

/** Dev tool: walk each query's physical plan tree and flag scale
  * anti-patterns structurally (string matching against explain output
  * misses formatted-mode operators):
  *
  *   - CartesianProduct / BroadcastNestedLoopJoin — quadratic unless
  *     one side is intentionally tiny (the broadcast-few-queries ANN
  *     scans and broadcast-centroid assigns are the allowed cases);
  *   - GlobalWindow — a window with an empty partitionSpec funnels
  *     every row through one task. Flagged as `GlobalWindow(small)`
  *     when it sits above an aggregation (bounded input: acceptable,
  *     e.g. d28's share-of-total over the grouped frame) and
  *     `GlobalWindow(RAW)` when it consumes unaggregated input (a real
  *     100 TB bottleneck);
  *   - SinglePartitionExchange — an explicit all-to-one shuffle that
  *     is not the bounded window/agg case above;
  *   - PinnedKeyedRepartition — an explicit `repartition(col(x))` on
  *     raw columns, which pre-satisfies downstream clustering(x) and
  *     so hides those exchanges from EnsureRequirements and AQE's
  *     skew-split (derive the key instead: `hash(col(x))`).
  *
  * Usage: runMain graft.tools.PlanCheck [queryName...] — with names,
  * also dumps the formatted plan.
  */
object PlanCheck {

  /** True if any node in `p`'s subtree is an aggregation or a limit —
    * a global window above one reads a bounded (grouped / truncated)
    * frame, not the corpus.
    */
  private def boundedBelow(p: SparkPlan): Boolean =
    p.exists(n => n.nodeName.contains("HashAggregate") || n.nodeName.contains("SortAggregate") ||
      n.nodeName.contains("ObjectHashAggregate") || n.nodeName.contains("Limit") ||
      n.nodeName.contains("TakeOrderedAndProject"))

  /** True if a KEYED window's per-partition input is bounded: either the
    * subtree below it aggregates/truncates first, or Spark inserted a
    * WindowGroupLimit (rank-limit pushdown caps rows per key before the
    * sort). A keyed window over raw rows whose partition key is
    * data-dependent (cluster ids, hash buckets) sorts every hot key in
    * one task — the d29-class skew pattern — so those are flagged and
    * must be explicitly allowlisted with a rationale for why the key's
    * per-partition cardinality stays bounded at scale.
    */
  private def keyedInputBounded(p: SparkPlan): Boolean =
    boundedBelow(p) || p.exists(_.isInstanceOf[WindowGroupLimitExec])

  def flagsOf(plan: SparkPlan): Seq[String] = {
    val nodes = plan.collect {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case n => n
    }.flatMap(_.collect { case n => n }).distinct
    val flags = scala.collection.mutable.ArrayBuffer.empty[String]
    if (nodes.exists(_.isInstanceOf[CartesianProductExec])) flags += "CartesianProduct"
    if (nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])) flags += "BroadcastNestedLoopJoin"
    nodes.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        flags += (if (boundedBelow(w.child)) "GlobalWindow(small)" else "GlobalWindow(RAW)")
      case w: WindowExec if !keyedInputBounded(w.child) =>
        flags += "KeyedWindow(RAW)"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        flags += (if (boundedBelow(w.child)) "GlobalWindowLimit(small)" else "GlobalWindowLimit(RAW)")
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        flags += (if (boundedBelow(e.child)) "SinglePartitionExchange(small)"
                  else "SinglePartitionExchange(RAW)")
      // An explicit repartition keyed on RAW columns pins the layout:
      // hashpartitioning(x) pre-satisfies any downstream join/agg
      // clustering on x, so EnsureRequirements inserts no exchange
      // there and AQE can neither skew-split nor coalesce it (user
      // shuffles are off-limits to AQE rewrites). Spread by a DERIVED
      // key instead — Ops.spread's hash(id) — which keeps every later
      // exchange under EnsureRequirements' (and AQE's) control.
      case e: ShuffleExchangeExec
          if e.shuffleOrigin == REPARTITION_BY_COL || e.shuffleOrigin == REPARTITION_BY_NUM =>
        e.outputPartitioning match {
          case h: HashPartitioning if h.expressions.forall(_.isInstanceOf[AttributeReference]) =>
            flags += "PinnedKeyedRepartition"
          case _ => ()
        }
      case _ => ()
    }
    flags.toSeq.distinct
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      val qe    = SparkEntry.queries(n)(spark, sfDir).queryExecution
      val flags = flagsOf(qe.executedPlan)
      println(s"== $n${if (flags.nonEmpty) "  FLAGS: " + flags.mkString(",") else ""}")
      if (args.nonEmpty)
        println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
