package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the given query names
  * (or every query) and flag scale anti-patterns — cartesian products
  * and nested-loop joins that aren't the intentional broadcast-few-
  * queries ANN scans.
  */
object PlanCheck {
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
      val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
        "SinglePartitionWindow" -> (plan.contains("Window [") && plan.contains("SinglePartition")),
      ).collect { case (f, true) => f }
      println(s"== $n${if (flags.nonEmpty) "  FLAGS: " + flags.mkString(",") else ""}")
      if (args.nonEmpty) println(plan)
    }
    spark.stop()
  }
}
