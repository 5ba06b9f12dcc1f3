package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected queries (plan review). */
object Explain {
  def main(args: Array[String]): Unit = {
    // Mirror Bench's session config (extensions included) so the
    // committed plan files describe what the bench actually runs.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q01_scan_filter_project", "q09_fk_chain", "q11_division", "q24_topk", "q28_json_extract")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
