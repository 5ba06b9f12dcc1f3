package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the FINAL (post-AQE) executed plan of any SparkEntry query
  * against any table directory — the evidence generator behind plan
  * claims in ARCHITECTURE.md (e.g. "AQE broadcasts the shrinking semi
  * side at m=80"). Executes the plan first (`toRdd.count`) so
  * AdaptiveSparkPlan reports isFinalPlan=true with the re-optimized
  * join strategies, then prints it.
  *
  * Usage: runMain graft.tools.PlanDumpQ <queryName> <dir> [shuffle]
  */
object PlanDumpQ {
  def main(args: Array[String]): Unit = {
    val name    = args(0)
    val dir     = args(1)
    val shuffle = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val n  = df.queryExecution.toRdd.count()
    println(s"=== $name @ $dir (rows=$n, shuffle=$shuffle, final plan) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
