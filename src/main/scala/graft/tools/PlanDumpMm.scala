package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the executed plans of the multimodal decode/resize paths and
  * mm03 — the PLANS.md evidence that payload bytes never enter an
  * exchange (decode/resize: zero Exchange nodes; mm03: its single sort
  * exchange carries only narrow derived columns). Reads the fixture
  * dirs ProfileR8MmScale generates.
  *
  * Usage: runMain graft.tools.PlanDumpMm [mediaDir] [docsDir]
  */
object PlanDumpMm {
  def main(args: Array[String]): Unit = {
    val mediaDir = args.headOption.getOrElse("/tmp/graft_scale_mm/media_m1/media.parquet")
    val docsDir  = args.lift(1).getOrElse("/tmp/graft_scale_mm/docs_m1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val media = spark.read.parquet(mediaDir)
    println("=== decodeFeatures ===")
    println(graft.multimodal.Multimodal.decodeFeatures(media).queryExecution.executedPlan.toString)
    println("=== resizeMedia(2) ===")
    println(graft.multimodal.Multimodal.resizeMedia(media, 2).queryExecution.executedPlan.toString)
    println("=== mm03_binary_header ===")
    println(graft.operators.TrainingQueries.mm03_binary_header(spark, docsDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
