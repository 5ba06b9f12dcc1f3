package graft.tools

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: simhash band-bucket size distribution and candidate
  * volume at the 20x corpus (hot-bucket pathology analysis).
  */
object SimDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables(spark, "/root/testdata/sf0.1").documents.select(col("doc_id"), col("text"))
    val big = (0 until 20).map { i =>
      if (i == 0) base
      else base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(
          substring(col("text"), lit(1), (length(col("text")) / 2).cast("int")),
          lit(s" u${i}v "),
          regexp_replace(
            substring(col("text"), (length(col("text")) / 2).cast("int") + 1, lit(1000000)),
            " ", s" u${i}v ")).as("text"))
    }.reduce(_ unionByName _)
    val h = Dedup.simhash60(big, "doc_id", "text").persist()
    println("[diag] docs=" + h.count())
    println("[diag] distinct simhash=" + h.select("simhash").distinct().count())
    val hb = h.withColumn("b", explode(array((0 until 4).map(lit): _*)))
      .withColumn("bv", expr("shiftright(simhash, b * 15) % 32768"))
    val sizes = hb.groupBy("b", "bv").agg(count(lit(1)).as("n"))
    sizes.select(
      max("n").as("max_bucket"),
      expr("percentile(n, 0.99)").as("p99"),
      expr("sum(n * (n - 1) / 2)").as("naive_pairs")).show(false)
    // refined: sub-band the rest bits for buckets > 2048
    val sized = hb.join(sizes, Seq("b", "bv"))
    val hot = sized.filter(col("n") > 2048)
      .withColumn("rest", expr("(simhash % shiftleft(CAST(1 AS BIGINT), b * 15)) + shiftleft(shiftright(simhash, (b + 1) * 15), b * 15)"))
      .withColumn("sb", explode(array((0 until 4).map(lit): _*)))
      .withColumn("sbv", expr("shiftright(rest, sb * 12) % 4096"))
    hot.groupBy("b", "bv", "sb", "sbv").agg(count(lit(1)).as("m"))
      .select(
        max("m").as("max_subbucket"),
        expr("sum(m * (m - 1) / 2)").as("refined_pairs")).show(false)
    spark.stop()
  }
}
