package graft.tools

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the near-dup pipeline (not part of the API). */
object ProfileD02 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t  = Tables(spark, "/root/testdata/sf0.1")
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val sh = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).persist()
    tm("shingleArrays")(sh.count())
    tm("d02-as-wired")(graft.operators.PipelineQueries.d02_ngram_jaccard(spark, "/root/testdata/sf0.1").count())
    tm("d03-as-wired")(graft.operators.PipelineQueries.d03_minhash_lsh(spark, "/root/testdata/sf0.1").count())
    tm("prefixCandidates")(Dedup.prefixCandidates(sh, "doc_id", 0.5).count())
    tm("verify-only")(Dedup.verifyJaccard(Dedup.prefixCandidates(sh, "doc_id", 0.5), sh, "doc_id", 0.5).count())
    spark.stop()
  }
}
