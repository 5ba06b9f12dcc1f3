package graft.tools

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch profiler for d25's substeps (not part of the API). */
object ProfileD25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def tm(name: String)(f: => Long): Unit = {
      var n  = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); n = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-22s ${ts.min}%8.2fs  (${ts.map(x => f"$x%.2f").mkString(" ")})  rows=$n")
    }
    tm("d25-as-wired") {
      val r = graft.operators.ExtendedQueries.d25_corpus_pipeline(spark, dir).count()
      spark.sharedState.cacheManager.clearCache(); r
    }
    val t    = Tables(spark, dir)
    val ta   = graft.functions.TextAnalysis
    val base = t.documents.select(col("doc_id"), col("text"), col("source"), col("lang")).persist()
    base.count()
    tm("exactDedup+filters") {
      Dedup.exactDedup(base, "doc_id", "text")
        .filter(col("is_kept"))
        .filter(ta.tokenCount(col("text")) >= 10 && ta.punctRatio(col("text")) <= 0.1)
        .count()
    }
    val arrs = Dedup.shingleArrays(base, "doc_id", "text", 3).persist()
    tm("shingleArrays-persist")(arrs.count())
    tm("prefixCandidates")(Dedup.prefixCandidates(arrs, "doc_id", 0.5).count())
    tm("jaccardPairs")(Dedup.jaccardPairs(arrs, "doc_id", 0.5).count())
    tm("dedupComponents")(Dedup.dedupComponents(Dedup.jaccardPairs(arrs, "doc_id", 0.5)).count())
    tm("final-agg") {
      val kept = Dedup.exactDedup(base, "doc_id", "text")
        .filter(col("is_kept"))
        .filter(ta.tokenCount(col("text")) >= 10 && ta.punctRatio(col("text")) <= 0.1)
      val losers = Dedup
        .dedupComponents(Dedup.jaccardPairs(arrs, "doc_id", 0.5))
        .filter(!col("is_representative"))
        .select(col("id"))
      kept
        .join(losers, kept("doc_id") === losers("id"), "left_anti")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(ta.bpeTokenCount(col("text"))).as("total_bpe"))
        .count()
    }
    spark.stop()
  }
}
