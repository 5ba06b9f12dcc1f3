package graft.tools

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-SIZE scale probe: 20× the sf0.1 documents (100 k docs, ~5 M
  * shingles) with near-dup DENSITY held constant — each synthetic copy
  * keeps the first half of a base doc and rewrites the second half
  * into fresh vocabulary, so copy↔base and copy↔copy Jaccard ≈ 1/3
  * (below the 0.5 threshold) and the true-pair count stays ~1×. This
  * isolates how candidate generation scales with corpus size, the
  * question that matters at 100 TB (ProfileScale's clone probe instead
  * scales OUTPUT size).
  */
object Profile20x {
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
    val big = (0 until 20)
      .map { i =>
        if (i == 0) base
        else
          base.select(
            (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
            concat(
              substring(col("text"), lit(1), (length(col("text")) / 2).cast("int")),
              lit(s" u${i}v "),
              // interleave a per-copy marker token into every gap of the
              // second half: all its shingles become copy-unique, so
              // copy↔copy and copy↔base jaccard ≈ 0.2-0.25 < 0.5
              regexp_replace(
                substring(col("text"), (length(col("text")) / 2).cast("int") + 1, lit(1000000)),
                " ", s" u${i}v "))
              .as("text"))
      }
      .reduce(_ unionByName _)
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof20x] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val stages = if (args.isEmpty) Set("all") else args.toSet
    def on(k: String) = stages("all") || stages(k)
    val arrs = Dedup.shingleArrays(big, "doc_id", "text", 3).persist()
    tm("shingleArrays 100k docs")(arrs.count())
    if (on("lsh")) tm("minhashLSH pairs") {
      val sh = Dedup.explodeShingles(arrs, "doc_id")
      val cand = Dedup.lshCandidates(
        Dedup.lshBands(Dedup.minhashSignaturesAgg(sh, "doc_id", 16), "doc_id", 2), "doc_id")
      Dedup.verifyJaccard(cand, arrs, "doc_id", 0.5).count()
    }
    if (on("jaccard")) tm("exact jaccardPairs")(Dedup.jaccardPairs(arrs, "doc_id", 0.5).count())
    if (on("simhash")) tm("simhashPairs")(Dedup.simhashPairs(big, "doc_id", "text", 3).count())
    // the scale path: cluster labels WITHOUT enumerating within-group
    // pairs (simhashPairs' output is quadratic on low-entropy corpora)
    if (on("simhashClusters")) tm("simhashClusters")(Dedup.simhashClusters(big, "doc_id", "text", 3).count())
    if (on("exact")) tm("exactDedup")(Dedup.exactDedup(big, "doc_id", "text").count())
    spark.stop()
  }
}
