package graft.tools

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: near-dup pipeline at 1x and 5x sf0.1 doc counts. */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = Tables(spark, "/root/testdata/sf0.1").documents
    val docs5 = (0 until 5)
      .map(i => docs1.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    for ((tag, d) <- Seq("1x(5k docs)" -> docs1, "5x(25k docs)" -> docs5)) {
      val arrs = Dedup.shingleArrays(d, "doc_id", "text", 3).persist()
      tm(s"$tag shingles")(arrs.count())
      tm(s"$tag jaccardPairs")(Dedup.jaccardPairs(arrs, "doc_id", 0.5).count())
      tm(s"$tag minhashLSH") {
        val sh = Dedup.explodeShingles(arrs, "doc_id")
        val cand = Dedup.lshCandidates(
          Dedup.lshBands(Dedup.minhashSignaturesAgg(sh, "doc_id", 16), "doc_id", 2), "doc_id")
        Dedup.verifyJaccard(cand, arrs, "doc_id", 0.5).count()
      }
      tm(s"$tag containment")(Dedup.containmentPairs(arrs, "doc_id", 0.8).count())
      tm(s"$tag simhashPairs")(Dedup.simhashPairs(d, "doc_id", "text", 3).count())
      arrs.unpersist()
    }
    spark.stop()
  }
}
