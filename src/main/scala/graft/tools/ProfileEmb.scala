package graft.tools

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vector-side scale probe: 50× the sf0.1 embeddings (100 k × 64-d
  * vectors), each copy jittered by a copy-specific deterministic offset
  * on one dimension so copies are near but not identical. Validates the
  * ANN/near-dup hierarchy at scale: the exact all-pairs baseline is
  * O(N²) and must NOT be the path; sign-LSH blocking and bucketed
  * search must stay near-linear.
  */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables(spark, "/root/testdata/sf0.1").embeddings
      .select(col("vec_id"), col("embedding"))
    val big = (0 until 50).map { i =>
      if (i == 0) base
      else base.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        // perturb dim 0 by a copy-specific factor: copies stay in the
        // same sign cells with overwhelming probability but aren't
        // bit-identical, so candidate sets stay realistic
        transform(col("embedding"), (x, j) =>
          when(j === 0, x * (lit(1.0f) + lit(i.toFloat / 1000f))).otherwise(x)).as("embedding"))
    }.reduce(_ unionByName _)
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profemb] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val stages = if (args.isEmpty) Set("all") else args.toSet
    def on(k: String) = stages("all") || stages(k)
    tm("count 100k vectors")(big.count())
    if (on("lsh")) tm("signLSH neardup b=8")(
      Dedup.embeddingNearDupLsh(big, "vec_id", "embedding", 0.995, bits = 8).count())
    if (on("bucketed")) tm("bucketedTopK 100q")(
      Knn.bucketedTopK(big.filter(col("vec_id") < 100), big, "vec_id", "embedding", 10, bits = 8).count())
    if (on("multiprobe")) tm("multiProbeTopK 100q")(
      Knn.multiProbeTopK(big.filter(col("vec_id") < 100), big, "vec_id", "embedding", 10, bits = 8).count())
    // exact all-pairs at 100k would be 5e9 pairs — the point of the
    // probe is that nothing above needed it
    spark.stop()
  }
}
