package graft.tools

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-4 operators: winnowing fingerprints,
  * per-row MinHash banding, prefix-dup detection, source overlap and
  * SemDeDup at 1x and 20x the sf0.1 corpus (5k -> 100k docs; vectors
  * 5k -> 100k). Confirms the declared plan shapes hold away from the
  * graded SF: costs should scale ~linearly in docs (winnow, bands),
  * with the prefix-dup join bounded by key collisions and semDedup by
  * cell width.
  */
object ProfileR4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t     = Tables(spark, "/root/testdata/sf0.1")
    val docs1 = t.documents.select(col("doc_id"), col("text"), col("source"))
    val docs20 = (0 until 20)
      .map(i => docs1.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"),
        concat(col("source"), lit(s"_$i")).as("source")))
      .reduce(_ unionByName _)
    val emb1 = t.embeddings
    val emb20 = (0 until 20)
      .map(i => emb1.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    for ((tag, d) <- Seq("1x(5k)" -> docs1, "20x(100k)" -> docs20)) {
      tm(s"$tag winnowing")(Dedup.winnowFingerprints(d, "doc_id", "text").count())
      val arrs = Dedup.shingleArrays(d, "doc_id", "text", 3).persist()
      arrs.count()
      tm(s"$tag rowMinhashBands")(Dedup.rowMinhashBands(arrs, "doc_id", 16, 2).count())
      tm(s"$tag prefixDups") {
        // d39's shape on the scaled frame
        val k = d
          .select(col("doc_id"), col("text"),
            graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), col("text"),
            concat_ws(" ",
              element_at(col("toks"), 1), element_at(col("toks"), 2), element_at(col("toks"), 3)).as("key3"))
        val a = k.select(col("doc_id").as("short_id"), col("text").as("a_text"), col("key3"))
        val b = k.select(col("doc_id").as("long_id"), col("text").as("b_text"), col("key3"))
        a.join(b, "key3")
          .filter(col("short_id") =!= col("long_id"))
          .filter(length(col("a_text")) <= length(col("b_text")))
          .filter(col("b_text").startsWith(col("a_text")))
          .count()
      }
      arrs.unpersist()
    }
    for ((tag, e) <- Seq("1x(5k vec)" -> emb1, "20x(100k vec)" -> emb20)) {
      tm(s"$tag semDedup")(Knn.semDedup(e, "vec_id", "embedding", 0.4, bits = 3).count())
      tm(s"$tag semDedup-6bit")(Knn.semDedup(e, "vec_id", "embedding", 0.4, bits = 6).count())
    }
    spark.stop()
  }
}
