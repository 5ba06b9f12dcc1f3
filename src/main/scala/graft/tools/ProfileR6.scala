package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for round 6: the minhash/simhash sketch family
  * before/after fusing the remaining composable call sites (not part
  * of the API).
  */
object ProfileR6 {
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
      // pass 1 warms the JIT + page cache, pass 2 is the number
      var n  = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); n = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-22s ${ts.min}%8.2fs  (${ts.map(x => f"$x%.2f").mkString(" ")})  rows=$n")
      spark.sharedState.cacheManager.clearCache()
    }
    locally { // build-time cost of the spread parallelism probe
      val t0 = System.nanoTime()
      val p  = graft.Tables(spark, dir).documents.rdd.getNumPartitions
      println(f"[prof] rdd.getNumPartitions   ${(System.nanoTime() - t0) / 1e9}%8.2fs  parts=$p")
    }
    tm("d11-as-wired")(graft.operators.PipelineQueries.d11_top_terms(spark, dir).count())
    tm("d01-as-wired")(graft.operators.PipelineQueries.d01_dedup_exact(spark, dir).count())
    tm("d03-as-wired")(graft.operators.PipelineQueries.d03_minhash_lsh(spark, dir).count())
    tm("d16-as-wired")(graft.operators.ExtendedQueries.d16_minhash_est(spark, dir).count())
    tm("d18-as-wired")(graft.operators.ExtendedQueries.d18_simhash_pairs(spark, dir).count())
    tm("d25-as-wired")(graft.operators.ExtendedQueries.d25_corpus_pipeline(spark, dir).count())
    // substeps
    val t = graft.Tables(spark, dir)
    import org.apache.spark.sql.functions._
    tm("docs-scan")(t.documents.select(col("doc_id"), col("text")).count())
    tm("tokens-only")(t.documents.select(graft.functions.TextAnalysis.tokens(col("text")).as("t")).select(size(col("t")).as("n")).agg(sum("n")).count())
    tm("shingleArrays")(graft.dedup.Dedup.shingleArrays(t.documents, "doc_id", "text", 3).count())
    tm("simhash60")(graft.dedup.Dedup.simhash60(t.documents, "doc_id", "text").count())
    val arrs = graft.dedup.Dedup.shingleArrays(t.documents, "doc_id", "text", 3).persist()
    arrs.count()
    tm("rowMinhashBands")(graft.dedup.Dedup.rowMinhashBands(arrs, "doc_id", 16, 2).count())
    tm("lshCandidates")(graft.dedup.Dedup.lshCandidates(graft.dedup.Dedup.rowMinhashBands(arrs, "doc_id", 16, 2), "doc_id").count())
    tm("verify-from-arrs")(graft.dedup.Dedup.verifyJaccard(graft.dedup.Dedup.lshCandidates(graft.dedup.Dedup.rowMinhashBands(arrs, "doc_id", 16, 2), "doc_id"), arrs, "doc_id", 0.5).count())
    println("[prof] docs partitions = " + t.documents.rdd.getNumPartitions)
    val bands = graft.dedup.Dedup.rowMinhashBands(arrs, "doc_id", 16, 2).persist()
    bands.count()
    tm("cand-from-bands")(graft.dedup.Dedup.lshCandidates(bands, "doc_id").count())
    val grouped = bands.groupBy(col("band"), col("sig")).agg(array_sort(collect_list(col("doc_id"))).as("ds")).persist()
    tm("bands-groupBy")(grouped.count())
    tm("pairs-distinct")(grouped.filter(size(col("ds")) >= 2)
      .select(posexplode(col("ds")).as(Seq("i", "id1")), col("ds"))
      .select(col("id1"), explode(slice(col("ds"), col("i") + 2, greatest(size(col("ds")), lit(1)))).as("id2"))
      .distinct().count())
    spark.stop()
  }
}
