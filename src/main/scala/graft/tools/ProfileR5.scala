package graft.tools

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-5 centroid-blocked embedding path:
  * assignment, near-dup pair search (probes=4) and SemDeDup at 1×, 4×
  * and 20× the sf0.1 vector corpus (5k → 100k vectors), with the cell
  * count following the production rule k = max(⌈√N⌉, ⌈N/1000⌉).
  *
  * The claim under test: with mean cell width capped, pair-verify cost
  * grows ~linearly in N (the 8-cell sign blocking it replaced grew the
  * per-cell quadratic cost as N²). Assignment is the broadcast argmax —
  * linear in N·K — and is reported separately so the two effects are
  * visible.
  */
object ProfileR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb1 = Tables(spark, "/root/testdata/sf0.1").embeddings
    def scaled(times: Int) = (0 until times)
      .map(i => emb1.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    for ((tag, d) <- Seq("1x(5k)" -> emb1, "4x(20k)" -> scaled(4), "20x(100k)" -> scaled(20))) {
      val n = d.count().toDouble
      val k = math.max(math.ceil(math.sqrt(n)), math.ceil(n / 1000.0)).toLong
      val e = d.select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", Knn.norm(col("v")))
      val cents = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
        .persist()
      cents.count()
      println(s"[prof] $tag k=$k cells, mean width ${(n / k).round}")
      tm(s"$tag assignCells(argmax)")(Knn.assignCells(e, cents, "vec_id").count())
      tm(s"$tag nearDup probes=4")(
        Dedup.embeddingNearDupLsh(d, "vec_id", "embedding", 0.45,
          centroids = Some(cents), probes = 4).count())
      tm(s"$tag semDedup probes=4")(
        Knn.semDedup(d, "vec_id", "embedding", 0.4,
          centroids = Some(cents), probes = 4).count())
      // incremental shape (e09): 20% arriving batch vs 80% indexed corpus
      val corpus   = d.filter(col("vec_id") % 5 =!= 0)
      val incoming = d.filter(col("vec_id") % 5 === 0)
      val idx      = Knn.indexCorpus(corpus, cents, "vec_id", "embedding").persist()
      idx.count()
      val centSeq = cents.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
      tm(s"$tag incrementalMatch")(
        Knn.streamingEmbeddingMatches(incoming, idx, centSeq,
          "vec_id", "embedding", 0.4, probes = 4).count())
      idx.unpersist()
      cents.unpersist()
    }
    // NOTE on reading the nearDup numbers: the synthetic 20× corpus is
    // 20 verbatim copies of every vector, so the OUTPUT pair count (and
    // with it the verify cost) grows quadratically in the copy factor
    // by construction — real corpora don't; the per-candidate cost is
    // what the probe holds flat.
    spark.stop()
  }
}
