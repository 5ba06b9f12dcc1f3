package graft.tools

import graft.retrieval.Postings
import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 fsck DECADE extension (VERDICT r15 #5): the r15 m20→m80
  * cells read job-count-bound (e ≈ 0.04-0.11 over a 4× corpus) — the
  * asserted-but-unmeasured regime is "until the index outgrows the
  * page cache, then linear". This harness runs the same three-state
  * protocol one decade up (default rungs m80 → m800, 10×), so the
  * periodic-fsck advice in ARCHITECTURE's maintenance table carries a
  * measured exponent at the scale where per-row work must dominate
  * fixed job overhead.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR16Fsck [mLo mHi]
  * Requires /tmp/graft_scale/m{lo,hi} from ProfileR6Scale.
  */
object ProfileR16Fsck {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val Seq(mLo, mHi) =
      if (args.length >= 2) args.take(2).map(_.toInt).toSeq else Seq(80, 800)
    val logRatio = math.log(mHi.toDouble / mLo.toDouble)

    def name(m: Int) = s"r16fsck_m$m"
    def build(m: Int): Unit = {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.writeIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r16fsck_m$m",
        buckets = 32, metaCols = Seq("lang", "source"))
      Postings.writePositionalIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r16fsck_m$m", buckets = 32)
    }
    def runCheck(m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      Postings.checkIndex(spark, name(m)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def ladder(tag: String): Unit = {
      runCheck(mLo); runCheck(mHi) // warm
      val pairs = (1 to reps).map { rep =>
        val tLo = runCheck(mLo)
        val tHi = runCheck(mHi)
        println(f"[r16fsck] $tag checkIndex rep=$rep t$mLo=$tLo%7.3fs t$mHi=$tHi%7.3fs e=${math.log(tHi / tLo) / logRatio}%5.2f")
        (tLo, tHi)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / logRatio
      println(f"[r16fsck] $tag checkIndex MIN t$mLo=${pairs.map(_._1).min}%7.3fs t$mHi=${pairs.map(_._2).min}%7.3fs e(min-cells)=$e%5.2f")
    }

    Seq(mLo, mHi).foreach(build)
    ladder("HEALTHY  ")
    for (m <- Seq(mLo, mHi)) {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.deleteBatch(docs.filter(col("doc_id") % 10 < 3), "doc_id", "text", name(m), batchId = 1L)
    }
    ladder("TOMBED   ")
    Seq(mLo, mHi).foreach(m => Postings.compactIndex(spark, name(m)))
    ladder("COMPACTED")
    Seq(mLo, mHi).foreach(m => Postings.dropIndex(spark, name(m)))

    // IVF fsck at the same decade (corpus-scaled centroid model, the
    // r15 protocol: 8 centroids per 10M-id copy band)
    def cents(e: DataFrame, m: Int): DataFrame = {
      val copies = math.max(2, m / 10)
      e.filter(col("vec_id") % 10000000L < 8 && col("vec_id") < copies.toLong * 10000000L)
        .select(col("vec_id").as("c_id"), Knn.asDouble(col("embedding")).as("cv"))
        .withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))
    }
    def ivfName(m: Int) = s"r16fsckivf_m$m"
    for (m <- Seq(mLo, mHi)) {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      Knn.writeIvfIndex(
        e, cents(e, m), "vec_id", "embedding", ivfName(m), s"/tmp/graft_scale_idx/r16fsckivf_m$m", buckets = 32)
    }
    def runIvfCheck(m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      Knn.checkIvfIndex(spark, ivfName(m)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def ivfLadder(tag: String): Unit = {
      runIvfCheck(mLo); runIvfCheck(mHi)
      val pairs = (1 to reps).map { rep =>
        val tLo = runIvfCheck(mLo)
        val tHi = runIvfCheck(mHi)
        println(f"[r16fsck] $tag checkIvfIndex rep=$rep t$mLo=$tLo%7.3fs t$mHi=$tHi%7.3fs e=${math.log(tHi / tLo) / logRatio}%5.2f")
        (tLo, tHi)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / logRatio
      println(f"[r16fsck] $tag checkIvfIndex MIN t$mLo=${pairs.map(_._1).min}%7.3fs t$mHi=${pairs.map(_._2).min}%7.3fs e(min-cells)=$e%5.2f")
    }
    ivfLadder("HEALTHY  ")
    for (m <- Seq(mLo, mHi)) {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      Knn.deleteIvfBatch(
        e.filter(col("vec_id") % 10 < 3).select(col("vec_id")), "vec_id", ivfName(m), batchId = 1L)
    }
    ivfLadder("TOMBED   ")
    Seq(mLo, mHi).foreach(m => Knn.dropIvfIndex(spark, ivfName(m)))
    spark.stop()
  }
}
