package graft.tools

import graft.retrieval.Postings
import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15 fsck cost ladder (VERDICT r14 #6): `checkIndex` /
  * `checkIvfIndex` are themselves full-index scans per invariant —
  * price the maintenance verifier like every other operation, so an
  * operator knows what a periodic fsck costs at 100 TB.
  *
  * Protocol: the paired m20→m80 rungs (4× corpus), each index checked
  * in three states — HEALTHY (fresh build), TOMBSTONED (30% of docs
  * deleted, pre-compaction: the worst state the tombstone-pressure
  * policy allows to persist), and COMPACTED. Expected shape: the fsck
  * is LINEAR in the index (e ≈ 1 — by design: it verifies cross-table
  * sums over everything), with the tombstoned state paying a constant
  * extra for the anti-joined live views; the number to record is the
  * per-rung wall cost so the maintenance cadence can be priced.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR15Fsck
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR15Fsck {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))

    def name(m: Int) = s"r15fsck_m$m"
    def build(m: Int): Unit = {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.writeIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r15fsck_m$m",
        buckets = 32, metaCols = Seq("lang", "source"))
      Postings.writePositionalIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r15fsck_m$m", buckets = 32)
    }

    def runCheck(m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      Postings.checkIndex(spark, name(m)).collect()
      (System.nanoTime() - t0) / 1e9
    }

    def ladder(tag: String): Unit = {
      runCheck(20); runCheck(80) // warm
      val pairs = (1 to reps).map { rep =>
        val t20 = runCheck(20)
        val t80 = runCheck(80)
        println(f"[r15fsck] $tag checkIndex rep=$rep t20=$t20%6.3fs t80=$t80%6.3fs e=${math.log(t80 / t20) / math.log(4.0)}%5.2f")
        (t20, t80)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
      println(f"[r15fsck] $tag checkIndex MIN t20=${pairs.map(_._1).min}%6.3fs t80=${pairs.map(_._2).min}%6.3fs e(min-cells)=$e%5.2f")
    }

    Seq(20, 80).foreach(build)
    ladder("HEALTHY  ")
    for (m <- Seq(20, 80)) {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.deleteBatch(docs.filter(col("doc_id") % 10 < 3), "doc_id", "text", name(m), batchId = 1L)
    }
    ladder("TOMBED   ")
    Seq(20, 80).foreach(m => Postings.compactIndex(spark, name(m)))
    ladder("COMPACTED")
    Seq(20, 80).foreach(m => Postings.dropIndex(spark, name(m)))

    // ---- IVF fsck under the same protocol (corpus-scaled model) ----
    def cents(e: DataFrame, m: Int): DataFrame = {
      val copies = if (m == 20) 2 else 8
      e.filter(col("vec_id") % 10000000L < 8 && col("vec_id") < copies * 10000000L)
        .select(col("vec_id").as("c_id"), Knn.asDouble(col("embedding")).as("cv"))
        .withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))
    }
    def ivfName(m: Int) = s"r15fsckivf_m$m"
    for (m <- Seq(20, 80)) {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      Knn.writeIvfIndex(
        e, cents(e, m), "vec_id", "embedding", ivfName(m), s"/tmp/graft_scale_idx/r15fsckivf_m$m", buckets = 32)
    }
    def runIvfCheck(m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      Knn.checkIvfIndex(spark, ivfName(m)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def ivfLadder(tag: String): Unit = {
      runIvfCheck(20); runIvfCheck(80)
      val pairs = (1 to reps).map { rep =>
        val t20 = runIvfCheck(20)
        val t80 = runIvfCheck(80)
        println(f"[r15fsck] $tag checkIvfIndex rep=$rep t20=$t20%6.3fs t80=$t80%6.3fs e=${math.log(t80 / t20) / math.log(4.0)}%5.2f")
        (t20, t80)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
      println(f"[r15fsck] $tag checkIvfIndex MIN t20=${pairs.map(_._1).min}%6.3fs t80=${pairs.map(_._2).min}%6.3fs e(min-cells)=$e%5.2f")
    }
    ivfLadder("HEALTHY  ")
    for (m <- Seq(20, 80)) {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      Knn.deleteIvfBatch(
        e.filter(col("vec_id") % 10 < 3).select(col("vec_id")), "vec_id", ivfName(m), batchId = 1L)
    }
    ivfLadder("TOMBED   ")
    Seq(20, 80).foreach(m => Knn.dropIvfIndex(spark, ivfName(m)))
    spark.stop()
  }
}
