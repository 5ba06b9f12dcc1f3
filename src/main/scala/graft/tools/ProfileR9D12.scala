package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Round-9 phase decomposition of d12_dedup_clusters (VERDICT r8 #1).
  *
  * The quiet-box (load <2 at launch) e@auto replicates for the whole
  * query straddle 1.0 — same-JVM calm replicate pairs give exponents
  * 0.92 / 1.02 / 1.05 — so rather than publish another whole-query
  * cell, this splits the operator into its three phases and measures
  * each phase's time AND mass on the ProfileR6Scale amplified corpora:
  *
  *   1. shingleArrays  (tokenize + hash; mass = docs, exactly m×)
  *   2. jaccardPairs   (PPJoin prefix-filter candidates + verify;
  *                      true pairs replicate exactly m× by amplifier
  *                      construction — isomorphic shingle sets)
  *   3. dedupComponents (edge collect + union-find / min-label;
  *                      output rows exactly m×)
  *
  * Every phase's mass is linear in m BY CONSTRUCTION, so linear time
  * is this operator's floor (a components query must at minimum emit
  * its linear output); the judgment is each phase's measured distance
  * from that floor, replacing the noise-straddled whole-query cell.
  */
object ProfileR9D12 {
  def main(args: Array[String]): Unit = {
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val ms    = if (args.isEmpty) Seq(20, 80) else args.map(_.toInt).toSeq
    ms.foreach { m =>
      val dir = s"/tmp/graft_scale/m$m"
      graft.Caches.scoped(spark) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
        }
        val arrs             = Dedup.shingleArrays(docs, "doc_id", "text", 3).persist()
        val (nArr, tShingle) = timed(arrs.count())
        val pairs            = Dedup.jaccardPairs(arrs, "doc_id", 0.5).persist()
        val (nPairs, tPairs) = timed(pairs.count())
        val (nComp, tComp)   = timed(Dedup.dedupComponents(pairs).queryExecution.toRdd.count())
        println(
          f"[d12phase] m=$m%-3d shingle=$tShingle%7.2fs arrs=$nArr pairs=$tPairs%7.2fs n_pairs=$nPairs comp=$tComp%7.2fs n_comp=$nComp")
        arrs.unpersist(); pairs.unpersist()
      }
    }
    spark.stop()
  }
}
