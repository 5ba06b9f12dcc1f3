package graft.tools

import graft.retrieval.Postings
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Round-15 bucket-scoped compaction ladder (VERDICT r14 #1's "done"
  * condition): prove the maintenance cost of `compactFragmentedBuckets`
  * tracks the TOUCHED buckets, not the index.
  *
  * Protocol, per rung (m20 / m80, 32-bucket posting index):
  *   - SMALL: append a 2-doc batch whose ~3 distinct terms fragment
  *     ~3 buckets → time the bucket-scoped compaction of exactly those;
  *   - WIDE: append a batch with ~24 distinct terms (~20 buckets) →
  *     time again (cost should scale ~linearly with touched buckets);
  *   - FULL: time a full `compactIndex` (32 buckets + dict recount) —
  *     the r14 baseline this work displaces.
  * Claims: t_small ≪ t_full at every rung (the bucket-local trigger no
  * longer pays an index-sized rewrite), t_small/touched ≈ t_wide/touched
  * (per-bucket proportionality), and the SMALL cell's m20→m80 exponent
  * reflects per-bucket byte growth (buckets scale with the corpus), not
  * the bucket COUNT.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR15Buckets
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR15Buckets {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    import spark.implicits._

    def name(m: Int) = s"r15bkt_m$m"
    val smallTerms = Seq("qqalpha", "qqbeta", "qqgamma")
    val wideTerms  = (0 until 24).map(i => s"qqwide$i")

    def batchDf(terms: Seq[String], idBase: Long) =
      Seq(
        (idBase, terms.mkString(" ")),
        (idBase + 1, terms.reverse.mkString(" ")))
        .toDF("doc_id", "text")

    def build(m: Int): Unit = {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.writeIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r15bkt_m$m", buckets = 32)
    }

    // one measured cycle: append (outside the timer) -> time the
    // bucket-scoped compaction of exactly the fragmented buckets
    def cycle(m: Int, terms: Seq[String], batchId: Long): (Int, Double) = {
      Postings.appendBatch(batchDf(terms, 9000000000L + batchId * 100), "doc_id", "text", name(m), batchId)
      val frag = Layout.fragmentedBucketIds(spark, s"${name(m)}_postings", 1)
      val t0 = System.nanoTime()
      val done = Postings.compactFragmentedBuckets(spark, name(m), maxFilesPerBucket = 1)
      val t = (System.nanoTime() - t0) / 1e9
      require(done.values.flatten.toSet == frag.toSet, s"policy compacted ${done.values.flatten} != $frag")
      (frag.size, t)
    }

    Seq(20, 80).foreach(build)
    var batchId = 1L
    for (m <- Seq(20, 80)) {
      // cycle 0 is discarded: it compacts the BUILD's fragmentation
      // (one file per write task per bucket), not the append's — only
      // steady-state cycles measure the bucket-local maintenance cost
      batchId += 1; cycle(m, smallTerms, batchId)
      val small = (1 to reps).map { _ =>
        batchId += 1; val c = cycle(m, smallTerms, batchId)
        println(f"[r15bkt] m=$m%-3d small cycle k=${c._1}%2d t=${c._2}%7.3fs"); c
      }
      val wide = (1 to reps).map { _ =>
        batchId += 1; val c = cycle(m, wideTerms, batchId)
        println(f"[r15bkt] m=$m%-3d wide  cycle k=${c._1}%2d t=${c._2}%7.3fs"); c
      }
      val tS = small.map(_._2).min; val kS = small.map(_._1).max
      val tW = wide.map(_._2).min; val kW = wide.map(_._1).max
      // full compaction baseline (the index is clean again after the
      // cycles — append once more so the full pass has work to do)
      batchId += 1
      Postings.appendBatch(batchDf(smallTerms, 9000000000L + batchId * 100), "doc_id", "text", name(m), batchId)
      val t0 = System.nanoTime()
      Postings.compactIndex(spark, name(m))
      val tF = (System.nanoTime() - t0) / 1e9
      println(f"[r15bkt] m=$m%-3d small k=$kS%2d t=$tS%7.3fs (${tS / kS}%6.3f s/bucket)  wide k=$kW%2d t=$tW%7.3fs (${tW / kW}%6.3f s/bucket)  FULL 32 buckets+dict t=$tF%7.3fs  small/full=${tS / tF}%5.2f")
    }
    Seq(20, 80).foreach(m => Postings.dropIndex(spark, name(m)))
    spark.stop()
  }
}
