package graft.tools

import graft.retrieval.Postings
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Round-16 bucket-count migration ladder (VERDICT r15 #2's "done"
  * condition): prove `rebucketIndex` restores `compactBuckets`'
  * cost-tracks-touched-bytes property on a grown corpus.
  *
  * The seam: the bucket count freezes at build time, so one touched
  * bucket of an N-bucket index costs 1/N of the index FOREVER — a
  * corpus that outgrew its build-time count pays an ever-larger
  * marginal cost per bucket-local maintenance pass. The migration
  * divides per-bucket bytes by (new/old); the marginal cost of a
  * single-bucket rewrite should drop toward that ratio (floored by
  * fixed per-job overhead).
  *
  * Protocol, per rung (m20 / m80):
  *   - build the posting index UNDER-BUCKETED at 8 (simulating a
  *     corpus that grew past its build-time spec);
  *   - steady-state single-ish-bucket compaction cycles (the r15bkt
  *     protocol: 2-doc append with ~3 distinct rare terms → time
  *     `compactFragmentedBuckets` of exactly those buckets) → s/bucket
  *     BEFORE;
  *   - `rebucketIndex(name, 64)` (timed — one generation rewrite, the
  *     same order as a full compaction);
  *   - the same cycles again → s/bucket AFTER.
  * Claims: s/bucket drops by a factor approaching 8 (64/8) at the rung
  * where per-bucket bytes dominate fixed overhead (m80), and the
  * m20→m80 growth of the AFTER cell is flatter than BEFORE (the
  * migrated layout re-spreads corpus growth across 8× the buckets).
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR16Rebucket
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR16Rebucket {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    import spark.implicits._

    def name(m: Int) = s"r16rbk_m$m"
    val smallTerms = Seq("qqalpha", "qqbeta", "qqgamma")

    def batchDf(idBase: Long) =
      Seq(
        (idBase, smallTerms.mkString(" ")),
        (idBase + 1, smallTerms.reverse.mkString(" ")))
        .toDF("doc_id", "text")

    def cycle(m: Int, batchId: Long): (Int, Double) = {
      Postings.appendBatch(batchDf(9000000000L + batchId * 100), "doc_id", "text", name(m), batchId)
      val frag = Layout.fragmentedBucketIds(spark, s"${name(m)}_postings", 1)
      val t0 = System.nanoTime()
      val done = Postings.compactFragmentedBuckets(spark, name(m), maxFilesPerBucket = 1)
      val t = (System.nanoTime() - t0) / 1e9
      require(done.values.flatten.toSet == frag.toSet, s"policy compacted ${done.values.flatten} != $frag")
      (frag.size, t)
    }

    def measure(m: Int, label: String, batchId0: Long): (Double, Long) = {
      var batchId = batchId0
      batchId += 1; cycle(m, batchId) // discard: build/migration fragmentation
      val cells = (1 to reps).map { _ =>
        batchId += 1; val c = cycle(m, batchId)
        println(f"[r16rbk] m=$m%-3d $label cycle k=${c._1}%2d t=${c._2}%7.3fs"); c
      }
      (cells.map(c => c._2 / c._1).min, batchId)
    }

    for (m <- Seq(20, 80)) {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.writeIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r16rbk_m$m", buckets = 8)
      val bytes8 = Layout.parquetBytes(spark, s"${name(m)}_postings")
      val (perBucketPre, bid1) = measure(m, "pre@8  ", 1L)
      val t0 = System.nanoTime()
      Postings.rebucketIndex(spark, name(m), newBuckets = 64)
      val tMig = (System.nanoTime() - t0) / 1e9
      val (perBucketPost, _) = measure(m, "post@64", bid1)
      println(
        f"[r16rbk] m=$m%-3d index=${bytes8 / (1 << 20)}%4d MiB  s/bucket pre(8)=$perBucketPre%7.3f " +
          f"post(64)=$perBucketPost%7.3f  drop=${perBucketPre / perBucketPost}%5.2fx (ideal 8.00x)  " +
          f"migration t=$tMig%7.3fs")
      Postings.dropIndex(spark, name(m))
    }
    spark.stop()
  }
}
