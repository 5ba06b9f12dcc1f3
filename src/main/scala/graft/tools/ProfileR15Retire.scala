package graft.tools

import graft.retrieval.Postings
import org.apache.spark.sql.functions._

/** Round-15 tombstone-retirement ladder: price `retireTombstones`
  * against the full `compactIndex` it displaces as the answer to the
  * `maxTombstones` pressure trigger.
  *
  * Protocol, per rung (m20 / m80, 32-bucket posting index):
  *   - SLIM: append a 2-doc batch with ~3 unique terms, delete it,
  *     time the retirement — the realistic steady-state shape (a
  *     redaction touching a handful of docs). Expected decomposition:
  *     one column-pruned trace scan per table (the O(index-bytes/cols)
  *     term) + a handful of bucket rewrites (the touched-bytes term).
  *   - HEAVY: 30% of ALL docs tombstoned (the worst state the policy
  *     allows to persist — the same fixture as ProfileR14Tombs) —
  *     every bucket holds traces, so retirement degenerates to a
  *     rewrite of all 32 buckets; time it against `compactIndex` on
  *     an identically-prepared index (full pass = read+sort+rewrite
  *     of every table + dict recount + generation swaps).
  * Claims: SLIM ≪ HEAVY (~the trace-scan constant + k buckets), and
  * HEAVY ≤ FULL even in the degenerate all-buckets case (no dict
  * recount, no stats/tombs generation swaps beyond the final clear).
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR15Retire
  *        (SPARK_GRAFT_REPS slim cycles, default 3)
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR15Retire {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    import spark.implicits._

    def name(m: Int) = s"r15ret_m$m"
    def build(m: Int): Unit = {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.writeIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r15ret_m$m",
        buckets = 32, metaCols = Seq("lang", "source"))
    }

    var batchId = 0L
    def slimCycle(m: Int, step: Int): (Int, Double) = {
      batchId += 1
      val terms = (0 until 3).map(i => s"qqret${step}x$i")
      val batch = Seq(
        (9100000000L + batchId * 10, terms.mkString(" ")),
        (9100000000L + batchId * 10 + 1, terms.reverse.mkString(" ")))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("probe"))
      Postings.appendBatch(batch, "doc_id", "text", name(m), batchId)
      batchId += 1
      Postings.deleteBatch(batch, "doc_id", "text", name(m), batchId)
      val t0 = System.nanoTime()
      val rewritten = Postings.retireTombstones(spark, name(m))
      val t = (System.nanoTime() - t0) / 1e9
      (rewritten.values.map(_.size).sum, t)
    }

    Seq(20, 80).foreach(build)
    for (m <- Seq(20, 80)) {
      val slim = (1 to reps).map { step =>
        val c = slimCycle(m, step)
        println(f"[r15ret] m=$m%-3d slim cycle buckets=${c._1}%2d t=${c._2}%7.3fs")
        c
      }
      // HEAVY: 30% tombstoned — retirement degenerates to all buckets
      batchId += 1
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.deleteBatch(docs.filter(col("doc_id") % 10 < 3), "doc_id", "text", name(m), batchId)
      val t0 = System.nanoTime()
      val heavy = Postings.retireTombstones(spark, name(m))
      val tH = (System.nanoTime() - t0) / 1e9
      // FULL baseline on an identically-prepared index
      Postings.dropIndex(spark, name(m))
      build(m)
      batchId += 1
      Postings.deleteBatch(docs.filter(col("doc_id") % 10 < 3), "doc_id", "text", name(m), batchId)
      val t1 = System.nanoTime()
      Postings.compactIndex(spark, name(m))
      val tF = (System.nanoTime() - t1) / 1e9
      println(f"[r15ret] m=$m%-3d SLIM min=${slim.map(_._2).min}%7.3fs (k=${slim.map(_._1).max})  HEAVY retire t=$tH%7.3fs (k=${heavy.values.map(_.size).sum})  FULL compact t=$tF%7.3fs  heavy/full=${tH / tF}%5.2f")
    }
    Seq(20, 80).foreach(m => Postings.dropIndex(spark, name(m)))
    spark.stop()
  }
}
