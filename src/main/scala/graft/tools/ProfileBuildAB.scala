package graft.tools

import graft.retrieval.Postings

/** Times `Postings.writeIndex` (full posting-index build: postings
  * bucketize + stats + dict) at sf0.1 for SPARK_GRAFT_REPS reps in one
  * JVM. Used for the round-12 A/B of the stats derivation (second
  * tokenize pass vs sum(tf) over the written postings) — run once per
  * code variant in the same clean window, compare minima.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileBuildAB
  */
object ProfileBuildAB {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val docs  = spark.read.parquet(s"$sfDir/documents.parquet")
    val times = (1 to reps).map { rep =>
      val t0 = System.nanoTime()
      Postings.writeIndex(docs, "doc_id", "text", "r12ab", "/tmp/graft_scale_idx/ab", buckets = 16)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[buildab] rep=$rep build=$t%6.3fs")
      t
    }
    // sanity: the stats row the build wrote (n_docs, sum_dl) — must be
    // identical across variants
    Postings.statsTable(spark, "r12ab").show(false)
    println(f"[buildab] MIN=${times.min}%6.3fs over $reps reps")
    spark.stop()
  }
}
