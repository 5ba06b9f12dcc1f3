package graft.tools

import graft.retrieval.Postings
import org.apache.spark.sql.functions.col

/** Round-12 compaction payoff measurement: how much does a heavily
  * appended index degrade, and does `Postings.compactIndex` recover
  * the fresh-build read cost?
  *
  * Protocol: build the posting index on 1/(K+1) of sf0.1's documents,
  * grow it with K committed `appendBatch` batches (each append adds
  * its own file set to every bucket — the worst-case micro-batch
  * ingest pattern), then time the same fixed-terms BM25 query (reps
  * alternating) in three states: FRESH full build, FRAGMENTED
  * (K appends), COMPACTED. File counts are read from the table
  * location. The claim under test: fragmented read cost grows with
  * the fragment count (per-file open/footer + lost per-bucket sort),
  * and compaction returns it to fresh-build cost — while the
  * compaction pass itself costs about one build.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR12Compact
  *        (SPARK_GRAFT_REPS, default 5; SPARK_GRAFT_APPENDS, default 24)
  */
object ProfileR12Compact {
  def main(args: Array[String]): Unit = {
    val reps    = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val appends = sys.env.getOrElse("SPARK_GRAFT_APPENDS", "24").toInt
    val sfDir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark   = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val docs    = spark.read.parquet(s"$sfDir/documents.parquet")
    val terms   = Seq("vector", "spark", "merge")

    def files(table: String): Int = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      new java.io.File(meta.location).listFiles.count(_.getName.endsWith(".parquet"))
    }
    def query(name: String): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      Postings.bm25TopK(
        Postings.postingsTable(spark, name), Postings.statsTable(spark, name), terms, 50)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // fresh: one full build — the floor the compacted index should hit
    val tBuild = timed(Postings.writeIndex(
      docs, "doc_id", "text", "r12cmp_fresh", "/tmp/graft_scale_idx/cmp_fresh", buckets = 16))
    // fragmented: same rows via 1 build + K appends
    val tGrow = timed {
      Postings.writeIndex(
        docs.filter(col("doc_id") % (appends + 1) === 0),
        "doc_id", "text", "r12cmp_frag", "/tmp/graft_scale_idx/cmp_frag", buckets = 16)
      (1 to appends).foreach(i =>
        Postings.appendBatch(
          docs.filter(col("doc_id") % (appends + 1) === i),
          "doc_id", "text", "r12cmp_frag", batchId = i.toLong))
    }
    println(f"[r12cmp] build fresh=$tBuild%6.2fs grow(1+$appends appends)=$tGrow%6.2fs " +
      f"files fresh=${files("r12cmp_fresh_postings")} frag=${files("r12cmp_frag_postings")}")

    query("r12cmp_fresh"); query("r12cmp_frag") // warm
    val pre = (1 to reps).map { rep =>
      val tf = query("r12cmp_fresh"); val tg = query("r12cmp_frag")
      println(f"[r12cmp] rep=$rep fresh=$tf%6.3fs fragmented=$tg%6.3fs")
      (tf, tg)
    }
    val tCompact = timed(Postings.compactIndex(spark, "r12cmp_frag"))
    println(f"[r12cmp] compact=$tCompact%6.2fs files now=${files("r12cmp_frag_postings")}")
    query("r12cmp_frag") // warm the new generation
    val post = (1 to reps).map { rep =>
      val tf = query("r12cmp_fresh"); val tc = query("r12cmp_frag")
      println(f"[r12cmp] rep=$rep fresh=$tf%6.3fs compacted=$tc%6.3fs")
      (tf, tc)
    }
    println(f"[r12cmp] MIN fresh=${(pre ++ post).map(_._1).min}%6.3fs " +
      f"fragmented=${pre.map(_._2).min}%6.3fs compacted=${post.map(_._2).min}%6.3fs")
    Postings.dropIndex(spark, "r12cmp_fresh")
    Postings.dropIndex(spark, "r12cmp_frag")
    spark.stop()
  }
}
