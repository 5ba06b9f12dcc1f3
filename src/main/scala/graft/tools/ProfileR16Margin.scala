package graft.tools

import graft.retrieval.Postings
import org.apache.spark.sql.functions._

/** Round-16 classic-mode margin TELEMETRY (VERDICT r15 #6): the
  * d65/d68/d69/d71/d72 gates REFUSE when any raw ln-idf score sits
  * within 1e-8 grid units of a 5-decimal rounding half-boundary. Under
  * uniform order statistics the expected minimum distance is
  * ~0.5 / n_matches, so the margin TIGHTENS as the corpus grows — this
  * harness records the observed minimum at each scale factor so drift
  * toward the guard is visible in a table instead of discovered as a
  * refusal at 100×.
  *
  * The scored frame is the full-scan classic computation
  * (`bm25ScoredClassic` over in-memory postings/stats — bit-identical
  * to the index path, pinned in RetrievalSpec), on the exact term set
  * the classic gates share.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR16Margin [dirs...]
  * Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/graft_sf1
  */
object ProfileR16Margin {
  def main(args: Array[String]): Unit = {
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/graft_sf1")
    val terms = Seq("vector", "merge", "scan")
    dirs.filter(d => new java.io.File(d, "documents.parquet").exists()).foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val pt = Postings.postings(docs, "doc_id", "text")
      val st = Postings.statsRow(docs, "doc_id", "text")
      val scored = Postings.bm25ScoredClassic(pt, st, terms)
      val n = scored.count()
      val margin = graft.operators.SearchQueries.roundingGridMargin(scored)
      val expected = 0.5 / math.max(n, 1L)
      println(
        f"[r16margin] $dir%-24s n_matches=$n%8d min_margin=$margin%.3e expected~${expected}%.3e " +
          f"guard=1e-8 headroom=${margin / 1e-8}%.1fx")
    }
    spark.stop()
  }
}
