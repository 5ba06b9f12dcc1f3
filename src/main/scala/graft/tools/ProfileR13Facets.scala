package graft.tools

import graft.retrieval.Postings
import org.apache.spark.sql.functions.col

/** Round-13 facet denormalization A/B (VERDICT r12 #5): the r12 ladder
  * left facets as the one non-flat fixed-selectivity cell (e 0.13–0.17,
  * bound by the (doc_id, lang, source) forward stream). ARCHITECTURE
  * named the alternative: denormalize the facet columns onto the
  * posting rows (the `dl` pattern) so decoration joins nothing.
  *
  * Measured head-to-head on the paired m20/m80 protocol:
  *   - `facet_forward`: match set → doc_id-bucketed forward join →
  *     facet agg (the shipped d60 shape);
  *   - `facet_denorm`: matched (widened) postings → doc_id dedup →
  *     facet agg (`facetCountsDenorm`), zero joins.
  * plus the storage side of the trade: postings bytes both ways, and
  * the build cost both ways. Adoption decision goes to ARCHITECTURE.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR13Facets
  *        (SPARK_GRAFT_REPS pairs, default 5)
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR13Facets {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val terms = Seq("spark", "vector")

    def name(shape: String, m: Int) = s"r13fct_${shape}_m$m"
    def bytesOf(table: String): Long = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      val dir = new org.apache.hadoop.fs.Path(meta.location)
      val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it  = fs.listFiles(dir, true)
      var b   = 0L
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) b += f.getLen }
      b
    }
    def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    for (m <- Seq(20, 80)) {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      val tF = timed(Postings.writeIndex(
        docs, "doc_id", "text", name("fwd", m), s"/tmp/graft_scale_idx/fct_fwd_m$m",
        buckets = 32, metaCols = Seq("lang", "source")))
      val tD = timed(Postings.writeIndex(
        docs, "doc_id", "text", name("dnf", m), s"/tmp/graft_scale_idx/fct_dnf_m$m",
        buckets = 32, metaCols = Seq("lang", "source"), denormFacets = true))
      println(f"[r13fct] build m=$m forward=$tF%6.2fs denorm=$tD%6.2fs " +
        f"postings_bytes fwd=${bytesOf(name("fwd", m) + "_postings")} " +
        f"dnf=${bytesOf(name("dnf", m) + "_postings")} " +
        f"forward_tbl=${bytesOf(name("fwd", m) + "_forward")}")
    }

    def runFwd(m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      Postings.facetCounts(
        Postings.postingsTable(spark, name("fwd", m)), Postings.forwardTable(spark, name("fwd", m)),
        terms, Seq("lang", "source")).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def runDnf(m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      Postings.facetCountsDenorm(
        Postings.postingsTable(spark, name("dnf", m)), terms, Seq("lang", "source"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    for ((label, run) <- Seq("facet_forward" -> (runFwd _), "facet_denorm" -> (runDnf _))) {
      run(20); run(80) // warm
      val pairs = (1 to reps).map { rep =>
        val t20 = run(20); val t80 = run(80)
        println(f"[r13fct] $label%-14s rep=$rep t20=$t20%6.3fs t80=$t80%6.3fs " +
          f"e=${math.log(t80 / t20) / math.log(4.0)}%5.2f")
        (t20, t80)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
      println(f"[r13fct] $label%-14s MIN t20=${pairs.map(_._1).min}%6.3fs " +
        f"t80=${pairs.map(_._2).min}%6.3fs e(min-cells)=$e%5.2f")
    }
    for (shape <- Seq("fwd", "dnf"); m <- Seq(20, 80)) Postings.dropIndex(spark, name(shape, m))
    spark.stop()
  }
}
