package graft.tools

import graft.retrieval.Postings
import org.apache.spark.sql.DataFrame

/** Round-12 retrieval-index ladder — the paired same-JVM protocol
  * (ProfileR10Paired) applied to the posting-list family. The claim
  * under test is the index's defining property: **query cost tracks
  * MATCHES, not corpus size.**
  *
  * The m-amplifier marker-suffixes every token of every copy
  * (ProfileR6Scale.scaledDocs: "spark" → "sparku3v" in copy 3), which
  * cleanly splits the measurement into the two regimes a real engine
  * lives in:
  *
  *   - **fixed-selectivity** — literal terms ("spark","merge",...)
  *     match ONLY the base slice, so the match set is m-invariant
  *     while the corpus (and the index) grows m×. A healthy index
  *     answers these FLAT (e ≈ 0): the bucketed layout prunes
  *     non-matching postings at the scan.
  *   - **match-scaled** — prefix resolution ("spark%") picks up every
  *     marked variant, so matches grow m× with the corpus. Cost here
  *     should be ~linear in matches (e ≈ 1 against corpus mass) —
  *     that is the honest lower bound for work that must touch every
  *     match.
  *
  * Build cost is timed separately (once per m per JVM — metastore
  * registration is per-session, so a fresh JVM rebuilds; the files
  * under /tmp/graft_scale_idx are overwritten).
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR12Retrieval
  *        (SPARK_GRAFT_REPS pairs, default 3; SPARK_GRAFT_SHUFFLE width)
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR12Retrieval {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))

    def name(m: Int) = s"r12lad_m$m"
    def build(m: Int): (Double, Double) = {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      val t0   = System.nanoTime()
      Postings.writeIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/m$m", buckets = 32,
        metaCols = Seq("lang", "source"))
      val tFreq = (System.nanoTime() - t0) / 1e9
      val t1    = System.nanoTime()
      Postings.writePositionalIndex(docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/m$m", buckets = 32)
      val tPos = (System.nanoTime() - t1) / 1e9
      (tFreq, tPos)
    }

    val queries: Seq[(String, Int => DataFrame)] = Seq(
      "bm25_fixed" -> { m =>
        Postings.bm25TopK(
          Postings.postingsTable(spark, name(m)), Postings.statsTable(spark, name(m)),
          Seq("spark", "merge", "scan"), 50)
      },
      "bm25_scaled" -> { m =>
        Postings.bm25TopK(
          Postings.postingsTable(spark, name(m)), Postings.statsTable(spark, name(m)),
          Postings.prefixTerms(spark, name(m), "spark", maxTerms = 200), 50)
      },
      "phrase_fixed" -> { m =>
        Postings.phraseTopK(Postings.positionalTable(spark, name(m)), Seq("table", "hash"), 50)
      },
      "proximity_fixed" -> { m =>
        Postings.proximityTopK(Postings.positionalTable(spark, name(m)), "vector", "merge", 3, 50)
      },
      "boolean_fixed" -> { m =>
        Postings.booleanSearch(
          Postings.postingsTable(spark, name(m)), Seq("spark", "merge"), Seq("slow"))
      },
      // typo resolution matches only base-slice terms (markered
      // variants are ≥2 edits away) → fixed matches; the resolution
      // itself is a dictionary scan, which grows ~m× in vocabulary
      "fuzzy_fixed" -> { m =>
        Postings.bm25TopK(
          Postings.postingsTable(spark, name(m)), Postings.statsTable(spark, name(m)),
          Postings.fuzzyTerms(spark, name(m), Seq("vectr", "mrge", "sow")), 50)
      },
      // 8 standing conjunctive queries over base literal terms in one
      // pruned pass — fixed matches, shared scan
      "multiquery_fixed" -> { m =>
        Postings.matchQueries(
          Postings.postingsTable(spark, name(m)),
          graft.operators.SearchQueries.standingQueries)
      },
      // facet decoration of a fixed match set via the doc_id-bucketed
      // forward table (forward side grows m×, never shuffles)
      "facet_fixed" -> { m =>
        Postings.facetCounts(
          Postings.postingsTable(spark, name(m)),
          Postings.forwardTable(spark, name(m)),
          Seq("spark", "vector"), Seq("lang", "source"))
      },
      // ranked form of the percolation — adds the per-query score fold
      // and window to the same fixed match set
      "multiquery_ranked_fixed" -> { m =>
        Postings.bm25MultiTopK(
          Postings.postingsTable(spark, name(m)), Postings.statsTable(spark, name(m)),
          graft.operators.SearchQueries.standingQueries, 10)
      })

    def run(fn: Int => DataFrame, m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      fn(m).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    for (m <- Seq(20, 80)) {
      val (tf, tp) = build(m)
      println(f"[r12lad] build m=$m freq=$tf%6.2fs positional=$tp%6.2fs")
    }
    // warm both sides once per query, then alternate (m20, m80) pairs
    for ((qn, fn) <- queries) {
      run(fn, 20); run(fn, 80)
      val pairs = (1 to reps).map { rep =>
        val t20 = run(fn, 20)
        val t80 = run(fn, 80)
        println(f"[r12lad] $qn%-16s rep=$rep t20=$t20%6.3fs t80=$t80%6.3fs e=${math.log(t80 / t20) / math.log(4.0)}%5.2f")
        (t20, t80)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
      println(f"[r12lad] $qn%-16s MIN t20=${pairs.map(_._1).min}%6.3fs t80=${pairs.map(_._2).min}%6.3fs e(min-cells)=$e%5.2f")
    }
    Postings.dropIndex(spark, name(20))
    Postings.dropIndex(spark, name(80))
    spark.stop()
  }
}
