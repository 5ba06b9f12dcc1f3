package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-10 paired same-JVM exponent protocol — the method that
  * settled d02's quiet-box figure in round 9, now applied per-query:
  * ONE dedicated JVM per query (launch this main once per query via
  * tools/run_ladder.sh), a warm-up m20 run, then alternating
  * (m20, m80) replicate pairs. Each pair yields a paired exponent
  * log(t80/t20)/log(4) with both cells sharing identical JIT state,
  * page cache and heap history — the mixed-warm-state hazard that made
  * sweep minima unreliable for e05/e08 in round 9 (their cells rested
  * on cross-JVM minima alone). Reads the amplified directories
  * ProfileR6Scale writes (SPARK_GRAFT_REUSE'd /tmp/graft_scale/m{20,80}).
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR10Paired <queryName>
  *        SPARK_GRAFT_REPS=n pairs (default 3); SPARK_GRAFT_SHUFFLE width.
  */
object ProfileR10Paired {
  private val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d02_ngram_jaccard"     -> graft.operators.PipelineQueries.d02_ngram_jaccard,
    "d44_jaccard_rarity"    -> graft.operators.PipelineQueries.d44_jaccard_rarity,
    "d12_dedup_clusters"    -> graft.operators.PipelineQueries.d12_dedup_clusters,
    "d29_cluster_best"      -> graft.operators.CorpusQueries.d29_cluster_best,
    "e05_embed_neardup_lsh" -> graft.operators.ExtendedQueries.e05_embed_neardup_lsh,
    "e08_semdedup"          -> graft.operators.TrainingQueries.e08_semdedup)

  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse(sys.error("usage: ProfileR10Paired <queryName>"))
    val fn    = registry.getOrElse(name, sys.error(s"unknown query $name; one of ${registry.keys}"))
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    def run(m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      // full executed plan (cf. ProfileR6Scale): count() would let
      // Catalyst prune per-row computed work for projection-only shapes
      fn(spark, s"/tmp/graft_scale/m$m").queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val warm = run(20)
    println(f"[paired] $name warmup m20=$warm%6.2fs")
    val pairs = (1 to reps).map { rep =>
      val t20 = run(20)
      val t80 = run(80)
      val e   = math.log(t80 / t20) / math.log(4.0)
      println(f"[paired] $name rep=$rep t20=$t20%6.2fs t80=$t80%6.2fs e=$e%5.2f")
      (t20, t80)
    }
    val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
    println(f"[paired] $name MIN t20=${pairs.map(_._1).min}%6.2fs t80=${pairs.map(_._2).min}%6.2fs e(min-cells)=$e%5.2f")
    spark.stop()
  }
}
