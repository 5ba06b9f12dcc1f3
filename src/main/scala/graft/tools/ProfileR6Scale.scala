package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 corpus-size scaling probe for the dedup/ANN family, run
  * against the AS-WIRED graded queries (not re-implementations): the
  * sf0.1 base tables are amplified m× with near-dup DENSITY held
  * constant, written to /tmp as a synthetic SF directory, and each
  * query runs unchanged against that directory. Timings across the
  * multiplier ladder give per-query scaling exponents
  * (log t ratio / log m ratio) for ARCHITECTURE.md.
  *
  * Density-preserving amplification:
  *   - documents: copy i SUFFIXES every token with a copy-unique
  *     marker. Each copy's shingle set is then ISOMORPHIC to the
  *     base's (same per-doc shingle counts, same document-frequency
  *     histogram, same Jaccard for every doc pair), while docs from
  *     different copies share zero shingles. True pairs and candidate
  *     mass both replicate exactly m×. (Two rejected amplifiers:
  *     Profile20x's keep-first-half scheme produces ~m²/2
  *     below-threshold cross-copy candidates per base doc; inserting
  *     the marker into every token GAP doubles shingles and mints
  *     pathological hot shingles like (u,the,u) whose df ≈ corpus
  *     size — both swamp the engine signal with probe artifacts.)
  *   - embeddings: copy i flips each dimension's sign by a per-(copy,
  *     dim) pseudo-random pattern. Within a copy every pairwise cosine
  *     is EXACTLY preserved (both vectors see the same flips), while
  *     cross-copy cosines become sums with random signs that
  *     concentrate near 0 — so near-dup structure replicates exactly
  *     m×. (Rejected: cyclic dimension rotation — these embeddings
  *     have nonzero component means, so rotated copies still
  *     correlate and cross-copy pairs dominated the output.)
  *
  * Usage: runMain graft.tools.ProfileR6Scale [m ...] (default 1 5 20 80)
  *        runMain graft.tools.ProfileR6Scale skew   (AQE skew-join audit)
  */
object ProfileR6Scale {

  def scaledDocs(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base
      else
        base
          .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text", regexp_replace(col("text"), "([^\\s]+)", s"$$1u${i}v"))
    }.reduce(_ unionByName _)

  def scaledEmbeddings(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base
      else
        base
          .withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
          .withColumn(
            "embedding",
            expr(s"transform(embedding, (x, j) -> x * cast(1 - 2 * abs(pmod(hash($i, j), 2)) as float))"))
    }.reduce(_ unionByName _)

  private val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "d02_ngram_jaccard" -> graft.operators.PipelineQueries.d02_ngram_jaccard,
    "d44_jaccard_rarity" -> graft.operators.PipelineQueries.d44_jaccard_rarity,
    "d12_dedup_clusters" -> graft.operators.PipelineQueries.d12_dedup_clusters,
    "d29_cluster_best" -> graft.operators.CorpusQueries.d29_cluster_best,
    "e05_embed_neardup_lsh" -> graft.operators.ExtendedQueries.e05_embed_neardup_lsh,
    "e08_semdedup" -> graft.operators.TrainingQueries.e08_semdedup,
    // round-6 doc-local tf rewires: d22/d34 should be trivially linear
    // (zero pre-sort shuffles), d11 linear in the tf frame, d41 linear
    // with posting rows bounded at |sources|
    "d11_top_terms" -> graft.operators.PipelineQueries.d11_top_terms,
    "d22_repetition" -> graft.operators.ExtendedQueries.d22_repetition,
    "d34_dup_ngrams" -> graft.operators.TrainingQueries.d34_dup_ngrams,
    "d41_source_overlap" -> graft.operators.TrainingQueries.d41_source_overlap)

  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_SHUFFLE scales the shuffle width with the probe's
    // multiplier — on a real cluster partition count grows with data;
    // pinning 32 at m=80 would measure single-JVM spill, not the plan.
    // SPARK_GRAFT_AQE_WIDTH=1 instead runs the shared engine-default
    // width mode (wide-start + AQE coalesce, policy-active assert) so
    // this family's ladder carries the same e@auto column as the
    // event-time and relational ones.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = ProfileR7Scale.probeSession(shuffle)
    if (args.headOption.contains("skew")) {
      spark.sparkContext.setLogLevel("INFO") // surface OptimizeSkewedJoin decisions
      skewAudit(spark); spark.stop(); return
    }

    val ms   = if (args.isEmpty) Seq(1, 5, 20, 80) else args.map(_.toInt).toSeq
    val base = Tables(spark, "/root/testdata/sf0.1")
    ms.foreach { m =>
      val dir = s"/tmp/graft_scale/m$m"
      // SPARK_GRAFT_REUSE=1 keeps an existing amplified directory (the
      // amplifier is deterministic, so reuse is safe across runs)
      val reuse = sys.env.get("SPARK_GRAFT_REUSE").contains("1") &&
        new java.io.File(s"$dir/embeddings.parquet").exists()
      if (!reuse) {
        scaledDocs(base.documents, m)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
        scaledEmbeddings(base.embeddings, m)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      val nd = spark.read.parquet(s"$dir/documents.parquet").count()
      val ne = spark.read.parquet(s"$dir/embeddings.parquet").count()
      println(s"[scale] m=$m docs=$nd vecs=$ne")
      // SPARK_GRAFT_ONLY=d02_ngram_jaccard,... narrows the sweep when
      // re-measuring one query under a config hypothesis
      val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
      queries.filter(q => only.forall(_.contains(q._1))).foreach { case (name, fn) =>
        graft.Caches.scoped(spark) {
          val t0 = System.nanoTime()
          // full executed plan, not count(): count() lets Catalyst prune
          // projection-only per-row work (d22/d34's computed metrics),
          // understating exactly the doc-local family — same correction
          // as ProfileR7Scale; join/agg-dominated queries are unaffected
          // (their operators determine cardinality and survive pruning)
          val n = fn(spark, dir).queryExecution.toRdd.count()
          println(f"[scale] m=$m%-3d $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
        }
      }
    }
  }

  /** AQE skew-join audit (VERDICT r5 #7): a 20× corpus where ONE hub
    * document near-duplicates ~100k others, so the PPJoin verify join
    * (candidates ⋈ arrs on id) concentrates on the hub's key. With
    * broadcast disabled (both sides large at real scale) the final
    * adaptive plan must show skew=true on the sort-merge join — the
    * evidence PLANS.md cites that hot candidate keys split across
    * tasks instead of serializing into one.
    */
  def skewAudit(spark: SparkSession): Unit = {
    import graft.dedup.Dedup
    assert(
      spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "AQE skew-join must be on (default) — the verify joins rely on it under candidate skew")
    // force the scale-shape plan: at 100 TB neither side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // make skewed splits reachable at probe size (defaults target
    // multi-GB partitions; the probe's hub partition is ~tens of MB)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    // 20× corpus; candidate set constructed to the worst shape the
    // PPJoin path can emit: every candidate pair anchored on ONE hub
    // document (a boilerplate template near-duplicating 100k docs), so
    // the verify join's id1 side is a single hot key. Synthesizing the
    // candidates (rather than growing them out of shared text) keeps
    // the probe on the judged question — does the candidates ⋈ arrs
    // join skew-split — without the all-pairs explosion a 100k-doc
    // shared-prefix corpus would add around it.
    val base   = Tables(spark, "/root/testdata/sf0.1").documents.select(col("doc_id"), col("text"))
    val corpus = ProfileR6Scale.scaledDocs(base, 20)
    val arrs   = Dedup.shingleArrays(corpus, "doc_id", "text", 3).persist()
    // 10 hub templates, each a candidate against every other doc: the
    // id1 shuffle concentrates ~1M rows on 10 keys while the rest of
    // the key space is empty. (A SINGLE constant hub key degenerates —
    // Catalyst constant-propagates it and plans a one-row
    // CartesianProduct instead of a shuffled join.)
    val cand = arrs
      .filter(col("doc_id") >= 10)
      .select(explode(sequence(lit(0L), lit(79L))).as("i"), col("doc_id").as("id2"))
      .select(pmod(col("i"), lit(10L)).as("id1"), col("id2"))
    // canonical sanity probe: textbook hot-key range join — if THIS
    // does not skew-split, the environment/config is wrong, not the
    // engine's join shapes
    // run the df's OWN QueryExecution (df.count() would build a fresh
    // one, leaving this plan un-finalized and skew markers invisible)
    def runFinal(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      val qe = df.queryExecution
      val n  = qe.toRdd.count()
      (n, qe.executedPlan.toString)
    }
    def canonical(tag: String): Unit = {
      val l = spark.range(2000000).select(
        when(col("id") < 1800000, 0L).otherwise(col("id")).as("k"), col("id").as("v"))
      val r          = spark.range(1000).select(col("id").as("k"), col("id").as("w"))
      val (c, plan)  = runFinal(l.join(r, "k"))
      val nk         = "skew=true".r.findAllIn(plan).length
      println(s"[skew] canonical($tag) rows=$c skew=true joins: $nk")
    }
    canonical("base")
    locally { // 10 hot keys instead of 1
      val l = spark.range(2000000).select(
        when(col("id") < 1800000, col("id") % 10).otherwise(col("id")).as("k"), col("id").as("v"))
      val r         = spark.range(1000).select(col("id").as("k"), col("id").as("w"))
      val (c, plan) = runFinal(l.join(r, "k"))
      println(s"[skew] canonical(10keys) rows=$c skew=true joins: " +
        "skew=true".r.findAllIn(plan).length)
    }
    locally { // skewed side comes out of an explode
      val l = spark.range(25000)
        .select(explode(sequence(lit(0L), lit(79L))).as("i"), col("id").as("v"))
        .select(when(col("i") < 72, col("i") % 10).otherwise(col("v") + lit(100L)).as("k"), col("v"))
      val r         = spark.range(1000).select(col("id").as("k"), col("id").as("w"))
      val (c, plan) = runFinal(l.join(r, "k"))
      println(s"[skew] canonical(explode) rows=$c skew=true joins: " +
        "skew=true".r.findAllIn(plan).length)
    }
    // single-join probe: cand ⋈ arrs on the hot id1 alone
    val (n1, p1) = runFinal(
      cand.join(arrs.select(col("doc_id").as("id1"), col("n").as("n1")), "id1"))
    println(s"[skew] single-join rows=$n1 skew=true joins: " +
      "skew=true".r.findAllIn(p1).length)
    // same join with NOTHING cached: does the persisted input block it?
    locally {
      val arrsU = Dedup.shingleArrays(corpus, "doc_id", "text", 3)
      val candU = arrsU
        .filter(col("doc_id") >= 10)
        .select(explode(sequence(lit(0L), lit(79L))).as("i"), col("doc_id").as("id2"))
        .select(pmod(col("i"), lit(10L)).as("id1"), col("id2"))
      val (nu, pu) = runFinal(
        candU.join(arrsU.select(col("doc_id").as("id1"), col("n").as("n1")), "id1"))
      println(s"[skew] uncached-join rows=$nu skew=true joins: " +
        "skew=true".r.findAllIn(pu).length)
    }
    val t0        = System.nanoTime()
    val (n, plan) = runFinal(Dedup.verifyJaccard(cand, arrs, "doc_id", 0.0))
    println(f"[skew] verify pairs=$n in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val skews = "skew=true".r.findAllIn(plan).length
    println(s"[skew] final adaptive plan skew=true joins: $skews")
    println(plan.linesIterator.filter(_.contains("Join")).map(l => "[skew]   " + l.trim.take(180)).mkString("\n"))
    assert(skews >= 1, "expected AQE to skew-split the hot-key verify join")
    arrs.unpersist()
  }
}
