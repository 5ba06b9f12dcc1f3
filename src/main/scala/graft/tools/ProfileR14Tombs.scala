package graft.tools

import graft.retrieval.Postings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 deletion-pressure ladder (VERDICT r13 #6): the r12/r13
  * ladders measured every retrieval read on CLEAN indexes, but no
  * cell measured a HEAVILY tombstoned one — the broadcast anti-join
  * above the bucketed scan is argued O(matches) and spec-pinned for
  * plan shape, yet never exponent-measured under real tombstone
  * pressure. This harness fills that row: the paired m20→m80
  * protocol (ProfileR10Paired) on an index with **30% of all docs
  * tombstoned, pre-compaction** (the worst state the
  * `compactIfFragmented(maxTombstones)` policy allows to persist)
  * against the same index **post-compaction** (tombstones physically
  * dropped, set cleared — the clean baseline).
  *
  * Claims under test:
  *   1. fixed-selectivity reads on the tombstoned index stay FLAT
  *      (e ≈ 0) — the anti-join's probe side is the pruned match set,
  *      never the corpus, and the broadcast tombstone set (30% of
  *      doc ids — ~144k longs at m80) costs a constant;
  *   2. the tombstone overhead itself (t_tombed − t_compacted) is a
  *      CONSTANT, not corpus-scaled;
  *   3. post-compaction cells reproduce the r12/r13 clean-ladder
  *      numbers (compaction really does restore the fresh floor).
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR14Tombs
  *        (SPARK_GRAFT_REPS pairs, default 5; SPARK_GRAFT_SHUFFLE width)
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR14Tombs {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))

    def name(m: Int) = s"r14tmb_m$m"
    def build(m: Int): Unit = {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      Postings.writeIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r14_m$m", buckets = 32)
      Postings.writePositionalIndex(
        docs, "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r14_m$m", buckets = 32)
      // 30% of ALL docs (base and marked copies alike: the copy offset
      // is a multiple of 10^7, so doc_id % 10 is copy-invariant)
      val t0 = System.nanoTime()
      Postings.deleteBatch(docs.filter(col("doc_id") % 10 < 3), "doc_id", "text", name(m), batchId = 1L)
      val td = (System.nanoTime() - t0) / 1e9
      val nT = Postings.tombstones(spark, name(m)).count()
      println(f"[r14tmb] build m=$m%-3d tombstoned=$nT%8d delete=$td%6.2fs")
    }

    val queries: Seq[(String, Int => DataFrame)] = Seq(
      "bm25_fixed_tombed" -> { m =>
        Postings.bm25TopK(
          Postings.livePostings(spark, name(m)), Postings.statsTable(spark, name(m)),
          Seq("spark", "merge", "scan"), 50)
      },
      "phrase_fixed_tombed" -> { m =>
        Postings.phraseTopK(Postings.livePositional(spark, name(m)), Seq("table", "hash"), 50)
      })

    def run(fn: Int => DataFrame, m: Int): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime()
      fn(m).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    def ladder(tag: String): Unit =
      for ((qn, fn) <- queries) {
        run(fn, 20); run(fn, 80) // warm both rungs
        val pairs = (1 to reps).map { rep =>
          val t20 = run(fn, 20)
          val t80 = run(fn, 80)
          println(f"[r14tmb] $tag $qn%-20s rep=$rep t20=$t20%6.3fs t80=$t80%6.3fs e=${math.log(t80 / t20) / math.log(4.0)}%5.2f")
          (t20, t80)
        }
        val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
        println(f"[r14tmb] $tag $qn%-20s MIN t20=${pairs.map(_._1).min}%6.3fs t80=${pairs.map(_._2).min}%6.3fs e(min-cells)=$e%5.2f")
      }

    Seq(20, 80).foreach(build)
    ladder("TOMBED   ")
    for (m <- Seq(20, 80)) {
      val t0 = System.nanoTime()
      Postings.compactIndex(spark, name(m))
      println(f"[r14tmb] compact m=$m%-3d ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    ladder("COMPACTED")
    Seq(20, 80).foreach(m => Postings.dropIndex(spark, name(m)))

    // ---- part 2: the IVF index under the same 30% deletion pressure
    // (the e11p read shape). Corpus-SCALED centroid model — the
    // production retrain regime the r13 ladder pinned FLAT on clean
    // indexes (16 cells @ m20 → 64 @ m80, constant cell size) — so
    // any non-flat residual here is the tombstone anti-join, not
    // cell-population growth.
    import graft.similarity.Knn
    import spark.implicits._
    def cents(e: DataFrame, m: Int): DataFrame = {
      val copies = if (m == 20) 2 else 8
      e.filter(col("vec_id") % 10000000L < 8 && col("vec_id") < copies * 10000000L)
        .select(col("vec_id").as("c_id"), Knn.asDouble(col("embedding")).as("cv"))
        .withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))
    }
    def ivfName(m: Int) = s"r14tmbivf_m$m"
    // interactive queries arrive as literals — materialize the 5-row
    // batch OUTSIDE the timer (the ProfileR13Ivf lesson: a pushed
    // vec_id<5 filter over the randomly-ordered amplified parquet
    // reads every row group of the wide embedding column)
    val qCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def qOf(m: Int): DataFrame = qCache.getOrElseUpdate(m, {
      spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
        .toDF("vec_id", "embedding")
    })
    for (m <- Seq(20, 80)) {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      Knn.writeIvfIndex(
        e, cents(e, m), "vec_id", "embedding", ivfName(m), s"/tmp/graft_scale_idx/r14ivf_m$m", buckets = 32)
      val t0 = System.nanoTime()
      Knn.deleteIvfBatch(
        e.filter(col("vec_id") % 10 < 3).select(col("vec_id")), "vec_id", ivfName(m), batchId = 1L)
      val td = (System.nanoTime() - t0) / 1e9
      val nT = spark.table(s"${ivfName(m)}_ivftombs").count()
      println(f"[r14tmb] ivf build m=$m%-3d tombstoned=$nT%8d delete=$td%6.2fs")
    }
    def runIvf(m: Int): Double = graft.Caches.scoped(spark) {
      val q  = qOf(m)
      val t0 = System.nanoTime()
      Knn.ivfTopK(spark, ivfName(m), q, "vec_id", "embedding", k = 5)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def ivfLadder(tag: String): Unit = {
      runIvf(20); runIvf(80) // warm
      val pairs = (1 to reps).map { rep =>
        val t20 = runIvf(20)
        val t80 = runIvf(80)
        println(f"[r14tmb] $tag ivf_topk_scaled      rep=$rep t20=$t20%6.3fs t80=$t80%6.3fs e=${math.log(t80 / t20) / math.log(4.0)}%5.2f")
        (t20, t80)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
      println(f"[r14tmb] $tag ivf_topk_scaled      MIN t20=${pairs.map(_._1).min}%6.3fs t80=${pairs.map(_._2).min}%6.3fs e(min-cells)=$e%5.2f")
    }
    ivfLadder("TOMBED   ")
    for (m <- Seq(20, 80)) {
      val t0 = System.nanoTime()
      Knn.compactIvfIndex(spark, ivfName(m))
      println(f"[r14tmb] ivf compact m=$m%-3d ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    ivfLadder("COMPACTED")
    Seq(20, 80).foreach(m => Knn.dropIvfIndex(spark, ivfName(m)))
    spark.stop()
  }
}
