package graft.tools

import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 IVF-index lifecycle measurements (VERDICT r12 #3/#6):
  *
  * 1. **Fragment-vs-compacted A/B** (the ProfileR12Compact protocol on
  *    the vector index): build the persisted IVF index fresh vs 1+K
  *    appends, time the pruned 5-query `ivfTopK` read in FRESH /
  *    FRAGMENTED / COMPACTED states, report file counts and the
  *    compaction cost.
  *
  * 2. **e10 read-path ladder** (paired m20/m80 cells for the
  *    authoritative exponent table): the persisted-IVF top-k query
  *    under two model regimes —
  *      - `ivf_fixed_model`: the centroid model FROZEN at 8 base
  *        centroids while the corpus grows m×. Cells grow linearly, so
  *        the honest expectation is e ≈ 1: a frozen model makes the
  *        query touch its whole (growing) cell. This is the documented
  *        cost of e10's freeze-with-index contract.
  *      - `ivf_scaled_model`: centroid count grows with the corpus
  *        (8 per amplifier copy over k/8 copies: 16 @ m20 → 64 @ m80),
  *        holding avg cell population constant — the production
  *        retrain-and-rebuild path. Expectation: the per-query scan is
  *        ~flat (e ≈ 0); what grows is the (rebuild-time) assignment.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR13Ivf
  *        (SPARK_GRAFT_REPS, default 3; SPARK_GRAFT_APPENDS, default 16)
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale for part 2.
  */
object ProfileR13Ivf {
  def main(args: Array[String]): Unit = {
    val reps    = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val appends = sys.env.getOrElse("SPARK_GRAFT_APPENDS", "16").toInt
    val sfDir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark   = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))

    def cents(emb: DataFrame, pred: org.apache.spark.sql.Column): DataFrame =
      emb
        .filter(pred)
        .select(col("vec_id").as("c_id"), Knn.asDouble(col("embedding")).as("cv"))
        .withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))

    // the production read path: a 5-vector query batch through the
    // PRUNED ivfTopK (literal cell IN pushed into the bucketed scan —
    // the r13 design fix; the unpruned self-join scanned the whole
    // index for ANY batch and measured e≈0.5 in both model regimes)
    // The batch is materialized as a LOCAL 5-row frame outside the
    // timer: interactive queries arrive as literals -- fetching them by
    // corpus scan would time the wrong thing (measured: a vec_id<5
    // pushed filter over the randomly-ordered amplified parquet reads
    // every row group of the wide embedding column).
    import spark.implicits._
    val queryCache = scala.collection.mutable.Map.empty[String, DataFrame]
    def queriesOf(path: String): DataFrame = queryCache.getOrElseUpdate(path, {
      spark.read.parquet(path).filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
        .toDF("vec_id", "embedding")
    })
    def run(name: String, qPath: String): Double = graft.Caches.scoped(spark) {
      val q = queriesOf(qPath)
      val t0 = System.nanoTime()
      Knn.ivfTopK(spark, name, q, "vec_id", "embedding", k = 5)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def files(name: String): Int = Knn.ivfTable(spark, name).inputFiles.length

    // ---- part 1: fragment vs compacted at sfDir ----
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val c8  = cents(emb, col("vec_id") < 8)
    val tBuild = timed(Knn.writeIvfIndex(
      emb, c8, "vec_id", "embedding", "r13ivf_fresh", "/tmp/graft_scale_idx/ivf_fresh", buckets = 8))
    val tGrow = timed {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % (appends + 1) === 0), c8,
        "vec_id", "embedding", "r13ivf_frag", "/tmp/graft_scale_idx/ivf_frag", buckets = 8)
      (1 to appends).foreach(i =>
        Knn.appendIvfBatch(
          emb.filter(col("vec_id") % (appends + 1) === i),
          "vec_id", "embedding", "r13ivf_frag", batchId = i.toLong))
    }
    println(f"[r13ivf] build fresh=$tBuild%6.2fs grow(1+$appends appends)=$tGrow%6.2fs " +
      f"files fresh=${files("r13ivf_fresh")} frag=${files("r13ivf_frag")}")
    val qSf = s"$sfDir/embeddings.parquet"
    run("r13ivf_fresh", qSf); run("r13ivf_frag", qSf) // warm
    val pre = (1 to reps).map { rep =>
      val tf = run("r13ivf_fresh", qSf); val tg = run("r13ivf_frag", qSf)
      println(f"[r13ivf] rep=$rep fresh=$tf%6.3fs fragmented=$tg%6.3fs")
      (tf, tg)
    }
    val tCompact = timed(Knn.compactIvfIndex(spark, "r13ivf_frag"))
    println(f"[r13ivf] compact=$tCompact%6.2fs files now=${files("r13ivf_frag")}")
    run("r13ivf_frag", qSf) // warm the new generation
    val post = (1 to reps).map { rep =>
      val tf = run("r13ivf_fresh", qSf); val tc = run("r13ivf_frag", qSf)
      println(f"[r13ivf] rep=$rep fresh=$tf%6.3fs compacted=$tc%6.3fs")
      (tf, tc)
    }
    println(f"[r13ivf] MIN fresh=${(pre ++ post).map(_._1).min}%6.3fs " +
      f"fragmented=${pre.map(_._2).min}%6.3fs compacted=${post.map(_._2).min}%6.3fs")
    Knn.dropIvfIndex(spark, "r13ivf_fresh")
    Knn.dropIvfIndex(spark, "r13ivf_frag")

    // ---- part 2: e10 read-path ladder (paired m20/m80) ----
    def ladderName(regime: String, m: Int) = s"r13lad_${regime}_m$m"
    def buildLadder(regime: String, m: Int): Double = {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      val cs = regime match {
        case "fixed" => cents(e, col("vec_id") < 8)
        case "scaled" =>
          // 8 base centroids per amplifier copy over k/8 copies:
          // 16 @ m20 → 64 @ m80 (cell count grows with the corpus)
          val copies = if (m == 20) 2 else 8
          cents(e, col("vec_id") % 10000000L < 8 && col("vec_id") < copies * 10000000L)
      }
      timed(Knn.writeIvfIndex(
        e, cs, "vec_id", "embedding", ladderName(regime, m),
        s"/tmp/graft_scale_idx/ivf_${regime}_m$m", buckets = 32))
    }
    for (regime <- Seq("fixed", "scaled"); m <- Seq(20, 80)) {
      val t = buildLadder(regime, m)
      println(f"[r13lad] build $regime%-6s m=$m t=$t%6.2fs")
    }
    def qM(m: Int) = s"/tmp/graft_scale/m$m/embeddings.parquet"
    for (regime <- Seq("fixed", "scaled")) {
      run(ladderName(regime, 20), qM(20)); run(ladderName(regime, 80), qM(80)) // warm
      val pairs = (1 to reps).map { rep =>
        val t20 = run(ladderName(regime, 20), qM(20))
        val t80 = run(ladderName(regime, 80), qM(80))
        println(f"[r13lad] ivf_${regime}_model rep=$rep t20=$t20%6.3fs t80=$t80%6.3fs " +
          f"e=${math.log(t80 / t20) / math.log(4.0)}%5.2f")
        (t20, t80)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / math.log(4.0)
      println(f"[r13lad] ivf_${regime}_model MIN t20=${pairs.map(_._1).min}%6.3fs " +
        f"t80=${pairs.map(_._2).min}%6.3fs e(min-cells)=$e%5.2f")
    }
    for (regime <- Seq("fixed", "scaled"); m <- Seq(20, 80))
      Knn.dropIvfIndex(spark, ladderName(regime, m))
    spark.stop()
  }
}
