package graft.tools

import graft.retrieval.Postings
import graft.similarity.Knn
import graft.sources.FsckWatermark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 fsck ladder (VERDICT r16 #1 + #6):
  *
  *  1. **Incremental-vs-full cells** — `checkIndexIncremental` timed in
  *     its three steady states against the full `checkIndex` at the
  *     same rungs: IDLE (zero touched buckets — the maintenance-cadence
  *     case the incremental form exists for), and TOUCHED-CONST (a
  *     fixed ~2k-doc append between checks, so the touched byte count
  *     is the same absolute size at both rungs). The claim under test:
  *     full-fsck cost scales with the corpus (r16 measured e = 0.85
  *     past the page cache), incremental cost scales with TOUCHED
  *     bytes — so its decade exponent should read ≈ 0 on both cells
  *     while the full pass climbs.
  *  2. **Warm-vs-cold pair at the top rung** (r16 #6: the m800 HEALTHY
  *     cells ran cold with 2× rep variance and the "linear past the
  *     page cache" regime was partly asserted): the full check timed
  *     immediately after an explicit page-cache drop
  *     (`/proc/sys/vm/drop_caches`, reported honestly if the sandbox
  *     refuses) vs back-to-back warm reps.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR17Fsck [mLo mHi]
  * Requires /tmp/graft_scale/m{lo,hi} from ProfileR6Scale.
  */
object ProfileR17Fsck {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val Seq(mLo, mHi) =
      if (args.length >= 2) args.take(2).map(_.toInt).toSeq else Seq(80, 800)
    val logRatio = math.log(mHi.toDouble / mLo.toDouble)

    def name(m: Int) = s"r17fsck_m$m"
    def docs(m: Int): DataFrame = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
    def build(m: Int): Unit = {
      Postings.writeIndex(
        docs(m), "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r17fsck_m$m",
        buckets = 32, metaCols = Seq("lang", "source"))
      Postings.writePositionalIndex(
        docs(m), "doc_id", "text", name(m), s"/tmp/graft_scale_idx/r17fsck_m$m", buckets = 32)
    }
    def time(f: => Unit): Double = graft.Caches.scoped(spark) {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def full(m: Int): Double = time { Postings.checkIndex(spark, name(m)).collect() }
    def incr(m: Int): Double = time { Postings.checkIndexIncremental(spark, name(m)).collect() }

    def cell(tag: String, run: Int => Double, between: Int => Unit = _ => ()): Unit = {
      val pairs = (1 to reps).map { rep =>
        between(mLo); val tLo = run(mLo)
        between(mHi); val tHi = run(mHi)
        println(f"[r17fsck] $tag rep=$rep t$mLo=$tLo%7.3fs t$mHi=$tHi%7.3fs e=${math.log(tHi / tLo) / logRatio}%5.2f")
        (tLo, tHi)
      }
      val e = math.log(pairs.map(_._2).min / pairs.map(_._1).min) / logRatio
      println(f"[r17fsck] $tag MIN t$mLo=${pairs.map(_._1).min}%7.3fs t$mHi=${pairs.map(_._2).min}%7.3fs e(min-cells)=$e%5.2f")
    }

    Seq(mLo, mHi).foreach(build)

    // baseline: the full check (same protocol as ProfileR16Fsck HEALTHY)
    full(mLo); full(mHi) // warm
    cell("FULL     checkIndex           ", full)

    // run 1 of the incremental form = full + watermark (priced once)
    for (m <- Seq(mLo, mHi))
      println(f"[r17fsck] MARK      checkIndexIncremental m$m first-run (full+mark) = ${incr(m)}%7.3fs")

    // IDLE: zero touched buckets — the maintenance-cadence steady state
    cell("IDLE-INC  checkIndexIncremental", incr)

    // TOUCHED-CONST: a fixed-size append between every check, same
    // absolute touched bytes at both rungs → flat cell = cost tracks
    // touched bytes, not corpus
    var batch = 10L
    def appendConst(m: Int): Unit = {
      batch += 1
      Postings.appendBatch(
        docs(mLo).filter(col("doc_id") % 40 === 0).limit(2000)
          .withColumn("doc_id", col("doc_id") + lit(batch * 100000000L)),
        "doc_id", "text", name(m), batchId = batch)
    }
    cell("TOUCH-INC checkIndexIncremental", incr, appendConst)

    // warm-vs-cold at the top rung (r16 #6): explicit page-cache drop
    def dropCaches(): Boolean =
      try {
        Runtime.getRuntime.exec(Array("sync")).waitFor()
        val w = new java.io.FileWriter("/proc/sys/vm/drop_caches")
        try w.write("3") finally w.close()
        true
      } catch { case scala.util.control.NonFatal(_) => false }
    val canDrop = dropCaches()
    if (canDrop) {
      val colds = (1 to reps).map { rep =>
        dropCaches()
        val t = full(mHi)
        println(f"[r17fsck] COLD      checkIndex m$mHi rep=$rep = $t%7.3fs (page cache dropped)")
        t
      }
      val warms = (1 to reps).map { rep =>
        val t = full(mHi)
        println(f"[r17fsck] WARM      checkIndex m$mHi rep=$rep = $t%7.3fs")
        t
      }
      println(f"[r17fsck] COLD/WARM m$mHi min-cold=${colds.min}%7.3fs min-warm=${warms.min}%7.3fs ratio=${colds.min / warms.min}%5.2f")
    } else
      println(s"[r17fsck] COLD/WARM m$mHi SKIPPED — /proc/sys/vm/drop_caches not writable in this sandbox")

    Seq(mLo, mHi).foreach { m =>
      FsckWatermark.delete(spark, FsckWatermark.path(spark, s"${name(m)}_postings"))
      Postings.dropIndex(spark, name(m))
    }

    // IVF twin, idle cell only (the postings side carries the decade
    // argument; this pins the vector form's steady state)
    def ivfName(m: Int) = s"r17fsckivf_m$m"
    def cents(e: DataFrame, m: Int): DataFrame = {
      val copies = math.max(2, m / 10)
      e.filter(col("vec_id") % 10000000L < 8 && col("vec_id") < copies.toLong * 10000000L)
        .select(col("vec_id").as("c_id"), Knn.asDouble(col("embedding")).as("cv"))
        .withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))
    }
    for (m <- Seq(mLo, mHi)) {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      Knn.writeIvfIndex(
        e, cents(e, m), "vec_id", "embedding", ivfName(m), s"/tmp/graft_scale_idx/r17fsckivf_m$m", buckets = 32)
    }
    def ivfFull(m: Int): Double = time { Knn.checkIvfIndex(spark, ivfName(m)).collect() }
    def ivfIncr(m: Int): Double = time { Knn.checkIvfIndexIncremental(spark, ivfName(m)).collect() }
    ivfFull(mLo); ivfFull(mHi)
    cell("FULL-IVF  checkIvfIndex        ", ivfFull)
    for (m <- Seq(mLo, mHi)) ivfIncr(m) // full + mark
    cell("IDLE-IVF  checkIvfIndexIncr    ", ivfIncr)
    Seq(mLo, mHi).foreach { m =>
      FsckWatermark.delete(spark, FsckWatermark.path(spark, s"${ivfName(m)}_ivf"))
      Knn.dropIvfIndex(spark, ivfName(m))
    }
    spark.stop()
  }
}
