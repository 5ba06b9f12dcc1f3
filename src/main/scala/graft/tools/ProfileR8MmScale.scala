package graft.tools

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 multimodal scaling probe — the rung the round-7 review asked
  * for: mm01–mm03 and the REAL decode/resize paths measured on the same
  * amplification ladder as the other three families (r6 dedup/ANN,
  * r7 event-time, r7 relational), plus structural proof that payload
  * bytes never enter an exchange.
  *
  * Two fixture families:
  *   - `documents`-backed (mm01/mm02/mm03): the graded queries run
  *     AS WIRED against an amplified documents dir. Amplification
  *     offsets doc_id only — every mm query is per-row + final sort,
  *     so copies never interact and output replicates exactly m×.
  *   - real-media (decodeFeatures/resizeMedia): a synthetic media
  *     table GENERATED ON EXECUTORS (spark.range → mapPartitions), one
  *     third each real PNG (ImageIO-encoded gradient), real PCM-16 WAV
  *     (encodeWavPcm16), real AVI/MJPEG (encodeAviMjpeg) — the same
  *     codecs the decode path parses, so the probe times true decode
  *     work, not the stub. Amplification offsets media_id with payload
  *     unchanged: decode cost per row is constant, so rows/s flat
  *     across rungs is the pass (decode is embarrassingly parallel;
  *     the only scale risk is accidental payload shuffle, which the
  *     plan assert rules out).
  *
  * Reported per rung: wall seconds (full plan via toRdd), rows/s,
  * input MB/s, and for resize the payload amplification ratio
  * (Σ out bytes / Σ in bytes — the number a 100 TB capacity plan
  * needs). Plan asserts: decodeFeatures and resizeMedia executed plans
  * contain ZERO exchanges (payload stays scan→mapPartitions-local);
  * mm03's single sort exchange carries only narrow derived columns.
  *
  * Usage: runMain graft.tools.ProfileR8MmScale [m ...] (default 1 5 20)
  *        SPARK_GRAFT_REUSE=1 keeps generated dirs;
  *        SPARK_GRAFT_SHUFFLE sets shuffle width (default 32).
  */
object ProfileR8MmScale {

  /** Executor-side media synthesis: n rows, format by id%3, payloads
    * deterministic in media_id (bit-identical across runs/partitions).
    */
  def genMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark
      .range(0, n, 1, 32)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload: Array[Byte] = (id % 3) match {
          case 0 => // real PNG: 48×32, id-tinted horizontal gradient
            val img = new java.awt.image.BufferedImage(48, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val tint = (id % 251).toInt
            var x = 0
            while (x < 48) {
              var y = 0
              while (y < 32) {
                val v = (x * 255 / 47 + tint) % 256
                img.setRGB(x, y, (v << 16) | (v << 8) | ((v + y) % 256))
                y += 1
              }
              x += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          case 1 => // real PCM-16 WAV: 2048 mono frames, id-seeded triangle wave
            val samples = Array.tabulate(2048) { i =>
              val period = 32 + (id % 96).toInt
              val phase  = i % period
              val tri    = if (phase * 2 < period) phase * 4 - period else 3 * period - phase * 4
              (tri * 8192 / period).toShort
            }
            Multimodal.encodeWavPcm16(8000, 1, samples)
          case _ => // real AVI/MJPEG: 4 frames of 24×16 JPEG
            val frames = (0 until 4).map { f =>
              val img = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val base = ((id * 37 + f * 61) % 256).toInt
              var x = 0
              while (x < 24) {
                var y = 0
                while (y < 16) {
                  val v = (base + x * 8) % 256
                  img.setRGB(x, y, (v << 16) | (v << 8) | v)
                  y += 1
                }
                x += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "jpg", bos)
              bos.toByteArray
            }
            Multimodal.encodeAviMjpeg(24, 16, 4, frames)
        }
        val fmt = (id % 3) match { case 0 => "png"; case 1 => "wav"; case _ => "avi" }
        (id, payload, fmt, payload.length.toLong)
      })
      .toDF("media_id", "payload", "format", "n_bytes")
  }

  def scaledMedia(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base else base.withColumn("media_id", col("media_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)

  def scaledDocs(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base else base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)

  private def assertNoExchange(name: String, df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    val n    = "(?i)exchange".r.findAllIn(plan).length
    assert(n == 0, s"$name: expected a shuffle-free plan, found $n Exchange node(s):\n$plan")
    println(s"[plan] $name: 0 exchanges (payload never shuffles)")
  }

  def main(args: Array[String]): Unit = {
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ms = if (args.isEmpty) Seq(1, 5, 20) else args.map(_.toInt).toSeq

    // ---- documents-backed mm queries, as wired ----
    val baseDocs = Tables(spark, "/root/testdata/sf0.1").documents
    val mmQueries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "mm01_media_meta"    -> graft.operators.PipelineQueries.mm01_media_meta,
      "mm02_frame_sample"  -> graft.operators.ExtendedQueries.mm02_frame_sample,
      "mm03_binary_header" -> graft.operators.TrainingQueries.mm03_binary_header)

    // ---- real-media fixture: ~33k rows/copy ≈ 85 MB of true codecs ----
    val nBase = 33000L

    ms.foreach { m =>
      val docDir = s"/tmp/graft_scale_mm/docs_m$m"
      val medDir = s"/tmp/graft_scale_mm/media_m$m"
      val reuse = sys.env.get("SPARK_GRAFT_REUSE").contains("1") &&
        new java.io.File(s"$medDir/media.parquet").exists()
      if (!reuse) {
        scaledDocs(baseDocs, m)
          .repartition(32).write.mode("overwrite").parquet(s"$docDir/documents.parquet")
        scaledMedia(genMedia(spark, nBase), m)
          .repartition(32).write.mode("overwrite").parquet(s"$medDir/media.parquet")
      }
      val media   = spark.read.parquet(s"$medDir/media.parquet")
      val nRows   = media.count()
      val inBytes = media.agg(sum("n_bytes")).as[Long].head()
      println(f"[scale] m=$m%-3d media rows=$nRows bytes=${inBytes / 1e6}%.1fMB")

      mmQueries.foreach { case (name, fn) =>
        graft.Caches.scoped(spark) {
          val t0 = System.nanoTime()
          val n  = fn(spark, docDir).queryExecution.toRdd.count()
          println(f"[scale] m=$m%-3d $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
        }
      }

      // decode: all three real codecs through the default (shuffle-free) path
      val dec = Multimodal.decodeFeatures(media).toDF()
      assertNoExchange("decodeFeatures", dec)
      val t0 = System.nanoTime()
      val nd = dec.queryExecution.toRdd.count()
      val sd = (System.nanoTime() - t0) / 1e9
      println(f"[scale] m=$m%-3d decodeFeatures         $sd%8.2fs rows=$nd ${nd / sd}%.0f rows/s ${inBytes / sd / 1e6}%.1f MB/s")

      // resize: real ImageIO rescale / PCM decimation; amplification ratio
      val rz = Multimodal.resizeMedia(media, 2).toDF()
      assertNoExchange("resizeMedia", rz)
      val t1 = System.nanoTime()
      val nr = rz.queryExecution.toRdd.count()
      val s1 = (System.nanoTime() - t1) / 1e9
      val outBytes = Multimodal.resizeMedia(media, 2).toDF().agg(sum("n_bytes")).as[Long].head()
      println(f"[scale] m=$m%-3d resizeMedia(2)         $s1%8.2fs rows=$nr ${nr / s1}%.0f rows/s ratio=${outBytes.toDouble / inBytes}%.3f")
    }

    // mm03 plan shape: its one exchange is the final narrow-column sort;
    // the payload is consumed by scan-side projections and never moves.
    val mm03 = graft.operators.TrainingQueries.mm03_binary_header(spark, s"/tmp/graft_scale_mm/docs_m${ms.head}")
    val plan = mm03.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("payload")),
      s"mm03: payload column reached an exchange:\n$plan")
    println("[plan] mm03_binary_header: exchanges carry narrow derived columns only")
    spark.stop()
  }
}
