package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The Spark-side machinery — schema, batch shape, partition-parallel
  * decode, frame sampling — is real and tested. The codec is REAL for
  * images: `javax.imageio` ships with the JDK (PNG/JPEG/BMP/GIF), so
  * image payloads decode to their true width/height and a 4×4
  * grid-sampled grayscale feature vector. Audio/video decode remains a
  * documented STUB (no ffmpeg-equivalent in the JDK): a deterministic
  * fake feature vector folded from the payload bytes, same batch shape,
  * so swapping in a real codec is a one-function change.
  *
  * Scale notes: payload columns are large — keep them OUT of shuffles.
  * `decodeFeatures` repartitions by a hash of the id only (narrow
  * columns shuffle, payload stays columnar in the scan), then decodes
  * partition-locally via mapPartitions, the Scala analog of a
  * `mapInPandas` batch UDF; codec init cost is per-partition, rows
  * stream through.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  case class Media(media_id: Long, payload: Array[Byte], format: String, n_bytes: Long)

  /** Decoded feature row; width/height are the REAL pixel dimensions
    * when the payload decoded as an image, None for non-image formats
    * (or undecodable payloads, which fall back to the byte-fold stub).
    */
  case class MediaFeatures(
      media_id: Long,
      format: String,
      features: Array[Float],
      width: Option[Int],
      height: Option[Int])

  /** Wrap a text corpus as a media table (payload = utf8 bytes) —
    * stand-in for real image/audio ingestion.
    */
  def toMediaTable(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val fmt = when(col(idCol) % 3 === 0, "png")
      .when(col(idCol) % 3 === 1, "jpeg")
      .otherwise("wav") // deterministic fake format tag
    val bytes = octet_length(col(payloadCol).cast("binary")).cast("long")
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      fmt.as("format"),
      bytes.as("n_bytes"),
      // typed metadata struct alongside the opaque payload (fake dims
      // derived from content; a real ingester fills these at decode)
      struct(
        fmt.as("format"),
        bytes.as("n_bytes"),
        (pmod(crc32(col(payloadCol).cast("binary")), lit(1920)) + 1).cast("int").as("width"),
        (pmod(crc32(col(payloadCol).cast("binary")), lit(1080)) + 1).cast("int").as("height")
      ).as("meta"))
  }

  /** Formats `javax.imageio` decodes out of the box. */
  private val ImageFormats = Set("png", "jpeg", "jpg", "bmp", "gif")

  /** REAL image decode via the JDK's ImageIO: true pixel dimensions
    * plus a 4×4 grid of cell-center grayscale samples (Rec.601 luma,
    * integer arithmetic — deterministic across platforms). Returns None
    * when the payload is not a decodable image, so callers can fall
    * back rather than fail the batch.
    */
  private[multimodal] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))).map { img =>
        val w     = img.getWidth
        val h     = img.getHeight
        val feats = new Array[Float](16)
        var i     = 0
        while (i < 16) {
          val gx  = math.min((i % 4) * w / 4 + w / 8, w - 1)
          val gy  = math.min((i / 4) * h / 4 + h / 8, h - 1)
          val rgb = img.getRGB(gx, gy)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          feats(i) = lum / 255f
          i += 1
        }
        (w, h, feats)
      }
    } catch { case _: Exception => None }

  /** STUB codec for the formats the JDK cannot decode (audio/video —
    * a real implementation would call an ffmpeg-equivalent here).
    * Deterministic fake: 8 floats folded from the payload bytes.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](8)
    var i   = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff).toFloat / 255f
      i += 1
    }
    acc
  }

  /** Partition-parallel decode: repartition on the narrow id (payload
    * rides along column-pruned), then stream each partition through the
    * codec once. Image formats go through the real ImageIO decode
    * (true dims + pixel features); undecodable image payloads and
    * audio/video fall back to the byte-fold stub with no dims.
    */
  def decodeFeatures(media: DataFrame, partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val df = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    df.select(col("media_id"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (once, not per row)
        it.map { case (id, fmt, bytes) =>
          val img = if (ImageFormats.contains(fmt.toLowerCase)) decodeImage(bytes) else None
          img match {
            case Some((w, h, feats)) => MediaFeatures(id, fmt, feats, Some(w), Some(h))
            case None                => MediaFeatures(id, fmt, decodeStub(bytes), None, None)
          }
        }
      }
  }

  /** Resize/downsample stub: keep every `factor`-th byte of the payload
    * (the byte-level stand-in for image resize / audio resample). Same
    * mapPartitions batch shape as decode; a real implementation swaps
    * the per-row function for a codec call.
    */
  def resizeStub(media: DataFrame, factor: Int): Dataset[Media] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val out = Array.tabulate(if (bytes.isEmpty) 0 else (bytes.length + factor - 1) / factor)(i => bytes(i * factor))
        Media(id, out, fmt, out.length.toLong)
      })
  }

  /** Frame/sample extraction: byte-range slices of the payload
    * (stand-in for video frame sampling); pure Column expressions.
    */
  def frameSample(media: DataFrame, frameBytes: Int, nFrames: Int): DataFrame =
    media.select(
      col("media_id"),
      transform(
        sequence(lit(0), lit(nFrames - 1)),
        i =>
          substring(
            col("payload"),
            // 1-based offset; frames evenly spaced over the payload
            (i * greatest(col("n_bytes") - frameBytes, lit(1)) / nFrames + 1).cast("int"),
            lit(frameBytes))).as("frames"))
}
