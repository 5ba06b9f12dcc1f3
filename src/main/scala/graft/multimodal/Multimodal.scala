package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The Spark-side machinery — schema, batch shape, partition-parallel
  * decode, frame sampling — is real and tested. The codec is REAL for
  * images (`javax.imageio` ships with the JDK: PNG/JPEG/BMP/GIF →
  * true width/height + a 4×4 grid-sampled grayscale vector) and for
  * WAV audio (JDK-only RIFF/PCM parse: true sample rate, channels,
  * bit depth, frame count + an 8-cell RMS energy grid) and for
  * AVI/MJPEG video (JDK-only RIFF container walk + per-frame ImageIO
  * decode: true dims, fps, frame count + a sampled-frame luma track).
  * MP3 gets a REAL header-level parse (ID3v2 skip + Layer III frame
  * walk: true sample rate, channels, frame count, duration, VBR
  * bitrate profile) — samples stay undecoded, as no JDK MP3 decoder
  * exists. Only codecs with no JDK decode path at all (H.264/MP4 and
  * friends) fall back to a deterministic byte-fold STUB with the same
  * batch shape, so swapping in a native codec is a one-function change.
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

  /** Decoded WAV facts: true header fields plus an 8-cell RMS energy
    * grid over the PCM frames — the audio analog of MediaFeatures'
    * true-dims + luma grid.
    */
  case class AudioFeatures(
      media_id: Long,
      format: String,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      duration_ms: Double,
      features: Array[Float])

  /** REAL WAV (RIFF) decode, JDK-only byte parsing — the audio twin of
    * `decodeImage`. Walks the chunk list (word-aligned, sizes LE),
    * reads the fmt chunk's PCM geometry and the data chunk's samples
    * (PCM 8-bit unsigned / 16-bit signed little-endian), and computes
    * an 8-cell RMS energy grid over amplitude-normalized samples —
    * deterministic double arithmetic, channel-interleaved. Returns
    * None for anything that is not a well-formed PCM WAV, so callers
    * fall back instead of failing the batch.
    */
  private[multimodal] def decodeWav(
      payload: Array[Byte]): Option[(Int, Int, Int, Long, Array[Float])] = {
    def u8(i: Int): Int  = payload(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | ((u8(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(payload, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos                                     = 12
      var fmt: Option[(Int, Int, Int)]            = None // (channels, sampleRate, bits)
      var data: Option[(Int, Int)]                = None // (offset, size)
      while (pos + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
        val id   = tag(pos)
        val size = le32(pos + 4).toInt
        val body = pos + 8
        if (size < 0 || body > payload.length) return None
        id match {
          case "fmt " if size >= 16 =>
            val audioFormat = le16(body)
            if (audioFormat != 1) return None // PCM only
            fmt = Some((le16(body + 2), le32(body + 4).toInt, le16(body + 14)))
          case "data" =>
            data = Some((body, math.min(size, payload.length - body)))
          case _ => ()
        }
        pos = body + size + (size & 1) // chunks are word-aligned
      }
      for {
        (channels, rate, bits) <- fmt
        if channels > 0 && rate > 0 && (bits == 8 || bits == 16)
        (off, len) <- data
      } yield {
        val bytesPerSample = bits / 8
        val frameBytes     = channels * bytesPerSample
        val nFrames        = (len / frameBytes).toLong
        val nSamples       = nFrames.toInt * channels
        val cells          = 8
        val energy         = new Array[Double](cells)
        val counts         = new Array[Int](cells)
        var s              = 0
        while (s < nSamples) {
          val x =
            if (bits == 16) le16(off + s * 2).toShort / 32768.0
            else (u8(off + s) - 128) / 128.0
          val frame = s / channels
          val cell  = if (nFrames == 0) 0 else math.min((frame * cells / nFrames).toInt, cells - 1)
          energy(cell) += x * x
          counts(cell) += 1
          s += 1
        }
        val grid = Array.tabulate(cells)(c =>
          if (counts(c) == 0) 0f else math.sqrt(energy(c) / counts(c)).toFloat)
        (rate, channels, bits, nFrames, grid)
      }
    } catch { case _: Exception => None }
  }

  /** PCM-16 WAV encoder (mono/stereo interleaved samples) — the writer
    * twin of `decodeWav`, used to build real audio fixtures and prove
    * the round trip, exactly like `Xlsx.write` does for the sheet
    * reader.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16.toShort)              // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** MPEG-1/2/2.5 Layer III bitrate table, kbps by (versionIsV1, index).
    * Index 0 is "free format" and 15 is invalid — both rejected.
    */
  private val Mp3BitratesV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3BitratesV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val Mp3RatesV1  = Array(44100, 48000, 32000, 0)
  private val Mp3RatesV2  = Array(22050, 24000, 16000, 0)
  private val Mp3RatesV25 = Array(11025, 12000, 8000, 0)

  /** REAL MP3 header parse, JDK-only — header fields only, no audio
    * decode (there is no JDK MP3 decoder; the PCM path stays WAV).
    * Skips a leading ID3v2 tag (syncsafe 28-bit size), then walks the
    * MPEG Layer III frame sequence: each 4-byte frame header gives
    * version, bitrate, sample rate and channel mode, and the frame
    * length formula (144 × bitrate / rate + padding; 72 for the
    * halved-sample-rate MPEG-2/2.5 versions) advances to the next
    * frame — so frame COUNT, true duration, and the per-frame bitrate
    * sequence (the VBR profile) come out of pure byte arithmetic.
    * Returns sample rate, channels, frame count, duration ms, and an
    * 8-cell mean-bitrate grid (kbps/320 — the compressed-audio analog
    * of decodeWav's RMS energy grid; flat for CBR, shaped for VBR).
    * None for anything that is not a walkable Layer III stream, so
    * callers fall back instead of failing the batch.
    */
  private[multimodal] def decodeMp3(
      payload: Array[Byte]): Option[(Int, Int, Long, Double, Array[Float])] = {
    def u8(i: Int): Int = payload(i) & 0xff
    try {
      if (payload.length < 4) return None
      // ID3v2: "ID3" + ver(2) + flags(1) + 4-byte syncsafe size
      var pos =
        if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
          val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
          if (size < 0 || 10 + size > payload.length) return None
          10 + size
        } else 0
      var rate     = 0
      var channels = 0
      var frames   = 0L
      var samplesPerFrame = 0
      val kbpsSeq  = scala.collection.mutable.ArrayBuffer.empty[Int]
      var walking  = true
      while (walking && pos + 4 <= payload.length) {
        val b1 = u8(pos); val b2 = u8(pos + 1)
        // frame sync: 11 set bits
        if (b1 != 0xff || (b2 & 0xe0) != 0xe0) {
          // ID3v1 trailer or junk after the last frame ends the walk;
          // junk BEFORE any frame means "not an MP3"
          walking = false
          if (frames == 0) return None
        } else {
          val version = (b2 >> 3) & 3 // 3=V1, 2=V2, 0=V2.5, 1=reserved
          val layer   = (b2 >> 1) & 3 // 1=Layer III
          if (version == 1 || layer != 1) return None
          val b3      = u8(pos + 2)
          val brIdx   = (b3 >> 4) & 0xf
          val srIdx   = (b3 >> 2) & 3
          val padding = (b3 >> 1) & 1
          val kbps    = (if (version == 3) Mp3BitratesV1 else Mp3BitratesV2)(brIdx)
          val sr = version match {
            case 3 => Mp3RatesV1(srIdx)
            case 2 => Mp3RatesV2(srIdx)
            case _ => Mp3RatesV25(srIdx)
          }
          if (kbps == 0 || sr == 0) return None
          if (frames == 0) {
            rate = sr
            channels = if (((u8(pos + 3) >> 6) & 3) == 3) 1 else 2 // 3 = mono
            samplesPerFrame = if (version == 3) 1152 else 576
          } else if (sr != rate) return None // rate must not change mid-stream
          val frameLen =
            (if (version == 3) 144000 else 72000) * kbps / sr + padding
          if (frameLen < 4 || pos + frameLen > payload.length) {
            walking = false
            if (frames == 0) return None
          } else {
            kbpsSeq += kbps
            frames += 1
            pos += frameLen
          }
        }
      }
      val cells = 8
      val sum   = new Array[Long](cells)
      val cnt   = new Array[Int](cells)
      var i     = 0
      while (i < kbpsSeq.length) {
        val c = math.min((i.toLong * cells / frames).toInt, cells - 1)
        sum(c) += kbpsSeq(i); cnt(c) += 1
        i += 1
      }
      val grid = Array.tabulate(cells)(c =>
        if (cnt(c) == 0) 0f else (sum(c).toDouble / cnt(c) / 320.0).toFloat)
      Some((rate, channels, frames, frames * samplesPerFrame * 1000.0 / rate, grid))
    } catch { case _: Exception => None }
  }

  /** MP3 frame-stream encoder (header-valid frames, zero-filled
    * bodies) — the writer twin of `decodeMp3`, used to build fixtures
    * that exercise the ID3 skip and the VBR frame walk, exactly like
    * `encodeWavPcm16`/`encodeAviMjpeg` for the other codecs. Emits an
    * empty ID3v2 tag of `id3Pad` bytes followed by one MPEG-1 Layer III
    * frame per `bitratesKbps` element (each must be a table bitrate).
    */
  def encodeMp3Frames(
      sampleRate: Int,
      mono: Boolean,
      bitratesKbps: Seq[Int],
      id3Pad: Int = 0): Array[Byte] = {
    val srIdx = Mp3RatesV1.indexOf(sampleRate)
    require(srIdx >= 0 && srIdx < 3, s"not an MPEG-1 sample rate: $sampleRate")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Pad > 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write(Array[Byte](
        ((id3Pad >> 21) & 0x7f).toByte, ((id3Pad >> 14) & 0x7f).toByte,
        ((id3Pad >> 7) & 0x7f).toByte, (id3Pad & 0x7f).toByte))
      out.write(new Array[Byte](id3Pad))
    }
    bitratesKbps.foreach { kbps =>
      val brIdx = Mp3BitratesV1.indexOf(kbps)
      require(brIdx > 0 && brIdx < 15, s"not an MPEG-1 L3 bitrate: $kbps")
      val len = 144000 * kbps / sampleRate // padding bit 0
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // V1, Layer III, no CRC
      frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      frame(3) = (if (mono) 0xc0 else 0x00).toByte
      out.write(frame)
    }
    out.toByteArray
  }

  /** Decoded video facts: true container geometry plus a per-sampled-
    * frame mean-luma track — the video analog of AudioFeatures' RMS
    * grid (temporal, not spatial, resolution).
    */
  case class VideoFeatures(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      fps: Double,
      n_frames: Long,
      duration_ms: Double,
      features: Array[Float])

  /** How many evenly-spaced frames `decodeAvi` actually decodes per
    * video. Bounded so a feature pass over a long video reads k frames,
    * not all of them — the frame-sampling that makes video feature
    * extraction linear in corpus size rather than corpus duration.
    */
  private val VideoSampleFrames = 4

  /** REAL video decode for AVI/MJPEG, JDK-only — the video twin of
    * `decodeWav` (same RIFF container family) composed with
    * `decodeImage`'s ImageIO path (an MJPEG frame IS a baseline JPEG).
    *
    * Walks the outer RIFF 'AVI ' chunk list: 'hdrl' gives the true
    * width/height ('avih') and frame rate ('strh' dwRate/dwScale for
    * the 'vids' stream); 'movi' holds the frame chunks ('00dc'/'00db'
    * for stream 0). Decodes `VideoSampleFrames` evenly-spaced frames
    * via ImageIO and returns their mean Rec.601 luma as the temporal
    * feature track. Returns None for anything that is not a well-formed
    * AVI whose sampled frames decode (H.264-in-MP4 etc. stays out of
    * reach without a native codec — that fallback is the remaining,
    * documented stub path), so callers fall back instead of failing
    * the batch.
    */
  private[multimodal] def decodeAvi(
      payload: Array[Byte]): Option[(Int, Int, Double, Long, Array[Float])] = {
    def u8(i: Int): Int     = payload(i) & 0xff
    def le16(i: Int): Int   = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long  = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | ((u8(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(payload, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (payload.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
      var width     = 0
      var height    = 0
      var fps       = 0.0
      var usPerFrm  = 0L
      val frameOffs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, size)

      // Walk one chunk run [from, to); LISTs recurse one level at a
      // time (hdrl → strl, movi → frame chunks) — AVI nesting is fixed
      // and shallow, so explicit recursion stays bounded.
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val id   = tag(pos)
          val size = le32(pos + 4).toInt
          val body = pos + 8
          if (size < 0 || body + size > to) return
          id match {
            case "LIST" if size >= 4 =>
              val sub = tag(body)
              if (sub == "hdrl" || sub == "strl" || sub == "movi" || sub == "rec ")
                walk(body + 4, body + size, inMovi || sub == "movi")
            case "avih" if size >= 40 =>
              usPerFrm = le32(body)
              width = le32(body + 32).toInt
              height = le32(body + 36).toInt
            case "strh" if size >= 28 && tag(body) == "vids" =>
              val scale = le32(body + 20)
              val rate  = le32(body + 24)
              if (scale > 0 && rate > 0) fps = rate.toDouble / scale.toDouble
            case c if inMovi && (c == "00dc" || c == "00db") && size > 0 =>
              frameOffs += ((body, size))
            case _ => ()
          }
          pos = body + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length, inMovi = false)

      if (fps == 0.0 && usPerFrm > 0) fps = 1e6 / usPerFrm.toDouble
      val n = frameOffs.length
      if (width <= 0 || height <= 0 || fps <= 0.0 || n == 0) return None
      // k evenly-spaced sample frames → mean luma each (cell-center
      // sampling rule shared with decodeImage's 4×4 spatial grid)
      val k     = math.min(VideoSampleFrames, n)
      val track = new Array[Float](k)
      var s     = 0
      while (s < k) {
        val (off, len) = frameOffs(s * n / k + math.min(n / (2 * k), n - 1 - s * n / k))
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(java.util.Arrays.copyOfRange(payload, off, off + len)))
        if (img == null) return None
        var sum = 0L
        var i   = 0
        val w   = img.getWidth
        val h   = img.getHeight
        while (i < 16) {
          val gx  = math.min((i % 4) * w / 4 + w / 8, w - 1)
          val gy  = math.min((i / 4) * h / 4 + h / 8, h - 1)
          val rgb = img.getRGB(gx, gy)
          sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          i += 1
        }
        track(s) = sum / 16f / 255f
        s += 1
      }
      Some((width, height, fps, n.toLong, track))
    } catch { case _: Exception => None }
  }

  /** AVI/MJPEG encoder (frames = ready JPEG byte arrays) — the writer
    * twin of `decodeAvi`, used to build real video fixtures and prove
    * the round trip, exactly like `encodeWavPcm16` for audio.
    */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val buf = java.nio.ByteBuffer.allocate(8 + body.length + pad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes(ascii)).putInt(body.length).put(body)
      buf.array()
    }
    def list(subtype: String, parts: Seq[Array[Byte]]): Array[Byte] =
      chunk("LIST", subtype.getBytes(ascii) ++ parts.flatten)
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps)     // dwMicroSecPerFrame
      b.putInt(0).putInt(0)       // dwMaxBytesPerSec, dwPaddingGranularity
      b.putInt(0x10)              // dwFlags: AVIF_HASINDEX off, interleaved off
      b.putInt(frames.length)     // dwTotalFrames
      b.putInt(0).putInt(1)       // dwInitialFrames, dwStreams
      b.putInt(0)                 // dwSuggestedBufferSize
      b.putInt(width).putInt(height)
      b.array() // trailing dwReserved[4] stays zero
    }
    val strh = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes(ascii)).put("MJPG".getBytes(ascii))
      b.putInt(0).putShort(0).putShort(0).putInt(0) // flags, priority, language, initialFrames
      b.putInt(1).putInt(fps)                       // dwScale, dwRate → fps
      b.putInt(0).putInt(frames.length)             // dwStart, dwLength
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
      b.putShort(1).putShort(24) // planes, bit count
      b.put("MJPG".getBytes(ascii))
      b.putInt(width * height * 3)
      b.array()
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih), list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frames.map(f => chunk("00dc", f)))
    val body = "AVI ".getBytes(ascii) ++ hdrl ++ movi
    val out  = java.nio.ByteBuffer.allocate(8 + body.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(ascii)).putInt(body.length).put(body)
    out.array()
  }

  /** Partition-parallel video decode over a media table: real container
    * geometry + luma track for every row `decodeAvi` accepts (rows that
    * do not parse as AVI/MJPEG are dropped — the caller's signal to
    * route them through `decodeFeatures`' stub path instead). Same
    * mapPartitions batch shape as `decodeFeatures`.
    */
  def decodeVideoFeatures(media: DataFrame): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, fmt, bytes) =>
        decodeAvi(bytes).map { case (w, h, fps, frames, track) =>
          VideoFeatures(id, fmt, w, h, fps, frames, frames * 1000.0 / fps, track)
        }
      })
  }

  /** Partition-parallel audio decode over a media table: real header
    * fields + RMS grid for every row `decodeWav` accepts (rows that do
    * not parse as PCM WAV are dropped — the caller's signal to route
    * them through `decodeFeatures`' stub path instead). Same
    * mapPartitions batch shape as `decodeFeatures`.
    */
  def decodeAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, fmt, bytes) =>
        // WAV first (PCM, bits>0); MP3 header walk as the compressed
        // fallback (bits_per_sample = 0 marks a compressed stream —
        // frame count/duration/bitrate grid are real, samples are not
        // decoded: no JDK MP3 decoder exists)
        decodeWav(bytes)
          .map { case (rate, ch, bits, frames, grid) =>
            AudioFeatures(id, fmt, rate, ch, bits, frames, frames * 1000.0 / rate, grid)
          }
          .orElse(decodeMp3(bytes).map { case (rate, ch, frames, durMs, grid) =>
            AudioFeatures(id, fmt, rate, ch, 0, frames, durMs, grid)
          })
      })
  }

  /** STUB codec for the formats the JDK cannot decode (H.264/MP4-class
    * video needs a native codec; images decode via ImageIO, WAV audio
    * via `decodeWav`, AVI/MJPEG video via `decodeAvi`).
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
    * (true dims + pixel features), wav through the real RIFF/PCM parse
    * (RMS energy grid, no dims), avi through the real RIFF/MJPEG walk
    * (true dims + luma track); undecodable payloads and native-codec
    * video fall back to the byte-fold stub with no dims.
    */
  def decodeFeatures(media: DataFrame, partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val df = if (partitions > 0) media.repartition(partitions, hash(col("media_id"))) else media
    df.select(col("media_id"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (once, not per row)
        it.map { case (id, fmt, bytes) =>
          val f = fmt.toLowerCase
          val decoded =
            if (ImageFormats.contains(f))
              decodeImage(bytes).map { case (w, h, feats) => MediaFeatures(id, fmt, feats, Some(w), Some(h)) }
            else if (f == "wav")
              decodeWav(bytes).map { case (_, _, _, _, grid) => MediaFeatures(id, fmt, grid, None, None) }
            else if (f == "mp3")
              decodeMp3(bytes).map { case (_, _, _, _, grid) => MediaFeatures(id, fmt, grid, None, None) }
            else if (f == "avi")
              decodeAvi(bytes).map { case (w, h, _, _, track) => MediaFeatures(id, fmt, track, Some(w), Some(h)) }
            else None
          decoded.getOrElse(MediaFeatures(id, fmt, decodeStub(bytes), None, None))
        }
      }
  }

  /** REAL image resize, JDK-only: decode via ImageIO, scale to
    * `max(1, dim / factor)` with bilinear interpolation, re-encode as
    * PNG (lossless, pure-Java encoder). None when the payload is not a
    * decodable image.
    */
  private[multimodal] def resizeImage(payload: Array[Byte], factor: Int): Option[Array[Byte]] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))).map { img =>
        val w   = math.max(1, img.getWidth / factor)
        val h   = math.max(1, img.getHeight / factor)
        val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g   = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Exception => None }

  /** REAL audio downsample, JDK-only: parse the RIFF/PCM chunks (same
    * walk as `decodeWav`), keep every `factor`-th frame, divide the
    * sample rate by `factor` (duration-preserving decimation), and
    * rebuild a minimal 44-byte-header PCM WAV. None when the payload is
    * not PCM WAV.
    */
  private[multimodal] def decimateWav(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    def u8(i: Int): Int    = payload(i) & 0xff
    def le16(i: Int): Int  = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | ((u8(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(payload, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos                          = 12
      var fmt: Option[(Int, Int, Int)] = None
      var data: Option[(Int, Int)]     = None
      while (pos + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
        val id   = tag(pos)
        val size = le32(pos + 4).toInt
        val body = pos + 8
        if (size < 0 || body > payload.length) return None
        id match {
          case "fmt " if size >= 16 =>
            if (le16(body) != 1) return None // PCM only
            fmt = Some((le16(body + 2), le32(body + 4).toInt, le16(body + 14)))
          case "data" =>
            data = Some((body, math.min(size, payload.length - body)))
          case _ => ()
        }
        pos = body + size + (size & 1)
      }
      for {
        (channels, rate, bits) <- fmt
        if channels > 0 && rate > 0 && (bits == 8 || bits == 16) && factor >= 1
        (off, len) <- data
      } yield {
        val frameBytes = channels * (bits / 8)
        val nFrames    = len / frameBytes
        val kept       = if (nFrames == 0) 0 else (nFrames + factor - 1) / factor
        val newRate    = math.max(1, rate / factor)
        val dataLen    = kept * frameBytes
        val out        = java.nio.ByteBuffer
          .allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        out.put("WAVE".getBytes("US-ASCII"))
        out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        out.putShort(1).putShort(channels.toShort).putInt(newRate)
        out.putInt(newRate * frameBytes).putShort(frameBytes.toShort).putShort(bits.toShort)
        out.put("data".getBytes("US-ASCII")).putInt(dataLen)
        var f = 0
        while (f < kept) {
          out.put(payload, off + f * factor * frameBytes, frameBytes)
          f += 1
        }
        out.array()
      }
    } catch { case _: Exception => None }
  }

  /** REAL resize/downsample: images re-encode at `1/factor` scale
    * (ImageIO, always PNG out), PCM WAV decimates frames and sample
    * rate by `factor` (duration-preserving), anything undecodable falls
    * back to `resizeStub`'s byte decimation so the operator stays
    * total. Same mapPartitions batch shape as `decodeFeatures`: the
    * payload never enters a shuffle, codec work is partition-local.
    */
  def resizeMedia(media: DataFrame, factor: Int): Dataset[Media] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val f = fmt.toLowerCase
        val resized =
          if (ImageFormats.contains(f)) resizeImage(bytes, factor).map(b => (b, "png"))
          else if (f == "wav") decimateWav(bytes, factor).map(b => (b, "wav"))
          else None
        val (out, outFmt) = resized.getOrElse {
          val dec = Array.tabulate(if (bytes.isEmpty) 0 else (bytes.length + factor - 1) / factor)(i =>
            bytes(i * factor))
          (dec, fmt)
        }
        Media(id, out, outFmt, out.length.toLong)
      })
  }

  /** Resize/downsample stub: keep every `factor`-th byte of the payload
    * (the byte-level stand-in kept for payloads with no JDK codec —
    * `resizeMedia` is the real path and falls back to this per row).
    * Same mapPartitions batch shape as decode.
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
