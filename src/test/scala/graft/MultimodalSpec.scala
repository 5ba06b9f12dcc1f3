package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq((0L, "abcdefghij" * 5), (1L, "xyz"), (2L, "")).toDF("doc_id", "text")
  private lazy val media = Multimodal.toMediaTable(docs, "doc_id", "text")

  test("media table carries payload bytes + typed metadata") {
    val got = media.select("media_id", "format", "n_bytes").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == (("png", 50L)) && got(1L) == (("jpeg", 3L)) && got(2L) == (("wav", 0L)))
    // typed metadata struct with plausible bounded dims
    val meta = media.select($"meta.width", $"meta.height").as[(Int, Int)].collect()
    assert(meta.forall { case (w, h) => w >= 1 && w <= 1920 && h >= 1 && h <= 1080 })
  }

  test("decodeFeatures is deterministic and partition-parallel") {
    val a = Multimodal.decodeFeatures(media, partitions = 3).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(media, partitions = 1).collect().sortBy(_.media_id)
    assert(a.length == 3)
    assert(a.zip(b).forall { case (x, y) => x.features.sameElements(y.features) })
    assert(a.head.features.length == 8)
    assert(a.last.features.forall(_ == 0f)) // empty payload → zero vector
  }

  test("decodeFeatures really decodes PNG and JPEG payloads (JDK ImageIO)") {
    import java.awt.image.BufferedImage
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = x * 255 / math.max(1, w - 1) // horizontal gray gradient
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (10L, imageBytes("png", 8, 6), "png"),
      (11L, imageBytes("jpeg", 16, 16), "jpeg"),
      (12L, "not an image".getBytes("UTF-8"), "png") // undecodable → stub fallback
    ).toDF("media_id", "payload", "format")
    val got = Multimodal.decodeFeatures(rows).collect().map(f => f.media_id -> f).toMap
    // true dims from the actual payload, 4×4 grid features
    assert(got(10L).width.contains(8) && got(10L).height.contains(6))
    assert(got(10L).features.length == 16)
    // the gradient must survive decode: left cells darker than right
    assert(got(10L).features(0) < got(10L).features(3))
    // gray pixels: Rec.601 luma of (v,v,v) is v exactly
    assert(math.abs(got(10L).features(3) - 255f / 255f) < 1e-6)
    assert(got(11L).width.contains(16) && got(11L).height.contains(16))
    // graceful fallback: bad image bytes degrade to the 8-float stub
    assert(got(12L).width.isEmpty && got(12L).features.length == 8)
  }

  test("decodeWav really decodes PCM-16 WAV payloads (RIFF parse + RMS grid)") {
    // 1 second at 8 kHz mono: first half silence, second half a
    // full-scale square wave — the RMS grid must read 0 then ~1
    val rate = 8000
    val samples = Array.tabulate[Short](rate) { i =>
      if (i < rate / 2) 0
      else if ((i / 4) % 2 == 0) Short.MaxValue
      else (-Short.MaxValue).toShort
    }
    val wav = Multimodal.encodeWavPcm16(rate, 1, samples)
    val rows = Seq(
      (20L, wav, "wav"),
      (21L, "not audio".getBytes("UTF-8"), "wav") // undecodable → stub fallback
    ).toDF("media_id", "payload", "format")

    val audio = Multimodal.decodeAudioFeatures(rows).collect()
    assert(audio.length == 1) // only the real WAV parses
    val a = audio.head
    assert(a.media_id == 20L && a.sample_rate == rate && a.channels == 1 && a.bits_per_sample == 16)
    assert(a.n_frames == rate && math.abs(a.duration_ms - 1000.0) < 1e-9)
    assert(a.features.length == 8)
    // energy grid: silent first half, full-scale second half
    assert(a.features.take(4).forall(_ < 1e-6f))
    assert(a.features.drop(4).forall(f => math.abs(f - 1f) < 1e-3f))

    // decodeFeatures routes wav through the same real decode...
    val got = Multimodal.decodeFeatures(rows).collect().map(f => f.media_id -> f).toMap
    assert(got(20L).features.sameElements(a.features) && got(20L).width.isEmpty)
    // ...and degrades bad bytes to the 8-float stub, not a failure
    assert(got(21L).features.length == 8 && got(21L).features.exists(_ > 0f))
  }

  test("decodeWav reads stereo interleaved frames and word-aligned chunk walks") {
    // 100 frames at 44.1 kHz stereo: left channel full-scale, right silent
    val rate    = 44100
    val frames  = 100
    val samples = Array.tabulate[Short](frames * 2)(i => if (i % 2 == 0) Short.MaxValue else 0)
    val rows    = Seq((30L, Multimodal.encodeWavPcm16(rate, 2, samples), "wav"))
      .toDF("media_id", "payload", "format")
    val audio = Multimodal.decodeAudioFeatures(rows).collect()
    assert(audio.length == 1)
    val a = audio.head
    assert(a.sample_rate == rate && a.channels == 2 && a.bits_per_sample == 16 && a.n_frames == frames)
    // interleaved full-scale/silence → per-cell RMS = sqrt(1/2)
    assert(a.features.forall(g => math.abs(g - math.sqrt(0.5).toFloat) < 1e-3f))
  }

  // Solid-gray baseline-JPEG frame bytes for AVI fixtures.
  private def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g   = img.createGraphics()
    g.setColor(new java.awt.Color(gray, gray, gray)); g.fillRect(0, 0, w, h); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("decodeAvi really decodes AVI/MJPEG payloads (RIFF walk + per-frame ImageIO)") {
    // 8 frames at 4 fps, 32×24, luma ramping dark → bright: the
    // sampled-frame track must come back monotonically increasing
    val (w, h, fps) = (32, 24, 4)
    val frames      = (0 until 8).map(i => jpegFrame(w, h, 16 + i * 28))
    val avi         = Multimodal.encodeAviMjpeg(w, h, fps, frames)
    val rows = Seq(
      (40L, avi, "avi"),
      (41L, "not a video".getBytes("UTF-8"), "avi") // undecodable → stub fallback
    ).toDF("media_id", "payload", "format")

    val video = Multimodal.decodeVideoFeatures(rows).collect()
    assert(video.length == 1) // only the real AVI parses
    val v = video.head
    assert(v.media_id == 40L && v.width == w && v.height == h)
    assert(math.abs(v.fps - fps) < 1e-9 && v.n_frames == 8 && math.abs(v.duration_ms - 2000.0) < 1e-9)
    // 4 sampled frames spanning the ramp, strictly brightening; JPEG is
    // lossy so compare with slack against the encoded gray levels
    assert(v.features.length == 4)
    assert(v.features.sliding(2).forall { case Array(a, b) => a < b })
    assert(math.abs(v.features.head - 44 / 255f) < 0.05f)  // frame 1 (gray 44)
    assert(math.abs(v.features.last - 212 / 255f) < 0.05f) // frame 7 (gray 212)

    // decodeFeatures routes avi through the same real decode with dims...
    val got = Multimodal.decodeFeatures(rows).collect().map(f => f.media_id -> f).toMap
    assert(got(40L).features.sameElements(v.features))
    assert(got(40L).width.contains(w) && got(40L).height.contains(h))
    // ...and degrades bad bytes to the 8-float stub, not a failure
    assert(got(41L).features.length == 8 && got(41L).width.isEmpty)
  }

  test("decodeAvi samples a bounded frame count and tolerates short videos") {
    // 2-frame video: the track length is min(VideoSampleFrames, n)
    val frames = Seq(jpegFrame(16, 16, 30), jpegFrame(16, 16, 200))
    val avi    = Multimodal.encodeAviMjpeg(16, 16, 2, frames)
    val rows   = Seq((50L, avi, "avi")).toDF("media_id", "payload", "format")
    val v      = Multimodal.decodeVideoFeatures(rows).collect().head
    assert(v.n_frames == 2 && v.features.length == 2)
    assert(v.features(0) < v.features(1))
    // truncated container (header only, no movi) → None, row dropped
    val cut = java.util.Arrays.copyOfRange(avi, 0, 64)
    assert(Multimodal.decodeVideoFeatures(
      Seq((51L, cut, "avi")).toDF("media_id", "payload", "format")).collect().isEmpty)
  }

  test("resizeMedia really rescales images and decimates PCM audio (JDK-only)") {
    import java.awt.image.BufferedImage
    def imageBytes(w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = x * 255 / math.max(1, w - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rate    = 8000
    val samples = Array.tabulate[Short](rate)(i => if (i % 2 == 0) Short.MaxValue else 0)
    val rows = Seq(
      (40L, imageBytes(32, 16), "png"),
      (41L, Multimodal.encodeWavPcm16(rate, 1, samples), "wav"),
      (42L, "neither image nor audio".getBytes("UTF-8"), "mp4")
    ).toDF("media_id", "payload", "format")
    val out = Multimodal.resizeMedia(rows, factor = 4).collect().map(m => m.media_id -> m).toMap
    val outDf = out.values.toSeq
      .map(m => (m.media_id, m.payload, m.format))
      .toDF("media_id", "payload", "format")
    // image: REALLY re-decoded at 1/4 scale, PNG out
    val img = Multimodal.decodeFeatures(outDf.filter($"media_id" === 40L)).collect().head
    assert(out(40L).format == "png")
    assert(img.width.contains(8) && img.height.contains(4))
    // the gradient survives the rescale: left edge darker than right
    assert(img.features(0) < img.features(3))
    // audio: REALLY re-parsed — rate/4, every 4th frame, header intact
    val wav = Multimodal.decodeAudioFeatures(outDf.filter($"media_id" === 41L)).collect().head
    assert(out(41L).format == "wav")
    assert(wav.sample_rate == rate / 4 && wav.channels == 1 && wav.bits_per_sample == 16)
    assert(wav.n_frames == rate / 4)
    // every kept frame is an even-index original sample = full scale
    assert(wav.features.forall(g => math.abs(g - 1f) < 1e-3f))
    // undecodable format falls back to byte decimation, stays total
    assert(out(42L).n_bytes == (("neither image nor audio".length + 3) / 4).toLong)
  }

  test("decodeMp3 walks ID3v2 + Layer III frames (header-only parse)") {
    // VBR stream: 6 frames stepping up the bitrate table, 100-byte ID3 tag
    val vbr = Multimodal.encodeMp3Frames(
      44100, mono = false, Seq(96, 96, 128, 128, 192, 192), id3Pad = 100)
    val rows = Seq(
      (50L, vbr, "mp3"),
      (51L, Multimodal.encodeMp3Frames(32000, mono = true, Seq.fill(4)(64)), "mp3"),
      (52L, "not audio at all".getBytes("UTF-8"), "mp3"))
      .toDF("media_id", "payload", "format")
    val got = Multimodal.decodeAudioFeatures(rows).collect().map(a => a.media_id -> a).toMap
    // true header facts: rate, stereo, frame count, MPEG-1 duration
    assert(got(50L).sample_rate == 44100 && got(50L).channels == 2)
    assert(got(50L).n_frames == 6 && got(50L).bits_per_sample == 0) // compressed marker
    assert(math.abs(got(50L).duration_ms - 6 * 1152 * 1000.0 / 44100) < 1e-9)
    // the VBR profile survives: first cells at 96 kbps, last occupied
    // cell (frame 5 → cell 5*8/6 = 6) at 192
    assert(math.abs(got(50L).features.head - 96f / 320f) < 1e-6)
    assert(math.abs(got(50L).features(6) - 192f / 320f) < 1e-6)
    assert(got(51L).sample_rate == 32000 && got(51L).channels == 1 && got(51L).n_frames == 4)
    // junk is dropped by the audio path (undecodable → not emitted)
    assert(!got.contains(52L))
    // ...and falls back to the stub through decodeFeatures
    val feats = Multimodal.decodeFeatures(rows).collect().map(f => f.media_id -> f).toMap
    assert(feats(50L).features.length == 8 && feats(50L).width.isEmpty)
    assert(math.abs(feats(50L).features.head - 96f / 320f) < 1e-6)
    assert(feats(52L).features.length == 8) // byte-fold stub shape
  }

  test("decodeMp3 rejects truncated/rate-shifting streams gracefully") {
    val ok = Multimodal.encodeMp3Frames(44100, mono = true, Seq(128, 128))
    // truncate inside the second frame: walk stops, first frame counts
    val truncated = ok.take(ok.length - 10)
    val got = Multimodal.decodeAudioFeatures(
      Seq((60L, truncated, "mp3")).toDF("media_id", "payload", "format")).collect()
    assert(got.length == 1 && got.head.n_frames == 1)
    // an ID3 tag whose declared size runs past the payload → None
    val badId3 = Multimodal.encodeMp3Frames(44100, mono = true, Seq(128), id3Pad = 50).take(20)
    assert(Multimodal.decodeAudioFeatures(
      Seq((61L, badId3, "mp3")).toDF("media_id", "payload", "format")).collect().isEmpty)
  }

  test("decodeMp3 fuzz: randomized VBR streams round-trip against the encoder twin (5 seeds)") {
    // The frame walk has enough branching (ID3 skip, VBR length table,
    // truncation, trailer junk) to deserve randomized coverage beyond
    // the fixed fixtures: generate random encoder-twin streams, mutate
    // some (mid-frame truncation, ID3v1 trailer, junk), and check the
    // decoded facts against a brute-force reference computed from the
    // generation parameters.
    import scala.util.Random
    val rates    = Seq(44100, 48000, 32000) // MPEG-1 table
    val bitrates = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    def expectedGrid(kbps: Seq[Int]): Seq[Float] = {
      val cells = 8
      val sum   = new Array[Long](cells); val cnt = new Array[Int](cells)
      for ((k, i) <- kbps.zipWithIndex) {
        val c = math.min((i.toLong * cells / kbps.length).toInt, cells - 1)
        sum(c) += k; cnt(c) += 1
      }
      (0 until cells).map(c => if (cnt(c) == 0) 0f else (sum(c).toDouble / cnt(c) / 320.0).toFloat)
    }
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      // expected: media_id -> Some((rate, ch, frames, kbpsSeq)) or None (no row)
      val cases = (0 until 40).map { i =>
        val rate  = rates(rnd.nextInt(rates.size))
        val mono  = rnd.nextBoolean()
        val kbps  = Seq.fill(1 + rnd.nextInt(12))(bitrates(rnd.nextInt(bitrates.size)))
        val pad   = if (rnd.nextBoolean()) 1 + rnd.nextInt(200) else 0
        val full  = Multimodal.encodeMp3Frames(rate, mono, kbps, id3Pad = pad)
        rnd.nextInt(4) match {
          case 0 => // intact
            (i.toLong, full, Some((rate, if (mono) 1 else 2, kbps)))
          case 1 => // truncate inside the LAST frame: walk keeps the prefix
            val lastLen = 144000 * kbps.last / rate
            val cut     = 1 + rnd.nextInt(lastLen - 1)
            val exp     = if (kbps.length == 1) None
                          else Some((rate, if (mono) 1 else 2, kbps.dropRight(1)))
            (i.toLong, full.dropRight(cut), exp)
          case 2 => // ID3v1 trailer after the frames: walk stops cleanly
            val trailer = "TAG".getBytes("US-ASCII") ++ Array.fill(125)(rnd.nextInt(256).toByte)
            (i.toLong, full ++ trailer, Some((rate, if (mono) 1 else 2, kbps)))
          case _ => // junk before any sync: not an MP3, row dropped
            (i.toLong, "junk prefix, no sync".getBytes("US-ASCII") ++ full.take(40), None)
        }
      }
      val got = Multimodal
        .decodeAudioFeatures(
          cases.map { case (id, bytes, _) => (id, bytes, "mp3") }.toDF("media_id", "payload", "format"))
        .collect().map(a => a.media_id -> a).toMap
      for ((id, _, exp) <- cases) exp match {
        case None => assert(!got.contains(id), s"seed=$seed id=$id: expected no row")
        case Some((rate, ch, kbps)) =>
          val a = got.getOrElse(id, fail(s"seed=$seed id=$id: row missing"))
          assert(a.sample_rate == rate && a.channels == ch, s"seed=$seed id=$id")
          assert(a.n_frames == kbps.length.toLong, s"seed=$seed id=$id frames")
          assert(a.bits_per_sample == 0, s"seed=$seed id=$id compressed marker")
          assert(
            math.abs(a.duration_ms - kbps.length * 1152 * 1000.0 / rate) < 1e-9,
            s"seed=$seed id=$id duration")
          val expFeat = expectedGrid(kbps)
          assert(
            a.features.length == 8 &&
              a.features.toSeq.zip(expFeat).forall { case (g, e) => math.abs(g - e) < 1e-6f },
            s"seed=$seed id=$id vbr grid: got=${a.features.toSeq} exp=$expFeat")
      }
    }
  }

  test("resizeStub decimates payloads deterministically") {
    val out = Multimodal.resizeStub(media, 5).collect().map(m => m.media_id -> m.n_bytes).toMap
    assert(out == Map(0L -> 10L, 1L -> 1L, 2L -> 0L)) // ceil(50/5), ceil(3/5), 0
  }

  test("frameSample slices evenly spaced byte ranges") {
    val frames = Multimodal.frameSample(media.filter(col("media_id") === 0), 10, 3)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(frames.length == 3)
    assert(frames.forall(_.length == 10))
  }
}
