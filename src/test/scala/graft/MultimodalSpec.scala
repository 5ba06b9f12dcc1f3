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
