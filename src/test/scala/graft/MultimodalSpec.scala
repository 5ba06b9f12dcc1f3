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
