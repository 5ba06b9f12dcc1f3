package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the chunking and packing transforms, on
  * the real sf0.001 testdata: chunk windows tile every token with the
  * configured stride/width; packing bins partition the doc order per
  * shard and conserve token counts.
  */
class ChunkPackSpec extends SparkTestBase {
  import spark.implicits._

  test("chunking tiles every document: stride offsets, full token coverage") {
    val rows = SparkEntry.queries("d23_chunking")(spark, sfDir)
      .select("doc_id", "chunk_idx", "start", "n_chunk_tokens")
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk_idx is dense from 0 and start = idx * stride
      sorted.zipWithIndex.foreach { case ((_, idx, start, n), i) =>
        assert(idx == i, s"doc $doc: chunk_idx gap at $i")
        assert(start == i * 48L, s"doc $doc: start mismatch")
        assert(n >= 1 && n <= 64, s"doc $doc: bad chunk size $n")
      }
      // the last start is the largest stride multiple below n_tokens, so
      // the final chunk's size is in [1, stride]
      val (_, _, lastStart, lastN) = sorted.last
      assert(lastN >= 1 && lastN <= 48, s"doc $doc: final chunk size $lastN")
      // every earlier chunk is full-width or reaches the doc's end
      // (doc end = lastStart + lastN) — i.e., the tiling has no gaps
      sorted.dropRight(1).foreach { case (_, _, s0, n0) =>
        assert(n0 == 64 || s0 + n0 == lastStart + lastN, s"doc $doc: gap after chunk at $s0")
      }
    }
  }

  test("packing partitions doc order per shard and conserves tokens") {
    val bins = SparkEntry.queries("d24_packing")(spark, sfDir)
      .select("source", "bin", "n_docs", "bin_tokens", "first_doc", "last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val docs = Tables(spark, sfDir).documents
      .select(col("source"), graft.functions.TextAnalysis.bpeTokenCount(col("text")).as("tok"))
      .groupBy("source").agg(count(lit(1)).as("n"), sum("tok").as("tot"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    bins.groupBy(_._1).foreach { case (src, bs) =>
      val sorted = bs.sortBy(_._2)
      // bins cover all docs and all tokens of the shard
      assert(sorted.map(_._3).sum == docs(src)._1, s"$src: doc count mismatch")
      assert(sorted.map(_._4).sum == docs(src)._2, s"$src: token sum mismatch")
      // doc-id ranges are disjoint and ordered with the bins
      sorted.sliding(2).foreach {
        case Array((_, b1, _, _, _, l1), (_, b2, _, _, f2, _)) =>
          assert(b1 < b2 && l1 < f2, s"$src: bins $b1/$b2 overlap or disorder")
        case _ => ()
      }
    }
  }
}
