package graft.tools

import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-round-15 IVF retirement ladder: price the delete-time
  * cell-bucket MASK path (a vector-carrying `deleteIvfBatch` stores
  * the cell's bucket on the tombstone row — retirement reads its
  * touched set from the slim set alone) against the ids-only TRACE
  * SCAN fallback (retirement semi-joins the whole ivf table to find
  * the buckets).
  *
  * Protocol, per rung (m20 / m80, 32-bucket scaled-model IVF index —
  * the production regime from ProfileR13Ivf): alternate tiny
  * append+delete+retire cycles, deletes carrying vectors (mask) vs
  * ids only (trace), `reps` of each; report per-mode minima and the
  * m80/m20 exponent. Claim: the mask path is FLAT in corpus size
  * (touched buckets only), the trace scan carries an O(index) term
  * that grows with m — the measured justification for threading
  * `vecCol` through the unified curation delete.
  *
  * Usage: tools/run_ladder.sh graft.tools.ProfileR15IvfMask
  *        (SPARK_GRAFT_REPS cycles per mode, default 3)
  * Requires /tmp/graft_scale/m{20,80} from ProfileR6Scale.
  */
object ProfileR15IvfMask {
  def main(args: Array[String]): Unit = {
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    import spark.implicits._

    def name(m: Int) = s"r15ivfmask_m$m"
    def build(m: Int): Unit = {
      val e = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      // the scaled-model regime (ProfileR13Ivf): centroid count grows
      // with the corpus so avg cell population stays constant
      val copies = if (m == 20) 2 else 8
      val cs = e
        .filter(col("vec_id") % 10000000L < 8 && col("vec_id") < copies * 10000000L)
        .select(col("vec_id").as("c_id"), Knn.asDouble(col("embedding")).as("cv"))
        .withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))
      Knn.writeIvfIndex(
        e, cs, "vec_id", "embedding", name(m),
        s"/tmp/graft_scale_idx/r15ivfmask_m$m", buckets = 32)
    }

    // the tiny batch is a LOCAL frame (interactive deletes arrive as
    // literals; a corpus fetch would time the wrong thing) — vectors
    // copied from the base embeddings once per rung
    def probeBatch(m: Int, step: Long): DataFrame = {
      val rows = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
        .filter(col("vec_id") < 2)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
        .map { case (id, v) => (9200000000L + step * 10 + id, v) }
      rows.toDF("vec_id", "embedding")
    }

    Seq(20, 80).foreach(build)
    var batchId = 0L
    for (m <- Seq(20, 80)) {
      def cycle(masked: Boolean, step: Long): Double = {
        val batch = probeBatch(m, step)
        batchId += 1
        Knn.appendIvfBatch(batch, "vec_id", "embedding", name(m), batchId)
        batchId += 1
        if (masked)
          Knn.deleteIvfBatch(batch, "vec_id", name(m), batchId, vecCol = Some("embedding"))
        else
          Knn.deleteIvfBatch(batch.select(col("vec_id")), "vec_id", name(m), batchId)
        val t0 = System.nanoTime()
        val k = Knn.retireIvfTombstones(spark, name(m)).size
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[r15ivfmask] m=$m%-3d ${if (masked) "mask " else "trace"} buckets=$k%2d t=$t%7.3fs")
        t
      }
      var step = 0L
      val mask  = (1 to reps).map { _ => step += 1; cycle(masked = true, step) }
      val trace = (1 to reps).map { _ => step += 1; cycle(masked = false, step) }
      println(f"[r15ivfmask] m=$m%-3d MIN mask=${mask.min}%7.3fs trace=${trace.min}%7.3fs " +
        f"trace/mask=${trace.min / mask.min}%5.2f")
    }
    Seq(20, 80).foreach(m => Knn.dropIvfIndex(spark, name(m)))
    spark.stop()
  }
}
