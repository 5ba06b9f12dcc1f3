package graft

import graft.similarity.Knn
import org.apache.spark.sql.functions._

/** Randomized MODEL-BASED test of the IVF index lifecycle — the
  * vector twin of LifecycleModelSpec: a random interleaving of
  * append / delete / compact operations runs against both the
  * persisted index and a plain in-memory model of the live vector
  * set, checking after EVERY operation that `ivfTopK` at
  * `probes = K` (which degenerates to the exact brute ranking —
  * spec-pinned in DedupKnnSpec) equals `bruteTopK` over exactly the
  * model's live vectors. probes = K removes the recall dimension
  * from the check, so any divergence is a LIFECYCLE bug (lost
  * append, leaked tombstone, compaction corruption), not an ANN
  * approximation artifact.
  *
  * The generator respects the enforced caller contract (no re-append
  * or cross-batch re-delete of a still-tombstoned id — refusals are
  * pinned in DedupKnnSpec) but interleaves adversarially: deletes
  * hit any live vector including just-appended ones, compactions
  * land at random points and re-open ids, which MAY then re-ingest.
  */
class IvfLifecycleModelSpec extends SparkTestBase {
  import spark.implicits._

  test("random IVF append/delete/compact interleavings: ivfTopK(probes=K) == brute over the model after every op") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap // vec_id -> embedding (the id/vector pool)
    val cents = emb.toSeq.sortBy(_._1).take(8) // frozen 8-centroid model seeds
    val centsDf = cents.toDF("vec_id", "embedding")
      .select(col("vec_id").as("c_id"), Knn.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))

    for (seed <- Seq(5, 31)) {
      val rnd  = new scala.util.Random(seed)
      val name = s"t_ivflcm_$seed"
      val dir  = java.nio.file.Files.createTempDirectory("graft_ivflcm").toString
      val pool = rnd.shuffle(emb.keys.toSeq).iterator // unseen ids to draw appends from

      val live   = scala.collection.mutable.Map[Long, Seq[Float]]()
      val tombed = scala.collection.mutable.Set[Long]()
      val freeIds = scala.collection.mutable.Set[Long]()

      def freshBatch(n: Int): Seq[(Long, Seq[Float])] = {
        val reuse = freeIds.take(if (rnd.nextBoolean()) rnd.nextInt(n + 1) else 0).toSeq
        reuse.foreach(freeIds.remove)
        val fresh = (0 until (n - reuse.size)).flatMap(_ => if (pool.hasNext) Seq(pool.next()) else Nil)
        (reuse ++ fresh).map(id => id -> emb(id))
      }

      val init = freshBatch(24)
      Knn.writeIvfIndex(
        init.toDF("vec_id", "embedding"), centsDf, "vec_id", "embedding", name, dir, buckets = 4)
      live ++= init

      val queries = init.take(3).toDF("vec_id", "embedding")
      def check(op: String): Unit = {
        val got = Knn.ivfTopK(spark, name, queries, "vec_id", "embedding", k = 4, probes = 8)
          .select(col("q_id"), col("n_id"), col("rank"), col("cos"))
          .as[(Long, Long, Long, Double)].collect().toSeq.sorted
        val exp = Knn.bruteTopK(
          queries, live.toSeq.sortBy(_._1).toDF("vec_id", "embedding"), "vec_id", "embedding", k = 4)
          .as[(Long, Long, Long, Double)].collect().toSeq.sorted
        assert(got == exp, s"seed=$seed after $op: ivfTopK diverged from brute over the live model")
      }
      check("build")

      try {
        var batchId = 0L
        for (step <- 1 to 8) {
          batchId += 1
          rnd.nextInt(7) match {
            case 0 | 1 =>
              val batch = freshBatch(1 + rnd.nextInt(4))
              if (batch.nonEmpty) {
                Knn.appendIvfBatch(
                  batch.toDF("vec_id", "embedding"), "vec_id", "embedding", name, batchId)
                live ++= batch
                check(s"append#$step")
              }
            case 2 =>
              // never delete a query vector's own id — queries must
              // keep retrieving (you can always search WITH a deleted
              // vector, but the check's query set stays stable).
              // Deletes randomly carry their vectors (r15 mask path —
              // retirement reads the touched buckets from the slim
              // set) or ids only (trace-scan fallback), so the random
              // interleavings cover BOTH retirement inputs, including
              // mixed mask/null tombstone sets (which must distrust
              // the masks wholesale and trace-scan).
              val qIds = init.take(3).map(_._1).toSet
              val victims = rnd.shuffle(live.keys.toSeq.filterNot(qIds)).take(1 + rnd.nextInt(3))
              if (victims.nonEmpty) {
                if (rnd.nextBoolean())
                  Knn.deleteIvfBatch(
                    victims.map(id => id -> emb(id)).toDF("vec_id", "embedding"),
                    "vec_id", name, batchId, vecCol = Some("embedding"))
                else
                  Knn.deleteIvfBatch(victims.toDF("vec_id"), "vec_id", name, batchId)
                victims.foreach { id => live.remove(id); tombed += id }
                check(s"delete#$step")
              }
            case 3 =>
              Knn.compactIvfIndex(spark, name)
              freeIds ++= tombed; tombed.clear()
              check(s"compact#$step")
            case 4 => // retire (r15): same model effect as compact,
              // via bucket-scoped rewrites of the traced cells only
              Knn.retireIvfTombstones(spark, name)
              freeIds ++= tombed; tombed.clear()
              check(s"retire#$step")
            case 5 => // bucket-scoped defrag (r15): query-invisible
              Knn.compactFragmentedIvfBuckets(spark, name, maxFilesPerBucket = 1)
              check(s"bucket-defrag#$step")
            case 6 => // bucket-count migration (round 16): same model
              // effect as compact — survivors carried, set cleared —
              // under a NEW cell-bucket count (model frozen; delete-
              // time cb masks retire with the set, so later deletes
              // mask under the new modulus)
              Knn.rebucketIvfIndex(spark, name, newBuckets = Seq(2, 4, 8, 16)(rnd.nextInt(4)))
              freeIds ++= tombed; tombed.clear()
              check(s"rebucket#$step")
          }
        }
        Knn.compactIvfIndex(spark, name)
        freeIds ++= tombed; tombed.clear()
        check("final-compact")
      } finally Knn.dropIvfIndex(spark, name)
    }
  }
}
