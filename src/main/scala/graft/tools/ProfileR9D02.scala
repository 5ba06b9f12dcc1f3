package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 d02 stage split + verify-join strategy A/B, quiet box. */
object ProfileR9D02 {
  def verifyHash(cand: DataFrame, arrs: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val sets = arrs.select(col(idCol), col("set"), col("n"))
    cand
      .join(sets.select(col(idCol).as("id1"), col("set").as("set1"), col("n").as("n1")).hint("shuffle_hash"), "id1")
      .join(sets.select(col(idCol).as("id2"), col("set").as("set2"), col("n").as("n2")).hint("shuffle_hash"), "id2")
      .withColumn("inter", graft.functions.ShingleExpressions.sortedIntersectCount(col("set1"), col("set2")))
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id1"), col("id2"), col("jac"))
  }

  def main(args: Array[String]): Unit = {
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val ms    = if (args.isEmpty) Seq(20, 80) else args.map(_.toInt).toSeq
    ms.foreach { m =>
      val dir = s"/tmp/graft_scale/m$m"
      graft.Caches.scoped(spark) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
        }
        val arrs     = Dedup.shingleArrays(docs, "doc_id", "text", 3).persist()
        arrs.count()
        val cand     = Dedup.prefixCandidates(arrs, "doc_id", 0.5).persist()
        val (nc, tC) = timed(cand.count())
        val (n1, tSmj)  = timed(Dedup.verifyJaccard(cand, arrs, "doc_id", 0.5).queryExecution.toRdd.count())
        val (n2, tHash) = timed(verifyHash(cand, arrs, "doc_id", 0.5).queryExecution.toRdd.count())
        require(n1 == n2, s"strategy changed results: $n1 vs $n2")
        println(f"[d02ab] m=$m%-3d cand=$tC%6.2fs($nc) verifySMJ=$tSmj%6.2fs verifyHASH=$tHash%6.2fs rows=$n1")
        cand.unpersist(); arrs.unpersist()
      }
    }
    spark.stop()
  }
}
