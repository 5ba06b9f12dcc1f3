package graft.tools

import graft.{Graft, Tables}
import graft.similarity.Knn
import org.apache.spark.sql.functions._

/** Round-11: measure d48's IVF-probed vector-arm recall@50 against the
  * exact brute-force top-50 (the e06 pattern) for the first 5 query
  * vectors, at sf0.001 and sf0.01 — the measured floor the
  * RetrievalSpec gate pins.
  */
object ProfileR11Recall {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("local[8]", shufflePartitions = 8)
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val t = Tables(spark, sf)
      val e = t.embeddings
        .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", Knn.norm(col("v")))
      val cents = e
        .filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      val indexed = Knn.indexCorpus(t.embeddings, cents, "vec_id", "embedding").persist()
      val recalls = (0L until 5L).map { qid =>
        val q      = e.filter(col("vec_id") === qid)
        val qCells = Knn.assignCellsMulti(q, cents, "vec_id", probes = 3).select(col("cell"))
        val probed = indexed
          .join(broadcast(qCells), Seq("cell"))
          .crossJoin(broadcast(q.select(col("v").as("qv"), col("nrm").as("qn"))))
          .filter(col("n_id") =!= qid)
          .withColumn("cos", Knn.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
          .orderBy(col("cos").desc, col("n_id"))
          .limit(50)
          .select("n_id").as[Long].collect().toSet
        val exact = Knn
          .bruteTopK(t.embeddings.filter(col("vec_id") === qid), t.embeddings, "vec_id", "embedding", 50)
          .select("n_id").as[Long].collect().toSet
        probed.intersect(exact).size.toDouble / exact.size
      }
      println(f"RECALLS $sf: ${recalls.map(r => f"$r%.3f").mkString(", ")} min=${recalls.min}%.3f")
      indexed.unpersist()
    }
    spark.stop()
  }
}
