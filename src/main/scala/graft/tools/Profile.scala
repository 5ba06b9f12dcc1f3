package graft.tools

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level profiler for the near-dup pipeline (dev tool, not
  * part of the driver contract). Times each sub-stage of d02/d03/d12 at
  * the given SF dir so optimization targets the real bottleneck.
  */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r  = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    // warm-up: JVM/codegen
    t.documents.count()

    val arrs = time("shingleArrays") {
      val a = Dedup.shingleArrays(t.documents, "doc_id", "text", 3).persist()
      a.count()
      a
    }
    val sh = Dedup.explodeShingles(arrs, "doc_id")
    val cand = time("prefixCandidates") {
      val c = Dedup.prefixCandidates(arrs, "doc_id", 0.5).persist()
      c.count()
      c
    }
    val pairs = time("verifyJaccard") {
      val p = Dedup.verifyJaccard(cand, arrs, "doc_id", 0.5).persist()
      p.count()
      p
    }
    time("dedupComponents") {
      Dedup.dedupComponents(pairs).count()
    }
    time("minhashSignatures") {
      Dedup.minhashSignatures(sh, "doc_id", 16).count()
    }
    time("minhashSignaturesAgg") {
      Dedup.minhashSignaturesAgg(sh, "doc_id", 16).count()
    }
    time("lsh full") {
      val c = Dedup.lshCandidates(
        Dedup.lshBands(Dedup.minhashSignatures(sh, "doc_id", 16), "doc_id", 2),
        "doc_id")
      Dedup.verifyJaccard(c, arrs, "doc_id", 0.5).count()
    }
    spark.stop()
  }
}
