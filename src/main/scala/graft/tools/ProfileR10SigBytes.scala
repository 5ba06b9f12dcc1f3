package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Round-10 check on the sf1-bench outlier attribution: the claim is
  * that d03/d16/d32's above-linear sf1 ratios are partly an AMPLIFIER
  * artifact — `scaledDocs` suffixes every token with a copy marker, so
  * the MD5 bytes fed per shingle grow and the signature pass costs
  * more per doc at amplified rungs. This times the full signature
  * pipeline (tokens → shingle set → per-row MinHash bands) on the
  * SAME 5k base documents vs a marker-suffixed copy of the SAME rows —
  * identical row count, token count, and plan; only byte length
  * differs — alternating order across reps.
  */
object ProfileR10SigBytes {
  def main(args: Array[String]): Unit = {
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val base  = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").persist()
    val marked = base
      .withColumn("text", regexp_replace(col("text"), "([^\\s]+)", "$1u10v"))
      .persist()
    base.count(); marked.count()
    def bytesOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(length(col("text")))).head().getLong(0)
    println(s"[sigbytes] base bytes=${bytesOf(base)} marked bytes=${bytesOf(marked)}")
    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      Dedup
        .rowMinhashBands(Dedup.shingleArrays(df, "doc_id", "text", 3), "doc_id", 16, 2)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    run(base) // warm-up
    (1 to reps).foreach { rep =>
      val order = if (rep % 2 == 1) Seq("base" -> base, "marked" -> marked)
                  else Seq("marked" -> marked, "base" -> base)
      val ts = order.map { case (tag, df) => tag -> run(df) }.toMap
      println(f"[sigbytes] rep=$rep base=${ts("base")}%6.2fs marked=${ts("marked")}%6.2fs ratio=${ts("marked") / ts("base")}%5.2f")
    }
    spark.stop()
  }
}
