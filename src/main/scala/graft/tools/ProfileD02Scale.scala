package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch: decompose d02's cost at the m=80 probe scale (not part of
  * the API). Reuses /tmp/graft_scale/m80 written by ProfileR6Scale.
  */
object ProfileD02Scale {
  def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/graft_scale/m80/documents.parquet")
    def tm(name: String)(f: => Long): Unit = {
      val g0 = gcMs; val t0 = System.nanoTime(); val n = f
      println(f"[d02s] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs gc=${gcMs - g0}%6d ms rows=$n")
    }
    for (p <- 1 to 3) {
      tm(s"d02-as-wired-pass$p") {
        val n = graft.Caches.scoped(spark) {
          Dedup.jaccardPairs(
            Dedup.shingleArrays(docs, "doc_id", "text", 3).persist(), "doc_id", 0.5).count()
        }
        n
      }
    }
    spark.stop()
  }
}
