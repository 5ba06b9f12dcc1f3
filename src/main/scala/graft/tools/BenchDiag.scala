package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Diagnostic bench (dev tool): prints per-query wall time AND
  * accumulated JVM GC time for both passes, to separate inherent query
  * cost from run-position-dependent degradation (heap/listener/shuffle
  * accumulation).
  */
object BenchDiag {
  def gcMs: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime)
      .sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    for (pass <- 1 to 2) {
      ordered.foreach { case (name, fn) =>
        val g0 = gcMs
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable => println(s"ERR $name: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        val dg = gcMs - g0
        spark.catalog.clearCache()
        println(f"DIAG pass=$pass $name%-26s ${dt}%8.3f s  gc=${dg}%5d ms  heapMB=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1024 / 1024}%6d")
      }
    }
    spark.stop()
  }
}
