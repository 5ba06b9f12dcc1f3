package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic per-query profiler (dev tool): `runMain graft.tools.ProfileQ
  * d34_dup_ngrams d41_source_overlap` times each named SparkEntry query
  * at sf0.1 (min of 3 passes, scoped cache cleared between passes).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      var n  = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        n = graft.Caches.scoped(spark)(fn(spark, dir).count())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s ${ts.min}%8.2fs  (${ts.map(x => f"$x%.2f").mkString(" ")})  rows=$n")
    }
    spark.stop()
  }
}
