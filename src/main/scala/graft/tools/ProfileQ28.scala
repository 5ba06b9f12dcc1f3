package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileQ28 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    tm("warmup scan")(t.events.count())
    tm("scan props only")(t.events.select("props").count())
    tm("scan+1x json project")(t.events.select(get_json_object(col("props"), "$.k").as("k")).count())
    tm("scan+json filter (as q28)")(graft.operators.SetScalarQueries.q28_json_extract(spark, "/root/testdata/sf0.1").count())
    tm("from_json variant")(t.events.select(from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))).getField("k").as("k")).filter(col("k").isNotNull && col("k") % 10 === 0).count())
    spark.stop()
  }
}
