package graft

import graft.sources.Layout
import java.nio.file.Files
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val dir = Files.createTempDirectory("graft_buckets").toString
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o")
    val items  = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "it")
    Layout.bucketize(orders, "b_orders", s"$dir/o", "key", 8)
    Layout.bucketize(items, "b_items", s"$dir/i", "key", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path (these test tables are broadcast-sized;
    // the bucket win is for fact-x-fact joins neither side can broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.table(spark, "b_orders")
        .join(Layout.table(spark, "b_items"), "key")
      assert(joined.count() == 3000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected bucket sort-merge join:\n$plan")

      // and a pre-aggregation on the bucket key is shuffle-free too
      val agg  = Layout.table(spark, "b_items").groupBy($"key").agg(count(lit(1)))
      assert(agg.count() == 1000)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }

  test("hive-partitioned writes prune partitions at scan time") {
    val dir = Files.createTempDirectory("graft_part").toString
    val docs = (1L to 300L)
      .map(i => (i, s"doc $i", Seq("en", "de", "fr")((i % 3).toInt)))
      .toDF("doc_id", "text", "lang")
    docs.write.partitionBy("lang").parquet(s"$dir/documents")
    val filtered = spark.read.parquet(s"$dir/documents").filter($"lang" === "de")
    // materialize the INSPECTED plan (a separate .count() would build its
    // own QueryExecution and leave this plan's metrics at zero, making
    // the numFiles assert below pass vacuously — ADVICE r4)
    val qe = filtered.queryExecution
    assert(qe.executedPlan.execute().count() == 100)
    val scans = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // the lang predicate must become a PARTITION filter (directory
    // pruning — 1/3 of the files ever opened), not a data filter
    assert(
      scans.head.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang not pruned as a partition filter: ${scans.head.partitionFilters}")
    val numFiles = scans.head.metrics("numFiles").value
    val allFiles = spark.read.parquet(s"$dir/documents").inputFiles.length
    assert(numFiles < allFiles, s"scan read $numFiles of $allFiles files — no pruning")
  }
}
