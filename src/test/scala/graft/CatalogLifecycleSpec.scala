package graft

import graft.model.{Catalog, Schemas}
import graft.operators.{Ops, WritePath}
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** End-to-end catalog lifecycle on tantalus-shaped entities — the
  * workflows a reference user actually runs (SURVEY §3): register
  * datasets, tag them, search with conjunctive tags + exclusion, soft
  * delete with cascade, append history and diff versions. Exercises the
  * entity model + WritePath + Ops together, not via the TPC-H analogy.
  */
class CatalogLifecycleSpec extends SparkTestBase {
  import spark.implicits._

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("tag workflow: search by conjunctive tags + exclusion, then bulk-tag (forms.py:537-682)") {
    // datasets 1..4; tags: 1,2 have {pA,pB}; 3 has {pA}; 4 has {pA,pB,bad}
    val bridge = Seq(
      (1L, "pA"), (1L, "pB"),
      (2L, "pA"), (2L, "pB"), (2L, "pA"), // duplicate link must not break division
      (3L, "pA"),
      (4L, "pA"), (4L, "pB"), (4L, "bad"),
    ).toDF("sequence_dataset_id", "tag_name")

    // conjunctive membership {pA,pB} minus exclusion {bad}
    val both = Ops.division(bridge, "sequence_dataset_id", "tag_name", Seq("pA", "pB"))
    val hits = Ops
      .antiJoin(
        both,
        bridge.filter($"tag_name" === "bad"),
        both("sequence_dataset_id") === bridge("sequence_dataset_id"))
      .as[Long].collect().toSet
    assert(hits == Set(1L, 2L))

    // bulk-tag the result set (M2: append + dedup on pair)
    val tagged = WritePath.bridgeAdd(
      bridge.select($"sequence_dataset_id", $"tag_name"),
      hits.toSeq.toDF("sequence_dataset_id").withColumn("tag_name", lit("curated")))
    assert(tagged.filter($"tag_name" === "curated").count() == 2)
    // idempotent: re-adding changes nothing
    assert(
      WritePath.bridgeAdd(tagged, hits.toSeq.toDF("sequence_dataset_id")
        .withColumn("tag_name", lit("curated"))).count() == tagged.count())
  }

  test("soft-delete cascade + visibility asymmetry (api/views.py:164-174, models.py:380-385 vs 567-572)") {
    val instances = df(
      Schemas.fileInstance,
      Row(1L, 10L, 100L, false, 1L),
      Row(2L, 10L, 101L, false, 1L),
      Row(3L, 11L, 100L, false, 1L))
    // deleting file_resource 100 flags its instances in every storage
    val deleted = Seq(100L).toDF("file_resource_id")
    val after   = WritePath.softDeleteCascade(instances, deleted, "file_resource_id")
    val flags   = after.select($"id", $"is_deleted").as[(Long, Boolean)].collect().toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> true))
    // storage-name listing filters deleted (models.py:380-385)...
    assert(after.filter(!$"is_deleted").count() == 1)
    // ...while the dataset-level count does not (models.py:567-572)
    assert(after.count() == 3)
  }

  test("history append + latest-row + lag diff (simple_history; services.py:4-78)") {
    val hist0 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      Schemas.historical(Schemas.curation))
    def curRow(version: String, ts: Long) = df(
      Schemas.curation,
      Row(1L, "cur1", "desc", version, new Timestamp(1000), new Timestamp(ts), 1L, 1L))
    val h1 = WritePath.historyAppend(hist0, curRow("v1.0.0", 2000), "+", new Timestamp(2000))
    val h2 = WritePath.historyAppend(h1, curRow("v2.0.0", 3000), "~", new Timestamp(3000))
    assert(h2.count() == 2)

    // W2: latest history row per entity
    val latest = Ops.latestPerKey(h2, Seq($"id"), Seq($"history_date"))
    assert(latest.select($"version").as[String].head() == "v2.0.0")

    // W3: lag diff shows the version transition
    val diff = Ops.lagDiff(
      h2.withColumn("vnum", regexp_extract($"version", "v(\\d+)", 1).cast("long")),
      Seq($"id"), Seq($"history_date"), $"vnum", "bump")
    assert(diff.filter($"bump" === 1).count() == 1)
  }

  test("curation version rewrite (M5, views.py:1076-1128)") {
    val old = Seq((1L, 10L), (1L, 11L)).toDF("curation_id", "sequence_dataset_id")
    val neu = Seq((1L, 11L), (1L, 12L)).toDF("curation_id", "sequence_dataset_id")
    val diff = WritePath.curationDiff(old, neu)
      .as[(Long, Long, String)].collect().map(r => (r._2, r._3)).toSet
    assert(diff == Set((10L, "deleted"), (11L, "unchanged"), (12L, "added")))
    val rewritten = WritePath.curationRewrite(
      neu.withColumn("version", lit("v1.0.0")), "version", "v2.0.0")
    assert(rewritten.select($"version").distinct().as[String].collect().toSeq == Seq("v2.0.0"))
  }

  test("storage filepath resolution across polymorphic storages (models.py:822-883)") {
    val storages = df(
      Schemas.storage,
      Row(10L, "shahlab", "server", "10.0.0.1", "/data", "svc", null, null, null),
      Row(11L, "azblob", "blob", null, null, null, "acct", "cont", null),
      Row(12L, "aws", "s3", null, null, null, null, null, "bkt"))
    val resources = df(Schemas.fileResource,
      Row(100L, "/a/b.bam", "md5x", 10L, new Timestamp(0), new Timestamp(0), false, 1L))
    val paths = storages
      .crossJoin(resources)
      .withColumn("clean", regexp_replace($"filename", "^/+", ""))
      .withColumn(
        "filepath",
        when($"storage_type" === "server", concat_ws("/", $"storage_directory", $"clean"))
          .when($"storage_type" === "blob",
            concat_ws("/", $"storage_account", $"storage_container", $"clean"))
          .otherwise(concat_ws("/", $"bucket", $"clean")))
      .select($"name", $"filepath").as[(String, String)].collect().toMap
    assert(paths == Map(
      "shahlab" -> "/data/a/b.bam",
      "azblob"  -> "acct/cont/a/b.bam",
      "aws"     -> "bkt/a/b.bam"))
  }
}
