package graft

import graft.model.{Catalog, Schemas}
import java.nio.file.Files
import org.apache.spark.sql.functions.{col, expr, max, min}

/** Schema round-trip — the analog of the reference's only CI guarantee
  * (migration-integrity smoke test, /root/reference/test/test_tantalus.sh).
  */
class CatalogSpec extends SparkTestBase {

  test("all 34 catalog tables round-trip parquet with identical schemas") {
    val dir = Files.createTempDirectory("graft_catalog").toString
    val cat = Catalog.empty(spark)
    assert(cat.tables.size == 34)
    cat.save(dir, partitioning = Map.empty) // empty partitioned dirs are unreadable
    val back = Catalog.load(spark, dir)
    Schemas.all.foreach { case (name, expected) =>
      val got = back(name).schema
      assert(
        got.fields.map(f => (f.name, f.dataType)).toSeq ==
          expected.fields.map(f => (f.name, f.dataType)).toSeq,
        s"schema drift in $name")
    }
  }

  test("historical twin appends the simple_history columns") {
    val h = Schemas.historical(Schemas.tag)
    assert(h.fieldNames.takeRight(4).toSeq ==
      Seq("history_id", "history_date", "history_type", "history_user_id"))
    assert(h.fieldNames.take(3).toSeq == Schemas.tag.fieldNames.toSeq)
  }

  test("unknown table access fails loudly") {
    intercept[NoSuchElementException] { Catalog.empty(spark)("nope") }
  }

  test("compact rewrites a fragmented table into few sorted files, content preserved") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate micro-batch ingest: 40 tiny files
    (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .repartition(40).write.parquet(dir)
    assert(new java.io.File(dir).list().count(_.endsWith(".parquet")) == 40)
    val out = Catalog.compact(spark, dir, Seq("id"))
    val files = new java.io.File(out).list().count(_.endsWith(".parquet"))
    assert(files < 40, s"expected compaction, got $files files")
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.select("id").as[Long].collect().toSet == (1L to 1000L).toSet)
    // range-clustered: each file's ids are an interval disjoint from others
    val perFile = back
      .select(col("id"), expr("input_file_name()").as("f"))
      .groupBy("f").agg(min("id").as("lo"), max("id").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    perFile.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, "file ranges overlap")
      case _                              => ()
    }
  }

  test("hot tables save hive-partitioned by their dominant filter column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_catalog_part").toString
    val ds = Seq(
      (1L, "d1", "BAM"), (2L, "d2", "FQ"), (3L, "d3", "BAM"),
    ).toDF("id", "name", "dataset_type")
    Catalog(spark, Map("sequence_dataset" -> ds)).save(dir)
    val dirs = new java.io.File(s"$dir/sequence_dataset").list().toSet
    assert(dirs.exists(_.startsWith("dataset_type=BAM")))
    assert(dirs.exists(_.startsWith("dataset_type=FQ")))
    // partition pruning: a type filter reads one partition only
    val back = spark.read.parquet(s"$dir/sequence_dataset")
    assert(back.filter($"dataset_type" === "BAM").count() == 2)
  }
}
