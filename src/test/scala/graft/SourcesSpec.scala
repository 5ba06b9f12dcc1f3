package graft

import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_src").toString

  test("readSheetCsv lower-cases and trims headers (S5)") {
    val d = tmp()
    Files.writeString(
      java.nio.file.Path.of(d, "sheet.csv"),
      "Sample_ID , Tissue\nSA1,liver\nSA2,brain\n")
    val df = Sources.readSheetCsv(spark, s"$d/sheet.csv")
    assert(df.columns.toSeq == Seq("sample_id", "tissue"))
    assert(df.count() == 2)
  }

  test("sheetsWith keeps only sheets containing the key column (S5)") {
    val d = tmp()
    Files.writeString(java.nio.file.Path.of(d, "a.csv"), "sample_id,x\n1,2\n")
    Files.writeString(java.nio.file.Path.of(d, "b.csv"), "other,x\n1,2\n")
    val kept = Sources.sheetsWith(spark, Seq(s"$d/a.csv", s"$d/b.csv"), "sample_id")
    assert(kept.map(_._1) == Seq(s"$d/a.csv"))
  }

  test("validateOrThrow passes clean data and rejects violations (S3)") {
    val ok  = Seq("SA1", "SA2").toDF("patient_id")
    val bad = Seq("SA1", "XX9").toDF("patient_id")
    Sources.validateOrThrow(ok, col("patient_id").startsWith("SA"), "patient upload")
    val e = intercept[IllegalArgumentException] {
      Sources.validateOrThrow(bad, col("patient_id").startsWith("SA"), "patient upload")
    }
    assert(e.getMessage.contains("patient upload"))
  }

  test("tsvCells extracts positional cells from a given line (S6)") {
    val d = tmp()
    val rows = (0 until 30).map(i => s"r$i-c0\tr$i-c1\tr$i-c2").mkString("\n")
    Files.writeString(java.nio.file.Path.of(d, "t.tsv"), rows)
    assert(Sources.tsvCells(spark, s"$d/t.tsv", 27, Seq(1, 2)) == Seq("r27-c1", "r27-c2"))
  }

  test("exportCsv round-trips with header; template is header-only (S7/S9)") {
    val d  = tmp()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Sources.exportCsv(df, s"$d/out")
    val back = spark.read.option("header", "true").csv(s"$d/out")
    assert(back.columns.toSeq == Seq("id", "name") && back.count() == 2)
    Sources.exportCsvTemplate(
      spark,
      StructType(Seq(StructField("x", StringType), StructField("y", StringType))),
      s"$d/tpl")
    val tpl = spark.read.option("header", "true").csv(s"$d/tpl")
    assert(tpl.columns.toSeq == Seq("x", "y") && tpl.count() == 0)
  }

  test("nestedJson emits dim attributes as a struct + json (S10)") {
    val fact = Seq((1L, 10L), (2L, 99L)).toDF("fid", "fk")
    val dim  = Seq((10L, "ten")).toDF("pk", "label")
    val got = Sources.nestedJson(fact, dim, ("fk", "pk"), ("d", Seq("pk", "label")))
    val row = got.filter(col("fid") === 1).select("json").as[String].head()
    assert(row.contains("\"label\":\"ten\""))
    // left join: missing dim yields struct of nulls, row survives
    assert(got.count() == 2)
  }
}
