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

  test("Xlsx writes and reads a real multi-sheet workbook (S3/S5)") {
    val d = tmp()
    val wb = s"$d/upload.xlsx"
    graft.sources.Xlsx.write(wb, Seq(
      "patients" -> Seq(
        Seq(" Sample_ID ", "Case ID", "Reference ID"),
        Seq("SA1", "c1", "r1"),
        Seq("SA2", null, "r2"), // sparse cell — skipped by the writer
        Seq("SA3", "c3", "r3")),
      "notes" -> Seq(
        Seq("Comment"),
        Seq("no key column here"))))
    // raw rows preserve sparsity as nulls
    val sheets = graft.sources.Xlsx.readSheets(wb)
    assert(sheets.map(_._1) == Seq("patients", "notes"))
    assert(sheets.head._2(2) == Seq("SA2", null, "r2"))
    // DF view folds headers like readSheetCsv; sheet filter mirrors utils.py:6-24
    val dfs = graft.sources.Xlsx.readSheetDfs(spark, wb).toMap
    assert(dfs("patients").columns.toSeq == Seq("sample_id", "case id", "reference id"))
    assert(dfs("patients").count() == 3)
    val kept = graft.sources.Xlsx.sheetsWith(spark, wb, "sample_id")
    assert(kept.map(_._1) == Seq("patients"))
    // validation runs the same S3 path as CSV uploads
    val e = intercept[IllegalArgumentException] {
      Sources.validateOrThrow(dfs("patients"), col("case id").isNotNull, "patient upload")
    }
    assert(e.getMessage.contains("patient upload"))
  }

  test("Xlsx reads shared-string cells and A1-gap addressing") {
    // hand-built workbook exercising the shared-string type and a cell
    // that skips columns via its A1 ref (C1 with no B1)
    val d  = tmp()
    val wb = s"$d/shared.xlsx"
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val zos = new ZipOutputStream(new java.io.FileOutputStream(wb))
    def entry(n: String, c: String): Unit = {
      zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    entry("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2"><si><t>hello</t></si><si><t>world</t></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row><row r="2"><c r="A2"><v>42</v></c></row></sheetData></worksheet>""")
    zos.close()
    val rows = graft.sources.Xlsx.readSheets(wb).head._2
    assert(rows(0) == Seq("hello", null, "world")) // B1 gap materialized as null
    assert(rows(1) == Seq("42", null, null))       // numeric cell, padded to width
  }

  test("exportCsvPartitioned writes one file per partition (scale path)") {
    val d  = tmp()
    val df = (1L to 100L).toDF("id").repartition(4)
    Sources.exportCsvPartitioned(df, s"$d/out")
    val parts = new java.io.File(s"$d/out").listFiles.count(_.getName.endsWith(".csv"))
    assert(parts == 4, s"expected 4 part files, got $parts")
    val back = spark.read.option("header", "true").csv(s"$d/out")
    assert(back.count() == 100)
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
