package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Minimal .xlsx reader/writer on JDK-only parts (java.util.zip + the
  * platform XML parser) — no new dependencies.
  *
  * The reference ingests operator-UPLOADED workbooks
  * (/root/reference/tantalus/forms.py:112-183 via openpyxl;
  * /root/reference/tantalus/utils.py:6-24 multi-sheet), i.e. files that
  * are human-sized by construction (KBs–MBs). So the parse runs on the
  * driver and the resulting rows are parallelized with
  * `createDataFrame` — the right scale split: the 100 TB side of every
  * upload flow is the catalog tables the upload joins against (see
  * `SourceQueries.s13_sheet_ingest`), never the workbook itself.
  *
  * Supported surface (what the reference's workbooks actually use):
  * shared strings, inline strings, number/str cell types, sparse rows
  * via A1-style cell references, multiple sheets. First row is the
  * header; header names fold to trimmed lowercase exactly like
  * `Sources.readSheetCsv` (utils.py:20).
  */
object Xlsx {

  /** Sheet name → rows of string cells (header NOT yet stripped).
    * Cells absent from the file come back as null; trailing all-null
    * cells are padded so every row has header width.
    */
  def readSheets(path: String): Seq[(String, Seq[Seq[String]])] = {
    val zf = new ZipFile(path)
    try {
      def doc(name: String): Option[Element] =
        Option(zf.getEntry(name)).map { e =>
          val db = DocumentBuilderFactory.newInstance()
          db.setNamespaceAware(false)
          // This is the documented ingest path for operator-UPLOADED
          // workbooks, i.e. untrusted XML: refuse DOCTYPEs outright
          // (kills both XXE file disclosure/SSRF and billion-laughs
          // entity expansion) and belt-and-braces the entity/XInclude
          // switches for parsers that ignore the first feature.
          db.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
          db.setFeature("http://xml.org/sax/features/external-general-entities", false)
          db.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
          db.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
          db.setXIncludeAware(false)
          db.setExpandEntityReferences(false)
          db.newDocumentBuilder().parse(zf.getInputStream(e)).getDocumentElement
        }
      def children(e: Element, tag: String): Seq[Element] = {
        val nl = e.getElementsByTagName(tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      }
      val shared: IndexedSeq[String] = doc("xl/sharedStrings.xml") match {
        case Some(ss) => children(ss, "si").map(_.getTextContent).toIndexedSeq
        case None     => IndexedSeq.empty
      }
      // workbook sheet order + names; rId → worksheet part from the rels
      val rels: Map[String, String] = doc("xl/_rels/workbook.xml.rels").toSeq
        .flatMap(children(_, "Relationship"))
        .map(r => r.getAttribute("Id") -> r.getAttribute("Target").stripPrefix("/xl/").stripPrefix("./"))
        .toMap
      val sheets: Seq[(String, String)] = doc("xl/workbook.xml").toSeq
        .flatMap(children(_, "sheet"))
        .map { sh =>
          val rid = Option(sh.getAttribute("r:id")).filter(_.nonEmpty)
            .getOrElse(sh.getAttribute("relationships:id"))
          sh.getAttribute("name") -> s"xl/${rels.getOrElse(rid, s"worksheets/sheet${sh.getAttribute("sheetId")}.xml")}"
        }
      sheets.map { case (name, part) =>
        val rows = ArrayBuffer.empty[ArrayBuffer[String]]
        doc(part).toSeq.flatMap(children(_, "row")).foreach { r =>
          val cells = ArrayBuffer.empty[String]
          children(r, "c").foreach { c =>
            val idx = colIndex(c.getAttribute("r"))
            while (cells.length < idx) cells += null
            val v = c.getAttribute("t") match {
              case "s" => // shared-string index
                children(c, "v").headOption.map(e => shared(e.getTextContent.trim.toInt)).orNull
              case "inlineStr" =>
                children(c, "is").headOption.map(_.getTextContent).orNull
              case _ => // n (default), str, b — take the literal value text
                children(c, "v").headOption.map(_.getTextContent).orNull
            }
            cells += v
          }
          rows += cells
        }
        val width = if (rows.isEmpty) 0 else rows.map(_.length).max
        name -> rows.map(r => (r ++ Seq.fill(width - r.length)(null: String)).toSeq).toSeq
      }
    } finally zf.close()
  }

  /** A1-style reference → 0-based column index ("A"→0, "BC"→54).
    * Cells without a ref attribute are appended in document order.
    */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) -1 // caller appends sequentially via cells.length < -1 == false
    else letters.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
  }

  /** All sheets as DataFrames with folded (trim+lowercase) headers —
    * the xlsx twin of `Sources.readSheetCsv`; all columns string-typed,
    * exactly like the reference's header-index access into openpyxl
    * cell values.
    */
  def readSheetDfs(spark: SparkSession, path: String): Seq[(String, DataFrame)] =
    readSheets(path).collect { case (name, rows) if rows.nonEmpty =>
      val header = rows.head.map(h => Option(h).getOrElse("").trim.toLowerCase)
      val schema = StructType(header.map(StructField(_, StringType)))
      val data   = rows.tail.map(Row.fromSeq)
      name -> spark.createDataFrame(data.asJava, schema)
    }

  /** Sheets that contain `requiredCol` after folding — xlsx analog of
    * `sheets_with_sample_id` (utils.py:6-24) / `Sources.sheetsWith`.
    */
  def sheetsWith(spark: SparkSession, path: String, requiredCol: String): Seq[(String, DataFrame)] =
    readSheetDfs(spark, path).filter { case (_, df) => df.columns.contains(requiredCol) }

  /** Minimal writer (inline strings only) — enough to round-trip the
    * reader and to build upload fixtures; null cells are skipped so the
    * reader's sparse-cell path is exercised.
    */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    // Escapes for BOTH text content and attribute values (sheet names
    // land inside name="…"), so quotes must be covered too — a '"' in a
    // sheet name would otherwise emit a malformed workbook.
    def esc(s: String): String =
      s.flatMap {
        case '&'  => "&amp;"
        case '<'  => "&lt;"
        case '>'  => "&gt;"
        case '"'  => "&quot;"
        case '\'' => "&apos;"
        case c    => c.toString
      }
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      val n = sheets.length
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
          """</Types>""")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          sheets.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + """</sheets></workbook>""")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          (1 to n).map(i =>
            s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString +
          """</Relationships>""")
      sheets.zipWithIndex.foreach { case ((_, rows), i) =>
        val body = rows.zipWithIndex.map { case (row, r) =>
          s"""<row r="${r + 1}">""" + row.zipWithIndex.collect {
            case (v, c) if v != null =>
              s"""<c r="${colRef(c)}${r + 1}" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
          }.mkString + "</row>"
        }.mkString
        entry(s"xl/worksheets/sheet${i + 1}.xml",
          """<?xml version="1.0" encoding="UTF-8"?>""" +
            """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
            body + """</sheetData></worksheet>""")
      }
    } finally zos.close()
  }
}
