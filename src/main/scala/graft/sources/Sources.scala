package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest / export surface (SURVEY §2.1).
  *
  * The reference loads operator-supplied spreadsheets with header
  * normalization and row-wise validation
  * (/root/reference/tantalus/forms.py:112-304,
  * /root/reference/tantalus/utils.py:6-43) and exports CSV / JSON
  * (/root/reference/tantalus/views.py:120-137,436-448,1593-1686). The
  * same semantics run on Spark's native readers for CSV/TSV uploads;
  * real .xlsx workbooks go through the JDK-only reader in
  * [[graft.sources.Xlsx]] (same header folding and sheet filtering).
  * Validation is a DataFrame predicate that fails the load loudly,
  * and exports are plain writer calls.
  */
object Sources {

  /** S5 — spreadsheet-style read: header row, columns lower-cased and
    * trimmed (utils.py:20), all-string typing left to the caller.
    */
  def readSheetCsv(spark: SparkSession, path: String, sep: String = ","): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("sep", sep)
      .csv(path)
    raw.toDF(raw.columns.toIndexedSeq.map(_.trim.toLowerCase): _*)
  }

  /** S5 — keep only sheets (files) that contain the given key column
    * (`sheets_with_sample_id`, utils.py:6-24).
    */
  def sheetsWith(spark: SparkSession, paths: Seq[String], requiredCol: String): Seq[(String, DataFrame)] =
    paths
      .map(p => p -> readSheetCsv(spark, p))
      .filter { case (_, df) => df.columns.contains(requiredCol) }

  /** S3/S4 — row-wise upload validation: the reference iterates rows and
    * raises on the first violation (forms.py:164-183); the set-oriented
    * equivalent filters violations and throws with a bounded sample.
    */
  def validateOrThrow(df: DataFrame, okPred: org.apache.spark.sql.Column, what: String): DataFrame = {
    val bad = df.filter(!okPred)
    val n   = bad.limit(6).collect()
    if (n.nonEmpty)
      throw new IllegalArgumentException(
        s"$what: ${n.length}+ invalid rows, e.g. ${n.take(3).mkString("; ")}")
    df
  }

  /** S6 — positional TSV cell extraction (GSC library summary: line 27,
    * columns 2 and 13, utils.py:27-43). Deterministic line numbering via
    * zipWithIndex over the text lines.
    */
  def tsvCells(spark: SparkSession, path: String, rowIdx: Int, colIdxs: Seq[Int]): Seq[String] = {
    val line = spark.sparkContext
      .textFile(path)
      .zipWithIndex()
      .filter(_._2 == rowIdx.toLong)
      .map(_._1)
      .collect()
      .headOption
      .getOrElse(throw new IllegalArgumentException(s"$path has no line $rowIdx"))
    val cells = line.split("\t", -1)
    colIdxs.map(cells(_))
  }

  /** S7/S8 — CSV export, the scale path: one file per partition, no
    * driver funnel. This is the default export; `exportCsv` below is
    * the explicit SMALL-export variant for the reference's
    * one-downloadable-file flows.
    */
  def exportCsvPartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S7/S8 — single-file CSV export (reference-shaped: one downloadable
    * attachment, /root/reference/tantalus/views.py:1670-1686). The
    * `coalesce(1)` funnels every row through one task, so this is ONLY
    * for human-facing exports of human-sized selections; any pipeline
    * export goes through `exportCsvPartitioned`.
    */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** S9 — header-only CSV template (views.py:436-448). */
  def exportCsvTemplate(spark: SparkSession, schema: StructType, path: String): Unit =
    exportCsv(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), path)

  /** S10 — nested JSON serialization: dim attributes folded into a
    * struct column, rendered with to_json (DRF nested serializer shape,
    * /root/reference/tantalus/api/serializers.py:187-200).
    */
  def nestedJson(fact: DataFrame, dim: DataFrame, joinCol: (String, String), dimStruct: (String, Seq[String])): DataFrame = {
    val (fk, pk)          = joinCol
    val (structName, dcs) = dimStruct
    fact
      .join(dim, col(fk) === col(pk), "left")
      .withColumn(structName, struct(dcs.map(col): _*))
      .withColumn("json", to_json(struct(col(fk), col(structName))))
  }
}
