package graft.operators

import graft.Tables
import graft.model.Catalog
import graft.sources.{Sources, Xlsx}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Oracle-checked drives for the ingest/export surface (SURVEY §2.1
  * S3–S9/S12), the case-insensitive prefix lookup (P4) and the M2M
  * attach/detach write path (M2/M3) — the rows that were previously
  * spec-tested only.
  *
  * The source/sink queries are ROUND TRIPS: each writes a fixture
  * derived from the parquet testdata to a deterministic /tmp path,
  * re-ingests it through the engine's reader, and returns the ingested
  * result; the DuckDB oracle reads the same fixture files (or
  * recomputes the expected state straight from the base tables, which
  * is stronger — writer AND reader must both be lossless for the row
  * to stay green). Fixture paths are keyed by the sf-directory
  * basename so concurrent sf runs never collide; the driver's
  * correctness gate runs at sf0.01, which is the path the oracle SQL
  * names.
  */
object SourceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic per-sf fixture directory (engine writes, oracle reads). */
  private def fixDir(dir: String, q: String): String =
    s"/tmp/graft_fixtures/${new java.io.File(dir).getName}/$q"

  /** Fixture base the ORACLE strings point at. `graft.Verify` sets the
    * system property to the sf-dir basename it is dumping, so the
    * oracle SQL always reads the fixtures of the SAME scale factor the
    * engine just wrote — the whole suite stays green at sf0.01 AND
    * sf0.1. Defaults to sf0.01, the driver's correctness gate.
    */
  private def fixBase: String =
    "/tmp/graft_fixtures/" + sys.props.getOrElse("graft.verify.sfname", "sf0.01")

  // ---------- s13: spreadsheet-style ingest with header folding + match buckets ----------

  /** S3/S4/S5 — the reference's operator-upload flow
    * (/root/reference/tantalus/forms.py:112-183,217-304, utils.py:6-24):
    * a REAL multi-sheet .xlsx workbook (written and re-read by
    * `sources.Xlsx`, JDK-only) where only sheets carrying the key
    * column are ingested (S5), headers arrive messy and fold to
    * trimmed lowercase (S5), rows are validated before load (S3), and
    * uploaded IDs are classified into existing-vs-new match buckets
    * against the live catalog (S4).
    *
    * The oracle reads a CSV twin of the same sheet, so the xlsx
    * writer→reader round trip is value-checked cell by cell. The
    * workbook rows pass through the driver by design — uploads are
    * human-sized (forms.py parses them in the web process); the scale
    * side is the catalog join, which broadcasts the upload keys and
    * streams the orders table.
    */
  val s13_sheet_ingest: Q = (s, dir) => {
    val t   = Tables(s, dir)
    val fix = fixDir(dir, "s13_sheet_ingest")
    // sheet A: customer sample with MESSY headers the reader must fold
    val sheetA = t.customer
      .filter(col("c_custkey") <= 500)
      .select(
        col("c_custkey").cast("string").as(" C_CustKey "),
        col("c_name").as("C_NAME"),
        col("c_mktsegment").as("Mkt Segment"))
    Sources.exportCsv(sheetA, s"$fix/sheet_a") // the oracle's view of the upload
    new java.io.File(fix).mkdirs()
    Xlsx.write(
      s"$fix/upload.xlsx",
      Seq(
        "customers" -> (Seq(Seq(" C_CustKey ", "C_NAME", "Mkt Segment")) ++
          sheetA.collect().toSeq.map(r => Seq(r.getString(0), r.getString(1), r.getString(2)))),
        // sheet with no key column — sheetsWith must drop it (utils.py:6-24)
        "regions" -> (Seq(Seq("R_NAME")) ++
          t.region.select(col("r_name")).collect().toSeq.map(r => Seq(r.getString(0))))))
    val kept = Xlsx.sheetsWith(s, s"$fix/upload.xlsx", "c_custkey")
    val up   = kept.map(_._2).reduce(_ unionByName _)
    val ok   = Sources.validateOrThrow(
      up, col("c_custkey").isNotNull && col("c_custkey").cast("long").isNotNull, "s13 upload")
    ok
      .withColumn("custkey", col("c_custkey").cast("long"))
      .join(
        broadcast(t.orders.select(col("o_custkey").as("custkey")).distinct()
          .withColumn("__hit", lit(true))),
        Seq("custkey"), "left")
      .select(
        col("custkey"),
        col("c_name").as("name"),
        col("mkt segment").as("segment"),
        when(col("__hit"), lit("existing")).otherwise(lit("new")).as("bucket"))
      .orderBy(col("custkey"))
  }

  // ---------- s14: positional TSV cell extraction ----------

  /** S6 — fixed-position cell reads from a headerless TSV (the GSC
    * library-summary parse, /root/reference/tantalus/utils.py:27-43):
    * line addressed by index, cells by column position. The fixture is
    * written sorted so line index == nation key, which lets the oracle
    * address the same lines by value.
    */
  val s14_tsv_positional: Q = (s, dir) => {
    val t   = Tables(s, dir)
    val fix = fixDir(dir, "s14_tsv_positional")
    t.nation
      .repartition(1)
      .sortWithinPartitions(col("n_nationkey"))
      .select(concat_ws("\t",
        col("n_nationkey").cast("string"),
        col("n_name"),
        col("n_regionkey").cast("string")).as("value"))
      .write.mode("overwrite").text(s"$fix/nations")
    val rows = Seq(7, 19).map { i =>
      val cells = Sources.tsvCells(s, s"$fix/nations", i, Seq(0, 1))
      (i.toLong, cells(0), cells(1))
    }
    val sq = s; import sq.implicits._
    rows.toDF("line_no", "nationkey", "name").orderBy(col("line_no"))
  }

  // ---------- s15: CSV export with computed columns, round-trip ----------

  /** S7/S8 — CSV sink with computed display columns
    * (/root/reference/tantalus/views.py:120-137,1593-1686) proved by a
    * round trip the oracle does NOT see: the expected rows are
    * recomputed straight from the base table, so the row only stays
    * green if the writer and the reader are both lossless.
    */
  val s15_export_roundtrip: Q = (s, dir) => {
    val t   = Tables(s, dir)
    val fix = fixDir(dir, "s15_export_roundtrip")
    Sources.exportCsv(
      t.supplier
        .filter(col("s_suppkey") <= 200)
        .select(
          col("s_suppkey").cast("string").as("suppkey"),
          col("s_name").as("name"),
          concat(col("s_name"), lit(" ["), col("s_nationkey").cast("string"), lit("]")).as("display"),
          when(col("s_acctbal") < 0, "neg")
            .when(col("s_acctbal") < 5000, "mid")
            .otherwise("high").as("band")),
      s"$fix/suppliers")
    Sources.readSheetCsv(s, s"$fix/suppliers")
      .withColumn("suppkey", col("suppkey").cast("long"))
      .orderBy(col("suppkey"))
  }

  // ---------- s17: header-only CSV template ----------

  /** S9 — downloadable header-only CSV template
    * (/root/reference/tantalus/views.py:436-448): exported from a
    * declared schema, re-read, and reported as its folded column list.
    */
  val s17_csv_template: Q = (s, dir) => {
    val fix    = fixDir(dir, "s17_csv_template")
    val schema = StructType(Seq("Sample_ID", "Container", "Row_Pos", "Col_Pos")
      .map(StructField(_, StringType)))
    Sources.exportCsvTemplate(s, schema, s"$fix/template")
    val sq = s; import sq.implicits._
    Sources.readSheetCsv(s, s"$fix/template").columns.toSeq.sorted.toDF("col_name")
  }

  // ---------- s16: parquet snapshot rewrite ----------

  /** S12 — parquet sink + snapshot rewrite (the Catalog write model):
    * base snapshot saved through Catalog, an incoming batch upserted
    * (M1), the NEW snapshot written and read back from disk. The
    * returned rows come from the rewritten files, so the oracle —
    * which recomputes the post-rewrite state from the base table —
    * checks the sink, the rewrite, and the re-scan together.
    */
  val s16_snapshot_rewrite: Q = (s, dir) => {
    val t   = Tables(s, dir)
    val fix = fixDir(dir, "s16_snapshot_rewrite")
    val base = t.part
      .filter(col("p_partkey") <= 2000)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
    Catalog(s, Map("part_snapshot" -> base)).save(s"$fix/v0")
    val v0 = Catalog.load(s, s"$fix/v0", Seq("part_snapshot"))("part_snapshot")
    val incoming = t.part
      .filter(col("p_partkey").between(1500, 2500))
      .select(col("p_partkey"), lit("Brand#NEW").as("p_brand"),
        (col("p_retailprice") + 100).as("p_retailprice"))
    Catalog(s, Map("part_snapshot" -> WritePath.upsert(v0, incoming, Seq("p_partkey"))))
      .save(s"$fix/v1")
    Catalog.load(s, s"$fix/v1", Seq("part_snapshot"))("part_snapshot")
      .orderBy(col("p_partkey"))
  }

  // ---------- q55: case-insensitive prefix lookup through the allowlist ----------

  /** P4 — `field__istartswith` routed through the validated predicate
    * layer (the DataTables prefix search,
    * /root/reference/tantalus/views.py:1202-1207): lower(col) prefix
    * compare, declared on the entity's allowlist before compiling.
    */
  val q55_istartswith: Q = (s, dir) => {
    import Predicates._
    val t = Tables(s, dir)
    Predicates(
      t.customer,
      allowed = Map("c_mktsegment" -> Set[Lookup](Lookup.IStartsWith, Lookup.Exact)),
      preds = Seq(Pred("c_mktsegment", Lookup.IStartsWith, "bUIld")))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ---------- wp05: M2M attach + detach ----------

  /** M2/M3 — the reference's most-used mutation pair: bulk tag attach
    * (`tags.add(*models)`, /root/reference/tantalus/forms.py:679-682)
    * then detach (/root/reference/tantalus/views.py:1018), materialized
    * as the final bridge state. Attach is append+dedup, detach is an
    * anti-join on the bridge key pair — both shuffle once on the
    * bridge keys and never collect.
    */
  val wp05_bridge_attach_detach: Q = (s, dir) => {
    val t = Tables(s, dir)
    val bridge = t.lineitem
      .filter(col("l_orderkey") <= 1000)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
    val adds = t.lineitem
      .filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey").as("okey"), (col("l_partkey") + 1).as("pkey"))
      .distinct()
    val merged   = WritePath.bridgeAdd(bridge, adds)
    val removals = merged.filter(col("pkey") % 7 === 0)
    WritePath.bridgeRemove(merged, removals, Seq("okey", "pkey"))
      .orderBy(col("okey"), col("pkey"))
  }

  /** Z-order layout round trip (the multi-dimensional clustering the
    * linear `sortCols` layout can't give): rewrite events clustered on
    * the Z-curve of (ts, user_id) — `Zorder.write`, all native
    * codegen'd expressions — then answer a selective user_id range
    * query from the rewritten files. The oracle reads the ORIGINAL
    * events table, so the hash match proves the layout rewrite is
    * semantically invisible; the pruning payoff (a user_id filter
    * overlaps a stripe of row groups instead of all of them, which a
    * ts-sorted layout cannot do) is measured in ZorderSpec via the
    * parquet footers' min/max stats.
    */
  val d57_zorder_scan: Q = (s, dir) => {
    val sfName = new java.io.File(dir).getName
    val pid    = ProcessHandle.current().pid()
    val path   = s"/tmp/graft_fixtures/$sfName/d57_zorder_p$pid"
    graft.sources.Scratch.cleanupAtExit(path)
    val t      = Tables(s, dir)
    graft.sources.Zorder.write(t.events, path, "ts", "user_id", nFiles = 16)
    s.read.parquet(path)
      .filter(col("user_id").between(3L, 9L))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        graft.operators.Ops.dsum(col("value")).as("total"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "d57_zorder_scan"           -> d57_zorder_scan,
    "s13_sheet_ingest"          -> s13_sheet_ingest,
    "s14_tsv_positional"        -> s14_tsv_positional,
    "s15_export_roundtrip"      -> s15_export_roundtrip,
    "s16_snapshot_rewrite"      -> s16_snapshot_rewrite,
    "s17_csv_template"          -> s17_csv_template,
    "q55_istartswith"           -> q55_istartswith,
    "wp05_bridge_attach_detach" -> wp05_bridge_attach_detach,
  )

  def oracles: Map[String, String] = Map(
    // reads the ORIGINAL events table — a hash match proves the
    // z-ordered rewrite is semantically invisible
    "d57_zorder_scan" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE user_id BETWEEN 3 AND 9
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s13_sheet_ingest" ->
      s"""WITH up AS (SELECT CAST("C_CustKey" AS BIGINT) AS custkey, "C_NAME" AS name,
        |                   "Mkt Segment" AS segment
        |            FROM read_csv('$fixBase/s13_sheet_ingest/sheet_a/*.csv',
        |                          header=true, all_varchar=true))
        |SELECT custkey, name, segment,
        |       CASE WHEN custkey IN (SELECT o_custkey FROM orders)
        |            THEN 'existing' ELSE 'new' END AS bucket
        |FROM up ORDER BY custkey""".stripMargin,
    "s14_tsv_positional" ->
      s"""SELECT CAST(column0 AS BIGINT) AS line_no, column0 AS nationkey, column1 AS name
        |FROM read_csv('$fixBase/s14_tsv_positional/nations/*.txt',
        |              delim='\\t', header=false, all_varchar=true)
        |WHERE column0 IN ('7','19') ORDER BY line_no""".stripMargin,
    "s15_export_roundtrip" ->
      """SELECT s_suppkey AS suppkey, s_name AS name,
        |       s_name || ' [' || s_nationkey || ']' AS display,
        |       CASE WHEN s_acctbal < 0 THEN 'neg'
        |            WHEN s_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS band
        |FROM supplier WHERE s_suppkey <= 200 ORDER BY suppkey""".stripMargin,
    "s16_snapshot_rewrite" ->
      """WITH base AS (SELECT p_partkey, p_brand, p_retailprice FROM part WHERE p_partkey <= 2000),
        |inc AS (SELECT p_partkey, 'Brand#NEW' AS p_brand, p_retailprice + 100 AS p_retailprice
        |        FROM part WHERE p_partkey BETWEEN 1500 AND 2500)
        |SELECT p_partkey, p_brand, p_retailprice FROM inc
        |UNION ALL
        |SELECT p_partkey, p_brand, p_retailprice FROM base
        |WHERE p_partkey NOT IN (SELECT p_partkey FROM inc)
        |ORDER BY p_partkey""".stripMargin,
    "s17_csv_template" ->
      s"""SELECT lower(trim(column_name)) AS col_name
        |FROM (DESCRIBE SELECT * FROM
        |      read_csv('$fixBase/s17_csv_template/template/*.csv',
        |               header=true, all_varchar=true))
        |ORDER BY col_name""".stripMargin,
    "q55_istartswith" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE lower(c_mktsegment) LIKE 'build%' ORDER BY c_custkey""".stripMargin,
    "wp05_bridge_attach_detach" ->
      """WITH bridge AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
        |                FROM lineitem WHERE l_orderkey <= 1000),
        |adds AS (SELECT DISTINCT l_orderkey AS okey, l_partkey + 1 AS pkey
        |         FROM lineitem WHERE l_orderkey <= 200),
        |merged AS (SELECT okey, pkey FROM bridge UNION SELECT okey, pkey FROM adds)
        |SELECT okey, pkey FROM merged WHERE pkey % 7 <> 0 ORDER BY okey, pkey""".stripMargin,
  )
}
