package graft.operators

import graft.Tables
import graft.operators.Ops.{dec, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations, scalar-function surface, JSON, date math, and
  * polymorphic storage-path resolution (SURVEY §2.7, §2.8, S10/S11).
  */
object SetScalarQueries {

  type Q = (SparkSession, String) => DataFrame

  /** U1 — global-search union across entities
    * (/root/reference/search_util/search_helper.py:27-47): one
    * (id, kind, display) stream from heterogeneous sources.
    */
  val q25_union_search: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val term = "0042"
    def hits(df: DataFrame, id: String, kind: String, display: String) =
      df.filter(lower(col(display)).contains(term))
        .select(
          col(id).cast("long").as("id"),
          lit(kind).as("kind"),
          col(display).as("display"))
    hits(t.customer, "c_custkey", "customer", "c_name")
      .unionByName(hits(t.supplier, "s_suppkey", "supplier", "s_name"))
      .unionByName(hits(t.part, "p_partkey", "part", "p_name"))
      .orderBy(col("kind"), col("id"))
  }

  /** U3/U4 — curation version diff (/root/reference/tantalus/views.py:1090-1092):
    * added / deleted / unchanged membership between two snapshots
    * (customers active in 1995 vs 1996).
    */
  val q26_set_diff: Q = (s, dir) => {
    val t = Tables(s, dir)
    def activeIn(year: Int): DataFrame =
      t.orders
        .filter(
          col("o_orderdate") >= lit(f"$year-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(f"${year + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
        .distinct()
    val old   = activeIn(1995)
    val neu   = activeIn(1996)
    val added     = neu.except(old).withColumn("change", lit("added"))
    val deleted   = old.except(neu).withColumn("change", lit("deleted"))
    val unchanged = neu.intersect(old).withColumn("change", lit("unchanged"))
    added.unionByName(deleted).unionByName(unchanged).orderBy(col("change"), col("o_custkey"))
  }

  /** F1-F3/F7/F9 — string scalar surface: concat_ws, substring(md5),
    * regexp id extraction, lower, exact-decimal cents.
    */
  val q27_scalar_funcs: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer
      .select(
        col("c_custkey"),
        concat_ws("_", col("c_mktsegment"), col("c_custkey").cast("string")).as("cust_tag"),
        substring(md5(col("c_name")), 1, 8).as("id8"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).cast("long").as("idnum"),
        lower(col("c_mktsegment")).as("seg_lc"),
        (dec(col("c_acctbal")) * 100).cast("long").as("balance_cents"),
        col("c_name").rlike("^Customer#\\d+$").as("is_wellformed"))
      .orderBy(col("c_custkey"))
  }

  /** F12 — JSON extraction from a free-form props column
    * (`Analysis.args` JSONField, /root/reference/tantalus/models.py:688-691).
    * Uses schema-based from_json (one Jackson parse per row) rather than
    * get_json_object, which the optimizer duplicates into pushed filter
    * predicates — measured 4x on the events scan.
    */
  val q28_json_extract: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.events
      .select(
        col("event_id"),
        col("event_type"),
        from_json(col("props"), new org.apache.spark.sql.types.StructType().add("k", "long"))
          .getField("k")
          .as("k"))
      .filter(col("k").isNotNull && col("k") % 10 === 0)
      .orderBy(col("event_id"))
  }

  /** F4 — date bucketing + formatting: monthly order stats. */
  val q29_date_funcs: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .groupBy(
        date_format(col("o_orderdate"), "yyyyMM").as("ym"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("ym"))
  }

  /** S11 — polymorphic storage filepath resolution
    * (/root/reference/tantalus/models.py:822-825,853-858,878-883) as a
    * single CASE expression — no UDF, fully codegen'd.
    */
  val q30_storage_paths: Q = (s, dir) => {
    val t     = Tables(s, dir)
    val stype = when(col("s_suppkey") % 3 === 0, "server")
      .when(col("s_suppkey") % 3 === 1, "blob")
      .otherwise("s3")
    val fname = concat(lit("f_"), col("s_suppkey").cast("string"), lit(".bam"))
    t.supplier
      .withColumn("storage_type", stype)
      .withColumn(
        "filepath",
        when(col("storage_type") === "server", concat_ws("/", lit("/srv"), col("s_name"), fname))
          .when(
            col("storage_type") === "blob",
            concat_ws("/", lit("wasb://acct/container"), col("s_name"), fname))
          .otherwise(concat_ws("/", lit("s3://bucket"), col("s_name"), fname)))
      .select(col("s_suppkey"), col("storage_type"), col("filepath"))
      .orderBy(col("s_suppkey"))
  }

  /** S10 — nested JSON rendering (DRF serializer shape,
    * /root/reference/tantalus/api/serializers.py:187-200), assembled
    * with dialect-portable string concatenation so the oracle is exact;
    * `Sources.nestedJson` provides the to_json struct variant.
    */
  val q34_nested_json: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        concat(
          lit("{\"id\":"), col("o_orderkey").cast("string"),
          lit(",\"status\":\""), col("o_orderstatus"),
          lit("\",\"customer\":{\"name\":\""), col("c_name"),
          lit("\",\"segment\":\""), col("c_mktsegment"),
          lit("\"}}")).as("json"))
      .orderBy(col("o_orderkey"))
  }

  /** F9/F10/F11 — semver validation + major bump
    * (/root/reference/tantalus/models.py:617-621,
    * /root/reference/tantalus/views.py:1095) and flowcell_lane parsing
    * (/root/reference/tantalus/forms.py:498-507), instanced on
    * synthesized id strings.
    */
  val q35_version_funcs: Q = (s, dir) => {
    val t = Tables(s, dir)
    val version  = concat(lit("v"), (col("p_partkey") % 4).cast("string"), lit("."),
      (col("p_size") % 10).cast("string"), lit(".0"))
    val flowcell = concat(lit("FC"), col("p_partkey").cast("string"), lit("_"),
      (col("p_size") % 9).cast("string"))
    t.part
      .select(
        col("p_partkey"),
        version.as("version"),
        version.rlike("^v\\d+\\.\\d+\\.\\d+$").as("is_semver"),
        concat(
          lit("v"),
          (regexp_extract(version, "^v(\\d+)", 1).cast("long") + 1).cast("string"),
          lit(".0.0")).as("next_major"),
        split(flowcell, "_").getItem(0).as("fc_id"),
        split(flowcell, "_").getItem(1).as("lane"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q34_nested_json"   -> q34_nested_json,
    "q35_version_funcs" -> q35_version_funcs,
    "q25_union_search" -> q25_union_search,
    "q26_set_diff"     -> q26_set_diff,
    "q27_scalar_funcs" -> q27_scalar_funcs,
    "q28_json_extract" -> q28_json_extract,
    "q29_date_funcs"   -> q29_date_funcs,
    "q30_storage_paths" -> q30_storage_paths,
  )

  val oracles: Map[String, String] = Map(
    "q35_version_funcs" ->
      """WITH v AS (
        |  SELECT p_partkey,
        |         'v' || CAST(p_partkey % 4 AS VARCHAR) || '.' || CAST(p_size % 10 AS VARCHAR) || '.0' AS version,
        |         'FC' || CAST(p_partkey AS VARCHAR) || '_' || CAST(p_size % 9 AS VARCHAR) AS flowcell
        |  FROM part)
        |SELECT p_partkey, version,
        |       regexp_matches(version, '^v\d+\.\d+\.\d+$') AS is_semver,
        |       'v' || CAST(CAST(regexp_extract(version, '^v(\d+)', 1) AS BIGINT) + 1 AS VARCHAR) || '.0.0' AS next_major,
        |       string_split(flowcell, '_')[1] AS fc_id,
        |       string_split(flowcell, '_')[2] AS lane
        |FROM v ORDER BY p_partkey""".stripMargin,
    "q34_nested_json" ->
      """SELECT o_orderkey,
        |       '{"id":' || CAST(o_orderkey AS VARCHAR) ||
        |       ',"status":"' || o_orderstatus ||
        |       '","customer":{"name":"' || c_name ||
        |       '","segment":"' || c_mktsegment || '"}}' AS json
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q25_union_search" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id, 'customer' AS kind, c_name AS display
        |FROM customer WHERE lower(c_name) LIKE '%0042%'
        |UNION ALL
        |SELECT CAST(s_suppkey AS BIGINT), 'supplier', s_name
        |FROM supplier WHERE lower(s_name) LIKE '%0042%'
        |UNION ALL
        |SELECT CAST(p_partkey AS BIGINT), 'part', p_name
        |FROM part WHERE lower(p_name) LIKE '%0042%'
        |ORDER BY kind, id""".stripMargin,
    "q26_set_diff" ->
      """WITH old AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |               AND o_orderdate < TIMESTAMP '1996-01-01'),
        |     neu AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |               AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT o_custkey, 'added' AS change FROM (SELECT * FROM neu EXCEPT SELECT * FROM old)
        |UNION ALL
        |SELECT o_custkey, 'deleted' FROM (SELECT * FROM old EXCEPT SELECT * FROM neu)
        |UNION ALL
        |SELECT o_custkey, 'unchanged' FROM (SELECT * FROM neu INTERSECT SELECT * FROM old)
        |ORDER BY change, o_custkey""".stripMargin,
    "q27_scalar_funcs" ->
      """SELECT c_custkey,
        |       concat_ws('_', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS cust_tag,
        |       substr(md5(c_name), 1, 8) AS id8,
        |       CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) AS idnum,
        |       lower(c_mktsegment) AS seg_lc,
        |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS balance_cents,
        |       regexp_matches(c_name, '^Customer#\d+$') AS is_wellformed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q28_json_extract" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
        |ORDER BY event_id""".stripMargin,
    "q29_date_funcs" ->
      """SELECT strftime(o_orderdate, '%Y%m') AS ym,
        |       date_trunc('month', o_orderdate) AS month_start,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY ym""".stripMargin,
    "q30_storage_paths" ->
      """SELECT s_suppkey,
        |       CASE WHEN s_suppkey % 3 = 0 THEN 'server'
        |            WHEN s_suppkey % 3 = 1 THEN 'blob' ELSE 's3' END AS storage_type,
        |       CASE WHEN s_suppkey % 3 = 0
        |            THEN concat_ws('/', '/srv', s_name, 'f_' || s_suppkey || '.bam')
        |            WHEN s_suppkey % 3 = 1
        |            THEN concat_ws('/', 'wasb://acct/container', s_name, 'f_' || s_suppkey || '.bam')
        |            ELSE concat_ws('/', 's3://bucket', s_name, 'f_' || s_suppkey || '.bam') END AS filepath
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
  )
}
