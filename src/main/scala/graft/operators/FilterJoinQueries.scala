package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan / predicate / join parity queries (SURVEY §2.1-§2.3).
  *
  * Each query maps a reference ORM pattern onto the TPC-H-ish testdata
  * per SURVEY §7.0, with a DuckDB oracle. Membership semantics are
  * LEFT SEMI / LEFT ANTI (EXISTS / NOT EXISTS), mirroring the
  * reference's filter-through-relation + distinct
  * (/root/reference/tantalus/api/views.py:53-82,157).
  */
object FilterJoinQueries {

  type Q = (SparkSession, String) => DataFrame

  /** P1/P13/S1 — pushed-down filter + column projection on the fact table. */
  val q01_scan_filter_project: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp") && col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** S2 — PK point lookup (`objects.get(id=pk)`). */
  val q02_point_lookup: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders.filter(col("o_orderkey") === 42L)
  }

  /** P2 — `field__in` membership on a literal list. */
  val q03_in_filter: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** P3-P7 — startswith / endswith / icontains composition. */
  val q04_string_predicates: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.part
      .filter(
        col("p_name").startsWith("red") || col("p_name").endsWith("bolt") ||
          (lower(col("p_type")).contains("econ") && col("p_size") >= 10))
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** P9 — date-range gte/lt plus an exact predicate. */
  val q05_date_range: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp") &&
          col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** P10 — Q-object OR/AND composition. */
  val q06_bool_compose: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .filter(
        (col("l_returnflag") === "R" && col("l_quantity") > 45) ||
          (col("l_discount") > 0.08 && col("l_tax") < 0.02))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** J5/P12 — EXISTS semi-join: customers with at least one 'F' order. */
  val q07_semi_join: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops
      .semiJoin(
        t.customer,
        t.orders.filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** J6/P8 — NOT EXISTS anti-join: customers with no orders (isnull). */
  val q08_anti_join: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops
      .antiJoin(t.customer, t.orders, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** J1/J2 — FK chain customer→nation→region (small dims broadcast). */
  val q09_fk_chain: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy(col("c_custkey"))
  }

  /** J3/P12 — M2M traversal with EXISTS (no fan-out, no distinct):
    * customers who ever bought Brand#13.
    */
  val q10_m2m_semi_distinct: Q = (s, dir) => {
    val t = Tables(s, dir)
    val p13  = t.part.filter(col("p_brand") === "Brand#13").select(col("p_partkey"))
    val li13 = Ops.semiJoin(t.lineitem, p13, col("l_partkey") === col("p_partkey"))
    val o13  = Ops.semiJoin(t.orders, li13, col("o_orderkey") === col("l_orderkey"))
    Ops
      .semiJoin(t.customer, o13, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** J7 — relational division: customers who bought ALL the wanted brands. */
  val q11_division: Q = (s, dir) => {
    val t      = Tables(s, dir)
    val wanted = Seq("Brand#1", "Brand#2", "Brand#13")
    val bridge = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey"), col("p_brand"))
    val keys = Ops.division(bridge, "o_custkey", "p_brand", wanted)
    Ops
      .semiJoin(t.customer, keys, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** P11 — exclusion anti-join: orders with lineitems but none returned. */
  val q12_exclude: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val any  = Ops.semiJoin(t.orders, t.lineitem, col("o_orderkey") === col("l_orderkey"))
    val none = Ops.antiJoin(
      any,
      t.lineitem.filter(col("l_returnflag") === "R"),
      col("o_orderkey") === col("l_orderkey"))
    none.select(col("o_orderkey"), col("o_orderstatus")).orderBy(col("o_orderkey"))
  }

  /** Catalog-maintenance sweep: orphaned or under-referenced dimension
    * rows (parts with fewer than 25 lineitem references, orphans = 0) —
    * the referential-integrity check a file catalog runs before
    * garbage-collecting resources.
    */
  val q42_orphans: Q = (s, dir) => {
    val t = Tables(s, dir)
    val refs = t.lineitem.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_refs"))
    t.part
      .join(refs, col("p_partkey") === col("l_partkey"), "left")
      .select(col("p_partkey"), coalesce(col("n_refs"), lit(0L)).as("n_refs"))
      .filter(col("n_refs") < 25)
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q42_orphans"             -> q42_orphans,
    "q01_scan_filter_project" -> q01_scan_filter_project,
    "q02_point_lookup"        -> q02_point_lookup,
    "q03_in_filter"           -> q03_in_filter,
    "q04_string_predicates"   -> q04_string_predicates,
    "q05_date_range"          -> q05_date_range,
    "q06_bool_compose"        -> q06_bool_compose,
    "q07_semi_join"           -> q07_semi_join,
    "q08_anti_join"           -> q08_anti_join,
    "q09_fk_chain"            -> q09_fk_chain,
    "q10_m2m_semi_distinct"   -> q10_m2m_semi_distinct,
    "q11_division"            -> q11_division,
    "q12_exclude"             -> q12_exclude,
  )

  val oracles: Map[String, String] = Map(
    "q42_orphans" ->
      """SELECT p_partkey, COALESCE(r.n_refs, 0) AS n_refs
        |FROM part p LEFT JOIN (SELECT l_partkey, COUNT(*) AS n_refs
        |                       FROM lineitem GROUP BY l_partkey) r
        |       ON p.p_partkey = r.l_partkey
        |WHERE COALESCE(r.n_refs, 0) < 25
        |ORDER BY p_partkey""".stripMargin,
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_point_lookup" ->
      "SELECT * FROM orders WHERE o_orderkey = 42",
    "q03_in_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','MACHINERY') ORDER BY c_custkey""".stripMargin,
    "q04_string_predicates" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
        |WHERE p_name LIKE 'red%' OR p_name LIKE '%bolt'
        |   OR (lower(p_type) LIKE '%econ%' AND p_size >= 10)
        |ORDER BY p_partkey""".stripMargin,
    "q05_date_range" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "q06_bool_compose" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        |WHERE (l_returnflag = 'R' AND l_quantity > 45)
        |   OR (l_discount > 0.08 AND l_tax < 0.02)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q09_fk_chain" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q10_m2m_semi_distinct" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE o.o_custkey = c.c_custkey AND p.p_brand = 'Brand#13')
        |ORDER BY c_custkey""".stripMargin,
    "q11_division" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE c.c_custkey IN (
        |  SELECT o.o_custkey FROM orders o
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_brand IN ('Brand#1','Brand#2','Brand#13')
        |  GROUP BY o.o_custkey
        |  HAVING COUNT(DISTINCT p.p_brand) = 3)
        |ORDER BY c_custkey""".stripMargin,
    "q12_exclude" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,
  )
}
