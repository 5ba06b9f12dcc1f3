package graft.operators

import graft.Tables
import graft.operators.Ops.{dec, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation parity queries (SURVEY §2.4). Money sums run through
  * DECIMAL(18,2) (exact, order-independent) and are returned as double —
  * bit-exact vs the DuckDB oracle regardless of partial-agg order.
  */
object AggQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1 — grouped counts (entity counts / per-relation counts). */
  val q13_group_count: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** A2 — SUM with Django's NULL→0 coercion on empty relation
    * (/root/reference/tantalus/views.py:1762): per-customer order totals
    * via left join, customers without orders kept at 0.
    */
  val q14_sum_coalesce: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(col("o_totalprice"))), lit(0).cast(DecimalType(18, 2)))
          .cast("double")
          .as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** A3/W4 — next-id generation: max numeric suffix + 1
    * (/root/reference/tantalus/views.py:467-473).
    */
  val q15_max_next_id: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.agg(
      (max(regexp_extract(col("c_name"), "#(\\d+)", 1).cast("long")) + 1L).as("next_id"))
  }

  /** A4 — COUNT DISTINCT annotate per parent row (reference cost model:
    * /root/reference/tantalus/forms.py:639-643, double count-distinct).
    *
    * NOT spelled `agg(countDistinct(a), countDistinct(b))`: Catalyst's
    * distinct-aggregate rewrite Expands every input row once per
    * distinct column — 2× rows into the shuffle here, multiplicative in
    * the number of distinct aggs — and the r7 scale ladder measured it
    * super-linear (e=1.13 at m=20→80). Instead each distinct count is
    * its own pre-deduplicating aggregation: dedup on (key, col) with
    * map-side partial aggregation, then count per key — two LINEAR
    * shuffles per column, no Expand, correct for any group cardinality
    * (no per-group set memory). The two one-row-per-key frames then
    * join on the key with no extra exchange (both sides leave their
    * final aggregate hash-partitioned by `l_orderkey`). The full-outer
    * join + fill(0) preserves countDistinct's NULL semantics (a key
    * whose column is all-NULL still appears, counting 0).
    */
  val q16_count_distinct: Q = (s, dir) => {
    val t = Tables(s, dir)
    def perKey(c: String, alias: String) =
      t.lineitem
        .filter(col(c).isNotNull)
        .select(col("l_orderkey"), col(c))
        .distinct()
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as(alias))
    perKey("l_suppkey", "n_supp")
      .join(perKey("l_partkey", "n_part"), Seq("l_orderkey"), "full")
      .na.fill(0L, Seq("n_supp", "n_part"))
      .orderBy(col("l_orderkey"))
  }

  /** A5 — HAVING on an aggregate (min_num_read_groups gte). */
  val q17_having: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5)
      .orderBy(col("l_orderkey"))
  }

  /** A6 — aggregate = aggregate (`get_is_complete`,
    * /root/reference/tantalus/models.py:561-565): orders whose distinct
    * supplier count equals distinct part count.
    *
    * With small bounded groups (≤7 lineitems per order),
    * `size(collect_set(...))` computes both distinct counts in ONE pass
    * with map-side partial sets — measured ~1.5× faster at sf0.1, and
    * measured linear (e=0.89) on the scale ladder. For unbounded groups
    * (set memory is O(group)) use the q16 form instead: per-column
    * pre-deduplicating aggregations joined on the key — linear, no
    * Expand, no per-group memory.
    */
  val q18_agg_equality: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        size(collect_set(col("l_suppkey"))).cast("long").as("n_supp"),
        size(collect_set(col("l_partkey"))).cast("long").as("n_part"))
      .filter(col("n_supp") === col("n_part"))
      .select(col("l_orderkey"), col("n_supp"))
      .orderBy(col("l_orderkey"))
  }

  /** A7 — the reference's N×M stats loops
    * (/root/reference/tantalus/views.py:1718-1815) collapsed into ONE
    * rollup shuffle, 'all' rows included.
    */
  val q19_rollup: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** A8/A9 — sorted distinct value list rendered as CSV
    * (tag lists, storage-name lists).
    */
  val q20_list_agg: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"),
        count(lit(1)).as("n"))
      .orderBy(col("l_orderkey"))
  }

  /** M4 read-side — soft-delete visibility asymmetry
    * (/root/reference/tantalus/models.py:380-385 filters deleted,
    * 567-572 does not): live vs total per order, returned items treated
    * as deleted.
    */
  val q33_softdelete_views: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("l_returnflag") =!= "R", 1)).as("n_live"),
        coalesce(
          sum(when(col("l_returnflag") =!= "R", dec(col("l_extendedprice")))),
          lit(0).cast(DecimalType(18, 2))).cast("double").as("live_charge"))
      .orderBy(col("l_orderkey"))
  }

  /** Exact interpolated percentiles per group (idiomatic upgrade beyond
    * the reference's count/sum stats; Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition, so the
    * comparison is exact).
    */
  val q37_percentiles: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.5)").as("qty_p50"))
      .orderBy(col("l_returnflag"))
  }

  /** A7 idiomatic upgrade #2 — CUBE with grouping_id: every marginal of
    * the 2-D stats table in one shuffle.
    */
  val q38_cube: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(
        col("gid"),
        asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))
  }

  /** U3/U4 bag semantics — EXCEPT ALL / INTERSECT ALL with multiplicity
    * preserved, aggregated per key.
    */
  val q39_bag_setops: Q = (s, dir) => {
    val t = Tables(s, dir)
    def keys(from: String, to: String) =
      t.lineitem
        .filter(
          col("l_shipdate") >= lit(from).cast("timestamp") &&
            col("l_shipdate") < lit(to).cast("timestamp"))
        .select(col("l_suppkey"))
    val a = keys("1995-01-01", "1997-01-01")
    val b = keys("1996-01-01", "1998-01-01")
    a.exceptAll(b).groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
      .unionByName(
        a.intersectAll(b).groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect_all")))
      .orderBy(col("op"), col("l_suppkey"))
  }

  val queries: Map[String, Q] = Map(
    "q37_percentiles" -> q37_percentiles,
    "q38_cube"        -> q38_cube,
    "q39_bag_setops"  -> q39_bag_setops,
    "q13_group_count"    -> q13_group_count,
    "q14_sum_coalesce"   -> q14_sum_coalesce,
    "q15_max_next_id"    -> q15_max_next_id,
    "q16_count_distinct" -> q16_count_distinct,
    "q17_having"         -> q17_having,
    "q18_agg_equality"   -> q18_agg_equality,
    "q19_rollup"         -> q19_rollup,
    "q20_list_agg"       -> q20_list_agg,
    "q33_softdelete_views" -> q33_softdelete_views,
  )

  val oracles: Map[String, String] = Map(
    "q37_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_extendedprice, 0.5) AS p50,
        |       quantile_cont(l_extendedprice, 0.9) AS p90,
        |       quantile_cont(l_quantity, 0.5) AS qty_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q38_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q39_bag_setops" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem
        |           WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'),
        |     b AS (SELECT l_suppkey FROM lineitem
        |           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01')
        |SELECT l_suppkey, COUNT(*) AS n, 'except_all' AS op
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY l_suppkey
        |UNION ALL
        |SELECT l_suppkey, COUNT(*) AS n, 'intersect_all' AS op
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY l_suppkey
        |ORDER BY op, l_suppkey""".stripMargin,
    "q13_group_count" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q14_sum_coalesce" ->
      """SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
        |       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY c.c_custkey""".stripMargin,
    "q15_max_next_id" ->
      """SELECT MAX(CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT)) + 1 AS next_id
        |FROM customer""".stripMargin,
    "q16_count_distinct" ->
      """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
        |       COUNT(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q17_having" ->
      """SELECT l_orderkey, COUNT(*) AS n FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) >= 5 ORDER BY l_orderkey""".stripMargin,
    "q18_agg_equality" ->
      """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_orderkey
        |HAVING COUNT(DISTINCT l_suppkey) = COUNT(DISTINCT l_partkey)
        |ORDER BY l_orderkey""".stripMargin,
    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q20_list_agg" ->
      """SELECT l_orderkey,
        |       string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q33_softdelete_views" ->
      """SELECT l_orderkey, COUNT(*) AS n_total,
        |       COUNT(CASE WHEN l_returnflag <> 'R' THEN 1 END) AS n_live,
        |       CAST(COALESCE(SUM(CASE WHEN l_returnflag <> 'R'
        |                        THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS live_charge
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
  )
}
