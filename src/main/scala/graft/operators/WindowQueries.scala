package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Window-pattern parity queries (SURVEY §2.5-§2.6): pagination, latest
  * history row, lag-based version diff, deterministic top-k.
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  /** W1/O1/O6 — offset pagination: page 3 (rows 201-300) of the id-ordered
    * order list (`VariableResultsSetPagination`,
    * /root/reference/tantalus/api/views.py:33-50).
    */
  val q21_pagination: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops
      .paginate(
        t.orders.select(col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_orderkey")),
        page = 2,
        pageSize = 100)
      .orderBy(col("o_orderkey"))
  }

  /** W2 — latest row per key (`history.last()`,
    * /root/reference/tantalus/models.py:66-67): most recent order per
    * customer, ties broken by key.
    */
  val q22_latest_per_key: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops
      .latestPerKey(t.orders, Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** W3 — version diff via lag (/root/reference/tantalus/services.py:12-76):
    * price delta between consecutive orders of a customer.
    */
  val q23_lag_diff: Q = (s, dir) => {
    val t = Tables(s, dir)
    Ops
      .lagDiff(
        t.orders,
        Seq(col("o_custkey")),
        Seq(col("o_orderdate"), col("o_orderkey")),
        col("o_totalprice"),
        "price_delta")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("price_delta"))
      .orderBy(col("o_orderkey"))
  }

  /** O3/O6 — deterministic top-k: 100 largest orders, key tie-break. */
  val q24_topk: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Frame-based rolling aggregate: per-customer 3-order moving spend
    * (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), decimal-exact.
    */
  val q40_rolling_window: Q = (s, dir) => {
    val t = Tables(s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, 0)
    t.orders
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        sum(Ops.dec(col("o_totalprice"))).over(w).cast("double").as("rolling_spend"),
        count(lit(1)).over(w).as("rolling_n"))
      .orderBy(col("o_orderkey"))
  }

  /** Fixed-width histogram binning over a measure (floor-div bucketing,
    * engine-portable — no width_bucket dialect differences).
    */
  val q41_histogram: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), Ops.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, Q] = Map(
    "q40_rolling_window" -> q40_rolling_window,
    "q41_histogram"      -> q41_histogram,
    "q21_pagination"     -> q21_pagination,
    "q22_latest_per_key" -> q22_latest_per_key,
    "q23_lag_diff"       -> q23_lag_diff,
    "q24_topk"           -> q24_topk,
  )

  val oracles: Map[String, String] = Map(
    "q40_rolling_window" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_spend,
        |       COUNT(*) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_n
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q41_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q21_pagination" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn > 200 AND rn <= 300 ORDER BY o_orderkey""".stripMargin,
    "q22_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q23_lag_diff" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       o_totalprice - lag(o_totalprice, 1) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS price_delta
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q24_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
  )
}
