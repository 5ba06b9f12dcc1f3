package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text search and DataTables-style endpoint queries
  * (SURVEY §2.9, §3.3 honorable mention).
  */
object SearchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** §2.9 — cross-relation text search: the reference builds a
    * SearchVector over FK/M2M hop fields
    * (/root/reference/search_util/search_fields.py:20-39) and filters
    * icontains. Here: customer + nation + region blob, term "asia".
    * The seven sequential per-entity queries of the reference run as one
    * parallel plan; small dims broadcast.
    */
  val q31_text_search: Q = (s, dir) => {
    val t    = Tables(s, dir)
    val blob = Ops.searchBlob(Seq(col("c_name"), col("c_mktsegment"), col("n_name"), col("r_name")))
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(blob.contains("asia"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
      .dropDuplicates("c_custkey")
      .orderBy(col("c_custkey"))
  }

  /** DataTables endpoint shape (/root/reference/tantalus/views.py:1173-1398):
    * annotate countDistinct, OR-of-icontains search, order on the
    * computed column, page cap 50. The reference's per-row N+1
    * render_column lookups fold into the one plan.
    *
    * The search predicate is applied BEFORE the per-order distinct
    * count, and the fact-side aggregation is restricted to matched
    * orders with a semi-join — the count-distinct (the expensive,
    * shuffling half of this plan) runs over only the rows the page can
    * ever show. Catalyst cannot do this rewrite itself (the filter
    * sits above a left join on the aggregated side); result-identical
    * because the left join keeps exactly the matched keys' counts.
    */
  val q32_datatables: Q = (s, dir) => {
    val t = Tables(s, dir)
    val matched = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .filter(
        lower(concat_ws(" ", col("c_name"), col("o_orderstatus"), col("o_orderpriority")))
          .contains("urgent"))
      .select(col("o_orderkey"), col("c_name"))
    val counts = t.lineitem
      .join(matched.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
    matched
      .join(counts, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("c_name"),
        coalesce(col("n_parts"), lit(0L)).as("n_parts"))
      .orderBy(col("n_parts").desc, col("o_orderkey"))
      .limit(50)
  }

  /** P14 — the validated predicate layer applied end-to-end: declared
    * (field, lookup) allowlist compiled to a filter chain, exactly the
    * RestrictedQueryMixin + FilterSet flow of the REST API
    * (/root/reference/tantalus/api/views.py:53-82).
    */
  val q36_restricted_filters: Q = (s, dir) => {
    val t = Tables(s, dir)
    import Predicates.{Lookup, Pred}
    val allowed = Map(
      "c_mktsegment" -> Set[Lookup](Lookup.Exact, Lookup.In),
      "c_acctbal"    -> Set[Lookup](Lookup.Gte, Lookup.Lte),
      "c_name"       -> Set[Lookup](Lookup.IContains))
    Predicates(
      t.customer,
      allowed,
      Seq(
        Pred("c_mktsegment", Lookup.In, Seq[Any]("BUILDING", "MACHINERY")),
        Pred("c_acctbal", Lookup.Gte, 0.0),
        Pred("c_name", Lookup.IContains, "1")))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q31_text_search" -> q31_text_search,
    "q32_datatables"  -> q32_datatables,
    "q36_restricted_filters" -> q36_restricted_filters,
  )

  val oracles: Map[String, String] = Map(
    "q36_restricted_filters" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  AND c_acctbal >= 0.0
        |  AND lower(c_name) LIKE '%1%'
        |ORDER BY c_custkey""".stripMargin,
    "q31_text_search" ->
      """SELECT DISTINCT c_custkey, c_name, n_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE lower(concat_ws(' ', c_name, c_mktsegment, n_name, r_name)) LIKE '%asia%'
        |ORDER BY c_custkey""".stripMargin,
    "q32_datatables" ->
      """SELECT o.o_orderkey, c.c_name, COALESCE(lc.n_parts, 0) AS n_parts
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN (SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS n_parts
        |           FROM lineitem GROUP BY l_orderkey) lc
        |       ON o.o_orderkey = lc.l_orderkey
        |WHERE lower(concat_ws(' ', c.c_name, o.o_orderstatus, o.o_orderpriority)) LIKE '%urgent%'
        |ORDER BY n_parts DESC, o.o_orderkey LIMIT 50""".stripMargin,
  )
}
