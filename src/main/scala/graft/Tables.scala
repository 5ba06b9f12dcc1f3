package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy loader for the driver's TPC-H-ish testdata directory
  * (TESTDATA.md). One parquet file per table; reads are lazy so a query
  * only touches the tables it names, and Catalyst pushes filters and
  * column pruning into the parquet scan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def rd(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame     = rd("region")
  lazy val nation: DataFrame     = rd("nation")
  lazy val customer: DataFrame   = rd("customer")
  lazy val supplier: DataFrame   = rd("supplier")
  lazy val part: DataFrame       = rd("part")
  lazy val orders: DataFrame     = rd("orders")
  lazy val lineitem: DataFrame   = rd("lineitem")
  lazy val events: DataFrame     = rd("events")
  lazy val documents: DataFrame  = rd("documents")
  lazy val embeddings: DataFrame = rd("embeddings")
}

object Tables {

  /** Every table the testdata directory ships. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register each table as a session temp view, so a pure `spark.sql`
    * workflow — which with the `graft_*` kernel functions
    * (plans.SqlFunctions) now covers the engine's full scalar surface —
    * runs against the directory without touching the Scala API. Views
    * are lazy parquet reads: scans still prune columns and push
    * filters; only the names are eagerly bound.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n))
}
