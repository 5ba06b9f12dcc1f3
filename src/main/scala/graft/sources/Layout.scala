package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers: bucketed tables for co-located joins.
  *
  * At 100 TB the dominant join cost is shuffling the fact table. Tables
  * bucketed (and sorted) by their join key join WITHOUT any exchange:
  * Spark matches bucket specs and plans a zip-partition sort-merge
  * join. Bucket both sides of a hot join path (e.g. orders/lineitem on
  * orderkey; dataset/file_resource bridges on dataset id) with the SAME
  * bucket count at write time, and every subsequent join on that key is
  * shuffle-free — the write-once/read-many trade that batch catalogs
  * want.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table at `path`. */
  def bucketize(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): Unit =
    bucketize(df, table, path, Seq(key), buckets)

  /** Composite-key form: bucket+sort by `keys` (e.g. the LSH corpus
    * band index by (band, sig) — see Dedup.corpusBandIndex — so every
    * batch's band join reads the index co-partitioned, no index-side
    * exchange).
    */
  def bucketize(
      df: DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Append rows to an existing bucketed table (incremental index
    * maintenance — e.g. adding an ingested batch's bands to the
    * persisted corpus band index). Each insert writes its own bucket
    * files under the table's spec, so reads stay co-partitioned and
    * the zero-shuffle join property survives appends; no rewrite of
    * the existing data. Column order is positional (`insertInto`).
    */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").insertInto(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
