package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-path semantics of the reference catalog (SURVEY §2.12),
  * expressed as pure DataFrame→DataFrame batch transforms: the caller
  * rewrites the target parquet (snapshot semantics, single writer) —
  * the Spark-native equivalent of the reference's ORM saves.
  */
object WritePath {

  /** M1 — upsert (`get_or_create` / update-by-key,
    * /root/reference/tantalus/forms.py:660-661): incoming rows win,
    * untouched existing rows survive.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.unionByName(existing.join(incoming, keys, "left_anti"))

  /** M2 — bulk M2M attach (`tags.add(*models)`,
    * /root/reference/tantalus/forms.py:679-682): append pairs, dedup.
    */
  def bridgeAdd(bridge: DataFrame, additions: DataFrame): DataFrame =
    bridge.unionByName(additions).dropDuplicates()

  /** M3 — M2M detach (/root/reference/tantalus/views.py:1018). */
  def bridgeRemove(bridge: DataFrame, removals: DataFrame, keys: Seq[String]): DataFrame =
    bridge.join(removals, keys, "left_anti")

  /** M4 — soft-delete cascade
    * (/root/reference/tantalus/api/views.py:164-174): flag
    * `is_deleted=true` on every instance whose key appears in
    * `deletedKeys`; all other rows keep their current flag.
    */
  def softDeleteCascade(instances: DataFrame, deletedKeys: DataFrame, key: String): DataFrame =
    instances
      .join(deletedKeys.select(col(key)).distinct().withColumn("__hit", lit(true)), Seq(key), "left")
      .withColumn("is_deleted", when(col("__hit"), lit(true)).otherwise(col("is_deleted")))
      .drop("__hit")

  /** M5 — curation version rewrite
    * (/root/reference/tantalus/views.py:1076-1128): removed links drop,
    * added links insert, surviving links bump to `newVersion`.
    */
  def curationRewrite(newLinks: DataFrame, versionCol: String, newVersion: String): DataFrame =
    newLinks.withColumn(versionCol, lit(newVersion))

  /** U3/U4 companion — change report between two link snapshots:
    * added / deleted / unchanged, one row per key.
    */
  def curationDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    val added     = neu.except(old).withColumn("change", lit("added"))
    val deleted   = old.except(neu).withColumn("change", lit("deleted"))
    val unchanged = neu.intersect(old).withColumn("change", lit("unchanged"))
    added.unionByName(deleted).unionByName(unchanged)
  }

  /** M6 — history append (django-simple-history shadow table): every
    * write appends full row copies stamped with type (+/~/-) and a
    * caller-supplied logical timestamp (explicit, for determinism).
    */
  def historyAppend(history: DataFrame, rows: DataFrame, htype: String, historyDate: java.sql.Timestamp): DataFrame =
    history.unionByName(
      rows
        .withColumn("history_type", lit(htype))
        .withColumn("history_date", lit(historyDate)),
      allowMissingColumns = true) // history_id / history_user_id are sink-assigned

  /** M6 read side — time travel: reconstruct the table state as of
    * `asOf` from an append-only history frame. The snapshot is the
    * latest history row per key at or before the timestamp, minus keys
    * whose latest row is a delete marker. One key-partitioned window
    * over the time-filtered history — the filter prunes history
    * partitions (partition the history table by date at scale) before
    * anything shuffles.
    */
  def snapshotAsOf(
      history: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      tieCols: Seq[String],
      asOf: org.apache.spark.sql.Column,
      deleteMarker: org.apache.spark.sql.Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(timeCol).desc +: tieCols.map(col(_).desc)): _*)
    history
      .filter(col(timeCol) <= asOf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !deleteMarker)
      .drop("__rn")
  }
}
