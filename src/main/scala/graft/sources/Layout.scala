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

  /** Compact a bucketed table back to ONE file per bucket, preserving
    * its bucket/sort spec (and so every zero-shuffle join and
    * bucket-pruning property of the original build).
    *
    * Why it exists: `append` is deliberately rewrite-free — each batch
    * adds its OWN files to every bucket, so after K appends a bucket
    * holds K+1 fragments. Reads stay CORRECT forever, but degrade two
    * ways at scale: per-file open/footer overhead grows linearly with
    * K, and the per-bucket sort the row-group pruning relies on
    * (min/max stats against pushed key predicates) is only per-FILE
    * after appends — a pruning filter must open every fragment.
    * Compaction is the standard maintenance pass every long-lived
    * index needs (the bucketed analogue of `Catalog.compact`).
    *
    * Mechanics: path-based read of the current generation (never the
    * table name — seeding this session's relation cache with a file
    * list we are about to replace is the stale-snapshot bug
    * StreamingSpec caught in the dict build), repartitioned so each
    * task holds exactly one bucket's rows (`repartition(n, keys)` uses
    * the same murmur3 `HashPartitioning` as the bucketed write, so
    * task i receives precisely bucket i → one output file per bucket,
    * fully sorted by the sort spec), written to the NEXT generation
    * directory (`…/<base>.gN`) under a scratch table name, then
    * swapped in metadata-only (DROP old + RENAME — an external
    * table's rename keeps its location; overwriting the live name
    * directly is both rejected by Spark's overwrite-while-reading
    * check and unsafe, since the source files ARE the table) and the
    * old generation deleted. A crash mid-compact leaves the old
    * generation live and intact; the swap itself is not transactional
    * with the delete — the production form is a metastore-
    * transactional swap, and OTHER sessions follow the standard
    * external-writer rule (REFRESH TABLE), same as after `append`.
    */
  def compact(spark: SparkSession, tableName: String): Unit =
    compact(spark, tableName, identity[DataFrame] _)

  /** Compaction with a row TRANSFORM applied during the generation
    * rewrite — the hook retention maintenance needs: a tombstone-drop
    * (anti-join against a deleted-docs set) rides the rewrite the
    * compaction was doing anyway, so physical deletion costs zero
    * extra passes. The transform must preserve the schema (the new
    * generation is written under the same bucket/sort spec).
    */
  def compact(spark: SparkSession, tableName: String, transform: DataFrame => DataFrame): Unit = {
    recoverDanglingSwap(spark, tableName)
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    val meta  = spark.sessionState.catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(
        s"$tableName has no bucket spec — use Catalog.compact for plain tables"))
    require(
      spec.sortColumnNames == spec.bucketColumnNames,
      s"$tableName sort spec ${spec.sortColumnNames} != bucket spec — unexpected layout")
    val keys = spec.bucketColumnNames
    val cur  = transform(spark.read.schema(meta.schema).parquet(meta.location.toString))
    swapGeneration(spark, tableName, meta) { (scratch, newDir) =>
      bucketize(
        cur.repartition(spec.numBuckets, keys.map(cur(_)): _*),
        scratch, newDir, keys, spec.numBuckets)
    }
  }

  /** Recover from a crash inside `swapGeneration`'s DROP→RENAME window:
    * the scratch table exists (fully written next generation) but the
    * live name is gone — rename the scratch into place and drop the
    * orphaned previous-generation directory. Returns whether that
    * rename-recovery ran. `compact` (and so every index compaction)
    * calls this first, so the window self-heals on the next
    * maintenance pass instead of requiring manual re-registration.
    *
    * Also heals the OTHER crash window (RENAME done, old-generation
    * delete not): when the live table exists but the previous
    * generation of its location is still on disk, that directory is a
    * leaked orphan — no table points at it (the live table never
    * points at prevGen of its own location, and swaps only ever move
    * forward) — so it is deleted here. Without this, a crash between
    * `swapGeneration`'s RENAME and `fs.delete(oldDir)` leaked the old
    * generation permanently (the rename-recovery branch only fires
    * when the live name is missing).
    */
  private[graft] def recoverDanglingSwap(spark: SparkSession, tableName: String): Boolean = {
    val scratch = s"${tableName}_compacting"
    val recover =
      !spark.catalog.tableExists(tableName) && spark.catalog.tableExists(scratch)
    if (recover) {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(scratch))
      spark.sql(s"ALTER TABLE $scratch RENAME TO $tableName")
      // the crash happened before the old generation was deleted —
      // remove it now (prevGen of the scratch's own location)
      deleteDir(spark, prevGen(meta.location.toString))
    } else if (spark.catalog.tableExists(tableName)) {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(tableName))
      deleteDir(spark, prevGen(meta.location.toString))
    }
    recover
  }

  private def deleteDir(spark: SparkSession, dir: Option[String]): Unit =
    dir.foreach { old =>
      val p  = new org.apache.hadoop.fs.Path(old)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }

  /** Write-new/swap/delete-old for a table rewrite: `writeNew` produces
    * the next generation under a scratch table name at the next-gen
    * directory; the live name is then re-pointed by DROP + RENAME
    * (metadata-only — the tables are external, so neither op moves or
    * deletes files) and the previous generation's files are removed.
    *
    * Crash windows, explicitly: before the DROP, the old generation
    * stays live and intact (a leftover scratch is dropped on the next
    * attempt). BETWEEN the DROP and the RENAME there is a window with
    * NO live table — the old files are intact but the catalog entry is
    * gone; `recoverDanglingSwap` detects exactly that state (scratch
    * present, live name missing) and renames the finished next
    * generation into place, so the window heals on the next `compact`
    * call. The production form is a metastore-transactional swap.
    */
  private[graft] def swapGeneration(
      spark: SparkSession,
      tableName: String,
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable)(
      writeNew: (String, String) => Unit): Unit = {
    val oldDir  = new org.apache.hadoop.fs.Path(meta.location)
    val fs      = oldDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = s"${tableName}_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $scratch") // leftover from a crashed compact
    writeNew(scratch, nextGen(oldDir.toString))
    spark.sql(s"DROP TABLE $tableName")
    spark.sql(s"ALTER TABLE $scratch RENAME TO $tableName")
    fs.delete(oldDir, true)
    ()
  }

  /** Next rewrite-generation directory for a table location: `…/x` →
    * `…/x.g1` → `…/x.g2` → … (write-new/swap/delete-old, never
    * rewrite-in-place — a crash mid-rewrite must leave the live
    * generation intact).
    */
  private[graft] def nextGen(dir: String): String = {
    val GenRe = "(.*)\\.g(\\d+)".r
    dir match {
      case GenRe(base, n) => s"$base.g${n.toInt + 1}"
      case base           => s"$base.g1"
    }
  }

  /** Previous generation directory of `dir`, if `dir` is itself a
    * rewrite generation (None for a base directory — there is nothing
    * before generation 0).
    */
  private[graft] def prevGen(dir: String): Option[String] = {
    val GenRe = "(.*)\\.g(\\d+)".r
    dir match {
      case GenRe(base, n) if n.toInt > 1 => Some(s"$base.g${n.toInt - 1}")
      case GenRe(base, _)                => Some(base)
      case _                             => None
    }
  }
}
