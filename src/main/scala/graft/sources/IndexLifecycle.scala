package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared lifecycle machinery for persisted, bucketed indexes — the
  * tombstone set, the replay-marker commit log, the live read view,
  * and the compaction-policy inputs that the posting index
  * (`graft.retrieval.Postings`) and the IVF vector index
  * (`graft.similarity.Knn`) both need. Extracted (round 14) because
  * the two families had grown parallel copies of the identical
  * machinery and the copies had already drifted once (the r13 IVF
  * side was one round behind on deletion), and a second time in the
  * small: the IVF marker log didn't separate append from delete
  * batches at all, and the posting index's sign-separated stats
  * space collided at zero for empty batches. One implementation,
  * one set of invariants:
  *
  *   - **tombstones** `(id, batch_id)`: deletion stays append-only —
  *     reads anti-join the set (`liveView`), compaction drops the
  *     rows physically and clears the set (`clearTombs`, LAST in the
  *     compaction order so a crash leaves reads correct).
  *   - **markers** `(batch_id, kind)`: the replay-idempotence commit
  *     log for indexes with no stats table to carry the marker.
  *     Appends and deletes occupy DISJOINT kind spaces, so an append
  *     stream and a delete stream can maintain one index with
  *     independent zero-based foreachBatch ids — and unlike the
  *     sign trick, the kind column stays disjoint for EMPTY batches
  *     too (there is no "zero" that belongs to both sides). Markers
  *     are never compacted: a delete-batch replay arriving after
  *     compaction must still no-op, even though the tombstone rows
  *     it wrote are long gone.
  *   - **caller contract** (`requireNotTombstoned`): a doc whose
  *     tombstone is still live can be neither re-appended (the
  *     anti-join would hide it while its stats row counts it — every
  *     idf and length norm silently drifts) nor re-deleted (stats
  *     would over-subtract). Enforced with a loud refusal, not
  *     documentation; compaction clears the set and re-opens the id.
  *
  * Reference anchor: the reference treats deletion as a soft-delete
  * read semantic (models.py:909-911, api/views.py:164-174); the
  * lifecycle here is the index-maintenance upgrade a 100 TB curation
  * pipeline needs on top of that semantic.
  */
object IndexLifecycle {

  /** Marker kind for committed append batches. */
  val Append = "a"

  /** Marker kind for committed delete batches. */
  val Delete = "d"

  // ---------- replay-marker commit log (batch_id, kind) ----------

  /** (Re)create an index's EMPTY marker log — catalog metadata only,
    * no Spark job (r18: the zero-row write cost one single-task job
    * per index build; an external parquet table with no files already
    * reads as empty).
    */
  def writeEmptyMarkers(spark: SparkSession, table: String, path: String): Unit =
    Layout.createEmptyTable(
      spark, table, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "batch_id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "kind", org.apache.spark.sql.types.StringType, nullable = false))))

  /** REFUSE a marker log persisted by the pre-r14 single-column
    * layout (bare `batch_id`, no `kind`). The legacy log cannot be
    * read safely under the kind-separated contract: its committed
    * append markers are invisible to a kind-filtered replay check, so
    * a replayed old batch would re-apply — and a naive in-place use
    * fails anyway with an unresolved-column/arity error mid-write.
    * The refusal names the fix (rebuild) instead; an automatic
    * migration (legacy rows → kind='a') is deliberately NOT done
    * here: marker writes happen inside streaming foreachBatch, and a
    * silent schema rewrite racing a concurrent maintenance stream is
    * exactly the kind of surprise a commit log must never produce.
    */
  private def requireKindColumn(spark: SparkSession, table: String): Unit =
    require(
      spark.table(table).columns.contains("kind"),
      s"marker log $table uses the legacy single-column (batch_id) layout — " +
        "rebuild the index with writeIndex/writePositionalIndex/writeIvfIndex " +
        "to adopt the kind-separated (batch_id, kind) commit log")

  /** Whether `batchId` is already committed in `kind`'s marker space
    * (a foreachBatch at-least-once replay — the caller skips the
    * whole batch).
    */
  def markerPresent(spark: SparkSession, table: String, batchId: Long, kind: String): Boolean = {
    requireKindColumn(spark, table)
    // footer-metadata fast path (r17, extended r18): the footer pass
    // that used to answer only "is the log row-empty" now also prunes
    // by the blocks' min/max batch_id — streaming ids are monotone,
    // so a NEW batch sits above every file's max and the whole probe
    // job disappears on the common path. Unprovable (value in range,
    // stats missing, unreadable) runs the filter probe as before.
    !Layout.footerExcludesLongValue(spark, table, "batch_id", batchId) &&
    !spark.table(table)
      .filter(col("batch_id") === batchId && col("kind") === kind).isEmpty
  }

  /** Commit `batchId` in `kind`'s marker space. Callers write the
    * marker LAST: marker-first would LOSE a batch on crash,
    * marker-last can only duplicate one (documented in each caller).
    * One literal row — written driver-side, no Spark job (r18; same
    * temp-then-rename visibility discipline as the committer).
    */
  def writeMarker(spark: SparkSession, table: String, batchId: Long, kind: String): Unit = {
    requireKindColumn(spark, table)
    Layout.appendRowDriverSide(spark, table, Seq("batch_id" -> batchId, "kind" -> kind))
  }

  // ---------- tombstone set (idName, batch_id) ----------

  /** (Re)create an index's EMPTY tombstone table — a fresh build has
    * no deleted rows. Schema `(idName long, batch_id long)`: the ids
    * every read path anti-joins, tagged by the delete batch that
    * wrote them (so a torn delete's replay can be told apart from a
    * genuine double-delete — see `requireNotTombstoned`).
    */
  def writeEmptyTombs(spark: SparkSession, table: String, path: String, idName: String): Unit =
    Layout.createEmptyTable(
      spark, table, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          idName, org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "batch_id", org.apache.spark.sql.types.LongType, nullable = false))))

  /** Append a delete batch's tombstone rows (the ids in `ids(idCol)`,
    * cast to long, tagged `batchId`).
    */
  def appendTombs(ids: DataFrame, idCol: String, table: String, idName: String, batchId: Long): Unit =
    ids
      .select(col(idCol).cast("long").as(idName), lit(batchId).as("batch_id"))
      .write.mode("append").insertInto(table)

  /** Whether the tombstone set exists and is non-empty (the
    * compaction paths read this once and branch — an empty set means
    * no drop-rewrite work at all). Footer-metadata probe, no job
    * (r17); an unreadable footer (-1) falls back to the limit-1 scan.
    */
  def tombsLive(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table) && {
      Layout.parquetRowCount(spark, table) match {
        case -1L => !spark.table(table).isEmpty
        case n   => n > 0L
      }
    }

  /** Clear the tombstone set after compaction physically dropped the
    * rows — called LAST in the compaction order, so a crash anywhere
    * earlier leaves the tombstones live and the reads still correct.
    * Same write-new/swap/delete-old discipline as every rewrite
    * (`Layout.swapGeneration`). The rebuilt empty table preserves the
    * LIVE schema (a posting-family tombstone table carries bucket-mask
    * columns beyond the shared (id, batch_id) core — see
    * `Postings.writeEmptyTombs`); `idName` is kept for call-site
    * symmetry with the other tombstone entry points.
    */
  def clearTombs(spark: SparkSession, table: String, idName: String): Unit = {
    Layout.recoverDanglingSwap(spark, table)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    require(meta.schema.fieldNames.contains(idName), s"$table has no $idName column")
    // the rebuilt empty next generation is catalog metadata only — no
    // zero-row write job (r18); paid at the end of EVERY retirement
    // and compaction, so the saved job multiplies with maintenance
    // cadence
    Layout.swapGeneration(spark, table, meta) { (scratch, newDir) =>
      Layout.createEmptyTable(spark, scratch, newDir, meta.schema)
    }
  }

  /** Remove `ids` from the tombstone set — the PER-BUCKET accounting a
    * bucket-scoped compaction needs (round 15): when a rewrite
    * provably dropped ALL physical rows of some tombstoned ids (e.g.
    * an IVF vector lives in exactly one cell bucket, so rewriting its
    * bucket drops it completely), those ids leave the set while the
    * rest stay live. Same swap discipline as `clearTombs`; called
    * LAST, after the rewrite, so a crash in between leaves the
    * tombstones live and reads still correct. `ids` is driver-side by
    * contract — it is a subset of the broadcast-sized tombstone set.
    */
  def removeTombs(spark: SparkSession, table: String, idName: String, ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    Layout.recoverDanglingSwap(spark, table)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    // anti-join, not isin(ids): a wide maintenance window can legally
    // hold up to heavyFraction × live ids, and an isin that size blows
    // the codegen expression-size limit; the id frame is driver-side
    // already (the caller collected it), so the broadcast is free
    import spark.implicits._
    val idsDf = ids.toDF(idName)
    val survivors = spark.read.schema(meta.schema).parquet(meta.location.toString)
      .join(broadcast(idsDf), Seq(idName), "left_anti")
      .select(meta.schema.fieldNames.map(col).toSeq: _*)
    Layout.swapGeneration(spark, table, meta) { (scratch, newDir) =>
      survivors.write.mode("overwrite").option("path", newDir).saveAsTable(scratch)
    }
  }

  /** Broadcast hint for a tombstone-set frame, SIZE-GATED (round 16 —
    * VERDICT r15 #3): the tombstone set is slim by the compaction-
    * cadence contract, but between `maxTombstones` tripping and the
    * maintenance pass running — or on a deployment that delays
    * maintenance — the set can reach `heavyFraction × live` (up to 20%
    * of live docs), and an unconditional `broadcast()` of billions of
    * ids would OOM the driver at 100 TB. The gate is a METADATA probe
    * (the tombstone table's parquet bytes — one directory listing, no
    * job): at or below `spark.graft.tombstoneBroadcastBytes` (default
    * 64 MiB, ~4M masked tombstone rows) the hint applies as before; above
    * it the frame joins UN-hinted and AQE picks the strategy from
    * runtime stats (a shuffled join on a set that size is the correct
    * plan — and still correct, just not hinted, if AQE re-derives a
    * broadcast). Answers are identical either way (spec-pinned).
    */
  def maybeBroadcast(spark: SparkSession, table: String, df: DataFrame): DataFrame =
    maybeBroadcastBytes(spark, Layout.parquetBytes(spark, table), df)

  /** Bytes-known form of `maybeBroadcast` (r18 — VERDICT r17 #4): the
    * fused guard probes (`liveView`, `requireNotTombstoned`) already
    * hold the tombstone table's parquet bytes from their ONE directory
    * listing, so the size gate must not pay a second listing of the
    * same directory. A negative `bytes` (unreadable metadata) declines
    * the hint — AQE still picks the right strategy from runtime stats.
    */
  private[graft] def maybeBroadcastBytes(spark: SparkSession, bytes: Long, df: DataFrame): DataFrame = {
    // a malformed conf value must not throw from inside every read and
    // maintenance path that joins the tombstone set (ADVICE r16): fall
    // back to the default, loudly naming the key at fault
    val default = 64L << 20
    val limit = spark.conf.getOption("spark.graft.tombstoneBroadcastBytes").map { v =>
      try v.trim.toLong
      catch {
        case _: NumberFormatException =>
          System.err.println(
            s"graft: spark.graft.tombstoneBroadcastBytes='$v' is not a long — " +
              s"using the default $default")
          default
      }
    }.getOrElse(default)
    if (bytes >= 0L && bytes <= limit) broadcast(df) else df
  }

  /** Anti-join `df` against the index's tombstone set — the live read
    * view. Fast paths: a missing (pre-deletion layout) or EMPTY
    * tombstone table reads the frame untouched (the empty probe is a
    * file-listing-sized job, not a scan). Non-empty: a broadcast
    * anti-join above the bucketed scan — no exchange on the index
    * side, so every zero-shuffle and bucket-pruning plan property
    * survives deletion (spec-pinned in RetrievalSpec/DedupKnnSpec).
    * The hint is size-gated (`maybeBroadcast`) so a delayed-
    * maintenance deployment whose set outgrew the broadcast budget
    * degrades to a planned join, never a driver OOM. `dfIdName` is the
    * id column's name in `df` (the IVF index calls its vector id
    * `n_id` on the read side).
    */
  def liveView(
      spark: SparkSession,
      table: String,
      idName: String,
      df: DataFrame,
      dfIdName: String): DataFrame =
    if (!spark.catalog.tableExists(table)) df
    else {
      // ONE listing answers both questions (r18): emptiness from the
      // footers (r17's probe) and the broadcast size gate from the
      // same FileStatus entries — was two listings of the same
      // directory per guarded read. rows == -1 (unreadable/unexpected
      // layout) falls back to the probe job, exactly the r17 path.
      val (rows, bytes) = Layout.parquetDirStats(spark, table)
      val live = if (rows == -1L) !spark.table(table).isEmpty else rows > 0L
      if (!live) df
      else
        df.join(
          maybeBroadcastBytes(spark, bytes, spark.table(table).select(col(idName).as(dfIdName))),
          Seq(dfIdName), "left_anti")
    }

  /** Compaction-rewrite transform: drop tombstoned rows while the
    * generation rewrite is running anyway (physical deletion costs
    * zero extra passes). Restores the frame's original column order —
    * a USING join moves the key to the front, and the rewrite is
    * written under the same positional spec. Size-gated hint, like
    * every tombstone-set join.
    */
  def dropTombstonedTransform(
      spark: SparkSession,
      table: String,
      idName: String,
      dfIdName: String): DataFrame => DataFrame =
    dropTombstonedTransform(spark, table, idName, dfIdName, Layout.parquetBytes(spark, table))

  /** Bytes-known form (r18): callers holding the tombstone table's
    * parquet bytes from their own fused probe pass them through, so
    * the size gate never re-lists the directory — once at transform
    * creation, not per application.
    */
  private[graft] def dropTombstonedTransform(
      spark: SparkSession,
      table: String,
      idName: String,
      dfIdName: String,
      bytes: Long): DataFrame => DataFrame =
    df =>
      df.join(
        maybeBroadcastBytes(spark, bytes, spark.table(table).select(col(idName).as(dfIdName))),
        Seq(dfIdName),
        "left_anti")
        .select(df.columns.map(col).toSeq: _*)

  // ---------- caller-contract guard ----------

  /** REFUSE (loudly, before any write) a batch that touches ids still
    * live in the tombstone set — the enforcement of the append/delete
    * caller contract that used to be documentation only:
    *
    *   - an APPEND of a still-tombstoned id would be hidden by every
    *     read's anti-join while its stats row adds to N/sum_dl —
    *     every subsequent idf and length norm silently drifts;
    *   - a second DELETE of the same id would subtract its stats
    *     twice (and a delete of a never-indexed id has the same
    *     signature — this guard catches the reachable interleaved-
    *     stream shape; full membership checks would cost a
    *     corpus-sized probe).
    *
    * `excludeBatchId`: a delete batch's own replay after a torn crash
    * (tombstones landed, marker didn't) legitimately re-applies — its
    * own batch id's tombstone rows are excluded from the conflict
    * check, so the replay completes while a genuine double-delete
    * from a DIFFERENT batch still refuses. The guard reads the
    * tombstone set once (policy-bounded by the compaction cadence —
    * `tombstonesExceed`, with the broadcast hint size-gated like every
    * tombstone-set join); an empty set costs a slim-table probe, no
    * batch scan.
    */
  def requireNotTombstoned(
      spark: SparkSession,
      tombsTable: String,
      idName: String,
      ids: DataFrame,
      idCol: String,
      op: String,
      excludeBatchId: Option[Long] = None): Unit = {
    if (!spark.catalog.tableExists(tombsTable)) return
    // footer-metadata emptiness fast path (r17): a row-empty table
    // cannot conflict, no job. A non-empty table whose every row is
    // batch-excluded previously short-circuited on a limit-1 probe
    // job; now it runs the conflict join directly — same answer, and
    // one job either way. ONE listing feeds both the emptiness probe
    // and the broadcast size gate (r18 — was two of the same dir).
    val (rows, bytes) = Layout.parquetDirStats(spark, tombsTable)
    val live = if (rows == -1L) !spark.table(tombsTable).isEmpty else rows > 0L
    if (!live) return
    val all = spark.table(tombsTable)
    val tombs = excludeBatchId.fold(all)(b => all.filter(col("batch_id") =!= b))
    val conflict = ids
      .select(col(idCol).cast("long").as(idName))
      .join(maybeBroadcastBytes(spark, bytes, tombs.select(col(idName))), Seq(idName))
      .limit(1).collect()
    require(
      conflict.isEmpty,
      s"$op: id ${conflict.head.getLong(0)} is still live in the tombstone set ($tombsTable) — " +
        "a tombstoned id can be neither re-appended (reads would hide it while its stats count) " +
        "nor re-deleted (stats would over-subtract); compact the index (which clears the set) first")
  }

  // ---------- compaction-policy inputs ----------

  /** Whether the index's tombstone set has grown past `max` distinct
    * ids — the read-side anti-join set must stay broadcast-sized, and
    * the compaction policy is where that contract is enforced rather
    * than documented.
    */
  def tombstonesExceed(spark: SparkSession, table: String, idName: String, max: Long): Boolean =
    max < Long.MaxValue &&
      spark.catalog.tableExists(table) &&
      spark.table(table).select(col(idName)).distinct().count() > max

  /** Whether any of `tables` (those that exist) has fragmented past
    * `maxFilesPerBucket` parquet files per bucket. Appends write at
    * most one file set per bucket per batch, so ceil(files/buckets)
    * bounds the per-bucket fragment count — i.e. ~the append count
    * since the last compaction, measured directly from the layout
    * (Hadoop FS recursive listing, like `Layout.swapGeneration` — a
    * `java.io.File(URI)` would throw on non-file: table locations).
    */
  def bucketsFragmentedBeyond(
      spark: SparkSession,
      tables: Seq[String],
      maxFilesPerBucket: Int): Boolean = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    tables
      .filter(spark.catalog.tableExists)
      .exists { table =>
        val meta = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table))
        val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(1)
        val dir = new org.apache.hadoop.fs.Path(meta.location)
        val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val files =
          if (!fs.exists(dir)) 0
          else {
            val it = fs.listFiles(dir, true)
            var n  = 0
            while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
            n
          }
        (files + buckets - 1) / buckets > maxFilesPerBucket
      }
  }
}
