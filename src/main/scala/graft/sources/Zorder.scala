package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering (Z-order) for scan pruning on MORE
  * than the leading sort column.
  *
  * A linearly sorted layout (Catalog.compact's `sortCols`) gives
  * min/max row-group pruning on its leading column and nothing on the
  * others: a `user_id` range filter over a ts-sorted events table
  * must open every row group, because every group spans the full
  * user_id domain. Interleaving the bits of both columns' bucket
  * indexes (the Z-curve) bounds each row group to a small rectangle
  * of the (ts, user_id) plane, so a range filter on EITHER column
  * overlaps only ~the corresponding stripe of groups — the standard
  * lakehouse OPTIMIZE ZORDER trade: slightly weaker leading-column
  * locality for usable pruning on all clustered columns.
  *
  * Everything is native codegen'd expressions — `width_bucket` for
  * the equi-width bucket index, a shift/or fold for the interleave —
  * no UDFs; the write is `repartitionByRange(z)` +
  * `sortWithinPartitions(z)`, so parquet's per-row-group min/max
  * stats do the pruning at read time with zero reader cooperation
  * (the scan carries ordinary pushed filters on the data columns).
  *
  * Domain bounds for the bucketing are taken from the frame itself
  * (one cheap min/max agg — the same two-pass shape as
  * Catalog.compact's size probe). Equi-width bucketing is
  * deliberate: it needs only two scalars per column (quantile-based
  * bucketing would balance skew better but costs an approxQuantile
  * pass and a per-row binary search; at 100 TB the two-scalar form
  * is what writes fast, and Z-pruning only needs boundedness, not
  * balance).
  */
object Zorder {

  /** Interleave the low `bits` bits of two non-negative bucket-index
    * columns: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Plain shift/or fold — codegen'd, no UDF.
    */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Equi-width bucket index of `c` in [lo, hi] → [0, 2^bits).
    * Degenerate domains (lo == hi) collapse to bucket 0; nulls sort
    * first as bucket 0.
    */
  def bucketIdx(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    if (lo >= hi) lit(0L)
    else
      least(
        lit(n - 1L),
        greatest(lit(0L), coalesce(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(n)), lit(1L)) - 1L))
  }

  /** Write `df` clustered on the Z-curve of (`colA`, `colB`) into
    * `nFiles` parquet files at `path`. Numeric/timestamp columns only
    * (timestamps are bucketed on their epoch-micros). The data
    * columns are written as-is — the z value exists only during the
    * write — so readers just push normal predicates and let parquet
    * row-group stats prune.
    */
  def write(df: DataFrame, path: String, colA: String, colB: String, nFiles: Int, bits: Int = 12): Unit = {
    def numeric(name: String): Column = {
      val c = col(name)
      df.schema(name).dataType match {
        // both timestamp flavors → epoch micros (monotone is all the
        // bucketing needs); NTZ can't cast to long/double directly
        case _: org.apache.spark.sql.types.TimestampType    => unix_micros(c).cast("double")
        case _: org.apache.spark.sql.types.TimestampNTZType => unix_micros(c.cast("timestamp")).cast("double")
        case _                                              => c.cast("double")
      }
    }
    val bounds = df.agg(
      min(numeric(colA)).cast("double"), max(numeric(colA)).cast("double"),
      min(numeric(colB)).cast("double"), max(numeric(colB)).cast("double")).head()
    if (bounds.isNullAt(0) || bounds.isNullAt(2)) {
      // empty frame (or all-null cluster columns): no domain to bucket —
      // write the rows as-is rather than NPE on the null aggregates
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (aLo, aHi, bLo, bHi) =
      (bounds.getDouble(0), bounds.getDouble(1), bounds.getDouble(2), bounds.getDouble(3))
    val z = interleave(
      bucketIdx(numeric(colA), aLo, aHi, bits),
      bucketIdx(numeric(colB), bLo, bHi, bits),
      bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
