package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for correctness parity with the DuckDB oracle (UTC session time
  * zone) and for scale (AQE on, shuffle partitions sized to cores rather
  * than the 200 default). The engine's optimizer rules
  * (`plans.GraftExtensions`: join+distinct → semi join, range-join
  * auto-banding) are registered, so user-written queries get the
  * protective rewrites by default; Verify and Bench register the same
  * extensions, which makes the full oracle gate (129 hash-checked
  * queries) double as a do-no-harm proof for the rules.
  *
  * == Shuffle-width policy (the round-7 q45/q51 lesson, made default) ==
  *
  * Fixed-width window sorts are the one plan shape whose cost curve
  * bends when per-partition data outgrows task memory: at 40M events
  * over 32 shuffle partitions the event-time family's range-frame and
  * islands queries measured e≈1.3 purely from sort spill, and recovered
  * to e≤1.0 at width 256 with bit-identical results. On a real cluster
  * the fix is "partition count scales with data" — which AQE already
  * implements, provided the shuffle STARTS wide and coalesces down:
  *
  *   - `coalescePartitions.initialPartitionNum` = 32 × shufflePartitions
  *     (1024 at the default 32): every exchange is planned at the wide
  *     width; AQE merges small partitions after seeing map output sizes,
  *     so small stages still run at a handful of tasks while a 100×
  *     stage keeps hundreds. Width follows data with no per-workload
  *     tuning, and partition-count invariance of results is pinned by
  *     InvarianceSpec.
  *   - `advisoryPartitionSizeInBytes` = 16m (down from 64m): the
  *     coalesce target is COMPRESSED shuffle bytes, and unsafe-row sort
  *     runs decompress 4–8× larger, so 64 MB post-shuffle partitions
  *     put ~300–500 MB through each window-sort task — past the default
  *     per-task memory share on common executor sizings. 16 MB
  *     compressed keeps the in-memory run inside task memory; scan-side
  *     splits are unaffected (`files.maxPartitionBytes` stays default).
  *
  * Both are plain session confs — cluster deployments with different
  * executor geometry override them at submit time; the scale ladders
  * (`tools/ProfileR7Scale`) assert this policy is active when run in
  * engine-default mode.
  */
object Graft {
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (32 * shufflePartitions).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
