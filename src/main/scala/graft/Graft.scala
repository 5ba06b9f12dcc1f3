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

  private val AdvisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

  /** Build the engine session.
    *
    * `advisoryMb` is the deployment dial for the AQE coalesce target
    * (default 16 MB compressed — see the policy note above). The
    * deployment rule, measured in round 8 across both of the host's
    * IO-price regimes: for jobs dominated by memory-AMPLIFYING
    * operators (window-sort densify like st06, large set-aggregation
    * buffers like q18 — unsafe rows decompress 4–8× the shuffle
    * bytes), divide the advisory by the operator's amplification
    * factor; on slow-spill clusters 2 MB measured best-in-regime.
    * Provisioning only — results are bit-identical at any setting
    * (InvarianceSpec pins this); the dial reaching the intended
    * exchanges is structurally asserted in PlanQualitySpec.
    */
  def session(
      master: String = "local[*]",
      shufflePartitions: Int = 32,
      advisoryMb: Int = 16): SparkSession = {
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
      .config(AdvisoryKey, s"${advisoryMb}m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val MinPartKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"

  private[graft] def sizeToBytes(size: String): Long = {
    val m = "(?i)^(\\d+)([kmg]?)$".r
    size match {
      case m(n, u) =>
        n.toLong << (u.toLowerCase match {
          case "k" => 10; case "m" => 20; case "g" => 30; case _ => 0
        })
      case _ => throw new IllegalArgumentException(s"bad size: $size")
    }
  }

  /** Per-JOB advisory dial on a live session: runs `body` with the AQE
    * coalesce target set to `size` (e.g. "2m" for an 8×-amplifying
    * densify/set-agg job per the rule above), then restores the prior
    * values. The advisory is a runtime SQL conf, so scoping it per job
    * is safe — no session rebuild, no effect on concurrent sessions.
    *
    * When `size` is below AQE's coalesce floor
    * (`coalescePartitions.minPartitionSize`, default 1m) the floor is
    * lowered to `size` as well — otherwise the floor silently overrides
    * the dial and the "target" is a fiction (found by the
    * PlanQualitySpec width assert: a 4k advisory still coalesced to one
    * partition until the floor moved).
    */
  def withAdvisory[T](spark: SparkSession, size: String)(body: => T): T = {
    // Validate BEFORE touching the conf: a size string our regex rejects
    // (e.g. "16mb", "0.5m") must throw while the session is still pristine.
    // Both sets also live inside the try so a failure between them cannot
    // leave the session half-dialed with no restore.
    val bytes = sizeToBytes(size)
    val prevAdv = spark.conf.getOption(AdvisoryKey)
    val prevMin = spark.conf.getOption(MinPartKey)
    try {
      spark.conf.set(AdvisoryKey, size)
      if (bytes < (1L << 20)) spark.conf.set(MinPartKey, size)
      body
    } finally {
      prevAdv.fold(spark.conf.unset(AdvisoryKey))(spark.conf.set(AdvisoryKey, _))
      prevMin.fold(spark.conf.unset(MinPartKey))(spark.conf.set(MinPartKey, _))
    }
  }
}
