package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for correctness parity with the DuckDB oracle (UTC session time
  * zone) and for scale (AQE on, shuffle partitions sized to cores rather
  * than the 200 default; at cluster scale this is overridden by
  * `spark.sql.adaptive.coalescePartitions` anyway). The engine's
  * optimizer rules (`plans.GraftExtensions`: join+distinct → semi join,
  * range-join auto-banding) are registered, so user-written queries get
  * the protective rewrites by default; Verify and Bench register the
  * same extensions, which makes the full oracle gate (128 hash-checked
  * queries) double as a do-no-harm proof for the rules.
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
