package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // fixture-round-trip oracles (SourceQueries) read the fixtures of
    // the sf being verified — point them at the right directory
    sys.props("graft.verify.sfname") = new java.io.File(sfDir).getName
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // engine optimizer rules active during the gate: the oracle
      // compare doubles as a do-no-harm proof for the rewrites
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts has shipped as timestamp[ns] (→ long nanos under this
      // flag) and timestamp[us] (→ TIMESTAMP_NTZ, flag is a no-op);
      // Ops.tsMicros adapts to whichever the scan yields
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must NOT vanish silently from the round's
    // correctness artifact (round-6 lesson: 13 queries disappeared and
    // the artifact read as all-pass). Record every failure in
    // errors.json next to the result dumps and summarize loudly.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_ONLY=<regex>: dump only matching queries (targeted
    // re-verification after adding a query — a full sf1 dump is ~15
    // min). The driver never sets it; default behavior is identical.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
      .foreach { case (name, fn) =>
      // cache scope per query: builders persist shared subtrees; once
      // this query's write completes they are leaks (Caches.scoped)
      try Caches.scoped(spark) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.findFirstIn(k).isDefined) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    val total = SparkEntry.queries.count { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    println(s"[verify] dumped ${total - failures.size}/$total queries; ${failures.size} failed" +
      (if (failures.isEmpty) "" else s": ${failures.keys.mkString(", ")}"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(2)
  }
}
