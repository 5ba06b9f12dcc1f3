package graft

import graft.sources.Zorder
import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Z-order clustering: semantic invisibility of the rewrite, real
  * row-group pruning on the SECOND clustered column (which a linear
  * sort cannot give), and ordinary filter pushdown on the scan.
  */
class ZorderSpec extends SparkTestBase {
  import spark.implicits._

  private def events = Tables(spark, sfDir).events

  /** (min, max) of `column` per parquet row group under `dir` — read
    * straight from the footers, i.e. exactly the stats the reader's
    * min/max screening uses.
    */
  private def rowGroupRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles.toSeq.filter(_.getName.endsWith(".parquet")).flatMap { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
        val st = b.getColumns.asScala.find(_.getPath.toDotString == column).get.getStatistics
        (st.genericGetMin.asInstanceOf[Number].longValue, st.genericGetMax.asInstanceOf[Number].longValue)
      } finally rd.close()
    }
  }

  test("z-ordered rewrite is semantically invisible (row-identical to the source)") {
    val dir = Files.createTempDirectory("graft_z").toString + "/z"
    Zorder.write(events, dir, "ts", "user_id", nFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    val cols = events.columns.sorted.toSeq
    // exceptAll requires identical schemas, so both directions together
    // pin schema AND multiset equality
    assert(back.select(cols.map(col): _*).exceptAll(events.select(cols.map(col): _*)).isEmpty)
    assert(events.select(cols.map(col): _*).exceptAll(back.select(cols.map(col): _*)).isEmpty)
  }

  test("user_id range filter prunes z-ordered row groups; a ts-sorted layout keeps them all") {
    val base   = Files.createTempDirectory("graft_z").toString
    val linDir = s"$base/linear"
    val zDir   = s"$base/z"
    // the linear baseline: the classic time-sorted event log
    events
      .repartitionByRange(16, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(linDir)
    Zorder.write(events, zDir, "ts", "user_id", nFiles = 16)
    val (lo, hi) = (3L, 5L)
    def surviving(dir: String): (Int, Int) = {
      val rgs = rowGroupRanges(dir, "user_id")
      (rgs.count { case (mn, mx) => mx >= lo && mn <= hi }, rgs.size)
    }
    val (linHit, linAll) = surviving(linDir)
    val (zHit, zAll)     = surviving(zDir)
    info(s"row groups overlapping user_id [$lo,$hi]: linear $linHit/$linAll, z-order $zHit/$zAll")
    // ts-sorted files each span the whole user domain — nothing prunes
    assert(linHit == linAll, "expected the linear layout to be unprunable on user_id")
    // the z layout must prune strictly, and by a useful margin
    assert(zHit < zAll && zHit <= (zAll * 6) / 10,
      s"z-order pruning too weak: $zHit/$zAll row groups survive")
    // and the pruned read returns exactly the unpruned answer
    val expect = events.filter(col("user_id").between(lo, hi)).agg(count(lit(1)), sum(col("user_id"))).head()
    val got    = spark.read.parquet(zDir).filter(col("user_id").between(lo, hi))
      .agg(count(lit(1)), sum(col("user_id"))).head()
    assert(got == expect)
  }

  test("the z scan pushes the user_id predicate down to parquet") {
    val dir = Files.createTempDirectory("graft_z").toString + "/z"
    Zorder.write(events, dir, "ts", "user_id", nFiles = 8)
    val q = spark.read.parquet(dir).filter(col("user_id") >= 3L && col("user_id") <= 9L)
    q.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case qs: QueryStageExec       => Seq(qs) ++ expand(qs.plan)
      case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
      case other                    => Seq(other) ++ other.children.flatMap(expand)
    }
    val scans = expand(q.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(
      scans.exists(_.metadata.get("PushedFilters").exists(s =>
        s.contains("GreaterThanOrEqual(user_id") && s.contains("LessThanOrEqual(user_id"))),
      scans.map(_.metadata.get("PushedFilters")).mkString(" | "))
  }

  test("empty input frame: write is a no-op layout (no NPE on null bounds)") {
    val dir = Files.createTempDirectory("graft_z_empty").toString + "/z"
    Zorder.write(events.limit(0), dir, "ts", "user_id", nFiles = 4)
    assert(spark.read.parquet(dir).count() == 0)
  }
}
