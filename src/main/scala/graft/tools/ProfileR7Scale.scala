package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 corpus-size scaling probe for the EVENT-TIME family — the
  * window/sessionization/as-of queries restored this round (they were
  * broken by the testdata timestamp-type switch during round 6, so the
  * round-6 ladder never covered them). Same methodology as
  * ProfileR6Scale: amplify the sf0.1 base m×, run the AS-WIRED graded
  * queries against the amplified directory, read scaling exponents off
  * the timing ladder.
  *
  * Density-preserving amplification for events: copy i offsets
  * `user_id` (and `event_id` for tie-break uniqueness) and leaves `ts`
  * untouched. Every per-user time series is replicated EXACTLY — same
  * gaps, same hourly grid, same error/purchase interleaving — so
  * per-user windows, sessionization, as-of matches, range frames and
  * islands all replicate m× with ZERO cross-copy interaction (users
  * never interact across copies in any graded query). Key-space
  * consequences by query family:
  *   - per-user partitions (st02/st04/st06/q45/q51/wp03): partition
  *     COUNT grows m×, per-partition size constant — the shape a real
  *     cluster scales by adding executors;
  *   - fixed-key aggregates (st01/st09: (hour, event_type)): key space
  *     constant, per-key counts grow m× — probes map-side partial
  *     aggregation (flat ≈ scan-bound is the pass);
  *   - banded range join (st05): per-user candidate fan-out constant,
  *     candidate mass m×.
  *
  * Usage: runMain graft.tools.ProfileR7Scale [m ...] (default 1 5 20 80)
  *        SPARK_GRAFT_ONLY=name,... narrows; SPARK_GRAFT_REUSE=1 keeps
  *        amplified dirs; SPARK_GRAFT_SHUFFLE sets shuffle width;
  *        SPARK_GRAFT_AQE_WIDTH=1 runs in ENGINE-DEFAULT width mode
  *        (Graft.session's wide-start + AQE-coalesce policy) and
  *        asserts the policy is active — the deployment-guidance check
  *        the round-7 review asked for.
  */
object ProfileR7Scale {

  /** Probe session. Default: pinned shuffle width (the controlled
    * variable of the e / e@256 ladder columns). Engine-default mode
    * (SPARK_GRAFT_AQE_WIDTH=1): Graft.session's shuffle-width policy —
    * wide initialPartitionNum + 16m advisory size — with a readback
    * assert, so the ladder itself verifies the deployed config encodes
    * the q45/q51 lesson rather than trusting the session factory.
    */
  private[tools] def probeSession(shuffle: String): SparkSession = {
    val aqeWidth = sys.env.get("SPARK_GRAFT_AQE_WIDTH").contains("1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark = (if (aqeWidth)
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          (32 * shuffle.toInt).toString)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    else b).getOrCreate()
    if (aqeWidth) {
      val init = spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum").toInt
      val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val adv  = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean && init >= 8 * base,
        s"engine width policy inactive: initialPartitionNum=$init vs shuffle=$base")
      assert(adv.replaceAll("[^0-9]", "").toLong <= 16,
        s"advisory partition size not window-sort-sized: $adv")
      println(s"[scale] engine-default width mode: initial=$init advisory=$adv base=$base")
    }
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def scaledEvents(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base
      else
        base
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
          .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
    }.reduce(_ unionByName _)

  private val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "st01_event_hourly"    -> graft.operators.PipelineQueries.st01_event_hourly,
    "st02_sessionize"      -> graft.operators.PipelineQueries.st02_sessionize,
    "st04_asof_join"       -> graft.operators.PipelineQueries.st04_asof_join,
    "st05_range_join"      -> graft.operators.ExtendedQueries.st05_range_join,
    "st06_resample_ffill"  -> graft.operators.ExtendedQueries.st06_resample_ffill,
    "st09_windowed_topn"   -> graft.operators.CurationQueries.st09_windowed_topn,
    "q45_islands"          -> graft.operators.ExtendedQueries.q45_islands,
    "q51_range_frame"      -> graft.operators.ExtendedQueries.q51_range_frame,
    "q52_cohort_retention" -> graft.operators.CurationQueries.q52_cohort_retention,
    "wp03_scd2_intervals"  -> graft.operators.ExtendedQueries.wp03_scd2_intervals)

  def main(args: Array[String]): Unit = {
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark   = probeSession(shuffle)

    val ms   = if (args.isEmpty) Seq(1, 5, 20, 80) else args.map(_.toInt).toSeq
    val base = Tables(spark, "/root/testdata/sf0.1")
    ms.foreach { m =>
      val dir = s"/tmp/graft_scale_ev/m$m"
      val reuse = sys.env.get("SPARK_GRAFT_REUSE").contains("1") &&
        new java.io.File(s"$dir/events.parquet").exists()
      if (!reuse)
        scaledEvents(base.events, m)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val ne = spark.read.parquet(s"$dir/events.parquet").count()
      println(s"[scale] m=$m events=$ne")
      val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
      queries.filter(q => only.forall(_.contains(q._1))).foreach { case (name, fn) =>
        graft.Caches.scoped(spark) {
          val t0 = System.nanoTime()
          // force the FULL executed plan, not count(): under a count
          // aggregate Catalyst prunes projection-only windows (q51's
          // rolling sums, wp03's lead intervals, st04's matched
          // columns) and eliminates final sorts, so count() would
          // measure a scan for exactly the queries this probe exists
          // to scale-test. toRdd pays what Verify's parquet write pays.
          val n = fn(spark, dir).queryExecution.toRdd.count()
          println(f"[scale] m=$m%-3d $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
        }
      }
    }
    spark.stop()
  }
}

/** Relational-family scaling probe — completes the scale-evidence
  * triptych (round 6: dedup/ANN; round 7: event-time; this: the
  * TPC-H-ish join/agg/division surface).
  *
  * Amplification preserves referential structure: copy i offsets
  * c_custkey / o_orderkey+o_custkey / l_orderkey, so every
  * customer→orders→lineitem subtree replicates exactly m×, while
  * part/supplier FKs are left UNCHANGED — dimension key spaces stay
  * fixed and per-dimension-key fan-in grows m×, which is how a real
  * catalog grows (facts accumulate, dimensions don't). Consequences:
  *   - per-order groups (q16/q17/q18): group count m×, group size
  *     constant — probes partial aggregation;
  *   - per-customer windows/semis (q07/q22/q49/q11): key count m×;
  *   - hot dimension keys (q11's brand bridge): per-brand rows m× —
  *     probes the division under growing duplication;
  *   - wp02 cascade: semi/anti chains replicate m×;
  *   - q54: the decorrelated lineitem aggregate grows m× under a
  *     constant-selectivity outer filter.
  *
  * Usage: runMain graft.tools.ProfileR7RelScale [m ...] (default 1 5 20 80)
  */
object ProfileR7RelScale {

  private def off(c: String, i: Int, step: Long) = col(c) + lit(i * step)

  def scaledCustomer(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base else base.withColumn("c_custkey", off("c_custkey", i, 10000000L))
    }.reduce(_ unionByName _)

  def scaledOrders(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base
      else base
        .withColumn("o_orderkey", off("o_orderkey", i, 10000000L))
        .withColumn("o_custkey", off("o_custkey", i, 10000000L))
    }.reduce(_ unionByName _)

  def scaledLineitem(base: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      if (i == 0) base else base.withColumn("l_orderkey", off("l_orderkey", i, 10000000L))
    }.reduce(_ unionByName _)

  private val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q07_semi_join"      -> graft.operators.FilterJoinQueries.q07_semi_join,
    "q11_division"       -> graft.operators.FilterJoinQueries.q11_division,
    "q12_exclude"        -> graft.operators.FilterJoinQueries.q12_exclude,
    "q16_count_distinct" -> graft.operators.AggQueries.q16_count_distinct,
    "q17_having"         -> graft.operators.AggQueries.q17_having,
    "q18_agg_equality"   -> graft.operators.AggQueries.q18_agg_equality,
    "q22_latest_per_key" -> graft.operators.WindowQueries.q22_latest_per_key,
    "q49_topk_group"     -> graft.operators.ExtendedQueries.q49_topk_group,
    "q54_correlated_scalar" -> graft.operators.TrainingQueries.q54_correlated_scalar,
    "wp02_softdelete_cascade" -> graft.operators.PipelineQueries.wp02_softdelete_cascade)

  def main(args: Array[String]): Unit = {
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark   = ProfileR7Scale.probeSession(shuffle)

    val ms   = if (args.isEmpty) Seq(1, 5, 20, 80) else args.map(_.toInt).toSeq
    val base = Tables(spark, "/root/testdata/sf0.1")
    ms.foreach { m =>
      val dir = s"/tmp/graft_scale_rel/m$m"
      val reuse = sys.env.get("SPARK_GRAFT_REUSE").contains("1") &&
        new java.io.File(s"$dir/lineitem.parquet").exists()
      if (!reuse) {
        scaledCustomer(base.customer, m)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/customer.parquet")
        scaledOrders(base.orders, m)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
        scaledLineitem(base.lineitem, m)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        // dimensions pass through unamplified
        base.part.write.mode("overwrite").parquet(s"$dir/part.parquet")
        base.supplier.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
        base.nation.write.mode("overwrite").parquet(s"$dir/nation.parquet")
        base.region.write.mode("overwrite").parquet(s"$dir/region.parquet")
      }
      val nl = spark.read.parquet(s"$dir/lineitem.parquet").count()
      println(s"[scale] m=$m lineitem=$nl")
      val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
      queries.filter(q => only.forall(_.contains(q._1))).foreach { case (name, fn) =>
        graft.Caches.scoped(spark) {
          val t0 = System.nanoTime()
          // full executed plan, same rationale as ProfileR7Scale
          val n = fn(spark, dir).queryExecution.toRdd.count()
          println(f"[scale] m=$m%-3d $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
        }
      }
    }
    spark.stop()
  }
}
