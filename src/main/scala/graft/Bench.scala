package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry at
  * `SPARK_GRAFT_SF_DIR` and prints ONE compact JSON line.
  *
  * Hygiene, learned from round 1 (the driver's log-tail capture
  * truncated a ~2.9 KB line → unparseable; per-query times degraded
  * monotonically over the run):
  *   - values rounded to ms so the line stays well under 2 KB;
  *   - deterministic (sorted) query order, round-robin stable;
  *   - per-query cache reset: a query's own persist() is part of its
  *     cost, but one query's leftovers must not skew the next;
  *   - UI/status-store retention capped: AQE re-emits large plan
  *     descriptions per stage, and with 126 query runs the default
  *     retainedExecutions=1000 accumulates heap pressure that shows up
  *     as GC time inside later queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Debug toggles (default = production behavior): SPARK_GRAFT_NO_EXT=1
    // disables the optimizer extensions; SPARK_GRAFT_ONLY=<regex> times a
    // subset of queries. Both exist for local A/B plan experiments.
    val noExt = sys.env.get("SPARK_GRAFT_NO_EXT").contains("1")
    val only  = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      // events.ts has shipped as timestamp[ns] (→ long nanos under this
      // flag) and timestamp[us] (→ TIMESTAMP_NTZ, flag is a no-op);
      // Ops.tsMicros adapts to whichever the scan yields
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark =
      (if (noExt) builder
       else builder.config("spark.sql.extensions", "graft.plans.GraftExtensions"))
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    // ---- UNTIMED warm-up (r18 — VERDICT r17 #6, additions-only) ----
    // A cold single-pass driver window front-loads JIT/codegen +
    // first-touch schema/footer work onto the alphabetically-early
    // queries (d09–d16 read 2-8× worse than the same build's min-clean
    // numbers). Running every query once at the SMALLEST sibling scale
    // factor (sf0.001 — seconds of work) before pass 1 moves that
    // one-time cost OUTSIDE the timed region. Nothing in the timed
    // passes changes: same queries, same action, same per-query cache
    // reset; the warm-up uses DIFFERENT data (so nothing it computes
    // can be reused as a result) and is labeled in the artifact.
    // Opt-outs: SPARK_GRAFT_NO_WARMUP=1, or no sibling sf0.001 dir.
    val warmupDir: Option[String] =
      if (sys.env.get("SPARK_GRAFT_NO_WARMUP").contains("1")) None
      else sys.env.get("SPARK_GRAFT_WARMUP_DIR").orElse {
        try {
          val p = java.nio.file.Paths.get(sfDir).toAbsolutePath
          Option(p.getParent).map(_.resolve("sf0.001"))
            .filter(java.nio.file.Files.isDirectory(_))
            .map(_.toString)
        } catch { case _: Throwable => None }
      }
    warmupDir.foreach { d =>
      ordered.foreach { case (_, fn) =>
        try { fn(spark, d).count(); () } catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }
    // Two timed passes, report per-query MIN. Same total work as a
    // warm-up + one timed pass, but strictly better noise rejection:
    // pass 1 absorbs JIT/codegen/footer reads AND still counts if it
    // was the quieter run — the min discards whichever pass caught
    // host contention (measured 2× run-to-run variance on shared CPU).
    // a query that throws is reported as -1, never as its (tiny)
    // time-to-fail: round 6 counted 13 broken queries as 0.09 s
    // "speedups" and the bench total silently overstated the engine.
    // Cross-pass policy: failures are tracked PER PASS; a query counts
    // as failed (and is excluded from the total) only when NO pass
    // produced a valid timing. A transient single-pass failure keeps
    // the other pass's real timing — min-of-valid-passes.
    def pass(): Map[String, Double] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> (if (ok) dt else -1.0)
    }.toMap
    // 1-min load average before/after: timings from a contended host
    // (round-6 lesson: a 2.4× uniform slowdown) carry their own
    // evidence and can be discarded instead of overwriting good runs
    def loadAvg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // ~2 s CPU+IO micro-probe, run before AND after the passes: the
    // round-8 lesson is that hypervisor throttling (the box's two
    // IO-price "epochs") is INVISIBLE in /proc/loadavg — a calm-looking
    // window can still price IO 5-10x. A fixed arithmetic kernel and a
    // fixed 64 MB fsync'd write+read make every artifact self-labeling:
    // the raw ms land in the JSON for cross-round comparison, and the
    // label trips when either probe exceeds 2.5x its fast-regime anchor
    // (overridable for other host classes via SPARK_GRAFT_PROBE_CPU_MS /
    // SPARK_GRAFT_PROBE_IO_MS).
    def probe(): (Long, Long) = {
      var acc = 0L; var i = 0L
      val t0 = System.nanoTime()
      while (i < 400000000L) { acc = acc * 6364136223846793005L + i; i += 1 }
      val cpuMs = (System.nanoTime() - t0) / 1000000
      var ioMs = -1L
      try {
        val f   = java.io.File.createTempFile("graft_probe", ".bin")
        val buf = new Array[Byte](1 << 20)
        java.util.Arrays.fill(buf, (acc & 0x7f).toByte) // data-dependent: keeps the cpu loop live
        val t1  = System.nanoTime()
        val out = new java.io.FileOutputStream(f)
        var j = 0; while (j < 64) { out.write(buf); j += 1 }
        out.getFD.sync(); out.close()
        val in = new java.io.FileInputStream(f)
        while (in.read(buf) > 0) {}
        in.close(); f.delete()
        ioMs = (System.nanoTime() - t1) / 1000000
      } catch { case _: Throwable => () }
      (cpuMs, ioMs)
    }
    // ---- fixed-code HOST CANARY (VERDICT r12 #2) ----
    // Three frozen Spark kernels — DO NOT MODIFY (their anchors are
    // recorded constants; editing the kernels silently re-bases every
    // cross-round comparison). They exercise the SPARK path (codegen,
    // shuffle, sort, memory) that r12's serial-imul probe cannot see:
    // that round's artifacts read ~10-15% above r11 on UNCHANGED query
    // code while every probe was clean — the drift lived exactly here.
    // host_scale = median(min_observed / anchor) over the kernels; a
    // cross-round comparison divides by it, so "the box was slower"
    // becomes a measured denominator instead of a narrative.
    def canary(): Map[String, Double] = {
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val cpu = t {
        spark.range(0L, 400000000L, 1L, 32)
          .selectExpr("sum(((id * 2654435761) % 1000003) * (id % 97)) as s")
          .collect()
      }
      val shj = t {
        val a = spark.range(0L, 8000000L, 1L, 32).selectExpr("id % 1048576 as k", "id as va")
        val b = spark.range(0L, 8000000L, 1L, 32).selectExpr("id % 1048576 as k", "id as vb")
        a.join(b, "k").selectExpr("sum(va + vb) as s").collect()
        ()
      }
      val srt = t {
        spark.range(0L, 20000000L, 1L, 32)
          .selectExpr("hash(id) as h")
          .orderBy("h")
          .queryExecution.toRdd.count()
        ()
      }
      spark.catalog.clearCache()
      Map("cpu_agg" -> cpu, "shuffle_join" -> shj, "sort" -> srt)
    }
    // anchors: min over 3 clean standalone-JVM replicates in the
    // round-13 window on this host class (local[32], bracketing probes
    // fast, nothing else running): cpu 0.233/0.276/0.244, shuffle
    // 0.968/0.989/0.967, sort 1.085/1.279/1.095. host_scale is
    // RELATIVE TO THIS WINDOW — cross-round tables divide by it.
    // Overridable for other host classes.
    val canaryAnchors = sys.env.get("SPARK_GRAFT_CANARY_ANCHORS")
      .map(_.split(",").map { kv => val Array(k, v) = kv.split("="); k -> v.toDouble }.toMap)
      .getOrElse(Map("cpu_agg" -> 0.233, "shuffle_join" -> 0.967, "sort" -> 1.085))

    // anchors measured on this host class in the fast regime (round 9,
    // 3 standalone-JVM replicates: cpu 603/621/626, io 171/205/188) —
    // the cpu kernel is a serial imul dependency chain, so its calm
    // value is latency-bound (~1.5 ns/iter) and load-insensitive while
    // cores remain free; only genuine clock/hypervisor throttling moves it
    val cpuAnchor = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPU_MS", "620").toLong
    val ioAnchor  = sys.env.getOrElse("SPARK_GRAFT_PROBE_IO_MS", "200").toLong
    def slow(p: (Long, Long)): Boolean =
      p._1 > (2.5 * cpuAnchor).toLong || (p._2 >= 0 && p._2 > (2.5 * ioAnchor).toLong)
    // Regime-aware retry (VERDICT r10 #2: a round artifact must never
    // silently carry box weather). Every pass is BRACKETED by probes —
    // a pass is CLEAN only when both its surrounding probes read fast.
    // After the 2 base passes, dirty passes are retried (up to
    // SPARK_GRAFT_MAX_PASSES total) until 2 clean passes exist; the
    // reported per-query min uses CLEAN passes ONLY whenever at least
    // one exists, so a throttled pass can never contribute a timing to
    // a clean artifact. The label describes the passes USED:
    // normal = >=2 clean, mixed = 1 clean (single-pass timings, noisier
    // but unpolluted), throttled = 0 clean after all retries.
    //
    // ENFORCED clean-window protocol (round 16 — VERDICT r15 #1: the
    // r15 artifact shipped mixed-regime and poisoned the cross-round
    // bar with phantom 3-6x "regressions" on untouched queries):
    //  - the retry budget is 8 passes, not 4 — a contended window has
    //    to outlast ~6 retries to force a non-normal label;
    //  - before each RETRY pass whose leading probe reads slow, the
    //    runner WAITS for calm (re-probing every ~15 s, up to
    //    SPARK_GRAFT_CALM_WAIT_SEC per retry, default 240 s) instead
    //    of burning the pass inside the same contention burst;
    //  - brackets are per-pass (leading, trailing) pairs: a calm-wait's
    //    fresh probe becomes the NEXT pass's leading bracket without
    //    rewriting the previous pass's trailing one, so a pass that ran
    //    into contention stays labeled dirty.
    // Shipping a regime != normal artifact is still possible when the
    // box never offers two calm windows — but it now takes ~30 min of
    // sustained contention, and the label carries the evidence.
    val maxPasses   = sys.env.getOrElse("SPARK_GRAFT_MAX_PASSES", "8").toInt
    val calmWaitSec = sys.env.getOrElse("SPARK_GRAFT_CALM_WAIT_SEC", "240").toLong
    // CANARY-DRIFT cleanliness (round 17 — VERDICT r16 #3): the r16
    // round's first sf0.1 attempt shipped regime "normal" from an
    // IO-DEPRIVED window — the serial-CPU + 64 MB-fsync probes read
    // fast while Spark's shuffle/sort path (which the canary kernels
    // exercise and the probes cannot) ran ~4.6× slow, and only a hand
    // check caught the phantom regressions. Every pass is now ALSO
    // bracketed by canary runs; a pass is clean only when both its
    // bracketing canaries sit within SPARK_GRAFT_CANARY_DRIFT (default
    // 1.75×) of the artifact's own per-kernel minimum (median ratio
    // over the three kernels — within-artifact, so host class cancels
    // and uniform slowness stays host_scale's job). Cost: ~2.5 s per
    // pass, noise against a 100+ s pass. The threshold is CALIBRATED,
    // not guessed: on this host class, bracket drift in accepted-clean
    // windows reads 1.0-1.6 (ambient shuffle/sort variance at
    // local[32] — the min-relative reference makes ordinary passes sit
    // well above 1.0), while contention bursts price the kernels
    // 2.0-2.3× and the r16 IO-deprived escape would have read higher
    // still; 1.75 separates the regimes. A first recording at 1.4
    // labeled a mildly-contended window "throttled" with zero clean
    // passes because NO pass could sit within 1.4 of the artifact's
    // single calmest canary moment — over-rejection that would starve
    // every future artifact on an averagely-busy box.
    val canaryDrift = sys.env.getOrElse("SPARK_GRAFT_CANARY_DRIFT", "1.75").toDouble
    val loads     = scala.collection.mutable.ArrayBuffer(loadAvg())
    val probes    = scala.collection.mutable.ArrayBuffer(probe())
    val canaries  = scala.collection.mutable.ArrayBuffer(canary(), canary()) // 2nd run = post-JIT
    val passes    = scala.collection.mutable.ArrayBuffer[Map[String, Double]]()
    val brackets  = scala.collection.mutable.ArrayBuffer[((Long, Long), (Long, Long))]()
    val canBrackets =
      scala.collection.mutable.ArrayBuffer[(Map[String, Double], Map[String, Double])]()
    def driftOf(c: Map[String, Double], mins: Map[String, Double]): Double = {
      val rs = c.map { case (k, v) => v / mins(k) }.toSeq.sorted
      rs(rs.size / 2)
    }
    def cleanIdx = {
      val mins = canaries.head.keys.map(k => k -> canaries.map(_(k)).min).toMap
      passes.indices.filter(i =>
        !slow(brackets(i)._1) && !slow(brackets(i)._2) &&
          driftOf(canBrackets(i)._1, mins) <= canaryDrift &&
          driftOf(canBrackets(i)._2, mins) <= canaryDrift)
    }
    var lead    = probes.last
    var leadCan = canaries.last
    while (passes.size < 2 || (passes.size < maxPasses && cleanIdx.size < 2)) {
      if (passes.size >= 2 && slow(lead)) {
        // retry pass under contention: wait for a calm window first
        val t0 = System.nanoTime()
        while (slow(lead) && (System.nanoTime() - t0) / 1e9 < calmWaitSec) {
          Thread.sleep(15000)
          lead = probe()
          probes += lead
        }
        // the calm-wait's fresh leading canary, like its fresh probe
        leadCan = canary()
        canaries += leadCan
      }
      val leadUsed    = lead
      val leadCanUsed = leadCan
      passes += pass()
      val trail = probe()
      probes += trail
      val trailCan = canary()
      canaries += trailCan
      brackets += ((leadUsed, trail))
      canBrackets += ((leadCanUsed, trailCan))
      lead = trail
      leadCan = trailCan
      loads += loadAvg()
    }
    val canaryMin = canaries.head.keys.map(k => k -> canaries.map(_(k)).min).toMap
    val hostScale =
      if (canaryAnchors.values.exists(_ <= 0)) -1.0
      else {
        val ratios = canaryMin.map { case (k, v) => v / canaryAnchors(k) }.toSeq.sorted
        ratios(ratios.size / 2)
      }
    val usedIdx = if (cleanIdx.nonEmpty) cleanIdx else passes.indices
    val regimeLabel =
      if (cleanIdx.size >= 2) "normal"
      else if (cleanIdx.nonEmpty) "mixed"
      else "throttled"
    // per-pass canary drift (median kernel ratio vs artifact min, for
    // each pass's (leading, trailing) bracket) — the label's evidence
    val canaryDriftJson = {
      def r3d(v: Double): String = f"$v%.3f"
      canBrackets.map(b =>
        s"[${r3d(driftOf(b._1, canaryMin))},${r3d(driftOf(b._2, canaryMin))}]").mkString("[", ",", "]")
    }
    val regimeJson =
      s"""{"cpu_ms":[${probes.map(_._1).mkString(",")}],"io_ms":[${probes.map(_._2).mkString(",")}],"canary_drift":$canaryDriftJson,"canary_drift_max":$canaryDrift,"label":"$regimeLabel","clean_passes":${cleanIdx.size}}"""
    val results = ordered.map { case (name, _) =>
      // min over the USED (clean when possible) passes; a query that
      // failed in every used pass falls back to any valid timing from
      // the remaining passes (transient-failure policy) before -1
      val used = usedIdx.map(i => passes(i)(name)).filter(_ >= 0)
      val any  = passes.indices.map(i => passes(i)(name)).filter(_ >= 0)
      name -> (if (used.nonEmpty) used.min else if (any.nonEmpty) any.min else -1.0)
    }
    // self-labeling for the fallback branch above: when a timing could
    // only come from a pass OUTSIDE usedIdx (i.e. a dirty pass under a
    // clean label), name the query in the artifact — the invariant
    // "a throttled pass never contributes silently" stays literal
    val dirtyFallback = scala.collection.immutable.TreeSet.from(
      ordered.collect {
        case (name, _)
            if usedIdx.forall(i => passes(i)(name) < 0) &&
              passes.indices.exists(i => passes(i)(name) >= 0) =>
          name
      })
    val dirtyFallbackJson = dirtyFallback.map("\"" + _ + "\"").mkString("[", ",", "]")
    val load0 = loads.head
    val load1 = loads.last
    val failed = scala.collection.immutable.TreeSet.from(
      results.collect { case (name, v) if v < 0 => name })
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = r3(results.collect { case (_, v) if v >= 0 => v }.sum)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val canaryJson = canaryMin.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val warmupJson = warmupDir.map("\"" + _ + "\"").getOrElse("null")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","passes":${passes.size},"agg":"min_clean","sf":"$sfDir","warmup":$warmupJson,"n_failed":${failed.size},"failed":$failedJson,"dirty_fallback":$dirtyFallbackJson,"load":[${loads.map(r3).mkString(",")}],"regime":$regimeJson,"canary":$canaryJson,"host_scale":${r3(hostScale)},"queries":$qs}"""
    // belt-and-braces: the driver captures a bounded log tail, which
    // truncated this line in round 1 — persist the same JSON as a file
    // artifact too. Path is overridable, defaulting to the working
    // directory so any checkout writes next to itself.
    try {
      val out = sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT",
        java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_LOCAL.json").toString)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // stop the session BEFORE printing, so Spark shutdown logging can
    // never interleave after the result, then emit the JSON twice:
    // once sentinel-prefixed (greppable, unambiguous) and once bare as
    // the program's true final stdout line — the driver's parser has
    // recorded parsed:null every round, so give it every reasonable
    // target shape.
    spark.stop()
    System.out.println(s"GRAFT_BENCH $line")
    System.out.println(line)
    // Last line = the one the driver actually parses. Its tail capture is
    // 2000 chars (measured from BENCH_r09.json), so the ~3.3 KB full line
    // above always loses its head; this line must fit, complete, inside
    // the tail alongside sbt's ~75-char "[success]" epilogue. Budget it:
    //   - per-query map uses the SHORT id prefix (the token before the
    //     first '_': "d01", "x02e", ... — unique across the inventory,
    //     asserted in QueriesSmokeSpec) at 2 decimals → ~1.5 KB;
    //   - regime collapses to its label (probe raw ms live in the full
    //     line and the BENCH_LOCAL.json file artifact).
    // Net ~1.65 KB: the round artifact's `parsed` gains the per-query
    // map instead of carrying it only as a truncated `tail` string.
    def r2(v: Double): String = f"$v%.2f"
    val shortQs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + r2(v) }
      .mkString("{", ",", "}")
    System.out.println(
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","passes":${passes.size},"agg":"min_clean","warmup":${if (warmupDir.isDefined) 1 else 0},"n_queries":${results.size},"n_failed":${failed.size},"n_dirty_fallback":${dirtyFallback.size},"load":[${r3(load0)},${r3(load1)}],"regime":"$regimeLabel","host_scale":${r3(hostScale)},"queries":$shortQs}""")
    System.out.flush()
  }
}
