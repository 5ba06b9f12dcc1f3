package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 paired A/Bs on the d02 family, same JVM, same persisted
  * shingle frame, alternating order per rep:
  *
  *   1. candidates: production tail (per-occurrence positional filter +
  *      distinct) vs the ACCUMULATED PPJoin filter (per-pair
  *      collect_list of shared prefix ranks, overlap bounded by
  *      `m + min(suffix)` at the m-th occurrence). Outcome (this tool,
  *      round 10): accumulated cuts candidates only ~4.8% (4.21M→4.01M
  *      at m20, 16.84M→16.03M at m80 — hash order scatters shared
  *      shingles, so nearly all false-positive pairs share exactly ONE
  *      prefix shingle) while its aggregation runs 2-5x slower than
  *      distinct at m80. REJECTED; kept here as the control.
  *
  *   2. verify: bounded merge (`sortedIntersectAtLeast`, production) vs
  *      the round-9 full two-pointer merge. Outcome: ~2x faster at m80
  *      (sub-threshold candidates abort within ~1/3 of the merge),
  *      bit-identical surviving pairs.
  */
object ProfileR10Ppjoin {
  /** Accumulated PPJoin positional filter — the measured-and-rejected
    * experimental arm (see Dedup.prefixCandidates scaladoc).
    */
  def prefixCandidatesAccumulated(arrs: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val frac = threshold / (1.0 + threshold)
    val prefix = arrs
      .withColumn("plen", (col("n") - ceil(col("n") * threshold) + 1).cast("int"))
      .select(col(idCol), col("n"), posexplode(slice(col("set"), lit(1), col("plen"))).as(Seq("p", "s")))
      .select(col(idCol), col("s"), (col("p") + 1).as("rnk"), col("n"))
    prefix
      .groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col(idCol).as("id"), col("rnk"), col("n")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
      .select(col("a"), explode(slice(col("ds"), col("i") + 2, greatest(size(col("ds")), lit(1)))).as("b"))
      .filter(least(col("a.n"), col("b.n")) >= greatest(col("a.n"), col("b.n")) * threshold)
      .select(
        col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.n").as("n1"), col("b.n").as("n2"),
        struct(col("a.rnk").as("r1"), col("b.rnk").as("r2")).as("rr"))
      .groupBy(col("id1"), col("id2"))
      .agg(
        first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        array_sort(collect_list(col("rr"))).as("occ"))
      .filter(
        array_min(
          transform(
            col("occ"),
            (o, m) => m + lit(1) + least(col("n1") - o.getField("r1"), col("n2") - o.getField("r2"))))
          >= ceil((col("n1") + col("n2")) * frac))
      .select(col("id1"), col("id2"))
  }

  /** The round-9 verify join: full two-pointer merge, no early exit. */
  def verifyJaccardFull(cand: DataFrame, arrs: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val sets = arrs.select(col(idCol), col("set"), col("n"))
    cand
      .join(sets.select(col(idCol).as("id1"), col("set").as("set1"), col("n").as("n1")), "id1")
      .join(sets.select(col(idCol).as("id2"), col("set").as("set2"), col("n").as("n2")), "id2")
      .withColumn("inter", graft.functions.ShingleExpressions.sortedIntersectCount(col("set1"), col("set2")))
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id1"), col("id2"), col("jac"))
  }

  def main(args: Array[String]): Unit = {
    val spark = ProfileR7Scale.probeSession(sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    val ms    = if (args.isEmpty) Seq(20, 80) else args.map(_.toInt).toSeq
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    ms.foreach { m =>
      val dir = s"/tmp/graft_scale/m$m"
      graft.Caches.scoped(spark) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
        }
        val arrs = Dedup.shingleArrays(docs, "doc_id", "text", 3).persist()
        arrs.count()
        (1 to reps).foreach { rep =>
          // alternate which variant goes first so JIT/page-cache order
          // can't systematically favor one
          val candAB: Seq[(String, DataFrame)] = {
            val a = "prod" -> Dedup.prefixCandidates(arrs, "doc_id", 0.5)
            val b = "acc"  -> prefixCandidatesAccumulated(arrs, "doc_id", 0.5)
            if (rep % 2 == 1) Seq(a, b) else Seq(b, a)
          }
          candAB.foreach { case (tag, cand) =>
            val c        = cand.persist()
            val (nc, tC) = timed(c.count())
            val vAB: Seq[(String, DataFrame)] = {
              val a = "bounded" -> Dedup.verifyJaccard(c, arrs, "doc_id", 0.5)
              val b = "full"    -> verifyJaccardFull(c, arrs, "doc_id", 0.5)
              if (rep % 2 == 1) Seq(a, b) else Seq(b, a)
            }
            val vs = vAB.map { case (vt, v) =>
              val (nv, tV) = timed(v.queryExecution.toRdd.count())
              (vt, nv, tV)
            }
            require(vs.map(_._2).distinct.size == 1, s"verify variants disagree: $vs")
            val vStr = vs.sortBy(_._1).map { case (vt, _, tV) => f"$vt=$tV%5.2fs" }.mkString(" ")
            println(f"[ppjoinAB] m=$m%-3d rep=$rep cand[$tag%-4s]=$tC%6.2fs($nc) verify: $vStr pairs=${vs.head._2}")
            c.unpersist(blocking = true)
          }
        }
        arrs.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
