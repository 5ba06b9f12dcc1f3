package graft

import graft.plans.{RangeJoinBanding, SemiJoinRewrite}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

class PlanRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(SemiJoinRewrite)
    try f
    finally spark.experimental.extraOptimizations = Nil
  }

  test("distinct over inner-join fan-out becomes a semi join, same result") {
    withRule {
      val samples = Seq((1L, "SA1"), (2L, "SA2"), (3L, "SA3")).toDF("sid", "name")
      val datasets = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("dsid", "sample_id")
      // the reference idiom: join through the relation, project the
      // parent, slap distinct on the fan-out
      val q = samples
        .join(datasets, $"sid" === $"sample_id")
        .select($"sid", $"name")
        .dropDuplicates()
      val semiJoins = q.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftSemi => j
      }
      assert(semiJoins.nonEmpty, s"no semi join in:\n${q.queryExecution.optimizedPlan}")
      assert(q.as[(Long, String)].collect().toSet == Set((1L, "SA1"), (2L, "SA2")))
    }
  }

  test("rule leaves plans alone when right-side columns are projected") {
    withRule {
      val a = Seq((1L, "x")).toDF("id", "v")
      val b = Seq((1L, "y")).toDF("bid", "w")
      val q = a.join(b, $"id" === $"bid").select($"id", $"w").dropDuplicates()
      val semiJoins = q.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftSemi => j
      }
      assert(semiJoins.isEmpty)
      assert(q.as[(Long, String)].collect().toSeq == Seq((1L, "y")))
    }
  }

  private def withBanding[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RangeJoinBanding)
    try f
    finally spark.experimental.extraOptimizations = Nil
  }

  test("range join with equi key gets banded: same rows, no cross product") {
    withBanding {
      val rnd = new scala.util.Random(7)
      val l = (0 until 120).map(i => (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(500).toLong)).toDF("lid", "lk", "lt")
      val r = (0 until 120).map(i => (i.toLong + 1000, rnd.nextInt(4).toLong, rnd.nextInt(500).toLong)).toDF("rid", "rk", "rt")
      val q = l.join(r, $"lk" === $"rk" && abs($"lt" - $"rt") <= 37L)
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("__graft_lb"), s"banding did not fire:\n$phys")
      val got = q.select($"lid", $"rid").as[(Long, Long)].collect()
      val lr = l.as[(Long, Long, Long)].collect(); val rr = r.as[(Long, Long, Long)].collect()
      val expected = for {
        (lid, lk, lt) <- lr; (rid, rk, rt) <- rr
        if lk == rk && math.abs(lt - rt) <= 37
      } yield (lid, rid)
      assert(got.length == got.toSet.size, "duplicate pairs from banding")
      assert(got.toSet == expected.toSet)
    }
  }

  test("pure inequality join (no equi key) escapes the nested loop") {
    withBanding {
      val l = (0 until 60).map(i => (i.toLong, i.toLong * 7 % 300)).toDF("lid", "lt")
      val r = (0 until 60).map(i => (i.toLong + 500, i.toLong * 11 % 300)).toDF("rid", "rt")
      val q = l.join(r, abs($"lt" - $"rt") <= 5L)
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("__graft_lb"), s"banding did not fire:\n$phys")
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
        s"still a nested loop:\n$phys")
      val got = q.select($"lid", $"rid").as[(Long, Long)].collect()
      val expected = for {
        (lid, lt) <- l.as[(Long, Long)].collect(); (rid, rt) <- r.as[(Long, Long)].collect()
        if math.abs(lt - rt) <= 5
      } yield (lid, rid)
      assert(got.toSet == expected.toSet && got.length == expected.length)
    }
  }

  test("banding leaves plain equi joins and non-band inequalities alone") {
    withBanding {
      val l = Seq((1L, 10L)).toDF("lid", "lt")
      val r = Seq((2L, 12L)).toDF("rid", "rt")
      val equi = l.join(r, $"lt" === $"rt")
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_lb"))
      val lessThan = l.join(r, $"lt" < $"rt") // one-sided: not a band
      assert(!lessThan.queryExecution.executedPlan.toString.contains("__graft_lb"))
      assert(lessThan.count() == 1)
    }
  }

  test("hand-banded Ops.bandedRangeJoin is not re-banded by the rule") {
    withBanding {
      val rnd = new scala.util.Random(3)
      val l = (0 until 80).map(i => (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(400).toLong)).toDF("lid", "k", "lt")
      val r = (0 until 80).map(i => (i.toLong + 900, rnd.nextInt(3).toLong, rnd.nextInt(400).toLong)).toDF("rid", "k", "rt")
      val q = graft.operators.Ops.bandedRangeJoin(l, r, Seq("k"), "lt", "rt", 29L)
      // exactly ONE explode (the hand-banding's): a second Generate
      // would mean the optimizer rule re-banded the already-banded join
      val generates = q.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }
      assert(generates.size == 1, s"double banding:\n${q.queryExecution.optimizedPlan}")
      val expected = for {
        (lid, lk, lt) <- l.as[(Long, Long, Long)].collect()
        (rid, rk, rt) <- r.as[(Long, Long, Long)].collect()
        if lk == rk && math.abs(lt - rt) <= 29
      } yield (lid, rid)
      val got = q.select($"lid", $"rid").as[(Long, Long)].collect()
      assert(got.toSet == expected.toSet && got.length == expected.length)
    }
  }

  test("rule leaves real aggregates alone") {
    withRule {
      val a = Seq((1L, "x"), (2L, "x")).toDF("id", "v")
      val b = Seq((1L, 5.0), (1L, 6.0)).toDF("bid", "m")
      val q = a.join(b, $"id" === $"bid").groupBy($"v").agg(sum($"m").as("s"))
      assert(q.as[(String, Double)].collect().toSeq == Seq(("x", 11.0)))
    }
  }
}
