package graft

import graft.plans.SemiJoinRewrite
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

  test("rule leaves real aggregates alone") {
    withRule {
      val a = Seq((1L, "x"), (2L, "x")).toDF("id", "v")
      val b = Seq((1L, 5.0), (1L, 6.0)).toDF("bid", "m")
      val q = a.join(b, $"id" === $"bid").groupBy($"v").agg(sum($"m").as("s"))
      assert(q.as[(String, Double)].collect().toSeq == Seq(("x", 11.0)))
    }
  }
}
