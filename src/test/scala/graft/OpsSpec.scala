package graft

import graft.operators.{Ops, Predicates, WritePath}
import graft.operators.Predicates.{Lookup, Pred}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("division: keys associated with ALL wanted values") {
    val bridge = Seq((1, "a"), (1, "b"), (1, "a"), (2, "a"), (3, "a"), (3, "b"), (3, "c"))
      .toDF("k", "v")
    val got = Ops.division(bridge, "k", "v", Seq("a", "b")).as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 3)) // duplicate (1,a) must not double-count
  }

  test("division with empty wanted set matches nothing") {
    val bridge = Seq((1, "a")).toDF("k", "v")
    assert(Ops.division(bridge, "k", "v", Seq.empty).count() == 0)
  }

  test("paginate partitions the ordered stream without overlap") {
    val df = (1 to 25).toDF("id")
    val pages = (0 to 2).map(p =>
      Ops.paginate(df, Seq(col("id")), p, 10).select("id").as[Int].collect().toSet)
    assert(pages(0).size == 10 && pages(1).size == 10 && pages(2).size == 5)
    assert(pages.reduce(_ ++ _).size == 25) // exhaustive, disjoint
  }

  test("latestPerKey picks max order cols with desc tie-break") {
    val df  = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "ver", "tag")
    val got = Ops.latestPerKey(df, Seq(col("k")), Seq(col("ver")))
      .select("k", "tag").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "new", 2 -> "only"))
  }

  test("upsert: incoming wins, others survive, no dup keys") {
    val existing = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val incoming = Seq((2, "B"), (3, "C")).toDF("id", "v")
    val got = WritePath.upsert(existing, incoming, Seq("id"))
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a", 2 -> "B", 3 -> "C"))
  }

  test("softDeleteCascade flags targets and preserves prior flags") {
    val inst = Seq((1, false), (2, true), (3, false)).toDF("rid", "is_deleted")
    val del  = Seq(Tuple1(3)).toDF("rid")
    val got = WritePath.softDeleteCascade(inst, del, "rid")
      .select("rid", "is_deleted").as[(Int, Boolean)].collect().toMap
    assert(got == Map(1 -> false, 2 -> true, 3 -> true))
  }

  test("curationDiff classifies added/deleted/unchanged") {
    val old = Seq(1, 2, 3).toDF("id")
    val neu = Seq(2, 3, 4).toDF("id")
    val got = WritePath.curationDiff(old, neu)
      .as[(Int, String)].collect().groupMap(_._2)(_._1).view.mapValues(_.toSet).toMap
    assert(got == Map("added" -> Set(4), "deleted" -> Set(1), "unchanged" -> Set(2, 3)))
  }

  test("requireNonEmpty passes data through and rejects empty results") {
    val df = Seq(1, 2).toDF("x")
    assert(Ops.requireNonEmpty(df, "search").count() == 2)
    val e = intercept[IllegalArgumentException] {
      Ops.requireNonEmpty(df.filter($"x" > 99), "tag search")
    }
    assert(e.getMessage.contains("tag search"))
  }

  test("asofJoin: latest prior match, >= ties, left-outer nulls, tie-break") {
    val trades = Seq((1L, 7L, 100L), (2L, 7L, 205L), (3L, 8L, 50L)).toDF("tid", "k", "t")
    val quotes = Seq(
      (10L, 7L, 90L, 1.0), (11L, 7L, 100L, 2.0), // simultaneous quote must match (>=)
      (12L, 7L, 200L, 3.0), (13L, 7L, 200L, 4.0), // tie at t=200 → max qid wins
      (14L, 9L, 10L, 9.9), // other key, never matches
    ).toDF("qid", "k", "t", "px")
    val got = Ops
      .asofJoin(trades, quotes, Seq("k"), "t", "t", tieCols = Seq("qid"))
      .select($"left.tid", $"matched.qid", $"matched.px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(11L), Some(2.0)))) // equal-ts quote visible
    assert(got(2L) == ((Some(13L), Some(4.0)))) // deterministic tie-break
    assert(got(3L) == ((None, None)))           // no quote for key 8 → left outer
  }

  test("asofJoin forward: earliest following match, <= ties, left-outer nulls, tie-break") {
    val trades = Seq((1L, 7L, 100L), (2L, 7L, 195L), (3L, 8L, 50L)).toDF("tid", "k", "t")
    val quotes = Seq(
      (10L, 7L, 90L, 1.0),                        // before → never matches forward
      (11L, 7L, 100L, 2.0),                       // simultaneous quote must match (<=)
      (12L, 7L, 200L, 3.0), (13L, 7L, 200L, 4.0), // tie at t=200 → min qid wins
      (14L, 9L, 10L, 9.9),                        // other key, never matches
    ).toDF("qid", "k", "t", "px")
    val got = Ops
      .asofJoin(trades, quotes, Seq("k"), "t", "t", tieCols = Seq("qid"), direction = "forward")
      .select($"left.tid", $"matched.qid", $"matched.px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(11L), Some(2.0)))) // equal-ts quote visible
    assert(got(2L) == ((Some(12L), Some(3.0)))) // deterministic tie-break: FIRST by qid
    assert(got(3L) == ((None, None)))           // no later quote for key 8 → left outer
  }

  test("saltedCountSum equals direct groupBy on skewed keys") {
    val rows = (1 to 2000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i * 1.5)) // 90% one key
    val df   = rows.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), Ops.dsum($"v").as("s"))
      .as[(String, Long, Double)].collect().map { case (k, n, s) => k -> ((n, s)) }.toMap
    val salted = Ops.saltedCountSum(df, Seq("k"), $"v")
      .as[(String, Long, Double)].collect().map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(salted == direct)
  }

  test("predicate allowlist rejects undeclared lookups (P14)") {
    val allowed = Map("name" -> Set[Lookup](Lookup.Exact, Lookup.IContains))
    val df      = Seq(("x")).toDF("name")
    Predicates(df, allowed, Seq(Pred("name", Lookup.Exact, "x"))) // legal
    intercept[Predicates.UnknownFilterException] {
      Predicates(df, allowed, Seq(Pred("name", Lookup.StartsWith, "x")))
    }
    intercept[Predicates.UnknownFilterException] {
      Predicates(df, allowed, Seq(Pred("other", Lookup.Exact, "x")))
    }
  }

  test("predicates compile to the expected filters") {
    val df = Seq(("Customer#1", 5), ("Other#2", 9)).toDF("name", "n")
    val allowed = Map(
      "name" -> Set[Lookup](Lookup.IStartsWith, Lookup.Contains),
      "n"    -> Set[Lookup](Lookup.Gte))
    val got = Predicates(
      df,
      allowed,
      Seq(Pred("name", Lookup.IStartsWith, "CUST"), Pred("n", Lookup.Gte, 1)))
    assert(got.count() == 1)
  }
}
