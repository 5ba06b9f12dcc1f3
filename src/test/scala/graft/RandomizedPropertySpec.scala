package graft

import graft.dedup.Dedup
import graft.operators.{Ops, WritePath}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized properties (fixed seeds): engine operators vs brute-force
  * reference implementations on generated data (SURVEY §5.3).
  */
class RandomizedPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("division equals brute-force relational division (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd    = new Random(seed)
      val bridge = Seq.fill(200)((rnd.nextInt(20), s"v${rnd.nextInt(8)}"))
      val wanted = Seq.fill(1 + rnd.nextInt(3))(s"v${rnd.nextInt(8)}").distinct
      val expected = bridge
        .groupBy(_._1)
        .collect { case (k, vs) if wanted.forall(vs.map(_._2).contains) => k }
        .toSet
      val got = Ops
        .division(bridge.toDF("k", "v"), "k", "v", wanted)
        .as[Int].collect().toSet
      assert(got == expected, s"seed=$seed wanted=$wanted")
    }
  }

  test("jaccardPairs equals brute-force jaccard over random docs (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd   = new Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      val docs  = (0 until 30).map(i => (i.toLong, Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      // brute force on distinct 3-shingle sets
      def shingles(text: String): Set[String] = {
        val t = text.trim.split("\\s+").filter(_.nonEmpty)
        if (t.length < 3) Set.empty
        else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
      }
      val sets = docs.map { case (id, tx) => id -> shingles(tx) }.toMap
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        sa = sets(a); sb = sets(b)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        jac   = inter.toDouble / (sa.size + sb.size - inter)
        if jac >= 0.5
      } yield (a, b)).toSet
      val got = Dedup
        .jaccardPairs(Dedup.shingleArrays(docs.toDF("doc_id", "text"), "doc_id", "text", 3), "doc_id", 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed: got ${got.size}, expected ${expected.size}")
    }
  }

  test("minhash-LSH pairs always subset of exact pairs; identical docs always found") {
    for (seed <- 1 to 3) {
      val rnd   = new Random(seed)
      val vocab = Vector("x1", "x2", "x3", "x4", "x5", "x6", "x7", "x8")
      val base  = (0 until 15).map(i => (i.toLong, Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      // clone a few docs to guarantee identical pairs
      val docs  = base ++ base.take(3).map { case (id, tx) => (id + 100, tx) }
      val df    = docs.toDF("doc_id", "text")
      val exact = Dedup.jaccardPairs(Dedup.shingleArrays(df, "doc_id", "text", 3), "doc_id", 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val lsh = Dedup.minhashLshPairs(df, "doc_id", "text")
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(lsh.subsetOf(exact))
      (0L until 3L).foreach(i => assert(lsh.contains((i, i + 100)), s"clone pair $i missing"))
    }
  }

  test("topKPerGroup equals window row_number top-k (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd  = new Random(seed)
      val rows = (0 until 300).map(i => (rnd.nextInt(12).toLong, rnd.nextInt(40).toDouble, i.toLong))
      val df   = rows.toDF("k", "ord", "id")
      val expected = rows
        .groupBy(_._1)
        .flatMap { case (k, vs) =>
          vs.sortBy(v => (-v._2, v._3)).take(3).zipWithIndex.map { case ((_, o, id), r) => (k, r + 1L, o, id) }
        }
        .toSet
      val got = Ops.topKPerGroup(df, "k", "ord", "id", 3)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("bandedRangeJoin equals brute-force |dt|<=band join (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd   = new Random(seed)
      val lefts  = (0 until 80).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      val rights = (0 until 80).map(i => (i.toLong + 1000, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      val band   = 37L
      val expected = (for {
        (lid, lk, lt) <- lefts
        (rid, rk, rt) <- rights
        if lk == rk && math.abs(lt - rt) <= band
      } yield (lid, rid)).toSet
      val got = Ops
        .bandedRangeJoin(
          lefts.toDF("lid", "k", "lt"),
          rights.toDF("rid", "k", "rt"),
          Seq("k"), "lt", "rt", band)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"seed=$seed produced duplicate pairs")
      assert(got.toSet == expected, s"seed=$seed: got ${got.length}, expected ${expected.size}")
    }
  }

  test("upsert: key set is union, incoming wins, no duplicates (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd      = new Random(seed)
      val existing = (0 until 30).map(i => (rnd.nextInt(40), "old")).distinctBy(_._1)
      val incoming = (0 until 15).map(i => (rnd.nextInt(40), "new")).distinctBy(_._1)
      val got = WritePath
        .upsert(existing.toDF("id", "v"), incoming.toDF("id", "v"), Seq("id"))
        .as[(Int, String)].collect()
      assert(got.length == got.map(_._1).distinct.length)
      assert(got.map(_._1).toSet == (existing.map(_._1) ++ incoming.map(_._1)).toSet)
      val inc = incoming.map(_._1).toSet
      assert(got.forall { case (k, v) => if (inc(k)) v == "new" else v == "old" })
    }
  }

  test("native tokenize/tokenCount equal the regex twin on adversarial whitespace (5 seeds)") {
    val wsPool = Vector(" ", "\t", "\n", "", "\f", "\r", "  ", " \t\r\n ")
    val tkPool = Vector("ab", "Ω≈ç", "a b", "x", "émü", "1,2;3", "日本語", "a-b_c")
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = (0 until 200).map { i =>
        val parts = Seq.fill(rnd.nextInt(12))(
          if (rnd.nextBoolean()) tkPool(rnd.nextInt(tkPool.size)) else wsPool(rnd.nextInt(wsPool.size)))
        (i.toLong, parts.mkString)
      } ++ Seq((900L, ""), (901L, "   \t\n "), (902L, "solo"), (903L, null))
      val df = rows.toDF("id", "text")
      val both = df.select(
        col("id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("nat"),
        graft.functions.TextAnalysis.tokensComposed(col("text")).as("twin"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("nat_n"))
      val bad = both.filter(
        !(col("nat") <=> col("twin")) || !(col("nat_n") <=> size(col("twin")).cast("long")))
      assert(bad.isEmpty, s"seed=$seed: ${bad.collect().mkString(", ")}")
    }
  }

  test("termCounts equals the exploded groupBy tf and the O(n²) twin (5 seeds)") {
    val pool = Vector("aa", "bb", "Ω≈", "日本", "x", "a-b", "AA")
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = (0 until 150).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.size))).mkString(" "))
      } ++ Seq((900L, ""), (901L, "solo"), (902L, null))
      val df = rows.toDF("doc_id", "text")
        .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("tk"))
      val twin = expr(
        "transform(array_sort(array_distinct(tk)), x -> struct(x AS term, CAST(size(filter(tk, y -> y = x)) AS BIGINT) AS tf))")
      val bad = df
        .select(
          col("doc_id"),
          graft.functions.ShingleExpressions.termCounts(col("tk")).as("nat"),
          twin.as("tw"))
        .filter(!(col("nat") <=> col("tw")))
      assert(bad.isEmpty, s"seed=$seed: ${bad.collect().take(3).mkString(", ")}")
      val viaNative = df
        .select(col("doc_id"), explode(graft.functions.ShingleExpressions.termCounts(col("tk"))).as("tc"))
        .select(col("doc_id"), col("tc.term"), col("tc.tf"))
        .as[(Long, String, Long)].collect().toSet
      val viaGroupBy = df
        .select(col("doc_id"), explode(col("tk")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .as[(Long, String, Long)].collect().toSet
      assert(viaNative == viaGroupBy, s"seed=$seed: exploded tf mismatch")
      // tfStats is the lambda-free reduction of termCounts
      val badStats = df
        .select(
          col("doc_id"),
          graft.functions.ShingleExpressions.tfStats(col("tk")).as("st"),
          graft.functions.ShingleExpressions.termCounts(col("tk")).as("tc"))
        .filter(col("st").isNotNull && !(col("st") <=> array(
          expr("aggregate(tc, 0L, (acc, x) -> acc + x.tf)"),
          size(col("tc")).cast("long"),
          coalesce(expr("array_max(transform(tc, x -> x.tf))"), lit(0L)))))
      assert(badStats.isEmpty, s"seed=$seed: ${badStats.collect().take(3).mkString(", ")}")
    }
    // null elements are skipped like concat_ws skips null arguments
    val tc = spark.range(1)
      .select(graft.functions.ShingleExpressions.termCounts(
        array(lit("a"), lit(null).cast("string"), lit("a"))).as("tc"))
      .selectExpr("transform(tc, x -> concat(x.term, ':', x.tf))")
      .as[Seq[String]].head()
    assert(tc == Seq("a:2"))
  }

  test("dupRunStats equals the exploded per-gram count with conditional sums (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = (0 until 200).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(40))(rnd.nextInt(12).toLong))
      } :+ (900L, Seq.empty[Long]) :+ (901L, Seq(7L)) :+ (902L, Seq(7L, 7L, 7L))
      val df = rows.toDF("id", "a")
      val viaNative = df
        .select(col("id"), graft.functions.ShingleExpressions.dupRunStats(col("a")).as("st"))
        .select(col("id"), col("st").getItem(0).as("total"), col("st").getItem(1).as("dup"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val viaGroupBy = df
        .select(col("id"), explode_outer(col("a")).as("g"))
        .groupBy(col("id"), col("g")).agg(count(col("g")).as("c"))
        .groupBy(col("id"))
        .agg(
          sum(col("c")).as("total"),
          sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dup"))
        .select(col("id"), coalesce(col("total"), lit(0L)), coalesce(col("dup"), lit(0L)))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(viaNative == viaGroupBy, s"seed=$seed")
    }
  }

  test("collapseRuns: idempotent, order-preserving, never longer (5 seeds)") {
    import graft.operators.TrainingQueries
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val docs = (0 until 40).map { i =>
        // heavy repetition so collapses actually happen
        val toks = Seq.fill(rnd.nextInt(20))(s"w${rnd.nextInt(4)}")
        (i.toLong, toks.mkString(" "))
      }
      def collapse(toks: Seq[String]): Seq[String] =
        toks.foldLeft(Vector.empty[String])((acc, t) => if (acc.lastOption.contains(t)) acc else acc :+ t)
      val expected = docs.map { case (id, tx) =>
        id -> collapse(tx.trim.split("\\s+").filter(_.nonEmpty).toSeq)
      }.toMap
      val once = docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          TrainingQueries.collapseRuns(graft.functions.TextAnalysis.tokens(col("text"))).as("k"))
      val got = once.as[(Long, Seq[String])].collect().toMap
      assert(got == expected, s"seed=$seed")
      // the native expression must match the composable lambda twin
      val composed = docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          TrainingQueries.collapseRunsComposed(graft.functions.TextAnalysis.tokens(col("text"))).as("k"))
        .as[(Long, Seq[String])].collect().toMap
      assert(composed == got, s"seed=$seed native != composed")
      // idempotence: collapsing a collapsed array changes nothing
      val twice = once.select(col("doc_id"), TrainingQueries.collapseRuns(col("k")).as("k2"))
        .as[(Long, Seq[String])].collect().toMap
      assert(twice == got, s"seed=$seed not idempotent")
    }
  }

  test("bridge attach/detach algebra: add∘remove(added) restores; remove∘add(removed) restores (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd    = new Random(seed)
      val bridge = (0 until 60).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong)).distinct
      val other  = (0 until 20).map(_ => (20L + rnd.nextInt(10), rnd.nextInt(15).toLong)).distinct
      val bdf    = bridge.toDF("a", "b")
      val odf    = other.toDF("a", "b")
      val keys   = Seq("a", "b")
      // attach disjoint pairs then detach exactly them → original set
      val back1 = WritePath
        .bridgeRemove(WritePath.bridgeAdd(bdf, odf), odf, keys)
        .as[(Long, Long)].collect().toSet
      assert(back1 == bridge.toSet, s"seed=$seed attach/detach")
      // detach a subset then re-attach it → original set
      val sub = bridge.filter(_._1 % 3 == 0)
      val back2 = WritePath
        .bridgeAdd(WritePath.bridgeRemove(bdf, sub.toDF("a", "b"), keys), sub.toDF("a", "b"))
        .as[(Long, Long)].collect().toSet
      assert(back2 == bridge.toSet, s"seed=$seed detach/attach")
      // attach is idempotent (set semantics on the pair)
      val twice = WritePath.bridgeAdd(WritePath.bridgeAdd(bdf, odf), odf)
        .as[(Long, Long)].collect()
      assert(twice.length == twice.distinct.length, s"seed=$seed attach not set-idempotent")
    }
  }

  test("xlsx round-trip preserves random tables cell-for-cell (3 seeds)") {
    import graft.sources.Xlsx
    for (seed <- 1 to 3) {
      val rnd  = new Random(seed)
      val cols = 1 + rnd.nextInt(5)
      val rows = (0 until 1 + rnd.nextInt(30)).map { r =>
        (0 until cols).map { c =>
          // nulls, XML-hostile chars, unicode, empties
          rnd.nextInt(6) match {
            case 0 => null
            case 1 => s"<&>\"'${rnd.nextInt(100)}"
            case 2 => s"ünï©ode${rnd.nextInt(10)}"
            case 3 => ""
            case _ => s"v${rnd.nextInt(1000)}"
          }
        }
      }
      val header = (0 until cols).map(c => s"Col_$c")
      val path   = java.nio.file.Files.createTempDirectory("graft_xlsx_prop").toString + "/t.xlsx"
      Xlsx.write(path, Seq("s" -> (header +: rows)))
      val got = Xlsx.readSheets(path).head._2
      assert(got.head == header, s"seed=$seed header")
      // trailing all-null columns are indistinguishable from absent
      // cells in the format itself; compare up to the widest read row
      got.tail.zip(rows).zipWithIndex.foreach { case ((g, w), i) =>
        val width = g.length
        val wNorm = (w ++ Seq.fill(width - w.length)(null)).take(width)
          .map(v => if (v == null || v == "") null else v)
        val gNorm = g.map(v => if (v == null || v == "") null else v)
        assert(gNorm == wNorm, s"seed=$seed row $i: $gNorm != $wNorm")
      }
    }
  }

  test("driver-side hash60Jvm is bit-identical to the column expression") {
    import graft.functions.Hashing
    val rnd = new Random(7)
    val strs = (Seq("", "a", "spark", "the quick brown fox", "ünïcødé ☃") ++
      Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString)).distinct
    val viaCol = strs.toDF("s")
      .select(col("s"), Hashing.hash60(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    for (s <- strs)
      assert(Hashing.hash60Jvm(s) == viaCol(s), s"hash60Jvm diverged on '$s'")
  }

  test("proximity kernels equal quadratic reference over random sorted arrays (5 seeds)") {
    import graft.functions.ShingleExpressions
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = (0 until 60).map { i =>
        def arr() = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(200)).distinct.sorted
        (i.toLong, arr(), arr(), rnd.nextInt(5).toLong)
      }
      val df = rows.toDF("id", "a", "b", "w")
        .select(
          col("id"), col("a"), col("b"), col("w"),
          ShingleExpressions.sortedMinAbsGap(col("a"), col("b")).as("gap"),
          ShingleExpressions.sortedPairsWithin(col("a"), col("b"), col("w")).as("near"))
      val got = df.select("id", "gap", "near").as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      for ((id, a, b, w) <- rows) {
        val ds      = for (x <- a; y <- b) yield math.abs(x - y).toLong
        val expGap  = ds.min
        val expNear = ds.count(_ <= w).toLong
        assert(got(id) == ((expGap, expNear)), s"seed=$seed id=$id a=$a b=$b w=$w")
      }
    }
  }

  test("paginate exactly partitions any ordered id stream (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd  = new Random(seed)
      val n    = 50 + rnd.nextInt(100)
      val ids  = rnd.shuffle((1 to n).toList)
      val size = 7 + rnd.nextInt(20)
      val df   = ids.toDF("id")
      val pages = (0 to n / size).map(p =>
        Ops.paginate(df, Seq(col("id")), p, size).select("id").as[Int].collect().toList)
      assert(pages.flatten == (1 to n).toList, s"seed=$seed")
    }
  }
}
