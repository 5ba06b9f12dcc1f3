package graft

import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.functions._

class DedupKnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content entirely here now"),
    (4L, "the  quick brown  fox jumps  over the lazy dog"), // dup of 1 modulo whitespace
    (5L, "tiny doc"), // < 3 tokens → no shingles
  ).toDF("doc_id", "text")

  test("exactDedup groups normalized duplicates") {
    val got = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id", "group_size", "is_kept")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, true)) && got(4L) == ((2L, false)))
    assert(got(2L) == ((1L, true)) && got(3L) == ((1L, true)))
  }

  test("jaccardPairs finds the near-dup and only it at 0.5") {
    val pairs = Dedup.jaccardPairs(Dedup.shingleArrays(docs, "doc_id", "text", 3), "doc_id", 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical shingle sets after tokenization
    assert(pairs.contains((1L, 2L)) || !pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash-LSH pairs are a subset of exact jaccard pairs") {
    val arrs  = Dedup.shingleArrays(docs, "doc_id", "text", 3)
    val exact = Dedup.jaccardPairs(arrs, "doc_id", 0.5).select("id1", "id2")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((1L, 4L))) // identical docs always collide on every band
  }

  test("MinHashAgg signatures identical to the composable column form") {
    val sh = Dedup.shingleSet(docs, "doc_id", "text", 3)
    val a = Dedup.minhashSignatures(sh, "doc_id", 16)
      .as[(Long, Int, Long)].collect().toSet
    val b = Dedup.minhashSignaturesAgg(sh, "doc_id", 16)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    // JVM hash60 twin matches the COMPOSED Column md5/conv form
    assert(graft.functions.MinHashAgg.hash60("0:the quick brown") ==
      spark.range(1).select(
        graft.functions.Hashing.hash60Composed(lit("0:the quick brown"))).as[Long].head())
  }

  test("fused ShingleHash60Expr equals the composed transform+hash60 forms") {
    import graft.functions.{ShingleExpressions, TextAnalysis, Hashing}
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bб", "çc", "dd", "ee", "ünï✓", "中文", "x")
    val docs = ((0 until 60).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((100L, ""), (101L, "one"), (102L, "two toks"))).toDF("doc_id", "text")
    val base = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
    for (n <- Seq(2, 3, 4)) {
      // sorted-distinct set form
      val fusedSet = base.select(col("doc_id"), ShingleExpressions.shingleHashSet(col("t"), n).as("v"))
        .as[(Long, Seq[Long])].collect().toMap
      val composedSet = base.select(
        col("doc_id"),
        array_sort(array_distinct(
          transform(TextAnalysis.shinglesFromTokens(col("t"), n), s => Hashing.hash60(s)))).as("v"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(fusedSet == composedSet, s"set form n=$n")
      // position-ordered form
      val fusedOrd = base.select(col("doc_id"), ShingleExpressions.shingleHashes(col("t"), n).as("v"))
        .as[(Long, Seq[Long])].collect().toMap
      val composedOrd = base.select(
        col("doc_id"),
        transform(TextAnalysis.shinglesFromTokens(col("t"), n), s => Hashing.hash60(s)).as("v"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(fusedOrd == composedOrd, s"ordered form n=$n")
    }
  }

  test("native Hash60Expr is value-identical to the composed md5 form") {
    val rnd = new scala.util.Random(11)
    val samples = Seq("", "a", "0:x", "ünïcødé ✓ 中文", "  spaces  ") ++
      (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val df = samples.toDF("s")
    val mismatches = df.select(
      graft.functions.Hashing.hash60(col("s")).as("native"),
      graft.functions.Hashing.hash60Composed(col("s")).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(mismatches.isEmpty)
    // null in, null out
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(graft.functions.Hashing.hash60(col("s")).as("h"))
    assert(nulls.filter(col("h").isNotNull).isEmpty)
    // castable input (bigint) is implicitly cast — same value as hashing
    // the string render, matching upstream ImplicitCastInputTypes style
    val castRow = Seq(42L).toDF("n")
      .select(
        graft.functions.Hashing.hash60(col("n")).as("h"),
        graft.functions.Hashing.hash60(col("n").cast("string")).as("hs"))
      .head()
    assert(castRow.getLong(0) === castRow.getLong(1))
    // non-castable input (array) still fails at ANALYSIS, not at runtime
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1, 2)).toDF("a").select(graft.functions.Hashing.hash60(col("a"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("hash60") || err.getMessage.contains("STRING"))
  }

  test("containmentPairs finds embedded-document pairs Jaccard misses") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      // doc 2 fully contains doc 1's shingles + much more → containment 1.0,
      // but Jaccard is only 3/10 (well under 0.5)
      (2L, "alpha beta gamma delta epsilon one two three four five six seven"),
      (3L, "unrelated words entirely different content"),
    ).toDF("doc_id", "text")
    val arrs = Dedup.shingleArrays(d, "doc_id", "text", 3)
    val cont = Dedup.containmentPairs(arrs, "doc_id", 0.8)
      .select("id1", "id2", "cont").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(cont.keySet == Set((1L, 2L)))
    assert(cont((1L, 2L)) == 1.0)
    val jac = Dedup.jaccardPairs(arrs, "doc_id", 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L))) // the pair only containment catches
  }

  test("containmentPairs equals brute force on random docs (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd   = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      val docs = (0 until 25).map(i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
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
        cont = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
        if cont >= 0.8
      } yield (a, b)).toSet
      val got = Dedup
        .containmentPairs(Dedup.shingleArrays(docs.toDF("doc_id", "text"), "doc_id", "text", 3), "doc_id", 0.8)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed: got ${got.size}, expected ${expected.size}")
    }
  }

  test("simhashPairs equals brute-force hamming<=3 over random docs (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd   = new scala.util.Random(seed)
      val vocab = Vector("k1", "k2", "k3", "k4", "k5", "k6")
      val base  = (0 until 20).map(i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      // clones guarantee dist-0 pairs
      val d  = base ++ base.take(2).map { case (id, tx) => (id + 100, tx) }
      val df = d.toDF("doc_id", "text")
      val hashes = Dedup.simhash60(df, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      val expected = (for {
        a <- hashes.keys; b <- hashes.keys if a < b
        if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
      } yield (a, b)).toSet
      val got = Dedup.simhashPairs(df, "doc_id", "text", 3)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed: got ${got.size}, expected ${expected.size}")
      (0L until 2L).foreach(i => assert(got.contains((i, i + 100)), s"clone pair $i missing"))
      // the group-level clustering path must agree: two docs share a
      // cluster iff they are connected through dist<=3 hash edges; in
      // particular every brute-force pair is same-cluster
      val clusters = Dedup.simhashClusters(df, "doc_id", "text", 3)
        .select("doc_id", "cluster").as[(Long, Long)].collect().toMap
      expected.foreach { case (a, b) =>
        assert(clusters(a) == clusters(b), s"seed=$seed: pair ($a,$b) split across clusters")
      }
    }
  }

  test("verify merges keep exact-threshold pairs at FP-unfriendly thresholds") {
    // ceil(x * t) in double arithmetic overshoots the true integer bound
    // by 1 for these thresholds (ADVICE r10): a pair sitting EXACTLY on
    // the threshold would be early-exited to -1 without the conservative
    // earlyExitFloor. Each case constructs jaccard == inter/union == t
    // bit-exactly (correctly-rounded division of small integers).
    val cases = Seq((0.2, 1, 5), (0.4, 2, 5), (0.5, 1, 2), (0.67, 67, 100), (0.8, 4, 5), (0.9, 9, 10))
    for ((t, i, u) <- cases) {
      val extra = u - i
      val a = extra / 2; val b = extra - a
      val set1 = ((0L until i.toLong) ++ (1000L until (1000L + a))).sorted
      val set2 = ((0L until i.toLong) ++ (2000L until (2000L + b))).sorted
      val arrs = Seq((1L, set1, set1.size.toLong), (2L, set2, set2.size.toLong))
        .toDF("doc_id", "set", "n")
      val cand = Seq((1L, 2L)).toDF("id1", "id2")
      val got = Dedup.verifyJaccard(cand, arrs, "doc_id", t)
        .select("id1", "id2", "jac").as[(Long, Long, Double)].collect().toSeq
      assert(got == Seq((1L, 2L, i.toDouble / u)),
        s"t=$t inter=$i union=$u: pair at exactly the threshold must survive verifyJaccard")
    }
    // containment twin: cont == inter/min(n1,n2) == t bit-exactly
    for ((t, i, m) <- Seq((0.2, 1, 5), (0.4, 2, 5), (0.67, 67, 100), (0.8, 4, 5), (0.9, 9, 10))) {
      val small = ((0L until i.toLong) ++ (1000L until (1000L + (m - i)))).sorted
      val big   = ((0L until i.toLong) ++ (2000L until (2000L + m + 3))).sorted
      val arrs = Seq((1L, small, small.size.toLong), (2L, big, big.size.toLong))
        .toDF("doc_id", "set", "n")
      val got = Dedup.containmentPairs(arrs, "doc_id", t)
        .select("id1", "id2", "cont").as[(Long, Long, Double)].collect().toSeq
      assert(got == Seq((1L, 2L, i.toDouble / m)),
        s"t=$t inter=$i min=$m: pair at exactly the threshold must survive containmentPairs")
    }
  }

  test("incrementalExactDedup: unseen-first-wins against the corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "existing corpus content here")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the  quick brown fox  jumps over the lazy dog"), // dup of corpus 1 modulo ws
      (11L, "a genuinely new document arrives"),
      (12L, "a genuinely  new document arrives"), // dup of 11 within batch
      (13L, "another new one")).toDF("doc_id", "text")
    val got = Dedup.incrementalExactDedup(corpus, incoming, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L)) // 10 seen in corpus; 12 loses to 11
  }

  test("crossNearDupPairs finds cross near-dups only, never within-side pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different corpus content entirely here now")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"), // near-dup of corpus 1
      (11L, "the quick brown fox jumps over the lazy dog"), // exact dup of corpus 1
      (12L, "the quick brown fox jumps over the lazy rat"), // near-dup of 10/11 AND corpus 1
      (13L, "unrelated incoming text with many fresh words")).toDF("doc_id", "text")
    val got = Dedup.crossNearDupPairs(corpus, incoming, "doc_id", "text")
      .select("incoming_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got.contains((11L, 1L))) // identical docs collide on every band
    assert(got.forall { case (i, c) => i >= 10L && c < 10L }) // cross pairs only
    // within-incoming near-dups (10, 11, 12 cluster) must NOT appear
    assert(!got.exists { case (i, c) => c >= 10L })
  }

  test("per-row, aggregator and composed simhash forms are identical") {
    val rnd   = new scala.util.Random(5)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "ünï✓", "中文")
    val d = ((0 until 40).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      :+ (100L, "") :+ (101L, "   ")) // token-less docs must vanish in every form
      .toDF("doc_id", "text")
    val row = Dedup.simhash60(d, "doc_id", "text").as[(Long, Long)].collect().toMap
    val agg = Dedup.simhash60Agg(d, "doc_id", "text").as[(Long, Long)].collect().toMap
    val cmp = Dedup.simhash60Composed(d, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(row == agg)
    assert(row == cmp)
    assert(!row.contains(100L) && !row.contains(101L))
  }

  test("simhash: identical normalized docs get identical hashes") {
    val h = Dedup.simhash60(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(4L))
    assert(h(1L) != h(3L))
    assert(h.values.forall(v => v >= 0L)) // 60-bit: always positive
  }

  test("dedupComponents labels chains and cliques with the min id") {
    // chain 1-2-3-4, clique 10-11-12, isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L),
    ).toDF("id1", "id2")
    val got = Dedup.dedupComponents(pairs)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, true)) && got(4L) == ((1L, false)))
    assert(got(2L)._1 == 1L && got(3L)._1 == 1L)
    assert(got(10L) == ((10L, true)) && got(12L) == ((10L, false)))
    assert(got(20L) == ((20L, true)) && got(21L) == ((20L, false)))
  }

  test("dedupComponents distributed path matches the driver union-find") {
    // driverEdgeLimit = 0 forces the iterative min-label path; results
    // must be identical to the (default) driver union-find
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 20L),
    ).toDF("id1", "id2")
    val a = Dedup.dedupComponents(pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = Dedup.dedupComponents(pairs, driverEdgeLimit = 0L)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("dropNearDuplicates keeps representatives and untouched docs") {
    val pairs = Seq((1L, 2L), (2L, 4L)).toDF("id1", "id2")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L)) // 2 and 4 fold into component 1
  }

  test("bruteTopK is exact and self-excluding") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(-1f, 0f, 0f)),
    ).toDF("vec_id", "embedding")
    val got = Knn.bruteTopK(emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", 3)
      .select("n_id", "rank").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == 1L && got(2L) == 2L && got(3L) == 3L) // cosine order
  }

  test("bucketedTopK searches only the query's sign cell") {
    val emb = Seq(
      (0L, Array(1f, 1f, 1f)),
      (1L, Array(0.5f, 0.5f, 0.5f)), // same cell as 0
      (2L, Array(-1f, -1f, -1f)),    // opposite cell
    ).toDF("vec_id", "embedding")
    val got = Knn.bucketedTopK(emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", 5, 3)
      .select("n_id").as[Long].collect().toSet
    assert(got == Set(1L)) // vec 2 is in another cell, never scored
  }

  test("semDedup drops exactly the vectors dominated by a smaller-id neighbor") {
    val emb = Seq(
      (0L, Array(1f, 1f, 1f)),       // kept (nothing smaller)
      (1L, Array(0.9f, 1.1f, 1f)),   // ~parallel to 0, same cell -> dropped
      (2L, Array(1f, -1f, 1f)),      // different cell -> kept
      (3L, Array(0.95f, 1f, 1.05f)), // ~parallel to 0 and 1 -> dropped
      (4L, Array(1f, 1f, -20f)),     // same cell as 2, near-orthogonal to it -> kept
    ).toDF("vec_id", "embedding")
    val got = Knn.semDedup(emb, "vec_id", "embedding", threshold = 0.95, bits = 3)
      .select("vec_id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false, 4L -> true))
    // the drop rule is dominated-by-ANY-smaller-id (one join-parallel
    // pass), so 3 is dropped via 0 or 1 even though 1 itself dropped
  }

  test("centroid-blocked near-dup: full-probe equals exact, probes=4 holds measured recall") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e
      .filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // probes = k indexes every vector into every cell → candidate set
    // degenerates to all-pairs, so the blocked result must EQUAL exact
    val full = Dedup
      .embeddingNearDupLsh(emb, "vec_id", "embedding", 0.45, centroids = Some(cents), probes = k)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(full == exact)
    // production probes=4: verified candidates only (precision 1), and
    // the recall floor measured for this corpus (5/7 at sf0.001 —
    // deterministic, no seed)
    val p4 = Dedup
      .embeddingNearDupLsh(emb, "vec_id", "embedding", 0.45, centroids = Some(cents), probes = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(p4.subsetOf(exact))
    assert(p4.size.toDouble / exact.size >= 0.7, s"recall ${p4.size}/${exact.size}")
  }

  test("centroid cell cardinality scales with corpus size (no fixed 8-cell cap)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def occupiedCells(corpus: org.apache.spark.sql.DataFrame): Long = {
      val k = math.ceil(math.sqrt(corpus.count().toDouble)).toInt
      val e = corpus
        .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", Knn.norm(col("v")))
      val cents = e.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      Knn.assignCells(e, cents, "vec_id")
        .agg(countDistinct(col("cell"))).as[Long].head()
    }
    val small = occupiedCells(emb.filter(col("vec_id") % 4 === 0))
    val all   = occupiedCells(emb)
    assert(small > 8, s"small-slice cells $small should already beat the sign-cell 8")
    assert(all > small, s"cells must grow with the corpus: $all vs $small")
  }

  test("semDedup centroid path with full probes equals the sign-free exact dominance") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(120)
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    // exact dominance: dropped iff ANY smaller id has cos >= t
    val exactDropped = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.6)
      .select("id2").as[Long].collect().toSet
    val got = Knn
      .semDedup(emb, "vec_id", "embedding", threshold = 0.6, centroids = Some(cents), probes = k)
      .select("vec_id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(got.size == 120)
    got.foreach { case (id, kept) =>
      assert(kept == !exactDropped.contains(id), s"vec $id kept=$kept")
    }
  }

  test("streamingEmbeddingMatches at full probes equals the exact cross matches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb      = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus   = emb.filter(col("vec_id") % 5 =!= 0)
    val incoming = emb.filter(col("vec_id") % 5 === 0)
    val k = math.ceil(math.sqrt(corpus.count().toDouble)).toInt
    val e = corpus
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val centsDf = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val idx = Knn.indexCorpus(corpus, centsDf, "vec_id", "embedding").persist()
    val cents = centsDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq

    // exact expected set: brute cross cosine >= threshold
    val q = incoming.select(col("vec_id").as("q_id"), Knn.asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("n_id"), Knn.asDouble(col("embedding")).as("cv"))
    val expected = broadcast(q).crossJoin(c)
      .withColumn("cos", Knn.cosine(col("qv"), col("cv")))
      .filter(col("cos") >= 0.4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    val stream = MemoryStream[(Long, Array[Float])]
    val sq = Knn
      .streamingEmbeddingMatches(
        stream.toDF().toDF("vec_id", "embedding"), idx, cents,
        "vec_id", "embedding", threshold = 0.4, probes = k)
      .writeStream.outputMode("append").format("memory").queryName("emb_matches").start()
    try {
      val batch = incoming.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect().toSeq
      stream.addData(batch.take(batch.size / 2))
      sq.processAllAvailable()
      stream.addData(batch.drop(batch.size / 2))
      sq.processAllAvailable()
      val got = spark.table("emb_matches")
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"stream ${got.size} vs exact ${expected.size}")
    } finally { sq.stop(); idx.unpersist() }
  }

  test("rowMinhashBands is value-identical to the aggregated lshBands path") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
    val arrs = Dedup.shingleArrays(docs, "doc_id", "text", 3)
    val viaAgg = Dedup
      .lshBands(Dedup.minhashSignaturesAgg(Dedup.explodeShingles(arrs, "doc_id"), "doc_id", 8), "doc_id", 2)
      .select("doc_id", "band", "sig").as[(Long, Long, String)].collect().toSet
    val viaRow = Dedup.rowMinhashBands(arrs, "doc_id", 8, 2)
      .select("doc_id", "band", "sig").as[(Long, Long, String)].collect().toSet
    assert(viaRow == viaAgg)
    assert(viaRow.nonEmpty)
  }

  test("streamingNearDupMatches equals the batch cross near-dup pairs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs     = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus   = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val cArrs    = Dedup.shingleArrays(corpus, "doc_id", "text", 3).persist()

    val expected = Dedup
      .crossNearDupPairs(corpus, incoming, "doc_id", "text", 3, 16, 2, 0.5)
      .select("incoming_id", "corpus_id").as[(Long, Long)].collect().toSet

    val stream = MemoryStream[(Long, String)]
    val q = Dedup
      .streamingNearDupMatches(
        stream.toDF().toDF("doc_id", "text"), cArrs, "doc_id", "text", 3, 16, 2, 0.5)
      .writeStream.outputMode("append").format("memory").queryName("neardup_out").start()
    try {
      val batch = incoming.select("doc_id", "text").as[(Long, String)].collect().toSeq
      stream.addData(batch.take(batch.size / 2))
      q.processAllAvailable()
      stream.addData(batch.drop(batch.size / 2))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .select("incoming_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally { q.stop(); cArrs.unpersist() }
  }

  test("winnowing guarantee: docs sharing a >=6-token run share a fingerprint") {
    // k=3 shingles + window 4 => any common substring of k+w-1 = 6
    // tokens spans a full hash window, whose min is a fingerprint of
    // both docs (Schleimer et al. 2003, thm 1)
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared x y z"),
      (2L, s"$shared p q r s t u v w"),
      (3L, "totally different words everywhere here now okay then"),
    ).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((got(1L) intersect got(2L)).nonEmpty)
    assert((got(1L) intersect got(3L)).isEmpty)
  }

  test("salted group-pair expansion equals the plain form for every chunking") {
    // pairsWithinGroupsSalted spreads a hot group's quadratic pair
    // emission across tasks; the output contract (id1 < id2, distinct,
    // complete) must be IDENTICAL for any chunk size, including
    // chunk >= g (degenerates to the plain single-task form) and
    // chunk = 1 (every pair is its own cross task).
    val rnd = new scala.util.Random(7)
    val groups = (0 until 12).map { g =>
      val n = 2 + rnd.nextInt(40)
      (0 until n).map(_ => rnd.nextLong().abs % 1000).distinct.sorted.toArray
    } :+ Array(42L) // singleton group must emit nothing
    val grouped = groups.map(Tuple1(_)).toDF("ds")
    def pairsOf(ids: Array[Long]) =
      (for { i <- ids.indices; j <- (i + 1) until ids.length } yield (ids(i), ids(j))).toSet
    val expected = groups.flatMap(pairsOf).toSet
    for (chunk <- Seq(1, 3, 7, 64)) {
      val got = Dedup.pairsWithinGroupsSalted(grouped, chunk)
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"chunk=$chunk: salted pairs diverge from brute force")
    }
    // and the lshCandidates consumer (now salted) still finds the
    // near-dup family on the standard fixture
    val arrs = Dedup.shingleArrays(docs, "doc_id", "text", 3)
    val cand = Dedup.lshCandidates(Dedup.rowMinhashBands(arrs, "doc_id", 16, 2), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 4L)), "exact-dup pair must band-collide")
  }

  test("persisted IVF index: grown == in-session, frozen-model appends, zero-exchange cell self-join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      // build half, append half under the frozen model
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivf_a", dir, buckets = 4)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", "t_ivf_a")
      val grown = Knn.ivfTable(spark, "t_ivf_a")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSeq.sorted
      val scratch = Knn.indexCorpus(emb, cents, "vec_id", "embedding")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSeq.sorted
      assert(grown == scratch && grown.nonEmpty,
        "grown persisted IVF assignment diverged from a from-scratch in-session build")
      // the top-k cell join is a bucketed SELF-join: NO exchange on
      // either side under the join (broadcast disabled to ask the
      // layout, not the sizes)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val idx = Knn.ivfTable(spark, "t_ivf_a")
        val qs = idx.filter(col("n_id") < 5)
          .select(col("n_id").as("q_id"), col("nv").as("qv"), col("nn").as("qn"), col("cell"))
        val j = qs.join(idx, Seq("cell")).filter(col("n_id") =!= col("q_id"))
          .select(col("q_id"), col("n_id"))
        j.collect()
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def expand(p: SparkPlan): Seq[SparkPlan] = p match {
          case qst: QueryStageExec      => Seq(qst) ++ expand(qst.plan)
          case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
          case other                    => Seq(other) ++ other.children.flatMap(expand)
        }
        val joins = expand(j.queryExecution.executedPlan).collect {
          case jn: org.apache.spark.sql.execution.joins.BaseJoinExec => jn
        }
        assert(joins.nonEmpty, s"no join:\n${j.queryExecution.executedPlan}")
        assert(
          !joins.head.children.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])),
          s"cell self-join exchanged a side — bucket layout unused:\n${j.queryExecution.executedPlan}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally Knn.dropIvfIndex(spark, "t_ivf_a")
  }

  /** Zero-exchange assert for the bucketed cell self-join (shared by
    * the build/append test above and the lifecycle legs below).
    */
  private def assertCellSelfJoinUnshuffled(name: String): Unit = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val idx = Knn.ivfTable(spark, name)
      val qs = idx.filter(col("n_id") < 5)
        .select(col("n_id").as("q_id"), col("nv").as("qv"), col("nn").as("qn"), col("cell"))
      val j = qs.join(idx, Seq("cell")).filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"))
      j.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case qst: QueryStageExec      => Seq(qst) ++ expand(qst.plan)
        case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
        case other                    => Seq(other) ++ other.children.flatMap(expand)
      }
      val joins = expand(j.queryExecution.executedPlan).collect {
        case jn: org.apache.spark.sql.execution.joins.BaseJoinExec => jn
      }
      assert(joins.nonEmpty, s"no join:\n${j.queryExecution.executedPlan}")
      assert(
        !joins.head.children.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])),
        s"cell self-join exchanged a side after maintenance:\n${j.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF streaming maintenance: micro-batch appends keep assignments frozen-model consistent; replay no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir  = java.nio.file.Files.createTempDirectory("graft_ivfstr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivfstr_ckpt").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val batches = emb
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
      .filter(_._1 % 2 == 1)
    val (batchA, batchB) = batches.splitAt(batches.size / 2)
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfs_a", dir, buckets = 4)
      val stream = MemoryStream[(Long, Seq[Float])]
      val q = Knn
        .maintainIvfFromStream(stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", "t_ivfs_a")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        stream.addData(batchA); q.processAllAvailable()
        stream.addData(batchB); q.processAllAvailable()
        val grown = Knn.ivfTable(spark, "t_ivfs_a")
          .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSeq.sorted
        val scratch = Knn.indexCorpus(emb, cents, "vec_id", "embedding")
          .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSeq.sorted
        assert(grown == scratch && grown.nonEmpty,
          "stream-grown IVF index diverged from a from-scratch build under the frozen model")
        // replay of a committed batch id is a whole-batch no-op
        val before = Knn.ivfTable(spark, "t_ivfs_a").count()
        Knn.appendIvfBatch(
          batchA.toDF("vec_id", "embedding"), "vec_id", "embedding", "t_ivfs_a", batchId = 0L)
        assert(Knn.ivfTable(spark, "t_ivfs_a").count() == before)
        assert(spark.table("t_ivfs_a_ivfmarkers").count() == 2)
        // idempotent appends against an index with no marker log refuse loudly
        val err = intercept[IllegalArgumentException](
          Knn.appendIvfBatch(
            batchA.toDF("vec_id", "embedding"), "vec_id", "embedding", "t_ivfs_missing", batchId = 0L))
        assert(err.getMessage.contains("no marker table"))
        assertCellSelfJoinUnshuffled("t_ivfs_a")
      } finally q.stop()
    } finally Knn.dropIvfIndex(spark, "t_ivfs_a")
  }

  test("IVF compaction: files collapse to one per bucket, rows and plan properties survive, markers untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfc").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    def files(): Int = Knn.ivfTable(spark, "t_ivfc_a").inputFiles.length
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 3 === 0), cents, "vec_id", "embedding", "t_ivfc_a", dir, buckets = 4)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", "t_ivfc_a", batchId = 1L)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 3 === 2), "vec_id", "embedding", "t_ivfc_a", batchId = 2L)
      val before = Knn.ivfTable(spark, "t_ivfc_a")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSeq.sorted
      assert(files() > 4, "appends should have fragmented the cell buckets")
      Knn.compactIvfIndex(spark, "t_ivfc_a")
      // one file per NON-EMPTY bucket (an empty bucket writes no file)
      assert(files() <= 4, "compaction must leave at most one file per bucket")
      val after = Knn.ivfTable(spark, "t_ivfc_a")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSeq.sorted
      assert(after == before && after.nonEmpty, "compaction changed the index rows")
      // markers (replay-idempotence log) and the frozen model survive
      assert(spark.table("t_ivfc_a_ivfmarkers").count() == 2)
      assert(Knn.ivfCentroids(spark, "t_ivfc_a").count() == 8)
      // a replayed append batch stays a no-op after compaction
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", "t_ivfc_a", batchId = 1L)
      assert(Knn.ivfTable(spark, "t_ivfc_a")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSeq.sorted == before)
      assertCellSelfJoinUnshuffled("t_ivfc_a")
      // post-compact appends still land under the spec (no exchange)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", "t_ivfc_a", batchId = 3L)
      assertCellSelfJoinUnshuffled("t_ivfc_a")
    } finally Knn.dropIvfIndex(spark, "t_ivfc_a")
  }

  test("ivfTopK: pruned read equals the unpruned cell join; scan selects only the queries' cell buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfq").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      Knn.writeIvfIndex(emb, cents, "vec_id", "embedding", "t_ivfq_a", dir, buckets = 8)
      val queries = emb.filter(col("vec_id") < 3) // 3-query batch
      val pruned = Knn.ivfTopK(spark, "t_ivfq_a", queries, "vec_id", "embedding", k = 5)
      // reference: the unpruned e10-shape join restricted to the same queries
      val idx = Knn.ivfTable(spark, "t_ivfq_a")
      val qs = idx.filter(col("n_id") < 3)
        .select(col("n_id").as("q_id"), col("nv").as("qv"), col("nn").as("qn"), col("cell"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
      val ref = qs.join(idx, Seq("cell"))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("cos", Knn.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("cell"), col("n_id"), col("rank"), col("cos"))
      val got = pruned.as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
      val exp = ref.as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
      assert(got == exp && got.nonEmpty, "pruned ivfTopK diverged from the unpruned cell join")
      // the scan must select only the query batch's cells' buckets
      pruned.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case qst: QueryStageExec      => Seq(qst) ++ expand(qst.plan)
        case a: AdaptiveSparkPlanExec => Seq(a) ++ expand(a.executedPlan)
        case other                    => Seq(other) ++ other.children.flatMap(expand)
      }
      val nCells = got.map(_._2).distinct.size
      val bucketScans = expand(pruned.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec if f.relation.bucketSpec.nonEmpty => f
      }
      assert(bucketScans.nonEmpty, s"no bucketed scan:\n${pruned.queryExecution.executedPlan}")
      val counts = bucketScans.map(f =>
        f.optionalBucketSet.map(_.cardinality()).getOrElse(f.relation.bucketSpec.get.numBuckets))
      assert(counts.exists(_ <= math.max(nCells, 3)),
        s"cell bucket pruning not applied (selected buckets: $counts, query cells: $nCells)")
      // a batch touching more cells than the driver-collect bound
      // REFUSES loudly (the prefixTerms contract), never degrades
      val err = intercept[IllegalArgumentException](
        Knn.ivfTopK(spark, "t_ivfq_a", emb, "vec_id", "embedding", k = 5, maxCells = 1).collect())
      assert(err.getMessage.contains("more than 1 cells"))
      // multi-probe recall knob: probes == K (all 8 centroid cells)
      // degenerates to the EXACT brute ranking over the index corpus
      val full = Knn.ivfTopK(spark, "t_ivfq_a", queries, "vec_id", "embedding", k = 5, probes = 8)
        .select(col("q_id"), col("n_id"), col("rank"), col("cos"))
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      val brute = Knn.bruteTopK(queries, emb, "vec_id", "embedding", k = 5)
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      assert(full == brute && full.nonEmpty,
        "ivfTopK at probes == K must equal the exact brute ranking")
      // probes=2 result is a superset-quality middle ground: each
      // query's hits are a subset of brute's candidate set by design
      val p2 = Knn.ivfTopK(spark, "t_ivfq_a", queries, "vec_id", "embedding", k = 5, probes = 2)
      assert(p2.count() > 0)
    } finally Knn.dropIvfIndex(spark, "t_ivfq_a")
  }

  test("IVF deletion: tombstoned vectors vanish from reads; delete-then-compact == fresh survivor build; re-add works") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfd").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfd").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val queries = emb.filter(col("vec_id") < 3)
    def topK(n: String) = Knn.ivfTopK(spark, n, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    try {
      Knn.writeIvfIndex(emb, cents, "vec_id", "embedding", "t_ivfd_a", dirA, buckets = 4)
      // fresh survivor build: same frozen model, corpus minus the deleted set
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 9 =!= 2), cents, "vec_id", "embedding", "t_ivfd_b", dirB, buckets = 4)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", "t_ivfd_a", batchId = 1L)
      assert(topK("t_ivfd_a") == topK("t_ivfd_b") && topK("t_ivfd_a").nonEmpty,
        "tombstoned IVF reads diverged from a fresh survivor build")
      assert(!topK("t_ivfd_a").exists(r => r._3 % 9 == 2), "a deleted vector still retrieves")
      // replay of the committed delete batch is a no-op
      val tombsBefore = spark.table("t_ivfd_a_ivftombs").count()
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", "t_ivfd_a", batchId = 1L)
      assert(spark.table("t_ivfd_a_ivftombs").count() == tombsBefore)
      // compaction physically drops the tombstoned rows and clears the set
      Knn.compactIvfIndex(spark, "t_ivfd_a")
      assert(Knn.ivfTable(spark, "t_ivfd_a")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSet ==
        Knn.ivfTable(spark, "t_ivfd_b").select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSet,
        "compaction left tombstoned vectors in the files")
      assert(spark.table("t_ivfd_a_ivftombs").count() == 0, "compaction must clear the tombstone set")
      assert(topK("t_ivfd_a") == topK("t_ivfd_b"), "answers changed after delete-then-compact")
      // after the clear, a deleted vector may re-ingest
      Knn.appendIvfBatch(
        emb.filter(col("vec_id") === 2), "vec_id", "embedding", "t_ivfd_a", batchId = 5L)
      assert(Knn.liveIvf(spark, "t_ivfd_a").filter(col("n_id") === 2).count() == 1)
    } finally {
      Knn.dropIvfIndex(spark, "t_ivfd_a")
      Knn.dropIvfIndex(spark, "t_ivfd_b")
    }
  }

  test("IVF compaction policy: fragment and tombstone triggers, no-op at rest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfp").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 3 === 0), cents, "vec_id", "embedding", "t_ivfp_a", dir, buckets = 4)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", "t_ivfp_a", batchId = 1L)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 3 === 2), "vec_id", "embedding", "t_ivfp_a", batchId = 2L)
      // fragmented past the cap: compacts
      assert(Knn.compactIvfIfFragmented(spark, "t_ivfp_a", maxFilesPerBucket = 2))
      // at rest: no-op
      assert(!Knn.compactIvfIfFragmented(spark, "t_ivfp_a", maxFilesPerBucket = 2))
      // tombstone pressure alone triggers (and clears the set)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", "t_ivfp_a", batchId = 3L)
      assert(Knn.compactIvfIfFragmented(spark, "t_ivfp_a", maxFilesPerBucket = 8, maxTombstones = 1))
      assert(spark.table("t_ivfp_a_ivftombs").count() == 0)
      assert(!Knn.compactIvfIfFragmented(spark, "t_ivfp_a", maxFilesPerBucket = 8, maxTombstones = 1))
    } finally Knn.dropIvfIndex(spark, "t_ivfp_a")
  }

  test("IVF retrain migration: retrained index == fresh build under the new model bit-for-bit; tombstones drop, markers survive") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    def model(lo: Long, hi: Long) = e.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      // lifecycle under model A: build evens, append odds, delete some
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), model(0, 8), "vec_id", "embedding", "t_rt_a", dirA, buckets = 4)
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", "t_rt_a", batchId = 1L)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", "t_rt_a", batchId = 2L)
      // migrate to model B (an explicit retrain, never a silent drift)
      Knn.retrainIvfIndex(spark, "t_rt_a", model(8, 16))
      // fresh build of the SURVIVING corpus under model B
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 9 =!= 2), model(8, 16), "vec_id", "embedding", "t_rt_b", dirB, buckets = 4)
      // bit-for-bit: same (cell, id, norm) rows, and the vectors match
      assert(Knn.ivfTable(spark, "t_rt_a")
        .select(col("cell"), col("n_id"), col("nn")).as[(Long, Long, Double)].collect().toSet ==
        Knn.ivfTable(spark, "t_rt_b")
          .select(col("cell"), col("n_id"), col("nn")).as[(Long, Long, Double)].collect().toSet,
        "retrained index diverged from the fresh build under the new model")
      val vecMismatch = Knn.ivfTable(spark, "t_rt_a").select(col("n_id"), col("nv"))
        .join(Knn.ivfTable(spark, "t_rt_b").select(col("n_id"), col("nv").as("nv_b")), Seq("n_id"))
        .filter(!(col("nv") === col("nv_b"))).count()
      assert(vecMismatch == 0, "stored vectors changed under retrain")
      // tombstoned vectors dropped physically, set cleared; model swapped
      assert(spark.table("t_rt_a_ivftombs").count() == 0)
      assert(Knn.ivfCentroids(spark, "t_rt_a").select(col("c_id")).as[Long].collect().toSet ==
        (8L until 16L).toSet)
      // marker log untouched: the committed append replays as a no-op
      val rows = Knn.ivfTable(spark, "t_rt_a").count()
      Knn.appendIvfBatch(emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", "t_rt_a", batchId = 1L)
      assert(Knn.ivfTable(spark, "t_rt_a").count() == rows,
        "retrain lost the marker log — replayed batch re-appended")
      // reads equal the fresh build; fsck green
      val q = emb.filter(col("vec_id") < 3)
      def topK(n: String) = Knn.ivfTopK(spark, n, q, "vec_id", "embedding", k = 5)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
      assert(topK("t_rt_a") == topK("t_rt_b") && topK("t_rt_a").nonEmpty)
      val fsck = Knn.checkIvfIndex(spark, "t_rt_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after retrain: $fsck")
    } finally {
      Knn.dropIvfIndex(spark, "t_rt_a")
      Knn.dropIvfIndex(spark, "t_rt_b")
    }
  }

  test("IVF retrain recall re-gate: a drifted corpus's recall is restored by re-training the model") {
    // the MOTIVATION leg (VERDICT r14 #4): a corpus clustered far from
    // the frozen model's training distribution splits clusters across
    // cells and same-cell recall decays; retraining on the true
    // centers restores it. Fully deterministic synthetic fixture:
    // 4 tight clusters on orthogonal axes; the STALE model's centroids
    // are the pairwise cluster midpoints, so each cluster's members
    // split between two cells by jitter sign.
    // Each cluster j sweeps an angular gradient on its own axis pair
    // (dims 2j, 2j+1): theta_k = 4k - 38.8 degrees, so the cluster
    // crosses theta = 0 between k=9 and k=10. The STALE model has two
    // centroids per cluster at theta = ±45°, splitting every cluster
    // at theta = 0 — a query next to the boundary provably loses
    // same-cluster neighbors on the other side. The TRUE model has one
    // centroid per cluster at theta = 0: the whole cluster shares a
    // cell and recall is exact. Cross-cluster cosines are 0 (disjoint
    // axis pairs), so nothing interferes.
    val dim = 8
    val points = for { j <- 0 until 4; k <- 0 until 20 } yield {
      val theta = math.toRadians(4.0 * k - 38.8)
      val v = Array.fill(dim)(0.0f)
      v(2 * j) = (5.0 * math.cos(theta)).toFloat
      v(2 * j + 1) = (5.0 * math.sin(theta)).toFloat
      (j * 100L + k, v.toSeq)
    }
    val corpus = points.toDF("vec_id", "embedding")
    def centroidDf(cs: Seq[(Long, Seq[Double])]) = {
      val df = cs.toDF("c_id", "cv")
      df.withColumn("cn", sqrt(Knn.dot(col("cv"), col("cv"))))
    }
    val trueModel = centroidDf(
      (0 until 4).map(j => (j.toLong, Seq.tabulate(dim)(d => if (d == 2 * j) 1.0 else 0.0))))
    val staleModel = centroidDf(
      for { j <- 0 until 4; s <- Seq(1, -1) } yield (
        (10 + 2 * j + (1 - s) / 2).toLong,
        Seq.tabulate(dim)(d =>
          if (d == 2 * j) math.cos(math.toRadians(45.0))
          else if (d == 2 * j + 1) s * math.sin(math.toRadians(45.0))
          else 0.0)))
    // queries = the two boundary-adjacent points of each cluster — the
    // ones whose nearest neighbors straddle the stale split
    val queries = corpus.filter(col("vec_id") % 100 === 9 || col("vec_id") % 100 === 10)
    val truth = Knn.bruteTopK(queries, corpus, "vec_id", "embedding", 3)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toSet
    def recall(n: String): Double = {
      val got = Knn.ivfTopK(spark, n, queries, "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_rtr").toString
    try {
      Knn.writeIvfIndex(corpus, staleModel, "vec_id", "embedding", "t_rtr_a", dir, buckets = 4)
      val recallStale = recall("t_rtr_a")
      Knn.retrainIvfIndex(spark, "t_rtr_a", trueModel)
      val recallTrue = recall("t_rtr_a")
      info(s"recall stale=$recallStale retrained=$recallTrue")
      assert(recallTrue >= 0.95, s"retrained recall $recallTrue below the gate")
      assert(recallTrue > recallStale + 0.1,
        s"fixture must demonstrate the recall motivation: stale=$recallStale retrained=$recallTrue")
    } finally Knn.dropIvfIndex(spark, "t_rtr_a")
  }

  test("IVF bucket-scoped compaction: only fragmented cell buckets rewritten; per-bucket tombstone accounting is exact") {
    // VERDICT r14 #1, vector side. Unlike postings (a doc spans many
    // term buckets) an IVF vector lives in ONE cell bucket, so a
    // bucket rewrite fully drops its tombstoned vectors and those ids
    // may leave the set while the rest stay.
    import graft.sources.Layout
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfb").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfb").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val queries = emb.filter(col("vec_id") < 3)
    def topK(n: String) = Knn.ivfTopK(spark, n, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfb_a", dirA, buckets = 4)
      // tiny append: 3 vectors land in <= 3 cells -> <= 3 of 4 buckets fragment
      Knn.appendIvfBatch(
        emb.filter(col("vec_id").isin(9L, 11L, 13L)), "vec_id", "embedding", "t_ivfb_a", batchId = 1L)
      val frag = Layout.fragmentedBucketIds(spark, "t_ivfb_a_ivf", 1)
      assert(frag.nonEmpty && frag.size < 4, s"fixture should fragment a strict subset of buckets, got $frag")
      val inTouched = spark.read
        .parquet(Layout.bucketFiles(spark, "t_ivfb_a_ivf", frag.toSet): _*)
        .select(col("n_id")).as[Long].collect().toSet
      assert(inTouched.contains(9L), "appended vector must sit in a touched bucket")
      // one deleted id per accounting class: 9 (touched bucket — must
      // clear), plus an id provably in an UNTOUCHED bucket (must stay)
      val untouchedIds = Knn.ivfTable(spark, "t_ivfb_a")
        .select(col("n_id")).as[Long].collect().toSet -- inTouched
      assert(untouchedIds.nonEmpty, "fixture needs vectors in untouched buckets")
      val stayId = untouchedIds.min
      Knn.deleteIvfBatch(
        Seq(9L, stayId).toDF("vec_id"), "vec_id", "t_ivfb_a", batchId = 2L)
      // fresh survivor build: frozen model, corpus minus both deletions
      Knn.writeIvfIndex(
        emb.filter(
          (col("vec_id") % 2 === 0 || col("vec_id").isin(9L, 11L, 13L)) &&
            !col("vec_id").isin(9L, stayId)),
        cents, "vec_id", "embedding", "t_ivfb_b", dirB, buckets = 4)

      assert(Knn.compactFragmentedIvfBuckets(spark, "t_ivfb_a", 1) == frag)
      // per-bucket accounting: 9 left the set, stayId remains
      val tombsNow = spark.table("t_ivfb_a_ivftombs").select(col("vec_id")).as[Long].collect().toSet
      assert(tombsNow == Set(stayId),
        s"expected only the untouched-bucket tombstone to remain, got $tombsNow")
      // reads equal the fresh survivor build; fsck green; no-op at rest
      assert(Knn.liveIvf(spark, "t_ivfb_a")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSet ==
        Knn.liveIvf(spark, "t_ivfb_b").select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSet)
      assert(topK("t_ivfb_a") == topK("t_ivfb_b") && topK("t_ivfb_a").nonEmpty)
      val fsck = Knn.checkIvfIndex(spark, "t_ivfb_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after bucket-scoped IVF compaction: $fsck")
      assert(Knn.compactFragmentedIvfBuckets(spark, "t_ivfb_a", 1).isEmpty)
      // a later full compaction drops the remaining tombstone and
      // still equals the fresh survivor build
      Knn.compactIvfIndex(spark, "t_ivfb_a")
      assert(spark.table("t_ivfb_a_ivftombs").count() == 0)
      assert(Knn.ivfTable(spark, "t_ivfb_a")
        .select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSet ==
        Knn.ivfTable(spark, "t_ivfb_b").select(col("cell"), col("n_id")).as[(Long, Long)].collect().toSet)
    } finally {
      Knn.dropIvfIndex(spark, "t_ivfb_a")
      Knn.dropIvfIndex(spark, "t_ivfb_b")
    }
  }

  test("IVF tombstone retirement: only the tombstoned vectors' cell buckets rewritten, set cleared, re-ingest allowed") {
    // Round 15: the tombstone-pressure trigger costs the TOUCHED cell
    // buckets, never a generation rewrite — and unlike the
    // fragmentation path, retirement selects buckets by TRACE (where
    // the tombstoned vectors physically sit), so a clean-file delete
    // retires without touching fragmented-but-trace-free buckets.
    import graft.sources.Layout
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfr").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfr").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val queries = emb.filter(col("vec_id") < 3)
    def topK(n: String) = Knn.ivfTopK(spark, n, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    def files(table: String): Map[String, Long] = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      new java.io.File(meta.location).listFiles.toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length).toMap
    }
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfr_a", dirA, buckets = 4)
      Knn.deleteIvfBatch(Seq(10L, 12L).toDF("vec_id"), "vec_id", "t_ivfr_a", batchId = 1L)
      val before = files("t_ivfr_a_ivf")
      // expected touched buckets: the two vectors' cells' buckets,
      // computed from the index rows + bucketIdExpr
      val expected = Knn.ivfTable(spark, "t_ivfr_a")
        .filter(col("n_id").isin(10L, 12L))
        .select(Layout.bucketIdExpr(col("cell"), 4)).as[Int].collect().toSet
      assert(expected.nonEmpty && expected.size < 4,
        s"fixture should touch a strict subset of buckets, got $expected")

      val rewritten = Knn.retireIvfTombstones(spark, "t_ivfr_a")
      assert(rewritten.toSet == expected,
        s"retirement rewrote $rewritten, traces live in $expected")
      val after = files("t_ivfr_a_ivf")
      val untouched = before.keySet.filterNot(n => Layout.bucketIdOf(n).exists(expected))
      assert(untouched.forall(n => after.get(n) == before.get(n)),
        "IVF retirement perturbed an untouched bucket's files")
      assert(spark.table("t_ivfr_a_ivftombs").count() == 0)
      assert(Knn.ivfTable(spark, "t_ivfr_a").filter(col("n_id").isin(10L, 12L)).isEmpty)

      // reads equal a fresh survivor build under the same frozen model
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0 && !col("vec_id").isin(10L, 12L)),
        cents, "vec_id", "embedding", "t_ivfr_b", dirB, buckets = 4)
      assert(topK("t_ivfr_a") == topK("t_ivfr_b") && topK("t_ivfr_a").nonEmpty)
      val fsck = Knn.checkIvfIndex(spark, "t_ivfr_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after IVF retirement: $fsck")

      // no-op at rest; post-clear re-ingest allowed
      assert(Knn.retireIvfTombstones(spark, "t_ivfr_a").isEmpty)
      Knn.appendIvfBatch(
        emb.filter(col("vec_id") === 10L), "vec_id", "embedding", "t_ivfr_a", batchId = 2L)
      assert(!Knn.ivfTable(spark, "t_ivfr_a").filter(col("n_id") === 10L).isEmpty,
        "retired vector invisible after re-ingest")
    } finally {
      Knn.dropIvfIndex(spark, "t_ivfr_a")
      Knn.dropIvfIndex(spark, "t_ivfr_b")
    }
  }

  test("rebucketIvfIndex: 4→16 migration ≡ fresh survivor build; model frozen, masks retired, maintenance under the new spec") {
    // Round 16 (VERDICT r15 #2), vector side: the cell-bucket count is
    // frozen at writeIvfIndex time — rebucketIvfIndex migrates it as
    // one generation swap. Pins: migrated table == fresh survivor
    // build at the new count bit-for-bit (same stored doubles — the
    // rewrite never recomputes nv/nn), reads identical, tombstones
    // dropped + set cleared (old-modulus cb masks retire with it),
    // replay no-op, and a post-migration vector-carrying delete masks
    // under the NEW modulus so retirement stays scan-free.
    import graft.sources.Layout
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfrbk").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfrbk").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val queries = emb.filter(col("vec_id") < 3)
    def rows(n: String) = Knn.ivfTable(spark, n)
      .select(col("cell"), col("n_id"), col("nn")).as[(Long, Long, Double)].collect().toSet
    def topK(n: String) = Knn.ivfTopK(spark, n, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfrbk_a", dirA, buckets = 4)
      Knn.appendIvfBatch(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", "t_ivfrbk_a", batchId = 1L)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id"), col("embedding")),
        "vec_id", "t_ivfrbk_a", batchId = 2L, vecCol = Some("embedding"))
      Knn.rebucketIvfIndex(spark, "t_ivfrbk_a", newBuckets = 16)

      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 9 =!= 2), cents, "vec_id", "embedding", "t_ivfrbk_b", dirB, buckets = 16)
      assert(rows("t_ivfrbk_a") == rows("t_ivfrbk_b"), "migrated ivf != fresh survivor build")
      assert(topK("t_ivfrbk_a") == topK("t_ivfrbk_b") && topK("t_ivfrbk_a").nonEmpty)
      assert(Layout.numBuckets(spark, "t_ivfrbk_a_ivf") == 16)
      assert(spark.table("t_ivfrbk_a_ivftombs").count() == 0,
        "migration must clear the tombstone set (and its old-modulus masks)")

      // replayed batch ids stay no-ops; post-migration delete masks
      // under the new 16-bucket modulus and retirement is fsck-green
      val before = rows("t_ivfrbk_a")
      Knn.appendIvfBatch(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", "t_ivfrbk_a", batchId = 1L)
      assert(rows("t_ivfrbk_a") == before, "replayed append re-applied after rebucket")
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 4).select(col("vec_id"), col("embedding")),
        "vec_id", "t_ivfrbk_a", batchId = 3L, vecCol = Some("embedding"))
      val masks = spark.table("t_ivfrbk_a_ivftombs").filter(col("cb").isNotNull)
        .select(explode(col("cb"))).as[Int].collect()
      assert(masks.nonEmpty && masks.forall(b => b >= 0 && b < 16),
        "post-migration delete masks must be computed under the new bucket count")
      Knn.retireIvfTombstones(spark, "t_ivfrbk_a")
      val fsck = Knn.checkIvfIndex(spark, "t_ivfrbk_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck.values.forall(identity), s"fsck red after post-migration retirement: $fsck")

      // the scheduler-facing policy form: the metadata probe no-ops
      // under a generous per-bucket byte bound, migrates 16 → 64 under
      // a bytes/20 bound, and is idempotent at the new count
      val bytes = Layout.parquetBytes(spark, "t_ivfrbk_a_ivf")
      assert(Knn.rebucketIvfIfOvergrown(spark, "t_ivfrbk_a", maxBytesPerBucket = bytes).isEmpty)
      assert(Knn.rebucketIvfIfOvergrown(spark, "t_ivfrbk_a", maxBytesPerBucket = bytes / 20)
        .contains(64), "policy should migrate 16 -> 64 under a bytes/20 bound")
      assert(Layout.numBuckets(spark, "t_ivfrbk_a_ivf") == 64)
      // idempotence keyed off POST-migration bytes (per-file overhead
      // of 64 tiny files makes the pre-migration count unstable)
      val bytes64 = Layout.parquetBytes(spark, "t_ivfrbk_a_ivf")
      assert(Knn.rebucketIvfIfOvergrown(spark, "t_ivfrbk_a", maxBytesPerBucket = bytes64 / 20).isEmpty)
    } finally {
      Knn.dropIvfIndex(spark, "t_ivfrbk_a")
      Knn.dropIvfIndex(spark, "t_ivfrbk_b")
    }
  }

  test("IVF tombstone joins above the broadcast size gate: retirement and reads answer identically un-hinted") {
    // Round 16 (VERDICT r15 #3) — the vector-side twin of the postings
    // broadcast-gate leg: with spark.graft.tombstoneBroadcastBytes = 0
    // and auto-broadcast off, the live view, masked retirement, and
    // the re-ingest guard all run un-hinted joins and reach the same
    // physical state and answers.
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfbg").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val queries = emb.filter(col("vec_id") < 3)
    def topK() = Knn.ivfTopK(spark, "t_ivfbg_a", queries, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfbg_a", dirA, buckets = 4)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id").isin(10L, 12L)).select(col("vec_id"), col("embedding")),
        "vec_id", "t_ivfbg_a", batchId = 1L, vecCol = Some("embedding"))
      val hinted = topK()
      spark.conf.set("spark.graft.tombstoneBroadcastBytes", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = Knn.liveIvf(spark, "t_ivfbg_a").queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
          s"gate shut but the IVF tombstone anti-join still broadcasts:\n$plan")
        assert(topK() == hinted, "un-hinted IVF live read diverged from the broadcast plan")
        Knn.retireIvfTombstones(spark, "t_ivfbg_a")
        assert(topK() == hinted, "IVF retirement through the un-hinted path changed answers")
        assert(spark.table("t_ivfbg_a_ivftombs").count() == 0)
        assert(Knn.ivfTable(spark, "t_ivfbg_a").filter(col("n_id").isin(10L, 12L)).isEmpty)
      } finally {
        spark.conf.unset("spark.graft.tombstoneBroadcastBytes")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    } finally Knn.dropIvfIndex(spark, "t_ivfbg_a")
  }

  test("IVF delete-time cell-bucket masks: scan-free retirement equals the trace-scan answer; wrong-vector masks are fsck-detected and repair-healed") {
    // Round 15 seam closed: a vector-carrying delete computes its cell
    // under the FROZEN model (the same pure per-row function appends
    // use) and stores the cell's bucket on the tombstone row — so
    // retirement's touched set comes from the slim set alone, no ivf
    // scan. The mask rides the same caller contract as the delete
    // itself; the wrong-vector edge is fsck-detectable
    // (tombstone_mask_covers_trace) and repair-healable (masks nulled →
    // trace-scan fallback), pinned below.
    import graft.sources.Layout
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfmk").toString
    val dirC = java.nio.file.Files.createTempDirectory("graft_ivfmk").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfk_a", dirA, buckets = 4)
      // vector-carrying delete → masks stored, non-null
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id").isin(10L, 12L)).select(col("vec_id"), col("embedding")),
        "vec_id", "t_ivfk_a", batchId = 1L, vecCol = Some("embedding"))
      val masks = spark.table("t_ivfk_a_ivftombs").select(col("cb")).collect()
      assert(masks.nonEmpty && masks.forall(!_.isNullAt(0)), "vector-carrying delete must store masks")
      // the mask equals the trace-scan answer (the always-correct path)
      val traced = Knn.ivfTable(spark, "t_ivfk_a")
        .filter(col("n_id").isin(10L, 12L))
        .select(Layout.bucketIdExpr(col("cell"), 4)).as[Int].collect().toSet
      val stored = spark.table("t_ivfk_a_ivftombs")
        .select(explode(col("cb"))).as[Int].collect().toSet
      assert(stored == traced, s"stored masks $stored != trace-scan buckets $traced")
      val fsck0 = Knn.checkIvfIndex(spark, "t_ivfk_a")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck0.get("tombstone_mask_covers_trace").contains(true))

      // scan-free retirement lands on exactly those buckets
      val rewritten = Knn.retireIvfTombstones(spark, "t_ivfk_a")
      assert(rewritten.toSet == traced, s"mask-path retirement rewrote $rewritten, expected $traced")
      assert(Knn.ivfTable(spark, "t_ivfk_a").filter(col("n_id").isin(10L, 12L)).isEmpty)
      assert(spark.table("t_ivfk_a_ivftombs").count() == 0)

      // the WRONG-VECTOR edge: delete vec X passing a vector from a
      // DIFFERENT cell bucket — fsck goes red, repair nulls the mask,
      // retirement trace-scans and still drops the right rows
      val buckets = Knn.ivfTable(spark, "t_ivfk_a")
        .select(col("n_id"), Layout.bucketIdExpr(col("cell"), 4).as("b"))
        .as[(Long, Int)].collect().toMap
      val (victim, donor) = {
        val pairs = for {
          (v, bv) <- buckets.toSeq; (d, bd) <- buckets.toSeq
          if v != d && bv != bd
        } yield (v, d)
        pairs.head
      }
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfk_c", dirC, buckets = 4)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") === donor)
          .select(lit(victim).cast("long").as("vec_id"), col("embedding")),
        "vec_id", "t_ivfk_c", batchId = 1L, vecCol = Some("embedding"))
      val fsck1 = Knn.checkIvfIndex(spark, "t_ivfk_c")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(fsck1.get("tombstone_mask_covers_trace").contains(false),
        "fsck must detect a mask that misses the vector's physical bucket")
      val repairs = Knn.repairIvfIndex(spark, "t_ivfk_c")
        .select("repair", "applied").as[(String, Boolean)].collect().toMap
      assert(repairs.get("tombstone_mask_reset").contains(true))
      assert(spark.table("t_ivfk_c_ivftombs").filter(col("cb").isNotNull).isEmpty,
        "repair must null the wrong masks")
      val fsck2 = Knn.checkIvfIndex(spark, "t_ivfk_c")
        .select("check", "ok").as[(String, Boolean)].collect().toMap
      assert(!fsck2.contains("tombstone_mask_covers_trace") ||
        fsck2("tombstone_mask_covers_trace"),
        "fsck still red after the mask repair")
      val rewrittenC = Knn.retireIvfTombstones(spark, "t_ivfk_c")
      assert(rewrittenC.toSet == Set(buckets(victim)),
        "healed retirement must trace-scan to the victim's REAL bucket")
      assert(Knn.ivfTable(spark, "t_ivfk_c").filter(col("n_id") === victim).isEmpty,
        "the deleted vector must be physically gone after the healed retirement")
    } finally {
      Knn.dropIvfIndex(spark, "t_ivfk_a")
      Knn.dropIvfIndex(spark, "t_ivfk_c")
    }
  }

  test("IVF marker spaces: append and delete streams share the log with independent batch ids; guards refuse tombstoned ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfm").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    try {
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), cents, "vec_id", "embedding", "t_ivfm_a", dir, buckets = 4)
      // an APPEND committed under batch id 0...
      Knn.appendIvfBatch(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", "t_ivfm_a", batchId = 0L)
      // ...must NOT swallow a DELETE stream's own batch id 0 (pre-r14
      // the two shared one undifferentiated ivfmarkers log, so this
      // delete was silently skipped — a lost vector deletion)
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", "t_ivfm_a", batchId = 0L)
      assert(spark.table("t_ivfm_a_ivftombs").count() > 0,
        "delete batch swallowed by an append marker with the same id")
      assert(Knn.liveIvf(spark, "t_ivfm_a").filter(col("n_id") % 9 === 2).count() == 0)
      // and the delete's marker must not swallow a later APPEND id 2
      // ... nor may a replay of either re-apply
      val tombs = spark.table("t_ivfm_a_ivftombs").count()
      Knn.deleteIvfBatch(
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")), "vec_id", "t_ivfm_a", batchId = 0L)
      assert(spark.table("t_ivfm_a_ivftombs").count() == tombs, "delete replay re-applied")
      // enforced caller contract: a still-tombstoned vector refuses
      // re-append (reads would hide it) and re-delete from a
      // DIFFERENT batch (double-delete)
      val eA = intercept[IllegalArgumentException](
        Knn.appendIvfBatch(
          emb.filter(col("vec_id") === 2), "vec_id", "embedding", "t_ivfm_a", batchId = 3L))
      assert(eA.getMessage.contains("tombstone"))
      val eD = intercept[IllegalArgumentException](
        Knn.deleteIvfBatch(
          emb.filter(col("vec_id") === 2).select(col("vec_id")), "vec_id", "t_ivfm_a", batchId = 4L))
      assert(eD.getMessage.contains("tombstone"))
      // refusals wrote nothing: tombstones and markers undisturbed
      assert(spark.table("t_ivfm_a_ivftombs").count() == tombs)
      // a NON-tombstoned append still applies while the set is live
      Knn.appendIvfBatch(
        Seq((100000L, Seq.fill(64)(0.5f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", "t_ivfm_a", batchId = 5L)
      assert(Knn.liveIvf(spark, "t_ivfm_a").filter(col("n_id") === 100000L).count() == 1)
    } finally Knn.dropIvfIndex(spark, "t_ivfm_a")
  }

  test("IVF streaming DELETION maintenance: tombstone micro-batches mirror the posting index's stream twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfsd").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfsd").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivfsd_ckpt").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb
      .select(col("vec_id"), Knn.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val dead = emb.filter(col("vec_id") % 9 === 2).select(col("vec_id"))
      .as[Long].collect().toSeq.sorted
    val (deadA, deadB) = dead.splitAt(dead.size / 2)
    val queries = emb.filter(col("vec_id") < 3)
    def topK(n: String) = Knn.ivfTopK(spark, n, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    try {
      Knn.writeIvfIndex(emb, cents, "vec_id", "embedding", "t_ivfsd_a", dirA, buckets = 4)
      // fresh survivor build under the same frozen model
      Knn.writeIvfIndex(
        emb.filter(col("vec_id") % 9 =!= 2), cents, "vec_id", "embedding", "t_ivfsd_b", dirB, buckets = 4)
      val stream = MemoryStream[Long]
      val q = Knn
        .maintainIvfDeletesFromStream(stream.toDF().toDF("vec_id"), "vec_id", "t_ivfsd_a")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        stream.addData(deadA); q.processAllAvailable()
        stream.addData(deadB); q.processAllAvailable()
        assert(topK("t_ivfsd_a") == topK("t_ivfsd_b") && topK("t_ivfsd_a").nonEmpty,
          "stream-deleted IVF index diverged from a fresh build over survivors")
        // replay of a committed delete batch id is a whole-batch no-op
        val tombs = spark.table("t_ivfsd_a_ivftombs").count()
        Knn.deleteIvfBatch(deadA.toDF("vec_id"), "vec_id", "t_ivfsd_a", batchId = 0L)
        assert(spark.table("t_ivfsd_a_ivftombs").count() == tombs)
        // an APPEND with the same batch id 0 (its own stream's
        // zero-based ids) still applies — kind-separated marker spaces
        Knn.appendIvfBatch(
          Seq((100001L, Seq.fill(64)(0.25f))).toDF("vec_id", "embedding"),
          "vec_id", "embedding", "t_ivfsd_a", batchId = 0L)
        assert(Knn.liveIvf(spark, "t_ivfsd_a").filter(col("n_id") === 100001L).count() == 1,
          "append with a batch id already used by the delete stream was wrongly skipped")
      } finally q.stop()
    } finally {
      Knn.dropIvfIndex(spark, "t_ivfsd_a")
      Knn.dropIvfIndex(spark, "t_ivfsd_b")
    }
  }
}
