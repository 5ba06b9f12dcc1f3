package graft

import graft.functions.{ShingleExpressions, TextAnalysis, VectorExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL surface of the native kernel (plans.SqlFunctions): every
  * `graft_*` function must be value-identical to its Column-API twin,
  * and literal-parameter misuse must fail with the named error, not a
  * codegen crash.
  */
class SqlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"))
  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def same(a: DataFrame, b: DataFrame, what: String): Unit = {
    val xs = a.collect().map(_.toString).sorted.toSeq
    val ys = b.collect().map(_.toString).sorted.toSeq
    assert(xs == ys, s"$what: SQL and Column API disagree")
    assert(xs.nonEmpty, s"$what: empty comparison proves nothing")
  }

  test("scalar string/token functions match the Column API") {
    docs.createOrReplaceTempView("sqlfn_docs")
    same(
      spark.sql("SELECT doc_id, graft_hash60(text) AS h FROM sqlfn_docs"),
      docs.select(col("doc_id"), VectorExpressions.hash60(col("text")).as("h")),
      "graft_hash60")
    same(
      spark.sql("SELECT doc_id, graft_tokenize(text) AS t FROM sqlfn_docs"),
      docs.select(col("doc_id"), ShingleExpressions.tokenize(col("text")).as("t")),
      "graft_tokenize")
    same(
      spark.sql("SELECT doc_id, graft_token_count(text) AS n FROM sqlfn_docs"),
      docs.select(col("doc_id"), ShingleExpressions.tokenCount(col("text")).as("n")),
      "graft_token_count")
    same(
      spark.sql("SELECT doc_id, graft_simhash60(graft_tokenize(text)) AS s FROM sqlfn_docs"),
      docs.select(
        col("doc_id"),
        ShingleExpressions.simhash60(ShingleExpressions.tokenize(col("text"))).as("s")),
      "graft_simhash60")
    same(
      spark.sql("SELECT doc_id, graft_collapse_runs(graft_tokenize(text)) AS c FROM sqlfn_docs"),
      docs.select(
        col("doc_id"),
        ShingleExpressions.collapseRuns(ShingleExpressions.tokenize(col("text"))).as("c")),
      "graft_collapse_runs")
  }

  test("shingle/minhash/tf functions with literal parameters match the Column API") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val toks = TextAnalysis.tokens(col("text"))
    same(
      spark.sql("SELECT doc_id, graft_shingle_hash60(graft_tokenize(text), 3) AS s FROM sqlfn_docs"),
      docs.select(col("doc_id"), ShingleExpressions.shingleHashSet(toks, 3).as("s")),
      "graft_shingle_hash60")
    same(
      spark.sql("SELECT doc_id, graft_shingle_hashes(graft_tokenize(text), 3) AS s FROM sqlfn_docs"),
      docs.select(col("doc_id"), ShingleExpressions.shingleHashes(toks, 3).as("s")),
      "graft_shingle_hashes")
    same(
      spark.sql(
        "SELECT doc_id, graft_minhash_sig(graft_shingle_hash60(graft_tokenize(text), 3), 8) AS m FROM sqlfn_docs"),
      docs.select(
        col("doc_id"),
        ShingleExpressions.minhashSignature(ShingleExpressions.shingleHashSet(toks, 3), 8).as("m")),
      "graft_minhash_sig")
    same(
      spark.sql("SELECT doc_id, graft_tf_stats(graft_tokenize(text)) AS f FROM sqlfn_docs"),
      docs.select(col("doc_id"), ShingleExpressions.tfStats(toks).as("f")),
      "graft_tf_stats")
    same(
      spark.sql("SELECT doc_id, graft_term_counts(graft_tokenize(text)) AS tc FROM sqlfn_docs"),
      docs.select(col("doc_id"), ShingleExpressions.termCounts(toks).as("tc")),
      "graft_term_counts")
    same(
      spark.sql(
        "SELECT doc_id, graft_dup_run_stats(graft_shingle_hashes(graft_tokenize(text), 2)) AS d FROM sqlfn_docs"),
      docs.select(
        col("doc_id"),
        ShingleExpressions.dupRunStats(ShingleExpressions.shingleHashes(toks, 2)).as("d")),
      "graft_dup_run_stats")
  }

  test("intersect and dot-product kernels match the Column API") {
    docs.createOrReplaceTempView("sqlfn_docs")
    same(
      spark.sql(
        """SELECT a.doc_id AS id1, b.doc_id AS id2,
          |       graft_sorted_intersect_count(graft_shingle_hash60(graft_tokenize(a.text), 3),
          |                                    graft_shingle_hash60(graft_tokenize(b.text), 3)) AS o
          |FROM sqlfn_docs a JOIN sqlfn_docs b ON b.doc_id = a.doc_id + 1
          |WHERE a.doc_id < 20""".stripMargin),
      docs.as("a")
        .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .filter(col("a.doc_id") < 20)
        .select(
          col("a.doc_id").as("id1"),
          col("b.doc_id").as("id2"),
          ShingleExpressions.sortedIntersectCount(
            ShingleExpressions.shingleHashSet(TextAnalysis.tokens(col("a.text")), 3),
            ShingleExpressions.shingleHashSet(TextAnalysis.tokens(col("b.text")), 3)).as("o")),
      "graft_sorted_intersect_count")
    embs.createOrReplaceTempView("sqlfn_embs")
    same(
      spark.sql(
        """SELECT a.vec_id AS id1, b.vec_id AS id2,
          |       graft_dot_product(a.embedding, b.embedding) AS dp
          |FROM sqlfn_embs a JOIN sqlfn_embs b ON b.vec_id = a.vec_id + 1
          |WHERE a.vec_id < 20""".stripMargin),
      embs.as("a")
        .join(embs.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
        .filter(col("a.vec_id") < 20)
        .select(
          col("a.vec_id").as("id1"),
          col("b.vec_id").as("id2"),
          VectorExpressions.dotProduct(col("a.embedding"), col("b.embedding")).as("dp")),
      "graft_dot_product")
  }

  test("bounded intersect: exact above the floor, -1 only when provably below, SQL ≡ Column") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // direct kernel properties against the unbounded merge, random
    // sorted-distinct arrays + adversarial shapes (empty, disjoint,
    // identical, subset), every meaningful floor for each pair
    val rnd = new scala.util.Random(11)
    def arr(n: Int): Array[Long] =
      Array.fill(n)(rnd.nextInt(300).toLong).distinct.sorted
    val shapes: Seq[(Array[Long], Array[Long])] =
      Seq(
        (Array.empty[Long], Array.empty[Long]),
        (Array.empty[Long], arr(10)),
        (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),          // disjoint
        (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),          // identical
        (Array(1L, 2L, 3L, 4L, 5L), Array(2L, 4L))) ++   // subset
        Seq.fill(40)((arr(1 + rnd.nextInt(40)), arr(1 + rnd.nextInt(40))))
    shapes.foreach { case (a, b) =>
      val exact = graft.functions.ShingleOps.sortedIntersectCount(
        new GenericArrayData(a), new GenericArrayData(b))
      (0L to (math.max(a.length, b.length) + 2).toLong).foreach { req =>
        val got = graft.functions.ShingleOps.sortedIntersectAtLeast(
          new GenericArrayData(a), new GenericArrayData(b), req)
        if (exact >= req)
          assert(got == exact, s"req=$req exact=$exact got=$got (must be exact when reachable)")
        else
          assert(got == -1L || got == exact,
            s"req=$req exact=$exact got=$got (early exit may return -1, never a wrong count)")
      }
    }
    // SQL surface ≡ Column API on real shingle sets
    docs.createOrReplaceTempView("sqlfn_docs")
    same(
      spark.sql(
        """SELECT a.doc_id AS id1, b.doc_id AS id2,
          |       graft_sorted_intersect_at_least(graft_shingle_hash60(graft_tokenize(a.text), 3),
          |                                       graft_shingle_hash60(graft_tokenize(b.text), 3),
          |                                       5L) AS o
          |FROM sqlfn_docs a JOIN sqlfn_docs b ON b.doc_id = a.doc_id + 1
          |WHERE a.doc_id < 20""".stripMargin),
      docs.as("a")
        .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .filter(col("a.doc_id") < 20)
        .select(
          col("a.doc_id").as("id1"),
          col("b.doc_id").as("id2"),
          ShingleExpressions.sortedIntersectAtLeast(
            ShingleExpressions.shingleHashSet(TextAnalysis.tokens(col("a.text")), 3),
            ShingleExpressions.shingleHashSet(TextAnalysis.tokens(col("b.text")), 3),
            lit(5L)).as("o")),
      "graft_sorted_intersect_at_least")
  }

  test("non-literal codegen parameters fail with the named error") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hash60(graft_tokenize(text), doc_id) FROM sqlfn_docs").collect()
    }
    assert(err.getMessage.contains("graft_shingle_hash60"), s"unexpected error: ${err.getMessage}")
  }

  test("a pure-SQL workflow: registered views + kernel functions, zero Scala API") {
    // the end-to-end shape a spark.sql-only user runs: exact content
    // dedup accounting in one SQL statement over the registered views
    Tables.registerViews(spark, sfDir)
    val got = spark.sql(
      """SELECT source, COUNT(DISTINCT graft_hash60(text)) AS n_distinct, COUNT(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
      .as[(String, Long, Long)].collect()
    val twin = docs
      .join(spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        countDistinct(VectorExpressions.hash60(col("text"))).as("n_distinct"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty && got.toSeq == twin.toSeq)
  }

  test("proximity kernels match the Column API from pure SQL") {
    docs.createOrReplaceTempView("sqlfn_docs")
    // positions of two terms per doc, built the same way on both sides
    def posOf(term: String) =
      expr(s"sort_array(filter(transform(graft_tokenize(text), (t, i) -> IF(t = '$term', i + 1, -1)), p -> p > 0))")
    same(
      spark.sql(
        """SELECT doc_id,
          |       graft_pairs_within(pa, pb, 3L) AS n_near,
          |       graft_min_abs_gap(pa, pb) AS min_gap
          |FROM (SELECT doc_id,
          |             sort_array(filter(transform(graft_tokenize(text), (t, i) -> IF(t = 'vector', i + 1, -1)), p -> p > 0)) AS pa,
          |             sort_array(filter(transform(graft_tokenize(text), (t, i) -> IF(t = 'merge', i + 1, -1)), p -> p > 0)) AS pb
          |      FROM sqlfn_docs WHERE doc_id < 30)
          |WHERE size(pa) > 0 AND size(pb) > 0""".stripMargin),
      docs.filter(col("doc_id") < 30)
        .select(col("doc_id"), posOf("vector").as("pa"), posOf("merge").as("pb"))
        .filter(size(col("pa")) > 0 && size(col("pb")) > 0)
        .select(
          col("doc_id"),
          ShingleExpressions.sortedPairsWithin(col("pa"), col("pb"), lit(3L)).as("n_near"),
          ShingleExpressions.sortedMinAbsGap(col("pa"), col("pb")).as("min_gap")),
      "graft_pairs_within/graft_min_abs_gap")
  }

  test("the functions are documented (DESCRIBE FUNCTION)") {
    val desc = spark.sql("DESCRIBE FUNCTION graft_hash60").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("graft_hash60"))
  }
}
