package graft.dedup

import graft.functions.{Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-corpus pipelines.
  *
  * Scale design: every method is a pure DataFrame transform whose only
  * wide stages are key-partitioned shuffles (shingle, band signature,
  * pair). Nothing collects to the driver, so the same plans run on a
  * 1000-executor cluster: candidate generation is always blocked
  * (inverted index or LSH band), never an n² cross join.
  */
object Dedup {

  /** Whitespace/case normalization applied before exact hashing. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact dedup by normalized-content hash: every row annotated with
    * its content hash, duplicate-group size, and the kept representative
    * (min id). Filter `is_kept` to materialize the deduplicated corpus.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    docs
      .withColumn("content_hash", md5(normalized(col(textCol))))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keeper", min(col(idCol)).over(w))
      .withColumn("is_kept", col(idCol) === col("keeper"))
  }

  /** Distinct word-n-gram shingle set, exploded to (id, shingle) rows —
    * the inverted-index representation all near-dup ops build on.
    * Documents with fewer than n tokens vanish (empty shingle set).
    */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(
      col(idCol),
      explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("s"))

  /** Exact n-gram Jaccard near-dup pairs (id1 < id2, jac >= threshold).
    * Candidate pairs are generated only for documents sharing at least
    * one shingle (inverted-index self-join) — the blocked alternative to
    * an all-pairs comparison.
    */
  def jaccardPairs(sh: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val inter = sh
      .as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id1"), col("n").as("n1")), "id1")
      .join(sizes.select(col(idCol).as("id2"), col("n").as("n2")), "id2")
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id1"), col("id2"), col("jac"))
  }

  /** MinHash signatures: k independent hash-family members over the
    * shingle set, min per (doc, i). One shuffle on (doc, i).
    */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int): DataFrame =
    sh.withColumn("i", explode(array((0 until k).map(lit): _*)))
      .withColumn("h", Hashing.hash60(concat(col("i").cast("string"), lit(":"), col("s"))))
      .groupBy(col(idCol), col("i"))
      .agg(min(col("h")).as("mh"))

  /** LSH banding: group signature rows into bands of `rowsPerBand`,
    * band key = ordered concat of the member min-hashes.
    */
  def lshBands(mh: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", floor(col("i") / rowsPerBand).cast("long"))
      .groupBy(col(idCol), col("band"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("i"), col("mh")))),
            x => x.getField("mh").cast("string")),
          "_").as("sig"))

  /** Candidate pairs = documents agreeing on at least one full band. */
  def lshCandidates(bands: DataFrame, idCol: String): DataFrame =
    bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    * candidates → exact-Jaccard verification of candidates only.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val sh    = shingleSet(docs, idCol, textCol, shingleN)
    val cand  = lshCandidates(lshBands(minhashSignatures(sh, idCol, k), idCol, rowsPerBand), idCol)
    val pairs = jaccardPairs(sh, idCol, threshold)
    // verify candidates with exact jaccard: semi-join the exact pairs
    pairs.join(cand, Seq("id1", "id2"), "left_semi")
  }

  /** 60-bit SimHash per document (token-frequency weighted). Bits 0-59
    * only, keeping the value positive in a signed 64-bit long on every
    * engine. Emits one row per document that has at least one token.
    */
  def simhash60(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("w"))
    tok
      .withColumn("h", Hashing.hash60(col("w")))
      .withColumn("j", explode(array((0 until 60).map(lit): _*)))
      .withColumn("bit", expr("CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("bit")).as("s"))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
          .as("simhash"))
  }
}
