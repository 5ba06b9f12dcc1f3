package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * All vector math is pure `Column` expressions — `zip_with` +
  * left-fold `aggregate` in double precision, a deterministic
  * sequential summation identical across engines (bit-exact vs the
  * DuckDB oracle's `list_reduce`).
  *
  * Scale design: `bruteTopK` is the exactness baseline (query-side
  * broadcast × corpus scan — fine for few queries, O(Q·N) at scale);
  * `bucketedTopK` is the scale path: a coarse IVF-style partition
  * (sign-bit cell) restricts each query to 1/2^bits of the corpus, and
  * the join is an equi-join on the cell key, so the corpus can be
  * pre-partitioned/bucketed by cell and never reshuffled per query.
  */
object Knn {

  /** Elementwise float→double cast (exact). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential dot product of two double arrays — a native codegen'd
    * Catalyst expression (graft.functions.DotProductExpr) with the same
    * left-to-right accumulation as the interpreted `zip_with` +
    * `aggregate` fold it replaces (see `dotFold`), so results are
    * bit-identical while the per-pair cost drops to a tight Java loop.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  /** The composable-built-ins form of `dot` (kept as the reference
    * semantics / fallback; interpreted lambdas, same result).
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit IVF cell over the first `bits` dimensions (1-based
    * element_at): deterministic coarse quantization into 2^bits cells.
    */
  def signCell(v: Column, bits: Int = 3): Column =
    (0 until bits)
      .map(j => when(element_at(v, j + 1) > 0, lit(1L << (bits - 1 - j))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact brute-force cosine top-k for each query vector. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("cv"))
    val scored = broadcast(q)
      .crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("cos"))
  }

  /** Multi-probe ANN: each query searches its own cell plus every cell
    * at Hamming distance 1 (nprobe = bits + 1) — the standard recall
    * knob for sign-LSH/IVF: vectors near a hyperplane land in adjacent
    * cells, and probing those recovers most of the loss while still
    * touching only (bits+1)/2^bits of the corpus.
    */
  def multiProbeTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 3): DataFrame = {
    val probes = (0 until bits).map(j => col("cell").bitwiseXOR(1L << j))
    val q = queries
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell", signCell(col("qv"), bits))
      .withColumn("probe", explode(array(col("cell") +: probes: _*)))
    val c = corpus.select(
      col(idCol).as("n_id"),
      asDouble(col(vecCol)).as("cv"),
      signCell(asDouble(col(vecCol)), bits).as("probe"))
    val scored = broadcast(q)
      .join(c, Seq("probe"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("cos"))
  }

  /** SemDeDup-style embedding dedup (Abbas et al. 2023): cluster the
    * corpus coarsely, then within each cluster drop every vector that
    * has a higher-priority (smaller-id) neighbor with cosine >=
    * threshold. Output: one row per vector with its cell and the
    * keep/drop decision.
    *
    * The within-cell self-join is the SemDeDup trick: pair cost falls
    * from O(N²) to O(Σ |cell|²), and the join is an equi-join on the
    * cell key, so a pre-partitioned corpus never reshuffles. With
    * sign-bit cells the cell count is 2^bits — fine for a demo corpus;
    * at 100 TB the cell key comes from a trained IVF coarse quantizer
    * (e07's k-means step) with ~√N centroids, which bounds both cell
    * width and join skew.
    */
  def semDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 3): DataFrame = {
    val b = corpus
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cell", signCell(col("v"), bits))
    val lhs = b.select(col("vec_id").as("a_id"), col("v").as("av"), col("cell"))
    val rhs = b.select(col("vec_id").as("b_id"), col("v").as("bv"), col("cell"))
    val dropped = lhs
      .join(rhs, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(cosine(col("av"), col("bv")) >= threshold)
      .select(col("b_id").as("drop_id"))
      .distinct()
    b.join(dropped, b("vec_id") === dropped("drop_id"), "left")
      .select(col("vec_id"), col("cell"), col("drop_id").isNull.as("is_kept"))
  }

  /** ANN: search only the query's sign-bit cell (IVF nprobe=1).
    * Recall trades against `bits`; candidates drop to ~N/2^bits.
    */
  def bucketedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 3): DataFrame = {
    val q = queries.select(
      col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qv"),
      signCell(asDouble(col(vecCol)), bits).as("cell"))
    val c = corpus.select(
      col(idCol).as("n_id"),
      asDouble(col(vecCol)).as("cv"),
      signCell(asDouble(col(vecCol)), bits).as("cell"))
    val scored = broadcast(q)
      .join(c, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("cell"), col("n_id"), col("rank"), col("cos"))
  }
}
