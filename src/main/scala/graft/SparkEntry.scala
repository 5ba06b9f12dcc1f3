package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory (SURVEY §2) instantiated
  * on the TPC-H-ish testdata; `oracleSql` holds the DuckDB-equivalent SQL
  * per query. Column names and row order are aligned on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's richest query — the dataset search form
    * (/root/reference/tantalus/forms.py:537-652): conjunctive tag
    * membership (relational division) composed with semi/anti joins.
    */
  def entry(spark: SparkSession): DataFrame =
    FilterJoinQueries.q11_division(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FilterJoinQueries.queries ++
      AggQueries.queries ++
      WindowQueries.queries ++
      SetScalarQueries.queries ++
      SearchQueries.queries ++
      PipelineQueries.queries ++
      ExtendedQueries.queries ++
      CorpusQueries.queries ++
      CurationQueries.queries ++
      TrainingQueries.queries ++
      SourceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    FilterJoinQueries.oracles ++
      AggQueries.oracles ++
      WindowQueries.oracles ++
      SetScalarQueries.oracles ++
      SearchQueries.oracles ++
      PipelineQueries.oracles ++
      ExtendedQueries.oracles ++
      CorpusQueries.oracles ++
      CurationQueries.oracles ++
      TrainingQueries.oracles ++
      SourceQueries.oracles
}
