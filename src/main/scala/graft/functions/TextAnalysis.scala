package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-corpus pipelines: tokenization,
  * word-shingling, quality metrics, language-ID scoring. All pure
  * `Column` expressions (no UDFs) — they stay inside whole-stage
  * codegen and push no closures to executors.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens of a trimmed string. */
  def tokens(c: Column): Column =
    ShingleExpressions.tokenize(c)

  /** Composable-built-ins twin of `tokens` (the oracle-shaped regex
    * form) — kept as the equality baseline the native one-pass
    * tokenizer is spec-checked against.
    */
  def tokensComposed(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= lit(""))

  /** Token count as long (BIGINT parity with SQL engines) — fused,
    * counts whitespace runs without materializing the token array.
    */
  def tokenCount(c: Column): Column =
    ShingleExpressions.tokenCount(c)

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token-array
    * column. Callers must project `tokens(...)` into a named column
    * first: Catalyst inlines (rather than CSEs) expression arguments
    * into lambda bodies, so passing `tokens(text)` directly here would
    * re-run the regex split once per element access — O(len²) per row.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles of a text column — convenience form for small
    * inputs; hot paths should materialize tokens and use
    * `shinglesFromTokens` (see that method's note).
    */
  def shingles(c: Column, n: Int): Column =
    shinglesFromTokens(tokens(c), n)

  /** BPE-style pre-tokenizer count: letter runs, digit runs, and
    * punctuation runs of the lower-cased text (the GPT-2 pre-tokenizer
    * shape, minus byte-level merges) — the standard cheap token-budget
    * estimator for LLM corpora.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(BpePattern), lit(0))).cast("long")

  /** Tokens that belong to the given vocabulary. */
  def tokensIn(c: Column, vocab: Seq[String]): Column =
    filter(tokens(c), t => t.isin(vocab.map(_.asInstanceOf[Any]): _*))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Stopword ratio — a standard quality-score component. */
  def stopwordRatio(c: Column): Column = {
    val n = size(tokens(c)).cast("double")
    when(n === 0, lit(0.0))
      .otherwise(size(tokensIn(c, EnglishStopwords)).cast("double") / n)
  }

  /** Ratio of non [a-z0-9 whitespace] characters in the lower-cased text. */
  def punctRatio(c: Column): Column = {
    val len = length(c).cast("double")
    when(len === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(lower(c), "[a-z0-9\\s]", "")).cast("double") / len)
  }

  /** Mean token length (0 for empty docs). Total token chars computed
    * as length-after-stripping-whitespace — identical in any dialect.
    */
  def meanTokenLength(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(trim(c), "\\s+", "")).cast("double") /
          size(toks).cast("double"))
  }

  /** Count of occurrences of a literal marker inside a string —
    * (len(s) - len(replace(s, m, ''))) / len(m); portable to any SQL
    * dialect, used by the language-ID heuristic.
    */
  def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(marker), ""))) /
      marker.length).cast("long")

  /** Marker vocabularies for the n-gram language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
  )

  /** Heuristic language-ID: argmax of per-language marker-occurrence
    * scores over the padded lower-cased text; deterministic first-wins
    * tie-break in `LangMarkers` order; "und" (undetermined) when no
    * marker hits.
    */
  def langId(c: Column): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrences(padded, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
