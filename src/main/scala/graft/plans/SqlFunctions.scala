package graft.plans

import graft.functions._
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the engine's native codegen'd expressions.
  *
  * The kernel (hash60, fused shingle hashing, MinHash/SimHash per-row
  * signatures, two-pointer intersect, tokenizer, per-doc tf statistics,
  * embedding dot product) was only reachable from the Scala Column API;
  * a user working through `spark.sql(...)` — the way most reference
  * users would drive an engine — had the relational operators but not
  * the custom functions. Registered here under a `graft_` prefix
  * (collision-proof against present and future Spark builtins) via
  * `SparkSessionExtensions.injectFunction`, so every engine session
  * (`Graft.session`, Verify, Bench) exposes them; value-identity with
  * the Column API is pinned by SqlFunctionsSpec.
  *
  * Literal-int parameters (shingle width n, signature size k) must be
  * foldable integer literals — they parameterize codegen, not per-row
  * data — and the builders reject anything else with a named error.
  */
object SqlFunctions {

  type Builder = Seq[Expression] => Expression

  private def litInt(name: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$name: $arg must be an INTEGER literal (it parameterizes codegen), got $other")
  }

  private def arity(name: String, n: Int, es: Seq[Expression]): Unit =
    require(es.length == n, s"$name expects $n argument(s), got ${es.length}")

  private def fn(name: String, usage: String)(b: Builder): (FunctionIdentifier, ExpressionInfo, Builder) =
    (
      FunctionIdentifier(name),
      new ExpressionInfo(
        SqlFunctions.getClass.getCanonicalName,
        null, name, usage, "", "", "", "", "", "", "built-in"),
      b)

  /** Every (name, info, builder) triple GraftExtensions registers. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    fn("graft_hash60", "graft_hash60(str) - 60-bit md5 content hash (DuckDB-reconstructable)") { es =>
      arity("graft_hash60", 1, es); Hash60Expr(es.head)
    },
    fn("graft_tokenize", "graft_tokenize(str) - whitespace tokens, empties dropped") { es =>
      arity("graft_tokenize", 1, es); TokenizeExpr(es.head)
    },
    fn("graft_token_count", "graft_token_count(str) - allocation-free whitespace token count") { es =>
      arity("graft_token_count", 1, es); TokenCountExpr(es.head)
    },
    fn(
      "graft_shingle_hash60",
      "graft_shingle_hash60(tokens, n) - sorted-distinct 60-bit n-gram shingle hash set") { es =>
      arity("graft_shingle_hash60", 2, es)
      ShingleHash60Expr(es.head, litInt("graft_shingle_hash60", "n", es(1)), distinctSorted = true)
    },
    fn(
      "graft_shingle_hashes",
      "graft_shingle_hashes(tokens, n) - position-ordered 60-bit n-gram hashes (winnowing)") { es =>
      arity("graft_shingle_hashes", 2, es)
      ShingleHash60Expr(es.head, litInt("graft_shingle_hashes", "n", es(1)), distinctSorted = false)
    },
    fn(
      "graft_minhash_sig",
      "graft_minhash_sig(set, k) - k-member per-row MinHash signature of a hashed shingle set") { es =>
      arity("graft_minhash_sig", 2, es)
      MinhashSigExpr(es.head, litInt("graft_minhash_sig", "k", es(1)))
    },
    fn("graft_simhash60", "graft_simhash60(tokens) - 60-bit SimHash (null on empty input)") { es =>
      arity("graft_simhash60", 1, es); Simhash60Expr(es.head)
    },
    fn(
      "graft_sorted_intersect_count",
      "graft_sorted_intersect_count(a, b) - two-pointer overlap count of sorted-distinct long arrays") { es =>
      arity("graft_sorted_intersect_count", 2, es); SortedIntersectCountExpr(es.head, es(1))
    },
    fn(
      "graft_sorted_intersect_at_least",
      "graft_sorted_intersect_at_least(a, b, min) - exact overlap count, or -1 once `min` is provably unreachable (early-exit verify merge)") { es =>
      arity("graft_sorted_intersect_at_least", 3, es)
      SortedIntersectAtLeastExpr(es.head, es(1), es(2))
    },
    fn("graft_collapse_runs", "graft_collapse_runs(arr) - collapse consecutive duplicate tokens") { es =>
      arity("graft_collapse_runs", 1, es); CollapseRunsExpr(es.head)
    },
    fn("graft_term_counts", "graft_term_counts(tokens) - per-row (term, tf) table, term-sorted") { es =>
      arity("graft_term_counts", 1, es); TermCountsExpr(es.head)
    },
    fn("graft_tf_stats", "graft_tf_stats(tokens) - per-row [n_tokens, n_types, max_tf]") { es =>
      arity("graft_tf_stats", 1, es); TfStatsExpr(es.head)
    },
    fn("graft_dup_run_stats", "graft_dup_run_stats(arr) - per-row [total, dup] duplicate-gram stats") { es =>
      arity("graft_dup_run_stats", 1, es); DupRunStatsExpr(es.head)
    },
    fn("graft_dot_product", "graft_dot_product(a, b) - float-array dot product (embedding kernel)") { es =>
      arity("graft_dot_product", 2, es); DotProductExpr(es.head, es(1))
    },
    fn(
      "graft_min_abs_gap",
      "graft_min_abs_gap(a, b) - two-pointer min |a_i - b_j| over sorted int position arrays (proximity)") { es =>
      arity("graft_min_abs_gap", 2, es); SortedMinAbsGapExpr(es.head, es(1))
    },
    fn(
      "graft_pairs_within",
      "graft_pairs_within(a, b, w) - count of position pairs within w over sorted int arrays (proximity)") { es =>
      arity("graft_pairs_within", 3, es); SortedPairsWithinExpr(es.head, es(1), es(2))
    })
}
