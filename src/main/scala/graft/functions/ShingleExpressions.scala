package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Fused shingle-build + hash for the dedup hot path.
  *
  * The composable form materializes every shingle STRING
  * (`concat_ws(" ", t_i..t_{i+n-1})` — one UTF8String alloc + copy per
  * shingle) before hashing it, then runs `array_distinct` (per-row
  * hash set) and `array_sort` as separate interpreted steps. This
  * expression streams the token bytes straight into the (thread-cached)
  * MD5 digest with a single separator byte between tokens — the digest
  * of the joined string, without ever building it — and sorts/dedups
  * the longs with `java.util.Arrays.sort` in place. Values are
  * bit-identical to `hash60(concat_ws(" ", ...))` by construction
  * (MD5 is a streaming hash), which the oracle suite and DedupKnnSpec
  * prove end-to-end.
  *
  * Null token elements are skipped inside each window exactly like
  * `concat_ws` skips null arguments (separator only between present
  * tokens), so the expression stays total on any array<string> input,
  * not just `TextAnalysis.tokens` output. Documents with fewer than
  * `n` tokens hash to an empty array, matching the composed form's
  * `when(size >= n, ...).otherwise(array())` guard.
  */
case class ShingleHash60Expr(child: Expression, n: Int, distinctSorted: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType                   = ArrayType(LongType, containsNull = false)
  override def prettyName: String                   = "shingle_hash60"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.shingleHash60(v.asInstanceOf[ArrayData], n, distinctSorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingleHash60($c, $n, $distinctSorted)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleOps {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Space = ' '.toByte

  /** Per-position 60-bit shingle hashes of a token array; sorted
    * distinct set when `distinctSorted`. Codegen entry point.
    */
  def shingleHash60(toks: ArrayData, n: Int, distinctSorted: Boolean): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    // extract each token's bytes once (not once per covering shingle);
    // null elements stay null and are skipped per-window like concat_ws
    val tb = new Array[Array[Byte]](len)
    var i  = 0
    while (i < len) {
      val u = toks.getUTF8String(i)
      tb(i) = if (u == null) null else u.getBytes
      i += 1
    }
    val m   = len - n + 1
    val out = new Array[Long](m)
    val d   = digest.get()
    val blk = Md5Short.buffer()
    i = 0
    while (i < m) {
      // short shingles (the common case for small-n word shingles) fit
      // one MD5 block: assemble tokens + separators in the Md5Short
      // scratch and run a single compression; longer shingles stream
      // through MessageDigest — identical bits either way
      var bytes = 0
      var j     = 0
      var toks  = 0
      while (j < n) {
        val t = tb(i + j)
        if (t != null) { bytes += t.length; toks += 1 }
        j += 1
      }
      val total = bytes + (if (toks > 0) toks - 1 else 0)
      if (total <= Md5Short.MaxLen) {
        var p     = 0
        var wrote = false
        j = 0
        while (j < n) {
          val t = tb(i + j)
          if (t != null) {
            if (wrote) { blk(p) = Space; p += 1 }
            System.arraycopy(t, 0, blk, p, t.length)
            p += t.length
            wrote = true
          }
          j += 1
        }
        out(i) = Md5Short.first8(blk, p) >>> 4
      } else {
        d.reset()
        var wrote = false
        j = 0
        while (j < n) {
          val t = tb(i + j)
          if (t != null) {
            if (wrote) d.update(Space)
            d.update(t)
            wrote = true
          }
          j += 1
        }
        val h = d.digest()
        var x = 0L
        var b = 0
        while (b < 8) { x = (x << 8) | (h(b) & 0xffL); b += 1 }
        out(i) = x >>> 4
      }
      i += 1
    }
    if (!distinctSorted) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == m) out else java.util.Arrays.copyOf(out, w))
  }

  // "0:", "1:", ... seed prefixes, rendered once per family size
  private val seedPrefixes = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    seedPrefixes.computeIfAbsent(
      k,
      kk => Array.tabulate(kk)(i => (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.US_ASCII)))

  /** k seeded-minima MinHash signature of a pre-hashed shingle set
    * (codegen entry point). Empty set → empty array.
    */
  def minhashSignature(set: ArrayData, k: Int): ArrayData = {
    val n = set.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val pre = prefixes(k)
    val out = Array.fill(k)(Long.MaxValue)
    // "i:" + decimal shingle ≤ 23 bytes — always one MD5 block, so each
    // of the k × n probes is a single Md5Short compression (no
    // MessageDigest bookkeeping, no 16-byte digest alloc per probe)
    val blk = Md5Short.buffer()
    var j   = 0
    while (j < n) {
      val dec = java.lang.Long.toString(set.getLong(j))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      var i = 0
      while (i < k) {
        val p = pre(i)
        System.arraycopy(p, 0, blk, 0, p.length)
        System.arraycopy(dec, 0, blk, p.length, dec.length)
        val v = Md5Short.first8(blk, p.length + dec.length) >>> 4
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-row 60-bit SimHash (codegen entry point); null for empty
    * token arrays. Distinct tokens hashed once, weighted by count.
    */
  def simhash60(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]](n * 2)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val c = counts.get(t)
      if (c == null) counts.put(t, Array(1)) else c(0) += 1
      i += 1
    }
    val acc = new Array[Long](60)
    val it  = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // hash60Bytes takes the single-block Md5Short path for short
      // tokens (the overwhelming case) and streams longer ones
      val h = MinHashAgg.hash60Bytes(e.getKey.getBytes)
      val c = e.getValue()(0)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) acc(j) += c else acc(j) -= c
        j += 1
      }
    }
    var r = 0L
    var j = 0
    while (j < 60) { if (acc(j) > 0) r |= 1L << j; j += 1 }
    java.lang.Long.valueOf(r)
  }

  /** Two-pointer intersection count of sorted-distinct long arrays
    * (codegen entry point).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i  = 0
    var j  = 0
    var c  = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Threshold-aware two-pointer intersection count (codegen entry
    * point): exact count when it can still reach `minRequired`, else
    * -1 the moment `count-so-far + min(remaining_a, remaining_b)` —
    * a true upper bound on the final count — falls below it. For a
    * zero-overlap pair the abort fires within (na+nb) - 2*minRequired
    * steps (each miss step lowers the bound by one), so verify-join
    * merges over sub-threshold candidates — the overwhelming majority —
    * do ~1/3 of the full merge at jaccard t=0.5 instead of all of it.
    * Pairs that complete the merge return the EXACT count, so callers'
    * surviving rows are bit-identical to `sortedIntersectCount`.
    */
  /** Min |a_i - b_j| over sorted int arrays, two-pointer. -1 when either
    * array is empty (never occurs on posting rows: a posting exists only
    * for terms that occur).
    */
  def sortedMinAbsGap(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return -1L
    var i    = 0
    var j    = 0
    var best = Long.MaxValue
    while (i < na && j < nb) {
      val d  = a.getInt(i).toLong - b.getInt(j).toLong
      val ad = if (d < 0) -d else d
      if (ad < best) best = ad
      if (best == 0L) return 0L
      if (d < 0) i += 1 else j += 1
    }
    best
  }

  /** Count of pairs (i, j) with |a_i - b_j| <= w over sorted int
    * arrays. The [x-w, x+w] window over b only ever advances as x
    * grows, so the sweep is O(|a|+|b|) however many pairs qualify.
    */
  def sortedPairsWithin(a: ArrayData, b: ArrayData, w: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var lo = 0
    var hi = 0
    var c  = 0L
    var i  = 0
    while (i < na) {
      val x = a.getInt(i).toLong
      while (lo < nb && b.getInt(lo) < x - w) lo += 1
      if (hi < lo) hi = lo
      while (hi < nb && b.getInt(hi) <= x + w) hi += 1
      c += (hi - lo)
      i += 1
    }
    c
  }

  def sortedIntersectAtLeast(a: ArrayData, b: ArrayData, minRequired: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i  = 0
    var j  = 0
    var c  = 0L
    if ((if (na < nb) na else nb) < minRequired) return -1L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        val rem = if (na - i < nb - j) na - i else nb - j
        if (c + rem < minRequired) return -1L
      }
    }
    c
  }

  /** One-pass consecutive-duplicate collapse (codegen entry point).
    * Keeps index 0 unconditionally; keeps element i > 0 iff both it and
    * its predecessor are non-null AND differ (the lambda's three-valued
    * `=!=` semantics).
    */
  def collapseRuns(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n)
    var w   = 0
    var i   = 0
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val keep = i == 0 || (s != null && prev != null && !s.equals(prev))
      if (keep) { out(w) = s; w += 1 }
      prev = s
      i += 1
    }
    new GenericArrayData(if (w == n) out else java.util.Arrays.copyOf(out, w))
  }

  /** Java-regex default `\s`: space plus the 0x09–0x0D control run
    * (\t \n \x0B \f \r). All ASCII, so a byte-level scan cannot split
    * inside a multi-byte UTF-8 sequence.
    */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0d.toByte)

  /** One-pass whitespace tokenizer (codegen entry point): emits each
    * maximal non-whitespace byte run as a zero-copy slice of the
    * input's backing buffer.
    */
  def tokenize(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    // count runs first so the output array allocates exactly once
    val count = tokenCountBytes(b)
    if (count == 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](count.toInt)
    var w   = 0
    var i   = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      if (i > start) {
        out(w) = org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, i - start)
        w += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Allocation-free whitespace token count (codegen entry point). */
  def tokenCount(s: org.apache.spark.unsafe.types.UTF8String): Long =
    tokenCountBytes(s.getBytes)

  private def tokenCountBytes(b: Array[Byte]): Long = {
    var c    = 0L
    var i    = 0
    var inTk = false
    while (i < b.length) {
      val ws = isWs(b(i))
      if (!ws && !inTk) c += 1
      inTk = !ws
      i += 1
    }
    c
  }

  /** Duplicate-occurrence statistics of a long array (codegen entry
    * point): `[total, dup]` where `dup` sums the multiplicities of
    * values that occur at least twice. Sort + one run-length scan over
    * a copy of the row's own values — no per-value hash map.
    */
  def dupRunStats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array(0L, 0L))
    val a = arr.toLongArray() // fresh copy for every ArrayData impl
    java.util.Arrays.sort(a)
    var dup   = 0L
    var i     = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length && a(j) == a(i)) j += 1
      if (j - i >= 2) dup += (j - i)
      i = j
    }
    new GenericArrayData(Array(n.toLong, dup))
  }

  /** Per-row token-frequency summary `[n_tokens, n_types, max_tf]` of
    * a token array (codegen entry point) — the lambda-free reduction of
    * `termCounts` for consumers that never need the term strings (d22's
    * repetition metrics). Null elements are skipped like concat_ws.
    */
  def tfStats(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
    var total = 0L
    var i     = 0
    while (i < n) {
      val u = toks.getUTF8String(i)
      if (u != null) {
        total += 1L
        val cell = m.get(u)
        if (cell == null) m.put(u, Array(1L)) else cell(0) += 1L
      }
      i += 1
    }
    var maxTf = 0L
    val it    = m.values().iterator()
    while (it.hasNext) { val c = it.next()(0); if (c > maxTf) maxTf = c }
    new GenericArrayData(Array(total, m.size().toLong, maxTf))
  }

  /** Per-row term-frequency table of a token array, sorted by term
    * bytes (codegen entry point). One hash-map pass over the row's own
    * tokens; null elements are skipped like concat_ws skips null
    * arguments, so the expression stays total on any array<string>.
    */
  def termCounts(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val u = toks.getUTF8String(i)
      if (u != null) {
        val cell = m.get(u)
        if (cell == null) m.put(u, Array(1L)) else cell(0) += 1L
      }
      i += 1
    }
    val keys = m.keySet().toArray(new Array[org.apache.spark.unsafe.types.UTF8String](m.size()))
    // UTF8String.compareTo is unsigned byte order — the same total
    // order Spark's string sort uses, so downstream sorts agree
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[org.apache.spark.unsafe.types.UTF8String]())
    val out = new Array[AnyRef](keys.length)
    i = 0
    while (i < keys.length) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](keys(i), m.get(keys(i))(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-row MinHash signature over a pre-hashed shingle-set column:
  * the k running minima of the seeded family `hash60("i:" + decimal(s))`
  * in one JVM pass. The composable form evaluates k × |set| interpreted
  * lambda hops plus a string concat per member; here the "i:" prefixes
  * are rendered once per k and each shingle's decimal bytes once per
  * row, streamed into the thread-cached digest. Identical values to
  * `Dedup.minhashSignatures` / `MinHashAgg` by construction (same
  * seeded-string semantics the DuckDB oracle uses); rows with an empty
  * set return an empty array so stream filters keep their semantics.
  */
case class MinhashSigExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType                   = ArrayType(LongType, containsNull = false)
  override def prettyName: String                   = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.minhashSignature(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.minhashSignature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Consecutive-duplicate run collapse over a string array — the fused
  * form of `filter(arr, (x, i) => i === 0 || x =!= element_at(arr, i))`
  * (d43's stutter scrub): one JVM pass of adjacent UTF8String
  * comparisons instead of an interpreted lambda + element_at probe per
  * token. Exact lambda semantics preserved, including its three-valued
  * logic: index 0 is always kept, and when either neighbor is null the
  * `=!=` is null so the element drops.
  */
case class CollapseRunsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType                   = ArrayType(StringType, containsNull = true)
  override def prettyName: String                   = "collapse_runs"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.collapseRuns(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.collapseRuns($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row 60-bit SimHash of a token array — the shuffle-FREE form of
  * the `SimHashAgg` aggregation: the sketch is a pure function of the
  * document's own tokens, so computing it in the row projection
  * removes the (doc, token) explode+shuffle entirely. Identical
  * semantics: per token occurrence, bit j of `hash60(token)` adds ±1
  * to counter j; final bit j is set iff counter j > 0. Occurrences of
  * the same token are counted once and weighted (integer arithmetic —
  * same sums in any order), which also hashes each DISTINCT token once
  * instead of once per occurrence. Returns null for token-less docs so
  * callers can drop them, matching the aggregated form where such docs
  * never produce a sketch row.
  */
case class Simhash60Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType                   = LongType
  override def nullable: Boolean                    = true
  override def prettyName: String                   = "simhash60"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.simhash60(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sh")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $res = graft.functions.ShingleOps.simhash60($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $res).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection SIZE of two sorted-distinct long arrays — the fused
  * form of `size(array_intersect(a, b))` for the dedup verify joins.
  * The engine's shingle sets are sorted distinct by construction
  * (ShingleHash60Expr), so a two-pointer merge counts the overlap in
  * one pass with zero allocation, where the generic array_intersect
  * builds a hash set and materializes the intersection array per pair
  * only for `size` to throw it away. This expression runs once per
  * CANDIDATE pair — the hottest row count in the near-dup pipelines.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType                   = org.apache.spark.sql.types.LongType
  override def prettyName: String                   = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Threshold-aware variant of `SortedIntersectCountExpr` for verify
  * joins with a similarity floor: exact overlap when `>= minRequired`
  * is still reachable, -1 once the running upper bound
  * `seen + min(remaining)` proves it is not. The verify filter drops
  * -1 rows (they are provably sub-threshold), and every SURVIVING row
  * completed the full merge, so the output is bit-identical to the
  * unbounded expression — only dead candidates get cheaper.
  */
case class SortedIntersectAtLeastExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType), LongType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sorted_intersect_at_least"

  override def nullSafeEval(a: Any, b: Any, m: Any): Any =
    ShingleOps.sortedIntersectAtLeast(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, m) => s"graft.functions.ShingleOps.sortedIntersectAtLeast($a, $b, $m)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Minimum |a_i - b_j| over two SORTED int arrays (posting position
  * lists) — the proximity-search primitive. Two-pointer: O(|a|+|b|)
  * and zero allocation where the composable form
  * `array_min(flatten(transform(a, x -> transform(b, y -> abs(x-y)))))`
  * is O(|a|·|b|) and materializes the product. Runs once per doc with
  * all query terms present — the hot row count of a proximity ranker.
  */
case class SortedMinAbsGapExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType                   = org.apache.spark.sql.types.LongType
  override def prettyName: String                   = "sorted_min_abs_gap"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.sortedMinAbsGap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleOps.sortedMinAbsGap($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of pairs (i, j) with |a_i - b_j| <= w over two SORTED int
  * arrays — the "co-occurrences within a window" proximity score.
  * Monotone two-window sweep: lo/hi only ever advance, so the count is
  * O(|a|+|b|) regardless of how many pairs qualify, where the
  * composable flatten-filter form is O(|a|·|b|).
  */
case class SortedPairsWithinExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType), LongType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sorted_pairs_within"

  override def nullSafeEval(a: Any, b: Any, w: Any): Any =
    ShingleOps.sortedPairsWithin(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], w.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, w) => s"graft.functions.ShingleOps.sortedPairsWithin($a, $b, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Whitespace tokenization of a string — the fused form of
  * `filter(split(trim(c), "\\s+"), t => t =!= lit(""))`, the tokenizer
  * under every text-analysis and shingle path. One pass over the UTF-8
  * bytes emitting zero-copy slices of the input buffer, instead of a
  * regex engine pass + split-array allocation + a second filter pass.
  *
  * Equivalence (spec-proven): Java's default `\s` is exactly
  * `[ \t\n\x0B\f\r]` — six ASCII bytes, none of which can appear
  * inside a multi-byte UTF-8 sequence (continuation bytes are >= 0x80),
  * so maximal non-whitespace byte runs ARE the regex form's tokens;
  * leading/trailing runs and the `trim` wash out in the empty-string
  * filter. Unicode spaces (U+00A0 etc.) stay inside tokens in BOTH
  * forms.
  */
case class TokenizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType                   = ArrayType(StringType, containsNull = false)
  override def prettyName: String                   = "tokenize"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.tokenize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace token COUNT of a string — the fused form of
  * `size(tokenize(c)).cast("long")` that counts non-whitespace runs
  * without materializing the token array at all. Quality-score
  * predicates (token budget, stopword/punct ratios) call this per
  * document; at corpus scale the avoided allocation is one token
  * array per row.
  */
case class TokenCountExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType                   = LongType
  override def prettyName: String                   = "token_count"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.tokenCount(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Duplicate-occurrence statistics of a long-array column —
  * `[total, dup]` where `dup` sums the multiplicities of values
  * occurring at least twice. The fused, doc-LOCAL form of the
  * `explode(grams) → groupBy(doc, gram) → count → conditional sums`
  * pipeline behind Gopher-style duplicate-n-gram fractions: a row's
  * grams are a pure function of that row, so the whole statistic
  * computes with no exchange at all.
  */
case class DupRunStatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType                   = ArrayType(LongType, containsNull = false)
  override def prettyName: String                   = "dup_run_stats"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.dupRunStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.dupRunStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row token-frequency summary `[n_tokens, n_types, max_tf]` of a
  * token-array column — `termCounts` reduced in the same single pass
  * for consumers that never materialize the per-term table (repetition
  * / lexical-diversity metrics). Doc-local like `termCounts`: zero
  * exchanges, zero higher-order-function lambdas.
  */
case class TfStatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType                   = ArrayType(LongType, containsNull = false)
  override def prettyName: String                   = "tf_stats"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.tfStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.tfStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row term-frequency table of a token array —
  * `array<struct<term: string, tf: long>>` sorted by term bytes. The
  * fused, doc-LOCAL form of the `explode(tokens) → groupBy(doc, term)
  * → count` tf aggregation: every token of a document already sits in
  * one row, so its tf table is a pure function of that row and needs
  * no exchange at all. Downstream per-doc statistics (type counts,
  * max-tf, top-k terms) then start from an embarrassingly parallel
  * frame instead of a token-level shuffle.
  */
case class TermCountsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false), StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_counts"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.termCounts(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.termCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpressions {

  /** Sorted-distinct 60-bit shingle hash set of a token-array column —
    * the fused form of
    * `array_sort(array_distinct(transform(shinglesFromTokens(t, n), hash60)))`.
    */
  def shingleHashSet(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHash60Expr(Bridge.expression(tokens), n, distinctSorted = true))

  /** Position-ordered 60-bit shingle hashes (winnowing's k-gram run) —
    * the fused form of `transform(shinglesFromTokens(t, n), hash60)`.
    */
  def shingleHashes(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHash60Expr(Bridge.expression(tokens), n, distinctSorted = false))

  /** Per-row k-member MinHash signature of a pre-hashed shingle set —
    * the fused form of
    * `transform(sequence(0, k-1), i => array_min(transform(set, s => hash60(i:s))))`.
    */
  def minhashSignature(set: Column, k: Int): Column =
    Bridge.column(MinhashSigExpr(Bridge.expression(set), k))

  /** Fused consecutive-duplicate collapse (d43's stutter scrub). */
  def collapseRuns(arr: Column): Column =
    Bridge.column(CollapseRunsExpr(Bridge.expression(arr)))

  /** Two-pointer overlap count of sorted-distinct long arrays — the
    * fused `size(array_intersect(a, b))` for verify joins.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCountExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Threshold-aware overlap count: exact when reachable, -1 once
    * `seen + min(remaining)` proves `minRequired` is not — the
    * early-exit form of `sortedIntersectCount` for verify joins.
    */
  def sortedIntersectAtLeast(a: Column, b: Column, minRequired: Column): Column =
    Bridge.column(SortedIntersectAtLeastExpr(
      Bridge.expression(a), Bridge.expression(b), Bridge.expression(minRequired)))

  /** Two-pointer min |a_i - b_j| over sorted int position arrays. */
  def sortedMinAbsGap(a: Column, b: Column): Column =
    Bridge.column(SortedMinAbsGapExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Monotone-sweep count of pairs within `w` over sorted int arrays. */
  def sortedPairsWithin(a: Column, b: Column, w: Column): Column =
    Bridge.column(SortedPairsWithinExpr(
      Bridge.expression(a), Bridge.expression(b), Bridge.expression(w)))

  /** Per-row 60-bit SimHash of a token-array column (null when empty). */
  def simhash60(tokens: Column): Column =
    Bridge.column(Simhash60Expr(Bridge.expression(tokens)))

  /** One-pass whitespace tokenizer — the fused
    * `filter(split(trim(c), "\\s+"), _ =!= "")`.
    */
  def tokenize(c: Column): Column =
    Bridge.column(TokenizeExpr(Bridge.expression(c)))

  /** Allocation-free whitespace token count — the fused
    * `size(tokenize(c)).cast("long")`.
    */
  def tokenCount(c: Column): Column =
    Bridge.column(TokenCountExpr(Bridge.expression(c)))

  /** Per-row term-frequency table, sorted by term — the fused,
    * shuffle-free form of
    * `transform(array_sort(array_distinct(tk)), x -> struct(x, size(filter(tk, y -> y = x))))`.
    */
  def termCounts(tokens: Column): Column =
    Bridge.column(TermCountsExpr(Bridge.expression(tokens)))

  /** Per-row token-frequency summary `[n_tokens, n_types, max_tf]` —
    * the lambda-free fused form of reducing `termCounts(tokens)`.
    */
  def tfStats(tokens: Column): Column =
    Bridge.column(TfStatsExpr(Bridge.expression(tokens)))

  /** Per-row duplicate-gram statistics `[total, dup]` of a long array —
    * the fused, shuffle-free form of the exploded per-gram count with
    * conditional sums (d34's inner aggregation).
    */
  def dupRunStats(arr: Column): Column =
    Bridge.column(DupRunStatsExpr(Bridge.expression(arr)))
}
