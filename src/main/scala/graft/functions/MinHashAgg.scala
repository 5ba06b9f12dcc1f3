package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass MinHash signature sketch (typed `Aggregator`, SURVEY §7.2).
  *
  * The composable form (`Dedup.minhashSignatures`) explodes every
  * (doc, shingle) row k times and min-reduces — k× the rows through the
  * map side. This aggregator keeps the k running minima in a single
  * buffer per group instead: rows shuffled = docs, not docs × k ×
  * shingles; partial aggregation merges buffers map-side.
  *
  * Hash family member i over a (pre-hashed, `Dedup.shingleArrays`)
  * shingle value s is EXACTLY `Hashing.hash60` of "i:s" with s printed
  * in decimal — top 60 bits of md5, computed here natively
  * (MessageDigest + big-endian first-8-bytes >>> 4 ≡ first 15 hex
  * chars as an unsigned value) — so signatures are interchangeable
  * with the column form (`CAST(s AS STRING)`) and the DuckDB oracle
  * (`CAST(s AS VARCHAR)`).
  */
class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: Long): Array[Long] = {
    // "i:" + decimal shingle is at most 3 + 20 bytes — always a single
    // MD5 block, so build it straight in the Md5Short scratch buffer
    // (no per-probe String or digest-array allocation)
    val dec = java.lang.Long.toString(shingle)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val pre = MinHashAgg.prefixes(k)
    val blk = Md5Short.buffer()
    var i   = 0
    while (i < k) {
      val p = pre(i)
      System.arraycopy(p, 0, blk, 0, p.length)
      System.arraycopy(dec, 0, blk, p.length, dec.length)
      val h = Md5Short.first8(blk, p.length + dec.length) >>> 4
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // "0:", "1:", ... seed prefixes, rendered once per family size
  private val seedPrefixes = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private[functions] def prefixes(k: Int): Array[Array[Byte]] =
    seedPrefixes.computeIfAbsent(
      k,
      kk => Array.tabulate(kk)(i => (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.US_ASCII)))

  /** JVM-native twin of `Hashing.hash60` (top 60 bits of md5). */
  def hash60(s: String): Long =
    hash60Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Same, over raw UTF-8 bytes (codegen entry point: UTF8String.getBytes).
    * Messages that fit one MD5 block take the single-compression
    * `Md5Short` path (no MessageDigest bookkeeping, no digest alloc);
    * longer ones stream through MessageDigest — identical bits either
    * way (Md5ShortSpec).
    */
  def hash60Bytes(utf8: Array[Byte]): Long = {
    if (utf8.length <= Md5Short.MaxLen) {
      val buf = Md5Short.buffer()
      System.arraycopy(utf8, 0, buf, 0, utf8.length)
      return Md5Short.first8(buf, utf8.length) >>> 4
    }
    val d = digest.get()
    d.reset()
    val bytes = d.digest(utf8)
    // first 8 bytes big-endian, dropped low nibble == first 15 hex chars
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (bytes(i) & 0xffL); i += 1 }
    x >>> 4
  }
}
