package graft

import graft.functions.{Md5Short, MinHashAgg}
import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity proof for the single-block MD5 kernel against the JDK
  * `MessageDigest` — the property every dedup oracle depends on: the
  * fast path must produce EXACTLY the top-60-of-md5 values DuckDB's
  * `md5()` (and Spark's) computes, for every length the kernel accepts.
  */
class Md5ShortSpec extends AnyFunSuite {

  private def reference8(msg: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val h = d.digest(msg)
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (h(i) & 0xffL); i += 1 }
    x
  }

  test("first8 matches MessageDigest for every length 0..55, random bytes") {
    val rnd = new scala.util.Random(42)
    for (len <- 0 to Md5Short.MaxLen; _ <- 1 to 50) {
      val msg = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      val buf = Md5Short.buffer()
      System.arraycopy(msg, 0, buf, 0, len)
      assert(Md5Short.first8(buf, len) === reference8(msg), s"len=$len")
    }
  }

  test("known RFC 1321 vectors") {
    def first8Of(s: String): Long = {
      val b   = s.getBytes("US-ASCII")
      val buf = Md5Short.buffer()
      System.arraycopy(b, 0, buf, 0, b.length)
      Md5Short.first8(buf, b.length)
    }
    // md5("") = d41d8cd98f00b204..., md5("abc") = 900150983cd24fb0...
    assert(first8Of("") === java.lang.Long.parseUnsignedLong("d41d8cd98f00b204", 16))
    assert(first8Of("abc") === java.lang.Long.parseUnsignedLong("900150983cd24fb0", 16))
    assert(first8Of("message digest") === reference8("message digest".getBytes("US-ASCII")))
  }

  test("hash60Bytes fast/streaming paths agree across the MaxLen boundary") {
    val rnd = new scala.util.Random(7)
    for (len <- 50 to 60; _ <- 1 to 20) {
      val msg = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      assert(MinHashAgg.hash60Bytes(msg) === (reference8(msg) >>> 4), s"len=$len")
    }
  }

  test("scratch buffer reuse leaves no state between calls") {
    val buf = Md5Short.buffer()
    val a   = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa".getBytes("US-ASCII") // 51 bytes
    System.arraycopy(a, 0, buf, 0, a.length)
    val long1 = Md5Short.first8(buf, a.length)
    // a much shorter message next: stale tail bytes must not leak in
    val b = "xy".getBytes("US-ASCII")
    System.arraycopy(b, 0, buf, 0, b.length)
    assert(Md5Short.first8(buf, b.length) === reference8(b))
    System.arraycopy(a, 0, buf, 0, a.length)
    assert(Md5Short.first8(buf, a.length) === long1)
  }
}
