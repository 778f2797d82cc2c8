package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.unsafe.types.UTF8String

/** Imperative per-row kernel behind the `SimhashBigrams` Catalyst
  * expression: the 32-bit bigram simhash in ONE pass over the document.
  *
  * Semantics are the registry's simhash contract, bit-for-bit (pinned
  * against the relational batch builder in StreamingSpec): tokens =
  * `split(text, " ")` keeping empties (Spark's limit = -1 behavior),
  * bigrams = adjacent token pairs joined by one space, DISTINCT bigram
  * set, hash = first 4 bytes of md5 as an unsigned 32-bit value, per-bit
  * votes ±1 over the distinct hashes, bit set iff its vote sum is
  * strictly positive; docs with < 2 tokens sign to 0.
  *
  * Why a kernel and not higher-order functions: the HOF form evaluated 32
  * interpreted `aggregate` lambdas per row (one full pass over the hash
  * array per output bit) — measured 13.5 s for the 5k-doc streaming dedup
  * drain at sf0.1, the worst query in the suite. This method is called
  * from generated code (a standalone Scala object compiles to a static
  * forwarder, so `SimhashKernel.compute(...)` is a plain Java static
  * call inside whole-stage codegen) and does the whole signature in one
  * tokens-length loop with a 32-int vote array.
  */
object SimhashKernel {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 2) return 0L
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    val digest = md5.get()
    var i = 0
    while (i < toks.length - 1) {
      val g = toks(i) + " " + toks(i + 1)
      if (seen.add(g)) {
        digest.reset()
        val b = digest.digest(g.getBytes(StandardCharsets.UTF_8))
        // first 8 hex chars of md5 = first 4 bytes, read big-endian
        // unsigned — the conv(substring(md5(g),1,8),16,10) twin
        val h = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
          ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
        var k = 0
        while (k < 32) {
          votes(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 32) {
      if (votes(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }
}
