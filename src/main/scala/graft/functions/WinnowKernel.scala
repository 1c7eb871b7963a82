package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Row-local winnowing kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * hash every k-char gram, slide a w-gram window, keep each window's
  * minimum — one JVM call per DOCUMENT instead of one expression tree
  * evaluation per CHARACTER.
  *
  * Semantics are bit-identical to the SQL-expression form it replaced
  * (`substring(md5(CAST(substring(text,i,k) AS BINARY)),1,8)` +
  * `array_min(slice(...))`): the 8-hex-char fingerprint is exactly the
  * big-endian first 4 md5 bytes, and lowercase-hex lexicographic order
  * equals unsigned-int order — so the kernel compares raw unsigned
  * ints (no string materialization per gram) and formats hex only for
  * the two output fingerprints. Substrings are CODEPOINT-based (Spark
  * and DuckDB `substr` semantics), handled via a UTF-8 byte-offset
  * index when the text is not pure ASCII; Java's UTF-16 substring
  * would silently diverge on astral codepoints.
  *
  * Cost: one reused MessageDigest per call, O(n) deque window minima,
  * one small HashSet for the distinct count — ~0.2 µs/gram vs the
  * ~20 µs/gram of the per-position expression form (measured 15.3 s →
  * ~1 s on the 22M-char 10× corpus).
  */
object WinnowKernel {

  /** (n_fp, min_fp, max_fp) or null when no full window exists. */
  def fingerprint(text: String, k: Int, w: Int): (Long, String, String) = {
    if (text == null) return null
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    // codepoint-indexed byte offsets; for ASCII this is the identity
    val ascii = bytes.length == text.length
    val nCp = if (ascii) text.length else text.codePointCount(0, text.length)
    if (nCp < k + w - 1) return null
    val offs: Array[Int] =
      if (ascii) null
      else {
        val o = new Array[Int](nCp + 1)
        var bi = 0; var ci = 0
        while (bi < bytes.length) {
          o(ci) = bi
          val b = bytes(bi) & 0xff
          bi += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
          ci += 1
        }
        o(nCp) = bytes.length
        o
      }
    val n = nCp - k + 1
    val md = MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val hs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val from = if (ascii) i else offs(i)
      val until = if (ascii) i + k else offs(i + k)
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(dig, 0, 16)
      hs(i) = ((dig(0) & 0xff) << 24) | ((dig(1) & 0xff) << 16) |
        ((dig(2) & 0xff) << 8) | (dig(3) & 0xff)
      i += 1
    }
    // O(n) sliding minima via a monotonic deque of indices (unsigned order)
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val seen = new java.util.HashSet[Integer]()
    var minFp = -1L; var maxFp = -1L
    i = 0
    while (i < n) {
      while (tail > head &&
        java.lang.Integer.compareUnsigned(hs(deque(tail - 1)), hs(i)) >= 0) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val fp = hs(deque(head))
        seen.add(fp)
        val u = fp & 0xffffffffL
        if (minFp < 0 || u < minFp) minFp = u
        if (maxFp < 0 || u > maxFp) maxFp = u
      }
      i += 1
    }
    (seen.size.toLong, f"$minFp%08x", f"$maxFp%08x")
  }
}
