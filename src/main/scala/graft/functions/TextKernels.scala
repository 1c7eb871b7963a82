package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Per-document text kernels replacing per-character / per-shingle
  * expression trees on the two hottest map-stage queries. Each is one
  * JVM call per document with bit-identical output to the expression
  * pipeline it replaced (differential specs in TextKernelsSpec).
  */
object TextKernels {

  private def md5hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** `trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), '  *', ' '))`
    * as one char pass. Lowercasing delegates to Spark's own
    * `UTF8String.toLowerCase` so unicode case rules can never drift
    * from the engine's `lower()`; the replace/collapse/trim loop is
    * exact: every non-[a-z0-9 ] position becomes a space (an astral
    * codepoint's two surrogates yield two spaces where the regex
    * yields one — indistinguishable after the run-collapse), runs of
    * spaces collapse to one, and edge spaces drop (the regex pipeline
    * leaves only spaces at the edges, so space-trim == trim). The
    * result is pure ASCII, so norm_len is its plain length and the md5
    * runs over its UTF-8 == ASCII bytes.
    * Returns (norm_len, norm_md5); null text -> null. */
  def normalize(text: String): (Long, String) = {
    if (text == null) return null
    val lower = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var pendingSpace = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else {
        pendingSpace = true // space or replaced char: emit at most one, never leading
      }
      i += 1
    }
    val norm = sb.toString // trailing pendingSpace drops = right trim
    (norm.length.toLong, md5hex(norm.getBytes(StandardCharsets.US_ASCII)))
  }

  /** Both doc_fingerprint legs in ONE pass over the text:
    * fp  = `md5(regexp_replace(lower(text), '[^a-z0-9 ]', ''))`
    *       (removal — keeps spaces, no collapse/trim), and
    * msf = [[minShingleMd5]] over the ORIGINAL text.
    * Null text -> null; msf is null when the doc has <3 tokens
    * (caller coalesces, matching the expression form). */
  def fingerprintPair(text: String): (String, String) = {
    if (text == null) return null
    val lower = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') sb.append(c)
      i += 1
    }
    (md5hex(sb.toString.getBytes(StandardCharsets.US_ASCII)), minShingleMd5(text))
  }

  /** `array_min(transform(3-word-shingles, g -> md5(CAST(g AS BINARY))))`
    * without materializing the shingle or hash arrays: split on single
    * spaces (Spark's `split(text, ' ', -1)` contract), md5 each
    * "w1 w2 w3" shingle, keep the bytewise-min digest (lowercase-hex
    * order == unsigned byte order). Null when text is null or has
    * fewer than three tokens. */
  def minShingleMd5(text: String): String = {
    if (text == null) return null
    val w = text.split(" ", -1)
    if (w.length < 3) return null
    val md = MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val best = new Array[Byte](16)
    var have = false
    var i = 0
    while (i + 2 < w.length) {
      md.reset()
      md.update(w(i).getBytes(StandardCharsets.UTF_8))
      md.update(' '.toByte)
      md.update(w(i + 1).getBytes(StandardCharsets.UTF_8))
      md.update(' '.toByte)
      md.update(w(i + 2).getBytes(StandardCharsets.UTF_8))
      md.digest(dig, 0, 16)
      if (!have || {
        var c = 0; var k = 0
        while (c == 0 && k < 16) {
          c = java.lang.Integer.compareUnsigned(dig(k) & 0xff, best(k) & 0xff)
          k += 1
        }
        c < 0
      }) {
        System.arraycopy(dig, 0, best, 0, 16)
        have = true
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(32)
    i = 0
    while (i < 16) {
      sb.append(Character.forDigit((best(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(best(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
