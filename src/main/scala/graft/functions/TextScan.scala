package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass scan twins of the java.util.regex text helpers in
  * [[TextFunctions]] (r17 optimization round — the r16 pretokenizer
  * lesson's siblings: per-row java.util.regex in a hot scan path costs
  * more than the work it feeds; at 100× the two-regexp `normalize` pass
  * was 40% of the whole headline bench inside ext_dedup_exact).
  *
  * Each function is BYTE/CHAR-IDENTICAL to its regex twin by
  * construction (TextScanSpec pins all three on adversarial inputs —
  * unicode, surrogate pairs, control chars, space runs); the regexp
  * forms stay as the call-site fallback for non-extension sessions and
  * as the cross-engine oracle mirrors, exactly the graft_bpe_pretok
  * discipline.
  */
object TextScan {

  /** Twin of `trim(regexp_replace(regexp_replace(<lowered>, "[^a-z0-9 ]",
    * ""), " +", " "))` over an ALREADY-LOWERCASED string (callers pass
    * `lower(text)` — Spark's `lower` keeps its codegen'd ASCII fast
    * path). Works directly on the UTF-8 bytes: every kept character is
    * ASCII `[a-z0-9 ]`, and every dropped code point's UTF-8 bytes are
    * each individually outside the kept set (multi-byte sequences are
    * all ≥ 0x80), so per-byte filtering removes exactly the characters
    * the per-code-point regex removes. Space runs collapse to one and
    * leading/trailing spaces drop in the same pass. */
  def normalizeLowered(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b
        o += 1
      } else if (b == ' ') pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** java.util.regex `\s` — ASCII-only: `[ \t\n\x0B\f\r]`. */
  private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Twin of `regexp_count(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")`:
    * one count per ASCII-letter RUN, per single digit, and per other
    * non-whitespace CODE POINT (java.util.regex character classes match
    * whole code points, so a surrogate pair counts once — the scan
    * advances by `Character.charCount`). */
  def retokCount(s: String): Long = {
    val n = s.length
    var i = 0
    var count = 0L
    while (i < n) {
      val c = s.charAt(i)
      if (isAsciiLetter(c)) {
        count += 1
        i += 1
        while (i < n && isAsciiLetter(s.charAt(i))) i += 1
      } else if (c >= '0' && c <= '9') { count += 1; i += 1 }
      else if (isJavaWs(c)) i += 1
      else { count += 1; i += Character.charCount(s.codePointAt(i)) }
    }
    count
  }

  /** Twin of `regexp_count(text, "[^A-Za-z0-9\\s]")`: one count per
    * non-alphanumeric non-whitespace code point (same code-point
    * advance rule as [[retokCount]]). */
  def punctCount(s: String): Long = {
    val n = s.length
    var i = 0
    var count = 0L
    while (i < n) {
      val c = s.charAt(i)
      if (isAsciiLetter(c) || (c >= '0' && c <= '9') || isJavaWs(c)) i += 1
      else { count += 1; i += Character.charCount(s.codePointAt(i)) }
    }
    count
  }

  /** Twin of `array_distinct(transform(shingles(text, n), xxhash64))`
    * where shingles = `transform(sequence(1, W−n+1),
    * i => array_join(slice(split(text, " "), i, n), " "))` — the MinHash/
    * Jaccard shingle-hash pipeline as ONE scan (r18 optimization round:
    * the two interpreted `transform` lambdas built every shingle STRING
    * per element only to hash it — the r9 interpreted-HOF lesson in the
    * hottest dedup path; at x100 the shingle stages dominated
    * ext_dedup_minhash).
    *
    * Value-exact by construction: `split(text, " ")` keeps empty words
    * (consecutive/trailing spaces) and a single 0x20 never occurs inside
    * a multi-byte UTF-8 sequence, so the byte-level split is the regex
    * split; each shingle's joined bytes are word bytes + single 0x20
    * separators — exactly `array_join(…, " ")`'s UTF-8 bytes — hashed
    * with the same XXH64/seed-42 the `xxhash64` expression uses; distinct
    * keeps first occurrence like `array_distinct`. TextScanSpec pins the
    * twin on adversarial inputs (space runs, trailing spaces, unicode,
    * short docs). */
  def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val bytes = s.getBytes
    val len = bytes.length
    // word boundaries over the byte array: split on every single 0x20,
    // keeping empties (limit -1 semantics) — starts(i) .. ends(i)
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') words += 1; i += 1 }
    if (words < n) return Array.emptyLongArray
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = len
    val nShingles = words - n + 1
    val seen = new java.util.HashSet[java.lang.Long](nShingles * 2)
    val out = new Array[Long](nShingles)
    var outN = 0
    var sh = 0
    while (sh < nShingles) {
      // shingle bytes = words sh..sh+n-1 joined by single spaces; for a
      // contiguous word run that is exactly the source byte range
      // [starts(sh), ends(sh+n-1)) — zero copy needed, hash in place
      val from = starts(sh)
      val to = ends(sh + n - 1)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        to - from, 42L)
      if (seen.add(h)) { out(outN) = h; outN += 1 }
      sh += 1
    }
    if (outN == nShingles) out else java.util.Arrays.copyOf(out, outN)
  }
}
