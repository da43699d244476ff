package graft.functions

/** Executor-side classic-BPE encoding core (r15 VERDICT #2 — the
  * tokenizer-scale path behind [[TextFunctions.bpeTokenCountFast]] /
  * the `graft_bpe_count` native expression): a greedy merge loop over a
  * rank table, O(1) plan size in the vocabulary, unlike the oracle-able
  * replace-chain [[TextFunctions.bpeTokenCount]] whose plan grows one
  * node per merge (fine at the pinned 48, unusable at a production
  * 32k–50k merge vocabulary).
  *
  * Equivalence to the replace-chain path (BpeSpec pins it empirically):
  * the replace chain applies merges in RANK ORDER, each exhaustively
  * left-to-right; this loop repeatedly applies the LOWEST-ranked pair
  * present, exhaustively left-to-right. The two orders coincide because
  * a later merge's output symbol cannot appear in an earlier merge's
  * pair (that symbol did not exist when the earlier pair was trained),
  * so applying a higher rank never creates occurrences of a lower one —
  * the same argument that makes "apply merges in order" valid in
  * reference BPE implementations. Words are whitespace tokens; merges
  * never cross word boundaries (training never sees a space).
  *
  * Ref mars has no tokenizer — this is the LLM-pipeline brief's own
  * surface (the pinned-table oracle gate is ext_bpe_tokens).
  */
object BpeEncode {

  /** Pair/entry separators for the serialized merge table (an expression
    * argument must be one foldable literal): U+0000/U+0001 cannot occur
    * in any merge symbol — symbols are built from whitespace-token
    * characters, and a word containing them would never train a merge
    * that the serialized form could confuse (the separators simply never
    * collide with data because [[serialize]] refuses them). */
  private val SymSep = '\u0000'
  private val PairSep = '\u0001'

  /** Word-boundary whitespace CLASS (r16 VERDICT #1 -- the r15 paths split
    * on ' ' alone, so "a\nb" was one word and merges crossed the newline,
    * which no production tokenizer does). Must stay in lockstep with the
    * replace-chain encoding's boundary translate
    * (TextFunctions.bpeMarked) and its DuckDB mirror. */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** The three control chars the two encodings reserve (U+0000/U+0001 --
    * [[serialize]]'s separators -- and U+001F, the replace chain's
    * boundary mark): DELETED from input text before encoding on BOTH
    * paths (no tokenizer vocabulary contains them; the replace chain
    * deletes them in the same translate that marks boundaries, so the
    * native loop must drop them too or sequences would diverge --
    * r15 ADVICE finding). */
  @inline def isCtl(c: Char): Boolean =
    c == '\u001F' || c == SymSep || c == PairSep

  private def stripCtl(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      val ch = w.charAt(i)
      if (!isCtl(ch)) sb.append(ch)
      i += 1
    }
    sb.toString
  }

  def serialize(merges: Seq[(String, String)]): String = {
    merges.foreach { case (a, b) =>
      require(!a.exists(c => c == SymSep || c == PairSep) &&
        !b.exists(c => c == SymSep || c == PairSep),
        "merge symbols must not contain U+0000/U+0001")
    }
    merges.iterator.map { case (a, b) => s"$a$SymSep$b" }.mkString(PairSep.toString)
  }

  /** Inverse of [[serialize]] — the merge list back from its spec string
    * (r17, the [[BpeStore]] load path). */
  def parseMerges(spec: String): Vector[(String, String)] =
    if (spec.isEmpty) Vector.empty
    else spec.split(PairSep.toString, -1).toVector.map { e =>
      val i = e.indexOf(SymSep)
      require(i >= 0, "malformed merges spec entry")
      (e.substring(0, i), e.substring(i + 1))
    }

  /** rank table keyed "a<U+0000>b" → rank (lower merges first). */
  def parseRanks(spec: String): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    if (spec.isEmpty) return m
    var rank = 0
    for (entry <- spec.split(PairSep.toString, -1)) {
      // putIfAbsent: if a pair somehow repeats, the EARLIER rank wins —
      // matching the replace chain, where the later replace finds nothing
      m.putIfAbsent(entry, Integer.valueOf(rank))
      rank += 1
    }
    m
  }

  /** BPE symbols of one word (no spaces), in order: greedy lowest-rank
    * merge loop, each application exhaustive left-to-right. O(len²)
    * worst case on the word length — words are short; the per-DOC cost
    * is bounded by the distinct-word caches in [[countDoc]] /
    * [[tokenizeDoc]]. */
  def mergeWord(w: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    // initial symbols are CODE POINTS, not UTF-16 units (r16): the
    // replace-chain encoding's '(.)' spacing regex matches one code
    // point in both Java regex and RE2, so an astral char (a surrogate
    // PAIR) must be one symbol here too or the two paths diverge — and
    // the byte-fallback id path needs whole code points to UTF-8-encode
    val len = w.codePointCount(0, w.length)
    val syms = new Array[String](len)
    var i = 0
    var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      syms(k) = w.substring(i, i + cc)
      i += cc; k += 1
    }
    if (len <= 1) return syms
    var n = len
    var done = false
    while (!done && n > 1) {
      // find the lowest-ranked adjacent pair present
      var best = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      i = 0
      while (i < n - 1) {
        val r = ranks.get(syms(i) + SymSep + syms(i + 1))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        // merge every (bestA, bestB) occurrence left-to-right with skip —
        // "aaa" under (a,a) becomes (aa)(a), same as the replace pass
        val ab = bestA + bestB
        var out = 0
        i = 0
        while (i < n) {
          if (i < n - 1 && syms(i) == bestA && syms(i + 1) == bestB) {
            syms(out) = ab; i += 2
          } else { syms(out) = syms(i); i += 1 }
          out += 1
        }
        n = out
      }
    }
    java.util.Arrays.copyOf(syms, n)
  }

  /** BPE symbol count of one word — [[mergeWord]]'s length. */
  def countWord(w: String, ranks: java.util.HashMap[String, Integer]): Long =
    mergeWord(w, ranks).length.toLong

  /** Token count of a whole document: sum of per-word counts over the
    * whitespace-class tokens ([[isWs]]; empty tokens from consecutive
    * whitespace count 0 — identical to the replace-chain accounting;
    * reserved control chars are stripped, see [[isCtl]]). `cache`
    * memoizes distinct words (Zipfian corpora hit it constantly);
    * bounded — past [[CacheCap]] entries new words encode uncached. */
  private val CacheCap = 1 << 20

  def countDoc(text: String,
      ranks: java.util.HashMap[String, Integer],
      cache: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]): Long = {
    var total = 0L
    var start = 0
    var hasCtl = false
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || isWs(text.charAt(i))) {
        if (i > start) {
          val w0 = text.substring(start, i)
          val w = if (hasCtl) stripCtl(w0) else w0
          if (!w.isEmpty) {
            var c = cache.get(w)
            if (c == null) {
              c = java.lang.Long.valueOf(countWord(w, ranks))
              if (cache.size() < CacheCap) cache.put(w, c)
            }
            total += c.longValue()
          }
        }
        start = i + 1
        hasCtl = false
      } else if (isCtl(text.charAt(i))) hasCtl = true
      i += 1
    }
    total
  }

  /** Native pretokenizer core (r16): EXACTLY the
    * `([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+)` → " $1 " regex — each
    * maximal letter / digit / other run surrounded by spaces,
    * whitespace-class chars passed through verbatim — as one scan
    * (java.util.regex costs ~2.7× the whole BPE merge loop at 100×,
    * PERF.md r16; this loop is the codegen'd fast path behind
    * `graft_bpe_pretok`, differentially gated against the RE2 mirror
    * by ext_bpe_pretok). Non-ASCII chars are category "other", exactly
    * like the regex's negated class; surrogate pairs stay inside one
    * run on both paths. */
  def pretokenize(text: String): String = {
    val n = text.length
    val sb = new java.lang.StringBuilder(n + (n >> 1) + 8)
    @inline def cat(c: Char): Int =
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) 1
      else if (c >= '0' && c <= '9') 2
      else 3
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isWs(c)) { sb.append(c); i += 1 }
      else {
        val k = cat(c)
        val start = i
        i += 1
        while (i < n && !isWs(text.charAt(i)) && cat(text.charAt(i)) == k) i += 1
        sb.append(' ').append(text, start, i).append(' ')
      }
    }
    sb.toString
  }

  /** Token-ID encoding of one word (r16): special-token passthrough
    * first (a word exactly equal to a special bypasses merging), else
    * [[mergeWord]] symbols mapped through the vocab with the OOV
    * ladder — per-code-point fallback for a symbol without an id, the
    * code point's UTF-8 bytes when the vocab carries byte ids, unk
    * when designated, and a LOUD failure otherwise (see [[BpeVocab]]
    * for the contract). */
  def encodeIdsWord(w: String,
      ranks: java.util.HashMap[String, Integer],
      vocab: BpeVocab.Table): Array[Int] = {
    if (vocab.specials.contains(w)) {
      return Array(vocab.ids.get(w).intValue())
    }
    val syms = mergeWord(w, ranks)
    val buf = new scala.collection.mutable.ArrayBuilder.ofInt
    buf.sizeHint(syms.length)
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      val id = vocab.ids.get(s)
      if (id != null) buf += id.intValue()
      else {
        // per-CODE-POINT (surrogate pairs stay whole for the byte path)
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          val cs = new String(Character.toChars(cp))
          val cid = vocab.ids.get(cs)
          if (cid != null) buf += cid.intValue()
          else if (vocab.byteBase >= 0) {
            val bs = cs.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var b = 0
            while (b < bs.length) { buf += vocab.byteBase + (bs(b) & 0xff); b += 1 }
          } else if (vocab.unkId >= 0) buf += vocab.unkId
          else throw new IllegalArgumentException(
            "BPE id encoding: code point U+" + Integer.toHexString(cp)
              .toUpperCase + " is not in the vocab alphabet and the vocab " +
              "has neither byte fallback nor an unk special — enable one " +
              "or extend the alphabet")
          j += Character.charCount(cp)
        }
      }
      i += 1
    }
    buf.result()
  }

  /** Token-ID encoding of a whole document — per-word [[encodeIdsWord]]
    * concatenated in text order. Same word-split (whitespace class,
    * control strip) and bounded-cache contract as [[tokenizeDoc]],
    * caching id ARRAYS. When the vocab designates a word-boundary
    * special (`wsId` ≥ 0, r17), its id is emitted between consecutive
    * words — each whitespace RUN collapses to one boundary token, which
    * is what makes [[decodeIds]] invert this modulo collapsed
    * whitespace (the round-trip contract ext_bpe_decode gates). */
  def encodeIdsDoc(text: String,
      ranks: java.util.HashMap[String, Integer],
      vocab: BpeVocab.Table,
      cache: java.util.concurrent.ConcurrentHashMap[String, Array[Int]]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var start = 0
    var hasCtl = false
    var emitted = false
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || isWs(text.charAt(i))) {
        if (i > start) {
          val w0 = text.substring(start, i)
          val w = if (hasCtl) stripCtl(w0) else w0
          if (!w.isEmpty) {
            var ids = cache.get(w)
            if (ids == null) {
              ids = encodeIdsWord(w, ranks, vocab)
              if (cache.size() < CacheCap) cache.put(w, ids)
            }
            if (emitted && vocab.wsId >= 0) out += vocab.wsId
            out ++= ids
            emitted = true
          }
        }
        start = i + 1
        hasCtl = false
      } else if (isCtl(text.charAt(i))) hasCtl = true
      i += 1
    }
    out.result()
  }

  /** DECODE — the inverse of [[encodeIdsDoc]] (r17 VERDICT #1): ids map
    * back to symbols through the vocab's id→symbol order; byte-fallback
    * RUNS (consecutive ids in [byteBase, byteBase+256)) reassemble to
    * UTF-8 (malformed runs render U+FFFD per the charset decoder's
    * REPLACE policy — the convention production tokenizers use; runs the
    * encoder produced are always well-formed); the word-boundary special
    * renders as one space; other specials pass through verbatim. An id
    * outside the vocabulary fails LOUDLY (the silent-absorption class
    * this repo kills on sight). Round trip: decode(encode(x)) == x with
    * every whitespace run collapsed to a single space (wordSep
    * designated) or removed (no wordSep), reserved controls deleted. */
  def decodeIds(ids: Array[Int], vocab: BpeVocab.Table): String = {
    val sb = new java.lang.StringBuilder(ids.length * 3)
    var byteRun: java.io.ByteArrayOutputStream = null
    @inline def flushBytes(): Unit =
      if (byteRun != null && byteRun.size() > 0) {
        sb.append(new String(byteRun.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
        byteRun.reset()
      }
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      if (vocab.byteBase >= 0 && id >= vocab.byteBase &&
          id < vocab.byteBase + 256) {
        if (byteRun == null) byteRun = new java.io.ByteArrayOutputStream(8)
        byteRun.write(id - vocab.byteBase)
      } else {
        flushBytes()
        if (id == vocab.wsId) sb.append(' ')
        else if (id >= 0 && id < vocab.syms.length) sb.append(vocab.syms(id))
        else throw new IllegalArgumentException(
          s"BPE decode: token id $id is outside the vocabulary " +
            s"(size ${vocab.syms.length}) — the id stream and the vocab " +
            "spec do not belong together")
      }
      i += 1
    }
    flushBytes()
    sb.toString
  }

  /** The full subword sequence of a document — per-word [[mergeWord]]
    * symbols concatenated in text order (no boundary markers in the
    * output: the flat token stream a tokenizer emits). Same word-split
    * and caching contract as [[countDoc]], caching symbol ARRAYS. */
  def tokenizeDoc(text: String,
      ranks: java.util.HashMap[String, Integer],
      cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]]): Array[String] = {
    val out = Array.newBuilder[String]
    var start = 0
    var hasCtl = false
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || isWs(text.charAt(i))) {
        if (i > start) {
          val w0 = text.substring(start, i)
          val w = if (hasCtl) stripCtl(w0) else w0
          if (!w.isEmpty) {
            var syms = cache.get(w)
            if (syms == null) {
              syms = mergeWord(w, ranks)
              if (cache.size() < CacheCap) cache.put(w, syms)
            }
            out ++= syms
          }
        }
        start = i + 1
        hasCtl = false
      } else if (isCtl(text.charAt(i))) hasCtl = true
      i += 1
    }
    out.result()
  }
}
