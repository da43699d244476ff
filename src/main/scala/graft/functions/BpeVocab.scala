package graft.functions

/** Subword VOCABULARY for the BPE surface (r16 VERDICT #1): maps BPE
  * symbols to integer token ids — what a training pipeline actually
  * feeds to packing and models (ids, not subword strings).
  *
  * Id assignment is deterministic from the construction inputs (so a
  * committed (merges, alphabet, specials) triple IS the vocabulary —
  * the PinnedForest convention extended to ids):
  *   - special tokens first (ids 0 .. nSpecials−1) — whole-WORD
  *     passthrough: a word exactly equal to a special bypasses merging;
  *   - then the single-char alphabet, in the caller's order;
  *   - then merge outputs in rank order (a duplicate output — e.g.
  *     (a,bc) and (ab,c) both producing "abc" — keeps its first id).
  *
  * OOV contract (the ladder: symbol → code points → UTF-8 bytes → unk
  * → loud): multi-char symbols are NEVER out-of-vocabulary (every
  * merge output holds an id by construction); a code point absent from
  * the alphabet decomposes to its UTF-8 bytes' reserved ids when
  * `byteFallback` is on (then NOTHING is ever dropped — the GPT-2
  * byte-level guarantee), else maps to the `unk` special when one is
  * designated, and otherwise fails LOUDLY (the silent-truncation class
  * this repo kills on sight).
  *
  * Ref mars has no tokenizer — this surface comes from the LLM-pipeline
  * brief; the id gate is ext_bpe_ids (DuckDB replays the id map as a
  * CASE table over the replayed token stream).
  */
object BpeVocab {

  private val SymSep = '\u0000'
  private val FieldSep = '\u0001'

  /** Printable-ASCII default alphabet (0x21..0x7E — space is a word
    * boundary, never a symbol): covers every char the fixtures and the
    * synthesized gate corpora produce. */
  val asciiAlphabet: Vector[String] = (0x21 to 0x7E).map(_.toChar.toString).toVector

  /** Byte-fallback pseudo-symbol names, ids byteBase .. byteBase+255
    * when [[serialize]] is called with `byteFallback = true` (the
    * GPT-2-style guarantee: EVERY unicode input encodes — an
    * out-of-alphabet code point decomposes to its UTF-8 bytes'
    * reserved ids, so unk never fires and nothing is dropped). */
  val byteSymbols: Vector[String] =
    (0 until 256).map(b => f"<0x$b%02X>").toVector

  /** The ordered symbol list; id = position. Byte pseudo-symbols (when
    * enabled) sit right after the specials, before the alphabet.
    *
    * Duplicate specials — or a special named like a byte pseudo-symbol
    * when byteFallback is on — would silently SHIFT every subsequent id
    * (the LinkedHashSet dedups, but `serialize` derives nSpecials/
    * byteBase from specials.length), so both are refused loudly here
    * (r16 ADVICE). */
  def symbols(merges: Seq[(String, String)],
      alphabet: Seq[String] = asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      byteFallback: Boolean = false): Vector[String] = {
    require(specials.distinct == specials,
      s"duplicate special tokens would silently shift ids: $specials")
    if (byteFallback) {
      val clash = specials.toSet.intersect(byteSymbols.toSet)
      require(clash.isEmpty,
        s"specials collide with byte pseudo-symbols (ids would shift): $clash")
    }
    val seen = new java.util.LinkedHashSet[String]()
    specials.foreach { sp =>
      require(sp.nonEmpty, "empty special token")
      seen.add(sp)
    }
    if (byteFallback) byteSymbols.foreach(seen.add)
    alphabet.foreach { a =>
      require(a.length == 1, s"alphabet entries must be single chars: '$a'")
      seen.add(a)
    }
    merges.foreach { case (a, b) => seen.add(a + b) }
    import scala.jdk.CollectionConverters._
    seen.iterator().asScala.toVector
  }

  /** One foldable literal for the native expression (the
    * [[BpeEncode.serialize]] convention): header "nSpecials,unkId" then
    * the symbol list. Symbols must not contain U+0000/U+0001 (input
    * controls are stripped before encoding, so trained symbols never
    * do; specials are caller-authored — checked here). */
  def serialize(merges: Seq[(String, String)],
      alphabet: Seq[String] = asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      unk: Option[String] = None,
      byteFallback: Boolean = false,
      wordSep: Option[String] = None): String = {
    val syms = symbols(merges, alphabet, specials, byteFallback)
    syms.foreach { s =>
      require(!s.exists(c => c == SymSep || c == FieldSep),
        "vocab symbols must not contain U+0000/U+0001")
    }
    val unkId = unk.map { u =>
      require(specials.contains(u), s"unk token '$u' must be one of the specials")
      syms.indexOf(u)
    }.getOrElse(-1)
    val wsId = wordSep.map { w =>
      require(specials.contains(w),
        s"wordSep token '$w' must be one of the specials")
      syms.indexOf(w)
    }.getOrElse(-1)
    val byteBase = if (byteFallback) specials.length else -1
    s"${specials.length}$FieldSep$unkId$FieldSep$byteBase$FieldSep$wsId$FieldSep" +
      syms.mkString(SymSep.toString)
  }

  /** Parsed id table for the executor-side encoder/decoder. `byteBase`
    * < 0 = no byte fallback; else ids byteBase+b cover raw UTF-8 bytes.
    * `wsId` ≥ 0 designates the word-boundary special (r17): the encoder
    * emits it between consecutive words, which is what makes
    * decode(encode(x)) == x modulo collapsed whitespace — without it
    * the flat id stream loses word boundaries (the documented lossy
    * default). `syms` is the id→symbol order for the decoder. */
  final class Table(val ids: java.util.HashMap[String, Integer],
      val specials: java.util.HashSet[String],
      val unkId: Int,
      val byteBase: Int,
      val wsId: Int,
      val syms: Array[String],
      val size: Int) extends Serializable

  def parse(spec: String): Table = {
    val f1 = spec.indexOf(FieldSep)
    val f2 = spec.indexOf(FieldSep, f1 + 1)
    val f3 = spec.indexOf(FieldSep, f2 + 1)
    val f4 = spec.indexOf(FieldSep, f3 + 1)
    require(f1 > 0 && f2 > f1 && f3 > f2 && f4 > f3, "malformed vocab spec")
    val nSpecials = spec.substring(0, f1).toInt
    val unkId = spec.substring(f1 + 1, f2).toInt
    val byteBase = spec.substring(f2 + 1, f3).toInt
    val wsId = spec.substring(f3 + 1, f4).toInt
    val ids = new java.util.HashMap[String, Integer]()
    val specials = new java.util.HashSet[String]()
    val body = spec.substring(f4 + 1)
    val syms =
      if (body.isEmpty) Array.empty[String]
      else body.split(SymSep.toString, -1)
    var id = 0
    while (id < syms.length) {
      ids.putIfAbsent(syms(id), Integer.valueOf(id))
      if (id < nSpecials) specials.add(syms(id))
      id += 1
    }
    new Table(ids, specials, unkId, byteBase, wsId, syms, syms.length)
  }

  /** Escaped CASE fragment mapping a token expression to its id — the
    * DuckDB oracle replay of the id table ([[symbols]] order). ELSE −1:
    * the gate corpora are fully covered, so any −1 is a divergence the
    * hash gate must catch, never absorb. */
  def sqlIdCase(tokenExpr: String,
      merges: Seq[(String, String)],
      alphabet: Seq[String] = asciiAlphabet,
      specials: Seq[String] = Vector.empty): String = {
    val branches = symbols(merges, alphabet, specials).zipWithIndex
      .map { case (s, i) => s"WHEN '${s.replace("'", "''")}' THEN $i" }
      .mkString(" ")
    s"CASE $tokenExpr $branches ELSE -1 END"
  }

  /** Escaped CASE fragment mapping an ID expression back to its symbol —
    * the DuckDB replay of the id→symbol direction (the [[sqlIdCase]]
    * convention INVERTED, r17 — what makes `graft_bpe_decode`
    * oracle-able). ELSE the sentinel '\u{FFFD}-ish' marker '<bad>' so an
    * unknown id breaks the hash instead of being absorbed. The word-
    * boundary special (when designated) maps to a single SPACE — the
    * decoder's rendering — not to its special string. */
  def sqlSymCase(idExpr: String,
      merges: Seq[(String, String)],
      alphabet: Seq[String] = asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      wordSep: Option[String] = None): String = {
    val syms = symbols(merges, alphabet, specials)
    val branches = syms.zipWithIndex.map { case (s, i) =>
      val rendered = if (wordSep.contains(s)) " " else s
      s"WHEN $i THEN '${rendered.replace("'", "''")}'"
    }.mkString(" ")
    s"CASE $idExpr $branches ELSE '<bad>' END"
  }

  /** The UTF-8 byte-fallback ids of one code point (vocab built with
    * `byteFallback = true`): byteBase + each byte of the code point's
    * UTF-8 encoding — the values [[graft.functions.BpeEncode.encodeIdsWord]]
    * emits for an out-of-alphabet code point. */
  def byteIdsOf(codePoint: Int, byteBase: Int): Seq[Int] =
    new String(Character.toChars(codePoint))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toSeq.map(b => byteBase + (b & 0xff))

  /** CASE fragment mapping a token expression to a LIST of ids — the
    * byte-fallback replay (a token can decompose to MULTIPLE byte ids,
    * so the oracle maps to lists and flattens): vocab symbols map to
    * single-element lists; `oovTokens` pairs a SQL expression for each
    * injected out-of-alphabet token with its decomposed id list
    * ([[byteIdsOf]]); ELSE [-1] so any divergence breaks the hash.
    * Byte pseudo-symbols never appear as tokens and are skipped. */
  def sqlIdListCase(tokenExpr: String,
      merges: Seq[(String, String)],
      alphabet: Seq[String] = asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      byteFallback: Boolean = false,
      oovTokens: Seq[(String, Seq[Int])] = Nil): String = {
    val symBranches = symbols(merges, alphabet, specials, byteFallback)
      .zipWithIndex
      .filterNot { case (s, _) => byteFallback && byteSymbols.contains(s) }
      .map { case (s, i) => s"WHEN '${s.replace("'", "''")}' THEN [$i]" }
    val oovBranches = oovTokens.map { case (expr, ids) =>
      s"WHEN $expr THEN [${ids.mkString(", ")}]"
    }
    s"CASE $tokenExpr ${(oovBranches ++ symBranches).mkString(" ")} ELSE [-1] END"
  }
}
