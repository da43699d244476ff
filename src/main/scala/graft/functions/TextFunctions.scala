package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, fingerprinting, language-ID heuristics, quality
  * scoring. All pure Column expressions (whole-stage codegen, no UDFs), so
  * they run at scan speed over 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish token count: runs of word chars, digits, or single punctuation
    * marks — a cheap proxy for subword tokenizer counts. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")

  /** Word-boundary marker for [[bpeTokenCount]]'s string encoding —
    * U+001F (unit separator). A literal U+001F in input text is DELETED
    * before encoding (with U+0000/U+0001, the merge-table separators) —
    * see [[BpeEncode.isCtl]]; the native loop drops the same chars, so
    * the two paths stay sequence-identical on adversarial input
    * (r15 ADVICE). */
  private val BpeMark = "\u001F"

  /** Word-boundary whitespace CLASS (r16 VERDICT #1): space, tab,
    * newline, CR. Must stay in lockstep with [[BpeEncode.isWs]] and the
    * DuckDB mirror in [[sqlBpeMerged]]. */
  private val BpeWsChars = " \t\n\r"

  /** Canonical boundary encoding of input text for the replace-chain BPE
    * paths: every whitespace-class char becomes one [[BpeMark]]
    * pseudo-symbol and the three reserved control chars are deleted —
    * ONE codegen'd translate node. */
  private def bpeMarked(text: Column): Column =
    translate(text, BpeWsChars + BpeMark + 0.toChar.toString + 1.toChar.toString,
      BpeMark * 4)

  /** REAL BPE token count over a pinned merge table (r14 — upgrades the
    * [[regexTokenCount]] proxy; [[PinnedBpe]] is the committed default,
    * trained by [[PinnedBpeGen]]): the exact token count a classic BPE
    * tokenizer with those merges produces, computed as pure string
    * arithmetic — oracle-able bit-for-bit (ext_bpe_tokens).
    *
    * Encoding trick: represent the doc with every symbol separated by
    * TWO spaces and flanked by double spaces at the edges (word
    * boundaries become [[BpeMark]] pseudo-symbols, so merges never
    * cross words). One merge (A, B) → AB is then a single literal
    * `replace(doc, " A  B ", " AB ")`: the needle's one-space flanks
    * consume one space of each boundary and the replacement restores
    * them, so the invariant survives and consecutive occurrences
    * ("a a a a") all merge in one left-to-right pass. Applying merges
    * in rank order, each in one such pass, IS classic BPE encoding: a
    * later merge's output symbol cannot appear in an earlier merge's
    * pair (it did not exist when that pair was trained), so no pass
    * can create work for an earlier one — the same argument that makes
    * "apply merges in order" valid in reference BPE implementations.
    * BpeSpec cross-checks the column against an independent
    * symbol-vector BPE encoder on adversarial strings + fixture docs.
    *
    * tokens = symbols(doc) − word-boundary markers, with
    * symbols = (#spaces / 2) − 1 in the double-spaced form — exact
    * integers end to end (UNROUNDED gate). */
  def bpeTokenCount(text: Column,
      merges: Seq[(String, String)] = PinnedBpe.merges): Column = {
    val merged = bpeMergedSpaced(text, merges)
    val spaces = length(merged) -
      length(call_function("replace", merged, lit(" "), lit("")))
    val symbols = (spaces.cast("long") / lit(2)).cast("long") - lit(1L)
    // one boundary mark per whitespace-CLASS char of the input (the
    // reserved controls are deleted, not marked — they contribute nothing)
    val markers = length(text) -
      length(translate(text, BpeWsChars, ""))
    (symbols - markers.cast("long")).cast("long")
  }

  /** The double-spaced fully-merged form of [[bpeTokenCount]]'s string
    * encoding — "  s1  s2  ...  sk  " with [[BpeMark]] pseudo-symbols at
    * word boundaries. Shared by the count and the tokenize fallback. */
  private def bpeMergedSpaced(text: Column,
      merges: Seq[(String, String)]): Column = {
    val rep0 = bpeMarked(text)
    val spaced = concat(lit("  "), regexp_replace(rep0, "(.)", "$1  "))
    merges.foldLeft(spaced) { case (c, (a, b)) =>
      call_function("replace", c, lit(s" $a  $b "), lit(s" $a$b "))
    }
  }

  /** BPE ENCODING — the document's full subword sequence as
    * array<string> (the flat token stream packing/chunking consumes;
    * [[bpeTokenCountFast]] is its length). Native `graft_bpe_tokenize`
    * merge loop on extension sessions (O(1) plan size in the
    * vocabulary); the fallback derives the same sequence from the
    * replace chain's merged string at gate-scale tables and refuses
    * loudly beyond. Oracle-gated on the pinned table (ext_bpe_encode);
    * sequence equality vs the reference encoder is BpeSpec-pinned. */
  def bpeTokenize(spark: org.apache.spark.sql.SparkSession,
      text: Column,
      merges: Seq[(String, String)] = PinnedBpe.merges): Column =
    bpeTokenizeImpl(
      spark.catalog.functionExists("graft_bpe_tokenize"), text, merges)

  private[graft] def bpeTokenizeImpl(nativeAvailable: Boolean,
      text: Column, merges: Seq[(String, String)]): Column = {
    if (nativeAvailable)
      call_function("graft_bpe_tokenize", text, lit(BpeEncode.serialize(merges)))
    else if (merges.size <= 512) {
      // split the merged double-spaced form on "  " and drop the
      // word-boundary marks; empty text has no symbols at all
      val parts = split(trim(bpeMergedSpaced(text, merges)), "  ")
      filter(parts, s => s =!= lit(BpeMark) && length(s) > 0)
    } else throw new IllegalArgumentException(
      s"bpeTokenize with ${merges.size} merges needs the native " +
        "graft_bpe_tokenize expression — enable " +
        "spark.sql.extensions=graft.plans.GraftExtensions")
  }

  /** Tokenizer-scale BPE token count (r15 — the production path the
    * replace-chain [[bpeTokenCount]] gate-scales down to): the native
    * `graft_bpe_count` expression runs [[BpeEncode]]'s executor-side
    * merge loop over the table serialized as ONE foldable literal —
    * plan size O(1) in the vocabulary, so a 32k–50k merge production
    * tokenizer costs one reference object where the replace chain would
    * need one plan node per merge. Counts are IDENTICAL to
    * [[bpeTokenCount]] on the same merges (BpeSpec pins it; the greedy
    * lowest-rank loop and the rank-ordered replace chain coincide — see
    * [[BpeEncode]]). Sessions without [[graft.plans.GraftExtensions]]
    * fall back to the replace chain when the table is small enough for
    * a per-merge plan (the pinned-table/gate regime) and fail loudly
    * beyond it rather than build a 50k-node plan. */
  def bpeTokenCountFast(spark: org.apache.spark.sql.SparkSession,
      text: Column,
      merges: Seq[(String, String)] = PinnedBpe.merges): Column =
    bpeTokenCountImpl(
      spark.catalog.functionExists("graft_bpe_count"), text, merges)

  private[graft] def bpeTokenCountImpl(nativeAvailable: Boolean,
      text: Column, merges: Seq[(String, String)]): Column = {
    if (nativeAvailable)
      call_function("graft_bpe_count", text, lit(BpeEncode.serialize(merges)))
    else if (merges.size <= 512) bpeTokenCount(text, merges)
    else throw new IllegalArgumentException(
      s"bpeTokenCountFast with ${merges.size} merges needs the native " +
        "graft_bpe_count expression — enable " +
        "spark.sql.extensions=graft.plans.GraftExtensions (the replace-" +
        "chain fallback is only viable at gate-scale merge tables)")
  }

  /** BPE token-ID encoding (r16 VERDICT #1): the document's id stream as
    * array<int> against a [[BpeVocab]] built from (merges, alphabet,
    * specials) — what packing and training actually consume. Native
    * `graft_bpe_ids` merge loop on extension sessions (O(1) plan size in
    * merges AND vocab); the fallback derives ids from the replace-chain
    * token sequence through a map literal at gate-scale tables —
    * char/unk fallback and special passthrough need the native path
    * (the chain decomposes a special into its chars irreversibly), so
    * the fallback refuses those loudly rather than diverge. */
  def bpeEncodeIds(spark: org.apache.spark.sql.SparkSession,
      text: Column,
      merges: Seq[(String, String)] = PinnedBpe.merges,
      alphabet: Seq[String] = BpeVocab.asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      unk: Option[String] = None,
      byteFallback: Boolean = false,
      wordSep: Option[String] = None): Column =
    bpeEncodeIdsImpl(spark.catalog.functionExists("graft_bpe_ids"),
      text, merges, alphabet, specials, unk, byteFallback, wordSep)

  private[graft] def bpeEncodeIdsImpl(nativeAvailable: Boolean,
      text: Column, merges: Seq[(String, String)],
      alphabet: Seq[String], specials: Seq[String],
      unk: Option[String], byteFallback: Boolean = false,
      wordSep: Option[String] = None): Column = {
    if (nativeAvailable)
      call_function("graft_bpe_ids", text,
        lit(BpeEncode.serialize(merges)),
        lit(BpeVocab.serialize(merges, alphabet, specials, unk, byteFallback,
          wordSep)))
    else if (merges.size <= 512 && specials.isEmpty && !byteFallback) {
      // chain tokens -> literal-map lookup; a missing id is LOUD (the
      // native path's byte/char/unk fallback cannot be replayed here)
      val syms = BpeVocab.symbols(merges, alphabet, specials, byteFallback)
      val idMap = map(syms.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit(s), lit(i)) }: _*)
      transform(bpeTokenizeImpl(nativeAvailable = false, text, merges),
        t => coalesce(element_at(idMap, t),
          raise_error(concat(lit("bpeEncodeIds fallback: symbol '"), t,
            lit("' has no id and the non-native path cannot char-fall " +
              "back — enable graft.plans.GraftExtensions"))).cast("int")))
    } else throw new IllegalArgumentException(
      s"bpeEncodeIds with ${merges.size} merges / ${specials.size} specials" +
        (if (byteFallback) " / byteFallback" else "") +
        " needs the native graft_bpe_ids expression — enable " +
        "spark.sql.extensions=graft.plans.GraftExtensions (the fallback " +
        "covers gate-scale tables without specials or byte fallback only — " +
        "it cannot replay byte decomposition, so deferring would error " +
        "per-row at runtime instead of here)")
  }

  /** BPE DECODE — ids back to text (r17 VERDICT #1): the inverse of
    * [[bpeEncodeIds]] on the SAME (merges, alphabet, specials, …) vocab.
    * Ids map to symbols through the deterministic id order, byte-
    * fallback runs reassemble to UTF-8, the `wordSep` special renders
    * as one space, other specials pass through verbatim, unknown ids
    * are LOUD. Round trip: `bpeDecodeIds(bpeEncodeIds(x))` == x with
    * every whitespace run collapsed to one space (wordSep designated;
    * without it word boundaries are not in the id stream and decode
    * concatenates words — the documented lossy default). Native
    * `graft_bpe_decode` on extension sessions; the fallback replays the
    * id→symbol map as a literal-map lookup at gate-scale vocabularies
    * (no byte fallback — a byte RUN cannot be reassembled relationally)
    * and refuses loudly beyond. */
  def bpeDecodeIds(spark: org.apache.spark.sql.SparkSession,
      ids: Column,
      merges: Seq[(String, String)] = PinnedBpe.merges,
      alphabet: Seq[String] = BpeVocab.asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      unk: Option[String] = None,
      byteFallback: Boolean = false,
      wordSep: Option[String] = None): Column =
    bpeDecodeIdsImpl(spark.catalog.functionExists("graft_bpe_decode"),
      ids, merges, alphabet, specials, unk, byteFallback, wordSep)

  private[graft] def bpeDecodeIdsImpl(nativeAvailable: Boolean,
      ids: Column, merges: Seq[(String, String)],
      alphabet: Seq[String], specials: Seq[String],
      unk: Option[String], byteFallback: Boolean = false,
      wordSep: Option[String] = None): Column = {
    if (nativeAvailable)
      call_function("graft_bpe_decode", ids,
        lit(BpeVocab.serialize(merges, alphabet, specials, unk, byteFallback,
          wordSep)))
    else if (merges.size <= 512 && !byteFallback) {
      // id -> symbol literal map (wordSep renders as a space); a missing
      // id is LOUD — the hash gate must see divergence, never absorb it
      val syms = BpeVocab.symbols(merges, alphabet, specials)
      val symMap = map(syms.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit(i), lit(if (wordSep.contains(s)) " " else s)) }: _*)
      array_join(transform(ids, i => coalesce(element_at(symMap, i),
        raise_error(concat(lit("bpeDecodeIds fallback: id "),
          i.cast("string"), lit(" is outside the vocabulary"))))), "")
    } else throw new IllegalArgumentException(
      s"bpeDecodeIds with ${merges.size} merges" +
        (if (byteFallback) " / byteFallback" else "") +
        " needs the native graft_bpe_decode expression — enable " +
        "spark.sql.extensions=graft.plans.GraftExtensions (the fallback " +
        "covers gate-scale vocabularies without byte fallback only)")
  }

  /** GPT-2-style pretokenization as a pure pre-transform (r16 VERDICT
    * #1b): surround every maximal letter / digit / other-punct run with
    * spaces, so the whitespace-class word split downstream yields
    * category-pure words and BPE merges never cross a letter/digit/punct
    * boundary — the behavior of production regex pretokenizers, at the
    * cheapest (ASCII-category) level. Because it only INSERTS
    * whitespace, it composes with every BPE path unchanged:
    * `bpeTokenCountFast(spark, bpePretokenize(text))`,
    * `bpeTokenize(spark, bpePretokenize(text))`. One codegen'd
    * regexp_replace; [[sqlBpePretokenize]] is the engine mirror (Java
    * regex and RE2 agree on this alternation: runs are maximal because
    * matching is left-to-right and greedy). Non-ASCII letters land in
    * the punct class — the fixture (and the heuristic) are ASCII. */
  def bpePretokenize(text: Column): Column =
    regexp_replace(text,
      "([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]+)", " $1 ")

  /** [[bpePretokenize]] through the native `graft_bpe_pretok` scan when
    * the extension is registered (java.util.regex costs ~2.7× the whole
    * BPE merge loop at 100× — PERF.md r16; the scan output is
    * byte-identical, BpeSpec-pinned and gated by ext_bpe_pretok), the
    * regexp form otherwise. */
  def bpePretokenizeFast(spark: org.apache.spark.sql.SparkSession,
      text: Column): Column =
    if (spark.catalog.functionExists("graft_bpe_pretok"))
      call_function("graft_bpe_pretok", text)
    else bpePretokenize(text)

  /** DuckDB mirror of [[bpePretokenize]] — identical RE2 alternation. */
  def sqlBpePretokenize(col: String): String =
    s"regexp_replace($col, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]+)', ' \\1 ', 'g')"

  /** DuckDB mirror of [[bpeTokenCount]] as staged CTE select-fragments:
    * returns the SQL stages to interpose between the source select and
    * the final aggregation — one stage per `perStage` merges keeps the
    * expression nesting under DuckDB's 128-deep binder (the
    * modfresnel/gammainc staging convention). `inner` must expose a
    * text column `textCol` plus `carry` columns that ride along. */
  def sqlBpeTokens(textCol: String, carry: Seq[String], inner: String,
      merges: Seq[(String, String)] = PinnedBpe.merges,
      perStage: Int = 24): String = {
    val carries = carry.mkString(", ")
    val sql = sqlBpeMerged(textCol, carry, inner, merges, perStage)
    s"""SELECT $carries,
       |  (len(__d) - len(replace(__d, ' ', ''))) // 2 - 1
       |    - (len($textCol) - len(translate($textCol,
       |         ' ' || chr(9) || chr(10) || chr(13), ''))) AS __bpe
       |FROM ($sql)""".stripMargin
  }

  /** The staged merge stages only — exposes (carry..., textCol, __d)
    * where __d is the fully-merged double-spaced form. [[sqlBpeTokens]]
    * counts it; ext_bpe_encode replays the SEQUENCE from it. */
  def sqlBpeMerged(textCol: String, carry: Seq[String], inner: String,
      merges: Seq[(String, String)] = PinnedBpe.merges,
      perStage: Int = 24): String = {
    val carries = carry.mkString(", ")
    val spaced =
      s"'  ' || regexp_replace(translate($textCol, ' ' || chr(9) || chr(10) || " +
        s"chr(13) || chr(31) || chr(0) || chr(1), repeat(chr(31), 4)), " +
        s"'(.)', '\\1  ', 'g')"
    var sql = s"SELECT $carries, $textCol, $spaced AS __d FROM ($inner)"
    merges.grouped(perStage).foreach { g =>
      val nested = g.foldLeft("__d") { case (e, (a, b)) =>
        s"replace($e, ' $a  $b ', ' $a$b ')"
      }
      sql = s"SELECT $carries, $textCol, $nested AS __d FROM ($sql)"
    }
    sql
  }

  /** Lowercased, punctuation-stripped, whitespace-collapsed text. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** [[normalize]] through the native `graft_text_normalize` single-pass
    * scan when the session carries GraftExtensions, the two-regexp form
    * otherwise (r17 optimization round; byte-identical — TextScanSpec).
    * The r16 graft_bpe_pretok convention: java.util.regex per row in a
    * hot scan path costs more than the work it feeds — at 100× the two
    * regexp passes inside ext_dedup_exact were 40% of the whole headline
    * bench. */
  def normalizeFast(spark: org.apache.spark.sql.SparkSession,
      text: Column): Column =
    if (spark.catalog.functionExists("graft_text_normalize"))
      call_function("graft_text_normalize", lower(text))
    else normalize(text)

  /** [[md5Fingerprint]] over [[normalizeFast]] — same dispatch. */
  def md5FingerprintFast(spark: org.apache.spark.sql.SparkSession,
      text: Column): Column =
    md5(normalizeFast(spark, text).cast("binary"))

  /** [[regexTokenCount]] through the native `graft_retok_count` scan when
    * available (count-identical — TextScanSpec), the regexp_count form
    * otherwise. */
  def regexTokenCountFast(spark: org.apache.spark.sql.SparkSession,
      text: Column): Column =
    if (spark.catalog.functionExists("graft_retok_count"))
      call_function("graft_retok_count", text)
    else regexTokenCount(text)

  /** Word n-gram shingles as an array of strings (distinct not applied). */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles (used by Jaccard / MinHash dedup). */
  def distinctShingles(text: Column, n: Int): Column =
    array_distinct(shingles(text, n))

  /** Distinct shingles as 64-bit hashes: the dedup pipelines shuffle and
    * intersect these instead of shingle strings — ~2.5× fewer shuffle bytes
    * and long-vs-long comparisons, with a 2^-64 per-pair collision rate
    * that is negligible against any corpus size. */
  def hashedShingles(text: Column, n: Int): Column = {
    // r18: route through the native single-pass scan on extension
    // sessions — the HOF form evaluates two INTERPRETED lambdas per
    // shingle (string build + hash) in the hottest dedup scan paths
    // (value-exact twin, TextScanSpec pin). Dispatch via the active
    // session (one session per process in every entry point; absent or
    // extension-less sessions — driver smoke — keep the HOF form).
    val native = org.apache.spark.sql.SparkSession.getActiveSession
      .exists(s => try s.catalog.functionExists("graft_shingle_hashes")
        catch { case scala.util.control.NonFatal(_) => false })
    if (native) call_function("graft_shingle_hashes", text, lit(n))
    else array_distinct(transform(shingles(text, n), s => xxhash64(s)))
  }

  /** md5 fingerprint of the full normalized text (exact-dedup key). */
  def md5Fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Per-token 60-bit hashes from the first 15 hex digits of md5 — an
    * engine-portable hash family (any engine with md5 + hex parsing derives
    * the identical longs, unlike xxhash64/murmur whose exact values are
    * engine-specific). Used by the oracle-checked SimHash variant. */
  def md5TokenHashes(text: Column): Column =
    transform(words(text),
      t => conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long"))

  /** Distinct word n-gram shingles as 60-bit md5 hashes — the
    * engine-portable cousin of [[hashedShingles]], same family as
    * [[md5TokenHashes]]: any engine with md5 + hex parsing derives the
    * identical longs. Used where the LSH internals themselves must
    * replay in an oracle (Dedup.minhashBandsPortable / lshAudit). */
  def md5ShingleHashes(text: Column, n: Int): Column =
    transform(distinctShingles(text, n),
      s => conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long"))

  /** md5 fingerprint of the first `nWords` words — a cheap prefix
    * fingerprint that clusters near-duplicates sharing a prefix. */
  def prefixFingerprint(text: Column, nWords: Int): Column =
    md5(array_join(slice(words(text), 1, nWords), " ").cast("binary"))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of tokens that are common-English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val w = words(lower(text))
    size(filter(w, t => t.isInCollection(stop))).cast("double") /
      greatest(size(w), lit(1)).cast("double")
  }

  /** Mean word length. */
  def meanWordLen(text: Column): Column = {
    val w = words(text)
    aggregate(w, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") /
      greatest(size(w), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: favors moderate length, low
    * punctuation, some stopwords — deterministic integer/double arithmetic
    * reproducible in any engine. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(400.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(5.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    (lenScore * lit(0.5) + stopScore * lit(0.3) + (lit(1.0) - punctPenalty) * lit(0.2))
  }

  /** [[punctRatio]] through the native `graft_punct_count` scan when
    * available (count-identical — TextScanSpec), regexp_count otherwise
    * (r17 optimization round). */
  def punctRatioFast(spark: org.apache.spark.sql.SparkSession,
      text: Column): Column =
    (if (spark.catalog.functionExists("graft_punct_count"))
      call_function("graft_punct_count", text)
    else regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("long")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** [[qualityScore]] with the punctuation term through
    * [[punctRatioFast]] — identical arithmetic, native scan when the
    * session carries GraftExtensions. */
  def qualityScoreFast(spark: org.apache.spark.sql.SparkSession,
      text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(400.0), lit(1.0))
    val punctPenalty = least(punctRatioFast(spark, text) * lit(5.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    (lenScore * lit(0.5) + stopScore * lit(0.3) + (lit(1.0) - punctPenalty) * lit(0.2))
  }

  /** Character-n-gram language-ID heuristic: scores text against a tiny set
    * of per-language marker substrings and returns the argmax language code.
    * Deterministic CASE/score expression — mirrors fastText-style scoring at
    * the cheapest possible level. */
  def langIdHeuristic(text: Column): Column = {
    val t = lower(text)
    def score(markers: Seq[String]): Column =
      markers.map(m => when(t.contains(m), lit(1)).otherwise(lit(0))).reduce(_ + _)
    val en = score(Seq(" the ", " and ", " of ", " is "))
    val es = score(Seq(" el ", " la ", " de ", " que "))
    val fr = score(Seq(" le ", " la ", " et ", " est "))
    val de = score(Seq(" der ", " die ", " und ", " ist "))
    // argmax with fixed priority order on ties
    when(en >= es && en >= fr && en >= de, lit("en"))
      .when(es >= fr && es >= de, lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  // --- PII scrubbing (training-data curation): regex families chosen to
  //     behave identically under Java regex and RE2 (no lookarounds, no
  //     backreferences), applied email → ip → phone so the broader phone
  //     pattern can't eat address digits first.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe = "\\+?[0-9][0-9 -]{6,}[0-9]"

  /** Replace emails / IPv4 addresses / phone-like digit runs with typed
    * placeholder tokens — pure codegen'd regexp_replace chain, no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  // --- URL canonicalization (the CCNet/RefinedWeb URL-dedup key: crawls
  //     revisit the same page under scheme/case/tracking-param/fragment
  //     variants). Regexes avoid lookarounds so Java regex and RE2 agree.

  /** Canonicalize a URL for dedup keying: lowercase scheme+host, https →
    * http (scheme variants alias), strip the #fragment, strip tracking
    * params (utm_*, fbclid, gclid, ref), drop an then-empty '?', drop
    * one trailing slash (the root slash too: example.com and
    * example.com/ alias). Pure codegen'd regexp_replace chain —
    * scan-speed, no UDF. */
  def normalizeUrl(url: Column): Column = {
    // lowercase scheme://host (up to the first '/', '?' or '#'), keep
    // the rest as-is: split via capture groups
    val lowered = concat(
      lower(regexp_extract(url, "^([^/?#]*//[^/?#]*)", 1)),
      regexp_replace(url, "^[^/?#]*//[^/?#]*", ""))
    val scheme = regexp_replace(lowered, "^https://", "http://")
    val noFrag = regexp_replace(scheme, "#.*$", "")
    // tracking params: a non-final param promotes its successor onto the
    // separator ($1); applied twice so runs of up to three consecutive
    // tracking params resolve (regexp_replace consumes the separator, so
    // one pass skips adjacent matches); the tail form then drops a final
    // tracking param outright
    val trackMid = "([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&"
    val noTrackMid = regexp_replace(
      regexp_replace(noFrag, trackMid, "$1"), trackMid, "$1")
    val noTrack = regexp_replace(noTrackMid,
      "[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*", "")
    val noEmptyQ = regexp_replace(noTrack, "\\?$", "")
    regexp_replace(noEmptyQ, "([^/])/$", "$1")
  }

  /** Per-category PII hit counts on the raw text. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> size(regexp_extract_all(text, lit(emailRe), lit(0))).cast("long"),
    "n_ip" -> size(regexp_extract_all(text, lit(ipv4Re), lit(0))).cast("long"),
    "n_phone" -> size(regexp_extract_all(text, lit(phoneRe), lit(0))).cast("long"))

  /** Per-document unigram distribution statistics: whitespace token count,
    * distinct types, type-token ratio, and Shannon entropy in bits —
    * H = log2(n) − (Σ c·log2 c)/n over per-word counts c, the standard
    * diversity/perplexity proxy for corpus curation.
    *
    * Shape: explode → ONE (doc, word) partial+final count aggregate → one
    * per-doc aggregate. Both shuffles key on doc_id (the second reuses the
    * first's key prefix); no collect, no window over the corpus.
    *
    * Determinism: the Σ c·log2 c term is summed as exact scaled integers
    * (per-word floor(c·log2 c · 1e6 + 0.5) longs, ≤1e-6-bit quantization)
    * rather than raw doubles — a cross-row double sum depends on partition
    * and merge order, so the same corpus could hash differently run to
    * run (and engine to engine). Integer summation is order-free. */
  def unigramStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val wc = df
      .select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val term = col("__c").cast("double") * log2(col("__c").cast("double"))
    wc.groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("tokens"),
        count(lit(1)).as("types"),
        sum(floor(term * lit(1000000.0) + lit(0.5)).cast("long")).as("slc"))
      .select(col(idCol), col("tokens"), col("types"), col("slc"),
        (col("types").cast("double") / col("tokens").cast("double")).as("ttr"),
        (log2(col("tokens").cast("double")) -
          col("slc").cast("double") / lit(1000000.0) /
            col("tokens").cast("double")).as("entropy"))
  }

  /** Feature hashing (the hashing trick; MLlib HashingTF re-expressed with
    * the engine-portable md5 hash family so any engine derives identical
    * buckets): per document the term-frequency of each of `dim` hash
    * buckets, in long form (id, bucket, tf). One explode + one
    * partial+final count — the fixed-dim featurization step before
    * training linear models at corpus scale. */
  def hashingTf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    // 60-bit md5 prefix (PortableHash family) — always non-negative, so
    // plain % is safe and engine-identical
    val bucket = pmod(
      conv(substring(md5(col("__w").cast("binary")), 1, 15), 16, 10).cast("long"),
      lit(dim.toLong))
    df.select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Per-document cross-entropy against the CORPUS unigram distribution:
    * H(d, C) = −Σ_w (c_dw / n_d) · log2(p_C(w)) — the CCNet-style "how
    * surprising is this document under the corpus language model" quality
    * signal (low = boilerplate, high = rare-token noise; a real pipeline
    * swaps the unigram model for KenLM, same plan shape).
    *
    * Shape: per-doc word counts and corpus word counts are two hash
    * aggregates off one explode; the corpus distribution joins back on the
    * word (broadcast by AQE when the vocabulary is small, shuffle-hash
    * when not — vocabulary grows sublinearly in corpus size either way),
    * plus a 1-row total broadcast.
    *
    * CONTRACT: `df`'s vocabulary must be a subset of `corpus`'s (always
    * true when scoring a corpus against itself, the intended use). An
    * out-of-vocabulary word has probability 0 — infinite cross-entropy —
    * and is dropped by the inner join instead, silently shrinking
    * `tokens`; score against a superset corpus or pre-filter OOV docs.
    *
    * Determinism: the Σ c·log2 p term sums exact scaled integers
    * (per-word floor(term·1e6 + 0.5) longs), not raw doubles — see
    * [[unigramStats]]: cross-row double sums are partition-order- and
    * engine-summation-order-dependent. */
  def unigramCrossEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, corpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val docWc = df
      .select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val tok = corpus.select(explode(words(col(textCol))).as("__w"))
    val corpusWc = tok.groupBy(col("__w")).agg(count(lit(1)).as("__cw"))
    val total = tok.agg(count(lit(1)).as("__n"))
    val term = col("__c").cast("double") *
      log2(col("__cw").cast("double") / col("__n").cast("double"))
    docWc
      .join(corpusWc, Seq("__w"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("tokens"),
        sum(floor(term * lit(1000000.0) + lit(0.5)).cast("long")).as("__sxe"))
      .select(col(idCol), col("tokens"),
        (-(col("__sxe").cast("double") / lit(1000000.0) /
          col("tokens").cast("double"))).as("xent"))
  }

  /** Interpolated bigram-LM cross-entropy per document (the CCNet/KenLM
    * quality signal one order up from [[unigramCrossEntropy]]):
    *
    *   P(w_i | w_{i−1}) = λ·c(w_{i−1},w_i)/c(w_{i−1}·) + (1−λ)·c(w_i)/N
    *   xent(d) = −(1/B_d) Σ_{in-vocab bigrams} log2 P
    *
    * computed against `corpus` counts. Unseen bigrams/contexts fall back
    * to the unigram term alone (the interpolation's whole point). A
    * bigram whose SECOND word is absent from the corpus entirely has
    * P = 0 (infinite cross-entropy): such bigrams are EXCLUDED from the
    * xent numerator and denominator and counted in the `oov` output
    * column instead — silently summing log2(0) would deflate the score
    * (Spark log2(0) is null and vanishes from sum; DuckDB's is -inf).
    * Scoring a corpus against itself (the intended use) gives oov = 0
    * everywhere; a doc with no in-vocab bigram gets a null xent.
    *
    * Scale shape: corpus bigram counts, context totals, and unigram
    * counts are three partial+final aggregates over one exploded token
    * stream (vocabulary and bigram-vocabulary grow sublinearly in corpus
    * size); the doc side joins on the bigram / context / word keys —
    * never on documents — and the total-token count is a 1-row
    * broadcast. Per-doc xent is one final aggregate keyed on the id. */
  def bigramCrossEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, corpus: org.apache.spark.sql.DataFrame,
      lambda: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    def bigrams(d: org.apache.spark.sql.DataFrame, extra: Seq[Column])
        : org.apache.spark.sql.DataFrame = {
      val arr = words(col(textCol))
      d.filter(size(arr) >= 2)
        .select(extra :+ explode(transform(sequence(lit(1), size(arr) - 1),
          i => struct(element_at(arr, i).as("v"),
            element_at(arr, i + 1).as("w")))).as("__b"): _*)
        .select(extra :+ col("__b.v").as("__v") :+ col("__b.w").as("__w2"): _*)
    }
    val docBg = bigrams(df, Seq(col(idCol)))
      .groupBy(col(idCol), col("__v"), col("__w2"))
      .agg(count(lit(1)).as("__c"))
    val corpBg = bigrams(corpus, Seq.empty)
      .groupBy(col("__v"), col("__w2")).agg(count(lit(1)).as("__cvw"))
    val ctx = corpBg.groupBy(col("__v")).agg(sum(col("__cvw")).as("__cv"))
    val tok = corpus.select(explode(words(col(textCol))).as("__w2"))
    val uni = tok.groupBy(col("__w2")).agg(count(lit(1)).as("__cw"))
    val total = tok.agg(count(lit(1)).as("__n"))
    // (1−λ) as a runtime IEEE subtract so any SQL mirror (1.0 − λ) agrees
    val mu = lit(1.0) - lit(lambda)
    val inVocab = col("__cw").isNotNull
    val term = col("__c").cast("double") * log2(col("__p"))
    docBg
      .join(corpBg, Seq("__v", "__w2"), "left")
      .join(ctx, Seq("__v"), "left")
      .join(uni, Seq("__w2"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__p",
        lit(lambda) * coalesce(
          col("__cvw").cast("double") / col("__cv").cast("double"), lit(0.0)) +
          mu * coalesce(col("__cw").cast("double"), lit(0.0)) /
            col("__n").cast("double"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("bigrams"),
        sum(when(!inVocab, col("__c")).otherwise(lit(0L))).as("oov"),
        // scaled-integer term sum (see unigramStats) over in-vocab
        // bigrams only; all-OOV docs leave the sums null → null xent
        sum(when(inVocab,
          floor(term * lit(1000000.0) + lit(0.5)).cast("long"))).as("__s"),
        sum(when(inVocab, col("__c"))).as("__biv"))
      .select(col(idCol), col("bigrams"), col("oov"),
        (-(col("__s").cast("double") / lit(1000000.0) /
          col("__biv").cast("double"))).as("xent"))
  }

  /** Zipf-law exponent of the corpus word-frequency distribution: OLS
    * slope of log2(freq) against log2(rank) over the top `topN` words
    * (α ≈ −slope; natural text sits near α ≈ 1). The standard quick
    * diagnostic for synthetic/templated vs natural corpora.
    *
    * Shape: one word-count aggregate, one TakeOrdered top-N (the only
    * global step moves topN rows), a rank window over those topN rows,
    * and the closed-form slope from five moment sums — the
    * [[graft.learn.Learn.groupedOls]] formulation with one group. */
  def zipfSlope(docs: org.apache.spark.sql.DataFrame, textCol: String,
      topN: Int = 100): org.apache.spark.sql.DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val counts = docs
      .select(explode(words(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(topN)
    val ranked = counts.withColumn("__r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__c").desc, col("__w"))).cast("double"))
    graft.learn.Learn.groupedOls(
      ranked.select(lit(1L).as("__g"), log2(col("__r")).as("x"),
        log2(col("__c").cast("double")).as("y")),
      "__g", "x", "y")
      .select(col("n"), col("slope"), col("intercept"))
  }

  /** Okapi BM25 relevance of every document against a literal query-term
    * set — the standard lexical retrieval scorer (and the retrieval half
    * of a RAG data pipeline):
    *
    *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
    *                          (tf(t,d) + k1·(1 − b + b·|d|/avgdl)),
    *   idf(t)   = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))   (Lucene form,
    *                                                         always ≥ 0).
    *
    * Returns (idCol, score) for documents matching ≥ 1 term, round-4
    * (the per-doc Σ over terms is an order-dependent double sum).
    *
    * Scale shape: corpus stats (N, avgdl) are one 1-row aggregate
    * (broadcast); per-term df and idf collapse to |terms| rows
    * (broadcast); term frequencies are one explode filtered to the term
    * set BEFORE any shuffle — shuffle volume is matches only, not tokens.
    * The doc-length join stays keyed on the id. No corpus self-join, no
    * driver loop; |terms| is the (tiny) scale valve. */
  def bm25(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bm25 params out of range: k1=$k1 b=$b")
    val dl = docs.select(col(idCol), size(words(col(textCol))).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum("__dl").as("__sdl"))
    val tf = docs
      .select(col(idCol), explode(words(col(textCol))).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    val idf = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(stats))
      .select(col("__t"),
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))).as("__idf"))
    val avgdl = col("__sdl").cast("double") / col("__n").cast("double")
    tf.join(broadcast(idf), Seq("__t"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__term_score",
        col("__idf") * (col("__tf") * (lit(k1) + 1)) /
          (col("__tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("__dl").cast("double") / avgdl)))
      .groupBy(col(idCol))
      // scaled-integer term sum (see unigramStats): the per-doc Σ over
      // terms is otherwise summation-order-dependent, and the score is a
      // top-k selection key downstream
      .agg(sum(floor(col("__term_score") * lit(1000000.0) + lit(0.5))
        .cast("long")).as("__s"))
      .select(col(idCol),
        round(col("__s").cast("double") / lit(1000000.0), 4).as("score"))
  }
}
