package graft

import org.apache.spark.sql.functions._
import graft.functions.{PinnedBpe, TextFunctions}

/** The string-replace BPE encoder (TextFunctions.bpeTokenCount) against
  * an INDEPENDENT symbol-vector reference implementation of classic BPE
  * encoding — merges applied in rank order, each exhaustively over the
  * symbol sequence (the textbook algorithm). The two implementations
  * share nothing but the pinned merge table. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference: encode one word (no spaces) to its BPE symbol count. */
  private def refEncodeWord(w: String,
      merges: Seq[(String, String)]): Vector[String] = {
    // initial symbols are code points (astral chars stay whole — the
    // r16 contract shared with mergeWord and the '(.)' chain regex)
    var syms = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + cc); i += cc
      }
      b.result()
    }
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** The shared word-split contract (r16): whitespace-CLASS boundaries,
    * reserved control chars (U+0000/U+0001/U+001F) stripped from words. */
  private def refWords(text: String): Seq[String] =
    text.split("[ \\t\\n\\r]", -1).toSeq
      .map(_.filterNot(c => c == '\u0000' || c == '\u0001' || c == '\u001F'))
      .filter(_.nonEmpty)

  private def refTokens(text: String,
      merges: Seq[(String, String)] = PinnedBpe.merges): Long =
    refWords(text).map(w => refEncodeWord(w, merges).length.toLong).sum

  private def colTokens(texts: Seq[String],
      merges: Seq[(String, String)] = PinnedBpe.merges): Seq[Long] =
    texts.toDF("text")
      .select(TextFunctions.bpeTokenCount(col("text"), merges).as("n"))
      .as[Long].collect().toSeq

  test("adversarial strings match the reference encoder exactly") {
    // repeated-pair runs, overlapping candidates, cross-word boundaries,
    // multi-char-symbol merges, empty-ish inputs
    val merges = Vector(("a", "a"), ("aa", "aa"), ("a", "b"), ("ab", "c"),
      ("x", "ab"), ("b", "a"))
    val cases = Seq(
      "a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaaaa",
      "ab", "abc", "abab", "ababab", "xab", "xabc",
      "ba", "bab", "abba",
      "a a", "aa aa", "ab ab", "a b", "abc xabc ba",
      "aaaa aaa aa a", "zzz", "z")
    val got = colTokens(cases, merges)
    val want = cases.map(refTokens(_, merges))
    for (((c, g), w) <- cases.zip(got).zip(want))
      assert(g == w, s"'$c': column=$g reference=$w")
  }

  test("pinned merge table on fixture-like text matches the reference") {
    val cases = Seq(
      "the customer orders a small vector batch",
      "scan filter join merge order by custkey",
      "column vector hash partition window slow fast",
      "aaa the the the join join",
      "q")
    val got = colTokens(cases)
    for ((c, g) <- cases.zip(got))
      assert(g == refTokens(c), s"'$c': column=$g reference=${refTokens(c)}")
  }

  test("fixture documents: column == reference on 60 real docs, and merges actually bite") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").orderBy($"doc_id").limit(60)
      .as[(Long, String)].collect()
    val got = colTokens(docs.map(_._2).toSeq)
    for (((id, text), g) <- docs.zip(got))
      assert(g == refTokens(text), s"doc $id diverged")
    // the pinned merges compress below whitespace*chars and above words:
    // chars > bpe tokens > word count must hold on real text
    val (text0, g0) = (docs.head._2, got.head)
    val words0 = text0.split(" ").length.toLong
    assert(g0 < text0.count(_ != ' ') && g0 >= words0,
      s"bpe=$g0 chars=${text0.count(_ != ' ')} words=$words0")
  }

  private def fastTokens(texts: Seq[String],
      merges: Seq[(String, String)] = PinnedBpe.merges): Seq[Long] =
    texts.toDF("text")
      .select(TextFunctions.bpeTokenCountFast(spark, col("text"), merges).as("n"))
      .as[Long].collect().toSeq

  test("fast native encoder == replace chain == reference on adversarial strings") {
    val merges = Vector(("a", "a"), ("aa", "aa"), ("a", "b"), ("ab", "c"),
      ("x", "ab"), ("b", "a"))
    val cases = Seq(
      "a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaaaa",
      "ab", "abc", "abab", "ababab", "xab", "xabc",
      "ba", "bab", "abba",
      "a a", "aa aa", "ab ab", "a b", "abc xabc ba",
      "aaaa aaa aa a", "zzz", "z", "", " ", "  a  b ",
      // whitespace CLASS boundaries + reserved-control deletion (r16):
      // newlines/tabs/CRs split words; U+0000/U+0001/U+001F vanish
      "a\nb", "ab\nab", "a\ta\r\na", "\n\nab", "a\u001Fb", "a\u0000b c", "\u001F", "ab\t \u0001cab")
    assert(spark.catalog.functionExists("graft_bpe_count"),
      "spec session must register GraftExtensions")
    val fast = fastTokens(cases, merges)
    val chain = colTokens(cases, merges)
    val ref = cases.map(refTokens(_, merges))
    for (((c, f), (ch, r)) <- cases.zip(fast).zip(chain.zip(ref)))
      assert(f == ch && f == r, s"'$c': fast=$f chain=$ch reference=$r")
  }

  test("fast encoder == replace chain on the pinned table over fixture docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").orderBy($"doc_id").limit(80)
      .as[String].collect().toSeq
    assert(fastTokens(docs) === colTokens(docs))
  }

  test("tokenizer-scale trained table: fast == reference, plan O(1) in merges") {
    // train a mid-size table — far beyond what a per-merge replace chain
    // plan should ever carry (the fixture's 31-word lexicon exhausts at
    // ~89 merges, so the tokenizer-scale lexicon is synthetic)
    val vocab = graft.functions.PinnedBpeGen.syntheticVocab(1200)
    val merges = graft.functions.PinnedBpeGen.trainFast(vocab, 2000)
    assert(merges.length >= 1000, s"lexicon trained only ${merges.length}")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").orderBy($"doc_id").limit(40)
      .as[String].collect().toSeq
    val fast = fastTokens(docs, merges)
    for ((d, f) <- docs.zip(fast))
      assert(f == refTokens(d, merges), s"doc diverged at ${merges.length} merges")
    // the plan must not grow with the vocabulary: one expression node,
    // however many merges
    val plan = docs.toDF("text")
      .select(TextFunctions.bpeTokenCountFast(spark, col("text"), merges))
      .queryExecution.analyzed.toString
    assert(plan.linesIterator.size < 10, "plan grew with the merge table")
  }

  test("fallback without the native expression: chain at gate scale, loud beyond") {
    val small = Vector(("a", "a"), ("a", "b"))
    val cases = Seq("aab ab", "aaaa")
    // nativeAvailable=false at gate-scale merges → the replace chain,
    // identical counts
    val viaFallback = cases.toDF("text")
      .select(TextFunctions.bpeTokenCountImpl(false, col("text"), small).as("n"))
      .as[Long].collect().toSeq
    assert(viaFallback === cases.map(refTokens(_, small)))
    // a tokenizer-scale table without the native expression must refuse
    // rather than build a per-merge plan
    val big = Vector.tabulate(600)(i => (s"q$i", "z"))
    val e = intercept[IllegalArgumentException] {
      TextFunctions.bpeTokenCountImpl(false, col("text"), big)
    }
    assert(e.getMessage.contains("graft_bpe_count"))
  }

  test("trainFast == train: identical merge sequences") {
    import graft.functions.PinnedBpeGen
    // the fixture lexicon (exhausts at ~89 merges — covers the early-stop path)
    val vocab = PinnedBpeGen.vocabOf(spark,
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    assert(PinnedBpeGen.trainFast(vocab, 120) === PinnedBpeGen.train(vocab, 120))
    // a synthetic lexicon with heavy tie traffic
    val syn = PinnedBpeGen.syntheticVocab(300)
    assert(PinnedBpeGen.trainFast(syn, 500) === PinnedBpeGen.train(syn, 500))
  }

  test("tokenizer-scale trainFast: 10k merges train and encode consistently") {
    import graft.functions.PinnedBpeGen
    val syn = PinnedBpeGen.syntheticVocab(8000)
    val t0 = System.nanoTime()
    val merges = PinnedBpeGen.trainFast(syn, 10000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length >= 10000, s"only ${merges.length} merges from 8k words")
    assert(secs < 60.0, f"trainFast took $secs%.1f s — the delta trainer regressed")
    // fast encoder over the 10k table == the independent reference encoder
    val docs = Seq(
      syn.take(50).map(_._1).mkString(" "),
      syn.slice(100, 140).map(_._1).mkString(" "),
      "unseen zz" + syn.head._1)
    val fast = fastTokens(docs, merges)
    for ((d, f) <- docs.zip(fast))
      assert(f == refTokens(d, merges), "10k-merge fast encode diverged")
  }

  test("bpeTokenize: native sequences == fallback == reference, counts consistent") {
    val merges = Vector(("a", "a"), ("aa", "aa"), ("a", "b"), ("ab", "c"),
      ("x", "ab"), ("b", "a"))
    val cases = Seq(
      "a", "aaaa", "ab ab", "abc xabc ba", "aaaa aaa aa a", "zzz", "",
      " ", "  a  b ", "a b c",
      "a\nb", "ab\txab\r\nba", "a\u001Fb c", "\u0000", "x\u0001ab")
    def refSeq(text: String): Seq[String] =
      refWords(text).flatMap(w => refEncodeWord(w, merges))
    val native = cases.toDF("text")
      .select(TextFunctions.bpeTokenize(spark, col("text"), merges).as("t"))
      .as[Seq[String]].collect().toSeq
    val fallback = cases.toDF("text")
      .select(TextFunctions.bpeTokenizeImpl(false, col("text"), merges).as("t"))
      .as[Seq[String]].collect().toSeq
    for (((c, n), f) <- cases.zip(native).zip(fallback)) {
      assert(n == refSeq(c), s"native '$c': $n != ${refSeq(c)}")
      assert(f == refSeq(c), s"fallback '$c': $f != ${refSeq(c)}")
      assert(n.length.toLong == refTokens(c, merges), s"count mismatch '$c'")
    }
    // pinned table over fixture docs: sequence length == the count column
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").orderBy($"doc_id").limit(40)
    val both = docs.select(
      size(TextFunctions.bpeTokenize(spark, col("text"))).cast("long").as("a"),
      TextFunctions.bpeTokenCount(col("text")).as("b"))
      .as[(Long, Long)].collect()
    assert(both.forall(p => p._1 == p._2))
  }

  test("bpePretokenize: category-run splits compose with every path") {
    val merges = Vector(("a", "a"), ("a", "b"), ("1", "2"), ("!", "!"))
    // reference pretokenizer: maximal letter / digit / punct runs
    def preRef(text: String): String =
      "([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+)".r
        .replaceAllIn(text, m => " " + java.util.regex.Matcher.quoteReplacement(m.group(1)) + " ")
    val cases = Seq(
      "ab12cd", "a1b2", "hello,world!", "x=y+1", "ab!!ab", "a b", "",
      "line1\nline2", "a1!b2?c3", "...", "12 34ab", "aab12aab")
    val got = cases.toDF("text")
      .select(
        TextFunctions.bpeTokenCountFast(spark,
          TextFunctions.bpePretokenize(col("text")), merges).as("f"),
        TextFunctions.bpeTokenCount(
          TextFunctions.bpePretokenize(col("text")), merges).as("c"),
        TextFunctions.bpeTokenize(spark,
          TextFunctions.bpePretokenize(col("text")), merges).as("t"))
      .as[(Long, Long, Seq[String])].collect()
    for ((txt, (f, c, t)) <- cases.zip(got)) {
      val want = refTokens(preRef(txt), merges)
      assert(f == want && c == want && t.length.toLong == want,
        s"'$txt': fast=$f chain=$c seq=${t.length} want=$want")
      // category purity: no emitted token mixes letter/digit/punct classes
      def cls(ch: Char) = if (ch.isLetter) 0 else if (ch.isDigit) 1 else 2
      assert(t.forall(tok => tok.map(cls).distinct.size == 1),
        s"'$txt': mixed-category token in $t")
    }
    // merges can never cross a category boundary once pretokenized:
    // ("b","1") trained or not, "b1" never fuses
    val fused = Seq("ab1").toDF("text")
      .select(TextFunctions.bpeTokenize(spark,
        TextFunctions.bpePretokenize(col("text")), Vector(("b", "1"))).as("t"))
      .as[Seq[String]].collect().head
    assert(fused == Seq("a", "b", "1"), s"category boundary crossed: $fused")
  }

  test("bpeEncodeIds: native ids == independent reference mapping; fallback agrees") {
    import graft.functions.BpeVocab
    val merges = Vector(("a", "a"), ("aa", "aa"), ("a", "b"), ("ab", "c"),
      ("x", "ab"), ("b", "a"))
    val syms = BpeVocab.symbols(merges) // default ascii alphabet, no specials
    val idOf = syms.zipWithIndex.toMap
    def refIds(text: String): Seq[Int] =
      refWords(text).flatMap(w => refEncodeWord(w, merges)).map(idOf)
    val cases = Seq(
      "a", "aaaa", "ab ab", "abc xabc ba", "zzz", "", "a\nb",
      "hello, world! 123", "a b c", "x=y+1")
    val native = cases.toDF("text")
      .select(TextFunctions.bpeEncodeIds(spark, col("text"), merges).as("i"))
      .as[Seq[Int]].collect().toSeq
    val fallback = cases.toDF("text")
      .select(TextFunctions.bpeEncodeIdsImpl(false, col("text"), merges,
        BpeVocab.asciiAlphabet, Vector.empty, None).as("i"))
      .as[Seq[Int]].collect().toSeq
    for (((c, n), f) <- cases.zip(native).zip(fallback)) {
      assert(n == refIds(c), s"native '$c': $n != ${refIds(c)}")
      assert(f == refIds(c), s"fallback '$c': $f != ${refIds(c)}")
    }
    // ids are 1:1 with the token sequence when the alphabet covers text
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").orderBy($"doc_id").limit(40)
    val both = docs.select(
      size(TextFunctions.bpeEncodeIds(spark, col("text"))).cast("long").as("a"),
      TextFunctions.bpeTokenCountFast(spark, col("text")).as("b"))
      .as[(Long, Long)].collect()
    assert(both.forall(p => p._1 == p._2))
  }

  test("bpeEncodeIds: specials pass through whole-word; OOV ladder is char -> unk -> loud") {
    import graft.functions.BpeVocab
    val merges = Vector(("a", "b"))
    val specials = Vector("<|doc|>", "<unk>")
    val syms = BpeVocab.symbols(merges, BpeVocab.asciiAlphabet, specials)
    assert(syms.take(2) == specials) // specials get ids 0, 1
    def ids(text: String, unk: Option[String]): Seq[Int] =
      Seq(text).toDF("text")
        .select(TextFunctions.bpeEncodeIds(spark, col("text"), merges,
          BpeVocab.asciiAlphabet, specials, unk).as("i"))
        .as[Seq[Int]].collect().head
    // a word exactly equal to a special bypasses merging (one id);
    // the same chars NOT word-isolated decompose per char
    val got = ids("ab <|doc|> ab x<|doc|>", Some("<unk>"))
    val abId = syms.indexOf("ab")
    assert(got.head == abId && got(1) == 0, s"passthrough broke: $got")
    assert(got.count(_ == 0) == 1, s"non-isolated special must decompose: $got")
    // OOV char -> unk when designated
    val eAcute = ids("caf\u00E9", Some("<unk>"))
    assert(eAcute.last == 1, s"unk fallback broke: $eAcute")
    // without an unk: LOUD (ConvertToLocalRelation may evaluate the
    // expression at optimize time, so the error can surface unwrapped)
    val e = intercept[Throwable] { ids("caf\u00E9", None) }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("not in the vocab alphabet")), s"got: $e")
    // fallback path refuses specials loudly (cannot replay passthrough)
    val e2 = intercept[IllegalArgumentException] {
      TextFunctions.bpeEncodeIdsImpl(false, col("text"), merges,
        BpeVocab.asciiAlphabet, specials, None)
    }
    assert(e2.getMessage.contains("graft_bpe_ids"))
    // vocab round-trip: serialize -> parse preserves ids/specials/unk
    val tbl = BpeVocab.parse(BpeVocab.serialize(merges,
      BpeVocab.asciiAlphabet, specials, Some("<unk>")))
    assert(tbl.unkId == 1 && tbl.specials.contains("<|doc|>")
      && tbl.ids.get("ab") == abId && tbl.size == syms.length)
  }

  test("native graft_bpe_pretok == the regexp pretokenizer, byte-identical") {
    val cases = Seq(
      "", " ", "ab12cd", "a1b2", "hello,world!", "x=y+1", "ab!!ab",
      "line1\nline2\tmore", "...", "12 34ab", "a  b", "\n\r\t",
      "caf\u00E9 12", "a\uD83D\uDE00b", "!@#$%^", "A1a!B2b?")
    val got = cases.toDF("text").select(
      TextFunctions.bpePretokenizeFast(spark, col("text")).as("fast"),
      TextFunctions.bpePretokenize(col("text")).as("re"))
      .as[(String, String)].collect()
    assert(spark.catalog.functionExists("graft_bpe_pretok"))
    for ((c, (f, r)) <- cases.zip(got))
      assert(f == r, s"'$c': native='$f' regex='$r'")
  }

  test("bpeEncodeIds byte fallback: every unicode input encodes, nothing dropped") {
    import graft.functions.BpeVocab
    val merges = Vector(("a", "b"))
    def ids(text: String): Seq[Int] =
      Seq(text).toDF("text")
        .select(TextFunctions.bpeEncodeIds(spark, col("text"), merges,
          BpeVocab.asciiAlphabet, Vector.empty, None, byteFallback = true).as("i"))
        .as[Seq[Int]].collect().head
    val syms = BpeVocab.symbols(merges, BpeVocab.asciiAlphabet,
      Vector.empty, byteFallback = true)
    val byteBase = syms.indexOf("<0x00>")
    assert(byteBase == 0 && syms(0xC3) == "<0xC3>") // bytes lead (no specials)
    // U+00E9 (two UTF-8 bytes 0xC3 0xA9) and U+1F600 (four bytes, a
    // surrogate PAIR in UTF-16 — must decompose as one code point)
    val eAcute = ids("caf\u00E9")
    assert(eAcute.takeRight(2) == Seq(byteBase + 0xC3, byteBase + 0xA9), s"$eAcute")
    val grin = ids("a\uD83D\uDE00b")
    assert(grin.slice(1, 5) ==
      Seq(0xF0, 0x9F, 0x98, 0x80).map(byteBase + _), s"$grin")
    // ascii path unaffected; ab still merges
    assert(ids("ab").length == 1)
    // round-trip through serialize/parse keeps byteBase
    val tbl = BpeVocab.parse(BpeVocab.serialize(merges,
      BpeVocab.asciiAlphabet, Vector.empty, None, byteFallback = true))
    assert(tbl.byteBase == 0 && tbl.unkId == -1)
  }

  test("vocabOf truncation is LOUD; a tolerance keeps the top words (r16)") {
    import graft.functions.PinnedBpeGen
    // 60 distinct words, Zipf-ish counts — more than maxWords=10
    val docs = (0 until 60).map(i => ("w" + i + " ") * (61 - i))
      .toDF("text")
    val e = intercept[IllegalArgumentException] {
      PinnedBpeGen.vocabOf(spark, docs, maxWords = 10)
    }
    assert(e.getMessage.contains("count mass"))
    // explicit tolerance: top-10 by count, deterministic order
    val kept = PinnedBpeGen.vocabOf(spark, docs, maxWords = 10,
      maxDroppedMass = 0.9)
    assert(kept.length == 10 && kept.head._1 == "w0" && kept.head._2 == 61L)
    assert(kept.map(_._2).toSeq == kept.map(_._2).sorted(Ordering[Long].reverse).toSeq)
    // capped merges silently DIFFER from full-vocabulary merges — the
    // reason truncation must be loud: pin the difference on this lexicon
    val full = PinnedBpeGen.vocabOf(spark, docs, maxWords = 100)
    assert(full.length == 60)
    val capped = PinnedBpeGen.trainFast(kept, 40)
    val whole = PinnedBpeGen.trainFast(full, 40)
    assert(capped != whole, "expected the capped lexicon to train different merges")
  }

  test("bpeDecodeIds round trip: decode(encode(x)) == whitespace-collapsed x (r17)") {
    import graft.functions.{BpeVocab, TextFunctions => TF}
    val sp = Vector("<ws>")
    val ws = Some("<ws>")
    def roundTrip(texts: Seq[String],
        merges: Seq[(String, String)]): Seq[String] =
      texts.toDF("text")
        .select(TF.bpeDecodeIds(spark,
          TF.bpeEncodeIds(spark, col("text"), merges,
            specials = sp, wordSep = ws),
          merges, specials = sp, wordSep = ws).as("d"))
        .as[String].collect().toSeq
    def norm(x: String): String =
      x.filterNot(c => c == '\u0000' || c == '\u0001' || c == '\u001F')
        .split("[ \t\n\r]+").filter(_.nonEmpty).mkString(" ")
    val cases = Seq(
      "a", "ab ab", "abc xabc ba", "  a  b ", "a\nb\tc\r\nd", "",
      " \t ", "hello, world! 123", "x=y+1 q", "ab c")
    // pinned 48-merge table
    for ((c, d) <- cases.zip(roundTrip(cases, PinnedBpe.merges)))
      assert(d == norm(c), s"'$c': decoded '$d' != '${norm(c)}'")
    // 10k-merge trained table — the tokenizer-scale pin
    val syn = graft.functions.PinnedBpeGen.syntheticVocab(8000)
    val big = graft.functions.PinnedBpeGen.trainFast(syn, 10000)
    val docs = Seq(
      syn.take(60).map(_._1).mkString(" "),
      "unseen zz " + syn.slice(200, 230).map(_._1).mkString("\n"))
    for ((c, d) <- docs.zip(roundTrip(docs, big)))
      assert(d == norm(c), s"10k round trip diverged")
    // WITHOUT wordSep the stream is documented-lossy: words concatenate
    val flat = Seq("a b c").toDF("text")
      .select(TF.bpeDecodeIds(spark,
        TF.bpeEncodeIds(spark, col("text"), PinnedBpe.merges)).as("d"))
      .as[String].collect().head
    assert(flat == "abc", s"flat decode: '$flat'")
    // fallback decode (no native expression) == native on the flat path
    val fb = Seq("ab ab x").toDF("text")
      .select(TF.bpeDecodeIdsImpl(false,
        TF.bpeEncodeIds(spark, col("text"), PinnedBpe.merges,
          specials = sp, wordSep = ws),
        PinnedBpe.merges, BpeVocab.asciiAlphabet, sp, None,
        wordSep = ws).as("d"))
      .as[String].collect().head
    assert(fb == "ab ab x", s"fallback decode: '$fb'")
  }

  test("bpeDecodeIds: byte runs, specials passthrough, loud unknown ids (r17)") {
    import graft.functions.{BpeVocab, TextFunctions => TF}
    val merges = Vector(("a", "b"))
    val sp = Vector("<|doc|>", "<ws>")
    val ws = Some("<ws>")
    def rt(text: String): String =
      Seq(text).toDF("text")
        .select(TF.bpeDecodeIds(spark,
          TF.bpeEncodeIds(spark, col("text"), merges, specials = sp,
            byteFallback = true, wordSep = ws),
          merges, specials = sp, byteFallback = true, wordSep = ws).as("d"))
        .as[String].collect().head
    // multi-byte runs reassemble exactly: 2-byte é, 4-byte emoji glued
    // to an in-alphabet char, and a special token passing through
    assert(rt("caf\u00E9 x") == "caf\u00E9 x")
    assert(rt("a\uD83D\uDE00b <|doc|> c") == "a\uD83D\uDE00b <|doc|> c")
    // direct decodeIds: malformed byte run renders U+FFFD (REPLACE), and
    // an out-of-vocab id is LOUD
    val tbl = BpeVocab.parse(BpeVocab.serialize(merges,
      BpeVocab.asciiAlphabet, Vector.empty, None, byteFallback = true))
    val lone = graft.functions.BpeEncode.decodeIds(
      Array(tbl.byteBase + 0xC3), tbl) // dangling UTF-8 lead byte
    assert(lone == "\uFFFD", s"malformed run: '$lone'")
    val e = intercept[IllegalArgumentException] {
      graft.functions.BpeEncode.decodeIds(Array(999999), tbl)
    }
    assert(e.getMessage.contains("outside the vocabulary"))
    // serialize refuses a non-special wordSep, duplicate specials, and
    // byte-pseudo-symbol-named specials (r16 ADVICE)
    intercept[IllegalArgumentException] {
      BpeVocab.serialize(merges, wordSep = Some("<ws>"))
    }
    intercept[IllegalArgumentException] {
      BpeVocab.symbols(merges, specials = Vector("<s>", "<s>"))
    }
    intercept[IllegalArgumentException] {
      BpeVocab.symbols(merges, specials = Vector("<0x41>"),
        byteFallback = true)
    }
    // the ids fallback refuses byteFallback at CALL time, not per-row
    val e2 = intercept[IllegalArgumentException] {
      TF.bpeEncodeIdsImpl(false, col("text"), merges,
        BpeVocab.asciiAlphabet, Vector.empty, None, byteFallback = true)
    }
    assert(e2.getMessage.contains("graft_bpe_ids"))
    // decode fallback refuses byteFallback loudly too
    val e3 = intercept[IllegalArgumentException] {
      TF.bpeDecodeIdsImpl(false, col("text"), merges,
        BpeVocab.asciiAlphabet, Vector.empty, None, byteFallback = true)
    }
    assert(e3.getMessage.contains("graft_bpe_decode"))
  }

  test("trainDistributed == trainFast: identical merges, no driver-lexicon ceiling (r17)") {
    import graft.functions.PinnedBpeGen
    // the synthetic lexicon (heavy tie traffic) — distributed rounds
    // must reproduce the driver trainer's merge sequence exactly
    val syn = PinnedBpeGen.syntheticVocab(1000)
    val wordsDf = syn.toSeq.toDF("w", "count")
    val dist = PinnedBpeGen.trainDistributedFromCounts(wordsDf, 80)
    assert(dist === PinnedBpeGen.trainFast(syn, 80))
    // early stop when the vocabulary is fully merged
    val tiny = Seq(("ab", 5L), ("ba", 3L)).toDF("w", "count")
    val all = PinnedBpeGen.trainDistributedFromCounts(tiny, 100)
    assert(all.length < 100 && all.nonEmpty)
    assert(all === PinnedBpeGen.trainFast(Array(("ab", 5L), ("ba", 3L)), 100))
    // the ceiling case (r17 VERDICT #3): a lexicon where maxWords
    // truncation would CHANGE the merges — vocabOf refuses loudly, and
    // the distributed path trains the full corpus without truncating
    val docs = (0 until 60).map(i => ("w" + i + " ") * (61 - i)).toDF("text")
    intercept[IllegalArgumentException] {
      PinnedBpeGen.vocabOf(spark, docs, maxWords = 10)
    }
    val full = PinnedBpeGen.vocabOf(spark, docs, maxWords = 100)
    assert(PinnedBpeGen.trainDistributed(spark, docs, 40)
      === PinnedBpeGen.trainFast(full, 40))
  }

  test("BpeStore: persist/load round trip, loud mismatch, integrity check (r17)") {
    import graft.functions.{BpeStore, BpeVocab}
    val name = "graft_spec_tok"
    BpeStore.drop(spark, name)
    val tok = BpeStore.Tokenizer(
      merges = Vector(("a", "b"), ("ab", "c")),
      specials = Vector("<|doc|>", "<unk>", "<ws>"),
      unk = Some("<unk>"),
      byteFallback = true,
      wordSep = Some("<ws>"))
    BpeStore.persist(spark, name, tok)
    // identical re-persist is a no-op (foreachBatch replay safety)
    BpeStore.persist(spark, name, tok)
    val loaded = BpeStore.load(spark, name)
    assert(loaded == tok, "load must reconstruct the exact recipe")
    // the loaded tokenizer encodes/decodes bit-equal to the in-driver one
    val got = Seq("abc <|doc|> caf\u00E9").toDF("text")
      .select(
        loaded.decodeIds(spark, loaded.encodeIds(spark, col("text"))).as("rt"),
        TextFunctions.bpeDecodeIds(spark,
          TextFunctions.bpeEncodeIds(spark, col("text"), tok.merges,
            tok.alphabet, tok.specials, tok.unk, tok.byteFallback,
            tok.wordSep),
          tok.merges, tok.alphabet, tok.specials, tok.unk,
          tok.byteFallback, tok.wordSep).as("direct"))
      .as[(String, String)].collect().head
    assert(got._1 == got._2 && got._1 == "abc <|doc|> caf\u00E9")
    // a DIFFERENT tokenizer under the same name fails loudly
    val e = intercept[IllegalArgumentException] {
      BpeStore.persist(spark, name,
        tok.copy(merges = Vector(("x", "y"))))
    }
    assert(e.getMessage.contains("DIFFERENT"))
    // integrity: a hand-edited table fails the load check — swap the
    // word_sep field to a DIFFERENT valid special, so the stored
    // vocab_spec no longer matches the stored construction fields
    val tblDf = spark.table(s"${name}_bpe")
    val schema = tblDf.schema
    val r0 = tblDf.collect().head
    val bad = org.apache.spark.sql.Row.fromSeq(
      r0.toSeq.updated(schema.fieldIndex("word_sep"), "<unk>"))
    BpeStore.drop(spark, name)
    spark.createDataFrame(
        java.util.Collections.singletonList(bad), schema)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${name}_bpe")
    val e2 = intercept[IllegalArgumentException] {
      BpeStore.load(spark, name)
    }
    assert(e2.getMessage.contains("integrity"))
    BpeStore.drop(spark, name)
    // loading an absent tokenizer is loud
    val e3 = intercept[IllegalArgumentException] {
      BpeStore.load(spark, "graft_spec_tok_absent")
    }
    assert(e3.getMessage.contains("persist"))
  }

  test("merge count drives compression monotonically") {
    val text = "the customer orders join the column vector"
    val full = refTokens(text)
    val none = refTokens(text, Vector.empty)
    val half = refTokens(text, PinnedBpe.merges.take(24))
    assert(none == text.count(_ != ' ').toLong) // no merges = char count
    assert(full <= half && half <= none && full < none)
    assert(colTokens(Seq(text), Vector.empty).head == none)
    assert(colTokens(Seq(text), PinnedBpe.merges.take(24)).head == half)
  }
}
