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
    var syms = w.map(_.toString).toVector
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

  private def refTokens(text: String,
      merges: Seq[(String, String)] = PinnedBpe.merges): Long =
    text.split(" ", -1).map(w => refEncodeWord(w, merges).length.toLong).sum

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
      "aaaa aaa aa a", "zzz", "z", "", " ", "  a  b ")
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
      " ", "  a  b ", "a b c")
    def refSeq(text: String): Seq[String] =
      text.split(" ", -1).toSeq.flatMap(w => refEncodeWord(w, merges))
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
