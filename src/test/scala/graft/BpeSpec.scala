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
