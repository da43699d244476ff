package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, TextScan}

/** Pins the r17 native single-pass text scans byte/count-identical to
  * their java.util.regex twins (the graft_bpe_pretok differential
  * convention): graft_text_normalize vs the two-regexp normalize chain,
  * graft_retok_count vs regexp_count(alternation), graft_punct_count vs
  * regexp_count(char class) — on adversarial inputs (unicode incl.
  * surrogate pairs, control chars incl. the java-\s set, space runs,
  * leading/trailing/only whitespace, empties) and on the fixture corpus.
  */
class TextScanSpec extends SparkSpecBase {
  import spark.implicits._

  private val adversarial = Seq(
    "",
    " ",
    "   ",
    "Hello, World!",
    "  leading and trailing  ",
    "a  b   c    d",
    "UPPER lower MiXeD 123 456",
    "tabs\tand\nnewlines\rand\u000Bvtab\fff",
    "punct!@#$%^&*()_+-=[]{};':\",./<>?`~",
    "café résumé naïve Über",
    "你好世界 mixed ascii 中文",
    "emoji 😀🎉 pair 👍",
    "digits12and34letters56",
    "a.b,c;d:e f-g_h",
    "\u0000ctl\u0001chars\u001Fhere",
    "ends with space ",
    " starts with space",
    "only!!!punct???",
    "éèêë all removed by normalize",
    "A" * 3000 + " " + "b" * 10 + "!" * 40)

  private def df = adversarial.toDF("t")

  test("graft_text_normalize == the two-regexp normalize chain, byte-exact") {
    assert(spark.catalog.functionExists("graft_text_normalize"))
    val rows = df.select(
      TextFunctions.normalize($"t").as("re"),
      TextFunctions.normalizeFast(spark, $"t").as("nat")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"normalize diverged: '${r.getString(0)}' vs '${r.getString(1)}'"))
  }

  test("graft_retok_count == regexp_count(alternation), per input") {
    val rows = df.select(
      TextFunctions.regexTokenCount($"t").as("re"),
      TextFunctions.regexTokenCountFast(spark, $"t").as("nat")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"retok count diverged: ${r.getLong(0)} vs ${r.getLong(1)}"))
  }

  test("graft_punct_count == regexp_count(char class), per input") {
    val rows = df.select(
      regexp_count($"t", lit("[^A-Za-z0-9\\s]")).cast("long").as("re"),
      call_function("graft_punct_count", $"t").as("nat")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"punct count diverged: ${r.getLong(0)} vs ${r.getLong(1)}"))
  }

  test("qualityScoreFast == qualityScore on the fixture corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = docs.select(
      TextFunctions.qualityScore(col("text")).as("re"),
      TextFunctions.qualityScoreFast(spark, col("text")).as("nat"),
      TextFunctions.md5Fingerprint(col("text")).as("fpre"),
      TextFunctions.md5FingerprintFast(spark, col("text")).as("fpnat")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
      assert(r.getString(2) == r.getString(3))
    }
  }

  test("native shingle hashes == HOF chain exactly (values AND order)") {
    // r18: graft_shingle_hashes must be VALUE-exact to
    // array_distinct(transform(shingles(text, n), xxhash64)) — hash drift
    // would silently change LSH candidate recall. Adversarial inputs plus
    // shingle-specific shapes: space runs (empty words), trailing spaces,
    // repeated shingles (distinct order), docs shorter than n.
    val texts = (adversarial ++ Seq(
      "a b c a b c a b c",
      "x x x x x",
      "one two", // W < 3
      "w1 w2 w3",
      "  double  spaced  words  here  ",
      "word " * 40)).toDF("t")
    for (n <- Seq(2, 3, 5)) {
      val hof = org.apache.spark.sql.functions.array_distinct(
        org.apache.spark.sql.functions.transform(
          TextFunctions.shingles(col("t"), n),
          s => org.apache.spark.sql.functions.xxhash64(s)))
      val rows = texts.select(hof.as("a"),
        org.apache.spark.sql.functions.call_function(
          "graft_shingle_hashes", col("t"),
          org.apache.spark.sql.functions.lit(n)).as("b")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"shingle hashes diverged at n=$n: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
    }
  }

  test("scan functions are direct twins at the JVM level too") {
    // belt-and-braces: the pure functions against java.util.regex directly
    val retokRe = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")
    val punctRe = java.util.regex.Pattern.compile("[^A-Za-z0-9\\s]")
    adversarial.foreach { s =>
      def count(p: java.util.regex.Pattern): Long = {
        val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
      }
      assert(TextScan.retokCount(s) == count(retokRe), s"retok on '$s'")
      assert(TextScan.punctCount(s) == count(punctRe), s"punct on '$s'")
      val lowered = s.toLowerCase(java.util.Locale.ROOT)
      val expect = lowered.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ")
        .stripPrefix(" ").stripSuffix(" ")
      val got = TextScan.normalizeLowered(
        org.apache.spark.unsafe.types.UTF8String.fromString(lowered)).toString
      assert(got == expect, s"normalize on '$s': '$got' vs '$expect'")
    }
  }
}
