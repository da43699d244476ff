package graft

import org.apache.spark.sql.functions._
import graft.operators.Repetition

/** Hand-computed expectations for the Gopher-style repetition signals. */
class RepetitionSpec extends SparkSpecBase {
  import spark.implicits._

  test("repetition signals match hand-computed fractions") {
    // doc 1: "a b a b a b" (12 chars)
    //   words = 6, distinct {a, b} -> uniq 2/6
    //   2-grams: "a b" x3, "b a" x2 -> top "a b": 3 * 3 chars / 12 = 0.75
    //   5-grams: "a b a b a", "b a b a b" -> all unique -> dup5 = 0
    // doc 2: "x x x x x x" (11 chars)
    //   uniq 1/6; top 2-gram "x x" x5 -> 5*3/11; 5-grams "x x x x x" x2 -> dup5 = 1
    val docs = Seq(
      (1L, "a b a b a b", 12L),
      (2L, "x x x x x x", 11L)).toDF("doc_id", "text", "n_chars")
    val got = Repetition.signals(docs, "text", "doc_id", "n_chars")
      .orderBy($"doc_id")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2.0 / 6.0, 0.75, 0.0),
      (2L, 1.0 / 6.0, 15.0 / 11.0, 1.0)))
  }

  test("lineSignals: duplicate line and char fractions are exact rationals") {
    // doc 1: lines aa, b, aa, c -> dup occurrences 2/4; chars 4/(4+1+1)
    // doc 2: all lines unique -> both fractions 0
    val docs = Seq(
      (1L, "aa\nb\naa\nc"),
      (2L, "one\ntwo\nthree")).toDF("doc_id", "text")
    val got = Repetition.lineSignals(docs, "text", "doc_id")
      .orderBy($"doc_id")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 0.5, 2.0 / 3.0), (2L, 0.0, 0.0)))
  }

  test("acf matches the hand-computed autocorrelation of 1,2,3,4") {
    import graft.operators.Sessionize
    val s = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (1L, 4L, 4.0))
      .toDF("k", "t", "x")
    val got = Sessionize.acf(s, "k", "t", "x", maxLag = 3)
      .orderBy($"lag").as[(Long, Long, Double)].collect().toSeq
    // mean 2.5, den 5; lag1 1.25/5, lag2 -1.5/5, lag3 -2.25/5
    assert(got == Seq((1L, 1L, 0.25), (1L, 2L, -0.3), (1L, 3L, -0.45)))
  }

  test("short documents yield empty n-gram sets, not descending sequences") {
    val docs = Seq((1L, "only three words", 16L)).toDF("doc_id", "text", "n_chars")
    val got = Repetition.signals(docs, "text", "doc_id", "n_chars")
      .select($"doc_id", $"dup5_frac").collect()
    assert(got.length == 1)
    assert(got.head.isNullAt(1), "no 5-grams -> left join null, not a crash")
  }
}
