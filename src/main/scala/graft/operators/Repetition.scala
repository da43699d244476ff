package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Intra-document repetition signals for training-data curation — the
  * Gopher/MassiveText repetition filters (Rae et al. 2021, table A1) and
  * their RefinedWeb/Dolma descendants: documents whose text loops are
  * low-quality for LM training and get dropped by thresholds on exactly
  * these fractions.
  *
  *  - `uniq_word_frac`  distinct words / total words (array-level, no
  *    shuffle).
  *  - `top2_frac`       characters covered by the single most frequent
  *    word 2-gram: count × len(gram) / n_chars, ties broken
  *    lexicographically.
  *  - `dup5_frac`       fraction of 5-gram occurrences whose gram appears
  *    more than once in the document.
  *
  * Scale shape: two explode → partial/final count aggregates keyed by
  * (doc, gram) — no gram ever crosses documents, so the shuffle key is
  * wide and skew-free regardless of corpus-level stop-phrases; the
  * per-doc reductions then join back id-to-id. Grams never leave their
  * aggregation (only counts), so memory per task is bounded by the
  * longest single document, not the corpus.
  */
object Repetition {

  private def wordNgrams(ws: org.apache.spark.sql.Column, n: Int) =
    // guard: sequence(1, 0) would COUNT DOWN in Spark, not return empty
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(typedlit(Seq.empty[String]))

  def signals(docs: DataFrame, textCol: String, idCol: String,
      nCharsCol: String): DataFrame = {
    val ws = TextFunctions.words(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"),
      col(nCharsCol).cast("double").as("n_chars"),
      ws.as("ws"))

    val uniq = base.select(col("doc_id"),
      (size(array_distinct(col("ws"))).cast("double") /
        size(col("ws")).cast("double")).as("uniq_word_frac"))

    val bg = base.select(col("doc_id"), col("n_chars"),
        explode(wordNgrams(col("ws"), 2)).as("g"))
      .groupBy("doc_id", "n_chars", "g").agg(count(lit(1)).as("c"))
    val top2 = bg
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("c").desc, col("g"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        (col("c").cast("double") * length(col("g")).cast("double") /
          col("n_chars")).as("top2_frac"))

    val g5 = base.select(col("doc_id"), explode(wordNgrams(col("ws"), 5)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).cast("double") /
        sum(col("c")).cast("double")).as("dup5_frac"))

    uniq.join(top2, Seq("doc_id"), "left").join(g5, Seq("doc_id"), "left")
  }

  /** Line-level repetition fractions — the remaining Gopher table A1
    * rows ("duplicate line fraction" / "duplicate line character
    * fraction"):
    *  - `dup_line_frac`: fraction of line OCCURRENCES whose exact line
    *    text appears more than once within the document;
    *  - `dup_line_char_frac`: fraction of characters inside such lines.
    * Exact rationals (BIGINT/BIGINT single division) — no rounding
    * needed for engine comparison. Same scale shape as [[signals]]: the
    * count aggregate is keyed (doc, line) so no line ever crosses
    * documents, and per-task memory is bounded by one document. */
  def lineSignals(docs: DataFrame, textCol: String, idCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("__l"))
    lines.groupBy(col("doc_id"), col("__l")).agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(
        (sum(when(col("__c") > 1, col("__c")).otherwise(lit(0L))).cast("double") /
          sum(col("__c")).cast("double")).as("dup_line_frac"),
        (sum(when(col("__c") > 1, col("__c") * length(col("__l")))
            .otherwise(lit(0L))).cast("double") /
          sum(col("__c") * length(col("__l"))).cast("double"))
          .as("dup_line_char_frac"))
  }
}
