package graft.functions

import org.apache.spark.sql.{Column, SparkSession}

/** Persisted tokenizer contract (r17 VERDICT #5): a crawl-loop pipeline
  * must tokenize every batch with the SAME (merges, vocab) pair it
  * started with — a silently re-trained or hand-swapped vocabulary
  * re-tokenizes new batches inconsistently with the packed history,
  * which nothing downstream can detect. This is the dedup-index
  * `<prefix>_params` discipline applied to the tokenizer: the full
  * construction recipe persists as a catalog table, loads enforce
  * integrity, and persisting a DIFFERENT tokenizer under an existing
  * name fails loudly (identical re-persist is a no-op, so foreachBatch
  * replays are safe).
  *
  * Ref mars has no tokenizer — LLM-pipeline-brief surface; gated by
  * ext_bpe_ids_persisted (persist → load → encode == the in-driver
  * table's DuckDB replay) and op_stream_bpe_persisted (a streaming
  * batch re-tokenized against the loaded tokenizer, bit-equal to the
  * batch replay).
  */
object BpeStore {

  /** The full construction recipe — everything [[TextFunctions]]'
    * encode/decode paths parameterize on. Value-equal iff the two
    * tokenizers produce identical id streams. */
  final case class Tokenizer(
      merges: Vector[(String, String)],
      alphabet: Vector[String] = BpeVocab.asciiAlphabet,
      specials: Vector[String] = Vector.empty,
      unk: Option[String] = None,
      byteFallback: Boolean = false,
      wordSep: Option[String] = None) {

    def encodeIds(spark: SparkSession, text: Column): Column =
      TextFunctions.bpeEncodeIds(spark, text, merges, alphabet, specials,
        unk, byteFallback, wordSep)

    def decodeIds(spark: SparkSession, ids: Column): Column =
      TextFunctions.bpeDecodeIds(spark, ids, merges, alphabet, specials,
        unk, byteFallback, wordSep)

    def tokenCount(spark: SparkSession, text: Column): Column =
      TextFunctions.bpeTokenCountFast(spark, text, merges)

    /** The serialized (merges, vocab) literal pair — also the integrity
      * fingerprint [[load]] re-derives and checks. */
    private[functions] def specs: (String, String) =
      (BpeEncode.serialize(merges),
        BpeVocab.serialize(merges, alphabet, specials, unk, byteFallback,
          wordSep))
  }

  private def tableName(name: String) = s"${name}_bpe"

  /** Persist `tok` as `<name>_bpe`. Same-name semantics (the params-
    * table contract): an IDENTICAL tokenizer no-ops (replay-idempotent —
    * a foreachBatch restart may call this again), a DIFFERENT one fails
    * loudly at persist time, never silently re-tokenizes. */
  def persist(spark: SparkSession, name: String, tok: Tokenizer): Unit = {
    val tbl = tableName(name)
    if (spark.catalog.tableExists(tbl)) {
      val existing = load(spark, name)
      require(existing == tok,
        s"persisted tokenizer '$name' already exists with DIFFERENT " +
          s"content (${existing.merges.size} merges vs ${tok.merges.size}; " +
          "specs differ) — re-tokenizing against a mismatched vocabulary " +
          "silently corrupts the id stream; drop the table or pick a new " +
          "name")
      return
    }
    val (mergesSpec, vocabSpec) = tok.specs
    import spark.implicits._
    // the in-memory catalog is fresh per JVM but the warehouse DIR
    // persists — an orphan location from a prior run must not block the
    // (catalog-checked-fresh) create; saveAsTable refuses it even under
    // overwrite, so clear it explicitly (the op_bucketed_join recipe)
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
    }
    Seq((mergesSpec, vocabSpec, tok.alphabet, tok.specials,
        tok.unk.orNull, tok.byteFallback, tok.wordSep.orNull,
        tok.merges.size))
      .toDF("merges_spec", "vocab_spec", "alphabet", "specials", "unk",
        "byte_fallback", "word_sep", "n_merges")
      .write.mode("overwrite").format("parquet").saveAsTable(tbl)
  }

  /** Load `<name>_bpe` and verify integrity: the stored vocab spec must
    * equal the one re-derived from the stored construction fields — a
    * hand-edited or format-skewed table fails loudly instead of
    * decoding to a shifted id table. */
  def load(spark: SparkSession, name: String): Tokenizer = {
    val tbl = tableName(name)
    require(spark.catalog.tableExists(tbl),
      s"no persisted tokenizer '$name' ($tbl missing) — BpeStore.persist " +
        "it first")
    val rows = spark.table(tbl).collect()
    require(rows.length == 1,
      s"persisted tokenizer table $tbl must hold exactly one row, " +
        s"found ${rows.length}")
    val r = rows.head
    def s(n: String) = r.getString(r.fieldIndex(n))
    val tok = Tokenizer(
      merges = BpeEncode.parseMerges(s("merges_spec")),
      alphabet = r.getSeq[String](r.fieldIndex("alphabet")).toVector,
      specials = r.getSeq[String](r.fieldIndex("specials")).toVector,
      unk = Option(s("unk")),
      byteFallback = r.getBoolean(r.fieldIndex("byte_fallback")),
      wordSep = Option(s("word_sep")))
    val (mergesSpec, vocabSpec) = tok.specs
    require(mergesSpec == s("merges_spec") && vocabSpec == s("vocab_spec"),
      s"persisted tokenizer '$name' failed its integrity check — the " +
        "stored specs do not match the stored construction fields (table " +
        "edited or written by an incompatible version)")
    require(r.getInt(r.fieldIndex("n_merges")) == tok.merges.size,
      s"persisted tokenizer '$name' merge count mismatch")
    tok
  }

  /** Drop `<name>_bpe` (test/maintenance convenience). */
  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(name)}")
}
