package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale document corpora: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash.
  *
  * Reference surface: drop_duplicates/duplicated with tree/subset/shuffle
  * strategies (mars/dataframe/base/drop_duplicates.py:35,
  * base/_duplicate.py:32-42). The LSH-family operators extend that to the
  * near-duplicate detection a training-data pipeline needs.
  *
  * Scale design: everything is shuffle-on-key (shingle, band-bucket, or
  * fingerprint) — no crossJoin of the corpus with itself. Candidate
  * generation emits only colliding pairs; exact verification runs per pair.
  * At 100 TB the dominant cost is one exchange of (key, doc_id) pairs per
  * band, which AQE coalesces/skew-splits automatically.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns, keeping the row with the lowest
    * `order` value per key (pandas keep='first' with an explicit order —
    * the reference itself relaxes positional semantics under parallelism).
    * Implemented as min-over-group + semi join back, which is
    * partial-aggregatable (cheaper at scale than a row_number window over
    * the full data). */
  def dropDuplicates(df: DataFrame, keys: Seq[String], order: String): DataFrame = {
    val firstPerKey = df.groupBy(keys.map(col): _*)
      .agg(min(col(order)).as(order))
    df.join(firstPerKey, keys :+ order, "left_semi")
  }

  /** Exact text dedup via md5 of normalized text. Returns the kept rows. */
  def exactTextDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    dropDuplicates(
      docs.withColumn("__fp", TextFunctions.md5Fingerprint(col(textCol))),
      Seq("__fp"), idCol)
      .drop("__fp")

  /** All near-duplicate pairs by exact word-n-gram Jaccard >= `threshold`.
    * Exact (not approximate): explode distinct shingles, self-join on the
    * shingle, count common shingles per pair, compute |A∩B| / |A∪B|.
    *
    * Output: (doc_a, doc_b, common, size_a, size_b, jaccard), doc_a < doc_b.
    *
    * Scale: the shingle join is a hash shuffle on the shingle string. Very
    * frequent shingles (stop-phrases) blow up pairs quadratically, so
    * shingles occurring in more than `maxShingleDf` docs are dropped —
    * standard df-cap used by web-scale dedup pipelines. */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.distinctShingles(col(textCol), n)).as("sh"))
    val shCapped = maxShingleDf match {
      case Some(cap) =>
        val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("sh")
        sh.join(freq, Seq("sh"), "left_semi")
      case None => sh
    }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = shCapped.select(col("doc_id").as("doc_a"), col("sh"))
    val b = shCapped.select(col("doc_id").as("doc_b"), col("sh"))
    val common = a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("size_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("size_b")), Seq("doc_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature: `numHashes` permutation-style hashes of the distinct
    * shingle set, h_i(s) = (a_i * x + b_i) mod p over a murmur base hash.
    * Pure expression — evaluated once per document at scan speed. */
  def minhashSignature(shingleArr: Column, numHashes: Int, seed: Long = 42L): Column = {
    val p = 2147483647L // 2^31 - 1
    val hashes = (0 until numHashes).map { i =>
      val a = 1L + 2L * Math.floorMod(mix64(seed + 2L * i), 1000000000L)
      val b = Math.floorMod(mix64(seed + 2L * i + 1), 1000000000L)
      // min over shingles of (a * h(x) + b) mod p
      array_min(transform(shingleArr, s => {
        val h = pmod(hash(s).cast("long"), lit(p))
        pmod(h * lit(a) + lit(b), lit(p))
      }))
    }
    array(hashes: _*)
  }

  /** LSH banding: group the signature into `bands` bands of `rowsPerBand`,
    * emit (band_id, band_hash) keys; docs colliding on any band key are
    * candidate pairs. Returns (doc_a, doc_b) distinct candidates.
    *
    * With numHashes = bands * rowsPerBand, the usual S-curve applies:
    * P(candidate) = 1 - (1 - j^rows)^bands for true Jaccard j. */
  def minhashLshCandidates(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = docs.select(
      col(idCol).as("doc_id"),
      minhashSignature(
        TextFunctions.distinctShingles(col(textCol), n), numHashes, seed).as("sig"))
    val banded = sig.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** MinHash-LSH near-dup pairs with exact Jaccard verification of the
    * candidates — the standard two-phase pipeline (approximate recall from
    * LSH, exact precision from verification). */
  def minhashDedupPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val cands = minhashLshCandidates(docs, textCol, idCol, n, bands, rowsPerBand)
    val shingled = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.distinctShingles(col(textCol), n).as("shs"))
    cands
      .join(shingled.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), Seq("doc_a"))
      .join(shingled.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), Seq("doc_b"))
      .withColumn("common", size(array_intersect(col("shs_a"), col("shs_b"))))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("shs_a")) + size(col("shs_b")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over word tokens: per-bit weighted vote of token
    * hashes. Documents within `maxHamming` of each other are near-dups.
    * Returns (id, simhash) — pair generation pivots on rotated prefixes
    * (see [[simhashNearDupPairs]]). */
  def simhash64(text: Column): Column = {
    val w = TextFunctions.words(text)
    val bits = (0 until 64).map { b =>
      // vote: +1 if token hash bit b set, else -1; simhash bit = vote >= 0
      val vote = aggregate(w, lit(0L), (acc, tok) => {
        val h = xxhash64(tok)
        acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, lit(1L)).otherwise(lit(-1L))
      })
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup candidate pairs: block on 4 16-bit quarters (two docs
    * within Hamming distance 3 must agree on at least one quarter), verify
    * with exact Hamming distance. */
  def simhashNearDupPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sig"))
    val blocked = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(q =>
        shiftrightunsigned(col("sig"), q * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .select(col("doc_id"), col("sig"), col("pos").as("q"), col("col").as("block"))
    val a = blocked.select(col("q"), col("block"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = blocked.select(col("q"), col("block"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("q", "block"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
