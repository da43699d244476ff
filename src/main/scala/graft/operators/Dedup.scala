package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Re-spread a narrow scan before CPU-heavy fan-out work (shingle
    * explosion, MinHash signature folds, md5 normalization). A small input
    * that arrives as one or two file splits would otherwise serialize the
    * whole map phase behind a single core; a big input already scans wide
    * and passes through untouched. The round-robin exchange moves only the
    * raw input rows — strictly cheaper than single-threading the n×
    * fan-out that follows. Every consumer below is order-insensitive
    * (min/groupBy/signature folds), so the nondeterministic round-robin
    * placement cannot change results. */
  private[operators] def fanOutScan(df: DataFrame,
      sized: Boolean = false): DataFrame = {
    if (df.isStreaming) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      // r10: `sized = true` fans out only to the input-byte-sized width —
      // right when the downstream per-byte CPU is LIGHT (one md5 / url
      // normalization per row: at sf0.1 two 32-near-empty-task stages
      // were pure scheduling overhead on the ext_dedup_exact floor, the
      // r9 jaccard-exchange lesson again). Heavy fan-out consumers
      // (shingle explosion + MinHash signature folds, CPU ∝ shingles ≫
      // input bytes) keep the full width: an A/B at sf0.1 showed sizing
      // THEM regressed minhash 0.8→1.5 s while sizing md5-only paths cut
      // exact 1.16→1.01 s. At real scale both variants no-op (wide scans
      // pass through; sizedWidth clamps to the configured width).
      val width = if (sized) math.min(p, sizedWidth(df)) else p
      if (df.rdd.getNumPartitions * 2 < width) df.repartition(width) else df
    }
  }

  /** Exchange width proportional to the (compressed) input size — the
    * scale-aware form of a hard `numShufflePartitions` pin for exchanges
    * whose downstream fan-out must keep explicit width (AQE-exempt
    * REPARTITION_BY_NUM, see the ngramJaccardPairs note): a small corpus
    * gets a few tasks (r9 measurement: per-task scheduling overhead, not
    * compute, dominated the sf0.1 jaccard floor at 3 × 32-task stages on a
    * 0.6 MB input), a big corpus saturates the configured width — ~1 task
    * per 256 KiB of input file bytes, read from scan METADATA (no data
    * pass; at 100 TB the clamp hits the configured width immediately).
    * Falls back to the configured width when file sizes are unknowable
    * (non-file sources). */
  private[operators] def sizedWidth(df: DataFrame): Int = {
    val confWidth = df.sparkSession.sessionState.conf.numShufflePartitions
    val bytes = inputBytes(df)
    if (bytes < 0) confWidth
    else derivedSizedWidth(bytes, confWidth)
  }

  /** Compressed on-disk bytes behind `df`'s file scans, from scan METADATA
    * (no data pass); -1 when unknowable (non-file sources). */
  private[graft] def inputBytes(df: DataFrame): Long =
    try {
      val files = df.inputFiles
      if (files.isEmpty) -1L
      else files.map { p =>
        val uri = new java.net.URI(p)
        if (uri.getScheme == null || uri.getScheme == "file")
          new java.io.File(uri.getPath).length
        else -1L
      }.sum
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** The [[sizedWidth]] arithmetic as a pure function (WidthSpec pins it):
    * ~1 task per 256 KiB of input bytes, clamped to the configured width. */
  private[graft] def derivedSizedWidth(bytes: Long, confWidth: Int): Int =
    math.max(1L, math.min(confWidth.toLong, bytes / (256L << 10) + 1)).toInt

  /** Exchange width for an EXPLOSION-shaped pipeline (r15, closing the r14
    * perf-weak mark): a shingle explosion shuffles ~`fanOut`× its input
    * bytes, so a width derived from input bytes alone under-parallelizes
    * exactly when it matters — the 1000× PPJoin cell pushed 28 GB of
    * shuffle through 32 input-derived tasks (~850 MB each, 27 GB spill);
    * the hand pin SPARK_GRAFT_SHUFFLE=128 halved spill (PERF.md r14).
    * This encodes that pin: width = max(the small-input sizedWidth floor,
    * estimated shuffle bytes / 128 MB), where estimated shuffle bytes =
    * input bytes × `fanOut` — allowed to EXCEED the configured width, up
    * to the same fleet-aware cap as [[graft.api.GraftSession.scaleShuffleWidth]]
    * (4 waves per core slot). Small inputs are untouched (the fan-out term
    * rounds to zero below ~6 MB of input at fanOut 20, and the sizedWidth
    * term keeps its scheduling-overhead floor), so the sf0.1 gate plans
    * are byte-identical. Falls back to the configured width when input
    * bytes are unknowable. */
  private[graft] def fanOutWidth(df: DataFrame, fanOut: Long): Int = {
    val confWidth = df.sparkSession.sessionState.conf.numShufflePartitions
    val bytes = inputBytes(df)
    if (bytes < 0) confWidth
    else derivedFanOutWidth(bytes, fanOut, confWidth,
      graft.api.GraftSession.widthCap(
        df.sparkSession.sparkContext.defaultParallelism))
  }

  /** The [[fanOutWidth]] arithmetic as a pure function (WidthSpec pins it). */
  private[graft] def derivedFanOutWidth(bytes: Long, fanOut: Long,
      confWidth: Int, cap: Long): Int =
    math.min(cap, math.max(derivedSizedWidth(bytes, confWidth).toLong,
      bytes * fanOut / (128L << 20))).toInt

  /** Measured shuffle-to-input byte ratio of a word-shingle explosion
    * (PERF.md r14: the 1000× PPJoin corpus shuffled ≈20× its compressed
    * input bytes through the shingle exchange). */
  private[operators] val ShingleFanOut = 20L

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

  /** Keep-first dedup as ONE aggregation: min_by pulls every non-key column
    * from the row with the lowest `order` per key. Shuffles whole rows once
    * — cheaper than [[dropDuplicates]]' two-scan semi-join when rows are
    * narrow (the reference's tree-vs-shuffle strategy choice,
    * base/_duplicate.py:32, reduced to picking between these two plans).
    * Requires `order` values unique within each key. */
  def dropDuplicatesNarrow(df: DataFrame, keys: Seq[String], order: String): DataFrame = {
    val others = df.columns.filterNot(c => keys.contains(c) || c == order).toSeq
    val aggCols = min(col(order)).as(order) +:
      others.map(c => min_by(col(c), col(order)).as(c))
    df.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(df.columns.toSeq.map(col): _*)
  }

  /** Exact text dedup via md5 of normalized text. Returns the kept rows. */
  def exactTextDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    dropDuplicates(
      fanOutScan(docs, sized = true).withColumn("__fp",
        TextFunctions.md5FingerprintFast(docs.sparkSession, col(textCol))),
      Seq("__fp"), idCol)
      .drop("__fp")

  /** URL-level dedup — the CCNet/RefinedWeb FIRST pass, before any
    * content dedup (crawls revisit one page under scheme / case /
    * tracking-param / fragment variants; the reference has no analog):
    * canonicalize with [[TextFunctions.normalizeUrl]], keep the min-id
    * document per canonical URL. Same keep-first semi-join shape as
    * [[exactTextDedup]] — only (key, id) pairs shuffle for the keep
    * decision, never document bodies. The canonical key survives as
    * `url_norm`. */
  def urlDedup(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    dropDuplicates(
      fanOutScan(docs, sized = true).withColumn("__url_norm",
        TextFunctions.normalizeUrl(col(urlCol))),
      Seq("__url_norm"), idCol)
      .withColumnRenamed("__url_norm", "url_norm")

  /** Exact LINE-level dedup across the corpus (the RefinedWeb/CCNet exact
    * substring pass that runs before document-level dedup): every line is
    * kept only at its FIRST occurrence over the total order
    * (idCol, line position) — later copies of boilerplate headers,
    * navigation, license blocks vanish from every other document. The doc
    * is reassembled from its surviving lines in original order.
    *
    * Shape: posexplode lines → one row_number window keyed by the line
    * text (the shuffle is on the line, so hot boilerplate lines land
    * together and everything else is near-unique) → per-doc ordered
    * reassembly via sort_array(collect_list(struct(idx, line))) — the
    * collect is bounded by single-document size, never corpus size.
    * Returns (idCol, n_lines_kept, text) with text '\n'-joined. */
  def lineDedup(docs: DataFrame, textCol: String, idCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col(idCol), col("pos").cast("long").as("__idx"), col("col").as("__line"))
    // r10: keep-first is a pure MIN aggregate over (id, idx) — partial
    // aggregation collapses a mega-hot boilerplate line map-side, where
    // the previous row_number window pinned all its occurrences on one
    // (AQE-unsplittable) task. Lexicographic struct-min == first
    // occurrence over the total order, so results are identical.
    val kept = lines
      .groupBy(col("__line"))
      .agg(min(struct(col(idCol), col("__idx"))).as("__f"))
      .select(col("__f").getField(idCol).as(idCol),
        col("__f").getField("__idx").as("__idx"), col("__line"))
    kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("__idx"), col("__line")))),
          s => s.getField("__line")), sep).as("text"))
  }

  /** Exact duplicated-substring removal at word level (the ExactSubstr
    * pass of Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better", re-expressed as distributed n-gram coverage instead
    * of a monolithic suffix array): every word position covered by an
    * n-word gram occurrence that is NOT the gram's first occurrence in
    * the total order (idCol, start position) is removed, and each
    * document is reassembled from its surviving words in original order.
    * The first copy of any duplicated span — cross-document boilerplate
    * or a within-document repeat — survives; all later copies vanish.
    *
    * Reference surface: corpus-level exact dedup beyond whole-row
    * drop_duplicates (mars/dataframe/base/drop_duplicates.py:35), the
    * same keep-first contract as [[lineDedup]] one granularity finer.
    *
    * Scale shape: grams are hashed to 60-bit md5 longs in the scan
    * projection (gram strings never shuffle); ONE exchange on the gram
    * hash ranks occurrences keep-first (hot boilerplate grams land
    * together, everything else is near-unique — the [[lineDedup]] skew
    * profile). Coverage then costs ONE exchange of the word stream: dup
    * starts union with the words and a single per-doc running-max window
    * (the interval-merge trick — covered ⟺ max over starts s ≤ i of
    * s+n−1 reaches i) marks erased positions with O(1) state per row;
    * the reassembly aggregate reuses the same per-doc partitioning.
    * Per-doc state is bounded by single-document size, never corpus
    * size.
    *
    * Returns (idCol, n_words_kept, text); fully-erased documents stay
    * present with n_words_kept = 0 and text = ''. */
  def substringSpanDedup(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"substringSpanDedup needs n >= 2, got $n")
    val base = fanOutScan(docs)
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
    val words = base
      .select(col(idCol), posexplode(col("__ws")))
      .select(col(idCol), col("pos").cast("long").as("__i"), col("col").as("__w"))
    // gram start j covers word positions [j, j+n); 60-bit portable md5 hash
    // (the oracle-checkable family — xxhash64 would be engine-specific)
    val grams = base
      .filter(size(col("__ws")) >= n)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(col("__ws")) - lit(n)),
        j => conv(substring(md5(array_join(slice(col("__ws"), j + lit(1), lit(n)), " ")), 1, 15), 16, 10)
          .cast("long"))))
      .select(col(idCol), col("pos").cast("long").as("__s"), col("col").as("__gh"))
    // r10: non-first occurrences = grams minus the per-gram struct-min,
    // as a join against the partial-aggregated min side instead of a
    // row_number window — a stop-phrase gram's occurrences previously
    // sorted on ONE window task (AQE cannot split window partitions);
    // the SMJ here is skew-splittable and the min side collapses
    // map-side. Lexicographic struct-min == keep-first total order.
    val firstPerGram = grams.groupBy(col("__gh"))
      .agg(min(struct(col(idCol).as("__fid"), col("__s").as("__fs"))).as("__f"))
    val dupStarts = grams
      .join(firstPerGram, Seq("__gh"))
      .filter(!(col(idCol) === col("__f").getField("__fid") &&
        col("__s") === col("__f").getField("__fs")))
      .select(col(idCol), col("__s").as("__i"),
        lit(null).cast("string").as("__w"), lit(1).as("__start"))
    // interval merge: at equal position the start sorts first (__start
    // desc), so a duplicate span starting at i erases the word at i
    val merge = Window.partitionBy(col(idCol))
      .orderBy(col("__i"), col("__start").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = words
      .withColumn("__start", lit(0))
      .unionByName(dupStarts)
      .withColumn("__covEnd",
        max(when(col("__start") === 1, col("__i") + lit(n - 1).cast("long"))
          .otherwise(lit(-1L))).over(merge))
      .filter(col("__start") === 0 && col("__covEnd") < col("__i"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("__i"), col("__w")))),
          s => s.getField("__w")), " ").as("text"))
    docs.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words_kept"), lit(0L)).as("n_words_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** All near-duplicate pairs by exact word-n-gram Jaccard >= `threshold`.
    * Exact (not approximate): explode distinct shingles, self-join on the
    * shingle, count common shingles per pair, compute |A∩B| / |A∪B|.
    *
    * Output: (doc_a, doc_b, common, size_a, size_b, jaccard), doc_a < doc_b.
    *
    * Scale: the shingle join is a hash shuffle on the 64-bit shingle hash
    * (strings never leave the scan). Very frequent shingles (stop-phrases)
    * blow up pairs quadratically, so shingles occurring in more than
    * `maxShingleDf` docs are dropped — the standard df-cap used by
    * web-scale dedup pipelines. The cap defaults on (1000): exact
    * all-pairs over an uncapped stop-phrase shingle is quadratic no
    * matter how it's expressed. Pass `None` only for small-corpus exact
    * baselines. */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDf: Option[Int] = Some(1000),
      maxPairsPerShingle: Long = 1L << 22): DataFrame = {
    val shRaw = fanOutScan(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.hashedShingles(col(textCol), n)).as("sh"))
    // Explicit-width hash exchange on the shingle: this boundary feeds the
    // C(df,2) pair EXPLOSION, so it must stay at full cluster width — AQE's
    // byte-based coalescing sees only the small pre-explosion lists and
    // would funnel the entire pair fan-out through one task.
    // (REPARTITION_BY_NUM is exempt from AQE coalescing.) The aggregation
    // below reuses this partitioning, so no second exchange is planned.
    val sh = shRaw.repartition(fanOutWidth(docs, ShingleFanOut), col("sh"))
    // One aggregation groups doc ids per shingle; pair generation then
    // explodes the C(df, 2) combinations per shingle directly — same
    // output as the self-join formulation but with half the shuffle
    // volume and no join build side.
    //
    // The df-cap applies BEFORE any full per-shingle list can exist, in one
    // of two formulations:
    //  - native (extension sessions, long ids): `graft_collect_capped`
    //    bounds every aggregation buffer — map-side partial, shuffle block,
    //    reduce merge — at cap+1 longs and evaluates over-cap groups to
    //    NULL. One shuffle total; a stop-phrase shingle with df=10^8 costs
    //    cap+1 longs of memory, ever.
    //  - fallback: pre-count shingle df (partial-aggregatable, no lists),
    //    keep only the OVER-cap shingles — a tiny set (stop-phrases) — and
    //    broadcast anti-join them out of the shingle stream before the
    //    collect_list. (Anti-joining the tiny over-cap set is a narrow
    //    broadcast probe; semi-joining the huge under-cap complement was a
    //    sort-merge join costing ~40% of the query's runtime at sf0.1.)
    val nativeCap = sh.sparkSession.catalog.functionExists("graft_collect_capped") &&
      sh.schema("doc_id").dataType == org.apache.spark.sql.types.LongType
    val byShingle = maxShingleDf match {
      case Some(cap) if nativeCap =>
        sh.groupBy("sh")
          .agg(call_function("graft_collect_capped", col("doc_id"), lit(cap)).as("ids"))
          .filter(col("ids").isNotNull)
      case Some(cap) =>
        val overCap = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sh")
        sh.join(broadcast(overCap), Seq("sh"), "left_anti")
          .groupBy("sh").agg(collect_list(col("doc_id")).as("ids"))
      case None =>
        sh.groupBy("sh").agg(collect_list(col("doc_id")).as("ids"))
    }
    // Sizes measured over the SAME capped shingle universe as the
    // intersection counts, so jaccard's numerator and denominator are
    // consistent when a df-cap is in effect. Derived from byShingle (not
    // from a third scan of the text): the byShingle exchange subtree is
    // identical to the pair path's, so ReuseExchange/AQE stage reuse
    // evaluates the shingle hashing + shuffle once and the sizes agg only
    // pays an explode + a doc_id shuffle of per-doc counts. Without a cap
    // the size is just the per-doc distinct-shingle count — read straight
    // off the scan with no shuffle.
    val sizes = maxShingleDf match {
      case Some(_) =>
        byShingle.select(explode(col("ids")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      case None =>
        docs.select(col(idCol).as("doc_id"),
          size(TextFunctions.hashedShingles(col(textCol), n)).cast("long").as("sz"))
    }
    // Pair generation as two chained posexplodes + a position filter
    // (i < j over the per-shingle SORTED id list, so a < b for free):
    // generators stream row-at-a-time (per-row memory linear in df — the
    // single flattened C(df,2)-struct array the r2 version built in one
    // row was an OOM risk for uncapped stop-phrase shingles) and stay in
    // codegen. The r8 transform(slice(...)) suffix-pair formulation
    // evaluated an interpreted higher-order lambda per pair and was the
    // query's dominant stage at ~0.75 s (sf0.1, r9 stage profile); this
    // shape emits 2× the rows (df² filtered to C(df,2)) but cut that
    // stage ~4× — see PERF.md r9.
    // r18 (VERDICT r17 item 5): a LOUD worst-case valve on the per-shingle
    // pair fan-out — under the default df-cap C(1000,2) ≈ 5·10⁵ pairs per
    // shingle is bounded, but a caller-raised cap or the uncapped
    // exact-baseline path (maxShingleDf = None) could hit a stop-phrase
    // shingle whose C(df,2) explosion stalls the stage quadratically and
    // silently. Exceeding the budget now fails fast with the offending df
    // instead; within budget the predicate is constant-true, so the result
    // (and the fixture oracle) is unchanged.
    val common = byShingle
      .filter(size(col("ids")) > 1)
      .filter(
        when(size(col("ids")).cast("long") * (size(col("ids")) - 1).cast("long")
            > lit(2L) * maxPairsPerShingle,
          raise_error(concat(
            lit("ngramJaccardPairs: shingle with df="),
            size(col("ids")).cast("string"),
            lit(s" exceeds maxPairsPerShingle=$maxPairsPerShingle"))).cast("boolean"))
          .otherwise(lit(true)))
      .withColumn("ids", sort_array(col("ids")))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("i"), col("a"), posexplode(col("ids")).as(Seq("j", "b")))
      .filter(col("j") > col("i"))
      .groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("size_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("size_b")), Seq("doc_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
  }

  /** All near-duplicate pairs by exact word-n-gram Jaccard >= `threshold`,
    * via PPJoin-style prefix filtering (Bayardo et al. WWW'07 all-pairs,
    * Xiao et al. WWW'08 positional filter) — the EXACT scale path whose
    * answer [[ngramJaccardPairs]]'s df-cap baseline approximates. No
    * df-cap, no candidate loss: prefix filtering is LOSSLESS, so the
    * output is the complete exact-Jaccard pair set.
    *
    * How it prunes: order every doc's shingle set by one global total
    * order (ascending document frequency, ties by shingle — rarest
    * first, the order that makes prefixes maximally selective; ANY total
    * order keeps the filter lossless). If J(x,y) >= t then
    * |x∩y| >= ⌈t·|x|⌉ =: αx, and two sets under a common total order
    * with overlap >= αx share a token among their first |x|−αx+1
    * elements (the first common token e in the order has every other
    * common token after it in BOTH lists, so e deeper than that prefix
    * bounds the overlap below αx). So only docs sharing a PREFIX token
    * can pair: the self-join runs over the short prefixes, not the full
    * shingle sets. Two further sound prunes before the exact verify:
    * the length filter (|x∩y| <= min ∧ >= t·union >= t·max ⇒
    * min/max >= t) and the positional filter (for the minimal shared
    * prefix token at positions (pa, pb): overlap <= 1 + min(|x|−pa,
    * |y|−pb), which must reach the equivalent overlap
    * ⌈t/(1+t)·(|x|+|y|)⌉). Both prunes are relaxed by one count / 1e-12
    * so a pair sitting exactly ON the threshold (j = 4/5 at t = 0.8)
    * can never be lost to double rounding — candidates are a strict
    * superset; the exact verify applies the same `jaccard >= t` double
    * compare as every other dedup path.
    *
    * Scale: df agg + one window over (doc_id) + a self-join keyed on
    * PREFIX tokens only. A prefix token's fan-out is bounded by its
    * in-prefix df — frequent shingles sort last and fall out of the
    * short prefixes (prefix length ≈ (1−t)·|x| + 1), which is what
    * replaces the df-cap. Worst case (a corpus of near-identical docs)
    * is output-bound — the true pair set itself is quadratic there.
    * Verification joins full shingle ARRAYS by doc id (two hash
    * shuffles on doc id over candidates only). Ref
    * mars/learn/contrib (no analog — Mars has no similarity join);
    * published algorithm, clean-room relational formulation. */
  /** Per-doc prefix rows (sh, <id>, pos, sz) from (id, sh, df) token
    * rows, under the global (df asc, sh asc) order. One hash-agg
    * shuffle by doc id + a per-row array sort + a head slice — NOT a
    * row_number window: the window formulation sorts the ENTIRE
    * exploded shingle table within partitions, which was the sole
    * spill source of the 1000× cell (21 GB disk / 53 GB mem spill);
    * per-doc arrays sort in constant per-row memory instead. αx =
    * ⌈t·|x|⌉ relaxed by 1 (floored at 1): double rounding of t·sz can
    * overshoot the real product by an ulp — the relaxation keeps the
    * prefix a superset at the cost of one extra token per doc. */
  private def ppjoinPrefix(shWithDf: DataFrame, idName: String,
      threshold: Double, width: Int): DataFrame = {
    // Explicit fan-out-aware width on the by-doc exchange: it moves the
    // same exploded-shingle volume as the by-shingle one (collect_list
    // has no partial-agg reduction), so the conf width under-sizes it at
    // scale for the same reason (r15 — see fanOutWidth).
    val byDoc = shWithDf.repartition(width, col(idName)).groupBy(col(idName))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
    val alpha = greatest(ceil(lit(threshold) * col("sz")).cast("long") - 1, lit(1L))
    byDoc
      .withColumn("plen", (col("sz") - alpha + 1).cast("int"))
      .select(col(idName), col("sz"),
        posexplode(slice(col("toks"), lit(1), col("plen"))).as(Seq("i", "tk")))
      .select(col("tk.sh").as("sh"), col(idName), (col("i") + 1).as("pos"), col("sz"))
  }

  def ppjoinPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"ppjoinPairs threshold must be in (0, 1], got $threshold")
    val width = fanOutWidth(docs, ShingleFanOut)
    val sh = fanOutScan(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.hashedShingles(col(textCol), n)).as("sh"))
      .repartition(width, col("sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val prefix = ppjoinPrefix(sh.join(dfreq, Seq("sh")), "doc_id", threshold, width)
    // Pair generation per shared PREFIX token, as grouped posexplodes
    // (the r9 ngramJaccardPairs shape) rather than a self-join: a
    // self-join plans the whole shingle+df+window prefix pipeline TWICE
    // (one copy per side — no exchange reuse across a broadcast/probe
    // split), while the grouped form computes it once and streams the
    // pair fan-out through generators in codegen. Per-shingle prefix-df
    // lists stay small on real corpora — a token enters prefixes only
    // where few rarer tokens exist (rarest-first order), which is what
    // replaces the df-cap; a corpus degenerate enough to blow them up
    // (near-identical docs) has quadratic TRUE output anyway.
    // sort_array over (doc_id, pos, sz) structs orders by doc_id first,
    // so j > i gives doc_a < doc_b for free.
    val grouped = prefix.groupBy(col("sh"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos"), col("sz")))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairsRaw = grouped
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("i"), col("a"), posexplode(col("ids")).as(Seq("j", "b")))
      .filter(col("j") > col("i"))
      .select(col("a.doc_id").as("doc_a"), col("a.pos").as("pa"), col("a.sz").as("sza"),
        col("b.doc_id").as("doc_b"), col("b.pos").as("pb"), col("b.sz").as("szb"))
      .filter(least(col("sza"), col("szb")).cast("double") /
        greatest(col("sza"), col("szb")).cast("double") >=
        lit(threshold - 1e-12))
    // Positions are monotone in the shared global order within each doc,
    // so min(pa) and min(pb) below both come from the SAME (minimal)
    // shared token — the pair the positional bound is stated for.
    val eqOverlap = ceil(lit(threshold / (1.0 + threshold)) *
      (col("sza") + col("szb")).cast("double")).cast("long") - 1
    val cands = pairsRaw
      .groupBy(col("doc_a"), col("doc_b"), col("sza"), col("szb"))
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"))
      .filter(lit(1L) + least(col("sza") - col("pa"), col("szb") - col("pb")) >=
        eqOverlap)
      .select("doc_a", "doc_b")
    val shingled = fanOutScan(docs).select(
      col(idCol).as("doc_id"),
      TextFunctions.hashedShingles(col(textCol), n).as("shs"))
    verifyJaccard(cands
        .join(shingled.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), Seq("doc_a"))
        .join(shingled.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), Seq("doc_b")),
        "shs_a", "shs_b", threshold)
      .select(col("doc_a"), col("doc_b"), col("common").cast("long").as("common"),
        size(col("shs_a")).cast("long").as("size_a"),
        size(col("shs_b")).cast("long").as("size_b"), col("jaccard"))
  }

  /** Persist a corpus's PPJoin PREFIX index for the daily-crawl shape —
    * the EXACT (lossless) counterpart of [[minhashIndexPersist]]: probing
    * it finds EVERY cross pair at jaccard >= threshold, no LSH recall
    * argument needed. Tables (all bucketed so probes leave the history
    * side exchange-free):
    *   `<prefix>_ppdf`       (sh, df)                  on sh
    *   `<prefix>_pprefix`    (sh, index_id, pos, sz)   on sh
    *   `<prefix>_ppshingles` (index_id, shs_i)         on index_id
    *   `<prefix>_ppparams`   (n, threshold, buckets)   single row
    *
    * The token order (ascending index-corpus df, ties by token) is
    * FROZEN at persist time. That stays CORRECT forever: losslessness
    * needs only one total order both sides agree on, and batch tokens
    * absent from the index take df = 0 — they sort before every index
    * token, a consistent extension that can't disturb the persisted
    * prefixes (no index doc contains them). What drifts with corpus
    * age is SELECTIVITY (the frozen dfs stop reflecting the true
    * frequencies), not correctness — re-persist when probe fan-out
    * degrades. Retiring documents: [[ppjoinIndexDelete]] (r15 —
    * crash-safe via [[ppjoinIndexRecover]]). The persisted `threshold` t0 is the prefix-cut floor:
    * any query threshold >= t0 is lossless (higher t needs SHORTER
    * prefixes — a subset of what's stored); a query below t0 would
    * need longer prefixes than exist and is refused loudly. No append
    * path by design — a frozen-order append would stay lossless but
    * compounds the selectivity drift; daily-append shapes belong to
    * the LSH index, this index is for exactness-mandated corpora. */
  def ppjoinIndexPersist(indexDocs: DataFrame, textCol: String,
      idCol: String, namePrefix: String, buckets: Int = 64, n: Int = 3,
      threshold: Double = 0.8): Unit = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"ppjoinIndexPersist threshold must be in (0, 1], got $threshold")
    val spark = indexDocs.sparkSession
    val width = fanOutWidth(indexDocs, ShingleFanOut)
    val sh = fanOutScan(indexDocs)
      .select(col(idCol).as("index_id"),
        explode(TextFunctions.hashedShingles(col(textCol), n)).as("sh"))
      .repartition(width, col("sh"))
    sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .write.mode("overwrite")
      .bucketBy(buckets, "sh").sortBy("sh")
      .format("parquet").saveAsTable(s"${namePrefix}_ppdf")
    // read the dfs back through the bucketed scan (no recompute, no
    // exchange on the df side of the join)
    ppjoinPrefix(sh.join(spark.table(s"${namePrefix}_ppdf"), Seq("sh")),
        "index_id", threshold, width)
      .select(col("sh"), col("index_id"), col("pos"), col("sz"))
      .write.mode("overwrite")
      .bucketBy(buckets, "sh").sortBy("sh")
      .format("parquet").saveAsTable(s"${namePrefix}_pprefix")
    fanOutScan(indexDocs)
      .select(col(idCol).as("index_id"),
        TextFunctions.hashedShingles(col(textCol), n).as("shs_i"))
      .write.mode("overwrite")
      .bucketBy(buckets, "index_id").sortBy("index_id")
      .format("parquet").saveAsTable(s"${namePrefix}_ppshingles")
    spark.createDataFrame(Seq((n, threshold, buckets)))
      .toDF("n", "threshold", "buckets")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${namePrefix}_ppparams")
  }

  /** Drop the four tables of a persisted PPJoin prefix index. */
  def dropPpjoinIndex(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): Unit =
    Seq("_ppdf", "_pprefix", "_ppshingles", "_ppparams",
        "_pprefix__rw", "_ppshingles__rw", "_pprwcommit")
      .foreach(s => dropTableAndLocation(spark, s"$namePrefix$s"))

  /** [[ppjoinPairs]] between a NEW batch and the PERSISTED prefix index
    * written by [[ppjoinIndexPersist]]: EVERY (batch doc, index doc)
    * pair at exact jaccard >= `threshold` — lossless, like the batch
    * op, so the result needs no recall caveat. The history contributes
    * its df table, prefix table and shingle store through bucketed
    * scans: no exchange, no re-shingling, no text rescan on the index
    * side; only the batch shuffles to match. The batch's prefixes are
    * cut under the INDEX's frozen token order (see
    * [[ppjoinIndexPersist]] for why that stays correct); `n` comes from
    * the index params, and `threshold` must be >= the index's
    * prefix-cut floor — below it the stored prefixes are too short and
    * recall loss would be silent, so it fails loudly at plan time.
    * A re-crawled history doc matches itself at j = 1.0 — exactly what
    * ingest dedup should flag. Output: (new_id, index_id, jaccard). */
  def ppjoinPairsAgainstIndex(newDocs: DataFrame, textCol: String,
      idCol: String, namePrefix: String,
      threshold: Double = 0.8): DataFrame = {
    val spark = newDocs.sparkSession
    require(spark.catalog.tableExists(s"${namePrefix}_ppparams"),
      s"persisted PPJoin index '$namePrefix' has no _ppparams table — " +
        "build it with ppjoinIndexPersist")
    // single-row metadata table: bounded driver fetch
    val pr = spark.table(s"${namePrefix}_ppparams")
      .select(col("n"), col("threshold")).head()
    val (n, t0) = (pr.getInt(0), pr.getDouble(1))
    require(threshold >= t0,
      s"query threshold $threshold is below index '$namePrefix''s " +
        s"prefix-cut floor $t0: the stored prefixes are too short for " +
        "it and recall loss would be SILENT — re-persist the index at " +
        "the lower threshold")
    val sh = fanOutScan(newDocs)
      .select(col(idCol).as("new_id"),
        explode(TextFunctions.hashedShingles(col(textCol), n)).as("sh"))
    // the frozen order: index dfs, unseen tokens -> 0 (a consistent
    // total-order extension — see ppjoinIndexPersist)
    val withDf = sh.join(spark.table(s"${namePrefix}_ppdf"), Seq("sh"), "left")
      .na.fill(0L, Seq("df"))
    val newPrefix = ppjoinPrefix(withDf, "new_id", threshold,
        fanOutWidth(newDocs, ShingleFanOut))
      .select(col("sh"), col("new_id"), col("pos").as("pn"), col("sz").as("szn"))
    val idxPrefix = spark.table(s"${namePrefix}_pprefix")
      .select(col("sh"), col("index_id"), col("pos").as("pi"), col("sz").as("szi"))
    // same relaxed length + positional prunes as the batch op (the
    // min-position pair is the minimal SHARED prefix token on both
    // sides — positions are monotone in the one shared order); the
    // index's longer t0-prefixes only ADD candidates, never lose any
    val eqOverlap = ceil(lit(threshold / (1.0 + threshold)) *
      (col("szn") + col("szi")).cast("double")).cast("long") - 1
    val cands = newPrefix.join(idxPrefix, Seq("sh"))
      .filter(least(col("szn"), col("szi")).cast("double") /
        greatest(col("szn"), col("szi")).cast("double") >=
        lit(threshold - 1e-12))
      .groupBy(col("new_id"), col("index_id"), col("szn"), col("szi"))
      .agg(min(col("pn")).as("pn"), min(col("pi")).as("pi"))
      .filter(lit(1L) + least(col("szn") - col("pn"), col("szi") - col("pi")) >=
        eqOverlap)
      .select("new_id", "index_id")
    val newSh = newDocs.select(col(idCol).as("new_id"),
      TextFunctions.hashedShingles(col(textCol), n).as("shs_n"))
    verifyJaccard(cands
        .join(newSh, Seq("new_id"))
        .join(spark.table(s"${namePrefix}_ppshingles"), Seq("index_id")),
        "shs_n", "shs_i", threshold)
      .select(col("new_id"), col("index_id"), col("jaccard"))
  }

  /** MinHash signature: `numHashes` permutation-style hashes of the distinct
    * shingle set, h_i(s) = (a_i * x + b_i) mod p over a murmur base hash.
    *
    * One pass over the shingle array: each shingle is murmur-hashed exactly
    * once, then folded into a `numHashes`-wide running elementwise minimum.
    * The (a_i, b_i) coefficient vectors are single array literals
    * (`typedlit`), so plan size is O(1) in `numHashes` — unlike the naive
    * form (one `array_min(transform(...))` per hash function) whose
    * numHashes× re-hash of every shingle dominated the r1 benchmark. */
  def minhashSignature(shingleArr: Column, numHashes: Int, seed: Long = 42L): Column = {
    val p = lshP // 2^31 - 1
    val (as, bs) = minhashCoefs(numHashes, seed) // shared with the portable family
    val aCoefs = typedlit(as)
    val bCoefs = typedlit(bs)
    // Hash every shingle once; h < p and a < 2e9+1 so h*a+b < 2^63 (no
    // overflow under ANSI arithmetic).
    val shingleHashes = transform(shingleArr, s => pmod(hash(s).cast("long"), lit(p)))
    aggregate(
      shingleHashes,
      array_repeat(lit(p), numHashes),
      (acc, h) => transform(acc, (m, i) =>
        least(m, pmod(h * element_at(aCoefs, i + 1) + element_at(bCoefs, i + 1), lit(p)))))
  }

  /** LSH banding: group the signature into `bands` bands of `rowsPerBand`,
    * emit (band_id, band_hash) keys; docs colliding on any band key are
    * candidate pairs. Returns (doc_a, doc_b) distinct candidates.
    *
    * With numHashes = bands * rowsPerBand, the usual S-curve applies:
    * P(candidate) = 1 - (1 - j^rows)^bands for true Jaccard j. */

  /** Per-document LSH band buckets: (doc_id, band, bucket) — the shared
    * front half of batch candidate generation and the streaming near-dup
    * filter. One narrow pass (signature fold + band hash), no shuffle. */
  def minhashBands(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val numHashes = bands * rowsPerBand
    // native codegen'd signature when GraftExtensions is registered; the
    // HOF fold computes identical values on sessions without it
    val sigExpr =
      if (docs.sparkSession.catalog.functionExists("graft_minhash"))
        call_function("graft_minhash",
          TextFunctions.hashedShingles(col(textCol), n), lit(numHashes), lit(seed))
      else
        minhashSignature(TextFunctions.hashedShingles(col(textCol), n), numHashes, seed)
    fanOutScan(docs).select(col(idCol).as("doc_id"), sigExpr.as("sig"))
      .select(
        col("doc_id"),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
  }

  def minhashLshCandidates(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val banded = minhashBands(docs, textCol, idCol, n, bands, rowsPerBand, seed)
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
    val shingled = fanOutScan(docs).select(
      col(idCol).as("doc_id"),
      TextFunctions.hashedShingles(col(textCol), n).as("shs"))
    verifyJaccard(cands
        .join(shingled.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), Seq("doc_a"))
        .join(shingled.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), Seq("doc_b")),
        "shs_a", "shs_b", threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact-Jaccard verification shared by every candidates-then-verify
    * pipeline: computes `common` and `jaccard` from two shingle-array
    * columns and applies the threshold. Two empty shingle sets (docs
    * shorter than n words — which collide in EVERY LSH band because their
    * signatures are the identical all-p initial fold) would divide 0/0;
    * Spark orders NaN ABOVE every number, so an unguarded
    * `jaccard >= threshold` passes and every short doc pairs with every
    * other short doc. The union-size guard keeps those out. */
  private def verifyJaccard(joined: DataFrame, aShs: String, bShs: String,
      threshold: Double): DataFrame =
    joined
      .withColumn("common", size(array_intersect(col(aShs), col(bShs))))
      .withColumn("__union",
        size(col(aShs)) + size(col(bShs)) - col("common"))
      .filter(col("__union") > 0)
      .withColumn("jaccard",
        col("common").cast("double") / col("__union").cast("double"))
      .filter(col("jaccard") >= threshold)
      .drop("__union")

  /** Incremental exact dedup: drop rows of `newDocs` whose normalized-text
    * fingerprint already exists in `knownFps` (a 1-column `fp` frame — the
    * persisted index of everything ingested so far), then keep-first
    * within the batch. The production daily-crawl shape: the history is
    * touched only through an anti-join on its fingerprint column, never
    * rescanned as text. Returns (kept rows, the batch's new fingerprints
    * to append to the index). */
  def exactDedupIncremental(newDocs: DataFrame, textCol: String,
      idCol: String, knownFps: DataFrame): (DataFrame, DataFrame) = {
    val withFp = newDocs.withColumn("__fp",
      TextFunctions.md5FingerprintFast(newDocs.sparkSession, col(textCol)))
    val unseen = withFp.join(knownFps.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
    val kept = dropDuplicates(unseen, Seq("__fp"), idCol)
    (kept.drop("__fp"),
      kept.select(col("__fp").as("fp")))
  }

  /** Incremental MinHash near-dup pairs: candidates between a NEW batch
    * and an EXISTING corpus only (within-batch pairs are
    * [[minhashDedupPairs]]'s job), verified with exact Jaccard via
    * [[verifyJaccard]]. Both sides go through the same banding; the join
    * emits cross-side collisions only, so the history contributes bands +
    * shingles for verification but is never self-joined.
    * Output: (new_id, index_id, jaccard). */
  def minhashDedupPairsAgainst(
      newDocs: DataFrame,
      indexDocs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val newBands = minhashBands(newDocs, textCol, idCol, n, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("doc_id").as("new_id"))
    val idxBands = minhashBands(indexDocs, textCol, idCol, n, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("doc_id").as("index_id"))
    val cands = newBands.join(idxBands, Seq("band", "bucket"))
      .select("new_id", "index_id").distinct()
    val newSh = newDocs.select(col(idCol).as("new_id"),
      TextFunctions.hashedShingles(col(textCol), n).as("shs_n"))
    val idxSh = indexDocs.select(col(idCol).as("index_id"),
      TextFunctions.hashedShingles(col(textCol), n).as("shs_i"))
    verifyJaccard(cands.join(newSh, Seq("new_id")).join(idxSh, Seq("index_id")),
        "shs_n", "shs_i", threshold)
      .select(col("new_id"), col("index_id"), col("jaccard"))
  }

  /** Persist a corpus's LSH index ONCE for the daily-crawl shape
    * (r11 VERDICT #4): `<prefix>_bands` = (band, bucket, index_id)
    * bucketed+sorted on (band, bucket) and `<prefix>_shingles` =
    * (index_id, shs_i) bucketed on index_id.
    * [[minhashDedupPairsAgainstIndex]] joins against both with NO
    * exchange on the history side — the bucketed scans report their own
    * hash partitioning, so only the small new batch shuffles to match.
    * [[minhashDedupPairsAgainst]] re-bands and re-shingles the FULL
    * history every batch (signature fold = the dominant cost); this
    * pays that once per corpus. At 100 TB the bands table is
    * bands·N rows of 3 integers and the shingle store is the corpus's
    * token-trigram footprint — both a small fraction of the text they
    * index, amortized across every batch. */
  def minhashIndexPersist(indexDocs: DataFrame, textCol: String,
      idCol: String, namePrefix: String, buckets: Int = 64, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 4, seed: Long = 42L,
      portable: Boolean = false): Unit = {
    val spark = indexDocs.sparkSession
    // batch_id tags every band row with the append that wrote it; query
    // paths honor only LEDGERED batches (r14 — see minhashIndexAppend's
    // crash-replay contract). The initial build is batch 0.
    bandsFor(indexDocs, textCol, idCol, n, bands, rowsPerBand, seed, portable)
      .select(col("band"), col("bucket"), col("doc_id").as("index_id"),
        lit(0L).as("batch_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "bucket").sortBy("band", "bucket")
      .format("parquet").saveAsTable(s"${namePrefix}_bands")
    fanOutScan(indexDocs)
      .select(col(idCol).as("index_id"),
        TextFunctions.hashedShingles(col(textCol), n).as("shs_i"))
      .write.mode("overwrite")
      .bucketBy(buckets, "index_id").sortBy("index_id")
      .format("parquet").saveAsTable(s"${namePrefix}_shingles")
    // the banding contract the index was built with (ADVICE r12): a
    // query or append whose (n, bands, rowsPerBand, seed, hash family)
    // differ would SILENTLY lose recall (verifyJaccard only removes
    // false positives) — persist the params so mismatches fail loudly
    // instead. `family` is authoritative at query time: batches band
    // with whatever family the index was built with. `buckets` rides
    // along so maintenance rewrites (compact/delete) preserve layout.
    spark.createDataFrame(Seq(
        (n, bands, rowsPerBand, seed,
          if (portable) "portable" else "murmur", buckets)))
      .toDF("n", "bands", "rows_per_band", "seed", "family", "buckets")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${namePrefix}_params")
    // the append ledger: one row per batch whose append COMPLETED. The
    // ledger row is written last in every append, so a half-appended
    // batch (crash between the table writes) stays invisible to queries.
    spark.createDataFrame(Seq(Tuple1(0L))).toDF("batch_id")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${namePrefix}_batches")
  }

  /** Band docs with the index's hash family: murmur (the perf default)
    * or the engine-portable md5/polynomial banding (oracle replay —
    * never a scale path, see the bucket-saturation note on
    * [[minhashBandsPortable]]). */
  private[graft] def bandsFor(docs: DataFrame, textCol: String, idCol: String,
      n: Int, bands: Int, rowsPerBand: Int, seed: Long,
      portable: Boolean): DataFrame =
    if (portable) minhashBandsPortable(docs, textCol, idCol, n, bands, rowsPerBand, seed)
    else minhashBands(docs, textCol, idCol, n, bands, rowsPerBand, seed)

  /** Banding + layout contract of a persisted LSH index. */
  private[graft] case class LshIndexParams(n: Int, bands: Int,
      rowsPerBand: Int, seed: Long, family: String, buckets: Int)

  /** The banding params a persisted index was built with — loud failure
    * if the params table is absent or pre-r14 (re-persist it). */
  private[graft] def indexParams(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): LshIndexParams = {
    require(spark.catalog.tableExists(s"${namePrefix}_params"),
      s"persisted LSH index '$namePrefix' has no _params table — " +
        "re-persist with minhashIndexPersist (params are required so a " +
        "banding mismatch cannot silently lose recall)")
    val tbl = spark.table(s"${namePrefix}_params")
    require(tbl.columns.contains("buckets"),
      s"persisted LSH index '$namePrefix' predates the r14 layout " +
        "(no buckets/ledger) — re-persist with minhashIndexPersist")
    // single-row metadata table: bounded driver fetch
    val r = tbl.select(col("n"), col("bands"), col("rows_per_band"),
        col("seed"), col("family"), col("buckets"))
      .head()
    LshIndexParams(r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
      r.getString(4), r.getInt(5))
  }

  /** The set of batch ids whose append COMPLETED (ledger row landed).
    * Bounded driver fetch: one row per append ever run — metadata-scale
    * (a year of daily appends is 365 rows). */
  private[graft] def indexLedger(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): Set[Long] = {
    require(spark.catalog.tableExists(s"${namePrefix}_batches"),
      s"persisted LSH index '$namePrefix' has no _batches ledger — " +
        "re-persist with minhashIndexPersist (the ledger is what makes " +
        "appends replay-idempotent)")
    spark.table(s"${namePrefix}_batches")
      .select(col("batch_id")).collect().map(_.getLong(0)).toSet
  }

  /** True iff `batchId`'s append completed — a foreachBatch replay of a
    * fully-processed batch must skip re-sinking and re-appending. */
  def indexBatchLedgered(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String, batchId: Long): Boolean =
    indexLedger(spark, namePrefix).contains(batchId)

  /** The bands table restricted to LEDGERED batches. Small ledgers
    * (the common case — one id per append ever run) become a literal
    * In filter that pushes into the parquet scan; a years-long ledger
    * switches to a broadcast semi-join so the predicate doesn't grow
    * with index age. Both shapes leave the bucketed scan exchange-free
    * (the broadcast exchange sits on the one-row-per-append ledger
    * side). */
  private[graft] def ledgeredBands(
      spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): DataFrame = {
    val ledgered = indexLedger(spark, namePrefix)
    val bandsTbl = spark.table(s"${namePrefix}_bands")
    if (ledgered.size <= 512)
      bandsTbl.where(col("batch_id").isInCollection(ledgered)).drop("batch_id")
    else
      bandsTbl.join(
          broadcast(spark.table(s"${namePrefix}_batches")),
          Seq("batch_id"), "left_semi")
        .drop("batch_id")
  }

  /** Test-only crash injection for the append path's replay gates:
    * called with (prefix, stage, batchId) after each append step
    * ("bands", "shingles", "ledger"). Production value is a no-op. */
  @volatile private[graft] var appendFailpoint: (String, String, Long) => Unit =
    (_, _, _) => ()

  /** Drop all four tables of a persisted index (+ any orphan warehouse
    * locations — the in-memory catalog is fresh per JVM but the
    * warehouse dir persists, so a leftover location would make
    * saveAsTable fail). Shared by every gate/spec that rebuilds one. */
  def dropIndex(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): Unit =
    Seq("_bands", "_shingles", "_params", "_batches",
        "_bands__rw", "_shingles__rw", "_rwcommit")
      .foreach(s => dropTableAndLocation(spark, s"$namePrefix$s"))

  /** DROP IF EXISTS + wipe the managed location: the in-memory catalog
    * is fresh per JVM but the warehouse dir persists, so an orphan
    * location (including a crashed compaction's `__rw` twin) would make
    * the next saveAsTable fail. */
  private def dropTableAndLocation(spark: org.apache.spark.sql.SparkSession,
      nm: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $nm")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), nm)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
    }
  }

  /** Append a day's batch into a persisted LSH index (r12 VERDICT #1):
    * bands/shingles `insertInto` the existing bucketed tables — the
    * catalog's bucket spec applies to the inserted files, so the
    * no-exchange property of [[minhashDedupPairsAgainstIndex]] survives
    * (PlanShapeSpec pins it post-append; buckets with several files
    * still scan exchange-free, only the within-bucket sort is re-done
    * by the join). Banding params come FROM the index's params table —
    * an append can never diverge from the build. The daily-crawl loop
    * is therefore: dedup batch N against the index, then append batch N
    * for batch N+1 to see.
    *
    * REPLAY-IDEMPOTENT (r14, VERDICT #1): an at-least-once caller
    * (foreachBatch) may re-run an append after a crash at ANY point.
    * The contract that makes the retry exact:
    *  1. already-ledgered `batchId` → no-op, returns false (the crash
    *     happened after the ledger row, i.e. the append had completed);
    *  2. band rows land FIRST, tagged with `batchId` — they stay
    *     INVISIBLE to every query path until the ledger row lands, so a
    *     replayed batch re-dedups against exactly the pre-crash index
    *     and recomputes identical survivors (a crash between the band
    *     write and the ledger can at worst leave duplicate band rows
    *     with the same batch_id, which the candidate `.distinct()`
    *     absorbs and [[minhashIndexCompact]] removes);
    *  3. shingle rows are anti-joined against the ids already in the
    *     store — a retry after a crash between the two table writes
    *     re-inserts ZERO shingle rows instead of duplicating verify
    *     pairs (this is also why index ids must be unique across the
    *     index's lifetime);
    *  4. the ledger row is written LAST: the batch becomes visible
    *     atomically with it.
    * `batchId < 0` auto-assigns max(ledger)+1 (the one-off batch-job
    * convention); streaming callers pass their epoch-stable batch id.
    * Returns true iff the append ran (false = replay of a completed
    * batch, skipped). */
  /** Phase 1 of the append fingerprint contract (r16 VERDICT #3): the
    * batch ids semi-joined against an id-ONLY scan of the shingle store.
    * Factored out so PlanShapeSpec can pin that this probe never reads
    * `shs_i` — the r15 single-phase check hashed the widest column of
    * the entire history on every (almost always clash-free) append. */
  private[graft] def appendIdIntersection(
      spark: org.apache.spark.sql.SparkSession,
      namePrefix: String, batchIds: DataFrame): DataFrame =
    spark.table(s"${namePrefix}_shingles")
      .select(col("index_id"))
      .join(batchIds, Seq("index_id"), "left_semi")

  def minhashIndexAppend(newDocs: DataFrame, textCol: String,
      idCol: String, namePrefix: String, batchId: Long = -1L): Boolean = {
    val spark = newDocs.sparkSession
    val p = indexParams(spark, namePrefix)
    val ledger = indexLedger(spark, namePrefix)
    val id = if (batchId >= 0) batchId else ledger.max + 1
    if (ledger.contains(id)) return false
    // LOUD same-id/different-text check (r15 VERDICT #5, upgrading the
    // "ids unique across the index's lifetime" Scaladoc contract to a
    // runtime failure — the params-contract treatment for DATA): the
    // shingle anti-join below keeps the OLD shingles for a re-appearing
    // index_id while new bands would be written from the NEW text, so a
    // mutable-content corpus (URL ids, edited pages) would silently
    // verify future candidates against stale shingles. Fingerprint =
    // xxhash64 of the sorted shingle set, computed identically on both
    // sides. TWO-PHASE (r16 VERDICT #3): phase 1 intersects the batch's
    // ids with an id-ONLY scan of the store (column-pruned — the scan
    // never reads `shs_i`, PlanShapeSpec pins the read schema); only when
    // ids actually intersect (an intentional identical-text re-append, or
    // the clash this check exists for — almost never in a daily-crawl
    // loop) does phase 2 compute the fingerprints, and only for the
    // matched rows (store side semi-joined to the batch ids BEFORE the
    // hash projection). The old single-phase shape hashed the widest
    // column of the ENTIRE history on every append. Fetches are bounded
    // (limit 1). An IDENTICAL-text re-append passes (and stays a shingle
    // no-op via the anti-join).
    val batchIds = newDocs.select(col(idCol).as("index_id")).distinct()
    val interExists =
      appendIdIntersection(spark, namePrefix, batchIds).limit(1).collect().nonEmpty
    val clash = if (!interExists) Array.empty[org.apache.spark.sql.Row] else
      fanOutScan(newDocs)
        .select(col(idCol).as("index_id"),
          xxhash64(sort_array(
            TextFunctions.hashedShingles(col(textCol), p.n))).as("__fp_new"))
        .join(spark.table(s"${namePrefix}_shingles")
            .join(batchIds, Seq("index_id"), "left_semi")
            .select(col("index_id"),
              xxhash64(sort_array(col("shs_i"))).as("__fp_old")),
          Seq("index_id"))
        .filter(col("__fp_new") =!= col("__fp_old"))
        .select(col("index_id")).limit(1).collect()
    require(clash.isEmpty,
      s"minhashIndexAppend: index_id ${clash.headOption.map(_.getLong(0)).getOrElse(-1L)} " +
        s"re-appended into '$namePrefix' with DIFFERENT text — index ids " +
        "must be unique across the index's lifetime (the shingle store " +
        "would keep the old text and silently mis-verify future " +
        "candidates); delete the id first (minhashIndexDelete) or assign " +
        "a fresh id")
    // insertInto matches columns by POSITION — keep table column order.
    // Pre-partition on the bucket columns so each append adds exactly
    // ONE file per bucket instead of one per (task × bucket): without
    // this, 60 daily appends left 36k files and a 28×-degraded probe
    // (PERF.md r14 aux_index_compact) — the small-files wall that
    // compaction exists for should accrete at the slowest possible rate.
    bandsFor(newDocs, textCol, idCol, p.n, p.bands, p.rowsPerBand, p.seed,
        p.family == "portable")
      .select(col("band"), col("bucket"), col("doc_id").as("index_id"),
        lit(id).as("batch_id"))
      .repartition(p.buckets, col("band"), col("bucket"))
      .write.mode("append").insertInto(s"${namePrefix}_bands")
    appendFailpoint(namePrefix, "bands", id)
    fanOutScan(newDocs)
      .select(col(idCol).as("index_id"),
        TextFunctions.hashedShingles(col(textCol), p.n).as("shs_i"))
      .join(spark.table(s"${namePrefix}_shingles").select("index_id"),
        Seq("index_id"), "left_anti")
      .repartition(p.buckets, col("index_id"))
      .write.mode("append").insertInto(s"${namePrefix}_shingles")
    appendFailpoint(namePrefix, "shingles", id)
    spark.createDataFrame(Seq(Tuple1(id))).toDF("batch_id")
      .write.mode("append").insertInto(s"${namePrefix}_batches")
    appendFailpoint(namePrefix, "ledger", id)
    true
  }

  /** [[minhashDedupPairsAgainst]] against the PERSISTED index written by
    * [[minhashIndexPersist]] (+ any [[minhashIndexAppend]]s): the history
    * contributes its band table and shingle store through bucketed scans
    * — no exchange, no re-banding, no text rescan. The caller's banding
    * args are validated against the index's persisted params (ADVICE
    * r12): a mismatch means the new batch's buckets live in a different
    * hash space than the index's — zero recall loss is impossible to
    * detect downstream, so fail loudly here. Output:
    * (new_id, index_id, jaccard). */
  def minhashDedupPairsAgainstIndex(newDocs: DataFrame, textCol: String,
      idCol: String, namePrefix: String, n: Int = 3,
      threshold: Double = 0.8, bands: Int = 16,
      rowsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = newDocs.sparkSession
    val p = indexParams(spark, namePrefix)
    require(p.n == n && p.bands == bands && p.rowsPerBand == rowsPerBand &&
        p.seed == seed,
      s"banding mismatch vs index '$namePrefix': index built with " +
        s"(n=${p.n}, bands=${p.bands}, rowsPerBand=${p.rowsPerBand}, " +
        s"seed=${p.seed}), query asked " +
        s"(n=$n, bands=$bands, rowsPerBand=$rowsPerBand, seed=$seed)")
    // honor only LEDGERED batches: band rows of a half-appended batch
    // (crash between an append's table writes) must not exist for this
    // query — otherwise a foreachBatch replay would self-match its own
    // partial append and silently drop survivors (r14 VERDICT #1).
    val idxBands = ledgeredBands(spark, namePrefix)
    val newBands = bandsFor(newDocs, textCol, idCol, n, bands, rowsPerBand,
        seed, p.family == "portable")
      .select(col("band"), col("bucket"), col("doc_id").as("new_id"))
    val cands = newBands.join(idxBands, Seq("band", "bucket"))
      .select("new_id", "index_id").distinct()
    val newSh = newDocs.select(col(idCol).as("new_id"),
      TextFunctions.hashedShingles(col(textCol), n).as("shs_n"))
    val idxSh = spark.table(s"${namePrefix}_shingles")
    verifyJaccard(cands.join(newSh, Seq("new_id")).join(idxSh, Seq("index_id")),
        "shs_n", "shs_i", threshold)
      .select(col("new_id"), col("index_id"), col("jaccard"))
  }

  /** Compact a persisted LSH index (r13 VERDICT #2): a year of daily
    * appends leaves thousands of small files per bucket (each append =
    * one insertInto job = ≥1 file per touched bucket) plus any
    * duplicate band rows from crash-replays. Compaction rewrites both
    * tables with the SAME bucket spec, one file per bucket (the
    * repartition on the bucket columns routes each bucket to exactly
    * one task — Spark's repartition hash == the bucket hash), drops
    * un-ledgered band rows (orphans of half-appended batches) and exact
    * duplicates, and swaps the tables in. The LEDGER is preserved
    * verbatim: a stream restarting from an old checkpoint must still
    * skip its already-processed batches. OFFLINE maintenance — run with
    * no stream or append active on the index. CRASH-SAFE (r15): a crash
    * at any point is repaired by [[minhashIndexRecover]] — before the
    * commit marker the live tables are untouched (recovery rolls the
    * `__rw` twins back), after it the twins are complete (recovery
    * finishes the swap); ext_dedup_index_recover gates every failpoint. */
  def minhashIndexCompact(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): Unit = {
    val ledgered = indexLedger(spark, namePrefix)
    rewriteIndexTables(spark, namePrefix,
      bandsTbl => bandsTbl
        .where(col("batch_id").isInCollection(ledgered)).distinct(),
      shTbl => shTbl.dropDuplicates("index_id"))
  }

  /** Retire documents from a persisted LSH index (r13 VERDICT #2): a
    * bucketed rewrite of both tables with the given ids anti-joined
    * out — takedowns, expiry, corpus pruning. `ids` is a one-column
    * frame of index ids (small relative to the index: it broadcasts).
    * Offline maintenance, crash-safe via [[minhashIndexRecover]] (same
    * marker protocol as [[minhashIndexCompact]]); the ledger is
    * untouched (retired docs' batches stay ledgered, so replays still
    * skip them). */
  def minhashIndexDelete(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"minhashIndexDelete: ids must be a 1-column frame, got ${ids.columns.mkString(",")}")
    val del = broadcast(ids.toDF("index_id"))
    rewriteIndexTables(spark, namePrefix,
      bandsTbl => bandsTbl.join(del, Seq("index_id"), "left_anti"),
      shTbl => shTbl.join(del, Seq("index_id"), "left_anti"))
  }

  /** Test-only crash injection for the rewrite/recover gates (the
    * [[appendFailpoint]] pattern): called with (marker, stage) after each
    * rewrite step — stages are `rw:<table>`, `commit`, `drop:<table>`,
    * `rename:<table>`, `done`. Production value is a no-op. */
  @volatile private[graft] var rewriteFailpoint: (String, String) => Unit =
    (_, _) => ()

  /** Shared bucketed-rewrite machinery for compact/delete (LSH and PPJoin
    * indexes): transform each table, write to `__rw` twins at one file
    * per bucket, then swap. CRASH-SAFE (r15 VERDICT #3 — the append path
    * got its replay contract in r14; this closes the rewrite's): a
    * single-row `marker` table is written AFTER both twins fully
    * materialize and dropped after the last swap, so recovery
    * ([[recoverRewrite]]) always knows which side is authoritative —
    * no marker → the live tables were never touched, roll BACK (drop
    * twins); marker → the twins are complete, roll FORWARD (finish the
    * drop+rename per table). A rewrite started while a crashed one's
    * marker exists fails loudly (the live tables may be mid-swap). */
  private def rewriteTablesAtomic(spark: org.apache.spark.sql.SparkSession,
      marker: String, buckets: Int,
      rewrites: Seq[(String, Seq[String], DataFrame => DataFrame)]): Unit = {
    require(!spark.catalog.tableExists(marker),
      s"crashed rewrite detected (marker $marker exists) — run the index's " +
        "recover entry point before starting a new rewrite")
    rewrites.foreach { case (nm, _, _) =>
      dropTableAndLocation(spark, s"${nm}__rw") }
    rewrites.foreach { case (nm, bucketCols, f) =>
      f(spark.table(nm))
        .repartition(buckets, bucketCols.map(col): _*)
        .write.mode("overwrite")
        .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .format("parquet").saveAsTable(s"${nm}__rw")
      rewriteFailpoint(marker, s"rw:$nm")
    }
    spark.createDataFrame(rewrites.map(r => Tuple1(r._1))).toDF("table_name")
      .write.format("parquet").saveAsTable(marker)
    rewriteFailpoint(marker, "commit")
    rewrites.foreach { case (nm, _, _) =>
      spark.sql(s"DROP TABLE $nm")
      rewriteFailpoint(marker, s"drop:$nm")
      spark.sql(s"ALTER TABLE ${nm}__rw RENAME TO $nm")
      // the session caches file listings per table name — a renamed-in
      // rewrite must invalidate them or later scans read dropped files
      spark.catalog.refreshTable(nm)
      rewriteFailpoint(marker, s"rename:$nm")
    }
    dropTableAndLocation(spark, marker)
    rewriteFailpoint(marker, "done")
  }

  /** Complete or roll back an interrupted [[rewriteTablesAtomic]] (r15
    * VERDICT #3). Returns what it did: "completed" (marker present —
    * twins were fully written, so the swap is FINISHED per table:
    * drop the live table if its swap hadn't started, rename the twin
    * in), "rolled_back" (no marker — the live tables were never
    * touched; any twins are dropped), or "clean" (nothing to do).
    * Idempotent: a crash inside recovery re-recovers. */
  private def recoverRewrite(spark: org.apache.spark.sql.SparkSession,
      marker: String, tables: Seq[String]): String = {
    if (spark.catalog.tableExists(marker)) {
      for (nm <- tables) {
        if (spark.catalog.tableExists(s"${nm}__rw")) {
          if (spark.catalog.tableExists(nm)) spark.sql(s"DROP TABLE $nm")
          spark.sql(s"ALTER TABLE ${nm}__rw RENAME TO $nm")
        }
        require(spark.catalog.tableExists(nm),
          s"recover: neither $nm nor its __rw twin exists — the index " +
            "is beyond in-place recovery (re-persist it)")
        // invalidate cached file listings under the (re)used table name
        spark.catalog.refreshTable(nm)
      }
      dropTableAndLocation(spark, marker)
      "completed"
    } else if (tables.exists(nm =>
        spark.catalog.tableExists(s"${nm}__rw"))) {
      tables.foreach(nm => dropTableAndLocation(spark, s"${nm}__rw"))
      "rolled_back"
    } else "clean"
  }

  /** [[recoverRewrite]] for a persisted LSH index's compact/delete. */
  def minhashIndexRecover(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): String =
    recoverRewrite(spark, s"${namePrefix}_rwcommit",
      Seq(s"${namePrefix}_bands", s"${namePrefix}_shingles"))

  /** [[recoverRewrite]] for a persisted PPJoin index's delete. */
  def ppjoinIndexRecover(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String): String =
    recoverRewrite(spark, s"${namePrefix}_pprwcommit",
      Seq(s"${namePrefix}_pprefix", s"${namePrefix}_ppshingles"))

  private def rewriteIndexTables(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String,
      fBands: DataFrame => DataFrame,
      fShingles: DataFrame => DataFrame): Unit = {
    val buckets = indexParams(spark, namePrefix).buckets
    rewriteTablesAtomic(spark, s"${namePrefix}_rwcommit", buckets, Seq(
      (s"${namePrefix}_bands", Seq("band", "bucket"), fBands),
      (s"${namePrefix}_shingles", Seq("index_id"), fShingles)))
  }

  /** Retire documents from a persisted PPJoin prefix index (r15 VERDICT
    * #4 — the LSH index got compact+delete in r13/r14; exactness-mandated
    * corpora are the MOST likely to get takedown requests): anti-join
    * rewrite of `_pprefix` and `_ppshingles` through the same crash-safe
    * `__rw` machinery. The `_ppdf` table is deliberately untouched — the
    * frozen token order must not move (losslessness needs one agreed
    * total order; retired docs leaving their df counts behind is exactly
    * the already-documented selectivity staleness, never a recall
    * issue). Crash mid-rewrite → [[ppjoinIndexRecover]]. */
  def ppjoinIndexDelete(spark: org.apache.spark.sql.SparkSession,
      namePrefix: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"ppjoinIndexDelete: ids must be a 1-column frame, got ${ids.columns.mkString(",")}")
    require(spark.catalog.tableExists(s"${namePrefix}_ppparams"),
      s"persisted PPJoin index '$namePrefix' has no _ppparams table")
    val buckets = spark.table(s"${namePrefix}_ppparams")
      .select(col("buckets")).head().getInt(0)
    val del = broadcast(ids.toDF("index_id"))
    rewriteTablesAtomic(spark, s"${namePrefix}_pprwcommit", buckets, Seq(
      (s"${namePrefix}_pprefix", Seq("sh"),
        (d: DataFrame) => d.join(del, Seq("index_id"), "left_anti")),
      (s"${namePrefix}_ppshingles", Seq("index_id"),
        (d: DataFrame) => d.join(del, Seq("index_id"), "left_anti"))))
  }

  // ------------------------------------------------------------------
  // engine-portable MinHash — oracle-replayable LSH internals
  // ------------------------------------------------------------------

  /** The (a_i, b_i) universal-hash coefficients shared by the murmur and
    * portable signatures — deterministic in (numHashes, seed); the audit
    * oracle interpolates the identical values as SQL literals. */
  private[graft] def minhashCoefs(numHashes: Int, seed: Long): (Seq[Long], Seq[Long]) =
    ((0 until numHashes).map(i => 1L + 2L * Math.floorMod(mix64(seed + 2L * i), 1000000000L)),
      (0 until numHashes).map(i => Math.floorMod(mix64(seed + 2L * i + 1), 1000000000L)))

  private val lshP = 2147483647L // 2^31 − 1
  private[graft] val lshBucketM = 1000003L // polynomial band-fold multiplier

  /** Per-document LSH band buckets from ENGINE-PORTABLE arithmetic: the
    * same universal-hash signature fold as [[minhashBands]], but the base
    * hash is the md5 60-bit family ([[TextFunctions.md5ShingleHashes]])
    * reduced mod 2³¹−1 instead of murmur, and the band bucket is a
    * polynomial fold (acc·1000003 + sᵢ mod 2³¹−1) instead of `hash(...)`
    * — every operation is exact nonnegative integer arithmetic any
    * engine reproduces. Murmur stays the hot-path default (md5 costs
    * ~3× the hashing); this variant exists so LSH CANDIDATES — not just
    * the verified pairs — can be differentially audited (ext_lsh_recall
    * gates candidate counts, precision and recall bit-exactly against a
    * DuckDB replay). Documents shorter than n words are excluded (their
    * empty shingle set would collide in every band). */
  def minhashBandsPortable(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val numHashes = bands * rowsPerBand
    val (as, bs) = minhashCoefs(numHashes, seed)
    val aCoefs = typedlit(as)
    val bCoefs = typedlit(bs)
    // h < p and a ≤ 2e9+1, b < 1e9 → h·a + b < 2^63: no ANSI overflow
    val hp = transform(TextFunctions.md5ShingleHashes(col(textCol), n),
      h => pmod(h, lit(lshP)))
    val sig = aggregate(
      hp,
      array_repeat(lit(lshP), numHashes),
      (acc, h) => transform(acc, (m, i) =>
        least(m, pmod(h * element_at(aCoefs, i + 1) + element_at(bCoefs, i + 1),
          lit(lshP)))))
    // acc < p so acc·M + s < 2^52: no overflow
    def bucket(sigCol: Column, b: Int): Column =
      (0 until rowsPerBand).foldLeft(lit(0L): Column)((acc, j) =>
        pmod(acc * lit(lshBucketM) +
          element_at(sigCol, b * rowsPerBand + j + 1), lit(lshP)))
    fanOutScan(docs.filter(size(TextFunctions.words(col(textCol))) >= n))
      .select(col(idCol).as("doc_id"), sig.as("sig"))
      .select(col("doc_id"),
        posexplode(array((0 until bands).map(b => bucket(col("sig"), b)): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
  }

  /** Candidate pairs (doc_a < doc_b, distinct) from the portable banding
    * — the pre-verification front half of the LSH pipeline. */
  def minhashCandidatesPortable(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val banded = minhashBandsPortable(docs, textCol, idCol, n, bands, rowsPerBand, seed)
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact-Jaccard verification of an externally produced candidate pair
    * list — the public back half of candidates-then-verify, for
    * pipelines that generate candidates elsewhere (the portable-LSH
    * pipeline whose candidate set the oracle replays, an incremental
    * index probe, a cross-source blocking key). Same shape as the
    * verification inside [[minhashDedupPairs]]: two narrow shingle
    * joins + the guarded intersection. */
  def verifyCandidatePairs(docs: DataFrame, cands: DataFrame, textCol: String,
      idCol: String, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val shingled = fanOutScan(docs).select(col(idCol).as("doc_id"),
      TextFunctions.hashedShingles(col(textCol), n).as("shs"))
    verifyJaccard(cands
        .join(shingled.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), Seq("doc_a"))
        .join(shingled.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), Seq("doc_b")),
        "shs_a", "shs_b", threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** LSH candidate-quality audit: ONE row — (truth_pairs, cand_pairs,
    * tp, fp, fn, prec, rec) comparing the portable-LSH candidate set
    * against the exact-Jaccard ground truth at `threshold`. This is the
    * (bands, rowsPerBand) TUNING instrument: the S-curve predicts
    * recall 1 − (1 − jʳ)ᵇ at true Jaccard j, the audit measures it.
    *
    * Scale shape: truth reuses [[ngramJaccardPairs]]'s df-capped
    * inverted-index explosion; candidates are the banding self-join; the
    * comparison is one full-outer join on the pair key feeding a
    * single-row aggregate. Ground truth is inherently quadratic in
    * near-dup density — at corpus scale run the audit on a deterministic
    * sample ([[graft.functions.PortableHash]]) to pick parameters, then
    * run only the LSH at full width. */
  def lshAudit(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.8, bands: Int = 16,
      rowsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    // ground truth runs UNCAPPED (maxShingleDf = None): the audit's truth
    // universe must match the uncapped candidate set (and the oracle's
    // uncapped jp/pe replay) — a df-capped truth would silently shift
    // jaccard values on stop-phrase corpora. The quadratic stop-phrase
    // risk is the caller's to manage by auditing a sample (doc above).
    val truth = ngramJaccardPairs(docs, textCol, idCol, n, threshold,
        maxShingleDf = None)
      .select(col("doc_a"), col("doc_b")).withColumn("t", lit(1))
    val cands = minhashCandidatesPortable(docs, textCol, idCol, n, bands,
      rowsPerBand, seed).withColumn("c", lit(1))
    truth.join(cands, Seq("doc_a", "doc_b"), "full_outer")
      .agg(count("t").as("truth_pairs"), count("c").as("cand_pairs"),
        count(when(col("t").isNotNull && col("c").isNotNull, lit(1))).as("tp"))
      .select(col("truth_pairs"), col("cand_pairs"), col("tp"),
        (col("cand_pairs") - col("tp")).as("fp"),
        (col("truth_pairs") - col("tp")).as("fn"),
        (col("tp").cast("double") / col("cand_pairs").cast("double")).as("prec"),
        (col("tp").cast("double") / col("truth_pairs").cast("double")).as("rec"))
  }

  /** 64-bit SimHash over word tokens: per-bit weighted vote of token
    * hashes. Documents within `maxHamming` of each other are near-dups.
    *
    * One pass: each token is xxhash64'd once, folded into a 64-wide vote
    * vector (`+1` if the hash bit is set, `-1` otherwise), then the votes
    * are packed into the signature long — instead of 64 separate aggregate
    * passes over the token array. Bit masks live in one array literal so
    * extracting bit b under a lambda index is a constant-time
    * `element_at` + `bitwiseAND`. */
  def simhash64(text: Column): Column =
    simhashVotes(transform(TextFunctions.words(text), t => xxhash64(t)))

  /** Vote-fold over an array<long> of precomputed token hashes — the HOF
    * form of the native `graft_simhash` expression (identical arithmetic). */
  def simhashVotes(tokenHashes: Column): Column = {
    val masks = typedlit((0 until 64).map(b => 1L << b)) // bit 63 = Long.MinValue
    val votes = aggregate(
      tokenHashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0L, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v >= 0, m).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /** [[simhashVotes]] dispatching to the native codegen'd expression when
    * the session has GraftExtensions registered (bit-identical results). */
  def simhashFromHashes(df: DataFrame, tokenHashes: Column): Column =
    if (df.sparkSession.catalog.functionExists("graft_simhash"))
      call_function("graft_simhash", tokenHashes)
    else simhashVotes(tokenHashes)

  /** [[simhash64]] dispatching to the native codegen'd expression when the
    * session has GraftExtensions registered (bit-identical results). */
  def simhash64Fast(df: DataFrame, text: Column): Column =
    simhashFromHashes(df, transform(TextFunctions.words(text), t => xxhash64(t)))

  /** SimHash near-dup candidate pairs: block on `maxHamming + 1` disjoint
    * bit-bands (pigeonhole: two signatures within Hamming distance h must
    * agree exactly on at least one of h+1 disjoint bands), verify with exact
    * Hamming distance. Complete for the requested radius — but note the
    * bands shrink as 64/(h+1), so collision rates (and pair-generation cost)
    * grow quickly with h; h ≤ 6 keeps bands ≥ 9 bits. The classic web-dedup
    * setting is h = 3 (four 16-bit bands). */
  def simhashNearDupPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsFromSigs(
      docs.select(col(idCol).as("doc_id"), simhash64Fast(docs, col(textCol)).as("sig")),
      maxHamming)

  /** [[simhashNearDupPairs]] over the engine-portable md5 token-hash family
    * ([[TextFunctions.md5TokenHashes]], 60 effective bits): any engine with
    * md5 + hex parsing derives the identical signatures, so the result is
    * differential-oracle-checkable. Prefer the xxhash64 variant in
    * performance paths — md5 per token costs ~3× the hash time. */
  def simhashNearDupPairsPortable(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsFromSigs(
      docs.select(col(idCol).as("doc_id"),
        simhashFromHashes(docs, TextFunctions.md5TokenHashes(col(textCol))).as("sig")),
      maxHamming)

  /** Pair generation over precomputed (doc_id, sig) signatures — split out
    * so the banding-completeness property is testable independently of the
    * text→signature hash. */
  def simhashPairsFromSigs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming out of range")
    val nBands = maxHamming + 1
    // band q covers bits [lo(q), lo(q+1)): widths as equal as possible
    val bounds = (0 to nBands).map(q => q * 64 / nBands)
    val blocked = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until nBands).map { q =>
        val lo = bounds(q); val width = bounds(q + 1) - lo
        val mask = if (width == 64) -1L else (1L << width) - 1L
        shiftrightunsigned(col("sig"), lo).bitwiseAND(lit(mask))
      }: _*)))
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

  /** Per-(doc, token) TF-IDF over a corpus (sklearn smooth_idf formula:
    * idf = ln((N+1)/(df+1)) + 1). Three hash aggregates + one broadcast of
    * the 1-row corpus count — no windows, no driver-side count, fully
    * partial-aggregatable at any corpus size. */
  def tfidf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.words(lower(col(textCol)))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__n"))
    tf.join(dfCounts, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0)
      .withColumn("tfidf", col("tf") * col("idf"))
      .select("doc_id", "token", "tf", "idf", "tfidf")
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
