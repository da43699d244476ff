package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFunctions}

/** Corpus-curation operators for training-data pipelines beyond dedup:
  * benchmark decontamination, domain balancing (caps / stratified
  * fractions / importance resampling) and context-window sequence packing.
  * The reference has no direct analogs (its closest surfaces are the
  * dedup strategies in mars/dataframe/base/_duplicate.py:32 and weighted
  * sampling in mars/dataframe/indexing/sample.py:41); these are the
  * operations a 100 TB pretraining pipeline runs between dedup and
  * tokenization.
  *
  * Scale stance: every operator here either broadcasts a provably-small
  * side (the benchmark set, per-domain counts) or stays in one hash
  * shuffle keyed on the unit of work (domain, shard) — no global windows,
  * no driver loops, deterministic PortableHash randomness throughout so
  * reruns and engines agree bit-for-bit.
  */
object Curation {

  /** Benchmark decontamination: the standard n-gram test-set-overlap
    * filter (industry practice is 13-grams over tokenized text; `n` is a
    * parameter because short fixture docs need smaller n). Every document
    * is scored with the count of distinct word n-grams it shares with ANY
    * benchmark document, plus a `contaminated` flag at `minOverlap`.
    *
    * The benchmark side (test sets, eval prompts) is tiny by construction
    * — its distinct hashed shingles broadcast; the corpus side streams
    * through a broadcast-hash semi-aggregation with NO shuffle of
    * documents themselves, only of (doc_id, matched-shingle) pairs that
    * actually hit the benchmark filter. Shingles compare as xxhash64
    * longs: the count of matching hashes equals the count of matching
    * strings up to a 2^-64 collision, and counts (not hash values) are
    * the output, so results stay engine-checkable. */
  def decontaminate(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val benchSh = bench
      .select(explode(TextFunctions.hashedShingles(col(textCol), n)).as("__sh"))
      .distinct()
    val hits = docs
      .select(col(idCol), explode(TextFunctions.hashedShingles(col(textCol), n)).as("__sh"))
      .join(broadcast(benchSh), Seq("__sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_ngrams")) // shingles are distinct per doc
    docs.join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated_ngrams",
        coalesce(col("n_contaminated_ngrams"), lit(0L)))
      .withColumn("contaminated", col("n_contaminated_ngrams") >= minOverlap)
  }

  /** [[decontaminate]] with a Bloom PREFILTER before the exact verify
    * join — same exact result (the verify join removes every Bloom false
    * positive), different scale shape: the corpus's shingle stream is
    * filtered by a broadcast bitset AT THE SCAN, so only true hits plus an
    * fpp-fraction of false positives ever enter the join. With a 1%-fpp
    * filter, a 100 TB corpus that is 99% clean sends ~1% of its shingle
    * pairs across the wire instead of 100% — the broadcast-hash join in
    * [[decontaminate]] already avoids a shuffle, but still evaluates the
    * hash probe per shingle; the bitset probe is a few ns and prunes
    * before the (doc_id, shingle) projection is even built.
    *
    * The Bloom filter is fitted with the distributed built-in
    * `stat.bloomFilter` aggregate (only the final bitset reaches the
    * driver — fit-time scalar, like every model fit in graft.learn) and
    * embedded as a literal, which satisfies the probe expression's
    * foldability contract. Needs `graft_might_contain` from
    * [[graft.plans.GraftExtensions]]; sessions without the extension fall
    * back to the exact path. */
  def decontaminateBloom(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, n: Int = 3, minOverlap: Int = 1,
      fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    if (!spark.catalog.functionExists("graft_might_contain"))
      return decontaminate(docs, bench, textCol, idCol, n, minOverlap)
    // persisted: the shingle explosion feeds three consumers (count,
    // bloom fit, verify join) — without the persist each re-runs it
    val benchSh = bench
      .select(explode(TextFunctions.hashedShingles(col(textCol), n)).as("__sh"))
      .distinct()
      .persist()
    val nItems = math.max(benchSh.count(), 1L)
    val bf = benchSh.stat.bloomFilter("__sh", nItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val candidates = docs
      .select(col(idCol), explode(TextFunctions.hashedShingles(col(textCol), n)).as("__sh"))
      .filter(call_function("graft_might_contain", lit(bos.toByteArray), col("__sh")))
    val hits = candidates
      .join(broadcast(benchSh), Seq("__sh")) // exact verify kills false positives
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
    docs.join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated_ngrams",
        coalesce(col("n_contaminated_ngrams"), lit(0L)))
      .withColumn("contaminated", col("n_contaminated_ngrams") >= minOverlap)
  }

  /** Overlapping context-window chunking (the tokenize-and-chunk step of
    * a pretraining / RAG pipeline): each document's word sequence is cut
    * into windows of `chunkSize` words advancing by `chunkSize − overlap`;
    * the final window is the last full stride even when shorter. One
    * narrow projection + explode — no shuffle, chunk count ∝ doc length.
    * Returns (idCol, chunk_idx, n_tokens, chunk). */
  def chunkWords(docs: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got overlap=$overlap chunkSize=$chunkSize")
    val stride = chunkSize - overlap
    val w = TextFunctions.words(col(textCol))
    // chunks = 1 + ceil((len - chunkSize) / stride) for len > chunkSize
    val nChunks = when(size(w) <= chunkSize, lit(1L)).otherwise(
      ((size(w) - chunkSize + stride - 1) / stride).cast("long") + 1L)
    docs
      .where(col(textCol).isNotNull) // a null doc has no chunks (pandas NaN row drop)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), nChunks - 1L),
          i => array_join(slice(w, (i * stride + 1L).cast("int"), lit(chunkSize)), " "))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        size(split(col("col"), " ")).cast("long").as("n_tokens"),
        col("col").as("chunk"))
  }

  /** Structural skew valve for the per-domain ordered-prefix samplers
    * (r10, VERDICT task 2). [[domainCap]], [[mixtureSample]] and
    * [[tokenBudgetSample]] all keep a per-domain PREFIX of the
    * (hash32(id), id) order — previously via one window task per domain,
    * which a mega-domain could turn into a single straggler task. This
    * valve pre-filters every domain larger than `threshold` rows with
    * `uniform01(id) < p_d` BEFORE the window runs. [[PortableHash.uniform01]]
    * is strictly monotone in hash32, so the filter keeps exactly a
    * downward-closed prefix of the window order: row_number and
    * cumulative sums over the survivors EQUAL their full-domain values
    * and the selected set is identical — exact, never approximate.
    *
    * p_d = min(1, (oversample·B_d + 64·wmax_d)/W_d), with B_d the
    * domain's budget and W_d its total selection weight (rows for the
    * count samplers, tokens for the budget sampler): surviving weight
    * concentrates around oversample× the budget plus an absolute slack,
    * so undershoot is Chernoff-negligible. A window aggregate over the
    * (now small) survivors still VERIFIES that each thinned domain
    * either covers its budget or survived whole, and raises loudly with
    * a remedy (raise oversample) on the astronomically-unlikely
    * deterministic miss — correctness is never silent.
    *
    * Scale shape: one partial+final aggregate to a per-domain table
    * (broadcast back), a scan-side filter, then the caller's window sees
    * O(oversample·budget) rows per mega-domain instead of the whole
    * domain. Null ids always survive the filter (they sort first in the
    * window order, so they are part of every prefix). The output keeps
    * the caller's columns plus `__bud` (the guarded double budget) —
    * callers filter against `__bud` so Catalyst cannot prune the guard.
    * `threshold = Long.MaxValue` opts out entirely (plain window). */
  private[operators] def prefixSkewValve(docs: DataFrame, domainCol: String,
      idCol: String, weight: Column, budget: Column, threshold: Long,
      oversample: Double): DataFrame = {
    require(oversample >= 1.0, s"oversample must be >= 1: $oversample")
    if (threshold == Long.MaxValue)
      return docs.withColumn("__bud", budget.cast("double"))
    val tagged = docs.withColumn("__psv_w", weight.cast("double"))
      .withColumn("__bud", budget.cast("double"))
    val stats = tagged.groupBy(col(domainCol).as("__psv_d")).agg(
      count(lit(1)).as("__psv_n"), sum(col("__psv_w")).as("__psv_wsum"),
      max(col("__psv_w")).as("__psv_wmax"), first(col("__bud")).as("__psv_b"))
    val p = when(col("__psv_n") <= threshold, lit(1.0)).otherwise(
      least(lit(1.0), (lit(oversample) * col("__psv_b") +
        lit(64.0) * greatest(col("__psv_wmax"), lit(1.0))) / col("__psv_wsum")))
    val dim = stats.select(col("__psv_d"), p.as("__psv_p"), col("__psv_n"))
    val thin = tagged
      .join(broadcast(dim), col(domainCol) <=> col("__psv_d"))
      .filter(col("__psv_p") === 1.0 || col(idCol).isNull ||
        PortableHash.uniform01(col(idCol)) < col("__psv_p"))
    // coverage proof over the survivors: same partitioning as the
    // caller's window (one exchange, two Window operators)
    val wAll = Window.partitionBy(col(domainCol))
    val covered = sum(col("__psv_w")).over(wAll) >= col("__bud") ||
      count(lit(1)).over(wAll) === col("__psv_n")
    thin.withColumn("__bud",
        when(col("__psv_p") < 1.0 && !covered,
          raise_error(concat(lit("prefixSkewValve: thinned domain '"),
            col(domainCol).cast("string"),
            lit("' does not cover its budget — raise oversample " +
              "(deterministic for this dataset, not a flaky draw)"))))
          .otherwise(col("__bud")))
      .drop("__psv_d", "__psv_w", "__psv_p", "__psv_n")
  }

  /** Default mega-domain threshold for the prefix valve: one window task
    * sorting ~1M rows is comfortably bounded; anything larger thins. */
  private[operators] val SkewThreshold = 1000000L

  /** Exact per-domain document cap: keep at most `cap` documents per
    * domain, chosen by PortableHash order on the id (an unbiased,
    * rerun-stable sample — ingestion order would systematically prefer
    * old crawls). Skew-safe BY CONSTRUCTION (r10): domains above
    * `skewThreshold` rows are pre-thinned to an exact prefix of the
    * window order by [[prefixSkewValve]], so the per-domain window task
    * is O(oversample·cap) even for a mega-domain — results identical to
    * the plain window at every scale. [[domainCapApprox]] remains the
    * zero-window approximate alternative. */
  def domainCap(docs: DataFrame, domainCol: String, idCol: String, cap: Int,
      skewThreshold: Long = SkewThreshold, oversample: Double = 4.0)
      : DataFrame = {
    val cands = prefixSkewValve(docs, domainCol, idCol, lit(1.0),
      lit(cap.toDouble), skewThreshold, oversample)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(PortableHash.hash32(col(idCol)), col(idCol))
    cands.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__bud").cast("long"))
      .drop("__rn", "__bud")
  }

  /** Approximate per-domain cap for the mega-domain regime: per-domain
    * counts (one partial+final aggregate, broadcast back — thousands of
    * domains, not rows), then each row keeps with probability cap/count
    * via the portable uniform. Expected kept ≈ cap per domain, zero
    * windows, the corpus side never shuffles. */
  def domainCapApprox(docs: DataFrame, domainCol: String, idCol: String, cap: Int)
      : DataFrame = {
    val counts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("__dn"))
    docs.join(broadcast(counts), Seq(domainCol))
      .filter(PortableHash.uniform01(col(idCol)) <
        least(lit(1.0), lit(cap.toDouble) / col("__dn").cast("double")))
      .drop("__dn")
  }

  /** Exact mixture-matching sample (resample a corpus to a TARGET domain
    * mixture, the count-targeted sibling of [[stratifiedSample]]'s
    * fractions): per domain d, keep exactly min(floor(totalN·w_d/Σw), |d|)
    * documents in PortableHash order on the id — unbiased, rerun- and
    * engine-stable. Domains absent from `weights` are dropped. Skew-safe
    * by construction (r10): [[prefixSkewValve]] pre-thins every domain
    * above `skewThreshold` rows to an exact prefix of the window order,
    * so a mega-domain can no longer pin its whole row set on one window
    * task — results identical at every scale. */
  def mixtureSample(docs: DataFrame, domainCol: String, idCol: String,
      weights: Map[String, Double], totalN: Long,
      skewThreshold: Long = SkewThreshold, oversample: Double = 4.0): DataFrame = {
    require(totalN > 0 && weights.nonEmpty && weights.values.forall(_ > 0),
      "mixtureSample: totalN and every weight must be positive")
    // fold the normalizer in sorted domain order — a deterministic left
    // fold any engine can replay (list_sum(list(w ORDER BY domain)));
    // unordered Map iteration would make the float sum (and with it the
    // floor'd targets) construction-order-dependent
    val wsum = weights.toSeq.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    val targetCol = weights.foldLeft(lit(-1L)) { case (acc, (d, w)) =>
      when(col(domainCol) === d,
        lit(math.floor(totalN * w / wsum).toLong)).otherwise(acc)
    }
    val cands = prefixSkewValve(
      docs.withColumn("__tgt", targetCol).filter(col("__tgt") >= 0L),
      domainCol, idCol, lit(1.0), col("__tgt"), skewThreshold, oversample)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(PortableHash.hash32(col(idCol)), col(idCol))
    cands.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__bud").cast("long"))
      .drop("__tgt", "__rn", "__bud")
  }

  /** Temperature-smoothed domain weights (the multilingual / data-mixing
    * standard — Arivazhagan et al. 2019, XLM-R: p_d ∝ (n_d/N)^α with
    * α = 1/T): each domain's weight is its own document count raised to
    * α, so α = 1 keeps natural proportions, α < 1 upsamples the tail,
    * α = 0 is uniform. Returns the weight map for [[mixtureSample]].
    *
    * The per-domain counts are one partial+final aggregate; only the
    * domain table (bounded by `maxDomains`, loud when exceeded) reaches
    * the driver — the standard small-metadata collect, same contract as
    * silhouette's guard. α = 0.5 routes through `sqrt` (IEEE
    * correctly-rounded, so weights replay bit-identically in any
    * engine); other α use `pow` (platform libm, ±1 ulp). */
  def temperatureWeights(docs: DataFrame, domainCol: String,
      alpha: Double, maxDomains: Int = 100000): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1]: $alpha")
    val rows = docs.groupBy(col(domainCol).cast("string").as("__d"))
      .agg(count(lit(1)).as("__n"))
      .limit(maxDomains + 1).collect()
    require(rows.length <= maxDomains,
      s"temperatureWeights: more than $maxDomains distinct domains — " +
        "this is a domain-METADATA operator; raise maxDomains " +
        "deliberately if the cardinality is intended")
    rows.map { r =>
      val n = r.getLong(1).toDouble
      r.getString(0) -> (if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha))
    }.toMap
  }

  /** Temperature-based corpus re-mixing: [[temperatureWeights]] composed
    * with [[mixtureSample]] — resample to exactly
    * floor(totalN · n_d^α / Σ n^α) documents per domain in PortableHash
    * order. One count aggregate + one window per domain; rerun- and
    * engine-stable. */
  def temperatureSample(docs: DataFrame, domainCol: String, idCol: String,
      alpha: Double, totalN: Long): DataFrame =
    mixtureSample(docs, domainCol, idCol,
      temperatureWeights(docs, domainCol, alpha), totalN)

  /** Token-budget sampling — [[mixtureSample]] measured in tokens instead
    * of documents (training mixtures are specified in tokens): per domain,
    * keep documents in PortableHash order while the running token total
    * stays within the domain's budget (first-fit prefix — a document that
    * would overflow the budget stops the take, so kept ≤ budget always).
    * One cumulative-sum window per domain over exact BIGINTs; domains
    * absent from `budgets` are dropped. Skew-safe by construction (r10):
    * [[prefixSkewValve]] pre-thins mega-domains (weighted in TOKENS
    * here) to an exact prefix of the window order before the cumsum. */
  def tokenBudgetSample(docs: DataFrame, domainCol: String, idCol: String,
      tokenCol: String, budgets: Map[String, Long],
      skewThreshold: Long = SkewThreshold, oversample: Double = 4.0): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      "tokenBudgetSample: every budget must be positive")
    val budgetCol = budgets.foldLeft(lit(-1L)) { case (acc, (d, b)) =>
      when(col(domainCol) === d, lit(b)).otherwise(acc)
    }
    val cands = prefixSkewValve(
      docs.withColumn("__budget", budgetCol).filter(col("__budget") >= 0L),
      domainCol, idCol, col(tokenCol).cast("double"), col("__budget"),
      skewThreshold, oversample)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(PortableHash.hash32(col(idCol)), col(idCol))
    cands.withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .filter(col("__cum") <= col("__bud").cast("long"))
      .drop("__budget", "__cum", "__bud")
  }

  /** Stratified sampling with per-domain fractions (domain-mixing weights:
    * "keep 10% of CommonCrawl, all of Wikipedia"). Deterministic via the
    * portable uniform on the id — reproducible across runs and engines,
    * no shuffle at all (pure filter). */
  def stratifiedSample(docs: DataFrame, domainCol: String, idCol: String,
      fracs: Map[String, Double], defaultFrac: Double): DataFrame = {
    val frac = fracs.foldLeft(lit(defaultFrac)) { case (acc, (dom, f)) =>
      when(col(domainCol) === dom, lit(f)).otherwise(acc)
    }
    docs.filter(PortableHash.uniform01(col(idCol)) < frac)
  }

  /** Weighted sampling WITHOUT replacement, k items (Efraimidis–Spirakis
    * A-Res): each row draws the key u^(1/w) with u the deterministic
    * portable uniform of its id, and the global top-k keys win —
    * inclusion probability proportional to weight, rerun- and
    * engine-stable, one distributed TakeOrdered (no shuffle of the
    * corpus, no per-partition reservoir state). Weights must be > 0 and
    * non-null — enforced row-wise with a raise_error expression (a null
    * key would silently drop the row from the desc sort; a negative
    * weight gives u^(1/w) > 1 and inverts the selection), failing fast
    * like the repo's other operator guards. */
  def weightedSample(docs: DataFrame, weightCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = col(weightCol).cast("double")
    val wChecked = when(w.isNull || w <= 0.0,
      raise_error(concat(
        lit(s"weightedSample: weight column '$weightCol' must be > 0, got "),
        coalesce(w.cast("string"), lit("null")),
        lit(" at id "), col(idCol).cast("string")))).otherwise(w)
    val key = pow(PortableHash.uniform01(col(idCol)), lit(1.0) / wChecked)
    docs.withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Quality-weighted importance resampling: keep each document with
    * probability clamp(weight, 0, 1) — the standard way to skew a corpus
    * toward high-quality text without hard thresholds. Pure filter on the
    * portable uniform: scan-speed, deterministic, rerun-stable. */
  def importanceResample(docs: DataFrame, weightCol: String, idCol: String)
      : DataFrame =
    docs.filter(PortableHash.uniform01(col(idCol)) <
      least(lit(1.0), greatest(lit(0.0), col(weightCol).cast("double"))))

  /** Gopher/MassiveText document-quality rule flags (Rae et al. 2021,
    * table A1; the RefinedWeb/Dolma descendants use the same rules):
    * word count bounds, mean-word-length bounds, symbol-to-word ratio
    * ('#' plus ellipses — both ASCII '...' and Unicode '…' U+2026),
    * bullet-line and ellipsis-line fractions (either ellipsis form),
    * alphabetic-word fraction, stopword presence, and distinct-word
    * fraction. Returns (idCol, n_words, one boolean per rule, pass).
    *
    * Pure per-row projection — zero shuffles, scan-speed at any corpus
    * size, and every flag is deterministic integer/double arithmetic
    * reproducible in any engine. The intra-document repetition trio
    * (top-gram coverage, dup-n-gram fractions) lives in
    * [[Repetition.signals]] and composes by id-join — see the curation
    * pipelines. */
  def gopherFlags(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2, minUniqFrac: Double = 0.2): DataFrame = {
    val txt = col(textCol)
    val ws = TextFunctions.words(txt)
    val nw = size(ws).cast("double")
    val mwl = TextFunctions.meanWordLen(txt)
    val hashes = (length(txt) - length(translate(txt, "#", ""))).cast("double")
    val ellipses = (length(txt) - length(regexp_replace(txt, "\\.\\.\\.", "")))
      .cast("double") / lit(3).cast("double") +
      (length(txt) - length(translate(txt, "…", ""))).cast("double")
    val lines = split(txt, "\n")
    val nl = size(lines).cast("double")
    val bullets = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
      .cast("double")
    val ellLines = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))).cast("double")
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double")
    val stops = Seq("the", "a", "and", "of", "to", "in", "is", "that")
    val nStop = stops.map(s => array_contains(ws, s).cast("int")).reduce(_ + _)
    val uniq = size(array_distinct(ws)).cast("double")
    val flags = Seq(
      "f_words" -> (size(ws) >= minWords && size(ws) <= maxWords),
      "f_word_len" -> (mwl >= minMeanWordLen && mwl <= maxMeanWordLen),
      "f_symbol" -> ((hashes + ellipses) / nw < maxSymbolRatio),
      "f_bullet" -> (bullets / nl < maxBulletFrac),
      "f_ellipsis" -> (ellLines / nl < maxEllipsisFrac),
      "f_alpha" -> (alphaWords / nw > minAlphaFrac),
      "f_stop" -> (nStop >= minStopwords),
      "f_uniq" -> (uniq / nw >= minUniqFrac))
    docs.select(
      col(idCol) +: size(ws).cast("long").as("n_words") +:
        flags.map { case (n, c) => c.as(n) } :+
        flags.map(_._2).reduce(_ && _).as("pass"): _*)
  }

  /** C4 cleaning rules (Raffel et al. 2020 §2.2, the public C4/mC4
    * pipeline; the line-level sibling of [[gopherFlags]]'s document
    * rules — the reference has no analog). A line survives iff it ends
    * in terminal punctuation ('.', '!', '?', '"'), has at least
    * `minLineWords` words, and does not mention "javascript"
    * (case-insensitive). The whole document is dropped when the ORIGINAL
    * text contains '{' (code) or any `badPhrases` entry
    * (case-insensitive; C4's "lorem ipsum" placeholder rule), or when
    * fewer than `minSentences` sentence enders ('.', '!', '?') survive
    * line cleaning. Returns (id, n_lines, n_lines_kept, n_sentences,
    * has_brace, has_phrase, kept, text_clean) — flags for audit, `kept`
    * the verdict, `text_clean` the reassembled page.
    *
    * Pure per-row projection over the line split — zero shuffles,
    * scan-speed at any corpus size, every rule deterministic string /
    * integer arithmetic reproducible in any engine. */
  def c4Clean(docs: DataFrame, textCol: String, idCol: String,
      minLineWords: Int = 5, minSentences: Int = 3,
      badPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    require(minLineWords >= 1 && minSentences >= 0,
      s"need minLineWords >= 1 and minSentences >= 0, " +
        s"got $minLineWords / $minSentences")
    require(badPhrases.forall(p => p.nonEmpty && p == p.toLowerCase),
      "badPhrases must be non-empty lowercase literals (matching is " +
        "case-insensitive on a lowered copy of the text)")
    val txt = col(textCol)
    val lines = split(txt, "\n")
    val keptLines = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        size(split(l, " ")) >= minLineWords &&
        !lower(l).contains("javascript"))
    val clean = array_join(keptLines, "\n")
    val nSent = (length(clean) - length(translate(clean, ".!?", ""))).cast("long")
    val hasBrace = txt.contains("{")
    val hasPhrase = badPhrases.map(p => lower(txt).contains(p)).reduce(_ || _)
    docs.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(keptLines).cast("long").as("n_lines_kept"),
      nSent.as("n_sentences"),
      hasBrace.as("has_brace"),
      hasPhrase.as("has_phrase"),
      (!hasBrace && !hasPhrase && nSent >= minSentences).as("kept"),
      clean.as("text_clean"))
  }

  /** fastText-style linear quality-classifier INFERENCE over hashed
    * unigram features: score = sigmoid(bias + Σ_b w_b · tf_b / n_d) with
    * tf from [[TextFunctions.hashingTf]]'s engine-portable md5 buckets.
    * Weights come from any offline trainer (e.g. MLlib logistic
    * regression over the same hashed features — the classifier half of a
    * CCNet/DCLM-style quality pipeline); applying them is pure
    * arithmetic, so corpus scoring stays deterministic, engine-checkable,
    * and broadcast-free: the weight map is a literal in the plan.
    *
    * Scale shape: one explode → partial+final count aggregate keyed
    * (doc, bucket) — at most `dim` rows per doc — then one id-keyed
    * aggregate and an id join for the length normalizer. */
  def linearTextScore(docs: DataFrame, textCol: String, idCol: String,
      weights: Map[Int, Double], bias: Double, dim: Int = 64): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    require(weights.keys.forall(b => b >= 0 && b < dim),
      s"weight buckets must lie in [0, $dim)")
    val wMap = typedlit(weights.map { case (k, v) => (k.toLong, v) })
    val nTok = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("__n"))
    TextFunctions.hashingTf(docs, idCol, textCol, dim)
      .withColumn("__w", coalesce(element_at(wMap, col("bucket")), lit(0.0)))
      .groupBy(col(idCol))
      .agg(sum(col("__w") * col("tf").cast("double")).as("__dot"))
      .join(nTok, Seq(idCol))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + col("__dot") / col("__n").cast("double")))))
          .as("score"))
  }

  /** Deterministic shard assignment for training-data export: shard =
    * PortableHash bucket of the id — rerun- and engine-stable, uniform
    * over any id distribution (residue-striped snowflake ids included). */
  def shardAssign(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs.withColumn("shard", PortableHash.bucket(col(idCol), nShards))
  }

  /** Sharded training-data export with a deterministic global shuffle:
    * documents land in `nShards` hash shards, and rows inside each shard
    * file appear in avalanche-hash order of the id — the decorrelated
    * "shuffled" order a training dataloader expects, reproducible across
    * reruns and engines, WITHOUT a global sort (hash order is
    * data-independent, so sorting shard-locally gives the same stream a
    * global hash sort would, shard by shard).
    *
    * Plan shape: one hash repartition keyed on the shard id, a
    * shard-major in-partition sort (each task writes its shards
    * sequentially, one parquet file per shard via partitionBy), nothing
    * on the driver. At 100 TB pick nShards ≫ executors so AQE skew
    * splitting keeps tasks even; per-file row order stays (hash, id)
    * regardless. */
  def writeShards(docs: DataFrame, idCol: String, nShards: Int,
      path: String): Unit =
    shardAssign(docs, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"),
        PortableHash.hash32(col(idCol)), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Greedy sequence packing: assign documents to fixed-capacity context
    * windows ("packs") of `capacity` tokens, shard-locally. Documents are
    * hashed into `nShards` shards (PortableHash — deterministic), ordered
    * by id within a shard, and packed first-fit-sequential: a document
    * that would overflow the current pack starts the next one; documents
    * longer than `capacity` occupy a pack alone.
    *
    * Output adds (shard, pack_id, pack_offset, n_tokens) — pack_id is
    * shard-local and pack_offset is the document's token start inside its
    * pack. Plan shape: one hash repartition on shard + sortWithinPartitions
    * + a stateful mapPartitions (same machinery as the ewm pass — no
    * per-group materialization, O(1) state per shard). Global greedy
    * packing is inherently sequential; sharding is what makes it scale —
    * each of the 1000 executors packs its shards independently, and pack
    * quality (fill ratio) is unaffected because document order carries no
    * length signal after hashing. */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
      capacity: Int, nShards: Int): DataFrame =
    packSequencesByLen(docs, TextFunctions.tokenCount(col(textCol)),
      idCol, capacity, nShards)

  /** [[packSequences]] with an arbitrary per-document token-LENGTH
    * expression (r16): the ids path — a pipeline that encoded docs to
    * token ids packs by `size(ids)`, e.g.
    * `packSequencesByLen(docs, size(col("ids")).cast("long"), ...)` —
    * so packing consumes the BPE id stream end-to-end (ext_bpe_pack_ids
    * gates it). Same shard-local greedy first-fit, same output schema. */
  def packSequencesByLen(docs: DataFrame, lenCol: Column, idCol: String,
      capacity: Int, nShards: Int): DataFrame = {
    require(capacity > 0 && nShards > 0, "capacity and nShards must be positive")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val withLen = docs
      .withColumn("shard", PortableHash.bucket(col(idCol), nShards))
      .withColumn("n_tokens", lenCol.cast("long"))
    val shardIdx = withLen.columns.indexOf("shard")
    val tokIdx = withLen.columns.indexOf("n_tokens")
    val outSchema = StructType(withLen.schema.fields ++ Seq(
      StructField("pack_id", LongType), StructField("pack_offset", LongType)))
    implicit val rowEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    withLen
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .mapPartitions { rows =>
        // a partition holds whole shards (hash partitioning on shard);
        // reset the accumulator at every shard boundary
        val full = capacity.toLong + 1 // sentinel: forces a fresh pack (no Long overflow)
        var curShard = Long.MinValue
        var packId = -1L
        var used = full
        rows.map { r =>
          val shard = r.getLong(shardIdx)
          val nTok = r.getLong(tokIdx)
          if (shard != curShard) { curShard = shard; packId = -1L; used = full }
          if (used + nTok > capacity) { packId += 1; used = 0L }
          val offset = used
          used += nTok
          Row.fromSeq(r.toSeq ++ Seq(packId, offset))
        }
      }
  }

  /** Measured pack-assembly fan-out for [[packSequencesEmit]]'s
    * collect_list exchange: the id arrays are ~4 bytes/token against
    * ~snappy-compressed text input, so the assembly shuffle moves a few
    * times the scan bytes (ScaleBench pack_ids cell measures it; the
    * exact ratio matters less than NOT flooring the width at the
    * input-sized value — the ppjoinPrefix by-doc-groupBy lesson). */
  private[operators] val PackFanOut = 4L

  /** MATERIALIZED packed sequences (r17 VERDICT #2): what a data loader
    * actually reads — per pack, the member documents' token ids
    * concatenated in id order with `eosId` appended after EVERY document
    * (so packs concatenate cleanly across shards), plus a `doc_spans`
    * column (array of (doc_id, start, len), `start`/`len` in tokens
    * over the EMITTED array, EOS excluded from `len`) so loaders can
    * rebuild attention/document boundaries without re-tokenizing.
    *
    * Packing reserves ONE slot per document for its EOS separator
    * (first-fit over size(ids)+1), so emitted arrays never exceed
    * `capacity`; a document alone in a pack may exceed it, exactly like
    * the scalar packer's oversized-document rule.
    *
    * Fold shape: the per-pack assembly is collect_list → sort_array →
    * flatten (the LabelProp ordered-fold convention — exact and
    * partitioning-invariant; ids are ints, so there is no float-order
    * question, but the ORDER of documents inside a pack is part of the
    * contract and must not depend on task layout). The groupBy moves
    * every id byte (collect_list has no partial-agg reduction), so the
    * exchange is explosion-shaped: width = [[Dedup.fanOutWidth]] at
    * [[PackFanOut]], the ppjoinPrefix lesson as code. Spans are computed
    * per pack by one interpreted fold over the (small) member list —
    * bounded by docs-per-pack, never corpus-wide.
    *
    * Oracle: ext_bpe_pack_seqs replays the first-fit fold as a recursive
    * CTE over replayed BPE token counts and the pack assembly as
    * flatten(list(... ORDER BY doc_id)) — exact integers end to end. */
  def packSequencesEmit(docs: DataFrame, idsCol: String, idCol: String,
      capacity: Int, nShards: Int, eosId: Int): DataFrame = {
    require(eosId >= 0, s"eosId must be a valid token id: $eosId")
    val packed = packSequencesByLen(docs,
        size(col(idsCol)).cast("long") + 1L, idCol, capacity, nShards)
      .select(col("shard"), col("pack_id"),
        col(idCol).cast("long").as("__doc"), col(idsCol).as("__ids"))
    val width = Dedup.fanOutWidth(docs, PackFanOut)
    val emptySpans = array().cast(
      "array<struct<doc_id:bigint,start:int,len:int>>")
    packed
      .repartition(width, col("shard"), col("pack_id"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(sort_array(collect_list(struct(
        col("__doc").as("doc_id"), col("__ids").as("ids")))).as("__ds"))
      .select(col("shard"), col("pack_id"),
        flatten(transform(col("__ds"),
          d => concat(d.getField("ids"), array(lit(eosId))))).as("ids"),
        aggregate(col("__ds"),
          struct(lit(0).as("off"), emptySpans.as("sp")),
          (acc, d) => struct(
            (acc.getField("off") + size(d.getField("ids")) + lit(1))
              .as("off"),
            concat(acc.getField("sp"), array(struct(
              d.getField("doc_id").as("doc_id"),
              acc.getField("off").as("start"),
              size(d.getField("ids")).as("len")))).as("sp")),
          acc => acc.getField("sp")).as("doc_spans"),
        size(col("__ds")).cast("long").as("n_docs"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** DSIR-style importance weights (hashed n-gram importance resampling):
    * score every raw document by the log-likelihood ratio of a TARGET
    * corpus (the high-quality distribution you want more of) against the
    * RAW corpus, both modeled as Laplace-smoothed multinomials over `dim`
    * hashed word-bigram buckets:
    *
    *   weight(d) = Σ_b n_d(b) · [ ln p̂_target(b) − ln p̂_raw(b) ],
    *   p̂(b) = (count(b) + 1) / (total + dim).
    *
    * Feed the output to [[importanceResample]] (after squashing to [0,1])
    * to skew the kept corpus toward the target domain — the standard
    * recipe for "make the web crawl look more like Wikipedia".
    *
    * Scale shape: both distribution fits are one explode + one
    * partial/final count each, collapsing to ≤ `dim` rows — the λ(b)
    * log-ratio table is corpus-size-independent and broadcasts; per-doc
    * scoring is one explode + (doc, bucket) count + broadcast probe + one
    * final sum keyed by doc. Nothing quadratic, no driver collection.
    * Buckets use the engine-portable md5 family (same convention as
    * [[TextFunctions.hashingTf]]) so any engine derives identical
    * buckets. The per-doc Σ nb·λ sums exact scaled integers
    * (floor(term·1e6 + 0.5) longs — see TextFunctions.unigramStats): a
    * raw double sum is summation-order-dependent, so the same corpus
    * could rank differently run to run, and the weight IS the top-k
    * selection key downstream. */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, dim: Int = 1024): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    def bucketed(df: DataFrame) = df
      .select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), 2)).as("__g"))
      .select(col(idCol), pmod(
        conv(substring(md5(col("__g").cast("binary")), 1, 15), 16, 10).cast("long"),
        lit(dim.toLong)).as("bucket"))
    val rawB = bucketed(raw)
    val tgtCnt = bucketed(target).groupBy("bucket").agg(count(lit(1)).as("ct"))
    val rawCnt = rawB.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgtTot = tgtCnt.agg(sum("ct").as("tt"))
    val rawTot = rawCnt.agg(sum("cr").as("tr"))
    // λ(b) over every bucket seen in raw (a doc's buckets are a subset of
    // raw's by construction); buckets unseen in target smooth to ct=0
    val lambda = rawCnt
      .join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(rawTot))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
             (col("tt") + dim).cast("double")) -
         log((col("cr") + 1).cast("double") /
             (col("tr") + dim).cast("double"))).as("lam"))
    rawB.groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("nb"))
      .join(broadcast(lambda), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(floor(col("nb") * col("lam") * lit(1000000.0) + lit(0.5))
        .cast("long")).as("__s"))
      .select(col(idCol),
        round(col("__s").cast("double") / lit(1000000.0), 4).as("dsir_weight"))
  }
}
