package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off generator for [[PinnedBpe]] — trains a byte-pair-encoding
  * merge table on the documents fixture and prints it as Scala source
  * (the [[graft.learn.PinnedForestGen]] convention: training is
  * data-dependent, but a committed constant merge table is just string
  * arithmetic, which is what makes ext_bpe_tokens oracle-able).
  *
  * Classic BPE training: start from characters, repeatedly merge the
  * most frequent adjacent symbol pair (ties: lexicographically smallest
  * pair — deterministic), applying each merge corpus-wide before the
  * next count. Words are the whitespace tokens; no cross-word pairs.
  *
  * [[train]] is the reusable core (r15): BpeSpec trains mid-size tables
  * for the fast-vs-chain equivalence pins, and ScaleBench's bpe_tokens
  * cell trains a tokenizer-scale (~10k-merge) table for the
  * [[TextFunctions.bpeTokenCountFast]] throughput measurement.
  *
  * Usage: graft.functions.PinnedBpeGen [sfDir] [numMerges]
  */
object PinnedBpeGen {

  /** Train `k` merges over a (word, count) vocabulary. Driver-side and
    * bounded: the vocab is a lexicon, not the corpus (callers aggregate
    * counts distributed and collect only distinct words). Stops early
    * when no adjacent pair remains (fully merged vocabulary). */
  def train(words: Array[(String, Long)], k: Int): Vector[(String, String)] = {
    var vocab: Array[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        // argmax by count, ties broken lexicographically — deterministic
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val ab = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += ab; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
        i += 1
      }
    }
    merges.result()
  }

  /** [[train]] with incremental pair-count maintenance (r15 — the
    * tokenizer-scale trainer): identical merges (same (-count, a, b)
    * argmin, spec-pinned ≡ [[train]]), but each step touches only the
    * words CONTAINING the merged pair (an inverted pair→words index)
    * and keeps the candidate order in a TreeSet updated by deltas —
    * O(applies · log pairs) total instead of a full vocabulary recount
    * per merge, which is what makes a 10k-merge table trainable in
    * seconds where the naive loop takes minutes. */
  def trainFast(words: Array[(String, Long)], k: Int): Vector[(String, String)] = {
    import scala.collection.mutable
    type Pair = (String, String)
    val vocab: Array[Array[String]] = words.map(_._1.map(_.toString).toArray)
    val wc: Array[Long] = words.map(_._2)
    val counts = mutable.HashMap.empty[Pair, Long]
    val byPair = mutable.HashMap.empty[Pair, mutable.Set[Int]]
    // candidate order: highest count first, ties lexicographically smallest
    val sorted = mutable.TreeSet.empty[(Long, String, String)](
      Ordering.by(t => (-t._1, t._2, t._3)))
    def pairsOf(syms: Array[String]): Iterator[Pair] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(j => (syms(j), syms(j + 1)))
    def bump(p: Pair, delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old > 0) sorted.remove((old, p._1, p._2))
      val nu = old + delta
      if (nu > 0) { counts(p) = nu; sorted.add((nu, p._1, p._2)) }
      else counts.remove(p)
    }
    for (i <- vocab.indices; p <- pairsOf(vocab(i))) {
      bump(p, wc(i))
      byPair.getOrElseUpdate(p, mutable.Set.empty) += i
    }
    val merges = Vector.newBuilder[Pair]
    var m = 0
    while (m < k && sorted.nonEmpty) {
      val (_, a, b) = sorted.head
      val best = (a, b)
      merges += best
      val ab = a + b
      for (i <- byPair.getOrElse(best, mutable.Set.empty).toArray.sorted) {
        val syms = vocab(i)
        val oldPairs = pairsOf(syms).toVector
        // apply the merge left-to-right with skip (same as train)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += ab; j += 2
          } else { out += syms(j); j += 1 }
        }
        val nu = out.result()
        val newPairs = pairsOf(nu).toVector
        oldPairs.foreach(p => bump(p, -wc(i)))
        newPairs.foreach(p => bump(p, wc(i)))
        for (p <- oldPairs.distinct.diff(newPairs.distinct))
          byPair.get(p).foreach(_ -= i)
        for (p <- newPairs.distinct.diff(oldPairs.distinct))
          byPair.getOrElseUpdate(p, mutable.Set.empty) += i
        vocab(i) = nu
      }
      byPair.remove(best)
      m += 1
    }
    merges.result()
  }

  /** DISTRIBUTED BPE training (r17 VERDICT #3) — removes the driver-
    * lexicon ceiling: the vocabulary lives in the cluster as a
    * (symbols, count) DataFrame and the driver fetches exactly ONE row
    * per merge round (the argmax pair), so a 100 TB corpus with a
    * pathological lexicon (no dominant head — where [[vocabOf]]'s
    * maxWords valve would refuse) still trains. Merges are IDENTICAL to
    * [[train]]/[[trainFast]] (same (−count, a, b) argmin; BpeSpec pins
    * it): per round, adjacent pairs explode from the symbol arrays and
    * aggregate distributed (partial + final sum — one narrow shuffle of
    * (pair, count) rows), and the merge applies as a pure relational
    * left fold — `aggregate(syms, [], merge-or-append)` IS left-to-right
    * merging with skip, because a just-merged symbol AB is strictly
    * longer than A and can never re-trigger as the left operand of the
    * same pair. No typed maps, no driver data pass; `localCheckpoint`
    * every `checkpointEvery` rounds truncates the fold lineage.
    *
    * Cost shape: one Spark aggregation per merge — O(k) jobs. This is
    * the CEILING-REMOVAL path, not a throughput path: [[trainFast]]
    * (driver delta-maintenance over the bounded lexicon) trains 10k
    * merges in seconds and remains the fast path whenever the
    * `minCount`-cut lexicon fits the driver.
    *
    * Tie-break caveat: Spark compares strings in UTF-8 byte order
    * (= code-point order) while the driver trainers use Java UTF-16
    * order — the two differ only for ties mixing supplementary-plane
    * and upper-BMP symbols, which no whitespace-split text lexicon
    * produces; ASCII/Latin lexicons agree exactly. */
  def trainDistributedFromCounts(words: org.apache.spark.sql.DataFrame,
      k: Int, checkpointEvery: Int = 25): Vector[(String, String)] = {
    require(k >= 0 && checkpointEvery > 0, "bad trainDistributed params")
    // code-point symbol split (the mergeWord contract: astral chars stay
    // whole; '.' matches one code point in Java regex)
    var vocab = words
      .select(regexp_extract_all(col("w"), lit("(?s)."), lit(0)).as("syms"),
        col("count").cast("long").as("c"))
      .localCheckpoint(true)
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < k && !done) {
      val top = vocab
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("c"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        // left-to-right merge with skip as a relational fold: append, or
        // replace the last element when (last, cur) == (a, b)
        val folded = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        vocab = vocab.select(folded.as("syms"), col("c"))
        m += 1
        if (m % checkpointEvery == 0) vocab = vocab.localCheckpoint(true)
      }
    }
    merges.result()
  }

  /** [[trainDistributedFromCounts]] over a corpus' `text` column — the
    * same distributed word count [[vocabOf]] runs, WITHOUT the driver
    * collect (no maxWords valve needed: nothing data-wide ever reaches
    * the driver). `minCount` remains the principled frequency cutoff. */
  def trainDistributed(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame, k: Int,
      minCount: Long = 1L,
      checkpointEvery: Int = 25): Vector[(String, String)] = {
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    val counts = docs
      .select(explode(split(col("text"), "[ \t\n\r]")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .filter(col("count") >= minCount)
    trainDistributedFromCounts(counts, k, checkpointEvery)
  }

  /** A deterministic tokenizer-scale synthetic lexicon (syllable
    * products with Zipf-ish counts) for throughput cells and specs —
    * the fixture's 31-word lexicon exhausts at ~90 merges, far below a
    * production vocabulary. */
  def syntheticVocab(nWords: Int): Array[(String, Long)] = {
    val syl = Array("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr",
      "st", "uv", "wx", "yz", "th", "er", "on", "an", "re", "he", "in")
    Array.tabulate(nWords) { i =>
      val w = syl(i % 20) + syl((i / 20) % 20) + syl((i / 400) % 20) +
        (if (i % 3 == 0) syl((i / 8000) % 20) else "")
      (w + ('a' + i % 26).toChar, (nWords.toLong - i) * 7 % 997 + 1)
    }.distinct
  }

  /** Distinct-word counts of a corpus' `text` column — the bounded
    * lexicon [[train]] runs on. `maxWords` caps the driver fetch at the
    * most frequent words (a training-scale safety valve; the fixture
    * lexicon is far smaller).
    *
    * LOUD truncation (r16 VERDICT #5 — the silent-truncation class the
    * append/params contracts were built to kill): when the corpus has
    * more than `maxWords` distinct words, the dropped tail CHANGES the
    * trained merges relative to the full vocabulary, so this fails
    * unless the dropped count mass stays within `maxDroppedMass`
    * (default 0: any truncation fails; a caller accepting an
    * approximate tail passes e.g. 0.01 explicitly — the tail of a
    * Zipfian lexicon carries little pair mass, but that is the CALLER's
    * call to make, never a silent default). Words split on the same
    * whitespace class the encoder uses.
    *
    * `minCount` (r16) is the PRINCIPLED corpus-scale valve — the
    * frequency cutoff every production tokenizer trainer exposes
    * (HF tokenizers/SentencePiece `min_frequency`): dropping sub-
    * threshold words bounds the DRIVER lexicon by distinct-frequent
    * words (sublinear in corpus size; typo/URL singletons vanish)
    * while the distributed word-count aggregate still reads the whole
    * corpus. It is an EXPLICIT training parameter, not a silent cap —
    * the maxWords loudness check applies on top of whatever survives
    * the cutoff. */
  def vocabOf(spark: SparkSession, docs: org.apache.spark.sql.DataFrame,
      maxWords: Int = 200000, maxDroppedMass: Double = 0.0,
      minCount: Long = 1L): Array[(String, Long)] = {
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    val counts = docs
      .select(explode(split(col("text"), "[ \t\n\r]")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .filter(col("count") >= minCount)
    // the ordered-limit IS the top-k operator here (Spark plans it as
    // TakeOrderedAndProject — per-partition heaps, no full sort) and the
    // maxWords contract bounds the driver fetch; raising maxWords into
    // the tens of millions shifts this to a real sort AND an unbounded
    // collect — use trainDistributed past that point instead
    val kept = counts
      .orderBy(col("count").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (kept.length == maxWords) {
      // possibly truncated: one 2-long aggregate decides loudly
      val tot = counts.agg(count(lit(1)).as("n"), sum(col("count")).as("mass"))
        .collect().head
      val (nDistinct, mass) = (tot.getLong(0), tot.getLong(1))
      if (nDistinct > maxWords) {
        val dropped = (mass - kept.map(_._2).sum).toDouble / mass.toDouble
        require(dropped <= maxDroppedMass,
          f"vocabOf: corpus has $nDistinct distinct words, maxWords=$maxWords " +
            f"drops $dropped%.6f of the count mass (> maxDroppedMass=" +
            f"$maxDroppedMass%.6f) — the trained merges would silently differ " +
            "from the full-vocabulary ones; raise maxWords or pass an " +
            "explicit maxDroppedMass tolerance")
      }
    }
    kept
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(120)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // distinct words + counts — a bounded vocabulary (the fixture's
    // synthetic lexicon), collected once by this offline generator
    val words = vocabOf(spark,
      spark.read.parquet(s"$dir/documents.parquet"))
    val ms = train(words, k)
    val rows = ms.grouped(4).map(g =>
      "    " + g.map { case (a, b) => s"""("$a", "$b")""" }.mkString(", "))
      .mkString(",\n")
    println(
      s"""package graft.functions
         |
         |/** Pinned BPE merge table (generated by [[PinnedBpeGen]] from the
         |  * sf0.01 documents fixture, ${ms.length} merges, ties broken
         |  * lexicographically) -- a committed CONSTANT, so applying it is
         |  * oracle-able string arithmetic (the PinnedForest convention):
         |  * encode = apply merges in rank order, each exhaustively, which
         |  * equals classic lowest-rank-first BPE because a later merge's
         |  * output symbol cannot appear in an earlier merge's pair.
         |  * Regenerate with: graft.functions.PinnedBpeGen <sfDir> <k>. */
         |object PinnedBpe {
         |  val merges: Vector[(String, String)] = Vector(
         |$rows)
         |}""".stripMargin)
    spark.stop()
  }
}
