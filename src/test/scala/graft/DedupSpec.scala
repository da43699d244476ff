package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

import scala.util.Random

/** Differential tests for the dedup operator family, mirroring the
  * reference's execution-test pattern (small literal inputs, results
  * compared against independently computed expectations).
  */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def wordsDoc(r: Random, n: Int): Seq[String] =
    Seq.fill(n)("w" + r.nextInt(500))

  test("exactTextDedup keeps the lowest id per normalized text") {
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"), // same after normalization
      (3L, "something else"),
      (4L, "HELLO WORLD.")
    ).toDF("doc_id", "text")
    val kept = Dedup.exactTextDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("dropDuplicatesNarrow equals the semi-join form on unique orders") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (2L, 9L, "d"))
      .toDF("k", "o", "payload")
    val narrow = Dedup.dropDuplicatesNarrow(df, Seq("k"), "o")
      .as[(Long, Long, String)].collect().toSet
    val semi = Dedup.dropDuplicates(df, Seq("k"), "o")
      .as[(Long, Long, String)].collect().toSet
    assert(narrow == semi)
    assert(narrow == Set((1L, 5L, "b"), (2L, 7L, "c")))
  }

  test("ngramJaccardPairs matches hand-computed jaccard") {
    // doc1: shingles {a b c, b c d, c d e}; doc2 shares {a b c, b c d}
    // doc2 shingles: {a b c, b c d, c d x}; jaccard = 2 / 4 = 0.5
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d x"),
      (3L, "p q r s t")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.4)
      .select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 2L, 3L, 3L, 0.5)))
  }

  test("pair-fan-out valve fails loudly on a hot shingle, silent within budget") {
    // r18: a shingle shared by many docs but UNDER the df-cap (or with the
    // cap disabled) explodes C(df,2) pairs; the valve must raise with the
    // offending df instead of stalling quadratically — and stay inert on
    // the same data when the budget covers it.
    val docs = (1L to 10L).map(i => (i, "hot shingle here"))
      .toDF("doc_id", "text")
    val boom = intercept[Exception] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
        threshold = 0.1, maxShingleDf = None, maxPairsPerShingle = 10L)
        .collect()
    }
    val msgs = Iterator.iterate(boom: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("maxPairsPerShingle"), s"unexpected failure: $msgs")
    val ok = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
      threshold = 0.1, maxShingleDf = None).collect()
    assert(ok.length == 45) // C(10,2) identical docs, all jaccard 1.0
  }

  test("df-capped jaccard measures sizes over the same capped universe") {
    // "c c1 c2" appears in all three docs -> df 3 > cap 2 -> dropped
    // everywhere. Remaining shingles of 1: {a a1 a2}, of 2: {b b1 b2}, of
    // 3: {a a1 a2}. Pair (1,3) then has jaccard 1.0 over the capped
    // universe; with the r1 bug (sizes from the uncapped set) it was 1/3.
    val docs = Seq(
      (1L, "a a1 a2 zz c c1 c2"),
      (2L, "b b1 b2 zz c c1 c2"),
      (3L, "a a1 a2 zz c c1 c2")
    ).toDF("doc_id", "text")
    // each doc's shingles: {X X1 X2, X1 X2 zz, X2 zz c, zz c c1, c c1 c2}
    // df(c c1 c2)=3, df(X2 zz c) distinct per doc... compute exact: with
    // cap=2 only "c c1 c2" (df 3) and "zz c c1" (df 3) are dropped.
    // doc1 capped: {a a1 a2, a1 a2 zz, a2 zz c} — all shared with doc3.
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.9, maxShingleDf = Some(2))
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 3L, 1.0)))
  }

  test("df-cap never materializes an unbounded per-shingle list (native path)") {
    // On extension sessions the df-cap is the bounded-buffer
    // graft_collect_capped aggregate: no unbounded collect_list may appear
    // anywhere in the plan, and no join is needed for the cap.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val plan = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.1, maxShingleDf = Some(5))
      .queryExecution.optimizedPlan
    val aggStrs = plan.collect { case a: Aggregate =>
      a.aggregateExpressions.map(_.toString).mkString(";")
    }
    assert(aggStrs.exists(_.contains("graft_collect_capped")),
      "expected the bounded graft_collect_capped aggregate in the plan")
    assert(!aggStrs.exists(_.contains("collect_list(")),
      "no unbounded collect_list may exist when a df-cap is set")
  }

  test("df-cap prunes shingles below the list aggregation (fallback plan order)") {
    // Non-long ids can't use the native capped collect; the fallback must
    // broadcast anti-join the (tiny) over-cap shingle set BEFORE the
    // collect_list aggregate: a stop-phrase shingle with huge df must
    // never materialize its id list in one task just to be filtered.
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val docs = Seq(("d1", "a b c d"), ("d2", "a b c e")).toDF("doc_id", "text")
    val plan = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.1, maxShingleDf = Some(5))
      .queryExecution.optimizedPlan
    val listAggs = plan.collect {
      case a: Aggregate
          if a.aggregateExpressions.exists(_.toString.contains("collect_list")) => a
    }
    assert(listAggs.nonEmpty, "expected a collect_list aggregate in the plan")
    assert(listAggs.exists(a =>
      a.children.exists(_.collect { case j: Join if j.joinType == LeftAnti => j }.nonEmpty)),
      "df-cap anti-join must sit below the collect_list aggregate")
  }

  test("graft_collect_capped bounds buffers and nulls over-cap groups") {
    // 1 group under cap (complete list), 1 group exactly at cap (complete),
    // 1 group over cap (NULL) — merged across partitions so the truncated
    // partial-buffer path is exercised too.
    val rows = (1L to 2L).map(("under", _)) ++
      (1L to 4L).map(("at", _)) ++ (1L to 9L).map(("over", _))
    val df = rows.toDF("k", "id").repartition(4)
    val out = df.groupBy($"k")
      .agg(call_function("graft_collect_capped", $"id", lit(4)).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1)).map(_.sorted)).toMap
    assert(out("under") == Some(Seq(1L, 2L)))
    assert(out("at") == Some(Seq(1L, 2L, 3L, 4L)))
    assert(out("over").isEmpty, "a group over the cap must evaluate to NULL")
  }

  test("minhashSignature equals the per-hash-function minimum (one-pass = naive)") {
    val numHashes = 16
    val seed = 42L
    val docs = Seq((1L, "a b c d e f g h"), (2L, "q w e r t y u i o p")).toDF("doc_id", "text")
    val shingleCol = TextFunctions.distinctShingles(col("text"), 3)
    // independently: murmur-hash each shingle via Spark, then fold in Scala
    val hashed = docs.select(col("doc_id"),
        transform(shingleCol, s => pmod(hash(s).cast("long"), lit(2147483647L))).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val p = 2147483647L
    def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val expected = hashed.map { case (id, hs) =>
      id -> (0 until numHashes).map { i =>
        val a = 1L + 2L * Math.floorMod(mix64(seed + 2L * i), 1000000000L)
        val b = Math.floorMod(mix64(seed + 2L * i + 1), 1000000000L)
        hs.map(h => Math.floorMod(h * a + b, p)).min
      }
    }
    val actual = docs.select(col("doc_id"),
        Dedup.minhashSignature(shingleCol, numHashes, seed).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(actual == expected)
  }

  test("minhashDedupPairs finds planted near-duplicates with exact jaccard") {
    val r = new Random(7)
    val bases = (0 until 30).map(i => (i.toLong, wordsDoc(r, 60)))
    // plant near-dups: doc 100+i = doc i with one word changed (j ~ 0.95)
    val nearDups = bases.take(10).map { case (id, ws) =>
      (100L + id, ws.updated(30, "CHANGED"))
    }
    val docs = (bases ++ nearDups).map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val approx = Dedup.minhashDedupPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // at j >= 0.8 with 16x4 banding the candidate probability is > 0.9998;
    // on this fixture recall must be exact
    assert(exact.nonEmpty && exact.size >= 10)
    assert(approx == exact)
  }

  test("simhash banding is complete for the requested radius") {
    val r = new Random(13)
    val base = r.nextLong()
    def flip(sig: Long, bits: Seq[Int]): Long = bits.foldLeft(sig)((s, b) => s ^ (1L << b))
    // pairs at every distance 0..h must be found; one pair beyond h must not
    for (h <- Seq(1, 3, 6)) {
      val rows = (0 to h).map { d =>
        val flipped = flip(base, r.shuffle((0 until 64).toList).take(d))
        (d.toLong * 2, flipped) // ids 0,2,4,... are within radius of id 1000
      } :+ (1000L, base) :+
        (2000L, flip(base, r.shuffle((0 until 64).toList).take(h + 1)))
      val sigs = rows.toDF("doc_id", "sig")
      val pairs = Dedup.simhashPairsFromSigs(sigs, maxHamming = h)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      for (d <- 0 to h)
        assert(pairs.contains((d.toLong * 2, 1000L)),
          s"radius $h: planted pair at distance $d missed")
      assert(!pairs.contains((1000L, 2000L)),
        s"radius $h: pair at distance ${h + 1} wrongly reported")
    }
  }

  test("connectedComponents resolves transitive chains and separate clusters") {
    import graft.operators.Components
    // chain 1-2-3-4-5 (diameter 4, needs >1 round), pair {10,11}, singleton
    // edge {20,21}; node 99 appears only as a larger partner of 1
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L), (99L, 1L)).toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(pairs, "doc_a", "doc_b")
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 99L -> 1L))
  }

  test("connectedComponentsStar matches min-label and converges in O(log n) on a path") {
    import graft.operators.Components
    // same fixture as the min-label test, plus a self-loop-only node
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L), (99L, 1L), (7L, 7L)).toDF("doc_a", "doc_b")
    val got = Components.connectedComponentsStar(pairs, "doc_a", "doc_b")
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      7L -> 7L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 99L -> 1L))
    // the scale claim: a 120-node PATH (diameter 119) resolves within the
    // O(log n) round budget where min-label would need ~119 rounds —
    // maxIters = 15 would abort if rounds scaled with diameter
    val path = (1L until 120L).map(i => (i, i + 1L)).toDF("doc_a", "doc_b")
    val stars = Components.connectedComponentsStar(path, "doc_a", "doc_b",
      maxIters = 15).as[(Long, Long)].collect()
    assert(stars.length == 120 && stars.forall(_._2 == 1L))
    // random-ish graph: star output == min-label output exactly
    val rnd = new scala.util.Random(7)
    val rpairs = (1 to 150).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .toDF("doc_a", "doc_b")
    val a = Components.connectedComponents(rpairs, "doc_a", "doc_b")
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    val b = Components.connectedComponentsStar(rpairs, "doc_a", "doc_b")
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("portable LSH audit: candidates cover truth, counts reconcile") {
    import graft.operators.Dedup
    // three exact near-dup pairs (identical text → jaccard 1, so every
    // band collides regardless of coefficients), plus unrelated docs and
    // one too-short doc that must be excluded, not band-collided
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven eight"),
      (5L, "totally different words in this document here"),
      (6L, "short doc")).toDF("doc_id", "text")
    val audit = Dedup.lshAudit(docs, "text", "doc_id").collect().head
    assert(audit.getAs[Long]("truth_pairs") == 2L)
    assert(audit.getAs[Long]("tp") == 2L)
    assert(audit.getAs[Long]("fn") == 0L)
    assert(audit.getAs[Double]("rec") == 1.0)
    // identity fp = cand − tp holds by construction; assert it anyway
    assert(audit.getAs[Long]("fp") ==
      audit.getAs[Long]("cand_pairs") - audit.getAs[Long]("tp"))
    // the short doc never reaches banding
    val banded = Dedup.minhashBandsPortable(docs, "text", "doc_id")
    assert(banded.filter($"doc_id" === 6L).count() == 0L)
    // portable and murmur bandings agree on which IDENTICAL docs collide
    val cands = Dedup.minhashCandidatesPortable(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)) && cands.contains((3L, 4L)))
  }

  test("dedupByCluster keeps exactly one representative per component") {
    import graft.operators.Components
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 42L)
      .map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val kept = Components.dedupByCluster(docs, pairs, "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    // cluster {1,2,3} -> keep 1; {10,11} -> keep 10; 4,5,42 untouched
    assert(kept == Seq(1L, 4L, 5L, 10L, 42L))
  }

  test("dedupByClusterBest keeps the highest-score member, ties to min id") {
    import graft.operators.Components
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L),   // cluster {1,2,3}: 2 and 3 tie on score
      (10L, 5L), (11L, 9L),              // cluster {10,11}: 11 wins on score
      (42L, 1L))                         // unclustered
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val kept = Components.dedupByClusterBest(docs, pairs, "doc_id", "score")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 11L, 42L))
  }

  test("simhash64 matches the vote definition computed independently") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    // independent computation: xxhash64 per token via Spark, votes in Scala
    val tokenHashes = docs.select(
        transform(TextFunctions.words(col("text")), t => xxhash64(t)).as("hs"))
      .as[Seq[Long]].collect().head
    var expected = 0L
    for (b <- 0 until 64) {
      val vote = tokenHashes.map(h => if ((h & (1L << b)) != 0) 1 else -1).sum
      if (vote >= 0) expected |= (1L << b)
    }
    val actual = docs.select(Dedup.simhash64(col("text"))).as[Long].collect().head
    assert(actual == expected)
  }

  test("portable md5 simhash matches a driver-side java reference") {
    val text = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    // reference: md5 via MessageDigest, first 15 hex chars as a 60-bit long,
    // the same ±1 vote fold in plain Scala
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(tok: String): Long = {
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val hashes = text.split(" ").map(h60)
    var expected = 0L
    for (b <- 0 until 64) {
      val vote = hashes.map(h => if ((h & (1L << b)) != 0) 1 else -1).sum
      if (vote >= 0) expected |= (1L << b)
    }
    val actual = docs.select(
        Dedup.simhashFromHashes(docs, TextFunctions.md5TokenHashes(col("text"))))
      .as[Long].collect().head
    assert(actual == expected)
    // top 4 bits must be clear: 60-bit hashes vote every token −1 there
    assert((actual >>> 60) == 0L)
  }

  test("exactDedupIncremental drops known fingerprints and within-batch dups") {
    val batch = Seq(
      (10L, "hello world"), (11L, "Hello,  World!"),  // same normalized fp
      (12L, "already ingested text"),                  // known to the index
      (13L, "genuinely new content")).toDF("doc_id", "text")
    val known = Seq("already ingested text").toDF("t")
      .select(graft.functions.TextFunctions.md5Fingerprint(col("t")).as("fp"))
    val (kept, newFps) = Dedup.exactDedupIncremental(batch, "text", "doc_id", known)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === Seq(10L, 13L))
    assert(newFps.count() === 2)   // the two kept docs' fps, ready to append
    assert(newFps.columns.toSeq === Seq("fp"))
  }

  test("minhashDedupPairsAgainst emits cross-side pairs only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val index = Seq((1L, base), (2L, "something else entirely different here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, base + " x"),            // near-dup of index doc 1
      (101L, base + " y"),            // also near-dup of index doc 1
      (102L, "fresh unrelated words never seen before at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDedupPairsAgainst(batch, index, "text", "doc_id",
        n = 3, threshold = 0.8)
      .select("new_id", "index_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((100L, 1L), (101L, 1L)))
    // 100 and 101 are near-dups of EACH OTHER but must not appear:
    // within-batch pairs are minhashDedupPairs' job
    assert(!pairs.exists(p => p._1 > 99 && p._2 > 99))
  }

  test("docs shorter than n words never pair (0/0 jaccard must not pass)") {
    // empty shingle sets share the identical all-p minhash signature, so
    // they collide in every band; the verify step's union guard must kill
    // the 0/0 = NaN jaccard (Spark orders NaN above every threshold)
    val docs = Seq((1L, "hi there"), (2L, "yo"), (3L, "ok then"),
      (4L, "a real document with plenty of words to shingle properly here"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashDedupPairs(docs, "text", "doc_id", n = 3).count() === 0)
    val cross = Dedup.minhashDedupPairsAgainst(
      docs.filter($"doc_id" >= 3), docs.filter($"doc_id" < 3),
      "text", "doc_id", n = 3)
    assert(cross.count() === 0,
      "short new docs must not pair with short index docs")
  }

  test("lineDedup keeps first occurrence globally, reassembles in order") {
    val docs = Seq(
      (1L, "header\nalpha one\nbeta two"),
      (2L, "header\ngamma three\nalpha one"),  // header + alpha are repeats
      (3L, "header\nheader\ndelta four"))      // in-doc repeat too
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "text", "doc_id")
      .select("doc_id", "n_lines_kept", "text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 3L, "header\nalpha one\nbeta two")))
    assert(got(1) === ((2L, 1L, "gamma three")))
    assert(got(2) === ((3L, 1L, "delta four")))
  }

  test("substringSpanDedup erases later copies of n-word spans, keeps first") {
    // doc 1 owns the span; doc 2 repeats it inside fresh context; doc 3 is
    // a full duplicate of doc 1; doc 4 is shorter than n and untouchable.
    val span = (1 to 8).map("s" + _).mkString(" ") // 8 shared words
    val docs = Seq(
      (1L, s"a1 a2 $span a3"),
      (2L, s"b1 b2 b3 $span b4 b5"),
      (3L, s"a1 a2 $span a3"),
      (4L, "tiny doc under n words"))
      .toDF("doc_id", "text")
    val got = Dedup.substringSpanDedup(docs, "text", "doc_id", n = 8)
      .select("doc_id", "n_words_kept", "text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 11L, s"a1 a2 $span a3")))
    // doc 2: only the 8 span positions are covered (the b-words break the
    // grams that would straddle the boundary)
    assert(got(1) === ((2L, 5L, "b1 b2 b3 b4 b5")))
    // doc 3 duplicates doc 1 entirely: every position covered
    assert(got(2) === ((3L, 0L, "")))
    assert(got(3) === ((4L, 5L, "tiny doc under n words")))
  }

  test("substringSpanDedup erases a within-doc repeat's second copy only") {
    val span = (1 to 8).map("r" + _).mkString(" ")
    val docs = Seq((7L, s"$span mid $span")).toDF("doc_id", "text")
    val got = Dedup.substringSpanDedup(docs, "text", "doc_id", n = 8)
      .select("n_words_kept", "text").as[(Long, String)].collect().head
    assert(got === ((9L, s"$span mid")))
  }

  test("count-min estimates upper-bound exact counts, exactly at ample width") {
    import graft.operators.Sketches
    val r = new Random(7)
    val tokens = Seq.fill(2000)("tok" + r.nextInt(50)).toDF("w")
    val exact = tokens.groupBy($"w").agg(count(lit(1)).as("n"))
    // narrow sketch: estimates are upper bounds
    val narrow = Sketches.countMinBuild(tokens, "w", depth = 4, width = 16)
    val estN = Sketches.countMinEstimate(narrow, exact, "w", depth = 4, width = 16)
      .join(exact, Seq("w")).select($"w", $"est", $"n")
      .as[(String, Long, Long)].collect()
    assert(estN.forall { case (_, est, n) => est >= n })
    // ample width: 50 distinct tokens in 4 x 4096 cells — collisions in
    // ALL 4 rows for one token are overwhelmingly unlikely, so est == n
    val wide = Sketches.countMinBuild(tokens, "w", depth = 4, width = 4096)
    val estW = Sketches.countMinEstimate(wide, exact, "w", depth = 4, width = 4096)
      .join(exact, Seq("w")).select($"est", $"n")
      .as[(Long, Long)].collect()
    assert(estW.forall { case (est, n) => est == n })
  }

  test("pathCentrality counts weighted walks on a hand-checked graph") {
    import graft.operators.Components
    // a -2-> b -3-> c, a -1-> c:
    //   walks_1: b=2, c=3+1=4
    //   walks_2 (u->v weighted by walks_1(u)): c via b: 2*3=6
    //   walks_3: none (no inbound edge from c)
    val edges = Seq(("a", "b", 2L), ("b", "c", 3L), ("a", "c", 1L))
      .toDF("src", "dst", "w")
    val got = Components.pathCentrality(edges, "src", "dst", "w", steps = 3)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("b", 2L, 0L, 0L), ("c", 4L, 6L, 0L)))
  }

  test("pathCentrality on a cycle compounds weights each step") {
    import graft.operators.Components
    // a -2-> b -3-> a: walks_1 = (a=3, b=2); walks_2 = (a=3*2? no:
    //   a gets walks_1(b)*3 = 6, b gets walks_1(a)*2 = 6);
    //   walks_3: a = walks_2(b)*3 = 18, b = walks_2(a)*2 = 12
    val edges = Seq(("a", "b", 2L), ("b", "a", 3L)).toDF("src", "dst", "w")
    val got = Components.pathCentrality(edges, "src", "dst", "w", steps = 3)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", 3L, 6L, 18L), ("b", 2L, 6L, 12L)))
  }

  test("pagerank: cycle fixpoint is uniform, mass conserved, dangling self-looped") {
    import graft.operators.Components
    // 3-cycle: uniform 1/3 is the exact fixpoint at every iteration
    val cyc = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val rc = Components.pagerank(cyc, "src", "dst", "w", iters = 5)
      .as[(String, Double)].collect().toMap
    rc.values.foreach(r => assert(math.abs(r - 1.0 / 3.0) < 1e-15, rc))
    // star into a sink: the sink is dangling → self-loop keeps it local;
    // total mass stays exactly 1 every round (stochastic completion)
    val star = Seq(("a", "d", 1L), ("b", "d", 1L), ("c", "d", 1L))
      .toDF("src", "dst", "w")
    val rs = Components.pagerank(star, "src", "dst", "w", iters = 5)
      .as[(String, Double)].collect().toMap
    assert(math.abs(rs.values.sum - 1.0) < 1e-12, rs)
    // leaves only get the teleport share; the sink accumulates
    assert(math.abs(rs("a") - 0.15 / 4) < 1e-12)
    assert(rs("d") > rs("a") * 4)
    // determinism across repartitionings: the fold makes reruns bit-equal
    val rerun = Components.pagerank(star.repartition(7), "src", "dst", "w",
      iters = 5).as[(String, Double)].collect().toMap
    assert(rerun == rs)
  }

  test("normalizeUrl canonicalizes crawl variants; urlDedup keeps min id") {
    import graft.functions.TextFunctions
    val urls = Seq(
      "http://Example.COM/Page/1",            // host lowered, PATH case kept
      "https://example.com/page/2/",          // scheme alias + trailing slash
      "http://example.com/page/3?utm_source=a&utm_medium=b&utm_campaign=c",
      "http://example.com/page/4?a=1&fbclid=zz#frag",
      "http://example.com/page/5?utm_source=x&b=2",
      "http://example.com/")    // root slash strips too: com and com/ alias
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val norm = urls.select(TextFunctions.normalizeUrl($"url"))
      .as[String].collect().toList
    assert(norm == List(
      "http://example.com/Page/1",
      "http://example.com/page/2",
      "http://example.com/page/3",
      "http://example.com/page/4?a=1",
      "http://example.com/page/5?b=2",
      "http://example.com"))
    val docs = Seq((5L, "http://A.com/x"), (2L, "https://a.com/x/"),
      (9L, "http://a.com/x#f"), (7L, "http://a.com/y"))
      .toDF("doc_id", "url")
    val kept = Dedup.urlDedup(docs, "url", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toList
    assert(kept == List(2L, 7L), "min id per canonical URL")
  }

  test("ppjoinPairs equals the uncapped exact baseline (losslessness)") {
    val r = new Random(31)
    val bases = (0 until 40).map(i => (i.toLong, wordsDoc(r, 50)))
    // plant near-dups at several similarity grades around the threshold
    val edited = bases.take(15).zipWithIndex.map { case ((id, ws), k) =>
      val flips = k % 5 // 0..4 changed words -> j from 1.0 down past 0.8
      val ws2 = (0 until flips).foldLeft(ws)((w, j) => w.updated(5 + 7 * j, s"X$j"))
      (200L + id, ws2)
    }
    val docs = (bases ++ edited).map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val pp = Dedup.ppjoinPairs(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.8, maxShingleDf = None)
      .select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && exact.size >= 5)
    assert(pp == exact)
  }

  test("ppjoinPairs keeps a pair sitting exactly on the threshold") {
    // doc 1: 6 words -> 4 shingles; doc 2: same 6 words + one more ->
    // 5 shingles, the 4 of doc 1 plus one new. common=4, union=5,
    // jaccard = 4/5 = 0.8 EXACTLY at threshold 0.8 — the boundary the
    // relaxed length/prefix filters must never prune.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6 w7"),
      (3L, "z1 z2 z3 z4 z5 z6 z7")
    ).toDF("doc_id", "text")
    val pp = Dedup.ppjoinPairs(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(pp == Seq((1L, 2L, 4L, 4L, 5L, 0.8)))
  }

  test("ppjoin index probe equals the exact cross-pair set (lossless)") {
    val r = new Random(47)
    val hist = (0 until 30).map(i => (i.toLong, wordsDoc(r, 40))) :+
      // boundary fixture: 6 words -> 4 shingles
      (90L, Seq("b1", "b2", "b3", "b4", "b5", "b6"))
    // batch: a re-crawl of doc 3 (must self-match at 1.0), graded edits
    // of docs 0..5, the exact-threshold twin of doc 90 (j = 4/5 = 0.8),
    // and a doc of entirely unseen tokens (df-0 order extension path)
    val batch: Seq[(Long, Seq[String])] =
      Seq((503L, hist(3)._2)) ++
      hist.take(6).map { case (id, ws) =>
        val flips = (id % 3).toInt
        (600L + id, (0 until flips).foldLeft(ws)((w, j) => w.updated(3 + 5 * j, s"Y$j")))
      } ++
      Seq((690L, Seq("b1", "b2", "b3", "b4", "b5", "b6", "b7")),
        (700L, (1 to 20).map(i => s"unseen$i")))
    val histDf = hist.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val batchDf = batch.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    Dedup.dropPpjoinIndex(spark, "graft_ppt")
    try {
      Dedup.ppjoinIndexPersist(histDf, "text", "doc_id", "graft_ppt",
        buckets = 4, n = 3, threshold = 0.8)
      val probed = Dedup.ppjoinPairsAgainstIndex(batchDf, "text", "doc_id",
          "graft_ppt", threshold = 0.8)
        .select("new_id", "index_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      // ground truth: uncapped exact pairs over the union, cross side only
      val expected = Dedup.ngramJaccardPairs(histDf.unionAll(batchDf),
          "text", "doc_id", n = 3, threshold = 0.8, maxShingleDf = None)
        .filter($"doc_a" < 500 && $"doc_b" >= 500)
        .select($"doc_b", $"doc_a", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(expected.exists(p => p._1 == 503L && p._2 == 3L && p._3 == 1.0),
        "re-crawl self-match missing from ground truth")
      assert(expected.exists(p => p._1 == 690L && p._2 == 90L && p._3 == 0.8),
        "exact-threshold pair missing from ground truth")
      assert(probed == expected)
    } finally Dedup.dropPpjoinIndex(spark, "graft_ppt")
  }

  test("ppjoinPairs short docs (< n words) never pair") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val pp = Dedup.ppjoinPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
    assert(pp.count() == 0L)
  }

  test("same-id re-append: identical text is a no-op, changed text fails loudly") {
    val r = new Random(53)
    val docs = (0 until 20).map(i => (i.toLong, wordsDoc(r, 30).mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.dropIndex(spark, "graft_fp_idx")
    try {
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 15),
        "text", "doc_id", "graft_fp_idx", buckets = 4)
      val shingleRows = spark.table("graft_fp_idx_shingles").count()
      // identical-text re-append of already-indexed ids: passes the
      // fingerprint check, shingle anti-join keeps the store unchanged
      assert(Dedup.minhashIndexAppend(docs.filter($"doc_id" < 5),
        "text", "doc_id", "graft_fp_idx"))
      assert(spark.table("graft_fp_idx_shingles").count() == shingleRows)
      // changed text under a reused id must fail LOUDLY before any write
      val mutated = docs.filter($"doc_id" === 3)
        .withColumn("text", concat($"text", lit(" entirely new tail words here")))
      val bandRows = spark.table("graft_fp_idx_bands").count()
      val e = intercept[IllegalArgumentException] {
        Dedup.minhashIndexAppend(mutated, "text", "doc_id", "graft_fp_idx")
      }
      assert(e.getMessage.contains("DIFFERENT text"))
      assert(spark.table("graft_fp_idx_bands").count() == bandRows,
        "failed append must not have written band rows")
      // a genuinely new id still appends fine
      assert(Dedup.minhashIndexAppend(docs.filter($"doc_id" >= 15),
        "text", "doc_id", "graft_fp_idx"))
    } finally Dedup.dropIndex(spark, "graft_fp_idx")
  }

  test("ppjoinIndexDelete: crash at every failpoint, recover, probe bit-equal") {
    val r = new Random(61)
    val hist = (0 until 24).map(i => (i.toLong, wordsDoc(r, 30).mkString(" ")))
    val histDf = hist.toDF("doc_id", "text")
    // batch: light edits of history docs 0..7 (some retired, some kept)
    val batch = hist.take(8).map { case (id, t) =>
      (800L + id, t.split(" ").updated(4, "ZZ").mkString(" ")) }
    val batchDf = batch.toDF("doc_id", "text")
    val nm = "graft_pprcv"
    Dedup.dropPpjoinIndex(spark, nm)
    try {
      Dedup.ppjoinIndexPersist(histDf, "text", "doc_id", nm,
        buckets = 4, n = 3, threshold = 0.8)
      val retire = histDf.filter($"doc_id" % 2 === 0).select($"doc_id")
      def probe(): Seq[(Long, Long, Double)] =
        Dedup.ppjoinPairsAgainstIndex(batchDf, "text", "doc_id", nm)
          .orderBy($"new_id", $"index_id")
          .as[(Long, Long, Double)].collect().toSeq
      // clean-delete reference on a twin index
      Dedup.dropPpjoinIndex(spark, nm + "_ref")
      Dedup.ppjoinIndexPersist(histDf, "text", "doc_id", nm + "_ref",
        buckets = 4, n = 3, threshold = 0.8)
      Dedup.ppjoinIndexDelete(spark, nm + "_ref",
        histDf.filter($"doc_id" % 2 === 0).select($"doc_id"))
      val want = Dedup.ppjoinPairsAgainstIndex(batchDf, "text", "doc_id", nm + "_ref")
        .orderBy($"new_id", $"index_id")
        .as[(Long, Long, Double)].collect().toSeq
      assert(want.nonEmpty && want.forall(p => p._2 % 2 == 1),
        "reference delete left retired (even) ids pairing")
      val pre = probe()
      val stages = Seq(
        s"rw:${nm}_pprefix" -> "rolled_back",
        s"rw:${nm}_ppshingles" -> "rolled_back",
        "commit" -> "completed",
        s"drop:${nm}_pprefix" -> "completed",
        s"rename:${nm}_ppshingles" -> "completed",
        "done" -> "clean")
      for ((stage, expect) <- stages) {
        Dedup.rewriteFailpoint = (m, s) =>
          if (s == stage && m.startsWith(nm) && !m.startsWith(nm + "_ref"))
            throw new RuntimeException("graft-rewrite-crash")
        try Dedup.ppjoinIndexDelete(spark, nm, retire)
        catch { case e: RuntimeException
            if e.getMessage == "graft-rewrite-crash" => }
        finally Dedup.rewriteFailpoint = (_, _) => ()
        assert(Dedup.ppjoinIndexRecover(spark, nm) == expect,
          s"recover outcome after crash at $stage")
        val got = probe()
        // rolled-back crashes leave the PRE-delete index; completed ones
        // the post-delete answer — both must be exactly one of the two
        // reference answers, never a torn mixture
        assert(got == pre || got == want, s"torn index after $stage")
        if (expect != "rolled_back")
          assert(got == want, s"delete not applied after $stage")
      }
      assert(probe() == want)
    } finally {
      Dedup.dropPpjoinIndex(spark, nm)
      Dedup.dropPpjoinIndex(spark, nm + "_ref")
    }
  }
}
