package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Differential tests for the curation operator family (decontamination,
  * domain balancing, sequence packing): small literal inputs with
  * independently-computed expectations, plus invariant checks (capacity
  * respected, determinism across reruns) that hold at any scale.
  */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("decontaminate counts shared distinct 3-grams and flags at the threshold") {
    val bench = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val docs = Seq(
      // shares "the quick brown" and "quick brown fox" → 2 overlaps
      (10L, "the quick brown fox sleeps"),
      // no 3-gram overlap
      (11L, "entirely different words here now"),
      // identical text → 3 shared 3-grams
      (12L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val got = Curation.decontaminate(docs, bench, "text", "doc_id", n = 3, minOverlap = 3)
      .select("doc_id", "n_contaminated_ngrams", "contaminated")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(10L) == ((2L, false)))
    assert(got(11L) == ((0L, false)))
    assert(got(12L) == ((3L, true)))
  }

  test("domainCap keeps min(cap, size) per domain, deterministically") {
    val docs = (1L to 30L).map(i => (i, if (i <= 20) "big" else "small"))
      .toDF("doc_id", "source")
    val kept = Curation.domainCap(docs, "source", "doc_id", cap = 8)
    val sizes = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("big" -> 8L, "small" -> 8L)) // small has 10 > 8
    val again = Curation.domainCap(docs, "source", "doc_id", cap = 8)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("domainCapApprox keeps everything under the cap and thins above it") {
    val docs = (1L to 400L).map(i => (i, if (i <= 390) "big" else "tiny"))
      .toDF("doc_id", "source")
    val kept = Curation.domainCapApprox(docs, "source", "doc_id", cap = 50)
    val sizes = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sizes("tiny") == 10L, "under-cap domains keep every row")
    // expectation 50 of 390; the portable uniform is fixed, so just bound
    // it loosely against the binomial tails
    assert(sizes("big") > 20L && sizes("big") < 90L, s"got ${sizes("big")}")
  }

  test("mixtureSample hits exact per-domain targets, drops unlisted domains") {
    val docs = (1 to 120).map(i =>
      (i.toLong, s"dom${i % 4}", s"t$i")).toDF("doc_id", "source", "text")
    // weights normalize (2:1:1 over sum 4); dom3 unlisted → dropped;
    // targets: floor(24·2/4)=12, floor(24/4)=6, 6 — all under the 30/domain
    val got = Curation.mixtureSample(docs, "source", "doc_id",
        Map("dom0" -> 2.0, "dom1" -> 1.0, "dom2" -> 1.0), totalN = 24L)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("dom0" -> 12L, "dom1" -> 6L, "dom2" -> 6L))
    // target above a domain's size saturates at the domain
    val sat = Curation.mixtureSample(docs, "source", "doc_id",
        Map("dom0" -> 1.0), totalN = 1000L)
    assert(sat.count() == 30L)
    // rerun-stable: the same rows come back
    val a = Curation.mixtureSample(docs, "source", "doc_id",
        Map("dom0" -> 1.0), totalN = 10L).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Curation.mixtureSample(docs.repartition(7), "source", "doc_id",
        Map("dom0" -> 1.0), totalN = 10L).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.length == 10)
  }

  test("tokenBudgetSample: maximal first-fit prefix within the budget") {
    import graft.functions.PortableHash
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 100L)).toDF("doc_id", "source", "tok")
    val kept = Curation.tokenBudgetSample(docs, "source", "doc_id", "tok",
        Map("a" -> 750L))
      .collect().map(r => r.getLong(0)).toSet
    // uniform 100-token docs: budget 750 keeps exactly 7 docs, and they
    // are the 7 FIRST in portable-hash order of the 20 'a' docs
    assert(kept.size == 7)
    val hashOrder = docs.filter($"source" === "a")
      .select($"doc_id", PortableHash.hash32($"doc_id").as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.map(_._2)
    assert(kept == hashOrder.take(7).toSet)
    // domain not in the budget map is dropped entirely
    assert(!kept.exists(id => id % 2 == 1))
  }

  test("stratifiedSample honors 0 and 1 fractions exactly") {
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "keep" else "drop"))
      .toDF("doc_id", "source")
    val kept = Curation.stratifiedSample(docs, "source", "doc_id",
      Map("keep" -> 1.0, "drop" -> 0.0), defaultFrac = 0.5)
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("keep", 0L) == 50L)
    assert(bySrc.getOrElse("drop", 0L) == 0L)
  }

  test("importanceResample keeps weight-1 rows and drops weight-0 rows") {
    val docs = (1L to 100L).map(i => (i, if (i <= 50) 1.0 else 0.0))
      .toDF("doc_id", "w")
    val kept = Curation.importanceResample(docs, "w", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (1L to 50L).toSet)
  }

  test("packSequences respects capacity and emits consistent offsets") {
    val docs = (1L to 200L).map(i =>
      (i, Seq.fill((i % 37 + 3).toInt)("w").mkString(" "))).toDF("doc_id", "text")
    val packed = Curation.packSequences(docs, "text", "doc_id",
      capacity = 100, nShards = 3)
    // every pack fits unless it is a single oversize doc (none here)
    val packSums = packed.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    packSums.foreach { case (sh, p, tok, n) =>
      assert(tok <= 100, s"pack ($sh,$p) holds $tok tokens")
    }
    // offsets are the running sum within (shard, pack) in doc_id order
    val rows = packed.select("shard", "pack_id", "doc_id", "n_tokens", "pack_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
    rows.values.foreach { g =>
      var acc = 0L
      g.sortBy(_._3).foreach { case (_, _, _, n, off) =>
        assert(off == acc); acc += n
      }
    }
    // pack ids are contiguous from 0 per shard
    packed.groupBy("shard").agg(min("pack_id").as("lo"),
        max("pack_id").as("hi"), countDistinct("pack_id").as("d"))
      .as[(Long, Long, Long, Long)].collect()
      .foreach { case (_, lo, hi, d) => assert(lo == 0L && d == hi + 1) }
    // every doc survives exactly once
    assert(packed.count() == 200L)
  }

  test("decontaminateBloom equals the exact path and uses the bloom probe") {
    assert(spark.catalog.functionExists("graft_might_contain"),
      "spec session must have GraftExtensions registered")
    val bench = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps high today"),   // 4 shared 3-grams
      (2L, "a completely different document text"),   // clean
      (3L, "quick brown fox and more words here"))    // 1 shared 3-gram
      .toDF("doc_id", "text")
    val exact = Curation.decontaminate(docs, bench, "text", "doc_id",
        n = 3, minOverlap = 2)
      .select("doc_id", "n_contaminated_ngrams", "contaminated")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val bloom = Curation.decontaminateBloom(docs, bench, "text", "doc_id",
        n = 3, minOverlap = 2)
      .select("doc_id", "n_contaminated_ngrams", "contaminated")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(bloom === exact)
    assert(bloom.toSeq === Seq((1L, 4L, true), (2L, 0L, false), (3L, 1L, false)))
  }

  test("unigramCrossEntropy: uniform corpus gives xent = log2(vocab)") {
    // corpus of 4 equally frequent words -> p(w) = 1/4, xent = 2 bits for
    // every doc regardless of its own word mix
    val corpus = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions
      .unigramCrossEntropy(corpus, "doc_id", "text", corpus)
      .select("doc_id", "tokens", "xent")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    got.foreach { case (_, n, x) =>
      assert(n === 4L); assert(math.abs(x - 2.0) < 1e-12)
    }
  }

  test("chunkWords covers every word with the configured overlap") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"w$i").mkString(" ")),  // 30 words
      (2L, "a b c"))                                    // shorter than a chunk
      .toDF("doc_id", "text")
    val chunks = Curation.chunkWords(docs, "text", "doc_id",
        chunkSize = 10, overlap = 2)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val d1 = chunks.filter(_._1 == 1L)
    // stride 8: starts 0, 8, 16, 24 -> 4 chunks; last has 6 tokens
    assert(d1.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_._3).toSeq === Seq(10L, 10L, 10L, 6L))
    assert(d1(1)._4.startsWith("w9 w10"))               // overlap of 2: chunk 1 starts at word 9
    assert(d1.flatMap(_._4.split(" ")).toSet === (1 to 30).map(i => s"w$i").toSet)
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.toSeq === Seq((2L, 0L, 3L, "a b c")))
  }

  test("packSequencesEmit materializes loader-ready packs: EOS placement, spans, capacity (r17)") {
    // deterministic per-doc id arrays of varying length
    val docs = (1L to 150L).map(i =>
      (i, (0 until (i % 23 + 1).toInt).map(j => (i + j).toInt % 50 + 1)))
      .toDF("doc_id", "ids")
    val eos = 0
    val out = Curation.packSequencesEmit(docs, "ids", "doc_id",
      capacity = 64, nShards = 3, eosId = eos)
      .select("shard", "pack_id", "ids", "doc_spans", "n_docs", "n_tokens")
      .as[(Long, Long, Seq[Int], Seq[(Long, Int, Int)], Long, Long)]
      .collect()
    val srcIds = (1L to 150L).map(i =>
      i -> (0 until (i % 23 + 1).toInt).map(j => (i + j).toInt % 50 + 1)).toMap
    assert(out.map(_._5).sum == 150L, "every doc packed exactly once")
    for ((sh, p, ids, spans, nd, nt) <- out) {
      assert(nt == ids.length.toLong && nd == spans.length.toLong)
      // capacity respected INCLUDING the per-doc EOS slot
      assert(ids.length <= 64, s"pack ($sh,$p) emitted ${ids.length} tokens")
      // spans tile the array: each doc's slice matches its source ids,
      // followed by exactly one EOS; spans are in doc_id order
      assert(spans.map(_._1) == spans.map(_._1).sorted)
      var cursor = 0
      for ((docId, start, len) <- spans) {
        assert(start == cursor, s"span start $start != cursor $cursor")
        assert(ids.slice(start, start + len) == srcIds(docId),
          s"doc $docId ids corrupted in pack ($sh,$p)")
        assert(ids(start + len) == eos, "missing EOS after doc")
        cursor = start + len + 1
      }
      assert(cursor == ids.length, "trailing garbage after last EOS")
    }
    // deterministic across partitionings: a different input layout
    // assembles bit-identical packs
    val out2 = Curation.packSequencesEmit(docs.repartition(7), "ids",
      "doc_id", capacity = 64, nShards = 3, eosId = eos)
      .select("shard", "pack_id", "ids", "n_docs", "n_tokens")
      .as[(Long, Long, Seq[Int], Long, Long)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).sortBy(r => (r._1, r._2)).toSeq ==
      out2.map(r => (r._1, r._2, r._3)).sortBy(r => (r._1, r._2)).toSeq)
  }

  test("packSequences gives an oversize document its own pack") {
    val docs = Seq(
      (1L, Seq.fill(5)("w").mkString(" ")),
      (2L, Seq.fill(50)("w").mkString(" ")), // > capacity
      (3L, Seq.fill(5)("w").mkString(" "))).toDF("doc_id", "text")
    val packed = Curation.packSequences(docs, "text", "doc_id",
      capacity = 10, nShards = 1)
    val byDoc = packed.select("doc_id", "pack_id")
      .as[(Long, Long)].collect().toMap
    assert(byDoc(1L) != byDoc(2L) && byDoc(2L) != byDoc(3L),
      s"oversize doc must sit alone: $byDoc")
  }

  test("dsirWeights ranks target-like documents above off-target ones") {
    // target distribution = "alpha beta" bigrams; raw corpus mixes
    // target-like docs with "zulu yankee" off-target docs
    val target = (0L until 20L).map(i => (i + 1000L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text")
    val raw = ((0L until 5L).map(i => (i, "alpha beta alpha beta alpha")) ++
      (5L until 10L).map(i => (i, "zulu yankee zulu yankee zulu")))
      .toDF("doc_id", "text")
    val w = Curation.dsirWeights(raw, target, "text", "doc_id", dim = 64)
      .as[(Long, Double)].collect().toMap
    val targetLike = (0L until 5L).map(w)
    val offTarget = (5L until 10L).map(w)
    assert(targetLike.min > offTarget.max,
      s"target-like $targetLike must outrank off-target $offTarget")
  }

  test("writeShards partitions by the portable bucket in (hash, id) file order") {
    import graft.functions.PortableHash
    import graft.operators.Curation
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Curation.writeShards(docs, "doc_id", nShards = 4, path = s"$dir/out")
    val shardDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    // membership and ROW ORDER inside each shard file are the contract
    val expected = docs
      .withColumn("shard", PortableHash.bucket($"doc_id", 4))
      .withColumn("h", PortableHash.hash32($"doc_id"))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(0)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(_._3).toSeq).toMap
    (0 to 3).foreach { s =>
      val got = spark.read.parquet(s"$dir/out/shard=$s")
        .select("doc_id").as[Long].collect().toSeq
      assert(got == expected(s.toLong), s"shard $s order/membership")
    }
  }

  test("weightedSample: deterministic, right size, heavy weights dominate") {
    import graft.operators.Curation
    val docs = (1L to 100L).map(i => (i, if (i == 42L) 1e9 else 1.0))
      .toDF("id", "w")
    def draw() = Curation.weightedSample(docs, "w", "id", 10)
      .select("id").as[Long].collect().toSet
    val s1 = draw()
    assert(s1 == draw() && s1.size == 10 && s1.contains(42L))
  }

  test("gopherFlags trips each rule on a crafted offender") {
    import graft.operators.Curation
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"the a $fifty"),                       // clean: passes all
      (2L, "the a short doc"),                     // too few words
      (3L, ("xx " * 52).trim + " the a"),          // mean word len < 3, low uniq
      (4L, s"the a $fifty ### ### ### ### ### #"), // symbol ratio >= 0.1
      (5L, s"$fifty the a " +
        (1 to 60).map(_ => "1 2 3").mkString(" ")), // alpha frac <= 0.8
      (6L, fifty + " extra words here"),           // no 2 stopwords
      (7L, ((1 to 12).map(i => s"- bullet $i line") :+ s"the a $fifty")
        .mkString("\n")),                          // bullet frac handled: 12/13 < 0.9? no: 12/13 > 0.9 → fails
      (8L, ((1 to 5).map(i => s"line $i trails ...") :+ s"the a $fifty")
        .mkString("\n")))                          // 5/6 lines end in ... → fails
      .toDF("doc_id", "text")
    val got = Curation.gopherFlags(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9),
          r.getBoolean(10))).toMap
    // (f_words, f_word_len, f_symbol, f_bullet, f_ellipsis, f_alpha, f_stop, f_uniq, pass)
    assert(got(1L) === ((true, true, true, true, true, true, true, true, true)))
    assert(!got(2L)._1 && !got(2L)._9)
    assert(!got(3L)._2 && !got(3L)._8 && !got(3L)._9)
    assert(!got(4L)._3 && !got(4L)._9)
    assert(!got(5L)._6 && !got(5L)._9)
    assert(!got(6L)._7 && !got(6L)._9)
    assert(!got(7L)._4 && !got(7L)._9)
    assert(!got(8L)._5 && !got(8L)._9)
  }

  test("bigramCrossEntropy matches hand-computed interpolated probabilities") {
    import graft.functions.TextFunctions
    val corpus = Seq((10L, "a b a b")).toDF("doc_id", "text")
    // corpus: N=4, c(a)=c(b)=2; bigrams (a,b)=2, (b,a)=1; c(a·)=2, c(b·)=1
    val docs = Seq((1L, "a b"), (2L, "b b")).toDF("doc_id", "text")
    val got = TextFunctions.bigramCrossEntropy(docs, "doc_id", "text",
        corpus, lambda = 0.75)
      .select("doc_id", "bigrams", "xent")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // doc 1: P(b|a) = .75*(2/2) + .25*(2/4) = 0.875 (scaled-int term sum
    // quantizes each term at 1e-6)
    assert(got(0)._2 == 1L)
    assert(math.abs(got(0)._3 - (-math.log(0.875) / math.log(2))) < 1e-6)
    // doc 2: (b,b) unseen → unigram fallback only: P = .25*(2/4) = 0.125
    assert(got(1) === ((2L, 1L, 3.0)))
  }

  test("bigramCrossEntropy flags OOV bigrams instead of deflating xent") {
    import graft.functions.TextFunctions
    val corpus = Seq((10L, "a b a b")).toDF("doc_id", "text")
    // doc 1: (a,b) in-vocab + (b,z) OOV (z never appears in the corpus);
    // doc 2: entirely OOV → null xent, not 0
    val docs = Seq((1L, "a b z"), (2L, "z z")).toDF("doc_id", "text")
    val got = TextFunctions.bigramCrossEntropy(docs, "doc_id", "text",
        corpus, lambda = 0.75)
      .select("doc_id", "bigrams", "oov", "xent")
      .collect().sortBy(_.getLong(0))
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 1L)
    // xent over the single in-vocab bigram only: P(b|a) = 0.875
    assert(math.abs(got(0).getDouble(3) -
      (-math.log(0.875) / math.log(2))) < 1e-6)
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 1L)
    assert(got(1).isNullAt(3), "all-OOV doc must yield null xent, not 0")
  }

  test("linearTextScore matches a driver-side md5-bucket recomputation") {
    import graft.operators.Curation
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma delta")).toDF("doc_id", "text")
    val weights = Map(0 -> 1.5, 1 -> -2.0, 2 -> 0.75, 3 -> 0.25)
    val dim = 4
    def bucket(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (BigInt(hex, 16) % dim).toInt
    }
    def expected(ws: Seq[String]): Double = {
      val dot = ws.groupBy(bucket).map { case (b, g) =>
        weights.getOrElse(b, 0.0) * g.size }.sum
      1.0 / (1.0 + math.exp(-(0.5 + dot / ws.size)))
    }
    val got = Curation.linearTextScore(docs, "text", "doc_id",
        weights, bias = 0.5, dim = dim)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - expected(Seq("alpha", "beta", "alpha"))) < 1e-12)
    assert(math.abs(got(2L) - expected(Seq("gamma", "delta"))) < 1e-12)
  }

  test("c4Clean: each line and document rule trips on a crafted offender") {
    val long = (1 to 8).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      // all three lines survive; 3 sentence enders → kept
      (1L, s"$long.\n$long!\nis it $long?"),
      // line rules: no terminal punct / too short / javascript mention
      (2L, s"$long\nshort one.\nplease enable JavaScript to continue $long.\n$long.\n$long!\n$long?"),
      // document rules: brace, lorem ipsum, too few sentences
      (3L, s"$long. {x}\n$long!\n$long?"),
      (4L, s"$long with Lorem Ipsum inside.\n$long!\n$long?"),
      (5L, s"$long.\n$long!"),
      // quote ending counts as terminal; '?' inside clean text counts a sentence
      (6L, s"she said $long.\"\n$long!\nis it $long?"))
      .toDF("doc_id", "text")
    val got = Curation.c4Clean(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    // (n_lines, n_lines_kept, n_sentences, has_brace, has_phrase, kept)
    assert(got(1L) === ((3L, 3L, 3L, false, false, true)))
    assert(got(2L) === ((6L, 3L, 3L, false, false, true)),
      "unpunctuated, short, and javascript lines drop; the rest keep the doc")
    assert(got(3L)._4 && !got(3L)._6, "brace drops the page")
    assert(got(4L)._5 && !got(4L)._6, "lorem ipsum drops the page")
    assert(got(5L) === ((2L, 2L, 2L, false, false, false)),
      "two sentences < minSentences=3")
    assert(got(6L)._2 === 3L && got(6L)._6,
      "a quote ending keeps its line; enders inside kept text count")
  }

  test("temperatureSample: α=1 keeps natural proportions, α=0.5 lifts the tail") {
    val docs = ((1L to 160L).map(i => (i, "big")) ++
      (161L to 170L).map(i => (i, "small"))).toDF("doc_id", "source")
    def kept(alpha: Double) =
      Curation.temperatureSample(docs, "source", "doc_id", alpha, totalN = 50L)
        .groupBy("source").count().as[(String, Long)].collect().toMap
    // α=1: weights 160/10 → targets floor(50·160/170)=47, floor(50·10/170)=2
    assert(kept(1.0) == Map("big" -> 47L, "small" -> 2L))
    // α=0.5: √160≈12.649, √10≈3.162 → floor(50·w/Σ) = 40 and 10
    assert(kept(0.5) == Map("big" -> 40L, "small" -> 10L))
    // α=0: uniform weights → 25 each, capped by |small|=10
    assert(kept(0.0) == Map("big" -> 25L, "small" -> 10L))
    // deterministic across reruns
    assert(kept(0.5) == kept(0.5))
  }

  test("bm25 matches a hand-computed two-doc score") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "cat dog cat"), // tf(cat)=2, dl=3
      (2L, "dog bird bird bird"), // no cat, dl=4
      (3L, "fish fish fish fish fish")) // no match at all, dl=5
      .toDF("doc_id", "text")
    val got = TextFunctions.bm25(docs, "doc_id", "text", Seq("cat"),
        k1 = 1.2, b = 0.75)
      .as[(Long, Double)].collect().toMap
    // N=3, df(cat)=1, avgdl=4; idf = ln(1 + (3-1+0.5)/1.5)
    val idf = math.log(1 + 2.5 / 1.5)
    val expected = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 4.0))
    assert(got.keySet == Set(1L), s"only doc 1 matches: $got")
    assert(math.abs(got(1L) - expected) < 5e-5, s"got ${got(1L)}, want $expected")
  }
}
