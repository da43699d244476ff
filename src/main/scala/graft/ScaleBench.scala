package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling-curve harness (r9, VERDICT task 1): measures six
  * flagship pipelines (the original five + the r9 stream_dedup addition;
  * r10 adds the adversarial-skew pair skew_domain_cap{,_novalve}, run
  * on demand via the pipeline filter)
  * at 1×/10×/100× of the sf0.1 corpus and reports
  * per-decade log-log slopes, turning the 100 TB plan-shape arguments
  * into measured exponents.
  *
  * Scaled corpora are synthesized by unioning K re-keyed copies of the
  * fixture (ids shifted by a 1 M stride). Document texts get a per-copy
  * word tag (`q<k>z` appended to every word, k ≥ 1), which makes the
  * copies' shingle spaces DISJOINT: each copy reproduces the base
  * corpus's internal near-dup structure, and no cross-copy shingle or
  * band collisions exist — so total true work scales linearly with K by
  * construction and a measured slope above 1 exposes engine overheads,
  * not an artifact of planting K-times-denser duplicate clusters.
  * Embeddings are re-keyed only (runtime is value-independent; queries
  * stay the base vec_id < 10 set, so ANN work is 10 × corpus).
  *
  * r10 (VERDICT task 1): every cell also records the MEMORY ENVELOPE —
  * peak per-task execution memory, shuffle bytes read/written, and
  * memory/disk spill from SparkListener task metrics — so the slopes
  * are wall-time AND state curves; and an optional big cell (default
  * 1000×) runs the two stateful-heaviest pipelines (minhash_dedup,
  * curation6) a full decade past the standard grid.
  *
  * Usage: graft.ScaleBench [scales=1,10,100] [reps=2] [bigScale=1000|0]
  *        [pipelineFilter (comma-separated names; default all)]
  * Writes scaled corpora under target/scale/x<K>/ (restaged when the
  * fixture changes) and prints one JSON line per (pipeline, scale) plus
  * a slope summary.
  */
object ScaleBench {

  /** Windowed task-metrics accumulator: reset before a measured run,
    * snapshot after. Values aggregate over every task that ENDED in the
    * window (min-of-reps timing reports the matching rep's snapshot). */
  private final class TaskMetricsListener
      extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val peakTaskMem = new AtomicLong(0L)
    val inputBytes = new AtomicLong(0L)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        peakTaskMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def reset(): Unit = Seq(shuffleRead, shuffleWrite, memSpill, diskSpill,
      peakTaskMem, inputBytes).foreach(_.set(0L))
    def snapshot: Map[String, Long] = Map(
      "peak_task_mem" -> peakTaskMem.get, "shuffle_read" -> shuffleRead.get,
      "shuffle_write" -> shuffleWrite.get, "mem_spill" -> memSpill.get,
      "disk_spill" -> diskSpill.get, "input_bytes" -> inputBytes.get)
  }

  private val BaseDir = "/root/testdata/sf0.1"
  private val Stride = 1000000L

  private def stage(spark: SparkSession, k: Int): String = {
    import java.nio.file.{Files, Paths}
    val dir = s"/root/repo/target/scale/x$k"
    val marker = Paths.get(dir, "_staged.marker")
    val srcDocs = Paths.get(s"$BaseDir/documents.parquet")
    val srcEmb = Paths.get(s"$BaseDir/embeddings.parquet")
    val stamp = s"${Files.size(srcDocs)}:${Files.getLastModifiedTime(srcDocs).toMillis}:" +
      s"${Files.size(srcEmb)}:${Files.getLastModifiedTime(srcEmb).toMillis}:$k:v1"
    if (Files.exists(marker) &&
        new String(Files.readAllBytes(marker)) == stamp) return dir
    val docs = spark.read.parquet(srcDocs.toString)
    val emb = spark.read.parquet(srcEmb.toString)
    val scaledDocs = (0 until k).map { i =>
      val tagged =
        if (i == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"q${i}z"))),
          " ")
      docs.select((col("doc_id") + lit(i * Stride)).as("doc_id"),
        tagged.as("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    val scaledEmb = (0 until k).map { i =>
      emb.select((col("vec_id") + lit(i * Stride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionAll _)
    scaledDocs.repartition(math.max(2, k)).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    scaledEmb.repartition(math.max(2, k)).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    Files.write(marker, stamp.getBytes)
    dir
  }

  /** The six flagship pipelines (stream_dedup joined in r9), each forced
    * with a count(). */
  /** One-time tokenizer-scale merge table for the bpe_tokens cell —
    * deterministic (synthetic lexicon, delta trainer), trained per JVM. */
  private lazy val bpe10k: Vector[(String, String)] =
    graft.functions.PinnedBpeGen.trainFast(
      graft.functions.PinnedBpeGen.syntheticVocab(8000), 10000)

  private def pipelines: Seq[(String, (SparkSession, String) => Long)] = {
    import graft.operators.{Components, Curation, Dedup, Similarity}
    // Adversarial-skew fixture (r10): 80% of every corpus lands in ONE
    // synthetic mega-domain, the rest spreads over 1000 small domains —
    // the worst case for per-domain windows. Not staged: a projection
    // over the scaled documents table, so the same cells run at every
    // scale. skew_domain_cap runs the structural valve (threshold low
    // enough to trip from 100× up); skew_domain_cap_novalve is the
    // negative control (plain full-domain window) — the wall/peak-mem
    // gap between the two IS the measured value of the valve.
    // GRAFT_SKEW_AMP=A (default 1) unions A re-strided copies of the
    // scaled corpus on the fly — the mega-domain crossover (where the
    // one-task window sort stops being cheap) sits beyond the staged
    // grid, so the amplified cell probes it without staging a decade of
    // parquet. Only the doc_id/domain projection is amplified; ids stay
    // distinct (stride 10^11 clears every staged id space).
    def skewed(s: SparkSession, dir: String): DataFrame = {
      val amp = sys.env.getOrElse("GRAFT_SKEW_AMP", "1").toInt
      val base = Tables.load(s, dir, "documents").select("doc_id", "text")
      val docs =
        if (amp <= 1) base
        else (0 until amp).map(a => base.withColumn("doc_id",
          col("doc_id") + lit(a * 100000000000L))).reduce(_ unionAll _)
      docs.withColumn("domain",
        when(pmod(col("doc_id"), lit(10)) < 8, lit("mega.example.com"))
          .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(1000)))))
    }
    // force the capped TEXT through the plan by writing the full capped
    // frame to the noop sink — what an exporting user does. A bare
    // count() lets Catalyst prune the payload out of the window shuffle
    // entirely, and even agg(sum(octet_length(text))) gets the length
    // projection PUSHED BELOW the window (text crosses the shuffle as an
    // 8-byte int) — both silently remove the phenomenon the skew cells
    // measure: the mega-domain's bytes funneling into one window task.
    // returns the written byte volume (listener outputMetrics are zero
    // for noop, so sum octet lengths of what crossed: cells report it
    // via the shuffle_read metric instead; rows := 0 sentinel)
    def forceText(df: DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save()
      0L
    }
    Seq(
      "minhash_dedup" -> { (s: SparkSession, dir: String) =>
        Dedup.minhashDedupPairs(Tables.load(s, dir, "documents"),
          "text", "doc_id", n = 3, threshold = 0.8,
          bands = 16, rowsPerBand = 4).count()
      },
      "ppjoin_exact" -> { (s: SparkSession, dir: String) =>
        // the LOSSLESS exact path (r14): same pair answer as an uncapped
        // exact join, pruned by prefix filtering instead of LSH recall
        Dedup.ppjoinPairs(Tables.load(s, dir, "documents"),
          "text", "doc_id", n = 3, threshold = 0.8).count()
      },
      "lsh_portable_cands" -> { (s: SparkSession, dir: String) =>
        Dedup.minhashCandidatesPortable(Tables.load(s, dir, "documents"),
          "text", "doc_id").count()
      },
      "cc_star" -> { (s: SparkSession, dir: String) =>
        val pairs = Dedup.minhashDedupPairs(Tables.load(s, dir, "documents"),
          "text", "doc_id", n = 3, threshold = 0.8,
          bands = 16, rowsPerBand = 4)
        Components.connectedComponentsStar(pairs, "doc_a", "doc_b").count()
      },
      "ann_topk" -> { (s: SparkSession, dir: String) =>
        val e = Tables.load(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        Similarity.bruteForceTopK(queries, corpus, k = 5).count()
      },
      "curation6" -> { (s: SparkSession, dir: String) =>
        SparkEntry.queries("ext_curation6")(s, dir).count()
      },
      "bpe_tokens" -> { (s: SparkSession, dir: String) =>
        // tokenizer-scale BPE throughput (r15 VERDICT #2): the native
        // merge-loop encoder over a 10k-merge table — the returned
        // "rows" is the TOTAL TOKEN COUNT, so tokens/s = rows / wall.
        // The table is trained ONCE per JVM (trainFast over the
        // deterministic synthetic lexicon — the fixture's 31-word
        // lexicon exhausts at ~90 merges); its char-pair merges (th,
        // he, in, er, …) bite on the corpus text, and the per-instance
        // distinct-word cache models the Zipfian steady state.
        val docs = Tables.load(s, dir, "documents")
        docs.agg(sum(graft.functions.TextFunctions
            .bpeTokenCountFast(s, col("text"), bpe10k)).as("tokens"))
          .head().getLong(0)
      },
      "aux_bpe_ids" -> { (s: SparkSession, dir: String) =>
        // token-ID encoding throughput (r16, on-demand like aux_*): the
        // graft_bpe_ids merge loop + vocab mapping over the same
        // 10k-merge table — "rows" is the TOTAL ID COUNT (ids are 1:1
        // with tokens here: the ascii alphabet covers the corpus), so
        // ids/s = rows / wall and the bpe_tokens delta is the id-map
        // cost. One foldable vocab literal (~10k symbols), zero shuffle.
        val docs = Tables.load(s, dir, "documents")
        docs.agg(sum(size(graft.functions.TextFunctions
            .bpeEncodeIds(s, col("text"), bpe10k))).as("n"))
          .head().getLong(0)
      },
      "aux_bpe_pretok_ids" -> { (s: SparkSession, dir: String) =>
        // the REAL-pipeline shape (r16): regex pretokenize -> merge
        // loop -> token ids. Measures whether the codegen'd
        // regexp_replace (one pass per row) or the merge loop dominates
        // at scale; compare against aux_bpe_ids with the same table.
        val docs = Tables.load(s, dir, "documents")
        docs.agg(sum(size(graft.functions.TextFunctions
            .bpeEncodeIds(s, graft.functions.TextFunctions
              .bpePretokenizeFast(s, col("text")), bpe10k))).as("n"))
          .head().getLong(0)
      },
      "aux_bpe_decode" -> { (s: SparkSession, dir: String) =>
        // decode throughput (r17): encode to ids (same 10k table) and
        // decode straight back, folding decoded lengths — "rows" is the
        // total decoded char count; the delta vs aux_bpe_ids at the
        // same scale isolates the decode cost.
        val docs = Tables.load(s, dir, "documents")
        val ids = graft.functions.TextFunctions
          .bpeEncodeIds(s, col("text"), bpe10k)
        docs.agg(sum(length(graft.functions.TextFunctions
            .bpeDecodeIds(s, ids, bpe10k))).as("n"))
          .head().getLong(0)
      },
      "aux_pack_ids" -> { (s: SparkSession, dir: String) =>
        // materialized packing end-to-end (r17): encode -> first-fit
        // pack -> per-pack id-array assembly -> noop write. The FULL id
        // arrays must cross the assembly exchange (a count() would prune
        // the payload — the CLAUDE.md payload-movement rule), and that
        // exchange is fanOutWidth-sized (PackFanOut): the cell's
        // shuffle/spill/peak-mem columns are the evidence the width
        // derivation holds at scale.
        val docs = Tables.load(s, dir, "documents")
        val withIds = docs.select(col("doc_id"),
          graft.functions.TextFunctions
            .bpeEncodeIds(s, col("text"), bpe10k).as("ids"))
        forceText(Curation.packSequencesEmit(withIds, "ids", "doc_id",
          capacity = 2048, nShards = 256, eosId = 0))
      },
      "skew_domain_cap" -> { (s: SparkSession, dir: String) =>
        forceText(Curation.domainCap(skewed(s, dir), "domain", "doc_id",
          cap = 1000, skewThreshold = 100000L))
      },
      "skew_domain_cap_novalve" -> { (s: SparkSession, dir: String) =>
        forceText(Curation.domainCap(skewed(s, dir), "domain", "doc_id",
          cap = 1000, skewThreshold = Long.MaxValue))
      },
      "aux_pagerank" -> { (s: SparkSession, dir: String) =>
        // on-demand diagnostic (explicit filter only, like skew_*): 5
        // PageRank rounds over a synthetic link graph whose |V| and |E|
        // scale linearly with the corpus (10 docs per node, a fixed
        // affine re-map for the target) — measures the per-round
        // join + ordered-fold aggregation shape at scale
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        val edges = docs.select(
          (col("doc_id") / 10).cast("long").as("src"),
          ((col("doc_id") * 31L + 7L) / 10).cast("long").as("dst"),
          lit(1L).as("w"))
        graft.operators.Components
          .pagerank(edges, "src", "dst", "w", iters = 5).count()
      },
      "aux_pagerank_fast" -> { (s: SparkSession, dir: String) =>
        // the deterministic=false A/B twin of aux_pagerank (r11 VERDICT
        // #6): plain SUM aggregation instead of per-node ordered folds —
        // run both with the same filter to measure what bit-replay costs
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        val edges = docs.select(
          (col("doc_id") / 10).cast("long").as("src"),
          ((col("doc_id") * 31L + 7L) / 10).cast("long").as("dst"),
          lit(1L).as("w"))
        graft.operators.Components
          .pagerank(edges, "src", "dst", "w", iters = 5,
            deterministic = false).count()
      },
      "aux_inc_reband" -> { (s: SparkSession, dir: String) =>
        // incremental near-dup, the OLD shape: re-band + re-shingle the
        // 90% history for every 10% batch (minhashDedupPairsAgainst)
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Dedup.minhashDedupPairsAgainst(
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          "text", "doc_id").count()
      },
      "aux_inc_index_build" -> { (s: SparkSession, dir: String) =>
        // one-time cost: persist the history's band + shingle tables
        // (amortized across every subsequent batch)
        val nm = incIndexName(dir)
        graft.operators.Dedup.dropIndex(s, nm)
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Dedup.minhashIndexPersist(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          "text", "doc_id", nm, buckets = 32)
        s.table(s"${nm}_bands").count()
      },
      "aux_inc_index_query" -> { (s: SparkSession, dir: String) =>
        // per-batch cost with the persisted index (run the build cell
        // first in the same drive: filter aux_inc_index_build,aux_inc_index_query)
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Dedup.minhashDedupPairsAgainstIndex(
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "text", "doc_id", incIndexName(dir)).count()
      },
      "aux_inc_ppjoin_build" -> { (s: SparkSession, dir: String) =>
        // one-time cost of the EXACT prefix index (r14): df + prefix +
        // shingle tables over the 90% history
        val nm = incIndexName(dir) + "_pp"
        graft.operators.Dedup.dropPpjoinIndex(s, nm)
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Dedup.ppjoinIndexPersist(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          "text", "doc_id", nm, buckets = 32)
        s.table(s"${nm}_pprefix").count()
      },
      "aux_inc_ppjoin_query" -> { (s: SparkSession, dir: String) =>
        // per-batch cost of the LOSSLESS exact probe (run the build cell
        // first in the same drive); the A/B twin of aux_inc_index_query
        // — what exactness costs over LSH at the same batch shape
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Dedup.ppjoinPairsAgainstIndex(
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "text", "doc_id", incIndexName(dir) + "_pp").count()
      },
      "aux_ts_features" -> { (s: SparkSession, dir: String) =>
        // tsFeatures at the shape that breaks first (r12 VERDICT #4):
        // two keyed windows + one agg over an 80/20-skewed key space —
        // 80% of rows land in ONE mega-series, the rest spread over
        // 1000 small series (the skew_* cells' distribution). Values
        // are exact-integer cents-like synth from n_chars.
        // GRAFT_SKEW_AMP=A unions A re-strided copies (ids disjoint)
        // to probe the mega-series crossover beyond the staged grid.
        // Forced through noop (a count() would let Catalyst prune the
        // feature columns and with them the windows themselves).
        // wide = true: the mega-series' Σ(c·n−s)² overflows BIGINT from
        // 10× up (n³·c² > 9e18) — the exact situation the DECIMAL mode
        // exists for; ANSI raised loudly on the narrow path (r13).
        val amp = sys.env.getOrElse("GRAFT_SKEW_AMP", "1").toInt
        val base = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"))
        val rows =
          if (amp <= 1) base
          else (0 until amp).map(a => base.withColumn("doc_id",
            col("doc_id") + lit(a * 100000000000L))).reduce(_ unionAll _)
        val keyed = rows.select(
          when(pmod(col("doc_id"), lit(10)) < 8, lit(0L))
            .otherwise(pmod(col("doc_id"), lit(1000)) + 1L).as("k"),
          col("doc_id").as("o"),
          (pmod(col("n_chars") * 31 + col("doc_id"), lit(2001)) - 1000L).as("c"))
        forceText(graft.operators.Sessionize
          .tsFeatures(keyed, "k", Seq("o"), "c", wide = true))
      },
      "aux_ann_recall" -> { (s: SparkSession, dir: String) =>
        // quantitative ANN recall audit (r12 VERDICT #8): recall@10 of
        // IVF (nprobe sweep) and PQ vs the brute-force truth, on the
        // staged corpus DE-DUPLICATED by a deterministic per-row jitter
        // (staged copies are bit-identical re-keys — without jitter
        // every query's top-k is its exact twins and recall is trivially
        // 1.0). Jitter is ±0.05 uniform from vec_id — cluster structure
        // survives, exact ties don't. Truth/approx top-k are 50·10-row
        // frames: the collect is bounded by construction (diagnostic
        // cell). Emits one recall JSON line; wall time is the full
        // fit + 5 probes.
        import graft.operators.Similarity
        val kTop = 10
        val e = Tables.load(s, dir, "embeddings")
        val jit = transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            pmod(col("vec_id") * 31 + i, lit(1000)).cast("double") / 10000.0
            - 0.05).cast("float"))
        val corpus = e.select(col("vec_id").as("cid"), jit.as("cvec"))
        val queries = e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        def topSets(df: DataFrame): Map[Long, Set[Long]] =
          df.select("qid", "cid").collect()
            .groupBy(_.getLong(0))
            .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
        val truth = topSets(Similarity.bruteForceTopK(queries, corpus, kTop))
        def recall(approx: Map[Long, Set[Long]]): Double = {
          val per = truth.map { case (q, t) =>
            (approx.getOrElse(q, Set.empty[Long]) & t).size.toDouble / t.size }
          per.sum / per.size
        }
        val idx = Similarity.ivfFit(corpus, nlist = 64)
        idx.assigned.persist()
        val ivf = Seq(1, 2, 4, 8).map { np =>
          np -> recall(topSets(Similarity.ivfProbe(idx, queries, kTop, np)))
        }
        val pq = Similarity.pqFit(corpus, dim = 64, m = 8, kCodes = 16)
        pq.encoded.persist()
        val pqRecall = recall(topSets(Similarity.pqProbe(pq, queries, kTop)))
        idx.assigned.unpersist()
        pq.encoded.unpersist()
        val ivfJson = ivf.map { case (np, r) =>
          s""""nprobe_$np":${f"$r%.4f"}""" }.mkString(",")
        println(s"""{"recall_audit":{"ivf_nlist64":{$ivfJson},""" +
          s""""pq_m8_k16":${f"$pqRecall%.4f"},""" +
          s""""queries":${truth.size},"k":$kTop}}""")
        truth.size.toLong
      },
      "aux_stream_selfmaintain" -> { (s: SparkSession, dir: String) =>
        // the complete crawl loop at scale (r13): history = 90% of the
        // corpus persisted as the LSH index, the remaining 10% streamed
        // in ~4 micro-batches through streamingDedupSelfMaintaining —
        // each batch dedups against (history + earlier survivors) and
        // appends its survivors. Measures the per-batch wall as the
        // index grows; state stays in the bucketed tables.
        val nm = incIndexName(dir) + "_ssm"
        graft.operators.Dedup.dropIndex(s, nm)
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Dedup.minhashIndexPersist(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          "text", "doc_id", nm, buckets = 32)
        val path = s"$dir/documents.parquet"
        val schema = s.read.parquet(path).schema
        val nFiles = new java.io.File(path).listFiles()
          .count(f => f.getName.startsWith("part-"))
        val perTrigger = math.max(1, nFiles / 4)
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", perTrigger).parquet(path)
          .filter(pmod(col("doc_id"), lit(10)) === 0)
        val accepted = new java.util.concurrent.atomic.AtomicLong(0L)
        val q = graft.streaming.StreamOps
          .streamingDedupSelfMaintaining(stream, nm) { (survivors, _) =>
            accepted.addAndGet(survivors.count())
          }
        try {
          q.processAllAvailable()
          accepted.get()
        } finally q.stop()
      },
      "aux_index_compact" -> { (s: SparkSession, dir: String) =>
        // the small-files wall (r13 VERDICT #2): 60 simulated daily
        // appends fragment the bucketed tables — one insertInto job per
        // append, ≥1 file per touched bucket each — then
        // minhashIndexCompact rewrites at one file per bucket. Measures
        // the per-batch index-probe query FRAGMENTED vs COMPACTED plus
        // file counts and the compaction cost itself; prints its own
        // JSON line (diagnostic cell, explicit filter only).
        import graft.operators.Dedup
        val nm = incIndexName(dir) + "_cmp"
        Dedup.dropIndex(s, nm)
        val docs = Tables.load(s, dir, "documents")
        // history = %10 ∈ 1..9; initial build %10 ∈ 1..3, sixty ~1%
        // appends cover %100 values with %10 ∈ 4..9; batch = %10 == 0
        Dedup.minhashIndexPersist(
          docs.filter(pmod(col("doc_id"), lit(10)).between(1, 3)),
          "text", "doc_id", nm, buckets = 32)
        (0 until 100).filter(v => v % 10 >= 4).foreach { v =>
          Dedup.minhashIndexAppend(
            docs.filter(pmod(col("doc_id"), lit(100)) === v),
            "text", "doc_id", nm)
        }
        def files(t: String): Long = {
          val loc = java.nio.file.Paths.get(new java.net.URI(
            s.sessionState.catalog.getTableMetadata(
              org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString))
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala
            .count(_.getFileName.toString.startsWith("part-"))
        }
        def probe(): (Long, Double) = {
          val t0 = System.nanoTime()
          val n = Dedup.minhashDedupPairsAgainstIndex(
            docs.filter(pmod(col("doc_id"), lit(10)) === 0),
            "text", "doc_id", nm).count()
          (n, (System.nanoTime() - t0) / 1e9)
        }
        val filesFrag = files(s"${nm}_bands") + files(s"${nm}_shingles")
        val (nFrag, tFrag) = probe()
        val tc0 = System.nanoTime()
        Dedup.minhashIndexCompact(s, nm)
        val tCompact = (System.nanoTime() - tc0) / 1e9
        val filesComp = files(s"${nm}_bands") + files(s"${nm}_shingles")
        val (nComp, tComp) = probe()
        require(nComp == nFrag,
          s"compaction changed the answer: $nFrag -> $nComp")
        println(f"""{"index_compact":{"appends":60,"files_fragmented":$filesFrag,"files_compacted":$filesComp,"query_fragmented_s":$tFrag%.3f,"query_compacted_s":$tComp%.3f,"compact_s":$tCompact%.3f,"pairs":$nFrag}}""")
        nFrag
      },
      "stream_dedup" -> { (s: SparkSession, dir: String) =>
        // streaming first-seen dedup over the staged files in ~4
        // micro-batches — the ingest-time filter's throughput curve
        val path = s"$dir/documents.parquet"
        val schema = s.read.parquet(path).schema
        val nFiles = new java.io.File(path).listFiles()
          .count(f => f.getName.startsWith("part-"))
        val perTrigger = math.max(1, nFiles / 4)
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", perTrigger).parquet(path)
        val sink = s"scale_dedup_${streamSinkSeq.incrementAndGet()}"
        val q = graft.streaming.StreamOps.streamingExactDedup(stream)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          s.table(sink).count()
        } finally q.stop()
      })
  }

  private val streamSinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-corpus catalog name for the aux incremental-LSH index cells
    * (scale drives reuse one session across scales). */
  private def incIndexName(dir: String): String =
    "graft_scale_inc_" + dir.replaceAll("[^a-zA-Z0-9]", "_").takeRight(12)

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    // the decade-beyond cell for the stateful-heaviest pipelines; 0 skips
    val bigScale = args.lift(2).map(_.toInt).getOrElse(1000)
    val bigPipelines = Set("minhash_dedup", "curation6")
    // optional one-off subset, e.g. `1000 1 0 stream_dedup`
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // widen for big-scale drives (bytes/128MB — the q09 lesson, PERF r10);
    // default stays the cpu count so the staged grid remains comparable
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // SPARK_GRAFT_MASTER: topology drives (local-cluster[...] — separate
    // executor JVMs), same convention as graft.Verify (r14)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)

    val results = collection.mutable.Map[(String, Int), Double]()
    val metrics = collection.mutable.Map[(String, Int), Map[String, Long]]()

    def runCell(name: String, fn: (SparkSession, String) => Long,
        k: Int, dir: String): Unit = {
      // width ∝ staged-corpus bytes (the q09 lesson as code, r12):
      // floor = the configured width, so the 1×/10×/100× grid keeps its
      // cross-round 32-width contract; big cells widen automatically.
      // An explicit SPARK_GRAFT_SHUFFLE pins the width manually.
      if (!sys.env.contains("SPARK_GRAFT_SHUFFLE")) {
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        graft.api.GraftSession.scaleShuffleWidth(spark, dir)
      }
      val runs = (1 to reps).map { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        val n = fn(spark, dir)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain the async listener bus before snapshot
        (dt, n, listener.snapshot)
      }
      val (best, rows, snap) = runs.minBy(_._1)
      results((name, k)) = best
      metrics((name, k)) = snap
      val mjson = snap.toSeq.sortBy(_._1)
        .map { case (mk, v) => s""""$mk":$v""" }.mkString(",")
      println(f"""{"pipeline":"$name","scale":$k,"sec":$best%.3f,""" +
        s""""rows":$rows,"reps":${runs.map(t => f"${t._1}%.2f").mkString("[", ",", "]")},$mjson}""")
    }

    // skew_* / aux_* cells are on-demand diagnostics (explicit filter
    // only) — the default grid stays the six-pipeline table comparable
    // across rounds
    val active = pipelines.filter(p => only match {
      case Some(names) => names(p._1)
      case None => !p._1.startsWith("skew_") && !p._1.startsWith("aux_")
    })
    require(active.nonEmpty,
      s"no pipeline matches filter ${only.getOrElse(Set())}; " +
        s"known: ${pipelines.map(_._1).mkString(", ")}")
    val dirs = scales.map(k => k -> stage(spark, k)).toMap
    for ((name, fn) <- active; k <- scales) runCell(name, fn, k, dirs(k))

    // the decade-beyond memory-envelope cells (stateful-heaviest only,
    // or whatever the explicit filter names)
    val bigSet = if (only.isDefined) active.map(_._1).toSet else bigPipelines
    val bigScales: Seq[Int] =
      if (bigScale > scales.max) {
        val bigDir = stage(spark, bigScale)
        for ((name, fn) <- active.filter(p => bigSet(p._1)))
          runCell(name, fn, bigScale, bigDir)
        Seq(bigScale)
      } else Seq.empty

    // per-decade slopes: s = log(t_b/t_a) / log(b/a); slope 1 = linear
    def slopeRow(name: String, pts: Seq[Int],
        value: (String, Int) => Double): String =
      // sliding(2) on a 1-element grid yields a 1-element window —
      // filter it out instead of MatchError-ing (single-scale filter runs)
      pts.sliding(2).filter(_.size == 2).map { case Seq(a, b) =>
        val va = value(name, a); val vb = value(name, b)
        if (va <= 0.0 || vb <= 0.0) f"${Double.NaN}%12.2f"
        else f"${math.log(vb / va) / math.log(b.toDouble / a)}%12.2f"
      }.mkString("  ")
    println("pipeline          " + scales.sliding(2).filter(_.size == 2)
      .map { case Seq(a, b) => f"slope_${a}x_${b}x" }.mkString("  ") +
      bigScales.map(b => f"  slope_${scales.max}x_${b}x (big cells)").mkString)
    for ((name, _) <- active) {
      val pts = scales ++ bigScales.filter(_ => bigSet(name))
      println(f"$name%-18s${slopeRow(name, pts, (n, k) => results((n, k)))}")
    }
    // state slopes: peak task memory + total spill must stay bounded —
    // a wall-time slope of 0.8 with a memory slope near 1 is the 100 TB
    // red flag the r9 verdict asked this harness to catch
    println("-- memory envelope slopes (peak_task_mem; spill printed raw) --")
    for ((name, _) <- active) {
      val pts = scales ++ bigScales.filter(_ => bigSet(name))
      val memSlope = slopeRow(name, pts,
        (n, k) => metrics((n, k))("peak_task_mem").toDouble)
      val spills = pts.map(k => metrics((name, k))("mem_spill") +
        metrics((name, k))("disk_spill"))
      println(f"$name%-18s$memSlope  spill=${spills.mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
