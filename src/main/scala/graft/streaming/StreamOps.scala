package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True-streaming forms of the event-time operators (SURVEY §2.16,
  * additive scope — the reference has no streaming model at all; these are
  * the Structured Streaming equivalents of the batch operators in
  * [[graft.operators.Sessionize]], and produce identical results on the
  * same data, which StreamingSpec asserts via MemoryStream).
  *
  * Scale design: watermarks bound state size (late events beyond the
  * watermark are dropped, state for closed windows is evicted), and all
  * aggregations are keyed so state shards across executors. A 100 TB/day
  * event firehose runs these exact plans with kafka sources swapped in for
  * the file/memory sources used in tests.
  */
object StreamOps {

  /** Tumbling event-time window counts with a watermark.
    * Input must have (ts timestamp, event_type string, value double). */
  def tumblingCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))

  /** Sliding event-time window counts. */
  def slidingCounts(events: DataFrame, width: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Gap-based sessions via the native session_window — the streaming
    * equivalent of [[graft.operators.Sessionize.assignSessions]]: a session
    * closes when no event arrives for `gap`. */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .select(col("session_window.start").as("s_start"),
        col("user_id"), col("n_events"), col("first_event"))

  /** Streaming exact dedup: emit only the first occurrence of each
    * normalized-text fingerprint across the whole stream — the streaming
    * form of [[graft.operators.Dedup.exactTextDedup]], keyed state sharded
    * over executors (a production deployment bounds state with a watermark
    * + timeout; here state is unbounded like the batch semantics).
    * Input: (doc_id long, text string); output first-seen (doc_id, fp). */
  def streamingExactDedup(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        graft.functions.TextFunctions
          .md5FingerprintFast(docs.sparkSession, col("text")).as("fp"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // first occurrence in this batch: lowest doc_id, like the batch op
            val first = rows.minBy(_._1)
            Iterator.single((first._1, fp))
          }
      }
      .toDF("doc_id", "fp")
  }

  /** Streaming benchmark decontamination: the stream–static form of
    * [[graft.operators.Curation.decontaminate]] — incoming documents are
    * scored against a STATIC benchmark-shingle table (the benchmark set
    * changes rarely; Spark re-broadcasts it per batch). The stream side
    * never accumulates state: each micro-batch explodes its own shingles,
    * probes the broadcast, and aggregates within the batch (doc_id is
    * unique per document so a per-batch group is complete). Ingest-time
    * filtering at firehose scale — contaminated docs never reach the
    * corpus sink. */
  def decontaminateStream(docs: DataFrame, benchShingles: DataFrame,
      n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val marked = benchShingles.select(col("__sh"), lit(1).as("__hit")).distinct()
    docs
      // explode_outer: a doc too short to shingle still emits its row
      // (with 0 overlaps), matching the batch operator's left join
      .select(col("doc_id"),
        explode_outer(graft.functions.TextFunctions.hashedShingles(col("text"), n)).as("__sh"))
      .join(broadcast(marked), Seq("__sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("__hit")).as("n_contaminated_ngrams")) // count skips nulls
      .select(col("doc_id"), col("n_contaminated_ngrams"),
        (col("n_contaminated_ngrams") >= minOverlap).as("contaminated"))
  }

  /** Streaming SEMANTIC decontamination (r10) — the stream–static form of
    * [[graft.operators.Similarity.semanticDecontaminate]]: incoming
    * embedding rows score their max cosine against the STATIC benchmark
    * vector table (broadcast per batch, like [[decontaminateStream]]'s
    * shingle table). The per-cid max aggregate runs in complete mode;
    * per-pair sims are round-4 before the order-free max, so batch and
    * streaming results are bit-identical. Input (cid, cvec); output
    * (cid, max_sim, contaminated). */
  def semanticDecontaminateStream(corpus: DataFrame, bench: DataFrame,
      threshold: Double): DataFrame =
    graft.operators.Similarity.semanticDecontaminate(corpus, bench, threshold)

  /** Stream–stream interval join: right-stream events falling in
    * [left.ts, left.ts + windowSeconds) for the same key — the streaming
    * form of [[graft.operators.Sessionize.intervalJoin]] (clicks within an
    * hour of a signup, etc.). Both sides carry watermarks, so the join
    * state is bounded: Spark evicts left rows once the right watermark
    * passes their window end. Inputs need (user_id, event_id, ts); output
    * (user_id, left_id, right_id).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      windowSeconds: Long, watermark: String): DataFrame = {
    val l = left
      .selectExpr("user_id AS l_user", "event_id AS left_id", "ts AS l_ts")
      .withWatermark("l_ts", watermark)
    val r = right
      .selectExpr("user_id AS r_user", "event_id AS right_id", "ts AS r_ts")
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
        s"""l_user = r_user AND
           |r_ts >= l_ts AND
           |r_ts < l_ts + INTERVAL $windowSeconds SECOND""".stripMargin))
      .select(col("l_user").as("user_id"), col("left_id"), col("right_id"))
  }

  /** Streaming MinHash near-dup candidate detection: every incoming doc's
    * LSH band buckets are checked against keyed bucket-ownership state —
    * a doc sharing ANY bucket with an earlier doc (previous batch, or a
    * lower doc_id in the same batch) is a near-dup CANDIDATE, exactly the
    * recall set batch `minhashLshCandidates` would emit against the
    * history. This is the ingest-time "have I seen something like this
    * before" filter a firehose pipeline runs before paying for exact
    * verification; state is one long per occupied bucket, sharded by
    * bucket key across executors (a production deployment adds a state
    * TTL to window the history).
    *
    * Emits per-(doc, band) rows (doc_id, band, dup_hit); fold to per-doc
    * verdicts with [[nearDupVerdicts]] on the sink (a second stateful
    * aggregation in the same query would need a watermark; the per-bucket
    * rows are the complete signal). */
  def streamingNearDupCandidates(docs: DataFrame, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 4, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    // portable = the md5/polynomial banding (Dedup.minhashBandsPortable)
    // whose collisions any engine replays — the oracled variant
    // (op_stream_neardup_parity); murmur banding stays the hot default
    val banded =
      if (portable) graft.operators.Dedup
        .minhashBandsPortable(docs, "text", "doc_id", n, bands, rowsPerBand, seed)
      else graft.operators.Dedup
        .minhashBands(docs, "text", "doc_id", n, bands, rowsPerBand, seed)
    banded
      .select(col("doc_id"), col("band"), col("bucket").cast("long").as("bucket"))
      .as[(Long, Int, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Long, (Long, Int, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[(Long, Int, Long)], state: GroupState[Long]) =>
          // deterministic within-batch order: lowest doc_id claims first
          val ids = rows.map(_._1).toVector.distinct.sorted
          val owner = state.getOption
          if (owner.isEmpty) state.update(ids.head)
          val out = ids.map { id =>
            val dupHit = owner match {
              case Some(o) => id != o     // bucket already owned by an earlier doc
              case None => id != ids.head // same batch: all but the claimer
            }
            (id, key._1, dupHit)
          }
          out.iterator
      }
      .toDF("doc_id", "band", "dup_hit")
  }

  /** Per-doc verdicts over [[streamingNearDupCandidates]] output (run on
    * the sink / in foreachBatch): a doc is a candidate near-dup iff any
    * band bucket was already taken. */
  def nearDupVerdicts(perBand: DataFrame): DataFrame =
    perBand.groupBy(col("doc_id"))
      .agg(max(col("dup_hit")).as("near_dup_candidate"))

  /** Streaming near-dup candidates AGAINST the static persisted LSH
    * index (r12 VERDICT #2): a crawl stream's first question is not "is
    * this a dup within today's firehose"
    * ([[streamingNearDupCandidates]]' keyed state answers that) but
    * "have I crawled something like this before" — incoming docs are
    * banded with the INDEX'S OWN persisted params (hash family
    * included, so a mismatch is impossible by construction) and
    * stream-static inner-joined with the bucketed `<prefix>_bands`
    * table written by [[graft.operators.Dedup.minhashIndexPersist]].
    * Stateless: no keyed state, no watermark — every micro-batch probes
    * the same static index, so the output is independent of batch
    * boundaries. The static side stays a bucketed scan with no exchange
    * above it in the micro-batch plan (StreamingSpec pins it) — at
    * 100 TB the index is the only touchable representation of history,
    * and the stream side is the one that moves. Emits per-hit rows
    * (doc_id, band, index_id); fold per-doc with
    * [[nearDupIndexVerdicts]] on the sink, then verify survivors'
    * exact Jaccard batch-side (candidates-then-verify, as in the batch
    * path). */
  def streamingNearDupAgainstIndex(docs: DataFrame,
      namePrefix: String): DataFrame = {
    val spark = docs.sparkSession
    val p = graft.operators.Dedup.indexParams(spark, namePrefix)
    val banded = graft.operators.Dedup.bandsFor(
      docs, "text", "doc_id", p.n, p.bands, p.rowsPerBand, p.seed,
      p.family == "portable")
    // ledger snapshot at PLAN time (the index is static for the stream's
    // life by contract): only completed appends are probe-able — a
    // half-appended batch's band rows stay invisible (r14)
    banded.join(graft.operators.Dedup.ledgeredBands(spark, namePrefix),
        Seq("band", "bucket"))
      .select(col("doc_id"), col("band"), col("index_id"))
  }

  /** Per-doc verdicts over [[streamingNearDupAgainstIndex]] hits: how
    * many distinct history docs each stream doc collides with (docs
    * with zero hits emit no rows — the common case on a real crawl). */
  def nearDupIndexVerdicts(hits: DataFrame): DataFrame =
    hits.groupBy(col("doc_id"))
      .agg(countDistinct(col("index_id")).as("index_matches"))

  /** The FULL ingest-time dedup against the persisted index — not just
    * candidates ([[streamingNearDupAgainstIndex]]) but verified pairs:
    * each micro-batch runs the complete batch candidates-then-verify
    * path ([[graft.operators.Dedup.minhashDedupPairsAgainstIndex]] —
    * banding params from the index, bucketed exchange-free history
    * scans, exact-Jaccard verification against the index's shingle
    * store) via foreachBatch, and `sink` receives the verified
    * (new_id, index_id, jaccard) rows plus the batch id (key writes on
    * it — per-batch overwrite — for exactly-once under foreachBatch's
    * at-least-once replay; pass `checkpoint` to make the stream
    * restartable). Stateless across batches by
    * construction — every batch probes the same static index, so
    * output is batch-boundary-independent (the parity gate's oracle is
    * the one-shot batch replay). This is the production daily-crawl
    * recipe: start the stream, and once a day's worth of survivors is
    * accepted, [[graft.operators.Dedup.minhashIndexAppend]] them so
    * tomorrow's stream sees today's docs. Returns the started query. */
  def streamingDedupVerifiedAgainstIndex(docs: DataFrame,
      namePrefix: String, threshold: Double = 0.8,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(graft.operators.Dedup.minhashDedupPairsAgainstIndex(
          batch, "text", "doc_id", namePrefix, threshold = threshold), batchId)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** The EXACT streaming ingest dedup (r14): the lossless twin of
    * [[streamingDedupVerifiedAgainstIndex]] — every micro-batch runs
    * [[graft.operators.Dedup.ppjoinPairsAgainstIndex]] against the
    * persisted PPJoin PREFIX index, so the emitted pairs are the
    * COMPLETE exact-Jaccard cross set with no LSH recall caveat (the
    * recipe for corpora where dedup guarantees are contractual). Same
    * operational contract as the LSH twin: stateless across batches
    * (the index is static for the stream's life; output is
    * batch-boundary-independent), history touched only through
    * exchange-free bucketed scans, `sink` gets (new_id, index_id,
    * jaccard) plus the batch id for per-batch-overwrite exactly-once
    * under foreachBatch replay, `checkpoint` makes it restartable. */
  def streamingExactDedupAgainstIndex(docs: DataFrame,
      namePrefix: String, threshold: Double = 0.8,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(graft.operators.Dedup.ppjoinPairsAgainstIndex(
          batch, "text", "doc_id", namePrefix, threshold = threshold), batchId)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** The COMPLETE self-maintaining crawl loop (r13; replay-idempotent
    * since r14): every micro-batch
    * (1) dedups against the persisted LSH index
    * ([[graft.operators.Dedup.minhashDedupPairsAgainstIndex]] —
    * candidates-then-verify, exchange-free history side),
    * (2) optionally dedups WITHIN the batch (`intraBatch = true`: a doc
    * is dropped when a j ≥ threshold partner with a SMALLER id exists
    * among the batch's index-probe survivors — the greedy min-id rule,
    * non-recursive, so a single crawl containing its own dups is clean
    * without waiting for the next day's probe),
    * (3) hands the SURVIVORS + the ledger batch id to `sink` (the
    * accepted docs), and (4) APPENDS the survivors into the index
    * ([[graft.operators.Dedup.minhashIndexAppend]]) so the NEXT batch
    * sees them. Cross-batch near-dup state lives in the durable
    * bucketed index tables, not in streaming state — unbounded-history
    * dedup with bounded executor state.
    *
    * RESTART SEMANTICS (r14, VERDICT #1): foreachBatch is
    * at-least-once, so every step is built to make a crash-replay
    * bit-exact rather than hoping one never lands mid-batch:
    *  - a replayed batch whose ledger row landed is SKIPPED outright
    *    (sink not re-invoked, nothing re-appended);
    *  - an un-ledgered replay recomputes IDENTICAL survivors, because
    *    the query path only sees ledgered band rows — a half-appended
    *    crash can't make the batch self-match and vanish;
    *  - `sink` receives the ledger batch id and must write keyed on it
    *    (per-batch overwrite) so the re-sink replaces rather than
    *    duplicates;
    *  - the append itself is replay-idempotent (bands → shingles →
    *    ledger, see [[graft.operators.Dedup.minhashIndexAppend]]).
    * op_stream_dedup_selfmaintain_replay gates exactly this: crashes
    * injected after the sink, between the append's table writes, and
    * after the ledger, then restarts from the checkpoint — the final
    * output must equal the no-failure oracle bit-for-bit.
    *
    * Ledger ids are `ledgerBase + streamBatchId` (base 1 keeps them
    * clear of the initial build's batch 0). Stream batch ids are stable
    * across restarts FROM THE SAME CHECKPOINT — that is the supported
    * production shape (pass `checkpoint`). Starting a FRESH checkpoint
    * against an existing index restarts stream ids at 0, so pass a
    * ledgerBase beyond max(ledger) for each new ingest epoch.
    * Run exactly one such stream per index at a time.
    *
    * op_stream_dedup_selfmaintain_parity gates the full cascade over
    * fixed-boundary micro-batches against a stratified exact-Jaccard
    * replay; op_stream_dedup_selfmaintain_intra adds the within-batch
    * stratum. */
  def streamingDedupSelfMaintaining(docs: DataFrame, namePrefix: String,
      threshold: Double = 0.8, intraBatch: Boolean = false,
      ledgerBase: Long = 1L, checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], streamBatchId: Long) =>
        val spark = batch.sparkSession
        val id = ledgerBase + streamBatchId
        if (!graft.operators.Dedup.indexBatchLedgered(spark, namePrefix, id)) {
          val p = graft.operators.Dedup.indexParams(spark, namePrefix)
          batch.persist()
          try {
            val dups = graft.operators.Dedup.minhashDedupPairsAgainstIndex(
                batch, "text", "doc_id", namePrefix, threshold = threshold)
              .select(col("new_id")).distinct()
            val probeKept = batch.join(dups,
              batch("doc_id") === dups("new_id"), "left_anti")
            if (intraBatch) probeKept.persist() // read twice below
            val survivors =
              if (!intraBatch) probeKept
              else {
                // within-batch pairs over the probe survivors, with the
                // index's own banding geometry; pairs come out a < b, so
                // dropping every b is the greedy min-id survivor rule
                val intra = graft.operators.Dedup.minhashDedupPairs(
                    probeKept, "text", "doc_id", n = p.n,
                    threshold = threshold, bands = p.bands,
                    rowsPerBand = p.rowsPerBand)
                  .select(col("doc_b").as("__drop")).distinct()
                probeKept.join(intra,
                  probeKept("doc_id") === intra("__drop"), "left_anti")
              }
            survivors.persist()
            try {
              sink(survivors, id)
              graft.operators.Dedup.minhashIndexAppend(
                survivors, "text", "doc_id", namePrefix, id)
            } finally {
              survivors.unpersist()
              if (intraBatch) probeKept.unpersist()
            }
          } finally batch.unpersist()
        }
        () // foreachBatch wants Unit; the skip branch above yields AnyVal
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** The exactly-once foreachBatch sink recipe as a library function
    * (r14): writes each batch's frame to `<root>/batch=<batchId>` with
    * OVERWRITE, so a crash-replay of the same batch REPLACES its own
    * previous/partial output instead of appending duplicates — the sink
    * half of the replay-idempotence contract
    * ([[streamingDedupSelfMaintaining]],
    * [[streamingDedupVerifiedAgainstIndex]]; the other half is the
    * index ledger). Read the result back with
    * `spark.read.parquet(root)` — the batch=N dirs surface as a
    * partition column; select your payload columns to drop it.
    * `columns` optionally projects before the write (Nil = all). */
  def parquetBatchSink(root: String, columns: Seq[String] = Nil)
      : (DataFrame, Long) => Unit =
    (df, batchId) => {
      val out = if (columns.nonEmpty) df.select(columns.map(col): _*) else df
      out.write.mode("overwrite").parquet(s"$root/batch=$batchId")
    }

  /** Custom keyed state: running per-user event count + last-seen
    * high-water timestamp via flatMapGroupsWithState — the escape hatch for
    * state machines the built-in windows can't express
    * (KeyValueGroupedDataset state API). Emits the high-water `last_seen`
    * per row, so a late batch of older timestamps raises the count but
    * never regresses last_seen. */
  def runningUserCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .selectExpr("user_id", "CAST(ts AS LONG) AS ts_s")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val (prevCount, prevTs) = state.getOption.getOrElse((0L, 0L))
          var count = prevCount
          // seed from the stored last-seen so a batch of older timestamps
          // can't regress the state's high-water mark
          var lastTs = prevTs
          val out = rows.map { case (_, ts) =>
            count += 1
            lastTs = math.max(lastTs, ts)
            (userId, count, lastTs)
          }.toVector
          state.update((count, lastTs))
          out.iterator
      }
      .toDF("user_id", "running_count", "last_seen")
  }

  /** Streaming count-min sketch: the portable-hash cells of
    * [[graft.operators.Sketches]] maintained as a streaming aggregate.
    * State is bounded at depth × width cells BY CONSTRUCTION — a
    * heavy-hitter monitor over an unbounded token firehose with constant
    * memory, and (because the hash family is engine-portable) cells that
    * equal the batch build over the same data, which StreamingSpec
    * asserts. Run in update/complete mode. */
  def streamingCountMin(rows: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 256): DataFrame =
    rows.select(graft.operators.Sketches
        .cmCells(col(valueCol), depth, width).as("__cell"))
      .groupBy(col("__cell.row").as("row"), col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
}
