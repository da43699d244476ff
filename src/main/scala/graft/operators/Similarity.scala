package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Reference surface: KNN via KDTree/BallTree/Faiss/Proxima
  * (mars/learn/neighbors/, mars/opcodes.py:2230-2239) and pairwise
  * distances + top-k (mars/learn/metrics/pairwise/).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the full corpus; scales linearly in corpus size, embarrassingly
  *    parallel, no shuffle of the corpus. The right baseline whenever
  *    |queries| is modest.
  *  - [[lshTopK]]: approximate — random-hyperplane bucketing; only vectors
  *    sharing a bucket with the query are scored. At 100 TB this turns a
  *    full scan per query batch into a bucket-join; recall is tunable via
  *    signature bits / probe count.
  */
object Similarity {

  /** Cosine column: the native codegen'd expression when the session has
    * [[graft.plans.GraftExtensions]] registered, else the bit-identical
    * HOF fold. */
  private def cosineCol(df: DataFrame, a: Column, b: Column): Column =
    if (df.sparkSession.catalog.functionExists("graft_cosine"))
      call_function("graft_cosine", a, b)
    else cosine(a, b)

  /** Exact top-k cosine neighbors for every query vector.
    * Ranking uses (round(cosine, 4) DESC, corpus id ASC) so results are
    * deterministic and reproducible across engines regardless of float
    * summation noise below 1e-4. */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(cosineCol(corpus, col("qvec"), col("cvec")), 4))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** Approximate top-k via random-hyperplane LSH: bucket corpus and queries
    * by sign-bit signature, score only same-bucket pairs.
    *
    * `nProbe` adds multi-probe: each query additionally probes the buckets
    * at Hamming distance 1 on its first nProbe signature bits — the
    * standard recall boost (probing 1+nProbe buckets) without lowering
    * nBits and inflating every bucket. Probe buckets are generated on the
    * (small, broadcast) query side only; the corpus is still bucketed
    * exactly once. */
  def lshTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      dim: Int,
      k: Int,
      nBits: Int = 8,
      seed: Long = 42L,
      nProbe: Int = 0): DataFrame = {
    require(nProbe >= 0 && nProbe <= nBits, s"nProbe=$nProbe out of range")
    val qSig = queries.withColumn("sig", hyperplaneSignature(col("qvec"), dim, nBits, seed))
    // probe set: the exact bucket + the nProbe single-bit flips
    val flips = (0 until nProbe).map { b =>
      val flipped = concat(
        substring(col("sig"), 1, b),
        when(substring(col("sig"), b + 1, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(col("sig"), b + 2, nBits - b - 1))
      flipped
    }
    val qb = qSig.withColumn("bucket", explode(array((col("sig") +: flips): _*)))
      .select(col("qid"), col("qvec"), col("bucket"))
    val cb = corpus.withColumn("bucket", hyperplaneSignature(col("cvec"), dim, nBits, seed))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(cosineCol(corpus, col("qvec"), col("cvec")), 4))
      .select(col("qid"), col("cid"), col("sim")).distinct()
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** Embedding near-dup pairs at scale: bucket the corpus by
    * random-hyperplane signature, generate pairs only within buckets, and
    * verify each candidate with the exact cosine — the same
    * candidates-then-verify shape as [[Dedup.minhashDedupPairs]]. One
    * shuffle on the bucket key instead of an O(n²) crossJoin; recall is
    * governed by the S-curve of `nBits` sign bits (identical/near-identical
    * vectors collide with probability → 1). */
  def nearDupPairsLsh(
      corpus: DataFrame, // (cid, cvec)
      dim: Int,
      threshold: Double,
      nBits: Int = 16,
      seed: Long = 42L): DataFrame = {
    val bucketed = corpus.withColumn("bucket",
      hyperplaneSignature(col("cvec"), dim, nBits, seed))
    val a = bucketed.select(col("bucket"), col("cid").as("id_a"), col("cvec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("cid").as("id_b"), col("cvec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosineCol(corpus, col("vec_a"), col("vec_b")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** IVF (inverted-file) approximate top-k: the classic vector-search scale
    * path. KMeans partitions the corpus into `nlist` cells; each query
    * scores only the cells of its `nprobe` nearest centroids — a
    * 1/(nlist/nprobe) fraction of the corpus per query instead of a full
    * scan, with recall controlled by nprobe.
    *
    * Plan shape: corpus→cell assignment is one KMeans transform (narrow);
    * query→probe-cells is a broadcast of the (tiny) centroid table; the
    * probe join shuffles on the cell id. At 100 TB the corpus never
    * broadcasts and never self-joins. */
  /** Fitted IVF index: the (tiny) centroid table and the corpus with its
    * cell assignment. Build once offline ([[ivfFit]]), probe many times
    * ([[ivfProbe]]) — at 100 TB the index build dwarfs any single query
    * batch, so refitting per call (the r2 shape) is the wrong plan. Callers
    * with many query batches should `.persist()` (or write out) `assigned`.
    */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame, nlist: Int)

  /** Build the IVF index: KMeans cells over the corpus + per-row cell
    * assignment (one KMeans fit + one narrow transform). */
  def ivfFit(
      corpus: DataFrame, // (cid, cvec)
      nlist: Int = 64,
      seed: Long = 42L): IvfIndex = {
    val spark = corpus.sparkSession
    val model = graft.learn.Learn.kmeansFit(corpus, "cvec", nlist, seed)
    val assigned = graft.learn.Learn.kmeansPredict(model, corpus, "cvec")
    val centroids = spark.createDataFrame(
      model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat).toSeq)
      }).toDF("cluster", "centvec")
    IvfIndex(centroids, assigned, nlist)
  }

  /** Probe a fitted index: each query scores only the cells of its `nprobe`
    * nearest centroids — a nprobe/nlist fraction of the corpus per query
    * instead of a full scan. The centroid table broadcasts; the probe join
    * shuffles on the cell id; the corpus never broadcasts or self-joins. */
  def ivfProbe(
      index: IvfIndex,
      queries: DataFrame, // (qid, qvec)
      k: Int,
      nprobe: Int = 8): DataFrame = {
    require(nprobe >= 1 && nprobe <= index.nlist, s"nprobe=$nprobe out of range")
    val wProbe = Window.partitionBy("qid").orderBy(col("cdist"), col("cluster"))
    val probes = queries.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", euclidean(col("qvec"), col("centvec")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cluster"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    index.assigned.join(probes, Seq("cluster"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(cosineCol(index.assigned, col("qvec"), col("cvec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** One-shot fit + probe (kept for parity with [[lshTopK]]'s signature;
    * production callers split [[ivfFit]] from [[ivfProbe]]). */
  def ivfTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      nlist: Int = 64,
      nprobe: Int = 8,
      seed: Long = 42L): DataFrame =
    ivfProbe(ivfFit(corpus, nlist, seed), queries, k, nprobe)

  /** Product-quantization index (the FAISS IVF-PQ compression idea,
    * re-expressed Spark-first): each vector is split into `m` subvectors;
    * per subspace a small KMeans codebook of `kCodes` centroids is fitted,
    * and the corpus is stored as `m` small ints per vector — a
    * dim·4-bytes → m-bytes compression (64-dim float → 8 codes = 32×).
    * The codebooks are tiny driver-side state (m·kCodes·dim/m floats);
    * the encoded corpus is a DataFrame that persists and serves many
    * query batches, like [[IvfIndex]]. */
  final case class PqIndex(
      codebooks: Seq[Seq[Seq[Float]]], // [subspace][code][subdim]
      encoded: DataFrame, // (cid, codes array<int>)
      m: Int, kCodes: Int, dim: Int)

  /** Fit PQ codebooks and encode the corpus: `m` subspace KMeans fits
    * (each over a narrow slice projection — no shuffle beyond MLlib's
    * aggregation) and one chained transform assigning all `m` codes. */
  def pqFit(
      corpus: DataFrame, // (cid, cvec)
      dim: Int,
      m: Int = 8,
      kCodes: Int = 16,
      seed: Long = 42L): PqIndex = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val d = dim / m
    // r17 optimization round (guide §2.6 — overlap independent jobs): the
    // m subspace fits are independent k-means trainings whose iteration
    // jobs leave most cores idle at their stage tails; submitting them
    // from a small driver pool backfills those tails. Each fit's data,
    // partitioning, and seed are unchanged, so every model is
    // bit-identical to the sequential form. 3-4 in flight is the guide's
    // sweet spot — enough overlap, no executor thrash.
    // r18 (ADVICE r17): daemon threads + a bounded await + shutdownNow so
    // a wedged or failed subspace fit can neither hang the caller forever
    // nor leak running jobs on non-daemon threads after a sibling failure.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(m, 4),
      (r: Runnable) => {
        val th = new Thread(r, "graft-pq-fit")
        th.setDaemon(true)
        th
      })
    val models =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val futures = (0 until m).map { s =>
          scala.concurrent.Future {
            val sub = corpus.select(slice(col("cvec"), s * d + 1, d).as("subvec"))
            graft.learn.Learn.kmeansFit(sub, "subvec", kCodes, seed + s)
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration(30, "min"))
      } catch {
        case scala.util.control.NonFatal(e) =>
          pool.shutdownNow()
          throw e
      } finally pool.shutdown()
    val codebooks = models.map(_.clusterCenters.toSeq.map(
      _.toArray.map(_.toFloat).toSeq))
    // encode: per subspace the argmin-distance code, via the fitted models'
    // transform chain (narrow — no shuffle)
    val encoded0 = models.zipWithIndex.foldLeft(corpus) { case (df, (model, s)) =>
      model.setPredictionCol(s"__code_$s")
        .transform(df.withColumn("__features",
          org.apache.spark.ml.functions.array_to_vector(
            slice(col("cvec"), s * d + 1, d))))
        .drop("__features")
    }
    val encoded = encoded0
      .select(col("cid"),
        array((0 until m).map(s => col(s"__code_$s")): _*).as("codes"))
    PqIndex(codebooks, encoded, m, kCodes, dim)
  }

  /** Asymmetric-distance (ADC) top-k over a PQ index: the approximate
    * squared L2 distance Σ_s ‖q_s − codebook[s][code_s]‖² is computed
    * against the RAW query and the corpus CODES only — the corpus floats
    * are never touched after encoding. The codebooks travel as one nested
    * array literal (plan size m·kCodes·dim/m floats, independent of corpus
    * size); queries broadcast; the scan reads m ints per corpus row.
    *
    * Guarantee used by the specs: for a query with an identical twin in
    * the corpus, the twin's codes minimize every subspace term (they ARE
    * the per-subspace argmin), so the twin's ADC distance is globally
    * minimal — ties only with same-code vectors, broken by cid. */
  def pqProbe(
      index: PqIndex,
      queries: DataFrame, // (qid, qvec)
      k: Int): DataFrame = {
    val d = index.dim / index.m
    val cb = typedlit(index.codebooks)
    def l2sq(a: Column, b: Column): Column =
      aggregate(
        zip_with(a, b, (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }),
        lit(0.0), (acc, v) => acc + v)
    val dist = aggregate(
      sequence(lit(0), lit(index.m - 1)),
      lit(0.0),
      (acc, s) => acc + l2sq(
        slice(col("qvec"), s * d + 1, lit(d)),
        element_at(element_at(cb, s + 1), element_at(col("codes"), s + 1) + 1)))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("cid"))
    index.encoded.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .withColumn("dist", round(dist, 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("dist"), col("rank"))
  }

  /** Exact all-pairs variant — O(n²); only for small corpora or as the
    * recall baseline in tests. Use [[nearDupPairsLsh]] at scale. */
  def nearDupPairsExact(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("cid").as("id_a"), col("cvec").as("vec_a"))
    val b = corpus.select(col("cid").as("id_b"), col("cvec").as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosineCol(corpus, col("vec_a"), col("vec_b")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** sklearn kneighbors_graph (reference mars/learn/neighbors/
    * _kneighbors_graph.py): the corpus's own kNN adjacency in COO form —
    * (row, col, weight) with weight 1.0 (mode "connectivity") or the
    * cosine distance 1 − sim (mode "distance"); self excluded (sklearn's
    * include_self=False default).
    *
    * `exact=true` runs the guarded brute baseline (the corpus broadcasts
    * as its own query set — small corpora / oracle replay only). The
    * default rides the IVF index: cell assignment is one KMeans
    * transform, the probe join shuffles on the cell id, and the corpus
    * never broadcasts or self-joins — the 100 TB path, with recall
    * controlled by nprobe like [[ivfProbe]]. */
  def kneighborsGraph(corpus: DataFrame, k: Int,
      mode: String = "connectivity", exact: Boolean = false,
      nlist: Int = 64, nprobe: Int = 8, seed: Long = 42L): DataFrame = {
    val queries = corpus.select(col("cid").as("qid"), col("cvec").as("qvec"))
    val topk =
      if (exact) bruteForceTopK(queries, corpus, k)
      else ivfProbe(ivfFit(corpus, nlist, seed), queries, k, nprobe)
    val weight = mode match {
      case "connectivity" => lit(1.0)
      case "distance" => lit(1.0) - col("sim")
      case o => throw new IllegalArgumentException(
        s"kneighborsGraph: mode must be connectivity|distance: $o")
    }
    topk.select(col("qid").as("row"), col("cid").as("col"),
      weight.as("weight"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication (cluster-then-pairwise, the
    * embedding analog of the reference's duplicated()/drop_duplicates
    * surface for *semantic* rather than lexical duplicates): partition the
    * corpus into `k` cells, and inside each cell mark every vector whose
    * cosine to a LOWER-id cell member reaches `tau` as a duplicate — one
    * representative survives per duplicate star. Cells bound the
    * quadratic: pairs never cross a cell boundary, so worst-case work is
    * Σ|cell|² not |corpus|², with `k` the scale valve (exactly the
    * published SemDeDup design, which runs KMeans first for this reason).
    *
    * Determinism — and the DuckDB differential oracle — demands a fixed
    * clustering, so cells come from deterministic PIVOTS rather than a
    * seeded KMeans fit: the `k` corpus vectors with the smallest
    * (PortableHash(cid), cid) are the pivots (an arbitrary-but-reproducible
    * sample that any engine recomputes bit-identically), and every vector
    * joins its highest-cosine pivot (round-4 sims; ties to the lower pivot
    * id). Identical vectors always share a cell, so exact twins can never
    * escape comparison.
    *
    * Plan shape: pivot selection is a distributed TakeOrdered of k rows;
    * assignment broadcasts the k pivot vectors against the corpus (narrow,
    * no corpus shuffle) + one partial/final argmax aggregate keyed by cid;
    * the pair phase is one self-join shuffled on the cell id. Returns
    * (cid, cluster, keep) for every corpus row.
    */
  def semanticDedup(
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      tau: Double): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1]: $tau")
    val pivots = corpus
      .select(col("cid").as("pid"), col("cvec").as("pvec"),
        graft.functions.PortableHash.hash32(col("cid")).as("__h"))
      .orderBy(col("__h"), col("pid"))
      .limit(k)
      .drop("__h")
    // argmax over (sim, -pid): best pivot wins, ties to the smallest pid;
    // struct-max aggregates partially (no window over the scored rows)
    val assigned = corpus.crossJoin(broadcast(pivots))
      .withColumn("__psim", round(cosineCol(corpus, col("cvec"), col("pvec")), 4))
      .groupBy(col("cid"))
      .agg(
        max(struct(col("__psim"), (-col("pid")).as("negpid")))
          .getField("negpid").as("__negpid"),
        first(col("cvec")).as("cvec")) // constant within the group
      .select(col("cid"), (-col("__negpid")).as("cluster"), col("cvec"))
    val a = assigned.select(col("cluster"), col("cid").as("id_a"), col("cvec").as("vec_a"))
    val b = assigned.select(col("cluster"), col("cid").as("id_b"), col("cvec").as("vec_b"))
    val dupOf = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosineCol(corpus, col("vec_a"), col("vec_b")), 4) >= tau)
      .select(col("id_b").as("cid"))
      .distinct()
    assigned
      .join(dupOf.withColumn("__dup", lit(true)), Seq("cid"), "left")
      .select(col("cid"), col("cluster"), col("__dup").isNull.as("keep"))
  }

  /** SEMANTIC benchmark decontamination (r10) — the embedding analog of
    * [[graft.operators.Curation.decontaminate]]'s n-gram overlap filter:
    * a corpus vector is contaminated when its max cosine against ANY
    * benchmark vector reaches `threshold` (paraphrased or re-templated
    * eval items that share no 13-gram still sit next to the benchmark in
    * embedding space). The benchmark set is small by nature, so it
    * BROADCASTS; the corpus streams through a BroadcastNestedLoop scan +
    * one partial/final max aggregate keyed by cid — the corpus never
    * shuffles bodies, only (cid, partial-max) pairs, and no corpus
    * self-join exists at any scale. Per-pair sims are round-4 BEFORE the
    * max (order-free, engine-exact — same convention as
    * [[nearDupPairsExact]]); thresholds must keep the documented ~1e-4
    * gap from data sims. Returns (cid, max_sim, contaminated). */
  def semanticDecontaminate(
      corpus: DataFrame, // (cid, cvec)
      bench: DataFrame, // (bvec)
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]: $threshold")
    corpus.crossJoin(broadcast(bench.select(col("bvec"))))
      .withColumn("__bsim", round(cosineCol(corpus, col("cvec"), col("bvec")), 4))
      .groupBy(col("cid"))
      .agg(max(col("__bsim")).as("max_sim"))
      .select(col("cid"), (col("max_sim") + lit(0.0)).as("max_sim"),
        (col("max_sim") >= threshold).as("contaminated"))
  }
}
