package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-dup pair
  * list, the step that turns pairwise MinHash/SimHash/Jaccard output into
  * "keep one document per cluster" (the reference stops at pairwise
  * duplicated/drop_duplicates — base/_duplicate.py — but a curation
  * pipeline needs transitive closure: A≈B, B≈C must collapse to one
  * cluster even when A≉C).
  *
  * Algorithm: iterative min-label propagation — every node starts labeled
  * with itself; each round every node takes the min of its own and its
  * neighbors' labels; converges in O(graph diameter) rounds. Dup clusters
  * are near-cliques (diameter ≤ ~3), so 3–4 rounds typical.
  *
  * Scale shape: each round is one shuffle hash-join (edges ⋈ labels, both
  * keyed by node) + a partial/final min aggregate. `localCheckpoint`
  * truncates the growing lineage each round — at cluster scale swap in
  * `checkpoint()` against reliable storage. Edge count, not corpus size,
  * drives the cost: only documents that appear in some pair participate.
  */
object Components {

  /** (aCol, bCol) undirected pair list → (node, cluster) where cluster is
    * the smallest member id of the component. */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 25): DataFrame = {
    val e0 = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val neighborLabels = edges
        .join(labels.select(col("node").as("b"), col("label")), Seq("b"))
        .select(col("a").as("node"), col("label"))
      val next = labels.union(neighborLabels)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("node"), col("label").as("prev")), Seq("node"))
        .filter(col("label") < col("prev")).count()
      labels = next
      i += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIters rounds — " +
        "raise maxIters (diameter exceeds the bound)")
    labels.select(col("node"), col("label").as("cluster"))
  }

  /** Connected components by two-phase star contraction (the public
    * large-star / small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond" — the standard at-scale
    * replacement for min-label propagation): converges in O(log n)
    * rounds REGARDLESS of graph diameter, where [[connectedComponents]]
    * needs O(diameter) rounds. Dup clusters are near-cliques (diameter
    * ≤ ~3) so min-label wins there; this is the right engine for
    * long-chain graphs — URL redirect chains, session stitching,
    * citation paths — where the diameter is O(n).
    *
    *   large-star(u): every neighbor v > u re-attaches to
    *     m(u) = min(Γ(u) ∪ u);
    *   small-star(u): every neighbor v ≤ u (plus u) attaches to m(u).
    *
    * Both phases are one groupBy(min) + one self-join of the edge list —
    * the same shuffle shape as a min-label round — and the edge count
    * never grows. Convergence = edge multiset unchanged, checked by a
    * (count, Σu, Σv, Σxxhash64) signature (one tiny aggregate per
    * round); monotone convergence is the paper's theorem, the signature
    * only detects it. Returns (node, cluster) with cluster = smallest
    * member id — identical output contract to [[connectedComponents]]
    * (spec-pinned equal on random graphs; ext_cc_star gates it against
    * the same recursive-CTE oracle). */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 40): DataFrame = {
    val raw = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
    val allNodes = raw.select(col("u").as("node"))
      .union(raw.select(col("v").as("node"))).distinct().localCheckpoint()
    var edges = raw.filter(col("u") =!= col("v")).distinct().localCheckpoint()

    // DECIMAL(38) sums: exact and overflow-free under ANSI mode (a
    // BIGINT sum of 64-bit hashes overflows)
    def signature(e: DataFrame): Seq[Any] = {
      val d = org.apache.spark.sql.types.DecimalType(38, 0)
      e.agg(count(lit(1)), sum(col("u").cast(d)), sum(col("v").cast(d)),
        sum(xxhash64(col("u"), col("v")).cast(d))).head().toSeq
    }

    // one phase: directed = edge list oriented so the GROUPING side is
    // `u`. large-star (keepLarger) re-attaches only the strictly larger
    // neighbors to m(u) = min(Γ(u) ∪ u); small-star re-attaches every
    // (smaller) neighbor AND u itself. Self-loops and duplicates drop;
    // output is canonically (larger, smaller).
    def phase(directed: DataFrame, keepLarger: Boolean): DataFrame = {
      val mins = directed.groupBy("u")
        .agg(least(col("u"), min(col("v"))).as("m"))
      val kept =
        if (keepLarger) directed.filter(col("v") > col("u"))
        else directed
      val reattached = kept.join(mins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val withSelf =
        if (keepLarger) reattached
        else reattached.union(mins.select(col("u"), col("m").as("v")))
      withSelf
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
    }

    var sig: Seq[Any] = signature(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // large-star groups on BOTH orientations (Γ(u) is the full
      // neighborhood); small-star groups on the larger endpoint only
      val bothWays = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val afterLarge = phase(bothWays, keepLarger = true)
      val afterSmall = phase(afterLarge, keepLarger = false).localCheckpoint()
      val nextSig = signature(afterSmall)
      converged = nextSig == sig
      sig = nextSig
      edges = afterSmall
      i += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIters rounds — " +
        "raise maxIters (expected rounds ~ log2 of the largest component)")
    // at the fixpoint every edge is (member, component-min); members not
    // on the left are the representatives (and self-loop-only nodes)
    allNodes.join(edges.select(col("u").as("node"), col("v").as("cluster")),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("cluster"), col("node")).as("cluster"))
  }

  /** Keep the BEST document per duplicate cluster by an explicit score
    * (quality-aware representative selection — pipelines keep the
    * highest-quality member, not the lowest id; ties break to the smallest
    * id deterministically). Same component resolution; the winner per
    * cluster is one max-of-struct aggregate over only the clustered docs,
    * then everyone else in a cluster is anti-joined away. */
  def dedupByClusterBest(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      scoreCol: String,
      aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val members = connectedComponents(pairs, aCol, bCol)
      .select(col("node").as(idCol), col("cluster"))
    val scored = docs.select(col(idCol), col(scoreCol)).join(members, Seq(idCol))
    // max over (score, -id): highest score wins, ties -> smallest id
    val winners = scored.groupBy(col("cluster"))
      .agg(max(struct(col(scoreCol), (-col(idCol)).as("negid")))
        .getField("negid").as("__negid"))
      .select((-col("__negid")).as(idCol))
    val losers = members.select(col(idCol))
      .join(winners, Seq(idCol), "left_anti")
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep one document per duplicate cluster: resolves `pairs` to
    * components and drops every member except the smallest id (the cluster
    * representative). Documents in no pair pass through untouched — the
    * anti-join runs against only the non-representative members, a set no
    * bigger than the pair list. */
  def dedupByCluster(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val drop = connectedComponents(pairs, aCol, bCol)
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Weighted k-step walk-count centrality over a directed edge list —
    * the exact-integer cousin of Katz/PageRank used to rank graph nodes
    * (link-graph harvest scoring in a crawl-curation pipeline, hub event
    * types in a journey graph): walks_s(v) = number of weighted length-s
    * walks ending at v, i.e. (1ᵀ·Wˢ) computed column by column:
    *
    *   walks_1(v) = Σ_{u→v} w(u,v),
    *   walks_{s+1}(v) = Σ_{u→v} walks_s(u) · w(u,v).
    *
    * Returns (node, walks_1 .. walks_<steps>), one row per node with ≥ 1
    * inbound walk of some length; absent lengths fill with 0. All-BIGINT
    * arithmetic — exact, engine-independent.
    *
    * Scale shape: each step is ONE hash join of the edge list against the
    * PRE-AGGREGATED frontier (|nodes| rows, not |walks| — the frontier
    * collapses to one row per node before every join) plus one
    * partial/final sum. `steps` self-joins total, no transitive recursion,
    * no driver iteration over data. Weighted walk counts grow ~|W|ˢ, so
    * callers keep `steps` small (≤ 6 enforced) long before BIGINT range
    * matters at sane edge weights. */
  def pathCentrality(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 6, s"steps must be in [1, 6]: $steps")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
    val frontiers = Iterator.iterate(
      e.groupBy(col("__dst").as("node")).agg(sum("__w").as("walks"))) { f =>
        e.join(f.select(col("node").as("__src"), col("walks")), Seq("__src"))
          .groupBy(col("__dst").as("node"))
          .agg(sum(col("__w") * col("walks")).as("walks"))
      }.take(steps).toVector
    frontiers.zipWithIndex
      .map { case (f, i) => f.select(col("node"), col("walks").as(s"walks_${i + 1}")) }
      .reduce((a, b) => a.join(b, Seq("node"), "full_outer"))
      .na.fill(0L)
  }

  /** PageRank over a weighted directed edge list — the canonical
    * harvest-ranking signal for web-corpus curation (rank domains/hosts
    * by link authority before sampling; the float cousin of
    * [[pathCentrality]]'s exact-integer walk counts).
    *
    * rank′(v) = (1−d)/N + d·Σ_{(u,v)∈E} w(u,v)/outw(u)·rank(u), a fixed
    * `iters` rounds from the uniform start. Dangling nodes (no
    * out-edges) get a SELF-LOOP first — the stochastic completion that
    * keeps the iteration local (the alternative global dangling-mass
    * term would need a cross-partition float sum, which is exactly what
    * this operator avoids).
    *
    * Determinism (LabelProp's recipe): with `deterministic = true` (the
    * default and the oracle contract) the out-weight normalizer and the
    * per-node contribution sum are sort-then-folds — collected, sorted
    * on the neighbor id, folded left-to-right — so ranks are
    * BIT-deterministic across partitionings and across engines (DuckDB
    * mirrors each fold as `list_sum(list(x ORDER BY key))`).
    * `deterministic = false` is the production perf mode: plain SUM
    * aggregation (partial+final map-side combine, no per-node
    * collect_list/array_sort state) — same plan shape otherwise, ranks
    * equal within float-reassociation noise; use it when ranks feed a
    * threshold/sampler rather than a replayable gate (r11 VERDICT #6;
    * ScaleBench's pagerank_fast cell measures the delta). Per round:
    * one shuffle join + one bounded aggregation (state ≤ in-degree per
    * node) — the connected-components scale shape; `localCheckpoint`
    * truncates lineage each round (swap `checkpoint()` at cluster
    * scale). */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int = 5, damping: Double = 0.85,
      deterministic: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50]: $iters")
    import graft.learn.LabelProp.{kvList, sortedFoldSum}
    def foldSum(k: Column, v: Column): Column =
      if (deterministic) sortedFoldSum(kvList(k, v)) else sum(v)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("double").as("w"))
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    val dangling = nodes.join(e0.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .select(col("node").as("src"), col("node").as("dst"),
        lit(1.0).cast("double").as("w"))
    val outw = e0.union(dangling).groupBy(col("src"))
      .agg(foldSum(col("dst"), col("w")).as("ow"))
    val g = e0.union(dangling).join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p")).cache()
    val base = lit((1.0 - damping) / n)
    var rank = nodes.select(col("node"), lit(1.0 / n).cast("double").as("r"))
    for (_ <- 1 to iters) {
      val contrib = g
        .join(rank.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"), col("src"), (col("p") * col("r")).as("c"))
        .groupBy(col("dst"))
        .agg(foldSum(col("src"), col("c")).as("cs"))
      rank = nodes
        .join(contrib.select(col("dst").as("node"), col("cs")),
          Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("cs"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    rank
  }
}
