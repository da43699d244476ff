package graft.learn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation (reference
  * mars/learn/semi_supervised/_label_propagation.py:31 — the 'propagation'
  * variant: hard-clamped labeled points, row-normalized graph walk until
  * convergence or maxIter).
  *
  * The graph is a first-class EDGE LIST (`src`, `dst`, `w`) — the scalable
  * representation (the reference materializes the dense n×n kernel; at
  * 100 TB only a sparse kNN/epsilon graph is tractable, and the iteration
  * is then one join + one bounded aggregation per round, exactly the
  * connected-components shape). `knnGraphEuclidean` / `rbfGraph` build the
  * reference's two kernels behind the same all-pairs maxRows guard as
  * pdist; at scale you'd feed edges from Similarity's LSH/IVF candidates.
  *
  * Determinism: every per-node sum (row normalization, the propagation
  * dot, the class-mass normalizer) is a sort-then-fold — neighbors
  * collected, sorted on a unique key, folded left-to-right — so the
  * distribution is BIT-deterministic across partitionings and across
  * engines that fold lists in index order (the DuckDB oracle mirrors each
  * fold as `list_sum(list(x ORDER BY key))`). A plain SUM would make every
  * iteration's float error partition-dependent and the fixpoint
  * non-reproducible.
  */
object LabelProp {

  /** Left fold of `v` over an array of (k, v) structs in k order. */
  private[graft] def sortedFoldSum(pairs: Column): Column =
    aggregate(array_sort(pairs), lit(0.0), (acc, s) => acc + s.getField("v"))

  private[graft] def kvList(k: Column, v: Column): Column =
    collect_list(struct(k.as("k"), v.cast("double").as("v")))

  /** The per-key float sum both iteration kernels run: the ordered fold
    * when bit-reproducibility is the contract (oracles, rerun
    * determinism), a plain partial+final SUM in perf mode — same plan
    * shape, no collect_list/array_sort state (r11 VERDICT #6). */
  private def foldSum(k: Column, v: Column, deterministic: Boolean): Column =
    if (deterministic) sortedFoldSum(kvList(k, v)) else sum(v)

  /** Row-normalize an edge list to a stochastic matrix: w / Σ_dst w per
    * src, the fold in dst order. */
  def normalizeEdges(edges: DataFrame,
      deterministic: Boolean = true): DataFrame = {
    val sums = edges.groupBy(col("src"))
      .agg(foldSum(col("dst"), col("w"), deterministic).as("ws"))
    edges.join(sums, "src")
      .select(col("src"), col("dst"), (col("w").cast("double") / col("ws")).as("w"))
  }

  /** Fit: `edges` = (src, dst, w) directed affinity (pass both directions
    * for a symmetric kernel); `labels` = (id, label) with label = -1 for
    * unlabeled (the reference's marker). Returns the label distribution in
    * long form (id, cls, p) after `maxIter` rounds (or earlier if the L1
    * change drops below `tol` — tol = 0 disables the per-round driver
    * check and runs a fully plan-deterministic maxIter rounds).
    *
    * Per round: one shuffle join (edges × dist on dst) + two bounded
    * aggregations (≤ degree and ≤ #classes rows of state per key), then a
    * localCheckpoint to truncate lineage — the reference executes each
    * round too (_label_propagation.py:228). Labeled rows are hard-clamped
    * back each round (propagation variant). `deterministic = false` is
    * the production perf mode: plain SUMs instead of ordered folds —
    * distributions equal within float-reassociation noise, not
    * bit-replayable (keep true for anything a gate compares). */
  def fitEdges(edges: DataFrame, labels: DataFrame,
      maxIter: Int = 30, tol: Double = 1e-3,
      deterministic: Boolean = true): DataFrame = {
    val g = normalizeEdges(edges, deterministic).cache()
    val yStatic = labels.filter(col("label") >= 0)
      .select(col("id"), col("label").as("cls"), lit(1.0).cast("double").as("p"))
    // any negative marker counts as unlabeled (the reference only ever
    // writes -1, but a stray -9 silently vanishing from BOTH sets would
    // be a row lost with no error)
    val unlabeled = labels.filter(col("label") < 0).select(col("id")).cache()

    var dist = yStatic
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val joined = g.join(dist.select(col("id").as("dst"), col("cls"), col("p")), "dst")
      val prop = joined
        .select(col("src").as("id"), col("cls"), col("dst"), (col("w") * col("p")).as("wp"))
        .groupBy(col("id"), col("cls"))
        .agg(foldSum(col("dst"), col("wp"), deterministic).as("p"))
      val rowsum = prop.groupBy(col("id"))
        .agg(foldSum(col("cls"), col("p"), deterministic).as("rs"))
      val norm = prop.join(rowsum, "id")
        .select(col("id"), col("cls"),
          when(col("rs") === 0.0, lit(0.0)).otherwise(col("p") / col("rs")).as("p"))
      val next = yStatic.unionByName(norm.join(unlabeled, "id")
        .select(col("id"), col("cls"), col("p")))
        .localCheckpoint()
      if (tol > 0) {
        // reference cond: Σ |d_t − d_{t−1}| < tol, fetched per round. The
        // delta only gates early exit (never feeds output values), so a
        // plain sum is fine here.
        val delta = next.select(col("id"), col("cls"), col("p").as("pn"))
          .join(dist.select(col("id"), col("cls"), col("p").as("po")), Seq("id", "cls"), "full_outer")
          .agg(sum(abs(coalesce(col("pn"), lit(0.0)) - coalesce(col("po"), lit(0.0)))))
          .head().getDouble(0)
        converged = delta < tol
      }
      dist = next
      it += 1
    }
    dist
  }

  /** Transduction: argmax class per node (ties → smallest class, a
    * deterministic total order because the distribution itself is
    * bit-deterministic). Nodes the mass never reached fall back to the
    * smallest class — sklearn's argmax-of-zeros convention. */
  def transduction(dist: DataFrame, labels: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("p").desc, col("cls"))
    val top = dist.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("id"), col("cls").as("pred"))
    val minCls = labels.filter(col("label") >= 0)
      .agg(min(col("label")).as("cls0"))
    labels.select(col("id"))
      .join(top, Seq("id"), "left")
      .crossJoin(broadcast(minCls))
      .select(col("id"), coalesce(col("pred"), col("cls0")).as("pred"))
  }

  /** kNN connectivity kernel (reference kernel='knn', connectivity mode:
    * weight 1 per neighbor) over an (id, vec) frame — all-pairs by
    * contract, so guarded like pdist. Ranking keys are the deterministic
    * sqeuclidean folds, so the neighbor set is engine-reproducible. */
  def knnGraphEuclidean(x: DataFrame, idCol: String, vecCol: String,
      k: Int, maxRows: Int = 20000): DataFrame = {
    val n = x.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"knnGraphEuclidean is exact all-pairs (O(n²)): > $maxRows rows. " +
        "Feed fitEdges from Similarity LSH/IVF candidates at scale.")
    val a = x.select(col(idCol).as("src"), col(vecCol).as("avec"))
    val b = x.select(col(idCol).as("dst"), col(vecCol).as("bvec"))
    val scored = a.join(broadcast(b), col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        Distance.metricExpr("sqeuclidean")(col("avec"), col("bvec")).as("d2"))
    val w = Window.partitionBy(col("src")).orderBy(col("d2"), col("dst"))
    scored.withColumn("r", row_number().over(w)).filter(col("r") <= k)
      .select(col("src"), col("dst"), lit(1.0).as("w"))
  }

  /** RBF kernel exp(−gamma·d²) (reference kernel='rbf', gamma default 20)
    * — the dense kernel, same guard. */
  def rbfGraph(x: DataFrame, idCol: String, vecCol: String,
      gamma: Double = 20.0, maxRows: Int = 20000): DataFrame = {
    val n = x.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"rbfGraph is the dense n×n kernel (O(n²)): > $maxRows rows. " +
        "Feed fitEdges a sparse graph at scale.")
    val a = x.select(col(idCol).as("src"), col(vecCol).as("avec"))
    val b = x.select(col(idCol).as("dst"), col(vecCol).as("bvec"))
    a.join(broadcast(b), col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        exp(lit(-gamma) * Distance.metricExpr("sqeuclidean")(col("avec"), col("bvec")))
          .as("w"))
  }
}
