package graft.learn

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Clean-room isolation forest — the reference's anomaly-detection
  * ensemble (mars/learn/ensemble/_iforest.py, which distributes sklearn's
  * IsolationForest; the algorithm is Liu/Ting/Zhou, "Isolation Forest",
  * ICDM 2008). Defaults mirror the reference: n_estimators=100,
  * max_samples=min(256, n).
  *
  * Scale shape: isolation trees are BY DESIGN grown on tiny subsamples
  * (psi=256 rows each) — the paper's core insight is that small samples
  * isolate anomalies better. Fitting therefore collects one bounded
  * spill of ~3·psi·T candidate rows (≈75k rows at the defaults,
  * independent of data size) drawn in a SINGLE distributed pass via
  * deterministic per-(row, tree) hash draws, and builds the shallow
  * trees driver-side — the same work sklearn does per estimator, never a
  * distributed training loop. Scoring broadcasts the forest (≤ T·2^depth
  * tiny nodes) and is one narrow per-row pass, no shuffle, at any scale.
  *
  * Determinism: subsampling uses [[graft.functions.PortableHash]] draws
  * keyed by (row key, tree index) and tree construction uses a
  * per-tree-seeded PRNG, so the same (data, key, seed) yields the
  * identical forest — and identical scores — on every run and layout.
  */
object IsolationForest {

  sealed trait Node extends Serializable
  final case class Split(feature: Int, threshold: Double,
      left: Node, right: Node) extends Node
  final case class Leaf(size: Int) extends Node

  final case class IForestModel(trees: Vector[Node], sampleSize: Int,
      features: Seq[String]) extends Serializable

  /** Average unsuccessful-search path length c(n) of a BST — the paper's
    * normalizer (Euler–Mascheroni harmonic approximation, as in sklearn). */
  def avgPath(n: Double): Double =
    if (n <= 1.0) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  private def buildTree(rows: Array[Array[Double]], depthLimit: Int,
      rng: scala.util.Random): Node = {
    def grow(idx: Array[Int], depth: Int): Node = {
      if (idx.length <= 1 || depth >= depthLimit) return Leaf(idx.length)
      val nf = rows(0).length
      // features with spread at this node (constant features can't split)
      val usable = (0 until nf).filter { f =>
        var mn = Double.MaxValue; var mx = Double.MinValue
        idx.foreach { i => val v = rows(i)(f); if (v < mn) mn = v; if (v > mx) mx = v }
        mx > mn
      }
      if (usable.isEmpty) return Leaf(idx.length)
      val f = usable(rng.nextInt(usable.length))
      var mn = Double.MaxValue; var mx = Double.MinValue
      idx.foreach { i => val v = rows(i)(f); if (v < mn) mn = v; if (v > mx) mx = v }
      val thr = mn + rng.nextDouble() * (mx - mn)
      val (l, r) = idx.partition(i => rows(i)(f) < thr)
      if (l.isEmpty || r.isEmpty) Leaf(idx.length)
      else Split(f, thr, grow(l, depth + 1), grow(r, depth + 1))
    }
    grow(rows.indices.toArray, 0)
  }

  /** Fit a forest of `numTrees` isolation trees on deterministic
    * hash-drawn subsamples of `sampleSize` rows. `keyCol` must be a
    * nonnegative integral column (the PortableHash contract) providing
    * the per-row draw identity. One count + one bounded collect. */
  def fit(df: DataFrame, featureCols: Seq[String], keyCol: String,
      numTrees: Int = 100, sampleSize: Int = 256, seed: Long = 1L): IForestModel = {
    require(numTrees > 0 && sampleSize > 1)
    // null contract: rows with any null feature are excluded from the
    // subsample draw (they cannot be placed in a split) — scoring gives
    // them a null score; sklearn instead errors on NaN input
    val clean = df.filter(featureCols.map(c => col(c).isNotNull)
      .reduce(_ && _))
    val n = clean.count()
    val psi = math.min(sampleSize.toLong, n).toInt
    // oversample 3x so every tree gets >= psi rows w.h.p.; the draw u is
    // also the deterministic truncation order back to exactly psi
    val p = math.min(1.0, 3.0 * psi / math.max(n, 1L))
    val key = col(keyCol).cast("long")
    val draws = clean
      .select((key * numTrees + lit(seed * 1000003L)).as("__base"),
        array(featureCols.map(c => col(c).cast("double")): _*).as("__fv"))
      .select(col("__base"), col("__fv"), explode(filter(
        sequence(lit(0), lit(numTrees - 1)),
        t => graft.functions.PortableHash.uniform01(col("__base") + t) < lit(p)))
        .as("__t"))
      .select(col("__t"), col("__fv"),
        graft.functions.PortableHash.uniform01(col("__base") + col("__t")).as("__u"))
    val byTree = draws.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .groupBy(_._1)
    val depthLimit = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
    val trees = (0 until numTrees).map { t =>
      val sample = byTree.getOrElse(t, Array.empty)
        .sortBy(_._3).take(psi).map(_._2)
      if (sample.isEmpty) Leaf(0)
      else buildTree(sample, depthLimit, new scala.util.Random(seed ^ (t * 2654435761L)))
    }.toVector
    IForestModel(trees, psi, featureCols)
  }

  private def pathLength(node: Node, fv: Array[Double], depth: Int): Double =
    node match {
      case Leaf(size) => depth + avgPath(size.toDouble)
      case Split(f, thr, l, r) =>
        if (fv(f) < thr) pathLength(l, fv, depth + 1)
        else pathLength(r, fv, depth + 1)
    }

  /** Append the anomaly score s(x) = 2^(−E[h(x)]/c(psi)) ∈ (0, 1) —
    * higher is more anomalous (sklearn's score_samples is the negation).
    * UDF justification: per-row traversal of an irregular broadcast tree
    * ensemble has no builtin/codegen expression form; the closure
    * carries only the ≤ T·psi-node forest. */
  def score(model: IForestModel, df: DataFrame,
      out: String = "anomaly_score"): DataFrame = {
    val trees = model.trees
    val cNorm = avgPath(model.sampleSize.toDouble)
    val scoreUdf = udf { (fv: Seq[Double]) =>
      val a = fv.toArray
      val mean = trees.map(t => pathLength(t, a, 0)).sum / trees.length
      // StrictMath, not math: Catalyst's pow Column codegen calls
      // StrictMath.pow, and the two differ in the last ulp — this keeps
      // the UDF bit-identical to the pathMeanCol replay (LearnSpec)
      java.lang.StrictMath.pow(2.0, -mean / cNorm)
    }
    // null features short-circuit to a null score BEFORE the UDF — a null
    // element inside the array would otherwise NPE opaquely at unboxing
    val anyNull = model.features.map(c => col(c).isNull).reduce(_ || _)
    df.withColumn(out, when(anyNull, lit(null).cast("double")).otherwise(
      scoreUdf(array(model.features.map(c => col(c).cast("double")): _*))))
  }

  // ---------------------------------------------------------------------
  // Pinned-forest replay (r9): tree GROWTH is data-dependent and can never
  // be interpolated into registry-construction-time oracle SQL (CLAUDE.md
  // rule), but SCORING a *pinned literal* forest is deterministic
  // arithmetic both engines replay op-for-op — the same literal-embedding
  // trick as the broadcast bloom filter. The pinned forest lives in
  // [[PinnedForest]] (generated once by [[PinnedForestGen]], committed as
  // source); every leaf's path length depth + c(size) is a compile-time
  // double literal, the per-tree traversal is a nested CASE, and the mean
  // folds the trees left-to-right in tree order, so path_mean is
  // BIT-IDENTICAL on any IEEE engine (gate it unrounded; only the final
  // 2^(−mean/c) score goes through libm pow → round 4).
  // ---------------------------------------------------------------------

  /** Path length depth + c(leafSize) — a constant once the tree is pinned. */
  private def pathConst(depth: Int, size: Int): Double =
    depth + avgPath(size.toDouble)

  private def treeCol(node: Node, feats: Seq[org.apache.spark.sql.Column],
      depth: Int): org.apache.spark.sql.Column = node match {
    case Leaf(n) => lit(pathConst(depth, n))
    case Split(f, thr, l, r) =>
      when(feats(f) < lit(thr), treeCol(l, feats, depth + 1))
        .otherwise(treeCol(r, feats, depth + 1))
  }

  private def treeSql(node: Node, feats: Seq[String], depth: Int): String =
    node match {
      case Leaf(n) => s"CAST('${pathConst(depth, n)}' AS DOUBLE)"
      case Split(f, thr, l, r) =>
        s"(CASE WHEN ${feats(f)} < CAST('$thr' AS DOUBLE) " +
          s"THEN ${treeSql(l, feats, depth + 1)} " +
          s"ELSE ${treeSql(r, feats, depth + 1)} END)"
    }

  /** Mean path length E[h(x)] of a pinned model as a pure Column
    * composition (no UDF): left fold over trees in tree order — the
    * identical IEEE sum [[score]]'s UDF performs, so the two agree
    * bit-exactly (spec-pinned). */
  def pathMeanCol(model: IForestModel,
      feats: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    model.trees.map(t => treeCol(t, feats, 0)).reduceLeft(_ + _) /
      lit(model.trees.length.toDouble)

  /** DuckDB mirror of [[pathMeanCol]]: same nested-CASE traversal, same
    * left-assoc tree-order sum, literals rendered via the round-trip
    * string form — bit-identical on any IEEE engine. */
  def sqlPathMean(model: IForestModel, feats: Seq[String]): String =
    "(" + model.trees.map(t => treeSql(t, feats, 0)).mkString(" + ") +
      s") / CAST('${model.trees.length.toDouble}' AS DOUBLE)"

  /** The score normalizer c(psi) as a literal (for the SQL side). */
  def sqlCNorm(model: IForestModel): String =
    s"CAST('${avgPath(model.sampleSize.toDouble)}' AS DOUBLE)"

  /** sklearn predict: −1 for anomalies (score above the quantile implied
    * by `contamination`), 1 for inliers, via one distributed approx
    * quantile — no sort of the data. */
  def predict(model: IForestModel, df: DataFrame,
      contamination: Double = 0.05): DataFrame = {
    val scored = score(model, df)
    val thr = scored.stat.approxQuantile("anomaly_score",
      Array(1.0 - contamination), 0.001)(0)
    scored.withColumn("prediction",
      when(col("anomaly_score") >= thr, -1).otherwise(1))
  }
}
