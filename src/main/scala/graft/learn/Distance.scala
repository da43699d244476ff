package graft.learn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial distance matrices: `scipy.spatial.distance` cdist / pdist /
  * squareform with the scipy metric family (reference
  * mars/tensor/spatial/distance/cdist.py:211, pdist.py, squareform.py).
  *
  * Every metric is a pure codegen expression over two `array<float>`
  * columns — a `zip_with` elementwise kernel folded by `aggregate` in
  * left-to-right order, double precision throughout. That makes each
  * distance a deterministic per-row computation (bit-reproducible across
  * partitionings, and across engines that fold lists in index order —
  * which the DuckDB oracle does via `list_sum(list_transform(...))`).
  *
  * Scale shape: `cdist` broadcasts the (small) B side and streams the A
  * side at scan speed — zero shuffles, linear in |A|·|B| like the
  * reference's blocked outer product. `pdist` is inherently all-pairs
  * O(n²) (scipy's contract); it carries the same hard `maxRows` guard as
  * `silhouetteByCluster` so nobody plans a 100 TB cartesian by accident —
  * the scalable pairwise paths (LSH / IVF / banded near-dup) live in
  * `graft.operators.Similarity`.
  */
object Distance {

  private def dD(x: Column, y: Column): Column = x.cast("double") - y.cast("double")

  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  private def sumAbsDiff(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => abs(dD(x, y))))

  private def sqeuclideanCol(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => { val d = dD(x, y); d * d }))

  /** The scipy metric table. `p` is Minkowski's order (scipy default 2).
    *
    * Null vectors propagate null (scipy would raise; null is the
    * relational analogue). Mismatched lengths fail LOUDLY — zip_with
    * would silently null-pad the shorter side, which under-counts hamming
    * and nulls the sums with no hint why. */
  def metricExpr(metric: String, p: Double = 2.0)(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .when(size(a) =!= size(b),
        raise_error(concat(lit(s"$metric: length mismatch "),
          size(a).cast("string"), lit(" vs "), size(b).cast("string"))))
      .otherwise(metricBody(metric, p)(a, b))

  private def metricBody(metric: String, p: Double)(a: Column, b: Column): Column =
    metric match {
      case "euclidean" => sqrt(sqeuclideanCol(a, b))
      case "sqeuclidean" => sqeuclideanCol(a, b)
      case "cityblock" | "manhattan" => sumAbsDiff(a, b)
      case "chebyshev" => array_max(zip_with(a, b, (x, y) => abs(dD(x, y))))
      case "minkowski" =>
        pow(foldSum(zip_with(a, b, (x, y) => pow(abs(dD(x, y)), lit(p)))), lit(1.0 / p))
      case "cosine" =>
        val dot = foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
        val na = foldSum(transform(a, x => x.cast("double") * x.cast("double")))
        val nb = foldSum(transform(b, x => x.cast("double") * x.cast("double")))
        lit(1.0) - dot / (sqrt(na) * sqrt(nb))
      case "correlation" =>
        // centered cosine via the moment identity (single fold per moment;
        // the oracle writes the IDENTICAL shape, see learn_cdist_metrics)
        val n = size(a).cast("double")
        val sa = foldSum(transform(a, _.cast("double")))
        val sb = foldSum(transform(b, _.cast("double")))
        val sab = foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
        val saa = foldSum(transform(a, x => x.cast("double") * x.cast("double")))
        val sbb = foldSum(transform(b, x => x.cast("double") * x.cast("double")))
        lit(1.0) - (sab - sa * sb / n) /
          (sqrt(saa - sa * sa / n) * sqrt(sbb - sb * sb / n))
      case "canberra" =>
        // scipy: terms with |x|+|y| == 0 contribute 0
        foldSum(zip_with(a, b, (x, y) => {
          val den = abs(x.cast("double")) + abs(y.cast("double"))
          when(den === 0.0, lit(0.0)).otherwise(abs(dD(x, y)) / den)
        }))
      case "braycurtis" =>
        sumAbsDiff(a, b) /
          foldSum(zip_with(a, b, (x, y) => abs(x.cast("double") + y.cast("double"))))
      case "hamming" =>
        hammingDiffCount(a, b).cast("double") / size(a).cast("double")
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }

  /** Count of differing positions (the hamming numerator) as a BIGINT —
    * exact, oracle-gate-friendly (no doubles). */
  def hammingDiffCount(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        when(x.cast("double") =!= y.cast("double"), lit(1L)).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc + v)

  /** scipy.spatial.distance.cdist: the full |A|×|B| distance matrix in
    * long form (`aid`, `bid`, `dist`). `xa` = (aid, avec), `xb` =
    * (bid, bvec); pass the SMALLER frame as `xb` — it is broadcast, the
    * A side never shuffles. */
  def cdist(xa: DataFrame, xb: DataFrame, metric: String = "euclidean",
      p: Double = 2.0): DataFrame =
    xa.crossJoin(broadcast(xb))
      .withColumn("dist", metricExpr(metric, p)(col("avec"), col("bvec")))

  /** pairwise_distances_topk (reference
    * mars/learn/metrics/pairwise/pairwise_distances_topk.py:479): the k
    * NEAREST b-rows per a-row under any cdist metric. Same broadcast
    * shape as cdist plus one rank window partitioned by aid; ranking keys
    * are the deterministic folds, ties break on bid — so the selection is
    * engine-reproducible (the property that makes it oracle-able). */
  def cdistTopK(xa: DataFrame, xb: DataFrame, k: Int,
      metric: String = "euclidean", p: Double = 2.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("aid")).orderBy(col("dist"), col("bid"))
    cdist(xa, xb, metric, p)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("aid"), col("bid"), col("dist"), col("rank"))
  }

  /** scipy.spatial.distance.pdist: condensed upper-triangle self-distances
    * (`id_a` < `id_b`). All-pairs by contract → hard maxRows guard, same
    * policy as silhouetteByCluster. */
  def pdist(x: DataFrame, idCol: String, vecCol: String,
      metric: String = "euclidean", p: Double = 2.0,
      maxRows: Int = 20000): DataFrame = {
    val n = x.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"pdist is exact all-pairs (O(n²), scipy contract): > $maxRows rows " +
        "would plan a cartesian join. Use Similarity.* (LSH/IVF/banded) " +
        "for scalable pairwise search.")
    val a = x.select(col(idCol).as("id_a"), col(vecCol).as("avec"))
    val b = x.select(col(idCol).as("id_b"), col(vecCol).as("bvec"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        metricExpr(metric, p)(col("avec"), col("bvec")).as("dist"))
  }

  /** scipy.spatial.distance.squareform (vector → matrix direction): expand
    * a condensed (`id_a` < `id_b`) pair list to the full square in long
    * form — both triangles plus an explicit zero diagonal over the id
    * universe. Pure relational: a union of two projections and a distinct. */
  def squareform(condensed: DataFrame): DataFrame = {
    val ids = condensed.select(col("id_a").as("id"))
      .unionAll(condensed.select(col("id_b").as("id"))).distinct()
    condensed.select(col("id_a"), col("id_b"), col("dist"))
      .unionAll(condensed.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
        col("dist")))
      .unionAll(ids.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("dist")))
  }

  /** squareform (matrix → vector direction): keep the strict upper
    * triangle. */
  def squareformCondense(square: DataFrame): DataFrame =
    square.filter(col("id_a") < col("id_b"))
}
