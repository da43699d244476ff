package graft

import org.apache.spark.sql.functions._
import graft.learn.LabelProp

/** Behavioral pins for label propagation (LabelProp.scala). The numeric
  * fixpoint is differentially verified against DuckDB (learn_label_prop);
  * here we pin the semantics: clamping, convergence on a separable graph,
  * the transduction fallback, and the all-pairs guards.
  */
class LabelPropSpec extends SparkSpecBase {
  import spark.implicits._

  // two 3-cliques bridged by nothing: 1-2-3 (label 0 on node 1),
  // 4-5-6 (label 1 on node 4)
  private def cliqueEdges = {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
    (und ++ und.map(_.swap)).toDF("src", "dst").withColumn("w", lit(1.0))
  }
  private def cliqueLabels = Seq(
    (1L, 0L), (2L, -1L), (3L, -1L), (4L, 1L), (5L, -1L), (6L, -1L))
    .toDF("id", "label")

  test("two separated cliques converge to their seed labels") {
    val dist = LabelProp.fitEdges(cliqueEdges, cliqueLabels, maxIter = 30, tol = 1e-6)
    val pred = LabelProp.transduction(dist, cliqueLabels)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pred === Array((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L)))
  }

  test("labeled nodes stay hard-clamped at p=1 on their own class") {
    val dist = LabelProp.fitEdges(cliqueEdges, cliqueLabels, maxIter = 5, tol = 0.0)
    val clamped = dist.where($"id" === 1L).collect()
    assert(clamped.length === 1)
    assert(clamped.head.getLong(1) === 0L)
    assert(clamped.head.getDouble(2) === 1.0)
  }

  test("distributions are normalized and in [0, 1]") {
    val dist = LabelProp.fitEdges(cliqueEdges, cliqueLabels, maxIter = 5, tol = 0.0)
    val sums = dist.groupBy($"id").agg(sum($"p").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
    assert(dist.where($"p" < 0.0 || $"p" > 1.0).count() === 0)
  }

  test("unreachable nodes fall back to the smallest class") {
    // node 7 is isolated (no edges) and unlabeled
    val labels = cliqueLabels.unionByName(Seq((7L, -1L)).toDF("id", "label"))
    val dist = LabelProp.fitEdges(cliqueEdges, labels, maxIter = 3, tol = 0.0)
    val pred = LabelProp.transduction(dist, labels)
      .where($"id" === 7L).head().getLong(1)
    assert(pred === 0L)
  }

  test("any negative marker counts as unlabeled, not dropped") {
    val labels = Seq((1L, 0L), (2L, -9L), (3L, -1L), (4L, 1L), (5L, -1L), (6L, -1L))
      .toDF("id", "label")
    val dist = LabelProp.fitEdges(cliqueEdges, labels, maxIter = 20, tol = 1e-6)
    val pred = LabelProp.transduction(dist, labels)
      .where($"id" === 2L).head().getLong(1)
    assert(pred === 0L) // node 2 sits in clique 1 → propagated, not lost
  }

  test("kNN/rbf graph builders refuse unguarded all-pairs") {
    val big = spark.range(60).select($"id", array(lit(1.0f)).as("vec"))
    val e1 = intercept[IllegalArgumentException] {
      LabelProp.knnGraphEuclidean(big, "id", "vec", k = 2, maxRows = 50)
    }
    assert(e1.getMessage.contains("all-pairs"))
    val e2 = intercept[IllegalArgumentException] {
      LabelProp.rbfGraph(big, "id", "vec", maxRows = 50)
    }
    assert(e2.getMessage.contains("n×n"))
  }

  test("perf mode (deterministic=false) matches the ordered folds within float noise") {
    // r11 VERDICT #6: plain SUM aggregation instead of ordered folds —
    // same distributions up to float reassociation, same transduction
    val det = LabelProp.fitEdges(cliqueEdges, cliqueLabels,
      maxIter = 10, tol = 0.0)
    val fast = LabelProp.fitEdges(cliqueEdges, cliqueLabels,
      maxIter = 10, tol = 0.0, deterministic = false)
    val d = det.select($"id", $"cls", $"p".as("pd"))
      .join(fast.select($"id", $"cls", $"p".as("pf")), Seq("id", "cls"), "full_outer")
      .select(max(abs(coalesce($"pd", lit(0.0)) - coalesce($"pf", lit(0.0)))))
      .head().getDouble(0)
    assert(d < 1e-12, s"perf-mode distributions drifted: $d")
    // pagerank's perf mode: same ranks within reassociation noise
    val edges = cliqueEdges
    val rd = graft.operators.Components
      .pagerank(edges, "src", "dst", "w", iters = 5)
      .select($"node", $"r".as("rd"))
    val rf = graft.operators.Components
      .pagerank(edges, "src", "dst", "w", iters = 5, deterministic = false)
      .select($"node", $"r".as("rf"))
    val dr = rd.join(rf, "node").select(max(abs($"rd" - $"rf"))).head().getDouble(0)
    assert(dr < 1e-12, s"pagerank perf mode drifted: $dr")
  }

  test("rbf kernel weights nearer neighbors exponentially higher") {
    val x = Seq((1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(3.0f)))
      .toDF("id", "vec")
    val g = LabelProp.rbfGraph(x, "id", "vec", gamma = 1.0)
      .where($"src" === 1L).orderBy($"dst").collect()
    assert(math.abs(g(0).getDouble(2) - math.exp(-1.0)) < 1e-12)
    assert(math.abs(g(1).getDouble(2) - math.exp(-9.0)) < 1e-12)
  }
}
