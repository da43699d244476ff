package graft

import org.apache.spark.sql.functions._
import graft.learn.Distance

/** Closed-form pins for the scipy.spatial.distance family (Distance.scala).
  * The metric arithmetic is differentially verified against DuckDB
  * (learn_cdist_metrics, learn_pdist_squareform); here we pin the scipy
  * corner conventions on hand-built vectors, the squareform involution,
  * and the pdist all-pairs guard.
  */
class DistanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val pair = Seq(
    (Array(1.0f, 2.0f, 3.0f, 4.0f), Array(1.0f, 0.0f, 3.0f, 8.0f)))
  private def m(metric: String, p: Double = 2.0): Double =
    pair.toDF("a", "b")
      .select(Distance.metricExpr(metric, p)(col("a"), col("b")).as("d"))
      .head().getDouble(0)

  test("metric closed forms on a hand-built pair") {
    // diffs: (0, 2, 0, -4)
    assert(math.abs(m("sqeuclidean") - 20.0) < 1e-12)
    assert(math.abs(m("euclidean") - math.sqrt(20.0)) < 1e-12)
    assert(math.abs(m("cityblock") - 6.0) < 1e-12)
    assert(math.abs(m("chebyshev") - 4.0) < 1e-12)
    // minkowski p=1 ≡ cityblock, p=2 ≡ euclidean
    assert(math.abs(m("minkowski", 1.0) - 6.0) < 1e-9)
    assert(math.abs(m("minkowski", 2.0) - math.sqrt(20.0)) < 1e-9)
    // canberra: 0/1 + 2/2 + 0/6 + 4/12
    assert(math.abs(m("canberra") - (1.0 + 1.0 / 3.0)) < 1e-12)
    // braycurtis: 6 / (2 + 2 + 6 + 12)
    assert(math.abs(m("braycurtis") - 6.0 / 22.0) < 1e-12)
    // hamming: 2 of 4 positions differ
    assert(math.abs(m("hamming") - 0.5) < 1e-12)
    // cosine: 1 - 42/(sqrt(30)*sqrt(74))
    assert(math.abs(m("cosine") - (1.0 - 42.0 / (math.sqrt(30.0) * math.sqrt(74.0)))) < 1e-12)
  }

  test("zero-distance conventions on identical vectors") {
    val self = Seq((Array(1.5f, -2.5f, 0.0f), Array(1.5f, -2.5f, 0.0f))).toDF("a", "b")
    for (metric <- Seq("euclidean", "sqeuclidean", "cityblock", "chebyshev",
        "canberra", "braycurtis", "hamming", "cosine"))
      assert(self.select(Distance.metricExpr(metric)(col("a"), col("b")))
        .head().getDouble(0) === 0.0, metric)
    // canberra 0/0 positions contribute 0, not NaN
    val zeros = Seq((Array(0.0f, 1.0f), Array(0.0f, 2.0f))).toDF("a", "b")
    assert(math.abs(zeros.select(Distance.metricExpr("canberra")(col("a"), col("b")))
      .head().getDouble(0) - 1.0 / 3.0) < 1e-12)
  }

  test("correlation distance is shift- and scale-invariant") {
    // b = 3a + 7 → perfectly correlated → distance 0 (up to fp)
    val a = Array(1.0f, 2.0f, 4.0f, 8.0f)
    val b = a.map(x => 3.0f * x + 7.0f)
    val d = Seq((a, b)).toDF("a", "b")
      .select(Distance.metricExpr("correlation")(col("a"), col("b")))
      .head().getDouble(0)
    assert(math.abs(d) < 1e-12)
    // anti-correlated → distance 2
    val d2 = Seq((a, a.map(x => -2.0f * x))).toDF("a", "b")
      .select(Distance.metricExpr("correlation")(col("a"), col("b")))
      .head().getDouble(0)
    assert(math.abs(d2 - 2.0) < 1e-12)
  }

  test("pdist emits n(n-1)/2 condensed pairs and squareform is an involution") {
    val x = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(3.0f, 4.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(6.0f, 8.0f))).toDF("id", "vec")
    val condensed = Distance.pdist(x, "id", "vec").cache()
    assert(condensed.count() === 6)
    // (1,2) is the 3-4-5 triangle
    assert(math.abs(condensed.where($"id_a" === 1 && $"id_b" === 2)
      .head().getAs[Double]("dist") - 5.0) < 1e-12)
    val square = Distance.squareform(condensed).cache()
    assert(square.count() === 16)
    // symmetric, zero diagonal
    assert(square.where($"id_a" === $"id_b").agg(max(abs($"dist")))
      .head().getDouble(0) === 0.0)
    val back = Distance.squareformCondense(square)
      .select($"id_a", $"id_b", $"dist")
    assert(back.exceptAll(condensed).count() === 0)
    assert(condensed.exceptAll(back).count() === 0)
  }

  test("cdistTopK returns the k nearest in rank order per query row") {
    val qs = Seq((0L, Array(0.0f, 0.0f))).toDF("aid", "avec")
    val cs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(5.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f)), (4L, Array(9.0f, 0.0f))).toDF("bid", "bvec")
    val got = Distance.cdistTopK(qs, cs, k = 2, metric = "euclidean")
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq === Seq((1L, 1.0, 1), (3L, 2.0, 2)))
  }

  test("null vectors propagate null; length mismatch fails loudly") {
    val withNull = Seq((Array(1.0f, 2.0f), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(withNull.select(Distance.metricExpr("euclidean")(col("a"), col("b")))
      .head().isNullAt(0))
    val mismatched = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val e = intercept[Exception] {
      mismatched.select(Distance.metricExpr("hamming")(col("a"), col("b"))).head()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("pdist refuses to plan an unguarded cartesian") {
    val big = spark.range(100).select($"id", array(lit(1.0f)).as("vec"))
    val e = intercept[IllegalArgumentException] {
      Distance.pdist(big, "id", "vec", maxRows = 50)
    }
    assert(e.getMessage.contains("all-pairs"))
  }
}
