package graft

import org.apache.spark.sql.functions._
import graft.functions.Distributions
import graft.learn.{Datasets, Learn}

/** Statistical sanity for the dataset generators (Datasets.scala) and
  * known-value pins for the Acklam normal quantile. The exact draw values
  * are differentially verified against DuckDB (learn_make_blobs /
  * _regression / _classification); here we check the generators produce
  * what they claim statistically — the only check the reference's own
  * tests can do at all.
  */
class DatasetsSpec extends SparkSpecBase {
  import spark.implicits._

  private def phiInv(u: Double): Double =
    Seq(u).toDF("u").select(Distributions.normalInv(col("u")).as("x"))
      .head().getDouble(0)

  test("normalInv pins: median, symmetry, the 97.5% quantile, tails") {
    assert(math.abs(phiInv(0.5)) < 1e-12)
    assert(math.abs(phiInv(0.975) - 1.959963984540054) < 1e-8)
    assert(math.abs(phiInv(0.025) + phiInv(0.975)) < 1e-8)
    assert(math.abs(phiInv(0.841344746068543) - 1.0) < 1e-8) // Φ(1)
    // deep tail engages the low/high branches
    assert(math.abs(phiInv(1e-6) + phiInv(1.0 - 1e-6)) < 1e-6)
    assert(phiInv(1e-6) < -4.7 && phiInv(1e-6) > -4.8)
  }

  test("make_blobs: labels cover k classes and per-label means sit near centers") {
    val centers = Seq(Seq(-4.0, 2.0), Seq(0.0, -3.0), Seq(5.0, 4.0))
    val df = Datasets.makeBlobs(spark, 3000, centers, clusterStd = 1.0, seed = 1L)
    val stats = df.groupBy($"label")
      .agg(count(lit(1)).as("n"), avg($"f0").as("m0"), avg($"f1").as("m1"))
      .orderBy($"label").collect()
    assert(stats.length === 3)
    stats.foreach { r =>
      val c = centers(r.getLong(0).toInt)
      assert(r.getLong(1) > 700) // roughly balanced buckets
      assert(math.abs(r.getDouble(2) - c(0)) < 0.15)
      assert(math.abs(r.getDouble(3) - c(1)) < 0.15)
    }
  }

  test("make_regression: OLS recovers the planted coefficients") {
    val df = Datasets.makeRegression(spark, 4000, Seq(2.5, -1.5, 0.5),
      bias = 0.75, noiseStd = 0.1, seed = 2L)
    val model = Learn.linearRegressionFit(df, Seq("f0", "f1", "f2"), "y")
    assert(math.abs(model.coefficients(0) - 2.5) < 0.02)
    assert(math.abs(model.coefficients(1) + 1.5) < 0.02)
    assert(math.abs(model.coefficients(2) - 0.5) < 0.02)
    assert(math.abs(model.intercept - 0.75) < 0.02)
  }

  test("make_classification: flip fraction matches flipY and features separate") {
    val clean = Datasets.makeClassification(spark, 4000, d = 3, nClasses = 4,
      classSep = 2.0, flipY = 0.0, seed = 9L)
    val noisy = Datasets.makeClassification(spark, 4000, d = 3, nClasses = 4,
      classSep = 2.0, flipY = 0.1, seed = 9L)
    val flipped = clean.select($"id", $"label".as("l0"))
      .join(noisy.select($"id", $"label".as("l1")), "id")
      .where($"l0" =!= $"l1").count()
    // flip draws hit ~10%, of which 1/4 re-draw the same label
    assert(flipped > 4000 * 0.1 * 0.75 * 0.7 && flipped < 4000 * 0.1 * 1.3)
    // class 0 = corner (-2,-2,-2): its f0 mean is near -2, class 1's near +2
    val m = clean.groupBy($"label").agg(avg($"f0").as("m0")).orderBy($"label")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(m(0L) + 2.0) < 0.15)
    assert(math.abs(m(1L) - 2.0) < 0.15)
  }
}
