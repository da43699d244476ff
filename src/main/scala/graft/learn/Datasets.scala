package graft.learn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Distributions, PortableHash}

/** Synthetic dataset generators (reference
  * mars/learn/datasets/samples_generator.py: make_blobs:402,
  * make_classification:31, make_regression:268).
  *
  * Unlike the reference (numpy RandomState per chunk), every draw here is
  * a PORTABLE deterministic function of (row id, column index, seed):
  * avalanche-hash uniform → Acklam Φ⁻¹ — so the generated dataset is
  * identical across engines, partitionings and re-runs, and the
  * generators are differentially oracle-able (the reference's tests can
  * only check moments). Generation is a pure projection over
  * `spark.range(n)` — embarrassingly parallel, no shuffle, no driver
  * state; at 100 TB you raise `n` and the scan parallelism follows the
  * range partitioning.
  */
object Datasets {

  private def draw(seed: Long, slots: Int, slot: Int): org.apache.spark.sql.Column =
    Distributions.normalInv(
      PortableHash.uniform01(col("id") * lit(slots.toLong) + lit(slot.toLong) + lit(seed)))

  /** SQL mirror of one draw (for oracle queries). */
  def sqlDraw(seed: Long, slots: Int, slot: Int): String =
    Distributions.sqlNormalInv(PortableHash.sqlUniform01(s"(id * $slots + $slot + $seed)"))

  /** make_blobs: `centers(c)(j)` is the j-th coordinate of center c; each
    * row gets label = portable bucket of id, features = center +
    * clusterStd·N(0,1). Columns: id, label, f0..f{d-1}. */
  def makeBlobs(spark: SparkSession, n: Long, centers: Seq[Seq[Double]],
      clusterStd: Double = 1.0, seed: Long = 0L): DataFrame = {
    require(seed >= 0L, s"seed must be >= 0 (portable-hash key contract): $seed")
    require(centers.nonEmpty && centers.forall(_.size == centers.head.size),
      "centers must be non-empty and rectangular")
    val k = centers.size
    val d = centers.head.size
    val base = spark.range(n)
      .withColumn("label", PortableHash.bucket(col("id"), k))
    val centerLit = typedlit(centers.map(_.toArray))
    (0 until d).foldLeft(base) { (df, j) =>
      df.withColumn(s"f$j",
        element_at(centerLit, (col("label") + 1).cast("int")).getItem(j) +
          lit(clusterStd) * draw(seed, d, j))
    }
  }

  /** make_regression: X ~ N(0,1)^d, y = bias + Σ_j coefs(j)·X_j +
    * noiseStd·N(0,1), the sum folded in column order (deterministic).
    * Columns: id, f0..f{d-1}, y. */
  def makeRegression(spark: SparkSession, n: Long, coefs: Seq[Double],
      bias: Double = 0.0, noiseStd: Double = 0.0, seed: Long = 0L): DataFrame = {
    require(seed >= 0L, s"seed must be >= 0 (portable-hash key contract): $seed")
    require(coefs.nonEmpty, "coefs must be non-empty")
    val d = coefs.size
    val slots = d + 1 // slot d is the noise draw
    val withX = (0 until d).foldLeft(spark.range(n).toDF()) { (df, j) =>
      df.withColumn(s"f$j", draw(seed, slots, j))
    }
    val lin = (0 until d).foldLeft(lit(bias): org.apache.spark.sql.Column) {
      (acc, j) => acc + lit(coefs(j)) * col(s"f$j")
    }
    withX.withColumn("y",
      if (noiseStd == 0.0) lin else lin + lit(noiseStd) * draw(seed, slots, d))
  }

  /** make_classification, the n_clusters_per_class=1 profile the reference
    * defaults reduce to: class-conditional gaussian blobs at hypercube
    * corners (samples_generator.py:31 — `class_sep` scales the corners),
    * plus `flipY` portable label noise. Columns: id, label, f0..f{d-1}. */
  def makeClassification(spark: SparkSession, n: Long, d: Int, nClasses: Int,
      classSep: Double = 1.0, flipY: Double = 0.0, seed: Long = 0L): DataFrame = {
    require(nClasses >= 2 && d >= 1, "need nClasses >= 2, d >= 1")
    // center of class c in dim j: ±classSep by bit j of the corner code —
    // gray-ish spread of classes over hypercube corners, like the reference
    val centers = (0 until nClasses).map { c =>
      (0 until d).map { j =>
        if (((c >> (j % 31)) & 1) == 1) classSep else -classSep
      }
    }
    val blobs = makeBlobs(spark, n, centers, clusterStd = 1.0, seed = seed)
    if (flipY <= 0.0) blobs
    else blobs.withColumn("label",
      when(PortableHash.uniform01(col("id") + lit(seed + 7919L)) < flipY,
        PortableHash.bucket(col("id") + lit(seed + 104729L), nClasses))
        .otherwise(col("label")))
  }
}
