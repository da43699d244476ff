package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions (no UDFs).
  *
  * Reference surface: pairwise cosine/euclidean distances + top-k
  * (mars/learn/metrics/pairwise/, mars/opcodes.py:2200-2204) and KNN
  * (mars/learn/neighbors/).
  *
  * All arithmetic is double-precision with a sequential left-to-right fold
  * (`aggregate`), so results are bit-deterministic and reproducible across
  * engines that fold the same way — which the DuckDB oracle does via
  * list_sum(list_transform(...)).
  */
object VectorFunctions {

  /** Elementwise product folded to a double dot product. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSqD(a: Column): Column = dotD(a, a)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(normSqD(a)) * sqrt(normSqD(b)))

  /** Euclidean distance in double precision. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Random-hyperplane signature for cosine LSH: `nBits` deterministic
    * pseudo-random hyperplanes (seeded hash-based coefficients), packed into
    * a string of sign bits. Two vectors with high cosine similarity share
    * most sign bits. Coefficients are generated per (bit, dim) from a
    * splitmix-style integer mix so the plan is a pure expression — no
    * driver-side randomness, no broadcast needed. */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val bits = (0 until nBits).map { b =>
      // sum_j coef(b, j) * vec[j]  with coef in [-1, 1)
      val terms = (0 until dim).map { j =>
        val h = mix64(seed + b.toLong * 1000003L + j.toLong)
        val coef = (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1)
        vec.getItem(j).cast("double") * lit(coef)
      }
      val s = terms.reduce(_ + _)
      when(s >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** splitmix64 finalizer — deterministic pseudo-random 64-bit mix. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
