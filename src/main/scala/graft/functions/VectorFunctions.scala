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

  /** Row-wise argmax (mt.argmax(axis=1)): 0-based index of the first
    * occurrence of the maximum — numpy's tie rule. Pure expression. */
  def argmax(a: Column): Column =
    (array_position(a, array_max(a)) - 1).cast("long")

  /** Row-wise top-k values, descending (mt.topk along axis=1): sort +
    * reverse + slice, all inside the row — no shuffle, no UDF. */
  def topKValues(a: Column, k: Int): Column =
    slice(reverse(array_sort(a)), 1, k)

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
    * most sign bits.
    *
    * The nBits×dim coefficient matrix is a single `typedlit` array-of-arrays
    * literal, and the per-bit dot product is a zip_with/aggregate fold — so
    * plan size is O(1) in both dim and nBits (the naive unrolled form is
    * dim×nBits expression nodes, a plan-size bomb at embedding dims ≥ 768). */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val coefs = typedlit((0 until nBits).map { b =>
      (0 until dim).map { j =>
        // coef in [-1, 1), splitmix-mixed from (seed, bit, dim index)
        mix64(seed + b.toLong * 1000003L + j.toLong).toDouble / Long.MaxValue.toDouble
      }
    })
    val bits = transform(coefs, row =>
      when(
        aggregate(
          zip_with(row, vec, (c, x) => c * x.cast("double")),
          lit(0.0),
          (acc, v) => acc + v) >= 0,
        lit("1")).otherwise(lit("0")))
    array_join(bits, "")
  }

  /** Dense matrix-vector product as a pure expression: `matrix` is a
    * k×dim literal (typedlit, one Literal node), the result a length-k
    * array<double>. The expression-level `dot` of the reference
    * (arithmetic/dot.py:30) — per-row projection at scan speed with no
    * shuffle; also the building block for custom PCA/whitening projections. */
  def matvec(matrix: Seq[Seq[Double]], vec: Column): Column = {
    val m = typedlit(matrix)
    transform(m, row =>
      aggregate(zip_with(row, vec, (c, x) => c * x.cast("double")),
        lit(0.0), (acc, v) => acc + v))
  }

  /** splitmix64 finalizer — deterministic pseudo-random 64-bit mix. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
