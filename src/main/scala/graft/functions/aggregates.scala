package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom aggregate functions covering the reference's reductions that Spark
  * lacks as built-ins.
  *
  * Reference surface: product (mars/dataframe/reduction/prod.py:25),
  * sem (reduction/sem.py:23), str_concat (reduction/str_concat.py:22),
  * custom reductions (reduction/custom_reduction.py:23). The reference
  * decomposes every reduction into pre/agg/post steps
  * (ReductionCompiler, mars/dataframe/reduction/core.py:790) — Spark's
  * partial+final hash aggregation is the same shape, so most reductions are
  * plain built-ins; only the ones below need custom code.
  *
  * Scale: `ProductAgg` is an [[Aggregator]] — partial-aggregated map-side,
  * merged reduce-side, no shuffle of raw rows. The moment-based helpers are
  * pure Column expressions (codegen'd, partial+final) — at 100 TB they
  * behave exactly like built-in sum/count.
  */
object aggregates {

  /** Product of a double column (pandas `prod`). Distributed as
    * multiply-combine; multiplication is associative up to float rounding,
    * same contract as any parallel product. */
  class ProductAgg extends Aggregator[Double, Double, Double] {
    override def zero: Double = 1.0
    override def reduce(b: Double, a: Double): Double = b * a
    override def merge(b1: Double, b2: Double): Double = b1 * b2
    override def finish(r: Double): Double = r
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Product as a Column aggregate over a double column. */
  def product(c: Column): Column = udaf(new ProductAgg).apply(c)

  /** Custom-reduction demo (reference reduction/custom_reduction.py:23,
    * the user-defined pre/agg/post registry): Σ floor(x²·100 + 0.5) as
    * exact cent-scaled BIGINTs — the accumulation is integer, so the
    * reduction is order-free and replayable in any engine (the CLAUDE
    * scaled-integer convention packaged as an [[Aggregator]]). Partial-
    * aggregated map-side like every Aggregator. */
  class SumSqCentsAgg extends Aggregator[Double, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Double): Long =
      b + math.floor(a * a * 100.0 + 0.5).toLong
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Sum-of-squares (in cents) as a Column aggregate — the custom
    * [[Aggregator]] registry demo, oracle-checked in op_custom_agg. */
  def sumSqCents(c: Column): Column = udaf(new SumSqCentsAgg).apply(c)

  /** Standard error of the mean: stddev_samp / sqrt(n), pandas `sem`. */
  def sem(c: Column): Column = stddev_samp(c) / sqrt(count(c))

  // ---- NaN-skipping reductions (reference mars/tensor/reduction/
  //      nansum.py and siblings): numpy's nan* family treats NaN as
  //      missing. Spark aggregates skip NULL but PROPAGATE NaN, so the
  //      whole family is one projection away: map NaN → null, then the
  //      built-in (still partial+final, codegen'd).

  /** NaN → null, the numpy-missing to SQL-missing bridge. */
  def nanToNull(c: Column): Column =
    when(isnan(c.cast("double")), lit(null)).otherwise(c.cast("double"))

  def nanSum(c: Column): Column = sum(nanToNull(c))
  def nanMean(c: Column): Column = avg(nanToNull(c))
  def nanMax(c: Column): Column = max(nanToNull(c))
  def nanMin(c: Column): Column = min(nanToNull(c))
  def nanCount(c: Column): Column = count(nanToNull(c))
  def nanVar(c: Column): Column = varFromMoments(nanToNull(c))
  def nanStd(c: Column): Column = sqrt(varFromMoments(nanToNull(c)))
  def nanProd(c: Column): Column = udaf(new ProductAgg).apply(
    coalesce(nanToNull(c), lit(1.0)))

  /** Sample variance from explicit moment sums:
    * (m2 - m1^2/n) / (n - 1).
    * For integer-valued inputs the moment sums are exact in IEEE double, so
    * this matches any other engine using the same formula bit-for-bit. */
  def varFromMoments(c: Column): Column = {
    val n = count(c).cast("double")
    val m1 = sum(c)
    val m2 = sum(c * c)
    (m2 - m1 * m1 / n) / (n - lit(1.0))
  }

  /** Sample stddev via [[varFromMoments]]. */
  def stdFromMoments(c: Column): Column = sqrt(varFromMoments(c))

  /** sem via moment sums (deterministic across engines for integer input). */
  def semFromMoments(c: Column): Column = stdFromMoments(c) / sqrt(count(c).cast("double"))

  /** Population skewness g1 = (m3c/n) / (m2c/n)^1.5 from raw moment sums,
    * where mkc are central moments expanded into raw moments. */
  def skewFromMoments(c: Column): Column = {
    val n = count(c).cast("double")
    val s1 = sum(c)
    val s2 = sum(c * c)
    val s3 = sum(c * c * c)
    val mean = s1 / n
    val m2c = s2 / n - mean * mean
    val m3c = s3 / n - lit(3.0) * mean * (s2 / n) + lit(2.0) * mean * mean * mean
    // x^1.5 as x*sqrt(x): sqrt is IEEE-exact, pow is libm-dependent
    m3c / (m2c * sqrt(m2c))
  }

  /** Population excess kurtosis g2 = (m4c/n)/(m2c/n)^2 - 3 from raw moments. */
  def kurtFromMoments(c: Column): Column = {
    val n = count(c).cast("double")
    val s1 = sum(c)
    val s2 = sum(c * c)
    val s3 = sum(c * c * c)
    val s4 = sum(c * c * c * c)
    val mean = s1 / n
    val m2c = s2 / n - mean * mean
    val m4c = s4 / n - lit(4.0) * mean * (s3 / n) +
      lit(6.0) * mean * mean * (s2 / n) - lit(3.0) * mean * mean * mean * mean
    m4c / (m2c * m2c) - lit(3.0)
  }

  /** Ordered string concat (pandas `Series.str.cat` as a reduction,
    * reference mars/dataframe/reduction/str_concat.py:22). `collect_list`
    * order is nondeterministic under parallelism, so callers must provide an
    * explicit order column; we sort the collected (ord, value) structs. */
  def strConcatOrdered(value: Column, ord: Column, sep: String): Column =
    array_join(
      transform(
        array_sort(collect_list(struct(ord.as("o"), value.as("v")))),
        s => s.getField("v")),
      sep)
}
