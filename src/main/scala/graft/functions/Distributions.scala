package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Inverse-CDF transforms u∈(0,1) → X for the closed-form distribution
  * families of the reference's `mt.random.*` surface (mars/tensor/random/,
  * opcodes 68-118, numpy semantics). Pure codegen'd expressions: the random
  * sources feed them `rand(seed)` draws, the deterministic oracled query
  * feeds them [[PortableHash.uniform01]] draws — same code path either way,
  * and any SQL engine replays them exactly (modulo libm ulps, absorbed by
  * round-6 in the oracle contract).
  *
  * Distributions without a closed-form inverse (gamma, beta, poisson,
  * binomial, …) are sampled per-partition with commons-math3 in
  * [[graft.api.GraftSession]].
  */
object Distributions {

  /** Exponential(rate): -ln(1-u)/rate. */
  def exponentialInv(u: Column, rate: Double): Column =
    -log(lit(1.0) - u) / rate

  /** Weibull(shape a, scale λ): λ·(-ln(1-u))^(1/a) (numpy weibull is λ=1). */
  def weibullInv(u: Column, shape: Double, scale: Double = 1.0): Column =
    lit(scale) * pow(-log(lit(1.0) - u), 1.0 / shape)

  /** Pareto(a) in numpy's Lomax form: (1-u)^(-1/a) - 1. */
  def paretoInv(u: Column, a: Double): Column =
    pow(lit(1.0) - u, -1.0 / a) - lit(1.0)

  /** Gumbel(loc μ, scale β): μ - β·ln(-ln(u)). */
  def gumbelInv(u: Column, loc: Double = 0.0, scale: Double = 1.0): Column =
    lit(loc) - lit(scale) * log(-log(u))

  /** Laplace(loc μ, scale b): μ - b·sgn(u-½)·ln(1-2|u-½|). */
  def laplaceInv(u: Column, loc: Double = 0.0, scale: Double = 1.0): Column =
    lit(loc) - lit(scale) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))

  /** Cauchy(x0, γ): x0 + γ·tan(π(u-½)) (numpy standard_cauchy at 0,1). */
  def cauchyInv(u: Column, x0: Double = 0.0, gamma: Double = 1.0): Column =
    lit(x0) + lit(gamma) * tan(lit(math.Pi) * (u - 0.5))

  /** Logistic(loc μ, scale s): μ + s·ln(u/(1-u)). */
  def logisticInv(u: Column, loc: Double = 0.0, scale: Double = 1.0): Column =
    lit(loc) + lit(scale) * log(u / (lit(1.0) - u))

  /** Rayleigh(σ): σ·sqrt(-2·ln(1-u)). */
  def rayleighInv(u: Column, sigma: Double = 1.0): Column =
    lit(sigma) * sqrt(lit(-2.0) * log(lit(1.0) - u))

  /** Power(a): u^(1/a) — numpy random.power. */
  def powerInv(u: Column, a: Double): Column = pow(u, 1.0 / a)

  /** Triangular(left a, mode c, right b): piecewise inverse. */
  def triangularInv(u: Column, a: Double, c: Double, b: Double): Column = {
    require(a <= c && c <= b && a < b, s"invalid triangular params ($a,$c,$b)")
    val fc = (c - a) / (b - a)
    when(u < fc, lit(a) + sqrt(u * lit((b - a) * (c - a))))
      .otherwise(lit(b) - sqrt((lit(1.0) - u) * lit((b - a) * (b - c))))
  }

  /** Geometric(p) trials-until-success on {1,2,…}: ⌈ln(1-u)/ln(1-p)⌉. */
  def geometricInv(u: Column, p: Double): Column = {
    require(p > 0.0 && p < 1.0, s"geometric p out of (0,1): $p")
    greatest(ceil(log(lit(1.0) - u) / math.log(1.0 - p)), lit(1.0)).cast("long")
  }

  /** Categorical over `pvals` via inverse CDF on the cumulative weights:
    * the 0-based index i with cum_{i-1} <= u < cum_i (numpy
    * random.choice(len(p), p=p) per-draw semantics). A nested CASE over
    * compile-time thresholds — codegen'd, and replayable in any SQL engine
    * ([[sqlCategoricalInv]]). */
  def categoricalInv(u: Column, pvals: Seq[Double]): Column = {
    require(pvals.nonEmpty && pvals.forall(_ >= 0.0), "pvals must be non-negative")
    require(math.abs(pvals.sum - 1.0) < 1e-9, s"pvals must sum to 1: ${pvals.sum}")
    val thresholds = pvals.scanLeft(0.0)(_ + _).tail.dropRight(1)
    thresholds.zipWithIndex.foldRight(lit((pvals.size - 1).toLong)) {
      case ((thr, i), rest) => when(u < thr, lit(i.toLong)).otherwise(rest)
    }
  }

  /** SQL mirror of [[categoricalInv]]. Thresholds go through
    * CAST('…' AS DOUBLE) — a bare decimal literal would be DECIMAL in
    * DuckDB; the string round-trips to the identical double. */
  def sqlCategoricalInv(u: String, pvals: Seq[Double]): String = {
    val thresholds = pvals.scanLeft(0.0)(_ + _).tail.dropRight(1)
    val cases = thresholds.zipWithIndex
      .map { case (thr, i) => s"WHEN ($u) < CAST('$thr' AS DOUBLE) THEN $i" }
      .mkString(" ")
    s"(CASE $cases ELSE ${pvals.size - 1} END)"
  }

  // ------------------------------------------------------- normal quantile
  // Acklam's rational approximation to Φ⁻¹ (P. J. Acklam, 2003; |rel err|
  // < 1.15e-9). This gives the random module a PORTABLE normal draw —
  // Spark's randn() is engine-specific, but normalInv(uniform01(key))
  // replays bit-identically in any engine that evaluates the same Horner
  // chain, which is what makes normal-based generators (make_blobs,
  // make_regression) oracle-able at all. Column and SQL forms are built
  // from the SAME coefficient lists by the same Horner fold, so the
  // expression shapes cannot drift apart.
  private val acklamA = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
    2.506628277459239e+00)
  private val acklamB = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
  private val acklamC = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
    2.938163982698783e+00)
  private val acklamD = Seq(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)
  private val acklamPLow = 0.02425
  private val acklamPHigh = 0.97575

  private def horner(coefs: Seq[Double], x: Column): Column =
    coefs.tail.foldLeft(lit(coefs.head): Column)((acc, c) => acc * x + lit(c))

  private def sqlHorner(coefs: Seq[Double], x: String): String =
    coefs.tail.foldLeft(s"CAST('${coefs.head}' AS DOUBLE)")((acc, c) =>
      s"(($acc) * ($x) + CAST('$c' AS DOUBLE))")

  /** Standard-normal quantile Φ⁻¹(u) (mt.random.randn / normal via inverse
    * CDF; numpy draws box-muller, but the DISTRIBUTION is identical and
    * this form is deterministic and portable). */
  def normalInv(u: Column): Column = {
    val qc = u - lit(0.5)
    val rc = qc * qc
    val central = horner(acklamA, rc) * qc / (horner(acklamB, rc) * rc + lit(1.0))
    val ql = sqrt(lit(-2.0) * log(u))
    val lower = horner(acklamC, ql) / (horner(acklamD, ql) * ql + lit(1.0))
    val qh = sqrt(lit(-2.0) * log(lit(1.0) - u))
    val upper = -(horner(acklamC, qh) / (horner(acklamD, qh) * qh + lit(1.0)))
    // branch thresholds as parsed literals on BOTH sides (never computed:
    // 1.0 - 0.02425 can differ from parse("0.97575") by an ulp, and a draw
    // landing between would take different branches in the two engines)
    when(u < lit(acklamPLow), lower)
      .when(u > lit(acklamPHigh), upper)
      .otherwise(central)
  }

  /** SQL mirror of [[normalInv]] — same branches, same Horner chains. */
  def sqlNormalInv(u: String): String = {
    val central = s"(${sqlHorner(acklamA, s"(($u) - 0.5) * (($u) - 0.5)")}" +
      s" * (($u) - 0.5) / (${sqlHorner(acklamB, s"(($u) - 0.5) * (($u) - 0.5)")}" +
      s" * ((($u) - 0.5) * (($u) - 0.5)) + 1.0))"
    val ql = s"sqrt(-2.0 * ln($u))"
    val lower = s"(${sqlHorner(acklamC, ql)} / (${sqlHorner(acklamD, ql)} * ($ql) + 1.0))"
    val qh = s"sqrt(-2.0 * ln(1.0 - ($u)))"
    val upper = s"(-(${sqlHorner(acklamC, qh)} / (${sqlHorner(acklamD, qh)} * ($qh) + 1.0)))"
    s"(CASE WHEN ($u) < CAST('$acklamPLow' AS DOUBLE) THEN $lower " +
      s"WHEN ($u) > CAST('$acklamPHigh' AS DOUBLE) THEN $upper ELSE $central END)"
  }
}
