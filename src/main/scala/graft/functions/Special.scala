package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The oracle-able core of the reference's scipy.special surface
  * (mars/tensor/special/: gamma_funcs.py, info_theory.py,
  * err_fresnel.py convenience entries) as PURE Column compositions —
  * every function here is a fixed-degree arithmetic expression over
  * Catalyst builtins, so the whole surface stays inside whole-stage
  * codegen with no UDFs.
  *
  * Numerics: gammaln uses the Lanczos approximation (g=7, n=9 public
  * coefficients, ~1e-13 relative); digamma uses the standard shift-by-8
  * recurrence + asymptotic series (~1e-12 for real x not at the poles);
  * erf/erfc use Abramowitz–Stegun 7.1.26 (|ε| ≤ 1.5e-7 — documented,
  * spec-pinned; enough for the quality-scoring/statistics use cases, and
  * exact p-value work goes through StatTests' iterative forms instead).
  * The airy/bessel/elliptic/hypergeometric families stay out of parity
  * scope (SURVEY §2.14).
  */
object Special {

  // Lanczos g=7 n=9 (same public parameterization as StatTests.lnGamma)
  private val lanczosC = Seq(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  private def lanczosCore(z: Column): Column = {
    // z = x − 1 ≥ −0.5; Σ c_i/(z+i) then the closed Lanczos form
    val series = lanczosC.zipWithIndex.tail.foldLeft(lit(lanczosC.head)) {
      case (acc, (ci, i)) => acc + lit(ci) / (z + lit(i.toDouble))
    }
    val t = z + lit(7.5)
    lit(0.5 * math.log(2.0 * math.Pi)) +
      (z + lit(0.5)) * log(t) - t + log(series)
  }

  /** ln |Γ(x)| for x > 0 (scipy.special.gammaln on the positive axis;
    * gamma_funcs.py:60). Poles at x ≤ 0 integers → NaN via log of
    * non-positive. */
  def gammaln(x: Column): Column =
    when(x > 0.5, lanczosCore(x - lit(1.0)))
      // reflection ln Γ(x) = ln(π/|sin πx|) − ln Γ(1−x), valid 0 < x ≤ .5
      .otherwise(log(lit(math.Pi) / abs(sin(lit(math.Pi) * x))) -
        lanczosCore(lit(1.0) - x - lit(1.0)))

  /** sign(Γ(x)) as ±1 (gamma_funcs.py:121 gammasgn): positive for x > 0;
    * for negative non-integer x it alternates with ⌊x⌋ parity. */
  def gammasgn(x: Column): Column =
    when(x > 0.0, lit(1.0))
      .when(x === floor(x), lit(0.0)) // poles: scipy returns 0 sign
      .otherwise(when(pmod(floor(x).cast("long"), lit(2L)) === 0L, lit(1.0))
        .otherwise(lit(-1.0)))

  /** Γ(x) (gamma_funcs.py:47): exp(gammaln) with the reflection sign. */
  def gamma(x: Column): Column = gammasgn(x) * exp(gammaln(x))

  /** ln B(a,b) (gamma_funcs.py betaln). */
  def betaln(a: Column, b: Column): Column =
    gammaln(a) + gammaln(b) - gammaln(a + b)

  /** B(a,b) (gamma_funcs.py:184 beta), positive arguments. */
  def beta(a: Column, b: Column): Column = exp(betaln(a, b))

  /** ψ(x) digamma (gamma_funcs.py psi): shift x by 8 via
    * ψ(x) = ψ(x+8) − Σ_{k=0..7} 1/(x+k), then the asymptotic series
    * ψ(y) ≈ ln y − 1/2y − 1/12y² + 1/120y⁴ − 1/252y⁶ (y ≥ 8). Real
    * x > 0; negative non-integers via reflection ψ(1−x) − ψ(x) =
    * π·cot(πx). */
  def digamma(x: Column): Column = {
    def positive(xp: Column): Column = {
      val shift = (0 until 8).map(k => lit(1.0) / (xp + lit(k.toDouble)))
        .reduce(_ + _)
      val y = xp + lit(8.0)
      val y2 = lit(1.0) / (y * y)
      log(y) - lit(0.5) / y -
        y2 * (lit(1.0 / 12.0) - y2 * (lit(1.0 / 120.0) -
          y2 * (lit(1.0 / 252.0) - y2 * lit(1.0 / 240.0)))) -
        shift
    }
    when(x > 0.0, positive(x))
      .otherwise(positive(lit(1.0) - x) - lit(math.Pi) / tan(lit(math.Pi) * x))
  }

  /** erf via Abramowitz–Stegun 7.1.26 (err_fresnel.py erf); |ε|≤1.5e-7. */
  def erf(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(x))
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val pos = lit(1.0) - poly * exp(-x * x)
    // x = 0 exactly: the A&S polynomial sums to 1 − 1e-9, scipy gives 0
    when(x === 0.0, lit(0.0)).when(x > 0.0, pos).otherwise(-pos)
  }

  /** erfc = 1 − erf (err_fresnel.py erfc). */
  def erfc(x: Column): Column = lit(1.0) - erf(x)

  /** erfinv via the portable normal quantile (err_fresnel.py erfinv):
    * erfinv(x) = Φ⁻¹((x+1)/2) / √2 — Acklam's rational Φ⁻¹ is already
    * engine-replayable (Distributions.normalInv + its SQL mirror), so
    * erfinv inherits oracle-ability; |rel err| ~1e-9, far tighter than
    * the A&S forward erf. Domain (−1, 1); ±1 → ±∞ like scipy. */
  def erfinv(x: Column): Column =
    graft.functions.Distributions.normalInv((x + lit(1.0)) / lit(2.0)) /
      lit(math.sqrt(2.0))

  /** erfcinv(y) = erfinv(1 − y) (err_fresnel.py erfcinv), domain (0, 2). */
  def erfcinv(y: Column): Column = erfinv(lit(1.0) - y)

  // ---------------- information theory (info_theory.py) ----------------

  /** entr(x) = −x ln x for x>0, 0 at x=0, −∞ for x<0 (info_theory.py:30). */
  def entr(x: Column): Column =
    when(x > 0.0, -x * log(x))
      .when(x === 0.0, lit(0.0))
      .otherwise(lit(Double.NegativeInfinity))

  /** rel_entr(x,y) = x ln(x/y) with the scipy corner conventions
    * (info_theory.py:70). */
  def relEntr(x: Column, y: Column): Column =
    when(x > 0.0 && y > 0.0, x * log(x / y))
      .when(x === 0.0 && y >= 0.0, lit(0.0))
      .otherwise(lit(Double.PositiveInfinity))

  /** kl_div(x,y) = x ln(x/y) − x + y (info_theory.py kl_div). */
  def klDiv(x: Column, y: Column): Column =
    when(x > 0.0 && y > 0.0, x * log(x / y) - x + y)
      .when(x === 0.0 && y >= 0.0, y)
      .otherwise(lit(Double.PositiveInfinity))

  /** xlogy(x,y) = x ln y with 0·ln(anything) = 0 (convenience.py xlogy). */
  def xlogy(x: Column, y: Column): Column =
    when(x === 0.0, lit(0.0)).otherwise(x * log(y))

  /** xlog1py(x,y) = x ln(1+y), 0 at x=0. */
  def xlog1py(x: Column, y: Column): Column =
    when(x === 0.0, lit(0.0)).otherwise(x * log1p(y))
}
