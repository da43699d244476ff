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
  * Bessel J0/J1/Y0/Y1/I0/I1/K0/K1 (bessel.py) use the Abramowitz–Stegun
  * 9.4.1–9.4.6 / 9.8.1–9.8.8 polynomial approximations (|ε| ≲ 1e-7,
  * spec-pinned against tabulated values); complete elliptic integrals
  * K(m)/E(m) (ellip_func_integrals.py) use eight unrolled AGM steps —
  * pure IEEE +·/√ arithmetic, so the value is BIT-identical on any
  * IEEE-754 engine (the oracle compares them unrounded). Each family
  * ships a `sql*` mirror emitting the identical Horner/AGM shape as
  * DuckDB SQL. Fresnel C/S, Dawson F and erfi (err_fresnel.py) branch
  * series/asymptotic at |x| = 4; Airy Ai/Ai′/Bi/Bi′ (airy.py) are
  * series-windowed to |x| ≤ 6; hyp1f1/hyp2f1 are series-windowed to
  * their convergent domains — for 2F1 the Pfaff / DLMF 15.8.4 / DLMF
  * 15.8.2 connections extend the real axis to the ENTIRE z < 1 ray
  * (r13) — with staged SQL mirrors, gated via op_special_hyp*;
  * wofz/voigt_profile
  * use Humlicek's w4 rational regions (~3e-5 relative, spec-pinned vs
  * mpmath) and modfresnelp/modfresnelm ride the same Faddeeva kernel
  * through one complex identity. Out of parity scope (SURVEY §2.14):
  * the full-plane analytic continuations of the hypergeometric family
  * beyond the documented windows — scipy-grade accuracy there needs
  * the Cephes coefficient tables, not a fixed-degree composition.
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

  /** ψ′(x) trigamma = polygamma(1, x) (gamma_funcs.py polygamma, n=1):
    * shift-by-8 recurrence ψ′(x) = ψ′(x+8) + Σ_{k=0..7} 1/(x+k)², then
    * the asymptotic series ψ′(y) ≈ 1/y + 1/2y² + (1/6 − y⁻²/30 + y⁻⁴/42
    * − y⁻⁶/30)/y³ (truncation ≲ 9e-12 at y = 8). Negative non-integers
    * via the reflection ψ′(x) = π²/sin²(πx) − ψ′(1−x). */
  def trigamma(x: Column): Column = {
    def positive(xp: Column): Column = {
      val shift = (0 until 8)
        .map(k => lit(1.0) / ((xp + lit(k.toDouble)) * (xp + lit(k.toDouble))))
        .reduce(_ + _)
      val y = xp + lit(8.0)
      val y2 = lit(1.0) / (y * y)
      lit(1.0) / y + lit(0.5) * y2 +
        y2 / y * (lit(1.0 / 6.0) - y2 * (lit(1.0 / 30.0) -
          y2 * (lit(1.0 / 42.0) - y2 * lit(1.0 / 30.0)))) +
        shift
    }
    val s = sin(lit(math.Pi) * x)
    when(x > 0.0, positive(x))
      .otherwise(lit(math.Pi * math.Pi) / (s * s) - positive(lit(1.0) - x))
  }

  /** polygamma(n, x) for n ∈ {0, 1} (gamma_funcs.py polygamma): the
    * reference accepts any derivative order; the fixed-composition
    * profile here covers the two orders with closed asymptotic forms
    * (ψ, ψ′) and fails loudly beyond them. */
  def polygamma(n: Int, x: Column): Column = n match {
    case 0 => digamma(x)
    case 1 => trigamma(x)
    case _ => throw new IllegalArgumentException(
      s"polygamma: derivative order $n outside the fixed-composition " +
        "profile (supported: n = 0 digamma, n = 1 trigamma)")
  }

  /** Pochhammer (x)_m = Γ(x+m)/Γ(x) (gamma_funcs.py poch) on the
    * positive axis x > 0, x+m > 0 (the general signed case needs Γ
    * reflection bookkeeping outside the parity profile). */
  def poch(x: Column, m: Column): Column = exp(gammaln(x + m) - gammaln(x))

  /** 1/Γ(x) (gamma_funcs.py rgamma): entire function — the poles of Γ at
    * non-positive integers map to exact 0, matching scipy. */
  def rgamma(x: Column): Column =
    when(x <= 0.0 && x === floor(x), lit(0.0))
      .otherwise(gammasgn(x) * exp(-gammaln(x)))

  /** ln Γ_d(a), the log multivariate gamma (gamma_funcs.py
    * multigammaln): d(d−1)/4 · ln π + Σ_{j=1..d} ln Γ(a + (1−j)/2);
    * requires a > (d−1)/2 so every shifted argument stays positive. */
  def multigammaln(a: Column, d: Int): Column = {
    require(d >= 1, s"multigammaln: dimension d must be ≥ 1, got $d")
    (1 to d).map(j => gammaln(a + lit((1.0 - j) / 2.0)))
      .reduce(_ + _) + lit(d * (d - 1) / 4.0 * math.log(math.Pi))
  }

  /** SQL mirror of [[digamma]]'s positive branch — the identical
    * shift-by-8 + asymptotic-series op shape (callers keep x > 0). */
  def sqlDigammaPos(x: String): String = {
    val shift = (0 until 8).map(k =>
      s"1.0 / (($x) + CAST('${k.toDouble}' AS DOUBLE))").mkString(" + ")
    val y = s"(($x) + 8.0)"
    val y2 = s"(1.0 / ($y * $y))"
    s"(ln($y) - 0.5 / $y - $y2 * (CAST('${1.0 / 12.0}' AS DOUBLE) - " +
      s"$y2 * (CAST('${1.0 / 120.0}' AS DOUBLE) - " +
      s"$y2 * (CAST('${1.0 / 252.0}' AS DOUBLE) - " +
      s"$y2 * CAST('${1.0 / 240.0}' AS DOUBLE)))) - ($shift))"
  }

  /** SQL mirror of [[trigamma]]'s positive branch, same op shape. */
  def sqlTrigammaPos(x: String): String = {
    val shift = (0 until 8).map { k =>
      val xk = s"(($x) + CAST('${k.toDouble}' AS DOUBLE))"
      s"1.0 / ($xk * $xk)"
    }.mkString(" + ")
    val y = s"(($x) + 8.0)"
    val y2 = s"(1.0 / ($y * $y))"
    s"(1.0 / $y + 0.5 * $y2 + $y2 / $y * (CAST('${1.0 / 6.0}' AS DOUBLE) - " +
      s"$y2 * (CAST('${1.0 / 30.0}' AS DOUBLE) - " +
      s"$y2 * (CAST('${1.0 / 42.0}' AS DOUBLE) - " +
      s"$y2 * CAST('${1.0 / 30.0}' AS DOUBLE)))) + ($shift))"
  }

  // ---------------- Bessel functions (bessel.py) ----------------
  // Abramowitz–Stegun polynomial approximations (public-domain NBS
  // handbook, §9.4 and §9.8). Coefficients stored ascending as
  // published; Horner evaluation runs high→low with the SAME shape on
  // the Column side and in the sql* mirrors, so both engines perform
  // the identical IEEE operation sequence (libm enters only through
  // cos/sin/ln/exp/sqrt of identical inputs).

  private def hornerAsc(coefs: Seq[Double], x: Column): Column =
    coefs.reverse.tail.foldLeft(lit(coefs.last))((acc, c) => acc * x + lit(c))
  private def sqlHornerAsc(coefs: Seq[Double], x: String): String =
    coefs.reverse.tail.foldLeft(s"CAST('${coefs.last}' AS DOUBLE)")((acc, c) =>
      s"(($acc) * ($x) + CAST('$c' AS DOUBLE))")

  // A&S 9.4.1 / 9.4.2 / 9.4.4 / 9.4.5: |x| < 3, argument t = (x/3)^2
  private val j0Small = Seq(1.0, -2.2499997, 1.2656208, -0.3163866,
    0.0444479, -0.0039444, 0.0002100)
  private val y0Small = Seq(0.36746691, 0.60559366, -0.74350384, 0.25300117,
    -0.04261214, 0.00427916, -0.00024846)
  private val j1Small = Seq(0.5, -0.56249985, 0.21093573, -0.03954289,
    0.00443319, -0.00031761, 0.00001109)
  private val y1Small = Seq(-0.6366198, 0.2212091, 2.1682709, -1.3164827,
    0.3123951, -0.0400976, 0.0027873)
  // A&S 9.4.3 / 9.4.6: |x| ≥ 3, modulus f and phase θ in z = 3/x
  private val f0Mod = Seq(0.79788456, -0.00000077, -0.00552740, -0.00009512,
    0.00137237, -0.00072805, 0.00014476)
  private val th0Ph = Seq(-0.78539816, -0.04166397, -0.00003954, 0.00262573,
    -0.00054125, -0.00029333, 0.00013558)
  private val f1Mod = Seq(0.79788456, 0.00000156, 0.01659667, 0.00017105,
    -0.00249511, 0.00113653, -0.00020033)
  private val th1Ph = Seq(-2.35619449, 0.12499612, 0.00005650, -0.00637879,
    0.00074348, 0.00079824, -0.00029166)
  // A&S 9.8.1–9.8.8: I in t = (x/3.75)^2 (small) / w = 3.75/x (large),
  // K in t = (x/2)^2 (small) / w = 2/x (large)
  private val i0Small = Seq(1.0, 3.5156229, 3.0899424, 1.2067492,
    0.2659732, 0.0360768, 0.0045813)
  private val i0Large = Seq(0.39894228, 0.01328592, 0.00225319, -0.00157565,
    0.00916281, -0.02057706, 0.02635537, -0.01647633, 0.00392377)
  private val i1Small = Seq(0.5, 0.87890594, 0.51498869, 0.15084934,
    0.02658733, 0.00301532, 0.00032411)
  private val i1Large = Seq(0.39894228, -0.03988024, -0.00362018, 0.00163801,
    -0.01031555, 0.02282967, -0.02895312, 0.01787654, -0.00420059)
  private val k0Small = Seq(-0.57721566, 0.42278420, 0.23069756, 0.03488590,
    0.00262698, 0.00010750, 0.00000740)
  private val k0Large = Seq(1.25331414, -0.07832358, 0.02189568, -0.01062446,
    0.00587872, -0.00251540, 0.00053208)
  private val k1Small = Seq(1.0, 0.15443144, -0.67278579, -0.18156897,
    -0.01919402, -0.00110404, -0.00004686)
  private val k1Large = Seq(1.25331414, 0.23498619, -0.03655620, 0.01504268,
    -0.00780353, 0.00325614, -0.00068245)

  /** J₀(x) (bessel.py j0): A&S 9.4.1 for |x|<3, 9.4.3 beyond; even. */
  def besselJ0(x: Column): Column = {
    val ax = abs(x)
    val small = hornerAsc(j0Small, (x / lit(3.0)) * (x / lit(3.0)))
    val z = lit(3.0) / ax
    val large = hornerAsc(f0Mod, z) * cos(ax + hornerAsc(th0Ph, z)) / sqrt(ax)
    when(ax < 3.0, small).otherwise(large)
  }

  /** sql mirror of [[besselJ0]]; `x` is a SQL double expression. */
  def sqlBesselJ0(x: String): String = {
    val small = sqlHornerAsc(j0Small, s"(($x) / 3.0) * (($x) / 3.0)")
    val z = s"(3.0 / abs($x))"
    val large = s"(${sqlHornerAsc(f0Mod, z)}) * cos(abs($x) + " +
      s"(${sqlHornerAsc(th0Ph, z)})) / sqrt(abs($x))"
    s"(CASE WHEN abs($x) < 3.0 THEN ($small) ELSE ($large) END)"
  }

  /** J₁(x) (bessel.py j1): A&S 9.4.4 / 9.4.6; odd. */
  def besselJ1(x: Column): Column = {
    val ax = abs(x)
    val small = x * hornerAsc(j1Small, (x / lit(3.0)) * (x / lit(3.0)))
    val z = lit(3.0) / ax
    val large = signum(x) *
      hornerAsc(f1Mod, z) * cos(ax + hornerAsc(th1Ph, z)) / sqrt(ax)
    when(ax < 3.0, small).otherwise(large)
  }

  /** sql mirror of [[besselJ1]]. */
  def sqlBesselJ1(x: String): String = {
    val small = s"($x) * (${sqlHornerAsc(j1Small, s"(($x) / 3.0) * (($x) / 3.0)")})"
    val z = s"(3.0 / abs($x))"
    val large = s"sign($x) * (${sqlHornerAsc(f1Mod, z)}) * cos(abs($x) + " +
      s"(${sqlHornerAsc(th1Ph, z)})) / sqrt(abs($x))"
    s"(CASE WHEN abs($x) < 3.0 THEN ($small) ELSE ($large) END)"
  }

  /** Y₀(x), x > 0 (bessel.py y0): A&S 9.4.2 / 9.4.3. */
  def besselY0(x: Column): Column = {
    val small = lit(2.0 / math.Pi) * log(x / lit(2.0)) * besselJ0(x) +
      hornerAsc(y0Small, (x / lit(3.0)) * (x / lit(3.0)))
    val z = lit(3.0) / x
    val large = hornerAsc(f0Mod, z) * sin(x + hornerAsc(th0Ph, z)) / sqrt(x)
    when(x < 3.0, small).otherwise(large)
  }

  /** sql mirror of [[besselY0]]; caller guarantees x > 0. */
  def sqlBesselY0(x: String): String = {
    val small = s"CAST('${2.0 / math.Pi}' AS DOUBLE) * ln(($x) / 2.0) * " +
      s"(${sqlBesselJ0(x)}) + (${sqlHornerAsc(y0Small, s"(($x) / 3.0) * (($x) / 3.0)")})"
    val z = s"(3.0 / ($x))"
    val large = s"(${sqlHornerAsc(f0Mod, z)}) * sin(($x) + " +
      s"(${sqlHornerAsc(th0Ph, z)})) / sqrt($x)"
    s"(CASE WHEN ($x) < 3.0 THEN ($small) ELSE ($large) END)"
  }

  /** Y₁(x), x > 0 (bessel.py y1): A&S 9.4.5 / 9.4.6. */
  def besselY1(x: Column): Column = {
    val small = (lit(2.0 / math.Pi) * x * log(x / lit(2.0)) * besselJ1(x) +
      hornerAsc(y1Small, (x / lit(3.0)) * (x / lit(3.0)))) / x
    val z = lit(3.0) / x
    val large = hornerAsc(f1Mod, z) * sin(x + hornerAsc(th1Ph, z)) / sqrt(x)
    when(x < 3.0, small).otherwise(large)
  }

  /** sql mirror of [[besselY1]]; caller guarantees x > 0. */
  def sqlBesselY1(x: String): String = {
    val small = s"(CAST('${2.0 / math.Pi}' AS DOUBLE) * ($x) * ln(($x) / 2.0) * " +
      s"(${sqlBesselJ1(x)}) + (${sqlHornerAsc(y1Small, s"(($x) / 3.0) * (($x) / 3.0)")})) / ($x)"
    val z = s"(3.0 / ($x))"
    val large = s"(${sqlHornerAsc(f1Mod, z)}) * sin(($x) + " +
      s"(${sqlHornerAsc(th1Ph, z)})) / sqrt($x)"
    s"(CASE WHEN ($x) < 3.0 THEN ($small) ELSE ($large) END)"
  }

  /** I₀(x) (bessel.py i0): A&S 9.8.1 / 9.8.2; even. */
  def besselI0(x: Column): Column = {
    val ax = abs(x)
    val small = hornerAsc(i0Small, (x / lit(3.75)) * (x / lit(3.75)))
    val large = exp(ax) / sqrt(ax) * hornerAsc(i0Large, lit(3.75) / ax)
    when(ax < 3.75, small).otherwise(large)
  }

  /** sql mirror of [[besselI0]]. */
  def sqlBesselI0(x: String): String = {
    val small = sqlHornerAsc(i0Small, s"(($x) / 3.75) * (($x) / 3.75)")
    val large = s"exp(abs($x)) / sqrt(abs($x)) * " +
      s"(${sqlHornerAsc(i0Large, s"(3.75 / abs($x))")})"
    s"(CASE WHEN abs($x) < 3.75 THEN ($small) ELSE ($large) END)"
  }

  /** I₁(x) (bessel.py i1): A&S 9.8.3 / 9.8.4; odd. */
  def besselI1(x: Column): Column = {
    val ax = abs(x)
    val small = x * hornerAsc(i1Small, (x / lit(3.75)) * (x / lit(3.75)))
    val large = signum(x) * exp(ax) / sqrt(ax) * hornerAsc(i1Large, lit(3.75) / ax)
    when(ax < 3.75, small).otherwise(large)
  }

  /** sql mirror of [[besselI1]]. */
  def sqlBesselI1(x: String): String = {
    val small = s"($x) * (${sqlHornerAsc(i1Small, s"(($x) / 3.75) * (($x) / 3.75)")})"
    val large = s"sign($x) * exp(abs($x)) / sqrt(abs($x)) * " +
      s"(${sqlHornerAsc(i1Large, s"(3.75 / abs($x))")})"
    s"(CASE WHEN abs($x) < 3.75 THEN ($small) ELSE ($large) END)"
  }

  /** K₀(x), x > 0 (bessel.py k0): A&S 9.8.5 / 9.8.6. */
  def besselK0(x: Column): Column = {
    val small = -log(x / lit(2.0)) * besselI0(x) +
      hornerAsc(k0Small, (x / lit(2.0)) * (x / lit(2.0)))
    val large = exp(-x) / sqrt(x) * hornerAsc(k0Large, lit(2.0) / x)
    when(x < 2.0, small).otherwise(large)
  }

  /** sql mirror of [[besselK0]]; caller guarantees x > 0. */
  def sqlBesselK0(x: String): String = {
    val small = s"-ln(($x) / 2.0) * (${sqlBesselI0(x)}) + " +
      s"(${sqlHornerAsc(k0Small, s"(($x) / 2.0) * (($x) / 2.0)")})"
    val large = s"exp(-($x)) / sqrt($x) * (${sqlHornerAsc(k0Large, s"(2.0 / ($x))")})"
    s"(CASE WHEN ($x) < 2.0 THEN ($small) ELSE ($large) END)"
  }

  /** K₁(x), x > 0 (bessel.py k1): A&S 9.8.7 / 9.8.8. */
  def besselK1(x: Column): Column = {
    val small = (x * log(x / lit(2.0)) * besselI1(x) +
      hornerAsc(k1Small, (x / lit(2.0)) * (x / lit(2.0)))) / x
    val large = exp(-x) / sqrt(x) * hornerAsc(k1Large, lit(2.0) / x)
    when(x < 2.0, small).otherwise(large)
  }

  /** sql mirror of [[besselK1]]; caller guarantees x > 0. */
  def sqlBesselK1(x: String): String = {
    val small = s"(($x) * ln(($x) / 2.0) * (${sqlBesselI1(x)}) + " +
      s"(${sqlHornerAsc(k1Small, s"(($x) / 2.0) * (($x) / 2.0)")})) / ($x)"
    val large = s"exp(-($x)) / sqrt($x) * (${sqlHornerAsc(k1Large, s"(2.0 / ($x))")})"
    s"(CASE WHEN ($x) < 2.0 THEN ($small) ELSE ($large) END)"
  }

  // ------- regularized incomplete gamma / beta (gamma_funcs.py) -------
  // gammainc/gammaincc/betainc as FIXED-DEPTH compositions — the same
  // algorithms StatTests iterates adaptively, but unrolled inside-out
  // so the whole computation is one deterministic expression tree with
  // LINEAR size (a continued fraction built bottom-up needs no Lentz
  // normalization), mirrorable operation-for-operation into DuckDB SQL.
  // This is what upgrades p-values from spec-pinned to differentially
  // verified: P(a,x) for x < a+1 by the ascending series
  //   P = e^(−x + a·ln x − lnΓ(a)) · (1/a)·(1 + x/(a+1)(1 + x/(a+2)(…)))
  // (80 nested terms), Q(a,x) for x ≥ a+1 by the classical CF
  //   Q = e^(−x + a·ln x − lnΓ(a)) / (x+1−a + K_i(−i(i−a)/(x+1−a+2i)))
  // (60 levels). Accuracy ~1e-14 for a ∈ (0, 60], x ∈ [0, 200] —
  // beyond that the fixed depths run out (the adaptive StatTests forms
  // remain the general path). gammaln's mirror covers x > 0.5 (the
  // Lanczos direct branch — incomplete-gamma callers have a > 0.5).

  private val seriesDepth = 80
  private val cfDepth = 60

  /** sql mirror of [[gammaln]]'s direct (x > 0.5) branch. */
  def sqlGammalnPos(x: String): String = {
    val z = s"(($x) - 1.0)"
    val series = lanczosC.zipWithIndex.tail.foldLeft(
      s"CAST('${lanczosC.head}' AS DOUBLE)") { case (acc, (ci, i)) =>
      s"(($acc) + CAST('$ci' AS DOUBLE) / (($z) + CAST('${i.toDouble}' AS DOUBLE)))"
    }
    val t = s"(($z) + 7.5)"
    s"(CAST('${0.5 * math.log(2.0 * math.Pi)}' AS DOUBLE) + " +
      s"(($z) + 0.5) * ln($t) - ($t) + ln($series))"
  }

  private def gammaPrefix(a: Column, x: Column): Column =
    exp(-x + a * log(x) - gammalnPos(a))
  // gammaln restricted to the direct branch so Column and SQL shapes match
  private def gammalnPos(a: Column): Column = lanczosCore(a - lit(1.0))
  private def sqlGammaPrefix(a: String, x: String): String =
    s"exp(-($x) + ($a) * ln($x) - (${sqlGammalnPos(a)}))"

  /** Regularized lower incomplete gamma P(a,x) (gamma_funcs.py
    * gammainc), a ∈ (0, 60], x ≥ 0; P(a,0) = 0. */
  def gammaincP(a: Column, x: Column): Column =
    gammaincPDepth(a, x, seriesDepth, cfDepth)

  /** [[gammaincP]] at caller-chosen depths — the shallow form the
    * Newton inverse uses per step (its SQL mirror must fit several P
    * evaluations under DuckDB's ~164-subselect ceiling). */
  def gammaincPDepth(a: Column, x: Column, sd: Int, cd: Int): Column = {
    // ascending series, sd terms nested inside-out
    var s: Column = lit(1.0)
    for (n <- sd to 1 by -1)
      s = lit(1.0) + x / (a + lit(n.toDouble)) * s
    val pSeries = gammaPrefix(a, x) * s / a
    // continued fraction for Q, cd levels bottom-up
    var f: Column = x + lit(1.0) - a + lit(2.0 * cd)
    for (i <- cd to 1 by -1)
      f = x + lit(1.0) - a + lit(2.0 * (i - 1)) +
        lit(-i.toDouble) * (lit(i.toDouble) - a) / f
    val qCf = gammaPrefix(a, x) / f
    when(x === 0.0, lit(0.0))
      .when(x < a + lit(1.0), pSeries)
      .otherwise(lit(1.0) - qCf)
  }

  /** Regularized upper incomplete gamma Q(a,x) = 1 − P(a,x)
    * (gamma_funcs.py gammaincc). */
  def gammaincQ(a: Column, x: Column): Column = {
    var s: Column = lit(1.0)
    for (n <- seriesDepth to 1 by -1)
      s = lit(1.0) + x / (a + lit(n.toDouble)) * s
    val pSeries = gammaPrefix(a, x) * s / a
    var f: Column = x + lit(1.0) - a + lit(2.0 * cfDepth)
    for (i <- cfDepth to 1 by -1)
      f = x + lit(1.0) - a + lit(2.0 * (i - 1)) +
        lit(-i.toDouble) * (lit(i.toDouble) - a) / f
    val qCf = gammaPrefix(a, x) / f
    when(x === 0.0, lit(1.0))
      .when(x < a + lit(1.0), lit(1.0) - pSeries)
      .otherwise(qCf)
  }

  /** DuckDB mirror of [[gammaincP]]/[[gammaincQ]]. DuckDB's expression
    * binder caps nesting at 128, so the 80-term series / 60-level CF
    * cannot be emitted as one fragment — instead this wraps `from` in
    * one staged subselect PER ITERATION (same trick as [[sqlEllipKE]];
    * the per-stage update replays the identical operation shape as the
    * Column loop). Emits `g_p_<sfx>` / `g_q_<sfx>` per (sfx, aExpr,
    * xExpr) triple, with `carry` passed through. */
  def sqlGammaincPQ(from: String, pairs: Seq[(String, String, String)],
      carry: Seq[String]): String =
    sqlGammaincPQDepth(from, pairs, carry, seriesDepth, cfDepth)

  /** [[sqlGammaincPQ]] at caller-chosen depths (see
    * [[gammaincPDepth]]). */
  def sqlGammaincPQDepth(from: String, pairs: Seq[(String, String, String)],
      carry: Seq[String], sd: Int, cd: Int): String = {
    // The CF recurrence only advances while k <= cd inside the shared
    // k <- sd..1 loop; a cd > sd call would silently drop the top
    // cd - sd continued-fraction levels and diverge from
    // gammaincPDepth's independent CF loop (r11 ADVICE).
    require(cd <= sd, s"sqlGammaincPQDepth: cfDepth $cd > seriesDepth $sd")
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep, " + pairs.map { case (sfx, a, x) =>
      s"CAST(($a) AS DOUBLE) AS a_$sfx, CAST(($x) AS DOUBLE) AS x_$sfx"
    }.mkString(", ") + s" FROM $from"
    q = s"SELECT $keep, " + pairs.map { case (sfx, _, _) =>
      s"a_$sfx, x_$sfx, CAST(1.0 AS DOUBLE) AS s_$sfx, " +
        s"(x_$sfx + 1.0 - a_$sfx + CAST('${2.0 * cd}' AS DOUBLE)) AS f_$sfx"
    }.mkString(", ") + s" FROM ($q)"
    for (k <- sd to 1 by -1) {
      q = s"SELECT $keep, " + pairs.map { case (sfx, _, _) =>
        val sNew = s"(1.0 + x_$sfx / (a_$sfx + " +
          s"CAST('${k.toDouble}' AS DOUBLE)) * s_$sfx)"
        val fNew = if (k <= cd)
          s"(x_$sfx + 1.0 - a_$sfx + CAST('${2.0 * (k - 1)}' AS DOUBLE) + " +
            s"CAST('${-k.toDouble}' AS DOUBLE) * " +
            s"(CAST('${k.toDouble}' AS DOUBLE) - a_$sfx) / f_$sfx)"
        else s"f_$sfx"
        s"a_$sfx, x_$sfx, $sNew AS s_$sfx, $fNew AS f_$sfx"
      }.mkString(", ") + s" FROM ($q)"
    }
    s"SELECT $keep, " + pairs.map { case (sfx, _, _) =>
      val a = s"a_$sfx"; val x = s"x_$sfx"
      val prefix = sqlGammaPrefix(a, x)
      val pSeries = s"(($prefix) * (s_$sfx) / ($a))"
      val qCf = s"(($prefix) / (f_$sfx))"
      s"(CASE WHEN ($x) = 0.0 THEN 0.0 WHEN ($x) < ($a) + 1.0 " +
        s"THEN ($pSeries) ELSE (1.0 - ($qCf)) END) AS g_p_$sfx, " +
        s"(CASE WHEN ($x) = 0.0 THEN 1.0 WHEN ($x) < ($a) + 1.0 " +
        s"THEN (1.0 - ($pSeries)) ELSE ($qCf) END) AS g_q_$sfx"
    }.mkString(", ") + s" FROM ($q)"
  }

  /** Regularized incomplete beta I_x(a,b) (gamma_funcs.py betainc):
    * the classical even/odd-d continued fraction, 2·40 levels unrolled
    * bottom-up, with the standard symmetry switch at
    * x = (a+1)/(a+b+2). Accuracy ~1e-13 for a,b ∈ (0, 60]. */
  def betaincReg(a: Column, b: Column, x: Column): Column =
    betaincRegDepth(a, b, x, 40)

  /** [[betaincReg]] at caller-chosen CF depth (2·levels d-terms) — the
    * shallow per-Newton-step form of the inverse. */
  def betaincRegDepth(a: Column, b: Column, x: Column, levels: Int): Column = {
    def cf(aa: Column, bb: Column, xx: Column): Column = {
      // d_1..d_2L from the bottom: CF = 1 + d1/(1 + d2/(1 + …))
      var f: Column = lit(1.0)
      for (m <- levels to 1 by -1) {
        val mD = lit(m.toDouble)
        val dEven = mD * (bb - mD) * xx /
          ((aa + lit(2.0) * mD - lit(1.0)) * (aa + lit(2.0) * mD))
        f = lit(1.0) + dEven / f
        val dOdd = -(aa + mD - lit(1.0)) * (aa + bb + mD - lit(1.0)) * xx /
          ((aa + lit(2.0) * mD - lit(2.0)) * (aa + lit(2.0) * mD - lit(1.0)))
        f = lit(1.0) + dOdd / f
      }
      exp(aa * log(xx) + bb * log(lit(1.0) - xx) +
        gammalnPos(aa + bb) - gammalnPos(aa) - gammalnPos(bb)) / (aa * f)
    }
    val direct = cf(a, b, x)
    val flipped = lit(1.0) - cf(b, a, lit(1.0) - x)
    when(x === 0.0, lit(0.0)).when(x === 1.0, lit(1.0))
      .when(x < (a + lit(1.0)) / (a + b + lit(2.0)), direct)
      .otherwise(flipped)
  }

  /** DuckDB mirror of [[betaincReg]], staged like [[sqlGammaincPQ]]
    * (binder depth): each (sfx, a, b, x) quadruple runs TWO CF chains —
    * direct (a,b,x) and flipped (b,a,1−x), the symmetry switch picking
    * per row — and emits `bi_<sfx>`. */
  def sqlBetaincStaged(from: String, pairs: Seq[(String, String, String, String)],
      carry: Seq[String]): String =
    sqlBetaincStagedDepth(from, pairs, carry, 40)

  /** [[sqlBetaincStaged]] at caller-chosen CF depth (see
    * [[betaincRegDepth]]). */
  def sqlBetaincStagedDepth(from: String, pairs: Seq[(String, String, String, String)],
      carry: Seq[String], levels: Int): String = {
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep, " + pairs.map { case (sfx, a, b, x) =>
      s"CAST(($a) AS DOUBLE) AS ad_$sfx, CAST(($b) AS DOUBLE) AS bd_$sfx, " +
        s"CAST(($x) AS DOUBLE) AS xd_$sfx"
    }.mkString(", ") + s" FROM $from"
    q = s"SELECT $keep, " + pairs.map { case (sfx, _, _, _) =>
      s"ad_$sfx, bd_$sfx, xd_$sfx, bd_$sfx AS af_$sfx, ad_$sfx AS bf_$sfx, " +
        s"(1.0 - xd_$sfx) AS xf_$sfx, " +
        s"CAST(1.0 AS DOUBLE) AS fd_$sfx, CAST(1.0 AS DOUBLE) AS ff_$sfx"
    }.mkString(", ") + s" FROM ($q)"
    for (m <- levels to 1 by -1) {
      val mD = s"CAST('${m.toDouble}' AS DOUBLE)"
      def step(aa: String, bb: String, xx: String, f: String): String = {
        val dEven = s"($mD * (($bb) - $mD) * ($xx) / " +
          s"((($aa) + 2.0 * $mD - 1.0) * (($aa) + 2.0 * $mD)))"
        val dOdd = s"(-(($aa) + $mD - 1.0) * (($aa) + ($bb) + $mD - 1.0) * ($xx) / " +
          s"((($aa) + 2.0 * $mD - 2.0) * (($aa) + 2.0 * $mD - 1.0)))"
        s"(1.0 + ($dOdd) / (1.0 + ($dEven) / ($f)))"
      }
      q = s"SELECT $keep, " + pairs.map { case (sfx, _, _, _) =>
        s"ad_$sfx, bd_$sfx, xd_$sfx, af_$sfx, bf_$sfx, xf_$sfx, " +
          s"${step(s"ad_$sfx", s"bd_$sfx", s"xd_$sfx", s"fd_$sfx")} AS fd_$sfx, " +
          s"${step(s"af_$sfx", s"bf_$sfx", s"xf_$sfx", s"ff_$sfx")} AS ff_$sfx"
      }.mkString(", ") + s" FROM ($q)"
    }
    s"SELECT $keep, " + pairs.map { case (sfx, _, _, _) =>
      def bt(aa: String, bb: String, xx: String, f: String) =
        s"(exp(($aa) * ln($xx) + ($bb) * ln(1.0 - ($xx)) + " +
          s"(${sqlGammalnPos(s"(($aa) + ($bb))")}) - (${sqlGammalnPos(aa)}) - " +
          s"(${sqlGammalnPos(bb)})) / (($aa) * ($f)))"
      val direct = bt(s"ad_$sfx", s"bd_$sfx", s"xd_$sfx", s"fd_$sfx")
      val flipped = s"(1.0 - ${bt(s"af_$sfx", s"bf_$sfx", s"xf_$sfx", s"ff_$sfx")})"
      s"(CASE WHEN (xd_$sfx) = 0.0 THEN 0.0 WHEN (xd_$sfx) = 1.0 THEN 1.0 " +
        s"WHEN (xd_$sfx) < ((ad_$sfx) + 1.0) / ((ad_$sfx) + (bd_$sfx) + 2.0) " +
        s"THEN ($direct) ELSE ($flipped) END) AS bi_$sfx"
    }.mkString(", ") + s" FROM ($q)"
  }

  /** Two-sided normal-approximation p-value p = erfc(|z|/√2) via the
    * A&S 7.1.26 polynomial — the exact op sequence StatTests' rank-test
    * UDFs run, as a Column so the oracle can replay it. */
  def normalTwoSidedP(z: Column): Column = {
    val x = abs(z) / lit(math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    least(lit(1.0), poly * exp(-x * x))
  }

  /** sql mirror of [[normalTwoSidedP]]. */
  def sqlNormalTwoSidedP(z: String): String = {
    val x = s"(abs($z) / CAST('${math.sqrt(2.0)}' AS DOUBLE))"
    val t = s"(1.0 / (1.0 + CAST('0.3275911' AS DOUBLE) * $x))"
    val poly = s"($t * (CAST('0.254829592' AS DOUBLE) + $t * " +
      s"(CAST('-0.284496736' AS DOUBLE) + $t * (CAST('1.421413741' AS DOUBLE) + " +
      s"$t * (CAST('-1.453152027' AS DOUBLE) + $t * CAST('1.061405429' AS DOUBLE))))))"
    s"least(1.0, ($poly) * exp(-($x) * ($x)))"
  }

  /** Kolmogorov–Smirnov survival function
    * 2Σ(−1)^(k−1)·e^(−2k²λ²), 20 terms (ks.py two-sided p). */
  def kolmogorovSfFixed(lambda: Column): Column = {
    val l2 = lambda * lambda
    val sum = (1 to 20).map(k =>
      lit(if (k % 2 == 1) 2.0 else -2.0) * exp(lit(-2.0 * k * k) * l2))
      .reduceLeft(_ + _)
    greatest(lit(0.0), least(lit(1.0), sum))
  }

  /** sql mirror of [[kolmogorovSfFixed]]. */
  def sqlKolmogorovSfFixed(lambda: String): String = {
    val l2 = s"(($lambda) * ($lambda))"
    val sum = (1 to 20).map(k =>
      s"CAST('${if (k % 2 == 1) 2.0 else -2.0}' AS DOUBLE) * " +
        s"exp(CAST('${-2.0 * k * k}' AS DOUBLE) * $l2)")
      .reduceLeft((a, b) => s"(($a) + ($b))")
    s"greatest(0.0, least(1.0, ($sum)))"
  }

  // ------- windowed hypergeometric functions (hypergeometric_funcs.py)
  // Gauss ₂F₁(a,b;c;x) and Kummer ₁F₁(a;b;x) as fixed-depth nested
  // series (60 / 80 terms, built inside-out — linear expression trees):
  //   S = 1 + (a+k−1)(b+k−1)/((c+k−1)k)·x·S   (₂F₁)
  //   S = 1 + (a+k−1)/((b+k−1)k)·x·S          (₁F₁)
  // Windows: ₂F₁ needs |x| ≤ 0.7 (tail ≲ 0.7⁶⁰ ≈ 5e-10 for moderate
  // parameters), ₁F₁ |x| ≤ 20 (x⁸⁰/80! ≈ 1e-7; worst negative-x
  // cancellation ~1e-7 relative) — NaN outside, parameters |·| ≤ ~30
  // and c (resp. b) not a non-positive integer are the caller's
  // contract. The sql*Staged mirrors stage one subselect per term
  // (binder depth). The real 2F1 axis is COMPLETE for z < 1 (series +
  // Pfaff + 15.8.4 + 15.8.2); only the complex plane (and the z > 1
  // branch cut, where 2F1 is genuinely complex-valued) stays out of
  // scope.

  private val hyp2f1Depth = 60
  private val hyp1f1Depth = 80

  /** ₂F₁(a,b;c;x), |x| ≤ 0.7 window (NaN outside). */
  def hyp2f1(a: Column, b: Column, c: Column, x: Column): Column = {
    var s: Column = lit(1.0)
    for (k <- hyp2f1Depth to 1 by -1) {
      val km1 = lit((k - 1).toDouble); val kD = lit(k.toDouble)
      s = lit(1.0) + (a + km1) * (b + km1) / ((c + km1) * kD) * x * s
    }
    when(abs(x) <= 0.7, s).otherwise(lit(Double.NaN))
  }

  /** ₂F₁ continued to negative arguments by the Pfaff transformation
    * (DLMF 15.8.1): F(a,b;c;z) = (1−z)^(−b)·F(c−a, b; c; z/(z−1)).
    * For z < 0 the mapped argument w = z/(z−1) lies in (0, 1), and
    * w ≤ 0.7 ⟺ z ≥ −7/3; below −7/3 the 1/z connection
    * ([[hyp2f1Far]], r13) takes over — so the combined real-axis
    * window is the ENTIRE z < 1 ray (plus (0.7, 1) via
    * [[hyp2f1Near1]]), with each branch's inner series guard still
    * enforcing its own window. */
  def hyp2f1Ext(a: Column, b: Column, c: Column, z: Column): Column =
    when(z < lit(-7.0 / 3.0), hyp2f1Far(a, b, c, z))
      .when(z < 0.0,
        pow(lit(1.0) - z, -b) * hyp2f1(c - a, b, c, z / (z - lit(1.0))))
      .when(z > 0.7, hyp2f1Near1(a, b, c, z))
      .otherwise(hyp2f1(a, b, c, z))

  /** Far-left continuation (DLMF 15.8.2 on the real ray z < −7/3,
    * where w = 1/z ∈ (−3/7, 0) sits inside the series window — every
    * quantity stays REAL, r13, retiring the "z < −7/3 out of scope"
    * note):
    *   F(a,b;c;z) = Γ(c)Γ(b−a)/(Γ(b)Γ(c−a))·(−z)^(−a)·F(a, a−c+1; 1−ε; w)
    *              + Γ(c)Γ(a−b)/(Γ(a)Γ(c−b))·(−z)^(−b)·F(b, b−c+1; 1+ε; w)
    * with ε = b − a. Contract (the hyp2f1Near1 convention): 0 < a < b
    * < c and ε ∈ (0, 1) — Γ(−ε) goes through the Γ(2−ε)/((−ε)(1−ε))
    * recurrence, everything else on the positive Lanczos branch;
    * violations go NaN loudly. Validated against the Pfaff branch on
    * the overlap and the exact Euler identity deep in the tail
    * (SpecialSpec; machine-precision agreement in the derivation
    * check). */
  def hyp2f1Far(a: Column, b: Column, c: Column, z: Column): Column = {
    val w = lit(1.0) / z
    val eps = b - a
    val g1 = exp(gammalnPos(c) + gammalnPos(eps) -
      gammalnPos(b) - gammalnPos(c - a))
    val gme = exp(gammalnPos(lit(2.0) - eps)) / ((-eps) * (lit(1.0) - eps))
    val g2 = exp(gammalnPos(c)) * gme /
      (exp(gammalnPos(a)) * exp(gammalnPos(c - b)))
    g1 * pow(-z, -a) * hyp2f1(a, a - c + lit(1.0), lit(1.0) - eps, w) +
      g2 * pow(-z, -b) * hyp2f1(b, b - c + lit(1.0), lit(1.0) + eps, w)
  }

  /** DuckDB mirror of [[hyp2f1Far]]: exposes `h2f_<sfx>` over
    * [[sqlHypStaged]]. Spec: (sfx, aExpr, bExpr, cExpr, zExpr). */
  def sqlHyp2f1Far(from: String,
      specs: Seq[(String, String, String, String, String)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val staged0 = s"SELECT $keep, " + specs.map { case (s, a, b, c, z) =>
      s"CAST(($a) AS DOUBLE) AS fa_$s, CAST(($b) AS DOUBLE) AS fb_$s, " +
        s"CAST(($c) AS DOUBLE) AS fc_$s, CAST(($z) AS DOUBLE) AS fz_$s"
    }.mkString(", ") + s" FROM $from"
    val staged1 = s"SELECT *, " + specs.map { case (s, _, _, _, _) =>
      s"fb_$s - fa_$s AS fe_$s, CAST(1.0 AS DOUBLE) / fz_$s AS fw_$s"
    }.mkString(", ") + s" FROM ($staged0)"
    val carry2 = carry ++ specs.flatMap { case (s, _, _, _, _) =>
      Seq(s"fa_$s", s"fb_$s", s"fc_$s", s"fz_$s", s"fe_$s") }
    val hyp = sqlHypStaged(s"($staged1)",
      specs.flatMap { case (s, _, _, _, _) => Seq(
        (s"${s}t1", s"fa_$s", s"fa_$s - fc_$s + 1.0", s"1.0 - fe_$s",
          s"fw_$s"),
        (s"${s}t2", s"fb_$s", s"fb_$s - fc_$s + 1.0", s"1.0 + fe_$s",
          s"fw_$s")) },
      Nil, carry2)
    s"SELECT $keep, " + specs.map { case (s, _, _, _, _) =>
      val g1 = s"exp(${sqlGammalnPos(s"fc_$s")} + ${sqlGammalnPos(s"fe_$s")} - " +
        s"${sqlGammalnPos(s"fb_$s")} - ${sqlGammalnPos(s"fc_$s - fa_$s")})"
      val gme = s"(exp(${sqlGammalnPos(s"2.0 - fe_$s")}) / " +
        s"((-fe_$s) * (1.0 - fe_$s)))"
      val g2 = s"(exp(${sqlGammalnPos(s"fc_$s")}) * $gme / " +
        s"(exp(${sqlGammalnPos(s"fa_$s")}) * exp(${sqlGammalnPos(s"fc_$s - fb_$s")})))"
      s"$g1 * power(-fz_$s, -fa_$s) * h2_${s}t1 + " +
        s"$g2 * power(-fz_$s, -fb_$s) * h2_${s}t2 AS h2f_$s"
    }.mkString(", ") + s" FROM ($hyp)"
  }

  /** z → 1 endpoint connection (DLMF 15.8.4), windowed to
    * δ = c−a−b ∈ (0, 1) with a, b > 0, c > a, c > b (every Γ reachable
    * on the positive Lanczos branch — Γ(−δ) through the recurrence
    * Γ(−δ) = Γ(2−δ)/((−δ)(1−δ))) and z ∈ (0.7, 1) so both mapped
    * series run at 1−z < 0.3:
    *   F(a,b;c;z) = Γ(c)Γ(δ)/(Γ(c−a)Γ(c−b))·F(a,b;1−δ;1−z)
    *              + (1−z)^δ·Γ(c)Γ(−δ)/(Γ(a)Γ(b))·F(c−a,c−b;1+δ;1−z)
    * The two terms are O(1) with no catastrophic cancellation in the
    * window (mpmath-checked). Outside the δ contract the gammas go NaN
    * loudly rather than silently wrong. */
  def hyp2f1Near1(a: Column, b: Column, c: Column, z: Column): Column = {
    val d = c - a - b
    val w = lit(1.0) - z
    val g1 = exp(gammalnPos(c) + gammalnPos(d) -
      gammalnPos(c - a) - gammalnPos(c - b))
    val gnd = exp(gammalnPos(lit(2.0) - d)) / ((-d) * (lit(1.0) - d))
    val g2 = exp(gammalnPos(c)) * gnd /
      (exp(gammalnPos(a)) * exp(gammalnPos(b)))
    g1 * hyp2f1(a, b, lit(1.0) - d, w) +
      pow(w, d) * g2 * hyp2f1(c - a, c - b, lit(1.0) + d, w)
  }

  /** DuckDB mirror of [[hyp2f1Near1]]: exposes `h2n_<sfx>` over
    * [[sqlHypStaged]]. Spec: (sfx, aExpr, bExpr, cExpr, zExpr). */
  def sqlHyp2f1Near1(from: String,
      specs: Seq[(String, String, String, String, String)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val staged0 = s"SELECT $keep, " + specs.map { case (s, a, b, c, z) =>
      s"CAST(($a) AS DOUBLE) AS na_$s, CAST(($b) AS DOUBLE) AS nb_$s, " +
        s"CAST(($c) AS DOUBLE) AS nc_$s, CAST(($z) AS DOUBLE) AS nz_$s"
    }.mkString(", ") + s" FROM $from"
    val staged1 = s"SELECT *, " + specs.map { case (s, _, _, _, _) =>
      s"nc_$s - na_$s - nb_$s AS nd_$s, " +
        s"CAST(1.0 AS DOUBLE) - nz_$s AS nw_$s"
    }.mkString(", ") + s" FROM ($staged0)"
    val carry2 = carry ++ specs.flatMap { case (s, _, _, _, _) =>
      Seq(s"na_$s", s"nb_$s", s"nc_$s", s"nd_$s", s"nw_$s") }
    val hyp = sqlHypStaged(s"($staged1)",
      specs.flatMap { case (s, _, _, _, _) => Seq(
        (s"${s}t1", s"na_$s", s"nb_$s", s"1.0 - nd_$s", s"nw_$s"),
        (s"${s}t2", s"nc_$s - na_$s", s"nc_$s - nb_$s", s"1.0 + nd_$s",
          s"nw_$s")) },
      Nil, carry2)
    s"SELECT $keep, " + specs.map { case (s, _, _, _, _) =>
      val g1 = s"exp(${sqlGammalnPos(s"nc_$s")} + ${sqlGammalnPos(s"nd_$s")} - " +
        s"${sqlGammalnPos(s"nc_$s - na_$s")} - ${sqlGammalnPos(s"nc_$s - nb_$s")})"
      val gnd = s"(exp(${sqlGammalnPos(s"2.0 - nd_$s")}) / " +
        s"((-nd_$s) * (1.0 - nd_$s)))"
      val g2 = s"(exp(${sqlGammalnPos(s"nc_$s")}) * $gnd / " +
        s"(exp(${sqlGammalnPos(s"na_$s")}) * exp(${sqlGammalnPos(s"nb_$s")})))"
      s"$g1 * h2_${s}t1 + power(nw_$s, nd_$s) * $g2 * h2_${s}t2 AS h2n_$s"
    }.mkString(", ") + s" FROM ($hyp)"
  }

  /** ₁F₁(a;b;x), |x| ≤ 20 window (NaN outside). */
  def hyp1f1(a: Column, b: Column, x: Column): Column = {
    var s: Column = lit(1.0)
    for (k <- hyp1f1Depth to 1 by -1) {
      val km1 = lit((k - 1).toDouble); val kD = lit(k.toDouble)
      s = lit(1.0) + (a + km1) / ((b + km1) * kD) * x * s
    }
    when(abs(x) <= 20.0, s).otherwise(lit(Double.NaN))
  }

  private val hyp1f1AsymTerms = 16

  /** Kummer M(a;b;x) on the ENTIRE real axis (r13, the 1F1 sibling of
    * the 2F1 completion): the ±20 series window; the positive-x series
    * extension to 40 (all-positive terms, no cancellation — depth-80
    * tail < 1e-11 there); the Kummer reflection
    * M(a,b,x) = eˣ·M(b−a,b,−x) for x ∈ [−40,−20); and the DLMF 13.7.2
    * asymptotics beyond ±40 — eˣ·x^(a−b)·Γ(b)/Γ(a)·Σ(b−a)ₖ(1−a)ₖ/(k!xᵏ)
    * on the right, the algebraic y^(−a)·Γ(b)/Γ(b−a) twin on the left
    * (16 terms; ≤ 5e-15 rel at |x| ≥ 45 for a,b ≤ 2.6 in the
    * derivation check, ≲ 1e-11 at the 40 boundary). Contract:
    * 0 < a < b with modest magnitudes (positive-branch Γ; violations
    * go NaN loudly). */
  def hyp1f1Ext(a: Column, b: Column, x: Column): Column = {
    def rawSeries(aa: Column, bb: Column, xx: Column): Column = {
      var s: Column = lit(1.0)
      for (k <- hyp1f1Depth to 1 by -1) {
        val km1 = lit((k - 1).toDouble); val kD = lit(k.toDouble)
        s = lit(1.0) + (aa + km1) / ((bb + km1) * kD) * xx * s
      }
      s
    }
    def asymSum(p: Column, q: Column, inv: Column): Column = {
      var s: Column = lit(1.0)
      for (k <- hyp1f1AsymTerms to 1 by -1) {
        val km1 = lit((k - 1).toDouble); val kD = lit(k.toDouble)
        s = lit(1.0) + (p + km1) * (q + km1) / kD * inv * s
      }
      s
    }
    val y = -x
    when(x > 40.0,
      exp(gammalnPos(b) - gammalnPos(a) + x + (a - b) * log(x)) *
        asymSum(b - a, lit(1.0) - a, lit(1.0) / x))
      .when(x >= -20.0, rawSeries(a, b, x))
      .when(x >= -40.0, exp(x) * rawSeries(b - a, b, y))
      .otherwise(
        exp(gammalnPos(b) - gammalnPos(b - a) - a * log(y)) *
          asymSum(a, a - b + lit(1.0), lit(1.0) / y))
  }

  /** Staged DuckDB mirror of [[hyp1f1Ext]]: emits `h1e_<sfx>` per spec
    * (sfx, aExpr, bExpr, xExpr). The two depth-80 raw series stage one
    * subselect per term (binder depth); the 16-term asymptotic sums
    * inline. */
  def sqlHyp1f1ExtStaged(from: String,
      specs: Seq[(String, String, String, String)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep" + specs.map { case (s, a, b, x) =>
      s", CAST(($a) AS DOUBLE) AS ea_$s, CAST(($b) AS DOUBLE) AS eb_$s, " +
        s"CAST(($x) AS DOUBLE) AS ex_$s, CAST(1.0 AS DOUBLE) AS ed_$s, " +
        s"CAST(1.0 AS DOUBLE) AS ek_$s"
    }.mkString + s" FROM $from"
    for (k <- hyp1f1Depth to 1 by -1) {
      val km1 = s"CAST('${(k - 1).toDouble}' AS DOUBLE)"
      val kD = s"CAST('${k.toDouble}' AS DOUBLE)"
      q = s"SELECT $keep" + specs.map { case (s, _, _, _) =>
        // ed: the direct raw series at (a, b, x); ek: the Kummer twin
        // at (b−a, b, −x) — identical shapes to the Column loops
        s", ea_$s, eb_$s, ex_$s, " +
          s"(1.0 + (ea_$s + $km1) / ((eb_$s + $km1) * $kD) * ex_$s * ed_$s) " +
          s"AS ed_$s, " +
          s"(1.0 + (eb_$s - ea_$s + $km1) / ((eb_$s + $km1) * $kD) * " +
          s"(-ex_$s) * ek_$s) AS ek_$s"
      }.mkString + s" FROM ($q)"
    }
    def sqlAsymSum(p: String, qq: String, inv: String): String = {
      var s = "CAST(1.0 AS DOUBLE)"
      for (k <- hyp1f1AsymTerms to 1 by -1) {
        val km1 = s"CAST('${(k - 1).toDouble}' AS DOUBLE)"
        val kD = s"CAST('${k.toDouble}' AS DOUBLE)"
        s = s"(1.0 + (($p) + $km1) * (($qq) + $km1) / $kD * ($inv) * $s)"
      }
      s
    }
    s"SELECT $keep" + specs.map { case (s, _, _, _) =>
      val a = s"ea_$s"; val b = s"eb_$s"; val x = s"ex_$s"
      val yy = s"(-ex_$s)"
      val pos = s"(exp(${sqlGammalnPos(b)} - ${sqlGammalnPos(a)} + ($x) + " +
        s"(($a) - ($b)) * ln($x)) * " +
        s"${sqlAsymSum(s"($b) - ($a)", s"1.0 - ($a)", s"1.0 / ($x)")})"
      val neg = s"(exp(${sqlGammalnPos(b)} - ${sqlGammalnPos(s"($b) - ($a)")} - " +
        s"($a) * ln($yy)) * " +
        s"${sqlAsymSum(a, s"($a) - ($b) + 1.0", s"1.0 / ($yy)")})"
      s", (CASE WHEN ($x) > 40.0 THEN $pos " +
        s"WHEN ($x) >= -20.0 THEN ed_$s " +
        s"WHEN ($x) >= -40.0 THEN (exp($x) * ek_$s) " +
        s"ELSE $neg END) AS h1e_$s"
    }.mkString + s" FROM ($q)"
  }

  /** DuckDB mirror of [[hyp2f1]]/[[hyp1f1]], staged like
    * [[sqlGammaincPQ]]: `gauss` entries (sfx, a, b, c, x) emit
    * `h2_<sfx>`; `kummer` entries (sfx, a, b, x) emit `h1_<sfx>`. */
  def sqlHypStaged(from: String, gauss: Seq[(String, String, String, String, String)],
      kummer: Seq[(String, String, String, String)], carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep" +
      gauss.map { case (sfx, a, b, c, x) =>
        s", CAST(($a) AS DOUBLE) AS g2a_$sfx, CAST(($b) AS DOUBLE) AS g2b_$sfx, " +
          s"CAST(($c) AS DOUBLE) AS g2c_$sfx, CAST(($x) AS DOUBLE) AS g2x_$sfx, " +
          s"CAST(1.0 AS DOUBLE) AS g2s_$sfx"
      }.mkString +
      kummer.map { case (sfx, a, b, x) =>
        s", CAST(($a) AS DOUBLE) AS k1a_$sfx, CAST(($b) AS DOUBLE) AS k1b_$sfx, " +
          s"CAST(($x) AS DOUBLE) AS k1x_$sfx, CAST(1.0 AS DOUBLE) AS k1s_$sfx"
      }.mkString + s" FROM $from"
    val maxDepth = math.max(if (gauss.nonEmpty) hyp2f1Depth else 0,
      if (kummer.nonEmpty) hyp1f1Depth else 0)
    for (k <- maxDepth to 1 by -1) {
      val km1 = s"CAST('${(k - 1).toDouble}' AS DOUBLE)"
      val kD = s"CAST('${k.toDouble}' AS DOUBLE)"
      q = s"SELECT $keep" +
        gauss.map { case (sfx, _, _, _, _) =>
          val sNew = if (k <= hyp2f1Depth)
            s"(1.0 + (g2a_$sfx + $km1) * (g2b_$sfx + $km1) / " +
              s"((g2c_$sfx + $km1) * $kD) * g2x_$sfx * g2s_$sfx)"
          else s"g2s_$sfx"
          s", g2a_$sfx, g2b_$sfx, g2c_$sfx, g2x_$sfx, $sNew AS g2s_$sfx"
        }.mkString +
        kummer.map { case (sfx, _, _, _) =>
          val sNew = if (k <= hyp1f1Depth)
            s"(1.0 + (k1a_$sfx + $km1) / ((k1b_$sfx + $km1) * $kD) * " +
              s"k1x_$sfx * k1s_$sfx)"
          else s"k1s_$sfx"
          s", k1a_$sfx, k1b_$sfx, k1x_$sfx, $sNew AS k1s_$sfx"
        }.mkString + s" FROM ($q)"
    }
    s"SELECT $keep" +
      gauss.map { case (sfx, _, _, _, _) =>
        s", (CASE WHEN abs(g2x_$sfx) <= 0.7 THEN g2s_$sfx " +
          s"ELSE CAST('nan' AS DOUBLE) END) AS h2_$sfx"
      }.mkString +
      kummer.map { case (sfx, _, _, _) =>
        s", (CASE WHEN abs(k1x_$sfx) <= 20.0 THEN k1s_$sfx " +
          s"ELSE CAST('nan' AS DOUBLE) END) AS h1_$sfx"
      }.mkString + s" FROM ($q)"
  }

  // ---------------- Fresnel / Dawson (err_fresnel.py) ----------------
  // Fixed-degree series + asymptotic compositions, branch at |x| = 4:
  //  C(x) = Σ (−1)ᵏ(π/2)²ᵏ x⁴ᵏ⁺¹/((2k)!(4k+1)), S the odd companion —
  //  evaluated as x·Horner in x⁴ (45 terms; worst cancellation at the
  //  branch point ≈ 6e-8 absolute);
  //  beyond: C = ½ + f·sin(z) − g·cos(z), S = ½ − f·cos(z) − g·sin(z),
  //  z = πx²/2, f/g the standard (4k∓1)!! series in 1/(πx²) (10 terms,
  //  truncation ≲ 1e-11). Dawson F(x) = x·Horner in x² (56 terms) /
  //  (1/(2x))·Horner in 1/(2x²) (16 terms, ≲ 2e-8); erfi(x) =
  //  (2/√π)·exp(x²)·F(x). All are odd; coefficients are generated by
  //  exact double recurrences at class load and rendered identically
  //  into the Column tree and the sql* mirrors.

  private val fresnelCc: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = 1.0
    for (k <- 0 to 44) {
      b += a / (4 * k + 1)
      a *= -(math.Pi / 2.0) * (math.Pi / 2.0) / ((2 * k + 1) * (2 * k + 2))
    }
    b.result()
  }
  private val fresnelSc: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = math.Pi / 2.0
    for (k <- 0 to 44) {
      b += a / (4 * k + 3)
      a *= -(math.Pi / 2.0) * (math.Pi / 2.0) / ((2 * k + 2) * (2 * k + 3))
    }
    b.result()
  }
  // f: Σ (−1)ᵏ(4k−1)!!·uᵏ, g: Σ (−1)ᵏ(4k+1)!!·uᵏ in u = 1/(πx²)²
  private val fresnelFc: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = 1.0
    for (k <- 0 to 9) { b += a; a *= -(4.0 * k + 1.0) * (4.0 * k + 3.0) }
    b.result()
  }
  private val fresnelGc: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = 1.0
    for (k <- 0 to 9) { b += a; a *= -(4.0 * k + 3.0) * (4.0 * k + 5.0) }
    b.result()
  }
  private val dawsnSmall: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = 1.0
    for (k <- 0 to 55) { b += a; a *= -2.0 / (2.0 * k + 3.0) }
    b.result()
  }
  private val dawsnLarge: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = 1.0
    for (k <- 0 to 15) { b += a; a *= 2.0 * k + 1.0 }
    b.result()
  }

  /** (C(x), S(x)) Fresnel integrals (err_fresnel.py fresnel). */
  def fresnel(x: Column): (Column, Column) = {
    val ax = abs(x)
    val t4 = (ax * ax) * (ax * ax)
    val cSmall = ax * hornerAsc(fresnelCc, t4)
    val sSmall = ax * (ax * ax) * hornerAsc(fresnelSc, t4)
    val z = lit(math.Pi / 2.0) * (ax * ax)
    val u = lit(1.0) / (lit(math.Pi) * (ax * ax))
    // f = (1/(πx))·Σ(−1)ᵏ(4k−1)!!u²ᵏ, g = f's companion times one more u
    val fC = hornerAsc(fresnelFc, u * u) / (lit(math.Pi) * ax)
    val gC = hornerAsc(fresnelGc, u * u) / (lit(math.Pi) * ax) * u
    val cLarge = lit(0.5) + fC * sin(z) - gC * cos(z)
    val sLarge = lit(0.5) - fC * cos(z) - gC * sin(z)
    val c = when(ax < 4.0, cSmall).otherwise(cLarge)
    val s = when(ax < 4.0, sSmall).otherwise(sLarge)
    (signum(x) * c, signum(x) * s)
  }

  def fresnelC(x: Column): Column = fresnel(x)._1
  def fresnelS(x: Column): Column = fresnel(x)._2

  /** sql mirrors of [[fresnelC]]/[[fresnelS]]. */
  private def sqlFresnel(x: String, wantC: Boolean): String = {
    val ax = s"abs($x)"
    val t4 = s"(($ax) * ($ax)) * (($ax) * ($ax))"
    val z = s"(CAST('${math.Pi / 2.0}' AS DOUBLE) * (($ax) * ($ax)))"
    val u = s"(1.0 / (CAST('${math.Pi}' AS DOUBLE) * (($ax) * ($ax))))"
    val fC = s"((${sqlHornerAsc(fresnelFc, s"($u) * ($u)")}) / " +
      s"(CAST('${math.Pi}' AS DOUBLE) * ($ax)))"
    val gC = s"((${sqlHornerAsc(fresnelGc, s"($u) * ($u)")}) / " +
      s"(CAST('${math.Pi}' AS DOUBLE) * ($ax)) * ($u))"
    val (small, large) =
      if (wantC) (s"($ax) * (${sqlHornerAsc(fresnelCc, t4)})",
        s"0.5 + ($fC) * sin($z) - ($gC) * cos($z)")
      else (s"($ax) * (($ax) * ($ax)) * (${sqlHornerAsc(fresnelSc, t4)})",
        s"0.5 - ($fC) * cos($z) - ($gC) * sin($z)")
    s"(sign($x) * (CASE WHEN abs($x) < 4.0 THEN ($small) ELSE ($large) END))"
  }
  def sqlFresnelC(x: String): String = sqlFresnel(x, wantC = true)
  def sqlFresnelS(x: String): String = sqlFresnel(x, wantC = false)

  /** Dawson integral F(x) = e^(−x²)∫₀ˣe^(t²)dt (err_fresnel.py dawsn). */
  def dawsn(x: Column): Column = {
    val small = x * hornerAsc(dawsnSmall, x * x)
    val w = lit(1.0) / (lit(2.0) * x * x)
    val large = hornerAsc(dawsnLarge, w) / (lit(2.0) * x)
    when(abs(x) < 4.0, small).otherwise(large)
  }

  /** sql mirror of [[dawsn]]. */
  def sqlDawsn(x: String): String = {
    val small = s"($x) * (${sqlHornerAsc(dawsnSmall, s"($x) * ($x)")})"
    val w = s"(1.0 / (2.0 * ($x) * ($x)))"
    val large = s"(${sqlHornerAsc(dawsnLarge, w)}) / (2.0 * ($x))"
    s"(CASE WHEN abs($x) < 4.0 THEN ($small) ELSE ($large) END)"
  }

  /** erfi(x) = −i·erf(ix) = (2/√π)·exp(x²)·F(x) (err_fresnel.py erfi). */
  def erfi(x: Column): Column =
    lit(2.0 / math.sqrt(math.Pi)) * exp(x * x) * dawsn(x)

  /** sql mirror of [[erfi]]. */
  def sqlErfi(x: String): String =
    s"(CAST('${2.0 / math.sqrt(math.Pi)}' AS DOUBLE) * exp(($x) * ($x)) * " +
      s"(${sqlDawsn(x)}))"

  // ---------------- Airy functions (airy.py) ----------------
  // Maclaurin series Ai = c₁f − c₂g, Bi = √3(c₁f + c₂g) with
  // f = Σ aₖx³ᵏ, g = x·Σ bₖx³ᵏ (A&S 10.4.2–10.4.5); 25 terms converge
  // to machine precision for |x| ≤ 6, where the worst f/g cancellation
  // leaves Ai with ~2e-13 absolute error. Beyond |x| = 6 the series
  // cancellation would swamp Ai's exponential decay, so the functions
  // return NaN there (documented window — the asymptotic regime needs
  // Cephes-style rational fits, out of parity scope).
  private val airyA: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = 1.0
    for (k <- 0 to 24) { b += a; a /= (3.0 * k + 3.0) * (3.0 * k + 2.0) }
    b.result()
  }
  private val airyB: Seq[Double] = {
    val b = Seq.newBuilder[Double]; var a = 1.0
    for (k <- 0 to 24) { b += a; a /= (3.0 * k + 3.0) * (3.0 * k + 4.0) }
    b.result()
  }
  private val airyAp: Seq[Double] = // f' = x²·Σ a'ₖ x³ᵏ, a'ₖ = aₖ₊₁(3k+3)
    airyA.drop(1).zipWithIndex.map { case (a, k) => a * (3.0 * k + 3.0) }
  private val airyBp: Seq[Double] = // g' = Σ b'ₖ x³ᵏ, b'ₖ = bₖ(3k+1)
    airyB.zipWithIndex.map { case (b, k) => b * (3.0 * k + 1.0) }
  private val airyC1 = 0.3550280538878172 // Ai(0)  = 3^(−2/3)/Γ(2/3)
  private val airyC2 = 0.2588194037928068 // −Ai′(0) = 3^(−1/3)/Γ(1/3)
  private val sqrt3 = math.sqrt(3.0)

  /** (Ai, Ai′, Bi, Bi′) (airy.py airy), |x| ≤ 6 window (NaN outside). */
  def airy(x: Column): (Column, Column, Column, Column) = {
    val t = x * x * x
    val fS = hornerAsc(airyA, t)
    val gS = x * hornerAsc(airyB, t)
    val fpS = x * x * hornerAsc(airyAp, t)
    val gpS = hornerAsc(airyBp, t)
    def win(c: Column) = when(abs(x) <= 6.0, c).otherwise(lit(Double.NaN))
    (win(lit(airyC1) * fS - lit(airyC2) * gS),
      win(lit(airyC1) * fpS - lit(airyC2) * gpS),
      win(lit(sqrt3) * (lit(airyC1) * fS + lit(airyC2) * gS)),
      win(lit(sqrt3) * (lit(airyC1) * fpS + lit(airyC2) * gpS)))
  }

  def airyAi(x: Column): Column = airy(x)._1
  def airyAip(x: Column): Column = airy(x)._2
  def airyBi(x: Column): Column = airy(x)._3
  def airyBip(x: Column): Column = airy(x)._4

  /** sql mirrors of the four [[airy]] outputs; callers keep |x| ≤ 6. */
  private def sqlAiry(x: String, which: Int): String = {
    val t = s"(($x) * ($x) * ($x))"
    val fS = sqlHornerAsc(airyA, t)
    val gS = s"(($x) * (${sqlHornerAsc(airyB, t)}))"
    val fpS = s"(($x) * ($x) * (${sqlHornerAsc(airyAp, t)}))"
    val gpS = sqlHornerAsc(airyBp, t)
    val c1 = s"CAST('$airyC1' AS DOUBLE)"; val c2 = s"CAST('$airyC2' AS DOUBLE)"
    val s3 = s"CAST('$sqrt3' AS DOUBLE)"
    val core = which match {
      case 0 => s"$c1 * ($fS) - $c2 * ($gS)"
      case 1 => s"$c1 * ($fpS) - $c2 * ($gpS)"
      case 2 => s"$s3 * ($c1 * ($fS) + $c2 * ($gS))"
      case _ => s"$s3 * ($c1 * ($fpS) + $c2 * ($gpS))"
    }
    s"(CASE WHEN abs($x) <= 6.0 THEN ($core) ELSE CAST('nan' AS DOUBLE) END)"
  }
  def sqlAiryAi(x: String): String = sqlAiry(x, 0)
  def sqlAiryAip(x: String): String = sqlAiry(x, 1)
  def sqlAiryBi(x: String): String = sqlAiry(x, 2)
  def sqlAiryBip(x: String): String = sqlAiry(x, 3)

  // ------- complete elliptic integrals (ellip_func_integrals.py) -------
  // Eight unrolled AGM steps: a₀ = 1, b₀ = √(1−m), c₀ = √m;
  // aₙ₊₁ = (aₙ+bₙ)/2, bₙ₊₁ = √(aₙbₙ), cₙ₊₁ = (aₙ−bₙ)/2.
  // K(m) = π/(2a₈); E(m) = K·(1 − Σₙ 2ⁿ⁻¹cₙ²). Quadratic convergence:
  // eight steps reach machine precision for every m ∈ [0, 1). Only
  // IEEE-exact +·/√ enter, so the result is bit-identical across
  // engines — [[sqlEllipKE]] replays the same steps as nested
  // subqueries (the fragment form would duplicate subtrees 2⁸ times).
  private val agmSteps = 8

  /** (K(m), E(m)) as Columns; scipy ellipk/ellipe parameter m = k². */
  def ellipKE(m: Column): (Column, Column) = {
    var a = lit(1.0); var b = sqrt(lit(1.0) - m); var s = m / lit(2.0)
    var pow = 1.0
    for (_ <- 1 to agmSteps) {
      val c = (a - b) / lit(2.0)
      s = s + lit(pow) * c * c
      val a2 = (a + b) / lit(2.0); val b2 = sqrt(a * b)
      a = a2; b = b2; pow *= 2.0
    }
    val k = lit(math.Pi) / (lit(2.0) * a)
    (k, k * (lit(1.0) - s))
  }

  def ellipk(m: Column): Column = ellipKE(m)._1
  def ellipe(m: Column): Column = ellipKE(m)._2

  /** DuckDB mirror of [[ellipKE]]: wraps `from` (a subquery/table whose
    * columns include each parameter in `ms` plus the pass-through
    * columns in `carry`) in `agmSteps` staged subselects and exposes
    * `ell_k_<sfx>` / `ell_e_<sfx>` per (sfx, mCol) pair. */
  def sqlEllipKE(from: String, ms: Seq[(String, String)],
                 carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep, " + ms.map { case (sfx, mCol) =>
      s"$mCol AS m_$sfx, 1.0 AS a_$sfx, sqrt(1.0 - ($mCol)) AS b_$sfx, " +
        s"($mCol) / 2.0 AS s_$sfx"
    }.mkString(", ") + s" FROM $from"
    var pow = 1.0
    for (_ <- 1 to agmSteps) {
      q = s"SELECT $keep, " + ms.map { case (sfx, _) =>
        s"m_$sfx, (a_$sfx + b_$sfx) / 2.0 AS a_$sfx, " +
          s"sqrt(a_$sfx * b_$sfx) AS b_$sfx, " +
          s"s_$sfx + CAST('$pow' AS DOUBLE) * ((a_$sfx - b_$sfx) / 2.0) * " +
          s"((a_$sfx - b_$sfx) / 2.0) AS s_$sfx"
      }.mkString(", ") + s" FROM ($q)"
      pow *= 2.0
    }
    s"SELECT $keep, " + ms.map { case (sfx, _) =>
      s"m_$sfx, CAST('${math.Pi}' AS DOUBLE) / (2.0 * a_$sfx) AS ell_k_$sfx, " +
        s"CAST('${math.Pi}' AS DOUBLE) / (2.0 * a_$sfx) * (1.0 - s_$sfx) AS ell_e_$sfx"
    }.mkString(", ") + s" FROM ($q)"
  }

  // ------- integrals of Airy functions (airy.py itairy) -------
  // Termwise integration of the same Maclaurin series:
  //   ∫₀ˣ f = Σ aₖ x^{3k+1}/(3k+1),  ∫₀ˣ g = Σ bₖ x^{3k+2}/(3k+2)
  //   itAi = c₁∫f − c₂∫g,  itBi = √3(c₁∫f + c₂∫g)
  // same |x| ≤ 6 window as the Airy kernels (NaN beyond).
  private lazy val airyAI: Seq[Double] =
    airyA.zipWithIndex.map { case (a, k) => a / (3.0 * k + 1.0) }
  private lazy val airyBI: Seq[Double] =
    airyB.zipWithIndex.map { case (b, k) => b / (3.0 * k + 2.0) }

  /** ∫₀ˣ Ai(t) dt (airy.py itairy). */
  def itAiryAi(x: Column): Column = {
    val t = x * x * x
    val intF = x * hornerAsc(airyAI, t)
    val intG = x * x * hornerAsc(airyBI, t)
    val core = lit(airyC1) * intF - lit(airyC2) * intG
    when(abs(x) <= 6.0, core).otherwise(lit(Double.NaN))
  }

  /** ∫₀ˣ Bi(t) dt (airy.py itairy). */
  def itAiryBi(x: Column): Column = {
    val t = x * x * x
    val intF = x * hornerAsc(airyAI, t)
    val intG = x * x * hornerAsc(airyBI, t)
    val core = lit(sqrt3) * (lit(airyC1) * intF + lit(airyC2) * intG)
    when(abs(x) <= 6.0, core).otherwise(lit(Double.NaN))
  }

  def sqlItAiryAi(x: String): String = {
    val t = s"(($x) * ($x) * ($x))"
    val intF = s"(($x) * (${sqlHornerAsc(airyAI, t)}))"
    val intG = s"(($x) * ($x) * (${sqlHornerAsc(airyBI, t)}))"
    val core = s"(CAST('$airyC1' AS DOUBLE) * $intF - " +
      s"CAST('$airyC2' AS DOUBLE) * $intG)"
    s"(CASE WHEN abs($x) <= 6.0 THEN $core ELSE CAST('nan' AS DOUBLE) END)"
  }

  def sqlItAiryBi(x: String): String = {
    val t = s"(($x) * ($x) * ($x))"
    val intF = s"(($x) * (${sqlHornerAsc(airyAI, t)}))"
    val intG = s"(($x) * ($x) * (${sqlHornerAsc(airyBI, t)}))"
    val core = s"(CAST('$sqrt3' AS DOUBLE) * (CAST('$airyC1' AS DOUBLE) * " +
      s"$intF + CAST('$airyC2' AS DOUBLE) * $intG))"
    s"(CASE WHEN abs($x) <= 6.0 THEN $core ELSE CAST('nan' AS DOUBLE) END)"
  }

  // ------- integer-order Bessel (bessel.py jv/yn/iv/kn at small
  // integer order) -------
  // Three-term recurrences from the order-0/1 A&S kernels:
  //   J/Y: C_{n+1} = (2n/x)·C_n − C_{n−1}   (upward; J needs x ≳ n)
  //   I:   I_{n+1} = I_{n−1} − (2n/x)·I_n   (cancellation at small x)
  //   K:   K_{n+1} = K_{n−1} + (2n/x)·K_n   (stable upward)
  // Both engines replay the identical recurrence, so gates are exact;
  // accuracy vs scipy is pinned in SpecialSpec over the ranges where
  // the upward direction is well-conditioned (x ≳ n for J, any x > 0
  // for Y/K, x ≳ 1 for I) — the small-order cases the reference's
  // tensor tests exercise. Orders are compile-time (n ≤ 6 guard).

  private def besselUp(n: Int, base0: Column, base1: Column, x: Column,
      sign: Double, flip: Boolean): Column = {
    require(n >= 0 && n <= 6, s"integer-order Bessel supports n ≤ 6: $n")
    if (n == 0) base0
    else if (n == 1) base1
    else {
      var prev = base0; var cur = base1
      for (k <- 1 until n) {
        val next =
          if (flip) prev + lit(sign * 2.0 * k) / x * cur
          else lit(2.0 * k) / x * cur + lit(sign) * prev
        prev = cur; cur = next
      }
      cur
    }
  }

  private def sqlBesselUp(n: Int, base0: String, base1: String, x: String,
      sign: Double, flip: Boolean): String = {
    require(n >= 0 && n <= 6, s"integer-order Bessel supports n ≤ 6: $n")
    if (n == 0) base0
    else if (n == 1) base1
    else {
      var prev = base0; var cur = base1
      for (k <- 1 until n) {
        val next =
          if (flip)
            s"(($prev) + CAST('${sign * 2.0 * k}' AS DOUBLE) / ($x) * ($cur))"
          else
            s"(CAST('${2.0 * k}' AS DOUBLE) / ($x) * ($cur) + " +
              s"CAST('$sign' AS DOUBLE) * ($prev))"
        prev = cur; cur = next
      }
      cur
    }
  }

  def besselJn(n: Int, x: Column): Column =
    besselUp(n, besselJ0(x), besselJ1(x), x, -1.0, flip = false)
  def sqlBesselJn(n: Int, x: String): String =
    sqlBesselUp(n, sqlBesselJ0(x), sqlBesselJ1(x), x, -1.0, flip = false)

  def besselYn(n: Int, x: Column): Column =
    besselUp(n, besselY0(x), besselY1(x), x, -1.0, flip = false)
  def sqlBesselYn(n: Int, x: String): String =
    sqlBesselUp(n, sqlBesselY0(x), sqlBesselY1(x), x, -1.0, flip = false)

  def besselIn(n: Int, x: Column): Column =
    besselUp(n, besselI0(x), besselI1(x), x, -1.0, flip = true)
  def sqlBesselIn(n: Int, x: String): String =
    sqlBesselUp(n, sqlBesselI0(x), sqlBesselI1(x), x, -1.0, flip = true)

  def besselKn(n: Int, x: Column): Column =
    besselUp(n, besselK0(x), besselK1(x), x, 1.0, flip = true)
  def sqlBesselKn(n: Int, x: String): String =
    sqlBesselUp(n, sqlBesselK0(x), sqlBesselK1(x), x, 1.0, flip = true)

  // ------- Hankel functions at integer order (bessel.py hankel1/
  // hankel2 + scaled hankel1e/hankel2e, real x > 0) -------
  // H¹ₙ = Jₙ + iYₙ and H²ₙ = Jₙ − iYₙ as explicit (re, im) parts; the
  // scaled forms multiply by e^{∓ix} (unit modulus on the real axis,
  // mixing the components through cos/sin of the same x).
  def hankel1Re(n: Int, x: Column): Column = besselJn(n, x)
  def hankel1Im(n: Int, x: Column): Column = besselYn(n, x)
  def hankel2Re(n: Int, x: Column): Column = besselJn(n, x)
  def hankel2Im(n: Int, x: Column): Column = -besselYn(n, x)

  /** Re[H¹ₙ(x)·e^{−ix}] = Jₙcos x + Yₙsin x. */
  def hankel1eRe(n: Int, x: Column): Column =
    besselJn(n, x) * cos(x) + besselYn(n, x) * sin(x)
  /** Im[H¹ₙ(x)·e^{−ix}] = Yₙcos x − Jₙsin x. */
  def hankel1eIm(n: Int, x: Column): Column =
    besselYn(n, x) * cos(x) - besselJn(n, x) * sin(x)
  /** Re[H²ₙ(x)·e^{+ix}] = Jₙcos x + Yₙsin x (equals hankel1e's re). */
  def hankel2eRe(n: Int, x: Column): Column = hankel1eRe(n, x)
  /** Im[H²ₙ(x)·e^{+ix}] = Jₙsin x − Yₙcos x. */
  def hankel2eIm(n: Int, x: Column): Column =
    besselJn(n, x) * sin(x) - besselYn(n, x) * cos(x)

  def sqlHankel1eRe(n: Int, x: String): String =
    s"((${sqlBesselJn(n, x)}) * cos($x) + (${sqlBesselYn(n, x)}) * sin($x))"
  def sqlHankel1eIm(n: Int, x: String): String =
    s"((${sqlBesselYn(n, x)}) * cos($x) - (${sqlBesselJn(n, x)}) * sin($x))"

  // ------- exponentially scaled Bessel / Airy (bessel.py ive/kve,
  // airy.py airye) -------
  // ive(n,x) = Iₙ(x)·e^(−|x|), kve(n,x) = Kₙ(x)·e^x — the forms that
  // stay finite where Iₙ/Kₙ overflow/underflow; for real x, jve/yve
  // coincide with jv/yv (the scaling is e^(−|Im x|}).

  def besselIve(n: Int, x: Column): Column = besselIn(n, x) * exp(-abs(x))
  def sqlBesselIve(n: Int, x: String): String =
    s"((${sqlBesselIn(n, x)}) * exp(-abs($x)))"

  def besselKve(n: Int, x: Column): Column = besselKn(n, x) * exp(x)
  def sqlBesselKve(n: Int, x: String): String =
    s"((${sqlBesselKn(n, x)}) * exp($x))"

  /** Scaling factor e^ζ with ζ = (2/3)·x^{3/2} for x > 0, 1 otherwise
    * (scipy airye: oscillatory side is unscaled for real arguments). */
  private def airyZeta(x: Column): Column =
    when(x > 0.0, lit(2.0 / 3.0) * pow(x, lit(1.5))).otherwise(lit(0.0))
  private def sqlAiryZeta(x: String): String =
    s"(CASE WHEN ($x) > 0.0 THEN CAST('${2.0 / 3.0}' AS DOUBLE) * " +
      s"pow($x, 1.5) ELSE 0.0 END)"

  def airyeAi(x: Column): Column = airyAi(x) * exp(airyZeta(x))
  def airyeAip(x: Column): Column = airyAip(x) * exp(airyZeta(x))
  def airyeBi(x: Column): Column = airyBi(x) * exp(-airyZeta(x))
  def airyeBip(x: Column): Column = airyBip(x) * exp(-airyZeta(x))
  def sqlAiryeAi(x: String): String =
    s"((${sqlAiryAi(x)}) * exp(${sqlAiryZeta(x)}))"
  def sqlAiryeAip(x: String): String =
    s"((${sqlAiryAip(x)}) * exp(${sqlAiryZeta(x)}))"
  def sqlAiryeBi(x: String): String =
    s"((${sqlAiryBi(x)}) * exp(-(${sqlAiryZeta(x)})))"
  def sqlAiryeBip(x: String): String =
    s"((${sqlAiryBip(x)}) * exp(-(${sqlAiryZeta(x)})))"

  // ------- scaled complementary error function (err_fresnel.py
  // erfcx) -------
  // erfcx(x) = e^{x²}·erfc(x). |x| < 2.5: the A&S 7.1.26 composition
  // (absolute accuracy ~1e-5 after the e^{x²} ≤ e^{6.25} scale — the
  // SpecialSpec pin). x ≥ 2.5: the Laplace continued fraction
  //   √π·erfcx(x) = 1/(x + (1/2)/(x + 1/(x + (3/2)/(x + …))))
  // (24 levels inside-out, relative accuracy ~1e-13 — the regime where
  // the composition would cancel). x ≤ −2.5: 2e^{x²} − erfcx(−x)
  // (overflows past x ≈ −26, like scipy's own double limit).
  private val erfcxCfDepth = 24

  /** sql mirror of [[erf]] (A&S 7.1.26, x = 0 pinned to 0). */
  def sqlErf(x: String): String = {
    val t = s"(1.0 / (1.0 + CAST('0.3275911' AS DOUBLE) * abs($x)))"
    val poly = s"(($t) * (CAST('0.254829592' AS DOUBLE) + ($t) * " +
      s"(CAST('-0.284496736' AS DOUBLE) + ($t) * " +
      s"(CAST('1.421413741' AS DOUBLE) + ($t) * " +
      s"(CAST('-1.453152027' AS DOUBLE) + ($t) * " +
      s"CAST('1.061405429' AS DOUBLE))))))"
    val pos = s"(1.0 - ($poly) * exp(-($x) * ($x)))"
    s"(CASE WHEN ($x) = 0.0 THEN 0.0 WHEN ($x) > 0.0 THEN $pos " +
      s"ELSE -($pos) END)"
  }

  def erfcx(x: Column): Column = {
    val ax = abs(x)
    var f: Column = ax
    for (k <- erfcxCfDepth to 1 by -1) f = ax + lit(k / 2.0) / f
    val cf = lit(1.0 / math.sqrt(math.Pi)) / f
    val small = exp(ax * ax) * (lit(1.0) - erf(ax))
    val posv = when(ax < 2.5, small).otherwise(cf)
    when(x >= 0.0, posv).otherwise(lit(2.0) * exp(x * x) - posv)
  }

  def sqlErfcx(x: String): String = {
    val ax = s"abs($x)"
    var f: String = ax
    for (k <- erfcxCfDepth to 1 by -1)
      f = s"(($ax) + CAST('${k / 2.0}' AS DOUBLE) / ($f))"
    val cf = s"(CAST('${1.0 / math.sqrt(math.Pi)}' AS DOUBLE) / ($f))"
    val small = s"(exp(($ax) * ($ax)) * (1.0 - (${sqlErf(ax)})))"
    val posv = s"(CASE WHEN ($ax) < 2.5 THEN $small ELSE $cf END)"
    s"(CASE WHEN ($x) >= 0.0 THEN $posv " +
      s"ELSE 2.0 * exp(($x) * ($x)) - $posv END)"
  }

  // ------- Carlson symmetric elliptic integrals
  // (ellip_func_integrals.py elliprf/elliprc/elliprd/elliprj, and the
  // incomplete ellipkinc/ellipeinc through them) -------
  // Carlson's duplication algorithm (Carlson 1979, "Computing elliptic
  // integrals by duplication"): λ = √x√y + √x√z + √y√z halves the
  // integral's spread; after 28 duplications the arguments agree to
  // < 4⁻²⁸ relatively, so the zeroth-order limits
  //   R_F → μ^{-1/2} (μ = (x+y+z)/3)
  //   R_D → 3·Σ facₘ/(√zₘ(zₘ+λₘ)) + fac·μ^{-3/2} (μ = (x+y+3z)/5)
  //   R_J → Σ 6·facₘ/dₘ·R_C(1, 1+eₘ) + fac·μ^{-3/2} (μ = (x+y+z+2p)/5)
  // are machine-exact with NO Taylor tail (validated against mpmath at
  // 30 digits in SpecialSpec). R_C has the elementary closed form
  // (DLMF 19.6.15) used directly and inside R_J's duplication terms.
  //
  // A 28-step loop referencing each variable 3–5× per step cannot be
  // one Column tree (5²⁸ nodes) — like the staged SQL oracles, the
  // Column side chains one PROJECTION per half-step (CollapseProject
  // keeps boundaries where an alias is referenced more than once, so
  // plans stay linear); the SQL generators emit the identical stages
  // as nested subselects. R_F/R_D are pure IEEE +·/√ → bit-identical
  // across engines (UNROUNDED gates); R_C/R_J bring in atan/atanh
  // (libm of identical inputs) → round 6.
  private val carlsonSteps = 28

  /** R_C(x, y) closed form (DLMF 19.6.15); x ≥ 0, y ≠ 0. */
  def ellipRc(x: Column, y: Column): Column = {
    val lo = atan(sqrt((y - x) / x)) / sqrt(y - x) // x < y
    val hi = atanh(sqrt((x - y) / x)) / sqrt(x - y) // x > y
    when(x === y, lit(1.0) / sqrt(x)).when(x < y, lo).otherwise(hi)
  }

  /** sql mirror of [[ellipRc]]; DuckDB lacks atanh → ln composite. */
  def sqlEllipRc(x: String, y: String): String = {
    val lo = s"(atan(sqrt((($y) - ($x)) / ($x))) / sqrt(($y) - ($x)))"
    val t = s"sqrt((($x) - ($y)) / ($x))"
    val hi = s"((0.5 * ln((1.0 + $t) / (1.0 - $t))) / sqrt(($x) - ($y)))"
    s"(CASE WHEN ($x) = ($y) THEN 1.0 / sqrt($x) " +
      s"WHEN ($x) < ($y) THEN $lo ELSE $hi END)"
  }

  /** atanh as the ln composite on the Column side too, so the R_C
    * operation shape matches [[sqlEllipRc]] exactly. */
  private def atanh(c: Column): Column =
    lit(0.5) * log((lit(1.0) + c) / (lit(1.0) - c))

  import org.apache.spark.sql.DataFrame

  /** R_F and (optionally) R_D over shared duplication stages, appended
    * as columns `rf_<sfx>` / `rd_<sfx>`. Each spec is
    * (sfx, x, y, z, wantD); all other columns pass through. */
  def carlsonFD(df: DataFrame, specs: Seq[(String, Column, Column, Column, Boolean)]): DataFrame = {
    val others = df.columns.toSeq.map(col)
    var d = df.select(others ++ specs.flatMap { case (s, x, y, z, wantD) =>
      Seq(x.as(s"__cx_$s"), y.as(s"__cy_$s"), z.as(s"__cz_$s")) ++
        (if (wantD) Seq(lit(0.0).as(s"__cs_$s")) else Nil)
    }: _*)
    var fac = 1.0
    for (_ <- 1 to carlsonSteps) {
      // half-step 1: the square roots
      d = d.select(col("*") +: (specs.map { case (s, _, _, _, _) =>
        sqrt(col(s"__cx_$s")).as(s"__csx_$s")
      } ++ specs.map { case (s, _, _, _, _) =>
        sqrt(col(s"__cy_$s")).as(s"__csy_$s")
      } ++ specs.map { case (s, _, _, _, _) =>
        sqrt(col(s"__cz_$s")).as(s"__csz_$s")
      }): _*)
      // half-step 2: λ, the quarter-step update, the R_D partial sum
      val keep = d.columns.toSeq.filterNot(_.startsWith("__c")).map(col)
      val facL = fac
      d = d.select(keep ++ specs.flatMap { case (s, _, _, _, wantD) =>
        val lam = col(s"__csx_$s") * col(s"__csy_$s") +
          col(s"__csx_$s") * col(s"__csz_$s") +
          col(s"__csy_$s") * col(s"__csz_$s")
        Seq(((col(s"__cx_$s") + lam) / 4.0).as(s"__cx_$s"),
          ((col(s"__cy_$s") + lam) / 4.0).as(s"__cy_$s"),
          ((col(s"__cz_$s") + lam) / 4.0).as(s"__cz_$s")) ++
          (if (wantD)
            Seq((col(s"__cs_$s") + lit(facL) /
              (col(s"__csz_$s") * (col(s"__cz_$s") + lam))).as(s"__cs_$s"))
          else Nil)
      }: _*)
      fac *= 0.25
    }
    val keep = d.columns.toSeq.filterNot(_.startsWith("__c")).map(col)
    val facF = fac
    d.select(keep ++ specs.flatMap { case (s, _, _, _, wantD) =>
      val x = col(s"__cx_$s"); val y = col(s"__cy_$s"); val z = col(s"__cz_$s")
      val muF = (x + y + z) / 3.0
      val rf = (lit(1.0) / sqrt(muF)).as(s"rf_$s")
      if (wantD) {
        val muD = (x + y + lit(3.0) * z) / 5.0
        Seq(rf, (lit(3.0) * col(s"__cs_$s") +
          lit(facF) / (muD * sqrt(muD))).as(s"rd_$s"))
      } else Seq(rf)
    }: _*)
  }

  /** R_J via duplication with closed-form R_C terms, appended as
    * `rj_<sfx>`. Each spec is (sfx, x, y, z, p). */
  def carlsonRJ(df: DataFrame, specs: Seq[(String, Column, Column, Column, Column)]): DataFrame = {
    val others = df.columns.toSeq.map(col)
    var d = df.select(others ++ specs.flatMap { case (s, x, y, z, p) =>
      Seq(x.as(s"__cx_$s"), y.as(s"__cy_$s"), z.as(s"__cz_$s"),
        p.as(s"__cp_$s"), lit(0.0).as(s"__cs_$s"))
    }: _*)
    var fac = 1.0
    for (_ <- 1 to carlsonSteps) {
      d = d.select(col("*") +: specs.flatMap { case (s, _, _, _, _) =>
        Seq(sqrt(col(s"__cx_$s")).as(s"__csx_$s"),
          sqrt(col(s"__cy_$s")).as(s"__csy_$s"),
          sqrt(col(s"__cz_$s")).as(s"__csz_$s"),
          sqrt(col(s"__cp_$s")).as(s"__csp_$s"))
      }: _*)
      val keep = d.columns.toSeq.filterNot(_.startsWith("__c")).map(col)
      val facL = fac
      d = d.select(keep ++ specs.flatMap { case (s, _, _, _, _) =>
        val sx = col(s"__csx_$s"); val sy = col(s"__csy_$s")
        val sz = col(s"__csz_$s"); val sp = col(s"__csp_$s")
        val x = col(s"__cx_$s"); val y = col(s"__cy_$s")
        val z = col(s"__cz_$s"); val p = col(s"__cp_$s")
        val lam = sx * sy + sx * sz + sy * sz
        val dd = (sp + sx) * (sp + sy) * (sp + sz)
        val e = (p - x) * (p - y) * (p - z) / (dd * dd)
        Seq(((x + lam) / 4.0).as(s"__cx_$s"),
          ((y + lam) / 4.0).as(s"__cy_$s"),
          ((z + lam) / 4.0).as(s"__cz_$s"),
          ((p + lam) / 4.0).as(s"__cp_$s"),
          (col(s"__cs_$s") + lit(6.0 * facL) / dd *
            ellipRc(lit(1.0), lit(1.0) + e)).as(s"__cs_$s"))
      }: _*)
      fac *= 0.25
    }
    val keep = d.columns.toSeq.filterNot(_.startsWith("__c")).map(col)
    val facF = fac
    d.select(keep ++ specs.map { case (s, _, _, _, _) =>
      val mu = (col(s"__cx_$s") + col(s"__cy_$s") + col(s"__cz_$s") +
        lit(2.0) * col(s"__cp_$s")) / 5.0
      (col(s"__cs_$s") + lit(facF) / (mu * sqrt(mu))).as(s"rj_$s")
    }: _*)
  }

  /** DuckDB mirror of [[carlsonFD]]: wraps `from` in the same staged
    * duplication, exposing `rf_<sfx>` / `rd_<sfx>`. Spec:
    * (sfx, xExpr, yExpr, zExpr, wantD). */
  def sqlCarlsonFD(from: String, specs: Seq[(String, String, String, String, Boolean)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep, " + specs.map { case (s, x, y, z, wantD) =>
      s"($x) AS cx_$s, ($y) AS cy_$s, ($z) AS cz_$s" +
        (if (wantD) s", 0.0 AS cs_$s" else "")
    }.mkString(", ") + s" FROM $from"
    var fac = 1.0
    for (_ <- 1 to carlsonSteps) {
      q = s"SELECT *, " + specs.map { case (s, _, _, _, _) =>
        s"sqrt(cx_$s) AS csx_$s, sqrt(cy_$s) AS csy_$s, sqrt(cz_$s) AS csz_$s"
      }.mkString(", ") + s" FROM ($q)"
      q = s"SELECT $keep, " + specs.map { case (s, _, _, _, wantD) =>
        val lam = s"(csx_$s * csy_$s + csx_$s * csz_$s + csy_$s * csz_$s)"
        s"(cx_$s + $lam) / 4.0 AS cx_$s, (cy_$s + $lam) / 4.0 AS cy_$s, " +
          s"(cz_$s + $lam) / 4.0 AS cz_$s" +
          (if (wantD)
            s", cs_$s + CAST('$fac' AS DOUBLE) / (csz_$s * (cz_$s + $lam)) AS cs_$s"
          else "")
      }.mkString(", ") + s" FROM ($q)"
      fac *= 0.25
    }
    s"SELECT $keep, " + specs.map { case (s, _, _, _, wantD) =>
      val muF = s"((cx_$s + cy_$s + cz_$s) / 3.0)"
      val rf = s"1.0 / sqrt($muF) AS rf_$s"
      if (wantD) {
        val muD = s"((cx_$s + cy_$s + 3.0 * cz_$s) / 5.0)"
        s"$rf, 3.0 * cs_$s + CAST('$fac' AS DOUBLE) / ($muD * sqrt($muD)) AS rd_$s"
      } else rf
    }.mkString(", ") + s" FROM ($q)"
  }

  /** DuckDB mirror of [[carlsonRJ]]: exposes `rj_<sfx>`. Spec:
    * (sfx, xExpr, yExpr, zExpr, pExpr). */
  def sqlCarlsonRJ(from: String, specs: Seq[(String, String, String, String, String)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep, " + specs.map { case (s, x, y, z, p) =>
      s"($x) AS cx_$s, ($y) AS cy_$s, ($z) AS cz_$s, ($p) AS cp_$s, 0.0 AS cs_$s"
    }.mkString(", ") + s" FROM $from"
    var fac = 1.0
    for (_ <- 1 to carlsonSteps) {
      q = s"SELECT *, " + specs.map { case (s, _, _, _, _) =>
        s"sqrt(cx_$s) AS csx_$s, sqrt(cy_$s) AS csy_$s, " +
          s"sqrt(cz_$s) AS csz_$s, sqrt(cp_$s) AS csp_$s"
      }.mkString(", ") + s" FROM ($q)"
      q = s"SELECT $keep, " + specs.map { case (s, _, _, _, _) =>
        val lam = s"(csx_$s * csy_$s + csx_$s * csz_$s + csy_$s * csz_$s)"
        val dd = s"((csp_$s + csx_$s) * (csp_$s + csy_$s) * (csp_$s + csz_$s))"
        val e = s"((cp_$s - cx_$s) * (cp_$s - cy_$s) * (cp_$s - cz_$s) / ($dd * $dd))"
        s"(cx_$s + $lam) / 4.0 AS cx_$s, (cy_$s + $lam) / 4.0 AS cy_$s, " +
          s"(cz_$s + $lam) / 4.0 AS cz_$s, (cp_$s + $lam) / 4.0 AS cp_$s, " +
          s"cs_$s + CAST('${6.0 * fac}' AS DOUBLE) / $dd * " +
          s"(${sqlEllipRc("1.0", s"(1.0 + $e)")}) AS cs_$s"
      }.mkString(", ") + s" FROM ($q)"
      fac *= 0.25
    }
    s"SELECT $keep, " + specs.map { case (s, _, _, _, _) =>
      val mu = s"((cx_$s + cy_$s + cz_$s + 2.0 * cp_$s) / 5.0)"
      s"cs_$s + CAST('$fac' AS DOUBLE) / ($mu * sqrt($mu)) AS rj_$s"
    }.mkString(", ") + s" FROM ($q)"
  }

  /** Incomplete elliptic integrals (ellip_func_integrals.py ellipkinc/
    * ellipeinc), DLMF 19.25.5/19.25.9 via R_F/R_D:
    *   F(φ|m) = sinφ·R_F(cos²φ, 1−m·sin²φ, 1)
    *   E(φ|m) = F(φ|m) − (m/3)·sin³φ·R_D(cos²φ, 1−m·sin²φ, 1)
    * Appends `kinc_<sfx>` (and `einc_<sfx>` when wantE). φ ∈ (0, π/2),
    * m·sin²φ < 1. */
  def ellipInc(df: DataFrame, specs: Seq[(String, Column, Column, Boolean)]): DataFrame = {
    val others = df.columns.toSeq.map(col)
    val staged = df.select(others ++ specs.flatMap { case (s, phi, m, _) =>
      Seq(sin(phi).as(s"__esin_$s"), cos(phi).as(s"__ecos_$s"), m.as(s"__em_$s"))
    }: _*)
    val fd = carlsonFD(staged, specs.map { case (s, _, _, wantE) =>
      (s, col(s"__ecos_$s") * col(s"__ecos_$s"),
        lit(1.0) - col(s"__em_$s") * col(s"__esin_$s") * col(s"__esin_$s"),
        lit(1.0), wantE)
    })
    val keep = fd.columns.toSeq.filterNot(_.startsWith("__e")).map(col)
    fd.select(keep.filterNot(c => specs.exists(sp =>
      c.toString.contains(s"rf_${sp._1}") || c.toString.contains(s"rd_${sp._1}"))) ++
      specs.flatMap { case (s, _, _, wantE) =>
        val sn = col(s"__esin_$s")
        val kinc = (sn * col(s"rf_$s")).as(s"kinc_$s")
        if (wantE)
          Seq(kinc, (sn * col(s"rf_$s") - col(s"__em_$s") / 3.0 *
            sn * sn * sn * col(s"rd_$s")).as(s"einc_$s"))
        else Seq(kinc)
      }: _*)
  }

  /** DuckDB mirror of [[ellipInc]]. Spec: (sfx, phiExpr, mExpr, wantE). */
  def sqlEllipInc(from: String, specs: Seq[(String, String, String, Boolean)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val staged = s"SELECT $keep, " + specs.map { case (s, phi, m, _) =>
      s"sin($phi) AS esin_$s, cos($phi) AS ecos_$s, ($m) AS em_$s"
    }.mkString(", ") + s" FROM $from"
    val fd = sqlCarlsonFD(s"($staged)",
      specs.map { case (s, _, _, wantE) =>
        (s, s"ecos_$s * ecos_$s", s"1.0 - em_$s * esin_$s * esin_$s",
          "1.0", wantE)
      },
      carry ++ specs.flatMap { case (s, _, _, _) => Seq(s"esin_$s", s"em_$s") })
    s"SELECT $keep, " + specs.map { case (s, _, _, wantE) =>
      val kinc = s"esin_$s * rf_$s AS kinc_$s"
      if (wantE)
        s"$kinc, esin_$s * rf_$s - em_$s / 3.0 * esin_$s * esin_$s * esin_$s * rd_$s AS einc_$s"
      else kinc
    }.mkString(", ") + s" FROM ($fd)"
  }

  // ------- confluent hypergeometric limit ₀F₁(;b;x)
  // (hypergeometric_funcs.py hyp0f1) -------
  // Σ xⁿ/((b)ₙ·n!), 25 terms nested inside-out:
  // s = 1 + x/(n·(b+n−1))·s. Converges to machine precision for
  // |x| ≤ 20, b ≥ 0.5 (the windowed contract, like hyp2f1/hyp1f1).
  private val hyp0f1Depth = 25

  def hyp0f1(b: Column, x: Column): Column = {
    var s: Column = lit(1.0)
    for (n <- hyp0f1Depth to 1 by -1)
      s = lit(1.0) + x / (lit(n.toDouble) * (b + lit(n - 1.0))) * s
    s
  }

  def sqlHyp0f1(b: String, x: String): String = {
    var s: String = "1.0"
    for (n <- hyp0f1Depth to 1 by -1)
      s = s"(1.0 + ($x) / (CAST('${n.toDouble}' AS DOUBLE) * " +
        s"(($b) + CAST('${n - 1.0}' AS DOUBLE))) * ($s))"
    s
  }

  // ------- Faddeeva function w(z) and the Voigt profile
  // (err_fresnel.py wofz, stats' voigt_profile) -------
  // Humlicek's w4 rational approximation (Humlicek 1982, JQSRT 27:437 —
  // the standard published algorithm): with t = y − ix and s = |x| + y,
  // four regions pick rational functions of t (I/II/III) or
  // e^{t²} minus a rational (IV); relative accuracy ~3e-5 over the
  // upper half-plane (validated against mpmath's erfc-based w in
  // SpecialSpec). voigt_profile(x, σ, γ) = Re w((x+iγ)/(σ√2))/(σ√2π).
  //
  // Complex arithmetic runs over explicit (re, im) pairs through ONE
  // generic algorithm body instantiated for Columns and for SQL
  // strings — the two engines cannot diverge in operation shape by
  // construction. Upper half-plane only (y ≥ 0), like the gates.
  private final case class Cpx[T](re: T, im: T)
  private final class WAlg[T](val k: Double => T,
      val add: (T, T) => T, val sub: (T, T) => T,
      val mul: (T, T) => T, val dvd: (T, T) => T,
      val rexp: T => T, val rcos: T => T, val rsin: T => T) {
    def ck(d: Double): Cpx[T] = Cpx(k(d), k(0.0))
    def cadd(a: Cpx[T], b: Cpx[T]): Cpx[T] = Cpx(add(a.re, b.re), add(a.im, b.im))
    def csub(a: Cpx[T], b: Cpx[T]): Cpx[T] = Cpx(sub(a.re, b.re), sub(a.im, b.im))
    def cmul(a: Cpx[T], b: Cpx[T]): Cpx[T] = Cpx(
      sub(mul(a.re, b.re), mul(a.im, b.im)),
      add(mul(a.re, b.im), mul(a.im, b.re)))
    def cdiv(a: Cpx[T], b: Cpx[T]): Cpx[T] = {
      val d = add(mul(b.re, b.re), mul(b.im, b.im))
      Cpx(dvd(add(mul(a.re, b.re), mul(a.im, b.im)), d),
        dvd(sub(mul(a.im, b.re), mul(a.re, b.im)), d))
    }
    def cexp(a: Cpx[T]): Cpx[T] = {
      val e = rexp(a.re)
      Cpx(mul(e, rcos(a.im)), mul(e, rsin(a.im)))
    }
    def chorner(coefs: Seq[Double], t: Cpx[T]): Cpx[T] =
      coefs.reverse.tail.foldLeft(ck(coefs.last))((acc, c) =>
        cadd(cmul(acc, t), ck(c)))
  }

  /** The four Humlicek region values w₁..w₄ as (re, im) pairs. */
  private def wofzRegions[T](alg: WAlg[T], x: T, y: T): Seq[Cpx[T]] = {
    import alg._
    val t = Cpx(y, sub(k(0.0), x)) // t = y − ix
    val u = cmul(t, t)
    wofzRegionsTU(alg, t, u)
  }

  /** [[wofzRegions]] parameterized on already-computed t = y − ix and
    * u = t² — the factoring [[wofzStaged]] needs to materialize t/u
    * behind a projection boundary. Op-for-op identical arithmetic. */
  private def wofzRegionsTU[T](alg: WAlg[T], t: Cpx[T], u: Cpx[T]): Seq[Cpx[T]] = {
    import alg._
    val w1 = cdiv(cmul(t, ck(0.5641896)), cadd(ck(0.5), u))
    val w2 = cdiv(
      cmul(t, cadd(ck(1.410474), cmul(u, ck(0.5641896)))),
      cadd(ck(0.75), cmul(u, cadd(ck(3.0), u))))
    val w3 = cdiv(
      chorner(Seq(16.4955, 20.20933, 11.96482, 3.778987, 0.5642236), t),
      chorner(Seq(16.4955, 38.82363, 39.27121, 21.69274, 6.699398, 1.0), t))
    val w4 = csub(cexp(u), cdiv(
      cmul(t, chorner(Seq(36183.31, -3321.9905, 1540.787, -219.0313,
        35.76683, -1.320522, 0.56419), u)),
      chorner(Seq(32066.6, -24322.84, 9022.228, -2186.181, 364.2191,
        -61.57037, 1.841439, -1.0), u)))
    Seq(w1, w2, w3, w4)
  }

  private val columnWAlg = new WAlg[Column](lit(_), _ + _, _ - _, _ * _,
    _ / _, exp, cos, sin)
  private val sqlWAlg = new WAlg[String](
    d => s"CAST('$d' AS DOUBLE)",
    (a, b) => s"(($a) + ($b))", (a, b) => s"(($a) - ($b))",
    (a, b) => s"(($a) * ($b))", (a, b) => s"(($a) / ($b))",
    a => s"exp($a)", a => s"cos($a)", a => s"sin($a)")

  /** (Re w, Im w) for z = x + iy, y ≥ 0. */
  def wofz(x: Column, y: Column): (Column, Column) = {
    val Seq(w1, w2, w3, w4) = wofzRegions(columnWAlg, x, y)
    val s = abs(x) + y
    def pick(f: Cpx[Column] => Column): Column =
      when(s >= 15.0, f(w1)).when(s >= 5.5, f(w2))
        .when(y >= lit(0.195) * abs(x) - lit(0.176), f(w3))
        .otherwise(f(w4))
    (pick(_.re), pick(_.im))
  }
  def wofzRe(x: Column, y: Column): Column = wofz(x, y)._1
  def wofzIm(x: Column, y: Column): Column = wofz(x, y)._2

  private val wofzStageCounter = new java.util.concurrent.atomic.AtomicInteger

  /** Frame-staged [[wofz]] (r17 optimization round — the modfresnel
    * BALLOON lesson applied to wofz itself): appends `outRe`/`outIm` =
    * w(x + iy) with t = y − ix, u = t², and the four Humlicek region
    * values each computed ONCE behind projection boundaries, instead of
    * one Project inlining the full region trees once per output (re and
    * im each re-expanded all four regions; op_special_wofz carried TEN
    * such bodies and spent ~28 s per run in Catalyst on a single
    * million-node Project). Arithmetic is op-for-op [[wofz]] —
    * wofzRegionsTU is the same body over column refs — so results are
    * bit-identical (SpecialSpec pins staged ≡ unstaged on the sweep).
    * CollapseProject preserves the t/u stages (non-cheap AND
    * multiply-referenced); the w1..w4 aliases are each consumed once per
    * output pick, so that Project collapses, leaving one linear-size
    * region tree per output — still ~10× smaller than the unstaged form
    * (ADVICE r17). Since r18 the gate routes through [[wofzStagedFast]]
    * (one native node, no tree at all); this form is the fallback. */
  def wofzStaged(df: org.apache.spark.sql.DataFrame, x: Column, y: Column,
      outRe: String, outIm: String): org.apache.spark.sql.DataFrame = {
    require(!df.columns.contains(outRe) && !df.columns.contains(outIm),
      s"wofzStaged output column collision: $outRe/$outIm already present")
    val p = s"__wz${wofzStageCounter.incrementAndGet()}_"
    val keep = df.columns.toSeq.map(col)
    val s0 = df.select(keep ++ Seq(x.as(p + "x"), y.as(p + "y")): _*)
    val keep0 = keep ++ Seq(col(p + "x"), col(p + "y"))
    // t = y − ix (the sub(k(0), x) op order of wofzRegions)
    val s1 = s0.select(keep0 ++ Seq(
      col(p + "y").as(p + "tre"),
      (lit(0.0) - col(p + "x")).as(p + "tim")): _*)
    val keep1 = keep0 ++ Seq(col(p + "tre"), col(p + "tim"))
    // u = t² (cmul(t, t) expanded over the t columns)
    val t1 = Cpx(col(p + "tre"), col(p + "tim"))
    val u1 = columnWAlg.cmul(t1, t1)
    val s2 = s1.select(keep1 ++ Seq(u1.re.as(p + "ure"), u1.im.as(p + "uim")): _*)
    val keep2 = keep1 ++ Seq(col(p + "ure"), col(p + "uim"))
    val regs = wofzRegionsTU(columnWAlg,
      Cpx(col(p + "tre"), col(p + "tim")),
      Cpx(col(p + "ure"), col(p + "uim")))
    val regCols = regs.zipWithIndex.flatMap { case (w, i) =>
      Seq(w.re.as(s"${p}w${i + 1}re"), w.im.as(s"${p}w${i + 1}im"))
    }
    val s3 = s2.select(keep2 ++ regCols: _*)
    val s = abs(col(p + "x")) + col(p + "y")
    def pick(part: String): Column =
      when(s >= 15.0, col(s"${p}w1$part")).when(s >= 5.5, col(s"${p}w2$part"))
        .when(col(p + "y") >= lit(0.195) * abs(col(p + "x")) - lit(0.176),
          col(s"${p}w3$part"))
        .otherwise(col(s"${p}w4$part"))
    s3.select(keep ++ Seq(pick("re").as(outRe), pick("im").as(outIm)): _*)
  }

  private def sqlWofzPick(x: String, y: String, wantRe: Boolean): String = {
    val Seq(w1, w2, w3, w4) = wofzRegions(sqlWAlg, s"($x)", s"($y)")
    def f(c: Cpx[String]) = if (wantRe) c.re else c.im
    val s = s"(abs($x) + ($y))"
    s"(CASE WHEN $s >= 15.0 THEN ${f(w1)} WHEN $s >= 5.5 THEN ${f(w2)} " +
      s"WHEN ($y) >= 0.195 * abs($x) - 0.176 THEN ${f(w3)} " +
      s"ELSE ${f(w4)} END)"
  }
  def sqlWofzRe(x: String, y: String): String = sqlWofzPick(x, y, wantRe = true)
  def sqlWofzIm(x: String, y: String): String = sqlWofzPick(x, y, wantRe = false)

  /** Voigt profile (stats voigt_profile): the Gaussian⊛Lorentzian
    * density, Re w((x+iγ)/(σ√2))/(σ√(2π)). */
  def voigtProfile(x: Column, sigma: Column, gamma: Column): Column = {
    val scale = sigma * lit(math.sqrt(2.0))
    wofzRe(x / scale, gamma / scale) /
      (sigma * lit(math.sqrt(2.0 * math.Pi)))
  }

  /** Frame-staged [[voigtProfile]] — the one-Faddeeva-behind-a-boundary
    * form (see [[wofzStaged]]); appends `out`, identical arithmetic. */
  def voigtProfileStaged(df: org.apache.spark.sql.DataFrame, x: Column,
      sigma: Column, gamma: Column, out: String): org.apache.spark.sql.DataFrame = {
    val p = s"__vp${wofzStageCounter.incrementAndGet()}_"
    val scale = sigma * lit(math.sqrt(2.0))
    val staged = wofzStaged(df, x / scale, gamma / scale, p + "re", p + "im")
    staged
      .withColumn(out, col(p + "re") / (sigma * lit(math.sqrt(2.0 * math.Pi))))
      .drop(p + "re", p + "im")
  }
  def sqlVoigtProfile(x: String, sigma: String, gamma: String): String = {
    val scale = s"(($sigma) * CAST('${math.sqrt(2.0)}' AS DOUBLE))"
    s"((${sqlWofzRe(s"(($x) / $scale)", s"(($gamma) / $scale)")}) / " +
      s"(($sigma) * CAST('${math.sqrt(2.0 * math.Pi)}' AS DOUBLE)))"
  }

  // ------- modified Fresnel integrals (err_fresnel.py:207,214
  // modfresnelp/modfresnelm) -------
  // scipy's definitions: F±(x) = ∫ₓ^∞ exp(±it²) dt and
  // K±(x) = π^(−1/2) exp(∓i(x²+π/4)) F±(x). One Faddeeva evaluation
  // serves all four outputs: with z = x·e^{iπ/4} (upper half-plane for
  // x ≥ 0), differentiating (√π/2)e^{iπ/4}erfc(x e^{−iπ/4}) shows
  //   K₊(x) = w(z)/2,   F₊(x) = √π e^{i(x²+π/4)} K₊(x),
  // and for x < 0 the reflection w(z) = 2e^{−z²} − w(−z) with
  // z² = ix² (so e^{−z²} = cos x² − i sin x²) gives
  //   K₊(x) = e^{−ix²} − w(|x|e^{iπ/4})/2.
  // For real x the minus family is the conjugate: K₋ = conj K₊,
  // F₋ = conj F₊. Accuracy bounded by Humlicek w4 (~3e-5 relative),
  // pinned vs mpmath in SpecialSpec; the Column and SQL mirrors share
  // the operand shape op-for-op via the same WAlg body as wofz.

  /** (Re K₊, Im K₊) of modfresnelp's second output. */
  def modfresnelKPlus(x: Column): (Column, Column) = {
    val u = abs(x) / lit(math.sqrt(2.0))
    val (wre, wim) = wofz(u, u)
    val kre = when(x >= 0.0, wre * lit(0.5))
      .otherwise(cos(x * x) - wre * lit(0.5))
    val kim = when(x >= 0.0, wim * lit(0.5))
      .otherwise(-sin(x * x) - wim * lit(0.5))
    (kre, kim)
  }

  /** (Re F₊, Im F₊, Re K₊, Im K₊) — modfresnelp's full tuple. The
    * minus family for real x is the conjugate of each part. */
  def modfresnelPlus(x: Column): (Column, Column, Column, Column) = {
    val (kre, kim) = modfresnelKPlus(x)
    val th = x * x + lit(math.Pi / 4.0)
    val sp = lit(math.sqrt(math.Pi))
    (sp * (cos(th) * kre - sin(th) * kim),
      sp * (cos(th) * kim + sin(th) * kre), kre, kim)
  }

  /** Frame-staged form of [[modfresnelPlus]]: appends mf_fre, mf_fim,
    * mf_kre, mf_kim behind projection boundaries so the Faddeeva pick
    * is planned ONCE (CollapseProject keeps non-cheap multiply-
    * referenced aliases staged) — the single-Column form re-inlines
    * the w4 regions ~10× across the six gate outputs and blows
    * analysis+codegen past 100 s. Stage shapes mirror
    * [[sqlModfresnelStaged]] op-for-op. */
  def modfresnelStaged(df: org.apache.spark.sql.DataFrame,
      x: Column): org.apache.spark.sql.DataFrame = {
    val keep = df.columns.toSeq.map(col)
    val s0 = df.select(keep :+ x.cast("double").as("mfx"): _*)
    val s1 = s0.select(keep ++ Seq(col("mfx"),
      (abs(col("mfx")) / lit(math.sqrt(2.0))).as("mfu")): _*)
    // r17 optimization round: the Faddeeva pick through the staged form
    // (one region-tree materialization instead of re+im each inlining
    // all four regions) — identical arithmetic, see wofzStaged.
    val s2 = wofzStaged(s1, col("mfu"), col("mfu"), "mfwre", "mfwim")
      .select(keep ++ Seq(col("mfx"), col("mfwre"), col("mfwim")): _*)
    val half = lit(0.5)
    val kre = when(col("mfx") >= 0.0, col("mfwre") * half)
      .otherwise(cos(col("mfx") * col("mfx")) - col("mfwre") * half)
    val kim = when(col("mfx") >= 0.0, col("mfwim") * half)
      .otherwise(-sin(col("mfx") * col("mfx")) - col("mfwim") * half)
    val s3 = s2.select(keep ++ Seq(col("mfx"),
      kre.as("mf_kre"), kim.as("mf_kim")): _*)
    val th = col("mfx") * col("mfx") + lit(math.Pi / 4.0)
    val sp = lit(math.sqrt(math.Pi))
    s3.select(keep ++ Seq(col("mf_kre"), col("mf_kim"),
      (sp * (cos(th) * col("mf_kre") - sin(th) * col("mf_kim"))).as("mf_fre"),
      (sp * (cos(th) * col("mf_kim") + sin(th) * col("mf_kre"))).as("mf_fim")): _*)
  }

  /** Staged SQL mirror of [[modfresnelPlus]]: returns a full SELECT
    * producing `carry` plus mf_fre, mf_fim, mf_kre, mf_kim. Staged
    * subselects (the sqlGammaincPQ pattern) so the two Faddeeva picks
    * are emitted exactly once — a single-expression mirror inlines the
    * wofz regions nine times and balloons past 10 MB of SQL. */
  def sqlModfresnelStaged(from: String, x: String,
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    var q = s"SELECT $keep, CAST(($x) AS DOUBLE) AS mfx FROM $from"
    q = s"SELECT $keep, mfx, " +
      s"(abs(mfx) / CAST('${math.sqrt(2.0)}' AS DOUBLE)) AS mfu FROM ($q)"
    q = s"SELECT $keep, mfx, (${sqlWofzRe("mfu", "mfu")}) AS mfwre, " +
      s"(${sqlWofzIm("mfu", "mfu")}) AS mfwim FROM ($q)"
    val half = "CAST('0.5' AS DOUBLE)"
    q = s"SELECT $keep, mfx, " +
      s"(CASE WHEN (mfx) >= 0.0 THEN (mfwre) * $half " +
      s"ELSE cos((mfx) * (mfx)) - (mfwre) * $half END) AS mf_kre, " +
      s"(CASE WHEN (mfx) >= 0.0 THEN (mfwim) * $half " +
      s"ELSE (-sin((mfx) * (mfx))) - (mfwim) * $half END) AS mf_kim " +
      s"FROM ($q)"
    val th = s"((mfx) * (mfx) + CAST('${math.Pi / 4.0}' AS DOUBLE))"
    val sp = s"CAST('${math.sqrt(math.Pi)}' AS DOUBLE)"
    s"SELECT $keep, mf_kre, mf_kim, " +
      s"($sp * (cos($th) * (mf_kre) - sin($th) * (mf_kim))) AS mf_fre, " +
      s"($sp * (cos($th) * (mf_kim) + sin($th) * (mf_kre))) AS mf_fim " +
      s"FROM ($q)"
  }

  // ------- inverse regularized incomplete gamma / beta
  // (gamma_funcs.py gammaincinv/gammainccinv, betaincinv) -------
  // Fixed-count Newton iterations — deterministic arithmetic both
  // sides can replay, which is what makes an INVERSE special function
  // oracle-able at all. Each step evaluates the SHALLOW forward kernel
  // (20-term series / 16-level CF for gamma, 16 m-levels for beta) so
  // the staged SQL replay stays under DuckDB's ~164-subselect ceiling
  // (5–6 steps ≈ 120 stages; dev probe measured the cap). Start values:
  // Wilson–Hilferty x₀ = a·(1 − 1/9a + z/3√a)³ with z = Φ⁻¹(p) for
  // gamma; x₀ = a/(a+b) for beta. Multiplicative (gamma) / midpoint
  // (beta) clamps keep iterates in domain. Accuracy ~1e-8 over the
  // documented windows a ∈ [0.5, 8], p ∈ [0.02, 0.98] (SpecialSpec
  // pins vs mpmath root-finds); the adaptive forward kernels remain
  // the general path.
  private val invSeriesDepth = 20
  private val invCfDepth = 16
  private val invGammaSteps = 5
  private val invBetaLevels = 16
  private val invBetaSteps = 6

  /** Newton inverse of P(a,·) (or Q(a,·) when `upper`), appended as
    * `ginv_<sfx>`. Spec: (sfx, a, p, upper). */
  def gammaincInvNewton(df: DataFrame, specs: Seq[(String, Column, Column, Boolean)]): DataFrame = {
    val others = df.columns.toSeq.map(col)
    // target is always the LOWER tail mass: P(a, x*) = t
    var d = df.select(others ++ specs.flatMap { case (s, a, p, upper) =>
      Seq(a.as(s"__ga_$s"),
        (if (upper) lit(1.0) - p else p).as(s"__gt_$s"))
    }: _*)
    d = d.select(col("*") +: specs.map { case (s, _, _, _) =>
      Distributions.normalInv(col(s"__gt_$s")).as(s"__gz_$s")
    }: _*)
    d = d.select(d.columns.toSeq.filterNot(_.startsWith("__gz")).map(col) ++
      specs.map { case (s, _, _, _) =>
        val a = col(s"__ga_$s")
        val wh = lit(1.0) - lit(1.0) / (lit(9.0) * a) +
          col(s"__gz_$s") / (lit(3.0) * sqrt(a))
        greatest(a * wh * wh * wh, lit(1e-4)).as(s"__gx_$s")
      }: _*)
    for (_ <- 1 to invGammaSteps) {
      d = d.select(col("*") +: specs.map { case (s, _, _, _) =>
        gammaincPDepth(col(s"__ga_$s"), col(s"__gx_$s"),
          invSeriesDepth, invCfDepth).as(s"__gp_$s")
      }: _*)
      d = d.select(d.columns.toSeq.filterNot(c =>
        c.startsWith("__gp") || c.startsWith("__gx")).map(col) ++
        specs.map { case (s, _, _, _) =>
          val a = col(s"__ga_$s"); val x = col(s"__gx_$s")
          val deriv = exp((a - lit(1.0)) * log(x) - x - gammalnPos(a))
          val xn = x - (col(s"__gp_$s") - col(s"__gt_$s")) / deriv
          when(xn <= x / 10.0, x / 10.0)
            .when(xn >= x * 10.0, x * 10.0)
            .otherwise(xn).as(s"__gx_$s")
        }: _*)
    }
    d.select(d.columns.toSeq.filterNot(_.startsWith("__g")).map(col) ++
      specs.map { case (s, _, _, _) => col(s"__gx_$s").as(s"ginv_$s") }: _*)
  }

  /** DuckDB mirror of [[gammaincInvNewton]]. Spec: (sfx, aExpr,
    * pExpr, upper); emits `ginv_<sfx>`. */
  def sqlGammaincInv(from: String, specs: Seq[(String, String, String, Boolean)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val work = specs.flatMap { case (s, _, _, _) =>
      Seq(s"wa_$s", s"wt_$s", s"wx_$s") }
    var q = s"SELECT $keep, " + specs.map { case (s, a, p, upper) =>
      val t = if (upper) s"(1.0 - ($p))" else s"($p)"
      s"CAST(($a) AS DOUBLE) AS wa_$s, CAST($t AS DOUBLE) AS wt_$s"
    }.mkString(", ") + s" FROM $from"
    q = s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
      s"wa_$s, wt_$s, (${Distributions.sqlNormalInv(s"wt_$s")}) AS wz_$s"
    }.mkString(", ") + s" FROM ($q)"
    q = s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
      val wh = s"(1.0 - 1.0 / (9.0 * wa_$s) + wz_$s / (3.0 * sqrt(wa_$s)))"
      s"wa_$s, wt_$s, greatest(wa_$s * $wh * $wh * $wh, 1e-4) AS wx_$s"
    }.mkString(", ") + s" FROM ($q)"
    for (_ <- 1 to invGammaSteps) {
      q = sqlGammaincPQDepth(s"($q)",
        specs.map { case (s, _, _, _) => (s, s"wa_$s", s"wx_$s") },
        carry ++ work, invSeriesDepth, invCfDepth)
      q = s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
        val deriv = s"exp((wa_$s - 1.0) * ln(wx_$s) - wx_$s - " +
          s"(${sqlGammalnPos(s"wa_$s")}))"
        val xn = s"(wx_$s - (g_p_$s - wt_$s) / ($deriv))"
        s"wa_$s, wt_$s, (CASE WHEN $xn <= wx_$s / 10.0 THEN wx_$s / 10.0 " +
          s"WHEN $xn >= wx_$s * 10.0 THEN wx_$s * 10.0 " +
          s"ELSE $xn END) AS wx_$s"
      }.mkString(", ") + s" FROM ($q)"
    }
    s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
      s"wx_$s AS ginv_$s"
    }.mkString(", ") + s" FROM ($q)"
  }

  /** Newton inverse of I_x(a,b), appended as `binv_<sfx>`. Spec:
    * (sfx, a, b, p). */
  def betaincInvNewton(df: DataFrame, specs: Seq[(String, Column, Column, Column)]): DataFrame = {
    val others = df.columns.toSeq.map(col)
    var d = df.select(others ++ specs.flatMap { case (s, a, b, p) =>
      Seq(a.as(s"__ba_$s"), b.as(s"__bb_$s"), p.as(s"__bt_$s"),
        (a / (a + b)).as(s"__bx_$s"))
    }: _*)
    for (_ <- 1 to invBetaSteps) {
      d = d.select(col("*") +: specs.map { case (s, _, _, _) =>
        betaincRegDepth(col(s"__ba_$s"), col(s"__bb_$s"), col(s"__bx_$s"),
          invBetaLevels).as(s"__bp_$s")
      }: _*)
      d = d.select(d.columns.toSeq.filterNot(c =>
        c.startsWith("__bp") || c.startsWith("__bx")).map(col) ++
        specs.map { case (s, _, _, _) =>
          val a = col(s"__ba_$s"); val b = col(s"__bb_$s")
          val x = col(s"__bx_$s")
          val deriv = exp((a - lit(1.0)) * log(x) +
            (b - lit(1.0)) * log(lit(1.0) - x) +
            gammalnPos(a + b) - gammalnPos(a) - gammalnPos(b))
          val xn = x - (col(s"__bp_$s") - col(s"__bt_$s")) / deriv
          when(xn <= 0.0, x / 2.0)
            .when(xn >= 1.0, (x + lit(1.0)) / 2.0)
            .otherwise(xn).as(s"__bx_$s")
        }: _*)
    }
    d.select(d.columns.toSeq.filterNot(_.startsWith("__b")).map(col) ++
      specs.map { case (s, _, _, _) => col(s"__bx_$s").as(s"binv_$s") }: _*)
  }

  /** DuckDB mirror of [[betaincInvNewton]]. Spec: (sfx, aExpr, bExpr,
    * pExpr); emits `binv_<sfx>`. */
  def sqlBetaincInv(from: String, specs: Seq[(String, String, String, String)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val work = specs.flatMap { case (s, _, _, _) =>
      Seq(s"va_$s", s"vb_$s", s"vt_$s", s"vx_$s") }
    var q = s"SELECT $keep, " + specs.map { case (s, a, b, p) =>
      s"CAST(($a) AS DOUBLE) AS va_$s, CAST(($b) AS DOUBLE) AS vb_$s, " +
        s"CAST(($p) AS DOUBLE) AS vt_$s, " +
        s"CAST(($a) AS DOUBLE) / (CAST(($a) AS DOUBLE) + " +
        s"CAST(($b) AS DOUBLE)) AS vx_$s"
    }.mkString(", ") + s" FROM $from"
    for (_ <- 1 to invBetaSteps) {
      q = sqlBetaincStagedDepth(s"($q)",
        specs.map { case (s, _, _, _) => (s, s"va_$s", s"vb_$s", s"vx_$s") },
        carry ++ work, invBetaLevels)
      q = s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
        val deriv = s"exp((va_$s - 1.0) * ln(vx_$s) + " +
          s"(vb_$s - 1.0) * ln(1.0 - vx_$s) + " +
          s"(${sqlGammalnPos(s"(va_$s + vb_$s)")}) - " +
          s"(${sqlGammalnPos(s"va_$s")}) - (${sqlGammalnPos(s"vb_$s")}))"
        val xn = s"(vx_$s - (bi_$s - vt_$s) / ($deriv))"
        s"va_$s, vb_$s, vt_$s, (CASE WHEN $xn <= 0.0 THEN vx_$s / 2.0 " +
          s"WHEN $xn >= 1.0 THEN (vx_$s + 1.0) / 2.0 " +
          s"ELSE $xn END) AS vx_$s"
      }.mkString(", ") + s" FROM ($q)"
    }
    s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
      s"vx_$s AS binv_$s"
    }.mkString(", ") + s" FROM ($q)"
  }

  // ------- Carlson R_G (ellip_func_integrals.py elliprg) -------
  // DLMF 19.21.10 composes R_G from the bit-exact R_F/R_D stages:
  //   2·R_G(x,y,z) = z·R_F(x,y,z) − (x−z)(y−z)/3·R_D(x,y,z) + √(xy/z)
  // (z ≠ 0; callers put a strictly positive argument in the z slot).
  // Pure IEEE +·/√ over the shared duplication — gate UNROUNDED like
  // R_F/R_D themselves.

  /** Appends `rg_<sfx>` per spec (sfx, x, y, z); z must be > 0. */
  def ellipRg(df: DataFrame, specs: Seq[(String, Column, Column, Column)]): DataFrame = {
    val others = df.columns.toSeq.map(col)
    val staged = df.select(others ++ specs.flatMap { case (s, x, y, z) =>
      Seq(x.as(s"__gx_$s"), y.as(s"__gy_$s"), z.as(s"__gz_$s"))
    }: _*)
    val fd = carlsonFD(staged, specs.map { case (s, _, _, _) =>
      (s, col(s"__gx_$s"), col(s"__gy_$s"), col(s"__gz_$s"), true)
    })
    val keep = fd.columns.toSeq.filterNot(c => c.startsWith("__g") ||
      specs.exists(sp => c == s"rf_${sp._1}" || c == s"rd_${sp._1}")).map(col)
    fd.select(keep ++ specs.map { case (s, _, _, _) =>
      val x = col(s"__gx_$s"); val y = col(s"__gy_$s"); val z = col(s"__gz_$s")
      ((z * col(s"rf_$s") -
        (x - z) * (y - z) / lit(3.0) * col(s"rd_$s") +
        sqrt(x * y / z)) / lit(2.0)).as(s"rg_$s")
    }: _*)
  }

  /** DuckDB mirror of [[ellipRg]]: exposes `rg_<sfx>`.
    * Spec: (sfx, xExpr, yExpr, zExpr). */
  def sqlEllipRg(from: String, specs: Seq[(String, String, String, String)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val staged = s"SELECT $keep, " + specs.map { case (s, x, y, z) =>
      s"CAST(($x) AS DOUBLE) AS gx_$s, CAST(($y) AS DOUBLE) AS gy_$s, " +
        s"CAST(($z) AS DOUBLE) AS gz_$s"
    }.mkString(", ") + s" FROM $from"
    val fd = sqlCarlsonFD(s"($staged)",
      specs.map { case (s, _, _, _) => (s, s"gx_$s", s"gy_$s", s"gz_$s", true) },
      carry ++ specs.flatMap { case (s, _, _, _) =>
        Seq(s"gx_$s", s"gy_$s", s"gz_$s") })
    s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
      s"(gz_$s * rf_$s - (gx_$s - gz_$s) * (gy_$s - gz_$s) / " +
        s"CAST(3.0 AS DOUBLE) * rd_$s + sqrt(gx_$s * gy_$s / gz_$s)) / " +
        s"CAST(2.0 AS DOUBLE) AS rg_$s"
    }.mkString(", ") + s" FROM ($fd)"
  }

  // ------- Tricomi confluent U(a,b,z)
  // (hypergeometric_funcs.py hyperu) -------
  // Kummer connection (DLMF 13.2.42), windowed to b ∈ (0,1), a > 0,
  // 0 < z ≤ 20 (the hyp1f1 series window):
  //   U(a,b,z) = Γ(1−b)/Γ(a+1−b)·M(a,b,z)
  //            + Γ(b−1)/Γ(a)·z^{1−b}·M(a+1−b,2−b,z)
  // with Γ(b−1) rewritten through the recurrence Γ(b−1) =
  // Γ(b+1)/((b−1)·b) so every Γ stays on the positive Lanczos branch
  // (the SQL mirror stages the identical shapes; integer b — where the
  // connection degenerates — is outside the window by contract).
  // libm enters via exp/ln/pow of identical inputs → round 6.

  def hyperu(a: Column, b: Column, z: Column): Column = {
    val m1 = hyp1f1(a, b, z)
    val m2 = hyp1f1(a + lit(1.0) - b, lit(2.0) - b, z)
    val g1mb = exp(gammalnPos(lit(1.0) - b))
    val gab = exp(gammalnPos(a + lit(1.0) - b))
    val gbm1 = exp(gammalnPos(b + lit(1.0))) / ((b - lit(1.0)) * b)
    val ga = exp(gammalnPos(a))
    g1mb / gab * m1 + gbm1 / ga * pow(z, lit(1.0) - b) * m2
  }

  /** DuckDB mirror of [[hyperu]], staged through [[sqlHypStaged]]:
    * exposes `hu_<sfx>`. Spec: (sfx, aExpr, bExpr, zExpr). */
  def sqlHyperu(from: String, specs: Seq[(String, String, String, String)],
      carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val staged0 = s"SELECT $keep, " + specs.map { case (s, a, b, z) =>
      s"CAST(($a) AS DOUBLE) AS ua_$s, CAST(($b) AS DOUBLE) AS ub_$s, " +
        s"CAST(($z) AS DOUBLE) AS uz_$s"
    }.mkString(", ") + s" FROM $from"
    val carry2 = carry ++ specs.flatMap { case (s, _, _, _) =>
      Seq(s"ua_$s", s"ub_$s", s"uz_$s") }
    val hyp = sqlHypStaged(s"($staged0)", Nil,
      specs.flatMap { case (s, _, _, _) => Seq(
        (s"${s}m1", s"ua_$s", s"ub_$s", s"uz_$s"),
        (s"${s}m2", s"ua_$s + 1.0 - ub_$s", s"2.0 - ub_$s", s"uz_$s")) },
      carry2)
    s"SELECT $keep, " + specs.map { case (s, _, _, _) =>
      val g1mb = s"exp(${sqlGammalnPos(s"1.0 - ub_$s")})"
      val gab = s"exp(${sqlGammalnPos(s"ua_$s + 1.0 - ub_$s")})"
      val gbm1 = s"(exp(${sqlGammalnPos(s"ub_$s + 1.0")}) / " +
        s"((ub_$s - 1.0) * ub_$s))"
      val ga = s"exp(${sqlGammalnPos(s"ua_$s")})"
      s"$g1mb / $gab * h1_${s}m1 + $gbm1 / $ga * " +
        s"power(uz_$s, 1.0 - ub_$s) * h1_${s}m2 AS hu_$s"
    }.mkString(", ") + s" FROM ($hyp)"
  }

  // ------- half-integer (spherical) Bessel: jv/yv/iv/kv at ν = k + 1/2
  // (bessel.py jv/yv/iv/kv accept REAL order; the half-integer family
  // has closed elementary seeds — A&S 10.1.11/10.2.13 spherical forms —
  // and rides the same three-term recurrences as the integer family.
  // General non-half-integer real order stays out of scope with the
  // Cephes machinery.) sinh/cosh are spelled as exp composites so the
  // DuckDB mirror (which lacks them) keeps the identical shape. Upward
  // J direction needs x ≳ ν like the integer gates; k ≤ 6. -------

  private def upHalf(k: Int, base0: Column, base1: Column, x: Column,
      sign: Double, flip: Boolean): Column = {
    require(k >= 0 && k <= 6, s"half-integer Bessel supports k ≤ 6: $k")
    if (k == 0) base0
    else if (k == 1) base1
    else {
      var prev = base0; var cur = base1
      for (j <- 1 until k) {
        val nu = j + 0.5
        val next =
          if (flip) prev + lit(sign * 2.0 * nu) / x * cur
          else lit(2.0 * nu) / x * cur + lit(sign) * prev
        prev = cur; cur = next
      }
      cur
    }
  }

  private def sqlUpHalf(k: Int, base0: String, base1: String, x: String,
      sign: Double, flip: Boolean): String = {
    require(k >= 0 && k <= 6, s"half-integer Bessel supports k ≤ 6: $k")
    if (k == 0) base0
    else if (k == 1) base1
    else {
      var prev = base0; var cur = base1
      for (j <- 1 until k) {
        val nu = j + 0.5
        val next =
          if (flip) s"(($prev) + CAST('${sign * 2.0 * nu}' AS DOUBLE) / ($x) * ($cur))"
          else s"(CAST('${2.0 * nu}' AS DOUBLE) / ($x) * ($cur) + CAST('$sign' AS DOUBLE) * ($prev))"
        prev = cur; cur = next
      }
      cur
    }
  }

  private val twoOverPi = 2.0 / math.Pi
  private val piOverTwo = math.Pi / 2.0

  /** J_{k+1/2}(x): seeds √(2/(πx))·sin x and √(2/(πx))·(sin x/x − cos x). */
  def besselJHalf(k: Int, x: Column): Column = {
    val amp = sqrt(lit(twoOverPi) / x)
    upHalf(k, amp * sin(x), amp * (sin(x) / x - cos(x)), x, -1.0, flip = false)
  }
  def sqlBesselJHalf(k: Int, x: String): String = {
    val amp = s"sqrt(CAST('$twoOverPi' AS DOUBLE) / ($x))"
    sqlUpHalf(k, s"($amp * sin($x))",
      s"($amp * (sin($x) / ($x) - cos($x)))", x, -1.0, flip = false)
  }

  /** Y_{k+1/2}(x): seeds −√(2/(πx))·cos x and −√(2/(πx))·(cos x/x + sin x). */
  def besselYHalf(k: Int, x: Column): Column = {
    val amp = sqrt(lit(twoOverPi) / x)
    upHalf(k, -(amp * cos(x)), -(amp * (cos(x) / x + sin(x))), x, -1.0,
      flip = false)
  }
  def sqlBesselYHalf(k: Int, x: String): String = {
    val amp = s"sqrt(CAST('$twoOverPi' AS DOUBLE) / ($x))"
    sqlUpHalf(k, s"(-($amp * cos($x)))",
      s"(-($amp * (cos($x) / ($x) + sin($x))))", x, -1.0, flip = false)
  }

  /** I_{k+1/2}(x): seeds over the exp-composite sinh/cosh;
    * recurrence I_{ν+1} = I_{ν−1} − (2ν/x)I_ν. */
  def besselIHalf(k: Int, x: Column): Column = {
    val amp = sqrt(lit(twoOverPi) / x)
    val sh = (exp(x) - exp(-x)) / lit(2.0)
    val ch = (exp(x) + exp(-x)) / lit(2.0)
    upHalf(k, amp * sh, amp * (ch - sh / x), x, -1.0, flip = true)
  }
  def sqlBesselIHalf(k: Int, x: String): String = {
    val amp = s"sqrt(CAST('$twoOverPi' AS DOUBLE) / ($x))"
    val sh = s"((exp($x) - exp(-($x))) / CAST(2.0 AS DOUBLE))"
    val ch = s"((exp($x) + exp(-($x))) / CAST(2.0 AS DOUBLE))"
    sqlUpHalf(k, s"($amp * $sh)", s"($amp * ($ch - $sh / ($x)))", x, -1.0,
      flip = true)
  }

  /** K_{k+1/2}(x): seeds √(π/(2x))·e^{−x} and √(π/(2x))·e^{−x}·(1 + 1/x);
    * recurrence K_{ν+1} = K_{ν−1} + (2ν/x)K_ν (stable upward). */
  def besselKHalf(k: Int, x: Column): Column = {
    val amp = sqrt(lit(piOverTwo) / x)
    upHalf(k, amp * exp(-x),
      amp * exp(-x) * (lit(1.0) + lit(1.0) / x), x, 1.0, flip = true)
  }
  def sqlBesselKHalf(k: Int, x: String): String = {
    val amp = s"sqrt(CAST('$piOverTwo' AS DOUBLE) / ($x))"
    sqlUpHalf(k, s"($amp * exp(-($x)))",
      s"($amp * exp(-($x)) * (CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / ($x)))",
      x, 1.0, flip = true)
  }

  // ------- GENERAL real-order Bessel via the ₀F₁ representation
  // (bessel.py jv/yv/iv/kv at arbitrary real ν) -------
  //   J_ν(x) = (x/2)^ν/Γ(ν+1)·₀F₁(;ν+1;−x²/4)
  //   I_ν(x) = (x/2)^ν/Γ(ν+1)·₀F₁(;ν+1;+x²/4)
  // (DLMF 10.2.2/10.25.2), windowed to x²/4 ≤ 20 ⇒ x ≤ ~8.9 (the
  // hyp0f1 series contract) and ν ≥ 0. Y/K come from the reflection
  // connections for NON-integer ν ∈ (0, 1) (half-integers covered
  // separately above; integers by the recurrence gates):
  //   Y_ν = (J_ν·cos νπ − J_{−ν})/sin νπ
  //   K_ν = π/2·(I_{−ν} − I_ν)/sin νπ
  // where the −ν member uses Γ(1−ν) (positive branch for ν < 1). The
  // K cancellation is bounded: relative loss ~e^{−2x} of the I
  // magnitude, absolute error ~|I|·1e−16 ≪ the round-6 gate.

  private def bessel0f1(v: Column, x: Column, signPlus: Boolean): Column = {
    val arg = if (signPlus) x * x / lit(4.0) else -(x * x / lit(4.0))
    exp(v * log(x / lit(2.0)) - gammalnPos(v + lit(1.0))) *
      hyp0f1(v + lit(1.0), arg)
  }
  private def sqlBessel0f1(v: String, x: String, signPlus: Boolean): String = {
    val arg = if (signPlus) s"(($x) * ($x) / CAST(4.0 AS DOUBLE))"
      else s"(-(($x) * ($x) / CAST(4.0 AS DOUBLE)))"
    s"(exp(($v) * ln(($x) / CAST(2.0 AS DOUBLE)) - " +
      s"(${sqlGammalnPos(s"($v) + 1.0")})) * ${sqlHyp0f1(s"($v) + 1.0", arg)})"
  }
  private def bessel0f1Neg(v: Column, x: Column, signPlus: Boolean): Column = {
    val arg = if (signPlus) x * x / lit(4.0) else -(x * x / lit(4.0))
    exp(-v * log(x / lit(2.0)) - gammalnPos(lit(1.0) - v)) *
      hyp0f1(lit(1.0) - v, arg)
  }
  private def sqlBessel0f1Neg(v: String, x: String, signPlus: Boolean): String = {
    val arg = if (signPlus) s"(($x) * ($x) / CAST(4.0 AS DOUBLE))"
      else s"(-(($x) * ($x) / CAST(4.0 AS DOUBLE)))"
    s"(exp((-($v)) * ln(($x) / CAST(2.0 AS DOUBLE)) - " +
      s"(${sqlGammalnPos(s"1.0 - ($v)")})) * ${sqlHyp0f1(s"1.0 - ($v)", arg)})"
  }

  /** J_ν(x), real ν ≥ 0, 0 < x ≤ ~8.9. */
  def besselJv(v: Column, x: Column): Column = bessel0f1(v, x, signPlus = false)
  def sqlBesselJv(v: String, x: String): String =
    sqlBessel0f1(v, x, signPlus = false)

  /** I_ν(x), real ν ≥ 0, 0 < x ≤ ~8.9. */
  def besselIv(v: Column, x: Column): Column = bessel0f1(v, x, signPlus = true)
  def sqlBesselIv(v: String, x: String): String =
    sqlBessel0f1(v, x, signPlus = true)

  /** Y_ν(x), non-integer ν ∈ (0, 1), 0 < x ≤ ~8.9. */
  def besselYv(v: Column, x: Column): Column =
    (besselJv(v, x) * cos(v * lit(math.Pi)) - bessel0f1Neg(v, x, signPlus = false)) /
      sin(v * lit(math.Pi))
  def sqlBesselYv(v: String, x: String): String =
    s"((${sqlBesselJv(v, x)} * cos(($v) * CAST('${math.Pi}' AS DOUBLE)) - " +
      s"${sqlBessel0f1Neg(v, x, signPlus = false)}) / " +
      s"sin(($v) * CAST('${math.Pi}' AS DOUBLE)))"

  /** Real-order Hankel H⁽¹⁾/H⁽²⁾_ν = J_ν ± i·Y_ν and the e^{∓ix}-scaled
    * hankel1e/2e (bessel.py at real ν) — pure compositions of
    * [[besselJv]]/[[besselYv]] (same windows; differentially covered
    * through the jv/yv gates, compositions pinned in SpecialSpec). */
  def hankel1vRe(v: Column, x: Column): Column = besselJv(v, x)
  def hankel1vIm(v: Column, x: Column): Column = besselYv(v, x)
  def hankel2vRe(v: Column, x: Column): Column = besselJv(v, x)
  def hankel2vIm(v: Column, x: Column): Column = -besselYv(v, x)
  def hankel1veRe(v: Column, x: Column): Column =
    besselJv(v, x) * cos(x) + besselYv(v, x) * sin(x)
  def hankel1veIm(v: Column, x: Column): Column =
    besselYv(v, x) * cos(x) - besselJv(v, x) * sin(x)
  def hankel2veRe(v: Column, x: Column): Column =
    besselJv(v, x) * cos(x) + besselYv(v, x) * sin(x)
  def hankel2veIm(v: Column, x: Column): Column =
    besselJv(v, x) * sin(x) - besselYv(v, x) * cos(x)

  /** K_ν(x), non-integer ν ∈ (0, 1), 0 < x ≤ ~8.9. */
  def besselKv(v: Column, x: Column): Column =
    lit(math.Pi / 2.0) * (bessel0f1Neg(v, x, signPlus = true) - besselIv(v, x)) /
      sin(v * lit(math.Pi))
  def sqlBesselKv(v: String, x: String): String =
    s"(CAST('${math.Pi / 2.0}' AS DOUBLE) * " +
      s"(${sqlBessel0f1Neg(v, x, signPlus = true)} - ${sqlBesselIv(v, x)}) / " +
      s"sin(($v) * CAST('${math.Pi}' AS DOUBLE)))"

  // ------- large-x Bessel asymptotics (bessel.py jv/yv/iv/kv beyond
  // the series window) -------
  // Hankel's expansions, A&S 9.2.5–9.2.10 / 9.7.1–9.7.2, with
  // μ = 4ν² and χ = x − (ν/2 + 1/4)π:
  //   J_ν = √(2/πx)(P cos χ − Q sin χ),  Y_ν = √(2/πx)(P sin χ + Q cos χ)
  //   I_ν·e^{−x} = Σ(−1)^k a_k / √(2πx),  K_ν·e^{x} = √(π/2x)·Σ a_k
  // with a_k = Π_{j≤k}(μ−(2j−1)²)/(k!(8x)^k); P/Q are the even/odd
  // alternating halves. 12 terms, windowed to 0 ≤ ν ≤ 4 and x ≥ 8.5
  // (mpmath-validated: |ε| ≤ 9e−9 abs for J/Y, ≤ 4.5e−7 rel for the
  // scaled I, ≤ 1.3e−8 rel for the scaled K — under the round-6 gate),
  // which OVERLAPS the ₀F₁ series window (x ≤ ~8.9) so the *Ext
  // branched forms below cover all x > 0. Deterministic same-shape
  // arithmetic on both engines. NaN-guarded outside by contract like
  // every other window (callers slice, they don't trust the tails).
  private val besselAsymTerms = 12
  private val besselAsymCut = 8.7 // inside the series/asymptotic overlap

  /** (P, Q, ΣI, ΣK) of the four Hankel sums at (μ, 1/(8x)). */
  private def besselAsymSums(v: Column, x: Column): (Column, Column, Column, Column) = {
    val mu = lit(4.0) * v * v
    val ex = lit(8.0) * x
    var num: Column = lit(1.0)
    var pw: Column = lit(1.0)
    var fact = 1.0
    var p: Column = lit(1.0); var q: Column = lit(0.0)
    var si: Column = lit(1.0); var sk: Column = lit(1.0)
    for (k <- 1 to besselAsymTerms) {
      num = num * (mu - lit(((2 * k - 1) * (2 * k - 1)).toDouble))
      pw = pw * ex
      fact *= k
      val t = num / (lit(fact) * pw)
      if (k % 2 == 1) q = if (((k - 1) / 2) % 2 == 0) q + t else q - t
      else p = if ((k / 2) % 2 == 0) p + t else p - t
      si = if (k % 2 == 1) si - t else si + t
      sk = sk + t
    }
    (p, q, si, sk)
  }
  private def sqlBesselAsymSums(v: String, x: String): (String, String, String, String) = {
    val mu = s"(CAST(4.0 AS DOUBLE) * ($v) * ($v))"
    val ex = s"(CAST(8.0 AS DOUBLE) * ($x))"
    var num = "CAST(1.0 AS DOUBLE)"
    var pw = "CAST(1.0 AS DOUBLE)"
    var fact = 1.0
    var p = "CAST(1.0 AS DOUBLE)"; var q = "CAST(0.0 AS DOUBLE)"
    var si = "CAST(1.0 AS DOUBLE)"; var sk = "CAST(1.0 AS DOUBLE)"
    for (k <- 1 to besselAsymTerms) {
      num = s"($num * ($mu - CAST('${((2 * k - 1) * (2 * k - 1)).toDouble}' AS DOUBLE)))"
      pw = s"($pw * $ex)"
      fact *= k
      val t = s"($num / (CAST('$fact' AS DOUBLE) * $pw))"
      if (k % 2 == 1) q = if (((k - 1) / 2) % 2 == 0) s"($q + $t)" else s"($q - $t)"
      else p = if ((k / 2) % 2 == 0) s"($p + $t)" else s"($p - $t)"
      si = if (k % 2 == 1) s"($si - $t)" else s"($si + $t)"
      sk = s"($sk + $t)"
    }
    (p, q, si, sk)
  }

  private def besselChi(v: Column, x: Column): Column =
    x - (v / lit(2.0) + lit(0.25)) * lit(math.Pi)
  private def sqlBesselChi(v: String, x: String): String =
    s"(($x) - (($v) / CAST(2.0 AS DOUBLE) + CAST(0.25 AS DOUBLE)) * " +
      s"CAST('${math.Pi}' AS DOUBLE))"
  private def besselAmp(x: Column): Column =
    sqrt(lit(2.0 / math.Pi) / x)
  private def sqlBesselAmp(x: String): String =
    s"sqrt(CAST('${2.0 / math.Pi}' AS DOUBLE) / ($x))"

  /** J_ν(x) by Hankel's expansion, 0 ≤ ν ≤ 4, x ≥ 8.5. */
  def besselJvAsym(v: Column, x: Column): Column = {
    val (p, q, _, _) = besselAsymSums(v, x)
    val chi = besselChi(v, x)
    besselAmp(x) * (p * cos(chi) - q * sin(chi))
  }
  def sqlBesselJvAsym(v: String, x: String): String = {
    val (p, q, _, _) = sqlBesselAsymSums(v, x)
    val chi = sqlBesselChi(v, x)
    s"(${sqlBesselAmp(x)} * (($p) * cos($chi) - ($q) * sin($chi)))"
  }

  /** Y_ν(x) by Hankel's expansion, 0 ≤ ν ≤ 4, x ≥ 8.5. */
  def besselYvAsym(v: Column, x: Column): Column = {
    val (p, q, _, _) = besselAsymSums(v, x)
    val chi = besselChi(v, x)
    besselAmp(x) * (p * sin(chi) + q * cos(chi))
  }
  def sqlBesselYvAsym(v: String, x: String): String = {
    val (p, q, _, _) = sqlBesselAsymSums(v, x)
    val chi = sqlBesselChi(v, x)
    s"(${sqlBesselAmp(x)} * (($p) * sin($chi) + ($q) * cos($chi)))"
  }

  /** I_ν(x)·e^{−x} (scipy ive) by 9.7.1, 0 ≤ ν ≤ 4, x ≥ 8.5 — the
    * scaled form keeps gate magnitudes O(0.1) where raw I overflows. */
  def besselIveAsym(v: Column, x: Column): Column = {
    val (_, _, si, _) = besselAsymSums(v, x)
    si / sqrt(lit(2.0 * math.Pi) * x)
  }
  def sqlBesselIveAsym(v: String, x: String): String = {
    val (_, _, si, _) = sqlBesselAsymSums(v, x)
    s"(($si) / sqrt(CAST('${2.0 * math.Pi}' AS DOUBLE) * ($x)))"
  }

  /** K_ν(x)·e^{x} (scipy kve) by 9.7.2, 0 ≤ ν ≤ 4, x ≥ 8.5. */
  def besselKveAsym(v: Column, x: Column): Column = {
    val (_, _, _, sk) = besselAsymSums(v, x)
    sqrt(lit(math.Pi / 2.0) / x) * sk
  }
  def sqlBesselKveAsym(v: String, x: String): String = {
    val (_, _, _, sk) = sqlBesselAsymSums(v, x)
    s"(sqrt(CAST('${math.Pi / 2.0}' AS DOUBLE) / ($x)) * ($sk))"
  }

  /** Branched J_ν over ALL x > 0 (series below the cut, Hankel above),
    * ν ∈ [0, 4]. The branch point 8.7 sits inside the validated
    * overlap of the two kernels. */
  def besselJvExt(v: Column, x: Column): Column =
    when(x < besselAsymCut, besselJv(v, x)).otherwise(besselJvAsym(v, x))
  def sqlBesselJvExt(v: String, x: String): String =
    s"(CASE WHEN ($x) < $besselAsymCut THEN ${sqlBesselJv(v, x)} " +
      s"ELSE ${sqlBesselJvAsym(v, x)} END)"

  /** Branched Y_ν over ALL x > 0: ν ∈ (0, 1) below the cut (the series
    * reflection's contract), ν ∈ [0, 4] above. */
  def besselYvExt(v: Column, x: Column): Column =
    when(x < besselAsymCut, besselYv(v, x)).otherwise(besselYvAsym(v, x))
  def sqlBesselYvExt(v: String, x: String): String =
    s"(CASE WHEN ($x) < $besselAsymCut THEN ${sqlBesselYv(v, x)} " +
      s"ELSE ${sqlBesselYvAsym(v, x)} END)"

  /** Branched I_ν·e^{−x} over ALL x > 0, ν ∈ [0, 4]. */
  def besselIveExt(v: Column, x: Column): Column =
    when(x < besselAsymCut, besselIv(v, x) * exp(-x))
      .otherwise(besselIveAsym(v, x))
  def sqlBesselIveExt(v: String, x: String): String =
    s"(CASE WHEN ($x) < $besselAsymCut THEN " +
      s"(${sqlBesselIv(v, x)} * exp(-($x))) " +
      s"ELSE ${sqlBesselIveAsym(v, x)} END)"

  /** Branched K_ν·e^{x} over ALL x > 0: ν ∈ (0, 1) below the cut,
    * ν ∈ [0, 4] above. */
  def besselKveExt(v: Column, x: Column): Column =
    when(x < besselAsymCut, besselKv(v, x) * exp(x))
      .otherwise(besselKveAsym(v, x))
  def sqlBesselKveExt(v: String, x: String): String =
    s"(CASE WHEN ($x) < $besselAsymCut THEN " +
      s"(${sqlBesselKv(v, x)} * exp($x)) " +
      s"ELSE ${sqlBesselKveAsym(v, x)} END)"

  // ------- large real-order Bessel (bessel.py jv/yv/ive/kve at
  // ν = k + f, k ≤ 24 compile-time, NON-integer f ∈ (0,1)) -------
  // Closes the "large real ν remains series-windowed" gap (r12 VERDICT
  // missing #6): J/I already cover ANY ν ≥ 0 below the cut (the ₀F₁
  // window constrains x, not ν), so what's missing is (a) Y/K at
  // non-integer ν > 1 anywhere and (b) J/I at ν > 4 above the cut.
  // (a) ORDER RECURRENCE, upward — the stable direction for Y and K at
  //     every x (both grow with order): the (ν_f, ν_f+1) anchor pair
  //     comes from the series reflections below the cut
  //     (Y_{f−1} = Y_{−(1−f)} = sin((1−f)π)J_{1−f} + cos((1−f)π)Y_{1−f},
  //     DLMF 10.4.2; K_{f−1} = K_{1−f} by K's order symmetry — then one
  //     forward step) and from the ν ≤ 4 Hankel asymptotics above it.
  // (b) MILLER's algorithm, downward — the stable direction for J in
  //     the decay regime and for I everywhere: seed (0, 1) at order
  //     f + k + 25, recur down to f, normalize against the Hankel
  //     anchors at orders f / f+1 (J picks the anchor of larger
  //     magnitude — consecutive-order J zeros interlace, so both can't
  //     vanish; I is positive and downward-dominant at EVERY x, one
  //     anchor suffices). Miller requires the start order above the
  //     turning point (M > x) — for J at x ≥ k + 15 the whole chain is
  //     oscillatory and the UPWARD recurrence from the Hankel anchors
  //     is the well-conditioned direction instead (the existing
  //     integer-gate "x ≳ n" contract), so J branches three ways:
  //     series below the cut, Miller for cut ≤ x < k + 15, upward
  //     beyond. Below the cut J/I stay on the direct series at
  //     ν = k + f (the ₀F₁ window constrains x only).
  // Everything is STAGED on BOTH sides ([[modfresnelStaged]] /
  // [[sqlGammaincPQ]] pattern): a raw two-term recurrence Column tree
  // duplicates subtrees Fibonacci-fast (the n ≤ 6 guard on the integer
  // gates exists for exactly that reason), and the SQL mirror would
  // blow DuckDB's 128-deep expression binder. One projection per step
  // keeps both linear; shapes match op-for-op across the stage
  // boundary, so op_special_bessel_large gates bit-mirrored values.
  // Accuracy is pinned in SpecialSpec by EXACT cross-relations: the
  // Wronskians J_{ν+1}Y_ν − J_νY_{ν+1} = 2/(πx) and
  // ive_ν·kve_{ν+1} + ive_{ν+1}·kve_ν = 1/x, plus closed-form
  // half-integer cross-checks at ν = 10.5.

  private val besselLargeMillerPad = 25

  private def besselLargeCast(df: org.apache.spark.sql.DataFrame,
      f: Column, x: Column, out: String): org.apache.spark.sql.DataFrame = {
    val keep = df.columns.toSeq.map(col)
    df.select(keep ++ Seq(f.cast("double").as(s"${out}_f"),
      x.cast("double").as(s"${out}_x")): _*)
  }

  /** Y_{k+f}(x), all x > 0 — see the section note. Appends `out`. */
  def besselYvLargeStaged(df: org.apache.spark.sql.DataFrame, k: Int,
      f: Column, x: Column, out: String): org.apache.spark.sql.DataFrame = {
    require(k >= 0 && k <= 24, s"besselYvLargeStaged supports k ≤ 24: $k")
    val keep = df.columns.toSeq.map(col)
    val s0 = besselLargeCast(df, f, x, out)
    val ff = col(s"${out}_f"); val xx = col(s"${out}_x")
    val mu = lit(1.0) - ff
    val below = xx < besselAsymCut
    val yA = when(below, besselYv(ff, xx)).otherwise(besselYvAsym(ff, xx))
    val yM1 = when(below,
      sin(mu * lit(math.Pi)) * besselJv(mu, xx) +
        cos(mu * lit(math.Pi)) * besselYv(mu, xx)).otherwise(lit(0.0))
    val s1 = s0.select(keep ++ Seq(ff, xx,
      yA.as(s"${out}_a"), yM1.as(s"${out}_m1")): _*)
    val yB = when(below,
        lit(2.0) * ff / xx * col(s"${out}_a") - col(s"${out}_m1"))
      .otherwise(besselYvAsym(ff + lit(1.0), xx))
    var cur = s1.select(keep ++ Seq(ff, xx,
      col(s"${out}_a"), yB.as(s"${out}_b")): _*)
    for (m <- 1 until k) {
      val next = lit(2.0) * (ff + lit(m.toDouble)) / xx *
        col(s"${out}_b") - col(s"${out}_a")
      cur = cur.select(keep ++ Seq(ff, xx,
        col(s"${out}_b").as(s"${out}_a"), next.as(s"${out}_b")): _*)
    }
    val res = if (k == 0) col(s"${out}_a") else col(s"${out}_b")
    cur.select(keep :+ res.as(out): _*)
  }

  /** Staged SQL mirror of [[besselYvLargeStaged]]: full SELECT producing
    * `carry` plus `out`. */
  def sqlBesselYvLargeStaged(from: String, k: Int, f: String, x: String,
      carry: Seq[String], out: String): String = {
    require(k >= 0 && k <= 24, s"sqlBesselYvLargeStaged supports k ≤ 24: $k")
    val keep = carry.mkString(", ")
    val ff = s"${out}_f"; val xx = s"${out}_x"
    var q = s"SELECT $keep, CAST(($f) AS DOUBLE) AS $ff, " +
      s"CAST(($x) AS DOUBLE) AS $xx FROM $from"
    val mu = s"(1.0 - $ff)"
    val below = s"($xx) < $besselAsymCut"
    q = s"SELECT $keep, $ff, $xx, " +
      s"(CASE WHEN $below THEN ${sqlBesselYv(ff, xx)} " +
      s"ELSE ${sqlBesselYvAsym(ff, xx)} END) AS ${out}_a, " +
      s"(CASE WHEN $below THEN " +
      s"(sin($mu * CAST('${math.Pi}' AS DOUBLE)) * ${sqlBesselJv(mu, xx)} + " +
      s"cos($mu * CAST('${math.Pi}' AS DOUBLE)) * ${sqlBesselYv(mu, xx)}) " +
      s"ELSE 0.0 END) AS ${out}_m1 FROM ($q)"
    q = s"SELECT $keep, $ff, $xx, ${out}_a, " +
      s"(CASE WHEN $below THEN " +
      s"(2.0 * $ff / $xx * ${out}_a - ${out}_m1) " +
      s"ELSE ${sqlBesselYvAsym(s"($ff) + 1.0", xx)} END) AS ${out}_b FROM ($q)"
    for (m <- 1 until k) {
      q = s"SELECT $keep, $ff, $xx, ${out}_b AS ${out}_a, " +
        s"(2.0 * ($ff + CAST('${m.toDouble}' AS DOUBLE)) / $xx * ${out}_b " +
        s"- ${out}_a) AS ${out}_b FROM ($q)"
    }
    val res = if (k == 0) s"${out}_a" else s"${out}_b"
    s"SELECT $keep, $res AS $out FROM ($q)"
  }

  /** K_{k+f}(x)·e^x (scipy kve), all x > 0. Appends `out`. */
  def besselKveLargeStaged(df: org.apache.spark.sql.DataFrame, k: Int,
      f: Column, x: Column, out: String): org.apache.spark.sql.DataFrame = {
    require(k >= 0 && k <= 24, s"besselKveLargeStaged supports k ≤ 24: $k")
    val keep = df.columns.toSeq.map(col)
    val s0 = besselLargeCast(df, f, x, out)
    val ff = col(s"${out}_f"); val xx = col(s"${out}_x")
    val below = xx < besselAsymCut
    val kA = when(below, besselKv(ff, xx) * exp(xx))
      .otherwise(besselKveAsym(ff, xx))
    // K_{f−1} = K_{1−f}: K is even in its order
    val kM1 = when(below, besselKv(lit(1.0) - ff, xx) * exp(xx))
      .otherwise(lit(0.0))
    val s1 = s0.select(keep ++ Seq(ff, xx,
      kA.as(s"${out}_a"), kM1.as(s"${out}_m1")): _*)
    val kB = when(below,
        col(s"${out}_m1") + lit(2.0) * ff / xx * col(s"${out}_a"))
      .otherwise(besselKveAsym(ff + lit(1.0), xx))
    var cur = s1.select(keep ++ Seq(ff, xx,
      col(s"${out}_a"), kB.as(s"${out}_b")): _*)
    for (m <- 1 until k) {
      val next = col(s"${out}_a") +
        lit(2.0) * (ff + lit(m.toDouble)) / xx * col(s"${out}_b")
      cur = cur.select(keep ++ Seq(ff, xx,
        col(s"${out}_b").as(s"${out}_a"), next.as(s"${out}_b")): _*)
    }
    val res = if (k == 0) col(s"${out}_a") else col(s"${out}_b")
    cur.select(keep :+ res.as(out): _*)
  }

  /** Staged SQL mirror of [[besselKveLargeStaged]]. */
  def sqlBesselKveLargeStaged(from: String, k: Int, f: String, x: String,
      carry: Seq[String], out: String): String = {
    require(k >= 0 && k <= 24, s"sqlBesselKveLargeStaged supports k ≤ 24: $k")
    val keep = carry.mkString(", ")
    val ff = s"${out}_f"; val xx = s"${out}_x"
    var q = s"SELECT $keep, CAST(($f) AS DOUBLE) AS $ff, " +
      s"CAST(($x) AS DOUBLE) AS $xx FROM $from"
    val below = s"($xx) < $besselAsymCut"
    q = s"SELECT $keep, $ff, $xx, " +
      s"(CASE WHEN $below THEN (${sqlBesselKv(ff, xx)} * exp($xx)) " +
      s"ELSE ${sqlBesselKveAsym(ff, xx)} END) AS ${out}_a, " +
      s"(CASE WHEN $below THEN " +
      s"(${sqlBesselKv(s"(1.0 - $ff)", xx)} * exp($xx)) " +
      s"ELSE 0.0 END) AS ${out}_m1 FROM ($q)"
    q = s"SELECT $keep, $ff, $xx, ${out}_a, " +
      s"(CASE WHEN $below THEN " +
      s"(${out}_m1 + 2.0 * $ff / $xx * ${out}_a) " +
      s"ELSE ${sqlBesselKveAsym(s"($ff) + 1.0", xx)} END) AS ${out}_b FROM ($q)"
    for (m <- 1 until k) {
      q = s"SELECT $keep, $ff, $xx, ${out}_b AS ${out}_a, " +
        s"(${out}_a + 2.0 * ($ff + CAST('${m.toDouble}' AS DOUBLE)) / $xx " +
        s"* ${out}_b) AS ${out}_b FROM ($q)"
    }
    val res = if (k == 0) s"${out}_a" else s"${out}_b"
    s"SELECT $keep, $res AS $out FROM ($q)"
  }

  /** J_{k+f}(x) (jv) or I_{k+f}(x)·e^{−x} (ive) by branched
    * series/Miller — shared machinery, `modified` picks the I
    * recurrence sign and the single-anchor normalization. */
  private def besselMillerStaged(df: org.apache.spark.sql.DataFrame,
      k: Int, f: Column, x: Column, out: String,
      modified: Boolean): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && k <= 24, s"bessel Miller staged supports 1 ≤ k ≤ 24: $k")
    val keep = df.columns.toSeq.map(col)
    val s0 = besselLargeCast(df, f, x, out)
    val ff = col(s"${out}_f"); val xx = col(s"${out}_x")
    // anchors (used above the cut only; below-cut rows carry garbage
    // that the final branch discards)
    val aA = if (modified) besselIveAsym(ff, xx) else besselJvAsym(ff, xx)
    val aB = if (modified) lit(0.0) else besselJvAsym(ff + lit(1.0), xx)
    var cur = s0.select(keep ++ Seq(ff, xx,
      aA.as(s"${out}_ja"), aB.as(s"${out}_jb"),
      lit(0.0).as(s"${out}_gp"), lit(1.0).as(s"${out}_gc"),
      lit(0.0).as(s"${out}_gk")): _*)
    val carryA = Seq(col(s"${out}_ja"), col(s"${out}_jb"))
    val M = k + besselLargeMillerPad
    for (m <- M to 1 by -1) {
      // invariant before this step: gc = g_m, gp = g_{m+1}
      val next =
        if (modified)
          col(s"${out}_gp") +
            lit(2.0) * (ff + lit(m.toDouble)) / xx * col(s"${out}_gc")
        else
          lit(2.0) * (ff + lit(m.toDouble)) / xx * col(s"${out}_gc") -
            col(s"${out}_gp")
      val gk = if (m - 1 == k) next else col(s"${out}_gk")
      cur = cur.select(keep ++ Seq(ff, xx) ++ carryA ++ Seq(
        col(s"${out}_gc").as(s"${out}_gp"), next.as(s"${out}_gc"),
        gk.as(s"${out}_gk")): _*)
    }
    // after the loop: gc = g_0, gp = g_1
    if (!modified) {
      // the oscillatory-regime upward chain (J only): k−1 staged steps
      // from the Hankel anchor pair — selected when x ≥ k + 15
      cur = cur.select(keep ++ Seq(ff, xx, col(s"${out}_gp"),
        col(s"${out}_gc"), col(s"${out}_gk"),
        col(s"${out}_ja"), col(s"${out}_jb"),
        col(s"${out}_ja").as(s"${out}_ua"),
        col(s"${out}_jb").as(s"${out}_ub")): _*)
      for (m <- 1 until k) {
        val next = lit(2.0) * (ff + lit(m.toDouble)) / xx *
          col(s"${out}_ub") - col(s"${out}_ua")
        cur = cur.select(keep ++ Seq(ff, xx, col(s"${out}_gp"),
          col(s"${out}_gc"), col(s"${out}_gk"),
          col(s"${out}_ja"), col(s"${out}_jb"),
          col(s"${out}_ub").as(s"${out}_ua"), next.as(s"${out}_ub")): _*)
      }
    }
    val scale =
      if (modified) col(s"${out}_ja") / col(s"${out}_gc")
      else when(abs(col(s"${out}_ja")) >= abs(col(s"${out}_jb")),
          col(s"${out}_ja") / col(s"${out}_gc"))
        .otherwise(col(s"${out}_jb") / col(s"${out}_gp"))
    val series =
      if (modified) besselIv(ff + lit(k.toDouble), xx) * exp(-xx)
      else besselJv(ff + lit(k.toDouble), xx)
    val res =
      if (modified)
        when(xx < besselAsymCut, series)
          .otherwise(col(s"${out}_gk") * scale)
      else
        when(xx < besselAsymCut, series)
          .when(xx >= lit((k + 15).toDouble), col(s"${out}_ub"))
          .otherwise(col(s"${out}_gk") * scale)
    cur.select(keep :+ res.as(out): _*)
  }

  /** J_{k+f}(x), all x > 0 (series below the cut at the full order,
    * Miller-normalized downward recurrence above). Appends `out`. */
  def besselJvLargeStaged(df: org.apache.spark.sql.DataFrame, k: Int,
      f: Column, x: Column, out: String): org.apache.spark.sql.DataFrame =
    besselMillerStaged(df, k, f, x, out, modified = false)

  /** I_{k+f}(x)·e^{−x} (scipy ive), all x > 0. Appends `out`. */
  def besselIveLargeStaged(df: org.apache.spark.sql.DataFrame, k: Int,
      f: Column, x: Column, out: String): org.apache.spark.sql.DataFrame =
    besselMillerStaged(df, k, f, x, out, modified = true)

  private def sqlBesselMillerStaged(from: String, k: Int, f: String,
      x: String, carry: Seq[String], out: String,
      modified: Boolean): String = {
    require(k >= 1 && k <= 24, s"sql bessel Miller staged supports 1 ≤ k ≤ 24: $k")
    val keep = carry.mkString(", ")
    val ff = s"${out}_f"; val xx = s"${out}_x"
    var q = s"SELECT $keep, CAST(($f) AS DOUBLE) AS $ff, " +
      s"CAST(($x) AS DOUBLE) AS $xx FROM $from"
    val aA = if (modified) sqlBesselIveAsym(ff, xx) else sqlBesselJvAsym(ff, xx)
    val aB = if (modified) "0.0" else sqlBesselJvAsym(s"($ff) + 1.0", xx)
    q = s"SELECT $keep, $ff, $xx, ($aA) AS ${out}_ja, ($aB) AS ${out}_jb, " +
      s"CAST(0.0 AS DOUBLE) AS ${out}_gp, CAST(1.0 AS DOUBLE) AS ${out}_gc, " +
      s"CAST(0.0 AS DOUBLE) AS ${out}_gk FROM ($q)"
    val M = k + besselLargeMillerPad
    for (m <- M to 1 by -1) {
      val next =
        if (modified)
          s"(${out}_gp + 2.0 * ($ff + CAST('${m.toDouble}' AS DOUBLE)) " +
            s"/ $xx * ${out}_gc)"
        else
          s"(2.0 * ($ff + CAST('${m.toDouble}' AS DOUBLE)) / $xx * " +
            s"${out}_gc - ${out}_gp)"
      val gk = if (m - 1 == k) next else s"${out}_gk"
      q = s"SELECT $keep, $ff, $xx, ${out}_ja, ${out}_jb, " +
        s"${out}_gc AS ${out}_gp, $next AS ${out}_gc, $gk AS ${out}_gk " +
        s"FROM ($q)"
    }
    if (!modified) {
      q = s"SELECT $keep, $ff, $xx, ${out}_gp, ${out}_gc, ${out}_gk, " +
        s"${out}_ja, ${out}_jb, ${out}_ja AS ${out}_ua, " +
        s"${out}_jb AS ${out}_ub FROM ($q)"
      for (m <- 1 until k) {
        q = s"SELECT $keep, $ff, $xx, ${out}_gp, ${out}_gc, ${out}_gk, " +
          s"${out}_ja, ${out}_jb, ${out}_ub AS ${out}_ua, " +
          s"(2.0 * ($ff + CAST('${m.toDouble}' AS DOUBLE)) / $xx * " +
          s"${out}_ub - ${out}_ua) AS ${out}_ub FROM ($q)"
      }
    }
    val scale =
      if (modified) s"(${out}_ja / ${out}_gc)"
      else s"(CASE WHEN abs(${out}_ja) >= abs(${out}_jb) " +
        s"THEN (${out}_ja / ${out}_gc) ELSE (${out}_jb / ${out}_gp) END)"
    val series =
      if (modified)
        s"(${sqlBesselIv(s"($ff) + CAST('${k.toDouble}' AS DOUBLE)", xx)} * exp(-($xx)))"
      else sqlBesselJv(s"($ff) + CAST('${k.toDouble}' AS DOUBLE)", xx)
    if (modified)
      s"SELECT $keep, (CASE WHEN ($xx) < $besselAsymCut THEN ($series) " +
        s"ELSE (${out}_gk * $scale) END) AS $out FROM ($q)"
    else
      s"SELECT $keep, (CASE WHEN ($xx) < $besselAsymCut THEN ($series) " +
        s"WHEN ($xx) >= CAST('${(k + 15).toDouble}' AS DOUBLE) " +
        s"THEN ${out}_ub " +
        s"ELSE (${out}_gk * $scale) END) AS $out FROM ($q)"
  }

  /** Staged SQL mirror of [[besselJvLargeStaged]]. */
  def sqlBesselJvLargeStaged(from: String, k: Int, f: String, x: String,
      carry: Seq[String], out: String): String =
    sqlBesselMillerStaged(from, k, f, x, carry, out, modified = false)

  /** Staged SQL mirror of [[besselIveLargeStaged]]. */
  def sqlBesselIveLargeStaged(from: String, k: Int, f: String, x: String,
      carry: Seq[String], out: String): String =
    sqlBesselMillerStaged(from, k, f, x, carry, out, modified = true)

  // ------- Lamé functions of the first kind E^p_n
  // (ellip_harm.py ellip_harm) -------
  // Closed forms for degrees n ≤ 3 (Dassios, "Ellipsoidal Harmonics",
  // CUP 2012 — leading-coefficient-1 normalization, class order
  // K¹ K² L M N for n = 2): n=0: 1; n=1: s, √(s²−h²), √(s²−k²);
  // n=2: the Niven polynomials s² + c± with 3c² + 2(h²+k²)c + h²k² = 0
  // (c− first — the smaller Lamé eigenvalue λ = 4(h²+k²) + 6c), then
  // s√(s²−h²), s√(s²−k²), √((s²−h²)(s²−k²)). Each is a genuine Lamé
  // solution (constant-eigenvalue property pinned in SpecialSpec).
  // Arguments follow scipy's signature: h2/k2 are the SQUARED
  // semifocal quantities; domain s ≥ k ≥ h > 0 keeps every radicand
  // nonnegative. Pure IEEE ·−√ → bit-exact oracle-able. Degrees ≥ 4
  // and the second kind / ellip_normal (adaptive quadrature) stay out
  // of scope.

  /** Degree-3 eigenvalue-polynomial root: c = (−b ± √(b²−20·cc))/10 for
    * 5c² + b·c + cc = 0 — the K/L/M quadratics derived by substituting
    * the ansatz into the Lamé ODE (see the n=3 branches below). */
  private def lameRoot3(b: Column, cc: Column, plus: Boolean): Column = {
    val d = sqrt(b * b - lit(20.0) * cc)
    (if (plus) -b + d else -b - d) / lit(10.0)
  }
  private def sqlLameRoot3(b: String, cc: String, plus: Boolean): String = {
    val d = s"sqrt(($b) * ($b) - CAST(20.0 AS DOUBLE) * ($cc))"
    val num = if (plus) s"(-($b) + $d)" else s"(-($b) - $d)"
    s"($num / CAST(10.0 AS DOUBLE))"
  }

  /** Degree-4 quadratic root: c = (−b ± √(b²−28·cc))/14 for
    * 7c² + b·c + cc = 0 (the n=4 L/M/N ansatz quadratics). */
  private def lameRoot4(b: Column, cc: Column, plus: Boolean): Column = {
    val d = sqrt(b * b - lit(28.0) * cc)
    (if (plus) -b + d else -b - d) / lit(14.0)
  }
  private def sqlLameRoot4(b: String, cc: String, plus: Boolean): String = {
    val d = s"sqrt(($b) * ($b) - CAST(28.0 AS DOUBLE) * ($cc))"
    val num = if (plus) s"(-($b) + $d)" else s"(-($b) - $d)"
    s"($num / CAST(14.0 AS DOUBLE))"
  }

  /** Degree-4 K-class quadratic coefficient b (E = s⁴ + b·s² + c):
    * trig-Cardano root `which` ∈ {0,1,2} of 49b³ + 98H·b² +
    * (48H² + 52P)·b + 48HP (H = h²+k², P = h²k² — derived by ODE
    * substitution; 3P − H² < 0 always, so all three roots are real and
    * which = 2/1/0 orders them ascending). acos/cos enter (libm of
    * identical inputs) → the K n=4 gates are round 6. */
  private def lameK4b(h2: Column, k2: Column, which: Int): Column = {
    val bigH = h2 + k2; val bigP = h2 * k2
    val a2 = lit(2.0) * bigH
    val a1 = (lit(48.0) * (bigH * bigH) + lit(52.0) * bigP) / lit(49.0)
    val a0 = lit(48.0) * (bigH * bigP) / lit(49.0)
    val pD = a1 - a2 * a2 / lit(3.0)
    val qD = lit(2.0) * (a2 * a2 * a2) / lit(27.0) - a2 * a1 / lit(3.0) + a0
    val m = lit(2.0) * sqrt(-pD / lit(3.0))
    val theta = acos(lit(3.0) * qD / (pD * m))
    m * cos(theta / lit(3.0) - lit(2.0 * math.Pi * which / 3.0)) -
      a2 / lit(3.0)
  }
  private def sqlLameK4b(h2: String, k2: String, which: Int): String = {
    val bigH = s"(($h2) + ($k2))"; val bigP = s"(($h2) * ($k2))"
    val a2 = s"(CAST(2.0 AS DOUBLE) * $bigH)"
    val a1 = s"((CAST(48.0 AS DOUBLE) * ($bigH * $bigH) + " +
      s"CAST(52.0 AS DOUBLE) * $bigP) / CAST(49.0 AS DOUBLE))"
    val a0 = s"(CAST(48.0 AS DOUBLE) * ($bigH * $bigP) / CAST(49.0 AS DOUBLE))"
    val pD = s"($a1 - $a2 * $a2 / CAST(3.0 AS DOUBLE))"
    val qD = s"(CAST(2.0 AS DOUBLE) * ($a2 * $a2 * $a2) / CAST(27.0 AS DOUBLE) - " +
      s"$a2 * $a1 / CAST(3.0 AS DOUBLE) + $a0)"
    val m = s"(CAST(2.0 AS DOUBLE) * sqrt(-$pD / CAST(3.0 AS DOUBLE)))"
    val theta = s"acos(CAST(3.0 AS DOUBLE) * $qD / ($pD * $m))"
    s"($m * cos($theta / CAST(3.0 AS DOUBLE) - " +
      s"CAST('${2.0 * math.Pi * which / 3.0}' AS DOUBLE)) - " +
      s"$a2 / CAST(3.0 AS DOUBLE))"
  }
  /** Monic-cubic trig-Cardano root (three real roots in the ellipsoidal
    * domain; ascending for which = 2, 1, 0 — the [[lameK4b]]
    * convention): t³ + a2·t² + a1·t + a0 = 0. */
  private def lameCubic(a2: Column, a1: Column, a0: Column,
      which: Int): Column = {
    val pD = a1 - a2 * a2 / lit(3.0)
    val qD = lit(2.0) * (a2 * a2 * a2) / lit(27.0) - a2 * a1 / lit(3.0) + a0
    val m = lit(2.0) * sqrt(-pD / lit(3.0))
    val theta = acos(lit(3.0) * qD / (pD * m))
    m * cos(theta / lit(3.0) - lit(2.0 * math.Pi * which / 3.0)) -
      a2 / lit(3.0)
  }
  private def sqlLameCubic(a2: String, a1: String, a0: String,
      which: Int): String = {
    val pD = s"(($a1) - ($a2) * ($a2) / CAST(3.0 AS DOUBLE))"
    val qD = s"(CAST(2.0 AS DOUBLE) * (($a2) * ($a2) * ($a2)) / " +
      s"CAST(27.0 AS DOUBLE) - ($a2) * ($a1) / CAST(3.0 AS DOUBLE) + ($a0))"
    val m = s"(CAST(2.0 AS DOUBLE) * sqrt(-$pD / CAST(3.0 AS DOUBLE)))"
    val theta = s"acos(CAST(3.0 AS DOUBLE) * $qD / ($pD * $m))"
    s"($m * cos($theta / CAST(3.0 AS DOUBLE) - " +
      s"CAST('${2.0 * math.Pi * which / 3.0}' AS DOUBLE)) - " +
      s"($a2) / CAST(3.0 AS DOUBLE))"
  }

  // n=5 ansatz systems (ODE-substitution derivations verified
  // numerically against the Lamé residual before implementation):
  //   K  (s⁵+bs³+cs):        27b³ + 60Hb² + (32H²+44P)b + 40HP = 0,
  //                          c = (9b² + 8bH + 10P)/14, λ = 18b + 25H
  //   L  ((s⁴+bs²+c)√(s²−h²)): 81h²b³ + (54P+126Hh²)b²
  //                          + (48H²h² + 40HP + 8Pk² + 68Ph²)b
  //                          + 24P² + 48PHh² = 0,
  //                          c = (9b² + 6bH + 2bk² + 6P)/14,
  //                          λ = 18b + 16H + 9k²
  //   M: the h² ↔ k² swap of L
  //   N  ((s³+cs)√((s²−h²)(s²−k²))): 3c² + 2Hc + P = 0 (the n=2 K
  //                          quadratic again), λ = 16H + 18c
  // λ is monotone in b/c within each class, so ascending-λ order =
  // ascending root order (which = 2, 1, 0 / minus-then-plus).
  private def lame5Kb(h2: Column, k2: Column, which: Int): Column = {
    val bigH = h2 + k2; val bigP = h2 * k2
    lameCubic(
      lit(20.0) * bigH / lit(9.0),
      (lit(32.0) * (bigH * bigH) + lit(44.0) * bigP) / lit(27.0),
      lit(40.0) * (bigH * bigP) / lit(27.0), which)
  }
  private def sqlLame5Kb(h2: String, k2: String, which: Int): String = {
    val bigH = s"(($h2) + ($k2))"; val bigP = s"(($h2) * ($k2))"
    sqlLameCubic(
      s"(CAST(20.0 AS DOUBLE) * $bigH / CAST(9.0 AS DOUBLE))",
      s"((CAST(32.0 AS DOUBLE) * ($bigH * $bigH) + " +
        s"CAST(44.0 AS DOUBLE) * $bigP) / CAST(27.0 AS DOUBLE))",
      s"(CAST(40.0 AS DOUBLE) * ($bigH * $bigP) / CAST(27.0 AS DOUBLE))",
      which)
  }
  private def lame5Kc(h2: Column, k2: Column, b: Column): Column =
    (lit(9.0) * (b * b) + lit(8.0) * (b * (h2 + k2)) +
      lit(10.0) * (h2 * k2)) / lit(14.0)
  private def sqlLame5Kc(h2: String, k2: String, b: String): String =
    s"((CAST(9.0 AS DOUBLE) * (($b) * ($b)) + " +
      s"CAST(8.0 AS DOUBLE) * (($b) * (($h2) + ($k2))) + " +
      s"CAST(10.0 AS DOUBLE) * (($h2) * ($k2))) / CAST(14.0 AS DOUBLE))"

  /** The L-class n=5 cubic at (e, f2) = (h², k²); M is the swap. */
  private def lame5LMb(e: Column, f2: Column, which: Int): Column = {
    val bigH = e + f2; val bigP = e * f2
    lameCubic(
      (lit(54.0) * bigP + lit(126.0) * (bigH * e)) / (lit(81.0) * e),
      (lit(48.0) * ((bigH * bigH) * e) + lit(40.0) * (bigH * bigP) +
        lit(8.0) * (bigP * f2) + lit(68.0) * (bigP * e)) / (lit(81.0) * e),
      (lit(24.0) * (bigP * bigP) + lit(48.0) * ((bigP * bigH) * e)) /
        (lit(81.0) * e),
      which)
  }
  private def sqlLame5LMb(e: String, f2: String, which: Int): String = {
    val bigH = s"(($e) + ($f2))"; val bigP = s"(($e) * ($f2))"
    sqlLameCubic(
      s"((CAST(54.0 AS DOUBLE) * $bigP + CAST(126.0 AS DOUBLE) * " +
        s"($bigH * ($e))) / (CAST(81.0 AS DOUBLE) * ($e)))",
      s"((CAST(48.0 AS DOUBLE) * (($bigH * $bigH) * ($e)) + " +
        s"CAST(40.0 AS DOUBLE) * ($bigH * $bigP) + " +
        s"CAST(8.0 AS DOUBLE) * ($bigP * ($f2)) + " +
        s"CAST(68.0 AS DOUBLE) * ($bigP * ($e))) / " +
        s"(CAST(81.0 AS DOUBLE) * ($e)))",
      s"((CAST(24.0 AS DOUBLE) * ($bigP * $bigP) + " +
        s"CAST(48.0 AS DOUBLE) * (($bigP * $bigH) * ($e))) / " +
        s"(CAST(81.0 AS DOUBLE) * ($e)))",
      which)
  }
  private def lame5LMc(e: Column, f2: Column, b: Column): Column =
    (lit(9.0) * (b * b) + lit(6.0) * (b * (e + f2)) +
      lit(2.0) * (b * f2) + lit(6.0) * (e * f2)) / lit(14.0)
  private def sqlLame5LMc(e: String, f2: String, b: String): String =
    s"((CAST(9.0 AS DOUBLE) * (($b) * ($b)) + " +
      s"CAST(6.0 AS DOUBLE) * (($b) * (($e) + ($f2))) + " +
      s"CAST(2.0 AS DOUBLE) * (($b) * ($f2)) + " +
      s"CAST(6.0 AS DOUBLE) * (($e) * ($f2))) / CAST(14.0 AS DOUBLE))"

  /** c(b) = (7b² + 6bH + 6P)/10 for the K n=4 ansatz. */
  private def lameK4c(h2: Column, k2: Column, b: Column): Column =
    (lit(7.0) * (b * b) + lit(6.0) * (b * (h2 + k2)) +
      lit(6.0) * (h2 * k2)) / lit(10.0)
  private def sqlLameK4c(h2: String, k2: String, b: String): String =
    s"((CAST(7.0 AS DOUBLE) * (($b) * ($b)) + " +
      s"CAST(6.0 AS DOUBLE) * (($b) * (($h2) + ($k2))) + " +
      s"CAST(6.0 AS DOUBLE) * (($h2) * ($k2))) / CAST(10.0 AS DOUBLE))"

  def ellipHarm(h2: Column, k2: Column, n: Int, p: Int, s: Column): Column = {
    def disc = sqrt((h2 + k2) * (h2 + k2) - lit(3.0) * (h2 * k2))
    // n=3 ansatz quadratics (5c² + b·c + cc = 0):
    //   K (s³+cs):          b = 4(h²+k²), cc = 3h²k²
    //   L ((s²+c)√(s²−h²)): b = 2h²+4k², cc = h²k²
    //   M ((s²+c)√(s²−k²)): b = 2k²+4h², cc = h²k²  (h ↔ k symmetry)
    def cK(plus: Boolean) =
      lameRoot3(lit(4.0) * (h2 + k2), lit(3.0) * (h2 * k2), plus)
    def cL(plus: Boolean) =
      lameRoot3(lit(2.0) * h2 + lit(4.0) * k2, h2 * k2, plus)
    def cM(plus: Boolean) =
      lameRoot3(lit(2.0) * k2 + lit(4.0) * h2, h2 * k2, plus)
    (n, p) match {
      case (0, 1) => lit(1.0)
      case (1, 1) => s
      case (1, 2) => sqrt(s * s - h2)
      case (1, 3) => sqrt(s * s - k2)
      case (2, 1) => s * s + (-(h2 + k2) - disc) / lit(3.0)
      case (2, 2) => s * s + (-(h2 + k2) + disc) / lit(3.0)
      case (2, 3) => s * sqrt(s * s - h2)
      case (2, 4) => s * sqrt(s * s - k2)
      case (2, 5) => sqrt((s * s - h2) * (s * s - k2))
      case (3, 1) => s * s * s + cK(plus = false) * s
      case (3, 2) => s * s * s + cK(plus = true) * s
      case (3, 3) => (s * s + cL(plus = false)) * sqrt(s * s - h2)
      case (3, 4) => (s * s + cL(plus = true)) * sqrt(s * s - h2)
      case (3, 5) => (s * s + cM(plus = false)) * sqrt(s * s - k2)
      case (3, 6) => (s * s + cM(plus = true)) * sqrt(s * s - k2)
      case (3, 7) => s * sqrt((s * s - h2) * (s * s - k2))
      // n=4 (K¹K²K³ L¹L² M¹M² N¹N²): K from the trig-Cardano cubic
      // (λ ascending: which = 2, 1, 0); L: 7c²+(4h²+6k²)c+3h²k²;
      // M: the h↔k swap; N: 7c²+4(h²+k²)c+h²k² — all ODE-derived,
      // constant-eigenvalue-pinned in SpecialSpec.
      case (4, pp) if pp >= 1 && pp <= 3 =>
        val b = lameK4b(h2, k2, which = 3 - pp)
        s * s * s * s + b * (s * s) + lameK4c(h2, k2, b)
      case (4, 4) => s * (s * s + lameRoot4(lit(4.0) * h2 + lit(6.0) * k2,
        lit(3.0) * (h2 * k2), plus = false)) * sqrt(s * s - h2)
      case (4, 5) => s * (s * s + lameRoot4(lit(4.0) * h2 + lit(6.0) * k2,
        lit(3.0) * (h2 * k2), plus = true)) * sqrt(s * s - h2)
      case (4, 6) => s * (s * s + lameRoot4(lit(6.0) * h2 + lit(4.0) * k2,
        lit(3.0) * (h2 * k2), plus = false)) * sqrt(s * s - k2)
      case (4, 7) => s * (s * s + lameRoot4(lit(6.0) * h2 + lit(4.0) * k2,
        lit(3.0) * (h2 * k2), plus = true)) * sqrt(s * s - k2)
      case (4, 8) => (s * s + lameRoot4(lit(4.0) * (h2 + k2), h2 * k2,
        plus = false)) * sqrt((s * s - h2) * (s * s - k2))
      case (4, 9) => (s * s + lameRoot4(lit(4.0) * (h2 + k2), h2 * k2,
        plus = true)) * sqrt((s * s - h2) * (s * s - k2))
      // n=5 (K¹K²K³ L¹L²L³ M¹M²M³ N¹N²) — see the ansatz-system note
      // above the lame5* helpers; λ ascending within each class.
      case (5, pp) if pp >= 1 && pp <= 3 =>
        val b = lame5Kb(h2, k2, which = 3 - pp)
        s * s * s * s * s + b * (s * s * s) + lame5Kc(h2, k2, b) * s
      case (5, pp) if pp >= 4 && pp <= 6 =>
        val b = lame5LMb(h2, k2, which = 6 - pp)
        (s * s * s * s + b * (s * s) + lame5LMc(h2, k2, b)) *
          sqrt(s * s - h2)
      case (5, pp) if pp >= 7 && pp <= 9 =>
        val b = lame5LMb(k2, h2, which = 9 - pp)
        (s * s * s * s + b * (s * s) + lame5LMc(k2, h2, b)) *
          sqrt(s * s - k2)
      case (5, 10) =>
        s * (s * s + (-(h2 + k2) - disc) / lit(3.0)) *
          sqrt((s * s - h2) * (s * s - k2))
      case (5, 11) =>
        s * (s * s + (-(h2 + k2) + disc) / lit(3.0)) *
          sqrt((s * s - h2) * (s * s - k2))
      case _ => throw new IllegalArgumentException(
        s"ellipHarm: closed forms cover n ≤ 5, 1 ≤ p ≤ 2n+1 (got n=$n p=$p)")
    }
  }

  /** DuckDB mirror of [[ellipHarm]] — the identical expression shape. */
  def sqlEllipHarm(h2: String, k2: String, n: Int, p: Int, s: String): String = {
    val disc = s"sqrt((($h2) + ($k2)) * (($h2) + ($k2)) - " +
      s"CAST(3.0 AS DOUBLE) * (($h2) * ($k2)))"
    (n, p) match {
      case (0, 1) => "CAST(1.0 AS DOUBLE)"
      case (1, 1) => s"($s)"
      case (1, 2) => s"sqrt(($s) * ($s) - ($h2))"
      case (1, 3) => s"sqrt(($s) * ($s) - ($k2))"
      case (2, 1) => s"(($s) * ($s) + (-(($h2) + ($k2)) - $disc) / CAST(3.0 AS DOUBLE))"
      case (2, 2) => s"(($s) * ($s) + (-(($h2) + ($k2)) + $disc) / CAST(3.0 AS DOUBLE))"
      case (2, 3) => s"(($s) * sqrt(($s) * ($s) - ($h2)))"
      case (2, 4) => s"(($s) * sqrt(($s) * ($s) - ($k2)))"
      case (2, 5) => s"sqrt((($s) * ($s) - ($h2)) * (($s) * ($s) - ($k2)))"
      case (3, pp) =>
        val cK = (plus: Boolean) => sqlLameRoot3(
          s"(CAST(4.0 AS DOUBLE) * (($h2) + ($k2)))",
          s"(CAST(3.0 AS DOUBLE) * (($h2) * ($k2)))", plus)
        val cL = (plus: Boolean) => sqlLameRoot3(
          s"(CAST(2.0 AS DOUBLE) * ($h2) + CAST(4.0 AS DOUBLE) * ($k2))",
          s"(($h2) * ($k2))", plus)
        val cM = (plus: Boolean) => sqlLameRoot3(
          s"(CAST(2.0 AS DOUBLE) * ($k2) + CAST(4.0 AS DOUBLE) * ($h2))",
          s"(($h2) * ($k2))", plus)
        pp match {
          case 1 => s"(($s) * ($s) * ($s) + ${cK(false)} * ($s))"
          case 2 => s"(($s) * ($s) * ($s) + ${cK(true)} * ($s))"
          case 3 => s"((($s) * ($s) + ${cL(false)}) * sqrt(($s) * ($s) - ($h2)))"
          case 4 => s"((($s) * ($s) + ${cL(true)}) * sqrt(($s) * ($s) - ($h2)))"
          case 5 => s"((($s) * ($s) + ${cM(false)}) * sqrt(($s) * ($s) - ($k2)))"
          case 6 => s"((($s) * ($s) + ${cM(true)}) * sqrt(($s) * ($s) - ($k2)))"
          case 7 => s"(($s) * sqrt((($s) * ($s) - ($h2)) * (($s) * ($s) - ($k2))))"
          case _ => throw new IllegalArgumentException(
            s"sqlEllipHarm: n=3 needs 1 ≤ p ≤ 7 (got p=$pp)")
        }
      case (4, pp) =>
        val bL = s"(CAST(4.0 AS DOUBLE) * ($h2) + CAST(6.0 AS DOUBLE) * ($k2))"
        val bM = s"(CAST(6.0 AS DOUBLE) * ($h2) + CAST(4.0 AS DOUBLE) * ($k2))"
        val bN = s"(CAST(4.0 AS DOUBLE) * (($h2) + ($k2)))"
        val c3 = s"(CAST(3.0 AS DOUBLE) * (($h2) * ($k2)))"
        val cP = s"(($h2) * ($k2))"
        pp match {
          case q if q >= 1 && q <= 3 =>
            val b = sqlLameK4b(h2, k2, which = 3 - q)
            s"(($s) * ($s) * ($s) * ($s) + $b * (($s) * ($s)) + " +
              s"${sqlLameK4c(h2, k2, b)})"
          case 4 => s"(($s) * (($s) * ($s) + ${sqlLameRoot4(bL, c3, false)}) * " +
            s"sqrt(($s) * ($s) - ($h2)))"
          case 5 => s"(($s) * (($s) * ($s) + ${sqlLameRoot4(bL, c3, true)}) * " +
            s"sqrt(($s) * ($s) - ($h2)))"
          case 6 => s"(($s) * (($s) * ($s) + ${sqlLameRoot4(bM, c3, false)}) * " +
            s"sqrt(($s) * ($s) - ($k2)))"
          case 7 => s"(($s) * (($s) * ($s) + ${sqlLameRoot4(bM, c3, true)}) * " +
            s"sqrt(($s) * ($s) - ($k2)))"
          case 8 => s"((($s) * ($s) + ${sqlLameRoot4(bN, cP, false)}) * " +
            s"sqrt((($s) * ($s) - ($h2)) * (($s) * ($s) - ($k2))))"
          case 9 => s"((($s) * ($s) + ${sqlLameRoot4(bN, cP, true)}) * " +
            s"sqrt((($s) * ($s) - ($h2)) * (($s) * ($s) - ($k2))))"
          case _ => throw new IllegalArgumentException(
            s"sqlEllipHarm: n=4 needs 1 ≤ p ≤ 9 (got p=$pp)")
        }
      case (5, pp) =>
        val s2 = s"(($s) * ($s))"
        pp match {
          case q if q >= 1 && q <= 3 =>
            val b = sqlLame5Kb(h2, k2, which = 3 - q)
            s"(($s) * ($s) * ($s) * ($s) * ($s) + $b * (($s) * ($s) * ($s)) + " +
              s"${sqlLame5Kc(h2, k2, b)} * ($s))"
          case q if q >= 4 && q <= 6 =>
            // ($s)*($s)*($s)*($s): left-assoc like the Column side
            // (s2*s2 would be a DIFFERENT multiplication tree — ulp risk)
            val b = sqlLame5LMb(h2, k2, which = 6 - q)
            s"((($s) * ($s) * ($s) * ($s) + $b * $s2 + " +
              s"${sqlLame5LMc(h2, k2, b)}) * sqrt($s2 - ($h2)))"
          case q if q >= 7 && q <= 9 =>
            val b = sqlLame5LMb(k2, h2, which = 9 - q)
            s"((($s) * ($s) * ($s) * ($s) + $b * $s2 + " +
              s"${sqlLame5LMc(k2, h2, b)}) * sqrt($s2 - ($k2)))"
          case 10 =>
            s"(($s) * ($s2 + (-(($h2) + ($k2)) - $disc) / CAST(3.0 AS DOUBLE)) * " +
              s"sqrt(($s2 - ($h2)) * ($s2 - ($k2))))"
          case 11 =>
            s"(($s) * ($s2 + (-(($h2) + ($k2)) + $disc) / CAST(3.0 AS DOUBLE)) * " +
              s"sqrt(($s2 - ($h2)) * ($s2 - ($k2))))"
          case _ => throw new IllegalArgumentException(
            s"sqlEllipHarm: n=5 needs 1 ≤ p ≤ 11 (got p=$pp)")
        }
      case _ => throw new IllegalArgumentException(
        s"sqlEllipHarm: n ≤ 5 only (got n=$n p=$p)")
    }
  }

  // ------- Lamé functions of the second kind F^p_n
  // (ellip_harm.py ellip_harm_2) -------
  //   F^p_n(s) = (2n+1)·E^p_n(s)·∫₀^{1/s} du /
  //              ((E^p_n(1/u))²·√((1−h²u²)(1−k²u²)))
  // evaluated by FIXED 32-point Gauss–Legendre over [0, 1/s] — the
  // integrand is smooth on the domain (s > k: the radicals stay
  // positive; u→0 is regular since 1/E² ~ u²ⁿ), and GL-32 reaches
  // machine precision (validated against adaptive mpmath quadrature at
  // 30 digits in SpecialSpec, max |err| ~3e-16 across all nine (n,p)).
  // Nodes/weights are compile-time literals and every operation is
  // exact-rounded IEEE (·, /, √) with identical shape in the SQL
  // mirror → bit-exact oracle-able, no rounding needed. This closes
  // the r9 "adaptive quadrature" de-scope for the second kind;
  // ellip_normal (a 2-D integral) stays out of scope.

  private val gl32: Seq[(Double, Double)] = {
    val nodes = Seq(
      -0.99726386184948157, -0.98561151154526838, -0.96476225558750639,
      -0.93490607593773967, -0.8963211557660522, -0.84936761373256997,
      -0.79448379596794239, -0.73218211874028971, -0.66304426693021523,
      -0.5877157572407623, -0.50689990893222936, -0.42135127613063533,
      -0.33186860228212767, -0.23928736225213706, -0.14447196158279649,
      -0.04830766568773831, 0.04830766568773831, 0.14447196158279649,
      0.23928736225213706, 0.33186860228212767, 0.42135127613063533,
      0.50689990893222936, 0.5877157572407623, 0.66304426693021523,
      0.73218211874028971, 0.79448379596794239, 0.84936761373256997,
      0.8963211557660522, 0.93490607593773967, 0.96476225558750639,
      0.98561151154526838, 0.99726386184948157)
    val weights = Seq(
      0.0070186100094692984, 0.016274394730905965, 0.025392065309262427,
      0.034273862913021626, 0.042835898022226426, 0.050998059262376244,
      0.058684093478535704, 0.065822222776361752, 0.072345794108848449,
      0.078193895787070311, 0.083311924226946846, 0.087652093004403908,
      0.091173878695763863, 0.093844399080804566, 0.095638720079274833,
      0.096540088514727812, 0.096540088514727812, 0.095638720079274833,
      0.093844399080804566, 0.091173878695763863, 0.087652093004403908,
      0.083311924226946846, 0.078193895787070311, 0.072345794108848449,
      0.065822222776361752, 0.058684093478535704, 0.050998059262376244,
      0.042835898022226426, 0.034273862913021626, 0.025392065309262427,
      0.016274394730905965, 0.0070186100094692984)
    nodes.zip(weights)
  }

  def ellipHarm2(h2: Column, k2: Column, n: Int, p: Int, s: Column): Column = {
    val b = lit(1.0) / s
    val terms = gl32.map { case (x, w) =>
      val c = (x + 1.0) / 2.0 // driver-side constant, mirrored verbatim
      val u = b * lit(c)
      val eInv = ellipHarm(h2, k2, n, p, lit(1.0) / u)
      lit(w) / (eInv * eInv *
        sqrt((lit(1.0) - h2 * (u * u)) * (lit(1.0) - k2 * (u * u))))
    }
    lit((2 * n + 1).toDouble) * ellipHarm(h2, k2, n, p, s) *
      (b / lit(2.0)) * terms.reduce(_ + _)
  }

  /** DuckDB mirror of [[ellipHarm2]] — identical literals and shape. */
  def sqlEllipHarm2(h2: String, k2: String, n: Int, p: Int, s: String): String = {
    val b = s"(CAST(1.0 AS DOUBLE) / ($s))"
    val terms = gl32.map { case (x, w) =>
      val c = (x + 1.0) / 2.0
      val u = s"($b * CAST('$c' AS DOUBLE))"
      val eInv = sqlEllipHarm(h2, k2, n, p, s"(CAST(1.0 AS DOUBLE) / $u)")
      s"(CAST('$w' AS DOUBLE) / ($eInv * $eInv * " +
        s"sqrt((CAST(1.0 AS DOUBLE) - ($h2) * ($u * $u)) * " +
        s"(CAST(1.0 AS DOUBLE) - ($k2) * ($u * $u)))))"
    }
    s"(CAST('${(2 * n + 1).toDouble}' AS DOUBLE) * " +
      s"${sqlEllipHarm(h2, k2, n, p, s)} * ($b / CAST(2.0 AS DOUBLE)) * " +
      terms.reduce((a, t) => s"($a + $t)") + ")"
  }

  // ------- ellipsoidal-harmonic normalization γ^p_n
  // (ellip_harm.py ellip_normal) -------
  //   γ^p_n = 8·∫₀ʰ dx ∫ₕᵏ dy (y²−x²)·E(x)²·E(y)² /
  //           (√((h²−x²)(k²−x²))·√((y²−h²)(k²−y²)))
  // The endpoint 1/√ singularities vanish under x = h·sinθ and
  // y² = h²cos²φ + k²sin²φ (the Jacobians cancel the radicals), leaving
  // an ANALYTIC integrand, and (y²−x²) factorizes the tensor quadrature
  // into four 16-term Gauss–Legendre sums:
  //   γ = 8·(A·D − B·C),  A = Σ wᵢ fxᵢ, B = Σ wᵢ xᵢ² fxᵢ,
  //                       C = Σ wⱼ fyⱼ, D = Σ wⱼ y²ⱼ fyⱼ
  // with fx = E(x)²/√(k²−x²), fy = E(y)²/y. GL-16 is exact to machine
  // precision (vs GL-32: ≤ 3.4e-14; γ¹₀ = 4π recovered exactly —
  // SpecialSpec). The trig node constants are driver-side literals
  // mirrored verbatim; every op is exact-rounded IEEE → bit-exact
  // oracle-able. Degrees ≤ 2 like [[ellipHarm]].

  private val gl16: Seq[(Double, Double)] = {
    val nodes = Seq(
      -0.98940093499164994, -0.9445750230732326, -0.86563120238783176,
      -0.755404408355003, -0.61787624440264377, -0.45801677765722737,
      -0.28160355077925892, -0.095012509837637454, 0.095012509837637454,
      0.28160355077925892, 0.45801677765722737, 0.61787624440264377,
      0.755404408355003, 0.86563120238783176, 0.9445750230732326,
      0.98940093499164994)
    val weights = Seq(
      0.027152459411754037, 0.062253523938647706, 0.095158511682492591,
      0.12462897125553403, 0.14959598881657676, 0.16915651939500262,
      0.18260341504492361, 0.18945061045506859, 0.18945061045506859,
      0.18260341504492361, 0.16915651939500262, 0.14959598881657676,
      0.12462897125553403, 0.095158511682492591, 0.062253523938647706,
      0.027152459411754037)
    nodes.zip(weights)
  }

  /** Per-node driver-side constants: (w·π/4, sin²θ, cos²φ, sin²φ) with
    * θ = φ = (x+1)·π/4 — shared by the Column and SQL instantiations. */
  private val normNodes: Seq[(Double, Double, Double, Double)] =
    gl16.map { case (x, w) =>
      val t = (x + 1.0) * math.Pi / 4.0
      (w * math.Pi / 4.0, math.sin(t) * math.sin(t),
        math.cos(t) * math.cos(t), math.sin(t) * math.sin(t))
    }

  /** E^p_n squared as a function of s² with the |·| continuation the
    * surface coordinates need (x ∈ (0,h) and y ∈ (h,k) flip radicand
    * signs; the squared Lamé function there is the abs form — Dassios'
    * √((h²−x²)(k²−x²)) branch etc.). Only squares enter [[ellipNormal]],
    * so no square root of a signed quantity ever appears. */
  private def ellipHarmSq(h2: Column, k2: Column, n: Int, p: Int,
      s2: Column): Column = {
    def disc = sqrt((h2 + k2) * (h2 + k2) - lit(3.0) * (h2 * k2))
    (n, p) match {
      case (0, 1) => lit(1.0)
      case (1, 1) => s2
      case (1, 2) => abs(s2 - h2)
      case (1, 3) => abs(s2 - k2)
      case (2, 1) =>
        val e = s2 + (-(h2 + k2) - disc) / lit(3.0); e * e
      case (2, 2) =>
        val e = s2 + (-(h2 + k2) + disc) / lit(3.0); e * e
      case (2, 3) => s2 * abs(s2 - h2)
      case (2, 4) => s2 * abs(s2 - k2)
      case (2, 5) => abs((s2 - h2) * (s2 - k2))
      case (3, 1) =>
        val e = s2 + lameRoot3(lit(4.0) * (h2 + k2), lit(3.0) * (h2 * k2),
          plus = false); s2 * (e * e)
      case (3, 2) =>
        val e = s2 + lameRoot3(lit(4.0) * (h2 + k2), lit(3.0) * (h2 * k2),
          plus = true); s2 * (e * e)
      case (3, 3) =>
        val e = s2 + lameRoot3(lit(2.0) * h2 + lit(4.0) * k2, h2 * k2,
          plus = false); e * e * abs(s2 - h2)
      case (3, 4) =>
        val e = s2 + lameRoot3(lit(2.0) * h2 + lit(4.0) * k2, h2 * k2,
          plus = true); e * e * abs(s2 - h2)
      case (3, 5) =>
        val e = s2 + lameRoot3(lit(2.0) * k2 + lit(4.0) * h2, h2 * k2,
          plus = false); e * e * abs(s2 - k2)
      case (3, 6) =>
        val e = s2 + lameRoot3(lit(2.0) * k2 + lit(4.0) * h2, h2 * k2,
          plus = true); e * e * abs(s2 - k2)
      case (3, 7) => s2 * abs((s2 - h2) * (s2 - k2))
      case _ => throw new IllegalArgumentException(
        s"ellipHarmSq: n ≤ 3 only (got n=$n p=$p)")
    }
  }

  private def sqlEllipHarmSq(h2: String, k2: String, n: Int, p: Int,
      s2: String): String = {
    val disc = s"sqrt((($h2) + ($k2)) * (($h2) + ($k2)) - " +
      s"CAST(3.0 AS DOUBLE) * (($h2) * ($k2)))"
    (n, p) match {
      case (0, 1) => "CAST(1.0 AS DOUBLE)"
      case (1, 1) => s"($s2)"
      case (1, 2) => s"abs(($s2) - ($h2))"
      case (1, 3) => s"abs(($s2) - ($k2))"
      case (2, 1) =>
        val e = s"(($s2) + (-(($h2) + ($k2)) - $disc) / CAST(3.0 AS DOUBLE))"
        s"($e * $e)"
      case (2, 2) =>
        val e = s"(($s2) + (-(($h2) + ($k2)) + $disc) / CAST(3.0 AS DOUBLE))"
        s"($e * $e)"
      case (2, 3) => s"(($s2) * abs(($s2) - ($h2)))"
      case (2, 4) => s"(($s2) * abs(($s2) - ($k2)))"
      case (2, 5) => s"abs((($s2) - ($h2)) * (($s2) - ($k2)))"
      case (3, pp) =>
        val bK = s"(CAST(4.0 AS DOUBLE) * (($h2) + ($k2)))"
        val cK = s"(CAST(3.0 AS DOUBLE) * (($h2) * ($k2)))"
        val bL = s"(CAST(2.0 AS DOUBLE) * ($h2) + CAST(4.0 AS DOUBLE) * ($k2))"
        val bM = s"(CAST(2.0 AS DOUBLE) * ($k2) + CAST(4.0 AS DOUBLE) * ($h2))"
        val cc = s"(($h2) * ($k2))"
        def e(b: String, c: String, plus: Boolean) =
          s"(($s2) + ${sqlLameRoot3(b, c, plus)})"
        pp match {
          case 1 => val x = e(bK, cK, false); s"(($s2) * ($x * $x))"
          case 2 => val x = e(bK, cK, true); s"(($s2) * ($x * $x))"
          case 3 => val x = e(bL, cc, false); s"($x * $x * abs(($s2) - ($h2)))"
          case 4 => val x = e(bL, cc, true); s"($x * $x * abs(($s2) - ($h2)))"
          case 5 => val x = e(bM, cc, false); s"($x * $x * abs(($s2) - ($k2)))"
          case 6 => val x = e(bM, cc, true); s"($x * $x * abs(($s2) - ($k2)))"
          case 7 => s"(($s2) * abs((($s2) - ($h2)) * (($s2) - ($k2))))"
          case _ => throw new IllegalArgumentException(
            s"sqlEllipHarmSq: n=3 needs 1 ≤ p ≤ 7 (got p=$pp)")
        }
      case _ => throw new IllegalArgumentException(
        s"sqlEllipHarmSq: n ≤ 3 only (got n=$n p=$p)")
    }
  }

  def ellipNormal(h2: Column, k2: Column, n: Int, p: Int): Column = {
    val parts = normNodes.map { case (w, sn2, c2, s2n) =>
      val x2 = h2 * lit(sn2)
      val fx = ellipHarmSq(h2, k2, n, p, x2) / sqrt(k2 - x2)
      val y2 = h2 * lit(c2) + k2 * lit(s2n)
      val fy = ellipHarmSq(h2, k2, n, p, y2) / sqrt(y2)
      (lit(w) * fx, lit(w) * x2 * fx, lit(w) * fy, lit(w) * y2 * fy)
    }
    val a = parts.map(_._1).reduce(_ + _)
    val b = parts.map(_._2).reduce(_ + _)
    val c = parts.map(_._3).reduce(_ + _)
    val d = parts.map(_._4).reduce(_ + _)
    lit(8.0) * (a * d - b * c)
  }

  /** DuckDB mirror of [[ellipNormal]] — identical literals and shape. */
  def sqlEllipNormal(h2: String, k2: String, n: Int, p: Int): String = {
    val parts = normNodes.map { case (w, sn2, c2, s2n) =>
      val x2 = s"(($h2) * CAST('$sn2' AS DOUBLE))"
      val fx = s"(${sqlEllipHarmSq(h2, k2, n, p, x2)} / sqrt(($k2) - $x2))"
      val y2 = s"(($h2) * CAST('$c2' AS DOUBLE) + ($k2) * CAST('$s2n' AS DOUBLE))"
      val fy = s"(${sqlEllipHarmSq(h2, k2, n, p, y2)} / sqrt($y2))"
      (s"(CAST('$w' AS DOUBLE) * $fx)",
        s"(CAST('$w' AS DOUBLE) * $x2 * $fx)",
        s"(CAST('$w' AS DOUBLE) * $fy)",
        s"(CAST('$w' AS DOUBLE) * $y2 * $fy)")
    }
    def fold(ts: Seq[String]) = ts.reduce((a, t) => s"($a + $t)")
    s"(CAST(8.0 AS DOUBLE) * ((${fold(parts.map(_._1))}) * " +
      s"(${fold(parts.map(_._4))}) - (${fold(parts.map(_._2))}) * " +
      s"(${fold(parts.map(_._3))})))"
  }

  // =================================================================
  // r18 optimization round: native-kernel dispatchers. Each *Fast form
  // routes through ONE `graft_special` expression node on extension
  // sessions ([[graft.plans.SpecialKernelExpr]] →
  // [[SpecialMath]] — the exact op sequence of the Column kernel, so
  // bit-identical; SpecialMathSpec pins it) and falls back to the
  // staged Column tree when the extension is absent (driver smoke
  // sessions). The Column trees cost 3–14 s PER RUN of row-independent
  // Catalyst analysis/optimization/codegen (PERF.md r17/r18); the
  // native node costs none of it.
  // =================================================================
  import org.apache.spark.sql.SparkSession

  private def hasNative(spark: SparkSession): Boolean =
    spark.catalog.functionExists("graft_special")

  private def nk(kernel: String, args: Column*): Column =
    call_function("graft_special", (lit(kernel) +: args.toSeq): _*)

  /** [[wofzStaged]] via the native kernel when available. */
  def wofzStagedFast(df: DataFrame, x: Column, y: Column,
      outRe: String, outIm: String): DataFrame =
    if (hasNative(df.sparkSession)) {
      require(!df.columns.contains(outRe) && !df.columns.contains(outIm),
        s"wofzStaged output column collision: $outRe/$outIm already present")
      val keep = df.columns.toSeq.map(col)
      df.select(keep ++ Seq(nk("wofzRe", x, y).as(outRe),
        nk("wofzIm", x, y).as(outIm)): _*)
    } else wofzStaged(df, x, y, outRe, outIm)

  /** [[voigtProfileStaged]] via the native kernel when available. */
  def voigtProfileStagedFast(df: DataFrame, x: Column, sigma: Column,
      gamma: Column, out: String): DataFrame =
    if (hasNative(df.sparkSession))
      df.withColumn(out, nk("voigtProfile", x, sigma, gamma))
    else voigtProfileStaged(df, x, sigma, gamma, out)

  /** [[modfresnelStaged]] via the native kernels when available. */
  def modfresnelStagedFast(df: DataFrame, x: Column): DataFrame =
    if (hasNative(df.sparkSession)) {
      val keep = df.columns.toSeq.map(col)
      df.select(keep ++ Seq(
        nk("modfresnelKre", x).as("mf_kre"), nk("modfresnelKim", x).as("mf_kim"),
        nk("modfresnelFre", x).as("mf_fre"), nk("modfresnelFim", x).as("mf_fim")): _*)
    } else modfresnelStaged(df, x)

  /** [[betaincInvNewton]] via the native kernel when available. */
  def betaincInvNewtonFast(df: DataFrame,
      specs: Seq[(String, Column, Column, Column)]): DataFrame =
    if (hasNative(df.sparkSession)) {
      val keep = df.columns.toSeq.map(col)
      df.select(keep ++ specs.map { case (s, a, b, p) =>
        nk("betaincinv", a, b, p).as(s"binv_$s")
      }: _*)
    } else betaincInvNewton(df, specs)

  /** [[gammaincInvNewton]] via the native kernel when available. */
  def gammaincInvNewtonFast(df: DataFrame,
      specs: Seq[(String, Column, Column, Boolean)]): DataFrame =
    if (hasNative(df.sparkSession)) {
      val keep = df.columns.toSeq.map(col)
      df.select(keep ++ specs.map { case (s, a, p, upper) =>
        nk("gammaincinv", a, p, lit(if (upper) 1.0 else 0.0)).as(s"ginv_$s")
      }: _*)
    } else gammaincInvNewton(df, specs)

  /** [[carlsonFD]] via the native kernels when available. */
  def carlsonFDFast(df: DataFrame,
      specs: Seq[(String, Column, Column, Column, Boolean)]): DataFrame =
    if (hasNative(df.sparkSession)) {
      val keep = df.columns.toSeq.map(col)
      df.select(keep ++ specs.flatMap { case (s, x, y, z, wantD) =>
        val rf = nk("carlsonRf", x, y, z).as(s"rf_$s")
        if (wantD) Seq(rf, nk("carlsonRd", x, y, z).as(s"rd_$s")) else Seq(rf)
      }: _*)
    } else carlsonFD(df, specs)

  /** [[carlsonRJ]] via the native kernel when available. */
  def carlsonRJFast(df: DataFrame,
      specs: Seq[(String, Column, Column, Column, Column)]): DataFrame =
    if (hasNative(df.sparkSession)) {
      val keep = df.columns.toSeq.map(col)
      df.select(keep ++ specs.map { case (s, x, y, z, p) =>
        nk("carlsonRj", x, y, z, p).as(s"rj_$s")
      }: _*)
    } else carlsonRJ(df, specs)

  /** [[ellipRc]] via the native kernel when available. */
  def ellipRcFast(spark: SparkSession, x: Column, y: Column): Column =
    if (hasNative(spark)) nk("ellipRc", x, y) else ellipRc(x, y)

  /** [[ellipInc]] via the native kernels when available. */
  def ellipIncFast(df: DataFrame,
      specs: Seq[(String, Column, Column, Boolean)]): DataFrame =
    if (hasNative(df.sparkSession)) {
      val keep = df.columns.toSeq.map(col)
      df.select(keep ++ specs.flatMap { case (s, phi, m, wantE) =>
        val kinc = nk("ellipKinc", phi, m).as(s"kinc_$s")
        if (wantE) Seq(kinc, nk("ellipEinc", phi, m).as(s"einc_$s"))
        else Seq(kinc)
      }: _*)
    } else ellipInc(df, specs)

  /** [[besselYvLargeStaged]] via the native kernel when available. */
  def besselYvLargeStagedFast(df: DataFrame, k: Int, f: Column, x: Column,
      out: String): DataFrame =
    if (hasNative(df.sparkSession)) {
      require(k >= 0 && k <= 24, s"besselYvLargeStaged supports k ≤ 24: $k")
      df.withColumn(out, nk("besselYvLarge", lit(k.toDouble), f, x))
    } else besselYvLargeStaged(df, k, f, x, out)

  /** [[besselKveLargeStaged]] via the native kernel when available. */
  def besselKveLargeStagedFast(df: DataFrame, k: Int, f: Column, x: Column,
      out: String): DataFrame =
    if (hasNative(df.sparkSession)) {
      require(k >= 0 && k <= 24, s"besselKveLargeStaged supports k ≤ 24: $k")
      df.withColumn(out, nk("besselKveLarge", lit(k.toDouble), f, x))
    } else besselKveLargeStaged(df, k, f, x, out)

  /** [[besselJvLargeStaged]] via the native kernel when available. */
  def besselJvLargeStagedFast(df: DataFrame, k: Int, f: Column, x: Column,
      out: String): DataFrame =
    if (hasNative(df.sparkSession)) {
      require(k >= 1 && k <= 24, s"bessel Miller staged supports 1 ≤ k ≤ 24: $k")
      df.withColumn(out, nk("besselJvLarge", lit(k.toDouble), f, x))
    } else besselJvLargeStaged(df, k, f, x, out)

  /** [[besselIveLargeStaged]] via the native kernel when available. */
  def besselIveLargeStagedFast(df: DataFrame, k: Int, f: Column, x: Column,
      out: String): DataFrame =
    if (hasNative(df.sparkSession)) {
      require(k >= 1 && k <= 24, s"bessel Miller staged supports 1 ≤ k ≤ 24: $k")
      df.withColumn(out, nk("besselIveLarge", lit(k.toDouble), f, x))
    } else besselIveLargeStaged(df, k, f, x, out)

  /** Branched-Bessel Fast forms ([[besselJvExt]] family). */
  def besselJvExtFast(spark: SparkSession, v: Column, x: Column): Column =
    if (hasNative(spark)) nk("besselJvExt", v, x) else besselJvExt(v, x)
  def besselYvExtFast(spark: SparkSession, v: Column, x: Column): Column =
    if (hasNative(spark)) nk("besselYvExt", v, x) else besselYvExt(v, x)
  def besselIveExtFast(spark: SparkSession, v: Column, x: Column): Column =
    if (hasNative(spark)) nk("besselIveExt", v, x) else besselIveExt(v, x)
  def besselKveExtFast(spark: SparkSession, v: Column, x: Column): Column =
    if (hasNative(spark)) nk("besselKveExt", v, x) else besselKveExt(v, x)

  /** Hypergeometric Fast forms ([[hyp2f1Ext]] family / [[hyp1f1Ext]]). */
  def hyp2f1ExtFast(spark: SparkSession, a: Column, b: Column, c: Column,
      z: Column): Column =
    if (hasNative(spark)) nk("hyp2f1Ext", a, b, c, z) else hyp2f1Ext(a, b, c, z)
  def hyp2f1FarFast(spark: SparkSession, a: Column, b: Column, c: Column,
      z: Column): Column =
    if (hasNative(spark)) nk("hyp2f1Far", a, b, c, z) else hyp2f1Far(a, b, c, z)
  def hyp2f1Near1Fast(spark: SparkSession, a: Column, b: Column, c: Column,
      z: Column): Column =
    if (hasNative(spark)) nk("hyp2f1Near1", a, b, c, z)
    else hyp2f1Near1(a, b, c, z)
  def hyp1f1ExtFast(spark: SparkSession, a: Column, b: Column,
      x: Column): Column =
    if (hasNative(spark)) nk("hyp1f1Ext", a, b, x) else hyp1f1Ext(a, b, x)

  /** Forward incomplete gamma/beta + KS Fast forms (the p-value
    * compositions in the learn gates ride these). */
  def betaincRegFast(spark: SparkSession, a: Column, b: Column,
      x: Column): Column =
    if (hasNative(spark)) nk("betaincReg", a, b, x) else betaincReg(a, b, x)
  def gammaincPFast(spark: SparkSession, a: Column, x: Column): Column =
    if (hasNative(spark)) nk("gammaincP", a, x) else gammaincP(a, x)
  def gammaincQFast(spark: SparkSession, a: Column, x: Column): Column =
    if (hasNative(spark)) nk("gammaincQ", a, x) else gammaincQ(a, x)
  def kolmogorovSfFixedFast(spark: SparkSession, lambda: Column): Column =
    if (hasNative(spark)) nk("kolmogorovSf", lambda) else kolmogorovSfFixed(lambda)
}
