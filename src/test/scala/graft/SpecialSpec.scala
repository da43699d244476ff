package graft

import org.apache.spark.sql.functions._
import graft.functions.{Special, Ufuncs}

/** Known-value pins for the scipy.special subset (Special.scala). The
  * gamma/info-theory families are differentially verified against DuckDB
  * (op_special_gamma, op_special_info); here we pin the functions DuckDB
  * lacks (erf/erfc, digamma), the negative-axis reflections, and the
  * scipy corner conventions — all against closed forms or published
  * constants (no scipy in the build environment).
  */
class SpecialSpec extends SparkSpecBase {
  import spark.implicits._

  private def eval1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      x: Double): Double =
    Seq(x).toDF("x").select(f(col("x")).as("y")).head().getDouble(0)

  private def eval2(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      x: Double, y: Double): Double =
    Seq((x, y)).toDF("x", "y").select(f(col("x"), col("y")).as("z")).head().getDouble(0)

  private val gammaEM = 0.5772156649015329 // Euler–Mascheroni

  test("gamma matches factorials, the half-integer forms, and reflection") {
    assert(math.abs(eval1(Special.gamma, 5.0) - 24.0) < 1e-9)
    assert(math.abs(eval1(Special.gamma, 0.5) - math.sqrt(math.Pi)) < 1e-12)
    assert(math.abs(eval1(Special.gamma, 1.5) - math.sqrt(math.Pi) / 2.0) < 1e-12)
    // Γ(−0.5) = −2√π ; Γ(−1.5) = 4√π/3 (reflection + sign alternation)
    assert(math.abs(eval1(Special.gamma, -0.5) - (-2.0 * math.sqrt(math.Pi))) < 1e-10)
    assert(math.abs(eval1(Special.gamma, -1.5) - (4.0 * math.sqrt(math.Pi) / 3.0)) < 1e-10)
  }

  test("gammasgn alternates on the negative axis and is 0 at poles") {
    assert(eval1(Special.gammasgn, 3.7) == 1.0)
    assert(eval1(Special.gammasgn, -0.5) == -1.0)
    assert(eval1(Special.gammasgn, -1.5) == 1.0)
    assert(eval1(Special.gammasgn, -2.5) == -1.0)
    assert(eval1(Special.gammasgn, -3.0) == 0.0)
    assert(eval1(Special.gammasgn, 0.0) == 0.0)
  }

  test("beta matches the closed form B(a,b) = (a-1)!(b-1)!/(a+b-1)! on integers") {
    // B(3,4) = 2!·3!/6! = 12/720 = 1/60
    assert(math.abs(eval2(Special.beta, 3.0, 4.0) - 1.0 / 60.0) < 1e-12)
    assert(math.abs(eval2(Special.beta, 0.5, 0.5) - math.Pi) < 1e-10)
  }

  test("digamma matches the published constants and recurrence") {
    // ψ(1) = −γ ; ψ(0.5) = −γ − 2 ln 2 ; ψ(x+1) = ψ(x) + 1/x
    assert(math.abs(eval1(Special.digamma, 1.0) - (-gammaEM)) < 1e-11)
    assert(math.abs(eval1(Special.digamma, 0.5) - (-gammaEM - 2.0 * math.log(2.0))) < 1e-11)
    for (x <- Seq(0.7, 2.3, 9.1)) {
      assert(math.abs(eval1(Special.digamma, x + 1.0) -
        (eval1(Special.digamma, x) + 1.0 / x)) < 1e-11)
    }
    // reflection: ψ(1−x) − ψ(x) = π cot(πx) at x = 0.25 → ψ(−0.25)... use
    // ψ(0.75) − ψ(0.25) = π (cot is π·cot(π/4) = π)
    assert(math.abs((eval1(Special.digamma, 0.75) - eval1(Special.digamma, 0.25)) -
      math.Pi) < 1e-10)
    // negative axis via reflection: ψ(−0.5) = 2 − γ − 2 ln 2
    assert(math.abs(eval1(Special.digamma, -0.5) -
      (2.0 - gammaEM - 2.0 * math.log(2.0))) < 1e-10)
  }

  test("trigamma matches the published constants, recurrence, reflection") {
    val pi2 = math.Pi * math.Pi
    // ψ′(1) = π²/6 ; ψ′(0.5) = π²/2 ; ψ′(2) = π²/6 − 1
    assert(math.abs(eval1(Special.trigamma, 1.0) - pi2 / 6.0) < 1e-10)
    assert(math.abs(eval1(Special.trigamma, 0.5) - pi2 / 2.0) < 1e-10)
    assert(math.abs(eval1(Special.trigamma, 2.0) - (pi2 / 6.0 - 1.0)) < 1e-10)
    // recurrence ψ′(x+1) = ψ′(x) − 1/x²
    for (x <- Seq(0.7, 2.3, 9.1)) {
      assert(math.abs(eval1(Special.trigamma, x + 1.0) -
        (eval1(Special.trigamma, x) - 1.0 / (x * x))) < 1e-10)
    }
    // reflection: ψ′(−0.5) = π²/2 + 4 (from ψ′(x) + ψ′(1−x) = π²/sin²πx)
    assert(math.abs(eval1(Special.trigamma, -0.5) - (pi2 / 2.0 + 4.0)) < 1e-9)
  }

  test("polygamma dispatches n = 0/1 and rejects higher orders loudly") {
    assert(math.abs(eval1(Special.polygamma(0, _), 1.0) - (-gammaEM)) < 1e-11)
    assert(math.abs(eval1(Special.polygamma(1, _), 1.0) -
      math.Pi * math.Pi / 6.0) < 1e-10)
    val e = intercept[IllegalArgumentException](Special.polygamma(2, lit(1.0)))
    assert(e.getMessage.contains("polygamma"))
  }

  test("poch matches rising factorials and the empty product") {
    // (3)_4 = 3·4·5·6 = 360 ; (x)_0 = 1 ; half-integers via Γ ratios:
    // (0.5)_2 = 0.5 · 1.5 = 0.75
    assert(math.abs(eval2(Special.poch, 3.0, 4.0) - 360.0) < 1e-7)
    assert(math.abs(eval2(Special.poch, 2.7, 0.0) - 1.0) < 1e-12)
    assert(math.abs(eval2(Special.poch, 0.5, 2.0) - 0.75) < 1e-11)
  }

  test("rgamma inverts gamma and is exactly 0 at the poles") {
    assert(math.abs(eval1(Special.rgamma, 5.0) - 1.0 / 24.0) < 1e-12)
    assert(math.abs(eval1(Special.rgamma, 0.5) - 1.0 / math.sqrt(math.Pi)) < 1e-12)
    // entire across the poles — scipy rgamma(−n) = 0 exactly
    assert(eval1(Special.rgamma, 0.0) == 0.0)
    assert(eval1(Special.rgamma, -3.0) == 0.0)
    // negative non-integer keeps the reflection sign: 1/Γ(−0.5) = −1/(2√π)
    assert(math.abs(eval1(Special.rgamma, -0.5) -
      (-1.0 / (2.0 * math.sqrt(math.Pi)))) < 1e-10)
  }

  test("multigammaln matches the closed form at d = 1 and d = 3") {
    // d = 1 degenerates to gammaln
    assert(math.abs(eval1(Special.multigammaln(_, 1), 4.0) - math.log(6.0)) < 1e-11)
    // ln Γ₃(4) = 1.5 ln π + ln Γ(4) + ln Γ(3.5) + ln Γ(3); with
    // Γ(3.5) = 15√π/8 this collapses to 2 ln π + ln 22.5
    assert(math.abs(eval1(Special.multigammaln(_, 3), 4.0) -
      (2.0 * math.log(math.Pi) + math.log(22.5))) < 1e-10)
    intercept[IllegalArgumentException](Special.multigammaln(lit(4.0), 0))
  }

  test("erf/erfc match published values within the A&S 7.1.26 bound") {
    val known = Seq( // x -> erf(x), 15-digit published values
      0.5 -> 0.5204998778130465,
      1.0 -> 0.8427007929497149,
      2.0 -> 0.9953222650189527)
    for ((x, v) <- known) {
      assert(math.abs(eval1(Special.erf, x) - v) < 1.5e-7)
      assert(math.abs(eval1(Special.erf, -x) - (-v)) < 1.5e-7)
      assert(math.abs(eval1(Special.erfc, x) - (1.0 - v)) < 1.5e-7)
    }
    assert(eval1(Special.erf, 0.0) == 0.0)
  }

  test("erfinv/erfcinv invert erf within Acklam precision") {
    val known = Seq( // x -> erfinv(x), scipy 15-digit values
      0.5 -> 0.4769362762044699,
      0.9 -> 1.1630871536766743,
      -0.5 -> -0.4769362762044699)
    for ((x, v) <- known)
      assert(math.abs(eval1(Special.erfinv, x) - v) < 1e-8, s"erfinv($x)")
    assert(eval1(Special.erfinv, 0.0) == 0.0)
    // erfcinv(y) = erfinv(1 - y); erfcinv(1) = 0
    assert(math.abs(eval1(Special.erfcinv, 0.5) -
      eval1(Special.erfinv, 0.5)) < 1e-12)
    assert(eval1(Special.erfcinv, 1.0) == 0.0)
    // round trip through the forward A&S erf at its looser bound
    for (x <- Seq(0.25, 0.75))
      assert(math.abs(eval1(c => Special.erf(Special.erfinv(c)), x) - x) < 1.5e-6)
  }

  test("info-theory corner conventions match scipy") {
    assert(eval1(Special.entr, 0.0) == 0.0)
    assert(eval1(Special.entr, -1.0).isNegInfinity)
    assert(eval2(Special.relEntr, 0.0, 2.0) == 0.0)
    assert(eval2(Special.relEntr, 1.0, 0.0).isPosInfinity)
    assert(eval2(Special.klDiv, 0.0, 3.0) == 3.0)
    assert(eval2(Special.xlogy, 0.0, 0.0) == 0.0)
    assert(eval2(Special.xlog1py, 0.0, -1.0) == 0.0)
  }

  test("the ufunc registry resolves the special names") {
    for (n <- Seq("gamma", "gammaln", "gammasgn", "psi", "erf", "erfc", "entr"))
      assert(Ufuncs.unary.contains(n), n)
    for (n <- Seq("beta", "betaln", "rel_entr", "kl_div", "xlogy", "xlog1py",
      "gammainc", "gammaincc"))
      assert(Ufuncs.binary.contains(n), n)
  }

  // Abramowitz–Stegun tables 9.1/9.8 values (|ε| of the 9.4/9.8
  // polynomial fits is ≤ ~1e-7; tolerances sized to the published bounds)
  test("bessel J/Y match tabulated values on both branches") {
    assert(math.abs(eval1(Special.besselJ0, 1.0) - 0.7651976866) < 5e-7)
    assert(math.abs(eval1(Special.besselJ0, 2.0) - 0.2238907791) < 5e-7)
    assert(math.abs(eval1(Special.besselJ0, 5.0) - (-0.1775967713)) < 5e-7)
    assert(math.abs(eval1(Special.besselJ0, 10.0) - (-0.2459357645)) < 5e-7)
    assert(math.abs(eval1(Special.besselJ0, -5.0) - (-0.1775967713)) < 5e-7) // even
    assert(math.abs(eval1(Special.besselJ1, 1.0) - 0.4400505857) < 5e-7)
    assert(math.abs(eval1(Special.besselJ1, 5.0) - (-0.3275791376)) < 5e-7)
    assert(math.abs(eval1(Special.besselJ1, -5.0) - 0.3275791376) < 5e-7) // odd
    assert(math.abs(eval1(Special.besselY0, 1.0) - 0.0882569642) < 5e-7)
    assert(math.abs(eval1(Special.besselY0, 5.0) - (-0.3085176252)) < 5e-7)
    assert(math.abs(eval1(Special.besselY1, 1.0) - (-0.7812128213)) < 5e-7)
    assert(math.abs(eval1(Special.besselY1, 5.0) - 0.1478631434) < 5e-7)
  }

  test("bessel I/K match tabulated values on both branches") {
    assert(math.abs(eval1(Special.besselI0, 1.0) - 1.2660658778) < 5e-7)
    assert(math.abs(eval1(Special.besselI0, 5.0) - 27.2398718236) / 27.24 < 3e-7)
    assert(math.abs(eval1(Special.besselI0, -5.0) - 27.2398718236) / 27.24 < 3e-7)
    assert(math.abs(eval1(Special.besselI1, 1.0) - 0.5651591040) < 5e-7)
    assert(math.abs(eval1(Special.besselI1, 5.0) - 24.3356421424) / 24.34 < 3e-7)
    assert(math.abs(eval1(Special.besselI1, -5.0) + 24.3356421424) / 24.34 < 3e-7)
    assert(math.abs(eval1(Special.besselK0, 1.0) - 0.4210244382) < 5e-7)
    assert(math.abs(eval1(Special.besselK0, 5.0) - 0.0036910983) < 5e-8)
    assert(math.abs(eval1(Special.besselK1, 1.0) - 0.6019072302) < 5e-7)
    assert(math.abs(eval1(Special.besselK1, 5.0) - 0.0040446134) < 5e-8)
  }

  test("bessel cross-product identities hold across the branch points") {
    // J₁Y₀ − J₀Y₁ = 2/(πx) and I₀K₁ + I₁K₀ = 1/x — each ties all four
    // members of a family together at once, including across the
    // small/large approximation branches (A&S 9.1.16, 9.6.15)
    for (x <- Seq(0.4, 1.0, 1.9, 2.0, 2.7, 3.0, 3.5, 3.75, 5.0, 8.0, 11.0)) {
      val jy = eval1(Special.besselJ1, x) * eval1(Special.besselY0, x) -
        eval1(Special.besselJ0, x) * eval1(Special.besselY1, x)
      assert(math.abs(jy - 2.0 / (math.Pi * x)) < 2e-6, s"JY at $x: $jy")
      val ik = eval1(Special.besselI0, x) * eval1(Special.besselK1, x) +
        eval1(Special.besselI1, x) * eval1(Special.besselK0, x)
      assert(math.abs(ik - 1.0 / x) < 2e-6 * math.max(1.0, ik * x), s"IK at $x: $ik")
    }
  }

  test("elliptic K/E match published values to machine precision") {
    // scipy.special.ellipk/ellipe (parameter m = k²) reference values
    assert(math.abs(eval1(Special.ellipk, 0.0) - math.Pi / 2.0) < 1e-15)
    assert(math.abs(eval1(Special.ellipe, 0.0) - math.Pi / 2.0) < 1e-15)
    assert(math.abs(eval1(Special.ellipk, 0.5) - 1.8540746773013719) < 1e-12)
    assert(math.abs(eval1(Special.ellipe, 0.5) - 1.3506438810476755) < 1e-12)
    assert(math.abs(eval1(Special.ellipk, 0.9) - 2.5780921133481733) < 1e-12)
    assert(math.abs(eval1(Special.ellipe, 0.9) - 1.1047747327040733) < 1e-12)
    // Legendre relation E(m)K(1−m) + E(1−m)K(m) − K(m)K(1−m) = π/2
    val m = 0.37
    val lhs = eval1(Special.ellipe, m) * eval1(Special.ellipk, 1.0 - m) +
      eval1(Special.ellipe, 1.0 - m) * eval1(Special.ellipk, m) -
      eval1(Special.ellipk, m) * eval1(Special.ellipk, 1.0 - m)
    assert(math.abs(lhs - math.Pi / 2.0) < 1e-12)
  }

  test("the ufunc registry resolves the bessel/elliptic names") {
    for (n <- Seq("j0", "j1", "y0", "y1", "i0", "i1", "k0", "k1",
      "ellipk", "ellipe", "fresnel_c", "fresnel_s", "dawsn", "erfi"))
      assert(Ufuncs.unary.contains(n), n)
  }

  test("fresnel C/S match tabulated values on both branches and are odd") {
    assert(math.abs(eval1(Special.fresnelC, 1.0) - 0.7798934003768228) < 5e-7)
    assert(math.abs(eval1(Special.fresnelS, 1.0) - 0.4382591473903548) < 5e-7)
    assert(math.abs(eval1(Special.fresnelC, 2.0) - 0.4882534060753408) < 5e-7)
    assert(math.abs(eval1(Special.fresnelS, 2.0) - 0.3434156783636982) < 5e-7)
    assert(math.abs(eval1(Special.fresnelC, 5.0) - 0.5636311887040122) < 5e-7)
    assert(math.abs(eval1(Special.fresnelS, 5.0) - 0.4991913819171169) < 5e-7)
    assert(math.abs(eval1(Special.fresnelC, -2.0) + 0.4882534060753408) < 5e-7)
    assert(math.abs(eval1(Special.fresnelS, -5.0) + 0.4991913819171169) < 5e-7)
    assert(eval1(Special.fresnelC, 0.0) == 0.0)
  }

  test("fixed-depth incomplete gamma matches the adaptive Lentz forms") {
    import graft.learn.StatTests
    def evalPQ(a: Double, x: Double): (Double, Double) = {
      val r = Seq((a, x)).toDF("a", "x")
        .select(Special.gammaincP(col("a"), col("x")).as("p"),
          Special.gammaincQ(col("a"), col("x")).as("q")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // closed forms: P(1,x) = 1 − e^(−x)
    assert(math.abs(evalPQ(1.0, 2.0)._1 - (1.0 - math.exp(-2.0))) < 1e-12)
    for (a <- Seq(0.6, 1.5, 5.0, 12.0, 30.0, 55.0);
         x <- Seq(0.1, 1.0, 4.0, 9.0, 25.0, 60.0, 110.0)) {
      val (p, q) = evalPQ(a, x)
      assert(math.abs(p + q - 1.0) < 1e-11, s"P+Q at ($a,$x)")
      assert(math.abs(p - StatTests.regGammaP(a, x)) < 1e-9,
        s"P($a,$x): $p vs ${StatTests.regGammaP(a, x)}")
    }
  }

  test("fixed-depth incomplete beta matches the adaptive Lentz form") {
    import graft.learn.StatTests
    def evalI(a: Double, b: Double, x: Double): Double =
      Seq((a, b, x)).toDF("a", "b", "x")
        .select(Special.betaincReg(col("a"), col("b"), col("x")).as("i"))
        .head().getDouble(0)
    // closed form: I_x(1,1) = x; I_x(2,1) = x²
    assert(math.abs(evalI(1.0, 1.0, 0.37) - 0.37) < 1e-12)
    assert(math.abs(evalI(2.0, 1.0, 0.5) - 0.25) < 1e-12)
    for (a <- Seq(0.5, 2.0, 10.0, 35.0, 60.0);
         b <- Seq(0.5, 3.0, 25.0, 60.0);
         x <- Seq(0.02, 0.2, 0.5, 0.8, 0.97, 0.995)) {
      val i = evalI(a, b, x)
      val ref = StatTests.regIncBeta(a, b, x)
      assert(math.abs(i - ref) < 1e-8, s"I_$x($a,$b): $i vs $ref")
      // symmetry I_x(a,b) = 1 − I_{1−x}(b,a)
      assert(math.abs(i - (1.0 - evalI(b, a, 1.0 - x))) < 1e-9)
    }
  }

  test("hypergeometric 2F1/1F1 match closed forms and transformations") {
    def eval2f1(a: Double, b: Double, c: Double, x: Double): Double =
      Seq((a, b, c, x)).toDF("a", "b", "c", "x")
        .select(Special.hyp2f1(col("a"), col("b"), col("c"), col("x")).as("v"))
        .head().getDouble(0)
    def eval1f1(a: Double, b: Double, x: Double): Double =
      Seq((a, b, x)).toDF("a", "b", "x")
        .select(Special.hyp1f1(col("a"), col("b"), col("x")).as("v"))
        .head().getDouble(0)
    // ₂F₁(1,1;2;x) = −ln(1−x)/x ; ₂F₁(a,b;b;x) = (1−x)^(−a)
    assert(math.abs(eval2f1(1.0, 1.0, 2.0, 0.5) -
      (-math.log(0.5) / 0.5)) < 1e-9)
    assert(math.abs(eval2f1(2.5, 3.0, 3.0, 0.3) -
      math.pow(0.7, -2.5)) < 1e-9)
    assert(eval2f1(1.3, 0.7, 2.1, 0.0) == 1.0)
    assert(eval2f1(1.0, 1.0, 2.0, 0.9).isNaN) // outside the window
    // Euler transformation ₂F₁(a,b;c;x) = (1−x)^(c−a−b)·₂F₁(c−a,c−b;c;x)
    val lhs = eval2f1(1.2, 0.8, 2.3, 0.5)
    val rhs = math.pow(0.5, 2.3 - 1.2 - 0.8) * eval2f1(1.1, 1.5, 2.3, 0.5)
    assert(math.abs(lhs - rhs) < 1e-9, s"euler: $lhs vs $rhs")
    // ₁F₁(1;1;x) = eˣ ; ₁F₁(1;2;x) = (eˣ−1)/x ; Kummer transform
    assert(math.abs(eval1f1(1.0, 1.0, 3.0) - math.exp(3.0)) < 1e-8)
    assert(math.abs(eval1f1(1.0, 2.0, 2.0) - (math.exp(2.0) - 1.0) / 2.0) < 1e-9)
    val kLhs = eval1f1(0.7, 2.1, 5.0)
    val kRhs = math.exp(5.0) * eval1f1(1.4, 2.1, -5.0)
    assert(math.abs(kLhs - kRhs) / kLhs < 1e-7, s"kummer: $kLhs vs $kRhs")
    assert(eval1f1(1.0, 2.0, 25.0).isNaN) // outside the window
  }

  test("kolmogorovSfFixed matches the adaptive KS series") {
    import graft.learn.StatTests
    for (l <- Seq(0.3, 0.6, 1.0, 1.5, 2.5)) {
      val v = eval1(Special.kolmogorovSfFixed, l)
      assert(math.abs(v - StatTests.kolmogorovSf(l)) < 1e-10, s"λ=$l")
    }
  }

  test("airy matches tabulated values inside the series window") {
    // scipy.special.airy reference values
    assert(math.abs(eval1(Special.airyAi, 0.0) - 0.3550280538878172) < 1e-12)
    assert(math.abs(eval1(Special.airyAip, 0.0) + 0.2588194037928068) < 1e-12)
    assert(math.abs(eval1(Special.airyAi, 1.0) - 0.1352924163128814) < 1e-10)
    assert(math.abs(eval1(Special.airyBi, 1.0) - 1.2074235949528713) < 1e-10)
    assert(math.abs(eval1(Special.airyAi, -2.0) - 0.2274074282016855) < 1e-10)
    assert(math.abs(eval1(Special.airyBi, -2.0) + 0.4123025879563984) < 1e-10)
    assert(math.abs(eval1(Special.airyAi, 5.0) - 1.0834442813607441e-4) < 1e-9)
    assert(math.abs(eval1(Special.airyBi, 5.0) - 657.7920441711711) / 657.8 < 1e-10)
    // Wronskian Ai·Bi′ − Ai′·Bi = 1/π at several points
    for (x <- Seq(-3.0, -1.0, 0.5, 2.0, 4.0)) {
      val w = eval1(Special.airyAi, x) * eval1(Special.airyBip, x) -
        eval1(Special.airyAip, x) * eval1(Special.airyBi, x)
      assert(math.abs(w - 1.0 / math.Pi) < 1e-9, s"wronskian at $x: $w")
    }
    assert(eval1(Special.airyAi, 7.0).isNaN) // outside the window
  }

  test("dawsn and erfi match tabulated values on both branches") {
    assert(math.abs(eval1(Special.dawsn, 0.5) - 0.4244363835020223) < 5e-7)
    assert(math.abs(eval1(Special.dawsn, 1.0) - 0.5380795069127684) < 5e-7)
    assert(math.abs(eval1(Special.dawsn, 2.0) - 0.3013403889237920) < 5e-7)
    assert(math.abs(eval1(Special.dawsn, 5.0) - 0.1021340744242768) < 5e-7)
    assert(math.abs(eval1(Special.dawsn, -1.0) + 0.5380795069127684) < 5e-7)
    assert(math.abs(eval1(Special.erfi, 1.0) - 1.6504257587975428) < 2e-6)
    assert(math.abs(eval1(Special.erfi, 2.0) - 18.564802414575552) / 18.56 < 5e-7)
  }

  test("integer-order bessel recurrences match high-precision values") {
    // mpmath (30 digits) reference points; upward J needs x ≳ n
    val tol = 2e-6 // A&S base-kernel bound amplified ≤ ~10× by recurrence
    assert(math.abs(eval1(Special.besselJn(2, _), 2.5) - 0.44605905844) < tol)
    assert(math.abs(eval1(Special.besselJn(3, _), 5.0) - 0.364831230614) < tol)
    assert(math.abs(eval1(Special.besselJn(2, _), 9.0) - 0.144847341533) < tol)
    assert(math.abs(eval1(Special.besselYn(2, _), 2.5) - (-0.381335849242)) < tol)
    assert(math.abs(eval1(Special.besselYn(3, _), 9.0) - (-0.205094878119)) < tol)
    assert(math.abs(eval1(Special.besselIn(2, _), 1.0) - 0.135747669767) < tol)
    assert(math.abs(eval1(Special.besselIn(2, _), 3.0) - 2.24521244093) < 1e-5)
    assert(math.abs(eval1(Special.besselKn(2, _), 1.0) - 1.62483889864) < 1e-5)
    assert(math.abs(eval1(Special.besselKn(3, _), 3.0) - 0.122170375757) < tol)
    // n = 0/1 dispatch straight to the base kernels
    assert(eval1(Special.besselJn(0, _), 2.0) == eval1(Special.besselJ0, 2.0))
    assert(eval1(Special.besselKn(1, _), 2.0) == eval1(Special.besselK1, 2.0))
  }

  test("scaled bessel/airy forms match high-precision values") {
    assert(math.abs(eval1(Special.besselIve(1, _), 3.0) - 0.196826713297) < 2e-6)
    assert(math.abs(eval1(Special.besselIve(1, _), 6.0) - 0.152051459309) < 2e-6)
    assert(math.abs(eval1(Special.besselKve(2, _), 6.0) - 0.682588434288) < 2e-6)
    // ive at negative x keeps I₁'s odd sign under the |x| scale
    assert(math.abs(eval1(Special.besselIve(1, _), -3.0) + 0.196826713297) < 2e-6)
    assert(math.abs(eval1(Special.airyeAi, 0.5) - 0.29327715913) < 1e-9)
    assert(math.abs(eval1(Special.airyeAi, 4.5) - 0.191723968724) < 1e-7)
    assert(math.abs(eval1(Special.airyeBi, 2.0) - 0.500437254304) < 1e-9)
    // x ≤ 0: scaling factor is 1 — airye == airy
    assert(eval1(Special.airyeAi, -1.5) == eval1(Special.airyAi, -1.5))
  }

  test("erfcx matches high-precision values across all three branches") {
    assert(math.abs(eval1(Special.erfcx, 0.5) - 0.615690344193) < 2e-5)
    assert(math.abs(eval1(Special.erfcx, 2.0) - 0.255395676311) < 2e-5)
    assert(math.abs(eval1(Special.erfcx, 4.0) - 0.136999457625) < 1e-9)
    assert(math.abs(eval1(Special.erfcx, 10.0) - 0.0561409927438) < 1e-12)
    assert(math.abs(eval1(Special.erfcx, -1.5) - 18.6538862563) < 2e-4)
    assert(math.abs(eval1(Special.erfcx, 0.0) - 1.0) < 1e-12)
  }

  test("hyp0f1 matches high-precision values and the Bessel identity") {
    assert(math.abs(eval2(Special.hyp0f1, 1.5, 3.0) - 4.60674194042) < 1e-9)
    assert(math.abs(eval2(Special.hyp0f1, 2.5, -8.0) - (-0.085669302504)) < 1e-9)
    assert(math.abs(eval2(Special.hyp0f1, 0.8, 10.0) - 132.149185398) < 1e-7)
    // ₀F₁(; 1; −x²/4) = J₀(x): series vs the A&S kernel at x = 2
    assert(math.abs(eval2(Special.hyp0f1, 1.0, -1.0) -
      eval1(Special.besselJ0, 2.0)) < 2e-6)
  }

  private def evalFD(x: Double, y: Double, z: Double): (Double, Double) = {
    val r = Special.carlsonFD(Seq((x, y, z)).toDF("x", "y", "z"),
      Seq(("t", col("x"), col("y"), col("z"), true))).head()
    (r.getAs[Double]("rf_t"), r.getAs[Double]("rd_t"))
  }

  test("Carlson R_F/R_D/R_J/R_C match mpmath to machine precision") {
    val (rf1, rd1) = evalFD(1.0, 2.0, 4.0)
    assert(math.abs(rf1 - 0.6850858166334359) < 1e-14)
    assert(math.abs(rd1 - 0.21838072549338966) < 1e-14)
    val (rf2, rd2) = evalFD(0.04, 1.0, 1.0)
    assert(math.abs(rf2 - 1.3976772203673038) < 1e-13)
    assert(math.abs(rd2 - 1.8713706568239123) < 1e-13)
    val rj = Special.carlsonRJ(Seq((1.0, 2.0, 4.0, 3.0)).toDF("x", "y", "z", "p"),
      Seq(("t", col("x"), col("y"), col("z"), col("p"))))
      .head().getAs[Double]("rj_t")
    assert(math.abs(rj - 0.26377357847854027) < 1e-13)
    // R_C closed form, both branches
    assert(math.abs(eval2(Special.ellipRc, 2.0, 1.0) - 0.881373587019543) < 1e-13)
    assert(math.abs(eval2(Special.ellipRc, 1.0, 3.0) - 0.67551085885604) < 1e-13)
    // R_C(x,y) = R_F(x,y,y): the closed form vs the duplication kernel
    val (rfc, _) = evalFD(1.0, 3.0, 3.0)
    assert(math.abs(rfc - 0.67551085885604) < 1e-13)
  }

  test("incomplete elliptic F/E match mpmath and reduce to K/E at pi/2") {
    def inc(phi: Double, m: Double): (Double, Double) = {
      val r = Special.ellipInc(Seq((phi, m)).toDF("phi", "m"),
        Seq(("t", col("phi"), col("m"), true))).head()
      (r.getAs[Double]("kinc_t"), r.getAs[Double]("einc_t"))
    }
    val (k1, e1) = inc(0.5, 0.3)
    assert(math.abs(k1 - 0.506140211962) < 1e-11)
    assert(math.abs(e1 - 0.493991144729) < 1e-11)
    val (k2, e2) = inc(1.2, 0.8)
    assert(math.abs(k2 - 1.48849568895) < 1e-10)
    assert(math.abs(e2 - 0.998874639838) < 1e-10)
    // φ = π/2 degenerates to the complete integrals (the AGM kernel)
    val (kc, ec) = inc(math.Pi / 2.0, 0.25)
    assert(math.abs(kc - eval1(Special.ellipk, 0.25)) < 1e-10)
    assert(math.abs(ec - eval1(Special.ellipe, 0.25)) < 1e-10)
  }

  test("Newton gammaincinv/gammainccinv match mpmath bisection roots") {
    def ginv(a: Double, p: Double, upper: Boolean): Double =
      Special.gammaincInvNewton(Seq((a, p)).toDF("a", "p"),
        Seq(("t", col("a"), col("p"), upper))).head().getAs[Double]("ginv_t")
    assert(math.abs(ginv(1.5, 0.3, false) - 0.711826121518) < 1e-7)
    assert(math.abs(ginv(4.0, 0.9, false) - 6.68078306826) < 1e-6)
    assert(math.abs(ginv(2.0, 0.05, false) - 0.355361510699) < 1e-7)
    assert(math.abs(ginv(8.0, 0.5, false) - 7.6692494425) < 1e-6)
    assert(math.abs(ginv(0.5, 0.7, false) - 0.537097085429) < 1e-7)
    assert(math.abs(ginv(1.5, 0.3, true) - 1.83243539159) < 1e-7)
    assert(math.abs(ginv(4.0, 0.9, true) - 1.74476956282) < 1e-7)
    assert(math.abs(ginv(0.5, 0.7, true) - 0.0742359309163) < 1e-7)
  }

  test("Newton betaincinv matches mpmath bisection roots") {
    def binv(a: Double, b: Double, p: Double): Double =
      Special.betaincInvNewton(Seq((a, b, p)).toDF("a", "b", "p"),
        Seq(("t", col("a"), col("b"), col("p")))).head().getAs[Double]("binv_t")
    assert(math.abs(binv(2.0, 3.0, 0.4) - 0.329166503378) < 1e-8)
    assert(math.abs(binv(5.0, 1.5, 0.85) - 0.926681940075) < 1e-7)
    assert(math.abs(binv(1.2, 1.2, 0.05) - 0.0698775235334) < 1e-8)
    assert(math.abs(binv(4.0, 4.0, 0.5) - 0.5) < 1e-10)
  }

  test("staged wofz/voigt == unstaged bit-for-bit across all four regions") {
    // r17: wofzStaged factors the region trees behind projection
    // boundaries; the arithmetic must stay op-for-op identical, so the
    // doubles must match EXACTLY (not within tolerance) on a sweep that
    // hits every Humlicek region and both x signs.
    val pts = for {
      x <- Seq(-12.0, -3.0, -1.0, -0.1, 0.0, 0.1, 1.0, 3.0, 8.0, 12.0)
      y <- Seq(0.0, 0.05, 0.2, 0.5, 2.5, 8.0, 16.0)
    } yield (x, y)
    val df = pts.toDF("x", "y")
    val un = df.select(
      Special.wofzRe(col("x"), col("y")).as("re"),
      Special.wofzIm(col("x"), col("y")).as("im"),
      Special.voigtProfile(col("x"), lit(1.5), lit(0.5)).as("v"))
    val st0 = Special.wofzStaged(df, col("x"), col("y"), "re", "im")
    val st = Special.voigtProfileStaged(st0, col("x"), lit(1.5), lit(0.5), "v")
      .select(col("re"), col("im"), col("v"))
    un.collect().zip(st.collect()).foreach { case (a, b) =>
      (0 until 3).foreach { i =>
        assert(java.lang.Double.compare(a.getDouble(i), b.getDouble(i)) == 0,
          s"staged wofz diverged at col $i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
  }

  test("wofz/voigt match mpmath within Humlicek's published bound") {
    val tol = 2e-4 // w4's ~3e-5 worst relative, on O(0.01..1) values
    assert(math.abs(eval2(Special.wofzRe, 1.0, 0.5) - 0.3549003329) < tol)
    assert(math.abs(eval2(Special.wofzIm, 1.0, 0.5) - 0.3428717191) < tol)
    assert(math.abs(eval2(Special.wofzRe, 3.0, 0.2) - 0.01562677046) < tol)
    assert(math.abs(eval2(Special.wofzIm, 3.0, 0.2) - 0.1996685632) < tol)
    assert(math.abs(eval2(Special.wofzRe, 8.0, 8.0) - 0.03539794577) < 1e-5)
    assert(math.abs(eval2(Special.wofzRe, 12.0, 0.1) - 0.0003959240004) < 1e-5)
    assert(math.abs(eval2(Special.wofzRe, 0.0, 1.0) - 0.4275835762) < 1e-4)
    // Im w is odd in x; purely imaginary argument gives real w
    assert(math.abs(eval2(Special.wofzIm, 0.0, 1.0)) < 1e-12)
    assert(math.abs(eval2(Special.wofzIm, -3.0, 0.2) + 0.1996685632) < tol)
    def voigt(x: Double): Double =
      Seq(x).toDF("x").select(Special.voigtProfile(col("x"), lit(1.5),
        lit(0.5)).as("v")).head().getDouble(0)
    assert(math.abs(voigt(0.0) - 0.2077407832) < 1e-4)
    assert(math.abs(voigt(1.0) - 0.1752774329) < 1e-4)
    assert(math.abs(voigt(3.0) - 0.05065390387) < 1e-4)
  }

  test("large-x Bessel asymptotics match mpmath; Ext branches join the series") {
    // Hankel expansions (A&S 9.2/9.7), 12 terms, window nu <= 4,
    // x >= 8.5; pins are mpmath dps=30 (ive/kve = scaled forms)
    val pins = Seq( // (nu, x, J, Y, ive, kve)
      (0.0, 15.0, -0.0142244728268, 0.205464296039, 0.103899531449, 0.321002353506),
      (0.7, 10.0, -0.0680710012251, 0.243112620253, 0.124568546809, 0.400897066147),
      (1.5, 20.0, -0.0646628665923, -0.166521109094, 0.0847458955173, 0.294262038861),
      (2.5, 12.0, 0.0724226738318, 0.221212279409, 0.0887728022892, 0.459788297167),
      (4.0, 9.0, -0.265470801757, 0.0900257628288, 0.0534817035807, 0.949408044973),
      (3.0, 50.0, 0.0927348040616, 0.0644591220602, 0.0516473717576, 0.193282544015))
    val rows = pins.map(p => (p._1, p._2)).toDF("v", "x")
      .select(col("v"), col("x"),
        Special.besselJvAsym(col("v"), col("x")).as("j"),
        Special.besselYvAsym(col("v"), col("x")).as("y"),
        Special.besselIveAsym(col("v"), col("x")).as("ive"),
        Special.besselKveAsym(col("v"), col("x")).as("kve"))
      .orderBy("v", "x").collect()
    val byKey = rows.map(r => (r.getDouble(0), r.getDouble(1)) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    for ((nu, x, j, y, ive, kve) <- pins) {
      val (gj, gy, give, gkve) = byKey((nu, x))
      assert(math.abs(gj - j) < 1e-7, s"J($nu,$x) = $gj")
      assert(math.abs(gy - y) < 1e-7, s"Y($nu,$x) = $gy")
      assert(math.abs(give - ive) < 1e-6, s"ive($nu,$x) = $give")
      assert(math.abs(gkve - kve) < 1e-6, s"kve($nu,$x) = $gkve")
    }
    // the Ext branch is continuous through the 8.7 cut: both kernels
    // agree with mpmath on either side (nu = 0.5, series reflection ok)
    val cont = Seq((0.5, 8.6), (0.5, 8.8)).toDF("v", "x")
      .select(col("x"), Special.besselJvExt(col("v"), col("x")).as("j"),
        Special.besselYvExt(col("v"), col("x")).as("y"))
      .orderBy("x").collect()
    assert(math.abs(cont(0).getDouble(1) - 0.199812101676) < 1e-7)
    assert(math.abs(cont(0).getDouble(2) - 0.184663691478) < 1e-7)
    assert(math.abs(cont(1).getDouble(1) - 0.157323323522) < 1e-7)
    assert(math.abs(cont(1).getDouble(2) - 0.218157117296) < 1e-7)
  }

  test("modfresnelp/modfresnelm match mpmath erfc-based pins") {
    // mpmath dps=30 pins: F+(x) = (sqrt(pi)/2) e^{i pi/4} erfc(x e^{-i pi/4}),
    // K+(x) = e^{-i(x^2+pi/4)} F+(x) / sqrt(pi); minus family = conjugate.
    // Tolerance is Humlicek w4's bound propagated through the unit-modulus
    // phase rotation (values are O(0.01..1.5)).
    val pins = Seq( // (x, fre, fim, kre, kim)
      (-4.0, 1.22111739616, 1.37379091331, -1.00892253577, 0.239713831414),
      (-3.0, 1.32952062639, 1.40021959555, -0.980605140415, -0.474498906637),
      (-1.5, 1.52584192155, 1.40489487296, -0.772000071084, -0.879409214197),
      (-0.5, 1.12354109787, 0.668138092926, 0.647607678264, -0.352870093602),
      (0.0, 0.626657068658, 0.626657068658, 0.5, 0.0),
      (0.5, 0.129773039443, 0.585176044389, 0.321304743446, 0.105466134347),
      (1.0, -0.277867169243, 0.316388766934, 0.207794047954, 0.115159893777),
      (2.0, 0.165195606225, -0.178119420686, 0.107023941538, 0.0856229479359),
      (4.0, 0.0321967411599, -0.12047677599, 0.0512630554493, 0.0481894852511),
      (8.0, -0.0572999588504, 0.0249354237225, 0.0251239550619, 0.0247347183137))
    val tol = 3e-4
    // one DataFrame, one codegen pass for all pins (the four output
    // columns each embed two Faddeeva picks — per-pin jobs would
    // janino-compile the big tree ten times over)
    val rows = pins.map(_._1).toDF("x")
      .select(col("x"), Special.modfresnelPlus(col("x")) match {
        case (a, b, c, d) => struct(a.as("fre"), b.as("fim"),
          c.as("kre"), d.as("kim")).as("t")
      }).select("x", "t.*").orderBy("x").collect()
    val byX = rows.map(r => r.getDouble(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((x, fre, fim, kre, kim) <- pins) {
      val (gfre, gfim, gkre, gkim) = byX(x)
      assert(math.abs(gfre - fre) < tol, s"fre($x) = $gfre")
      assert(math.abs(gfim - fim) < tol, s"fim($x) = $gfim")
      assert(math.abs(gkre - kre) < tol, s"kre($x) = $gkre")
      assert(math.abs(gkim - kim) < tol, s"kim($x) = $gkim")
    }
    // the frame-staged form (what the gate runs) performs the identical
    // ops — bit-equal to the Column form on every pin
    val stagedRows = Special.modfresnelStaged(pins.map(_._1).toDF("x"),
      col("x")).orderBy("x")
      .select("mf_fre", "mf_fim", "mf_kre", "mf_kim").collect()
    for ((r, s) <- rows.zip(stagedRows); i <- 0 until 4)
      assert(r.getDouble(i + 1) == s.getDouble(i), s"staged col $i")
    // the staged SQL mirror (sqlModfresnelStaged) is exercised
    // differentially by op_special_modfresnel — re-parsing the ~1 MB
    // staged string through Spark's ANTLR here costs minutes for no
    // added coverage, so the gate owns that half.
  }

  test("itairy matches mpmath quadrature; hankel1e matches J/Y mixes") {
    assert(math.abs(eval1(Special.itAiryAi, 0.5) - 0.145953304912) < 1e-10)
    assert(math.abs(eval1(Special.itAiryAi, 2.0) - 0.312532755781) < 1e-10)
    assert(math.abs(eval1(Special.itAiryAi, 5.0) - 0.333287590306) < 1e-8)
    assert(math.abs(eval1(Special.itAiryAi, -3.0) - (-0.801462842671)) < 1e-9)
    assert(math.abs(eval1(Special.itAiryBi, 2.0) - 2.87340825998) < 1e-9)
    assert(math.abs(eval1(Special.itAiryBi, -3.0) - 0.195442489514) < 1e-9)
    assert(math.abs(eval1(Special.hankel1eRe(0, _), 2.5) - 0.336843589647) < 2e-6)
    assert(math.abs(eval1(Special.hankel1eIm(0, _), 2.5) - (-0.370069546256)) < 2e-6)
    assert(math.abs(eval1(Special.hankel1eRe(1, _), 5.0) - (-0.234711371607)) < 2e-6)
    assert(math.abs(eval1(Special.hankel1eIm(1, _), 5.0) - (-0.272180404506)) < 2e-6)
    // |hankel1e| = |H1| = sqrt(J² + Y²): the scale is unit-modulus
    val re = eval1(Special.hankel1eRe(1, _), 5.0)
    val im = eval1(Special.hankel1eIm(1, _), 5.0)
    val j = eval1(Special.besselJn(1, _), 5.0)
    val y = eval1(Special.besselYn(1, _), 5.0)
    assert(math.abs(re * re + im * im - (j * j + y * y)) < 1e-12)
  }

  test("Carlson R_G composes from R_F/R_D (mpmath 25-digit pins)") {
    def evalRg(x: Double, y: Double, z: Double): Double =
      Special.ellipRg(Seq((x, y, z)).toDF("x", "y", "z"),
        Seq(("t", col("x"), col("y"), col("z")))).head().getAs[Double]("rg_t")
    assert(math.abs(evalRg(0.1, 1.0, 3.0) - 1.1165237593061006) < 1e-13)
    assert(math.abs(evalRg(2.0, 3.5, 3.0) - 1.6790174519767776) < 1e-13)
    assert(math.abs(evalRg(6.35, 13.5, 3.0) - 2.7133585929820444) < 1e-13)
    // R_G(x,x,x) = √x
    assert(math.abs(evalRg(1.0, 1.0, 1.0) - 1.0) < 1e-14)
  }

  test("hyperu matches mpmath across the windowed domain") {
    def evalU(a: Double, b: Double, z: Double): Double =
      Seq((a, b, z)).toDF("a", "b", "z")
        .select(Special.hyperu(col("a"), col("b"), col("z")).as("u"))
        .head().getDouble(0)
    assert(math.abs(evalU(0.5625, 0.3, 0.5625) - 0.8162696482483564) < 1e-11)
    assert(math.abs(evalU(1.5, 0.5, 2.0) - 0.15110326938313497) < 1e-11)
    // the worst canceling pair in the pinned window (terms ~±1.2e3)
    assert(math.abs(evalU(3.625, 0.7, 3.625) - 0.0010719190642799835) < 1e-11)
    assert(math.abs(evalU(2.0, 0.3, 1.0) - 0.12481052441395322) < 1e-11)
  }

  test("ellipHarm: every closed form solves the Lamé ODE (constant eigenvalue)") {
    // the defining property: (s²−h²)(s²−k²)E'' + s(2s²−h²−k²)E' +
    // (λ − n(n+1)s²)E = 0 with λ CONSTANT in s — checked by finite
    // differences at three points per (n,p); convention-independent.
    val h2 = 1.2; val k2 = 2.9; val d = 1e-5
    val pts = Seq(1.9, 2.4, 3.1)
    val ss = pts.flatMap(s => Seq(s - d, s, s + d))
    val lamAt = collection.mutable.Map.empty[(Int, Int), Double]
    for ((n, p) <- Seq((1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (2, 4), (2, 5),
        (3, 1), (3, 2), (3, 3), (3, 4), (3, 5), (3, 6), (3, 7)) ++
        (1 to 9).map(p => (4, p)) ++ (1 to 11).map(p => (5, p))) {
      val vals = ss.toDF("s")
        .select(col("s"),
          Special.ellipHarm(lit(h2), lit(k2), n, p, col("s")).as("e"))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val lams = pts.map { s =>
        val e0 = vals(s); val ep = vals(s + d); val em = vals(s - d)
        val d1 = (ep - em) / (2 * d); val d2 = (ep - 2 * e0 + em) / (d * d)
        -((s * s - h2) * (s * s - k2) * d2 +
          s * (2 * s * s - h2 - k2) * d1) / e0 + n * (n + 1) * s * s
      }
      assert(math.abs(lams(0) - lams(1)) < 1e-2 &&
        math.abs(lams(1) - lams(2)) < 1e-2, s"(n=$n,p=$p) λ=$lams")
      lamAt((n, p)) = lams(1)
    }
    // n=5 convention: λ ascends WITHIN each class (K p1-3, L p4-6,
    // M p7-9, N p10-11) — the lame5 root-pick order
    for (cls <- Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7, 8, 9), Seq(10, 11)))
      for (Seq(a, b) <- cls.sliding(2))
        assert(lamAt((5, a)) < lamAt((5, b)),
          s"n=5 class order: λ(p=$a)=${lamAt((5, a))} !< λ(p=$b)=${lamAt((5, b))}")
    // scipy convention spot values: E¹₁(s) = s; E⁵₂ = √((s²−h²)(s²−k²))
    assert(eval1(Special.ellipHarm(lit(h2), lit(k2), 1, 1, _), 2.5) == 2.5)
    assert(math.abs(eval1(Special.ellipHarm(lit(h2), lit(k2), 2, 5, _), 2.5)
      - math.sqrt((6.25 - h2) * (6.25 - k2))) < 1e-14)
  }

  test("hyp2f1Far: Pfaff overlap agreement + exact Euler identity deep in the tail") {
    def ext(a: Double, b: Double, c: Double, z: Double): Double =
      Seq(z).toDF("z")
        .select(Special.hyp2f1Ext(lit(a), lit(b), lit(c), col("z")).as("f"))
        .head().getDouble(0)
    def far(a: Double, b: Double, c: Double, z: Double): Double =
      Seq(z).toDF("z")
        .select(Special.hyp2f1Far(lit(a), lit(b), lit(c), col("z")).as("f"))
        .head().getDouble(0)
    // overlap z ∈ (−7/3, −1.5]: the Pfaff branch (via Ext) and the 1/z
    // connection are INDEPENDENT formulas — agreement certifies both
    for ((a, b, c) <- Seq((0.4, 0.9, 2.3), (1.2, 1.85, 3.1), (0.3, 0.95, 1.4));
        z <- Seq(-1.6, -2.0, -2.3)) {
      val p = ext(a, b, c, z)
      val f = far(a, b, c, z)
      assert(math.abs(p - f) <= 1e-10 * math.max(1.0, math.abs(p)),
        s"overlap ($a,$b,$c,$z): pfaff=$p far=$f")
    }
    // Euler identity F(a,b;c;z) = (1−z)^(c−a−b) F(c−a,c−b;c;z) — exact
    // for every z; both sides run the far branch with DIFFERENT
    // parameters, so implementation errors cannot cancel
    for ((a, b, c) <- Seq((0.4, 0.9, 2.3), (1.2, 1.85, 3.1));
        z <- Seq(-10.0, -50.0, -500.0)) {
      val l = ext(a, b, c, z)
      val r = math.pow(1.0 - z, c - a - b) * ext(c - b, c - a, c, z)
      assert(math.abs(l - r) <= 1e-9 * math.max(math.abs(l), 1e-12),
        s"euler ($a,$b,$c,$z): $l vs $r")
    }
  }

  test("hyp1f1Ext: independent-branch agreement at the ±40 seams, series interior") {
    def ext(a: Double, b: Double, x: Double): Double =
      Seq(x).toDF("x")
        .select(Special.hyp1f1Ext(lit(a), lit(b), col("x")).as("f"))
        .head().getDouble(0)
    for ((a, b) <- Seq((0.7, 1.9), (1.3, 2.6), (0.4, 1.1))) {
      // interior: Ext == the guarded series on the classic window
      for (x <- Seq(-15.0, 3.0, 18.0)) {
        val direct = Seq(x).toDF("x")
          .select(Special.hyp1f1(lit(a), lit(b), col("x")).as("f"))
          .head().getDouble(0)
        assert(ext(a, b, x) == direct, s"interior ($a,$b,$x)")
      }
      // depth-400 test-side reference (independent of the depth-80 /
      // 16-term implementation truncations); exact for x > 0 (no
      // cancellation) and for x < 0 through the Kummer reflection
      def ref(x: Double): Double = {
        def ser(aa: Double, bb: Double, xx: Double): Double = {
          var s = 1.0; var t = 1.0
          for (k <- 0 until 400) {
            t *= (aa + k) / ((bb + k) * (k + 1)) * xx
            s += t
          }
          s
        }
        if (x >= 0) ser(a, b, x) else math.exp(x) * ser(b - a, b, -x)
      }
      // both sides of every seam against the reference: the wide
      // series, the Kummer reflection and the two asymptotic branches
      // are separately validated at the SAME x (M grows ~eˣ, so
      // adjacent-x comparisons would just measure the growth)
      for (x <- Seq(39.9, 40.1, 55.0, -19.9, -20.1, -39.9, -40.1, -55.0)) {
        val g = ext(a, b, x)
        val r = ref(x)
        // 1e-7·max(|r|, 1e-4): the direct alternating series loses ~8
        // digits near x = −20 (the classic window's own cancellation —
        // why the Kummer reflection takes over beyond it); all other
        // branches sit at ≤ 1e-10
        assert(math.abs(g - r) <= 1e-7 * math.max(math.abs(r), 1e-4),
          s"($a,$b,$x): got $g want $r")
      }
    }
  }

  test("ellipHarm2 matches adaptive mpmath quadrature at machine precision") {
    val h2 = lit(1.2); val k2 = lit(2.9)
    def evalF(n: Int, p: Int, s: Double): Double =
      Seq(s).toDF("s")
        .select(Special.ellipHarm2(h2, k2, n, p, col("s")).as("f"))
        .head().getDouble(0)
    // mpmath mp.dps=30 quad references at h²=1.2, k²=2.9
    assert(math.abs(evalF(3, 1, 2.0) - 0.18492454545709507) < 1e-12)
    assert(math.abs(evalF(3, 7, 3.0) - 0.017457153572234129) < 1e-12)
    assert(math.abs(evalF(0, 1, 2.0) - 0.639247998184384) < 1e-12)
    assert(math.abs(evalF(1, 1, 2.0) - 0.388325276952766) < 1e-12)
    assert(math.abs(evalF(1, 1, 3.0) - 0.12969486321545) < 1e-12)
    assert(math.abs(evalF(1, 2, 2.0) - 0.407992426221198) < 1e-12)
    assert(math.abs(evalF(2, 1, 2.0) - 0.305566720622753) < 1e-12)
    assert(math.abs(evalF(2, 5, 3.0) - 0.0498962731731743) < 1e-12)
  }

  test("ellipNormal recovers 4π at n=0 and the quadrature table values") {
    val h2 = lit(1.2); val k2 = lit(2.9)
    def evalG(n: Int, p: Int): Double =
      Seq(1).toDF("one")
        .select(Special.ellipNormal(h2, k2, n, p).as("g"))
        .head().getDouble(0)
    // γ¹₀ = surface measure of the unit sphere factor = 4π exactly
    assert(math.abs(evalG(0, 1) - 4.0 * math.Pi) < 1e-12)
    // GL-16 table values (GL-32 agreement ≤ 3.4e-14 in the derivation)
    assert(math.abs(evalG(1, 1) - 14.5769899126566) < 1e-11)
    assert(math.abs(evalG(1, 2) - 8.54513201776424) < 1e-11)
    assert(math.abs(evalG(2, 1) - 13.0260880394513) < 1e-11)
    assert(math.abs(evalG(2, 5) - 8.42550016951555) < 1e-11)
    // the two even Niven polynomials are orthogonal under this measure:
    // replaying the A·D − B·C factorization with mixed p,q must vanish —
    // covered here by the sum rule γ(p) > 0 for all nine branches
    for ((n, p) <- Seq((1, 3), (2, 2), (2, 3), (2, 4)))
      assert(evalG(n, p) > 0.0, s"γ must be positive at (n=$n,p=$p)")
    // n=3: the quadrature harness value for the N class + positivity
    assert(math.abs(evalG(3, 7) - 4.188677227130583) < 1e-11)
    for (p <- 1 to 6)
      assert(evalG(3, p) > 0.0, s"γ must be positive at (n=3,p=$p)")
  }

  test("hyp2f1Ext continues to negative z via Pfaff (mpmath pins)") {
    def f(a: Double, b: Double, c: Double, z: Double): Double =
      Seq((a, b, c, z)).toDF("a", "b", "c", "z")
        .select(Special.hyp2f1Ext(col("a"), col("b"), col("c"), col("z"))
          .as("f")).head().getDouble(0)
    assert(math.abs(f(0.5, 0.8, 1.7, -2.0) - 0.7470082592959453) < 1e-11)
    assert(math.abs(f(0.3, 1.55, 2.0, -0.5) - 0.9078826146813832) < 1e-12)
    assert(math.abs(f(0.7, 0.25, 1.5, -2.2) - 0.855038128323432) < 1e-11)
    // positive branch still rides the direct series
    assert(math.abs(f(0.5, 0.8, 1.7, 0.5) - 1.1617016738618607) < 1e-12)
    // z < −7/3 now rides the 15.8.2 far branch (r13 — this line pinned
    // the old de-scope as NaN): cross-checked by the exact Euler
    // identity computed through a DIFFERENT far-branch parameterization
    val l5 = f(0.5, 0.8, 1.7, -5.0)
    val r5 = math.pow(6.0, 1.7 - 0.5 - 0.8) * f(0.9, 1.2, 1.7, -5.0)
    assert(!l5.isNaN && math.abs(l5 - r5) <= 1e-9 * math.abs(l5),
      s"far branch euler: $l5 vs $r5")
    // z → 1 endpoint connection branch (δ = c−a−b ∈ (0,1) contract)
    assert(math.abs(f(0.3, 0.5, 1.2000000000000002, 0.9)
      - 1.238315611518488) < 1e-10)
    assert(math.abs(f(0.7, 1.0, 2.1, 0.75) - 1.4739383351420814) < 1e-10)
    assert(math.abs(f(0.5, 0.22, 1.12, 0.97) - 1.2441124474099013) < 1e-10)
    assert(math.abs(f(0.3, 0.9, 1.6, 0.8) - 1.2512649654964417) < 1e-10)
  }

  test("half-integer Bessel matches mpmath besselj/y/i/k at nu = k+1/2") {
    assert(math.abs(eval1(Special.besselJHalf(0, _), 2.0)
      - 0.5130161365618278) < 1e-12)
    assert(math.abs(eval1(Special.besselJHalf(2, _), 3.0)
      - 0.412710032209716) < 1e-12)
    assert(math.abs(eval1(Special.besselJHalf(3, _), 5.0)
      - 0.4100285072560581) < 1e-12)
    assert(math.abs(eval1(Special.besselYHalf(0, _), 2.0)
      - 0.23478571040624847) < 1e-12)
    assert(math.abs(eval1(Special.besselYHalf(2, _), 3.0)
      - (-0.3690407300737979)) < 1e-12)
    assert(math.abs(eval1(Special.besselIHalf(0, _), 1.5)
      - 1.3871617204034779) < 1e-12)
    assert(math.abs(eval1(Special.besselIHalf(2, _), 2.0)
      - 0.3970270801393905) < 1e-12)
    assert(math.abs(eval1(Special.besselKHalf(0, _), 2.0)
      - 0.11993777196806145) < 1e-13)
    assert(math.abs(eval1(Special.besselKHalf(3, _), 2.0)
      - 1.1544010551925914) < 1e-12)
  }

  test("general real-order Bessel (0F1 form) matches mpmath") {
    def ev(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
        v: Double, x: Double): Double = eval2(f, v, x)
    assert(math.abs(ev(Special.besselJv, 0.3, 2.0) - 0.4256940619814137) < 1e-12)
    assert(math.abs(ev(Special.besselJv, 1.7, 3.0) - 0.494432522734784) < 1e-12)
    assert(math.abs(ev(Special.besselJv, 2.3, 6.0) - (-0.14674320358582448)) < 1e-11)
    assert(math.abs(ev(Special.besselYv, 0.3, 2.0) - 0.3634828078260922) < 1e-12)
    assert(math.abs(ev(Special.besselYv, 0.7, 4.0) - 0.3362939155224755) < 1e-12)
    assert(math.abs(ev(Special.besselIv, 2.3, 2.5) - 0.9765383029124093) < 1e-12)
    assert(math.abs(ev(Special.besselIv, 0.3, 1.0) - 1.0887949490168029) < 1e-12)
    assert(math.abs(ev(Special.besselKv, 0.3, 2.0) - 0.11603697434811926) < 1e-12)
    assert(math.abs(ev(Special.besselKv, 0.7, 3.0) - 0.037302582431968067) < 1e-12)
    // the 0F1 form agrees with the spherical seeds at nu = 1/2
    assert(math.abs(ev(Special.besselJv, 0.5, 2.0)
      - eval1(Special.besselJHalf(0, _), 2.0)) < 1e-14)
    // real-order Hankel compositions (mpmath hankel1/hankel2 pins)
    assert(math.abs(ev(Special.hankel1vRe, 0.3, 2.0) - 0.4256940619814137) < 1e-12)
    assert(math.abs(ev(Special.hankel1vIm, 0.3, 2.0) - 0.3634828078260922) < 1e-12)
    assert(math.abs(ev(Special.hankel1veRe, 0.3, 2.0) - 0.15336274462117095) < 1e-12)
    assert(math.abs(ev(Special.hankel1veIm, 0.3, 2.0) - (-0.5383447357907729)) < 1e-12)
    assert(math.abs(ev(Special.hankel2vRe, 0.7, 3.0) - 0.18788671346939385) < 1e-12)
    assert(math.abs(ev(Special.hankel2vIm, 0.7, 3.0) - (-0.4236024261472224)) < 1e-12)
  }

  test("special columns stay inside whole-stage codegen (no UDFs)") {
    val df = Seq(1.0, 2.5).toDF("x")
      .select(Special.gamma(col("x")).as("g"), Special.erf(col("x")).as("e"),
        Special.digamma(col("x")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
      plan.take(400))
  }
}
