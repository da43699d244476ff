package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's elementwise ufunc surface (mars/dataframe/arithmetic/ —
  * one operand file per function: abs.py, arccos.py … tanh.py; same ops on
  * the tensor side) as a name → Column registry.
  *
  * Every entry is a codegen'd Catalyst builtin — the whole surface stays
  * inside whole-stage codegen with zero custom code. The registry exists so
  * callers can resolve the reference's ufunc names (`mt.arcsin`,
  * `df.radd` …) dynamically; direct `functions._` calls compile to the
  * identical plan.
  */
object Ufuncs {

  /** numpy frexp exponent (reference tensor/arithmetic/frexp.py):
    * x = m·2^e with 0.5 ≤ |m| < 1. e₀ = ⌊log2|x|⌋+1 can err by one ulp
    * of log2 near powers of two, so two exact power-of-two comparisons
    * correct it — pow(2, k) is exact for integer k, making e exact and
    * therefore ORACLE-ABLE (the same correction runs in SQL). 0, ±inf,
    * NaN → e = 0 (numpy). */
  private def frexpExp(c: Column): Column = {
    val x = abs(c.cast("double"))
    val e0 = floor(log2(x)).cast("long") + 1
    val eUp = when(x >= pow(lit(2.0), e0.cast("double")), e0 + 1)
      .otherwise(e0)
    val e = when(x < pow(lit(2.0), (eUp - 1).cast("double")), eUp - 1)
      .otherwise(eUp)
    when(c === 0.0 || isnan(c) ||
      abs(c) === lit(Double.PositiveInfinity), 0L).otherwise(e)
  }

  /** numpy frexp mantissa: x·2^(−e) — an exact scale by a power of two
    * (the result is normal for finite nonzero x, so no rounding). */
  private def frexpMant(c: Column): Column =
    c.cast("double") * pow(lit(2.0), (-frexpExp(c)).cast("double"))

  /** numpy modf integral part (reference tensor/arithmetic/modf.py):
    * truncation toward zero, exact IEEE (doubles ≥ 2^52 are already
    * integral, below that trunc is representable). */
  private def modfInt(c: Column): Column = {
    val x = c.cast("double")
    when(x < 0, ceil(x)).otherwise(floor(x)).cast("double")
  }

  /** numpy spacing (reference tensor/arithmetic/spacing.py): the ulp of
    * x on the away-from-zero side — sign(x)·2^(e−53) with e the exact
    * [[frexpExp]] exponent. A pure power of two, so the value is
    * ORACLE-ABLE (the SQL mirror replays the identical correction).
    * spacing(0) = the smallest subnormal (numpy); ±inf/NaN → NaN.
    * Normal-range inputs (no subnormals). */
  private def spacingCol(c: Column): Column = {
    val x = c.cast("double")
    val u = pow(lit(2.0), (frexpExp(x) - 53L).cast("double"))
    when(isnan(x) || abs(x) === lit(Double.PositiveInfinity), lit(Double.NaN))
      .when(x === 0.0, lit(java.lang.Double.MIN_VALUE))
      .when(x < 0, -u).otherwise(u)
  }

  /** numpy nextafter (reference tensor/arithmetic/nextafter.py): the
    * adjacent double from x toward y. The away-from-zero gap is
    * 2^(e−53); the toward-zero gap halves to 2^(e−54) exactly at binade
    * boundaries (|x| = 2^(e−1)). Both steps and the final add are exact
    * IEEE, so the result is bit-ORACLE-ABLE. Finite normal x (numpy's
    * inf/subnormal edges are outside the contract); NaN propagates;
    * x = 0 steps to ±MIN_VALUE. */
  private def nextafterCol(xc: Column, yc: Column): Column = {
    val x = xc.cast("double"); val y = yc.cast("double")
    val e = frexpExp(x)
    val away = pow(lit(2.0), (e - 53L).cast("double"))
    val toward = when(abs(x) === pow(lit(2.0), (e - 1L).cast("double")),
      pow(lit(2.0), (e - 54L).cast("double"))).otherwise(away)
    val step = when(x > 0, when(y > x, away).otherwise(-toward))
      .otherwise(when(y < x, -away).otherwise(toward))
    when(isnan(x) || isnan(y), lit(Double.NaN))
      .when(x === y, y)
      .when(x === 0.0, when(y > 0, lit(java.lang.Double.MIN_VALUE))
        .otherwise(lit(-java.lang.Double.MIN_VALUE)))
      .otherwise(x + step)
  }

  /** Unary ufuncs, keyed by the reference's numpy-style names. */
  val unary: Map[String, Column => Column] = Map(
    "frexp_exp" -> frexpExp _,
    "frexp_mant" -> frexpMant _,
    "spacing" -> spacingCol _,
    "modf_int" -> modfInt _,
    // fractional part keeps the sign of x for non-integral x; x −
    // trunc(x) is exact IEEE (Sterbenz: the operands are within a
    // factor of 2 once |x| ≥ 1, and below 1 the subtraction is exact
    // by construction). Known deviation: at negative INTEGRAL x
    // (e.g. −2.0) this yields +0.0 where numpy modf returns −0.0 —
    // gates mask it with the +0.0 convention anyway.
    "modf_frac" -> ((c: Column) => c.cast("double") - modfInt(c)),
    "abs" -> abs _,
    "negative" -> ((c: Column) => -c),
    "sqrt" -> sqrt _,
    "cbrt" -> cbrt _,
    "exp" -> exp _,
    "exp2" -> ((c: Column) => pow(lit(2.0), c)),
    "expm1" -> expm1 _,
    "log" -> ((c: Column) => log(c)),
    "log2" -> log2 _,
    "log10" -> log10 _,
    "log1p" -> log1p _,
    "sin" -> sin _,
    "cos" -> cos _,
    "tan" -> tan _,
    "arcsin" -> asin _,
    "arccos" -> acos _,
    "arctan" -> atan _,
    "sinh" -> sinh _,
    "cosh" -> cosh _,
    "tanh" -> tanh _,
    "arcsinh" -> asinh _,
    "arccosh" -> acosh _,
    "arctanh" -> atanh _,
    "degrees" -> degrees _,
    "radians" -> radians _,
    "ceil" -> ceil _,
    "floor" -> floor _,
    "around" -> ((c: Column) => round(c, 0)),
    "sign" -> signum _,
    "invert" -> bitwise_not _,
    "square" -> ((c: Column) => c * c),
    "reciprocal" -> ((c: Column) => lit(1.0) / c.cast("double")),
    "fabs" -> ((c: Column) => abs(c.cast("double"))),
    // numpy rint is round-half-to-EVEN (banker's) — Spark's rint builtin
    // matches; DuckDB's round() does not, so oracles probe non-tie values
    // and the tie semantics pin in UfuncsSpec
    "rint" -> rint _,
    // trunc/fix: round toward zero (numpy trunc.py / fix.py)
    "trunc" -> ((c: Column) => when(c < 0, ceil(c)).otherwise(floor(c)).cast("double")),
    "fix" -> ((c: Column) => when(c < 0, ceil(c)).otherwise(floor(c)).cast("double")),
    "signbit" -> ((c: Column) => c < 0),
    "positive" -> ((c: Column) => c),
    "deg2rad" -> radians _,
    "rad2deg" -> degrees _,
    // sinc: sin(πx)/(πx), removable singularity at 0 → 1 (numpy sinc.py)
    "sinc" -> ((c: Column) => {
      val x = c.cast("double")
      when(x === 0.0, 1.0)
        .otherwise(sin(lit(math.Pi) * x) / (lit(math.Pi) * x))
    }),
    "isnan" -> isnan _,
    "isinf" -> ((c: Column) =>
      abs(c.cast("double")) === lit(Double.PositiveInfinity)),
    "isfinite" -> ((c: Column) =>
      !isnan(c) && abs(c.cast("double")) =!= lit(Double.PositiveInfinity)),
    "nan_to_num" -> ((c: Column) => {
      val x = c.cast("double")
      when(isnan(x), 0.0)
        .when(x === lit(Double.PositiveInfinity), lit(Double.MaxValue))
        .when(x === lit(Double.NegativeInfinity), lit(Double.MinValue))
        .otherwise(x)
    }),
    "logical_not" -> ((c: Column) => !c),
    // scipy.special subset (mars/tensor/special) — see Special.scala;
    // all pure Column arithmetic, codegen'd like the rest of the table
    "gamma" -> Special.gamma _,
    "gammaln" -> Special.gammaln _,
    // scipy loggamma coincides with gammaln on the positive real axis
    // (the complex-plane branch structure is out of parity scope)
    "loggamma" -> Special.gammaln _,
    "it_airy_ai" -> Special.itAiryAi _,
    "it_airy_bi" -> Special.itAiryBi _,
    "gammasgn" -> Special.gammasgn _,
    "psi" -> Special.digamma _,
    "digamma" -> Special.digamma _,
    "trigamma" -> Special.trigamma _,
    "rgamma" -> Special.rgamma _,
    "erf" -> Special.erf _,
    "erfc" -> Special.erfc _,
    "erfinv" -> Special.erfinv _,
    "erfcinv" -> Special.erfcinv _,
    "entr" -> Special.entr _,
    "j0" -> Special.besselJ0 _,
    "j1" -> Special.besselJ1 _,
    "y0" -> Special.besselY0 _,
    "y1" -> Special.besselY1 _,
    "i0" -> Special.besselI0 _,
    "i1" -> Special.besselI1 _,
    "k0" -> Special.besselK0 _,
    "k1" -> Special.besselK1 _,
    "ellipk" -> Special.ellipk _,
    "ellipe" -> Special.ellipe _,
    "fresnel_c" -> Special.fresnelC _,
    "fresnel_s" -> Special.fresnelS _,
    "dawsn" -> Special.dawsn _,
    "erfi" -> Special.erfi _,
    "airy_ai" -> Special.airyAi _,
    "airy_aip" -> Special.airyAip _,
    "airy_bi" -> Special.airyBi _,
    "airy_bip" -> Special.airyBip _,
    "airye_ai" -> Special.airyeAi _,
    "airye_aip" -> Special.airyeAip _,
    "airye_bi" -> Special.airyeBi _,
    "airye_bip" -> Special.airyeBip _,
    "erfcx" -> Special.erfcx _)

  /** Binary ufuncs (add/sub/mul/div are native Column operators already). */
  val binary: Map[String, (Column, Column) => Column] = Map(
    "add" -> (_ + _),
    "subtract" -> (_ - _),
    "multiply" -> (_ * _),
    "truediv" -> (_ / _),
    // float semantics (numpy float //): floor of the double quotient
    "floordiv" -> ((a, b) => floor(a.cast("double") / b.cast("double")).cast("long")),
    // exact integral semantics: (a - pmod(a, b)) is b·⌊a/b⌋ exactly, and
    // the decimal division stays exact past 2^53 where the double path
    // would round the quotient
    "floordiv_int" -> ((a, b) =>
      ((a.cast("decimal(38,0)") - pmod(a, b).cast("decimal(38,0)")) /
        b.cast("decimal(38,0)")).cast("long")),
    "mod" -> (_ % _),
    "power" -> (pow(_, _)),
    "arctan2" -> (atan2(_, _)),
    "bitwise_and" -> (_ bitwiseAND _),
    "bitwise_or" -> (_ bitwiseOR _),
    "bitwise_xor" -> (_ bitwiseXOR _),
    "equal" -> (_ === _),
    "not_equal" -> (_ =!= _),
    "less" -> (_ < _),
    "less_equal" -> (_ <= _),
    "greater" -> (_ > _),
    "greater_equal" -> (_ >= _),
    // maximum/minimum and the f-variants map to greatest/least (numpy's
    // NaN-propagating vs NaN-skipping split collapses: Spark orders NaN
    // above every double, and the fixtures carry none)
    "maximum" -> (greatest(_, _)),
    "minimum" -> (least(_, _)),
    "fmax" -> (greatest(_, _)),
    "fmin" -> (least(_, _)),
    "hypot" -> (hypot(_, _)),
    // overflow-stable log(exp(a)+exp(b)): max + log1p(exp(−|a−b|))
    "logaddexp" -> ((a, b) => {
      val x = a.cast("double"); val y = b.cast("double")
      greatest(x, y) + log1p(exp(-abs(x - y)))
    }),
    "logaddexp2" -> ((a, b) => {
      val x = a.cast("double"); val y = b.cast("double")
      greatest(x, y) + log2(lit(1.0) + pow(lit(2.0), -abs(x - y)))
    }),
    // magnitude of a, sign of b (the ±0 b edge follows b < 0, not the
    // sign bit — numpy's copysign(-0.0) distinction needs bit access)
    "copysign" -> ((a, b) =>
      when(b < 0, -abs(a.cast("double"))).otherwise(abs(a.cast("double")))),
    // C fmod (sign of the dividend) — Spark's % on doubles already is
    "fmod" -> (_ % _),
    "float_power" -> ((a, b) => pow(a.cast("double"), b.cast("double"))),
    "lshift" -> ((a, b) => call_function("shiftleft", a, b.cast("int"))),
    "rshift" -> ((a, b) => call_function("shiftright", a, b.cast("int"))),
    // numpy's canonical names for the shifts (tensor/arithmetic/
    // left_shift.py, right_shift.py)
    "left_shift" -> ((a, b) => call_function("shiftleft", a, b.cast("int"))),
    "right_shift" -> ((a, b) => call_function("shiftright", a, b.cast("int"))),
    "logical_and" -> (_ && _),
    "logical_or" -> (_ || _),
    "logical_xor" -> ((a, b) => a =!= b),
    // numpy isclose default tolerances: |a−b| ≤ atol + rtol·|b|
    "isclose" -> ((a, b) =>
      abs(a.cast("double") - b.cast("double")) <=
        lit(1e-8) + lit(1e-5) * abs(b.cast("double"))),
    // numpy ldexp (reference tensor/arithmetic/ldexp.py): m·2^e.
    // pow(2, e) is exact for integer e in double range, so the multiply
    // is the IEEE scalb — overflow → inf, underflow → 0, like numpy.
    "ldexp" -> ((m, e) =>
      m.cast("double") * pow(lit(2.0), e.cast("long").cast("double"))),
    "nextafter" -> nextafterCol _,
    // numpy iscomplex/isreal (tensor/check/iscomplex.py, isreal.py)
    // over the engine's (re, im) complex-pair representation (Fft.scala):
    // complex ⇔ nonzero imaginary part. Real-typed columns are
    // isreal=true / iscomplex=false by construction (numpy's rule for
    // real dtypes).
    "iscomplex" -> ((_, im) => im.cast("double") =!= 0.0),
    "isreal" -> ((_, im) => im.cast("double") === 0.0),
    // scipy.special binaries (Special.scala)
    "beta" -> (Special.beta(_, _)),
    "betaln" -> (Special.betaln(_, _)),
    "rel_entr" -> (Special.relEntr(_, _)),
    "kl_div" -> (Special.klDiv(_, _)),
    "xlogy" -> (Special.xlogy(_, _)),
    "xlog1py" -> (Special.xlog1py(_, _)),
    "gammainc" -> (Special.gammaincP(_, _)),
    "gammaincc" -> (Special.gammaincQ(_, _)),
    "hyp0f1" -> (Special.hyp0f1(_, _)),
    "poch" -> (Special.poch(_, _)))

  def apply(name: String)(c: Column): Column =
    unary.getOrElse(name,
      throw new IllegalArgumentException(s"unknown unary ufunc: $name"))(c)

  def apply(name: String, a: Column, b: Column): Column =
    binary.getOrElse(name,
      throw new IllegalArgumentException(s"unknown binary ufunc: $name"))(a, b)
}
