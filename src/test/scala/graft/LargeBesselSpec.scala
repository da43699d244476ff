package graft

import org.apache.spark.sql.functions._
import graft.functions.Special

/** Accuracy pins for the large real-order Bessel machinery
  * (Special.bessel{Jv,Yv,Ive,Kve}LargeStaged) via EXACT mathematics —
  * no external reference tables:
  *
  *  - closed-form half-integer seeds (ν = ±1/2 are elementary trig /
  *    exp) advanced by the STABLE-direction double recurrences give
  *    independent ν = 10.5 references;
  *  - the Wronskians J_{ν+1}Y_ν − J_νY_{ν+1} = 2/(πx) and
  *    ive_ν·kve_{ν+1} + ive_{ν+1}·kve_ν = 1/x are exact identities that
  *    fail if EITHER member drifts — they certify non-half-integer
  *    orders where no closed form exists.
  *
  * The DuckDB mirror equality is the op_special_bessel_large* gates'
  * job; this spec pins the MATH.
  */
class LargeBesselSpec extends SparkSpecBase {
  import spark.implicits._

  private def amp(x: Double) = math.sqrt(2.0 / (math.Pi * x))

  /** Y_{k+0.5}(x) from the elementary ν = ∓1/2 seeds, upward (stable
    * for Y at every x). */
  private def yHalfRef(k: Int, x: Double): Double = {
    var prev = amp(x) * math.sin(x) // Y_{-1/2}
    var cur = -amp(x) * math.cos(x) // Y_{1/2}
    for (m <- 0 until k) {
      val next = 2.0 * (m + 0.5) / x * cur - prev
      prev = cur; cur = next
    }
    cur
  }

  /** kve_{k+0.5}(x) = K_{k+0.5}(x)·e^x from kve_{±1/2} = √(π/2x),
    * upward (stable). */
  private def kveHalfRef(k: Int, x: Double): Double = {
    val seed = math.sqrt(math.Pi / (2.0 * x))
    var prev = seed // kve_{-1/2} = kve_{1/2}
    var cur = seed
    for (m <- 0 until k) {
      val next = prev + 2.0 * (m + 0.5) / x * cur
      prev = cur; cur = next
    }
    cur
  }

  /** J_{k+0.5}(x) by a test-side Miller at pad 55 (independent of the
    * implementation's 25), normalized by the elementary J_{1/2}. */
  private def jHalfRefMiller(k: Int, x: Double): Double = {
    val M = k + 55
    var gp = 0.0; var gc = 1.0
    var gk = 0.0; var g0 = 0.0
    for (m <- M to 1 by -1) {
      val next = 2.0 * (m + 0.5) / x * gc - gp
      gp = gc; gc = next
      if (m - 1 == k) gk = gc
      if (m - 1 == 0) g0 = gc
    }
    val j0 = amp(x) * math.sin(x) // J_{1/2}
    gk * (j0 / g0)
  }

  /** ive_{k+0.5}(x) by test-side Miller (pad 55) normalized by the
    * elementary ive_{1/2} = √(2/πx)(1−e^{−2x})/2. */
  private def iveHalfRefMiller(k: Int, x: Double): Double = {
    val M = k + 55
    var gp = 0.0; var gc = 1.0
    var gk = 0.0; var g0 = 0.0
    for (m <- M to 1 by -1) {
      val next = gp + 2.0 * (m + 0.5) / x * gc
      gp = gc; gc = next
      if (m - 1 == k) gk = gc
      if (m - 1 == 0) g0 = gc
    }
    val ive0 = amp(x) * (1.0 - math.exp(-2.0 * x)) / 2.0
    gk * (ive0 / g0)
  }

  /** J_{k+0.5}(x) upward from the elementary seeds — stable only when
    * x comfortably exceeds every order crossed. */
  private def jHalfRefUp(k: Int, x: Double): Double = {
    var prev = amp(x) * math.cos(x) // J_{-1/2}
    var cur = amp(x) * math.sin(x) // J_{1/2}
    for (m <- 0 until k) {
      val next = 2.0 * (m + 0.5) / x * cur - prev
      prev = cur; cur = next
    }
    cur
  }

  private def staged(k: Int, f: Double, xs: Seq[Double],
      which: String): Map[Double, Double] = {
    val df = xs.map(x => (x, f)).toDF("x", "f")
    val out = which match {
      case "y" => Special.besselYvLargeStaged(df, k, $"f", $"x", "v")
      case "kve" => Special.besselKveLargeStaged(df, k, $"f", $"x", "v")
      case "j" => Special.besselJvLargeStaged(df, k, $"f", $"x", "v")
      case "ive" => Special.besselIveLargeStaged(df, k, $"f", $"x", "v")
    }
    out.select($"x", $"v").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
  }

  test("half-integer ν = 10.5 cross-checks against elementary-seed references") {
    val xs = Seq(2.0, 5.0, 12.0, 30.0)
    val y = staged(10, 0.5, xs, "y")
    val kv = staged(10, 0.5, xs, "kve")
    val j = staged(10, 0.5, xs, "j")
    val iv = staged(10, 0.5, xs, "ive")
    for (x <- xs) {
      val yr = yHalfRef(10, x)
      assert(math.abs(y(x) - yr) <= 1e-8 * math.max(1.0, math.abs(yr)),
        s"Y_10.5($x): got ${y(x)} want $yr")
      val kr = kveHalfRef(10, x)
      assert(math.abs(kv(x) - kr) <= 1e-8 * math.abs(kr),
        s"kve_10.5($x): got ${kv(x)} want $kr")
      val jr = if (x >= 30.0) jHalfRefUp(10, x) else jHalfRefMiller(10, x)
      assert(math.abs(j(x) - jr) <= 1e-8 * math.max(math.abs(jr), 1e-6),
        s"J_10.5($x): got ${j(x)} want $jr")
      val ir = iveHalfRefMiller(10, x)
      assert(math.abs(iv(x) - ir) <= 1e-8 * math.abs(ir),
        s"ive_10.5($x): got ${iv(x)} want $ir")
    }
  }

  test("small-order agreement with the existing ≤6 half-integer family") {
    val xs = Seq(3.0, 7.0)
    val df = xs.map(x => (x, 0.5)).toDF("x", "f")
    val got = Special.besselJvLargeStaged(df, 3, $"f", $"x", "v")
      .select($"x", $"v", Special.besselJHalf(3, $"x").as("ref"))
      .collect()
    for (r <- got)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <=
        1e-9 * math.max(1.0, math.abs(r.getDouble(2))), r.toString)
  }

  test("exact Wronskians certify non-half-integer large orders on every branch") {
    // x grid straddles the series window (2, 6), the Miller band
    // (9.5, 20) and the oscillatory upward band (40)
    val xs = Seq(2.0, 6.0, 9.5, 20.0, 40.0)
    val f = 0.3
    val k = 12
    val jLo = staged(k, f, xs, "j")
    val jHi = staged(k + 1, f, xs, "j")
    val yLo = staged(k, f, xs, "y")
    val yHi = staged(k + 1, f, xs, "y")
    val iLo = staged(k, f, xs, "ive")
    val iHi = staged(k + 1, f, xs, "ive")
    val kLo = staged(k, f, xs, "kve")
    val kHi = staged(k + 1, f, xs, "kve")
    for (x <- xs) {
      val w = jHi(x) * yLo(x) - jLo(x) * yHi(x)
      val expect = 2.0 / (math.Pi * x)
      val scaleJy = math.abs(jHi(x) * yLo(x)) + math.abs(jLo(x) * yHi(x)) + expect
      assert(math.abs(w - expect) <= 1e-7 * scaleJy,
        s"J/Y Wronskian at x=$x: $w vs $expect (scale $scaleJy)")
      val wik = iLo(x) * kHi(x) + iHi(x) * kLo(x)
      assert(math.abs(wik - 1.0 / x) <= 1e-8 * (1.0 / x),
        s"ive/kve Wronskian at x=$x: $wik vs ${1.0 / x}")
    }
  }
}
