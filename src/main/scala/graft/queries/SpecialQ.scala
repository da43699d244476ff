package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._

/** Round-11 special-function coverage closing the remaining scipy
  * surface (reference mars/tensor/special): integer-order Bessel
  * jn/yn/kn via three-term recurrences, exponentially scaled
  * ive/kve/airye, erfcx, ₀F₁ — plus (below) the Carlson symmetric
  * elliptic forms, incomplete elliptic integrals, and the inverse
  * regularized incomplete gamma/beta. Every query mirrors the exact
  * operation shape into DuckDB SQL (Special.sql*), so libm enters only
  * via exp/ln/sqrt/sin/cos of identical inputs → round 6 with the
  * signed-zero +0.0 guard on oscillatory outputs.
  */
object SpecialQ {

  val all: Vector[Q] = Vector(

    // --- integer-order Bessel (bessel.py jv/yn/kn at n = 2, 3):
    //     upward recurrences from the A&S order-0/1 kernels, identical
    //     shape both sides. xj = q/4 + 2 keeps the upward J direction
    //     well-conditioned (x ≳ n); xp = q/4 > 0 serves Y/K; xi2 =
    //     q/8 + 0.5 avoids the worst I₂ cancellation near 0.
    Q("op_special_bessel2", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlBesselJn(2, "xj")}, 6) + CAST(0.0 AS DOUBLE) AS b_j2,
         |  round(${S.sqlBesselJn(3, "xj")}, 6) + CAST(0.0 AS DOUBLE) AS b_j3,
         |  round(${S.sqlBesselYn(2, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_y2,
         |  round(${S.sqlBesselYn(3, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_y3,
         |  round(${S.sqlBesselIn(2, "xi2")}, 6) + CAST(0.0 AS DOUBLE) AS b_i2,
         |  round(${S.sqlBesselKn(2, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_k2,
         |  round(${S.sqlBesselKn(3, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_k3,
         |  round(${S.sqlBesselIve(1, "xs")}, 6) + CAST(0.0 AS DOUBLE) AS b_ive1,
         |  round(${S.sqlBesselKve(2, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_kve2
         |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 4.0 + 2.0 AS xj,
         |        CAST(l_quantity AS DOUBLE) / 4.0 AS xp,
         |        CAST(l_quantity AS DOUBLE) / 8.0 + 0.5 AS xi2,
         |        (CAST(l_quantity AS DOUBLE) - 25.0) / 4.0 AS xs
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 4.0 + 2.0).as("xj"),
          ($"l_quantity".cast("double") / 4.0).as("xp"),
          ($"l_quantity".cast("double") / 8.0 + 0.5).as("xi2"),
          (($"l_quantity".cast("double") - 25.0) / 4.0).as("xs"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.besselJn(2, $"xj")).as("b_j2"),
          r6(Special.besselJn(3, $"xj")).as("b_j3"),
          r6(Special.besselYn(2, $"xp")).as("b_y2"),
          r6(Special.besselYn(3, $"xp")).as("b_y3"),
          r6(Special.besselIn(2, $"xi2")).as("b_i2"),
          r6(Special.besselKn(2, $"xp")).as("b_k2"),
          r6(Special.besselKn(3, $"xp")).as("b_k3"),
          r6(Special.besselIve(1, $"xs")).as("b_ive1"),
          r6(Special.besselKve(2, $"xp")).as("b_kve2"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- exponentially scaled Airy (airy.py airye), erfcx
    //     (err_fresnel.py), ₀F₁ (hypergeometric_funcs.py hyp0f1):
    //     airye over both the scaled (x > 0) and pass-through (x < 0)
    //     branches inside the |x| ≤ 6 series window; erfcx sweeps the
    //     composition branch, the continued fraction (x ≥ 2.5), and
    //     the negative reflection on a bounded range (xen ∈ [−2, 0)
    //     keeps 2e^{x²} ≤ 109 so round-6 stays above ulp noise); ₀F₁
    //     with b = q/10 + 0.5 and x = (q − 25)/2 ∈ [−12, 12.5].
    Q("op_special_scaled", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlAiryeAi("xa")}, 6) + CAST(0.0 AS DOUBLE) AS e_ai,
         |  round(${S.sqlAiryeAip("xa")}, 6) + CAST(0.0 AS DOUBLE) AS e_aip,
         |  round(${S.sqlAiryeBi("xa")}, 6) + CAST(0.0 AS DOUBLE) AS e_bi,
         |  round(${S.sqlAiryeBip("xa")}, 6) + CAST(0.0 AS DOUBLE) AS e_bip,
         |  round(${S.sqlAiryeAi("xan")}, 6) + CAST(0.0 AS DOUBLE) AS e_ai_neg,
         |  round(${S.sqlErfcx("xep")}, 6) + CAST(0.0 AS DOUBLE) AS e_erfcx,
         |  round(${S.sqlErfcx("xen")}, 6) + CAST(0.0 AS DOUBLE) AS e_erfcx_neg,
         |  round(${S.sqlHyp0f1("hb", "hx")}, 6) + CAST(0.0 AS DOUBLE) AS e_0f1
         |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 10.0 AS xa,
         |        -CAST(l_quantity AS DOUBLE) / 10.0 AS xan,
         |        CAST(l_quantity AS DOUBLE) / 4.0 AS xep,
         |        -CAST(l_quantity AS DOUBLE) / 25.0 AS xen,
         |        CAST(l_quantity AS DOUBLE) / 10.0 + 0.5 AS hb,
         |        (CAST(l_quantity AS DOUBLE) - 25.0) / 2.0 AS hx
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 10.0).as("xa"),
          (-$"l_quantity".cast("double") / 10.0).as("xan"),
          ($"l_quantity".cast("double") / 4.0).as("xep"),
          (-$"l_quantity".cast("double") / 25.0).as("xen"),
          ($"l_quantity".cast("double") / 10.0 + 0.5).as("hb"),
          (($"l_quantity".cast("double") - 25.0) / 2.0).as("hx"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Ufuncs("airye_ai")($"xa")).as("e_ai"),
          r6(Ufuncs("airye_aip")($"xa")).as("e_aip"),
          r6(Ufuncs("airye_bi")($"xa")).as("e_bi"),
          r6(Ufuncs("airye_bip")($"xa")).as("e_bip"),
          r6(Ufuncs("airye_ai")($"xan")).as("e_ai_neg"),
          r6(Ufuncs("erfcx")($"xep")).as("e_erfcx"),
          r6(Ufuncs("erfcx")($"xen")).as("e_erfcx_neg"),
          r6(Ufuncs("hyp0f1", $"hb", $"hx")).as("e_0f1"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- Carlson symmetric elliptic integrals R_F/R_D/R_J/R_C
    //     (ellip_func_integrals.py elliprf/elliprd/elliprj/elliprc):
    //     28 staged duplication steps, identical on both sides. R_F and
    //     R_D are pure IEEE +·/√ → compared UNROUNDED (bit-exact, the
    //     strongest gate form); R_C's closed form and R_J's per-step
    //     R_C terms bring atan/ln of identical inputs → round 6. The
    //     R_C argument pair crosses its atan/atanh branch as q sweeps.
    Q("op_special_carlson", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 8.0 + 0.1 AS x1, " +
        "CAST(l_quantity AS DOUBLE) / 4.0 + 1.0 AS y1, " +
        "CAST(3.0 AS DOUBLE) AS z1, " +
        "CAST(l_quantity AS DOUBLE) / 10.0 + 0.5 AS p1, " +
        "CAST(l_quantity AS DOUBLE) / 8.0 + 0.2 AS rcx, " +
        "CAST(l_quantity AS DOUBLE) / 5.0 + 0.1 AS rcy " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val fd = S.sqlCarlsonFD(inner, Seq(("a", "x1", "y1", "z1", true)),
        Seq("l_orderkey", "l_linenumber", "q", "x1", "y1", "z1", "p1",
          "rcx", "rcy"))
      val rj = S.sqlCarlsonRJ(s"($fd)", Seq(("a", "x1", "y1", "z1", "p1")),
        Seq("l_orderkey", "l_linenumber", "q", "rcx", "rcy", "rf_a", "rd_a"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  rf_a, rd_a,
         |  round(rj_a, 6) AS rj,
         |  round(${S.sqlEllipRc("rcx", "rcy")}, 6) AS rc
         |FROM ($rj)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 8.0 + 0.1).as("x1"),
          ($"l_quantity".cast("double") / 4.0 + 1.0).as("y1"),
          lit(3.0).as("z1"),
          ($"l_quantity".cast("double") / 10.0 + 0.5).as("p1"),
          ($"l_quantity".cast("double") / 8.0 + 0.2).as("rcx"),
          ($"l_quantity".cast("double") / 5.0 + 0.1).as("rcy"))
      val fd = Special.carlsonFDFast(base, Seq(("a", $"x1", $"y1", $"z1", true)))
      val rj = Special.carlsonRJFast(fd, Seq(("a", $"x1", $"y1", $"z1", $"p1")))
      rj.select($"l_orderkey", $"l_linenumber", $"q",
        $"rf_a", $"rd_a",
        round($"rj_a", 6).as("rj"),
        round(Special.ellipRcFast(spark, $"rcx", $"rcy"), 6).as("rc"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- incomplete elliptic integrals F(φ|m) / E(φ|m) + ellipkm1
    //     (ellip_func_integrals.py ellipkinc/ellipeinc/ellipkm1):
    //     the DLMF R_F/R_D reductions over the shared staged
    //     duplication — sin/cos enter (libm, identical inputs) →
    //     round 6; ellipkm1 = K(1−p) rides the pure-AGM kernel and is
    //     compared UNROUNDED. φ = 0.03q ∈ (0, 1.5] stays inside
    //     (0, π/2); m = q/64 keeps m·sin²φ < 1.
    Q("op_special_ellipinc", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) * 0.03 AS phi, " +
        "CAST(l_quantity AS DOUBLE) / 64.0 AS m, " +
        "1.0 - CAST(l_quantity AS DOUBLE) / 64.0 AS km1m " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val incQ = S.sqlEllipInc(inner, Seq(("a", "phi", "m", true)),
        Seq("l_orderkey", "l_linenumber", "q", "km1m"))
      val ke = S.sqlEllipKE(s"($incQ)", Seq("km1" -> "km1m"),
        Seq("l_orderkey", "l_linenumber", "q", "kinc_a", "einc_a"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(kinc_a, 6) AS kinc,
         |  round(einc_a, 6) AS einc,
         |  ell_k_km1 AS k_km1
         |FROM ($ke)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") * 0.03).as("phi"),
          ($"l_quantity".cast("double") / 64.0).as("m"),
          (lit(1.0) - $"l_quantity".cast("double") / 64.0).as("km1m"))
      val inc = Special.ellipIncFast(base, Seq(("a", $"phi", $"m", true)))
      val (kKm1, _) = Special.ellipKE($"km1m")
      inc.select($"l_orderkey", $"l_linenumber", $"q",
        round($"kinc_a", 6).as("kinc"),
        round($"einc_a", 6).as("einc"),
        kKm1.as("k_km1"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- inverse regularized incomplete gamma, both tails
    //     (gamma_funcs.py gammaincinv/gammainccinv): 5 Newton steps on
    //     the shallow forward kernel from the Wilson–Hilferty start —
    //     deterministic arithmetic replayed stage-for-stage in SQL
    //     (~120 subselects, inside the measured ~164 DuckDB ceiling).
    //     a ∈ [0.56, 3.63], p ∈ [0.16, 0.87] stays well inside the
    //     documented accuracy window.
    Q("op_special_gammaincinv", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 16.0 + 0.5 AS ga, " +
        "CAST(l_linenumber * 13 % 83 + 8 AS DOUBLE) / 99.0 AS pp " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val inv = S.sqlGammaincInv(inner,
        Seq(("p", "ga", "pp", false), ("u", "ga", "pp", true)),
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(ginv_p, 6) AS g_inv,
         |  round(ginv_u, 6) AS g_cinv
         |FROM ($inv)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 16.0 + 0.5).as("ga"),
          (($"l_linenumber" * 13 % 83 + 8).cast("double") / 99.0).as("pp"))
      val inv = Special.gammaincInvNewtonFast(base,
        Seq(("p", $"ga", $"pp", false), ("u", $"ga", $"pp", true)))
      inv.select($"l_orderkey", $"l_linenumber", $"q",
        round($"ginv_p", 6).as("g_inv"),
        round($"ginv_u", 6).as("g_cinv"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- inverse regularized incomplete beta (gamma_funcs.py
    //     betaincinv): 6 Newton steps on the shallow CF kernel from
    //     x₀ = a/(a+b), midpoint-clamped into (0, 1). The second spec
    //     runs the swapped-tail arguments (b, a, 1−p), whose result
    //     must be the reflection 1 − binv — gated as its own column
    //     (different CF chains, same root up to reflection).
    Q("op_special_betaincinv", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 16.0 + 1.0 AS ba, " +
        "(51.0 - CAST(l_quantity AS DOUBLE)) / 16.0 + 1.0 AS bb, " +
        "CAST(l_linenumber * 13 % 83 + 8 AS DOUBLE) / 99.0 AS pp " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val inv = S.sqlBetaincInv(inner,
        Seq(("d", "ba", "bb", "pp"), ("s", "bb", "ba", "(1.0 - pp)")),
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(binv_d, 6) AS b_inv,
         |  round(binv_s, 6) AS b_inv_swap
         |FROM ($inv)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 16.0 + 1.0).as("ba"),
          ((lit(51.0) - $"l_quantity".cast("double")) / 16.0 + 1.0).as("bb"),
          (($"l_linenumber" * 13 % 83 + 8).cast("double") / 99.0).as("pp"))
      val inv = Special.betaincInvNewtonFast(base,
        Seq(("d", $"ba", $"bb", $"pp"),
          ("s", $"bb", $"ba", lit(1.0) - $"pp")))
      inv.select($"l_orderkey", $"l_linenumber", $"q",
        round($"binv_d", 6).as("b_inv"),
        round($"binv_s", 6).as("b_inv_swap"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- Faddeeva w(z) + Voigt profile (err_fresnel.py wofz /
    //     voigt_profile): Humlicek w4 over one generic complex-
    //     arithmetic body instantiated for Columns AND SQL strings —
    //     shape divergence is impossible by construction. x sweeps
    //     ±12 across all four regions: y1 = 2.5·linenumber reaches
    //     I/II, y2 = linenumber/8 reaches III/IV. Im w is odd in x →
    //     +0.0 guard.
    Q("op_special_wofz", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlWofzRe("wx", "wy1")}, 6) + CAST(0.0 AS DOUBLE) AS w_re_hi,
         |  round(${S.sqlWofzIm("wx", "wy1")}, 6) + CAST(0.0 AS DOUBLE) AS w_im_hi,
         |  round(${S.sqlWofzRe("wx", "wy2")}, 6) + CAST(0.0 AS DOUBLE) AS w_re_lo,
         |  round(${S.sqlWofzIm("wx", "wy2")}, 6) + CAST(0.0 AS DOUBLE) AS w_im_lo,
         |  round(${S.sqlVoigtProfile("wx", "1.5", "0.5")}, 6)
         |    + CAST(0.0 AS DOUBLE) AS v_prof
         |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
         |        (CAST(l_quantity AS DOUBLE) - 25.0) / 2.0 AS wx,
         |        CAST(l_linenumber AS DOUBLE) * 2.5 AS wy1,
         |        CAST(l_linenumber AS DOUBLE) / 8.0 AS wy2
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      // r18 optimization round: the *Fast dispatchers route through ONE
      // native graft_special node per output (bit-identical, SpecialMathSpec
      // pin); the staged-Column fallback below them remains for
      // non-extension sessions.
      // r17 optimization round: the three Faddeeva picks through the
      // frame-staged form (each region tree materialized ONCE behind a
      // projection boundary) — the inline form carried ten full region
      // bodies in one Project and spent ~28 s PER RUN in Catalyst.
      // Arithmetic identical (wofzStaged doc); oracle SQL unchanged.
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (($"l_quantity".cast("double") - 25.0) / 2.0).as("wx"),
          ($"l_linenumber".cast("double") * 2.5).as("wy1"),
          ($"l_linenumber".cast("double") / 8.0).as("wy2"))
      val hi = Special.wofzStagedFast(base, $"wx", $"wy1", "__hre", "__him")
      val lo = Special.wofzStagedFast(hi, $"wx", $"wy2", "__lre", "__lim")
      val vp = Special.voigtProfileStagedFast(lo, $"wx", lit(1.5), lit(0.5), "__vp")
      vp.select($"l_orderkey", $"l_linenumber", $"q",
          r6($"__hre").as("w_re_hi"),
          r6($"__him").as("w_im_hi"),
          r6($"__lre").as("w_re_lo"),
          r6($"__lim").as("w_im_lo"),
          r6($"__vp").as("v_prof"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- modified Fresnel integrals (err_fresnel.py modfresnelp /
    //     modfresnelm): one Faddeeva evaluation through the complex
    //     identity K₊ = w(x·e^{iπ/4})/2 (reflection for x < 0), the
    //     F₊ phase rotation √π e^{i(x²+π/4)}, and the minus family as
    //     the real-axis conjugate. Same WAlg body as op_special_wofz —
    //     shape divergence impossible by construction. x sweeps ±6
    //     through both sign branches; oscillatory → round 6 + the
    //     +0.0 guard (Im parts hit exact 0 at x = 0).
    Q("op_special_modfresnel", {
      val S = graft.functions.Special
      val base =
        """(SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
          |        (CAST(l_quantity AS DOUBLE) - 25.0) / 4.0 AS mx
          |      FROM lineitem WHERE l_orderkey < 600) base""".stripMargin
      val staged = S.sqlModfresnelStaged(base, "mx",
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(mf_fre, 6) + CAST(0.0 AS DOUBLE) AS fp_re,
         |  round(mf_fim, 6) + CAST(0.0 AS DOUBLE) AS fp_im,
         |  round(mf_kre, 6) + CAST(0.0 AS DOUBLE) AS kp_re,
         |  round(mf_kim, 6) + CAST(0.0 AS DOUBLE) AS kp_im,
         |  round(-(mf_fim), 6) + CAST(0.0 AS DOUBLE) AS fm_im,
         |  round(-(mf_kim), 6) + CAST(0.0 AS DOUBLE) AS km_im
         |FROM ($staged) s
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (($"l_quantity".cast("double") - 25.0) / 4.0).as("mx"))
      Special.modfresnelStagedFast(base, $"mx")
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6($"mf_fre").as("fp_re"), r6($"mf_fim").as("fp_im"),
          r6($"mf_kre").as("kp_re"), r6($"mf_kim").as("kp_im"),
          r6(-$"mf_fim").as("fm_im"), r6(-$"mf_kim").as("km_im"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- LARGE real-order Y/K (bessel.py yv/kve at ν = 18 + f,
    //     f ∈ (0,1) from l_linenumber — r13, closing the
    //     large-real-ν window): staged upward order-recurrence from
    //     the series-reflection / Hankel anchor pairs, mirrored
    //     stage-for-stage (Special.sqlBessel{Yv,Kve}LargeStaged — the
    //     modfresnel staged pattern; a flat mirror would blow the
    //     128-deep expression binder). Accuracy is LargeBesselSpec's
    //     job (exact Wronskians + half-integer closed forms); this
    //     gate certifies the two engines replay identical arithmetic.
    //     x ∈ [1.2, 36] straddles the series/asymptotic cut. Magnitude
    //     discipline: at ν ≈ 19 and small x, |Y|/kve reach 1e19 where
    //     a 1-ulp libm divergence between engines is ~1e3 ABSOLUTE and
    //     round-6 can't absorb it — so the k = 18 columns gate only
    //     where ν ≲ x keeps them O(1) (x ≥ 26; same-shape mask both
    //     sides), and a k = 2 pair covers the below-cut anchor +
    //     recurrence shapes over the FULL range at O(10) magnitudes.
    Q("op_special_bessel_large", {
      val S = graft.functions.Special
      val base =
        """(SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
          |        CAST(l_quantity AS DOUBLE) / 1.4 + 0.5 AS bx,
          |        (CAST(l_linenumber % 7 AS DOUBLE) + 1.0) / 8.0 AS bf
          |      FROM lineitem WHERE l_orderkey < 600) base""".stripMargin
      val carry0 = Seq("l_orderkey", "l_linenumber", "q", "bx", "bf")
      val yStage = S.sqlBesselYvLargeStaged(base, 18, "bf", "bx",
        carry0, "blv_y")
      val kStage = S.sqlBesselKveLargeStaged(s"($yStage) ys", 18, "bf", "bx",
        carry0 :+ "blv_y", "blv_k")
      val y2Stage = S.sqlBesselYvLargeStaged(s"($kStage) ks", 2, "bf", "bx",
        carry0 ++ Seq("blv_y", "blv_k"), "blv_y2")
      val k2Stage = S.sqlBesselKveLargeStaged(s"($y2Stage) y2s", 2, "bf", "bx",
        carry0 ++ Seq("blv_y", "blv_k", "blv_y2"), "blv_k2")
      s"""SELECT l_orderkey, l_linenumber, q,
         |  (CASE WHEN bx >= 26.0 THEN round(blv_y, 6) ELSE 0.0 END)
         |    + CAST(0.0 AS DOUBLE) AS yv_large,
         |  (CASE WHEN bx >= 26.0 THEN round(blv_k, 6) ELSE 0.0 END)
         |    + CAST(0.0 AS DOUBLE) AS kve_large,
         |  round(blv_y2, 6) + CAST(0.0 AS DOUBLE) AS yv_small,
         |  round(blv_k2, 6) + CAST(0.0 AS DOUBLE) AS kve_small
         |FROM ($k2Stage) k2s
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      def masked(c: org.apache.spark.sql.Column) =
        when($"bx" >= 26.0, round(c, 6)).otherwise(lit(0.0)) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 1.4 + 0.5).as("bx"),
          ((($"l_linenumber" % 7).cast("double") + 1.0) / 8.0).as("bf"))
      val withY = Special.besselYvLargeStagedFast(base, 18, $"bf", $"bx", "blv_y")
      val withK = Special.besselKveLargeStagedFast(withY, 18, $"bf", $"bx", "blv_k")
      val withY2 = Special.besselYvLargeStagedFast(withK, 2, $"bf", $"bx", "blv_y2")
      val withK2 = Special.besselKveLargeStagedFast(withY2, 2, $"bf", $"bx", "blv_k2")
      withK2.select($"l_orderkey", $"l_linenumber", $"q",
          masked($"blv_y").as("yv_large"), masked($"blv_k").as("kve_large"),
          r6($"blv_y2").as("yv_small"), r6($"blv_k2").as("kve_small"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- LARGE real-order J/ive (bessel.py jv/ive at ν = 8 + f):
    //     three-way J branch (series / Miller / oscillatory-upward)
    //     and the all-x Miller ive, staged both sides. k = 8 keeps
    //     the combined mirror inside the pinned ≥92-stage depth
    //     budget; x ∈ [5.2, 40.2] exercises every branch (cut 8.7,
    //     upward from x ≥ 23).
    Q("op_special_bessel_large_ji", {
      val S = graft.functions.Special
      val base =
        """(SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
          |        CAST(l_quantity AS DOUBLE) / 1.4 + 4.5 AS bx,
          |        (CAST(l_linenumber % 7 AS DOUBLE) + 1.0) / 8.0 AS bf
          |      FROM lineitem WHERE l_orderkey < 600) base""".stripMargin
      val carry0 = Seq("l_orderkey", "l_linenumber", "q", "bx", "bf")
      val jStage = S.sqlBesselJvLargeStaged(base, 8, "bf", "bx",
        carry0, "blv_j")
      val iStage = S.sqlBesselIveLargeStaged(s"($jStage) js", 8, "bf", "bx",
        carry0 :+ "blv_j", "blv_i")
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(blv_j, 6) + CAST(0.0 AS DOUBLE) AS jv_large,
         |  round(blv_i, 6) + CAST(0.0 AS DOUBLE) AS ive_large
         |FROM ($iStage) isq
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 1.4 + 4.5).as("bx"),
          ((($"l_linenumber" % 7).cast("double") + 1.0) / 8.0).as("bf"))
      val withJ = Special.besselJvLargeStagedFast(base, 8, $"bf", $"bx", "blv_j")
      val withI = Special.besselIveLargeStagedFast(withJ, 8, $"bf", $"bx", "blv_i")
      withI.select($"l_orderkey", $"l_linenumber", $"q",
          r6($"blv_j").as("jv_large"), r6($"blv_i").as("ive_large"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- integrals of Airy (airy.py itairy) + scaled Hankel
    //     hankel1e/hankel2e (bessel.py): termwise-integrated Maclaurin
    //     series inside the |x| ≤ 6 window (both signs), and the
    //     unit-modulus e^{∓ix} mixes of the integer-order J/Y
    //     recurrences. Oscillatory → round 6 with the +0.0 guard.
    Q("op_special_airy_it", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlItAiryAi("xa")}, 6) + CAST(0.0 AS DOUBLE) AS it_ai,
         |  round(${S.sqlItAiryBi("xa")}, 6) + CAST(0.0 AS DOUBLE) AS it_bi,
         |  round(${S.sqlItAiryAi("xan")}, 6) + CAST(0.0 AS DOUBLE) AS it_ai_neg,
         |  round(${S.sqlItAiryBi("xan")}, 6) + CAST(0.0 AS DOUBLE) AS it_bi_neg,
         |  round(${S.sqlHankel1eRe(0, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS h1e0_re,
         |  round(${S.sqlHankel1eIm(0, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS h1e0_im,
         |  round(${S.sqlHankel1eRe(1, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS h1e1_re,
         |  round(${S.sqlHankel1eIm(1, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS h1e1_im
         |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 10.0 AS xa,
         |        -CAST(l_quantity AS DOUBLE) / 10.0 AS xan,
         |        CAST(l_quantity AS DOUBLE) / 4.0 AS xp
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 10.0).as("xa"),
          (-$"l_quantity".cast("double") / 10.0).as("xan"),
          ($"l_quantity".cast("double") / 4.0).as("xp"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.itAiryAi($"xa")).as("it_ai"),
          r6(Special.itAiryBi($"xa")).as("it_bi"),
          r6(Special.itAiryAi($"xan")).as("it_ai_neg"),
          r6(Special.itAiryBi($"xan")).as("it_bi_neg"),
          r6(Special.hankel1eRe(0, $"xp")).as("h1e0_re"),
          r6(Special.hankel1eIm(0, $"xp")).as("h1e0_im"),
          r6(Special.hankel1eRe(1, $"xp")).as("h1e1_re"),
          r6(Special.hankel1eIm(1, $"xp")).as("h1e1_im"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- ttest_ind_from_stats (tensor/stats/ttest.py
    //     ttest_ind_from_stats): the summary-statistics form of the
    //     independent t-test, VECTORIZED — one test per group row, no
    //     shuffle beyond the moment aggregate. Means/stds derive from
    //     exact BIGINT moments; from_stats re-squares the std (the
    //     real surface's operation shape, mirrored in SQL). The slice
    //     keeps ν/2 ≤ 60 so the betainc p-value mirror stays in its
    //     pinned envelope.
    Q("learn_ttest_from_stats", {
      val S = graft.functions.Special
      val inner = """(WITH g AS (SELECT l_suppkey % 5 AS g,
        |  COUNT(*) FILTER (WHERE l_linenumber % 2 = 0) AS n1,
        |  CAST(SUM(CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1a,
        |  CAST(SUM(CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2a,
        |  COUNT(*) FILTER (WHERE l_linenumber % 2 = 1) AS n2,
        |  CAST(SUM(CASE WHEN l_linenumber % 2 = 1 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1b,
        |  CAST(SUM(CASE WHEN l_linenumber % 2 = 1 THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2b
        |  FROM lineitem WHERE l_orderkey < 120 GROUP BY 1),
        |d AS (SELECT g, n1, n2, CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |  CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |  sqrt((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) AS sd1,
        |  CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |  sqrt((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) AS sd2
        |  FROM g),
        |s AS (SELECT g, n1, n2, n1d + n2d - 2.0 AS nu,
        |  (m1 - m2) / sqrt((((n1d - 1.0) * (sd1 * sd1) + (n2d - 1.0) * (sd2 * sd2))
        |       / (n1d + n2d - 2.0)) * (1.0 / n1d + 1.0 / n2d)) AS t_stat
        |  FROM d)
        |SELECT g, n1, n2, nu, t_stat,
        |  nu / (nu + t_stat * t_stat) AS bx FROM s)""".stripMargin
      val staged = S.sqlBetaincStaged(inner,
        Seq(("s", "(nu / 2.0)", "CAST(0.5 AS DOUBLE)", "bx")),
        Seq("g", "n1", "n2", "nu", "t_stat"))
      s"""SELECT CAST(g AS BIGINT) AS g,
         |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  CAST(nu AS BIGINT) AS dof,
         |  round(t_stat, 6) + CAST(0.0 AS DOUBLE) AS t_stat,
         |  round(bi_s, 6) + CAST(0.0 AS DOUBLE) AS p_two
         |FROM ($staged)
         |ORDER BY g""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      import graft.learn.StatTests
      val grouped = t(spark, dir, "lineitem").filter($"l_orderkey" < 120)
        .select(($"l_suppkey" % 5).as("g"),
          ($"l_linenumber" % 2).as("side"),
          $"l_quantity".cast("long").as("x"))
        .groupBy($"g")
        .agg(
          count(when($"side" === 0, lit(1))).as("n1"),
          sum(when($"side" === 0, $"x")).as("s1a"),
          sum(when($"side" === 0, $"x" * $"x")).as("s2a"),
          count(when($"side" === 1, lit(1))).as("n2"),
          sum(when($"side" === 1, $"x")).as("s1b"),
          sum(when($"side" === 1, $"x" * $"x")).as("s2b"))
      val summary = grouped.select($"g", $"n1", $"n2",
        ($"s1a".cast("double") / $"n1".cast("double")).as("m1"),
        sqrt(($"s2a".cast("double") -
          $"s1a".cast("double") * $"s1a".cast("double") / $"n1".cast("double")) /
          ($"n1".cast("double") - 1.0)).as("sd1"),
        ($"s1b".cast("double") / $"n2".cast("double")).as("m2"),
        sqrt(($"s2b".cast("double") -
          $"s1b".cast("double") * $"s1b".cast("double") / $"n2".cast("double")) /
          ($"n2".cast("double") - 1.0)).as("sd2"))
      StatTests.ttestIndFromStats(summary, "m1", "sd1", "n1", "m2", "sd2", "n2")
        .withColumn("bx", $"dof" / ($"dof" + $"statistic" * $"statistic"))
        .select($"g".cast("long").as("g"), $"n1", $"n2",
          $"dof".cast("long").as("dof"),
          (round($"statistic", 6) + lit(0.0)).as("t_stat"),
          (round(Special.betaincReg($"dof" / 2.0, lit(0.5), $"bx"), 6)
            + lit(0.0)).as("p_two"))
        .orderBy($"g")
    },

    // --- Carlson R_G (ellip_func_integrals.py elliprg): DLMF 19.21.10
    //     composition of the bit-exact R_F/R_D duplication stages —
    //     pure IEEE +·/√ over identical inputs, so the gate is
    //     UNROUNDED like op_special_carlson's rf/rd. z = 3 puts a
    //     strictly positive constant in the √(xy/z) slot.
    Q("op_special_elliprg", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 8.0 + 0.1 AS x1, " +
        "CAST(l_quantity AS DOUBLE) / 4.0 + 1.0 AS y1, " +
        "CAST(3.0 AS DOUBLE) AS z1 " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val rg = S.sqlEllipRg(inner, Seq(("a", "x1", "y1", "z1")),
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q, rg_a
         |FROM ($rg)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 8.0 + 0.1).as("x1"),
          ($"l_quantity".cast("double") / 4.0 + 1.0).as("y1"),
          lit(3.0).as("z1"))
      Special.ellipRg(base, Seq(("a", $"x1", $"y1", $"z1")))
        .select($"l_orderkey", $"l_linenumber", $"q", $"rg_a")
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- Tricomi U(a,b,z) (hypergeometric_funcs.py hyperu): the
    //     Kummer connection over two staged ₁F₁ series, every Γ on the
    //     positive Lanczos branch via the Γ(b−1) recurrence. The window
    //     a ∈ [0.54, 2.5], z ∈ [0.45, 2.9], b ∈ {0.3, 0.5, 0.7} keeps
    //     the canceling term pair ≤ ~10² (cross-engine libm divergence
    //     ≤ ~1e-13 absolute) → round 6.
    Q("op_special_hyperu", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 25.0 + 0.5 AS ua, " +
        "0.3 + 0.2 * CAST(l_linenumber % 3 AS DOUBLE) AS ub, " +
        "CAST(l_quantity AS DOUBLE) / 20.0 + 0.4 AS uz " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val hu = S.sqlHyperu(inner, Seq(("a", "ua", "ub", "uz")),
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(hu_a, 6) + CAST(0.0 AS DOUBLE) AS hu
         |FROM ($hu)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 25.0 + 0.5).as("ua"),
          (lit(0.3) + lit(0.2) * ($"l_linenumber" % 3).cast("double")).as("ub"),
          ($"l_quantity".cast("double") / 20.0 + 0.4).as("uz"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          (round(Special.hyperu($"ua", $"ub", $"uz"), 6) + lit(0.0)).as("hu"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- Lamé functions of the first kind E^p_n, n ≤ 2
    //     (ellip_harm.py ellip_harm): the Dassios closed forms — all
    //     nine (n,p) branches over data-dependent h², k², s with
    //     s ≥ k ≥ h > 0 (radicands stay positive). Pure IEEE ·−√ with
    //     identical shape both sides → UNROUNDED bit-exact gate.
    Q("op_special_ellipharm", {
      val S = graft.functions.Special
      val cols = Seq((1, 1, "e11"), (1, 2, "e12"), (1, 3, "e13"),
        (2, 1, "e21"), (2, 2, "e22"), (2, 3, "e23"),
        (2, 4, "e24"), (2, 5, "e25"))
        .map { case (n, p, a) =>
          s"  ${S.sqlEllipHarm("h2", "k2", n, p, "s")} AS $a" }
        .mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, q,
         |$cols
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 50.0 + 0.5 AS h2,
         |        CAST(l_quantity AS DOUBLE) / 25.0 + 2.0 AS k2,
         |        CAST(l_quantity AS DOUBLE) / 20.0 + 2.2 AS s
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 50.0 + 0.5).as("h2"),
          ($"l_quantity".cast("double") / 25.0 + 2.0).as("k2"),
          ($"l_quantity".cast("double") / 20.0 + 2.2).as("s"))
      val outs = Seq((1, 1, "e11"), (1, 2, "e12"), (1, 3, "e13"),
        (2, 1, "e21"), (2, 2, "e22"), (2, 3, "e23"),
        (2, 4, "e24"), (2, 5, "e25"))
        .map { case (n, p, a) =>
          Special.ellipHarm($"h2", $"k2", n, p, $"s").as(a) }
      base.select(Seq($"l_orderkey", $"l_linenumber", $"q") ++ outs: _*)
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- Lamé functions of the second kind F^p_n, n ≤ 2
    //     (ellip_harm.py ellip_harm_2): the Liouville integral over
    //     [0, 1/s] by FIXED 32-point Gauss–Legendre — machine-precision
    //     on the smooth domain (SpecialSpec pins vs adaptive mpmath
    //     quadrature), every op exact-rounded IEEE with literal
    //     nodes/weights mirrored verbatim → UNROUNDED bit-exact gate.
    //     Four branches cover the polynomial, radical, Niven, and N
    //     classes; the ~600-row slice keeps the (wide) expression cheap.
    Q("op_special_ellipharm2", {
      val S = graft.functions.Special
      val cols = Seq((0, 1, "f01"), (1, 1, "f11"), (2, 1, "f21"),
        (2, 5, "f25"))
        .map { case (n, p, a) =>
          s"  ${S.sqlEllipHarm2("h2", "k2", n, p, "s")} AS $a" }
        .mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, q,
         |$cols
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 50.0 + 0.5 AS h2,
         |        CAST(l_quantity AS DOUBLE) / 25.0 + 2.0 AS k2,
         |        CAST(l_quantity AS DOUBLE) / 20.0 + 2.2 AS s
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 50.0 + 0.5).as("h2"),
          ($"l_quantity".cast("double") / 25.0 + 2.0).as("k2"),
          ($"l_quantity".cast("double") / 20.0 + 2.2).as("s"))
      val outs = Seq((0, 1, "f01"), (1, 1, "f11"), (2, 1, "f21"),
        (2, 5, "f25"))
        .map { case (n, p, a) =>
          Special.ellipHarm2($"h2", $"k2", n, p, $"s").as(a) }
      base.select(Seq($"l_orderkey", $"l_linenumber", $"q") ++ outs: _*)
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- half-integer Bessel jv/yv/iv/kv at ν = k + 1/2 (bessel.py —
    //     the REAL-order slice with closed spherical seeds, A&S
    //     10.1.11): the same upward recurrences as the integer gates,
    //     sinh/cosh as exp composites for the DuckDB mirror. xj ≳ ν
    //     keeps upward J well-conditioned; round 6 with the
    //     signed-zero guard on the oscillatory outputs.
    Q("op_special_bessel_half", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlBesselJHalf(0, "xj")}, 6) + CAST(0.0 AS DOUBLE) AS jh0,
         |  round(${S.sqlBesselJHalf(2, "xj")}, 6) + CAST(0.0 AS DOUBLE) AS jh2,
         |  round(${S.sqlBesselJHalf(3, "xj")}, 6) + CAST(0.0 AS DOUBLE) AS jh3,
         |  round(${S.sqlBesselYHalf(0, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS yh0,
         |  round(${S.sqlBesselYHalf(2, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS yh2,
         |  round(${S.sqlBesselIHalf(2, "xi")}, 6) + CAST(0.0 AS DOUBLE) AS ih2,
         |  round(${S.sqlBesselKHalf(0, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS kh0,
         |  round(${S.sqlBesselKHalf(3, "xp")}, 6) + CAST(0.0 AS DOUBLE) AS kh3
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 4.0 + 4.0 AS xj,
         |        CAST(l_quantity AS DOUBLE) / 4.0 + 0.3 AS xp,
         |        CAST(l_quantity AS DOUBLE) / 8.0 + 0.5 AS xi
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 4.0 + 4.0).as("xj"),
          ($"l_quantity".cast("double") / 4.0 + 0.3).as("xp"),
          ($"l_quantity".cast("double") / 8.0 + 0.5).as("xi"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.besselJHalf(0, $"xj")).as("jh0"),
          r6(Special.besselJHalf(2, $"xj")).as("jh2"),
          r6(Special.besselJHalf(3, $"xj")).as("jh3"),
          r6(Special.besselYHalf(0, $"xp")).as("yh0"),
          r6(Special.besselYHalf(2, $"xp")).as("yh2"),
          r6(Special.besselIHalf(2, $"xi")).as("ih2"),
          r6(Special.besselKHalf(0, $"xp")).as("kh0"),
          r6(Special.besselKHalf(3, $"xp")).as("kh3"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- GENERAL real-order Bessel via the ₀F₁ representation
    //     (bessel.py jv/yv/iv/kv at data-dependent fractional ν):
    //     J/I at ν ∈ {0.3,0.5,0.7} and ν+2; Y/K through the
    //     reflection connections (ν ∈ (0,1), Γ(1−ν) positive branch).
    //     x windows keep x²/4 inside the ₀F₁ contract. round 6 with
    //     the signed-zero guard on the oscillatory J/Y.
    Q("op_special_bessel_real", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlBesselJv("vf", "xb")}, 6) + CAST(0.0 AS DOUBLE) AS jvf,
         |  round(${S.sqlBesselJv("vf + 2.0", "xb")}, 6) + CAST(0.0 AS DOUBLE) AS jv2,
         |  round(${S.sqlBesselYv("vf", "xb")}, 6) + CAST(0.0 AS DOUBLE) AS yvf,
         |  round(${S.sqlBesselIv("vf + 2.0", "xi")}, 6) + CAST(0.0 AS DOUBLE) AS iv2,
         |  round(${S.sqlBesselKv("vf", "xb")}, 6) + CAST(0.0 AS DOUBLE) AS kvf
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        0.3 + 0.2 * CAST(l_linenumber % 3 AS DOUBLE) AS vf,
         |        CAST(l_quantity AS DOUBLE) / 8.0 + 0.4 AS xb,
         |        CAST(l_quantity AS DOUBLE) / 16.0 + 0.3 AS xi
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (lit(0.3) + lit(0.2) * ($"l_linenumber" % 3).cast("double")).as("vf"),
          ($"l_quantity".cast("double") / 8.0 + 0.4).as("xb"),
          ($"l_quantity".cast("double") / 16.0 + 0.3).as("xi"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.besselJv($"vf", $"xb")).as("jvf"),
          r6(Special.besselJv($"vf" + lit(2.0), $"xb")).as("jv2"),
          r6(Special.besselYv($"vf", $"xb")).as("yvf"),
          r6(Special.besselIv($"vf" + lit(2.0), $"xi")).as("iv2"),
          r6(Special.besselKv($"vf", $"xb")).as("kvf"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- large-x Bessel via Hankel's asymptotic expansions (bessel.py
    //     jv/yv/iv/kv beyond the series windows — closing the r11
    //     "asymptotic tails" gap): the *Ext forms branch at x = 8.7
    //     between the ₀F₁ series and the 12-term A&S 9.2/9.7 sums, so
    //     the sweep x = 0.4q + 0.3 ∈ [0.4, 20.3] crosses both branches
    //     in every group. νa ∈ [0.1, 3.3] exercises the J/ive ν ≤ 4
    //     window; Y/kve run νf ∈ {0.2, 0.5, 0.8} (the series
    //     reflection's (0,1) contract below the cut). Scaled ive/kve
    //     keep magnitudes O(0.1); oscillatory → round 6 + 0.0.
    Q("op_special_bessel_asym", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlBesselJvExt("va", "xs")}, 6) + CAST(0.0 AS DOUBLE) AS jv,
         |  round(${S.sqlBesselYvExt("vf", "xs")}, 6) + CAST(0.0 AS DOUBLE) AS yv,
         |  round(${S.sqlBesselIveExt("va", "xs")}, 6) + CAST(0.0 AS DOUBLE) AS ive,
         |  round(${S.sqlBesselKveExt("vf", "xs")}, 6) + CAST(0.0 AS DOUBLE) AS kve
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        0.1 + 0.8 * CAST(l_linenumber % 5 AS DOUBLE) AS va,
         |        0.2 + 0.3 * CAST(l_linenumber % 3 AS DOUBLE) AS vf,
         |        CAST(l_quantity AS DOUBLE) * 0.4 + 0.3 AS xs
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (lit(0.1) + lit(0.8) * ($"l_linenumber" % 5).cast("double")).as("va"),
          (lit(0.2) + lit(0.3) * ($"l_linenumber" % 3).cast("double")).as("vf"),
          ($"l_quantity".cast("double") * 0.4 + 0.3).as("xs"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.besselJvExtFast(spark, $"va", $"xs")).as("jv"),
          r6(Special.besselYvExtFast(spark, $"vf", $"xs")).as("yv"),
          r6(Special.besselIveExtFast(spark, $"va", $"xs")).as("ive"),
          r6(Special.besselKveExtFast(spark, $"vf", $"xs")).as("kve"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- ₂F₁ at negative arguments via the Pfaff transformation
    //     (hypergeometric_funcs.py hyp2f1 — widening the |z| ≤ 0.7
    //     series window to z ∈ [−7/3, 0.7]): the mapped series runs at
    //     w = z/(z−1) ∈ (0, 0.7], staged like the direct gate; the
    //     (1−z)^(−b) prefactor brings libm pow of identical inputs →
    //     round 6. z = −q/25 ∈ [−2, −0.04] stays inside −7/3.
    Q("op_special_hyp2f1_neg", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "0.3 + 0.2 * CAST(l_linenumber % 3 AS DOUBLE) AS ha, " +
        "CAST(l_quantity AS DOUBLE) / 30.0 + 0.25 AS hb, " +
        "CAST(l_quantity AS DOUBLE) / 20.0 + 1.5 AS hc, " +
        "-(CAST(l_quantity AS DOUBLE) / 25.0) AS hz " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val staged = S.sqlHypStaged(inner,
        Seq(("n", "(hc - ha)", "hb", "hc", "(hz / (hz - CAST(1.0 AS DOUBLE)))")),
        Nil, Seq("l_orderkey", "l_linenumber", "q", "hb", "hz"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(power(CAST(1.0 AS DOUBLE) - hz, -hb) * h2_n, 6)
         |    + CAST(0.0 AS DOUBLE) AS f_neg
         |FROM ($staged)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (lit(0.3) + lit(0.2) * ($"l_linenumber" % 3).cast("double")).as("ha"),
          ($"l_quantity".cast("double") / 30.0 + 0.25).as("hb"),
          ($"l_quantity".cast("double") / 20.0 + 1.5).as("hc"),
          (-($"l_quantity".cast("double") / 25.0)).as("hz"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          (round(Special.hyp2f1ExtFast(spark, $"ha", $"hb", $"hc", $"hz"), 6)
            + lit(0.0)).as("f_neg"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- ₂F₁ far below the Pfaff window via the DLMF 15.8.2 1/z
    //     connection (r13 — the remaining real-axis slice z < −7/3,
    //     completing the entire z < 1 ray): both mapped series run at
    //     w = 1/z ∈ (−1/3, 0); every Γ on the positive Lanczos branch
    //     under the 0 < a < b < c, ε = b−a ∈ (0,1) contract. libm
    //     pow/exp of identical inputs → round 6. SpecialSpec pins the
    //     MATH (Pfaff-overlap + exact Euler identity); this gate pins
    //     the mirror.
    Q("op_special_hyp2f1_far", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "0.3 + 0.2 * CAST(l_linenumber % 3 AS DOUBLE) AS ha, " +
        "0.3 + 0.2 * CAST(l_linenumber % 3 AS DOUBLE) + 0.35 " +
        "+ CAST(l_quantity AS DOUBLE) / 200.0 AS hb, " +
        "0.3 + 0.2 * CAST(l_linenumber % 3 AS DOUBLE) + 0.95 " +
        "+ CAST(l_quantity AS DOUBLE) / 40.0 AS hc, " +
        "-(CAST(l_quantity AS DOUBLE) / 2.0 + 2.5) AS hz " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val far = S.sqlHyp2f1Far(inner,
        Seq(("x", "ha", "hb", "hc", "hz")),
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(h2f_x, 6) + CAST(0.0 AS DOUBLE) AS f_far
         |FROM ($far)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (lit(0.3) + lit(0.2) * ($"l_linenumber" % 3).cast("double")).as("ha"),
          (lit(0.3) + lit(0.2) * ($"l_linenumber" % 3).cast("double")
            + lit(0.35) + $"l_quantity".cast("double") / 200.0).as("hb"),
          (lit(0.3) + lit(0.2) * ($"l_linenumber" % 3).cast("double")
            + lit(0.95) + $"l_quantity".cast("double") / 40.0).as("hc"),
          (-($"l_quantity".cast("double") / 2.0 + 2.5)).as("hz"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          (round(Special.hyp2f1FarFast(spark, $"ha", $"hb", $"hc", $"hz"), 6)
            + lit(0.0)).as("f_far"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- ₁F₁ on the ENTIRE real axis (r13): five branches — series,
    //     positive wide series to 40, Kummer reflection to −40, DLMF
    //     13.7.2 asymptotics beyond ±40. x = (q − 25.5)·2.4 ∈
    //     [−58.8, 58.8] hits every branch. Magnitude discipline: M
    //     grows like eˣ on the right, where 1-ulp libm drift beats
    //     round-6 — gate M·e^(−x) for x > 5 (bounded, same-shape mask
    //     both sides) and raw M below.
    Q("op_special_hyp1f1_ext", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "0.4 + 0.15 * CAST(l_linenumber % 3 AS DOUBLE) AS ka, " +
        "1.1 + 0.25 * CAST(l_linenumber % 4 AS DOUBLE) " +
        "+ CAST(l_quantity AS DOUBLE) / 100.0 AS kb, " +
        "(CAST(l_quantity AS DOUBLE) - 25.5) * 2.4 AS kx " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val ext = S.sqlHyp1f1ExtStaged(inner,
        Seq(("x", "ka", "kb", "kx")),
        Seq("l_orderkey", "l_linenumber", "q", "kx"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(CASE WHEN kx > 5.0 THEN h1e_x * exp(-kx) ELSE h1e_x END, 6)
         |    + CAST(0.0 AS DOUBLE) AS m_ext
         |FROM ($ext)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (lit(0.4) + lit(0.15) * ($"l_linenumber" % 3).cast("double")).as("ka"),
          (lit(1.1) + lit(0.25) * ($"l_linenumber" % 4).cast("double")
            + $"l_quantity".cast("double") / 100.0).as("kb"),
          (($"l_quantity".cast("double") - 25.5) * 2.4).as("kx"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          (round(when($"kx" > 5.0,
              Special.hyp1f1ExtFast(spark, $"ka", $"kb", $"kx") * exp(-$"kx"))
            .otherwise(Special.hyp1f1ExtFast(spark, $"ka", $"kb", $"kx")), 6)
            + lit(0.0)).as("m_ext"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- ₂F₁ near z = 1 via the DLMF 15.8.4 endpoint connection
    //     (hypergeometric_funcs.py hyp2f1, the remaining real-axis
    //     slice): both mapped series run at 1−z < 0.3; every Γ on the
    //     positive Lanczos branch (δ = 0.4-ish by construction). libm
    //     pow/exp of identical inputs → round 6.
    Q("op_special_hyp2f1_near1", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "0.3 + 0.2 * CAST(l_linenumber % 3 AS DOUBLE) AS pa, " +
        "CAST(l_quantity AS DOUBLE) / 60.0 + 0.2 AS pb, " +
        "0.7 + CAST(l_quantity AS DOUBLE) / 180.0 AS pz " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val near = S.sqlHyp2f1Near1(inner,
        Seq(("x", "pa", "pb", "pa + pb + 0.4", "pz")),
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(h2n_x, 6) + CAST(0.0 AS DOUBLE) AS f_near1
         |FROM ($near)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          (lit(0.3) + lit(0.2) * ($"l_linenumber" % 3).cast("double")).as("pa"),
          ($"l_quantity".cast("double") / 60.0 + 0.2).as("pb"),
          (lit(0.7) + $"l_quantity".cast("double") / 180.0).as("pz"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          (round(Special.hyp2f1Near1Fast(spark, $"pa", $"pb",
            $"pa" + $"pb" + lit(0.4), $"pz"), 6) + lit(0.0)).as("f_near1"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- ellipsoidal-harmonic normalization γ^p_n (ellip_harm.py
    //     ellip_normal): the 2-D octant integral with the singularity-
    //     removing trig substitutions, factorized into four 16-term GL
    //     sums (A·D − B·C). Exact-rounded IEEE with verbatim-mirrored
    //     node literals → UNROUNDED bit-exact gate; γ¹₀ = 4π and the
    //     quadrature table are pinned in SpecialSpec.
    Q("op_special_ellipnormal", {
      val S = graft.functions.Special
      val cols = Seq((0, 1, "g01"), (1, 2, "g12"), (2, 1, "g21"),
        (2, 5, "g25"))
        .map { case (n, p, a) =>
          s"  ${S.sqlEllipNormal("h2", "k2", n, p)} AS $a" }
        .mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, q,
         |$cols
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 50.0 + 0.5 AS h2,
         |        CAST(l_quantity AS DOUBLE) / 25.0 + 2.0 AS k2
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 50.0 + 0.5).as("h2"),
          ($"l_quantity".cast("double") / 25.0 + 2.0).as("k2"))
      val outs = Seq((0, 1, "g01"), (1, 2, "g12"), (2, 1, "g21"),
        (2, 5, "g25"))
        .map { case (n, p, a) =>
          Special.ellipNormal($"h2", $"k2", n, p).as(a) }
      base.select(Seq($"l_orderkey", $"l_linenumber", $"q") ++ outs: _*)
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- degree-3 Lamé family (ellip_harm.py n=3): all seven closed
    //     forms from the ansatz quadratics (K: 5c²+4(h²+k²)c+3h²k²;
    //     L/M: 5c²+(2h²+4k²)c+h²k² and the h↔k swap; N: the full
    //     radical) — derived by substitution into the ODE, each pinned
    //     by the constant-eigenvalue property in SpecialSpec. First
    //     kind UNROUNDED; one second-kind column (the generic GL-32
    //     integral over E³₁) and one normalization column (γ³₇ via the
    //     n=3 E² forms) ride along, also UNROUNDED.
    Q("op_special_ellipharm3", {
      val S = graft.functions.Special
      val firsts = (1 to 7).map { p =>
        s"  ${S.sqlEllipHarm("h2", "k2", 3, p, "s")} AS e3$p" }
        .mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, q,
         |$firsts,
         |  ${S.sqlEllipHarm2("h2", "k2", 3, 1, "s")} AS f31,
         |  ${S.sqlEllipNormal("h2", "k2", 3, 7)} AS g37
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 50.0 + 0.5 AS h2,
         |        CAST(l_quantity AS DOUBLE) / 25.0 + 2.0 AS k2,
         |        CAST(l_quantity AS DOUBLE) / 20.0 + 2.2 AS s
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 50.0 + 0.5).as("h2"),
          ($"l_quantity".cast("double") / 25.0 + 2.0).as("k2"),
          ($"l_quantity".cast("double") / 20.0 + 2.2).as("s"))
      val firsts = (1 to 7).map { p =>
        Special.ellipHarm($"h2", $"k2", 3, p, $"s").as(s"e3$p") }
      base.select(Seq($"l_orderkey", $"l_linenumber", $"q") ++ firsts ++ Seq(
        Special.ellipHarm2($"h2", $"k2", 3, 1, $"s").as("f31"),
        Special.ellipNormal($"h2", $"k2", 3, 7).as("g37")): _*)
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- degree-4 Lamé family (ellip_harm.py n=4): nine closed forms —
    //     K¹K²K³ from the trig-Cardano cubic 49b³+98Hb²+(48H²+52P)b+48HP
    //     with c = (7b²+6bH+6P)/10 (acos/cos of identical inputs →
    //     round 6); L/M/N from 7c²+(4h²+6k²)c+3h²k², the h↔k swap, and
    //     7c²+4Hc+P (pure √ → UNROUNDED). F⁸₄ (the generic GL-32 second
    //     kind over the √-only N form) rides along UNROUNDED. All
    //     ODE-derived and constant-eigenvalue-pinned in SpecialSpec.
    Q("op_special_ellipharm4", {
      val S = graft.functions.Special
      val ks = (1 to 3).map { p =>
        s"  round(${S.sqlEllipHarm("h2", "k2", 4, p, "s")}, 6) + " +
          s"CAST(0.0 AS DOUBLE) AS e4$p" }.mkString(",\n")
      val rest = (4 to 9).map { p =>
        s"  ${S.sqlEllipHarm("h2", "k2", 4, p, "s")} AS e4$p" }.mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, q,
         |$ks,
         |$rest,
         |  ${S.sqlEllipHarm2("h2", "k2", 4, 8, "s")} AS f48
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 50.0 + 0.5 AS h2,
         |        CAST(l_quantity AS DOUBLE) / 25.0 + 2.0 AS k2,
         |        CAST(l_quantity AS DOUBLE) / 20.0 + 2.2 AS s
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 50.0 + 0.5).as("h2"),
          ($"l_quantity".cast("double") / 25.0 + 2.0).as("k2"),
          ($"l_quantity".cast("double") / 20.0 + 2.2).as("s"))
      val ks = (1 to 3).map { p =>
        (round(Special.ellipHarm($"h2", $"k2", 4, p, $"s"), 6) + lit(0.0))
          .as(s"e4$p") }
      val rest = (4 to 9).map { p =>
        Special.ellipHarm($"h2", $"k2", 4, p, $"s").as(s"e4$p") }
      base.select(Seq($"l_orderkey", $"l_linenumber", $"q") ++ ks ++ rest ++
        Seq(Special.ellipHarm2($"h2", $"k2", 4, 8, $"s").as("f48")): _*)
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- Lamé first kind at degree n=5 (ellip_harm.py — r13, closing
    //     the last ellip_harm degree the reference's tests exercise):
    //     all 11 functions (K³ L³ M³ N²) from the ODE-derived ansatz
    //     systems (cubics via trig-Cardano for K/L/M — acos/cos libm →
    //     round 6; the N quadratic is pure ·−√ IEEE → UNROUNDED).
    //     SpecialSpec pins the constant-eigenvalue property and the
    //     ascending-λ class order.
    Q("op_special_ellipharm5", {
      val S = graft.functions.Special
      val cubics = (1 to 9).map { p =>
        s"  round(${S.sqlEllipHarm("h2", "k2", 5, p, "s")}, 6) + " +
          s"CAST(0.0 AS DOUBLE) AS e5$p" }.mkString(",\n")
      val ns = (10 to 11).map { p =>
        s"  ${S.sqlEllipHarm("h2", "k2", 5, p, "s")} AS e5$p" }.mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, q,
         |$cubics,
         |$ns
         |FROM (SELECT l_orderkey, l_linenumber,
         |        CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 50.0 + 0.5 AS h2,
         |        CAST(l_quantity AS DOUBLE) / 25.0 + 2.0 AS k2,
         |        CAST(l_quantity AS DOUBLE) / 20.0 + 2.2 AS s
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 50.0 + 0.5).as("h2"),
          ($"l_quantity".cast("double") / 25.0 + 2.0).as("k2"),
          ($"l_quantity".cast("double") / 20.0 + 2.2).as("s"))
      val cubics = (1 to 9).map { p =>
        (round(Special.ellipHarm($"h2", $"k2", 5, p, $"s"), 6) + lit(0.0))
          .as(s"e5$p") }
      val ns = (10 to 11).map { p =>
        Special.ellipHarm($"h2", $"k2", 5, p, $"s").as(s"e5$p") }
      base.select(Seq($"l_orderkey", $"l_linenumber", $"q") ++
          cubics ++ ns: _*)
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    })
}
