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
    })
}
