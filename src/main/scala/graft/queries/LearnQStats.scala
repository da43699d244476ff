package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.learn.{Datasets, Distance, LabelProp, Learn, StatTests}

/** Learn-module queries, hypothesis-test family (SURVEY §2.14 mt.stats):
  * t/χ²/G/KS/rank/ANOVA/Wilcoxon/Kruskal/Kendall/Spearman statistics and
  * their ORACLED p-values via the fixed-depth special-function kernels
  * (see CLAUDE.md "p-values are oracle-able"). Statistics stay exact
  * (BIGINT / scaled-integer) so composition inputs are bit-identical on
  * both engines. Split out of the monolithic LearnQ in r12 (registry
  * hygiene); the shared conventions live in QueryDef/QHelpers.
  */
object LearnQStats {

  val all: Vector[Q] = Vector(

    // --- one-way ANOVA (scipy f_oneway upside; exact-moment machinery
    //     shared with the ttests): per-group BIGINT sums, the one
    //     cross-group double term Σ(Σx_g)²/n_g folds in sorted group
    //     order on both sides — every downstream double is then
    //     bit-identical, so ssb/ssw/F gate UNROUNDED. p stays
    //     spec-pinned (incomplete-beta UDF).
    Q("learn_anova",
      """WITH g AS (SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |      AS BIGINT) AS s2
        |  FROM lineitem GROUP BY l_returnflag),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(SUM(s1) AS DOUBLE) AS sg1, CAST(SUM(s2) AS DOUBLE) AS sg2,
        |    list_sum(list(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |                  / CAST(n AS DOUBLE) ORDER BY grp)) AS ssg
        |  FROM g)
        |SELECT k, n_total,
        |  ssg - sg1 * sg1 / CAST(n_total AS DOUBLE) AS ss_between,
        |  sg2 - ssg AS ss_within,
        |  ((ssg - sg1 * sg1 / CAST(n_total AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
        |    / ((sg2 - ssg) / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE)))
        |    AS statistic
        |FROM a ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      StatTests.fOneway(
          t(spark, dir, "lineitem").select($"l_quantity".cast("long").as("q"),
            $"l_returnflag"),
          "q", "l_returnflag")
        .select($"k", $"n_total", $"ss_between", $"ss_within", $"statistic")
        .orderBy($"k")
    },

    // --- ANOVA F p-value through the fixed-depth incomplete beta:
    //     p = I_{d2/(d2+d1·F)}(d2/2, d1/2). Small slice keeps
    //     d2/2 ≤ ~60 (the SpecialSpec-pinned depth envelope); the F
    //     statistic comes from the learn_anova exact-moment shape.
    Q("learn_anova_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH g AS (SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |      AS BIGINT) AS s2
        |  FROM lineitem WHERE l_orderkey < 30 GROUP BY l_returnflag),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(SUM(s1) AS DOUBLE) AS sg1, CAST(SUM(s2) AS DOUBLE) AS sg2,
        |    list_sum(list(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |                  / CAST(n AS DOUBLE) ORDER BY grp)) AS ssg
        |  FROM g),
        |f AS (SELECT k, n_total,
        |    ((ssg - sg1 * sg1 / CAST(n_total AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
        |      / ((sg2 - ssg) / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE)))
        |      AS statistic
        |  FROM a),
        |d AS (SELECT k, n_total, statistic,
        |    CAST(k AS DOUBLE) - 1.0 AS fd1,
        |    CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE) AS fd2 FROM f)
        |SELECT k, n_total, statistic, fd1, fd2,
        |    fd2 / (fd2 + fd1 * statistic) AS bx FROM d)""".stripMargin
      val staged = S.sqlBetaincStaged(inner,
        Seq(("f", "(fd2 / 2.0)", "(fd1 / 2.0)", "bx")),
        Seq("k", "n_total", "statistic"))
      s"""SELECT k, n_total,
         |  round(statistic, 6) + CAST(0.0 AS DOUBLE) AS f_stat,
         |  round(bi_f, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM ($staged)
         |ORDER BY k""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      StatTests.fOneway(
          t(spark, dir, "lineitem").filter($"l_orderkey" < 30)
            .select($"l_quantity".cast("long").as("q"), $"l_returnflag"),
          "q", "l_returnflag")
        .withColumn("fd1", $"k".cast("double") - 1.0)
        .withColumn("fd2", $"n_total".cast("double") - $"k".cast("double"))
        .withColumn("bx", $"fd2" / ($"fd2" + $"fd1" * $"statistic"))
        .select($"k", $"n_total",
          (round($"statistic", 6) + lit(0.0)).as("f_stat"),
          (round(Special.betaincRegFast(spark, $"fd2" / 2.0, $"fd1" / 2.0, $"bx"), 6)
            + lit(0.0)).as("p_value"))
        .orderBy($"k")
    },

    // --- two-sample KS p-value: λ = √(n1·n2/(n1+n2))·D from the exact
    //     integer d_num, p through the 20-term Kolmogorov series —
    //     identical composition both sides (the learn_ks2 statistic
    //     stays exact-integer; this gates the asymptotic p on top).
    Q("learn_ks2_pvalue", {
      val S = graft.functions.Special
      val lam = "(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / " +
        "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) * " +
        "(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))))"
      s"""WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS v,
         |    COUNT(*) FILTER (WHERE l_returnflag = 'A') AS c1,
         |    COUNT(*) FILTER (WHERE l_returnflag = 'R') AS c2
         |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
         |c AS (SELECT SUM(c1) OVER (ORDER BY v) AS f1,
         |             SUM(c2) OVER (ORDER BY v) AS f2 FROM v),
         |n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |             CAST(SUM(c2) AS BIGINT) AS n2 FROM v),
         |d AS (SELECT n1, n2, CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS BIGINT) AS d_num
         |  FROM c, n GROUP BY n1, n2)
         |SELECT n1, n2, d_num,
         |  round(${S.sqlKolmogorovSfFixed(lam)}, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM d ORDER BY n1""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val li = t(spark, dir, "lineitem")
      val a = li.where($"l_returnflag" === "A").select($"l_quantity".cast("long").as("q"))
      val r = li.where($"l_returnflag" === "R").select($"l_quantity".cast("long").as("q"))
      val lam = sqrt($"n1".cast("double") * $"n2".cast("double") /
          ($"n1".cast("double") + $"n2".cast("double"))) *
        ($"d_num".cast("double") / ($"n1".cast("double") * $"n2".cast("double")))
      StatTests.ks2Samp(a, "q", r, "q")
        .select($"n1", $"n2", $"d_num",
          (round(Special.kolmogorovSfFixedFast(spark, lam), 6) + lit(0.0)).as("p_value"))
        .orderBy($"n1")
    },

    // --- Wilcoxon signed-rank (scipy upside; shares the rankdata prefix
    //     stitch): doubled ranks keep W⁺/T exact BIGINTs; z mirrors the
    //     tie-corrected closed form shape-for-shape (round 6, +0.0 — a
    //     symmetric sample can land z exactly 0).
    Q("learn_wilcoxon",
      """WITH d0 AS (SELECT CAST(l_quantity AS DOUBLE)
        |      - 3.0 * CAST(l_linenumber AS DOUBLE) AS d
        |    FROM lineitem WHERE l_orderkey < 2000),
        |nz AS (SELECT d, abs(d) AS ad FROM d0 WHERE d <> 0),
        |r AS (SELECT d,
        |    CAST(2 * (rank() OVER (ORDER BY ad)) - 2
        |         + (COUNT(*) OVER (PARTITION BY ad)) + 1 AS BIGINT) AS rank2
        |  FROM nz),
        |tc AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS ties
        |       FROM (SELECT COUNT(*) AS t FROM nz GROUP BY ad) b),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w2plus
        |  FROM r)
        |SELECT n, w2plus,
        |  least(w2plus, n * (n + 1) - w2plus) AS t2, ties,
        |  round((CAST(least(w2plus, n * (n + 1) - w2plus) AS DOUBLE)
        |      - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
        |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
        |      - CAST(ties AS DOUBLE) / 12.0), 6) + CAST(0.0 AS DOUBLE) AS z
        |FROM a, tc ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      StatTests.wilcoxon(
          t(spark, dir, "lineitem").filter($"l_orderkey" < 2000)
            .select($"l_quantity".cast("double").as("x"),
              (lit(3.0) * $"l_linenumber".cast("double")).as("y")),
          "x", "y")
        .select($"n", $"w2plus", $"t2", $"ties",
          (round($"zstat", 6) + lit(0.0)).as("z"))
        .orderBy($"n")
    },

    // --- Wilcoxon signed-rank p-value: p = Q(½, z²/2) ≡ erfc(|z|/√2),
    //     the identity StatTests' adaptive UDF uses — here BOTH sides
    //     run the fixed-depth incomplete-gamma composition on the
    //     unrounded tie-corrected z, so the p joins the oracle gate.
    Q("learn_wilcoxon_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH d0 AS (SELECT CAST(l_quantity AS DOUBLE)
        |      - 3.0 * CAST(l_linenumber AS DOUBLE) AS d
        |    FROM lineitem WHERE l_orderkey < 2000),
        |nz AS (SELECT d, abs(d) AS ad FROM d0 WHERE d <> 0),
        |r AS (SELECT d,
        |    CAST(2 * (rank() OVER (ORDER BY ad)) - 2
        |         + (COUNT(*) OVER (PARTITION BY ad)) + 1 AS BIGINT) AS rank2
        |  FROM nz),
        |tc AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS ties
        |       FROM (SELECT COUNT(*) AS t FROM nz GROUP BY ad) b),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w2plus
        |  FROM r),
        |zz AS (SELECT n, w2plus,
        |  (CAST(least(w2plus, n * (n + 1) - w2plus) AS DOUBLE)
        |      - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
        |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
        |      - CAST(ties AS DOUBLE) / 12.0) AS z
        |  FROM a, tc)
        |SELECT n, w2plus, z, CAST(0.5 AS DOUBLE) AS ga,
        |       z * z / 2.0 AS gx FROM zz)""".stripMargin
      val staged = S.sqlGammaincPQ(inner, Seq(("w", "ga", "gx")),
        Seq("n", "w2plus", "z"))
      s"""SELECT n, w2plus,
         |  round(z, 6) + CAST(0.0 AS DOUBLE) AS z,
         |  round(g_q_w, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM ($staged)
         |ORDER BY n""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      StatTests.wilcoxon(
          t(spark, dir, "lineitem").filter($"l_orderkey" < 2000)
            .select($"l_quantity".cast("double").as("x"),
              (lit(3.0) * $"l_linenumber".cast("double")).as("y")),
          "x", "y")
        .select($"n", $"w2plus",
          (round($"zstat", 6) + lit(0.0)).as("z"),
          (round(Special.gammaincQFast(spark, lit(0.5), $"zstat" * $"zstat" / 2.0), 6)
            + lit(0.0)).as("p_value"))
        .orderBy($"n")
    },

    // --- Kruskal–Wallis rank ANOVA: pooled doubled ranks → exact BIGINT
    //     group rank sums; Σ R_g²/n_g folds in sorted group order on
    //     both sides, so H gates UNROUNDED (same determinism argument as
    //     learn_anova). p stays spec-pinned (χ² sf UDF).
    Q("learn_kruskal",
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |    l_returnflag AS g FROM lineitem),
        |r AS (SELECT g,
        |    CAST(2 * (rank() OVER (ORDER BY v)) - 2
        |         + (COUNT(*) OVER (PARTITION BY v)) + 1 AS BIGINT) AS rank2
        |  FROM base),
        |pg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(rank2) AS BIGINT) AS r2 FROM r GROUP BY g),
        |tc AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS ties
        |       FROM (SELECT COUNT(*) AS t FROM base GROUP BY v) b),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n) AS BIGINT) AS n_total,
        |    list_sum(list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
        |                  / (4.0 * CAST(n AS DOUBLE)) ORDER BY g)) AS srg
        |  FROM pg)
        |SELECT k, n_total, ties,
        |  (12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
        |     * srg - 3.0 * (CAST(n_total AS DOUBLE) + 1.0))
        |  / (1.0 - CAST(ties AS DOUBLE)
        |     / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
        |        * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))
        |    AS statistic
        |FROM f, tc ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      StatTests.kruskal(t(spark, dir, "lineitem"), "l_quantity", "l_returnflag")
        .select($"k", $"n_total", $"ties", $"statistic")
        .orderBy($"k")
    },

    // --- Mann-Whitney asymptotic p-value: the exact-integer U/tie
    //     machinery (learn_mannwhitney) extended through μ, σ, the
    //     0.5-continuity z and p = erfc(|z|/√2) — the A&S polynomial
    //     mirrored op-for-op (Special.normalTwoSidedP), so the rank
    //     tests' normal-approximation p-values join the oracle gate.
    Q("learn_mw_pvalue", {
      val S = graft.functions.Special
      s"""WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS v,
         |    COUNT(*) FILTER (WHERE l_returnflag = 'A') AS n1v,
         |    COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n2v
         |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
         |b AS (SELECT v, n1v, n2v, n1v + n2v AS cnt,
         |    SUM(n1v + n2v) OVER (ORDER BY v) AS cum FROM v),
         |m AS (SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
         |             CAST(SUM(n2v) AS BIGINT) AS n2,
         |             SUM(n1v * (2 * (cum - cnt) + cnt + 1)) AS r1x2,
         |             CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties FROM b),
         |u AS (SELECT n1, n2, ties,
         |             CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u2 FROM m),
         |z AS (SELECT n1, n2, u2,
         |    (CAST(u2 AS DOUBLE) / 2.0
         |     - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0
         |     - 0.5 * sign(CAST(u2 AS DOUBLE) / 2.0
         |                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0))
         |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
         |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0
         |         - CAST(ties AS DOUBLE) /
         |           ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
         |            (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))) AS zz
         |  FROM u)
         |SELECT n1, n2, u2,
         |  round(${S.sqlNormalTwoSidedP("zz")}, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM z ORDER BY n1""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val a = li.where($"l_returnflag" === "A").select($"l_quantity".cast("long").as("q"))
      val r = li.where($"l_returnflag" === "R").select($"l_quantity".cast("long").as("q"))
      StatTests.mannWhitneyU(a, "q", r, "q")
        .select($"n1", $"n2", $"u2",
          (round($"pvalue", 6) + lit(0.0)).as("p_value"))
        .orderBy($"n1")
    },

    // --- Kruskal-Wallis p-value: H is χ²(k−1) asymptotically; the
    //     tie-corrected H from learn_kruskal feeds the staged
    //     incomplete-gamma Q(dof/2, H/2).
    Q("learn_kruskal_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |    l_returnflag AS g FROM lineitem),
        |r AS (SELECT g,
        |    CAST(2 * (rank() OVER (ORDER BY v)) - 2
        |         + (COUNT(*) OVER (PARTITION BY v)) + 1 AS BIGINT) AS rank2
        |  FROM base),
        |pg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(rank2) AS BIGINT) AS r2 FROM r GROUP BY g),
        |tc AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS ties
        |       FROM (SELECT COUNT(*) AS t FROM base GROUP BY v) b),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n) AS BIGINT) AS n_total,
        |    list_sum(list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
        |                  / (4.0 * CAST(n AS DOUBLE)) ORDER BY g)) AS srg
        |  FROM pg),
        |h AS (SELECT k, n_total,
        |  (12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
        |     * srg - 3.0 * (CAST(n_total AS DOUBLE) + 1.0))
        |  / (1.0 - CAST(ties AS DOUBLE)
        |     / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
        |        * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))
        |    AS statistic
        |  FROM f, tc)
        |SELECT k, n_total, statistic,
        |    (CAST(k AS DOUBLE) - 1.0) / 2.0 AS ga,
        |    statistic / 2.0 AS gx FROM h)""".stripMargin
      val staged = S.sqlGammaincPQ(inner, Seq(("h", "ga", "gx")),
        Seq("k", "n_total", "statistic"))
      s"""SELECT k, n_total,
         |  round(statistic, 6) + CAST(0.0 AS DOUBLE) AS h_stat,
         |  round(g_q_h, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM ($staged)
         |ORDER BY k""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      StatTests.kruskal(t(spark, dir, "lineitem"), "l_quantity", "l_returnflag")
        .select($"k", $"n_total",
          (round($"statistic", 6) + lit(0.0)).as("h_stat"),
          (round(Special.gammaincQFast(spark, ($"k".cast("double") - 1.0) / 2.0,
            $"statistic" / 2.0), 6) + lit(0.0)).as("p_value"))
        .orderBy($"k")
    },

    // --- Kendall τ-b on a guarded subset (O(n²) pairs by definition;
    //     concordance counts are orientation-independent, so the oracle
    //     can pair on its own unique key): every count exact BIGINT, τ
    //     a single sqrt expression over them — unrounded.
    Q("learn_kendall",
      """WITH s AS (SELECT row_number() OVER () AS rn,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_partkey % 97 AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 120),
        |p AS (SELECT sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
        |      FROM s a JOIN s b ON a.rn < b.rn),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(COUNT(*) FILTER (sx * sy > 0) AS BIGINT) AS concordant,
        |    CAST(COUNT(*) FILTER (sx * sy < 0) AS BIGINT) AS discordant,
        |    CAST(COUNT(*) FILTER (sx = 0 AND sy <> 0) AS BIGINT) AS tx,
        |    CAST(COUNT(*) FILTER (sy = 0 AND sx <> 0) AS BIGINT) AS ty
        |  FROM p)
        |SELECT n_pairs, concordant, discordant, tx, ty,
        |  (CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
        |  / sqrt((CAST(concordant AS DOUBLE) + CAST(discordant AS DOUBLE)
        |          + CAST(tx AS DOUBLE))
        |       * (CAST(concordant AS DOUBLE) + CAST(discordant AS DOUBLE)
        |          + CAST(ty AS DOUBLE))) AS statistic
        |FROM agg ORDER BY n_pairs""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      StatTests.kendallTau(
          t(spark, dir, "lineitem").filter($"l_orderkey" < 120)
            .select($"l_quantity".cast("double").as("x"),
              ($"l_partkey" % 97).cast("double").as("y")),
          "x", "y")
        .select($"n_pairs", $"concordant", $"discordant", $"tx", $"ty",
          $"statistic")
        .orderBy($"n_pairs")
    },

    // --- t-test p-values, differentially verified end-to-end: the
    //     two-sided p = I_{ν/(ν+t²)}(ν/2, ½) through the fixed-depth
    //     incomplete-beta composition (Special.betaincReg + its SQL
    //     mirror) — the construct that upgrades the stats family's
    //     p-values from spec-pinned to oracled. Small slice keeps
    //     ν/2 ≤ ~35, well inside the 80-term CF depth (StatTestsSpec
    //     pins the fixed-depth form against the adaptive Lentz form).
    //     t comes from the exact BIGINT moments with the learn_ttest
    //     shape; ν, x and p replay identically.
    Q("learn_pvalues", {
      val S = graft.functions.Special
      val inner = """(WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
        |  FROM lineitem WHERE l_orderkey < 60 GROUP BY 1),
        |s AS (SELECT l_returnflag, n, s1, s2,
        |    (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - CAST(25.5 AS DOUBLE)) /
        |      sqrt(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |            / (CAST(n AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE)) AS t_stat
        |  FROM g),
        |v AS (SELECT l_returnflag, n, s1, s2, t_stat,
        |    CAST(n AS DOUBLE) - 1.0 AS nu FROM s)
        |SELECT l_returnflag, n, s1, s2, t_stat, nu,
        |    nu / (nu + t_stat * t_stat) AS bx FROM v)""".stripMargin
      val staged = S.sqlBetaincStaged(inner,
        Seq(("p", "(nu / 2.0)", "CAST(0.5 AS DOUBLE)", "bx")),
        Seq("l_returnflag", "n", "s1", "s2", "t_stat"))
      s"""SELECT l_returnflag, CAST(n AS BIGINT) AS n, s1, s2,
         |  round(t_stat, 6) + CAST(0.0 AS DOUBLE) AS t_stat,
         |  round(bi_p, 6) + CAST(0.0 AS DOUBLE) AS p_two
         |FROM ($staged)
         |ORDER BY l_returnflag""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val g = t(spark, dir, "lineitem").filter($"l_orderkey" < 60)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("long")).as("s1"),
          sum($"l_quantity".cast("long") * $"l_quantity".cast("long")).as("s2"))
      val tStat = ($"s1".cast("double") / $"n".cast("double") - lit(25.5).cast("double")) /
        sqrt((($"s2".cast("double") - $"s1".cast("double") * $"s1".cast("double") / $"n".cast("double"))
          / ($"n".cast("double") - 1.0)) / $"n".cast("double"))
      g.withColumn("t_stat", tStat)
        .withColumn("nu", $"n".cast("double") - 1.0)
        .withColumn("bx", $"nu" / ($"nu" + $"t_stat" * $"t_stat"))
        .select($"l_returnflag", $"n".cast("long").as("n"), $"s1", $"s2",
          (round($"t_stat", 6) + lit(0.0)).as("t_stat"),
          (round(Special.betaincRegFast(spark, $"nu" / 2.0, lit(0.5), $"bx"), 6) + lit(0.0))
            .as("p_two"))
        .orderBy($"l_returnflag")
    },

    // --- scipy.stats parity (mars/tensor/stats): hypothesis tests. The
    //     gate columns are the exact BIGINT moment sums plus the t
    //     statistic derived from them with an IDENTICAL expression shape
    //     on both sides (deterministic IEEE arithmetic from exact
    //     integers → round 6). p-values go through continued-fraction
    //     special functions (no DuckDB equivalent) — spec-pinned against
    //     closed forms in StatTestsSpec, not gated.
    Q("learn_ttest_1samp",
      """WITH m AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
        |  FROM lineitem)
        |SELECT CAST(n AS BIGINT) AS n, s1, s2,
        |  round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - CAST(25.5 AS DOUBLE)) /
        |    sqrt(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE)), 6)
        |    + CAST(0.0 AS DOUBLE) AS t_stat
        |FROM m ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val q = t(spark, dir, "lineitem").select($"l_quantity".cast("long").as("q"))
      StatTests.ttest1Samp(q, "q", 25.5)
        .select($"n", $"s1", $"s2",
          (round($"statistic", 6) + lit(0.0)).as("t_stat"))
        .orderBy($"n")
    },

    // --- paired t-test: the 1-sample test on an exact integer diff
    Q("learn_ttest_rel",
      """WITH m AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT) - CAST(l_linenumber AS BIGINT)) AS BIGINT) AS s1,
        |  CAST(SUM((CAST(l_quantity AS BIGINT) - CAST(l_linenumber AS BIGINT))
        |         * (CAST(l_quantity AS BIGINT) - CAST(l_linenumber AS BIGINT))) AS BIGINT) AS s2
        |  FROM lineitem)
        |SELECT CAST(n AS BIGINT) AS n, s1, s2,
        |  round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - CAST(0.0 AS DOUBLE)) /
        |    sqrt(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE)), 6)
        |    + CAST(0.0 AS DOUBLE) AS t_stat
        |FROM m ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val df = t(spark, dir, "lineitem")
        .select($"l_quantity".cast("long").as("a"), $"l_linenumber".cast("long").as("b"))
      StatTests.ttestRel(df, "a", "b")
        .select($"n", $"s1", $"s2",
          (round($"statistic", 6) + lit(0.0)).as("t_stat"))
        .orderBy($"n")
    },

    // --- D'Agostino–Pearson normality battery (scipy.stats skewtest /
    //     kurtosistest / normaltest) per returnflag: ONE aggregate of
    //     exact BIGINT power sums S1..S4, then the published Z
    //     transforms replayed op-for-op in SQL from the same integers.
    //     p_skew/p_kurt go through the mirrored A&S erfc polynomial;
    //     p_k2 = exp(−K²/2) is the closed-form χ²₂ tail. The value is a
    //     sum of three ≈uniform integer residues (CLT: b2 ≈ 2.6 at
    //     k = 3) and the slice keeps n ≈ 10² per group, so all six
    //     p-values land strictly inside (0, 1) — nontrivial at round 6.
    Q("learn_normaltest", {
      val S = graft.functions.Special
      s"""WITH b0 AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) + CAST(l_partkey AS BIGINT) % 50
        |      + CAST(l_suppkey AS BIGINT) % 50 AS v
        |  FROM lineitem WHERE l_orderkey < 200),
        |g AS (SELECT l_returnflag AS grp, COUNT(*) AS n,
        |    CAST(SUM(v) AS BIGINT) AS s1,
        |    CAST(SUM(v * v) AS BIGINT) AS s2,
        |    CAST(SUM(v * v * v) AS BIGINT) AS s3,
        |    CAST(SUM(v * v * v * v) AS BIGINT) AS s4
        |  FROM b0 GROUP BY l_returnflag),
        |d AS (SELECT grp, n, s1, s2, s3, s4, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        |    CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d FROM g),
        |m1 AS (SELECT *, s1d / nd AS mean FROM d),
        |ms AS (SELECT *, s2d / nd - mean * mean AS m2,
        |    s3d / nd - 3.0 * mean * (s2d / nd) + 2.0 * mean * mean * mean AS m3,
        |    s4d / nd - 4.0 * mean * (s3d / nd) + 6.0 * (mean * mean) * (s2d / nd)
        |      - 3.0 * mean * mean * mean * mean AS m4 FROM m1),
        |gb AS (SELECT *, m3 / (m2 * sqrt(m2)) AS g1, m4 / (m2 * m2) AS b2 FROM ms),
        |sk1 AS (SELECT *,
        |    g1 * sqrt((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0))) AS y0,
        |    3.0 * (nd * nd + 27.0 * nd - 70.0) * (nd + 1.0) * (nd + 3.0) /
        |      ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0)) AS beta2 FROM gb),
        |sk2 AS (SELECT *, CASE WHEN y0 = 0.0 THEN CAST(1.0 AS DOUBLE) ELSE y0 END AS y,
        |    -1.0 + sqrt(2.0 * (beta2 - 1.0)) AS w2 FROM sk1),
        |sk3 AS (SELECT *, 1.0 / sqrt(0.5 * ln(w2)) AS delta,
        |    sqrt(2.0 / (w2 - 1.0)) AS alpha FROM sk2),
        |sk4 AS (SELECT *,
        |    delta * ln(y / alpha + sqrt(y / alpha * (y / alpha) + 1.0)) AS z1 FROM sk3),
        |kt1 AS (SELECT *, 3.0 * (nd - 1.0) / (nd + 1.0) AS eb2,
        |    24.0 * nd * (nd - 2.0) * (nd - 3.0) /
        |      ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0)) AS vb2,
        |    6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * (nd + 9.0)) *
        |      sqrt(6.0 * (nd + 3.0) * (nd + 5.0) /
        |        (nd * (nd - 2.0) * (nd - 3.0))) AS sqb1 FROM sk4),
        |kt2 AS (SELECT *, (b2 - eb2) / sqrt(vb2) AS xt,
        |    6.0 + 8.0 / sqb1 * (2.0 / sqb1 + sqrt(1.0 + 4.0 / (sqb1 * sqb1))) AS aa
        |  FROM kt1),
        |kt3 AS (SELECT *, 1.0 - 2.0 / (9.0 * aa) AS term1,
        |    1.0 + xt * sqrt(2.0 / (aa - 4.0)) AS denom FROM kt2),
        |kt4 AS (SELECT *, CASE WHEN denom = 0.0 THEN CAST('nan' AS DOUBLE)
        |    ELSE (CASE WHEN denom < 0.0 THEN -1.0 ELSE 1.0 END) *
        |      pow((1.0 - 2.0 / aa) / abs(denom), CAST('${1.0 / 3.0}' AS DOUBLE)) END AS term2
        |  FROM kt3),
        |kt5 AS (SELECT *, (term1 - term2) / sqrt(2.0 / (9.0 * aa)) AS z2 FROM kt4),
        |fin AS (SELECT *, z1 * z1 + z2 * z2 AS k2 FROM kt5)
        |SELECT grp, CAST(n AS BIGINT) AS n, s1, s2, s3, s4,
        |  round(g1, 6) + CAST(0.0 AS DOUBLE) AS g1,
        |  round(b2, 6) + CAST(0.0 AS DOUBLE) AS b2,
        |  round(z1, 6) + CAST(0.0 AS DOUBLE) AS z_skew,
        |  round(z2, 6) + CAST(0.0 AS DOUBLE) AS z_kurt,
        |  round(k2, 6) + CAST(0.0 AS DOUBLE) AS k2,
        |  round(${S.sqlNormalTwoSidedP("z1")}, 6) + CAST(0.0 AS DOUBLE) AS p_skew,
        |  round(${S.sqlNormalTwoSidedP("z2")}, 6) + CAST(0.0 AS DOUBLE) AS p_kurt,
        |  round(exp(-(k2) / 2.0), 6) + CAST(0.0 AS DOUBLE) AS p_k2
        |FROM fin ORDER BY grp""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val df = t(spark, dir, "lineitem").filter($"l_orderkey" < 200)
        .select($"l_returnflag",
          ($"l_quantity".cast("long") + $"l_partkey".cast("long") % 50
            + $"l_suppkey".cast("long") % 50).as("q"))
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      StatTests.dagostino(df, "q", "l_returnflag")
        .select($"grp", $"n".cast("long").as("n"), $"s1", $"s2", $"s3", $"s4",
          r6($"g1").as("g1"), r6($"b2").as("b2"),
          r6($"z_skew").as("z_skew"), r6($"z_kurt").as("z_kurt"),
          r6($"k2").as("k2"),
          r6($"p_skew").as("p_skew"), r6($"p_kurt").as("p_kurt"),
          r6($"p_k2").as("p_k2"))
        .orderBy($"grp")
    },

    // --- two-sample pooled-variance t-test (Student), A vs R returnflags
    Q("learn_ttest_ind",
      """WITH g AS (SELECT
        |  COUNT(*) FILTER (WHERE l_returnflag = 'A') AS n1,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2a,
        |  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n2,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1b,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2b
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |d AS (SELECT CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |  CAST(s1a AS DOUBLE) AS s1ad, CAST(s2a AS DOUBLE) AS s2ad,
        |  CAST(s1b AS DOUBLE) AS s1bd, CAST(s2b AS DOUBLE) AS s2bd, n1, n2 FROM g)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(n1d + n2d - 2.0 AS BIGINT) AS dof,
        |  round((s1ad / n1d - s1bd / n2d) /
        |    sqrt((((n1d - 1.0) * ((s2ad - s1ad * s1ad / n1d) / (n1d - 1.0))
        |          + (n2d - 1.0) * ((s2bd - s1bd * s1bd / n2d) / (n2d - 1.0)))
        |         / (n1d + n2d - 2.0)) * (1.0 / n1d + 1.0 / n2d)), 6)
        |    + CAST(0.0 AS DOUBLE) AS t_stat
        |FROM d ORDER BY n1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val df = t(spark, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity".cast("long").as("q"))
      StatTests.ttestInd(df, "q", "l_returnflag", "A", "R", equalVar = true)
        .select($"n1", $"n2", $"dof".cast("long").as("dof"),
          (round($"statistic", 6) + lit(0.0)).as("t_stat"))
        .orderBy($"n1")
    },

    // --- pooled-variance Student p-value (the third t variant; 1-sample
    //     and Welch already gate): slice keeps ν/2 inside the pinned
    //     betainc depth envelope, p = I_{ν/(ν+t²)}(ν/2, ½).
    Q("learn_student_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH g AS (SELECT
        |  COUNT(*) FILTER (WHERE l_returnflag = 'A') AS n1,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2a,
        |  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n2,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1b,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2b
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R') AND l_orderkey < 30),
        |d AS (SELECT CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |  CAST(s1a AS DOUBLE) AS s1ad, CAST(s2a AS DOUBLE) AS s2ad,
        |  CAST(s1b AS DOUBLE) AS s1bd, CAST(s2b AS DOUBLE) AS s2bd, n1, n2 FROM g),
        |s AS (SELECT n1, n2, n1d + n2d - 2.0 AS nu,
        |  (s1ad / n1d - s1bd / n2d) /
        |    sqrt((((n1d - 1.0) * ((s2ad - s1ad * s1ad / n1d) / (n1d - 1.0))
        |          + (n2d - 1.0) * ((s2bd - s1bd * s1bd / n2d) / (n2d - 1.0)))
        |         / (n1d + n2d - 2.0)) * (1.0 / n1d + 1.0 / n2d)) AS t_stat
        |  FROM d)
        |SELECT n1, n2, nu, t_stat,
        |  nu / (nu + t_stat * t_stat) AS bx FROM s)""".stripMargin
      val staged = S.sqlBetaincStaged(inner,
        Seq(("s", "(nu / 2.0)", "CAST(0.5 AS DOUBLE)", "bx")),
        Seq("n1", "n2", "nu", "t_stat"))
      s"""SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  CAST(nu AS BIGINT) AS dof,
         |  round(t_stat, 6) + CAST(0.0 AS DOUBLE) AS t_stat,
         |  round(bi_s, 6) + CAST(0.0 AS DOUBLE) AS p_two
         |FROM ($staged)
         |ORDER BY n1""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val df = t(spark, dir, "lineitem").filter($"l_orderkey" < 30)
        .select($"l_returnflag", $"l_quantity".cast("long").as("q"))
      StatTests.ttestInd(df, "q", "l_returnflag", "A", "R", equalVar = true)
        .withColumn("bx", $"dof" / ($"dof" + $"statistic" * $"statistic"))
        .select($"n1", $"n2", $"dof".cast("long").as("dof"),
          (round($"statistic", 6) + lit(0.0)).as("t_stat"),
          (round(Special.betaincRegFast(spark, $"dof" / 2.0, lit(0.5), $"bx"), 6)
            + lit(0.0)).as("p_two"))
        .orderBy($"n1")
    },

    // --- Welch unequal-variance t-test: same sums, Welch–Satterthwaite
    //     dof; dof is a chained double expression → round 6 both sides
    Q("learn_ttest_welch",
      """WITH g AS (SELECT
        |  COUNT(*) FILTER (WHERE l_returnflag = 'A') AS n1,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2a,
        |  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n2,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1b,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2b
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |d AS (SELECT CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |  ((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE) AS vn1,
        |  ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE) AS vn2,
        |  CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |  CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2, n1, n2 FROM g)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  round((vn1 + vn2) * (vn1 + vn2) /
        |        (vn1 * vn1 / (n1d - 1.0) + vn2 * vn2 / (n2d - 1.0)), 6)
        |    + CAST(0.0 AS DOUBLE) AS dof,
        |  round((m1 - m2) / sqrt(vn1 + vn2), 6) + CAST(0.0 AS DOUBLE) AS t_stat
        |FROM d ORDER BY n1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val df = t(spark, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity".cast("long").as("q"))
      StatTests.ttestInd(df, "q", "l_returnflag", "A", "R", equalVar = false)
        .select($"n1", $"n2",
          (round($"dof", 6) + lit(0.0)).as("dof"),
          (round($"statistic", 6) + lit(0.0)).as("t_stat"))
        .orderBy($"n1")
    },

    // --- Welch p-value: the fractional Welch–Satterthwaite ν feeds the
    //     fixed-depth incomplete beta — the corner where the dof is a
    //     genuine double (ν/2 non-integral), p = I_{ν/(ν+t²)}(ν/2, ½).
    //     Small slice keeps ν/2 inside the pinned depth envelope.
    Q("learn_welch_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH g AS (SELECT
        |  COUNT(*) FILTER (WHERE l_returnflag = 'A') AS n1,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2a,
        |  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n2,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s1b,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) END) AS BIGINT) AS s2b
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R') AND l_orderkey < 30),
        |d AS (SELECT CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |  ((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE) AS vn1,
        |  ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE) AS vn2,
        |  CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |  CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2, n1, n2 FROM g),
        |s AS (SELECT n1, n2,
        |  (vn1 + vn2) * (vn1 + vn2) /
        |    (vn1 * vn1 / (n1d - 1.0) + vn2 * vn2 / (n2d - 1.0)) AS dof,
        |  (m1 - m2) / sqrt(vn1 + vn2) AS t_stat FROM d)
        |SELECT n1, n2, dof, t_stat,
        |  dof / (dof + t_stat * t_stat) AS bx FROM s)""".stripMargin
      val staged = S.sqlBetaincStaged(inner,
        Seq(("w", "(dof / 2.0)", "CAST(0.5 AS DOUBLE)", "bx")),
        Seq("n1", "n2", "dof", "t_stat"))
      s"""SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  round(dof, 6) + CAST(0.0 AS DOUBLE) AS dof,
         |  round(t_stat, 6) + CAST(0.0 AS DOUBLE) AS t_stat,
         |  round(bi_w, 6) + CAST(0.0 AS DOUBLE) AS p_two
         |FROM ($staged)
         |ORDER BY n1""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val df = t(spark, dir, "lineitem").filter($"l_orderkey" < 30)
        .select($"l_returnflag", $"l_quantity".cast("long").as("q"))
      StatTests.ttestInd(df, "q", "l_returnflag", "A", "R", equalVar = false)
        .withColumn("bx", $"dof" / ($"dof" + $"statistic" * $"statistic"))
        .select($"n1", $"n2",
          (round($"dof", 6) + lit(0.0)).as("dof"),
          (round($"statistic", 6) + lit(0.0)).as("t_stat"),
          (round(Special.betaincRegFast(spark, $"dof" / 2.0, lit(0.5), $"bx"), 6)
            + lit(0.0)).as("p_two"))
        .orderBy($"n1")
    },

    // --- Pearson χ² over the order-priority category counts vs the
    //     uniform expectation. Per-category terms are quantized to 1e-6
    //     BIGINTs and integer-summed (order-free) in BOTH engines —
    //     counts are exact in double, so the terms are deterministic
    //     arithmetic and the floor boundary is safe.
    Q("learn_chisquare",
      """WITH o AS (SELECT CAST(COUNT(*) AS DOUBLE) AS obs
        |           FROM orders GROUP BY o_orderpriority),
        |tot AS (SELECT SUM(obs) AS t, CAST(COUNT(*) AS DOUBLE) AS kk,
        |               COUNT(*) AS k FROM o),
        |terms AS (SELECT CAST(floor((obs - t / kk) * (obs - t / kk) / (t / kk)
        |                            * 1e6 + 0.5) AS BIGINT) AS tt, k
        |          FROM o, tot)
        |SELECT CAST(k AS BIGINT) AS k,
        |  round(CAST(SUM(tt) AS BIGINT) / 1e6, 6) + CAST(0.0 AS DOUBLE) AS stat
        |FROM terms GROUP BY k ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val counts = t(spark, dir, "orders")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("obs"))
      StatTests.chisquare(counts, "obs")
        .select($"k", (round($"statistic", 6) + lit(0.0)).as("stat"))
        .orderBy($"k")
    },

    // --- χ² p-value, differentially verified: the learn_chisquare stat
    //     (exact scaled-integer sum — bit-identical double both sides)
    //     fed through the fixed-depth incomplete-gamma composition,
    //     p = Q(dof/2, stat/2). Closes the loop the p-value columns
    //     were spec-only for (StatTests keeps the adaptive forms; this
    //     pins the same value through the oracle gate).
    Q("learn_chisq_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH o AS (SELECT CAST(COUNT(*) AS DOUBLE) AS obs
        |           FROM orders GROUP BY o_orderpriority),
        |tot AS (SELECT SUM(obs) AS t, CAST(COUNT(*) AS DOUBLE) AS kk,
        |               COUNT(*) AS k FROM o),
        |terms AS (SELECT CAST(floor((obs - t / kk) * (obs - t / kk) / (t / kk)
        |                            * 1e6 + 0.5) AS BIGINT) AS tt, k
        |          FROM o, tot),
        |st AS (SELECT k, CAST(SUM(tt) AS BIGINT) / 1e6 AS stat
        |       FROM terms GROUP BY k)
        |SELECT k, stat, CAST(k - 1 AS DOUBLE) / 2.0 AS ga,
        |       stat / 2.0 AS gx FROM st)""".stripMargin
      val staged = S.sqlGammaincPQ(inner, Seq(("c", "ga", "gx")),
        Seq("k", "stat"))
      s"""SELECT CAST(k AS BIGINT) AS k,
         |  round(stat, 6) + CAST(0.0 AS DOUBLE) AS stat,
         |  round(g_q_c, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM ($staged)
         |ORDER BY k""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val counts = t(spark, dir, "orders")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("obs"))
      StatTests.chisquare(counts, "obs")
        .select($"k".cast("long").as("k"),
          (round($"statistic", 6) + lit(0.0)).as("stat"),
          (round(Special.gammaincQFast(spark, $"dof" / 2.0, $"statistic" / 2.0), 6)
            + lit(0.0)).as("p_value"))
        .orderBy($"k")
    },

    // --- G-test (power_divergence λ=0): 2·o·ln(o/e) per category, same
    //     scaled-integer summation; ln is libm but sits inside the 1e-6
    //     floor quantization (the ext_entropy convention)
    Q("learn_gtest",
      """WITH o AS (SELECT CAST(COUNT(*) AS DOUBLE) AS obs
        |           FROM orders GROUP BY o_orderpriority),
        |tot AS (SELECT SUM(obs) AS t, CAST(COUNT(*) AS DOUBLE) AS kk,
        |               COUNT(*) AS k FROM o),
        |terms AS (SELECT CAST(floor(CAST(2.0 AS DOUBLE) * obs * ln(obs / (t / kk))
        |                            * 1e6 + 0.5) AS BIGINT) AS tt, k
        |          FROM o, tot)
        |SELECT CAST(k AS BIGINT) AS k,
        |  round(CAST(SUM(tt) AS BIGINT) / 1e6, 6) + CAST(0.0 AS DOUBLE) AS stat
        |FROM terms GROUP BY k ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val counts = t(spark, dir, "orders")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("obs"))
      StatTests.powerDivergence(counts, "obs", lambda = 0.0)
        .select($"k", (round($"statistic", 6) + lit(0.0)).as("stat"))
        .orderBy($"k")
    },

    // --- G-test p-value: the λ=0 power-divergence stat (exact
    //     scaled-integer sum) through the χ² tail Q(dof/2, G/2) —
    //     completes the power-divergence family's gated p.
    Q("learn_gtest_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH o AS (SELECT CAST(COUNT(*) AS DOUBLE) AS obs
        |           FROM orders GROUP BY o_orderpriority),
        |tot AS (SELECT SUM(obs) AS t, CAST(COUNT(*) AS DOUBLE) AS kk,
        |               COUNT(*) AS k FROM o),
        |terms AS (SELECT CAST(floor(CAST(2.0 AS DOUBLE) * obs * ln(obs / (t / kk))
        |                            * 1e6 + 0.5) AS BIGINT) AS tt, k
        |          FROM o, tot),
        |st AS (SELECT k, CAST(SUM(tt) AS BIGINT) / 1e6 AS stat
        |       FROM terms GROUP BY k)
        |SELECT k, stat, CAST(k - 1 AS DOUBLE) / 2.0 AS ga,
        |       stat / 2.0 AS gx FROM st)""".stripMargin
      val staged = S.sqlGammaincPQ(inner, Seq(("g", "ga", "gx")),
        Seq("k", "stat"))
      s"""SELECT CAST(k AS BIGINT) AS k,
         |  round(stat, 6) + CAST(0.0 AS DOUBLE) AS stat,
         |  round(g_q_g, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM ($staged)
         |ORDER BY k""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val counts = t(spark, dir, "orders")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("obs"))
      StatTests.powerDivergence(counts, "obs", lambda = 0.0)
        .select($"k".cast("long").as("k"),
          (round($"statistic", 6) + lit(0.0)).as("stat"),
          (round(Special.gammaincQFast(spark, $"dof" / 2.0, $"statistic" / 2.0), 6)
            + lit(0.0)).as("p_value"))
        .orderBy($"k")
    },

    // --- two-sample Kolmogorov–Smirnov, A vs R quantity distributions.
    //     The gate is PURE INTEGERS: d_num = D·n1·n2 = max |cum1·n2 −
    //     cum2·n1| — exact in both engines (DuckDB windows go through
    //     HUGEINT internally, output cast BIGINT; Spark goes through
    //     DECIMAL(38)).
    Q("learn_ks2",
      """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS v,
        |    COUNT(*) FILTER (WHERE l_returnflag = 'A') AS c1,
        |    COUNT(*) FILTER (WHERE l_returnflag = 'R') AS c2
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
        |c AS (SELECT SUM(c1) OVER (ORDER BY v) AS f1,
        |             SUM(c2) OVER (ORDER BY v) AS f2 FROM v),
        |n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |             CAST(SUM(c2) AS BIGINT) AS n2 FROM v)
        |SELECT n1, n2, CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS BIGINT) AS d_num
        |FROM c, n GROUP BY n1, n2 ORDER BY n1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val a = li.where($"l_returnflag" === "A").select($"l_quantity".cast("long").as("q"))
      val r = li.where($"l_returnflag" === "R").select($"l_quantity".cast("long").as("q"))
      StatTests.ks2Samp(a, "q", r, "q")
        .select($"n1", $"n2", $"d_num").orderBy($"n1")
    },

    // --- one-sample KS goodness-of-fit vs the uniform(0,51] CDF. The
    //     statistic is a MAX of per-distinct-value deterministic doubles
    //     (exact-integer rank blocks ÷ n) — order-free, identical shape
    //     both sides → round 6.
    Q("learn_ks1",
      """WITH v AS (SELECT CAST(l_quantity AS DOUBLE) AS v, COUNT(*) AS cnt
        |           FROM lineitem GROUP BY 1),
        |b AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum FROM v),
        |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM v)
        |SELECT n, round(MAX(greatest(
        |    CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) - v / CAST(51.0 AS DOUBLE),
        |    v / CAST(51.0 AS DOUBLE)
        |      - (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)) / CAST(n AS DOUBLE))), 6)
        |  + CAST(0.0 AS DOUBLE) AS stat
        |FROM b, n GROUP BY n ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val q = t(spark, dir, "lineitem").select($"l_quantity".cast("double").as("q"))
      StatTests.ks1Samp(q, "q", c => c / lit(51.0).cast("double"))
        .select($"n", (round($"statistic", 6) + lit(0.0)).as("stat"))
        .orderBy($"n")
    },

    // --- one-sample KS p-value: p = kolmogorov_sf(√n·D) on the
    //     unrounded order-free D (max of per-value deterministic
    //     doubles) — the 20-term series mirrored as one fragment.
    Q("learn_ks1_pvalue", {
      val S = graft.functions.Special
      val lam = "(sqrt(CAST(n AS DOUBLE)) * stat)"
      s"""WITH v AS (SELECT CAST(l_quantity AS DOUBLE) AS v, COUNT(*) AS cnt
         |           FROM lineitem GROUP BY 1),
         |b AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum FROM v),
         |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM v),
         |d AS (SELECT n, MAX(greatest(
         |    CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) - v / CAST(51.0 AS DOUBLE),
         |    v / CAST(51.0 AS DOUBLE)
         |      - (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)) / CAST(n AS DOUBLE)))
         |    AS stat
         |  FROM b, n GROUP BY n)
         |SELECT n, round(stat, 6) + CAST(0.0 AS DOUBLE) AS stat,
         |  round(${S.sqlKolmogorovSfFixed(lam)}, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM d ORDER BY n""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val q = t(spark, dir, "lineitem").select($"l_quantity".cast("double").as("q"))
      StatTests.ks1Samp(q, "q", c => c / lit(51.0).cast("double"))
        .select($"n", (round($"statistic", 6) + lit(0.0)).as("stat"),
          (round(Special.kolmogorovSfFixedFast(spark, 
            sqrt($"n".cast("double")) * $"statistic"), 6) + lit(0.0))
            .as("p_value"))
        .orderBy($"n")
    },

    // --- Kendall τ p-value: the no-ties normal approximation
    //     z = 3(c−d)/√(n(n−1)(2n+5)/2) on exact pair counts, p through
    //     Q(½, z²/2) — same tail identity as the Wilcoxon gate.
    Q("learn_kendall_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH s AS (SELECT row_number() OVER () AS rn,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_partkey % 97 AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 120),
        |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
        |p AS (SELECT sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
        |      FROM s a JOIN s b ON a.rn < b.rn),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(COUNT(*) FILTER (sx * sy > 0) AS BIGINT) AS concordant,
        |    CAST(COUNT(*) FILTER (sx * sy < 0) AS BIGINT) AS discordant
        |  FROM p),
        |z AS (SELECT n_pairs, concordant, discordant,
        |    3.0 * (CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
        |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |           * (2.0 * CAST(n AS DOUBLE) + 5.0) / 2.0) AS zz
        |  FROM agg, cnt)
        |SELECT n_pairs, concordant, discordant, zz,
        |    CAST(0.5 AS DOUBLE) AS ga, zz * zz / 2.0 AS gx FROM z)""".stripMargin
      val staged = S.sqlGammaincPQ(inner, Seq(("k", "ga", "gx")),
        Seq("n_pairs", "concordant", "discordant", "zz"))
      s"""SELECT n_pairs, concordant, discordant,
         |  round(zz, 6) + CAST(0.0 AS DOUBLE) AS z,
         |  round(g_q_k, 6) + CAST(0.0 AS DOUBLE) AS p_value
         |FROM ($staged)
         |ORDER BY n_pairs""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      StatTests.kendallTau(
          t(spark, dir, "lineitem").filter($"l_orderkey" < 120)
            .select($"l_quantity".cast("double").as("x"),
              ($"l_partkey" % 97).cast("double").as("y")),
          "x", "y")
        .select($"n_pairs", $"concordant", $"discordant",
          (round($"zstat", 6) + lit(0.0)).as("z"),
          (round(Special.gammaincQFast(spark, lit(0.5), $"zstat" * $"zstat" / 2.0), 6)
            + lit(0.0)).as("p_value"))
        .orderBy($"n_pairs")
    },

    // --- Spearman rank correlation (pandas corr(method='spearman');
    //     Spark upside — the reference tiles Pearson only). Doubled
    //     average ranks make all moment sums exact integers; ρ is the
    //     Pearson closed form over them, identical shape both sides.
    Q("learn_spearman",
      """WITH r AS (SELECT
        |    2 * rank() OVER (ORDER BY CAST(l_quantity AS BIGINT))
        |      + COUNT(*) OVER (PARTITION BY CAST(l_quantity AS BIGINT)) - 1 AS rx,
        |    2 * rank() OVER (ORDER BY l_extendedprice)
        |      + COUNT(*) OVER (PARTITION BY l_extendedprice) - 1 AS ry
        |  FROM lineitem),
        |m AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
        |    CAST(SUM(rx * rx) AS DOUBLE) AS sxx, CAST(SUM(ry * ry) AS DOUBLE) AS syy,
        |    CAST(SUM(rx * ry) AS DOUBLE) AS sxy FROM r)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |        sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
        |             * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
        |    + CAST(0.0 AS DOUBLE) AS rho
        |FROM m ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val df = t(spark, dir, "lineitem")
        .select($"l_quantity".cast("long").as("x"), $"l_extendedprice".as("y"))
      StatTests.spearman(df, "x", "y")
        .select($"n", (round($"statistic", 6) + lit(0.0)).as("rho"))
        .orderBy($"n")
    },

    // --- Spearman p-value: t = ρ√(ν/(1−ρ²)), ν = n−2, through the
    //     fixed-depth incomplete beta (small slice keeps ν/2 ≤ ~60).
    //     ρ replays the exact doubled-rank moment shape.
    Q("learn_spearman_pvalue", {
      val S = graft.functions.Special
      val inner = """(WITH r AS (SELECT
        |    2 * rank() OVER (ORDER BY CAST(l_quantity AS BIGINT))
        |      + COUNT(*) OVER (PARTITION BY CAST(l_quantity AS BIGINT)) - 1 AS rx,
        |    2 * rank() OVER (ORDER BY l_extendedprice)
        |      + COUNT(*) OVER (PARTITION BY l_extendedprice) - 1 AS ry
        |  FROM lineitem WHERE l_orderkey < 30),
        |m AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
        |    CAST(SUM(rx * rx) AS DOUBLE) AS sxx, CAST(SUM(ry * ry) AS DOUBLE) AS syy,
        |    CAST(SUM(rx * ry) AS DOUBLE) AS sxy FROM r),
        |rho AS (SELECT n,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |    sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
        |         * (CAST(n AS DOUBLE) * syy - sy * sy)) AS rho
        |  FROM m),
        |tt AS (SELECT n, rho, CAST(n AS DOUBLE) - 2.0 AS nu,
        |  rho * sqrt((CAST(n AS DOUBLE) - 2.0) / (1.0 - rho * rho)) AS t_stat
        |  FROM rho)
        |SELECT n, rho, nu, t_stat,
        |  nu / (nu + t_stat * t_stat) AS bx FROM tt)""".stripMargin
      val staged = S.sqlBetaincStaged(inner,
        Seq(("r", "(nu / 2.0)", "CAST(0.5 AS DOUBLE)", "bx")),
        Seq("n", "rho"))
      s"""SELECT CAST(n AS BIGINT) AS n,
         |  round(rho, 6) + CAST(0.0 AS DOUBLE) AS rho,
         |  round(bi_r, 6) + CAST(0.0 AS DOUBLE) AS p_two
         |FROM ($staged)
         |ORDER BY n""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val df = t(spark, dir, "lineitem").filter($"l_orderkey" < 30)
        .select($"l_quantity".cast("long").as("x"), $"l_extendedprice".as("y"))
      StatTests.spearman(df, "x", "y")
        .withColumn("nu", $"n".cast("double") - 2.0)
        .withColumn("t_stat", $"statistic" *
          sqrt(($"n".cast("double") - 2.0) / (lit(1.0) - $"statistic" * $"statistic")))
        .withColumn("bx", $"nu" / ($"nu" + $"t_stat" * $"t_stat"))
        .select($"n".cast("long").as("n"),
          (round($"statistic", 6) + lit(0.0)).as("rho"),
          (round(Special.betaincRegFast(spark, $"nu" / 2.0, lit(0.5), $"bx"), 6)
            + lit(0.0)).as("p_two"))
        .orderBy($"n")
    },

    // --- Mann–Whitney U rank-sum, A vs R quantities: the gate is the
    //     EXACT integer 2·U1 = Σ n1v·rank2 − n1(n1+1) over pooled
    //     doubled average ranks (DuckDB HUGEINT internals, BIGINT out)
    Q("learn_mannwhitney",
      """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS v,
        |    COUNT(*) FILTER (WHERE l_returnflag = 'A') AS n1v,
        |    COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n2v
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
        |b AS (SELECT v, n1v, n2v, n1v + n2v AS cnt,
        |    SUM(n1v + n2v) OVER (ORDER BY v) AS cum FROM v),
        |m AS (SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
        |             CAST(SUM(n2v) AS BIGINT) AS n2,
        |             SUM(n1v * (2 * (cum - cnt) + cnt + 1)) AS r1x2 FROM b)
        |SELECT n1, n2, CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u2
        |FROM m ORDER BY n1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val a = li.where($"l_returnflag" === "A").select($"l_quantity".cast("long").as("q"))
      val r = li.where($"l_returnflag" === "R").select($"l_quantity".cast("long").as("q"))
      StatTests.mannWhitneyU(a, "q", r, "q")
        .select($"n1", $"n2", $"u2").orderBy($"n1")
    },

    // --- rankdata average ties, doubled (rank2 = 2·rank, always
    //     integral): tie block at ordinals [b+1, b+c] has average rank
    //     b + (c+1)/2 → rank2 = 2b + c + 1 = 2·rank() + cnt − 1
    Q("learn_rankdata",
      """SELECT CAST(l_orderkey AS BIGINT) AS ok,
        |  CAST(l_linenumber AS BIGINT) AS ln,
        |  CAST(l_partkey AS BIGINT) AS pk,
        |  CAST(l_quantity AS BIGINT) AS q,
        |  CAST(2 * rank() OVER (ORDER BY CAST(l_quantity AS BIGINT))
        |       + COUNT(*) OVER (PARTITION BY CAST(l_quantity AS BIGINT)) - 1
        |       AS BIGINT) AS rank2
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY ok, ln, pk, q""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sub = t(spark, dir, "lineitem").where($"l_orderkey" < 2000)
        .select($"l_orderkey".cast("long").as("ok"), $"l_linenumber".cast("long").as("ln"),
          $"l_partkey".cast("long").as("pk"), $"l_quantity".cast("long").as("q"))
      StatTests.rankdata(sub, "q", "average")
        .select($"ok", $"ln", $"pk", $"q", $"rank2")
        .orderBy($"ok", $"ln", $"pk", $"q")
    },

    // --- rankdata dense ties (distinct-value index)
    Q("learn_rankdata_dense",
      """SELECT CAST(l_orderkey AS BIGINT) AS ok,
        |  CAST(l_linenumber AS BIGINT) AS ln,
        |  CAST(l_partkey AS BIGINT) AS pk,
        |  CAST(l_quantity AS BIGINT) AS q,
        |  CAST(dense_rank() OVER (ORDER BY CAST(l_quantity AS BIGINT))
        |       AS BIGINT) AS rank
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY ok, ln, pk, q""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sub = t(spark, dir, "lineitem").where($"l_orderkey" < 2000)
        .select($"l_orderkey".cast("long").as("ok"), $"l_linenumber".cast("long").as("ln"),
          $"l_partkey".cast("long").as("pk"), $"l_quantity".cast("long").as("q"))
      StatTests.rankdata(sub, "q", "dense")
        .select($"ok", $"ln", $"pk", $"q", $"rank")
        .orderBy($"ok", $"ln", $"pk", $"q")
    }
  )
}
