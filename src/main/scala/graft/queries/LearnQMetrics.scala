package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.learn.{Datasets, Distance, LabelProp, Learn, StatTests}

/** Learn-module queries, metrics family (SURVEY §2.15 learn/metrics):
  * confusion/P-R-F/ROC/PR curves, AUC variants, calibration, retrieval,
  * kappa/MCC, log-loss, get_scorer dispatch. Split out of the
  * monolithic LearnQ in r12 (registry hygiene).
  */
object LearnQMetrics {

  val all: Vector[Q] = Vector(

    // --- classification metrics: per-class precision/recall/F1 from one
    //     confusion pass. Labels and predictions come from deterministic
    //     rules so both engines build the identical matrix; the ratios are
    //     single divisions of exact counts (bit-exact), f1 rounds (chained
    //     float arithmetic).
    Q("learn_confusion",
      """WITH d AS (
        |  SELECT CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS label,
        |         CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS pred
        |  FROM lineitem),
        |cm AS (SELECT label, pred, COUNT(*) AS n FROM d GROUP BY label, pred),
        |tp AS (SELECT label AS cls, n AS tp FROM cm WHERE label = pred),
        |act AS (SELECT label AS cls, SUM(n) AS support FROM cm GROUP BY label),
        |prd AS (SELECT pred AS cls, SUM(n) AS n_pred FROM cm GROUP BY pred)
        |SELECT act.cls, CAST(act.support AS BIGINT) AS support,
        |  CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(prd.n_pred AS DOUBLE) AS precision,
        |  CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(act.support AS DOUBLE) AS recall,
        |  round(CAST(2.0 AS DOUBLE)
        |        * (CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(prd.n_pred AS DOUBLE))
        |        * (CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(act.support AS DOUBLE))
        |        / ((CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(prd.n_pred AS DOUBLE))
        |           + (CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(act.support AS DOUBLE))),
        |    6) + CAST(0.0 AS DOUBLE) AS f1
        |FROM act
        |JOIN prd ON act.cls = prd.cls
        |LEFT JOIN tp ON act.cls = tp.cls
        |ORDER BY act.cls""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "lineitem").select(
        when($"l_discount" > 0.05, "hi").otherwise("lo").as("label"),
        when($"l_quantity" > 25, "hi").otherwise("lo").as("pred"))
      Learn.classificationReport(d, "label", "pred")
        .withColumn("f1", round($"f1", 6) + lit(0.0))
        .orderBy($"cls")
    },

    // --- Matthews correlation + balanced accuracy (sklearn
    //     matthews_corrcoef / balanced_accuracy_score): confusion counts
    //     exact, MCC one sqrt over exact products (unrounded), balanced
    //     accuracy folds per-class recalls in sorted class order.
    Q("learn_mcc", {
      val u1 = graft.functions.PortableHash.sqlUniform01("c_custkey")
      val u2 = graft.functions.PortableHash.sqlUniform01("c_custkey + 777")
      s"""WITH b AS (SELECT
         |    CASE WHEN u1 < 0.3 THEN 1 ELSE 0 END AS y,
         |    CASE WHEN (u1 < 0.3 AND u2 < 0.8) OR (u1 >= 0.3 AND u2 < 0.2)
         |         THEN 1 ELSE 0 END AS p
         |  FROM (SELECT $u1 AS u1, $u2 AS u2 FROM customer) t),
         |m AS (SELECT
         |    CAST(COUNT(*) FILTER (y = 1 AND p = 1) AS BIGINT) AS tp,
         |    CAST(COUNT(*) FILTER (y = 0 AND p = 0) AS BIGINT) AS tn,
         |    CAST(COUNT(*) FILTER (y = 0 AND p = 1) AS BIGINT) AS fp,
         |    CAST(COUNT(*) FILTER (y = 1 AND p = 0) AS BIGINT) AS fn
         |  FROM b),
         |pc AS (SELECT CAST(y AS VARCHAR) AS c, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(COUNT(*) FILTER (y = p) AS BIGINT) AS hit
         |       FROM b GROUP BY y),
         |ba AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
         |       list_sum(list(CAST(hit AS DOUBLE) / CAST(n AS DOUBLE)
         |                     ORDER BY c)) / CAST(COUNT(*) AS DOUBLE) AS bacc
         |       FROM pc)
         |SELECT tp, tn, fp, fn,
         |  CASE WHEN (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
         |         * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
         |         * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
         |         * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)) > 0
         |    THEN (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
         |          - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
         |      / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
         |         * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
         |         * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
         |         * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)))
         |    ELSE 0.0 END AS mcc,
         |  n_classes, bacc
         |FROM m, ba ORDER BY tp""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.PortableHash
      val b = t(spark, dir, "customer").select(
        PortableHash.uniform01($"c_custkey").as("u1"),
        PortableHash.uniform01($"c_custkey" + 777L).as("u2"))
        .select(
          when($"u1" < 0.3, 1).otherwise(0).as("y"),
          when(($"u1" < 0.3 && $"u2" < 0.8) ||
            ($"u1" >= 0.3 && $"u2" < 0.2), 1).otherwise(0).as("p"))
      Learn.matthewsCorr(b, "y", "p")
        .crossJoin(Learn.balancedAccuracy(b, "y", "p"))
        .select($"tp", $"tn", $"fp", $"fn", $"mcc", $"n_classes",
          $"balanced_accuracy".as("bacc"))
        .orderBy($"tp")
    },

    // --- calibration curve (sklearn calibration_curve, uniform bins):
    //     probabilities from the portable uniform, labels from a
    //     deterministic threshold rule; per-bin positive fraction is an
    //     exact rational and the mean prediction goes through
    //     1e-6-scaled BIGINT sums — every output deterministic.
    Q("learn_calibration",
      s"""WITH b AS (SELECT
         |    ${graft.functions.PortableHash.sqlUniform01("c_custkey")} AS p,
         |    CASE WHEN ${graft.functions.PortableHash.sqlUniform01("c_custkey + 1000000")}
         |              < ${graft.functions.PortableHash.sqlUniform01("c_custkey")}
         |         THEN 1 ELSE 0 END AS y
         |  FROM customer),
         |g AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
         |    CAST(y AS BIGINT) AS y,
         |    CAST(floor(p * 1000000.0 + 0.5) AS BIGINT) AS ps
         |  FROM b)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(y) AS BIGINT) AS n_pos,
         |  CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_positive,
         |  CAST(SUM(ps) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
         |    AS mean_predicted
         |FROM g GROUP BY bin ORDER BY bin""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.PortableHash
      val b = t(spark, dir, "customer").select(
        PortableHash.uniform01($"c_custkey").as("p"),
        when(PortableHash.uniform01($"c_custkey" + 1000000L) <
          PortableHash.uniform01($"c_custkey"), 1).otherwise(0).as("y"))
      Learn.calibrationCurve(b, "p", "y", nBins = 10)
        .orderBy($"bin")
    },

    // --- retrieval metrics (sklearn ndcg + the IR P@k/R@k/MRR trio —
    //     the evaluation half of the ANN stack): deterministic rank
    //     tiebreaks, exact-rational precision/recall/mrr (unrounded),
    //     DCG folds in rank order with round-6 at the end (per-row
    //     log2 is libm).
    Q("learn_retrieval",
      """WITH c AS (SELECT user_id, event_id, value AS score,
        |    CASE WHEN event_id % 3 = 0 THEN 2.0
        |         WHEN event_id % 5 = 0 THEN 1.0 ELSE 0.0 END AS rel
        |  FROM events WHERE user_id < 40),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY score DESC, event_id) AS rk,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY rel DESC, event_id) AS rki
        |  FROM c),
        |a AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_candidates,
        |    CAST(COUNT(*) FILTER (rel > 0) AS BIGINT) AS n_relevant,
        |    CAST(COUNT(*) FILTER (rk <= 5 AND rel > 0) AS BIGINT) AS hits,
        |    min(CASE WHEN rel > 0 THEN rk END) AS first,
        |    list_sum(list(rel / log2(CAST(rk AS DOUBLE) + 1.0) ORDER BY rk)
        |      FILTER (rk <= 5)) AS dcg,
        |    list_sum(list(rel / log2(CAST(rki AS DOUBLE) + 1.0) ORDER BY rki)
        |      FILTER (rki <= 5)) AS idcg
        |  FROM r GROUP BY user_id)
        |SELECT user_id, n_candidates, n_relevant,
        |  CAST(hits AS DOUBLE) / 5.0 AS precision_at_k,
        |  CASE WHEN n_relevant > 0
        |       THEN CAST(hits AS DOUBLE) / CAST(n_relevant AS DOUBLE)
        |       ELSE 0.0 END AS recall_at_k,
        |  CASE WHEN first IS NOT NULL THEN 1.0 / CAST(first AS DOUBLE)
        |       ELSE 0.0 END AS mrr,
        |  round(dcg, 6) + CAST(0.0 AS DOUBLE) AS dcg_at_k,
        |  round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6)
        |    + CAST(0.0 AS DOUBLE) AS ndcg_at_k
        |FROM a ORDER BY user_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "events").filter($"user_id" < 40)
        .select($"user_id", $"event_id", $"value".as("score"),
          when($"event_id" % 3 === 0, 2.0)
            .when($"event_id" % 5 === 0, 1.0).otherwise(0.0).as("rel"))
      Learn.retrievalMetrics(c, "user_id", "event_id", "score", "rel", k = 5)
        .select($"user_id", $"n_candidates", $"n_relevant",
          $"precision_at_k", $"recall_at_k", $"mrr",
          (round($"dcg_at_k", 6) + lit(0.0)).as("dcg_at_k"),
          (round($"ndcg_at_k", 6) + lit(0.0)).as("ndcg_at_k"))
        .orderBy($"user_id")
    },

    // --- sklearn type_of_target dispatch (reference
    //     mars/learn/utils/multiclass.py): three live targets classified
    //     from their own aggregates on both sides — fractional values →
    //     continuous, ≤2 distinct → binary, else multiclass.
    Q("learn_type_of_target",
      """SELECT target, kind FROM (
        |  SELECT 'acctbal' AS target, CASE
        |    WHEN (SELECT max(CASE WHEN c_acctbal <> floor(c_acctbal)
        |                     THEN 1 ELSE 0 END) FROM customer) = 1
        |      THEN 'continuous'
        |    WHEN (SELECT COUNT(DISTINCT c_acctbal) FROM customer) <= 2
        |      THEN 'binary' ELSE 'multiclass' END AS kind
        |  UNION ALL
        |  SELECT 'nationkey', CASE
        |    WHEN (SELECT max(CASE WHEN c_nationkey <> floor(c_nationkey)
        |                     THEN 1 ELSE 0 END) FROM customer) = 1
        |      THEN 'continuous'
        |    WHEN (SELECT COUNT(DISTINCT c_nationkey) FROM customer) <= 2
        |      THEN 'binary' ELSE 'multiclass' END
        |  UNION ALL
        |  SELECT 'parity', CASE
        |    WHEN (SELECT COUNT(DISTINCT c_custkey % 2) FROM customer) <= 2
        |      THEN 'binary' ELSE 'multiclass' END) t
        |ORDER BY target""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cust = t(spark, dir, "customer")
      val withParity = cust.withColumn("parity", $"c_custkey" % 2)
      Seq(
        ("acctbal", Learn.typeOfTarget(cust, "c_acctbal")),
        ("nationkey", Learn.typeOfTarget(cust, "c_nationkey")),
        ("parity", Learn.typeOfTarget(withParity, "parity")))
        .toDF("target", "kind").orderBy($"target")
    },

    // --- exact AUC-ROC (reference learn/metrics/_ranking.py roc_auc_score):
    //     the scale-safe grouped rank-sum form. Ranks and rank sums are
    //     exact multiples of 0.5 (exactly representable, order-independent
    //     sums), so the final division is ONE deterministic IEEE op —
    //     bit-exact with no rounding.
    Q("learn_auc",
      """WITH e AS (SELECT CAST(label % 2 AS DOUBLE) AS y, embedding[1] AS s
        |           FROM embeddings),
        |b AS (SELECT s, SUM(y) AS pos, CAST(COUNT(*) AS DOUBLE) AS n
        |      FROM e GROUP BY s),
        |r AS (SELECT s, pos, n,
        |             COALESCE(SUM(n) OVER (ORDER BY s
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               CAST(0.0 AS DOUBLE)) AS before
        |      FROM b)
        |SELECT (SUM(pos * (before + (n + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE)))
        |        - SUM(pos) * (SUM(pos) + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
        |       / (SUM(pos) * (SUM(n) - SUM(pos))) AS auc
        |FROM r""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.aucRocGrouped(
        t(spark, dir, "embeddings")
          .select(($"label" % 2).as("y"), element_at($"embedding", 1).as("s")),
        "y", "s")
    },

    // --- regression metrics rmse/mae/r2 (reference learn/metrics/
    //     _regression.py) from one aggregate; cross-row double sums →
    //     round 4, +0.0 guards r2's possible -0.0000.
    Q("learn_regmetrics",
      """WITH e AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS y,
        |         CAST(25.0 AS DOUBLE)
        |           + CAST(0.5 AS DOUBLE) * CAST(l_partkey % 10 AS DOUBLE) AS pred
        |  FROM lineitem)
        |SELECT
        |  round(sqrt(AVG((y - pred) * (y - pred))), 4) + CAST(0.0 AS DOUBLE) AS rmse,
        |  round(AVG(abs(y - pred)), 4) + CAST(0.0 AS DOUBLE) AS mae,
        |  round(CAST(1.0 AS DOUBLE)
        |      - SUM((y - pred) * (y - pred))
        |        / (SUM(y * y) - SUM(y) * SUM(y) / CAST(COUNT(*) AS DOUBLE)), 4)
        |    + CAST(0.0 AS DOUBLE) AS r2
        |FROM e""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val scored = t(spark, dir, "lineitem")
        .select($"l_quantity".cast("double").as("y"),
          (lit(25.0) + lit(0.5) * ($"l_partkey" % 10).cast("double")).as("pred"))
      Learn.regressionMetrics(scored, "y", "pred")
        .select((round($"rmse", 4) + lit(0.0)).as("rmse"),
          (round($"mae", 4) + lit(0.0)).as("mae"),
          (round($"r2", 4) + lit(0.0)).as("r2"))
    },

    // --- silhouette score by cluster over the planted embedding labels
    //     (sklearn silhouette_score): full all-pairs replay; per-pair
    //     distances differ only in list_sum fold ulps, far below the
    //     cluster separation, so the min-over-labels choice is stable and
    //     round-4 absorbs the rest.
    Q("learn_silhouette",
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings
        |           WHERE vec_id < 200),
        |p AS (SELECT a.vec_id AS id, a.label AS l, b.label AS l2,
        |        sqrt(list_sum(list_transform(range(1, 65),
        |          i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
        |             * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))) AS d
        |      FROM e a JOIN e b ON a.vec_id != b.vec_id),
        |m AS (SELECT id, l, l2, AVG(d) AS md FROM p GROUP BY id, l, l2),
        |own AS (SELECT id, md AS a FROM m WHERE l = l2),
        |nst AS (SELECT id, l, MIN(md) AS b FROM m WHERE l != l2 GROUP BY id, l),
        |s AS (SELECT nst.l, CASE WHEN own.a IS NULL THEN CAST(0.0 AS DOUBLE)
        |                         ELSE (nst.b - own.a) / greatest(own.a, nst.b) END AS s
        |      FROM nst LEFT JOIN own USING (id))
        |SELECT l AS label, CAST(COUNT(*) AS BIGINT) AS n,
        |       round(AVG(s), 4) + CAST(0.0 AS DOUBLE) AS mean_s
        |FROM s GROUP BY l ORDER BY label""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.silhouetteByCluster(
          t(spark, dir, "embeddings").filter($"vec_id" < 200),
          "vec_id", "embedding", "label")
        .select($"label", $"n",
          (round($"mean_s", 4) + lit(0.0)).as("mean_s"))
        .orderBy($"label")
    },

    // --- discrete mutual information (sklearn mutual_info_score): one
    //     joint-count aggregate + marginals; Σ over cells → round 4.
    Q("learn_mutual_info",
      """WITH j AS (SELECT c_mktsegment AS x,
        |                  CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS y,
        |                  CAST(COUNT(*) AS BIGINT) AS nxy
        |           FROM customer GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM j GROUP BY x),
        |my AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM j GROUP BY y),
        |n AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM j)
        |SELECT round(SUM((CAST(nxy AS DOUBLE) / CAST(n.n AS DOUBLE))
        |    * ln((CAST(n.n AS DOUBLE) * CAST(nxy AS DOUBLE))
        |          / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))), 4)
        |  + CAST(0.0 AS DOUBLE) AS mi
        |FROM j JOIN mx USING (x) JOIN my USING (y), n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val labeled = t(spark, dir, "customer")
        .select($"c_mktsegment".as("x"),
          when($"c_acctbal" >= 0, lit("pos")).otherwise(lit("neg")).as("y"))
      Learn.mutualInfo(labeled, "x", "y")
        .select((round($"mi", 4) + lit(0.0)).as("mi"))
    },

    // --- Cohen's kappa (sklearn cohen_kappa_score): every term is an
    //     exact integer ratio — engine-deterministic, no rounding.
    Q("learn_kappa",
      """WITH l AS (SELECT CASE WHEN l_quantity >= 25 THEN 'hi' ELSE 'lo' END AS a,
        |                  CASE WHEN l_extendedprice >= 25000 THEN 'hi' ELSE 'lo' END AS b
        |           FROM lineitem),
        |cm AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM l GROUP BY a, b),
        |po AS (SELECT CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS agree,
        |              CAST(SUM(n) AS BIGINT) AS total FROM cm),
        |ma AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM cm GROUP BY a),
        |mb AS (SELECT b AS a, CAST(SUM(n) AS BIGINT) AS nb FROM cm GROUP BY b),
        |pe AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS cross_ FROM ma JOIN mb USING (a))
        |SELECT (CAST(agree AS DOUBLE) / CAST(total AS DOUBLE)
        |        - CAST(cross_ AS DOUBLE) / CAST(total * total AS DOUBLE))
        |       / (CAST(1.0 AS DOUBLE)
        |          - CAST(cross_ AS DOUBLE) / CAST(total * total AS DOUBLE)) AS kappa
        |FROM po, pe""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val labeled = t(spark, dir, "lineitem")
        .select(when($"l_quantity" >= 25, lit("hi")).otherwise(lit("lo")).as("a"),
          when($"l_extendedprice" >= 25000, lit("hi")).otherwise(lit("lo")).as("b"))
      Learn.cohenKappa(labeled, "a", "b")
    },

    // --- binary log-loss + Brier score (sklearn log_loss/brier_score):
    //     deterministic planted probabilities (exact rationals), per-row
    //     ln terms are the deterministic-libm class, the cross-row mean
    //     sums exact scaled integers on BOTH sides — bit-exact, no
    //     rounding.
    Q("learn_probmetrics",
      """WITH d AS (
        |  SELECT CASE WHEN c_acctbal > 0 THEN CAST(1.0 AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS y,
        |         CAST(c_custkey % 97 + 1 AS DOUBLE) / CAST(99.0 AS DOUBLE) AS p
        |  FROM customer)
        |SELECT
        |  CAST(CAST(SUM(CAST(floor(
        |      (-((y * ln(p)) + ((CAST(1.0 AS DOUBLE) - y)
        |         * ln(CAST(1.0 AS DOUBLE) - p))))
        |      * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS log_loss,
        |  CAST(CAST(SUM(CAST(floor(
        |      ((p - y) * (p - y))
        |      * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS brier
        |FROM d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "customer").select(
        when($"c_acctbal" > 0, 1.0).otherwise(0.0).as("y"),
        (($"c_custkey" % 97 + 1).cast("double") / lit(99.0)).as("p"))
      Learn.probMetrics(d, "y", "p")
    },

    // --- metrics roc_curve (reference _ranking.py:624): one row per
    //     distinct score, cumulative TP/FP descending; fpr/tpr are exact
    //     long/long rationals — unrounded on both sides (no float sums
    //     anywhere: counts are integers, one division per cell)
    Q("learn_roc_curve",
      s"""WITH d AS (
         |  SELECT CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS y,
         |         ${graft.functions.PortableHash.sqlUniform01("c_custkey")} AS s
         |  FROM customer WHERE c_custkey < 2000),
         |g AS (SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
         |             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
         |      FROM d GROUP BY s),
         |t AS (SELECT CAST(SUM(y) AS BIGINT) AS npos,
         |             CAST(COUNT(*) - SUM(y) AS BIGINT) AS nneg FROM d),
         |c AS (SELECT s, SUM(pos) OVER (ORDER BY s DESC) AS tps,
         |             SUM(neg) OVER (ORDER BY s DESC) AS fps FROM g)
         |SELECT s AS threshold,
         |  CAST(fps AS DOUBLE) / CAST(nneg AS DOUBLE) AS fpr,
         |  CAST(tps AS DOUBLE) / CAST(npos AS DOUBLE) AS tpr
         |FROM c, t ORDER BY threshold""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "customer").filter($"c_custkey" < 2000)
        .select(when($"c_custkey" % 3 === 0, 1L).otherwise(0L).as("y"),
          graft.functions.PortableHash.uniform01($"c_custkey").as("s"))
      Learn.rocCurve(d, "y", "s")
        .orderBy($"threshold")
    },

    // --- metrics precision_recall_curve (_ranking.py): same staircase,
    //     precision/recall as exact rationals, unrounded
    Q("learn_pr_curve",
      s"""WITH d AS (
         |  SELECT CASE WHEN c_custkey % 4 = 0 THEN 1 ELSE 0 END AS y,
         |         ${graft.functions.PortableHash.sqlUniform01("c_custkey")} AS s
         |  FROM customer WHERE c_custkey < 1500),
         |g AS (SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
         |             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
         |      FROM d GROUP BY s),
         |t AS (SELECT CAST(SUM(y) AS BIGINT) AS npos FROM d),
         |c AS (SELECT s, SUM(pos) OVER (ORDER BY s DESC) AS tps,
         |             SUM(neg) OVER (ORDER BY s DESC) AS fps FROM g)
         |SELECT s AS threshold,
         |  CAST(tps AS DOUBLE) / CAST(tps + fps AS DOUBLE) AS precision,
         |  CAST(tps AS DOUBLE) / CAST(npos AS DOUBLE) AS recall
         |FROM c, t ORDER BY threshold""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "customer").filter($"c_custkey" < 1500)
        .select(when($"c_custkey" % 4 === 0, 1L).otherwise(0L).as("y"),
          graft.functions.PortableHash.uniform01($"c_custkey").as("s"))
      Learn.precisionRecallCurve(d, "y", "s")
        .orderBy($"threshold")
    },

    // --- metrics average_precision_score: step-sum over the PR staircase.
    //     Every term is identical-shape double arithmetic over exact
    //     BIGINT counts on both sides; the cross-threshold sum is an
    //     ordered fold (threshold-descending = k ascending), so the scalar
    //     compares bit-exact with NO rounding (ordered-fold convention,
    //     see learn_label_prop).
    Q("learn_avg_precision",
      s"""WITH d AS (
         |  SELECT CASE WHEN c_custkey % 4 = 0 THEN 1 ELSE 0 END AS y,
         |         ${graft.functions.PortableHash.sqlUniform01("c_custkey")} AS s
         |  FROM customer WHERE c_custkey < 1500),
         |g AS (SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
         |             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
         |      FROM d GROUP BY s),
         |t AS (SELECT CAST(SUM(y) AS BIGINT) AS npos FROM d),
         |c AS (SELECT s, pos, SUM(pos) OVER (ORDER BY s DESC) AS tps,
         |             SUM(neg) OVER (ORDER BY s DESC) AS fps FROM g),
         |terms AS (SELECT -s AS k,
         |  CAST(pos AS DOUBLE) / CAST(npos AS DOUBLE) *
         |    (CAST(tps AS DOUBLE) / CAST(tps + fps AS DOUBLE)) AS term
         |  FROM c, t)
         |SELECT list_sum(list(term ORDER BY k)) AS avg_precision
         |FROM terms""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "customer").filter($"c_custkey" < 1500)
        .select(when($"c_custkey" % 4 === 0, 1L).otherwise(0L).as("y"),
          graft.functions.PortableHash.uniform01($"c_custkey").as("s"))
      Learn.averagePrecision(d, "y", "s")
    },

    // --- metrics precision_recall_fscore_support (_classification.py:690):
    //     per-class P/R/Fβ/support, β=0.5, 3×3 confusion over lineitem.
    //     precision/recall are exact long/long rationals (unrounded); fbeta
    //     is identical-shape chained arithmetic over them → round 6 per
    //     convention (β²=0.25 and 1+β²=1.25 are exact binary literals,
    //     CAST to DOUBLE — DuckDB bare decimals are DECIMAL)
    Q("learn_prf_support",
      """WITH d AS (
        |  SELECT CASE WHEN l_quantity <= 17 THEN 'a'
        |              WHEN l_quantity <= 34 THEN 'b' ELSE 'c' END AS label,
        |         CASE WHEN l_partkey % 50 <= 17 THEN 'a'
        |              WHEN l_partkey % 50 <= 34 THEN 'b' ELSE 'c' END AS pred
        |  FROM lineitem),
        |cm AS (SELECT label, pred, COUNT(*) AS n FROM d GROUP BY label, pred),
        |tp AS (SELECT label AS cls, n AS tp FROM cm WHERE label = pred),
        |act AS (SELECT label AS cls, SUM(n) AS support FROM cm GROUP BY label),
        |prd AS (SELECT pred AS cls, SUM(n) AS n_pred FROM cm GROUP BY pred),
        |pc AS (SELECT act.cls AS cls,
        |         CAST(COALESCE(act.support, 0) AS BIGINT) AS support,
        |         CASE WHEN COALESCE(prd.n_pred, 0) > 0
        |              THEN CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(prd.n_pred AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS precision,
        |         CASE WHEN COALESCE(act.support, 0) > 0
        |              THEN CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(act.support AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS recall
        |       FROM act
        |       FULL OUTER JOIN prd ON act.cls = prd.cls
        |       LEFT JOIN tp ON act.cls = tp.cls)
        |SELECT cls, support, precision, recall,
        |  round(CASE WHEN CAST(0.25 AS DOUBLE) * precision + recall > CAST(0.0 AS DOUBLE)
        |             THEN CAST(1.25 AS DOUBLE) * precision * recall
        |                  / (CAST(0.25 AS DOUBLE) * precision + recall)
        |             ELSE CAST(0.0 AS DOUBLE) END, 6) AS fbeta
        |FROM pc ORDER BY cls""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "lineitem").select(
        when($"l_quantity" <= 17, "a").when($"l_quantity" <= 34, "b")
          .otherwise("c").as("label"),
        when($"l_partkey" % 50 <= 17, "a").when($"l_partkey" % 50 <= 34, "b")
          .otherwise("c").as("pred"))
      Learn.prfSupport(d, "label", "pred", beta = 0.5)
        .withColumn("fbeta", round($"fbeta", 6))
        .orderBy($"cls")
    },

    // --- metrics precision/recall/fbeta_score with average= macro/micro/
    //     weighted (_classification.py:955–1341): cross-class sums are
    //     ordered folds in class order (bit-exact unrounded, ordered-fold
    //     convention); micro is one exact global rational
    Q("learn_prf_averaged",
      """WITH d AS (
        |  SELECT CASE WHEN l_quantity <= 17 THEN 'a'
        |              WHEN l_quantity <= 34 THEN 'b' ELSE 'c' END AS label,
        |         CASE WHEN l_partkey % 50 <= 17 THEN 'a'
        |              WHEN l_partkey % 50 <= 34 THEN 'b' ELSE 'c' END AS pred
        |  FROM lineitem),
        |cm AS (SELECT label, pred, COUNT(*) AS n FROM d GROUP BY label, pred),
        |tp AS (SELECT label AS cls, n AS tp FROM cm WHERE label = pred),
        |act AS (SELECT label AS cls, SUM(n) AS support FROM cm GROUP BY label),
        |prd AS (SELECT pred AS cls, SUM(n) AS n_pred FROM cm GROUP BY pred),
        |pc AS (SELECT act.cls AS cls,
        |         CAST(COALESCE(act.support, 0) AS BIGINT) AS support,
        |         CASE WHEN COALESCE(prd.n_pred, 0) > 0
        |              THEN CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(prd.n_pred AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS p,
        |         CASE WHEN COALESCE(act.support, 0) > 0
        |              THEN CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(act.support AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS r
        |       FROM act
        |       FULL OUTER JOIN prd ON act.cls = prd.cls
        |       LEFT JOIN tp ON act.cls = tp.cls),
        |pc2 AS (SELECT cls, support, p, r,
        |         CASE WHEN CAST(0.25 AS DOUBLE) * p + r > CAST(0.0 AS DOUBLE)
        |              THEN CAST(1.25 AS DOUBLE) * p * r / (CAST(0.25 AS DOUBLE) * p + r)
        |              ELSE CAST(0.0 AS DOUBLE) END AS f
        |       FROM pc),
        |folds AS (SELECT
        |    CAST(COUNT(*) AS DOUBLE) AS k,
        |    CAST(SUM(support) AS DOUBLE) AS tot,
        |    list_sum(list(p ORDER BY cls)) AS sp,
        |    list_sum(list(r ORDER BY cls)) AS sr,
        |    list_sum(list(f ORDER BY cls)) AS sf,
        |    list_sum(list(CAST(support AS DOUBLE) * p ORDER BY cls)) AS wp,
        |    list_sum(list(CAST(support AS DOUBLE) * r ORDER BY cls)) AS wr,
        |    list_sum(list(CAST(support AS DOUBLE) * f ORDER BY cls)) AS wf
        |  FROM pc2),
        |micro AS (SELECT
        |    CAST(SUM(CASE WHEN label = pred THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS acc FROM d)
        |SELECT 'macro' AS average, sp / k AS precision, sr / k AS recall,
        |       sf / k AS fbeta FROM folds
        |UNION ALL
        |SELECT 'micro', acc, acc, acc FROM micro
        |UNION ALL
        |SELECT 'weighted', wp / tot, wr / tot, wf / tot FROM folds
        |ORDER BY average""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "lineitem").select(
        when($"l_quantity" <= 17, "a").when($"l_quantity" <= 34, "b")
          .otherwise("c").as("label"),
        when($"l_partkey" % 50 <= 17, "a").when($"l_partkey" % 50 <= 34, "b")
          .otherwise("c").as("pred"))
      Learn.prfAveraged(d, "label", "pred", beta = 0.5)
        .orderBy($"average")
    },

    // --- metrics multilabel_confusion_matrix (_classification.py:342):
    //     per-class one-vs-rest (tn, fp, fn, tp) — all exact BIGINTs
    //     (every DuckDB output CAST AS BIGINT: SUM widens to HUGEINT and
    //     propagates through the subtractions)
    Q("learn_multilabel_cm",
      """WITH d AS (
        |  SELECT CASE WHEN l_quantity <= 17 THEN 'a'
        |              WHEN l_quantity <= 34 THEN 'b' ELSE 'c' END AS label,
        |         CASE WHEN l_partkey % 50 <= 17 THEN 'a'
        |              WHEN l_partkey % 50 <= 34 THEN 'b' ELSE 'c' END AS pred
        |  FROM lineitem),
        |cm AS (SELECT label, pred, COUNT(*) AS n FROM d GROUP BY label, pred),
        |tp AS (SELECT label AS cls, n AS tp FROM cm WHERE label = pred),
        |act AS (SELECT label AS cls, SUM(n) AS support FROM cm GROUP BY label),
        |prd AS (SELECT pred AS cls, SUM(n) AS n_pred FROM cm GROUP BY pred),
        |t AS (SELECT COUNT(*) AS n FROM d)
        |SELECT act.cls AS cls,
        |  CAST(t.n - COALESCE(tp.tp, 0)
        |       - (COALESCE(act.support, 0) - COALESCE(tp.tp, 0))
        |       - (COALESCE(prd.n_pred, 0) - COALESCE(tp.tp, 0)) AS BIGINT) AS tn,
        |  CAST(COALESCE(prd.n_pred, 0) - COALESCE(tp.tp, 0) AS BIGINT) AS fp,
        |  CAST(COALESCE(act.support, 0) - COALESCE(tp.tp, 0) AS BIGINT) AS fn,
        |  CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp
        |FROM act
        |FULL OUTER JOIN prd ON act.cls = prd.cls
        |LEFT JOIN tp ON act.cls = tp.cls
        |CROSS JOIN t
        |ORDER BY cls""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "lineitem").select(
        when($"l_quantity" <= 17, "a").when($"l_quantity" <= 34, "b")
          .otherwise("c").as("label"),
        when($"l_partkey" % 50 <= 17, "a").when($"l_partkey" % 50 <= 34, "b")
          .otherwise("c").as("pred"))
      Learn.multilabelConfusion(d, "label", "pred").orderBy($"cls")
    },

    // --- metrics generic auc(x, y) / numpy trapz (_ranking.py:32):
    //     trapezoid terms are identical-shape double arithmetic over
    //     hash-uniform points (distinct x — 60-bit draws over <2k keys),
    //     the cross-row sum an ordered fold in x order → bit-exact
    //     unrounded
    Q("learn_trapz",
      s"""WITH pts AS (
         |  SELECT ${graft.functions.PortableHash.sqlUniform01("c_custkey")} AS x,
         |         ${graft.functions.PortableHash.sqlUniform01("c_custkey + 131071")} AS y
         |  FROM customer WHERE c_custkey < 1200),
         |p AS (SELECT x, y, lag(x) OVER (ORDER BY x) AS px,
         |             lag(y) OVER (ORDER BY x) AS py FROM pts),
         |terms AS (SELECT x, (x - px) * (y + py) / CAST(2.0 AS DOUBLE) AS term
         |          FROM p WHERE px IS NOT NULL)
         |SELECT list_sum(list(term ORDER BY x)) AS auc FROM terms""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val pts = t(spark, dir, "customer").filter($"c_custkey" < 1200)
        .select(
          graft.functions.PortableHash.uniform01($"c_custkey").as("x"),
          graft.functions.PortableHash.uniform01($"c_custkey" + lit(131071))
            .as("y"))
      Learn.trapz(pts, "x", "y")
    },

    // --- metrics accuracy_score with sample_weight + normalize
    //     (_classification.py:136): integer-valued weights → both sums
    //     exact in doubles (order-free) → unrounded compare
    Q("learn_accuracy_weighted",
      """WITH d AS (
        |  SELECT CASE WHEN l_quantity <= 25 THEN 'lo' ELSE 'hi' END AS label,
        |         CASE WHEN l_partkey % 50 <= 25 THEN 'lo' ELSE 'hi' END AS pred,
        |         CAST(l_linenumber AS DOUBLE) AS w
        |  FROM lineitem)
        |SELECT
        |  SUM(CASE WHEN label = pred THEN w ELSE CAST(0.0 AS DOUBLE) END)
        |    / SUM(w) AS accuracy,
        |  SUM(CASE WHEN label = pred THEN w ELSE CAST(0.0 AS DOUBLE) END)
        |    AS hits
        |FROM d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "lineitem").select(
        when($"l_quantity" <= 25, "lo").otherwise("hi").as("label"),
        when($"l_partkey" % 50 <= 25, "lo").otherwise("hi").as("pred"),
        $"l_linenumber".cast("double").as("w"))
      Learn.accuracyWeighted(d, "label", "pred", "w")
        .crossJoin(Learn.accuracyWeighted(d, "label", "pred", "w",
          normalize = false).select($"accuracy".as("hits")))
    },

    // --- metrics multiclass log_loss (_classification.py:206 multiclass
    //     branch): eps-clip → in-row renormalize (ordered fold) → −ln of
    //     the true-class slot; cross-row mean as exact scaled integers
    Q("learn_logloss_multiclass",
      """WITH d AS (
        |  SELECT CAST(label % 3 AS INT) AS lab,
        |    list_transform(embedding[1:3], x ->
        |      least(CAST(1.0 AS DOUBLE) - CAST(1e-15 AS DOUBLE),
        |            greatest(CAST(1e-15 AS DOUBLE), CAST(x AS DOUBLE)))) AS cp
        |  FROM embeddings),
        |t AS (SELECT -ln(cp[lab + 1] / list_sum(cp)) AS term FROM d)
        |SELECT CAST(CAST(SUM(CAST(floor(term * CAST(1000000.0 AS DOUBLE)
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |  / CAST(1000000.0 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |  AS log_loss
        |FROM t""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir, "embeddings")
        .select(($"label" % 3).cast("int").as("lab"),
          slice($"embedding", 1, 3).as("probs"))
      Learn.logLossMulticlass(d, "lab", "probs")
    },

    // --- metrics get_scorer (_scorer.py — the SCORERS registry is
    //     exactly {r2, accuracy, neg_log_loss}): all three resolved
    //     scorers on one slice. accuracy is an exact rational; r2's
    //     sums are exact dyadics (integer-valued y, err = y/2 − 5);
    //     neg_log_loss rides the scaled-integer order-free mean — one
    //     row, UNROUNDED.
    Q("learn_get_scorer",
      """WITH base AS (SELECT
        |    CAST(l_partkey % 3 AS INT) AS lab,
        |    CAST(l_suppkey % 3 AS INT) AS pred,
        |    CAST(l_quantity AS DOUBLE) AS y,
        |    CAST(l_quantity AS DOUBLE) / 2.0 + 5.0 AS yp,
        |    list_transform(
        |      [CAST(l_quantity AS DOUBLE) / 100.0 + 0.05,
        |       CAST(0.3 AS DOUBLE),
        |       (CAST(51.0 AS DOUBLE) - CAST(l_quantity AS DOUBLE)) / 100.0 + 0.05],
        |      x -> least(CAST(1.0 AS DOUBLE) - CAST(1e-15 AS DOUBLE),
        |                 greatest(CAST(1e-15 AS DOUBLE), x))) AS cp
        |  FROM lineitem WHERE l_orderkey < 300),
        |r2 AS (SELECT CAST(1.0 AS DOUBLE) -
        |    SUM((y - yp) * (y - yp)) /
        |    (SUM(y * y) - SUM(y) * SUM(y) / CAST(COUNT(*) AS DOUBLE))
        |    AS score_r2 FROM base),
        |acc AS (SELECT CAST(SUM(CASE WHEN lab = pred THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(COUNT(*) AS DOUBLE) AS score_acc FROM base),
        |t AS (SELECT -ln(cp[lab + 1] / list_sum(cp)) AS term FROM base),
        |nll AS (SELECT -(CAST(CAST(SUM(CAST(floor(term * CAST(1000000.0 AS DOUBLE)
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |  / CAST(1000000.0 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |  AS score_negll FROM t)
        |SELECT score_r2, score_acc, score_negll
        |FROM r2 CROSS JOIN acc CROSS JOIN nll
        |ORDER BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 300)
        .select(($"l_partkey" % 3).cast("int").as("lab"),
          ($"l_suppkey" % 3).cast("int").as("pred"),
          $"l_quantity".cast("double").as("y"),
          ($"l_quantity".cast("double") / 2.0 + 5.0).as("yp"),
          array($"l_quantity".cast("double") / 100.0 + 0.05,
            lit(0.3),
            (lit(51.0) - $"l_quantity".cast("double")) / 100.0 + 0.05)
            .as("probs"))
      val r2 = Learn.getScorer("r2")(base, "y", "yp")
        .select($"score".as("score_r2"))
      val acc = Learn.getScorer("accuracy")(base, "lab", "pred")
        .select($"score".as("score_acc"))
      val nll = Learn.getScorer("neg_log_loss")(base, "lab", "probs")
        .select($"score".as("score_negll"))
      r2.crossJoin(acc).crossJoin(nll)
        .orderBy($"score_r2")
    },

    // --- metrics multiclass roc_auc_score OVR macro (_ranking.py:531):
    //     per-class binary rank AUCs (exact dyadic rank terms — order-free
    //     double sums, the learn_auc argument) + an ordered-fold macro
    //     mean, unrounded
    {
      def aucCte(c: Int): String =
        s"""b$c AS (SELECT s, SUM(y) AS pos, CAST(COUNT(*) AS DOUBLE) AS n
           |  FROM (SELECT CASE WHEN lab = $c THEN CAST(1.0 AS DOUBLE)
           |               ELSE CAST(0.0 AS DOUBLE) END AS y,
           |               sc[${c + 1}] AS s FROM e) y$c GROUP BY s),
           |r$c AS (SELECT s, pos, n,
           |  COALESCE(SUM(n) OVER (ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |    CAST(0.0 AS DOUBLE)) AS before FROM b$c),
           |a$c AS (SELECT '$c' AS cls,
           |  (SUM(pos * (before + (n + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE)))
           |   - SUM(pos) * (SUM(pos) + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
           |  / (SUM(pos) * (SUM(n) - SUM(pos))) AS auc FROM r$c)""".stripMargin
      Q("learn_auc_multiclass",
        s"""WITH e AS (SELECT CAST(label % 3 AS BIGINT) AS lab,
           |    list_transform(embedding[1:3], x -> CAST(x AS DOUBLE)) AS sc
           |  FROM embeddings),
           |${aucCte(0)},
           |${aucCte(1)},
           |${aucCte(2)},
           |percls AS (SELECT cls, auc FROM a0
           |  UNION ALL SELECT cls, auc FROM a1
           |  UNION ALL SELECT cls, auc FROM a2),
           |sup AS (SELECT CAST(lab AS VARCHAR) AS cls, COUNT(*) AS sup
           |  FROM e GROUP BY lab),
           |ps AS (SELECT p.cls, p.auc, COALESCE(s.sup, 0) AS sup
           |  FROM percls p LEFT JOIN sup s ON p.cls = s.cls),
           |avgs AS (SELECT
           |    list_sum(list(auc ORDER BY cls)) AS sa,
           |    list_sum(list(CAST(sup AS DOUBLE) * auc ORDER BY cls)) AS wa,
           |    CAST(SUM(sup) AS DOUBLE) AS tot
           |  FROM ps)
           |SELECT cls, auc FROM percls
           |UNION ALL SELECT 'macro', sa / CAST(3.0 AS DOUBLE) FROM avgs
           |UNION ALL SELECT 'weighted', wa / tot FROM avgs
           |ORDER BY cls""".stripMargin) { (spark, dir) =>
        import spark.implicits._
        val d = t(spark, dir, "embeddings")
          .select(($"label" % 3).as("lab"),
            transform(slice($"embedding", 1, 3), x => x.cast("double"))
              .as("sc"))
        Learn.aucRocMulticlass(d, "lab", "sc", numClasses = 3)
          .orderBy($"cls")
      }
    }
  )
}
