package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.learn.{Datasets, Distance, LabelProp, Learn, StatTests}

/** Learn-module queries (SURVEY §2.15 / M10): model selection, regression,
  * clustering, decomposition, preprocessing, pairwise metrics. Oracles are
  * provided wherever the computation is SQL-expressible (hash split, OLS
  * fit, scaling, pairwise distances); iterative fits with internal
  * randomness (kmeans) or sign/order ambiguity (pca) get deterministic-seed
  * rows-only checks plus closed-form differential tests in
  * src/test/scala/graft/LearnSpec.scala.
  */
object LearnQ {

  val all: Vector[Q] = Vector(

    // --- model_selection: deterministic hash split (reproducible across
    //     engines, unlike seeded randomSplit which is engine-specific);
    //     the oracle replays the identical avalanche-hash bucket
    Q("learn_hash_split",
      s"""SELECT split, COUNT(*) AS n, min(c_custkey) AS first_key
         |FROM (SELECT CASE WHEN ${graft.functions.PortableHash.sqlBucket("c_custkey", 100)} < 20
         |                  THEN 'test' ELSE 'train' END AS split, c_custkey
         |      FROM customer) s
         |GROUP BY split ORDER BY split""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (train, test) = Learn.hashSplit(t(spark, dir, "customer"), "c_custkey", 20)
      train.select(lit("train").as("split"), $"c_custkey")
        .unionAll(test.select(lit("test").as("split"), $"c_custkey"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n"), min($"c_custkey").as("first_key"))
        .orderBy($"split")
    },

    // --- model_selection KFold: deterministic portable-hash fold
    //     assignment; the oracle recomputes every fold id and per-fold
    //     extrema from scratch
    Q("learn_kfold",
      s"""SELECT fold, COUNT(*) AS n, min(c_custkey) AS first_key,
         |       max(c_custkey) AS last_key
         |FROM (SELECT CAST(${graft.functions.PortableHash.sqlBucket("c_custkey", 5)} AS BIGINT)
         |        AS fold, c_custkey
         |      FROM customer) s
         |GROUP BY fold ORDER BY fold""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.kFold(t(spark, dir, "customer"), "c_custkey", 5)
        .groupBy($"fold")
        .agg(count(lit(1)).as("n"), min($"c_custkey").as("first_key"),
          max($"c_custkey").as("last_key"))
        .orderBy($"fold")
    },

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

    // --- linear_model: exact OLS via the normal-equation solver; DuckDB's
    //     regr_slope/regr_intercept compute the same closed form
    Q("learn_linreg",
      """SELECT round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val model = Learn.linearRegressionFit(
        t(spark, dir, "lineitem"), Seq("l_quantity"), "l_extendedprice")
      import spark.implicits._
      Seq((
        BigDecimal(model.coefficients(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(model.intercept).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("slope", "intercept")
    },

    // --- glm, gaussian family + identity link: IRLS converges to the OLS
    //     closed form, so DuckDB's regr_slope/intercept is a FULL oracle
    //     for the GLM fit path (the non-gaussian families share it)
    Q("learn_glm",
      """SELECT round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val model = Learn.glmFit(
        t(spark, dir, "lineitem"), Seq("l_quantity"), "l_extendedprice",
        family = "gaussian")
      Seq((
        BigDecimal(model.coefficients(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(model.intercept).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("slope", "intercept")
    },

    // --- logistic regression on a separable derived label: the class
    //     counts are exact SQL; the fitted model must recover the
    //     separation (accuracy invariant pinned — the fit itself has no
    //     closed form for an external oracle)
    Q("learn_logistic",
      """SELECT (SELECT COUNT(*) FROM customer) AS n,
        |       (SELECT COUNT(*) FILTER (c_acctbal > 5000.0) FROM customer) AS n_pos,
        |       true AS acc_ge_99""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val labeled = t(spark, dir, "customer")
        .withColumn("label", ($"c_acctbal" > 5000.0).cast("double"))
      val model = Learn.logisticRegressionFit(labeled, Seq("c_acctbal"), "label")
      val pred = Learn.logisticPredict(model, labeled, Seq("c_acctbal"))
      pred.agg(
        count(lit(1)).as("n"),
        sum($"label").cast("long").as("n_pos"),
        ((sum(when($"prediction" === $"label", 1L).otherwise(0L)) /
          count(lit(1)).cast("double")) >= 0.99).as("acc_ge_99"))
    },

    // --- preprocessing: column standardization (x - mean) / std
    Q("learn_scaler",
      """SELECT c_custkey,
        |  round((c_acctbal - avg(c_acctbal) OVER ()) / stddev_samp(c_acctbal) OVER (), 6)
        |    AS c_acctbal_scaled
        |FROM customer WHERE c_custkey < 50
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val scaled = Learn.standardScale(
        t(spark, dir, "customer").filter($"c_custkey" < 50), Seq("c_acctbal"))
      scaled.select($"c_custkey", round($"c_acctbal_scaled", 6).as("c_acctbal_scaled"))
        .orderBy($"c_custkey")
    },

    // --- metrics.pairwise: euclidean distance matrix, small side broadcast
    Q("learn_pairwise",
      """SELECT a.vec_id AS aid, b.vec_id AS bid,
        |  round(sqrt(list_sum(list_transform(range(1, 65),
        |    i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
        |         * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) AS dist
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < 5 AND b.vec_id >= 5 AND b.vec_id < 15
        |ORDER BY aid, bid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val a = e.filter($"vec_id" < 5).select($"vec_id".as("aid"), $"embedding".as("avec"))
      val b = e.filter($"vec_id" >= 5 && $"vec_id" < 15)
        .select($"vec_id".as("bid"), $"embedding".as("bvec"))
      Learn.pairwiseDistances(a, b, "euclidean")
        .select($"aid", $"bid", round($"dist", 4).as("dist"))
        .orderBy($"aid", $"bid")
    },

    // --- cluster: kmeans over embeddings. The fit is iterative with
    //     engine-specific init, so the oracle checks deterministic
    //     INVARIANTS instead of centroids: cluster count, total row
    //     conservation, non-empty cells, and the grand-mean SSE (which
    //     DuckDB recomputes exactly from the data) with the kmeans cost
    //     strictly below it. Cluster-recovery correctness stays in
    //     LearnSpec.
    Q("learn_kmeans",
      """SELECT CAST(4 AS BIGINT) AS k_clusters,
        |       (SELECT COUNT(*) FROM embeddings) AS n_rows,
        |       true AS nonempty,
        |       (SELECT round(SUM(ssd), 2) FROM (
        |          SELECT var_pop(CAST(x AS DOUBLE)) * COUNT(*) AS ssd FROM (
        |            SELECT i, embedding[i] AS x
        |            FROM embeddings, (SELECT unnest(range(1, 65)) AS i) dims) e
        |          GROUP BY i) d) AS sse_grand,
        |       true AS sse_improved""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val model = Learn.kmeansFit(e, "embedding", k = 4, seed = 42L)
      val sizes = Learn.kmeansPredict(model, e, "embedding")
        .groupBy($"cluster").agg(count(lit(1)).as("n"))
      val sseKmeans = model.summary.trainingCost
      val grand = e
        .select(posexplode($"embedding").as(Seq("i", "x")))
        .groupBy($"i")
        .agg((var_pop($"x".cast("double")) * count(lit(1))).as("ssd"))
        .agg(round(sum($"ssd"), 2).as("sse_grand"))
      sizes.agg(
          count(lit(1)).as("k_clusters"),
          sum($"n").cast("long").as("n_rows"),
          (min($"n") > 0L).as("nonempty"))
        .crossJoin(broadcast(grand))
        .withColumn("sse_improved", lit(sseKmeans) < $"sse_grand")
        .select($"k_clusters", $"n_rows", $"nonempty", $"sse_grand", $"sse_improved")
    },

    // --- linalg: distributed SVD. Eigen-solver output is not
    //     SQL-expressible, but the full spectrum satisfies an exact
    //     data-side identity DuckDB CAN verify: Σσ² equals the squared
    //     Frobenius norm of the matrix. Closed-form singular-value recovery
    //     stays in LearnSpec.
    Q("learn_svd",
      """SELECT CAST(64 AS BIGINT) AS n_sv,
        |       (SELECT round(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 2)
        |        FROM (SELECT unnest(embedding) AS x FROM embeddings) e) AS frob_sq,
        |       true AS monotonic""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (sv, _) = Learn.svd(t(spark, dir, "embeddings"), "embedding", k = 64)
      Seq((
        sv.length.toLong,
        BigDecimal(sv.map(v => v * v).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        sv.zip(sv.tail).forall { case (a, b) => a >= b }))
        .toDF("n_sv", "frob_sq", "monotonic")
    },

    // --- decomposition: TruncatedSVD (uncentered SVD, transform = X·V).
    //     Component signs are engine-specific, so the oracle checks the
    //     input Frobenius energy exactly (per-element scaled-integer
    //     cents — order-free BIGINT sum, no HUGEINT) and asserts the two
    //     deterministic invariants Spark-side: ‖X·V‖²_F == Σσ² (the
    //     projection captures exactly the top-k energy) and σ desc.
    Q("learn_tsvd",
      """SELECT CAST(4 AS BIGINT) AS n_components,
        |  (SELECT CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |     * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |   FROM (SELECT unnest(embedding) AS x FROM embeddings) e) AS frob_cents,
        |  true AS energy_ok, true AS sv_sorted""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val (proj, sv, _) = Learn.truncatedSvd(e, "embedding", k = 4)
      val projEnergy = proj.select(
        sum(aggregate($"projection", lit(0.0), (acc, x) => acc + x * x)).as("pe"))
        .collect().head.getDouble(0)
      val svEnergy = sv.map(v => v * v).sum
      val frobCents = e.select(
        sum(aggregate($"embedding", lit(0L), (acc, x) =>
          acc + floor(x.cast("double") * x.cast("double") * lit(100.0) +
            lit(0.5)).cast("long"))).as("fc"))
        .collect().head.getLong(0)
      Seq((4L, frobCents,
        math.abs(projEnergy - svEnergy) <= 1e-6 * svEnergy,
        sv.zip(sv.tail).forall { case (a, b) => a >= b }))
        .toDF("n_components", "frob_cents", "energy_ok", "sv_sorted")
    },

    // --- ensemble bagging bootstrap: 4 deterministic Poisson(1)
    //     bootstrap samples in one pass; the oracle replays the portable
    //     uniform and the literal inverse-CDF cutoffs (embedded via
    //     Double.toString's round-trip guarantee, parsed as DOUBLE on
    //     both sides) — counts, weights, and extrema all exact BIGINTs.
    Q("learn_bagging", {
      val cuts = graft.learn.Learn.poissonCdfCuts(1.0)
      val caseArms = cuts.zipWithIndex.map { case (c, i) =>
        s"WHEN u < CAST('$c' AS DOUBLE) THEN $i"
      }.mkString(" ")
      s"""WITH t AS (SELECT c_custkey, unnest(range(4)) AS est
         |  FROM customer WHERE c_custkey < 500),
         |u AS (SELECT c_custkey, est,
         |  ${graft.functions.PortableHash.sqlUniform01("c_custkey * 4 + est")} AS u
         |  FROM t),
         |m AS (SELECT c_custkey, est,
         |  CASE $caseArms ELSE 8 END AS w FROM u)
         |SELECT CAST(est AS BIGINT) AS estimator,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(w) AS BIGINT) AS total_weight,
         |  min(c_custkey) AS first_key
         |FROM m WHERE w >= 1 GROUP BY est ORDER BY estimator""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      Learn.baggingSample(t(spark, dir, "customer").filter($"c_custkey" < 500),
          "c_custkey", nEstimators = 4, lambda = 1.0, seed = 0L)
        .groupBy($"estimator".cast("long").as("estimator"))
        .agg(count(lit(1)).as("n_rows"), sum($"weight").as("total_weight"),
          min($"c_custkey").as("first_key"))
        .orderBy($"estimator")
    },

    // --- decomposition: pca. Eigenvector sign/order is engine-specific, so
    //     the oracle checks the total variance (recomputed exactly by
    //     DuckDB) plus deterministic spectrum invariants: the explained-
    //     variance ratios are sorted, positive, and sum below 1 for k=2.
    //     Variance-recovery correctness stays in LearnSpec.
    Q("learn_pca",
      """SELECT CAST(2 AS BIGINT) AS n_components,
        |       (SELECT round(SUM(vd), 6) FROM (
        |          SELECT var_samp(CAST(x AS DOUBLE)) AS vd FROM (
        |            SELECT i, embedding[i] AS x
        |            FROM embeddings, (SELECT unnest(range(1, 65)) AS i) dims) e
        |          GROUP BY i) d) AS var_total,
        |       true AS evr_sorted,
        |       true AS evr_valid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val model = Learn.pcaFit(e, "embedding", k = 2)
      val evr = model.explainedVariance.toArray
      val varTotal = e
        .select(posexplode($"embedding").as(Seq("i", "x")))
        .groupBy($"i")
        .agg(var_samp($"x".cast("double")).as("vd"))
        .agg(round(sum($"vd"), 6).as("var_total"))
      varTotal.select(
        lit(2L).as("n_components"),
        $"var_total",
        lit(evr(0) >= evr(1)).as("evr_sorted"),
        lit(evr(0) > 0.0 && evr(1) > 0.0 && evr.sum < 1.0).as("evr_valid"))
    },

    // --- pairwise haversine (reference learn/metrics/pairwise/haversine.py):
    //     synthetic degree coordinates derived from customer keys by exact
    //     integer arithmetic, so both engines start from identical doubles;
    //     the great-circle arc rounds to 6 (libm sin/cos/asin).
    Q("learn_haversine",
      """WITH pts AS (SELECT c_custkey,
        |    CAST(c_custkey % 180 - 90 AS DOUBLE) AS lat,
        |    CAST(c_custkey % 360 - 180 AS DOUBLE) AS lon
        |  FROM customer),
        |a AS (SELECT c_custkey AS aid, lat AS alat, lon AS alon FROM pts WHERE c_custkey < 4),
        |b AS (SELECT c_custkey AS bid, lat AS blat, lon AS blon FROM pts
        |      WHERE c_custkey >= 1000 AND c_custkey < 1050)
        |SELECT aid, bid,
        |  round(2.0 * asin(sqrt(
        |    sin(radians(blat - alat) / 2) * sin(radians(blat - alat) / 2)
        |    + cos(radians(alat)) * cos(radians(blat))
        |      * sin(radians(blon - alon) / 2) * sin(radians(blon - alon) / 2))), 6) AS dist
        |FROM a, b ORDER BY aid, bid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val pts = t(spark, dir, "customer").select($"c_custkey",
        ($"c_custkey" % 180 - 90).cast("double").as("lat"),
        ($"c_custkey" % 360 - 180).cast("double").as("lon"))
      val a = pts.filter($"c_custkey" < 4)
        .select($"c_custkey".as("aid"), $"lat".as("alat"), $"lon".as("alon"))
      val b = pts.filter($"c_custkey" >= 1000 && $"c_custkey" < 1050)
        .select($"c_custkey".as("bid"), $"lat".as("blat"), $"lon".as("blon"))
      Learn.haversineDistances(a, b)
        .select($"aid", $"bid", round($"dist", 6).as("dist"))
        .orderBy($"aid", $"bid")
    },

    // --- RBF kernel (reference learn/metrics/pairwise/rbf_kernel.py):
    //     exp(-gamma ||x-y||^2) over the embedding fixture; the oracle
    //     recomputes the squared distance termwise in DOUBLE. round(6)
    //     absorbs the sqrt-then-square ulp of the native euclidean path.
    Q("learn_rbf",
      """SELECT a.vec_id AS aid, b.vec_id AS bid,
        |  round(exp(-(1.0 / 64.0) * list_sum(list_transform(range(1, 65),
        |    i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
        |         * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 6) AS k
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < 3 AND b.vec_id >= 5 AND b.vec_id < 15
        |ORDER BY aid, bid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val a = e.filter($"vec_id" < 3).select($"vec_id".as("aid"), $"embedding".as("avec"))
      val b = e.filter($"vec_id" >= 5 && $"vec_id" < 15)
        .select($"vec_id".as("bid"), $"embedding".as("bvec"))
      Learn.rbfKernel(a, b, gamma = 1.0 / 64.0)
        .select($"aid", $"bid", round($"k", 6).as("k"))
        .orderBy($"aid", $"bid")
    },

    // --- min-max + robust scaling (reference mars/learn preprocessing
    //     minmax_scale / RobustScaler): min/max are exact; the robust
    //     cutoffs (median, IQR) round to 6 first (qcut contract). Scaled
    //     values can round to ±0 near the median → +0.0 on both sides.
    Q("learn_scaler2",
      """WITH s AS (
        |  SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi,
        |         round(quantile_cont(c_acctbal, 0.5), 6) AS md,
        |         round(quantile_cont(c_acctbal, 0.25), 6) AS q1,
        |         round(quantile_cont(c_acctbal, 0.75), 6) AS q3
        |  FROM customer)
        |SELECT c_custkey,
        |  round((c_acctbal - lo) / (hi - lo), 6) + CAST(0.0 AS DOUBLE) AS mm,
        |  round((c_acctbal - md) / (q3 - q1), 6) + CAST(0.0 AS DOUBLE) AS rb
        |FROM customer, s WHERE c_custkey < 300
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // scalers are fitted on the FULL table (like the oracle's aggregate),
      // rows then filtered for the comparison
      val cust = t(spark, dir, "customer")
      val mm = Learn.minMaxScale(cust, Seq("c_acctbal"))
        .select($"c_custkey", $"c_acctbal_scaled".as("mm_raw"))
      val rb = Learn.robustScale(cust, Seq("c_acctbal"))
        .select($"c_custkey", $"c_acctbal_scaled".as("rb_raw"))
      mm.join(rb, Seq("c_custkey"))
        .filter($"c_custkey" < 300)
        .select($"c_custkey",
          (round($"mm_raw", 6) + lit(0.0)).as("mm"),
          (round($"rb_raw", 6) + lit(0.0)).as("rb"))
        .orderBy($"c_custkey")
    },

    // --- row normalize l1/l2/max + MaxAbsScaler (reference
    //     preprocessing/normalize.py:299 and _data.py's scaler family):
    //     every op is IEEE-exact arithmetic (abs/·²/+ in fixed column
    //     order, sqrt, max, one division) on bit-identical inputs, so
    //     the gate compares UNROUNDED doubles.
    Q("learn_normalize",
      """WITH b AS (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS x1,
        |       CAST(c_custkey AS DOUBLE) AS x2,
        |       CAST(c_nationkey AS DOUBLE) AS x3
        |  FROM customer),
        |n AS (SELECT c_custkey, x1, x2, x3,
        |    abs(x1) + abs(x2) + abs(x3) AS n1,
        |    sqrt(x1 * x1 + x2 * x2 + x3 * x3) AS n2,
        |    greatest(greatest(greatest(abs(x1), abs(x2)), abs(x3)),
        |      CAST(0.0 AS DOUBLE)) AS nm
        |  FROM b),
        |m AS (SELECT max(abs(CAST(c_acctbal AS DOUBLE))) AS ma FROM customer)
        |SELECT c_custkey,
        |  x1 / (CASE WHEN n1 = 0 THEN CAST(1.0 AS DOUBLE) ELSE n1 END) AS l1_acct,
        |  x1 / (CASE WHEN n2 = 0 THEN CAST(1.0 AS DOUBLE) ELSE n2 END) AS l2_acct,
        |  x2 / (CASE WHEN n2 = 0 THEN CAST(1.0 AS DOUBLE) ELSE n2 END) AS l2_key,
        |  x1 / (CASE WHEN nm = 0 THEN CAST(1.0 AS DOUBLE) ELSE nm END) AS max_acct,
        |  x1 / (CASE WHEN ma = 0 THEN CAST(1.0 AS DOUBLE) ELSE ma END) AS maxabs_acct
        |FROM n, m WHERE c_custkey < 400 ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val base = t(spark, dir, "customer").select($"c_custkey",
        $"c_acctbal".cast("double").as("x1"),
        $"c_custkey".cast("double").as("x2"),
        $"c_nationkey".cast("double").as("x3"))
      val cols = Seq("x1", "x2", "x3")
      val l1 = Learn.normalizeRows(base, cols, "l1")
        .select($"c_custkey", $"x1_norm".as("l1_acct"))
      val l2 = Learn.normalizeRows(base, cols, "l2")
        .select($"c_custkey", $"x1_norm".as("l2_acct"), $"x2_norm".as("l2_key"))
      val mx = Learn.normalizeRows(base, cols, "max")
        .select($"c_custkey", $"x1_norm".as("max_acct"))
      val ma = Learn.maxAbsScale(base, Seq("x1"))
        .select($"c_custkey", $"x1_scaled".as("maxabs_acct"))
      l1.join(l2, Seq("c_custkey")).join(mx, Seq("c_custkey"))
        .join(ma, Seq("c_custkey"))
        .filter($"c_custkey" < 400)
        .select($"c_custkey", $"l1_acct", $"l2_acct", $"l2_key",
          $"max_acct", $"maxabs_acct")
        .orderBy($"c_custkey")
    },

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
          (round(Special.betaincReg($"fd2" / 2.0, $"fd1" / 2.0, $"bx"), 6)
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
          (round(Special.kolmogorovSfFixed(lam), 6) + lit(0.0)).as("p_value"))
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
          (round(Special.gammaincQ(lit(0.5), $"zstat" * $"zstat" / 2.0), 6)
            + lit(0.0)).as("p_value"))
        .orderBy($"n")
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
          (round(Special.gammaincQ(($"k".cast("double") - 1.0) / 2.0,
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

    // --- ridge regression, closed form (reference mars/learn Ridge
    //     surface): y ~ a + b·x with L2 penalty on the slope, solved as
    //     b = Sxy/(Sxx+λ) over centered sums. The five input sums go
    //     through exact DECIMAL aggregation (bit-identical across
    //     engines); the closed form then replays the same double
    //     arithmetic in the same order on both sides. λ=0 reproduces OLS
    //     (cross-checks learn_linreg's regr_slope).
    Q("learn_ridge",
      """WITH s AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
        |             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
        |             * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem),
        |lam AS (SELECT CAST(unnest([0.0, 1000.0, 100000.0]) AS DOUBLE) AS lambda),
        |fit AS (
        |  SELECT lambda,
        |    (sxy - sx * sy / n) / (sxx - sx * sx / n + lambda) AS slope
        |  FROM s, lam)
        |SELECT f.lambda, round(f.slope, 6) AS slope,
        |       round(s.sy / s.n - f.slope * s.sx / s.n, 6) AS intercept
        |FROM fit f, s ORDER BY f.lambda""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.ridgeSimple(t(spark, dir, "lineitem"),
          dec12($"l_quantity"), dec12($"l_extendedprice"),
          Seq(0.0, 1000.0, 100000.0))
        .select($"lambda", round($"slope", 6).as("slope"),
          round($"intercept", 6).as("intercept"))
        .orderBy($"lambda")
    },

    // --- categorical naive Bayes with Laplace smoothing (reference
    //     mars/learn naive_bayes surface; sklearn CategoricalNB): class
    //     priors + per-(segment, class) likelihoods from integer counts,
    //     scored in log space; prediction = argmax score with ties to the
    //     largest class label (struct-max convention).
    Q("learn_nb",
      """WITH lab AS (
        |  SELECT c_mktsegment AS feature,
        |         CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS cls
        |  FROM customer),
        |joint AS (SELECT feature, cls, COUNT(*) AS n_fc FROM lab GROUP BY feature, cls),
        |classes AS (SELECT cls, COUNT(*) AS n_c FROM lab GROUP BY cls),
        |feats AS (SELECT DISTINCT feature FROM lab),
        |total AS (SELECT SUM(n_c) AS n_total FROM classes),
        |grid AS (SELECT feature, cls, n_c FROM feats, classes),
        |scored AS (
        |  SELECT g.feature, g.cls, COALESCE(j.n_fc, 0) AS count,
        |    ln(CAST(COALESCE(j.n_fc, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      - ln(CAST(g.n_c AS DOUBLE) + CAST(5.0 AS DOUBLE)) AS loglik,
        |    ln(CAST(g.n_c AS DOUBLE)) - ln(CAST(t.n_total AS DOUBLE)) AS logprior
        |  FROM grid g LEFT JOIN joint j ON g.feature = j.feature AND g.cls = j.cls, total t),
        |s2 AS (SELECT feature, cls, count, loglik, loglik + logprior AS score FROM scored),
        |win AS (
        |  SELECT feature, cls AS predicted FROM (
        |    SELECT feature, cls,
        |           row_number() OVER (PARTITION BY feature
        |                              ORDER BY score DESC, cls DESC) AS rk
        |    FROM s2) r WHERE rk = 1)
        |SELECT s2.feature, s2.cls, s2.count,
        |       round(s2.loglik, 6) AS loglik, round(s2.score, 6) AS score,
        |       w.predicted
        |FROM s2 JOIN win w ON s2.feature = w.feature
        |ORDER BY s2.feature, s2.cls""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val labeled = t(spark, dir, "customer")
        .select($"c_mktsegment".as("segment"),
          when($"c_acctbal" >= 0, lit("pos")).otherwise(lit("neg")).as("bal_cls"))
      Learn.naiveBayesCategorical(labeled, "segment", "bal_cls", alpha = 1.0)
        .select($"feature", $"cls", $"count",
          round($"loglik", 6).as("loglik"), round($"score", 6).as("score"),
          $"predicted")
        .orderBy($"feature", $"cls")
    },

    // --- label_binarize (reference learn/preprocessing/_label.py): 0/1
    //     indicator column per class — exact integer output.
    Q("learn_binarize",
      """SELECT vec_id, label,
        |  CAST(CASE WHEN label = 0 THEN 1 ELSE 0 END AS BIGINT) AS label_0,
        |  CAST(CASE WHEN label = 1 THEN 1 ELSE 0 END AS BIGINT) AS label_1,
        |  CAST(CASE WHEN label = 2 THEN 1 ELSE 0 END AS BIGINT) AS label_2,
        |  CAST(CASE WHEN label = 3 THEN 1 ELSE 0 END AS BIGINT) AS label_3
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.labelBinarize(
          t(spark, dir, "embeddings").filter($"vec_id" < 50)
            .select($"vec_id", $"label"),
          "label", Seq(0, 1, 2, 3))
        .orderBy($"vec_id")
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

    // --- distributed COO matmul (reference mt.dot for two large
    //     operands): integer-valued matrices from lineitem × part —
    //     exact BIGINT products, one contraction-key join, one (i,j)
    //     aggregate.
    Q("learn_coo_matmul",
      """WITH a AS (SELECT l_orderkey % 50 AS i, l_partkey % 20 AS k,
        |                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |           FROM lineitem GROUP BY 1, 2),
        |b AS (SELECT p_partkey % 20 AS k, CAST(p_size % 10 AS BIGINT) AS j,
        |             CAST(SUM(p_size) AS BIGINT) AS v
        |      FROM part GROUP BY 1, 2)
        |SELECT a.i, b.j, CAST(SUM(a.v * b.v) AS BIGINT) AS v
        |FROM a JOIN b USING (k) GROUP BY a.i, b.j
        |ORDER BY i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = t(spark, dir, "lineitem")
        .groupBy(($"l_orderkey" % 50).as("i"), ($"l_partkey" % 20).as("k"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
      val b = t(spark, dir, "part")
        .groupBy(($"p_partkey" % 20).as("k"),
          ($"p_size" % 10).cast("long").as("j"))
        .agg(sum($"p_size".cast("long")).as("v"))
      Learn.cooMatmul(a, "i", "k", "v", b, "k", "j", "v")
        .orderBy($"i", $"j")
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

    // --- einsum batch matmul (reference mt.einsum): 'bij,bjk->bik' over
    //     exact integer-valued COO operands — the contraction joins on
    //     (b, j), the reduction keys on (b, i, k); all-BIGINT exact.
    Q("learn_einsum",
      """WITH a AS (SELECT l_linenumber % 2 AS b, l_orderkey % 7 AS i,
        |                  l_partkey % 5 AS j,
        |                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |           FROM lineitem GROUP BY 1, 2, 3),
        |b2 AS (SELECT l_linenumber % 2 AS b, l_partkey % 5 AS j,
        |              l_suppkey % 3 AS k,
        |              CAST(SUM(CAST(l_suppkey AS BIGINT) % 10) AS BIGINT) AS v
        |       FROM lineitem GROUP BY 1, 2, 3)
        |SELECT a.b AS b, a.i, b2.k, CAST(SUM(a.v * b2.v) AS BIGINT) AS v
        |FROM a JOIN b2 ON a.b = b2.b AND a.j = b2.j
        |GROUP BY a.b, a.i, b2.k
        |ORDER BY a.b, i, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val a = li.groupBy(($"l_linenumber" % 2).as("b"),
          ($"l_orderkey" % 7).as("i"), ($"l_partkey" % 5).as("j"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
      val b = li.groupBy(($"l_linenumber" % 2).as("b"),
          ($"l_partkey" % 5).as("j"), ($"l_suppkey" % 3).as("k"))
        .agg(sum($"l_suppkey".cast("long") % 10).as("v"))
      Learn.einsumCoo("bij,bjk->bik", a, b)
        .orderBy($"b", $"i", $"k")
    },

    // --- tensordot with RENAMED contracted axes (reference
    //     mt.tensordot, mars/tensor/linalg/tensordot.py): contract a's
    //     j against b's m — the axis-pairing einsumCoo's shared-letter
    //     contract can't express. Exact integer values throughout.
    Q("learn_tensordot",
      """WITH a AS (SELECT l_orderkey % 6 AS i, l_partkey % 4 AS j,
        |                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |           FROM lineitem GROUP BY 1, 2),
        |b AS (SELECT l_suppkey % 4 AS m, l_orderkey % 5 AS k,
        |             CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS v
        |      FROM lineitem GROUP BY 1, 2)
        |SELECT a.i AS i, b.k AS k, CAST(SUM(a.v * b.v) AS BIGINT) AS v
        |FROM a JOIN b ON a.j = b.m
        |GROUP BY a.i, b.k
        |ORDER BY i, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val a = li.groupBy(($"l_orderkey" % 6).as("i"), ($"l_partkey" % 4).as("j"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
      val b = li.groupBy(($"l_suppkey" % 4).as("m"), ($"l_orderkey" % 5).as("k"))
        .agg(sum($"l_linenumber".cast("long")).as("v"))
      Learn.cooTensordot(a, Seq("i", "j"), b, Seq("m", "k"),
        axes = Seq(("j", "m"))).orderBy($"i", $"k")
    },

    // --- vdot / inner: full contraction of two identically-indexed
    //     sparse matrices to ONE scalar (reference mt.vdot
    //     vdot.py:21 / mt.inner inner.py:21). Implicit-zero semantics
    //     make the inner join exact; BIGINT end-to-end.
    Q("learn_vdot",
      """WITH a AS (SELECT l_orderkey % 7 AS i, l_partkey % 5 AS j,
        |                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |           FROM lineitem GROUP BY 1, 2),
        |b AS (SELECT l_orderkey % 7 AS i, l_partkey % 5 AS j,
        |             CAST(SUM(CAST(l_suppkey AS BIGINT) % 11) AS BIGINT) AS v
        |      FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(SUM(a.v * b.v) AS BIGINT) AS v
        |FROM a JOIN b ON a.i = b.i AND a.j = b.j
        |ORDER BY v""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val a = li.groupBy(($"l_orderkey" % 7).as("i"), ($"l_partkey" % 5).as("j"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
      val b = li.groupBy(($"l_orderkey" % 7).as("i"), ($"l_partkey" % 5).as("j"))
        .agg(sum($"l_suppkey".cast("long") % 11).as("v"))
      Learn.cooVdot(a, Seq("i", "j"), b)
    },

    // --- sparse COO elementwise algebra (reference mt.add / transpose /
    //     scalar multiply over sparse tensors, mars/lib/sparse/): full
    //     outer join on (i,j) with implicit zeros, index-swap transpose
    //     (pure projection), scalar multiply — 2.5·(A + Aᵀ) over an
    //     exact integer-valued matrix; ×2.5 keeps half-steps exact.
    // --- fill_diagonal over a SPARSE COO matrix (reference
    //     tensor/indexing/fill_diagonal.py): present diagonal cells are
    //     overwritten, absent ones INSERTED (numpy writes every [k,k]).
    //     The 40×40 grid is sparse by construction — j = c_nationkey has
    //     no values ≥ 25, so diagonal cells k ≥ 25 always exercise the
    //     anti-join insert path. Integer-exact end-to-end.
    Q("learn_fill_diagonal",
      """WITH m AS (SELECT c_custkey % 40 AS i, c_nationkey AS j,
        |                  CAST(SUM(CAST(c_custkey AS BIGINT) % 100) AS BIGINT) AS v
        |           FROM customer GROUP BY 1, 2),
        |f AS (SELECT i, j, CASE WHEN i = j THEN 7 ELSE v END AS v FROM m
        |      UNION ALL
        |      SELECT r.k, r.k, 7
        |      FROM (SELECT range AS k FROM range(0, 40)) r
        |      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.i = r.k AND m.j = r.k))
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(v AS BIGINT) AS v
        |FROM f ORDER BY i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val m = t(spark, dir, "customer")
        .groupBy(($"c_custkey" % 40).cast("long").as("i"),
          $"c_nationkey".cast("long").as("j"))
        .agg(sum($"c_custkey".cast("long") % 100).as("v"))
      Learn.cooFillDiagonal(m, n = 40L, value = 7.0)
        .select($"i".cast("long").as("i"), $"j".cast("long").as("j"),
          $"v".cast("long").as("v"))
        .orderBy($"i", $"j")
    },

    Q("learn_coo_ops",
      """WITH a AS (SELECT l_orderkey % 13 AS i, l_partkey % 13 AS j,
        |                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |           FROM lineitem GROUP BY 1, 2),
        |tp AS (SELECT j AS i, i AS j, v FROM a),
        |c AS (SELECT i, j,
        |        (CAST(COALESCE(a.v, 0) AS DOUBLE)
        |         + CAST(COALESCE(tp.v, 0) AS DOUBLE)) * CAST(2.5 AS DOUBLE) AS v
        |      FROM a FULL JOIN tp USING (i, j))
        |SELECT i, j, v FROM c WHERE v <> CAST(0.0 AS DOUBLE)
        |ORDER BY i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = t(spark, dir, "lineitem")
        .groupBy(($"l_orderkey" % 13).as("i"), ($"l_partkey" % 13).as("j"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
      Learn.cooScale(Learn.cooAdd(a, Learn.cooTranspose(a)), 2.5)
        .orderBy($"i", $"j")
    },

    // --- axis-0 tensor reductions (reference mt.sum/mean/min/max/var
    //     (axis=0)): one partial+final aggregate keyed by component.
    //     Cross-row double sums → round 4 (+0.0 near-zero guard);
    //     min/max of floats are exact.
    Q("learn_axis_stats",
      """WITH x AS (SELECT CAST(i - 1 AS BIGINT) AS idx, CAST(v AS DOUBLE) AS x
        |           FROM (SELECT unnest(embedding) AS v,
        |                        generate_subscripts(embedding, 1) AS i
        |                 FROM embeddings) t)
        |SELECT idx, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(SUM(x), 4) + CAST(0.0 AS DOUBLE) AS s,
        |  round(AVG(x), 4) + CAST(0.0 AS DOUBLE) AS mean,
        |  min(x) AS mn, max(x) AS mx,
        |  round(var_samp(x), 4) + CAST(0.0 AS DOUBLE) AS vr
        |FROM x GROUP BY idx ORDER BY idx""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.axisStats(t(spark, dir, "embeddings"), "embedding")
        .select($"idx", $"n",
          (round($"sum", 4) + lit(0.0)).as("s"),
          (round($"mean", 4) + lit(0.0)).as("mean"),
          $"mn", $"mx",
          (round($"var", 4) + lit(0.0)).as("vr"))
        .orderBy($"idx")
    },

    // --- matrix norms (mt.linalg.norm ord=fro/inf/1, norm.py:128-168)
    //     over the embeddings row-vector matrix: fro through the
    //     scaled-integer cross-row sum, ∞ a max of per-row ordered
    //     folds (list_sum(list_transform) == the array fold), 1 the
    //     per-position scaled column sums. The σ-based orders
    //     (spectral/nuclear) ride the svd Gramian path — spec-pinned,
    //     not gated (driver-side eigen factor).
    Q("learn_matrix_norms",
      """WITH r AS (SELECT
        |    list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ra,
        |    CAST(floor(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1e6 + 0.5)
        |      AS BIGINT) AS sq
        |  FROM embeddings),
        |fi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    sqrt(CAST(SUM(sq) AS BIGINT) / 1e6) AS fro,
        |    MAX(ra) AS norm_inf FROM r),
        |c AS (SELECT i, CAST(SUM(CAST(floor(abs(CAST(v AS DOUBLE)) * 1e6 + 0.5)
        |        AS BIGINT)) AS BIGINT) AS s
        |  FROM (SELECT unnest(embedding) AS v,
        |               generate_subscripts(embedding, 1) AS i
        |        FROM embeddings) t GROUP BY i),
        |co AS (SELECT CAST(MAX(s) AS DOUBLE) / 1e6 AS norm_one FROM c)
        |SELECT n_rows,
        |  round(fro, 6) + CAST(0.0 AS DOUBLE) AS fro,
        |  round(norm_inf, 6) + CAST(0.0 AS DOUBLE) AS norm_inf,
        |  round(norm_one, 6) + CAST(0.0 AS DOUBLE) AS norm_one
        |FROM fi, co ORDER BY n_rows""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.matrixNorms(t(spark, dir, "embeddings"), "embedding")
        .select($"n_rows",
          (round($"fro", 6) + lit(0.0)).as("fro"),
          (round($"norm_inf", 6) + lit(0.0)).as("norm_inf"),
          (round($"norm_one", 6) + lit(0.0)).as("norm_one"))
        .orderBy($"n_rows")
    },

    // --- per-group OLS (grouped regression trend fit): the closed form
    //     on five moment sums per key, one aggregate; slope/intercept
    //     mirror the identical arithmetic shape → round 4.
    Q("learn_grouped_ols",
      """WITH m AS (SELECT l_returnflag AS k, CAST(COUNT(*) AS DOUBLE) AS n,
        |  SUM(CAST(l_quantity AS DOUBLE)) AS sx,
        |  SUM(CAST(l_extendedprice AS DOUBLE)) AS sy,
        |  SUM(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sxx,
        |  SUM(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS sxy
        | FROM lineitem GROUP BY 1)
        |SELECT k, CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
        |    + CAST(0.0 AS DOUBLE) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
        |    + CAST(0.0 AS DOUBLE) AS intercept
        |FROM m ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Learn.groupedOls(t(spark, dir, "lineitem"),
          "l_returnflag", "l_quantity", "l_extendedprice")
        .select($"l_returnflag".as("k"), $"n",
          (round($"slope", 4) + lit(0.0)).as("slope"),
          (round($"intercept", 4) + lit(0.0)).as("intercept"))
        .orderBy($"k")
    },

    // --- blockwise ensemble (mars/learn/ensemble/_blockwise.py): one
    //     OLS per hash-assigned block, mean-combined regression
    //     prediction (ordered fold over block id — the list_sum(list(v
    //     ORDER BY k)) equivalence) + hard majority vote. Slopes come
    //     from the grouped-OLS moment shape (round 4 precedent); the
    //     per-row mean replays the identical fold; votes are exact
    //     integers.
    Q("learn_blockwise", {
      val blk = graft.functions.PortableHash.sqlBucket("id", 4)
      """WITH tr AS (SELECT l_orderkey * 8 + l_linenumber AS id,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 4000),
        |mo AS (SELECT BLK AS blk, CAST(COUNT(*) AS DOUBLE) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
        |  FROM tr GROUP BY 1),
        |m AS (SELECT blk,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
        |  FROM mo),
        |te AS (SELECT l_orderkey * 8 + l_linenumber AS id,
        |    MIN(CAST(l_quantity AS DOUBLE)) AS x
        |  FROM lineitem WHERE l_orderkey >= 4000 AND l_orderkey < 4600
        |  GROUP BY 1),
        |p AS (SELECT te.id, m.blk, m.intercept + m.slope * te.x AS pred
        |  FROM te CROSS JOIN m)
        |SELECT id,
        |  round(list_sum(list(pred ORDER BY blk)) / 4.0, 4)
        |    + CAST(0.0 AS DOUBLE) AS prediction,
        |  CAST(COUNT(*) FILTER (WHERE pred > 30000.0) AS BIGINT) AS votes_over,
        |  CAST(CASE WHEN COUNT(*) FILTER (WHERE pred > 30000.0) * 2 > 4
        |       THEN 1 ELSE 0 END AS BIGINT) AS vote_label
        |FROM p GROUP BY id ORDER BY id""".stripMargin
        .replace("BLK", blk)
    }) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val id = ($"l_orderkey" * 8 + $"l_linenumber").as("id")
      val train = li.filter($"l_orderkey" < 4000)
        .select(id, $"l_quantity", $"l_extendedprice")
      // (orderkey, linenumber) repeats in the fixture — collapse to one
      // row per id so the fold's tie order can't differ across engines
      val test = li.filter($"l_orderkey" >= 4000 && $"l_orderkey" < 4600)
        .select(id, $"l_quantity")
        .groupBy($"id").agg(min($"l_quantity").as("l_quantity"))
      Learn.blockwiseOls(train, test, "id", "l_quantity", "l_extendedprice",
          nBlocks = 4, threshold = 30000.0)
        .select($"id", (round($"prediction", 4) + lit(0.0)).as("prediction"),
          $"votes_over", $"vote_label".cast("long").as("vote_label"))
        .orderBy($"id")
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
          (round(Special.betaincReg($"nu" / 2.0, lit(0.5), $"bx"), 6) + lit(0.0))
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
          (round(Special.betaincReg($"dof" / 2.0, lit(0.5), $"bx"), 6)
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
          (round(Special.betaincReg($"dof" / 2.0, lit(0.5), $"bx"), 6)
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
          (round(Special.gammaincQ($"dof" / 2.0, $"statistic" / 2.0), 6)
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
          (round(Special.gammaincQ($"dof" / 2.0, $"statistic" / 2.0), 6)
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
          (round(Special.kolmogorovSfFixed(
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
          (round(Special.gammaincQ(lit(0.5), $"zstat" * $"zstat" / 2.0), 6)
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
          (round(Special.betaincReg($"nu" / 2.0, lit(0.5), $"bx"), 6)
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
    },

    // --- scipy.spatial.distance cdist, full metric family (reference
    //     mars/tensor/spatial/distance/cdist.py:211). Every metric is the
    //     same left-fold shape on both sides (zip_with/aggregate vs
    //     list_transform/list_sum), double math throughout. round 6 for
    //     the pure +/*/abs/sqrt folds (deterministic IEEE, identical
    //     shape); round 4 for minkowski (libm pow); cosine/correlation
    //     get the +0.0 guard (1 − sim can round to −0.0); hamming is an
    //     exact BIGINT count
    Q("learn_cdist_metrics",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |           WHERE vec_id < 4),
        |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
        |      WHERE vec_id >= 100 AND vec_id < 115),
        |m AS (
        |  SELECT qid, cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (CAST(qv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE))
        |         * (CAST(qv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))) AS sq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> abs(CAST(qv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))) AS l1,
        |    list_max(list_transform(range(1, 65),
        |      i -> abs(CAST(qv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))) AS linf,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) AS na,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))) AS nc,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN abs(CAST(qv[i] AS DOUBLE)) + abs(CAST(cv[i] AS DOUBLE)) = 0
        |                THEN 0.0
        |                ELSE abs(CAST(qv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE))
        |                   / (abs(CAST(qv[i] AS DOUBLE)) + abs(CAST(cv[i] AS DOUBLE)))
        |           END)) AS canb,
        |    list_sum(list_transform(range(1, 65),
        |      i -> abs(CAST(qv[i] AS DOUBLE) + CAST(cv[i] AS DOUBLE)))) AS sabs,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN CAST(qv[i] AS DOUBLE) <> CAST(cv[i] AS DOUBLE)
        |                THEN 1 ELSE 0 END)) AS BIGINT) AS hamm,
        |    list_sum(list_transform(range(1, 65),
        |      i -> power(abs(CAST(qv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)), 3.0))) AS mk3
        |  FROM q, c)
        |SELECT qid, cid,
        |  round(sqrt(sq), 6) AS euclid,
        |  round(sq, 6) AS sqeuclid,
        |  round(l1, 6) AS cityblock,
        |  round(linf, 6) AS chebyshev,
        |  round(1.0 - dot / (sqrt(na) * sqrt(nc)), 6) + CAST(0.0 AS DOUBLE) AS cosine_d,
        |  round(canb, 6) AS canberra,
        |  round(l1 / sabs, 6) AS braycurtis,
        |  hamm AS hamming_diff,
        |  round(power(mk3, 1.0/3.0), 4) AS minkowski3
        |FROM m ORDER BY qid, cid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val qs = e.filter($"vec_id" < 4)
        .select($"vec_id".as("aid"), $"embedding".as("avec"))
      val cs = e.filter($"vec_id" >= 100 && $"vec_id" < 115)
        .select($"vec_id".as("bid"), $"embedding".as("bvec"))
      def m(name: String) = Distance.metricExpr(name)($"avec", $"bvec")
      Distance.cdist(qs, cs).select(
        $"aid".as("qid"), $"bid".as("cid"),
        round(m("euclidean"), 6).as("euclid"),
        round(m("sqeuclidean"), 6).as("sqeuclid"),
        round(m("cityblock"), 6).as("cityblock"),
        round(m("chebyshev"), 6).as("chebyshev"),
        (round(m("cosine"), 6) + lit(0.0)).as("cosine_d"),
        round(m("canberra"), 6).as("canberra"),
        round(m("braycurtis"), 6).as("braycurtis"),
        Distance.hammingDiffCount($"avec", $"bvec").as("hamming_diff"),
        round(Distance.metricExpr("minkowski", 3.0)($"avec", $"bvec"), 4)
          .as("minkowski3"))
        .orderBy($"qid", $"cid")
    },

    // --- pairwise_distances_topk (pairwise_distances_topk.py:479): k=3
    //     nearest under cityblock — a metric with NO libm in it, so the
    //     ranking keys are bit-identical by construction and the
    //     selection cannot diverge
    Q("learn_pairwise_topk",
      """WITH q AS (SELECT vec_id AS aid, embedding AS qv FROM embeddings
        |           WHERE vec_id < 6),
        |c AS (SELECT vec_id AS bid, embedding AS cv FROM embeddings
        |      WHERE vec_id >= 200 AND vec_id < 240),
        |m AS (
        |  SELECT aid, bid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> abs(CAST(qv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))) AS dist
        |  FROM q, c)
        |SELECT aid, bid, round(dist, 6) AS dist, rank FROM (
        |  SELECT aid, bid, dist,
        |    CAST(row_number() OVER (PARTITION BY aid ORDER BY dist, bid)
        |         AS BIGINT) AS rank
        |  FROM m) r
        |WHERE rank <= 3 ORDER BY aid, rank""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val qs = e.filter($"vec_id" < 6)
        .select($"vec_id".as("aid"), $"embedding".as("avec"))
      val cs = e.filter($"vec_id" >= 200 && $"vec_id" < 240)
        .select($"vec_id".as("bid"), $"embedding".as("bvec"))
      Distance.cdistTopK(qs, cs, k = 3, metric = "cityblock")
        .select($"aid", $"bid", round($"dist", 6).as("dist"),
          $"rank".cast("long").as("rank"))
        .orderBy($"aid", $"rank")
    },

    // --- pdist (condensed upper triangle) expanded back through
    //     squareform: both triangles + explicit zero diagonal (reference
    //     pdist.py / squareform.py). 10 vectors → 45 condensed pairs →
    //     100 square entries; integer ids + one round-6 euclidean
    Q("learn_pdist_squareform",
      """WITH x AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(sqrt(list_sum(list_transform(range(1, 65),
        |      i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
        |         * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))),
        |      6) AS dist
        |  FROM x a JOIN x b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, dist FROM p
        |UNION ALL SELECT id_b AS id_a, id_a AS id_b, dist FROM p
        |UNION ALL SELECT vec_id AS id_a, vec_id AS id_b, CAST(0.0 AS DOUBLE) AS dist FROM x
        |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val x = t(spark, dir, "embeddings").filter($"vec_id" < 10)
        .select($"vec_id", $"embedding")
      val condensed = Distance.pdist(x, "vec_id", "embedding")
        .select($"id_a", $"id_b", round($"dist", 6).as("dist"))
      Distance.squareform(condensed).orderBy($"id_a", $"id_b")
    },

    // --- semi_supervised LabelPropagation (reference
    //     _label_propagation.py:31): kNN connectivity kernel (k=4) over 40
    //     embeddings, 12 labeled into 3 classes, 5 hard-clamped propagation
    //     rounds, tol=0 (no early exit → plan-deterministic). Every
    //     per-node sum on BOTH sides is a fold in key order (Spark
    //     sort-then-aggregate vs DuckDB list_sum(list(x ORDER BY k))), so
    //     the distribution is bit-identical and the argmax selection keys
    //     can't diverge; `pred` ties break on the smaller class both sides.
    Q("learn_label_prop", {
      val iters = (1 to 5).map { t =>
        s"""p$t AS (SELECT g.src AS id, d.cls,
           |  list_sum(list(g.w * d.p ORDER BY g.dst)) AS p
           |  FROM g JOIN d${t - 1} d ON g.dst = d.id GROUP BY g.src, d.cls),
           |r$t AS (SELECT id, list_sum(list(p ORDER BY cls)) AS rs
           |  FROM p$t GROUP BY id),
           |n$t AS (SELECT p.id, p.cls,
           |  CASE WHEN r.rs = 0 THEN 0.0 ELSE p.p / r.rs END AS p
           |  FROM p$t p JOIN r$t r ON p.id = r.id),
           |d$t AS (SELECT * FROM ys
           |  UNION ALL
           |  SELECT n.id, n.cls, n.p FROM n$t n JOIN ul ON n.id = ul.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH x AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40),
         |lab AS (SELECT vec_id AS id,
         |  CASE WHEN vec_id < 12 THEN CAST(vec_id % 3 AS BIGINT)
         |       ELSE CAST(-1 AS BIGINT) END AS label FROM x),
         |pd AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    list_sum(list_transform(range(1, 65),
         |      i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
         |         * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))) AS d2
         |  FROM x a JOIN x b ON a.vec_id <> b.vec_id),
         |rk AS (SELECT src, dst,
         |  row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS r FROM pd),
         |ge AS (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM rk WHERE r <= 4),
         |gs AS (SELECT src, list_sum(list(w ORDER BY dst)) AS ws FROM ge GROUP BY src),
         |g AS (SELECT ge.src, ge.dst, ge.w / gs.ws AS w
         |      FROM ge JOIN gs ON ge.src = gs.src),
         |ys AS (SELECT id, label AS cls, CAST(1.0 AS DOUBLE) AS p
         |       FROM lab WHERE label >= 0),
         |ul AS (SELECT id FROM lab WHERE label = -1),
         |d0 AS (SELECT * FROM ys),
         |$iters,
         |tr AS (SELECT id, cls,
         |  row_number() OVER (PARTITION BY id ORDER BY p DESC, cls) AS r FROM d5)
         |SELECT a.id, a.cls, round(a.p, 6) AS p, b.cls AS pred
         |FROM d5 a JOIN (SELECT id, cls FROM tr WHERE r = 1) b ON a.id = b.id
         |ORDER BY a.id, a.cls""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val x = t(spark, dir, "embeddings").filter($"vec_id" < 40)
        .select($"vec_id", $"embedding")
      val labels = x.select($"vec_id".as("id"),
        when($"vec_id" < 12, ($"vec_id" % 3).cast("long"))
          .otherwise(lit(-1L)).as("label"))
      val edges = LabelProp.knnGraphEuclidean(x, "vec_id", "embedding", k = 4)
      val dist = LabelProp.fitEdges(edges, labels, maxIter = 5, tol = 0.0)
      val pred = LabelProp.transduction(dist, labels)
      dist.join(pred, "id")
        .select($"id", $"cls", round($"p", 6).as("p"), $"pred")
        .orderBy($"id", $"cls")
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
    },

    // --- ensemble IsolationForest (_iforest.py): anomaly scores over a
    //     2-feature customer projection. Tree construction replays
    //     deterministically from (data, key, seed) but is not
    //     SQL-expressible → rows-only driver check; the score ordering and
    //     refit determinism are spec-pinned (LearnSpec)
    Q.noOracle("learn_iforest") { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer")
        .select($"c_custkey", $"c_acctbal".cast("double").as("bal"),
          ($"c_custkey" % 97).cast("double").as("f2"))
      val model = graft.learn.IsolationForest.fit(c, Seq("bal", "f2"),
        "c_custkey", numTrees = 50, sampleSize = 128, seed = 7L)
      graft.learn.IsolationForest.score(model, c)
        .orderBy(desc("anomaly_score"), $"c_custkey")
        .limit(20)
        .select($"c_custkey",
          (round($"anomaly_score", 6) + lit(0.0)).as("score"))
    },

    // --- IsolationForest SCORING oracled via the pinned literal forest
    //     (r9 — the fit stays rows-only/spec-checked above, but scoring a
    //     committed constant forest is deterministic arithmetic): each
    //     tree replays as a nested CASE whose leaves are compile-time
    //     path-length literals, the tree-order left fold makes path_mean
    //     BIT-exact on both engines (gated unrounded); only the final
    //     2^(−mean/c) goes through libm pow → round 4 + 0.0.
    Q("learn_iforest_score", {
      import graft.learn.{IsolationForest => IF, PinnedForest}
      val m = PinnedForest.model
      s"""WITH base AS (
         |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
         |         CAST(c_custkey % 97 AS DOUBLE) AS f2
         |  FROM customer WHERE c_custkey <= 300),
         |pm AS (SELECT c_custkey,
         |  ${IF.sqlPathMean(m, Seq("bal", "f2"))} AS path_mean
         |  FROM base)
         |SELECT c_custkey, path_mean,
         |  round(pow(CAST(2.0 AS DOUBLE), -path_mean / ${IF.sqlCNorm(m)}), 4)
         |    + CAST(0.0 AS DOUBLE) AS score
         |FROM pm ORDER BY c_custkey""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.learn.{IsolationForest => IF, PinnedForest}
      val m = PinnedForest.model
      val base = t(spark, dir, "customer")
        .filter($"c_custkey" <= 300)
        .select($"c_custkey", $"c_acctbal".cast("double").as("bal"),
          ($"c_custkey" % 97).cast("double").as("f2"))
      val cNorm = IF.avgPath(m.sampleSize.toDouble)
      base.select($"c_custkey",
          IF.pathMeanCol(m, Seq($"bal", $"f2")).as("path_mean"))
        .select($"c_custkey", $"path_mean",
          (round(pow(lit(2.0), -$"path_mean" / lit(cNorm)), 4) + lit(0.0))
            .as("score"))
        .orderBy($"c_custkey")
    },

    // --- learn.datasets make_blobs (reference samples_generator.py:402):
    //     every draw is hash-uniform → Acklam Φ⁻¹, so the dataset — not
    //     just its moments — replays exactly in any engine. round 6 + 0.0
    //     (coordinates can round to −0.0 near a center line)
    Q("learn_make_blobs", {
      import graft.functions.{Distributions => D, PortableHash => H}
      val centers = Seq(Seq(-4.0, 2.0), Seq(0.0, -3.0), Seq(5.0, 4.0))
      def ctr(j: Int) = centers.zipWithIndex.map { case (c, i) =>
        s"WHEN label = $i THEN CAST('${c(j)}' AS DOUBLE)" }.mkString(" ")
      s"""WITH s AS (
         |  SELECT i AS id, ${H.sqlBucket("i", 3)} AS label,
         |    ${H.sqlUniform01("(i * 2 + 0 + 11)")} AS u0,
         |    ${H.sqlUniform01("(i * 2 + 1 + 11)")} AS u1
         |  FROM (SELECT unnest(range(0, 300)) AS i) t)
         |SELECT id, CAST(label AS BIGINT) AS label,
         |  round((CASE ${ctr(0)} END) + 1.2 * ${D.sqlNormalInv("u0")}, 6)
         |    + CAST(0.0 AS DOUBLE) AS f0,
         |  round((CASE ${ctr(1)} END) + 1.2 * ${D.sqlNormalInv("u1")}, 6)
         |    + CAST(0.0 AS DOUBLE) AS f1
         |FROM s ORDER BY id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      Datasets.makeBlobs(spark, 300,
          Seq(Seq(-4.0, 2.0), Seq(0.0, -3.0), Seq(5.0, 4.0)),
          clusterStd = 1.2, seed = 11L)
        .select($"id", $"label",
          (round($"f0", 6) + lit(0.0)).as("f0"),
          (round($"f1", 6) + lit(0.0)).as("f1"))
        .orderBy($"id")
    },

    // --- learn.datasets make_regression (samples_generator.py:268): the
    //     linear response folds coefficients in column order on both sides
    Q("learn_make_regression", {
      import graft.functions.{Distributions => D, PortableHash => H}
      def u(slot: Int) = H.sqlUniform01(s"(i * 4 + $slot + 5)")
      s"""WITH s AS (
         |  SELECT i AS id,
         |    ${D.sqlNormalInv(u(0))} AS f0, ${D.sqlNormalInv(u(1))} AS f1,
         |    ${D.sqlNormalInv(u(2))} AS f2, ${D.sqlNormalInv(u(3))} AS noise
         |  FROM (SELECT unnest(range(0, 300)) AS i) t)
         |SELECT id,
         |  round(f0, 6) + CAST(0.0 AS DOUBLE) AS f0,
         |  round(f1, 6) + CAST(0.0 AS DOUBLE) AS f1,
         |  round(f2, 6) + CAST(0.0 AS DOUBLE) AS f2,
         |  round(CAST('0.75' AS DOUBLE) + CAST('2.5' AS DOUBLE) * f0
         |        + CAST('-1.5' AS DOUBLE) * f1 + CAST('0.5' AS DOUBLE) * f2
         |        + CAST('0.1' AS DOUBLE) * noise, 6)
         |    + CAST(0.0 AS DOUBLE) AS y
         |FROM s ORDER BY id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      Datasets.makeRegression(spark, 300, Seq(2.5, -1.5, 0.5),
          bias = 0.75, noiseStd = 0.1, seed = 5L)
        .select($"id",
          (round($"f0", 6) + lit(0.0)).as("f0"),
          (round($"f1", 6) + lit(0.0)).as("f1"),
          (round($"f2", 6) + lit(0.0)).as("f2"),
          (round($"y", 6) + lit(0.0)).as("y"))
        .orderBy($"id")
    },

    // --- learn.datasets make_classification (samples_generator.py:31,
    //     the n_clusters_per_class=1 reduction): hypercube-corner blobs +
    //     portable label flips; the oracle regenerates the corner table
    //     from the same bit formula
    Q("learn_make_classification", {
      import graft.functions.{Distributions => D, PortableHash => H}
      val k = 4; val d = 3; val sep = 2.0; val seed = 3L
      val centers = (0 until k).map { c =>
        (0 until d).map(j => if (((c >> (j % 31)) & 1) == 1) sep else -sep) }
      def ctr(j: Int) = centers.zipWithIndex.map { case (c, i) =>
        s"WHEN label0 = $i THEN CAST('${c(j)}' AS DOUBLE)" }.mkString(" ")
      def u(slot: Int) = H.sqlUniform01(s"(i * $d + $slot + $seed)")
      s"""WITH s AS (
         |  SELECT i AS id, ${H.sqlBucket("i", k)} AS label0,
         |    ${D.sqlNormalInv(u(0))} AS z0, ${D.sqlNormalInv(u(1))} AS z1,
         |    ${D.sqlNormalInv(u(2))} AS z2,
         |    ${H.sqlUniform01(s"(i + ${seed + 7919L})")} AS uf,
         |    ${H.sqlBucket(s"(i + ${seed + 104729L})", k)} AS lflip
         |  FROM (SELECT unnest(range(0, 400)) AS i) t)
         |SELECT id,
         |  CAST(CASE WHEN uf < CAST('0.1' AS DOUBLE) THEN lflip ELSE label0 END
         |       AS BIGINT) AS label,
         |  round((CASE ${ctr(0)} END) + z0, 6) + CAST(0.0 AS DOUBLE) AS f0,
         |  round((CASE ${ctr(1)} END) + z1, 6) + CAST(0.0 AS DOUBLE) AS f1,
         |  round((CASE ${ctr(2)} END) + z2, 6) + CAST(0.0 AS DOUBLE) AS f2
         |FROM s ORDER BY id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      Datasets.makeClassification(spark, 400, d = 3, nClasses = 4,
          classSep = 2.0, flipY = 0.1, seed = 3L)
        .select($"id", $"label",
          (round($"f0", 6) + lit(0.0)).as("f0"),
          (round($"f1", 6) + lit(0.0)).as("f1"),
          (round($"f2", 6) + lit(0.0)).as("f2"))
        .orderBy($"id")
    }
  )
}
