package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.learn.{Datasets, Distance, LabelProp, Learn, StatTests}

/** Learn-module queries, estimator + linalg + distance family (SURVEY
  * §2.14/§2.15): linear models, KMeans/PCA/SVD, COO linalg, pairwise
  * distances, label propagation, isolation-forest scoring. Iterative
  * fits with internal randomness (kmeans) or sign/order ambiguity (pca)
  * get deterministic-seed rows-only checks plus closed-form
  * differential tests in LearnSpec. Split out of the monolithic LearnQ
  * in r12 (registry hygiene).
  */
object LearnQModels {

  val all: Vector[Q] = Vector(

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
    }
  )
}
