package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.learn.Learn

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

    // --- cluster: kmeans over embeddings (iterative, engine-specific init →
    //     rows-only driver check; cluster-recovery correctness in LearnSpec)
    Q.noOracle("learn_kmeans") { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val model = Learn.kmeansFit(e, "embedding", k = 4, seed = 42L)
      Learn.kmeansPredict(model, e, "embedding")
        .groupBy($"cluster").agg(count(lit(1)).as("n"))
        .select($"n")
        .orderBy($"n".desc)
    },

    // --- linalg: distributed SVD singular values (no SQL analog →
    //     rows-only; closed-form recovery in LearnSpec)
    Q.noOracle("learn_svd") { (spark, dir) =>
      import spark.implicits._
      val (sv, _) = Learn.svd(t(spark, dir, "embeddings"), "embedding", k = 5)
      sv.toSeq.map(v =>
        BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
        .toDF("singular_value")
    },

    // --- decomposition: pca projection (eigenvector sign/order ambiguity →
    //     rows-only; variance-recovery correctness in LearnSpec)
    Q.noOracle("learn_pca") { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val model = Learn.pcaFit(e, "embedding", k = 2)
      Learn.pcaTransform(model, e.filter($"vec_id" < 20), "embedding")
        .select($"vec_id",
          round(abs(element_at($"pca", 1)), 4).as("pc1_abs"),
          round(abs(element_at($"pca", 2)), 4).as("pc2_abs"))
        .orderBy($"vec_id")
    }
  )
}
