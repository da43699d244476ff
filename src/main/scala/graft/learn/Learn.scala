package graft.learn

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.{PCA, PCAModel, StandardScaler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learn module: the reference's scikit-learn-mimicking surface
  * (mars/learn/, 50 operand classes) re-expressed as thin MLlib wrappers —
  * per SURVEY §2.15 the reference's distributed KMeans
  * (mars/learn/cluster/_kmeans.py, Lloyd + k-means|| init), PCA
  * (mars/learn/decomposition/_pca.py), linear models
  * (mars/learn/linear_model/_base.py), train_test_split
  * (mars/learn/model_selection/_split.py), preprocessing scalers
  * (mars/learn/preprocessing/_data.py) and pairwise distances
  * (mars/learn/metrics/pairwise/) all map onto MLlib estimators or plain
  * Column expressions.
  *
  * Embeddings enter as `array<float>` columns and are bridged to MLlib
  * vectors with `array_to_vector` (no UDFs, no driver round-trip). All
  * estimators here train distributed; fitted models broadcast their (small)
  * parameters for prediction.
  */
object Learn {

  // ------------------------------------------------------- model selection
  /** Seeded random split (reference model_selection/_split.py →
    * randomSplit). Rows are assigned independently, so the sizes are
    * binomial around the requested fractions, like the reference's
    * chunk-wise split. */
  def trainTestSplit(df: DataFrame, testFrac: Double, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    val parts = df.randomSplit(Array(1.0 - testFrac, testFrac), seed)
    (parts(0), parts(1))
  }

  /** Deterministic hash split on a key column: reproducible across runs
    * and engines. Buckets come from the avalanche hash in
    * [[graft.functions.PortableHash]] — the r2 residue-modulo bucket put
    * residue-striped key sets (ids ≡ c mod 100) entirely on one side.
    * testPct of 100. */
  def hashSplit(df: DataFrame, keyCol: String, testPct: Int)
      : (DataFrame, DataFrame) = {
    val bucket = graft.functions.PortableHash.bucket(col(keyCol), 100)
    (df.filter(bucket >= testPct), df.filter(bucket < testPct))
  }

  /** Deterministic k-fold assignment (model_selection KFold): adds a
    * `fold` column in [0, k) from the portable avalanche hash of the key —
    * reproducible across runs/engines, no shuffle, folds statistically
    * balanced with no residue striping. Fold i's validation set is
    * `fold === i`, its training set the complement. */
  def kFold(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kFold needs k >= 2, got $k")
    df.withColumn("fold", graft.functions.PortableHash.bucket(col(keyCol), k))
  }

  // ------------------------------------------------------------ clustering
  /** KMeans over an `array<float>` embedding column (reference
    * mars/learn/cluster/_kmeans.py; MLlib runs the same Lloyd iterations
    * with k-means|| init, distributed over partitions). */
  def kmeansFit(df: DataFrame, featuresArrayCol: String, k: Int,
      seed: Long = 42L, maxIter: Int = 20): KMeansModel =
    new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features")
      .fit(df.withColumn("__features", array_to_vector(col(featuresArrayCol))))

  /** Cluster assignment per row: input columns + `cluster`. */
  def kmeansPredict(model: KMeansModel, df: DataFrame, featuresArrayCol: String): DataFrame =
    model
      .setPredictionCol("cluster")
      .transform(df.withColumn("__features", array_to_vector(col(featuresArrayCol))))
      .drop("__features")

  // --------------------------------------------------------- decomposition
  /** PCA to `k` components over an `array<float>` column (reference
    * mars/learn/decomposition/_pca.py; MLlib computes the covariance
    * eigendecomposition distributed). */
  def pcaFit(df: DataFrame, featuresArrayCol: String, k: Int): PCAModel =
    new PCA()
      .setK(k).setInputCol("__features").setOutputCol("__pca")
      .fit(df.withColumn("__features", array_to_vector(col(featuresArrayCol))))

  /** Projected coordinates as an `array<double>` column `pca`. */
  def pcaTransform(model: PCAModel, df: DataFrame, featuresArrayCol: String): DataFrame =
    model
      .transform(df.withColumn("__features", array_to_vector(col(featuresArrayCol))))
      .withColumn("pca", vector_to_array(col("__pca")))
      .drop("__features", "__pca")

  // ------------------------------------------------------------ regression
  /** OLS linear regression y ~ x1..xn via the exact normal-equation solver
    * (reference mars/learn/linear_model/_base.py — also exact OLS).
    * Features are plain numeric columns. */
  def linearRegressionFit(df: DataFrame, featureCols: Seq[String], labelCol: String)
      : LinearRegressionModel =
    new LinearRegression()
      .setSolver("normal").setRegParam(0.0)
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .fit(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))

  /** Closed-form simple ridge regression y ~ a + b·x with L2 penalty λ on
    * the slope (reference mars/learn/linear_model Ridge surface; sklearn
    * Ridge with one feature): b = Sxy / (Sxx + λ), a = ȳ − b·x̄ over
    * CENTERED sums. ONE partial+final aggregate computes the five sums;
    * the closed form then runs on the driver-side 1-row result inside the
    * same plan (no collect). Pass exact-decimal x/y columns for bit-exact
    * cross-engine replay. Returns one row per λ:
    * (lambda, slope, intercept). */
  def ridgeSimple(df: DataFrame, x: Column, y: Column,
      lambdas: Seq[Double]): DataFrame = {
    val sums = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).cast("double").as("sx"),
      sum(y).cast("double").as("sy"),
      sum(x * x).cast("double").as("sxx"),
      sum(x * y).cast("double").as("sxy"))
    val lams = explode(typedlit(lambdas)).as("lambda")
    sums.select(lams, col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"))
      .withColumn("slope",
        (col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n") + col("lambda")))
      .withColumn("intercept",
        col("sy") / col("n") - col("slope") * col("sx") / col("n"))
      .select(col("lambda"), col("slope"), col("intercept"))
  }

  /** Categorical naive Bayes with Laplace smoothing (reference mars/learn
    * naive_bayes surface; sklearn CategoricalNB on one feature): class
    * priors and per-(feature value, class) likelihoods from two count
    * aggregates, scored as log P(c) + log P(f|c). All inputs are integer
    * counts, so the log-space scores replay exactly on any engine.
    *
    * Returns the long-form score table: one row per (feature value, class)
    * with (count, loglik, score) plus the argmax `predicted` class per
    * feature value (ties break to the LARGEST class label via struct max —
    * same convention as idxmax). */
  def naiveBayesCategorical(df: DataFrame, featureCol: String,
      labelCol: String, alpha: Double = 1.0): DataFrame = {
    val fc = col(featureCol).as("feature")
    val cc = col(labelCol).as("cls")
    val joint = df.groupBy(fc, cc).agg(count(lit(1)).as("n_fc"))
    val classes = df.groupBy(cc).agg(count(lit(1)).as("n_c"))
    val nFeatureVals = df.select(col(featureCol)).distinct().count()
    val total = classes.agg(sum(col("n_c")).as("n_total"))
    // complete the (feature, class) grid so zero counts are smoothed, not
    // absent: distinct features × classes is a tiny broadcast cross join
    val grid = df.select(fc).distinct().crossJoin(broadcast(classes))
    val scored = grid
      .join(joint, Seq("feature", "cls"), "left")
      .crossJoin(broadcast(total))
      .select(col("feature"), col("cls"),
        coalesce(col("n_fc"), lit(0L)).as("count"),
        (log(coalesce(col("n_fc"), lit(0L)).cast("double") + lit(alpha)) -
          log(col("n_c").cast("double") + lit(alpha * nFeatureVals))).as("loglik"),
        (log(col("n_c").cast("double")) - log(col("n_total").cast("double"))).as("logprior"))
      .withColumn("score", col("loglik") + col("logprior"))
    val winner = scored.groupBy(col("feature"))
      .agg(max(struct(col("score"), col("cls"))).getField("cls").as("predicted"))
    scored.join(winner, Seq("feature"))
  }

  // ---------------------------------------------------------- classification
  /** Binary logistic regression over numeric feature columns (reference
    * mars/learn linear_model / glm surface → MLlib). */
  def logisticRegressionFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      maxIter: Int = 50): org.apache.spark.ml.classification.LogisticRegressionModel =
    new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.0)
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .fit(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))

  /** Predictions for a fitted logistic model: input + `prediction`,
    * `probability` (array<double>). */
  def logisticPredict(model: org.apache.spark.ml.classification.LogisticRegressionModel,
      df: DataFrame, featureCols: Seq[String]): DataFrame =
    model.transform(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))
      .withColumn("probability", vector_to_array(col("probability")))
      .drop("__features", "rawPrediction")

  /** Generalized linear model (reference mars glm → MLlib GLR).
    * family: "gaussian" | "poisson" | "gamma" | "binomial". */
  def glmFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      family: String = "gaussian", maxIter: Int = 25)
      : org.apache.spark.ml.regression.GeneralizedLinearRegressionModel =
    new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily(family).setMaxIter(maxIter)
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .fit(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))

  /** Random-forest classifier over numeric feature columns (reference
    * ensemble blockwise voting/bagging, opcodes 3309-3403 → MLlib's
    * distributed forest). */
  def randomForestFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      numTrees: Int = 20, maxDepth: Int = 5, seed: Long = 42L)
      : org.apache.spark.ml.classification.RandomForestClassificationModel =
    new org.apache.spark.ml.classification.RandomForestClassifier()
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .fit(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))

  /** Predictions for a fitted forest: input + `prediction`. */
  def randomForestPredict(
      model: org.apache.spark.ml.classification.RandomForestClassificationModel,
      df: DataFrame, featureCols: Seq[String]): DataFrame =
    model.transform(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))
      .drop("__features", "rawPrediction", "probability")

  /** Gradient-boosted trees classifier — the Spark-native stand-in for
    * the reference's contrib XGBoost/LightGBM integrations
    * (mars/learn/contrib/xgboost, /lightgbm): MLlib GBTClassifier over
    * plain numeric feature columns.
    *
    * ==XGBoost/LightGBM parity path==
    * The reference's contrib modules wrap the native boosters' own
    * distributed trainers (xgboost.dask-style collective over its
    * workers). The Spark ecosystem equivalents are drop-in replacements
    * for this method because they share MLlib's Estimator/Model API and
    * the same assembled `__features` vector column:
    *
    *   - XGBoost: `ml.dmlc:xgboost4j-spark_2.13` —
    *     `new XGBoostClassifier(Map("objective" -> "binary:logistic",
    *     "num_round" -> maxIter, "max_depth" -> maxDepth))
    *     .setFeaturesCol("__features").setLabelCol(labelCol)` — the
    *     barrier-mode trainer runs one Rabit worker per executor, so the
    *     data never leaves the cluster (same topology as the
    *     reference's actor-pool trainer).
    *   - LightGBM: SynapseML's `LightGBMClassifier`, identically shaped.
    *
    * Neither jar can ship here (unmanaged Spark-jars classpath, zero
    * egress — see build.sbt), so the MLlib GBT keeps the surface covered
    * and the contract tested: LearnSpec pins nonlinear-boundary learning
    * (XOR quadrants; circle train/holdout) exactly like the reference's
    * contrib tests (test_classifier.py plants a learnable boundary and
    * asserts holdout accuracy). [[boostedFitPredict]] makes the swap
    * EXECUTABLE: it loads XGBoostClassifier reflectively when the jar is
    * present and falls back to this method when it is not. */
  def gbtFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      maxIter: Int = 20, maxDepth: Int = 3, seed: Long = 42L)
      : org.apache.spark.ml.classification.GBTClassificationModel =
    new org.apache.spark.ml.classification.GBTClassifier()
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .fit(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))

  /** Predictions for a fitted GBT model: input + `prediction`. */
  def gbtPredict(model: org.apache.spark.ml.classification.GBTClassificationModel,
      df: DataFrame, featureCols: Seq[String]): DataFrame =
    model.transform(df.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*))))
      .drop("__features", "rawPrediction", "probability")

  /** One boosting entry point, three backends (reference
    * mars/learn/contrib/xgboost/classifier.py and
    * mars/learn/contrib/lightgbm/ — both contrib modules are optional
    * imports there too): if `ml.dmlc:xgboost4j-spark` (or, for
    * `backend="lightgbm"`/`"auto"`, SynapseML's LightGBMClassifier) is
    * on the classpath — a jar dropped next to the Spark jars; this
    * build cannot resolve either, see build.sbt — train the native
    * booster; otherwise fall back to the MLlib [[gbtFit]] stand-in.
    * Loaded purely reflectively so there is no compile-time dependency;
    * all backends share the assembled `__features` vector and MLlib's
    * Estimator/Model API, so predictions come back identically shaped.
    *
    * `backend`: "auto" (xgboost → lightgbm → mllib), "xgboost",
    * "lightgbm" (each falling back to mllib), or "mllib".
    * Returns (backend used, test predictions with `prediction`). */
  def boostedFitPredict(train: DataFrame, test: DataFrame,
      featureCols: Seq[String], labelCol: String,
      maxIter: Int = 20, maxDepth: Int = 3, seed: Long = 42L,
      backend: String = "auto")
      : (String, DataFrame) = {
    require(Seq("auto", "xgboost", "lightgbm", "mllib").contains(backend),
      s"boostedFitPredict: unknown backend '$backend'")
    def assemble(d: DataFrame): DataFrame =
      d.withColumn("__features",
        array_to_vector(array(featureCols.map(col(_).cast("double")): _*)))
    def fitTransform(est: Any): DataFrame =
      est.asInstanceOf[org.apache.spark.ml.Estimator[_]]
        .fit(assemble(train))
        .asInstanceOf[org.apache.spark.ml.Transformer]
        .transform(assemble(test))
        .drop("__features", "rawPrediction", "probability")
    // jar absent (ClassNotFound) or ABI drift (NoSuchMethod/etc) in
    // either branch: the mllib fallback covers the surface either way
    def viaXgb: Option[DataFrame] =
      try {
        val cls = Class.forName("ml.dmlc.xgboost4j.scala.spark.XGBoostClassifier")
        val params: Map[String, Any] = Map(
          "objective" -> "binary:logistic", "num_round" -> maxIter,
          "max_depth" -> maxDepth, "seed" -> seed)
        val est = cls.getConstructor(classOf[Map[_, _]]).newInstance(params)
        cls.getMethod("setFeaturesCol", classOf[String]).invoke(est, "__features")
        cls.getMethod("setLabelCol", classOf[String]).invoke(est, labelCol)
        Some(fitTransform(est))
      } catch {
        case _: ReflectiveOperationException | _: NoClassDefFoundError => None
      }
    // SynapseML's LightGBMClassifier: zero-arg ctor + fluent setters,
    // same Estimator/Model contract (the lightgbm-spark jar-drop twin)
    def viaLgbm: Option[DataFrame] =
      try {
        val cls = Class.forName(
          "com.microsoft.azure.synapse.ml.lightgbm.LightGBMClassifier")
        val est = cls.getConstructor().newInstance()
        cls.getMethod("setFeaturesCol", classOf[String]).invoke(est, "__features")
        cls.getMethod("setLabelCol", classOf[String]).invoke(est, labelCol)
        cls.getMethod("setNumIterations", classOf[Int])
          .invoke(est, Int.box(maxIter))
        cls.getMethod("setMaxDepth", classOf[Int])
          .invoke(est, Int.box(maxDepth))
        Some(fitTransform(est))
      } catch {
        case _: ReflectiveOperationException | _: NoClassDefFoundError => None
      }
    val native: Option[(String, DataFrame)] = backend match {
      case "mllib" => None
      case "xgboost" => viaXgb.map(("xgboost4j-spark", _))
      case "lightgbm" => viaLgbm.map(("lightgbm-synapseml", _))
      case _ => viaXgb.map(("xgboost4j-spark", _))
        .orElse(viaLgbm.map(("lightgbm-synapseml", _)))
    }
    native.getOrElse {
      val m = gbtFit(train, featureCols, labelCol, maxIter, maxDepth, seed)
      ("mllib-gbt", gbtPredict(m, test, featureCols))
    }
  }

  /** Categorical → integer codes (reference label ops / sklearn
    * LabelEncoder → MLlib StringIndexer, frequency-ordered). */
  def stringIndex(df: DataFrame, inputCol: String, outputCol: String): DataFrame =
    new org.apache.spark.ml.feature.StringIndexer()
      .setInputCol(inputCol).setOutputCol(outputCol)
      .fit(df).transform(df)

  /** Exact AUC-ROC via the rank-sum (Mann–Whitney) formulation with
    * average-rank ties. The global rank needs a total order over all
    * scores, so this runs a single-task window — exact but only for result
    * sets that fit one task; use [[aucRocGrouped]] at scale. */
  def aucRoc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
    val ranked = df.select(col(labelCol).cast("double").as("y"), col(scoreCol).as("s"))
      .withColumn("r", avg(row_number().over(w)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
    ranked.agg(
      ((sum(col("y") * col("r")) - sum(col("y")) * (sum(col("y")) + lit(1.0)) / 2.0) /
        (sum(col("y")) * (count(lit(1)) - sum(col("y"))))).as("auc"))
  }

  /** Scale-safe exact AUC: group by distinct score (one hash aggregate),
    * then the rank-sum over per-score (positives, count) pairs — the
    * second pass aggregates |distinct scores| rows, which for real model
    * outputs (bounded-precision probabilities) is orders of magnitude
    * smaller than the data; ties are handled exactly via average ranks. */
  def aucRocGrouped(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val byScore = df
      .select(col(labelCol).cast("double").as("y"), col(scoreCol).as("s"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).cast("double").as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // average rank of the tied block at score s = (ranks before) + (n+1)/2
    val ranked = byScore.withColumn("before",
      coalesce(sum(col("n")).over(w), lit(0.0)))
      .withColumn("avg_rank", col("before") + (col("n") + 1.0) / 2.0)
    ranked.agg(
      ((sum(col("pos") * col("avg_rank")) -
        sum(col("pos")) * (sum(col("pos")) + lit(1.0)) / 2.0) /
        (sum(col("pos")) * (sum(col("n")) - sum(col("pos"))))).as("auc"))
  }

  /** Multiclass ROC-AUC, one-vs-rest (reference
    * mars/learn/metrics/_ranking.py:531 _multiclass_roc_auc_score,
    * average='macro'): per class c, the binary rank AUC of (label == c)
    * against the class's score slot in `scoreArrCol` (1-based slot c+1),
    * plus final 'macro' and 'weighted' rows (sklearn's two multiclass
    * averages: equal-weight vs true-instance-support weight). Each
    * per-class AUC is [[aucRocGrouped]] (distinct-score aggregate, exact
    * dyadic rank terms — order-free); both averages run as ordered folds
    * over the k class rows, so the whole frame is engine-deterministic
    * and oracle-able unrounded. */
  def aucRocMulticlass(df: DataFrame, labelCol: String, scoreArrCol: String,
      numClasses: Int): DataFrame = {
    val perClass = (0 until numClasses).map { c =>
      aucRocGrouped(
        df.select(
          when(col(labelCol) === c, lit(1.0)).otherwise(lit(0.0)).as("__y"),
          element_at(col(scoreArrCol), c + 1).cast("double").as("__s")),
        "__y", "__s")
        .select(lit(c.toString).as("cls"), col("auc"))
    }.reduce(_ unionByName _)
    val supports = df.groupBy(col(labelCol).cast("long").as("__lab"))
      .agg(count(lit(1)).as("__sup"))
      .select(col("__lab").cast("string").as("cls"), col("__sup"))
    val withSup = perClass.join(broadcast(supports), Seq("cls"), "left")
      .select(col("cls"), col("auc"),
        coalesce(col("__sup"), lit(0L)).as("__sup"))
    def fold(term: Column => Column) =
      aggregate(array_sort(collect_list(struct(col("cls"), col("auc"),
        col("__sup")))), lit(0.0), (acc, x) => acc + term(x))
    val avgRows = withSup.agg(
      fold(_.getField("auc")).as("__sa"),
      fold(x => x.getField("__sup").cast("double") * x.getField("auc"))
        .as("__wa"),
      sum(col("__sup")).cast("double").as("__tot"))
      .select(
        array(
          struct(lit("macro").as("cls"),
            (col("__sa") / lit(numClasses.toDouble)).as("auc")),
          struct(lit("weighted").as("cls"),
            (col("__wa") / col("__tot")).as("auc"))).as("__rows"))
      .select(explode(col("__rows")).as("__r"))
      .select(col("__r.cls").as("cls"), col("__r.auc").as("auc"))
    perClass.unionByName(avgRows)
  }

  /** roc_curve (reference mars/learn/metrics/_ranking.py:624): one
    * (threshold, fpr, tpr) row per DISTINCT score, thresholds descending
    * — a prediction counts positive when score >= threshold. Cumulative
    * TP/FP run through the range-partitioned prefix stitch (never a
    * data-wide single-task window), and fpr/tpr are exact long/long
    * rationals — no float accumulation anywhere, so the curve is
    * partitioning-invariant and oracle-able unrounded. sklearn's
    * synthetic leading (0,0) point at threshold=inf and its
    * drop_intermediate thinning are omitted: the curve here is the full
    * distinct-score staircase. */
  def rocCurve(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val byScore = df
      .select(col(labelCol).cast("long").as("y"), col(scoreCol).cast("double").as("s"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
      .withColumn("__negs", -col("s"))
    val stitched = StatTests.prefixStitch(byScore, "__negs", Seq("pos", "neg"))
    val totals = df.agg(
      sum(col(labelCol).cast("long")).as("npos"),
      (count(lit(1)) - sum(col(labelCol).cast("long"))).as("nneg"))
    stitched.crossJoin(broadcast(totals))
      .select(col("s").as("threshold"),
        ((col("neg_before") + col("neg")).cast("double") /
          col("nneg").cast("double")).as("fpr"),
        ((col("pos_before") + col("pos")).cast("double") /
          col("npos").cast("double")).as("tpr"))
  }

  /** precision_recall_curve (reference _ranking.py, same staircase shape
    * as [[rocCurve]]): per distinct threshold descending, precision =
    * TP/(TP+FP) and recall = TP/npos — exact long/long rationals through
    * the same prefix stitch. sklearn's final (1, 0) sentinel point is
    * omitted like rocCurve's (0,0). */
  def precisionRecallCurve(df: DataFrame, labelCol: String, scoreCol: String)
      : DataFrame = {
    val byScore = df
      .select(col(labelCol).cast("long").as("y"), col(scoreCol).cast("double").as("s"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
      .withColumn("__negs", -col("s"))
    val stitched = StatTests.prefixStitch(byScore, "__negs", Seq("pos", "neg"))
    val totals = df.agg(sum(col(labelCol).cast("long")).as("npos"))
    stitched.crossJoin(broadcast(totals))
      .select(col("s").as("threshold"),
        ((col("pos_before") + col("pos")).cast("double") /
          (col("pos_before") + col("pos") + col("neg_before") + col("neg"))
            .cast("double")).as("precision"),
        ((col("pos_before") + col("pos")).cast("double") /
          col("npos").cast("double")).as("recall"))
  }

  /** average_precision_score (sklearn's step-sum definition, the scorer
    * behind the reference's ranking metrics): AP = Σ_k (R_k − R_{k−1})·P_k
    * over the distinct-score staircase, thresholds descending. Each term
    * is per-threshold arithmetic over exact BIGINT cumulative counts
    * (ΔR_k = pos_k/npos, P_k = tp_k/(tp_k+fp_k)); the cross-threshold sum
    * runs as an ordered fold in threshold order, so the scalar is
    * bit-deterministic across partitionings and oracle-able unrounded
    * (DuckDB `list_sum(list(term ORDER BY k))` replays the same left
    * fold). Same prefix-stitch plan as [[precisionRecallCurve]] — no
    * data-wide window. */
  def averagePrecision(df: DataFrame, labelCol: String, scoreCol: String)
      : DataFrame = {
    val byScore = df
      .select(col(labelCol).cast("long").as("y"), col(scoreCol).cast("double").as("s"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
      .withColumn("__negs", -col("s"))
    val stitched = StatTests.prefixStitch(byScore, "__negs", Seq("pos", "neg"))
    val totals = df.agg(sum(col(labelCol).cast("long")).as("npos"))
    val terms = stitched.crossJoin(broadcast(totals))
      .select(col("__negs").as("k"),
        (col("pos").cast("double") / col("npos").cast("double") *
          ((col("pos_before") + col("pos")).cast("double") /
            (col("pos_before") + col("pos") + col("neg_before") + col("neg"))
              .cast("double"))).as("term"))
    terms.agg(
      aggregate(array_sort(collect_list(struct(col("k"), col("term")))),
        lit(0.0), (acc, x) => acc + x.getField("term")).as("avg_precision"))
  }

  // ---------------------------------------------------------- preprocessing
  /** Column-wise standard scaling (x - mean) / stddev as pure expressions —
    * the reference's StandardScaler on tabular data
    * (mars/learn/preprocessing/_data.py). One aggregate + broadcast join,
    * no UDF. */
  def standardScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stats = df.agg(
      avg(col(cols.head)).as(s"__m_${cols.head}"),
      (cols.tail.map(c => avg(col(c)).as(s"__m_$c")) ++
        cols.map(c => stddev_samp(col(c)).as(s"__s_$c"))): _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined)((d, c) =>
      d.withColumn(s"${c}_scaled", (col(c) - col(s"__m_$c")) / col(s"__s_$c")))
    scaled.drop(cols.flatMap(c => Seq(s"__m_$c", s"__s_$c")): _*)
  }

  /** Min-max scaling to [0, 1] (sklearn MinMaxScaler; reference
    * mars/learn/preprocessing/_data.py minmax_scale): one min/max
    * aggregate broadcast back. Constant columns scale to null (0/0
    * guard), like sklearn's degenerate-range behavior up to its
    * convention. */
  def minMaxScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => min(col(c)).as(s"__lo_$c")) ++
      cols.map(c => max(col(c)).as(s"__hi_$c"))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined)((d, c) =>
      d.withColumn(s"${c}_scaled",
        when(col(s"__hi_$c") > col(s"__lo_$c"),
          (col(c) - col(s"__lo_$c")) / (col(s"__hi_$c") - col(s"__lo_$c")))))
    scaled.drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Robust scaling (sklearn RobustScaler): (x − median) / IQR with exact
    * interpolated percentiles — outlier-insensitive standardization. One
    * ObjectHashAggregate partial+final, broadcast back; `roundTo` rounds
    * the three cutoffs for engine-reproducible boundaries (the qcut
    * contract). */
  def robustScale(df: DataFrame, cols: Seq[String], roundTo: Int = 6): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      round(percentile(col(c), lit(0.5)), roundTo).as(s"__md_$c"),
      round(percentile(col(c), lit(0.25)), roundTo).as(s"__q1_$c"),
      round(percentile(col(c), lit(0.75)), roundTo).as(s"__q3_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined)((d, c) =>
      d.withColumn(s"${c}_scaled",
        when(col(s"__q3_$c") > col(s"__q1_$c"),
          (col(c) - col(s"__md_$c")) / (col(s"__q3_$c") - col(s"__q1_$c")))))
    scaled.drop(cols.flatMap(c => Seq(s"__md_$c", s"__q1_$c", s"__q3_$c")): _*)
  }

  /** sklearn MaxAbsScaler (reference preprocessing/_data.py's scaler
    * family): x / max|x| per column, one aggregate broadcast back.
    * All-zero columns keep their zeros (sklearn's
    * _handle_zeros_in_scale maps a 0 scale to 1). */
  def maxAbsScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => max(abs(col(c))).as(s"__ma_$c"))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined)((d, c) =>
      d.withColumn(s"${c}_scaled",
        col(c) / when(col(s"__ma_$c") === 0.0, 1.0).otherwise(col(s"__ma_$c"))))
    scaled.drop(cols.map(c => s"__ma_$c"): _*)
  }

  /** sklearn normalize(axis=1) over scalar columns (reference
    * preprocessing/normalize.py:299): each row is scaled to unit l1/l2/
    * max norm across `cols`; zero-norm rows keep their zeros (sklearn
    * convention). Pure projection — zero shuffles, scan speed. */
  def normalizeRows(df: DataFrame, cols: Seq[String], norm: String = "l2")
      : DataFrame = {
    require(cols.nonEmpty, "normalizeRows needs at least one column")
    val xs = cols.map(c => col(c).cast("double"))
    val n = norm match {
      case "l1" => xs.map(abs).reduce(_ + _)
      case "l2" => sqrt(xs.map(x => x * x).reduce(_ + _))
      case "max" => greatest((xs.map(abs) :+ lit(0.0)): _*)
      case o => throw new IllegalArgumentException(s"unknown norm: $o")
    }
    val safe = when(n === 0.0, 1.0).otherwise(n)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(s"${c}_norm", col(c).cast("double") / safe))
  }

  /** sklearn normalize over an `array<float>` embedding column — the
    * l1/max generalization of [[l2Normalize]]; zero-norm rows keep
    * their zeros. */
  def normalizeArray(c: Column, ord: String = "l2"): Column = {
    val n = rowNorm(c, ord)
    val safe = when(n === 0.0, 1.0).otherwise(n)
    transform(c, x => x.cast("double") / safe)
  }

  /** sklearn LabelEncoder (reference preprocessing/_label.py:39): codes
    * 0..k−1 over the SORTED distinct labels. Delegates to the category
    * dictionary-encode machinery (astypeCategory — identical contract:
    * ordered distinct classes, broadcast join back); returns (encoded
    * frame with `labelCol_code`, classes table (code, category)) — the
    * classes table is `inverse_transform`. */
  def labelEncode(df: DataFrame, labelCol: String): (DataFrame, DataFrame) = {
    val (enc, classes) = graft.api.GraftFrame(df).astypeCategory(labelCol)
    (enc.df, classes.df)
  }

  /** Vector-wise MLlib StandardScaler over an `array<float>` column, for
    * embedding features. */
  def standardScaleVectors(df: DataFrame, featuresArrayCol: String): DataFrame = {
    val withVec = df.withColumn("__features", array_to_vector(col(featuresArrayCol)))
    val model = new StandardScaler()
      .setWithMean(true).setWithStd(true)
      .setInputCol("__features").setOutputCol("__scaled")
      .fit(withVec)
    model.transform(withVec)
      .withColumn("scaled", vector_to_array(col("__scaled")))
      .drop("__features", "__scaled")
  }

  /** L2-normalize an `array<float>` embedding column to unit length —
    * pure expression (reference preprocessing normalize). */
  def l2Normalize(c: Column): Column = {
    val norm = sqrt(aggregate(c, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))
    transform(c, x => x.cast("double") / norm)
  }

  // ----------------------------------------------------------------- linalg
  /** Distributed SVD over an `array<float>` matrix column (SURVEY §2.14(c):
    * the reference's tensor linalg opcodes 501-530 map to MLlib's
    * RowMatrix). Returns (singular values desc, V as dim×k row-major). */
  def svd(df: DataFrame, featuresArrayCol: String, k: Int)
      : (Array[Double], Array[Array[Double]]) = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = df.select(col(featuresArrayCol)).rdd.map { r =>
      OldVectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray)
    }
    val s = new RowMatrix(rows).computeSVD(k, computeU = false)
    val v = s.V // column-major dim×k
    val dim = v.numRows
    ((s.s.toArray: Array[Double]),
      Array.tabulate(dim, k)((i, j) => v(i, j)))
  }

  /** Randomized SVD (reference mars/learn/utils/extmath.py
    * randomized_svd — itself the Halko–Martinsson–Tropp 2011
    * algorithm): range-find with a Gaussian test matrix, optional
    * power iterations for spectral-decay sharpening, tall-skinny QR of
    * the sketch, then an exact small-matrix SVD of B = QᵀA.
    *
    * 100 TB shape: A is touched only through scans — Y = AΩ is a
    * per-row projection (Ω broadcast), each power iteration is ONE
    * treeAggregate building the dim×l Gramian action, B = QᵀA is one
    * zipped treeAggregate — no shuffle of the data anywhere, and
    * everything driver-side is (k+oversample)-dimensional. This is the
    * scale path for spectra of matrices too wide for the exact
    * Gramian route. Returns (singular values desc, V as dim×k
    * row-major), like [[svd]]. */
  def randomizedSvd(df: DataFrame, featuresArrayCol: String, k: Int,
      oversample: Int = 10, powerIters: Int = 1, seed: Long = 42L)
      : (Array[Double], Array[Array[Double]]) = {
    require(k > 0 && oversample >= 0 && powerIters >= 0,
      s"randomizedSvd: bad k/oversample/powerIters $k/$oversample/$powerIters")
    val rows = df.select(col(featuresArrayCol).cast("array<double>"))
      .rdd.map(r => r.getSeq[Double](0).toArray)
    rows.cache()
    try {
      val dim = rows.first().length
      val l = math.min(k + oversample, dim)
      // driver-seeded Gaussian test matrix dim×l (deterministic)
      val rnd = new java.util.Random(seed)
      var omega = Array.fill(dim, l)(rnd.nextGaussian())
      // power iterations: Ω ← (AᵀA)Ω, renormalized per column to avoid
      // overflow (scale does not change the range)
      for (_ <- 1 to powerIters) {
        val sc = rows.sparkContext
        val bOmega = sc.broadcast(omega)
        val g = rows.treeAggregate(Array.ofDim[Double](dim, l))(
          seqOp = (acc, a) => {
            val om = bOmega.value
            val aw = Array.ofDim[Double](l) // aᵀ · (a·Ω) needs a·Ω first
            var j = 0
            while (j < l) {
              var s = 0.0; var i = 0
              while (i < dim) { s += a(i) * om(i)(j); i += 1 }
              aw(j) = s; j += 1
            }
            var i = 0
            while (i < dim) {
              var jj = 0
              while (jj < l) { acc(i)(jj) += a(i) * aw(jj); jj += 1 }
              i += 1
            }
            acc
          },
          combOp = (x, y) => {
            var i = 0
            while (i < dim) {
              var j = 0
              while (j < l) { x(i)(j) += y(i)(j); j += 1 }
              i += 1
            }
            x
          })
        bOmega.destroy()
        // column-normalize
        val norms = Array.tabulate(l) { j =>
          math.sqrt((0 until dim).map(i => g(i)(j) * g(i)(j)).sum) max 1e-300
        }
        omega = Array.tabulate(dim, l)((i, j) => g(i)(j) / norms(j))
      }
      // Gram of the sketch Y = AΩ (l×l, one treeAggregate; y per row
      // computed on the fly — Y is never materialized)
      val scFinal = rows.sparkContext
      val bOm = scFinal.broadcast(omega)
      def sketchRow(a: Array[Double]): Array[Double] = {
        val om = bOm.value
        Array.tabulate(l) { j =>
          var s = 0.0; var i = 0
          while (i < dim) { s += a(i) * om(i)(j); i += 1 }
          s
        }
      }
      val gram = rows.treeAggregate(Array.ofDim[Double](l, l))(
        seqOp = (acc, a) => {
          val yv = sketchRow(a)
          var i = 0
          while (i < l) {
            var j = 0
            while (j < l) { acc(i)(j) += yv(i) * yv(j); j += 1 }
            i += 1
          }
          acc
        },
        combOp = (x, yv) => {
          var i = 0
          while (i < l) {
            var j = 0
            while (j < l) { x(i)(j) += yv(i)(j); j += 1 }
            i += 1
          }
          x
        })
      // orthonormalize the range via the Gram eigendecomposition with a
      // RANK GUARD: an oversampled sketch of an exactly-rank-r matrix
      // has a singular Gram (a plain tall-skinny R⁻¹ would blow up) —
      // keep only eigenpairs above ε·λmax. Q = Y·M with
      // M = W_keep·Λ_keep^{-1/2}  ⇒  QᵀQ = I on the kept range.
      val gm = breeze.linalg.DenseMatrix.tabulate(l, l)((i, j) => gram(i)(j))
      val eig = breeze.linalg.eigSym(gm)
      val lambdaMax = eig.eigenvalues.toArray.max max 1e-300
      val keep = (0 until l).filter(i =>
        eig.eigenvalues(i) > 1e-12 * lambdaMax).reverse // descending λ
      val r = keep.size
      val m = Array.tabulate(l, r)((i, c) =>
        eig.eigenvectors(i, keep(c)) / math.sqrt(eig.eigenvalues(keep(c))))
      val bM = scFinal.broadcast(m)
      // B = QᵀA (r×dim): q = Mᵀ(aΩ) per row, one more treeAggregate
      val b = rows.treeAggregate(Array.ofDim[Double](r, dim))(
        seqOp = (acc, a) => {
          val yv = sketchRow(a)
          val mm = bM.value
          val q = Array.tabulate(r) { c =>
            var s = 0.0; var i = 0
            while (i < l) { s += mm(i)(c) * yv(i); i += 1 }
            s
          }
          var i = 0
          while (i < r) {
            var j = 0
            while (j < dim) { acc(i)(j) += q(i) * a(j); j += 1 }
            i += 1
          }
          acc
        },
        combOp = (x, yv) => {
          var i = 0
          while (i < r) {
            var j = 0
            while (j < dim) { x(i)(j) += yv(i)(j); j += 1 }
            i += 1
          }
          x
        })
      // exact SVD of the small r×dim B on the driver
      val kEff = math.min(k, r)
      val bm = breeze.linalg.DenseMatrix.tabulate(r, dim)((i, j) => b(i)(j))
      val svdRes = breeze.linalg.svd.reduced(bm)
      val sv = Array.tabulate(k)(i =>
        if (i < kEff) svdRes.S(i) else 0.0)
      val vt = svdRes.Vt // min(r,dim)×dim
      (sv, Array.tabulate(dim, k)((i, j) => if (j < kEff) vt(j, i) else 0.0))
    } finally rows.unpersist()
  }

  /** Distributed tall-skinny QR over an `array<float>` matrix column
    * (reference tensor linalg QR, opcodes 501-530 → RowMatrix.tallSkinnyQR):
    * returns (Q rows as array<double> in input order-free RDD layout, R as
    * k×k row-major). The decomposition shuffles nothing but the k×k
    * Gram-side factor — the scalable QR for n ≫ k. */
  def qr(df: DataFrame, featuresArrayCol: String)
      : (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(featuresArrayCol)).rdd.map { r =>
      OldVectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray)
    }
    val qrRes = new RowMatrix(rows).tallSkinnyQR(computeQ = true)
    val k = qrRes.R.numCols
    val rMat = Array.tabulate(k, k)((i, j) => qrRes.R(i, j))
    val qDf = qrRes.Q.rows.map(v => Tuple1(v.toArray.toSeq)).toDF("q")
    (qDf, rMat)
  }

  /** Distributed least squares for arbitrary feature count
    * (mt.linalg.lstsq / sklearn LinearRegression on a tall matrix):
    * the k×k Gramian XᵀX comes from RowMatrix.computeGramianMatrix (one
    * distributed treeAggregate pass), Xᵀy from a second treeAggregate of
    * the same scan, and the k×k normal-equation solve happens on the
    * driver (k is the FEATURE count — always broadcast-small; the data
    * never leaves the executors). Returns the coefficient vector. */
  def lstsq(df: DataFrame, featuresArrayCol: String, labelCol: String)
      : Array[Double] = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    // normalize the features column to array<double> up front so both the
    // array<float> embedding convention and array(doubleCols...) work —
    // a bare getSeq[Float] on an array<double> column would CCE at runtime
    val xy = df.select(col(featuresArrayCol).cast("array<double>"),
        col(labelCol).cast("double"))
      .rdd.map { r =>
        (r.getSeq[Double](0).toArray, r.getDouble(1))
      }
    xy.cache()
    try {
      val gram = new RowMatrix(xy.map(p => OldVectors.dense(p._1)))
        .computeGramianMatrix()
      val k = gram.numCols
      val xty = xy.treeAggregate(new Array[Double](k))(
        seqOp = (acc, p) => {
          var i = 0
          while (i < k) { acc(i) += p._1(i) * p._2; i += 1 }
          acc
        },
        combOp = (a, b) => { var i = 0; while (i < k) { a(i) += b(i); i += 1 }; a })
      val a = Array.tabulate(k, k)((i, j) => gram(i, j))
      solveSmall(a, xty)
    } finally { xy.unpersist(false); () }
  }

  /** Driver-local dense solve (mt.linalg.solve for broadcast-small
    * systems — the distributed path is [[lstsq]]'s Gramian reduction;
    * a distributed triangular solve is out of parity scope). */
  def solveSmall(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    import org.apache.commons.math3.linear._
    new LUDecomposition(new Array2DRowRealMatrix(a, false))
      .getSolver.solve(new ArrayRealVector(b, false)).toArray
  }

  /** Driver-local matrix inverse (mt.linalg.inv, broadcast-small). */
  def invSmall(a: Array[Array[Double]]): Array[Array[Double]] = {
    import org.apache.commons.math3.linear._
    new LUDecomposition(new Array2DRowRealMatrix(a, false))
      .getSolver.getInverse.getData
  }

  /** Driver-local Cholesky factor L with A = L·Lᵀ (mt.linalg.cholesky,
    * broadcast-small; symmetric positive-definite input). */
  def choleskySmall(a: Array[Array[Double]]): Array[Array[Double]] = {
    import org.apache.commons.math3.linear._
    new CholeskyDecomposition(new Array2DRowRealMatrix(a, false)).getL.getData
  }

  /** Driver-local pivoted LU in the reference's scipy convention
    * A = P·L·U (mt.linalg.lu — reference tensor/linalg/lu.py delegates
    * to scipy.linalg.lu; broadcast-small regime like solve/inv — the
    * tiled distributed factorization stays out of parity scope per
    * SURVEY §2.14). commons-math factors P'·A = L·U with P' the row
    * permutation, so the returned P is its transpose. */
  def luSmall(a: Array[Array[Double]])
      : (Array[Array[Double]], Array[Array[Double]], Array[Array[Double]]) = {
    import org.apache.commons.math3.linear._
    val d = new LUDecomposition(new Array2DRowRealMatrix(a, false))
    val p = d.getP.getData
    val pT = Array.tabulate(p.length, p.length)((i, j) => p(j)(i))
    (pT, d.getL.getData, d.getU.getData)
  }

  /** Driver-local triangular solve (mt.linalg.solve_triangular —
    * reference tensor/linalg/solve_triangular.py): forward substitution
    * for lower-triangular systems, back substitution for upper. Fails
    * loudly on a zero pivot. */
  def solveTriangularSmall(a: Array[Array[Double]], b: Array[Double],
      lower: Boolean = true): Array[Double] = {
    val n = a.length
    require(a.forall(_.length == n) && b.length == n,
      s"solveTriangularSmall needs a square n×n system matching b: n=$n")
    val x = new Array[Double](n)
    val order = if (lower) 0 until n else (n - 1) to 0 by -1
    for (i <- order) {
      var s = b(i)
      if (lower) { var j = 0; while (j < i) { s -= a(i)(j) * x(j); j += 1 } }
      else { var j = i + 1; while (j < n) { s -= a(i)(j) * x(j); j += 1 } }
      require(a(i)(i) != 0.0, s"singular triangular matrix: zero pivot at $i")
      x(i) = s / a(i)(i)
    }
    x
  }

  /** sklearn type_of_target (reference mars/learn/utils/multiclass.py):
    * 'continuous' for numeric targets with fractional values, 'binary'
    * for ≤ 2 distinct labels, 'multiclass' otherwise;
    * 'multilabel-indicator' for array-valued targets. One partial+final
    * aggregate over the column — nulls are ignored like sklearn (which
    * rejects NaN before dispatch). */
  def typeOfTarget(df: DataFrame, yCol: String): String = {
    import org.apache.spark.sql.types._
    df.schema(yCol).dataType match {
      case _: ArrayType => "multilabel-indicator"
      case _: NumericType =>
        val y = col(yCol).cast("double")
        val r = df.where(y.isNotNull).agg(
          countDistinct(y).as("k"),
          max((y =!= floor(y)).cast("int")).as("frac")).collect().head
        if (r.getInt(1) == 1) "continuous"
        else if (r.getLong(0) <= 2) "binary" else "multiclass"
      case _ =>
        val k = df.where(col(yCol).isNotNull)
          .agg(countDistinct(col(yCol))).collect().head.getLong(0)
        if (k <= 2) "binary" else "multiclass"
    }
  }

  /** Per-group simple OLS (y = intercept + slope·x) from ONE
    * partial+final moment aggregate — per-domain/per-segment trend
    * fitting at corpus scale: no window, no per-group second scan, the
    * closed form evaluated on five moment sums per key (the grouped
    * extension of [[linearRegressionFit]]'s exact single-fit path). */
  def groupedOls(df: DataFrame, keyCol: String, xCol: String, yCol: String)
      : DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val slope = (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
      (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(x * y).as("__sxy"))
      .select(col(keyCol), col("__n").cast("long").as("n"),
        slope.as("slope"),
        ((col("__sy") - slope * col("__sx")) / col("__n")).as("intercept"))
  }

  /** Blockwise ensemble (reference mars/learn/ensemble/_blockwise.py
    * BlockwiseEnsembleFit/Predict): fit one estimator per data block,
    * then combine every estimator's prediction per test row — mean for
    * the regressor, majority vote for the hard classifier (the
    * reference's two voting modes). The sub-estimator here is the
    * closed-form simple OLS (the same exact moment sums as
    * [[groupedOls]]); blocks come from the portable hash so the
    * partition→estimator mapping is deterministic and engine-replayable
    * rather than an accident of chunking.
    *
    * Scale shape: the models frame is nBlocks rows → broadcast to the
    * test side (no shuffle of test data); the per-row mean folds the
    * nBlocks predictions in block order (ordered fold — deterministic
    * across partitionings, DuckDB `list_sum(list(v ORDER BY k))`
    * replayable); the vote is exact integer counting. */
  def blockwiseOls(train: DataFrame, test: DataFrame, idCol: String,
      xCol: String, yCol: String, nBlocks: Int,
      threshold: Double): DataFrame = {
    require(nBlocks >= 2 && nBlocks <= 64, s"nBlocks must be in [2,64]: $nBlocks")
    val models = groupedOls(
      train.withColumn("__blk",
        graft.functions.PortableHash.bucket(col(idCol), nBlocks)),
      "__blk", xCol, yCol).cache()
    // Fail loudly if any hash block got no training rows (missing model
    // row) or zero x-variance (null slope from the closed form): the
    // mean below divides by nBlocks and the vote compares against
    // nBlocks, so a silently absent/NaN block would bias every test row.
    val nFit = models
      .filter(col("slope").isNotNull && !isnan(col("slope")) &&
        col("intercept").isNotNull && !isnan(col("intercept")))
      .count()
    require(nFit == nBlocks,
      s"blockwiseOls: only $nFit of $nBlocks hash blocks produced a usable " +
        "model (empty or zero-x-variance block) — reduce nBlocks or check " +
        "the block key distribution")
    val pred = col("intercept") + col("slope") * col(xCol).cast("double")
    val joined = test.select(col(idCol), col(xCol))
      .crossJoin(broadcast(models))
      .select(col(idCol), col("__blk"), pred.as("__pred"))
    val folded = joined.groupBy(col(idCol))
      .agg(collect_list(struct(col("__blk"), col("__pred").as("v"))).as("__ps"),
        count(when(col("__pred") > threshold, lit(1))).as("votes_over"))
    folded.select(col(idCol),
      (aggregate(array_sort(col("__ps")), lit(0.0),
        (acc, s) => acc + s.getField("v")) / lit(nBlocks.toDouble))
        .as("prediction"),
      col("votes_over"),
      (col("votes_over") * 2L > nBlocks.toLong).cast("int").as("vote_label"))
  }

  /** Distributed sparse matrix multiply in COO form — the reference's
    * `mt.dot`/`tensordot` (mars/tensor/linalg/dot.py, tensordot/core.py)
    * for the regime where BOTH operands are too large to broadcast:
    * C(i,j) = Σ_k A(i,k)·B(k,j) as one shuffle join on the contraction
    * index k followed by one partial+final aggregate keyed (i,j). Zeros
    * are implicit (COO), so cost scales with nnz, and skew on a hot k
    * is AQE's standard skew-join case. For a small dense right operand
    * prefer [[graft.api.GraftFrame.dot]] (broadcast, single shuffle). */
  def cooMatmul(a: DataFrame, ai: String, ak: String, av: String,
      b: DataFrame, bk: String, bj: String, bv: String): DataFrame =
    a.join(b, a(ak) === b(bk))
      .groupBy(a(ai).as("i"), b(bj).as("j"))
      .agg(sum(a(av) * b(bv)).as("v"))

  /** einsum over COO frames (reference mt.einsum,
    * mars/tensor/einsum/core.py — which compiles the subscript spec to a
    * contraction plan the same way): each operand is a frame whose index
    * columns are NAMED BY their subscript letters plus a `v` value
    * column. Shared letters absent from the output are contracted (one
    * equi-join on all shared letters + one partial+final sum keyed by
    * the output letters); letters kept in the output pass through as
    * batch dims. Covers matmul `ij,jk->ik`, batch matmul `bij,bjk->bik`,
    * dot `ij,ij->`, Hadamard `ij,ij->ij`, outer `i,j->ij`, transpose
    * `ij->ji`, and axis sums `ij->i` — the practically-used einsum
    * family; repeated subscripts WITHIN one operand (trace/diagonal) are
    * rejected, like the restricted einsum many engines ship.
    *
    * Scale shape identical to [[cooMatmul]]: cost tracks nnz, the join
    * shuffles on the contraction letters, and the reduction is
    * partial-aggregatable. An outer product (no shared letters) plans a
    * cross join by definition — size the operands accordingly. */
  def einsumCoo(spec: String, a: DataFrame, b: DataFrame = null): DataFrame = {
    val cleaned = spec.replaceAll("\\s", "")
    val parts = cleaned.split("->", -1)
    require(parts.length == 2, s"einsum spec needs '->': $spec")
    val ins = parts(0).split(",")
    val out = parts(1)
    require(ins.nonEmpty && ins.length <= 2 && ins.forall(_.nonEmpty),
      s"einsum supports 1 or 2 operands: $spec")
    (ins :+ out).foreach { s =>
      require(s.toSet.size == s.length,
        s"repeated subscripts within '$s' (trace/diagonal) are unsupported: $spec")
      require(!s.contains('v'), s"subscript 'v' collides with the value column: $spec")
    }
    val inLetters = ins.mkString.toSet
    require(out.forall(inLetters.contains),
      s"output subscripts must come from the inputs: $spec")
    def cols(s: String) = s.map(c => col(c.toString))
    if (ins.length == 1) {
      require(b == null, s"spec '$spec' names one operand but two were passed")
      if (out.length == ins(0).length)
        a.select(cols(out) :+ col("v"): _*) // pure index permutation
      else
        a.groupBy(cols(out): _*).agg(sum(col("v")).as("v"))
    } else {
      require(b != null, s"spec '$spec' names two operands but one was passed")
      val shared = (ins(0).toSet intersect ins(1).toSet).map(_.toString).toSeq.sorted
      val l = a.select(cols(ins(0)) :+ col("v").as("__va"): _*)
      val r = b.select(cols(ins(1)) :+ col("v").as("__vb"): _*)
      val joined =
        if (shared.nonEmpty) l.join(r, shared) else l.crossJoin(r)
      joined.groupBy(cols(out): _*)
        .agg(sum(col("__va") * col("__vb")).as("v"))
    }
  }

  /** tensordot over COO frames (reference mt.tensordot,
    * mars/tensor/linalg/tensordot.py — the chunk plan there contracts
    * paired axes the same way): contract each (aAxis, bAxis) pair; free
    * axes pass through in (a-free, b-free) order. One equi-join on the
    * paired axes + one partial+final sum — the cooMatmul/einsumCoo
    * scale shape generalized to arbitrary axis pairings (einsumCoo
    * needs shared-letter column names; tensordot maps differently-named
    * axes). All-axes contraction degenerates to a single scalar row —
    * which is exactly vdot/inner ([[cooVdot]]). */
  def cooTensordot(a: DataFrame, aIdx: Seq[String], b: DataFrame,
      bIdx: Seq[String], axes: Seq[(String, String)]): DataFrame = {
    require(axes.nonEmpty,
      "tensordot with no contracted axes is an outer product — build it explicitly")
    require(axes.map(_._1).forall(aIdx.contains) &&
      axes.map(_._2).forall(bIdx.contains),
      s"contracted axes $axes must name index columns of a=$aIdx / b=$bIdx")
    val aFree = aIdx.filterNot(axes.map(_._1).toSet)
    val bFree = bIdx.filterNot(axes.map(_._2).toSet)
    require((aFree ++ bFree).distinct.size == aFree.size + bFree.size,
      s"free axis names collide between operands: $aFree vs $bFree")
    val l = a.select(aIdx.map(col) :+ col("v").as("__va"): _*)
    val r = b.select(bIdx.map(col) :+ col("v").as("__vb"): _*)
    val joined = l.join(r,
      axes.map { case (x, y) => l(x) === r(y) }.reduce(_ && _))
    val outCols = aFree.map(l(_)) ++ bFree.map(r(_))
    if (outCols.isEmpty)
      joined.agg(sum(col("__va") * col("__vb")).as("v"))
    else
      joined.groupBy(outCols: _*).agg(sum(col("__va") * col("__vb")).as("v"))
  }

  /** vdot / inner over identically-indexed COO frames (reference
    * mt.vdot, mars/tensor/linalg/vdot.py:21 and mt.inner, inner.py:21 —
    * flatten-and-dot): full contraction over ALL index columns,
    * Σ A∘B as one scalar row. Implicit zeros make the inner join
    * correct: absent cells contribute nothing. */
  def cooVdot(a: DataFrame, idx: Seq[String], b: DataFrame): DataFrame =
    cooTensordot(a, idx, b, idx, idx.map(x => (x, x)))

  /** Sparse elementwise add in COO form (reference mt.add over sparse
    * tensors, mars/tensor/arithmetic + lib/sparse/): one full outer join
    * on (i, j), absent cells are implicit zeros; exact for integer/
    * decimal values. Result drops cells that cancel to exactly 0 only
    * if `dropZeros` (COO canonical form). */
  def cooAdd(a: DataFrame, b: DataFrame, dropZeros: Boolean = true): DataFrame = {
    val l = a.select(col("i"), col("j"), col("v").as("__va"))
    val r = b.select(col("i"), col("j"), col("v").as("__vb"))
    val merged = l.join(r, Seq("i", "j"), "full_outer")
      .select(col("i"), col("j"),
        (coalesce(col("__va"), lit(0.0)) + coalesce(col("__vb"), lit(0.0))).as("v"))
    if (dropZeros) merged.filter(col("v") =!= 0.0) else merged
  }

  /** numpy fill_diagonal over an n×n COO frame (reference
    * tensor/indexing/fill_diagonal.py): present diagonal cells are
    * overwritten by a projection; ABSENT diagonal cells are inserted
    * (numpy writes every [k,k], dense or not) via a left-anti join of
    * the generated diagonal against the existing cells — shuffles only
    * the n-row diagonal plus the matched keys, never the matrix body. */
  def cooFillDiagonal(m: DataFrame, n: Long, value: Double): DataFrame = {
    require(n > 0, s"fill_diagonal needs n > 0: $n")
    val spark = m.sparkSession
    val overwritten = m.select(col("i"), col("j"),
      when(col("i") === col("j"), lit(value)).otherwise(col("v")).as("v"))
    val missing = spark.range(n)
      .select(col("id").as("i"), col("id").as("j"))
      .join(m.select("i", "j").where(col("i") === col("j")),
        Seq("i", "j"), "left_anti")
      .select(col("i"), col("j"), lit(value).as("v"))
    overwritten.unionByName(missing)
  }

  /** Sparse transpose in COO form — a pure projection, zero shuffle
    * (the reference re-tiles chunks for this; COO just swaps indices). */
  def cooTranspose(a: DataFrame): DataFrame =
    a.select(col("j").as("i"), col("i").as("j"), col("v"))

  /** Sparse scalar multiply — pure projection. */
  def cooScale(a: DataFrame, alpha: Double): DataFrame =
    a.select(col("i"), col("j"), (col("v") * lit(alpha)).as("v"))

  /** Column-wise (axis-0) tensor reductions over an array column — the
    * reference's mt.sum/mean/min/max/var(axis=0) over a tall matrix
    * (mars/tensor/reduction/sum.py and siblings): posexplode to (component, value)
    * pairs, then ONE partial+final aggregate keyed by component index.
    * Map-side combine means shuffle volume is dim × partitions, never
    * dim × rows — the axis reduction stays scan-bound at 100 TB. */
  def axisStats(df: DataFrame, arrCol: String): DataFrame =
    df.select(posexplode(col(arrCol)))
      .select(col("pos").cast("long").as("idx"), col("col").cast("double").as("x"))
      .groupBy(col("idx"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum"),
        avg(col("x")).as("mean"), min(col("x")).as("mn"),
        max(col("x")).as("mx"), var_samp(col("x")).as("var"))

  /** TruncatedSVD (reference mars/learn/decomposition/_truncated_svd.py):
    * SVD of the UNCENTERED matrix — transform = X·V (= U·Σ), components
    * = Vᵀ, singular values desc. Fit is the distributed RowMatrix SVD
    * (one Gramian treeAggregate); transform broadcasts Vᵀ as a literal
    * matvec — zero shuffle, scan speed at any row count. Returns
    * (frame + `projection` array column, singular values, Vᵀ as k×dim).
    * Explained-variance ratios follow sklearn: var_samp of each
    * projection column over total input variance — compute them with
    * ordinary aggregates on the returned frame (LearnSpec shows the
    * recipe); they are not materialized here because transform is lazy. */
  def truncatedSvd(df: DataFrame, featuresArrayCol: String, k: Int)
      : (DataFrame, Array[Double], Seq[Seq[Double]]) = {
    val (sv, v) = svd(df, featuresArrayCol, k)
    val vt: Seq[Seq[Double]] =
      (0 until k).map(j => v.indices.map(i => v(i)(j)).toSeq)
    val out = df.withColumn("projection",
      graft.functions.VectorFunctions.matvec(vt, col(featuresArrayCol)))
    (out, sv, vt)
  }

  /** Distributed bagging bootstrap (reference
    * mars/learn/ensemble/_bagging.py BaggingSample): `nEstimators`
    * deterministic bootstrap samples in ONE pass — each row's
    * multiplicity in sample t is Poisson(lambda) (the standard
    * distributed approximation of sampling with replacement), drawn by
    * inverse CDF over the portable uniform of key id·nEstimators + t, so
    * samples are independent across estimators yet bit-reproducible
    * across runs, partitionings, and engines. Rows with multiplicity 0
    * are absent; survivors carry (estimator, weight). One projection +
    * explode — no shuffle of the corpus.
    *
    * The inverse-CDF cutoffs are literal doubles in the plan (truncated
    * at multiplicity 8, far beyond any mass at lambda ≤ 2 — documented
    * cap, excess mass lands on 8). */
  def baggingSample(df: DataFrame, idCol: String, nEstimators: Int,
      lambda: Double = 1.0, seed: Long = 0L): DataFrame = {
    require(nEstimators >= 1 && nEstimators <= 1000,
      s"nEstimators must be in [1, 1000]: $nEstimators")
    require(lambda > 0.0 && lambda <= 2.0,
      s"lambda must be in (0, 2] (bootstrap fraction): $lambda")
    require(seed >= 0, s"seed must be nonnegative (sqlHash32 contract): $seed")
    val cut = poissonCdfCuts(lambda)
    val est = explode(sequence(lit(0), lit(nEstimators - 1)))
    val withEst = df.withColumn("estimator", est)
    val key = col(idCol).cast("long") * nEstimators + col("estimator") +
      lit(seed)
    val u = graft.functions.PortableHash.uniform01(key)
    val mult = cut.zipWithIndex.foldRight(lit(cut.length): Column) {
      case ((c, i), acc) => when(u < lit(c), i).otherwise(acc)
    }
    withEst.withColumn("weight", mult.cast("long"))
      .filter(col("weight") >= 1L)
  }

  /** Cumulative Poisson CDF cutoffs P(X ≤ m) for m = 0..7 — driver-side
    * constants embedded as plan literals (and, via Double.toString's
    * round-trip guarantee, as oracle SQL literals). */
  def poissonCdfCuts(lambda: Double): Seq[Double] = {
    var p = math.exp(-lambda)
    var cum = p
    val cuts = scala.collection.mutable.Buffer(cum)
    for (m <- 1 to 7) { p = p * lambda / m; cum += p; cuts += cum }
    cuts.toSeq
  }

  /** Majority vote across per-estimator predictions (reference
    * mars/learn/ensemble/_blockwise.py BlockwiseVoting hard voting):
    * one (id, estimator, prediction) frame in, the modal prediction per
    * id out — deterministic min-label tiebreak. One count aggregate +
    * one argmax aggregate, both partial+final. */
  def baggingVote(pred: DataFrame, idCol: String, predCol: String): DataFrame =
    pred.groupBy(col(idCol), col(predCol))
      .agg(count(lit(1)).as("__votes"))
      .groupBy(col(idCol))
      .agg(max(struct(col("__votes"),
        -col(predCol).cast("double"), col(predCol).as("__p")))
        .getField("__p").as("prediction"))

  /** sklearn calibration_curve (strategy='uniform'): nBins equal-width
    * probability buckets; per bin the positive fraction (exact
    * rational) and the mean predicted probability. The cross-row
    * probability sum goes through exact 1e-6-scaled BIGINTs (the
    * probMetrics convention) so the curve is order-free and
    * engine-replayable; p = 1.0 lands in the top bin like sklearn.
    * One partial+final aggregate — scan speed. */
  def calibrationCurve(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("double")
    val bin = least(floor(p * nBins).cast("long"), lit(nBins - 1L))
    df.select(bin.as("bin"), p.as("__p"), y.as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y").cast("long")).as("n_pos"),
        sum(floor(col("__p") * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("__psum"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("frac_positive"),
        (col("__psum").cast("double") / lit(1000000.0) /
          col("n").cast("double")).as("mean_predicted"))
  }

  /** Ranking/retrieval metrics per query — the evaluation half of the
    * ANN/similarity stack (sklearn ndcg_score semantics; P@k / R@k /
    * MRR are the standard IR trio): input is one row per (query,
    * candidate) with a retrieval `score` and a graded `rel`evance.
    * Candidates rank by score desc (ties → lower id first — the same
    * deterministic tiebreak every oracle needs); the ideal ranking
    * sorts by relevance desc.
    *
    * Returns per query: n_candidates, n_relevant, precision@k,
    * recall@k (exact rationals), mrr (exact rational 1/first-hit rank),
    * dcg@k, idcg@k and ndcg@k. The DCG sums fold in rank order
    * (ordered fold — deterministic across partitionings and engines;
    * k terms per query, bounded state). One window + one aggregate per
    * query key — no global windows, no self-joins. */
  def retrievalMetrics(df: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val wIdeal = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).cast("double").desc, col(idCol))
    val ranked = df
      .withColumn("__r", row_number().over(w))
      .withColumn("__ri", row_number().over(wIdeal))
    val rel = col(relCol).cast("double")
    val dcgTerm = struct(col("__r").as("r"),
      (rel / log2(col("__r").cast("double") + lit(1.0))).as("t"))
    val idcgTerm = struct(col("__ri").as("r"),
      (rel / log2(col("__ri").cast("double") + lit(1.0))).as("t"))
    def foldSum(c: Column) = aggregate(array_sort(c), lit(0.0),
      (acc, s) => acc + s.getField("t"))
    val agg = ranked.groupBy(col(queryCol))
      .agg(
        count(lit(1)).as("n_candidates"),
        count(when(rel > 0, lit(1))).as("n_relevant"),
        count(when(col("__r") <= k && rel > 0, lit(1))).as("__hits"),
        min(when(rel > 0, col("__r"))).as("__first"),
        collect_list(when(col("__r") <= k, dcgTerm)).as("__dcg"),
        collect_list(when(col("__ri") <= k, idcgTerm)).as("__idcg"))
    val dcg = foldSum(col("__dcg"))
    val idcg = foldSum(col("__idcg"))
    agg.select(col(queryCol),
      col("n_candidates"), col("n_relevant"),
      (col("__hits").cast("double") / lit(k.toDouble)).as("precision_at_k"),
      when(col("n_relevant") > 0,
        col("__hits").cast("double") / col("n_relevant").cast("double"))
        .otherwise(lit(0.0)).as("recall_at_k"),
      when(col("__first").isNotNull,
        lit(1.0) / col("__first").cast("double")).otherwise(lit(0.0)).as("mrr"),
      dcg.as("dcg_at_k"), idcg.as("idcg_at_k"),
      when(idcg > 0.0, dcg / idcg).otherwise(lit(0.0)).as("ndcg_at_k"))
  }

  /** Matrix / vector-column norms (reference tensor norm): "fro" (whole
    * column of vectors), row-wise "l1"/"l2"/"linf" as expressions. */
  def frobeniusNorm(df: DataFrame, featuresArrayCol: String): Double =
    math.sqrt(df.select(
      sum(aggregate(col(featuresArrayCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("s"))
      .collect().head.getDouble(0))

  /** The matrix-norm orders of mt.linalg.norm (norm.py:128-168) over a
    * row-vector matrix: Frobenius, ∞ (max row abs-sum), 1 (max column
    * abs-sum), spectral (σ₁) and nuclear (Σσ). The first three are one
    * distributed pass — fro through the scaled-integer cross-row sum
    * (order-free, engine-replayable), ∞ a max of per-row ordered folds,
    * 1 a posexplode keyed by position (≤ dim groups) — and the σ-based
    * pair reuses the audited [[svd]] Gramian path (k = dim, driver-side
    * eigen factor only; the data is never collected). */
  def matrixNorms(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val v = col(vecCol)
    val rowSqScaled = floor(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")) * lit(1000000.0) +
      lit(0.5)).cast("long")
    val rowAbs = aggregate(v, lit(0.0), (acc, x) => acc + abs(x.cast("double")))
    val froInf = df.select(rowSqScaled.as("__sq"), rowAbs.as("__ra"))
      .agg(count(lit(1)).as("n_rows"),
        sqrt(sum(col("__sq")).cast("double") / lit(1000000.0)).as("fro"),
        max(col("__ra")).as("norm_inf"))
    val colScaled = df.select(posexplode(v).as(Seq("__p", "__x")))
      .groupBy(col("__p"))
      .agg(sum(floor(abs(col("__x").cast("double")) * lit(1000000.0) +
        lit(0.5)).cast("long")).as("__s"))
      .agg((max(col("__s")).cast("double") / lit(1000000.0)).as("norm_one"))
    val dim = df.select(size(v)).head().getInt(0)
    val sigma = svd(df, vecCol, dim)._1
    froInf.crossJoin(colScaled)
      .withColumn("spectral", lit(sigma.head))
      .withColumn("nuclear", lit(sigma.sum))
  }

  def rowNorm(c: Column, ord: String = "l2"): Column = ord match {
    case "l2" => sqrt(aggregate(c, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    case "l1" => aggregate(c, lit(0.0), (acc, x) => acc + abs(x.cast("double")))
    case "linf" => array_max(transform(c, x => abs(x.cast("double"))))
    case o => throw new IllegalArgumentException(s"unknown norm: $o")
  }

  // ---------------------------------------------------------------- metrics
  /** Pairwise distance matrix between two (id, array<float>) frames
    * (reference mars/learn/metrics/pairwise/): broadcast the smaller side,
    * score with codegen'd fold expressions — linear in |a|×|b| with no
    * shuffle of the large side. */
  def pairwiseDistances(a: DataFrame, b: DataFrame, metric: String = "euclidean")
      : DataFrame = {
    val native = a.sparkSession.catalog.functionExists("graft_cosine")
    val cosineCol =
      if (native) call_function("graft_cosine", col("avec"), col("bvec"))
      else graft.functions.VectorFunctions.cosine(col("avec"), col("bvec"))
    val euclideanCol =
      if (native) call_function("graft_euclidean", col("avec"), col("bvec"))
      else graft.functions.VectorFunctions.euclidean(col("avec"), col("bvec"))
    val dist = metric match {
      case "euclidean" => euclideanCol
      case "cosine" => lit(1.0) - cosineCol
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }
    a.crossJoin(broadcast(b)).withColumn("dist", dist)
  }

  /** Pairwise haversine great-circle distances in radians between an
    * (`aid`, `alat`, `alon`) frame and a (`bid`, `blat`, `blon`) frame,
    * coordinates in degrees (reference
    * mars/learn/metrics/pairwise/haversine.py:30). Broadcast the smaller
    * side; the arc formula is a pure codegen expression, so the large side
    * streams at scan speed. Multiply by 6371.0 for kilometres. */
  def haversineDistances(a: DataFrame, b: DataFrame): DataFrame = {
    // deltas converted AFTER subtraction (radians(b - a), not
    // radians(b) - radians(a)) so an oracle writing the textbook formula
    // lands on bit-identical intermediate doubles
    val sLat = sin(radians(col("blat") - col("alat")) / 2)
    val sLon = sin(radians(col("blon") - col("alon")) / 2)
    val h = sLat * sLat +
      cos(radians(col("alat"))) * cos(radians(col("blat"))) * sLon * sLon
    a.crossJoin(broadcast(b)).withColumn("dist", lit(2.0) * asin(sqrt(h)))
  }

  /** RBF kernel exp(-gamma * ||x - y||^2) between two (id, array<float>)
    * frames (reference mars/learn/metrics/pairwise/rbf_kernel.py:28):
    * broadcast-small-side scoring on the native euclidean expression (the
    * squared distance is dist*dist so the hot loop stays whole-stage
    * codegen). */
  def rbfKernel(a: DataFrame, b: DataFrame, gamma: Double): DataFrame = {
    val native = a.sparkSession.catalog.functionExists("graft_euclidean")
    val dist =
      if (native) call_function("graft_euclidean", col("avec"), col("bvec"))
      else graft.functions.VectorFunctions.euclidean(col("avec"), col("bvec"))
    a.crossJoin(broadcast(b)).withColumn("k", exp(lit(-gamma) * dist * dist))
  }

  /** label_binarize (reference mars/learn/preprocessing/_label.py,
    * opcodes.py:3308): one 0/1 indicator column per class — a pure
    * projection, no shuffle, no fitted state. */
  def labelBinarize(df: DataFrame, labelCol: String, classes: Seq[Any]): DataFrame =
    classes.foldLeft(df)((d, c) =>
      d.withColumn(s"${labelCol}_$c", when(d(labelCol) === lit(c), 1L).otherwise(0L)))

  /** Regression metrics from plain aggregates: rmse, mae, r2 (SS_tot via
    * moment sums so it stays a single partial+final aggregate). */
  /** Binary log-loss (sklearn log_loss) and Brier score in one pass:
    * −mean(y·log p + (1−y)·log(1−p)) and mean((p−y)²), with sklearn's
    * eps-clipping so hard 0/1 probabilities stay finite. Both are
    * cross-row means of per-row doubles, so they sum exact scaled
    * integers (CLAUDE.md convention) — deterministic across
    * partitionings and engines. */
  def probMetrics(df: DataFrame, labelCol: String, probCol: String,
      eps: Double = 1e-15): DataFrame = {
    val y = col(labelCol).cast("double")
    val p = least(lit(1.0) - lit(eps), greatest(lit(eps), col(probCol).cast("double")))
    val llTerm = -(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))
    val brTerm = (p - y) * (p - y)
    def sInt(c: Column) =
      sum(floor(c * lit(1000000.0) + lit(0.5)).cast("long"))
    df.agg(sInt(llTerm).as("__ll"), sInt(brTerm).as("__br"),
        count(lit(1)).as("__n"))
      .select(
        (col("__ll").cast("double") / lit(1000000.0) /
          col("__n").cast("double")).as("log_loss"),
        (col("__br").cast("double") / lit(1000000.0) /
          col("__n").cast("double")).as("brier"))
  }

  /** Multiclass log-loss (the multiclass branch of sklearn log_loss —
    * reference mars/learn/metrics/_classification.py:206): per row,
    * −log of the true class's probability slot after sklearn's
    * eps-clip-then-row-renormalize; the clip keeps hard 0 slots finite
    * and the renormalization is an in-row ordered fold (same order both
    * engines). The cross-row mean sums exact scaled integers (CLAUDE.md
    * convention) — deterministic across partitionings. `labelCol` must
    * be an integral class index into the 1-based probability array. */
  def logLossMulticlass(df: DataFrame, labelCol: String, probArrCol: String,
      eps: Double = 1e-15): DataFrame = {
    val clipped = transform(col(probArrCol), x =>
      least(lit(1.0) - lit(eps), greatest(lit(eps), x.cast("double"))))
    val rowSum = aggregate(clipped, lit(0.0), (a, v) => a + v)
    val pick = element_at(clipped, col(labelCol).cast("int") + 1) / rowSum
    df.select((-log(pick)).as("__t"))
      .agg(sum(floor(col("__t") * lit(1000000.0) + lit(0.5)).cast("long"))
        .as("__ll"), count(lit(1)).as("__n"))
      .select((col("__ll").cast("double") / lit(1000000.0) /
        col("__n").cast("double")).as("log_loss"))
  }

  /** get_scorer (reference mars/learn/metrics/_scorer.py — the SCORERS
    * registry is exactly {r2, accuracy, neg_log_loss}): resolves the
    * name to a scoring function (df, labelCol, col2) → one-row frame
    * with column `score`. `col2` is the prediction column for
    * r2/accuracy and the probability-array column for neg_log_loss
    * (sklearn's needs_proba). Unknown names raise with the valid set,
    * like the reference. */
  def getScorer(name: String): (DataFrame, String, String) => DataFrame =
    name match {
      case "r2" => (df, y, p) =>
        regressionMetrics(df, y, p).select(col("r2").as("score"))
      case "accuracy" => (df, y, p) =>
        accuracy(df, y, p).select(col("accuracy").as("score"))
      case "neg_log_loss" => (df, y, p) =>
        logLossMulticlass(df, y, p)
          .select((-col("log_loss")).as("score"))
      case o => throw new IllegalArgumentException(
        s"$o is not a valid scoring value. Valid options are " +
          "[accuracy, neg_log_loss, r2]")
    }

  def regressionMetrics(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    val err = y - col(predCol).cast("double")
    val n = count(lit(1)).cast("double")
    df.agg(
      sqrt(avg(err * err)).as("rmse"),
      avg(abs(err)).as("mae"),
      (lit(1.0) - sum(err * err) / (sum(y * y) - sum(y) * sum(y) / n)).as("r2"))
  }

  /** Mean silhouette coefficient per cluster (sklearn silhouette_score
    * decomposed by label): a = mean distance to own cluster (self
    * excluded), b = min over other clusters of the mean distance,
    * s = (b − a) / max(a, b); singletons get s = 0 (sklearn's
    * convention). Exact all-pairs formulation — O(n²) like sklearn's.
    * Returns (label, n, mean_s).
    *
    * Scale guard: the all-pairs join is a cartesian product, so a
    * mis-aimed call on a large frame must fail loudly rather than plan
    * n² pair distances. `maxRows` is a hard count guard (transposeSmall
    * pattern); pass `sampleN` (sklearn's sample_size=) to score a
    * deterministic hash-ordered sample instead — the scale path. */
  def silhouetteByCluster(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, maxRows: Int = 20000, sampleN: Int = -1): DataFrame = {
    val input =
      if (sampleN > 0) {
        require(sampleN <= maxRows,
          s"sampleN=$sampleN still plans an O(n²) pair join past maxRows=$maxRows")
        // deterministic TakeOrdered on an id hash — no rand(), no collect
        df.orderBy(hash(col(idCol)), col(idCol)).limit(sampleN)
      } else {
        val n = df.limit(maxRows + 1).count()
        require(n <= maxRows,
          s"silhouetteByCluster is exact all-pairs (O(n²), like sklearn): " +
            s"> $maxRows rows would plan a cartesian join. Pass sampleN= " +
            "(sklearn sample_size=) to score a deterministic sample at scale.")
        df
      }
    val base = input.select(col(idCol).as("__id"), col(labelCol).as("__l"),
      col(vecCol).as("__v"))
    val other = base.select(col("__id").as("__id2"), col("__l").as("__l2"),
      col("__v").as("__v2"))
    val pairs = base.join(other, col("__id") =!= col("__id2"))
      .select(col("__id"), col("__l"), col("__l2"),
        graft.functions.VectorFunctions.euclidean(col("__v"), col("__v2")).as("__d"))
    val byCluster = pairs.groupBy(col("__id"), col("__l"), col("__l2"))
      .agg(avg(col("__d")).as("__md"))
    val own = byCluster.filter(col("__l") === col("__l2"))
      .select(col("__id"), col("__md").as("__a"))
    val nearest = byCluster.filter(col("__l") =!= col("__l2"))
      .groupBy(col("__id"), col("__l")).agg(min(col("__md")).as("__b"))
    nearest.join(own, Seq("__id"), "left")
      .withColumn("__s", when(col("__a").isNull, lit(0.0))
        .otherwise((col("__b") - col("__a")) / greatest(col("__a"), col("__b"))))
      .groupBy(col("__l").as("label"))
      .agg(count(lit(1)).as("n"), avg(col("__s")).as("mean_s"))
  }

  /** Mutual information between two discrete columns in nats (sklearn
    * mutual_info_score): Σ_xy p_xy · ln(p_xy / (p_x p_y)), from one
    * (x, y) count aggregate plus its two marginals — no pairwise scan. */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__nxy"))
    val mx = joint.groupBy(col("__x")).agg(sum(col("__nxy")).as("__nx"))
    val my = joint.groupBy(col("__y")).agg(sum(col("__nxy")).as("__ny"))
    val n = joint.agg(sum(col("__nxy")).as("__n"))
    joint
      .join(broadcast(mx), Seq("__x")).join(broadcast(my), Seq("__y"))
      .crossJoin(broadcast(n))
      .agg(sum((col("__nxy").cast("double") / col("__n").cast("double")) *
        log((col("__n").cast("double") * col("__nxy").cast("double")) /
          (col("__nx").cast("double") * col("__ny").cast("double"))))
        .as("mi"))
  }

  /** Cohen's kappa between two label columns (sklearn cohen_kappa_score):
    * (p_o − p_e) / (1 − p_e) with chance agreement from the marginals.
    * One confusion-count aggregate; every term is an exact integer ratio,
    * so the result is engine-deterministic without rounding. The n·n and
    * Σ nₐ·n_b products go through DECIMAL, not long×long — a long product
    * overflows (ANSI: throws) past ~3e9 rows, which a 100 TB frame
    * exceeds; DECIMAL(38,0) stays exact to 1e38 and converts to the same
    * double below 2^53. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val cm = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val po = cm.agg(
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(lit(0L))).as("__agree"),
      sum(col("__n")).as("__total"))
    val ma = cm.groupBy(col("__a")).agg(sum(col("__n")).as("__na"))
    val mb = cm.groupBy(col("__b").as("__a")).agg(sum(col("__n")).as("__nb"))
    val pe = ma.join(mb, Seq("__a"), "inner")
      .agg(sum(dec(col("__na")) * dec(col("__nb"))).as("__cross"))
    val totalSq = (dec(col("__total")) * dec(col("__total"))).cast("double")
    po.crossJoin(pe).select(
      ((col("__agree").cast("double") / col("__total").cast("double") -
        col("__cross").cast("double") / totalSq) /
        (lit(1.0) - col("__cross").cast("double") / totalSq)).as("kappa"))
  }

  /** Classification accuracy. */
  def accuracy(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.agg((sum(when(col(labelCol) === col(predCol), 1L).otherwise(0L)) /
      count(lit(1)).cast("double")).as("accuracy"))

  /** accuracy_score with sklearn's sample_weight and normalize params
    * (reference mars/learn/metrics/_classification.py:136 `_weighted_sum`):
    * Σ w·[y==ŷ] / Σ w, or the raw weighted hit count with
    * normalize=false. One partial+final aggregate. Integer-valued weights
    * keep both sums exact in doubles (order-free); arbitrary float
    * weights make the final scalar order-dependent at the ulp level, as
    * in sklearn. */
  def accuracyWeighted(df: DataFrame, labelCol: String, predCol: String,
      weightCol: String, normalize: Boolean = true): DataFrame = {
    val w = col(weightCol).cast("double")
    val hit = sum(when(col(labelCol) === col(predCol), w).otherwise(lit(0.0)))
    if (normalize) df.agg((hit / sum(w)).as("accuracy"))
    else df.agg(hit.as("accuracy"))
  }

  /** Binary Matthews correlation coefficient (sklearn matthews_corrcoef;
    * same confusion-count machinery as the kappa/report family): labels
    * and predictions in {0, 1}. MCC = (tp·tn − fp·fn) /
    * √((tp+fp)(tp+fn)(tn+fp)(tn+fn)); a zero denominator factor → 0
    * like sklearn. All four counts come from ONE partial+final
    * aggregate as exact longs, so the statistic is deterministic and
    * engine-replayable (the products go through double before the
    * sqrt — exact to 2⁵³, loud well past any real confusion table). */
  def matthewsCorr(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val y = col(labelCol).cast("long")
    val p = col(predCol).cast("long")
    val agg = df.agg(
      count(when(y === 1 && p === 1, lit(1))).as("tp"),
      count(when(y === 0 && p === 0, lit(1))).as("tn"),
      count(when(y === 0 && p === 1, lit(1))).as("fp"),
      count(when(y === 1 && p === 0, lit(1))).as("fn"))
    val tp = col("tp").cast("double"); val tn = col("tn").cast("double")
    val fp = col("fp").cast("double"); val fn = col("fn").cast("double")
    val denomSq = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    agg.select(col("tp"), col("tn"), col("fp"), col("fn"),
      when(denomSq > 0.0, (tp * tn - fp * fn) / sqrt(denomSq))
        .otherwise(lit(0.0)).as("mcc"))
  }

  /** sklearn balanced_accuracy_score: the macro average of per-class
    * recall — robust to class imbalance where plain accuracy saturates.
    * Per-class recalls are exact long/long rationals; the cross-class
    * mean folds in sorted class order (deterministic, engine-
    * replayable). Classes are the distinct LABELS, like sklearn. */
  def balancedAccuracy(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val perClass = df.groupBy(col(labelCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"),
        count(when(col(labelCol) === col(predCol), lit(1))).as("__hit"))
    perClass.agg(
      count(lit(1)).as("n_classes"),
      (aggregate(
        array_sort(collect_list(struct(col("__c"),
          (col("__hit").cast("double") / col("__n").cast("double")).as("r")))),
        lit(0.0), (acc, s) => acc + s.getField("r")) /
        count(lit(1)).cast("double")).as("balanced_accuracy"))
  }

  /** Per-class precision / recall / F1 from one confusion pass (the
    * reference's classification metrics, mars/learn/metrics/): a single
    * partial/final count aggregate keyed by (label, pred), then the three
    * ratios per class — no per-class scan. */
  def classificationReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val tp = cm.filter(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val actual = cm.groupBy(col("label").as("cls")).agg(sum("n").as("support"))
    val predicted = cm.groupBy(col("pred").as("cls")).agg(sum("n").as("n_pred"))
    actual
      .join(predicted, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        when(coalesce(col("n_pred"), lit(0L)) > 0,
          coalesce(col("tp"), lit(0L)).cast("double") /
            col("n_pred").cast("double")).as("precision"),
        when(coalesce(col("support"), lit(0L)) > 0,
          coalesce(col("tp"), lit(0L)).cast("double") /
            col("support").cast("double")).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** precision_recall_fscore_support (reference
    * mars/learn/metrics/_classification.py:690): one row per class of the
    * sorted label∪pred set with precision, recall, Fβ and support, sklearn
    * zero_division=0 semantics (an absent denominator yields 0.0, not
    * null). Same single partial/final confusion aggregate as
    * [[classificationReport]]; β generalizes F1
    * (Fβ = (1+β²)·p·r / (β²·p + r)). Precision/recall are exact long/long
    * rationals, so the per-class rows are engine-deterministic. */
  def prfSupport(df: DataFrame, labelCol: String, predCol: String,
      beta: Double = 1.0): DataFrame = {
    val b2 = beta * beta
    val cm = df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val tp = cm.filter(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val actual = cm.groupBy(col("label").as("cls")).agg(sum("n").as("support"))
    val predicted = cm.groupBy(col("pred").as("cls")).agg(sum("n").as("n_pred"))
    actual
      .join(predicted, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("__tp"),
        coalesce(col("n_pred"), lit(0L)).as("__np"))
      .select(col("cls"), col("support"),
        when(col("__np") > 0,
          col("__tp").cast("double") / col("__np").cast("double"))
          .otherwise(lit(0.0)).as("precision"),
        when(col("support") > 0,
          col("__tp").cast("double") / col("support").cast("double"))
          .otherwise(lit(0.0)).as("recall"))
      .withColumn("fbeta",
        when(lit(b2) * col("precision") + col("recall") > 0.0,
          lit(1.0 + b2) * col("precision") * col("recall") /
            (lit(b2) * col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** Averaged precision/recall/Fβ — sklearn's precision_score /
    * recall_score / fbeta_score with average='macro'|'micro'|'weighted',
    * all three in one frame (reference _classification.py:955–1341 are
    * thin wrappers over the same averaging). Cross-class sums run as
    * ordered folds in class order (`aggregate(array_sort(collect_list`)
    * — bit-deterministic across partitionings, oracle-able unrounded per
    * the ordered-fold convention; class cardinality is small by
    * definition, so the collect is bounded. Micro terms are one exact
    * global rational (single-label multiclass: micro-p = micro-r =
    * micro-Fβ = accuracy). */
  def prfAveraged(df: DataFrame, labelCol: String, predCol: String,
      beta: Double = 1.0): DataFrame = {
    val perClass = prfSupport(df, labelCol, predCol, beta)
    def arr = array_sort(collect_list(struct(
      col("cls"), col("precision"), col("recall"), col("fbeta"),
      col("support"))))
    def foldSum(term: Column => Column) =
      aggregate(arr, lit(0.0), (acc, x) => acc + term(x))
    val folded = perClass.agg(
      count(lit(1)).cast("double").as("__k"),
      sum(col("support")).cast("double").as("__tot"),
      foldSum(_.getField("precision")).as("__sp"),
      foldSum(_.getField("recall")).as("__sr"),
      foldSum(_.getField("fbeta")).as("__sf"),
      foldSum(x => x.getField("support").cast("double") *
        x.getField("precision")).as("__wp"),
      foldSum(x => x.getField("support").cast("double") *
        x.getField("recall")).as("__wr"),
      foldSum(x => x.getField("support").cast("double") *
        x.getField("fbeta")).as("__wf"))
    val macroR = folded.select(lit("macro").as("average"),
      (col("__sp") / col("__k")).as("precision"),
      (col("__sr") / col("__k")).as("recall"),
      (col("__sf") / col("__k")).as("fbeta"))
    val weightedR = folded.select(lit("weighted").as("average"),
      (col("__wp") / col("__tot")).as("precision"),
      (col("__wr") / col("__tot")).as("recall"),
      (col("__wf") / col("__tot")).as("fbeta"))
    val microR = df.agg(
      (sum(when(col(labelCol) === col(predCol), 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("__acc"))
      .select(lit("micro").as("average"), col("__acc").as("precision"),
        col("__acc").as("recall"), col("__acc").as("fbeta"))
    macroR.unionByName(microR).unionByName(weightedR)
  }

  /** multilabel_confusion_matrix for single-label multiclass input
    * (reference _classification.py:342): per class of the sorted
    * label∪pred set, the one-vs-rest 2×2 matrix as (tn, fp, fn, tp) —
    * fn = support − tp, fp = predicted − tp, tn = n − tp − fn − fp. One
    * confusion aggregate plus a broadcast of the single global count;
    * all outputs exact BIGINTs. */
  def multilabelConfusion(df: DataFrame, labelCol: String, predCol: String)
      : DataFrame = {
    val cm = df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val tp = cm.filter(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val actual = cm.groupBy(col("label").as("cls")).agg(sum("n").as("support"))
    val predicted = cm.groupBy(col("pred").as("cls")).agg(sum("n").as("n_pred"))
    val total = df.agg(count(lit(1)).as("__n"))
    actual
      .join(predicted, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .crossJoin(broadcast(total))
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("__tp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("__fn"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("__fp"),
        col("__n"))
      .select(col("cls"),
        (col("__n") - col("__tp") - col("__fn") - col("__fp")).as("tn"),
        col("__fp").as("fp"), col("__fn").as("fn"), col("__tp").as("tp"))
  }

  /** Trapezoidal integral ∫ y dx over points ordered by x — the
    * reference's generic metrics.auc (mars/learn/metrics/_ranking.py:32)
    * and numpy trapz. x values must be distinct (curve points): with
    * ties the neighbor pairing is order-ambiguous, as in numpy.
    *
    * Scale shape: adjacency-local like checkMonotonic — range-partition
    * on x, per-bucket lag pairs under a bucket-partitioned window (never
    * a data-wide single-task sort), and the cross-bucket boundary pair
    * comes from a lag over ≤#partitions bucket summaries broadcast back.
    * The cross-row sum of trapezoid terms runs as an ordered fold in x
    * order — bit-deterministic across partitionings, oracle-able
    * unrounded.
    *
    * Scale guard: the final fold buffers one struct per point in a
    * single aggregation buffer — exactly right for its metrics use
    * (curve integration over distinct thresholds) and wrong for an
    * arbitrary big frame, so `maxPoints` fails loudly (the
    * silhouette/transposeSmall guard pattern) instead of building an
    * unbounded collect. Pre-aggregate (e.g. to distinct thresholds)
    * before integrating a larger series. */
  def trapz(df: DataFrame, xCol: String, yCol: String,
      out: String = "auc", maxPoints: Long = 2000000L): DataFrame = {
    val n = df.count()
    require(n <= maxPoints,
      s"trapz: $n points exceeds maxPoints=$maxPoints — the ordered-fold " +
        "sum buffers every trapezoid term; pre-aggregate the curve first")
    val ranged = df
      .select(col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
      .repartitionByRange(col("__x"))
      .withColumn("__pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__x"))
    val withPrev = ranged
      .withColumn("__px", lag(col("__x"), 1).over(w))
      .withColumn("__py", lag(col("__y"), 1).over(w))
    // bucket ranges are ordered by __pid (RangePartitioner contract): the
    // previous bucket's last point supplies each bucket's boundary pair
    val edges = withPrev.groupBy(col("__pid")).agg(
      max_by(struct(col("__x"), col("__y")), col("__x")).as("__last"))
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
    val prevLast = edges
      .withColumn("__plast", lag(col("__last"), 1).over(wb))
      .select(col("__pid"), col("__plast"))
    val terms = withPrev.join(broadcast(prevLast), Seq("__pid"), "left")
      .withColumn("__px2",
        coalesce(col("__px"), col("__plast").getField("__x")))
      .withColumn("__py2",
        coalesce(col("__py"), col("__plast").getField("__y")))
      .filter(col("__px2").isNotNull)
      .select(col("__x"),
        ((col("__x") - col("__px2")) * (col("__y") + col("__py2")) /
          lit(2.0)).as("__term"))
    terms.agg(
      aggregate(array_sort(collect_list(struct(col("__x"), col("__term")))),
        lit(0.0), (acc, x) => acc + x.getField("__term")).as(out))
  }
}
