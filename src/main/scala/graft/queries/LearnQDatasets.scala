package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.learn.{Datasets, Distance, LabelProp, Learn, StatTests}

/** Learn-module queries, preprocessing + model-selection + generator
  * family (SURVEY §2.15): hash split/k-fold, scalers, normalize,
  * binarize, make_blobs/regression/classification (generated ROWS
  * oracled via the portable hash/normal-inverse kernels). Split out of
  * the monolithic LearnQ in r12 (registry hygiene).
  */
object LearnQDatasets {

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
