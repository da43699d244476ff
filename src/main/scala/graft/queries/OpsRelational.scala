package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.functions.aggregates
import graft.operators.Dedup

/** Operator-coverage queries, relational half: projection/filter/eval,
  * casts, missing data, dedup, isin, set ops, joins, aggregation &
  * statistics, reshape (pivot/melt/explode/cut/qcut), string/date/JSON
  * functions. Each query exercises one SURVEY §2 operator family and
  * carries a DuckDB oracle.
  */
object OpsRelational {

  val all: Vector[Q] = Vector(

    // --- §2.3 getitem/setitem/eval via the fluent API: query() is the
    //     reference's df.query (Catalyst parses the expression string) and
    //     eval() its df.eval (mars/dataframe/base/eval.py:263)
    Q("op_select_filter",
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(${sqlDiscPrice()} AS DOUBLE) AS net,
         |  CAST(l_quantity AS BIGINT) AS qty
         |FROM lineitem
         |WHERE l_quantity > 45 AND l_returnflag = 'A'
         |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem")
        .query("l_quantity > 45 AND l_returnflag = 'A'")
        .eval("net", s"CAST(${sqlDiscPrice()} AS DOUBLE)")
        .eval("qty", "CAST(l_quantity AS BIGINT)")
        .select("l_orderkey", "l_linenumber", "net", "qty")
        .sortValues(Seq("l_orderkey", "l_linenumber"))
        .df
    },

    // --- §2.3 where/mask: conditional replacement
    Q("op_case_when",
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount > 0.05 THEN 'HI'
        |       WHEN l_discount > 0.02 THEN 'MID'
        |       ELSE 'LO' END AS disc_band
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").filter($"l_orderkey" < 100)
        .select($"l_orderkey", $"l_linenumber",
          when($"l_discount" > 0.05, "HI")
            .when($"l_discount" > 0.02, "MID")
            .otherwise("LO").as("disc_band"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // --- §2.3 astype via the fluent API (reference base/astype.py:32)
    Q("op_astype",
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      val o = gt(spark, dir, "orders")
      o.filter(o("o_orderkey") < 200)
        .assign(
          "price_int" -> floor(o("o_totalprice")),
          "key_str" -> o("o_orderkey"),
          "date_str" -> o("o_orderdate").cast("date"))
        .astype("price_int" -> "long", "key_str" -> "string", "date_str" -> "string")
        .select("o_orderkey", "price_int", "key_str", "date_str")
        .sortValues(Seq("o_orderkey"))
        .df
    },

    // --- §2.3 astype('category'): dictionary encoding — sorted dense codes
    //     (reference base/astype.py:32 two-pass category gathering); the
    //     oracle replays the code as dense_rank over the value order
    Q("op_astype_cat",
      """SELECT p_partkey, p_brand,
        |  CAST(dense_rank() OVER (ORDER BY p_brand) - 1 AS BIGINT) AS p_brand_code
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      val p = gt(spark, dir, "part")
      val (encoded, _) = p.filter(p("p_partkey") < 500).astypeCategory("p_brand")
      encoded.select("p_partkey", "p_brand", "p_brand_code")
        .sortValues(Seq("p_partkey"))
        .df
    },

    // --- §2.10 missing data: isna/fillna/dropna (nulls via NULLIF)
    Q("op_missing_data",
      """SELECT l_returnflag,
        |  COUNT(NULLIF(l_discount, 0.0)) AS n_nonnull,
        |  COUNT(*) AS n_all,
        |  CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), -1.0) AS DECIMAL(4,2))) AS DOUBLE) AS sum_filled
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val nulled = when($"l_discount" === 0.0, lit(null)).otherwise($"l_discount")
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(nulled).as("n_nonnull"),
          count(lit(1)).as("n_all"),
          sum(coalesce(nulled, lit(-1.0)).cast("decimal(4,2)")).cast("double").as("sum_filled"))
        .orderBy($"l_returnflag")
    },

    // --- §2.9 drop_duplicates keep=first via the fluent API
    Q("op_drop_duplicates",
      """SELECT o_custkey, o_orderpriority, min(o_orderkey) AS o_orderkey
        |FROM orders GROUP BY o_custkey, o_orderpriority
        |ORDER BY o_custkey, o_orderpriority""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .dropDuplicates(Seq("o_custkey", "o_orderpriority"), keepFirstBy = "o_orderkey")
        .select("o_custkey", "o_orderpriority", "o_orderkey")
        .sortValues(Seq("o_custkey", "o_orderpriority"))
        .df
    },

    // --- §2.9 duplicated: count of extra rows per subset key
    Q("op_duplicated",
      """SELECT COUNT(*) - COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_dup_rows,
        |       COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_unique
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").agg(
        (count(lit(1)) - countDistinct($"l_partkey", $"l_suppkey")).as("n_dup_rows"),
        countDistinct($"l_partkey", $"l_suppkey").as("n_unique"))
    },

    // --- §2.9 isin via the fluent API
    Q("op_isin",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_custkey % 10 = 0
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .isin("c_mktsegment", Seq("BUILDING", "MACHINERY"))
        .query("c_custkey % 10 = 0")
        .select("c_custkey", "c_mktsegment")
        .sortValues(Seq("c_custkey"))
        .df
    },

    // --- §2.5 value_counts via the fluent API
    Q("op_value_counts",
      """SELECT lang, COUNT(*) AS cnt FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "documents")
        .valueCounts("lang")
        .rename("count" -> "cnt")
        .df
    },

    // --- §2.5 nunique
    Q("op_nunique",
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_pairs
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_partkey", $"l_suppkey").as("n_pairs"))
    },

    // --- §2.5 statistical reductions from exact moment sums
    // (l_quantity is integer-valued → moment sums are exact in IEEE double →
    //  derived var/std/sem/skew/kurt are bit-identical across engines)
    Q("op_agg_stats",
      """SELECT l_returnflag, n, mean_qty, var_qty, sqrt(var_qty) AS std_qty,
        |       sqrt(var_qty) / sqrt(n) AS sem_qty,
        |       m3c / (m2c * sqrt(m2c)) AS skew_qty,
        |       m4c / (m2c * m2c) - 3.0 AS kurt_qty
        |FROM (
        |  SELECT l_returnflag, n, s1 / n AS mean_qty,
        |         (s2 - s1 * s1 / n) / (n - 1.0) AS var_qty,
        |         s2 / n - (s1/n) * (s1/n) AS m2c,
        |         s3 / n - 3.0 * (s1/n) * (s2 / n) + 2.0 * (s1/n) * (s1/n) * (s1/n) AS m3c,
        |         s4 / n - 4.0 * (s1/n) * (s3 / n) + 6.0 * (s1/n) * (s1/n) * (s2 / n)
        |           - 3.0 * (s1/n) * (s1/n) * (s1/n) * (s1/n) AS m4c
        |  FROM (
        |    SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
        |           SUM(l_quantity) AS s1, SUM(l_quantity*l_quantity) AS s2,
        |           SUM(l_quantity*l_quantity*l_quantity) AS s3,
        |           SUM(l_quantity*l_quantity*l_quantity*l_quantity) AS s4
        |    FROM lineitem GROUP BY l_returnflag) raw) m
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val q = $"l_quantity"
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          (sum(q) / count(lit(1)).cast("double")).as("mean_qty"),
          aggregates.varFromMoments(q).as("var_qty"),
          aggregates.stdFromMoments(q).as("std_qty"),
          aggregates.semFromMoments(q).as("sem_qty"),
          aggregates.skewFromMoments(q).as("skew_qty"),
          aggregates.kurtFromMoments(q).as("kurt_qty"))
        .orderBy($"l_returnflag")
    },

    // --- §2.5 product (custom Aggregator — Spark has no product built-in)
    Q("op_product",
      """SELECT l_orderkey, round(product(1.0 + l_tax), 8) AS tax_prod
        |FROM lineitem WHERE l_orderkey < 20
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").filter($"l_orderkey" < 20)
        .groupBy($"l_orderkey")
        .agg(round(aggregates.product(lit(1.0) + $"l_tax"), 8).as("tax_prod"))
        .orderBy($"l_orderkey")
    },

    // --- §2.5 str_concat (ordered string aggregation)
    Q("op_str_concat",
      """SELECT l_orderkey,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
        |FROM lineitem WHERE l_orderkey < 50
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").filter($"l_orderkey" < 50)
        .groupBy($"l_orderkey")
        .agg(aggregates.strConcatOrdered(
          $"l_linenumber".cast("string"), $"l_linenumber", ",").as("lines"))
        .orderBy($"l_orderkey")
    },

    // --- §2.13 quantile (exact interpolated percentiles)
    Q("op_quantile",
      """SELECT round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |       round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |       round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").agg(
        round(percentile($"l_quantity", lit(0.25)), 6).as("p25"),
        round(percentile($"l_quantity", lit(0.5)), 6).as("p50"),
        round(percentile($"l_quantity", lit(0.75)), 6).as("p75"),
        round(percentile($"l_extendedprice", lit(0.5)), 6).as("med_price"))
    },

    // --- §2.5 deterministic mode per group (ties → smallest value): the
    //     oracle encodes the (count, −value) lexicographic argmax as
    //     exact integer arithmetic — key = c·64 + (63 − q) with q ≤ 50 —
    //     so the tie rule replays without struct comparison.
    Q("op_mode",
      """WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    COUNT(*) AS c FROM lineitem GROUP BY l_returnflag, q)
        |SELECT l_returnflag,
        |  CAST(63 - (MAX(c * 64 + (63 - q)) % 64) AS BIGINT) AS l_quantity_mode
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "lineitem")
          .select($"l_returnflag", $"l_quantity".cast("long").as("l_quantity")))
        .modeDet(Seq("l_returnflag"), "l_quantity")
        .sortValues(Seq("l_returnflag"))
        .df
    },

    // --- §2.13 quantile(interpolation=lower|higher|nearest|midpoint):
    //     exact order statistics at h = (n−1)·0.3 — k-th elements are
    //     EXACT doubles (decimal prices cast), no rounding anywhere; h's
    //     banker's tie branch is spelled out in SQL so both engines pick
    //     the identical k even at h = x.5.
    Q("op_quantile_interp",
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
        |o AS (SELECT x, row_number() OVER (ORDER BY x) - 1 AS rn FROM v),
        |nn AS (SELECT COUNT(*) AS n FROM v),
        |k AS (SELECT n, (CAST(n AS DOUBLE) - 1.0) * CAST(0.3 AS DOUBLE) AS h FROM nn),
        |kk AS (SELECT n, h, CAST(floor(h) AS BIGINT) AS kl,
        |    CAST(ceil(h) AS BIGINT) AS kh,
        |    CAST(CASE WHEN h - floor(h) = 0.5
        |          THEN CASE WHEN CAST(floor(h) AS BIGINT) % 2 = 0
        |               THEN floor(h) ELSE ceil(h) END
        |          ELSE round(h) END AS BIGINT) AS kn FROM k)
        |SELECT CAST(kk.n AS BIGINT) AS n, ol.x AS lo, oh.x AS hi,
        |  onr.x AS near, (ol.x + oh.x) / 2.0 AS mid
        |FROM kk JOIN o ol ON ol.rn = kk.kl JOIN o oh ON oh.rn = kk.kh
        |  JOIN o onr ON onr.rn = kk.kn
        |ORDER BY n""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem")
        .quantileInterp("l_extendedprice", 0.3)
        .sortValues(Seq("n"))
        .df
    },

    // --- §2.13 corr / covariance
    Q("op_corr",
      """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").agg(
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_samp($"l_quantity", $"l_extendedprice"), 4).as("cov_qty_price"))
    },

    // --- §2.4 full outer join with asymmetric sides
    Q("op_merge_outer",
      """SELECT COALESCE(c.k, s.k) AS k, COALESCE(nc, 0) AS nc, COALESCE(ns, 0) AS ns
        |FROM (SELECT c_nationkey AS k, COUNT(*) AS nc FROM customer
        |      WHERE c_nationkey < 15 GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS k, COUNT(*) AS ns FROM supplier
        |      WHERE s_nationkey > 10 GROUP BY s_nationkey) s
        |ON c.k = s.k
        |ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").filter($"c_nationkey" < 15)
        .groupBy($"c_nationkey".as("ck")).agg(count(lit(1)).as("nc"))
      val s = t(spark, dir, "supplier").filter($"s_nationkey" > 10)
        .groupBy($"s_nationkey".as("sk")).agg(count(lit(1)).as("ns"))
      c.join(s, $"ck" === $"sk", "full_outer")
        .select(
          coalesce($"ck", $"sk").as("k"),
          coalesce($"nc", lit(0L)).as("nc"),
          coalesce($"ns", lit(0L)).as("ns"))
        .orderBy($"k")
    },

    // --- §2.4 merge validate= (reference merge/core.py validate): the
    //     m:1 uniqueness check PASSES on customer's unique key and the
    //     validated merge must equal the plain join — which is exactly
    //     what the oracle recomputes. (The failing direction raises and
    //     is pinned in ReshapeSpec.)
    Q("op_merge_validate",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey < 400
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "orders")
        .rename("o_custkey" -> "c_custkey")
        .mergeValidated(gt(spark, dir, "customer"), on = Seq("c_custkey"),
          how = "inner", validate = "m:1")
        .df.filter($"o_orderkey" < 400)
        .select($"o_orderkey", $"c_name", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    // --- §2.8 nlargest/nsmallest: distributed TakeOrdered, never a full
    //     output sort. Boundary ties make row IDENTITY ambiguous, so the
    //     gate compares the value multiset (deterministic under ties).
    Q("op_nlargest",
      """SELECT v FROM (
        |  (SELECT c_acctbal AS v FROM customer ORDER BY c_acctbal DESC LIMIT 15)
        |  UNION ALL
        |  (SELECT c_acctbal AS v FROM customer ORDER BY c_acctbal ASC LIMIT 15)) u
        |ORDER BY v""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = gt(spark, dir, "customer")
      c.nlargest(15, "c_acctbal").select("c_acctbal").rename("c_acctbal" -> "v")
        .concatRows(
          c.nsmallest(15, "c_acctbal").select("c_acctbal").rename("c_acctbal" -> "v"))
        .sortValues(Seq("v")).df
    },

    // --- §2.3 rename / prefix / suffix / set_axis: the driver's compare
    //     keys on COLUMN NAMES, so matching output headers IS the check.
    Q("op_rename_axis",
      """SELECT n_nationkey AS nk, n_name AS x_n_name_t, n_regionkey AS region
        |FROM nation ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .addPrefix("x_").addSuffix("_t")
        .setAxis(Seq("nk", "x_n_name_t", "region"))
        .sortValues(Seq("nk")).df
    },

    // --- §2.5 CustomReduction registry (reduction/custom_reduction.py):
    //     a user-defined Aggregator (Σ floor(x²·100+0.5) cents — integer
    //     accumulation, order-free) through the same groupBy.agg path as
    //     the built-ins, replayed exactly in SQL.
    Q("op_custom_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(floor(l_quantity * l_quantity * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sumsq_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "lineitem").groupby("l_returnflag")
        .aggCols(
          "sumsq_cents" -> graft.functions.aggregates.sumSqCents(
            $"l_quantity".cast("double")),
          "n" -> count(lit(1)))
        .sortValues(Seq("l_returnflag")).df
    },

    // --- §2.4 pandas concat(keys=): the hierarchical concat level
    //     becomes an ordinary provenance column.
    Q("op_concat_keys",
      """SELECT key, CAST(COUNT(*) AS BIGINT) AS n, min(c_custkey) AS lo
        |FROM (
        |  SELECT 'low' AS key, c_custkey FROM customer WHERE c_custkey < 200
        |  UNION ALL
        |  SELECT 'high', c_custkey FROM customer WHERE c_custkey >= 1400) u
        |GROUP BY key ORDER BY key""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = gt(spark, dir, "customer")
      val low = graft.api.GraftFrame(c.df.filter($"c_custkey" < 200))
        .select("c_custkey")
      val high = graft.api.GraftFrame(c.df.filter($"c_custkey" >= 1400))
        .select("c_custkey")
      low.concatRowsKeys(Seq("low" -> low, "high" -> high))
        .df.groupBy($"key")
        .agg(count(lit(1)).as("n"), min($"c_custkey").as("lo"))
        .orderBy($"key")
    },

    // --- §2.6 groupby.nth over the explicit event order: nth(2) and
    //     nth(-1) (from-the-end), groups too small for the positive nth
    //     drop like pandas. event_id is unique per user so the order is
    //     total; all outputs exact BIGINTs.
    Q("op_groupby_nth",
      """WITH r AS (SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events WHERE user_id < 30)
        |SELECT user_id,
        |  CAST(max(CASE WHEN rn = 3 THEN event_id END) AS BIGINT) AS nth2,
        |  CAST(max(CASE WHEN rn = n THEN event_id END) AS BIGINT) AS last_ev
        |FROM r GROUP BY user_id HAVING COUNT(*) >= 3
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events").filter($"user_id" < 30)
      val a = graft.api.GraftFrame(ev).groupby("user_id")
        .nth(2, Seq(col("event_id")))
        .df.select($"user_id", $"event_id".as("nth2"))
      val b = graft.api.GraftFrame(ev).groupby("user_id")
        .nth(-1, Seq(col("event_id")))
        .df.select($"user_id", $"event_id".as("last_ev"))
      a.join(b, Seq("user_id")).orderBy($"user_id")
    },

    // --- §2.4 concat (axis=0) via unionByName with different column order
    Q("op_concat_rows",
      """SELECT l_returnflag, COUNT(*) AS cnt FROM (
        |  SELECT l_returnflag FROM lineitem WHERE l_quantity < 10
        |  UNION ALL
        |  SELECT l_returnflag FROM lineitem WHERE l_quantity > 40
        |) u GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val lo = li.filter($"l_quantity" < 10).select($"l_returnflag", $"l_orderkey")
      val hi = li.filter($"l_quantity" > 40).select($"l_orderkey", $"l_returnflag")
      lo.unionByName(hi.select($"l_returnflag", $"l_orderkey"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag")
    },

    // --- §2.4 concat (axis=1): column-wise concat of key-aligned frames —
    //     outer key union, missing side null-filled (pandas concat axis=1)
    Q("op_concat_cols",
      """SELECT custkey, c_acctbal, n_orders
        |FROM (SELECT c_custkey AS custkey, c_acctbal FROM customer
        |      WHERE c_custkey BETWEEN 50 AND 150) l
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS custkey, COUNT(*) AS n_orders FROM orders
        |      WHERE o_custkey < 100 GROUP BY o_custkey) r
        |USING (custkey)
        |ORDER BY custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val l = gt(spark, dir, "customer")
        .query("c_custkey BETWEEN 50 AND 150")
        .selectCols($"c_custkey".as("custkey"), $"c_acctbal")
      val r = gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .groupby("o_custkey").agg(("n_orders", "count", "o_custkey"))
        .rename("o_custkey" -> "custkey")
      l.concatCols(Seq(r), on = Seq("custkey"), join = "outer")
        .select("custkey", "c_acctbal", "n_orders")
        .sortValues(Seq("custkey"))
        .df
    },

    // --- §2.4 align: both frames conformed to the union of keys (pandas
    //     df.align; reference indexing/align.py:44) — the aligned pair
    //     re-joins 1:1 on the shared key universe
    Q("op_align",
      """WITH l AS (SELECT c_custkey AS custkey, c_acctbal FROM customer
        |           WHERE c_custkey BETWEEN 50 AND 150),
        |r AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders FROM orders
        |      WHERE o_custkey < 100 GROUP BY o_custkey),
        |keys AS (SELECT custkey FROM l UNION SELECT custkey FROM r)
        |SELECT k.custkey, l.c_acctbal, r.n_orders
        |FROM keys k LEFT JOIN l USING (custkey) LEFT JOIN r USING (custkey)
        |ORDER BY custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val l = gt(spark, dir, "customer")
        .query("c_custkey BETWEEN 50 AND 150")
        .selectCols($"c_custkey".as("custkey"), $"c_acctbal")
      val r = gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .groupby("o_custkey").agg(("n_orders", "count", "o_custkey"))
        .rename("o_custkey" -> "custkey")
      val (la, ra) = l.align(r, on = Seq("custkey"), join = "outer")
      la.merge(ra, on = Seq("custkey"), how = "inner")
        .select("custkey", "c_acctbal", "n_orders")
        .sortValues(Seq("custkey"))
        .df
    },

    // --- §2.4/§2.10 index-aligned arithmetic (pandas df.add(other,
    //     fill_value=0); reference arithmetic/core.py DataFrameIndexAlign):
    //     outer-align two key-overlapping slices, add cell-wise; a cell
    //     present on one side fills with 0, missing on both stays null; the
    //     `c` column exists only on the left, so it behaves as all-missing
    //     on the right (fills, like pandas). Per-row double adds are
    //     deterministic-same-shape on both engines; round-6 + +0.0 guard
    //     per convention.
    Q("op_binop_align",
      """WITH l AS (
        |  SELECT o_orderkey AS k, o_totalprice AS v,
        |         CAST(o_custkey AS DOUBLE) AS c
        |  FROM orders WHERE o_orderkey < 1200),
        |r AS (
        |  SELECT o_orderkey AS k,
        |         o_totalprice * CAST(2.0 AS DOUBLE) AS v
        |  FROM orders WHERE o_orderkey >= 800 AND o_orderkey < 2000)
        |SELECT COALESCE(l.k, r.k) AS k,
        |  CASE WHEN l.v IS NULL AND r.v IS NULL THEN NULL
        |       ELSE round(COALESCE(l.v, CAST(0.0 AS DOUBLE))
        |                  + COALESCE(r.v, CAST(0.0 AS DOUBLE)), 6)
        |            + CAST(0.0 AS DOUBLE) END AS v,
        |  CASE WHEN l.c IS NULL THEN NULL
        |       ELSE round(l.c + CAST(0.0 AS DOUBLE), 6)
        |            + CAST(0.0 AS DOUBLE) END AS c
        |FROM l FULL OUTER JOIN r ON l.k = r.k
        |ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val l = gt(spark, dir, "orders")
        .query("o_orderkey < 1200")
        .selectCols($"o_orderkey".as("k"), $"o_totalprice".as("v"),
          $"o_custkey".cast("double").as("c"))
      val r = gt(spark, dir, "orders")
        .query("o_orderkey >= 800 AND o_orderkey < 2000")
        .selectCols($"o_orderkey".as("k"),
          ($"o_totalprice" * lit(2.0)).as("v"))
      l.addAligned(r, on = Seq("k"), fillValue = Some(0.0))
        .assign(
          "v" -> (round(col("v"), 6) + lit(0.0)),
          "c" -> (round(col("c"), 6) + lit(0.0)))
        .sortValues(Seq("k"))
        .df
    },

    // --- §2.4/§2.10 the REST of the aligned-binop family (r9, VERDICT
    //     task 5): pow and mod over name-aligned cells, Series broadcast
    //     (axis=0) through the setIndex-DECLARED implicit keys, and a
    //     column broadcast (axis=1) on top. pow is libm → round 4 + 0.0;
    //     mod is exact fmod over positive operands (Spark pmod == plain
    //     fmod there) and sub/mul are deterministic-same-shape → round 6.
    Q("op_binop_align2",
      """WITH l AS (
        |  SELECT o_orderkey AS k,
        |         CAST(o_totalprice AS DOUBLE) / CAST(100000.0 AS DOUBLE) AS a,
        |         CAST(o_totalprice AS DOUBLE) AS m
        |  FROM orders WHERE o_orderkey < 1500),
        |r AS (
        |  SELECT o_orderkey AS k,
        |         CAST(o_custkey % 4 + 2 AS DOUBLE) AS e,
        |         CAST(o_custkey + 13 AS DOUBLE) AS d,
        |         CAST(o_orderkey % 9 + 1 AS DOUBLE) AS s
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2500)
        |SELECT COALESCE(l.k, r.k) AS k,
        |  CASE WHEN l.a IS NULL AND r.e IS NULL THEN NULL
        |       ELSE round(pow(COALESCE(l.a, CAST(2.0 AS DOUBLE)),
        |                      COALESCE(r.e, CAST(2.0 AS DOUBLE))), 4)
        |            + CAST(0.0 AS DOUBLE) END AS pow_a,
        |  CASE WHEN l.m IS NULL AND r.d IS NULL THEN NULL
        |       ELSE round(fmod(l.m, r.d), 6) + CAST(0.0 AS DOUBLE)
        |       END AS mod_m,
        |  CASE WHEN l.a IS NULL AND r.s IS NULL THEN NULL
        |       ELSE round((COALESCE(l.a, CAST(1.0 AS DOUBLE))
        |                   - COALESCE(r.s, CAST(1.0 AS DOUBLE)))
        |                  * CAST(10.0 AS DOUBLE), 6)
        |            + CAST(0.0 AS DOUBLE) END AS sub_mul_a
        |FROM l FULL OUTER JOIN r ON l.k = r.k
        |ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = gt(spark, dir, "orders")
      val lA = orders.query("o_orderkey < 1500")
        .selectCols($"o_orderkey".as("k"),
          ($"o_totalprice".cast("double") / lit(100000.0)).as("a"))
      val lM = orders.query("o_orderkey < 1500")
        .selectCols($"o_orderkey".as("k"),
          $"o_totalprice".cast("double").as("m"))
      val rRange = "o_orderkey >= 1000 AND o_orderkey < 2500"
      // exponent/divisor columns NAMED like the left's, so cells align
      val rA = orders.query(rRange).selectCols($"o_orderkey".as("k"),
        ($"o_custkey" % 4 + 2).cast("double").as("a"))
      val rM = orders.query(rRange).selectCols($"o_orderkey".as("k"),
        ($"o_custkey" + 13).cast("double").as("m"))
      val series = orders.query(rRange).selectCols($"o_orderkey".as("k"),
        ($"o_orderkey" % 9 + 1).cast("double").as("s"))
      val powed = lA.powAligned(rA, on = Seq("k"), fillValue = Some(2.0))
        .rename("a" -> "pow_a")
      val modded = lM.modAligned(rM, on = Seq("k"))
        .rename("m" -> "mod_m")
      // axis=0 Series broadcast over the setIndex-DECLARED keys, then an
      // axis=1 column broadcast on the result
      val subMul = lA.setIndex("k")
        .arithAlignedSeries(series, "sub", fillValue = Some(1.0))
        .arithColumnBroadcast(Map("a" -> 10.0), "mul")
        .rename("a" -> "sub_mul_a")
      powed.df
        .join(modded.df, Seq("k"))
        .join(subMul.df, Seq("k"))
        .select($"k",
          (round($"pow_a", 4) + lit(0.0)).as("pow_a"),
          (round($"mod_m", 6) + lit(0.0)).as("mod_m"),
          (round($"sub_mul_a", 6) + lit(0.0)).as("sub_mul_a"))
        .orderBy($"k")
    },

    // --- §2.4/§2.10 aligned COMPARISONS + reversed binops (r9): pandas
    //     df.eq/ne/lt(other) with NaN-comparison semantics (missing on
    //     either side → eq/lt false, ne true) and df.rsub(other) =
    //     other − df under the standard fill rules. Booleans gate as
    //     BIGINT 0/1 per the integer-columns convention.
    Q("op_binop_align3",
      """WITH l AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v
        |  FROM orders WHERE o_orderkey < 1500),
        |r AS (
        |  SELECT o_orderkey AS k,
        |         CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_totalprice AS DOUBLE)
        |              ELSE CAST(o_totalprice AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |         END AS v
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2500)
        |SELECT COALESCE(l.k, r.k) AS k,
        |  CAST(CASE WHEN l.v IS NOT NULL AND r.v IS NOT NULL AND l.v = r.v
        |            THEN 1 ELSE 0 END AS BIGINT) AS v_eq,
        |  CAST(CASE WHEN l.v IS NOT NULL AND r.v IS NOT NULL AND l.v = r.v
        |            THEN 0 ELSE 1 END AS BIGINT) AS v_ne,
        |  CAST(CASE WHEN l.v IS NOT NULL AND r.v IS NOT NULL AND l.v < r.v
        |            THEN 1 ELSE 0 END AS BIGINT) AS v_lt,
        |  CASE WHEN l.v IS NULL AND r.v IS NULL THEN NULL
        |       ELSE round(COALESCE(r.v, CAST(0.0 AS DOUBLE))
        |                  - COALESCE(l.v, CAST(0.0 AS DOUBLE)), 6)
        |            + CAST(0.0 AS DOUBLE) END AS v_rsub
        |FROM l FULL OUTER JOIN r ON l.k = r.k
        |ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = gt(spark, dir, "orders")
      val l = orders.query("o_orderkey < 1500")
        .selectCols($"o_orderkey".as("k"), $"o_totalprice".cast("double").as("v"))
      val r = orders.query("o_orderkey >= 1000 AND o_orderkey < 2500")
        .selectCols($"o_orderkey".as("k"),
          when($"o_orderkey" % 3 === 0, $"o_totalprice".cast("double"))
            .otherwise($"o_totalprice".cast("double") + lit(1.0)).as("v"))
      val cmp = l.compareAligned(r, Seq("eq", "ne", "lt"), on = Seq("k"))
      val rsub = l.arithAligned(r, Seq("k"), "rsub", fillValue = Some(0.0))
        .rename("v" -> "v_rsub")
      cmp.df.join(rsub.df, Seq("k"))
        .select($"k",
          $"v_eq".cast("long").as("v_eq"),
          $"v_ne".cast("long").as("v_ne"),
          $"v_lt".cast("long").as("v_lt"),
          (round($"v_rsub", 6) + lit(0.0)).as("v_rsub"))
        .orderBy($"k")
    },

    // --- §2.4/§2.10 positional implicit-index alignment (r10, VERDICT
    //     task 3; reference align.py:48): pandas' default-RangeIndex
    //     semantics — neither side declares an index, so the binop keys
    //     on the materialized row POSITION of each (sorted) frame. The
    //     two slices have different lengths, so the longer side's tail
    //     exercises the fill_value path; `c` exists only on the left
    //     (fills where the left row exists, null past its end). The
    //     oracle replays the position as row_number()-1 over the same
    //     total order. Per-row double adds → round-6 + +0.0 guard.
    Q("op_binop_positional",
      """WITH l AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS row_pos,
        |         o_totalprice AS v, CAST(o_custkey AS DOUBLE) AS c
        |  FROM orders WHERE o_orderkey < 1200),
        |r AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS row_pos,
        |         o_totalprice * CAST(2.0 AS DOUBLE) AS v
        |  FROM orders WHERE o_orderkey >= 800 AND o_orderkey < 2300)
        |SELECT COALESCE(l.row_pos, r.row_pos) AS row_pos,
        |  CASE WHEN l.v IS NULL AND r.v IS NULL THEN NULL
        |       ELSE round(COALESCE(l.v, CAST(0.0 AS DOUBLE))
        |                  + COALESCE(r.v, CAST(0.0 AS DOUBLE)), 6)
        |            + CAST(0.0 AS DOUBLE) END AS v,
        |  CASE WHEN l.c IS NULL THEN NULL
        |       ELSE round(l.c + CAST(0.0 AS DOUBLE), 6)
        |            + CAST(0.0 AS DOUBLE) END AS c
        |FROM l FULL OUTER JOIN r ON l.row_pos = r.row_pos
        |ORDER BY row_pos""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val l = gt(spark, dir, "orders")
        .query("o_orderkey < 1200")
        .sortValues(Seq("o_orderkey"))
        .selectCols($"o_totalprice".as("v"),
          $"o_custkey".cast("double").as("c"))
      val r = gt(spark, dir, "orders")
        .query("o_orderkey >= 800 AND o_orderkey < 2300")
        .sortValues(Seq("o_orderkey"))
        .selectCols(($"o_totalprice" * lit(2.0)).as("v"))
      l.arithPositional(r, "add", fillValue = Some(0.0))
        .assign(
          "v" -> (round(col("v"), 6) + lit(0.0)),
          "c" -> (round(col("c"), 6) + lit(0.0)))
        .sortValues(Seq("row_pos"))
        .df
    },

    // --- §2.4/§2.10 positional aligned COMPARISONS (r10): the
    //     default-RangeIndex form of compareAligned — different-length
    //     slices, missing tail cells compare false (ne true). Booleans
    //     as BIGINT per the op_binop_align3 convention.
    Q("op_cmp_positional",
      """WITH l AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS row_pos,
        |         o_totalprice AS v
        |  FROM orders WHERE o_orderkey < 1500),
        |r AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS row_pos,
        |         CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice
        |              ELSE o_totalprice + CAST(1.0 AS DOUBLE) END AS v
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2800)
        |SELECT COALESCE(l.row_pos, r.row_pos) AS row_pos,
        |  CAST(CASE WHEN l.v IS NOT NULL AND r.v IS NOT NULL AND l.v = r.v
        |            THEN 1 ELSE 0 END AS BIGINT) AS v_eq,
        |  CAST(CASE WHEN l.v IS NOT NULL AND r.v IS NOT NULL AND l.v = r.v
        |            THEN 0 ELSE 1 END AS BIGINT) AS v_ne,
        |  CAST(CASE WHEN l.v IS NOT NULL AND r.v IS NOT NULL AND l.v < r.v
        |            THEN 1 ELSE 0 END AS BIGINT) AS v_lt
        |FROM l FULL OUTER JOIN r ON l.row_pos = r.row_pos
        |ORDER BY row_pos""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val l = gt(spark, dir, "orders")
        .query("o_orderkey < 1500")
        .sortValues(Seq("o_orderkey"))
        .selectCols($"o_totalprice".as("v"))
      val r = gt(spark, dir, "orders")
        .query("o_orderkey >= 1000 AND o_orderkey < 2800")
        .sortValues(Seq("o_orderkey"))
        .selectCols(when($"o_orderkey" % 2 === 0, $"o_totalprice")
          .otherwise($"o_totalprice" + lit(1.0)).as("v"))
      l.comparePositional(r, Seq("eq", "ne", "lt"))
        .selectCols(col("row_pos"),
          col("v_eq").cast("long").as("v_eq"),
          col("v_ne").cast("long").as("v_ne"),
          col("v_lt").cast("long").as("v_lt"))
        .sortValues(Seq("row_pos"))
        .df
    },

    // --- §2.9 set ops: union / intersect / except
    Q("op_setops",
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT
        |  (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b) u) AS n_union,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) i) AS n_intersect,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) e) AS n_except""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cust = t(spark, dir, "customer")
      val a = cust.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = cust.filter($"c_acctbal" > 5000).select($"c_custkey")
      a.union(b).distinct().agg(count(lit(1)).as("n_union"))
        .crossJoin(a.intersect(b).agg(count(lit(1)).as("n_intersect")))
        .crossJoin(a.except(b).agg(count(lit(1)).as("n_except")))
    },

    // --- §2.6 grouping sets: cube
    Q("op_cube",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(sumD(dec12($"l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // --- §2.6 grouping sets: rollup over derived year
    Q("op_rollup",
      """SELECT o_year, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS cnt
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority,
        |             o_totalprice FROM orders) o
        |GROUP BY ROLLUP(o_year, o_orderpriority)
        |ORDER BY o_year NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "orders")
        .select(year($"o_orderdate").cast("long").as("o_year"),
          $"o_orderpriority", $"o_totalprice")
        .rollup($"o_year", $"o_orderpriority")
        .agg(sumD(dec12($"o_totalprice")).as("total"), count(lit(1)).as("cnt"))
        .orderBy($"o_year".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },

    // --- §2.10 pivot / get_dummies
    Q("op_pivot",
      """SELECT c_nationkey,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS automobile,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS building,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS furniture,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS household,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS machinery
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      gt(spark, dir, "customer")
        .pivotTable(Seq("c_nationkey"), "c_mktsegment", segs,
          count(lit(1)), fillValue = Some(0L))
        .rename(segs.map(s => s -> s.toLowerCase): _*)
        .sortValues(Seq("c_nationkey"))
        .df
    },

    // --- §2.10 melt / unpivot
    Q("op_melt",
      """SELECT l_orderkey, l_linenumber, var, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS var, l_quantity AS val
        |  FROM lineitem WHERE l_orderkey < 30
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 30
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey < 30
        |) m ORDER BY l_orderkey, l_linenumber, var""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem")
        .query("l_orderkey < 30")
        .melt(Seq("l_orderkey", "l_linenumber"),
          Seq("l_quantity", "l_discount", "l_tax"), "var", "val")
        .sortValues(Seq("l_orderkey", "l_linenumber", "var"))
        .df
    },

    // --- §2.10 explode over split text
    Q("op_explode_split",
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) w GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"word")
        .limit(20)
    },

    // --- §2.10 cut: fixed bins with pandas (lo, hi] intervals via the
    //     fluent API (reference base/cut.py:43)
    Q("op_cut",
      """SELECT bin, COUNT(*) AS cnt FROM (
        |  SELECT CASE WHEN c_acctbal > -1000 AND c_acctbal <= 0 THEN 'neg'
        |              WHEN c_acctbal > 0 AND c_acctbal <= 2500 THEN 'low'
        |              WHEN c_acctbal > 2500 AND c_acctbal <= 5000 THEN 'mid'
        |              WHEN c_acctbal > 5000 AND c_acctbal <= 7500 THEN 'high'
        |              WHEN c_acctbal > 7500 AND c_acctbal <= 10000 THEN 'top'
        |              ELSE NULL END AS bin
        |  FROM customer) b
        |GROUP BY bin ORDER BY bin""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .cut("c_acctbal", "bin", Seq(-1000, 0, 2500, 5000, 7500, 10000),
          Seq("neg", "low", "mid", "high", "top"))
        .groupby("bin").agg(("cnt", "count", "bin"))
        .sortValues(Seq("bin"))
        .df
    },

    // --- §2.10 qcut: quantile bins via exact cutoffs + broadcast bucketing
    //     (scale-safe: one partial+final aggregate, no single-task global
    //     window — reference base/qcut.py)
    Q("op_qcut",
      """WITH cuts AS (
        |  SELECT round(quantile_cont(c_acctbal, 0.25), 6) AS c1,
        |         round(quantile_cont(c_acctbal, 0.50), 6) AS c2,
        |         round(quantile_cont(c_acctbal, 0.75), 6) AS c3
        |  FROM customer)
        |SELECT quartile, COUNT(*) AS n,
        |       min(c_acctbal) AS lo, max(c_acctbal) AS hi
        |FROM (SELECT c_acctbal,
        |             CAST(CASE WHEN c_acctbal <= c1 THEN 1
        |                       WHEN c_acctbal <= c2 THEN 2
        |                       WHEN c_acctbal <= c3 THEN 3
        |                       ELSE 4 END AS BIGINT) AS quartile
        |      FROM customer, cuts) q
        |GROUP BY quartile ORDER BY quartile""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .qcut("c_acctbal", "quartile", 4)
        .groupby("quartile")
        .agg(("n", "count", "quartile"),
          ("lo", "min", "c_acctbal"), ("hi", "max", "c_acctbal"))
        .sortValues(Seq("quartile"))
        .df
    },

    // --- §2.10 string accessor ops
    Q("op_str_ops",
      """SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 5) AS sub5,
        |       replace(p_name, ' ', '_') AS underscored,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |       concat(p_brand, ':', p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "part")
        .select($"p_partkey",
          upper($"p_name").as("up"),
          substring($"p_name", 1, 5).as("sub5"),
          regexp_replace($"p_name", " ", "_").as("underscored"),
          length($"p_name").cast("long").as("len"),
          lpad($"p_partkey".cast("string"), 8, "0").as("padded"),
          regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
          concat($"p_brand", lit(":"), $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    },

    // --- §2.10 datetime accessor ops
    Q("op_dt_ops",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "orders").filter($"o_orderkey" < 100)
        .select($"o_orderkey",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          dayofmonth($"o_orderdate").cast("long").as("d"),
          dayofweek($"o_orderdate").cast("long").as("dow"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          ($"o_orderdate" + expr("INTERVAL 30 DAY")).as("plus30"),
          datediff($"o_orderdate", to_date(lit("1995-01-01"))).cast("long").as("days_since"))
        .orderBy($"o_orderkey")
    },

    // --- §2.10 JSON extraction (events.props)
    Q("op_json",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy($"event_type")
        .agg(
          sum(get_json_object($"props", "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("cnt"))
        .orderBy($"event_type")
    },

    // --- §2.13 full pairwise correlation matrix (pandas df.corr): one
    //     aggregate for every cross-moment, corr = cov/(σa·σb)
    Q("op_corr_matrix",
      """SELECT col_a, col_b, round(corr, 6) AS corr FROM (
        |  SELECT 'l_discount' AS col_a, 'l_discount' AS col_b,
        |         covar_samp(l_discount, l_discount)
        |           / (stddev_samp(l_discount) * stddev_samp(l_discount)) AS corr
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', 'l_extendedprice',
        |         covar_samp(l_discount, l_extendedprice)
        |           / (stddev_samp(l_discount) * stddev_samp(l_extendedprice))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', 'l_quantity',
        |         covar_samp(l_discount, l_quantity)
        |           / (stddev_samp(l_discount) * stddev_samp(l_quantity))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_extendedprice',
        |         covar_samp(l_extendedprice, l_extendedprice)
        |           / (stddev_samp(l_extendedprice) * stddev_samp(l_extendedprice))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_quantity',
        |         covar_samp(l_extendedprice, l_quantity)
        |           / (stddev_samp(l_extendedprice) * stddev_samp(l_quantity))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_quantity',
        |         covar_samp(l_quantity, l_quantity)
        |           / (stddev_samp(l_quantity) * stddev_samp(l_quantity))
        |  FROM lineitem) m
        |ORDER BY col_a, col_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "lineitem")
        .corrMatrix(Seq("l_discount", "l_extendedprice", "l_quantity"))
        .assign("corr" -> round($"corr", 6))
        .sortValues(Seq("col_a", "col_b"))
        .df
    },

    // --- §2.13 groupby().corr() (r9): per-group Pearson from exact
    //     DECIMAL moment sums (the grouped-OLS shape) — the closed form
    //     on the exact sums is deterministic same-shape arithmetic both
    //     engines; round 4 per the grouped-OLS precedent.
    Q("op_groupby_corr",
      """WITH m AS (
        |  SELECT l_returnflag AS g, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
        |             * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
        |             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |             * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT g,
        |  round((n * sxy - sx * sy)
        |        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
        |    + CAST(0.0 AS DOUBLE) AS corr
        |FROM m ORDER BY g""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      graft.api.GraftFrame(li.withColumn("g", $"l_returnflag"))
        .groupby("g")
        .corr(dec12($"l_quantity"), dec12($"l_extendedprice"))
        .df.select($"g", (round($"corr", 4) + lit(0.0)).as("corr"))
        .orderBy($"g")
    },

    // --- §2.13 df.corr(method='spearman') matrix (r9): Pearson over
    //     EXACT integer double-ranks (2·below + ties — the moment sums
    //     are exact on both engines, so the closed form is deterministic
    //     same-shape arithmetic; round 4 like the grouped-OLS precedent).
    Q("op_corr_spearman_matrix",
      """WITH base AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |         CAST(l_extendedprice AS DOUBLE) AS y,
        |         CAST(l_discount AS DOUBLE) AS z
        |  FROM lineitem WHERE l_orderkey < 4000),
        |cx AS (SELECT x AS v, COUNT(*) AS c FROM base GROUP BY x),
        |rx AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c
        |         AS r2 FROM cx),
        |cy AS (SELECT y AS v, COUNT(*) AS c FROM base GROUP BY y),
        |ry AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c
        |         AS r2 FROM cy),
        |cz AS (SELECT z AS v, COUNT(*) AS c FROM base GROUP BY z),
        |rz AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c
        |         AS r2 FROM cz),
        |rk AS (SELECT rx.r2 AS a, ry.r2 AS b, rz.r2 AS d FROM base
        |       JOIN rx ON base.x = rx.v
        |       JOIN ry ON base.y = ry.v
        |       JOIN rz ON base.z = rz.v),
        |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(a) AS DOUBLE) AS sa, CAST(SUM(b) AS DOUBLE) AS sb,
        |  CAST(SUM(d) AS DOUBLE) AS sd,
        |  CAST(SUM(a * a) AS DOUBLE) AS saa,
        |  CAST(SUM(b * b) AS DOUBLE) AS sbb,
        |  CAST(SUM(d * d) AS DOUBLE) AS sdd,
        |  CAST(SUM(a * b) AS DOUBLE) AS sab,
        |  CAST(SUM(a * d) AS DOUBLE) AS sad,
        |  CAST(SUM(b * d) AS DOUBLE) AS sbd
        |  FROM rk)
        |SELECT col_a, col_b, round(rho, 4) + CAST(0.0 AS DOUBLE) AS rho
        |FROM (
        |  SELECT 'x' AS col_a, 'y' AS col_b,
        |    (n * sab - sa * sb)
        |      / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)) AS rho
        |  FROM m
        |  UNION ALL
        |  SELECT 'x', 'z',
        |    (n * sad - sa * sd)
        |      / sqrt((n * saa - sa * sa) * (n * sdd - sd * sd)) FROM m
        |  UNION ALL
        |  SELECT 'y', 'z',
        |    (n * sbd - sb * sd)
        |      / sqrt((n * sbb - sb * sb) * (n * sdd - sd * sd)) FROM m) t
        |ORDER BY col_a, col_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "lineitem")
          .filter($"l_orderkey" < 4000)
          .select($"l_quantity".cast("double").as("x"),
            $"l_extendedprice".cast("double").as("y"),
            $"l_discount".cast("double").as("z")))
        .corrMatrixSpearman(Seq("x", "y", "z"))
        .df.select($"col_a", $"col_b",
          (round($"rho", 4) + lit(0.0)).as("rho"))
        .orderBy($"col_a", $"col_b")
    },

    // --- §2.11 positional slice over an explicit total order (pandas
    //     iloc[start:end]) — zipWithIndex-based, no global window
    Q("op_iloc_slice",
      """SELECT c_custkey, c_name FROM (
        |  SELECT c_custkey, c_name,
        |         row_number() OVER (ORDER BY c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn > 100 AND rn <= 120
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .ilocSlice(100, 120, Seq("c_custkey"))
        .select("c_custkey", "c_name")
        .sortValues(Seq("c_custkey"))
        .df
    },

    // --- §2.11 general positional iloc: arbitrary position list with a
    //     negative (from-the-end) index, pandas df.iloc[[0,7,77,777,-1]]
    Q("op_iloc_positions",
      """SELECT c_custkey, c_name FROM (
        |  SELECT c_custkey, c_name,
        |         row_number() OVER (ORDER BY c_custkey) - 1 AS pos,
        |         COUNT(*) OVER () AS n
        |  FROM customer) t
        |WHERE pos IN (0, 7, 77, 777) OR pos = n - 1
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .iloc(Seq(0L, 7L, 77L, 777L, -1L), Seq("c_custkey"))
        .select("c_custkey", "c_name")
        .sortValues(Seq("c_custkey"))
        .df
    },

    // --- §2.4 salted join (explicit skew valve): the oracle is the PLAIN
    //     equi-join — salting is a physical rewrite whose results must be
    //     indistinguishable, so DuckDB computing the straight join checks
    //     both the salt/replicate mechanics and the de-salting exactly.
    //     Aggregated output keeps integers/DECIMAL exact.
    Q("op_salted_join",
      """SELECT o.o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_custkey < 300
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val left = graft.api.GraftFrame(t(spark, dir, "lineitem")
        .select($"l_orderkey".as("k"), $"l_quantity"))
      val right = graft.api.GraftFrame(t(spark, dir, "orders")
        .filter($"o_custkey" < 300)
        .select($"o_orderkey".as("k"), $"o_orderpriority"))
      left.saltedJoin(right, Seq("k"), saltFactor = 8).df
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sumD(dec12($"l_quantity")).as("qty"))
        .orderBy($"o_orderpriority")
    },

    // --- §2.6 salted two-level aggregation (map-side-combine-defeated
    //     skew valve): algebraic sum/count over salted partials must equal
    //     the direct aggregate — exact BIGINT values both sides.
    Q("op_salted_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val base = gt(spark, dir, "lineitem")
        .eval("qty_int", "CAST(l_quantity AS BIGINT)")
      base.groupby("l_returnflag").saltedAgg("qty_int", "sum", "qty", 16)
        .df.join(
          base.groupby("l_returnflag").saltedAgg("qty_int", "count", "n", 16).df,
          Seq("l_returnflag"))
        .orderBy($"l_returnflag")
    },

    // --- §2.4 cartesian_chunk (reference base/cartesian_chunk.py): the
    //     explicit cross join, small-side only by contract.
    Q("op_cartesian",
      """SELECT n.n_nationkey, r.r_regionkey,
        |  (n.n_regionkey = r.r_regionkey) AS home
        |FROM nation n CROSS JOIN region r
        |ORDER BY n.n_nationkey, r.r_regionkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "nation").select("n_nationkey", "n_regionkey")
        .crossJoin(gt(spark, dir, "region").select("r_regionkey"))
        .eval("home", "n_regionkey = r_regionkey")
        .select("n_nationkey", "r_regionkey", "home")
        .sortValues(Seq("n_nationkey", "r_regionkey"))
        .df
    },

    // --- §2.11 positional row index (pandas implicit index bridge —
    //     reference indexing/iloc.py): zipWithIndex over a sorted frame
    //     must equal row_number − 1 over the same total order.
    Q("op_row_index",
      """SELECT o_orderkey,
        |  row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_orderkey < 2000")
        .select("o_orderkey")
        .sortValues(Seq("o_orderkey"))
        .withRowIndex("idx")
        .df
    },

    // --- §2.13 quantile transform / rank normalization (sklearn
    //     QuantileTransformer): exact global midrank u = (#< + #=/2)/n —
    //     exact rationals, bit-identical with no rounding; the logistic
    //     target ln(u/(1-u)) mirrors per-row (round-6 libm class).
    Q("op_quantile_transform",
      """WITH g AS (SELECT c_acctbal AS v, COUNT(*) AS c FROM customer
        |           WHERE c_acctbal IS NOT NULL GROUP BY 1),
        |w AS (SELECT v, c,
        |        COALESCE(SUM(c) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf,
        |        SUM(c) OVER () AS n
        |      FROM g),
        |u AS (SELECT v, (CAST(bf AS DOUBLE) + CAST(c AS DOUBLE)
        |                 / CAST(2.0 AS DOUBLE))
        |                / CAST(n AS DOUBLE) AS u FROM w)
        |SELECT c.c_custkey, u.u AS qt,
        |  round(ln(u.u / (CAST(1.0 AS DOUBLE) - u.u)), 6)
        |    + CAST(0.0 AS DOUBLE) AS ql
        |FROM customer c JOIN u ON c.c_acctbal = u.v
        |WHERE c.c_custkey < 500
        |ORDER BY c.c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "customer")
        .quantileTransform("c_acctbal", "qt", "uniform")
        .quantileTransform("c_acctbal", "ql", "logistic")
        .assign("ql" -> (round(col("ql"), 6) + lit(0.0)))
        .query("c_custkey < 500")
        .select("c_custkey", "qt", "ql")
        .sortValues(Seq("c_custkey"))
        .df
    },

    // --- §2.11 pandas-faithful positional iloc (implicit current-order
    //     index via the withRowIndex bridge, negatives from the end):
    //     rows at positions 0, 3, n-1 of the o_orderkey-sorted frame.
    Q("op_iloc_implicit",
      """SELECT o_orderkey FROM (
        |  SELECT o_orderkey,
        |         row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
        |         COUNT(*) OVER () AS n
        |  FROM orders WHERE o_orderkey < 1000) t
        |WHERE rn IN (0, 3) OR rn = n - 1
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_orderkey < 1000")
        .select("o_orderkey")
        .sortValues(Seq("o_orderkey"))
        .ilocPositional(Seq(0L, 3L, -1L))
        .sortValues(Seq("o_orderkey"))
        .df
    },

    // --- §2.11 deterministic hash sampling via the fluent API (oracle
    //     replays the identical avalanche-hash bucket)
    Q("op_sample_hash",
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE ${graft.functions.PortableHash.sqlBucket("c_custkey", 100)} < 10
         |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .sampleHash("c_custkey", 10)
        .select("c_custkey", "c_name")
        .sortValues(Seq("c_custkey"))
        .df
    }
  )
}
