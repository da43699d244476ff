package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QHelpers._
import graft.operators.{Sessionize, Windows}

/** Operator-coverage queries, ordered half: cumulative ops, shift/diff,
  * rolling/expanding/ewm windows, ranking, per-group top-k, ffill,
  * event-time windows (tumbling/sliding/session), as-of join.
  *
  * Ordering convention: explicit partition + order columns everywhere (the
  * engine has no implicit pandas row index — SURVEY §7.1). Timestamps are
  * compared in microseconds (`unix_micros` / DuckDB `epoch_us`) so both
  * engines see identical integers even though the parquet stores
  * nanoseconds.
  */
object OpsWindows {

  val all: Vector[Q] = Vector(

    // --- §2.5 cumsum (exact via DECIMAL running sum)
    Q("op_cumsum",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Windows.spec(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
      t(spark, dir, "orders").filter($"o_custkey" < 50)
        .select($"o_custkey", $"o_orderkey",
          Windows.cumsum(dec12($"o_totalprice"), w).cast("double").as("running_total"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // --- §2.7 shift / diff. The fixture has duplicate
    //     (l_suppkey, l_orderkey, l_linenumber) triples, so l_partkey and
    //     l_quantity are appended to make the window order a deterministic
    //     total order (identical in the oracle) — otherwise lag/lead pick
    //     engine-dependent rows on ties.
    Q("op_shift_diff",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  lag(l_quantity) OVER w AS prev_qty,
        |  l_quantity - lag(l_quantity) OVER w AS qty_diff,
        |  lead(l_quantity) OVER w AS next_qty
        |FROM lineitem WHERE l_suppkey < 20
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (spark, dir) =>
      val part = Seq("l_suppkey")
      val ord = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      gt(spark, dir, "lineitem")
        .query("l_suppkey < 20")
        .shift("l_quantity", "prev_qty", 1, part, ord)
        .diff("l_quantity", "qty_diff", 1, part, ord)
        .shift("l_quantity", "next_qty", -1, part, ord)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "prev_qty", "qty_diff", "next_qty")
        .sortValues(part ++ ord)
        .drop("l_partkey", "l_quantity")
        .df
    },

    // --- §2.7 rolling fixed-size window
    Q("op_rolling",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w3 AS DOUBLE) AS roll_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w3 AS DOUBLE)
        |    / COUNT(*) OVER w3 AS roll_mean,
        |  COUNT(*) OVER w3 AS roll_n
        |FROM orders WHERE o_custkey < 100
        |WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w3 = Windows.rolling(
        Windows.spec(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey")), 3)
      val rollSum = sum(dec12($"o_totalprice")).over(w3).cast("double")
      t(spark, dir, "orders").filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey",
          rollSum.as("roll_sum"),
          (rollSum / count(lit(1)).over(w3)).as("roll_mean"),
          count(lit(1)).over(w3).as("roll_n"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // --- §2.7 rolling rank (pandas rolling.rank(pct=True,
    //     method='average')): average in-window rank as exact rationals
    //     (counts + halves over n) — no rounding needed.
    Q("op_rolling_rank",
      """SELECT o_custkey, o_orderkey,
        |  (len(list_filter(l, v -> v < o_totalprice))
        |   + (len(list_filter(l, v -> v = o_totalprice)) + CAST(1.0 AS DOUBLE))
        |     / CAST(2.0 AS DOUBLE))
        |  / CAST(len(l) AS DOUBLE) AS roll_rank
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             list(o_totalprice) OVER (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS l
        |      FROM orders WHERE o_custkey < 100) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "orders").query("o_custkey < 100")
        .rolling(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"), 3)
        .rankPct("o_totalprice", "roll_rank")
        .select("o_custkey", "o_orderkey", "roll_rank")
        .sortValues(Seq("o_custkey", "o_orderkey"))
        .df
    },

    // --- §2.7 expanding window
    // --- §2.7 expanding mean/var/std (pandas expanding().var()/std()):
    //     native var_samp windows accumulate differently per engine
    //     (streamed moments vs Welford — observed 1e-4 drift at money
    //     magnitudes), so the oracle computes both sides from EXACT
    //     integer window sums of CENTS: per-row c = totalprice*100 is an
    //     exact BIGINT (via DECIMAL(12,2), no float rounding), S1=Σc and
    //     S2=Σc² are exact BIGINTs, and BIGINT→DOUBLE conversion is
    //     IEEE round-to-nearest on every engine/build — unlike wide
    //     DECIMAL→DOUBLE casts, whose rendering drifted on the driver's
    //     DuckDB build (r6). Then (S2 − S1²/n)/(n−1)/1e4 over identical
    //     IEEE double ops — bit-exact, no rounding. n=1 → null both.
    Q("op_expanding_stats",
      """SELECT o_custkey, o_orderkey,
        |  s1 / n / CAST(100.0 AS DOUBLE) AS exp_mean,
        |  CASE WHEN n > 1 THEN
        |    (s2 - s1 * s1 / n) / (n - CAST(1.0 AS DOUBLE))
        |    / CAST(10000.0 AS DOUBLE) END AS exp_var,
        |  sqrt(CASE WHEN n > 1 THEN
        |    (s2 - s1 * s1 / n) / (n - CAST(1.0 AS DOUBLE))
        |    / CAST(10000.0 AS DOUBLE) END) AS exp_std
        |FROM (SELECT o_custkey, o_orderkey,
        |             CAST(CAST(SUM(c) OVER we AS BIGINT) AS DOUBLE) AS s1,
        |             CAST(CAST(SUM(c * c) OVER we AS BIGINT) AS DOUBLE) AS s2,
        |             CAST(COUNT(*) OVER we AS DOUBLE) AS n
        |      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |                        AS BIGINT) AS c
        |            FROM orders WHERE o_custkey < 100) raw
        |      WINDOW we AS (PARTITION BY o_custkey
        |                    ORDER BY o_orderdate, o_orderkey
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val we = Windows.expanding(
        Windows.spec(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey")))
      val c = (dec12($"o_totalprice") * lit(100)).cast("long")
      val s1 = sum(c).over(we).cast("double")
      val s2 = sum(c * c).over(we).cast("double")
      val n = count(lit(1)).over(we).cast("double")
      val variance =
        when(n > 1, (s2 - s1 * s1 / n) / (n - lit(1.0)) / lit(10000.0))
      t(spark, dir, "orders").filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey",
          (s1 / n / lit(100.0)).as("exp_mean"),
          variance.as("exp_var"),
          sqrt(variance).as("exp_std"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    Q("op_expanding",
      """SELECT o_custkey, o_orderkey,
        |  max(o_totalprice) OVER we AS exp_max,
        |  min(o_totalprice) OVER we AS exp_min,
        |  COUNT(*) OVER we AS exp_n
        |FROM orders WHERE o_custkey < 100
        |WINDOW we AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .expanding(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
        .agg(
          "exp_max" -> max(col("o_totalprice")),
          "exp_min" -> min(col("o_totalprice")),
          "exp_n" -> count(lit(1)))
        .select("o_custkey", "o_orderkey", "exp_max", "exp_min", "exp_n")
        .sortValues(Seq("o_custkey", "o_orderkey"))
        .df
    },

    // --- §2.7 ewm mean (hardest op — per-key streaming recurrence). The
    //     oracle replays the identical float recurrence via a recursive CTE
    //     (same operations in the same order → bit-identical doubles);
    //     WindowsSpec additionally checks it against the pandas adjust=true
    //     closed form.
    Q("op_ewm",
      """WITH RECURSIVE t AS (
        |  SELECT o_custkey AS key, o_orderkey AS ord, o_totalprice AS value,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS rn
        |  FROM orders WHERE o_custkey < 100),
        |r AS (
        |  SELECT key, ord, value, rn, value AS num, CAST(1.0 AS DOUBLE) AS den
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.key, t.ord, t.value, t.rn,
        |         r.num * CAST(0.5 AS DOUBLE) + t.value,
        |         r.den * CAST(0.5 AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |  FROM t JOIN r ON t.key = r.key AND t.rn = r.rn + 1)
        |SELECT key, ord, value, num / den AS ewm FROM r
        |ORDER BY key, ord""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .ewmMean("o_custkey", "o_orderkey", "o_totalprice", alpha = 0.5)
        .sortValues(Seq("key", "ord"))
        .df
    },

    // --- §2.7 ewm variance/std (bias=false). The recursive CTE replays the
    //     identical four-accumulator recurrence and the identical final
    //     arithmetic — same float ops in the same order → bit-identical
    //     doubles, no rounding. var is NULL on each key's first row (the
    //     unbiased correction denominator is 0 there; pandas emits NaN).
    Q("op_ewm_var",
      """WITH RECURSIVE t AS (
        |  SELECT o_custkey AS key, o_orderkey AS ord, o_totalprice AS value,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS rn
        |  FROM orders WHERE o_custkey < 100),
        |r AS (
        |  SELECT key, ord, value, rn,
        |         value AS num, CAST(1.0 AS DOUBLE) AS den,
        |         value * value AS sumsq, CAST(1.0 AS DOUBLE) AS den2
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.key, t.ord, t.value, t.rn,
        |         r.num * CAST(0.5 AS DOUBLE) + t.value,
        |         r.den * CAST(0.5 AS DOUBLE) + CAST(1.0 AS DOUBLE),
        |         r.sumsq * CAST(0.5 AS DOUBLE) + t.value * t.value,
        |         r.den2 * CAST(0.25 AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |  FROM t JOIN r ON t.key = r.key AND t.rn = r.rn + 1)
        |SELECT key, ord, value, num / den AS ewm,
        |       CASE WHEN rn = 1 THEN NULL
        |            ELSE (sumsq - num * num / den) / (den - den2 / den) END AS ewm_var
        |FROM r
        |ORDER BY key, ord""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .ewmStats("o_custkey", "o_orderkey", "o_totalprice", alpha = 0.5)
        .drop("ewm_std")
        .sortValues(Seq("key", "ord"))
        .df
    },

    // --- §2.7/§2.8 ranking window functions
    Q("op_rank_window",
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders WHERE o_orderkey < 300
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rn""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val ord = Seq($"o_totalprice".desc, $"o_orderkey")
      gt(spark, dir, "orders")
        .query("o_orderkey < 300")
        .rank("rn", Seq("o_orderpriority"), ord, "first")
        .rank("rnk", Seq("o_orderpriority"), ord, "min")
        .rank("drnk", Seq("o_orderpriority"), ord, "dense")
        .assign("quartile" -> ntile(4).over(w).cast("long"))
        .select("o_orderpriority", "o_orderkey", "rn", "rnk", "drnk", "quartile")
        .sortValues(Seq("o_orderpriority", "rn"))
        .df
    },

    // --- §2.7 the remaining pandas rank methods (r9): ties→max and the
    //     pandas DEFAULT 'average' (min + (ties−1)/2 — exact .0/.5
    //     doubles, no rounding needed) over integer quantities with
    //     heavy ties. Rows sharing (g, id, q) are wholly determined by
    //     (g, q), so the ORDER BY is hash-stable.
    Q("op_rank_methods",
      """SELECT l_returnflag AS g, l_orderkey * 8 + l_linenumber AS id,
        |  CAST(l_quantity AS BIGINT) AS q,
        |  CAST(rank() OVER w AS BIGINT) AS r_min,
        |  CAST(dense_rank() OVER w AS BIGINT) AS r_dense,
        |  CAST(rank() OVER w
        |       + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |       - 1 AS BIGINT) AS r_max,
        |  CAST(rank() OVER w AS DOUBLE)
        |    + CAST(COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |           - 1 AS DOUBLE) / CAST(2.0 AS DOUBLE) AS r_avg
        |FROM lineitem WHERE l_orderkey < 2000
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
        |ORDER BY g, id, q""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ord = Seq($"l_quantity".asc)
      gt(spark, dir, "lineitem")
        .query("l_orderkey < 2000")
        .eval("g", "l_returnflag")
        .eval("id", "l_orderkey * 8 + l_linenumber")
        .eval("q", "CAST(l_quantity AS LONG)")
        .rank("r_min", Seq("g"), ord, "min")
        .rank("r_dense", Seq("g"), ord, "dense")
        .rank("r_max", Seq("g"), ord, "max")
        .rank("r_avg", Seq("g"), ord, "average")
        .select("g", "id", "q", "r_min", "r_dense", "r_max", "r_avg")
        .sortValues(Seq("g", "id", "q"))
        .df
    },

    // --- §2.6 groupby.head: top-k per group
    Q("op_groupby_head",
      """SELECT n_name, s_name, s_acctbal FROM (
        |  SELECT n_name, s_name, s_acctbal,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY s_acctbal DESC, s_suppkey) AS rn
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey) x
        |WHERE rn <= 3
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "supplier")
        .merge(gt(spark, dir, "nation"),
          leftOn = Seq("s_nationkey"), rightOn = Seq("n_nationkey"),
          broadcastRight = true)
        .groupby("n_name")
        .head(3, Seq(col("s_acctbal").desc, col("s_suppkey")))
        .select("n_name", "s_name", "s_acctbal")
        .sortValues(Seq("n_name", "s_acctbal", "s_name"), Seq(true, false, true))
        .df
    },

    // --- §2.6 groupby ffill via last(ignoreNulls) over preceding frame
    Q("op_groupby_ffill",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  last_value(NULLIF(l_discount, 0.0) IGNORE NULLS) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS disc_ffill
        |FROM lineitem WHERE l_suppkey < 10
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      val li = gt(spark, dir, "lineitem")
      li.query("l_suppkey < 10")
        .assign("disc_ffill" ->
          when(li("l_discount") === 0.0, lit(null)).otherwise(li("l_discount")))
        .ffill(Seq("l_suppkey"), Seq("l_orderkey", "l_linenumber"), Seq("disc_ffill"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "disc_ffill")
        .sortValues(Seq("l_suppkey", "l_orderkey", "l_linenumber"))
        .df
    },

    // --- §2.7 time-offset rolling window (pandas rolling('90d'))
    Q("op_rolling_time",
      """SELECT o_custkey, o_orderkey,
        |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_s
        |    RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_90d
        |FROM (SELECT o_custkey, o_orderkey,
        |             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |      FROM orders WHERE o_custkey < 30) o
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Windows.rollingTime(Seq("o_custkey"), "o_orderdate", 7776000L)
      t(spark, dir, "orders").filter($"o_custkey" < 30)
        .select($"o_custkey", $"o_orderkey",
          count(lit(1)).over(w).as("n_90d"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // --- §2.7 rolling var/std/median/skew/kurt. Skew/kurt derive from raw
    //     moment sums over the frame with pandas' sample adjustments
    //     (engine builtins disagree on the adjustment — same approach as
    //     op_agg_stats); l_quantity is integer-valued so the sums are
    //     exact, round-6 absorbs divide-order ulps.
    Q("op_rolling_stats",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  round(v, 6) AS roll_var,
        |  round(s, 6) AS roll_std,
        |  round(q, 6) AS roll_median,
        |  round(CASE WHEN n >= 3 AND (s2 / n - m * m) > 0
        |             THEN ((s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m)
        |                   / ((s2 / n - m * m) * sqrt(s2 / n - m * m)))
        |                  * sqrt(n * (n - 1.0)) / (n - 2.0)
        |        END, 6) + CAST(0.0 AS DOUBLE) AS roll_skew,
        |  round(CASE WHEN n >= 4 AND (s2 / n - m * m) > 0
        |             THEN ((n + 1.0) * ((s4 / n - 4.0 * m * (s3 / n)
        |                     + 6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m)
        |                   / ((s2 / n - m * m) * (s2 / n - m * m)) - 3.0) + 6.0)
        |                  * (n - 1.0) / ((n - 2.0) * (n - 3.0))
        |        END, 6) + CAST(0.0 AS DOUBLE) AS roll_kurt
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    CAST(COUNT(*) OVER w5 AS DOUBLE) AS n,
        |    SUM(l_quantity) OVER w5 / CAST(COUNT(*) OVER w5 AS DOUBLE) AS m,
        |    SUM(l_quantity * l_quantity) OVER w5 AS s2,
        |    SUM(l_quantity * l_quantity * l_quantity) OVER w5 AS s3,
        |    SUM(l_quantity * l_quantity * l_quantity * l_quantity) OVER w5 AS s4,
        |    var_samp(l_quantity) OVER w5 AS v, stddev_samp(l_quantity) OVER w5 AS s,
        |    quantile_cont(l_quantity, 0.5) OVER w5 AS q
        |  FROM lineitem WHERE l_suppkey < 10
        |  WINDOW w5 AS (PARTITION BY l_suppkey
        |                ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity
        |                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) base
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val part = Seq("l_suppkey")
      val ord = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      val w5 = Windows.rolling(Windows.spec(part, ord), 5)
      t(spark, dir, "lineitem").filter($"l_suppkey" < 10)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          round(var_samp($"l_quantity").over(w5), 6).as("roll_var"),
          round(stddev_samp($"l_quantity").over(w5), 6).as("roll_std"),
          round(Windows.rollingMedian($"l_quantity", w5), 6).as("roll_median"),
          // + 0.0 flushes IEEE -0.0 to +0.0 on both engines: symmetric
          // windows land tiny residuals on opposite sides of zero and the
          // driver's %.10g renders -0 != 0 (round preserves the sign).
          (round(Windows.rollingSkew($"l_quantity", w5), 6) + lit(0.0)).as("roll_skew"),
          (round(Windows.rollingKurt($"l_quantity", w5), 6) + lit(0.0)).as("roll_kurt"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
    },

    // --- §2.7 centered rolling window with min_periods (pandas
    //     rolling(5, center=True, min_periods=5)): frame spans 2 preceding
    //     to 2 following; null until 5 rows are in frame. DECIMAL sums →
    //     exact; the mean divides once.
    Q("op_rolling_center",
      """SELECT o_custkey, o_orderkey,
        |  CASE WHEN COUNT(*) OVER wc >= 5
        |       THEN CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wc AS DOUBLE)
        |  END AS c_sum,
        |  CASE WHEN COUNT(*) OVER wc >= 5
        |       THEN CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wc AS DOUBLE)
        |            / COUNT(*) OVER wc
        |  END AS c_mean
        |FROM orders WHERE o_custkey < 100
        |WINDOW wc AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val wc = Windows.rollingCentered(
        Windows.spec(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey")), 5)
      val cSum = Windows.minPeriods(
        sum(dec12($"o_totalprice")).over(wc).cast("double"), wc, 5)
      t(spark, dir, "orders").filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey",
          cSum.as("c_sum"),
          (cSum / count(lit(1)).over(wc)).as("c_mean"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // --- §2.6 groupby.transform (reference groupby/transform.py:28):
    //     same-shape per-group broadcast of an aggregate — demean and
    //     group-max columns. round 6 + 0.0 on the demeaned value (group
    //     means divide order-dependent double sums; x − mean can be ±0).
    Q("op_groupby_transform",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag, l_quantity,
        |  round(l_quantity - avg(l_quantity) OVER g, 6)
        |    + CAST(0.0 AS DOUBLE) AS qty_demeaned,
        |  max(l_quantity) OVER g AS qty_groupmax
        |FROM lineitem WHERE l_orderkey < 300
        |WINDOW g AS (PARTITION BY l_returnflag)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_returnflag, l_quantity""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "lineitem").query("l_orderkey < 300")
        .groupby("l_returnflag")
        .transform("mean", "l_quantity", "qty_mean")
        .groupby("l_returnflag")
        .transform("max", "l_quantity", "qty_groupmax")
        .assign("qty_demeaned" ->
          (round(col("l_quantity") - col("qty_mean"), 6) + lit(0.0)))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag",
          "l_quantity", "qty_demeaned", "qty_groupmax")
        .sortValues(Seq("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag",
          "l_quantity"))
        .df
    },

    // --- §2.7 pct_change (reference base/pct_change.py:27): x/lag − 1 with
    //     fill_method=None; pure IEEE division on doubles, bit-exact across
    //     engines with no rounding needed (o_totalprice > 0 throughout, so
    //     no signed-zero exposure).
    Q("op_pct_change",
      """SELECT o_custkey, o_orderkey,
        |  o_totalprice / lag(o_totalprice) OVER w - 1.0 AS pct_1,
        |  o_totalprice / lag(o_totalprice, 2) OVER w - 1.0 AS pct_2
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      val part = Seq("o_custkey")
      val ord = Seq("o_orderdate", "o_orderkey")
      gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .pctChange("o_totalprice", "pct_1", 1, part, ord)
        .pctChange("o_totalprice", "pct_2", 2, part, ord)
        .select("o_custkey", "o_orderkey", "pct_1", "pct_2")
        .sortValues(Seq("o_custkey", "o_orderkey"))
        .df
    },

    // --- §2.7 pairwise rolling corr/cov (pandas rolling.corr/cov;
    //     reference window/aggregation.py pairwise path). Zero-variance
    //     windows are guarded to NULL on both sides (Spark corr yields NaN,
    //     DuckDB NULL); round+0.0 per the libm / signed-zero conventions.
    Q("op_rolling_corr",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  round(CASE WHEN vq > 0 AND vp > 0 THEN c END, 6)
        |    + CAST(0.0 AS DOUBLE) AS roll_corr,
        |  round(cv, 6) + CAST(0.0 AS DOUBLE) AS roll_cov
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    var_samp(l_quantity) OVER w5 AS vq,
        |    var_samp(l_extendedprice) OVER w5 AS vp,
        |    corr(l_quantity, l_extendedprice) OVER w5 AS c,
        |    covar_samp(l_quantity, l_extendedprice) OVER w5 AS cv
        |  FROM lineitem WHERE l_suppkey < 10
        |  WINDOW w5 AS (PARTITION BY l_suppkey
        |                ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity
        |                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) base
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val part = Seq("l_suppkey")
      val ord = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      val w5 = Windows.rolling(Windows.spec(part, ord), 5)
      t(spark, dir, "lineitem").filter($"l_suppkey" < 10)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          (round(when(
              var_samp($"l_quantity").over(w5) > 0.0 &&
              var_samp($"l_extendedprice").over(w5) > 0.0,
              corr($"l_quantity", $"l_extendedprice").over(w5)), 6) +
            lit(0.0)).as("roll_corr"),
          (round(covar_samp($"l_quantity", $"l_extendedprice").over(w5), 6) +
            lit(0.0)).as("roll_cov"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
    },

    // --- §2.7 expanding corr/cov (pandas expanding().corr()/cov()): the
    //     exact-integer-sums formulation — native streamed-moment corr
    //     windows drift across engines at money magnitudes (the
    //     op_expanding_stats lesson), so both sides build
    //     (n, Σx, Σy, Σx², Σy², Σxy) exactly (Spark DECIMAL(38), DuckDB
    //     HUGEINT — identical integers) and cast each factor to double
    //     ONCE. y is extendedprice in exact cents.
    Q("op_expanding_corr",
      """WITH b AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem WHERE l_suppkey < 10),
        |s AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    COUNT(*) OVER w AS n,
        |    SUM(CAST(x AS HUGEINT)) OVER w AS sx,
        |    SUM(CAST(y AS HUGEINT)) OVER w AS sy,
        |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) OVER w AS sxx,
        |    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) OVER w AS syy,
        |    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) OVER w AS sxy
        |  FROM b
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT *, CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS f1,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS f2 FROM s)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  round(CASE WHEN f1 > 0.0 AND f2 > 0.0 THEN num / sqrt(f1 * f2) END, 6)
        |    + CAST(0.0 AS DOUBLE) AS exp_corr,
        |  round(CASE WHEN n > 1
        |        THEN num / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) END, 6)
        |    + CAST(0.0 AS DOUBLE) AS exp_cov
        |FROM f
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val part = Seq("l_suppkey")
      val ord = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      val w = Windows.expanding(Windows.spec(part, ord))
      val (c, v) = Windows.corrCovExact(
        $"l_quantity".cast("long"),
        (dec12($"l_extendedprice") * 100).cast("long"), w)
      t(spark, dir, "lineitem").filter($"l_suppkey" < 10)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey",
          $"l_quantity",
          (round(c, 6) + lit(0.0)).as("exp_corr"),
          (round(v, 6) + lit(0.0)).as("exp_cov"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey",
          $"l_quantity")
    },

    // --- §2.7 weighted rolling mean (pandas win_type='triang'): a sum of
    //     lags with exact small-integer weights — bit-exact, null until the
    //     trailing window is full on both sides
    Q("op_rolling_weighted",
      """SELECT o_custkey, o_orderkey,
        |  (lag(o_totalprice, 2) OVER w * 1.0 + lag(o_totalprice, 1) OVER w * 2.0
        |   + lag(o_totalprice, 0) OVER w * 1.0) / 4.0 AS wmean
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_custkey < 50")
        .rollingWeighted("o_totalprice", "wmean", Windows.triangWeights(3),
          Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
        .select("o_custkey", "o_orderkey", "wmean")
        .sortValues(Seq("o_custkey", "o_orderkey"))
        .df
    },

    // --- §2.7 time-offset rolling window at MICROsecond resolution over
    //     sub-second event timestamps — the oracle ranges over epoch_us, so
    //     the whole-second truncation this query guards against (the r2
    //     rollingTime ranged over unix_timestamp) would shift counts at
    //     window boundaries inside a second and fail the hash match.
    Q("op_rolling_time_us",
      """SELECT user_id, event_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_90s,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_90s
        |FROM (SELECT user_id, event_id, value, epoch_us(ts) AS us
        |      FROM events WHERE user_id < 40) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 90000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Windows.rollingTime(Seq("user_id"), "ts", 90L)
      t(spark, dir, "events").filter($"user_id" < 40)
        .select($"user_id", $"event_id",
          count(lit(1)).over(w).as("n_90s"),
          sum(dec12($"value")).over(w).cast("double").as("sum_90s"))
        .orderBy($"user_id", $"event_id")
    },

    // --- §2.16 tumbling event-time window (batch form)
    Q("op_events_tumbling",
      """SELECT event_type,
        |  CAST(floor(epoch_us(ts) / 3600000000.0) * 3600 AS BIGINT) AS w_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type, w_start
        |ORDER BY event_type, w_start""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .withColumn("w_start",
          (floor(unix_micros($"ts") / lit(3600000000.0)) * 3600).cast("long"))
        .groupBy($"event_type", $"w_start")
        .agg(count(lit(1)).as("n"), sumD(dec12($"value")).as("total"))
        .orderBy($"event_type", $"w_start")
    },

    // --- §2.16 sliding event-time window (1h width, 30min slide)
    Q("op_events_sliding",
      """SELECT event_type, w_start, COUNT(*) AS n FROM (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 1800000000.0) * 1800 AS BIGINT) AS w_start
        |  FROM events
        |  UNION ALL
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 1800000000.0) * 1800 - 1800 AS BIGINT)
        |  FROM events
        |) s GROUP BY event_type, w_start
        |ORDER BY event_type, w_start""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val base = (floor(unix_micros($"ts") / lit(1800000000.0)) * 1800).cast("long")
      ev.select($"event_type", base.as("w_start"))
        .unionAll(ev.select($"event_type", (base - 1800).as("w_start")))
        .groupBy($"event_type", $"w_start")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type", $"w_start")
    },

    // --- §2.16 OHLC resampling (pandas resample('1h').ohlc()): open/close
    //     via deterministic (t, id, value) struct extrema; values compare
    //     exactly (no arithmetic on them).
    Q("op_events_ohlc",
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 3600000000.0) * 3600 AS BIGINT) AS w_start,
        |    epoch_us(ts) AS t, event_id, value
        |  FROM events),
        |oc AS (
        |  SELECT event_type, w_start, t, event_id, value,
        |    row_number() OVER (PARTITION BY event_type, w_start
        |                       ORDER BY t, event_id, value) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, w_start
        |                       ORDER BY t DESC, event_id DESC, value DESC) AS rn_d
        |  FROM b),
        |hl AS (
        |  SELECT event_type, w_start, max(value) AS high, min(value) AS low,
        |         COUNT(*) AS n
        |  FROM b GROUP BY event_type, w_start)
        |SELECT hl.event_type, hl.w_start, o.value AS open, hl.high, hl.low,
        |       c.value AS close, hl.n
        |FROM hl
        |JOIN oc o ON o.event_type = hl.event_type AND o.w_start = hl.w_start
        |         AND o.rn_a = 1
        |JOIN oc c ON c.event_type = hl.event_type AND c.w_start = hl.w_start
        |         AND c.rn_d = 1
        |ORDER BY hl.event_type, hl.w_start""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Sessionize.ohlc(t(spark, dir, "events"), "event_type", "ts", "event_id",
          "value", widthSeconds = 3600L)
        .select($"event_type", $"w_start", $"open", $"high", $"low", $"close", $"n")
        .orderBy($"event_type", $"w_start")
    },

    // --- §2.6 groupby.filter (pandas): keep all rows of groups whose
    //     aggregate passes — suppliers with at least 60 lineitems.
    Q("op_groupby_filter",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity,
        |             COUNT(*) OVER (PARTITION BY l_suppkey) AS gn
        |      FROM lineitem WHERE l_suppkey < 40) f
        |WHERE gn >= 60
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem").query("l_suppkey < 40")
        .groupby("l_suppkey")
        .filterGroups("count", "l_suppkey")(_ >= 60)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .sortValues(Seq("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
          "l_quantity"))
        .df
    },

    // --- §2.16 daily retention cohorts: distinct active users per
    //     (first-seen day, day offset). Exact integer counts.
    Q("op_events_retention",
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |first AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
        |SELECT CAST(f.cohort AS VARCHAR) AS cohort,
        |       CAST(d.day - f.cohort AS BIGINT) AS k,
        |       COUNT(DISTINCT d.user_id) AS n_users
        |FROM days d JOIN first f ON d.user_id = f.user_id
        |WHERE d.day - f.cohort <= 14
        |GROUP BY f.cohort, k
        |ORDER BY cohort, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Sessionize.retentionCohorts(t(spark, dir, "events"), "user_id", "ts",
          maxDays = 14)
        .withColumn("cohort", $"cohort".cast("string"))
        .orderBy($"cohort", $"k")
    },

    // --- §2.16 two-step funnel (view → click within 30 min) on the
    //     bucketed interval join: counts of exact integer events, one
    //     exact division for the rate.
    Q("op_events_funnel",
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS t
        |      FROM events WHERE event_type = 'click'),
        |conv AS (
        |  SELECT DISTINCT v.user_id, v.event_id
        |  FROM v JOIN c ON c.user_id = v.user_id
        |   AND c.t >= v.t AND c.t < v.t + 1800000000),
        |nf AS (SELECT user_id, COUNT(*) AS n_from FROM v GROUP BY user_id),
        |nc AS (SELECT user_id, COUNT(*) AS n_converted FROM conv GROUP BY user_id)
        |SELECT nf.user_id, nf.n_from,
        |  COALESCE(nc.n_converted, 0) AS n_converted,
        |  CAST(COALESCE(nc.n_converted, 0) AS DOUBLE)
        |    / CAST(nf.n_from AS DOUBLE) AS conv_rate
        |FROM nf LEFT JOIN nc ON nf.user_id = nc.user_id
        |ORDER BY nf.user_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Sessionize.funnel(t(spark, dir, "events"), "user_id", "ts", "event_id",
          "event_type", fromType = "view", toType = "click", windowSeconds = 1800L)
        .orderBy($"user_id")
    },

    // --- §2.16 gap-based sessionization (library op)
    Q("op_events_session",
      """WITH flags AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, event_id,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flags)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       COUNT(*) AS n_events, min(event_id) AS first_event
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Sessionize.assignSessions(t(spark, dir, "events"), "user_id", "ts", 1800L)
        .groupBy($"user_id", $"session_seq".cast("long").as("session_seq"))
        .agg(count(lit(1)).as("n_events"), min($"event_id").as("first_event"))
        .orderBy($"user_id", $"session_seq")
    },

    // --- §2.4-extension interval join: clicks falling in the hour after
    //     each signup of the same user — bucketed equi-join re-expression
    //     of the range theta-join (library op; plain BETWEEN oracle)
    Q("op_interval_join",
      """SELECT s.user_id, s.event_id AS signup_id, c.event_id AS click_id
        |FROM (SELECT user_id, event_id, ts AS start_ts,
        |             ts + INTERVAL 1 HOUR AS end_ts
        |      FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
        |  ON s.user_id = c.user_id AND c.ts >= s.start_ts AND c.ts < s.end_ts
        |ORDER BY s.user_id, signup_id, click_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val signups = ev.filter($"event_type" === "signup")
        .select($"user_id", $"event_id".as("signup_id"),
          $"ts".as("start_ts"), ($"ts" + expr("INTERVAL 1 HOUR")).as("end_ts"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts")
      Sessionize.intervalJoin(clicks, signups,
          "user_id", "ts", "start_ts", "end_ts", bucketMicros = 3600000000L)
        .select($"user_id", $"signup_id", $"click_id")
        .orderBy($"user_id", $"signup_id", $"click_id")
    },

    // --- §2.4-extension as-of join (library op; DuckDB ASOF JOIN oracle)
    Q("op_asof_join",
      """SELECT p.user_id, p.event_id, c.event_id AS asof_click_id
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      Sessionize.asofJoinPrior(purchases, clicks, "user_id", "ts", "event_id")
        .select($"user_id", $"event_id", $"asof_event_id".as("asof_click_id"))
        .orderBy($"user_id", $"event_id")
    },

    // --- §2.16 event-type transition matrix (user-journey Markov counts):
    //     lead over the per-user time order, then one count aggregate.
    Q("op_transitions",
      """SELECT from_type, to_type, COUNT(*) AS n FROM (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events) t
        |WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Sessionize.transitionCounts(t(spark, dir, "events"),
          "user_id", "ts", "event_id", "event_type")
        .orderBy($"from_type", $"to_type")
    },

    // --- §2.16 additive seasonal decomposition (statsmodels
    //     seasonal_decompose, moving-average method) of per-user daily
    //     counts: trend is an exact int-sum / 7; seasonal averages the
    //     detrended values via exact scaled-integer sums on BOTH sides
    //     (ext_entropy pattern — raw double sums are order-dependent);
    //     residual follows per-row.
    Q("op_decompose",
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events WHERE user_id < 6
        |  GROUP BY user_id, CAST(ts AS DATE)),
        |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |         FROM bounds),
        |g AS (SELECT g.user_id, g.day, COALESCE(d.cnt, 0) AS cnt
        |      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day),
        |tr AS (
        |  SELECT user_id, day, cnt,
        |    CASE WHEN COUNT(*) OVER w7 = 7
        |         THEN CAST(SUM(cnt) OVER w7 AS DOUBLE) / 7.0 END AS trend,
        |    CAST(isodow(day) % 7 + 1 AS BIGINT) AS pos
        |  FROM g
        |  WINDOW w7 AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |se AS (
        |  SELECT *, CAST(CAST(SUM(CAST(floor(
        |                (CAST(cnt AS DOUBLE) - trend)
        |                  * CAST(1000000.0 AS DOUBLE)
        |                  + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |              OVER (PARTITION BY user_id, pos) AS BIGINT) AS DOUBLE)
        |            / CAST(1000000.0 AS DOUBLE)
        |            / COUNT(CAST(cnt AS DOUBLE) - trend)
        |              OVER (PARTITION BY user_id, pos) AS seasonal
        |  FROM tr)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, cnt,
        |  round(trend, 6) AS trend,
        |  round(seasonal, 4) + CAST(0.0 AS DOUBLE) AS seasonal,
        |  round(CAST(cnt AS DOUBLE) - trend - seasonal, 4)
        |    + CAST(0.0 AS DOUBLE) AS resid
        |FROM se ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(
          Sessionize.decomposeAdditive(
            t(spark, dir, "events").filter($"user_id" < 6), "user_id", "ts", period = 7))
        .assign(
          "day" -> date_format(col("day"), "yyyy-MM-dd"),
          "trend" -> round(col("trend"), 6),
          "seasonal" -> (round(col("seasonal"), 4) + lit(0.0)),
          "resid" -> (round(col("resid"), 4) + lit(0.0)))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.7 rolling.quantile(q): exact interpolated percentile over a
    //     5-row frame (Spark percentile ≡ DuckDB quantile_cont — the
    //     op_describe contract, windowed).
    Q("op_rolling_quantile",
      """SELECT o_custkey, o_orderkey,
        |  round(quantile_cont(o_totalprice, 0.25) OVER w5, 6) AS roll_p25,
        |  round(quantile_cont(o_totalprice, 0.75) OVER w5, 6) AS roll_p75
        |FROM orders WHERE o_custkey < 100
        |WINDOW w5 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .rolling(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"), 5)
        .quantile("o_totalprice", 0.25, "p25_raw")
        .rolling(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"), 5)
        .quantile("o_totalprice", 0.75, "p75_raw")
        .assign(
          "roll_p25" -> round(col("p25_raw"), 6),
          "roll_p75" -> round(col("p75_raw"), 6))
        .select("o_custkey", "o_orderkey", "roll_p25", "roll_p75")
        .sortValues(Seq("o_custkey", "o_orderkey"))
        .df
    },

    // --- as-of join with tolerance (pandas merge_asof tolerance=): the
    //     prior click only matches when at most 10 minutes old; stale
    //     matches null out but the purchase row is kept, like pandas.
    Q("op_asof_tolerance",
      """SELECT p.user_id, p.event_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 600000000
        |       THEN c.event_id END AS asof_click_id
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      Sessionize.asofJoinPriorTol(purchases, clicks, "user_id", "ts", "event_id",
          toleranceMicros = 600L * 1000000L)
        .select($"user_id", $"event_id", $"asof_event_id".as("asof_click_id"))
        .orderBy($"user_id", $"event_id")
    },

    // --- as-of join, forward direction (pandas merge_asof
    //     direction='forward'): earliest click at-or-after each purchase
    Q("op_asof_forward",
      """SELECT p.user_id, p.event_id, c.event_id AS asof_click_id
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      Sessionize.asofJoinForward(purchases, clicks, "user_id", "ts", "event_id")
        .select($"user_id", $"event_id", $"asof_event_id".as("asof_click_id"))
        .orderBy($"user_id", $"event_id")
    },

    // --- as-of join, nearest direction: prior vs forward, closer µs
    //     distance wins, prior wins exact ties (same rule both engines)
    Q("op_asof_nearest",
      """WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |pr AS (
        |  SELECT p.user_id, p.event_id, p.ts, c.event_id AS pid, c.ts AS pts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
        |fw AS (
        |  SELECT p.user_id, p.event_id, c.event_id AS fid, c.ts AS fts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT pr.user_id, pr.event_id,
        |  CASE WHEN pid IS NULL THEN fid
        |       WHEN fid IS NULL THEN pid
        |       WHEN epoch_us(pr.ts) - epoch_us(pts) <= epoch_us(fts) - epoch_us(pr.ts)
        |       THEN pid ELSE fid END AS asof_click_id
        |FROM pr JOIN fw ON pr.user_id = fw.user_id AND pr.event_id = fw.event_id
        |ORDER BY pr.user_id, pr.event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      Sessionize.asofJoinNearest(purchases, clicks, "user_id", "ts", "event_id")
        .select($"user_id", $"event_id", $"asof_event_id".as("asof_click_id"))
        .orderBy($"user_id", $"event_id")
    },

    // --- idiomatic Structured-Streaming-style windows on batch: the native
    //     window() generator vs the hand-built slide union in the oracle
    //     (both assign each event to the 2 overlapping 1h/30min windows)
    Q("op_window_native",
      """SELECT w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT event_type, value,
        |    CAST(floor(epoch_us(ts) / 1800000000.0) * 1800 AS BIGINT) AS w_start
        |  FROM events
        |  UNION ALL
        |  SELECT event_type, value,
        |    CAST(floor(epoch_us(ts) / 1800000000.0) * 1800 - 1800 AS BIGINT)
        |  FROM events
        |) s GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), sumD(dec12($"value")).as("total"))
        .select(unix_micros($"window.start").divide(1000000L).cast("long").as("w_start"),
          $"event_type", $"n", $"total")
        .orderBy($"w_start", $"event_type")
    },

    // --- k-step funnel (view → click → purchase, 1 h whole-funnel
    //     window): the oracle replays the chained first-event joins;
    //     fixture timestamps have no sub-µs component, so nanos (DuckDB)
    //     vs micros (Spark) comparisons agree exactly.
    Q("op_events_funnel3",
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(s1.t1) AS t1, MIN(e.ts) AS t2
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1
        |         AND e.ts <= s1.t1 + INTERVAL 3600 SECOND
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |         AND e.ts <= s2.t1 + INTERVAL 3600 SECOND
        |       GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |         CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS users
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'click',
        |         CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase',
        |         CAST((SELECT COUNT(*) FROM s3) AS BIGINT)) u
        |ORDER BY step""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Sessionize.funnelSteps(t(spark, dir, "events"), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"), windowSeconds = 3600L)
        .orderBy($"step")
    },

    // --- §2.14 per-row FFT (reference mars/tensor/fft, opcodes 601–630):
    //     length-8 per-user event signals through the radix-2 engine; the
    //     oracle recomputes the O(n²) DFT definition Σ xₙ·e^(−2πikn/N)
    //     directly in SQL. FFT-vs-DFT differ only in ~1e-12 summation
    //     ulps, far under round-4; +0.0 because the imaginary parts of
    //     bins 0 and N/2 are exact zeros on the FFT side but ±1e-15
    //     libm-sin residue on the DFT side.
    Q("op_fft",
      """WITH s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events WHERE user_id < 6),
        |sig AS (
        |  SELECT user_id, list(floor(value) ORDER BY rn) AS xs
        |  FROM s WHERE rn <= 8 GROUP BY user_id HAVING COUNT(*) = 8),
        |ks AS (SELECT unnest(range(0, 8)) AS k),
        |d AS (
        |  SELECT user_id, k,
        |    list_sum(list_transform(range(0, 8), n ->
        |      CAST(xs[n+1] AS DOUBLE) * cos(2 * pi() * k * n / 8))) AS re_raw,
        |    -list_sum(list_transform(range(0, 8), n ->
        |      CAST(xs[n+1] AS DOUBLE) * sin(2 * pi() * k * n / 8))) AS im_raw
        |  FROM sig, ks)
        |SELECT user_id, CAST(k AS BIGINT) AS k,
        |  round(re_raw, 4) + CAST(0.0 AS DOUBLE) AS re,
        |  round(im_raw, 4) + CAST(0.0 AS DOUBLE) AS im
        |FROM d ORDER BY user_id, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val sig = t(spark, dir, "events").filter($"user_id" < 6)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 8)
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"rn", floor($"value").as("v")))).as("s"))
        .filter(size($"s") === 8)
        .select($"user_id",
          transform($"s", x => x("v").cast("double")).as("xs"))
      sig
        .withColumn("f", graft.functions.Fft.fftReal($"xs"))
        .select($"user_id", posexplode(arrays_zip($"f.re", $"f.im")))
        .select($"user_id", $"pos".cast("long").as("k"),
          (round($"col.re", 4) + lit(0.0)).as("re"),
          (round($"col.im", 4) + lit(0.0)).as("im"))
        .orderBy($"user_id", $"k")
    },

    // --- §2.14 N-D per-row FFT (fftn over a flat row-major tensor +
    //     shape — reference mars/tensor/fft/fftn.py; closes the r8
    //     >2-axis de-scope): 16 small-int samples per user reshaped
    //     [2,2,4], oracle = the 3-D DFT definition with the row-major
    //     index decomposition n -> (n/8, n/4 mod 2, n mod 4). Small
    //     integer inputs keep butterfly-vs-DFT double divergence far
    //     inside round-4 (op_fft's argument).
    Q("op_fftn",
      """WITH s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events WHERE user_id < 6),
        |sig AS (
        |  SELECT user_id, list(floor(value) ORDER BY rn) AS xs
        |  FROM s WHERE rn <= 16 GROUP BY user_id HAVING COUNT(*) = 16),
        |ks AS (SELECT unnest(range(0, 16)) AS k),
        |d AS (
        |  SELECT user_id, k,
        |    list_sum(list_transform(range(0, 16), n ->
        |      CAST(xs[n+1] AS DOUBLE) * cos(2 * pi() *
        |        ((n // 8) * (k // 8) / 2.0 + ((n // 4) % 2) * ((k // 4) % 2) / 2.0
        |         + (n % 4) * (k % 4) / 4.0)))) AS re_raw,
        |    -list_sum(list_transform(range(0, 16), n ->
        |      CAST(xs[n+1] AS DOUBLE) * sin(2 * pi() *
        |        ((n // 8) * (k // 8) / 2.0 + ((n // 4) % 2) * ((k // 4) % 2) / 2.0
        |         + (n % 4) * (k % 4) / 4.0)))) AS im_raw
        |  FROM sig, ks)
        |SELECT user_id, CAST(k AS BIGINT) AS k,
        |  round(re_raw, 4) + CAST(0.0 AS DOUBLE) AS re,
        |  round(im_raw, 4) + CAST(0.0 AS DOUBLE) AS im
        |FROM d ORDER BY user_id, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val sig = t(spark, dir, "events").filter($"user_id" < 6)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 16)
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"rn", floor($"value").as("v")))).as("s"))
        .filter(size($"s") === 16)
        .select($"user_id",
          transform($"s", x => x("v").cast("double")).as("xs"))
      sig
        .withColumn("f",
          graft.functions.Fft.fftnReal($"xs", typedlit(Seq(2, 2, 4))))
        .select($"user_id", posexplode(arrays_zip($"f.re", $"f.im")))
        .select($"user_id", $"pos".cast("long").as("k"),
          (round($"col.re", 4) + lit(0.0)).as("re"),
          (round($"col.im", 4) + lit(0.0)).as("im"))
        .orderBy($"user_id", $"k")
    },

    // --- §2.14 real-input N-D FFT (reference mars/tensor/fft/rfftn.py,
    //     rfft2.py): the op_fftn transform truncated to last-axis
    //     frequencies k%4 ≤ 2 (Hermitian redundancy dropped, numpy's
    //     d/2+1 bins). Spark reconstructs the ORIGINAL flat index from
    //     the truncated position ((pos÷3)·4 + pos mod 3) so both sides
    //     key the spectrum identically; same round-4 + signed-zero
    //     conventions as the whole fft family.
    Q("op_fft_rfftn",
      """WITH s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events WHERE user_id < 6),
        |sig AS (
        |  SELECT user_id, list(floor(value) ORDER BY rn) AS xs
        |  FROM s WHERE rn <= 16 GROUP BY user_id HAVING COUNT(*) = 16),
        |ks AS (SELECT unnest(range(0, 16)) AS k),
        |d AS (
        |  SELECT user_id, k,
        |    list_sum(list_transform(range(0, 16), n ->
        |      CAST(xs[n+1] AS DOUBLE) * cos(2 * pi() *
        |        ((n // 8) * (k // 8) / 2.0 + ((n // 4) % 2) * ((k // 4) % 2) / 2.0
        |         + (n % 4) * (k % 4) / 4.0)))) AS re_raw,
        |    -list_sum(list_transform(range(0, 16), n ->
        |      CAST(xs[n+1] AS DOUBLE) * sin(2 * pi() *
        |        ((n // 8) * (k // 8) / 2.0 + ((n // 4) % 2) * ((k // 4) % 2) / 2.0
        |         + (n % 4) * (k % 4) / 4.0)))) AS im_raw
        |  FROM sig, ks WHERE k % 4 <= 2)
        |SELECT user_id, CAST(k AS BIGINT) AS k,
        |  round(re_raw, 4) + CAST(0.0 AS DOUBLE) AS re,
        |  round(im_raw, 4) + CAST(0.0 AS DOUBLE) AS im
        |FROM d ORDER BY user_id, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val sig = t(spark, dir, "events").filter($"user_id" < 6)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 16)
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"rn", floor($"value").as("v")))).as("s"))
        .filter(size($"s") === 16)
        .select($"user_id",
          transform($"s", x => x("v").cast("double")).as("xs"))
      sig
        .withColumn("f", graft.functions.Fft.rfftnReal($"xs", Seq(2, 2, 4)))
        .select($"user_id", posexplode(arrays_zip($"f.re", $"f.im")))
        .select($"user_id",
          (($"pos" - pmod($"pos", lit(3))) / lit(3) * 4 +
            pmod($"pos", lit(3))).cast("long").as("k"),
          (round($"col.re", 4) + lit(0.0)).as("re"),
          (round($"col.im", 4) + lit(0.0)).as("im"))
        .orderBy($"user_id", $"k")
    },

    // --- §2.14 DISTRIBUTED single-axis FFT (four-step decomposition,
    //     Fft.fftLong — closes the cross-partition FFT de-scope): one
    //     256-point signal held as 256 ROWS goes through two group-FFT
    //     shuffles (16×16); the oracle recomputes the O(N²) DFT
    //     definition. Inputs are small integers (floor(value) mod 10) so
    //     the DFT's sequential double sums stay far inside round-4 of
    //     the FFT's butterfly sums (same argument as op_fft).
    Q("op_fft_distributed",
      """WITH sig AS (
        |  SELECT list(CAST(((CAST(floor(value) AS BIGINT) % 10) + 10) % 10
        |              AS DOUBLE) ORDER BY event_id) AS xs
        |  FROM events WHERE event_id < 256),
        |ks AS (SELECT unnest(range(0, 256)) AS k),
        |d AS (
        |  SELECT k,
        |    list_sum(list_transform(range(0, 256), n ->
        |      xs[n+1] * cos(2 * pi() * k * n / 256))) AS re_raw,
        |    -list_sum(list_transform(range(0, 256), n ->
        |      xs[n+1] * sin(2 * pi() * k * n / 256))) AS im_raw
        |  FROM sig, ks)
        |SELECT CAST(k AS BIGINT) AS k,
        |  round(re_raw, 4) + CAST(0.0 AS DOUBLE) AS re,
        |  round(im_raw, 4) + CAST(0.0 AS DOUBLE) AS im
        |FROM d ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // event_id is dense and unique (TESTDATA), so the first 256 ids ARE
      // positions 0..255 — the signal loads with zero windows or shuffles
      val sig = t(spark, dir, "events").filter($"event_id" < 256)
        .select($"event_id".as("pos"),
          pmod(floor($"value").cast("long"), lit(10L)).cast("double").as("re"),
          lit(0.0).as("im"))
      graft.functions.Fft.fftLong(sig, "pos", "re", "im", 256L)
        .select($"pos".as("k"),
          (round($"re", 4) + lit(0.0)).as("re"),
          (round($"im", 4) + lit(0.0)).as("im"))
        .orderBy($"k")
    },

    // --- §2.14 real FFT (reference mars/tensor/fft/rfft.py:30,
    //     rfftfreq.py:30): the non-redundant k ≤ n/2 bins only, composed
    //     from the full kernel by slicing (no new UDF), plus the
    //     rfftfreq grid — k/8 is an exact binary rational with d=1, n=8,
    //     so the freq column needs no rounding at all. Spectra round-4
    //     +0.0 as in op_fft.
    Q("op_fft_rfft",
      """WITH s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events WHERE user_id < 6),
        |sig AS (
        |  SELECT user_id, list(floor(value) ORDER BY rn) AS xs
        |  FROM s WHERE rn <= 8 GROUP BY user_id HAVING COUNT(*) = 8),
        |ks AS (SELECT unnest(range(0, 5)) AS k),
        |d AS (
        |  SELECT user_id, k,
        |    list_sum(list_transform(range(0, 8), n ->
        |      CAST(xs[n+1] AS DOUBLE) * cos(2 * pi() * k * n / 8))) AS re_raw,
        |    -list_sum(list_transform(range(0, 8), n ->
        |      CAST(xs[n+1] AS DOUBLE) * sin(2 * pi() * k * n / 8))) AS im_raw
        |  FROM sig, ks)
        |SELECT user_id, CAST(k AS BIGINT) AS k,
        |  round(re_raw, 4) + CAST(0.0 AS DOUBLE) AS re,
        |  round(im_raw, 4) + CAST(0.0 AS DOUBLE) AS im,
        |  CAST(k AS DOUBLE) / 8 AS freq
        |FROM d ORDER BY user_id, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val sig = t(spark, dir, "events").filter($"user_id" < 6)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 8)
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"rn", floor($"value").as("v")))).as("s"))
        .filter(size($"s") === 8)
        .select($"user_id",
          transform($"s", x => x("v").cast("double")).as("xs"))
      sig
        .withColumn("f", graft.functions.Fft.rfft($"xs"))
        .withColumn("freqs", graft.functions.Fft.rfftfreq(size($"xs"), lit(1.0)))
        .select($"user_id", posexplode(arrays_zip($"f.re", $"f.im", $"freqs")))
        .select($"user_id", $"pos".cast("long").as("k"),
          (round($"col.re", 4) + lit(0.0)).as("re"),
          (round($"col.im", 4) + lit(0.0)).as("im"),
          $"col.freqs".as("freq"))
        .orderBy($"user_id", $"k")
    },

    // --- §2.14 fftshift (reference mars/tensor/fft/fftshift.py:28): a
    //     pure right-rotation by n/2, so the oracle is INTEGER-ONLY index
    //     algebra — shifted[pos] = xs[(pos + 4) mod 8] for n=8 — per the
    //     r8 convention for gate outputs.
    Q("op_fftshift",
      """WITH s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events WHERE user_id < 6),
        |sig AS (
        |  SELECT user_id, list(CAST(floor(value) AS BIGINT) ORDER BY rn) AS xs
        |  FROM s WHERE rn <= 8 GROUP BY user_id HAVING COUNT(*) = 8),
        |ps AS (SELECT unnest(range(0, 8)) AS pos)
        |SELECT user_id, CAST(pos AS BIGINT) AS pos,
        |       CAST(xs[((pos + 4) % 8) + 1] AS BIGINT) AS v
        |FROM sig, ps ORDER BY user_id, pos""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val sig = t(spark, dir, "events").filter($"user_id" < 6)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 8)
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"rn", floor($"value").cast("long").as("v")))).as("s"))
        .filter(size($"s") === 8)
        .select($"user_id", transform($"s", x => x("v")).as("xs"))
      sig
        .select($"user_id", posexplode(graft.functions.Fft.fftshift($"xs")))
        .select($"user_id", $"pos".cast("long").as("pos"), $"col".as("v"))
        .orderBy($"user_id", $"pos")
    },

    // --- per-key autocorrelation at lags 1..3 over daily event counts
    //     (statsmodels acf): exact-integer daily series, full-mean
    //     centering (the mean is exact: integer-valued double sums);
    //     the per-lag Σ sums exact scaled integers on BOTH sides
    //     (ext_entropy pattern). +0.0 guard: acf near 0 is common.
    Q("op_events_acf",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                      CAST(COUNT(*) AS BIGINT) AS x
        |               FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, AVG(CAST(x AS DOUBLE)) AS m FROM daily GROUP BY 1),
        |l AS (SELECT d.event_type, CAST(x AS DOUBLE) AS x, m,
        |        lead(CAST(x AS DOUBLE), 1) OVER wd AS x1,
        |        lead(CAST(x AS DOUBLE), 2) OVER wd AS x2,
        |        lead(CAST(x AS DOUBLE), 3) OVER wd AS x3
        |      FROM daily d JOIN s USING (event_type)
        |      WINDOW wd AS (PARTITION BY d.event_type ORDER BY day)),
        |a AS (SELECT event_type,
        |        CAST(SUM(CAST(floor((x-m)*(x-m) * CAST(1000000.0 AS DOUBLE)
        |          + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS den,
        |        CAST(SUM(CAST(floor((x-m)*(x1-m) * CAST(1000000.0 AS DOUBLE)
        |          + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS n1,
        |        CAST(SUM(CAST(floor((x-m)*(x2-m) * CAST(1000000.0 AS DOUBLE)
        |          + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS n2,
        |        CAST(SUM(CAST(floor((x-m)*(x3-m) * CAST(1000000.0 AS DOUBLE)
        |          + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS n3
        |      FROM l GROUP BY event_type)
        |SELECT event_type, lag, round(acf, 4) + CAST(0.0 AS DOUBLE) AS acf
        |FROM (SELECT event_type, CAST(1 AS BIGINT) AS lag,
        |        CAST(n1 AS DOUBLE)/CAST(den AS DOUBLE) AS acf FROM a
        |      UNION ALL SELECT event_type, CAST(2 AS BIGINT),
        |        CAST(n2 AS DOUBLE)/CAST(den AS DOUBLE) FROM a
        |      UNION ALL SELECT event_type, CAST(3 AS BIGINT),
        |        CAST(n3 AS DOUBLE)/CAST(den AS DOUBLE) FROM a) u
        |ORDER BY event_type, lag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val daily = t(spark, dir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("x"))
      Sessionize.acf(daily, "event_type", "day", "x", maxLag = 3)
        .select($"event_type", $"lag",
          (round($"acf", 4) + lit(0.0)).as("acf"))
        .orderBy($"event_type", $"lag")
    }
  )
}
