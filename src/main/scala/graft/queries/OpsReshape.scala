package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._

/** Round-6 reshape/alignment/statistics coverage: combine_first, compare,
  * crosstab, pivot_table margins, linear interpolation, calendar resample,
  * pct rank + groupby cumcount, winsorize.
  *
  * Conventions as everywhere: deterministic total-order ORDER BY on both
  * sides, DECIMAL casts for money sums, BIGINT casts for integer derived
  * columns, round(x, 6) (+ 0.0 when the value can be exactly zero) for
  * libm/division-dependent doubles.
  */
object OpsReshape {

  val all: Vector[Q] = Vector(

    // --- MultiIndex level surface (reference core.py:275; the SURVEY
    //     §1.4 flat-columns model's hierarchical ops, r12): xs selects a
    //     cross-section at one level and DROPS it.
    Q("op_multiindex_xs",
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_regionkey = 1 ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "nation")
        .setIndex("n_regionkey", "n_nationkey")
        .xs(1, "n_regionkey")
        .sortValues(Seq("n_nationkey"))
        .df.select("n_nationkey", "n_name")
    },

    // --- swaplevel + level-addressed groupby: after the swap, level 1
    //     is n_regionkey — positional level arithmetic is what this
    //     gate pins (a wrong position groups by nationkey and returns
    //     25 rows, not 5). dropLevel feeds the same pipeline.
    Q("op_multiindex_group",
      """SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(n_nationkey) AS BIGINT) AS min_key
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "nation")
        .setIndex("n_nationkey", "n_regionkey")
        .swapLevel() // levels now (n_regionkey, n_nationkey)
        .groupbyLevel(0)
        .agg(("n", "count", "n_name"), ("min_key", "min", "n_nationkey"))
        .df.select($"n_regionkey", $"n".cast("long").as("n"),
          $"min_key".cast("long").as("min_key"))
        .orderBy($"n_regionkey")
    },

    // --- unstack(level): pivot one index level into columns over a
    //     unique (rest, level) key set — built from an exact BIGINT
    //     aggregate so the wide cells are integer-exact.
    Q("op_unstack_level",
      """SELECT l_returnflag,
        |  MIN(CASE WHEN l_linestatus = 'F' THEN sq END) AS F,
        |  MIN(CASE WHEN l_linestatus = 'O' THEN sq END) AS O
        |FROM (SELECT l_returnflag, l_linestatus,
        |        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |      FROM lineitem GROUP BY 1, 2) base
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val base = t(spark, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast("long")).as("sq"))
      graft.api.GraftFrame(base)
        .setIndex("l_returnflag", "l_linestatus")
        .unstackLevel("l_linestatus", "sq", Seq("F", "O"))
        .df.orderBy($"l_returnflag")
    },

    // --- §2.4 combine_first (pandas DataFrame.combine_first): this frame's
    //     nulls patched from the other frame over a key-aligned full outer
    //     union. Frame A nulls every third price; frame B (shifted key
    //     range) carries price+1 — so the result exercises patched holes,
    //     left-only rows, right-only rows, and a right-missing column.
    Q("op_combine_first",
      """WITH a AS (
        |  SELECT o_orderkey AS k,
        |         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS price,
        |         o_orderpriority AS prio
        |  FROM orders WHERE o_orderkey < 3000),
        |b AS (
        |  SELECT o_orderkey AS k, o_totalprice + CAST(1.0 AS DOUBLE) AS price
        |  FROM orders WHERE o_orderkey >= 1500 AND o_orderkey < 5000)
        |SELECT k, COALESCE(a.price, b.price) AS price, prio
        |FROM a FULL OUTER JOIN b USING (k)
        |ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = t(spark, dir, "orders")
      val a = graft.api.GraftFrame(orders.filter($"o_orderkey" < 3000)
        .select($"o_orderkey".as("k"),
          when($"o_orderkey" % 3 === 0, lit(null).cast("double"))
            .otherwise($"o_totalprice").as("price"),
          $"o_orderpriority".as("prio")))
      val b = graft.api.GraftFrame(orders
        .filter($"o_orderkey" >= 1500 && $"o_orderkey" < 5000)
        .select($"o_orderkey".as("k"), ($"o_totalprice" + lit(1.0)).as("price")))
      a.combineFirst(b, Seq("k"))
        .sortValues(Seq("k"))
        .df
    },

    // --- §2.4 compare (pandas DataFrame.compare): key-aligned diff of two
    //     frames — only rows where a compared column differs survive,
    //     emitted as (self, other) column pairs.
    Q("op_compare",
      """WITH self AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey < 1000),
        |other AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + CAST(100.0 AS DOUBLE)
        |         ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey < 1000)
        |SELECT s.c_custkey,
        |  s.c_acctbal AS c_acctbal_self, o.c_acctbal AS c_acctbal_other,
        |  s.c_mktsegment AS c_mktsegment_self, o.c_mktsegment AS c_mktsegment_other
        |FROM self s JOIN other o USING (c_custkey)
        |WHERE s.c_acctbal IS DISTINCT FROM o.c_acctbal
        |   OR s.c_mktsegment IS DISTINCT FROM o.c_mktsegment
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cust = t(spark, dir, "customer").filter($"c_custkey" < 1000)
      val self = graft.api.GraftFrame(
        cust.select($"c_custkey", $"c_acctbal", $"c_mktsegment"))
      val other = graft.api.GraftFrame(cust.select($"c_custkey",
        when($"c_custkey" % 5 === 0, $"c_acctbal" + lit(100.0))
          .otherwise($"c_acctbal").as("c_acctbal"),
        when($"c_custkey" % 7 === 0, lit("CHANGED"))
          .otherwise($"c_mktsegment").as("c_mktsegment")))
      self.compareFrames(other, Seq("c_custkey"),
          Seq("c_acctbal", "c_mktsegment"))
        .sortValues(Seq("c_custkey"))
        .df
    },

    // --- §2.4 update (pandas DataFrame.update): other's non-null values
    //     overwrite key-aligned rows; self's row set is preserved (left
    //     join), other-only rows ignored — the mirror of combine_first.
    Q("op_update",
      """WITH self AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price, o_orderpriority AS prio
        |  FROM orders WHERE o_orderkey < 2000),
        |other AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice * CAST(2.0 AS DOUBLE) END AS price
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 4000)
        |SELECT s.k, COALESCE(o.price, s.price) AS price, s.prio
        |FROM self s LEFT JOIN other o ON s.k = o.k
        |ORDER BY s.k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = t(spark, dir, "orders")
      val self = graft.api.GraftFrame(orders.filter($"o_orderkey" < 2000)
        .select($"o_orderkey".as("k"), $"o_totalprice".as("price"),
          $"o_orderpriority".as("prio")))
      val other = graft.api.GraftFrame(orders
        .filter($"o_orderkey" >= 1000 && $"o_orderkey" < 4000)
        .select($"o_orderkey".as("k"),
          when($"o_orderkey" % 4 === 0, $"o_totalprice" * 2.0).as("price")))
      self.updateFrom(other, Seq("k"))
        .sortValues(Seq("k"))
        .df
    },

    // --- §2.11 first/last_valid_index: order bounds of the non-null span.
    Q("op_valid_index",
      """SELECT min(CASE WHEN v IS NOT NULL THEN o_orderkey END) AS first_valid,
        |       max(CASE WHEN v IS NOT NULL THEN o_orderkey END) AS last_valid
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 100 < 90 THEN NULL ELSE o_totalprice END AS v
        |      FROM orders WHERE o_orderkey < 20000) t""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "orders").filter($"o_orderkey" < 20000)
        .select($"o_orderkey",
          when($"o_orderkey" % 100 < 90, lit(null).cast("double"))
            .otherwise($"o_totalprice").as("v")))
        .validIndexBounds("o_orderkey", "v")
        .df
    },

    // --- §2.10 crosstab (pandas.crosstab): row-key × column-key count
    //     matrix with explicit column universe and 0-filled empty cells.
    Q("op_crosstab",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .crosstab("o_orderpriority", "o_orderstatus", Seq("F", "O", "P"))
        .sortValues(Seq("o_orderpriority"))
        .df
    },

    // --- §2.10 crosstab(normalize=) (r9): the count matrix divided by
    //     the grand total / row totals / column totals — exact long/long
    //     rational divisions, no rounding needed (CLAUDE.md exact-
    //     rationals rule); all three pandas normalize modes in one gate.
    Q("op_crosstab_norm",
      """WITH ct AS (
        |  SELECT o_orderpriority AS pri,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(f + o + p) AS DOUBLE) AS t,
        |         CAST(SUM(f) AS DOUBLE) AS tf,
        |         CAST(SUM(o) AS DOUBLE) AS tn,
        |         CAST(SUM(p) AS DOUBLE) AS tp
        |  FROM ct)
        |SELECT 'all' AS norm, pri,
        |  CAST(f AS DOUBLE) / t AS "F", CAST(o AS DOUBLE) / t AS "O",
        |  CAST(p AS DOUBLE) / t AS "P"
        |FROM ct, tot
        |UNION ALL
        |SELECT 'index', pri,
        |  CAST(f AS DOUBLE) / CAST(f + o + p AS DOUBLE),
        |  CAST(o AS DOUBLE) / CAST(f + o + p AS DOUBLE),
        |  CAST(p AS DOUBLE) / CAST(f + o + p AS DOUBLE)
        |FROM ct
        |UNION ALL
        |SELECT 'columns', pri,
        |  CAST(f AS DOUBLE) / tf, CAST(o AS DOUBLE) / tn,
        |  CAST(p AS DOUBLE) / tp
        |FROM ct, tot
        |ORDER BY norm, pri""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      def variant(mode: String) =
        gt(spark, dir, "orders")
          .crosstabNormalized("o_orderpriority", "o_orderstatus", mode,
            Seq("F", "O", "P"))
          .df.select(lit(mode).as("norm"), $"o_orderpriority".as("pri"),
            $"F", $"O", $"P")
      variant("all").unionAll(variant("index")).unionAll(variant("columns"))
        .orderBy($"norm", $"pri")
    },

    // --- §2.10 pivot_table(margins=True): conditional sums over
    //     cube(index) — the cube's grand-total grouping set IS the margin
    //     row; no union, no second scan. Exact DECIMAL sums → double.
    Q("op_pivot_margins",
      """SELECT COALESCE(l_returnflag, 'All') AS l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
        |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F",
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
        |       FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O",
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS "All"
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), ())
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = graft.api.GraftFrame(t(spark, dir, "lineitem")
        .withColumn("qty_dec", dec12($"l_quantity")))
      li.pivotTableMargins("l_returnflag", "l_linestatus", "qty_dec",
          Seq("F", "O"))
        .astype("F" -> "double", "O" -> "double", "All" -> "double")
        .sortValues(Seq("l_returnflag"))
        .df
    },

    // --- §2.7/§2.10 interpolate(method='linear'): interior null runs
    //     filled linearly between surrounding valid values at their row
    //     positions; leading nulls stay null, trailing nulls carry the
    //     last value (pandas limit_direction='forward'). Both engines
    //     replay the identical ignore-nulls window formulation.
    Q("op_interpolate",
      """WITH base AS (
        |  SELECT user_id, event_id,
        |         CASE WHEN event_id % 7 < 2 THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 10),
        |r AS (
        |  SELECT user_id, event_id, v,
        |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |              AS DOUBLE) AS rn
        |  FROM base),
        |f AS (
        |  SELECT user_id, event_id, v, rn,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS prn,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wf AS nrn
        |  FROM r
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |             WHEN pv IS NULL THEN NULL
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) * (rn - prn) / (nrn - prn) END, 6)
        |    + CAST(0.0 AS DOUBLE) AS interp
        |FROM f ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val base = t(spark, dir, "events").filter($"user_id" < 10)
        .select($"user_id", $"event_id",
          when($"event_id" % 7 < 2, lit(null).cast("double"))
            .otherwise($"value").as("v"))
      graft.api.GraftFrame(base)
        .interpolate(Seq("user_id"), Seq("event_id"), "v", "interp_raw")
        .assign("interp" -> (round(col("interp_raw"), 6) + lit(0.0)))
        .select("user_id", "event_id", "interp")
        .sortValues(Seq("user_id", "event_id"))
        .df
    },

    // --- §2.16 resample('1D') with calendar completion (pandas
    //     resample/asfreq): per user a gap-free day grid from first to last
    //     observed day; empty days carry cnt=0, a null sum, and the
    //     previous day's sum under ffill. The summed value is
    //     floor(value) — exact integer arithmetic on both engines.
    //     Gate hardening (r8): every aggregate output is CAST AS BIGINT —
    //     DuckDB SUM(BIGINT) returns HUGEINT (int128), which the driver's
    //     fetch renders differently than BIGINT (the r7 reds were exactly
    //     the 5 oracles with HUGEINT columns) — and the bucket is emitted
    //     as an epoch-day integer, not a strftime string, so the gated
    //     row is integer-only end to end.
    Q("op_resample",
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
        |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_val
        |  FROM events WHERE user_id < 8
        |  GROUP BY user_id, CAST(ts AS DATE)),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.day, COALESCE(d.cnt, 0) AS cnt, d.sum_val
        |  FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day),
        |-- ffill via gap-group id (count of non-nulls so far) + max within the
        |-- group: one non-null per group, so max picks it. Version-stable on
        |-- every engine — no IGNORE NULLS, whose support/semantics vary
        |-- across DuckDB builds.
        |gg AS (
        |  SELECT *, count(sum_val) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id, CAST(day - DATE '1970-01-01' AS BIGINT) AS day, cnt,
        |  sum_val,
        |  CAST(max(sum_val) OVER (PARTITION BY user_id, grp) AS BIGINT)
        |    AS sum_ffill
        |FROM gg ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 8))
        .resampleDaily("user_id", "ts", floor($"value").cast("long"))
        .assign("day" -> datediff(col("day"), lit("1970-01-01")).cast("long"))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.16 resample('1W'): weekly calendar completion — ISO Monday
    //     week starts on both engines, gap weeks carry cnt=0 / null sum /
    //     previous week's ffill. BIGINT-cast aggregates + epoch-day bucket
    //     (no HUGEINT, no strftime) — see op_resample.
    Q("op_resample_week",
      """WITH weekly AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS day,
        |         COUNT(*) AS cnt,
        |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_val
        |  FROM events WHERE user_id < 25
        |  GROUP BY user_id, CAST(date_trunc('week', ts) AS DATE)),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM weekly GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 WEEK)) AS DATE) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.day, COALESCE(w.cnt, 0) AS cnt, w.sum_val
        |  FROM grid g LEFT JOIN weekly w ON g.user_id = w.user_id AND g.day = w.day),
        |-- gap-group ffill (see op_resample): version-stable, no IGNORE NULLS.
        |gg AS (
        |  SELECT *, count(sum_val) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id, CAST(day - DATE '1970-01-01' AS BIGINT) AS day, cnt,
        |  sum_val,
        |  CAST(max(sum_val) OVER (PARTITION BY user_id, grp) AS BIGINT)
        |    AS sum_ffill
        |FROM gg ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 25))
        .resampleCalendar("user_id", "ts", floor($"value").cast("long"), "week")
        .assign("day" -> datediff(col("day"), lit("1970-01-01")).cast("long"))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.16 ANCHORED resample offsets (r9, VERDICT task 8 — pandas
    //     'W-WED' / '1Y' year-end / 'AS-JUL' fiscal-year / '1Q'
    //     quarter-end / 'QS-FEB' fiscal-quarter anchors, reference
    //     datasource/date_range.py offset table) over the multi-year
    //     o_orderdate span: right-labeled anchored weeks (label = first
    //     Wednesday >= date), years labeled Dec 31, July-anchored fiscal
    //     years, quarters labeled by last day (grid on starts — quarter
    //     ENDS don't step uniformly), and Feb-anchored quarter starts.
    //     Same gap-free grid + gap-group ffill construct as op_resample;
    //     integer-only output columns (epoch days, BIGINT aggregates)
    //     per the r8 gate convention.
    Q("op_resample_anchored", {
      def block(tag: String, bucketSql: String, stepSql: String,
          freq: String, relabelSql: String = "day"): String =
        s"""${tag}_b AS (
           |  SELECT pri, $bucketSql AS day, COUNT(*) AS cnt,
           |         CAST(SUM(v) AS BIGINT) AS sum_val
           |  FROM o GROUP BY 1, 2),
           |${tag}_bounds AS (
           |  SELECT pri, min(day) AS d0, max(day) AS d1
           |  FROM ${tag}_b GROUP BY pri),
           |${tag}_grid AS (
           |  SELECT pri, CAST(unnest(generate_series(d0, d1, $stepSql))
           |              AS DATE) AS day
           |  FROM ${tag}_bounds),
           |${tag}_j AS (
           |  SELECT g.pri, g.day, COALESCE(b.cnt, 0) AS cnt, b.sum_val
           |  FROM ${tag}_grid g
           |  LEFT JOIN ${tag}_b b ON g.pri = b.pri AND g.day = b.day),
           |${tag}_gg AS (
           |  SELECT *, count(sum_val) OVER (
           |    PARTITION BY pri ORDER BY day
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           |  FROM ${tag}_j),
           |${tag}_out AS (
           |  SELECT '$freq' AS freq, pri,
           |    CAST($relabelSql - DATE '1970-01-01' AS BIGINT) AS day,
           |    cnt, sum_val,
           |    CAST(max(sum_val) OVER (PARTITION BY pri, grp) AS BIGINT)
           |      AS sum_ffill
           |  FROM ${tag}_gg)""".stripMargin
      s"""WITH o AS (
         |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
         |         o_custkey AS v
         |  FROM orders WHERE o_orderkey < 8000),
         |${block("wk",
             "d + CAST((10 - dayofweek(d)) % 7 AS INTEGER)",
             "INTERVAL 1 WEEK", "W-WED")},
         |${block("yr", "make_date(CAST(year(d) AS INTEGER), 12, 31)",
             "INTERVAL 1 YEAR", "YE")},
         |${block("fy",
             "make_date(CAST(year(d) - CASE WHEN month(d) < 7 THEN 1 " +
               "ELSE 0 END AS INTEGER), 7, 1)",
             "INTERVAL 1 YEAR", "YS-JUL")},
         |${block("qe", "CAST(date_trunc('quarter', d) AS DATE)",
             "INTERVAL 3 MONTH", "QE",
             relabelSql = "last_day(day + INTERVAL 2 MONTH)")},
         |${block("qs",
             "CAST(date_trunc('month', d) " +
               "- to_months(CAST((month(d) - 2 + 12) % 12 % 3 AS INTEGER)) " +
               "AS DATE)",
             "INTERVAL 3 MONTH", "QS-FEB")}
         |SELECT * FROM wk_out
         |UNION ALL SELECT * FROM yr_out
         |UNION ALL SELECT * FROM fy_out
         |UNION ALL SELECT * FROM qe_out
         |UNION ALL SELECT * FROM qs_out
         |ORDER BY freq, pri, day""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val o = t(spark, dir, "orders").filter($"o_orderkey" < 8000)
        .select($"o_orderpriority".as("pri"), $"o_orderdate".as("d"),
          $"o_custkey".as("v"))
      def variant(unit: String, freq: String) =
        graft.api.GraftFrame(o).resampleCalendar("pri", "d", col("v"), unit)
          .assign("day" -> datediff(col("day"), lit("1970-01-01")).cast("long"))
          .df.select(lit(freq).as("freq"), col("pri"), col("day"),
            col("cnt"), col("sum_val"), col("sum_ffill"))
      variant("W-WED", "W-WED")
        .unionAll(variant("year_end", "YE"))
        .unionAll(variant("YS-JUL", "YS-JUL"))
        .unionAll(variant("quarter_end", "QE"))
        .unionAll(variant("QS-FEB", "QS-FEB"))
        .orderBy($"freq", $"pri", $"day")
    },

    // --- §2.16 resample(unit).agg(...) with CALLER-CHOSEN aggregates
    //     (r9): weekly min/max/count/mean over integer values on the
    //     gap-free grid, holes null (pandas NaN bins). mean is an exact
    //     BIGINT-sum / BIGINT-count double division — no rounding.
    Q("op_resample_agg",
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS day,
        |         CAST(floor(value) AS BIGINT) AS v
        |  FROM events WHERE user_id < 15),
        |wk AS (
        |  SELECT user_id, day, COUNT(*) AS n,
        |         min(v) AS vmin, max(v) AS vmax,
        |         CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS vavg
        |  FROM ev GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM wk GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 WEEK)) AS DATE) AS day
        |  FROM bounds)
        |SELECT g.user_id, CAST(g.day - DATE '1970-01-01' AS BIGINT) AS day,
        |       w.n, w.vmin, w.vmax, w.vavg
        |FROM grid g LEFT JOIN wk w ON g.user_id = w.user_id AND g.day = w.day
        |ORDER BY g.user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events").filter($"user_id" < 15)
        .select($"user_id", $"ts", floor($"value").cast("long").as("v"))
      graft.api.GraftFrame(ev)
        .resampleAgg("user_id", "ts", "week",
          "n" -> count(lit(1)),
          "vmin" -> min($"v"), "vmax" -> max($"v"),
          "vavg" -> (sum($"v").cast("double") / count(lit(1)).cast("double")))
        .assign("day" -> datediff(col("day"), lit("1970-01-01")).cast("long"))
        .select("user_id", "day", "n", "vmin", "vmax", "vavg")
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.16 resample('1H'): sub-daily hourly grid (the events fixture
    //     is sub-daily, so the hour grid is the natural pandas
    //     resample('1H') shape) — same gap-free completion, cnt=0 gaps,
    //     gap-group ffill as op_resample; the gated bucket column is
    //     epoch seconds (BIGINT-cast aggregates — see op_resample).
    Q("op_resample_hour",
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS day, COUNT(*) AS cnt,
        |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_val
        |  FROM events WHERE user_id < 5
        |  GROUP BY user_id, date_trunc('hour', ts)),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM hourly GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.day, COALESCE(h.cnt, 0) AS cnt, h.sum_val
        |  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.day = h.day),
        |gg AS (
        |  SELECT *, count(sum_val) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id, epoch_us(day) // 1000000 AS day, cnt, sum_val,
        |  CAST(max(sum_val) OVER (PARTITION BY user_id, grp) AS BIGINT)
        |    AS sum_ffill
        |FROM gg ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 5))
        .resampleCalendar("user_id", "ts", floor($"value").cast("long"), "hour")
        .assign("day" -> expr("unix_micros(day) div 1000000"))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.16 resample('1min'): minute truncation; same integer-only
    //     gate convention as op_resample_hour (epoch seconds, BIGINT
    //     aggregates, gap-group ffill).
    Q("op_resample_minute",
      """WITH m AS (
        |  SELECT user_id, date_trunc('minute', ts) AS day, COUNT(*) AS cnt,
        |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_val
        |  FROM events WHERE user_id < 2
        |  GROUP BY user_id, date_trunc('minute', ts)),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM m GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 MINUTE)) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.day, COALESCE(h.cnt, 0) AS cnt, h.sum_val
        |  FROM grid g LEFT JOIN m h ON g.user_id = h.user_id AND g.day = h.day),
        |gg AS (
        |  SELECT *, count(sum_val) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id, epoch_us(day) // 1000000 AS day, cnt, sum_val,
        |  CAST(max(sum_val) OVER (PARTITION BY user_id, grp) AS BIGINT)
        |    AS sum_ffill
        |FROM gg ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 2))
        .resampleCalendar("user_id", "ts", floor($"value").cast("long"), "minute")
        .assign("day" -> expr("unix_micros(day) div 1000000"))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.16 resample('15min'): epoch-aligned 900 s buckets via exact
    //     integer second arithmetic on both engines.
    Q("op_resample_15min",
      """WITH q AS (
        |  SELECT user_id,
        |         make_timestamp((((epoch_us(ts) // 1000000)
        |           - ((epoch_us(ts) // 1000000) % 900))) * 1000000) AS day,
        |         COUNT(*) AS cnt,
        |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_val
        |  FROM events WHERE user_id < 2
        |  GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM q GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 15 MINUTE)) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.day, COALESCE(q.cnt, 0) AS cnt, q.sum_val
        |  FROM grid g LEFT JOIN q ON g.user_id = q.user_id AND g.day = q.day),
        |gg AS (
        |  SELECT *, count(sum_val) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id, epoch_us(day) // 1000000 AS day, cnt, sum_val,
        |  CAST(max(sum_val) OVER (PARTITION BY user_id, grp) AS BIGINT)
        |    AS sum_ffill
        |FROM gg ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 2))
        .resampleCalendar("user_id", "ts", floor($"value").cast("long"), "15min")
        .assign("day" -> expr("unix_micros(day) div 1000000"))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.16 resample('1M'): month-end labels (pandas '1M' vs '1MS') —
    //     bucketing by calendar month, bucket label = the month's LAST
    //     day. Integer-only gate per the r8 convention (epoch-day label,
    //     BIGINT-cast aggregates — see op_resample).
    Q("op_resample_month_end",
      """WITH monthly AS (
        |  SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS m0,
        |         COUNT(*) AS cnt,
        |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_val
        |  FROM events WHERE user_id < 60
        |  GROUP BY user_id, CAST(date_trunc('month', ts) AS DATE)),
        |bounds AS (
        |  SELECT user_id, min(m0) AS d0, max(m0) AS d1
        |  FROM monthly GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 MONTH)) AS DATE)
        |      AS m0
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.m0, COALESCE(m.cnt, 0) AS cnt, m.sum_val
        |  FROM grid g LEFT JOIN monthly m
        |    ON g.user_id = m.user_id AND g.m0 = m.m0),
        |gg AS (
        |  SELECT *, count(sum_val) OVER (
        |    PARTITION BY user_id ORDER BY m0
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id,
        |  CAST(last_day(m0) - DATE '1970-01-01' AS BIGINT) AS day, cnt,
        |  sum_val,
        |  CAST(max(sum_val) OVER (PARTITION BY user_id, grp) AS BIGINT)
        |    AS sum_ffill
        |FROM gg ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 60))
        .resampleCalendar("user_id", "ts", floor($"value").cast("long"),
          "month_end")
        .assign("day" -> datediff(col("day"), lit("1970-01-01")).cast("long"))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.16 resample('1QS'): quarter-start grid (3-calendar-month
    //     steps, exact across unequal month lengths). Integer-only gate.
    Q("op_resample_quarter",
      """WITH q AS (
        |  SELECT user_id, CAST(date_trunc('quarter', ts) AS DATE) AS q0,
        |         COUNT(*) AS cnt,
        |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_val
        |  FROM events WHERE user_id < 60
        |  GROUP BY user_id, CAST(date_trunc('quarter', ts) AS DATE)),
        |bounds AS (
        |  SELECT user_id, min(q0) AS d0, max(q0) AS d1 FROM q GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 3 MONTH)) AS DATE)
        |      AS q0
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.q0, COALESCE(q.cnt, 0) AS cnt, q.sum_val
        |  FROM grid g LEFT JOIN q ON g.user_id = q.user_id AND g.q0 = q.q0),
        |gg AS (
        |  SELECT *, count(sum_val) OVER (
        |    PARTITION BY user_id ORDER BY q0
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id, CAST(q0 - DATE '1970-01-01' AS BIGINT) AS day, cnt,
        |  sum_val,
        |  CAST(max(sum_val) OVER (PARTITION BY user_id, grp) AS BIGINT)
        |    AS sum_ffill
        |FROM gg ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 60))
        .resampleCalendar("user_id", "ts", floor($"value").cast("long"),
          "quarter")
        .assign("day" -> datediff(col("day"), lit("1970-01-01")).cast("long"))
        .sortValues(Seq("user_id", "day"))
        .df
    },

    // --- §2.13 covariance matrix (pandas df.cov): one aggregate for all
    //     pairwise sample covariances; small-magnitude columns keep the
    //     round-6 tolerance far above engine summation noise.
    Q("op_cov_matrix",
      """WITH s AS (SELECT l_quantity AS q, l_discount AS d, l_tax AS t FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_quantity' AS col_b,
        |         round(covar_samp(q, q), 6) AS cov FROM s
        |  UNION ALL SELECT 'l_quantity', 'l_discount', round(covar_samp(q, d), 6) FROM s
        |  UNION ALL SELECT 'l_quantity', 'l_tax', round(covar_samp(q, t), 6) FROM s
        |  UNION ALL SELECT 'l_discount', 'l_discount', round(covar_samp(d, d), 6) FROM s
        |  UNION ALL SELECT 'l_discount', 'l_tax', round(covar_samp(d, t), 6) FROM s
        |  UNION ALL SELECT 'l_tax', 'l_tax', round(covar_samp(t, t), 6) FROM s) m
        |ORDER BY col_a, col_b""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem")
        .covMatrix(Seq("l_quantity", "l_discount", "l_tax"))
        .assign("cov" -> round(col("cov"), 6))
        .sortValues(Seq("col_a", "col_b"))
        .df
    },

    // --- §2.2 partitioned parquet sink round-trip: the engine writes
    //     hive-partitioned parquet (the layout a 100 TB corpus actually
    //     lives in), both engines read the same files back.
    Q("op_parquet_partitioned",
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM read_parquet('/root/repo/target/parquet_part/*/*.parquet',
        |                  hive_partitioning = true)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val out = "/root/repo/target/parquet_part"
      gt(spark, dir, "lineitem")
        .query("l_orderkey < 5000")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .toParquet(out, partitionBy = Seq("l_returnflag"))
      spark.read.parquet(out)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sumD(dec12(col("l_quantity"))).as("qty"))
        .orderBy(col("l_returnflag"))
    },

    // --- §2.7 rank(pct=True) + groupby.cumcount: pct rank is the exact
    //     rational rank/n (identical doubles on both engines), cumcount the
    //     0-based row_number over an explicit total order.
    Q("op_rank_pct",
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER wp AS DOUBLE)
        |    / CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS DOUBLE) AS pct_min,
        |  CAST(dense_rank() OVER wp AS DOUBLE)
        |    / CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS DOUBLE) AS pct_dense,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS cc
        |FROM orders WHERE o_custkey < 50
        |WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "orders")
        .query("o_custkey < 50")
        .rankPct("pct_min", Seq("o_custkey"), Seq($"o_totalprice"), "min")
        .rankPct("pct_dense", Seq("o_custkey"), Seq($"o_totalprice"), "dense")
        .groupby("o_custkey")
        .cumcount("cc", Seq("o_totalprice", "o_orderkey"))
        .select("o_custkey", "o_orderkey", "pct_min", "pct_dense", "cc")
        .sortValues(Seq("o_custkey", "o_orderkey"))
        .df
    },

    // --- §2.10 dropna(thresh=): keep rows with >= 2 non-null values among
    //     three modulo-nulled columns — Spark na.drop(minNonNulls).
    Q("op_dropna_thresh",
      """SELECT o_orderkey, a, b, c FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_totalprice END AS a,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS b,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS c
        |  FROM orders WHERE o_orderkey < 3000) t
        |WHERE (CASE WHEN a IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN b IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) >= 2
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(t(spark, dir, "orders").filter($"o_orderkey" < 3000)
        .select($"o_orderkey",
          when($"o_orderkey" % 2 === 0, lit(null).cast("double"))
            .otherwise($"o_totalprice").as("a"),
          when($"o_orderkey" % 3 === 0, lit(null).cast("long"))
            .otherwise($"o_custkey").as("b"),
          when($"o_orderkey" % 5 === 0, lit(null).cast("string"))
            .otherwise($"o_orderpriority").as("c")))
        .dropnaThresh(2, Seq("a", "b", "c"))
        .sortValues(Seq("o_orderkey"))
        .df
    },

    // --- §2.9 duplicated(keep='last' / keep=False): reverse-order
    //     row_number and a count window over one partitioning.
    Q("op_duplicated_keep",
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) > 1 AS dup_last,
        |  COUNT(*) OVER (PARTITION BY o_custkey) > 1 AS dup_any
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_custkey < 100")
        .duplicatedKeep(Seq("o_custkey"), "o_orderkey", "last")
        .rename("duplicated" -> "dup_last")
        .duplicatedKeep(Seq("o_custkey"), "o_orderkey", "none")
        .rename("duplicated" -> "dup_any")
        .select("o_custkey", "o_orderkey", "dup_last", "dup_any")
        .sortValues(Seq("o_custkey", "o_orderkey"))
        .df
    },

    // --- §2.1/§2.2 JSON-lines round-trip: the engine writes JSON, both
    //     engines read the same files back (pandas to_json/read_json
    //     lines=True).
    Q("op_json_roundtrip",
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        |  min(n_name) AS first_nation
        |FROM read_json('/root/repo/target/json_rt/*.json')
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (spark, dir) =>
      val out = "/root/repo/target/json_rt"
      gt(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .toJson(out, singleFile = true)
      graft.api.GraftSession(spark).readJson(out)
        .astype("n_regionkey" -> "long")
        .groupby("n_regionkey")
        .agg(("n_nations", "count", "n_regionkey"), ("first_nation", "min", "n_name"))
        .sortValues(Seq("n_regionkey"))
        .df
    },

    // --- §2.13 winsorize: per-group clip at exact interpolated
    //     [p05, p95] quantiles (Spark percentile ≡ DuckDB quantile_cont,
    //     the op_describe contract), cutoffs rounded to 6 decimals so
    //     boundary assignment is engine-reproducible.
    Q("op_winsorize",
      """WITH f AS (SELECT * FROM lineitem WHERE l_orderkey < 2000),
        |q AS (
        |  SELECT l_returnflag,
        |         round(quantile_cont(l_quantity, 0.05), 6) AS lo,
        |         round(quantile_cont(l_quantity, 0.95), 6) AS hi
        |  FROM f GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, f.l_returnflag, l_quantity,
        |       least(greatest(l_quantity, lo), hi) AS q_wins
        |FROM f JOIN q ON f.l_returnflag = q.l_returnflag
        |ORDER BY l_orderkey, l_linenumber, l_quantity, f.l_returnflag""".stripMargin) { (spark, dir) =>
      // the fixture duplicates (l_orderkey, l_linenumber, l_quantity) with
      // differing l_returnflag — it must join the sort for a total order
      gt(spark, dir, "lineitem")
        .query("l_orderkey < 2000")
        .winsorize("l_quantity", "q_wins", 0.05, 0.95, by = Seq("l_returnflag"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "q_wins")
        .sortValues(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
        .df
    }
  )
}
