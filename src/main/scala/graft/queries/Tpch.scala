package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import QHelpers._

/** TPC-H-ish 22-query suite over the driver's fixture star schema.
  *
  * Mirrors the reference's hand-written dataframe TPC-H corpus
  * (reference: benchmarks/tpch/run_queries.py:110-975), adapted to the
  * slimmed fixture schema (FIXTURES.md): no `partsupp` table, no
  * commitdate/receiptdate/shipmode/container columns — queries needing them
  * are re-targeted at available columns while keeping the same relational
  * shape (joins, correlated subqueries, exists/not-exists, having, top-k).
  *
  * Scale notes (100 TB stance): every query is pure declarative DataFrame
  * API — scans prune columns and push filters into parquet, small dims
  * (region/nation/part/supplier thresholds) broadcast automatically or via
  * explicit `broadcast()`, aggregation is partial+final hash agg, and AQE
  * handles skew/coalescing. No driver-side collects anywhere.
  */
object Tpch {

  private val dp = sqlDiscPrice()

  // r18 note: an explicit two-pass stat.bloomFilter prefilter helper was
  // built and MEASURED here (VERDICT r17 items 3/4) and removed again —
  // the fit's extra keys-side aggregation pass made q18 2× and q21 2.7×
  // slower at x1000. The shipped q18 fix is the AQE-adaptive broadcast
  // semi below (no extra pass, no scale gate); full numbers in
  // OPTIMIZATION_r18.md.

  val all: Vector[Q] = Vector(
    // ---------------------------------------------------------------- q01
    Q("q01",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($dp) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($dp * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         |  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val disc = discPrice($"l_extendedprice", $"l_discount")
      val charge = disc * (oneDec + dec3($"l_tax"))
      li.filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumD(dec12($"l_quantity")).as("sum_qty"),
          sumD(dec12($"l_extendedprice")).as("sum_base_price"),
          sumD(disc).as("sum_disc_price"),
          sumD(charge).as("sum_charge"),
          (sumD(dec12($"l_quantity")) / count(lit(1))).as("avg_qty"),
          (sumD(dec12($"l_extendedprice")) / count(lit(1))).as("avg_price"),
          (sumD(dec3($"l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---------------------------------------------------------------- q02
    // Adapted (no partsupp): per-region best-balance supplier via a
    // correlated max subquery, same join/correlation shape as TPC-H q2.
    Q("q02",
      """SELECT s_name, n_name, r_name, s_acctbal
        |FROM supplier, nation, region
        |WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2, nation n2
        |                   WHERE s2.s_nationkey = n2.n_nationkey
        |                     AND n2.n_regionkey = r_regionkey)
        |ORDER BY r_name, s_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sup = t(spark, dir, "supplier")
      val nat = t(spark, dir, "nation")
      val reg = t(spark, dir, "region")
      val joined = sup
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      val best = joined.groupBy($"r_regionkey".as("mr_regionkey"))
        .agg(max($"s_acctbal").as("max_bal"))
      joined
        .join(broadcast(best),
          $"r_regionkey" === $"mr_regionkey" && $"s_acctbal" === $"max_bal")
        .select($"s_name", $"n_name", $"r_name", $"s_acctbal")
        .orderBy($"r_name", $"s_name")
    },

    // ---------------------------------------------------------------- q03
    Q("q03",
      s"""SELECT l_orderkey,
         |  CAST(SUM($dp) AS DOUBLE) AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate  > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cust = t(spark, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = t(spark, dir, "orders")
        .filter($"o_orderdate" < to_timestamp(lit("1998-03-15")))
      val li = t(spark, dir, "lineitem")
        .filter($"l_shipdate" > to_timestamp(lit("1998-03-15")))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sumD(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
        .select($"l_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
        .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
        .limit(10)
    },

    // ---------------------------------------------------------------- q04
    // Adapted: "late line" = shipped more than 90 days after order date
    // (fixture has no commitdate/receiptdate).
    Q("q04",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate <  TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ord = t(spark, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1997-07-01")) &&
          $"o_orderdate" < to_timestamp(lit("1997-10-01")))
      val li = t(spark, dir, "lineitem")
      ord.join(li,
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },

    // ---------------------------------------------------------------- q05
    Q("q05",
      s"""SELECT n_name, CAST(SUM($dp) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ord = t(spark, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
          $"o_orderdate" < to_timestamp(lit("1997-01-01")))
      val reg = t(spark, dir, "region").filter($"r_name" === "ASIA")
      val nat = t(spark, dir, "nation")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      t(spark, dir, "lineitem")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(t(spark, dir, "customer"),
          $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sumD(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // ---------------------------------------------------------------- q06
    Q("q06",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04
        |  AND l_quantity < 24""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01")) &&
          $"l_discount" >= 0.02 && $"l_discount" <= 0.04 && $"l_quantity" < 24)
        .agg(sumD(dec12($"l_extendedprice") * dec3($"l_discount")).as("revenue"))
    },

    // ---------------------------------------------------------------- q07
    Q("q07",
      s"""SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(year(l_shipdate) AS BIGINT) AS l_year, $dp AS volume
         |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <= TIMESTAMP '1997-12-31'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // derivable per-side prefilters (r12 VERDICT #5): the pair-OR
      // implies n_name ∈ {N1, N2} on EACH leg — Catalyst cannot infer
      // a per-side predicate through the OR, so state it here and the
      // broadcast joins prune supplier/customer rows to 2/25 of nations
      // BEFORE the fact side flows; the pair-OR below stays the final
      // (and only semantic) filter.
      val pairNations = Seq("NATION_1", "NATION_2")
      val n1 = t(spark, dir, "nation")
        .filter($"n_name".isin(pairNations: _*))
        .select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
      val n2 = t(spark, dir, "nation")
        .filter($"n_name".isin(pairNations: _*))
        .select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"))
      // dims pruned FIRST: supplier⋈n1 and customer⋈n2 shrink to 2/25
      // of nations before any fact row moves, so the fact-side joins
      // shuffle (or broadcast) the pruned dims, not the full tables
      val supp = t(spark, dir, "supplier")
        .join(broadcast(n1), $"s_nationkey" === $"n1_key")
        .select($"s_suppkey", $"supp_nation")
      val cust = t(spark, dir, "customer")
        .join(broadcast(n2), $"c_nationkey" === $"n2_key")
        .select($"c_custkey", $"cust_nation")
      // join order: the pruned supplier side FIRST (r17 optimization round,
      // guide §2.3/§3.1 — selectivity before bulk). supp keeps 2/25 of
      // suppliers, so joining it before orders cuts the fact rows flowing
      // into the orders and customer joins ~12.5×; the old order shuffled
      // the full date-filtered lineitem through BOTH of those joins. Inner
      // joins commute, so results are identical.
      t(spark, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
          $"l_shipdate" <= to_timestamp(lit("1997-12-31")))
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
          ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
        .withColumn("l_year", year($"l_shipdate").cast("long"))
        .groupBy($"supp_nation", $"cust_nation", $"l_year")
        .agg(sumD(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },

    // ---------------------------------------------------------------- q08
    Q("q08",
      s"""SELECT o_year,
         |  CAST(SUM(volume) FILTER (WHERE nation = 'NATION_3') AS DOUBLE)
         |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $dp AS volume,
         |         n2.n_name AS nation
         |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
         |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
         |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
         |    AND o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate <= TIMESTAMP '1996-12-31'
         |    AND p_type = 'ECONOMY'
         |) all_nations
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val part = t(spark, dir, "part").filter($"p_type" === "ECONOMY")
      val reg = t(spark, dir, "region").filter($"r_name" === "AMERICA")
      val n1 = t(spark, dir, "nation").select($"n_nationkey".as("n1_key"), $"n_regionkey")
      val n2 = t(spark, dir, "nation").select($"n_nationkey".as("n2_key"), $"n_name".as("nation"))
      t(spark, dir, "lineitem")
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .join(t(spark, dir, "orders")
            .filter($"o_orderdate" >= to_timestamp(lit("1995-01-01")) &&
              $"o_orderdate" <= to_timestamp(lit("1996-12-31"))),
          $"l_orderkey" === $"o_orderkey")
        .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(n1), $"c_nationkey" === $"n1_key")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(n2), $"s_nationkey" === $"n2_key")
        .withColumn("o_year", year($"o_orderdate").cast("long"))
        .withColumn("volume", discPrice($"l_extendedprice", $"l_discount"))
        .groupBy($"o_year")
        .agg((sum(when($"nation" === "NATION_3", $"volume")).cast("double") /
          sum($"volume").cast("double")).as("mkt_share"))
        .orderBy($"o_year")
    },

    // ---------------------------------------------------------------- q09
    // Adapted: profit = disc price only (no partsupp supplycost in fixture).
    Q("q09",
      s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |         $dp AS amount
         |  FROM part, supplier, lineitem, orders, nation
         |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
         |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%bolt%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val part = t(spark, dir, "part").filter($"p_name".like("%bolt%"))
      t(spark, dir, "lineitem")
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .withColumn("o_year", year($"o_orderdate").cast("long"))
        .groupBy($"n_name".as("nation"), $"o_year")
        .agg(sumD(discPrice($"l_extendedprice", $"l_discount")).as("sum_profit"))
        .orderBy($"nation", $"o_year".desc)
    },

    // ---------------------------------------------------------------- q10
    Q("q10",
      s"""SELECT c_custkey, c_name, CAST(SUM($dp) AS DOUBLE) AS revenue,
         |       c_acctbal, n_name, c_mktsegment
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= TIMESTAMP '1996-10-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ord = t(spark, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-10-01")) &&
          $"o_orderdate" < to_timestamp(lit("1997-01-01")))
      t(spark, dir, "lineitem").filter($"l_returnflag" === "R")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name", $"c_mktsegment")
        .agg(sumD(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
        .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name", $"c_mktsegment")
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },

    // ---------------------------------------------------------------- q11
    // Adapted (no partsupp): nations holding an outsized share of supplier
    // account balance — same scalar-subquery HAVING shape as TPC-H q11.
    Q("q11",
      """SELECT n_name, CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM supplier, nation
        |WHERE s_nationkey = n_nationkey
        |GROUP BY n_name
        |HAVING CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) >
        |  (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) * 0.03 FROM supplier)
        |ORDER BY total_bal DESC, n_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sup = t(spark, dir, "supplier")
      val threshold = sup.agg((sumD(dec12($"s_acctbal")) * lit(0.03)).as("thresh"))
      sup.join(broadcast(t(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sumD(dec12($"s_acctbal")).as("total_bal"))
        .join(broadcast(threshold))
        .filter($"total_bal" > $"thresh")
        .select($"n_name", $"total_bal")
        .orderBy($"total_bal".desc, $"n_name")
    },

    // ---------------------------------------------------------------- q12
    // Adapted: shipmode → order priority classes over 1997 shipments.
    Q("q12",
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_line_count,
        |  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      t(spark, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1998-01-01")))
        .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          count(when(hi, lit(1))).as("high_line_count"),
          count(when(!hi, lit(1))).as("low_line_count"))
        .orderBy($"l_returnflag")
    },

    // ---------------------------------------------------------------- q13
    Q("q13",
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ord = t(spark, dir, "orders").filter($"o_orderpriority" =!= "5-LOW")
      t(spark, dir, "customer")
        .join(ord, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },

    // ---------------------------------------------------------------- q14
    Q("q14",
      s"""SELECT CAST(SUM($dp) FILTER (WHERE p_type = 'PROMO') AS DOUBLE) * 100
         |  / CAST(SUM($dp) AS DOUBLE) AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate <  TIMESTAMP '1997-10-01'""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val vol = discPrice($"l_extendedprice", $"l_discount")
      t(spark, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1997-09-01")) &&
          $"l_shipdate" < to_timestamp(lit("1997-10-01")))
        .join(broadcast(t(spark, dir, "part")), $"l_partkey" === $"p_partkey")
        .agg((sum(when($"p_type" === "PROMO", vol)).cast("double") * lit(100) /
          sum(vol).cast("double")).as("promo_revenue"))
    },

    // ---------------------------------------------------------------- q15
    Q("q15",
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no, CAST(SUM($dp) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate <  TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier, revenue
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val rev = t(spark, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1997-04-01")))
        .groupBy($"l_suppkey")
        .agg(sumD(discPrice($"l_extendedprice", $"l_discount")).as("total_revenue"))
      val maxRev = rev.agg(max($"total_revenue").as("max_rev"))
      t(spark, dir, "supplier")
        .join(rev, $"s_suppkey" === $"l_suppkey")
        .join(broadcast(maxRev), $"total_revenue" === $"max_rev")
        .select($"s_suppkey", $"s_name", $"total_revenue")
        .orderBy($"s_suppkey")
    },

    // ---------------------------------------------------------------- q16
    // Adapted: part/supplier relationship bridged through lineitem
    // (fixture has no partsupp).
    Q("q16",
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val part = t(spark, dir, "part")
        .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
          $"p_size".isin(1, 5, 9, 15, 20, 25, 30, 35))
      t(spark, dir, "lineitem")
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },

    // ---------------------------------------------------------------- q17
    Q("q17",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_size < 25
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val part = t(spark, dir, "part").filter($"p_brand" === "Brand#3" && $"p_size" < 25)
      // avg(l_quantity) is exact on both engines: integer-valued doubles sum
      // without rounding error in any order, so the 0.2*avg threshold is
      // bit-identical to DuckDB's correlated subquery.
      // r17 optimization round (guide §2.3 — aggregate/filter before the
      // shuffle): only partkeys surviving the part filter are ever joined,
      // and the avg is per-partkey, so semi-joining the aggregation INPUT
      // against the filtered part set first shuffles only matching lines
      // into the partkey aggregation. Per-partkey averages are unchanged.
      val avgQty = li
        .join(broadcast(part.select($"p_partkey".as("ap_partkey"))),
          $"l_partkey" === $"ap_partkey", "left_semi")
        .groupBy($"l_partkey".as("a_partkey"))
        .agg(avg($"l_quantity").as("avg_qty"))
      li.join(broadcast(part), $"l_partkey" === $"p_partkey")
        .join(avgQty, $"l_partkey" === $"a_partkey")
        .filter($"l_quantity" < lit(0.2) * $"avg_qty")
        .agg((sumD(dec12($"l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },

    // ---------------------------------------------------------------- q18
    Q("q18",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      // r18 (guide §2.3 — don't recompute what an earlier aggregate already
      // holds; VERDICT r17 item 3): the old plan re-joined the FULL
      // lineitem to sum l_quantity per group, but every group key contains
      // o_orderkey (unique in orders; one customer per order via the
      // c_custkey FK), so each output group IS one big order and its
      // sum_qty IS the tot_qty the bigOrders aggregate already computed
      // before its HAVING filter. Keeping tot_qty and joining orders
      // INNER against it (equal to the old semi + li-rejoin: bigOrders
      // keys are unique, and an orphan li orderkey contributes to neither
      // side) removes the whole li⋈orders SMJ and the wide final
      // aggregation. l_quantity holds small integers, so the double sum
      // is exact and order-free — bit-identical to the oracle's per-group
      // SUM. (Bloom/semi PREFILTERS of the li re-join were tried first
      // and measured WORSE at x1000 — 130 s / 72.6 s vs 68 s — because
      // sum(qty)>150 keeps 19.7% of this fixture's orders, far over
      // broadcast size; eliminating the re-join beats pruning it.)
      // x1000: 68.0 → see OPTIMIZATION_r18.md (spill → 0).
      val bigOrders = li.groupBy($"l_orderkey".as("b_orderkey"))
        .agg(sum($"l_quantity").as("tot_qty"))
        .filter($"tot_qty" > 150)
      t(spark, dir, "orders")
        .join(bigOrders.hint("shuffle_hash"), $"o_orderkey" === $"b_orderkey")
        .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"tot_qty".cast("double").as("sum_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
        .limit(100)
    },

    // ---------------------------------------------------------------- q19
    // Adapted: brand/size/quantity bands (fixture has no container/shipmode).
    Q("q19",
      s"""SELECT CAST(SUM($dp) AS DOUBLE) AS revenue
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND (
         |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#4" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30)))
        .agg(sumD(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
    },

    // ---------------------------------------------------------------- q20
    // Adapted: suppliers that moved >50 units of 'small*' parts in 1997
    // (lineitem bridges part↔supplier; fixture has no partsupp).
    Q("q20",
      """SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem, part
        |  WHERE p_partkey = l_partkey AND p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey HAVING SUM(l_quantity) > 50)
        |ORDER BY s_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val part = t(spark, dir, "part").filter($"p_name".like("small%"))
      val active = t(spark, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1998-01-01")))
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey")
        .agg(sum($"l_quantity").as("qty"))
        .filter($"qty" > 50)
        .select($"l_suppkey")
      t(spark, dir, "supplier")
        .join(active, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_name", $"s_acctbal")
        .orderBy($"s_name")
    },

    // ---------------------------------------------------------------- q21
    // Adapted: in finished multi-supplier orders, suppliers whose lines were
    // the only returned ('A') ones — same exists/not-exists shape as q21.
    Q("q21",
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'A'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'A')
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val l1 = li.filter($"l_returnflag" === "A")
      // r17 optimization round: the EXISTS/NOT-EXISTS pair collapses into
      // ONE per-order min/max aggregate (guide §2.3 — aggregate before you
      // shuffle; the l2 semi + l3 anti joins each re-shuffled a full
      // lineitem projection by orderkey). For an l1 row (flag 'A', suppkey
      // s), with suppkeys non-null:
      //   EXISTS l2 with l2_suppkey <> s        ⇔ min(suppkey) <> max(suppkey)
      //   NOT EXISTS l3 ('A', l3_suppkey <> s)  ⇔ min('A' suppkey) = max('A' suppkey)
      // (the l1 row itself is an 'A' row of the order, so a single distinct
      // 'A' suppkey must be s). min/max — not countDistinct — keeps the
      // aggregate Expand-free and fully partial-aggregatable: the map side
      // collapses each order to four longs before the exchange, and the
      // left-semi probe joins on the same orderkey partitioning the orders
      // join already established.
      val ordStats = li
        .groupBy($"l_orderkey".as("os_orderkey"))
        .agg(
          min($"l_suppkey").as("min_supp"),
          max($"l_suppkey").as("max_supp"),
          min(when($"l_returnflag" === "A", $"l_suppkey")).as("min_supp_a"),
          max(when($"l_returnflag" === "A", $"l_suppkey")).as("max_supp_a"))
        .filter($"min_supp" =!= $"max_supp" && $"min_supp_a" === $"max_supp_a")
        .select($"os_orderkey")
      val nat = t(spark, dir, "nation").filter($"n_name" === "NATION_5")
      // r18 (guide §3.1/§2.4, VERDICT r17 item 4): the x1000 sort spill
      // (44.6 GB mem / 8.4 GB disk) was the l1⋈orders SMJ sorting the
      // full 'A'-flag stream — yet NO orders column is consumed (orders
      // only contributes the 'F' restriction, and o_orderkey is unique,
      // so the inner join ≡ a semi). Fold both probes into ONE key-only
      // left-semi: qualifying = ordStats ∩ F-order keys (a narrow
      // keys-vs-keys join), then l1 semi-probes it through a SHUFFLE_HASH
      // build (the keys side is a few longs per partition) so l1 is
      // hash-exchanged but never SORTED — the spill source is gone, not
      // just pruned. (A Bloom/semi PREFILTER of l1 was tried first and
      // measured 2.7× WORSE at x1000 — weak key selectivity ~50% plus a
      // duplicated ordStats aggregation; see OPTIMIZATION_r18.md.)
      val fKeys = t(spark, dir, "orders")
        .filter($"o_orderstatus" === "F").select($"o_orderkey")
      l1.join(fKeys.hint("shuffle_hash"),
          $"l_orderkey" === $"o_orderkey", "left_semi")
        .join(ordStats.hint("shuffle_hash"),
          $"os_orderkey" === $"l_orderkey", "left_semi")
        .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(100)
    },

    // ---------------------------------------------------------------- q22
    // Adapted: phone country code → nationkey bucket; above-average balance
    // customers with no orders.
    Q("q22",
      """SELECT cntrycode, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM (
        |  SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
        |    AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |                     FROM customer
        |                     WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11))
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderpriority = '1-URGENT')
        |) custsale
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cust = t(spark, dir, "customer")
      val inSet = $"c_nationkey".isin(1, 3, 5, 7, 9, 11)
      val thresh = cust.filter($"c_acctbal" > 0.0 && inSet)
        .agg((sumD(dec12($"c_acctbal")) / count(lit(1))).as("avg_bal"))
      cust.filter(inSet)
        .join(broadcast(thresh))
        .filter($"c_acctbal" > $"avg_bal")
        .join(t(spark, dir, "orders").filter($"o_orderpriority" === "1-URGENT"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .withColumn("cntrycode", ($"c_nationkey" % 5).cast("int"))
        .groupBy($"cntrycode")
        .agg(count(lit(1)).as("numcust"), sumD(dec12($"c_acctbal")).as("totacctbal"))
        .orderBy($"cntrycode")
    }
  )
}
