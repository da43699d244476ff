package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.functions.aggregates

/** Coverage queries for the remaining small SURVEY §2 operators: all/any,
  * cumulative product/min/max, describe, map(dict), stack, monotonic check,
  * histogram, transpose, csv round-trip, weighted sampling. All routed
  * through the fluent API where it exists.
  */
object OpsExtra {

  /** Unique memory-sink names for the streaming-parity queries (Verify
    * may build the same query more than once in one JVM). */
  private[graft] object StreamParity {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import java.nio.charset.StandardCharsets.UTF_8

    private val c = new java.util.concurrent.atomic.AtomicLong(0L)
    def next(): Long = c.incrementAndGet()

    /** Micro-batches every parity query must observe (one per staged
      * range file — see [[stage]]). */
    val Parts = 3

    /** The file stream source lists a DIRECTORY — stage the (read-only)
      * fixture file into one under target/, keyed by SF dir + table.
      *
      * r9: the fixture is split into [[Parts]] RANGE files on `orderCol`
      * (ascending across both file names and mtimes), so a
      * `maxFilesPerTrigger=1` stream replays it as [[Parts]] deterministic
      * micro-batches in key order — keyed state (first-seen dedup, bucket
      * ownership) now crosses real batch boundaries instead of the r8
      * one-file-one-batch shape, while the first-seen = min-key rules stay
      * oracle-able (earlier batches hold strictly smaller keys, and
      * event-time batches arrive in ts order so a 0-second watermark never
      * drops a row). Restages whenever the source file's size OR mtime
      * changes (r8 compared size only — a regenerated same-size fixture
      * would have served stale data, ADVICE r8). */
    def stage(spark: org.apache.spark.sql.SparkSession, dir: String,
        table: String, orderCol: String): Path = {
      val srcPath = Paths.get(s"$dir/$table.parquet")
      // cwd-derived (ADVICE r13): the gate must work from any checkout
      val stageDir = Paths.get("target/stream_src").toAbsolutePath
        .resolve(srcPath.getParent.getFileName.toString).resolve(table)
      val marker = stageDir.resolve("_staged.marker")
      val stamp = s"${Files.size(srcPath)}:" +
        s"${Files.getLastModifiedTime(srcPath).toMillis}:$Parts:$orderCol:v2"
      if (Files.exists(marker) &&
          new String(Files.readAllBytes(marker), UTF_8) == stamp)
        return stageDir
      this.synchronized {
        // re-check under the lock (ADVICE r9): a thread that raced past
        // the fast path must not wipe files a winner just staged (and a
        // concurrently built streaming query may already be reading)
        if (Files.exists(marker) &&
            new String(Files.readAllBytes(marker), UTF_8) == stamp)
          return stageDir
        val tmp = stageDir.resolveSibling(s"$table.__tmp")
        def wipe(p: Path): Unit = if (Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          Files.walk(p).iterator().asScala.toVector.reverse
            .foreach(Files.deleteIfExists(_))
        }
        wipe(stageDir); wipe(tmp)
        // events.ts can be TIMESTAMP(NANOS) parquet — read as int64 nanos
        // (still range-orderable); the parity queries re-normalize from the
        // staged schema exactly as Tables.load does. Scoped set/restore
        // (ADVICE r9): the flip must not leak into unrelated reads.
        val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
        val prevNanos = spark.conf.getOption(nanosKey)
        spark.conf.set(nanosKey, "true")
        try {
          spark.read.parquet(srcPath.toString)
            .repartitionByRange(Parts, org.apache.spark.sql.functions.col(orderCol))
            .write.mode("overwrite").parquet(tmp.toString)
        } finally prevNanos match {
          case Some(v) => spark.conf.set(nanosKey, v)
          case None => spark.conf.unset(nanosKey)
        }
        import scala.jdk.CollectionConverters._
        val partFiles = Files.list(tmp).iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-"))
          .toVector.sortBy(_.getFileName.toString)
        require(partFiles.size == Parts,
          s"staging $table: expected $Parts range files, got ${partFiles.size}")
        Files.createDirectories(stageDir)
        val base = Files.getLastModifiedTime(srcPath).toMillis
        partFiles.zipWithIndex.foreach { case (p, i) =>
          val dest = stageDir.resolve(f"$i%03d.parquet")
          Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
          // strictly ascending mtimes: the file source orders by timestamp,
          // so batch order == range order, deterministically
          Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
        }
        wipe(tmp)
        Files.write(marker, stamp.getBytes(UTF_8))
      }
      stageDir
    }

    /** Fixed-boundary variant of [[stage]] (r13): splits at EXPLICIT
      * `orderCol` bounds instead of repartitionByRange's SAMPLED ones.
      * Needed by parity oracles whose kept sets depend on the exact
      * batch MEMBERSHIP (the self-maintaining dedup loop) — sampled
      * boundaries are fine for min-key rules but not SQL-replayable.
      * Ranges: (−∞, b₀), [b₀, b₁), …, [b_last, ∞). */
    def stageFixed(spark: org.apache.spark.sql.SparkSession, dir: String,
        table: String, orderCol: String, bounds: Seq[Long]): Path = {
      import org.apache.spark.sql.functions.col
      val srcPath = Paths.get(s"$dir/$table.parquet")
      val stageDir = Paths.get("target/stream_src_fixed").toAbsolutePath
        .resolve(srcPath.getParent.getFileName.toString).resolve(table)
      val marker = stageDir.resolve("_staged.marker")
      val stamp = s"${Files.size(srcPath)}:" +
        s"${Files.getLastModifiedTime(srcPath).toMillis}:" +
        s"${bounds.mkString("_")}:$orderCol:v1"
      if (Files.exists(marker) &&
          new String(Files.readAllBytes(marker), UTF_8) == stamp)
        return stageDir
      this.synchronized {
        if (Files.exists(marker) &&
            new String(Files.readAllBytes(marker), UTF_8) == stamp)
          return stageDir
        def wipe(p: Path): Unit = if (Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          Files.walk(p).iterator().asScala.toVector.reverse
            .foreach(Files.deleteIfExists(_))
        }
        wipe(stageDir)
        Files.createDirectories(stageDir)
        val df = spark.read.parquet(srcPath.toString)
        val cuts = (None +: bounds.map(Option(_))) :+ None
        val ranges = cuts.sliding(2).map { case Seq(lo, hi) => (lo, hi) }.toSeq
        val base = Files.getLastModifiedTime(srcPath).toMillis
        ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
          val part = df
            .filter(lo.map(b => col(orderCol) >= b)
              .getOrElse(org.apache.spark.sql.functions.lit(true)))
            .filter(hi.map(b => col(orderCol) < b)
              .getOrElse(org.apache.spark.sql.functions.lit(true)))
          val tmp = stageDir.resolveSibling(s"${table}_fixed__tmp$i")
          wipe(tmp)
          part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          import scala.jdk.CollectionConverters._
          val pf = Files.list(tmp).iterator().asScala
            .find(_.getFileName.toString.startsWith("part-"))
            .getOrElse(sys.error(s"stageFixed: no part file for range $i"))
          val dest = stageDir.resolve(f"$i%03d.parquet")
          Files.move(pf, dest, StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
          wipe(tmp)
        }
        Files.write(marker, stamp.getBytes(UTF_8))
      }
      stageDir
    }

    /** Assert the parity query actually ran as multiple micro-batches
      * (one per staged file; an extra empty trigger at the end is fine). */
    def assertMultiBatch(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val nb = q.recentProgress.count(_.numInputRows > 0)
      require(nb >= Parts,
        s"streaming parity expected >= $Parts non-empty micro-batches " +
          s"(maxFilesPerTrigger=1 over the staged range files), got $nb")
    }
  }

  /** Dialect-neutral ANSI SQL executed verbatim by both engines. */
  val sqlSurfaceQuery: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |       min(o_orderkey) AS first_key
      |FROM orders
      |WHERE o_custkey < 500
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin


  /** Shared categorical-choice parameters (Spark + oracle sides). */
  val choiceLabels: Seq[String] = Seq("bronze", "silver", "gold", "platinum")
  val choiceP: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4)

  val all: Vector[Q] = Vector(

    // --- §2.5 all/any reductions (reference reduction/all.py:30, any.py:30)
    Q("op_all_any",
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 5) AS all_gt5,
        |  bool_or(l_discount > 0.09) AS any_hidisc,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem")
        .eval("gt5", "l_quantity > 5")
        .eval("hidisc", "l_discount > 0.09")
        .groupby("l_returnflag")
        .agg(("all_gt5", "all", "gt5"), ("any_hidisc", "any", "hidisc"),
          ("cnt", "count", "l_returnflag"))
        .sortValues(Seq("l_returnflag"))
        .df
    },

    // --- §2.5 cumprod/cummin/cummax (reference reduction/cum*.py:21);
    //     product is the custom Aggregator windowed — DuckDB's product()
    //     window fn multiplies in the same row order, so doubles match
    Q("op_cumprod_minmax",
      """SELECT l_orderkey, l_linenumber,
        |  round(product(1.0 + l_discount) OVER w, 8) AS disc_cumprod,
        |  min(l_quantity) OVER w AS qty_cummin,
        |  max(l_quantity) OVER w AS qty_cummax
        |FROM lineitem WHERE l_orderkey < 30
        |WINDOW w AS (PARTITION BY l_orderkey
        |             ORDER BY l_linenumber, l_quantity, l_discount
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Windows
      val w = Windows.expanding(Windows.spec(Seq("l_orderkey"),
        Seq("l_linenumber", "l_quantity", "l_discount")))
      t(spark, dir, "lineitem").filter($"l_orderkey" < 30)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
          round(aggregates.product(lit(1.0) + $"l_discount").over(w), 8).as("disc_cumprod"),
          Windows.cummin($"l_quantity", Windows.spec(Seq("l_orderkey"),
            Seq("l_linenumber", "l_quantity", "l_discount"))).as("qty_cummin"),
          Windows.cummax($"l_quantity", Windows.spec(Seq("l_orderkey"),
            Seq("l_linenumber", "l_quantity", "l_discount"))).as("qty_cummax"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
        .drop("l_quantity", "l_discount")
    },

    // --- §2.5 describe (reference base/describe.py:34)
    Q("op_describe",
      """SELECT CAST(COUNT(l_quantity) AS DOUBLE) AS l_quantity_count,
        |  round(avg(l_quantity), 6) AS l_quantity_mean,
        |  round(stddev_samp(l_quantity), 6) AS l_quantity_std,
        |  CAST(min(l_quantity) AS DOUBLE) AS l_quantity_min,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS l_quantity_p25,
        |  round(quantile_cont(l_quantity, 0.50), 6) AS l_quantity_p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS l_quantity_p75,
        |  CAST(max(l_quantity) AS DOUBLE) AS l_quantity_max
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      val d = gt(spark, dir, "lineitem").describe(Seq("l_quantity"))
      d.assign(
        "l_quantity_mean" -> round(d("l_quantity_mean"), 6),
        "l_quantity_std" -> round(d("l_quantity_std"), 6),
        "l_quantity_p25" -> round(d("l_quantity_p25"), 6),
        "l_quantity_p50" -> round(d("l_quantity_p50"), 6),
        "l_quantity_p75" -> round(d("l_quantity_p75"), 6))
        .df
    },

    // --- §2.10 map(dict) (reference base/map.py:32)
    Q("op_map_dict",
      """SELECT seg_code, COUNT(*) AS cnt FROM (
        |  SELECT CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'auto'
        |                           WHEN 'BUILDING' THEN 'bld'
        |                           WHEN 'MACHINERY' THEN 'mach'
        |                           ELSE 'other' END AS seg_code
        |  FROM customer) m
        |GROUP BY seg_code ORDER BY seg_code""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .mapValues("c_mktsegment", "seg_code",
          Map("AUTOMOBILE" -> "auto", "BUILDING" -> "bld", "MACHINERY" -> "mach"),
          default = Some("other"))
        .groupby("seg_code")
        .agg(("cnt", "count", "seg_code"))
        .sortValues(Seq("seg_code"))
        .df
    },

    // --- §2.10 stack: wide columns → (variable, value) rows (reference
    //     base/stack.py:29 — same reshape as melt with the key kept)
    Q("op_stack",
      """SELECT n_nationkey, var, val FROM (
        |  SELECT n_nationkey, 'n_name' AS var, n_name AS val FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'region_str', CAST(n_regionkey AS VARCHAR) FROM nation
        |) s ORDER BY n_nationkey, var""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "nation")
        .eval("region_str", "CAST(n_regionkey AS STRING)")
        .melt(Seq("n_nationkey"), Seq("n_name", "region_str"), "var", "val")
        .sortValues(Seq("n_nationkey", "var"))
        .df
    },

    // --- §2.10 check_monotonic (reference base/check_monotonic.py)
    Q("op_monotonic",
      """SELECT bool_and(up) AS increasing, bool_and(dn) AS decreasing FROM (
        |  SELECT COALESCE(o_totalprice >= lag(o_totalprice) OVER w, TRUE) AS up,
        |         COALESCE(o_totalprice <= lag(o_totalprice) OVER w, TRUE) AS dn
        |  FROM orders WHERE o_orderkey < 1000
        |  WINDOW w AS (ORDER BY o_orderkey)) m""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "orders")
        .query("o_orderkey < 1000")
        .checkMonotonic("o_orderkey", "o_totalprice")
        .df
    },

    // --- §2.13 histogram / bincount (reference tensor statistics
    //     opcodes 430/446): fixed-width integer binning, pure groupBy
    Q("op_histogram",
      """SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS bin, COUNT(*) AS cnt
        |FROM customer GROUP BY bin ORDER BY bin""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .eval("bin", "CAST(floor(c_acctbal / 1000) AS BIGINT)")
        .groupby("bin")
        .agg(("cnt", "count", "bin"))
        .sortValues(Seq("bin"))
        .df
    },

    // --- §2.3 transpose (small frames only — reference base/transpose.py)
    Q("op_transpose",
      """WITH agg AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |         CAST(COUNT(*) AS DOUBLE) AS cnt
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT 'cnt' AS "column",
        |  (SELECT cnt FROM agg WHERE l_returnflag = 'A') AS "A",
        |  (SELECT cnt FROM agg WHERE l_returnflag = 'N') AS "N",
        |  (SELECT cnt FROM agg WHERE l_returnflag = 'R') AS "R"
        |UNION ALL
        |SELECT 'sum_qty',
        |  (SELECT sum_qty FROM agg WHERE l_returnflag = 'A'),
        |  (SELECT sum_qty FROM agg WHERE l_returnflag = 'N'),
        |  (SELECT sum_qty FROM agg WHERE l_returnflag = 'R')
        |ORDER BY "column"""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(
        t(spark, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(sumD(dec12($"l_quantity")).as("sum_qty"),
            count(lit(1)).cast("double").as("cnt")))
        .transposeSmall("l_returnflag")
        .sortValues(Seq("column"))
        .df
    },

    // --- §2.5 describe(include='all') for object columns (reference
    //     base/describe.py): non-null count / unique / top / freq; top
    //     ties break to the lexicographically-smallest most-frequent
    //     value on both sides (the deterministic replacement for pandas'
    //     order-dependent "first observed").
    Q("op_describe_object",
      """WITH c AS (SELECT c_mktsegment AS v, COUNT(*) AS c FROM customer
        |           WHERE c_mktsegment IS NOT NULL GROUP BY 1)
        |SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM c) AS cnt,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS uniq,
        |       (SELECT v FROM c ORDER BY c DESC, v LIMIT 1) AS top,
        |       (SELECT CAST(MAX(c) AS BIGINT) FROM c) AS freq""".stripMargin) {
      (spark, dir) =>
      gt(spark, dir, "customer")
        .describeObject("c_mktsegment")
        .df
    },

    // --- §2.13 sketch error bounds (reference approx quantile /
    //     unique sketches): approx values themselves are engine-specific
    //     (GK vs t-digest, HLL variants differ), so the oracle states the
    //     INVARIANT instead — Spark's GK approx_percentile carries a
    //     deterministic ±1e-4 rank-error guarantee, checked against the
    //     exact 0.498/0.502 (0.898/0.902) interpolated percentiles, and
    //     HLL(rsd=0.02) against ±10% of the exact distinct count. All
    //     deterministic for a fixed fixture (GK is deterministic; HLL is
    //     hash-based, no RNG), so ok=TRUE is a stable differential.
    Q("op_sketch_bounds",
      """SELECT metric, ok FROM (VALUES
        |  ('hll_orderkey', TRUE), ('p50', TRUE), ('p90', TRUE))
        |  AS t(metric, ok)
        |ORDER BY metric""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .agg(
          expr("percentile(l_extendedprice, array(0.498, 0.502, 0.898, 0.902))")
            .as("ex"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
            .as("ap"),
          countDistinct($"l_orderkey").as("cd"),
          approx_count_distinct($"l_orderkey", 0.02).as("acd"))
        .select(
          (abs($"acd" - $"cd").cast("double") / $"cd".cast("double") <= 0.1)
            .as("hll_orderkey"),
          ($"ap" (0) >= $"ex" (0) && $"ap" (0) <= $"ex" (1)).as("p50"),
          ($"ap" (1) >= $"ex" (2) && $"ap" (1) <= $"ex" (3)).as("p90"))
        .unpivot(Array.empty, Array(col("hll_orderkey"), col("p50"), col("p90")),
          "metric", "ok")
        .orderBy($"metric")
    },

    // --- §2.12 map_chunk / apply (reference base/map_chunk.py:51,
    //     apply.py:69): the imperative mapPartitions escape hatch runs a
    //     per-row computation in plain Scala; the oracle recomputes the
    //     same arithmetic declaratively in SQL — if the plumbing dropped,
    //     duplicated, or misordered rows, the differential catches it.
    Q("op_map_chunk",
      """SELECT n_nationkey,
        |  CAST(n_nationkey * 2 + length(n_name) AS BIGINT) AS score
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("score", LongType)))
      gt(spark, dir, "nation")
        .select("n_nationkey", "n_name")
        .mapChunk(schema)(_.map { r =>
          val k = r.getAs[Number](0).longValue
          Row(k, k * 2 + r.getString(1).length.toLong)
        })
        .sortValues(Seq("n_nationkey"))
        .df
    },

    // --- §2.12 groupby.apply (reference groupby/apply.py:58): arbitrary
    //     per-group Scala over the streaming-sorted group iterator — a
    //     hand-rolled running sum per region, oracled against the
    //     equivalent SQL window.
    Q("op_apply_groups",
      """SELECT n_regionkey, n_nationkey,
        |  CAST(SUM(n_nationkey) OVER (PARTITION BY n_regionkey
        |    ORDER BY n_nationkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS running
        |FROM nation ORDER BY n_regionkey, n_nationkey""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("n_regionkey", LongType),
        StructField("n_nationkey", LongType),
        StructField("running", LongType)))
      gt(spark, dir, "nation")
        .select("n_regionkey", "n_nationkey")
        .groupby("n_regionkey")
        .applyGroups(schema) { (_, rows) =>
          var acc = 0L
          rows.toSeq.sortBy(_.getAs[Number](1).longValue).iterator.map { r =>
            val (rk, nk) = (r.getAs[Number](0).longValue,
              r.getAs[Number](1).longValue)
            acc += nk
            Row(rk, nk, acc)
          }
        }
        .sortValues(Seq("n_regionkey", "n_nationkey"))
        .df
    },

    // --- §2.1 from_records (reference datasource/from_records.py:29):
    //     driver-side records parallelized into a frame, oracled against
    //     a VALUES literal (missing keys → nulls).
    Q("op_from_records",
      """SELECT id, name, score FROM (VALUES
        |  (1, 'ada', CAST(9.5 AS DOUBLE)),
        |  (2, 'bob', CAST(NULL AS DOUBLE)),
        |  (3, 'cy', CAST(7.25 AS DOUBLE)))
        |  AS t(id, name, score)
        |ORDER BY id""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.types._
      graft.api.GraftSession(spark).fromRecords(
          Seq(
            Map("id" -> 1, "name" -> "ada", "score" -> 9.5),
            Map("id" -> 2, "name" -> "bob"),
            Map("id" -> 3, "name" -> "cy", "score" -> 7.25)),
          fields = Seq("id" -> IntegerType, "name" -> StringType,
            "score" -> DoubleType))
        .sortValues(Seq("id"))
        .df
    },

    // --- §2.1 date_range (reference datasource/date_range.py:122):
    //     distributed calendar generation vs an arithmetic date grid.
    Q("op_date_range",
      """SELECT strftime(DATE '2024-01-05' + CAST(i * 3 AS INTEGER),
        |                '%Y-%m-%d') AS date
        |FROM (SELECT unnest(range(0, 40)) AS i) t
        |ORDER BY date""".stripMargin) { (spark, dir) =>
      graft.api.GraftSession(spark).dateRange("2024-01-05", 40, freqDays = 3)
        .assign("date" -> date_format(col("date"), "yyyy-MM-dd"))
        .sortValues(Seq("date"))
        .df
    },

    // --- §2.1 timedelta_range: exact microsecond longs.
    Q("op_timedelta_range",
      """SELECT CAST(i * 900000000 AS BIGINT) AS td_us
        |FROM (SELECT unnest(range(0, 25)) AS i) t
        |ORDER BY td_us""".stripMargin) { (spark, dir) =>
      graft.api.GraftSession(spark).timedeltaRange(25, 900000000L)
        .select("td_us")
        .sortValues(Seq("td_us"))
        .df
    },

    // --- §2.1 linspace (reference mt.linspace): the per-row affine grid
    //     start + i·step with step computed once — identical IEEE ops on
    //     both engines, bit-exact with no rounding.
    Q("op_linspace",
      """SELECT i AS id,
        |  CAST(2.5 AS DOUBLE) + CAST(i AS DOUBLE)
        |    * ((CAST(7.75 AS DOUBLE) - CAST(2.5 AS DOUBLE))
        |       / CAST(49 AS DOUBLE)) AS value
        |FROM (SELECT unnest(range(0, 50)) AS i) t
        |ORDER BY id""".stripMargin) { (spark, dir) =>
      graft.api.GraftSession(spark).linspace(2.5, 7.75, 50)
        .sortValues(Seq("id"))
        .df
    },

    // --- §2.1 eye (reference mt.eye), flattened to (id, j, x) cells.
    Q("op_eye",
      """SELECT i AS id, CAST(j AS BIGINT) AS j,
        |  CASE WHEN i = j THEN CAST(1.0 AS DOUBLE)
        |       ELSE CAST(0.0 AS DOUBLE) END AS x
        |FROM (SELECT unnest(range(0, 12)) AS i) a,
        |     (SELECT unnest(range(0, 12)) AS j) b
        |ORDER BY id, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftSession(spark).eye(12).df
        .select($"id", posexplode($"vec"))
        .select($"id", $"pos".cast("long").as("j"), $"col".as("x"))
        .orderBy($"id", $"j")
    },

    // --- §2.1/§2.14 triangle + diag family (reference mt.tri / tril /
    //     triu / diag / diagflat, tensor/datasource/tri.py, diag.py):
    //     row-sum and diagonal probes over the row-vector layout; all
    //     cells are exact integer-valued doubles, sums are order-free.
    Q("op_tensor_tri",
      """SELECT CAST(i AS BIGINT) AS id,
        |  list_sum(list_transform(range(0, 12),
        |    j -> CASE WHEN j <= i THEN CAST(1.0 AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END)) AS tri_sum,
        |  list_sum(list_transform(range(0, 12),
        |    j -> CASE WHEN j <= i THEN CAST(i * 12 + j AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END)) AS tril_sum,
        |  list_sum(list_transform(range(0, 12),
        |    j -> CASE WHEN j >= i THEN CAST(i * 12 + j AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END)) AS triu_sum,
        |  CAST(i * 12 + i AS DOUBLE) AS diagv,
        |  CAST(2.5 AS DOUBLE) * CAST(i AS DOUBLE) AS dmat_sum
        |FROM (SELECT unnest(range(0, 12)) AS i)
        |ORDER BY id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sess = graft.api.GraftSession(spark)
      def rowSum(c: org.apache.spark.sql.Column) =
        aggregate(c, lit(0.0), (a, x) => a + x)
      val mat = spark.range(0, 12).toDF("id").withColumn("vec",
        transform(sequence(lit(0), lit(11)), j => (col("id") * 12 + j).cast("double")))
      val tri = sess.tri(12, 12).df.select($"id", rowSum($"vec").as("tri_sum"))
      val tl = graft.api.GraftFrame(mat).trilMask("id", "vec").df
        .select($"id", rowSum($"vec").as("tril_sum"))
      val tu = graft.api.GraftFrame(mat).triuMask("id", "vec").df
        .select($"id", rowSum($"vec").as("triu_sum"))
      val dg = graft.api.GraftFrame(mat).diagonal("id", "vec", "diagv").df
        .select($"id", $"diagv")
      val dm = sess.diagMatrix((0 until 12).map(_ * 2.5)).df
        .select($"id", rowSum($"vec").as("dmat_sum"))
      tri.join(tl, "id").join(tu, "id").join(dg, "id").join(dm, "id")
        .orderBy($"id")
    },

    // --- §2.1 meshgrid / mgrid (reference mt.meshgrid + the nd_grid of
    //     tensor/lib/index_tricks.py): long-form (i, j, xv, yv) grid,
    //     numpy 'xy' indexing — affine coordinates are identical IEEE
    //     ops both sides, bit-exact unrounded.
    Q("op_meshgrid",
      """SELECT i, CAST(j AS BIGINT) AS j,
        |  CAST(-1.5 AS DOUBLE) + CAST(j AS DOUBLE) * CAST(0.25 AS DOUBLE) AS xv,
        |  CAST(2.0 AS DOUBLE) + CAST(i AS DOUBLE) * CAST(0.5 AS DOUBLE) AS yv
        |FROM (SELECT unnest(range(0, 9)) AS i) a,
        |     (SELECT unnest(range(0, 13)) AS j) b
        |ORDER BY i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftSession(spark)
        .meshgrid(x0 = -1.5, dx = 0.25, nx = 13, y0 = 2.0, dy = 0.5, ny = 9)
        .df.select($"i", $"j".cast("long").as("j"), $"xv", $"yv")
        .orderBy($"i", $"j")
    },

    // --- §2.10 rebalance/rechunk (reference base/rebalance.py:25,
    //     rechunk.py:32): pure physical re-layout — the oracle proves the
    //     DATA is untouched (no lost/duplicated rows) through a
    //     rebalance(7) → rechunk(3) chain.
    Q("op_rebalance",
      """SELECT n_nationkey, n_name FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "nation")
        .rebalance(7)
        .rechunk(3)
        .select("n_nationkey", "n_name")
        .sortValues(Seq("n_nationkey"))
        .df
    },

    // --- §2.3 eval/query in the pandas/Python dialect (reference
    //     base/eval.py:73-111 parses the same operator set from the
    //     Python ast): `and/or/not`, `**`, `//`, `in [..]`, backtick
    //     columns — translated onto Catalyst by PandasExpr, so a
    //     notebook-ported filter + assign runs unchanged. power() is the
    //     round-6 libm class; // and comparisons are exact.
    Q("op_eval_pandas",
      """SELECT l_orderkey, l_linenumber, l_partkey,
        |  round(floor(l_quantity / 7) + power(l_extendedprice, 0.5), 6) AS score
        |FROM lineitem
        |WHERE l_orderkey < 2000
        |  AND ((l_quantity >= 30 AND l_discount <= 0.05)
        |       OR (l_returnflag = 'R' AND NOT (power(l_tax, 2) > 0.0036))
        |       OR l_linenumber IN (6, 7))
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem")
        .queryPandas("`l_orderkey` < 2000 and " +
          "((l_quantity >= 30 and l_discount <= 0.05) or " +
          "(l_returnflag == 'R' and not (l_tax ** 2 > 0.0036)) or " +
          "l_linenumber in [6, 7])")
        .evalPandas("score", "l_quantity // 7 + l_extendedprice ** 0.5")
        .assign("score" -> round(col("score"), 6))
        .select("l_orderkey", "l_linenumber", "l_partkey", "score")
        .sortValues(Seq("l_orderkey", "l_linenumber", "l_partkey"))
        .df
    },

    // --- §2.3 DISTRIBUTED transpose past the 10k wall (reference
    //     base/transpose.py): ~12k orders become ~12k columns through the
    //     map-aggregate path (one partial-merging shuffle, labels-only
    //     collect), then the wide frame melts BACK to long form so the
    //     oracle can check every transposed cell without 12k-column SQL.
    //     A wrong transpose (dropped id, shifted column, lost value)
    //     surfaces as a missing/wrong (column, id, value) row. The
    //     melt-back is a schema-driven per-partition row explosion, NOT
    //     `unpivot`: Catalyst's analyzer goes O(width²) on a 12k-column
    //     unpivot (~8 min measured) while reading the 12k fields off each
    //     of the 2 wide rows imperatively is instant — exactly the
    //     "genuine per-partition logic" RDD carve-out.
    Q("op_transpose_wide",
      """SELECT "column", id, value FROM (
        |  SELECT 'o_totalprice' AS "column", CAST(o_orderkey AS VARCHAR) AS id,
        |         CAST(o_totalprice AS DOUBLE) AS value
        |  FROM orders WHERE o_orderkey < 48000
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(o_orderkey AS VARCHAR),
        |         CAST(o_custkey AS DOUBLE)
        |  FROM orders WHERE o_orderkey < 48000) t
        |ORDER BY "column", id""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val wide = gt(spark, dir, "orders")
        .query("o_orderkey < 48000")
        .select("o_orderkey", "o_totalprice", "o_custkey")
        .transpose("o_orderkey")
        .df
      val names = wide.schema.fieldNames
      val long = spark.createDataFrame(
        wide.rdd.flatMap { row =>
          val c = row.getString(0)
          (1 until row.length).iterator.map(i => Row(c, names(i),
            if (row.isNullAt(i)) null else row.getDouble(i)))
        },
        StructType(Seq(StructField("column", StringType),
          StructField("id", StringType), StructField("value", DoubleType))))
      long.orderBy(col("column"), col("id"))
    },

    // --- §2.1/§2.2 csv round-trip: engine writes csv, both engines read the
    //     same files back (reference datastore/to_csv.py:41 +
    //     datasource/read_csv.py:368)
    Q("op_csv_roundtrip",
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        |  min(n_name) AS first_nation
        |FROM read_csv('/root/repo/target/csv_rt/*.csv', header=true)
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (spark, dir) =>
      val out = "/root/repo/target/csv_rt"
      gt(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .toCsv(out, header = true, singleFile = true)
      graft.api.GraftSession(spark).readCsv(out, header = true)
        .astype("n_regionkey" -> "long")
        .groupby("n_regionkey")
        .agg(("n_nations", "count", "n_regionkey"), ("first_nation", "min", "n_name"))
        .sortValues(Seq("n_regionkey"))
        .df
    },

    // --- §2.2 ORC roundtrip (reference to_orc/read_orc): DuckDB reads no
    //     ORC, so the oracle is the IDENTITY contract — Spark writes the
    //     slice as ORC, reads it back and aggregates; the oracle
    //     aggregates the parquet source directly. Any loss/reorder/type
    //     drift in the ORC path breaks the hash.
    Q("op_orc_roundtrip",
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        |  min(n_name) AS first_nation,
        |  CAST(SUM(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS key_sum
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (spark, dir) =>
      val out = "/root/repo/target/orc_rt"
      gt(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .toOrc(out)
      graft.api.GraftSession(spark).readOrc(out)
        .astype("n_regionkey" -> "long", "n_nationkey" -> "long")
        .groupby("n_regionkey")
        .agg(("n_nations", "count", "n_regionkey"), ("first_nation", "min", "n_name"),
          ("key_sum", "sum", "n_nationkey"))
        .sortValues(Seq("n_regionkey"))
        .df
    },

    // --- §2.2 zarr v2 roundtrip (reference to_zarr/from_zarr): doubles
    //     through the clean-room binary chunk store and back; the
    //     aggregate uses the order-free scaled-integer convention
    //     (acctbal·100 is exact in double), so any corruption, chunk
    //     misalignment or row loss in the zarr path breaks the hash.
    Q("op_zarr_roundtrip",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(SUM(CAST(c_custkey AS BIGINT)) AS BIGINT) AS key_sum,
        |  CAST(min(CAST(c_acctbal AS DOUBLE)) AS DOUBLE) AS bmin,
        |  CAST(max(CAST(c_acctbal AS DOUBLE)) AS DOUBLE) AS bmax
        |FROM customer WHERE c_custkey < 300 ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = "/root/repo/target/zarr_rt"
      gt(spark, dir, "customer").df.filter($"c_custkey" < 300)
        .select($"c_custkey".cast("double").as("k"),
          $"c_acctbal".cast("double").as("bal"))
        .transform(d => { graft.api.GraftFrame(d).toZarr(out, Seq("k", "bal")); d })
      graft.api.GraftSession(spark).readZarr(out, Seq("k", "bal")).df
        .agg(count(lit(1)).as("n"),
          sum(floor($"bal" * 100 + 0.5).cast("long")).as("cents"),
          sum($"k".cast("long")).as("key_sum"),
          min($"bal").as("bmin"), max($"bal").as("bmax"))
        .orderBy($"n")
    },

    // --- §2.2 HDF5 roundtrip (reference to_hdf5.py:56 / from_hdf5.py:41):
    //     doubles through the clean-room single-file HDF5 writer
    //     (v0 superblock, v1 symbol table, contiguous float64 LE) and
    //     back through the spec-profile reader; dev/h5check.py is the
    //     independent second parser of the same bytes. The aggregate is
    //     the zarr gate's order-free scaled-integer convention, so any
    //     metadata mis-offset, row loss or byte-order slip breaks the hash.
    Q("op_hdf5_roundtrip",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(floor(CAST(s_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(SUM(CAST(s_suppkey AS BIGINT)) AS BIGINT) AS key_sum,
        |  CAST(min(CAST(s_acctbal AS DOUBLE)) AS DOUBLE) AS bmin,
        |  CAST(max(CAST(s_acctbal AS DOUBLE)) AS DOUBLE) AS bmax
        |FROM supplier ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = "/root/repo/target/hdf5_rt.h5"
      gt(spark, dir, "supplier").df
        .select($"s_suppkey".cast("double").as("k"),
          $"s_acctbal".cast("double").as("bal"))
        .transform(d => { graft.api.GraftFrame(d).toHdf5(out, Seq("k", "bal")); d })
      graft.api.GraftSession(spark).readHdf5(out, colNames = Seq("k", "bal")).df
        .agg(count(lit(1)).as("n"),
          sum(floor($"bal" * 100 + 0.5).cast("long")).as("cents"),
          sum($"k".cast("long")).as("key_sum"),
          min($"bal").as("bmin"), max($"bal").as("bmax"))
        .orderBy($"n")
    },

    // --- HDF5 FILTERED chunked read (r16 VERDICT #4): the fixture is
    //     written by the INDEPENDENT dev/h5check.py writer with the
    //     full h5py-shaped pipeline (shuffle -> gzip -> fletcher32,
    //     value(i,j) = i*1000 + j + 0.5, 997x3 in 64-row chunks — edge
    //     chunk padded), decoded by the clean-room Scala reader, and
    //     the oracle recomputes the identical values from range()
    //     arithmetic — every term is exact in binary (k + 0.5), so the
    //     double sums are order-free and UNROUNDED.
    Q("op_hdf5_gzip",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(i AS BIGINT)) AS BIGINT) AS idx_sum,
        |  CAST(SUM(i * 1000.0 + 0.5) AS DOUBLE) AS s0,
        |  CAST(SUM(i * 1000.0 + 1.5) AS DOUBLE) AS s1,
        |  CAST(SUM(i * 1000.0 + 2.5) AS DOUBLE) AS s2
        |FROM range(997) t(i) ORDER BY n""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import scala.sys.process._
      // cwd-relative (the Hdf5Spec convention) + pid-suffixed: the query
      // must run from any checkout, and concurrent drives must not share
      // a fixture path (r16 ADVICE)
      val out = new java.io.File(
        s"target/hdf5_gz_${ProcessHandle.current().pid()}.h5").getAbsolutePath
      val writer = new java.io.File("dev/h5check.py").getAbsolutePath
      val rc = Seq("python3", writer, "--write-gzip",
        out, "data", "997", "3", "64", "shuffle,fletcher32").!
      require(rc == 0, "dev/h5check.py --write-gzip failed")
      graft.api.GraftSession(spark).readHdf5(out).df
        .agg(count(lit(1)).as("n"),
          sum($"row_index").as("idx_sum"),
          sum($"c0").as("s0"), sum($"c1").as("s1"), sum($"c2").as("s2"))
        .orderBy($"n")
    },

    // --- §2.1/§2.2 JDBC roundtrip (reference to_sql/read_sql): the slice
    //     goes through an embedded Derby table and comes back via the
    //     PARTITIONED jdbc scan (4 ranged partitions on r_regionkey) —
    //     the reference's read_sql(partition_col, num_partitions) shape.
    Q("op_jdbc_roundtrip",
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin) {
      (spark, dir) =>
      val url = "jdbc:derby:/root/repo/target/derby_rt;create=true"
      gt(spark, dir, "region").select("r_regionkey", "r_name").df
        .transform(d => { graft.api.GraftFrame(d).toJdbc(url, "region_rt"); d })
      graft.api.GraftSession(spark)
        .readJdbc(url, "region_rt", partitionColumn = Some("r_regionkey"),
          lowerBound = 0L, upperBound = 5L, numPartitions = 4)
        .astype("r_regionkey" -> "long")
        .sortValues(Seq("r_regionkey"))
        .df.select("r_regionkey", "r_name")
    },

    // --- §2.4 bucketed-table roundtrip: both sides written as 8-bucket
    //     sorted tables on the join key, read back through the catalog
    //     and joined (BucketingSpec pins the NO-SHUFFLE plan; this gates
    //     the data fidelity of the bucketed write/read path).
    Q("op_bucketed_join",
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // the in-memory catalog is fresh per JVM but the warehouse DIR
      // persists — drop both the entry and any orphan location
      Seq("graft_rt_cust_bkt", "graft_rt_ord_bkt").foreach { n =>
        spark.sql(s"DROP TABLE IF EXISTS $n")
        val loc = java.nio.file.Paths.get(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), n)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
        }
      }
      gt(spark, dir, "customer").select("c_custkey", "c_mktsegment")
        .toBucketedTable("graft_rt_cust_bkt", 8, Seq("c_custkey"))
      gt(spark, dir, "orders").select("o_orderkey", "o_custkey")
        .toBucketedTable("graft_rt_ord_bkt", 8, Seq("o_custkey"))
      spark.table("graft_rt_ord_bkt")
        .join(spark.table("graft_rt_cust_bkt"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum($"o_orderkey".cast("long")).as("key_sum"))
        .orderBy($"c_mktsegment")
    },

    // --- §2.11 set_index/reset_index (reference indexing/set_index.py):
    //     the columns-as-index model's one observable effect — index
    //     columns move to the front; reset_index is the identity.
    Q("op_set_index",
      """SELECT n_regionkey, n_nationkey, n_name
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .setIndex("n_regionkey")
        .resetIndex()
        .sortValues(Seq("n_nationkey"))
        .df
    },

    // --- §2.12 mr.spawn with a DETERMINISTIC remote function (reference
    //     remote/run_script spawn surface; the π spawn in MicroBench uses
    //     an RNG so only its timing is comparable — this one is
    //     arithmetic, so the oracle replays each remote call in SQL).
    Q("op_spawn",
      """SELECT s, CAST(SUM((s * 1000 + i) % 97) AS BIGINT) AS v
        |FROM (SELECT unnest(range(8)) AS s), (SELECT unnest(range(1000)) AS i)
        |GROUP BY s ORDER BY s""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val results = graft.remote.Spawn.spawnMap(spark, (0L until 8L)) { s =>
        var acc = 0L
        var i = 0L
        while (i < 1000L) { acc += (s * 1000L + i) % 97L; i += 1 }
        (s, acc)
      }
      results.toDF("s", "v").orderBy($"s")
    },

    // --- §2.16 STREAMING ≡ BATCH differential: the op_events_tumbling
    //     aggregation run as a real Structured Streaming query (parquet
    //     file source → event-time window aggregate → memory sink,
    //     complete mode) and gated against the batch oracle — upgrades
    //     streaming from spec-only to differentially verified.
    Q("op_stream_batch_parity",
      """SELECT event_type,
        |  CAST(floor(epoch_us(ts) / 3600000000.0) * 3600 AS BIGINT) AS w_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type, w_start
        |ORDER BY event_type, w_start""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "events", "ts")
      // replicate Tables.load's ts normalization on the stream side
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val raw = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val ev = rawSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ =>
          raw.withColumn("ts", $"ts".cast(org.apache.spark.sql.types.TimestampType))
      }
      val sinkName = s"strm_parity_${StreamParity.next()}"
      val q = ev
        .groupBy($"event_type", window($"ts", "1 hour"))
        .agg(count(lit(1)).as("n"), sumD(dec12($"value")).as("total"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"event_type",
          expr("unix_micros(window.start) DIV 1000000").as("w_start"),
          $"n", $"total")
        .orderBy($"event_type", $"w_start")
    },

    // --- §2.16 streaming exact dedup ≡ batch: the flatMapGroupsWithState
    //     first-seen dedup run as a real streaming query over the staged
    //     documents file (one micro-batch → first-seen = min doc_id per
    //     fingerprint, fully deterministic) against the md5-fingerprint
    //     keep-first oracle.
    Q("op_stream_dedup_parity",
      """WITH fp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                            ' +', ' ', 'g'))) AS f
        |  FROM documents)
        |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, f AS fp
        |FROM fp GROUP BY f ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "documents", "doc_id")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val sinkName = s"strm_dedup_${StreamParity.next()}"
      val q = graft.streaming.StreamOps.streamingExactDedup(stream)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"doc_id", $"fp")
        .orderBy($"doc_id")
    },

    // --- §2.16 streaming count-min ≡ batch: the unbounded-firehose CMS
    //     state (4×256 cells, md5-portable bucket arithmetic) built by a
    //     real streaming aggregation and gated cell-by-cell against the
    //     SQL replay — the ext_cms_counts cell CTE.
    Q("op_stream_cms_parity",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |rows_ AS (SELECT unnest(range(4)) AS r),
        |sk AS (SELECT r, CAST('0x' || substr(md5('cm' || r || '|' || w), 1, 15)
        |                     AS BIGINT) % 256 AS bucket,
        |              CAST(COUNT(*) AS BIGINT) AS c
        |       FROM tok, rows_ GROUP BY 1, 2)
        |SELECT CAST(r AS BIGINT) AS row, bucket, c
        |FROM sk ORDER BY row, bucket""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "documents", "doc_id")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val tokens = stream.select(
        explode(graft.functions.TextFunctions.words($"text")).as("w"))
      val sinkName = s"strm_cms_${StreamParity.next()}"
      val q = graft.streaming.StreamOps.streamingCountMin(tokens, "w")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"row".cast("long").as("row"), $"bucket", $"c")
        .orderBy($"row", $"bucket")
    },

    // --- §2.16 streaming session_window ≡ batch: gap-based sessions via
    //     the NATIVE session_window aggregate as a streaming query.
    //     session_window merges event windows [t, t+gap) on OVERLAP, so a
    //     pair exactly `gap` apart SPLITS (half-open) — the oracle's
    //     is_new uses >= where the lag-based batch op (op_events_session)
    //     uses >; both semantics are pinned, each against its own rule.
    Q("op_stream_session_parity",
      """WITH flags AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flags)
        |SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS s_start_us,
        |       COUNT(*) AS n_events, min(event_id) AS first_event
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, s_start_us""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "events", "ts")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val raw = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val ev = rawSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ =>
          raw.withColumn("ts", $"ts".cast(org.apache.spark.sql.types.TimestampType))
      }
      val sinkName = s"strm_sess_${StreamParity.next()}"
      val q = graft.streaming.StreamOps.sessionCounts(ev, "30 minutes", "0 seconds")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"user_id", expr("unix_micros(s_start)").as("s_start_us"),
          $"n_events", $"first_event")
        .orderBy($"user_id", $"s_start_us")
    },

    // --- §2.16 streaming DECONTAMINATION ≡ batch (r9): the stream-static
    //     ingest filter (incoming docs' shingles probed against a
    //     broadcast benchmark table) run as a real multi-batch streaming
    //     aggregation in complete mode, against the exact-overlap batch
    //     oracle (ext_decontaminate's construct at the same parameters).
    Q("op_stream_decon_parity",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS sh
        |       FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
        |             FROM d WHERE len(w) >= 3) t),
        |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
        |hits AS (SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams
        |         FROM sh s JOIN bsh ON s.sh = bsh.sh
        |         WHERE s.doc_id >= 20 GROUP BY s.doc_id)
        |SELECT c.doc_id,
        |       COALESCE(h.n_contaminated_ngrams, 0) AS n_contaminated_ngrams,
        |       COALESCE(h.n_contaminated_ngrams, 0) >= 3 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) c
        |LEFT JOIN hits h ON c.doc_id = h.doc_id
        |ORDER BY c.doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "documents", "doc_id")
      // the benchmark set is STATIC (batch-read); the corpus streams
      val bench = spark.read.parquet(stageDir.toString)
        .filter($"doc_id" < 20)
        .select(explode(graft.functions.TextFunctions
          .hashedShingles($"text", 3)).as("__sh"))
        .distinct()
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
        .filter($"doc_id" >= 20)
      val sinkName = s"strm_decon_${StreamParity.next()}"
      val q = graft.streaming.StreamOps
        .decontaminateStream(stream, bench, n = 3, minOverlap = 3)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"doc_id", $"n_contaminated_ngrams", $"contaminated")
        .orderBy($"doc_id")
    },

    // --- streaming SEMANTIC decontamination parity (r10): the embedding
    //     max-cosine filter (static benchmark vectors broadcast per
    //     batch) as a real multi-batch streaming aggregation in complete
    //     mode, against the ext_semantic_decon construct. Round-4 sims
    //     are bit-identical ordered folds on both engines, so the 0.9
    //     threshold comparison can never disagree.
    Q("op_stream_semdecon_parity",
      """WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50),
        |b AS (SELECT embedding AS bvec FROM embeddings WHERE vec_id < 50),
        |p AS (
        |  SELECT c.vec_id,
        |    max(round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |           i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, 65),
        |             i -> CAST(b.bvec[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE))))),
        |      4)) AS max_sim
        |  FROM c CROSS JOIN b GROUP BY c.vec_id)
        |SELECT vec_id, max_sim + CAST(0.0 AS DOUBLE) AS max_sim,
        |       max_sim >= 0.9 AS contaminated
        |FROM p ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "embeddings", "vec_id")
      val bench = spark.read.parquet(stageDir.toString)
        .filter($"vec_id" < 50)
        .select($"embedding".as("bvec"))
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
        .filter($"vec_id" >= 50)
        .select($"vec_id".as("cid"), $"embedding".as("cvec"))
      val sinkName = s"strm_semdecon_${StreamParity.next()}"
      val q = graft.streaming.StreamOps
        .semanticDecontaminateStream(stream, bench, threshold = 0.9)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"cid".as("vec_id"), $"max_sim", $"contaminated")
        .orderBy($"vec_id")
    },

    // --- §2.16 streaming SLIDING windows ≡ batch (r9): the 2h/1h
    //     sliding aggregate as a real streaming query (complete mode,
    //     state accumulating across the 3 ts-range micro-batches); the
    //     oracle enumerates each event's two member windows directly
    //     (starts at floor(t/1h)·1h and one hour earlier).
    Q("op_stream_sliding_parity",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS tsec, value
        |  FROM events WHERE user_id < 40),
        |m AS (
        |  SELECT event_type,
        |         (tsec // 3600 - j) * 3600 AS w_start, value
        |  FROM e CROSS JOIN (SELECT unnest(range(2)) AS j) js)
        |SELECT event_type, CAST(w_start AS BIGINT) AS w_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM m GROUP BY event_type, w_start
        |ORDER BY event_type, w_start""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "events", "ts")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val raw = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val ev = rawSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ =>
          raw.withColumn("ts", $"ts".cast(org.apache.spark.sql.types.TimestampType))
      }
      val sinkName = s"strm_slide_${StreamParity.next()}"
      val q = ev.filter($"user_id" < 40)
        .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sumD(dec12($"value")).as("total"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"event_type",
          expr("unix_micros(window.start) DIV 1000000").as("w_start"),
          $"n", $"total")
        .orderBy($"event_type", $"w_start")
    },

    // --- §2.16 STREAM-STREAM interval join ≡ batch (r9 — upgrades
    //     intervalJoinStream from spec-only to differentially gated):
    //     even-id events stream-joined to odd-id events of the same user
    //     within 24 h, both sides watermarked, run over the 3-range-file
    //     staging with maxFilesPerTrigger=1 so join STATE carries left
    //     rows across real batch boundaries (a left row's matches arrive
    //     in later micro-batches). ts-ordered batches + a 0 s watermark
    //     mean nothing is ever late, so the append-mode result set equals
    //     the batch join exactly.
    Q("op_stream_interval_parity",
      """WITH e AS (SELECT user_id, event_id, ts FROM events WHERE user_id < 20)
        |SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id
        |FROM e l JOIN e r ON l.user_id = r.user_id
        |  AND epoch_us(r.ts) >= epoch_us(l.ts)
        |  AND epoch_us(r.ts) < epoch_us(l.ts) + 86400000000
        |WHERE l.event_id % 2 = 0 AND r.event_id % 2 = 1
        |ORDER BY l.user_id, left_id, right_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stageDir = StreamParity.stage(spark, dir, "events", "ts")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      def stream() = {
        val raw = spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
        val ev = rawSchema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          case org.apache.spark.sql.types.TimestampType => raw
          case _ =>
            raw.withColumn("ts",
              $"ts".cast(org.apache.spark.sql.types.TimestampType))
        }
        ev.filter($"user_id" < 20).select($"user_id", $"event_id", $"ts")
      }
      val left = stream().filter($"event_id" % 2 === 0)
      val right = stream().filter($"event_id" % 2 === 1)
      val sinkName = s"strm_ij_${StreamParity.next()}"
      val q = graft.streaming.StreamOps
        .intervalJoinStream(left, right, windowSeconds = 86400L, "0 seconds")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName)
        .select($"user_id", $"left_id", $"right_id")
        .orderBy($"user_id", $"left_id", $"right_id")
    },

    // --- §2.10 str accessor, wide coverage (reference base/string_.py:34;
    //     the 8-method op_str_ops plus this cover the commonly-used surface,
    //     AccessorSpec covers the remainder on literal frames)
    Q("op_str_accessor",
      """SELECT p_partkey,
        |  upper(p_name[1:1]) || lower(p_name[2:]) AS capitalized,
        |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS zfilled,
        |  substring(p_name, 3, 5) AS sliced,
        |  contains(p_name, 'an') AS has_an,
        |  starts_with(p_name, 'b') AS starts_b,
        |  p_name LIKE '%y' AS ends_y,
        |  regexp_matches(p_brand, '^[A-Za-z0-9]+$') AS brand_alnum,
        |  CAST(strpos(p_name, 'o') - 1 AS BIGINT) AS find_o,
        |  CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS count_a,
        |  regexp_replace(trim(p_name), '\s+', ' ', 'g') AS norm_ws
        |FROM part WHERE p_partkey < 100
        |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{StrAccessor => S}
      t(spark, dir, "part").filter($"p_partkey" < 100)
        .select($"p_partkey",
          S.capitalize($"p_name").as("capitalized"),
          S.zfill($"p_partkey".cast("string"), 10).as("zfilled"),
          S.slice($"p_name", 2, 7).as("sliced"),
          S.contains($"p_name", "an").as("has_an"),
          S.startswith($"p_name", "b").as("starts_b"),
          S.endswith($"p_name", "y").as("ends_y"),
          S.isalnum($"p_brand").as("brand_alnum"),
          S.find($"p_name", "o").as("find_o"),
          S.countMatches($"p_name", "a").as("count_a"),
          S.normalizeWs($"p_name").as("norm_ws"))
        .orderBy($"p_partkey")
    },

    // --- §2.10 str accessor tail: translate/partition/rpartition/
    //     slice_replace/swapcase/casefold/removeprefix/encode/match
    //     (reference base/accessor.py:56-77 wraps the full pandas surface)
    Q("op_str_accessor2", {
      val lowerAz = ('a' to 'z').mkString
      val upperAz = ('A' to 'Z').mkString
      s"""SELECT p_partkey,
         |  translate(p_name, 'aeiou', 'AEIOU') AS translated,
         |  CASE WHEN strpos(p_brand, '#') > 0
         |       THEN substr(p_brand, 1, strpos(p_brand, '#') - 1) ELSE p_brand END AS part_head,
         |  CASE WHEN strpos(p_brand, '#') > 0
         |       THEN substr(p_brand, strpos(p_brand, '#') + 1) ELSE '' END AS part_tail,
         |  CASE WHEN strpos(reverse(p_name), ' ') > 0
         |       THEN substr(p_name, 1, length(p_name) - strpos(reverse(p_name), ' '))
         |       ELSE '' END AS rpart_head,
         |  CASE WHEN strpos(reverse(p_name), ' ') > 0
         |       THEN substr(p_name, length(p_name) - strpos(reverse(p_name), ' ') + 2)
         |       ELSE p_name END AS rpart_tail,
         |  'XYZ' || substr(p_name, 4) AS slice_repl,
         |  translate(p_type, '$lowerAz$upperAz', '$upperAz$lowerAz') AS swapped,
         |  lower(p_type) AS folded,
         |  CASE WHEN starts_with(p_brand, 'Brand#')
         |       THEN substr(p_brand, 7) ELSE p_brand END AS nopfx,
         |  CASE WHEN p_type LIKE '%Y'
         |       THEN substr(p_type, 1, length(p_type) - 1) ELSE p_type END AS nosfx,
         |  CAST(octet_length(encode(p_name)) AS BIGINT) AS byte_len,
         |  regexp_matches(p_brand, '^(?:Brand#[0-9])') AS brand_match,
         |  regexp_matches(p_brand, '^(?:Brand#[0-9]+)$$') AS brand_fullmatch,
         |  regexp_matches(substr(p_brand, 7), '^[0-9]+$$') AS brandno_numeric,
         |  regexp_matches(p_brand, '^([^a-zA-Z]*[A-Z][a-z]*)+[^a-zA-Z]*$$') AS brand_title
         |FROM part WHERE p_partkey < 100
         |ORDER BY p_partkey""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{StrAccessor => S}
      t(spark, dir, "part").filter($"p_partkey" < 100)
        .select($"p_partkey",
          S.translateChars($"p_name", "aeiou", "AEIOU").as("translated"),
          S.partition($"p_brand", "#").getField("head").as("part_head"),
          S.partition($"p_brand", "#").getField("tail").as("part_tail"),
          S.rpartition($"p_name", " ").getField("head").as("rpart_head"),
          S.rpartition($"p_name", " ").getField("tail").as("rpart_tail"),
          S.sliceReplace($"p_name", 0, 3, "XYZ").as("slice_repl"),
          S.swapcase($"p_type").as("swapped"),
          S.casefold($"p_type").as("folded"),
          S.removeprefix($"p_brand", "Brand#").as("nopfx"),
          S.removesuffix($"p_type", "Y").as("nosfx"),
          length(S.encodeCharset($"p_name")).cast("long").as("byte_len"),
          S.matchRegex($"p_brand", "Brand#[0-9]").as("brand_match"),
          S.fullmatch($"p_brand", "Brand#[0-9]+").as("brand_fullmatch"),
          S.isnumeric(substring($"p_brand", 7, 100)).as("brandno_numeric"),
          S.istitle($"p_brand").as("brand_title"))
        .orderBy($"p_partkey")
    },

    // --- §2.10 str accessor last mile: extractall (row expansion via
    //     posexplode, the pandas match-index shape), rsplit(maxsplit),
    //     rfind / index / rindex, and unicode NFC normalization (exercised
    //     on a decomposed e+combining-acute suffix so both engines must
    //     actually recompose)
    Q("op_str_accessor3",
      """WITH m AS (
        |  SELECT p_partkey, p_name, regexp_extract_all(p_name, '[a-z]+', 0) AS matches
        |  FROM part WHERE p_partkey < 100
        |), e AS (
        |  SELECT p_partkey, p_name, matches,
        |         unnest(generate_series(1, len(matches))) AS i
        |  FROM m
        |)
        |SELECT p_partkey,
        |  CAST(i - 1 AS BIGINT) AS match_idx,
        |  matches[i] AS match,
        |  CASE WHEN strpos(reverse(p_name), ' ') > 0
        |       THEN substr(p_name, 1, length(p_name) - strpos(reverse(p_name), ' '))
        |            || '|' || substr(p_name, length(p_name) - strpos(reverse(p_name), ' ') + 2)
        |       ELSE p_name END AS rs2,
        |  CAST(CASE WHEN strpos(reverse(p_name), 'a') > 0
        |       THEN length(p_name) - strpos(reverse(p_name), 'a') ELSE -1 END AS BIGINT) AS rfind_a,
        |  CAST(strpos(p_name, ' ') - 1 AS BIGINT) AS idx_space,
        |  CAST(length(p_name) - strpos(reverse(p_name), ' ') AS BIGINT) AS ridx_space,
        |  nfc_normalize(p_name || ' cafe' || chr(769)) AS norm_nfc
        |FROM e
        |ORDER BY p_partkey, match_idx""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{StrAccessor => S}
      t(spark, dir, "part").filter($"p_partkey" < 100)
        .select($"p_partkey", $"p_name",
          posexplode(S.extractall($"p_name", "[a-z]+", 0)).as(Seq("match_idx", "match")))
        .select($"p_partkey",
          $"match_idx".cast("long").as("match_idx"),
          $"match",
          array_join(S.rsplit($"p_name", " ", 1), "|").as("rs2"),
          S.rfind($"p_name", "a").as("rfind_a"),
          S.indexOf($"p_name", " ").as("idx_space"),
          S.rindexOf($"p_name", " ").as("ridx_space"),
          S.normalizeUnicode(concat($"p_name", lit(" café")), "NFC").as("norm_nfc"))
        .orderBy($"p_partkey", $"match_idx")
    },

    // --- §2.10 dt accessor tail: quarter/year ends, month/day names,
    //     ceil/round to unit (integer µs arithmetic both sides), periods,
    //     timedelta total_seconds
    Q("op_dt_accessor2",
      """SELECT event_id,
        |  CAST(ts AS DATE) = last_day(ts) AND month(ts) % 3 = 0 AS q_end,
        |  month(ts) = 12 AND day(ts) = 31 AS y_end,
        |  monthname(ts) AS mname,
        |  dayname(ts) AS dname,
        |  epoch_us(ts) - (epoch_us(ts) % 3600000000)
        |    + CASE WHEN epoch_us(ts) % 3600000000 > 0 THEN 3600000000 ELSE 0 END
        |    AS ceil_hour_us,
        |  epoch_us(ts) - (epoch_us(ts) % 3600000000)
        |    + CASE WHEN epoch_us(ts) % 3600000000 >= 1800000000 THEN 3600000000 ELSE 0 END
        |    AS round_hour_us,
        |  strftime(date_trunc('quarter', ts), '%Y-%m-%d') AS per_q,
        |  strftime(date_trunc('year', ts), '%Y-%m-%d') AS per_y,
        |  CAST(isodow(ts) - 1 AS BIGINT) AS wd,
        |  (epoch_us(ts) - epoch_us(date_trunc('day', ts))) / 1000000.0 AS secs_today
        |FROM events WHERE event_id < 100
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{DtAccessor => D}
      t(spark, dir, "events").filter($"event_id" < 100)
        .select($"event_id",
          D.isQuarterEnd($"ts").as("q_end"),
          D.isYearEnd($"ts").as("y_end"),
          D.monthName($"ts").as("mname"),
          D.dayName($"ts").as("dname"),
          unix_micros(D.ceilTo($"ts", "hour")).as("ceil_hour_us"),
          unix_micros(D.roundTo($"ts", "hour")).as("round_hour_us"),
          date_format(D.toPeriodQuarter($"ts"), "yyyy-MM-dd").as("per_q"),
          date_format(D.toPeriodYear($"ts"), "yyyy-MM-dd").as("per_y"),
          D.weekday($"ts").as("wd"),
          D.totalSeconds(unix_micros($"ts") -
            unix_micros(date_trunc("day", $"ts"))).as("secs_today"))
        .orderBy($"event_id")
    },

    // --- §2.5 mean absolute deviation (pandas mad), grouped: two hash
    //     aggregates + a join, no per-group window buffer
    Q("op_mad",
      """SELECT l_returnflag, round(avg(abs(l_quantity - m)), 6) AS qty_mad
        |FROM (SELECT l_returnflag, l_quantity,
        |             avg(l_quantity) OVER (PARTITION BY l_returnflag) AS m
        |      FROM lineitem) t
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "lineitem")
        .groupby("l_returnflag")
        .mad("l_quantity", "qty_mad_raw")
        .assign("qty_mad" -> round($"qty_mad_raw", 6))
        .drop("qty_mad_raw")
        .sortValues(Seq("l_returnflag"))
        .df
    },

    // --- §2.5/§2.13 ptp (max − min, tensor statistics/ptp.py:23) +
    //     weighted average (average.py:24): grouped rows plus an 'ALL'
    //     union row for the frame-level forms. Sums stay exact DECIMAL
    //     until ONE final double division/cast per group
    Q("op_ptp_wavg",
      """SELECT l_returnflag AS grp,
        |  CAST(max(l_quantity) - min(l_quantity) AS DOUBLE) AS qty_ptp,
        |  round(CAST(SUM(l_extendedprice * l_quantity) AS DOUBLE)
        |        / CAST(SUM(l_quantity) AS DOUBLE), 6) AS price_wavg
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'ALL' AS grp,
        |  CAST(max(l_quantity) - min(l_quantity) AS DOUBLE) AS qty_ptp,
        |  round(CAST(SUM(l_extendedprice * l_quantity) AS DOUBLE)
        |        / CAST(SUM(l_quantity) AS DOUBLE), 6) AS price_wavg
        |FROM lineitem
        |ORDER BY grp""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = gt(spark, dir, "lineitem")
      val grouped = li.groupby("l_returnflag").ptp("l_quantity", "qty_ptp").df
        .join(li.groupby("l_returnflag")
          .averageWeighted("l_extendedprice", "l_quantity", "price_wavg").df,
          "l_returnflag")
        .select($"l_returnflag".as("grp"), $"qty_ptp".cast("double"),
          round($"price_wavg", 6).as("price_wavg"))
      val global = li.ptp(Seq("l_quantity")).df
        .crossJoin(li.averageWeighted("l_extendedprice", "l_quantity", "price_wavg").df)
        .select(lit("ALL").as("grp"), $"l_quantity_ptp".cast("double").as("qty_ptp"),
          round($"price_wavg", 6).as("price_wavg"))
      grouped.unionByName(global).orderBy($"grp")
    },

    // --- §2.13 value_counts(normalize=true): proportion via a 1-row
    //     broadcast total (exact long division → identical doubles)
    Q("op_value_counts_norm",
      """SELECT c_mktsegment, COUNT(*) AS count,
        |  CAST(COUNT(*) AS DOUBLE)
        |    / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE) AS proportion
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY count DESC, c_mktsegment""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .valueCounts("c_mktsegment", normalize = true)
        .df
    },

    // --- §2.10 dt accessor, wide coverage (reference base/datetimes.py:31)
    Q("op_dt_accessor",
      """SELECT event_id,
        |  CAST(hour(ts) AS BIGINT) AS h,
        |  CAST(minute(ts) AS BIGINT) AS mi,
        |  CAST(second(ts) AS BIGINT) AS s,
        |  epoch_us(ts) % 1000000 AS micro,
        |  CAST(isodow(ts) - 1 AS BIGINT) AS dow_pandas,
        |  CAST(dayofyear(ts) AS BIGINT) AS doy,
        |  CAST(quarter(ts) AS BIGINT) AS qtr,
        |  CAST(day(last_day(ts)) AS BIGINT) AS days_in_month,
        |  day(ts) = 1 AS month_start,
        |  CAST(ts AS DATE) = last_day(ts) AS month_end,
        |  (year(ts) % 4 = 0 AND year(ts) % 100 <> 0) OR year(ts) % 400 = 0 AS leap,
        |  epoch_us(date_trunc('hour', ts)) AS hour_floor_us,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since
        |FROM events WHERE event_id < 100
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{DtAccessor => D}
      t(spark, dir, "events").filter($"event_id" < 100)
        .select($"event_id",
          D.hour($"ts").as("h"),
          D.minute($"ts").as("mi"),
          D.second($"ts").as("s"),
          D.microsecond($"ts").as("micro"),
          D.dayofweek($"ts").as("dow_pandas"),
          D.dayofyear($"ts").as("doy"),
          D.quarter($"ts").as("qtr"),
          D.daysInMonth($"ts").as("days_in_month"),
          D.isMonthStart($"ts").as("month_start"),
          D.isMonthEnd($"ts").as("month_end"),
          D.isLeapYear($"ts").as("leap"),
          unix_micros(D.floorTo($"ts", "hour")).as("hour_floor_us"),
          D.daysBetween(D.date($"ts"), to_date(lit("1995-01-01"))).as("days_since"))
        .orderBy($"event_id")
    },

    // --- SQL surface: one ANSI query string runs verbatim on both the
    //     engine (spark.sql over registered views) and the DuckDB oracle —
    //     the engine's second user surface beside the fluent API
    Q("op_sql_surface", OpsExtra.sqlSurfaceQuery) { (spark, dir) =>
      graft.Tables.registerAll(spark, dir)
      graft.api.GraftSession(spark).sql(OpsExtra.sqlSurfaceQuery).df
    },

    // --- §2.1/§2.14 random-distribution inverse-CDF transforms, made
    //     deterministic for the oracle by drawing u from the portable
    //     avalanche hash instead of rand(): both engines derive identical
    //     dyadic-rational uniforms and replay the same closed forms
    //     (numpy semantics). Parameters are chosen so every constant
    //     (rates, 1/shape exponents) is exactly representable in binary —
    //     round-6 absorbs only libm ulp differences. The rand()-fed
    //     generator sources share this exact transform code
    //     (graft.functions.Distributions); moments covered in RandomSpec.
    Q("op_random_invcdf",
      s"""SELECT c_custkey,
         |  round(-ln(1.0 - u) / 2.0, 6) AS expo,
         |  round(3.0 * pow(-ln(1.0 - u), 0.5), 6) AS weib,
         |  round(pow(1.0 - u, -0.5) - 1.0, 6) AS pareto,
         |  round(1.0 - 2.0 * ln(-ln(u)), 6) AS gumb,
         |  round(0.5 + 1.5 * ln(u / (1.0 - u)), 6) AS logi,
         |  round(2.0 * sqrt(-2.0 * ln(1.0 - u)), 6) AS rayl,
         |  round(0.0 - 1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS lapl,
         |  round(CASE WHEN u < 0.25 THEN 0.0 + sqrt(u * 4.0)
         |             ELSE 4.0 - sqrt((1.0 - u) * 12.0) END, 6) AS tri
         |FROM (SELECT c_custkey, ${graft.functions.PortableHash.sqlUniform01("c_custkey")} AS u
         |      FROM customer WHERE c_custkey < 200) s
         |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Distributions => D}
      val withU = t(spark, dir, "customer").filter($"c_custkey" < 200)
        .withColumn("u", graft.functions.PortableHash.uniform01($"c_custkey"))
      withU.select($"c_custkey",
          round(D.exponentialInv($"u", 2.0), 6).as("expo"),
          round(D.weibullInv($"u", 2.0, 3.0), 6).as("weib"),
          round(D.paretoInv($"u", 2.0), 6).as("pareto"),
          round(D.gumbelInv($"u", 1.0, 2.0), 6).as("gumb"),
          round(D.logisticInv($"u", 0.5, 1.5), 6).as("logi"),
          round(D.rayleighInv($"u", 2.0), 6).as("rayl"),
          round(D.laplaceInv($"u", 0.0, 1.0), 6).as("lapl"),
          round(D.triangularInv($"u", 0.0, 1.0, 4.0), 6).as("tri"))
        .orderBy($"c_custkey")
    },

    // --- §2.11 weighted sampling (reference indexing/sample.py:41
    //     weights=): Efraimidis–Spirakis top-n with deterministic hash
    //     uniforms — the ES priority ln(u)/w is replayed exactly by the
    //     oracle (u is an exact dyadic rational, so both engines divide the
    //     same ln result by the same weight)
    Q("op_sample_weighted",
      s"""SELECT c_custkey, c_name, c_acctbal FROM (
         |  SELECT c_custkey, c_name, c_acctbal
         |  FROM customer
         |  ORDER BY ln(${graft.functions.PortableHash.sqlUniform01("c_custkey")})
         |             / greatest(c_acctbal, 1.0) DESC
         |  LIMIT 100) s
         |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "customer")
        .eval("w", "greatest(c_acctbal, 1.0)")
        .sampleWeightedHash(100, "w", keyCol = "c_custkey")
        .select("c_custkey", "c_name", "c_acctbal")
        .sortValues(Seq("c_custkey"))
        .df
    },

    // --- §2.1 weighted categorical choice (numpy random.choice(a, p=...);
    //     reference mt.random.choice): the categorical inverse CDF over
    //     portable-hash uniforms — the exact nested-CASE thresholds are
    //     generated from ONE Scala source for both engines
    Q("op_random_choice", {
      val u = graft.functions.PortableHash.sqlUniform01("c_custkey")
      val idx = graft.functions.Distributions.sqlCategoricalInv(u, OpsExtra.choiceP)
      s"""SELECT c_custkey, CAST(idx AS BIGINT) AS pick_idx,
         |  CASE idx WHEN 0 THEN 'bronze' WHEN 1 THEN 'silver'
         |           WHEN 2 THEN 'gold' ELSE 'platinum' END AS pick
         |FROM (SELECT c_custkey, $idx AS idx
         |      FROM customer WHERE c_custkey < 2000) s
         |ORDER BY c_custkey""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Distributions => D, PortableHash}
      t(spark, dir, "customer").filter($"c_custkey" < 2000)
        .withColumn("__idx", D.categoricalInv(PortableHash.uniform01($"c_custkey"),
          OpsExtra.choiceP))
        .select($"c_custkey",
          $"__idx".as("pick_idx"),
          element_at(array(OpsExtra.choiceLabels.map(lit): _*),
            $"__idx".cast("int") + 1).as("pick"))
        .orderBy($"c_custkey")
    },

    // --- §2.1 permutation/shuffle (reference mt.random.permutation,
    //     mt.random.shuffle): hash-ordered bijection of [0, n) with the
    //     position materialized by zipWithIndex (no global window); the
    //     oracle replays the order with row_number over the same hash
    Q("op_random_perm",
      s"""SELECT CAST(row_number() OVER (
         |         ORDER BY ${graft.functions.PortableHash.sqlUniform01("i + 7")}, i)
         |       - 1 AS BIGINT) AS pos,
         |       i AS value
         |FROM range(0, 500) t(i)
         |ORDER BY pos""".stripMargin) { (spark, dir) =>
      graft.api.GraftSession(spark).permutation(500, seed = 7L)
        .sortValues(Seq("pos")).df
    },

    // --- §2.10/§2.14 the elementwise ufunc surface (reference
    //     mars/dataframe/arithmetic/ — one operand per function), routed
    //     through the graft.functions.Ufuncs registry. libm-dependent
    //     outputs are round(…,6)+0.0 per convention; DuckDB lacks the
    //     hyperbolic/expm1/log1p builtins, so the oracle replays their
    //     exp/ln composites (equal at 6 decimals). Integer / comparison
    //     ufuncs compare exactly.
    Q("op_ufunc_math",
      """SELECT l_orderkey, l_linenumber, p, q, x,
        |  abs(x) AS u_abs,
        |  CAST(sign(x) AS BIGINT) AS u_sign,
        |  CAST(ceil(x * 10.0) AS BIGINT) AS u_ceil,
        |  CAST(floor(x * 10.0) AS BIGINT) AS u_floor,
        |  round(sqrt(q), 6) + CAST(0.0 AS DOUBLE) AS u_sqrt,
        |  round(cbrt(q), 6) + CAST(0.0 AS DOUBLE) AS u_cbrt,
        |  round(exp(x), 6) + CAST(0.0 AS DOUBLE) AS u_exp,
        |  round(exp(x) - 1.0, 6) + CAST(0.0 AS DOUBLE) AS u_expm1,
        |  round(ln(q), 6) + CAST(0.0 AS DOUBLE) AS u_log,
        |  round(log2(q), 6) + CAST(0.0 AS DOUBLE) AS u_log2,
        |  round(log10(q), 6) + CAST(0.0 AS DOUBLE) AS u_log10,
        |  round(ln(1.0 + x), 6) + CAST(0.0 AS DOUBLE) AS u_log1p,
        |  round(sin(x), 6) + CAST(0.0 AS DOUBLE) AS u_sin,
        |  round(cos(x), 6) + CAST(0.0 AS DOUBLE) AS u_cos,
        |  round(tan(x), 6) + CAST(0.0 AS DOUBLE) AS u_tan,
        |  round(asin(x), 6) + CAST(0.0 AS DOUBLE) AS u_arcsin,
        |  round(acos(x), 6) + CAST(0.0 AS DOUBLE) AS u_arccos,
        |  round(atan(x), 6) + CAST(0.0 AS DOUBLE) AS u_arctan,
        |  round(atan2(x, 2.0), 6) + CAST(0.0 AS DOUBLE) AS u_arctan2,
        |  round((exp(x) - exp(-x)) / 2.0, 6) + CAST(0.0 AS DOUBLE) AS u_sinh,
        |  round((exp(x) + exp(-x)) / 2.0, 6) + CAST(0.0 AS DOUBLE) AS u_cosh,
        |  round((exp(2.0 * x) - 1.0) / (exp(2.0 * x) + 1.0), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_tanh,
        |  round(ln(x + sqrt(x * x + 1.0)), 6) + CAST(0.0 AS DOUBLE) AS u_arcsinh,
        |  round(ln((1.0 + q / 100.0) + sqrt((1.0 + q / 100.0) * (1.0 + q / 100.0) - 1.0)), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_arccosh,
        |  round(0.5 * ln((1.0 + x) / (1.0 - x)), 6) + CAST(0.0 AS DOUBLE) AS u_arctanh,
        |  round(degrees(x), 6) + CAST(0.0 AS DOUBLE) AS u_degrees,
        |  round(radians(x), 6) + CAST(0.0 AS DOUBLE) AS u_radians,
        |  round(pow(q, 1.5), 6) + CAST(0.0 AS DOUBLE) AS u_power,
        |  round(pow(2.0, x), 6) + CAST(0.0 AS DOUBLE) AS u_exp2,
        |  CAST(p // 7 AS BIGINT) AS u_floordiv,
        |  CAST(p % 7 AS BIGINT) AS u_mod,
        |  CAST(p & 255 AS BIGINT) AS u_and,
        |  CAST(p | 255 AS BIGINT) AS u_or,
        |  CAST(xor(p, 255) AS BIGINT) AS u_xor,
        |  CAST(~p AS BIGINT) AS u_invert,
        |  x < 0 AS u_less, q >= 25 AS u_ge
        |FROM (SELECT l_orderkey, l_linenumber,
        |        l_discount - 0.05 AS x, CAST(l_quantity AS DOUBLE) AS q,
        |        CAST(l_partkey AS BIGINT) AS p
        |      FROM lineitem WHERE l_orderkey < 600) base
        |ORDER BY l_orderkey, l_linenumber, p, q, x""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_discount" - 0.05).as("x"),
          $"l_quantity".cast("double").as("q"),
          $"l_partkey".cast("long").as("p"))
      base.select($"l_orderkey", $"l_linenumber", $"p", $"q", $"x",
        Ufuncs("abs")($"x").as("u_abs"),
        Ufuncs("sign")($"x").cast("long").as("u_sign"),
        Ufuncs("ceil")($"x" * 10.0).cast("long").as("u_ceil"),
        Ufuncs("floor")($"x" * 10.0).cast("long").as("u_floor"),
        r6(Ufuncs("sqrt")($"q")).as("u_sqrt"),
        r6(Ufuncs("cbrt")($"q")).as("u_cbrt"),
        r6(Ufuncs("exp")($"x")).as("u_exp"),
        r6(Ufuncs("expm1")($"x")).as("u_expm1"),
        r6(Ufuncs("log")($"q")).as("u_log"),
        r6(Ufuncs("log2")($"q")).as("u_log2"),
        r6(Ufuncs("log10")($"q")).as("u_log10"),
        r6(Ufuncs("log1p")($"x")).as("u_log1p"),
        r6(Ufuncs("sin")($"x")).as("u_sin"),
        r6(Ufuncs("cos")($"x")).as("u_cos"),
        r6(Ufuncs("tan")($"x")).as("u_tan"),
        r6(Ufuncs("arcsin")($"x")).as("u_arcsin"),
        r6(Ufuncs("arccos")($"x")).as("u_arccos"),
        r6(Ufuncs("arctan")($"x")).as("u_arctan"),
        r6(Ufuncs("arctan2", $"x", lit(2.0))).as("u_arctan2"),
        r6(Ufuncs("sinh")($"x")).as("u_sinh"),
        r6(Ufuncs("cosh")($"x")).as("u_cosh"),
        r6(Ufuncs("tanh")($"x")).as("u_tanh"),
        r6(Ufuncs("arcsinh")($"x")).as("u_arcsinh"),
        r6(Ufuncs("arccosh")(lit(1.0) + $"q" / 100.0)).as("u_arccosh"),
        r6(Ufuncs("arctanh")($"x")).as("u_arctanh"),
        r6(Ufuncs("degrees")($"x")).as("u_degrees"),
        r6(Ufuncs("radians")($"x")).as("u_radians"),
        r6(Ufuncs("power", $"q", lit(1.5))).as("u_power"),
        r6(Ufuncs("exp2")($"x")).as("u_exp2"),
        Ufuncs("floordiv_int", $"p", lit(7L)).as("u_floordiv"),
        Ufuncs("mod", $"p", lit(7L)).cast("long").as("u_mod"),
        Ufuncs("bitwise_and", $"p", lit(255L)).cast("long").as("u_and"),
        Ufuncs("bitwise_or", $"p", lit(255L)).cast("long").as("u_or"),
        Ufuncs("bitwise_xor", $"p", lit(255L)).cast("long").as("u_xor"),
        Ufuncs("invert")($"p").cast("long").as("u_invert"),
        Ufuncs("less", $"x", lit(0.0)).as("u_less"),
        Ufuncs("greater_equal", $"q", lit(25.0)).as("u_ge"))
        .orderBy($"l_orderkey", $"l_linenumber", $"p", $"q", $"x")
    },

    // --- §2.10/§2.14 ufunc surface, part 2 (the remaining
    //     mars/tensor/arithmetic operands: square.py, reciprocal.py,
    //     fabs.py, rint.py, trunc.py/fix.py, signbit.py, sinc.py,
    //     maximum/minimum/fmax/fmin, hypot.py, logaddexp(.py/2.py),
    //     copysign.py, fmod.py, float_power.py, lshift/rshift,
    //     logical_*.py, isclose.py, nan_to_num.py, isfinite.py).
    //     Exact-arith outputs compare unrounded; libm composites round
    //     6. rint probes q/7 (never a .5 tie — 2q = 7·odd has no integer
    //     solution), so DuckDB's half-away round agrees with Spark's
    //     half-even rint; the tie semantics pin in UfuncsSpec. trunc of
    //     a negative can be −0.0 in DuckDB but +0 via Spark's long ceil
    //     → both sides append +0.0 per the signed-zero convention.
    Q("op_ufunc_math2",
      """SELECT l_orderkey, l_linenumber, p, q, x,
        |  x * x AS u_square,
        |  CAST(1.0 AS DOUBLE) / q AS u_reciprocal,
        |  abs(x) AS u_fabs,
        |  CAST(round(q / 7.0) AS BIGINT) AS u_rint,
        |  trunc(-q / 7.0) + CAST(0.0 AS DOUBLE) AS u_trunc,
        |  x < 0 AS u_signbit,
        |  round(CASE WHEN x = 0 THEN CAST(1.0 AS DOUBLE)
        |             ELSE sin(pi() * x) / (pi() * x) END, 6)
        |    + CAST(0.0 AS DOUBLE) AS u_sinc,
        |  greatest(q, CAST(p % 50 AS DOUBLE)) AS u_max,
        |  least(q, CAST(p % 50 AS DOUBLE)) AS u_min,
        |  round(sqrt(x * x + (q / 10.0) * (q / 10.0)), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_hypot,
        |  round(greatest(x, q / 50.0)
        |    + ln(1.0 + exp(-abs(x - q / 50.0))), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_logaddexp,
        |  round(greatest(x, q / 50.0)
        |    + log2(1.0 + pow(2.0, -abs(x - q / 50.0))), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_logaddexp2,
        |  CASE WHEN x < 0 THEN -abs(q) ELSE abs(q) END AS u_copysign,
        |  fmod(q, 7.0) AS u_fmod,
        |  round(pow(q, 0.3), 6) + CAST(0.0 AS DOUBLE) AS u_fpow,
        |  CAST((p & 255) << 3 AS BIGINT) AS u_lshift,
        |  CAST(p >> 2 AS BIGINT) AS u_rshift,
        |  (x < 0 AND q >= 25) AS u_land,
        |  (x < 0 OR q >= 25) AS u_lor,
        |  (x < 0) <> (q >= 25) AS u_lxor,
        |  NOT (x < 0) AS u_lnot,
        |  abs(q - q * (CAST(1.0 AS DOUBLE) + CAST(0.000001 AS DOUBLE)))
        |    <= CAST(0.00000001 AS DOUBLE)
        |       + CAST(0.00001 AS DOUBLE)
        |         * abs(q * (CAST(1.0 AS DOUBLE) + CAST(0.000001 AS DOUBLE))) AS u_close,
        |  abs(q - (q + 1.0)) <= CAST(0.00000001 AS DOUBLE)
        |    + CAST(0.00001 AS DOUBLE) * abs(q + 1.0) AS u_far,
        |  x AS u_n2n,
        |  true AS u_finite
        |FROM (SELECT l_orderkey, l_linenumber,
        |        l_discount - 0.05 AS x, CAST(l_quantity AS DOUBLE) AS q,
        |        CAST(l_partkey AS BIGINT) AS p
        |      FROM lineitem WHERE l_orderkey < 600) base
        |ORDER BY l_orderkey, l_linenumber, p, q, x""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_discount" - 0.05).as("x"),
          $"l_quantity".cast("double").as("q"),
          $"l_partkey".cast("long").as("p"))
      base.select($"l_orderkey", $"l_linenumber", $"p", $"q", $"x",
        Ufuncs("square")($"x").as("u_square"),
        Ufuncs("reciprocal")($"q").as("u_reciprocal"),
        Ufuncs("fabs")($"x").as("u_fabs"),
        Ufuncs("rint")($"q" / 7.0).cast("long").as("u_rint"),
        (Ufuncs("trunc")(-$"q" / 7.0) + lit(0.0)).as("u_trunc"),
        Ufuncs("signbit")($"x").as("u_signbit"),
        r6(Ufuncs("sinc")($"x")).as("u_sinc"),
        Ufuncs("maximum", $"q", ($"p" % 50).cast("double")).as("u_max"),
        Ufuncs("minimum", $"q", ($"p" % 50).cast("double")).as("u_min"),
        r6(Ufuncs("hypot", $"x", $"q" / 10.0)).as("u_hypot"),
        r6(Ufuncs("logaddexp", $"x", $"q" / 50.0)).as("u_logaddexp"),
        r6(Ufuncs("logaddexp2", $"x", $"q" / 50.0)).as("u_logaddexp2"),
        Ufuncs("copysign", $"q", $"x").as("u_copysign"),
        Ufuncs("fmod", $"q", lit(7.0)).as("u_fmod"),
        r6(Ufuncs("float_power", $"q", lit(0.3))).as("u_fpow"),
        Ufuncs("lshift", $"p".bitwiseAND(lit(255L)), lit(3)).as("u_lshift"),
        Ufuncs("rshift", $"p", lit(2)).as("u_rshift"),
        Ufuncs("logical_and", $"x" < 0, $"q" >= 25).as("u_land"),
        Ufuncs("logical_or", $"x" < 0, $"q" >= 25).as("u_lor"),
        Ufuncs("logical_xor", $"x" < 0, $"q" >= 25).as("u_lxor"),
        Ufuncs("logical_not")($"x" < 0).as("u_lnot"),
        Ufuncs("isclose", $"q", $"q" * (lit(1.0) + lit(1e-6))).as("u_close"),
        Ufuncs("isclose", $"q", $"q" + 1.0).as("u_far"),
        Ufuncs("nan_to_num")($"x").as("u_n2n"),
        Ufuncs("isfinite")($"x").as("u_finite"))
        .orderBy($"l_orderkey", $"l_linenumber", $"p", $"q", $"x")
    },

    // --- §2.14 scipy.special gamma family (mars/tensor/special/
    //     gamma_funcs.py) as pure Column arithmetic (Special.scala,
    //     Lanczos g=7 — no UDF). DuckDB has native lgamma/gamma; the two
    //     approximations agree to ~1e-12, well inside round 6 (same
    //     accepted libm-boundary risk class as op_ufunc_math). gammasgn
    //     is exact integer logic on both sides. Args: q ∈ [1,50] for
    //     lgamma; s = q/8+0.25 small so Γ(s) stays far from double
    //     round-6 granularity; m = (5−q)/2 sweeps negative integers and
    //     half-integers for the sign.
    // --- §2.14 scipy.special erfinv/erfcinv (err_fresnel.py): routed
    //     through the engine-portable Acklam Φ⁻¹ (erfinv(x) =
    //     Φ⁻¹((x+1)/2)/√2), so central-branch values are pure rational
    //     arithmetic and tail branches share the identical ln/sqrt
    //     shape — round 6 + signed-zero guard (erfinv(0) = ±0). x sweeps
    //     the central branch, x2 the upper tail, y the erfcinv domain.
    Q("op_special_erfinv", {
      val D = graft.functions.Distributions
      val rt2 = math.sqrt(2.0).toString
      s"""SELECT l_orderkey, l_linenumber, x,
         |  round(${D.sqlNormalInv("(x + 1.0) / 2.0")}
         |        / CAST('$rt2' AS DOUBLE), 6) + CAST(0.0 AS DOUBLE) AS einv,
         |  round(${D.sqlNormalInv("(x2 + 1.0) / 2.0")}
         |        / CAST('$rt2' AS DOUBLE), 6) + CAST(0.0 AS DOUBLE) AS einv_tail,
         |  round(${D.sqlNormalInv("((1.0 - (y)) + 1.0) / 2.0")}
         |        / CAST('$rt2' AS DOUBLE), 6) + CAST(0.0 AS DOUBLE) AS ecinv
         |FROM (SELECT l_orderkey, l_linenumber,
         |        l_discount * 10.0 - 0.5 AS x,
         |        0.98 + l_discount / 10.0 AS x2,
         |        CAST(l_quantity AS DOUBLE) / 50.0 AS y
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, x""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Special, Ufuncs}
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_discount" * 10.0 - 0.5).as("x"),
          (lit(0.98) + $"l_discount" / 10.0).as("x2"),
          ($"l_quantity".cast("double") / 50.0).as("y"))
        .select($"l_orderkey", $"l_linenumber", $"x",
          r6(Ufuncs("erfinv")($"x")).as("einv"),
          r6(Special.erfinv($"x2")).as("einv_tail"),
          r6(Ufuncs("erfcinv")($"y")).as("ecinv"))
        .orderBy($"l_orderkey", $"l_linenumber", $"x")
    },

    Q("op_special_gamma",
      """SELECT l_orderkey, l_linenumber, q,
        |  round(lgamma(q), 6) + CAST(0.0 AS DOUBLE) AS u_gammaln,
        |  round(gamma(q / 8.0 + 0.25), 6) + CAST(0.0 AS DOUBLE) AS u_gamma,
        |  round(lgamma(q / 8.0 + 0.25) + lgamma(2.5) - lgamma(q / 8.0 + 0.25 + 2.5), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_betaln,
        |  CAST(CASE WHEN (5.0 - q) / 2.0 > 0.0 THEN 1
        |            WHEN (5.0 - q) / 2.0 = floor((5.0 - q) / 2.0) THEN 0
        |            WHEN mod(CAST(floor((5.0 - q) / 2.0) AS BIGINT), 2) = 0 THEN 1
        |            ELSE -1 END AS BIGINT) AS u_gammasgn
        |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q
        |      FROM lineitem WHERE l_orderkey < 600) base
        |ORDER BY l_orderkey, l_linenumber, q""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity".cast("double").as("q"))
      base.select($"l_orderkey", $"l_linenumber", $"q",
        r6(Ufuncs("gammaln")($"q")).as("u_gammaln"),
        r6(Ufuncs("gamma")($"q" / 8.0 + 0.25)).as("u_gamma"),
        r6(Ufuncs("betaln", $"q" / 8.0 + 0.25, lit(2.5))).as("u_betaln"),
        Ufuncs("gammasgn")((lit(5.0) - $"q") / 2.0).cast("long").as("u_gammasgn"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 scipy.special psi family completion (gamma_funcs.py psi/
    //     polygamma/poch/rgamma/multigammaln): x = q/8 + 0.5 and
    //     a = q/4 + 2 are exact dyadic rationals > 0.5, so every gammaln
    //     stays on the direct Lanczos branch and both engines replay the
    //     identical shift-by-8 / series / Lanczos op shapes
    //     (sqlDigammaPos / sqlTrigammaPos / sqlGammalnPos mirrors);
    //     libm enters only through ln/exp of identical inputs → round 6.
    Q("op_special_psi", {
      import graft.functions.Special
      val psi = Special.sqlDigammaPos("x")
      val tri = Special.sqlTrigammaPos("x")
      val lgX = Special.sqlGammalnPos("x")
      val lgXm = Special.sqlGammalnPos("(x + 3.5)")
      val mvg = Seq("(a + 0.0)", "(a + -0.5)", "(a + -1.0)")
        .map(Special.sqlGammalnPos).mkString(" + ")
      val mvgC = 3.0 * 2.0 / 4.0 * math.log(math.Pi)
      s"""WITH base AS (SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_quantity AS DOUBLE) / 8.0 + 0.5 AS x,
        |    CAST(l_quantity AS DOUBLE) / 4.0 + 2.0 AS a
        |  FROM lineitem WHERE l_orderkey < 600)
        |SELECT l_orderkey, l_linenumber, q,
        |  round($psi, 6) + CAST(0.0 AS DOUBLE) AS u_psi,
        |  round($tri, 6) + CAST(0.0 AS DOUBLE) AS u_trigamma,
        |  round(exp(($lgXm) - ($lgX)), 6) + CAST(0.0 AS DOUBLE) AS u_poch,
        |  round(1.0 * exp(-($lgX)), 6) + CAST(0.0 AS DOUBLE) AS u_rgamma,
        |  round($mvg + CAST('$mvgC' AS DOUBLE), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_mvgammaln
        |FROM base ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Special, Ufuncs}
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 8.0 + 0.5).as("x"),
          ($"l_quantity".cast("double") / 4.0 + 2.0).as("a"))
      base.select($"l_orderkey", $"l_linenumber", $"q",
        r6(Ufuncs("psi")($"x")).as("u_psi"),
        r6(Ufuncs("trigamma")($"x")).as("u_trigamma"),
        r6(Ufuncs("poch", $"x", lit(3.5))).as("u_poch"),
        r6(Ufuncs("rgamma")($"x")).as("u_rgamma"),
        r6(Special.multigammaln($"a", 3)).as("u_mvgammaln"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 scipy.special information theory (info_theory.py +
    //     convenience.py xlogy/xlog1py): probabilities p1 = q/64,
    //     p2 = (51−q)/64 are EXACT binary fractions, so both engines see
    //     bit-identical inputs; the ln composites mirror the operator
    //     shapes → round 6.
    Q("op_special_info",
      """SELECT l_orderkey, l_linenumber, q,
        |  round(-(q / 64.0) * ln(q / 64.0), 6) + CAST(0.0 AS DOUBLE) AS u_entr,
        |  round((q / 64.0) * ln((q / 64.0) / ((51.0 - q) / 64.0)), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_rel_entr,
        |  round((q / 64.0) * ln((q / 64.0) / ((51.0 - q) / 64.0)) - q / 64.0
        |        + (51.0 - q) / 64.0, 6) + CAST(0.0 AS DOUBLE) AS u_kl_div,
        |  round((q / 64.0) * ln((51.0 - q) / 64.0), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_xlogy,
        |  round((q / 64.0) * ln(1.0 + (51.0 - q) / 64.0), 6)
        |    + CAST(0.0 AS DOUBLE) AS u_xlog1py
        |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q
        |      FROM lineitem WHERE l_orderkey < 600) base
        |ORDER BY l_orderkey, l_linenumber, q""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity".cast("double").as("q"))
      val p1 = $"q" / 64.0
      val p2 = (lit(51.0) - $"q") / 64.0
      base.select($"l_orderkey", $"l_linenumber", $"q",
        r6(Ufuncs("entr")(p1)).as("u_entr"),
        r6(Ufuncs("rel_entr", p1, p2)).as("u_rel_entr"),
        r6(Ufuncs("kl_div", p1, p2)).as("u_kl_div"),
        r6(Ufuncs("xlogy", p1, p2)).as("u_xlogy"),
        r6(Ufuncs("xlog1py", p1, p2)).as("u_xlog1py"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 scipy.special Bessel family (bessel.py j0/j1/y0/y1/
    //     i0/i1/k0/k1): A&S 9.4/9.8 polynomial approximations — the SQL
    //     side replays the IDENTICAL Horner + branch shape via the
    //     Special.sqlBessel* mirrors, so the only divergence channel is
    //     libm (cos/sin/ln/exp) on identical inputs → round 6 (+0.0:
    //     the oscillatory J/Y cross zero). Arguments: x = q/4 − 6.125
    //     (signed, never 0, crosses ±3 off-grid), xp = q/4 (positive,
    //     crosses the 2 and 3 branch points exactly ON grid at q∈{8,12}
    //     — same double, same `<` verdict both engines), xi = (q−25)/4
    //     (signed, crosses ±3.75 on grid at q∈{10,40}). Magnitudes stay
    //     ≤ I0(6.25) ≈ 90, keeping absolute round-6 far above libm ulp.
    Q("op_special_bessel", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlBesselJ0("x")}, 6) + CAST(0.0 AS DOUBLE) AS b_j0,
         |  round(${S.sqlBesselJ1("x")}, 6) + CAST(0.0 AS DOUBLE) AS b_j1,
         |  round(${S.sqlBesselY0("xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_y0,
         |  round(${S.sqlBesselY1("xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_y1,
         |  round(${S.sqlBesselI0("xi")}, 6) + CAST(0.0 AS DOUBLE) AS b_i0,
         |  round(${S.sqlBesselI1("xi")}, 6) + CAST(0.0 AS DOUBLE) AS b_i1,
         |  round(${S.sqlBesselK0("xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_k0,
         |  round(${S.sqlBesselK1("xp")}, 6) + CAST(0.0 AS DOUBLE) AS b_k1
         |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 4.0 - 6.125 AS x,
         |        CAST(l_quantity AS DOUBLE) / 4.0 AS xp,
         |        (CAST(l_quantity AS DOUBLE) - 25.0) / 4.0 AS xi
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 4.0 - 6.125).as("x"),
          ($"l_quantity".cast("double") / 4.0).as("xp"),
          (($"l_quantity".cast("double") - 25.0) / 4.0).as("xi"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Ufuncs("j0")($"x")).as("b_j0"),
          r6(Ufuncs("j1")($"x")).as("b_j1"),
          r6(Ufuncs("y0")($"xp")).as("b_y0"),
          r6(Ufuncs("y1")($"xp")).as("b_y1"),
          r6(Ufuncs("i0")($"xi")).as("b_i0"),
          r6(Ufuncs("i1")($"xi")).as("b_i1"),
          r6(Ufuncs("k0")($"xp")).as("b_k0"),
          r6(Ufuncs("k1")($"xp")).as("b_k1"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 Fresnel S/C, Dawson, erfi (err_fresnel.py fresnel/
    //     dawsn/erfi): fixed-degree series + asymptotic compositions
    //     with the branch at |x| = 4 — the SQL side replays the same
    //     Horner/branch shape (Special.sqlFresnel*/sqlDawsn/sqlErfi),
    //     libm enters only via sin/cos/exp of identical inputs →
    //     round 6 (+0.0: the oscillatory C/S and odd dawsn cross zero).
    //     x = q/4 − 6.125 (signed, never 0, crosses ±4 off-grid);
    //     erfi over xe = q/20 ∈ [0.05, 2.5] keeps exp(x²) ≤ e^6.25 so
    //     absolute round-6 stays far above ulp noise.
    Q("op_special_fresnel", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlFresnelC("x")}, 6) + CAST(0.0 AS DOUBLE) AS f_c,
         |  round(${S.sqlFresnelS("x")}, 6) + CAST(0.0 AS DOUBLE) AS f_s,
         |  round(${S.sqlDawsn("x")}, 6) + CAST(0.0 AS DOUBLE) AS f_daw,
         |  round(${S.sqlErfi("xe")}, 6) + CAST(0.0 AS DOUBLE) AS f_erfi
         |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 4.0 - 6.125 AS x,
         |        CAST(l_quantity AS DOUBLE) / 20.0 AS xe
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 4.0 - 6.125).as("x"),
          ($"l_quantity".cast("double") / 20.0).as("xe"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Ufuncs("fresnel_c")($"x")).as("f_c"),
          r6(Ufuncs("fresnel_s")($"x")).as("f_s"),
          r6(Ufuncs("dawsn")($"x")).as("f_daw"),
          r6(Ufuncs("erfi")($"xe")).as("f_erfi"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 Airy Ai/Ai′/Bi/Bi′ (airy.py): Maclaurin compositions
    //     inside the |x| ≤ 6 window, identical series shape both sides
    //     → round 6 (+0.0: Ai/Bi oscillate through zero on the negative
    //     axis). x = q/8 − 3.2 sweeps the oscillatory side, x2 = q/10
    //     the positive decay/growth side.
    Q("op_special_airy", {
      val S = graft.functions.Special
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(${S.sqlAiryAi("x")}, 6) + CAST(0.0 AS DOUBLE) AS a_ai,
         |  round(${S.sqlAiryAip("x")}, 6) + CAST(0.0 AS DOUBLE) AS a_aip,
         |  round(${S.sqlAiryBi("x")}, 6) + CAST(0.0 AS DOUBLE) AS a_bi,
         |  round(${S.sqlAiryBip("x")}, 6) + CAST(0.0 AS DOUBLE) AS a_bip,
         |  round(${S.sqlAiryAi("x2")}, 6) + CAST(0.0 AS DOUBLE) AS a_ai_pos,
         |  round(${S.sqlAiryBi("x2")}, 6) + CAST(0.0 AS DOUBLE) AS a_bi_pos
         |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS q,
         |        CAST(l_quantity AS DOUBLE) / 8.0 - 3.2 AS x,
         |        CAST(l_quantity AS DOUBLE) / 10.0 AS x2
         |      FROM lineitem WHERE l_orderkey < 600) base
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 8.0 - 3.2).as("x"),
          ($"l_quantity".cast("double") / 10.0).as("x2"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Ufuncs("airy_ai")($"x")).as("a_ai"),
          r6(Ufuncs("airy_aip")($"x")).as("a_aip"),
          r6(Ufuncs("airy_bi")($"x")).as("a_bi"),
          r6(Ufuncs("airy_bip")($"x")).as("a_bip"),
          r6(Ufuncs("airy_ai")($"x2")).as("a_ai_pos"),
          r6(Ufuncs("airy_bi")($"x2")).as("a_bi_pos"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 regularized incomplete gamma P/Q (gamma_funcs.py
    //     gammainc/gammaincc): fixed-depth series/CF compositions with
    //     the identical inside-out shape both sides (Special.scala) →
    //     round 6. a = q/8 + 0.5 keeps the Lanczos direct branch;
    //     x = q/3 crosses the series/CF switch at x = a+1. The KS
    //     survival function rides along over λ = q/16 (20-term
    //     alternating series, ks.py two-sided p).
    Q("op_special_gammainc", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 8.0 + 0.5 AS ga, " +
        "CAST(l_quantity AS DOUBLE) / 3.0 AS gx, " +
        "CAST(l_quantity AS DOUBLE) / 16.0 AS lam " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val staged = S.sqlGammaincPQ(inner, Seq(("g", "ga", "gx")),
        Seq("l_orderkey", "l_linenumber", "q", "lam"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(g_p_g, 6) + CAST(0.0 AS DOUBLE) AS g_p,
         |  round(g_q_g, 6) + CAST(0.0 AS DOUBLE) AS g_q,
         |  round(${S.sqlKolmogorovSfFixed("lam")}, 6) + CAST(0.0 AS DOUBLE) AS ks_sf
         |FROM ($staged)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 8.0 + 0.5).as("ga"),
          ($"l_quantity".cast("double") / 3.0).as("gx"),
          ($"l_quantity".cast("double") / 16.0).as("lam"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.gammaincPFast(spark, $"ga", $"gx")).as("g_p"),
          r6(Special.gammaincQFast(spark, $"ga", $"gx")).as("g_q"),
          r6(Special.kolmogorovSfFixedFast(spark, $"lam")).as("ks_sf"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 regularized incomplete beta I_x(a,b) (gamma_funcs.py
    //     betainc): the classical CF, 80 d-terms unrolled bottom-up,
    //     symmetry switch at x = (a+1)/(a+b+2) — identical shape both
    //     sides → round 6. Sweeps both branches (x = q/64 against the
    //     switch point) and asymmetric (a, b) pairs.
    Q("op_special_betainc", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 8.0 + 0.5 AS ba, " +
        "(51.0 - CAST(l_quantity AS DOUBLE)) / 8.0 + 0.5 AS bb, " +
        "CAST(l_quantity AS DOUBLE) / 64.0 AS bx " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val staged = S.sqlBetaincStaged(inner,
        Seq(("a", "ba", "bb", "bx"), ("s", "bb", "ba", "bx")),
        Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(bi_a, 6) + CAST(0.0 AS DOUBLE) AS bi,
         |  round(bi_s, 6) + CAST(0.0 AS DOUBLE) AS bi_swap
         |FROM ($staged)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 8.0 + 0.5).as("ba"),
          ((lit(51.0) - $"l_quantity".cast("double")) / 8.0 + 0.5).as("bb"),
          ($"l_quantity".cast("double") / 64.0).as("bx"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.betaincRegFast(spark, $"ba", $"bb", $"bx")).as("bi"),
          r6(Special.betaincRegFast(spark, $"bb", $"ba", $"bx")).as("bi_swap"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 windowed hypergeometric ₂F₁/₁F₁
    //     (hypergeometric_funcs.py hyp2f1/hyp1f1): fixed-depth nested
    //     series, staged SQL mirrors — identical term shapes both
    //     sides → round 6. x₂F₁ = (q−25)/75 ∈ [−0.32, 0.33] stays well
    //     inside the 0.7 window; x₁F₁ = (q−25.5)/5 sweeps ±4.9
    //     (negative-x cancellation ≤ ~1e-7 relative, inside round 6).
    Q("op_special_hyp", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) AS q, " +
        "CAST(l_quantity AS DOUBLE) / 16.0 AS ha, " +
        "CAST(1.5 AS DOUBLE) AS hb, " +
        "CAST(l_quantity AS DOUBLE) / 10.0 + 1.0 AS hc, " +
        "(CAST(l_quantity AS DOUBLE) - 25.0) / 75.0 AS hx, " +
        "CAST(l_quantity AS DOUBLE) / 8.0 + 0.5 AS ka, " +
        "CAST(l_quantity AS DOUBLE) / 10.0 + 1.5 AS kb, " +
        "(CAST(l_quantity AS DOUBLE) - 25.5) / 5.0 AS kx " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val staged = S.sqlHypStaged(inner,
        gauss = Seq(("g", "ha", "hb", "hc", "hx")),
        kummer = Seq(("k", "ka", "kb", "kx")),
        carry = Seq("l_orderkey", "l_linenumber", "q"))
      s"""SELECT l_orderkey, l_linenumber, q,
         |  round(h2_g, 6) + CAST(0.0 AS DOUBLE) AS hyp2f1,
         |  round(h1_k, 6) + CAST(0.0 AS DOUBLE) AS hyp1f1
         |FROM ($staged)
         |ORDER BY l_orderkey, l_linenumber, q""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("q"),
          ($"l_quantity".cast("double") / 16.0).as("ha"),
          lit(1.5).cast("double").as("hb"),
          ($"l_quantity".cast("double") / 10.0 + 1.0).as("hc"),
          (($"l_quantity".cast("double") - 25.0) / 75.0).as("hx"),
          ($"l_quantity".cast("double") / 8.0 + 0.5).as("ka"),
          ($"l_quantity".cast("double") / 10.0 + 1.5).as("kb"),
          (($"l_quantity".cast("double") - 25.5) / 5.0).as("kx"))
        .select($"l_orderkey", $"l_linenumber", $"q",
          r6(Special.hyp2f1($"ha", $"hb", $"hc", $"hx")).as("hyp2f1"),
          r6(Special.hyp1f1($"ka", $"kb", $"kx")).as("hyp1f1"))
        .orderBy($"l_orderkey", $"l_linenumber", $"q")
    },

    // --- §2.14 complete elliptic integrals K(m)/E(m)
    //     (ellip_func_integrals.py ellipk/ellipe): eight unrolled AGM
    //     steps of pure IEEE +·/√ — bit-identical across engines, so
    //     the doubles are compared UNROUNDED (the strongest form of the
    //     oracle; any divergence fails loudly). m₁ = q/64 and
    //     m₂ = (q+12)/64 are exact binary fractions in [1/64, 62/64].
    Q("op_special_ellip", {
      val S = graft.functions.Special
      val inner = "(SELECT l_orderkey, l_linenumber, " +
        "CAST(l_quantity AS DOUBLE) / 64.0 AS m1, " +
        "(CAST(l_quantity AS DOUBLE) + 12.0) / 64.0 AS m2 " +
        "FROM lineitem WHERE l_orderkey < 600)"
      val staged = S.sqlEllipKE(inner, Seq("lo" -> "m1", "hi" -> "m2"),
        Seq("l_orderkey", "l_linenumber"))
      s"""SELECT l_orderkey, l_linenumber, m_lo, m_hi,
         |  ell_k_lo, ell_e_lo, ell_k_hi, ell_e_hi
         |FROM ($staged)
         |ORDER BY l_orderkey, l_linenumber, m_lo""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Special
      val base = t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_quantity".cast("double") / 64.0).as("m_lo"),
          (($"l_quantity".cast("double") + 12.0) / 64.0).as("m_hi"))
      val (kLo, eLo) = Special.ellipKE($"m_lo")
      val (kHi, eHi) = Special.ellipKE($"m_hi")
      base.select($"l_orderkey", $"l_linenumber", $"m_lo", $"m_hi",
        kLo.as("ell_k_lo"), eLo.as("ell_e_lo"),
        kHi.as("ell_k_hi"), eHi.as("ell_e_hi"))
        .orderBy($"l_orderkey", $"l_linenumber", $"m_lo")
    },

    // --- §2.14 frame dot product (reference arithmetic/dot.py): tall
    //     (supplier × 3 features) · small (3 × 2 weights). The A entries go
    //     through the DECIMAL sum convention so both engines agree
    //     bit-exactly on the inputs; the 3-term dot itself sums doubles in
    //     engine order → round 6 (+0.0: weights carry mixed signs).
    Q("op_frame_dot",
      """WITH a AS (
        |  SELECT l_suppkey AS id,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS disc
        |  FROM lineitem WHERE l_suppkey < 200 GROUP BY l_suppkey)
        |SELECT id,
        |  round(qty * CAST(0.5 AS DOUBLE) + price * CAST(0.001 AS DOUBLE)
        |        + disc * CAST(10.0 AS DOUBLE), 6) + CAST(0.0 AS DOUBLE) AS score_a,
        |  round(qty * CAST(-1.0 AS DOUBLE) + price * CAST(0.0002 AS DOUBLE)
        |        + disc * CAST(0.0 AS DOUBLE), 6) + CAST(0.0 AS DOUBLE) AS score_b
        |FROM a ORDER BY id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = graft.api.GraftFrame(
        t(spark, dir, "lineitem").filter($"l_suppkey" < 200)
          .groupBy($"l_suppkey".as("id"))
          .agg(sum(dec12($"l_quantity")).cast("double").as("qty"),
            sum(dec12($"l_extendedprice")).cast("double").as("price"),
            sum(dec12($"l_discount")).cast("double").as("disc")))
      val b = graft.api.GraftFrame(Seq(
        ("qty", 0.5, -1.0), ("price", 0.001, 0.0002), ("disc", 10.0, 0.0))
        .toDF("key", "score_a", "score_b"))
      a.dot(b, "id", "key")
        .assign(
          "score_a" -> (round(col("score_a"), 6) + lit(0.0)),
          "score_b" -> (round(col("score_b"), 6) + lit(0.0)))
        .sortValues(Seq("id")).df
    },

    // --- §2.3 memory_usage(deep) (reference base/memory_usage.py): strings
    //     sum byte lengths, fixed-width types count × width — exact integer
    //     arithmetic on both engines.
    Q("op_memory_usage",
      """SELECT * FROM (
        |  SELECT 'n_nationkey' AS "column",
        |         4 * COUNT(n_nationkey) AS bytes FROM nation
        |  UNION ALL
        |  SELECT 'n_name', CAST(SUM(octet_length(CAST(n_name AS BLOB))) AS BIGINT)
        |  FROM nation
        |  UNION ALL
        |  SELECT 'n_regionkey', 4 * COUNT(n_regionkey) FROM nation) u
        |ORDER BY "column"""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "nation").memoryUsage()
        .orderBy(org.apache.spark.sql.functions.col("column"))
    },

    // --- §2.5 tensor-reduction tail: argmax/argmin (pandas idxmax/idxmin),
    //     count_nonzero, 2nd/3rd central moments. idxmax ties break to the
    //     LARGEST id (struct max), idxmin to the smallest — replayed in the
    //     oracle by max-value-then-max-id two-phase joins. Moments are
    //     raw-moment sums (round 6 + 0.0: the 3rd moment can sit at ±0).
    Q("op_idx_agg",
      """WITH base AS (
        |  SELECT l_returnflag AS k, l_quantity AS v, l_orderkey AS id,
        |         l_discount AS d
        |  FROM lineitem),
        |mx AS (SELECT k, max(v) AS mv, min(v) AS mnv FROM base GROUP BY k),
        |im AS (SELECT b.k, max(b.id) AS idx_max_qty
        |       FROM base b JOIN mx ON b.k = mx.k AND b.v = mx.mv GROUP BY b.k),
        |imn AS (SELECT b.k, min(b.id) AS idx_min_qty
        |        FROM base b JOIN mx ON b.k = mx.k AND b.v = mx.mnv GROUP BY b.k),
        |agg AS (
        |  SELECT k,
        |    COUNT(*) FILTER (WHERE d <> 0) AS nz_disc,
        |    round(SUM(v * v) / COUNT(*) - (SUM(v) / COUNT(*)) * (SUM(v) / COUNT(*)), 6)
        |      + CAST(0.0 AS DOUBLE) AS m2,
        |    round(SUM(v * v * v) / COUNT(*)
        |          - CAST(3.0 AS DOUBLE) * (SUM(v) / COUNT(*)) * (SUM(v * v) / COUNT(*))
        |          + CAST(2.0 AS DOUBLE) * (SUM(v) / COUNT(*)) * (SUM(v) / COUNT(*))
        |            * (SUM(v) / COUNT(*)), 6) + CAST(0.0 AS DOUBLE) AS m3
        |  FROM base GROUP BY k)
        |SELECT a.k AS l_returnflag, im.idx_max_qty, imn.idx_min_qty,
        |       a.nz_disc, a.m2, a.m3
        |FROM agg a JOIN im ON a.k = im.k JOIN imn ON a.k = imn.k
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.api.GraftGroupBy
      val li = t(spark, dir, "lineitem")
      graft.api.GraftFrame(li).groupby("l_returnflag")
        .aggCols(
          "idx_max_qty" -> max(struct($"l_quantity", $"l_orderkey"))
            .getField("l_orderkey"),
          "idx_min_qty" -> min(struct($"l_quantity", $"l_orderkey"))
            .getField("l_orderkey"),
          "nz_disc" -> GraftGroupBy.aggExpr(li, "count_nonzero", "l_discount"),
          "m2" -> GraftGroupBy.aggExpr(li, "moment2", "l_quantity"),
          "m3" -> GraftGroupBy.aggExpr(li, "moment3", "l_quantity"))
        .assign(
          "m2" -> (round(col("m2"), 6) + lit(0.0)),
          "m3" -> (round(col("m3"), 6) + lit(0.0)))
        .sortValues(Seq("l_returnflag")).df
    },

    // --- §2.14 digitize / searchsorted: bin index = count of ascending
    //     edges <= x (numpy right-open default). Exact integer compare.
    Q("op_digitize",
      """SELECT bin, COUNT(*) AS cnt FROM (
        |  SELECT CAST(len(list_filter([5.0, 15.0, 30.0, 45.0],
        |           e -> l_quantity >= e)) AS BIGINT) AS bin
        |  FROM lineitem) d
        |GROUP BY bin ORDER BY bin""".stripMargin) { (spark, dir) =>
      gt(spark, dir, "lineitem")
        .digitize("l_quantity", "bin", Seq(5.0, 15.0, 30.0, 45.0))
        .groupby("bin")
        .agg(("cnt", "count", "bin"))
        .sortValues(Seq("bin"))
        .df
    },

    // --- §2.6 grouped describe (pandas groupby().describe()): the
    //     describe statistics per key in one aggregate; same round-6
    //     conventions as op_describe.
    Q("op_groupby_describe",
      """SELECT l_returnflag,
        |  CAST(COUNT(l_quantity) AS DOUBLE) AS l_quantity_count,
        |  round(avg(l_quantity), 6) AS l_quantity_mean,
        |  round(stddev_samp(l_quantity), 6) AS l_quantity_std,
        |  CAST(min(l_quantity) AS DOUBLE) AS l_quantity_min,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS l_quantity_p25,
        |  round(quantile_cont(l_quantity, 0.50), 6) AS l_quantity_p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS l_quantity_p75,
        |  CAST(max(l_quantity) AS DOUBLE) AS l_quantity_max
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val d = gt(spark, dir, "lineitem")
        .describeBy(Seq("l_returnflag"), Seq("l_quantity"))
      d.assign(
        "l_quantity_mean" -> round(d("l_quantity_mean"), 6),
        "l_quantity_std" -> round(d("l_quantity_std"), 6),
        "l_quantity_p25" -> round(d("l_quantity_p25"), 6),
        "l_quantity_p50" -> round(d("l_quantity_p50"), 6),
        "l_quantity_p75" -> round(d("l_quantity_p75"), 6))
        .sortValues(Seq("l_returnflag")).df
    },

    // --- §2.14 row-wise argmax / top-k over the embedding column
    //     (mt.argmax/topk along axis=1): pure in-row expressions; float
    //     values compare bit-exact after the double cast.
    Q("op_vector_argmax",
      """SELECT vec_id,
        |  CAST(list_position(embedding, list_max(embedding)) - 1 AS BIGINT) AS amax,
        |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
        |  CAST(l[1] AS DOUBLE) AS t1, CAST(l[2] AS DOUBLE) AS t2,
        |  CAST(l[3] AS DOUBLE) AS t3
        |FROM (SELECT vec_id, embedding,
        |             list_reverse(list_sort(embedding)) AS l
        |      FROM embeddings WHERE vec_id < 100) e
        |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions
      val s = VectorFunctions.topKValues($"embedding", 3)
      t(spark, dir, "embeddings").filter($"vec_id" < 100)
        .select($"vec_id",
          VectorFunctions.argmax($"embedding").as("amax"),
          array_max($"embedding").cast("double").as("vmax"),
          element_at(s, 1).cast("double").as("t1"),
          element_at(s, 2).cast("double").as("t2"),
          element_at(s, 3).cast("double").as("t3"))
        .orderBy($"vec_id")
    },

    // --- §2.14 tensor/base array manipulation (roll.py, flip.py, tile.py,
    //     repeat.py, ediff1d.py, searchsorted.py): per-row pure array
    //     expressions over the embedding column. Gate columns are scalar
    //     probes (positions, lengths, one diff) — exact element picks and
    //     identical-shape subtraction, no cross-row float accumulation.
    Q("op_tensor_base",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
        |  FROM embeddings WHERE vec_id < 80),
        |m AS (SELECT vec_id, a, len(a) AS n,
        |    ((3 % len(a)) + len(a)) % len(a) AS s FROM e)
        |SELECT vec_id,
        |  CAST(n AS BIGINT) AS n,
        |  list_concat(a[n-s+1:n], a[1:n-s])[1] AS roll1,
        |  list_reverse(a)[1] AS flip1,
        |  CAST(len(flatten(list_transform(range(1, 3), i -> a))) AS BIGINT) AS tile_n,
        |  CAST(len(flatten(list_transform(a,
        |    x -> list_transform(range(1, 3), i -> x)))) AS BIGINT) AS rep_n,
        |  (a[2] - a[1]) AS d1,
        |  CAST(len(list_filter(a, x -> x <= CAST(0.0 AS DOUBLE))) AS BIGINT) AS le0
        |FROM m ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions._
      val a = transform($"embedding", x => x.cast("double"))
      t(spark, dir, "embeddings").filter($"vec_id" < 80)
        .select($"vec_id",
          size(a).cast("long").as("n"),
          element_at(roll(a, 3), 1).as("roll1"),
          element_at(flip(a), 1).as("flip1"),
          size(tile(a, 2)).cast("long").as("tile_n"),
          size(repeatElems(a, 2)).cast("long").as("rep_n"),
          element_at(ediff1d(a), 1).as("d1"),
          searchSorted(a, lit(0.0)).as("le0"))
        .orderBy($"vec_id")
    },

    // --- §2.14 tensor indexing family (indexing/getitem.py fancy index,
    //     compress.py, extract.py, flatnonzero.py, arithmetic/clip.py,
    //     base/where.py): per-row pure array expressions. Gate columns
    //     are scalar probes — exact element picks, exact counts, and one
    //     identical-shape clip/where pick; no cross-row float math.
    Q("op_tensor_index",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
        |  FROM embeddings WHERE vec_id < 80),
        |m AS (SELECT vec_id, a, len(a) AS n,
        |    list_filter(a, x -> x > CAST(0.0 AS DOUBLE)) AS ex,
        |    list_filter(list_transform(a,
        |      (x, i) -> CASE WHEN x <> 0 THEN CAST(i - 1 AS BIGINT) END),
        |      i -> i IS NOT NULL) AS nz,
        |    list_transform(a, x -> least(greatest(x, CAST(-0.5 AS DOUBLE)),
        |      CAST(0.5 AS DOUBLE))) AS cl
        |  FROM e)
        |SELECT vec_id,
        |  a[1] AS t0, a[5] AS t4, a[n] AS tl,
        |  a[3] AS cm2,
        |  CAST(len(ex) AS BIGINT) AS ex_n,
        |  CASE WHEN len(ex) > 0 THEN ex[1] END AS ex1,
        |  CAST(len(nz) AS BIGINT) AS nz_n,
        |  CASE WHEN len(nz) > 0 THEN nz[1] END AS nz1,
        |  cl[1] AS clip1,
        |  CASE WHEN a[1] > 0 THEN a[1] ELSE cl[1] END AS w1
        |FROM m ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions._
      val a = transform($"embedding", x => x.cast("double"))
      val tk = take(a, Seq(0, 4, -1))
      val cm = compress(a, Seq(true, false, true))
      val ex = extract(transform(a, x => x > 0.0), a)
      val nz = flatnonzero(a)
      val cl = clipArray(a, -0.5, 0.5)
      val wh = whereArray(transform(a, x => x > 0.0), a, cl)
      t(spark, dir, "embeddings").filter($"vec_id" < 80)
        .select($"vec_id",
          element_at(tk, 1).as("t0"), element_at(tk, 2).as("t4"),
          element_at(tk, 3).as("tl"),
          element_at(cm, 2).as("cm2"),
          size(ex).cast("long").as("ex_n"),
          when(size(ex) > 0, element_at(ex, 1)).as("ex1"),
          size(nz).cast("long").as("nz_n"),
          when(size(nz) > 0, element_at(nz, 1)).as("nz1"),
          element_at(cl, 1).as("clip1"),
          element_at(wh, 1).as("w1"))
        .orderBy($"vec_id")
    },

    // --- §2.14 tensor indexing family, part 2 (indexing/choose.py,
    //     unravel_index.py): choose selects per-element among 3 parallel
    //     arrays by a pmod-derived selector (nonneg on BOTH sides —
    //     DuckDB % follows the dividend sign, so the oracle spells
    //     ((x%3)+3)%3); unravel_index emits C-order coords of a flat
    //     index in shape (2,3,4) via exact integer div/mod. Per-row
    //     deterministic arithmetic, identical op shapes both sides.
    Q("op_tensor_index2",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a,
        |    ((CAST(vec_id AS BIGINT) * 31 + 7) % 24) AS flat
        |  FROM embeddings WHERE vec_id < 80),
        |m AS (SELECT vec_id, a, flat,
        |    list_transform(a[1:3], x ->
        |      ((CAST(floor(x * 10) AS BIGINT) % 3) + 3) % 3) AS sel,
        |    list_transform(a, x -> least(greatest(x,
        |      CAST(-0.5 AS DOUBLE)), CAST(0.5 AS DOUBLE))) AS cl
        |  FROM e),
        |c AS (SELECT vec_id, flat,
        |    list_transform(sel, (s, k) -> CASE s
        |      WHEN 0 THEN a[k] WHEN 1 THEN cl[k]
        |      ELSE a[k] * CAST(2.0 AS DOUBLE) END) AS ch
        |  FROM m)
        |SELECT vec_id,
        |  CAST((flat // 12) % 2 AS BIGINT) AS i1,
        |  CAST((flat // 4) % 3 AS BIGINT) AS i2,
        |  CAST(flat % 4 AS BIGINT) AS i3,
        |  ch[1] AS ch1, ch[2] AS ch2, ch[3] AS ch3
        |FROM c ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions._
      val a = transform($"embedding", x => x.cast("double"))
      val flat = pmod($"vec_id".cast("long") * 31 + 7, lit(24L))
      val sel = transform(slice(a, 1, 3),
        x => pmod(floor(x * 10).cast("long"), lit(3L)))
      val ch = choose(sel,
        Seq(a, clipArray(a, -0.5, 0.5), transform(a, x => x * 2.0)))
      val coords = unravelIndex(flat, Seq(2L, 3L, 4L))
      t(spark, dir, "embeddings").filter($"vec_id" < 80)
        .select($"vec_id",
          element_at(coords, 1).as("i1"),
          element_at(coords, 2).as("i2"),
          element_at(coords, 3).as("i3"),
          element_at(ch, 1).as("ch1"),
          element_at(ch, 2).as("ch2"),
          element_at(ch, 3).as("ch3"))
        .orderBy($"vec_id")
    },

    // --- §2.10 frexp/ldexp (arithmetic/frexp.py, ldexp.py): the
    //     mantissa/exponent split is BIT-exact oracle-able because the
    //     exponent is corrected against exact power-of-two comparisons
    //     (log2's engine ulp divergence is absorbed by the two CASE
    //     corrections — see Ufuncs.frexpExp), and the mantissa/ldexp
    //     scaling by 2^±e is exact IEEE. l_quantity hits exact powers
    //     of two (the correction's critical inputs); a planted 0.0 row
    //     exercises the e=0 edge. No rounding anywhere.
    Q("op_ufunc_float",
      """WITH src AS (SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    CASE WHEN l_linenumber = 1 THEN CAST(0.0 AS DOUBLE)
        |         ELSE CAST(l_extendedprice AS DOUBLE) END AS x1,
        |    CAST(l_quantity AS DOUBLE) AS x2
        |  FROM lineitem WHERE l_orderkey < 60),
        |f AS (SELECT *,
        |    CASE WHEN x1 = 0 THEN CAST(1.0 AS DOUBLE) ELSE abs(x1) END AS a1,
        |    CASE WHEN x2 = 0 THEN CAST(1.0 AS DOUBLE) ELSE abs(x2) END AS a2
        |  FROM src),
        |e0 AS (SELECT *,
        |    CAST(floor(log2(a1)) AS BIGINT) + 1 AS e1a,
        |    CAST(floor(log2(a2)) AS BIGINT) + 1 AS e2a FROM f),
        |eu AS (SELECT *,
        |    CASE WHEN a1 >= power(2.0, e1a) THEN e1a + 1 ELSE e1a END AS e1b,
        |    CASE WHEN a2 >= power(2.0, e2a) THEN e2a + 1 ELSE e2a END AS e2b
        |  FROM e0),
        |ef AS (SELECT *,
        |    CASE WHEN x1 = 0 THEN 0 WHEN a1 < power(2.0, e1b - 1)
        |         THEN e1b - 1 ELSE e1b END AS e1,
        |    CASE WHEN x2 = 0 THEN 0 WHEN a2 < power(2.0, e2b - 1)
        |         THEN e2b - 1 ELSE e2b END AS e2
        |  FROM eu)
        |SELECT l_orderkey, l_linenumber, l_partkey,
        |  CAST(e1 AS BIGINT) AS exp1, x1 * power(2.0, -e1) AS mant1,
        |  CAST(e2 AS BIGINT) AS exp2, x2 * power(2.0, -e2) AS mant2,
        |  (x1 * power(2.0, -e1)) * power(2.0, e1) AS back1
        |FROM ef
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      val x1 = when($"l_linenumber" === 1, lit(0.0))
        .otherwise($"l_extendedprice".cast("double"))
      val x2 = $"l_quantity".cast("double")
      t(spark, dir, "lineitem").filter($"l_orderkey" < 60)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          Ufuncs("frexp_exp")(x1).as("exp1"),
          Ufuncs("frexp_mant")(x1).as("mant1"),
          Ufuncs("frexp_exp")(x2).as("exp2"),
          Ufuncs("frexp_mant")(x2).as("mant2"),
          Ufuncs("ldexp", Ufuncs("frexp_mant")(x1),
            Ufuncs("frexp_exp")(x1)).as("back1"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
        .drop("l_quantity")
    },

    // --- §2.10 spacing/nextafter (arithmetic/spacing.py,
    //     nextafter.py): ulp arithmetic over the exact frexp exponent —
    //     the away-from-zero gap is 2^(e−53), halving to 2^(e−54)
    //     exactly at binade boundaries (|x| = 2^(e−1)). Every output is
    //     a power of two or an exact IEEE add, so the gate is
    //     UNROUNDED. x2 = q/8 plants exact powers of two (q = 8,16,32);
    //     x3 = q − 25.5 plants the ±0.5 boundary and mixed signs.
    Q("op_ufunc_spacing",
      """WITH src AS (SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    CAST(l_extendedprice AS DOUBLE) AS x1,
        |    CAST(l_quantity AS DOUBLE) / 8.0 AS x2,
        |    CAST(l_quantity AS DOUBLE) - 25.5 AS x3
        |  FROM lineitem WHERE l_orderkey < 60),
        |f AS (SELECT *, abs(x1) AS a1, abs(x2) AS a2, abs(x3) AS a3 FROM src),
        |e0 AS (SELECT *,
        |    CAST(floor(log2(a1)) AS BIGINT) + 1 AS e1a,
        |    CAST(floor(log2(a2)) AS BIGINT) + 1 AS e2a,
        |    CAST(floor(log2(a3)) AS BIGINT) + 1 AS e3a FROM f),
        |eu AS (SELECT *,
        |    CASE WHEN a1 >= power(2.0, e1a) THEN e1a + 1 ELSE e1a END AS e1b,
        |    CASE WHEN a2 >= power(2.0, e2a) THEN e2a + 1 ELSE e2a END AS e2b,
        |    CASE WHEN a3 >= power(2.0, e3a) THEN e3a + 1 ELSE e3a END AS e3b
        |  FROM e0),
        |ef AS (SELECT *,
        |    CASE WHEN a1 < power(2.0, e1b - 1) THEN e1b - 1 ELSE e1b END AS e1,
        |    CASE WHEN a2 < power(2.0, e2b - 1) THEN e2b - 1 ELSE e2b END AS e2,
        |    CASE WHEN a3 < power(2.0, e3b - 1) THEN e3b - 1 ELSE e3b END AS e3
        |  FROM eu),
        |g AS (SELECT *,
        |    power(2.0, e1 - 53) AS u1,
        |    power(2.0, e2 - 53) AS u2,
        |    power(2.0, e3 - 53) AS u3,
        |    CASE WHEN a2 = power(2.0, e2 - 1) THEN power(2.0, e2 - 54)
        |         ELSE power(2.0, e2 - 53) END AS t2,
        |    CASE WHEN a3 = power(2.0, e3 - 1) THEN power(2.0, e3 - 54)
        |         ELSE power(2.0, e3 - 53) END AS t3
        |  FROM ef)
        |SELECT l_orderkey, l_linenumber, l_partkey,
        |  u1 AS sp1,
        |  CASE WHEN x3 < 0 THEN -u3 ELSE u3 END AS sp3,
        |  u2 AS d_up2,
        |  t2 AS d_dn2,
        |  CASE WHEN x3 > 0 THEN -t3 ELSE t3 END AS d_tz3,
        |  x2 + u2 AS n_up2
        |FROM g
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      val x1 = $"l_extendedprice".cast("double")
      val x2 = $"l_quantity".cast("double") / 8.0
      val x3 = $"l_quantity".cast("double") - 25.5
      t(spark, dir, "lineitem").filter($"l_orderkey" < 60)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          Ufuncs("spacing")(x1).as("sp1"),
          Ufuncs("spacing")(x3).as("sp3"),
          (Ufuncs("nextafter", x2, lit(1e300)) - x2).as("d_up2"),
          (x2 - Ufuncs("nextafter", x2, lit(-1e300))).as("d_dn2"),
          (Ufuncs("nextafter", x3, lit(0.0)) - x3).as("d_tz3"),
          Ufuncs("nextafter", x2, lit(1e300)).as("n_up2"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
        .drop("l_quantity")
    },

    // --- §2.5 nancumsum/nancumprod (reduction/nancumsum.py,
    //     nancumprod.py): NaN contributes the identity and the output at
    //     the NaN position is the running total (numpy), planted NaNs on
    //     l_partkey % 7 = 0. Integer-valued doubles → exact products
    //     (≤ 50^7 < 2^53); both engines multiply in the same row order.
    Q("op_nancum",
      """WITH src AS (SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    CASE WHEN l_partkey % 7 = 0 THEN CAST('nan' AS DOUBLE)
        |         ELSE CAST(l_quantity AS DOUBLE) END AS x
        |  FROM lineitem WHERE l_orderkey < 30)
        |SELECT l_orderkey, l_linenumber, l_partkey,
        |  SUM(CASE WHEN isnan(x) THEN CAST(0.0 AS DOUBLE) ELSE x END)
        |    OVER w AS ncs,
        |  product(CASE WHEN isnan(x) THEN CAST(1.0 AS DOUBLE) ELSE x END)
        |    OVER w AS ncp
        |FROM src
        |WINDOW w AS (PARTITION BY l_orderkey
        |             ORDER BY l_linenumber, l_partkey, l_quantity
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Windows
      val x = when(pmod($"l_partkey", lit(7)) === 0, lit(Double.NaN))
        .otherwise($"l_quantity".cast("double"))
      val w = Windows.spec(Seq("l_orderkey"),
        Seq("l_linenumber", "l_partkey", "l_quantity"))
      t(spark, dir, "lineitem").filter($"l_orderkey" < 30)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          Windows.nancumsum(x, w).as("ncs"),
          Windows.nancumprod(x, w).as("ncp"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
        .drop("l_quantity")
    },

    // --- §2.14 argtopk / topk (base/argtopk.py, topk.py): k largest
    //     per row, descending value with ascending-index ties — the
    //     DuckDB replay sorts unnested (v, k) structs under the same
    //     ORDER BY rule. Exact element picks, no float math.
    Q("op_argtopk",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
        |  FROM embeddings WHERE vec_id < 80),
        |t AS (SELECT vec_id,
        |    UNNEST(list_transform(a, (x, k) -> {'v': x, 'k': k - 1})) AS s
        |  FROM e),
        |g AS (SELECT vec_id,
        |    list(CAST(s.k AS BIGINT) ORDER BY s.v DESC, s.k) AS ai,
        |    list(s.v ORDER BY s.v DESC, s.k) AS av
        |  FROM t GROUP BY vec_id)
        |SELECT vec_id, ai[1] AS i1, ai[3] AS i3, ai[5] AS i5,
        |       av[1] AS v1, av[3] AS v3, av[5] AS v5
        |FROM g ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions._
      val a = transform($"embedding", x => x.cast("double"))
      val ai = argtopkRow(a, 5)
      val av = topkRow(a, 5)
      t(spark, dir, "embeddings").filter($"vec_id" < 80)
        .select($"vec_id",
          element_at(ai, 1).as("i1"), element_at(ai, 3).as("i3"),
          element_at(ai, 5).as("i5"),
          element_at(av, 1).as("v1"), element_at(av, 3).as("v3"),
          element_at(av, 5).as("v5"))
        .orderBy($"vec_id")
    },

    // --- §2.14 tensor set routines (base/unique.py row axis, in1d.py,
    //     setdiff1d.py + the numpy intersect1d/union1d siblings): the
    //     float embeddings are bucketed to overlapping BIGINT grids
    //     (floor(x·10), floor(x·7) — exact double ops) so the set
    //     algebra is integer-exact; numpy's sorted-distinct convention
    //     on both sides.
    Q("op_tensor_setops",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS BIGINT)) AS a,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 7) AS BIGINT)) AS b
        |  FROM embeddings WHERE vec_id < 80),
        |s AS (SELECT vec_id, a, b,
        |    list_sort(list_distinct(a)) AS uq,
        |    list_sort(list_distinct(list_intersect(a, b))) AS si,
        |    list_sort(list_distinct(list_filter(a,
        |      x -> NOT list_contains(b, x)))) AS sd,
        |    list_sort(list_distinct(list_concat(a, b))) AS su
        |  FROM e)
        |SELECT vec_id,
        |  CAST(len(uq) AS BIGINT) AS uq_n, uq[1] AS uq1,
        |  CAST(len(list_filter(a, x -> list_contains(b, x))) AS BIGINT) AS in_n,
        |  CAST(len(si) AS BIGINT) AS int_n,
        |  COALESCE(si[1], -999) AS int1,
        |  CAST(len(sd) AS BIGINT) AS diff_n,
        |  CAST(len(su) AS BIGINT) AS un_n
        |FROM s ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions._
      val a = transform($"embedding", x => floor(x.cast("double") * 10).cast("long"))
      val b = transform($"embedding", x => floor(x.cast("double") * 7).cast("long"))
      val si = intersect1d(a, b)
      t(spark, dir, "embeddings").filter($"vec_id" < 80)
        .select($"vec_id",
          size(unique1d(a)).cast("long").as("uq_n"),
          element_at(unique1d(a), 1).as("uq1"),
          size(filter(a, x => array_contains(b, x))).cast("long").as("in_n"),
          size(si).cast("long").as("int_n"),
          coalesce(when(size(si) > 0, element_at(si, 1)), lit(-999L)).as("int1"),
          size(setdiff1d(a, b)).cast("long").as("diff_n"),
          size(union1d(a, b)).cast("long").as("un_n"))
        .orderBy($"vec_id")
    },

    // --- pandas between_time/at_time (tseries surface over the explicit
    //     ts column): a daytime window and a midnight-WRAPPING window;
    //     time-of-day compares as exact epoch-second arithmetic on both
    //     engines (events.ts nanos → µs convention).
    Q("op_between_time",
      """WITH e AS (SELECT user_id, event_id, value,
        |    ((epoch_us(ts) // 1000000) % 86400) AS tod
        |  FROM events WHERE user_id < 50)
        |SELECT win, user_id, n, v, first_ev FROM (
        |  SELECT 'day' AS win, user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |      CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v,
        |      min(event_id) AS first_ev
        |  FROM e WHERE tod >= 23400 AND tod <= 67500 GROUP BY user_id
        |  UNION ALL
        |  SELECT 'night', user_id, CAST(COUNT(*) AS BIGINT),
        |      CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT),
        |      min(event_id)
        |  FROM e WHERE tod >= 79200 OR tod <= 10800 GROUP BY user_id) u
        |ORDER BY win, user_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = graft.api.GraftFrame(t(spark, dir, "events").filter($"user_id" < 50))
      def tally(f: graft.api.GraftFrame, tag: String) =
        f.df.groupBy($"user_id")
          .agg(count(lit(1)).as("n"),
            sum(floor($"value").cast("long")).as("v"),
            min($"event_id").as("first_ev"))
          .select(lit(tag).as("win"), $"user_id", $"n", $"v", $"first_ev")
      tally(ev.betweenTime("ts", "06:30", "18:45"), "day")
        .unionAll(tally(ev.betweenTime("ts", "22:00", "03:00"), "night"))
        .orderBy($"win", $"user_id")
    },

    // --- §2.14 tensor editing + order (base/insert.py, delete.py,
    //     array_split.py, argsort.py): slice/concat probes are exact
    //     element picks; argsort's stable tie rule is the same
    //     lexicographic (value, index) struct sort on both engines.
    //     dim 64 = 5·12+4 exercises array_split's uneven-part rule.
    Q("op_tensor_edit",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
        |  FROM embeddings WHERE vec_id < 80),
        |m AS (SELECT vec_id, a, len(a) AS n,
        |    list_transform(list_sort(list_transform(range(1, len(a) + 1),
        |      i -> {'v': a[i], 'i': i - 1})), s -> CAST(s.i AS BIGINT)) AS srt
        |  FROM e)
        |SELECT vec_id,
        |  CAST(n + 1 AS BIGINT) AS ins_n,
        |  CAST(-7.0 AS DOUBLE) AS ins_at3,
        |  a[4] AS ins_at4,
        |  CAST(n - 1 AS BIGINT) AS del_n,
        |  a[2] AS del_first,
        |  CAST(13 AS BIGINT) AS part1_n,
        |  a[27] AS part3_first,
        |  a[n] AS part5_last,
        |  srt[1] AS as_first, srt[n] AS as_last
        |FROM m ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions._
      val a = transform($"embedding", x => x.cast("double"))
      val ins = insertAt(a, 3, lit(-7.0))
      val del = deleteAt(a, 0)
      val sp = arraySplit(a, 5)
      val srt = argsortRow(a)
      // part starts for n=64, k=5: sizes 13,13,13,13,12; part 3 starts at
      // 0-based 26 → source a[27]; part 5 ends at the source tail
      t(spark, dir, "embeddings").filter($"vec_id" < 80)
        .select($"vec_id",
          size(ins).cast("long").as("ins_n"),
          element_at(ins, 4).as("ins_at3"),
          element_at(ins, 5).as("ins_at4"),
          size(del).cast("long").as("del_n"),
          element_at(del, 1).as("del_first"),
          size(element_at(sp, 1)).cast("long").as("part1_n"),
          element_at(element_at(sp, 3), 1).as("part3_first"),
          element_at(element_at(sp, 5), 12).as("part5_last"),
          element_at(srt, 1).as("as_first"),
          element_at(srt, size(srt)).as("as_last"))
        .orderBy($"vec_id")
    },

    // --- §2.14 NaN-skipping reductions (tensor/reduction/nansum.py and
    //     siblings): NaNs are SYNTHESIZED deterministically (every 7th
    //     quantity) on both sides — DuckDB parses 'NaN' — then mapped to
    //     null and reduced. Sums/moments are integer-valued doubles
    //     (exact, order-free); mean/var are fixed-shape closed forms
    //     over them → unrounded bit-exact.
    Q("op_nan_reductions",
      """WITH b AS (SELECT l_returnflag,
        |    CASE WHEN CAST(l_quantity AS BIGINT) % 7 = 0
        |         THEN CAST('NaN' AS DOUBLE)
        |         ELSE CAST(l_quantity AS DOUBLE) END AS x
        |  FROM lineitem),
        |c AS (SELECT l_returnflag,
        |    CASE WHEN isnan(x) THEN NULL ELSE x END AS v FROM b)
        |SELECT l_returnflag,
        |  SUM(v) AS nansum,
        |  CAST(COUNT(v) AS BIGINT) AS n,
        |  max(v) AS nanmax, min(v) AS nanmin,
        |  SUM(v) / CAST(COUNT(v) AS DOUBLE) AS nanmean,
        |  (SUM(v * v) - SUM(v) * SUM(v) / CAST(COUNT(v) AS DOUBLE))
        |    / (CAST(COUNT(v) AS DOUBLE) - 1.0) AS nanvar
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.aggregates._
      val x = when($"l_quantity".cast("long") % 7 === 0, lit(Double.NaN))
        .otherwise($"l_quantity".cast("double"))
      t(spark, dir, "lineitem")
        .select($"l_returnflag", x.as("x"))
        .groupBy($"l_returnflag")
        .agg(nanSum($"x").as("nansum"),
          nanCount($"x").as("n"),
          nanMax($"x").as("nanmax"), nanMin($"x").as("nanmin"),
          (nanSum($"x") / nanCount($"x").cast("double")).as("nanmean"),
          nanVar($"x").as("nanvar"))
        .orderBy($"l_returnflag")
    },

    // --- §2.14 tensor comparison reductions (reduction/allclose.py,
    //     array_equal.py, nanargmax.py/nanargmin.py): a 1e-9 relative
    //     perturbation stays allclose, a +1 shift does not; equality and
    //     arg extrema are exact. Fixed dim 64 lets the oracle walk
    //     indices.
    Q("op_allclose",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
        |  FROM embeddings WHERE vec_id < 80),
        |m AS (SELECT vec_id, a,
        |    list_transform(a, x -> x * (CAST(1.0 AS DOUBLE)
        |      + CAST(0.000000001 AS DOUBLE))) AS b,
        |    list_transform(a, x -> x + CAST(1.0 AS DOUBLE)) AS c
        |  FROM e)
        |SELECT vec_id,
        |  len(list_filter(list_transform(range(1, 65),
        |    i -> abs(a[i] - b[i]) <= CAST(0.00000001 AS DOUBLE)
        |         + CAST(0.00001 AS DOUBLE) * abs(b[i])), t -> NOT t)) = 0
        |    AS close_b,
        |  len(list_filter(list_transform(range(1, 65),
        |    i -> abs(a[i] - c[i]) <= CAST(0.00000001 AS DOUBLE)
        |         + CAST(0.00001 AS DOUBLE) * abs(c[i])), t -> NOT t)) = 0
        |    AS close_c,
        |  (a = a) AS eq_a,
        |  (a = b) AS eq_b,
        |  CAST(list_position(a, list_max(a)) - 1 AS BIGINT) AS amax,
        |  CAST(list_position(a, list_min(a)) - 1 AS BIGINT) AS amin
        |FROM m ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions._
      val a = transform($"embedding", x => x.cast("double"))
      val b = transform(a, x => x * (lit(1.0) + lit(1e-9)))
      val c = transform(a, x => x + lit(1.0))
      t(spark, dir, "embeddings").filter($"vec_id" < 80)
        .select($"vec_id",
          allcloseRows(a, b).as("close_b"),
          allcloseRows(a, c).as("close_c"),
          arrayEqualRows(a, a).as("eq_a"),
          arrayEqualRows(a, b).as("eq_b"),
          nanArgmax(a).as("amax"),
          nanArgmin(a).as("amin"))
        .orderBy($"vec_id")
    },

    // --- §2.13 corrwith (reference statistics/corr.py:286): per-order
    //     lineitem aggregates correlated column-by-column against the
    //     order header after a key-aligned join. Correlations are ~0.9 by
    //     construction (never near 0, so round(6) carries no signed-zero
    //     exposure).
    Q("op_corrwith",
      """WITH a AS (SELECT l_orderkey AS k,
        |             CAST(SUM(l_quantity) AS DOUBLE) AS qty,
        |             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price
        |           FROM lineitem GROUP BY l_orderkey),
        |b AS (SELECT o_orderkey AS k, o_totalprice / 1000.0 AS qty,
        |             o_totalprice AS price FROM orders),
        |j AS (SELECT a.qty AS qa, b.qty AS qb, a.price AS pa, b.price AS pb
        |      FROM a JOIN b USING (k))
        |SELECT 'price' AS "column", round(corr(pa, pb), 6) AS corr FROM j
        |UNION ALL
        |SELECT 'qty' AS "column", round(corr(qa, qb), 6) AS corr FROM j
        |ORDER BY "column"""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = graft.api.GraftFrame(t(spark, dir, "lineitem")
        .groupBy($"l_orderkey".as("k"))
        .agg(sum($"l_quantity").cast("double").as("qty"),
          sumD(dec12($"l_extendedprice")).as("price")))
      val b = graft.api.GraftFrame(t(spark, dir, "orders")
        .select($"o_orderkey".as("k"), ($"o_totalprice" / 1000.0).as("qty"),
          $"o_totalprice".as("price")))
      a.corrwith(b, Seq("k"), Seq("qty", "price"))
        .assign("corr" -> round(col("corr"), 6))
        .sortValues(Seq("column")).df
    },

    // --- §2.13 autocorr (reference statistics/corr.py:378): lag-1 serial
    //     correlation of event values per user over the explicit event_id
    //     order — a partitioned window lag, then one corr aggregate per
    //     group (no global single-task window).
    Q("op_autocorr",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |       round(corr(value, lv), 6) AS autocorr
        |FROM (SELECT user_id, value,
        |             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS lv
        |      FROM events WHERE user_id < 20) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events").filter($"user_id" < 20)
      graft.api.GraftFrame(ev)
        .autocorr(Seq("user_id"), "event_id", "value")
        .df.join(
          ev.groupBy($"user_id").agg(count(lit(1)).as("n")), Seq("user_id"))
        .select($"user_id", $"n", round($"autocorr", 6).as("autocorr"))
        .orderBy($"user_id")
    }
  )
}
