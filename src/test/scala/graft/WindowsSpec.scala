package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Windows

import scala.util.Random

/** Differential tests for moving-window operators: ewm against the pandas
  * adjust=true recurrence computed on the driver, shift/diff/rolling/cumsum
  * against hand-computed expectations on literal frames.
  */
class WindowsSpec extends SparkSpecBase {
  import spark.implicits._

  test("ewmMean matches the pandas adjust=true recurrence") {
    val r = new Random(5)
    val alpha = 0.3
    val rows = for {
      k <- 0 until 5
      i <- 0 until 40
    } yield (k.toLong, i.toDouble, r.nextDouble() * 100)
    val df = rows.toDF("k", "ord", "v")
    val got = Windows.ewmMean(df, "k", "ord", "v", alpha)
      .select("key", "ord", "ewm").as[(Long, Double, Double)]
      .collect().map { case (k, o, e) => (k, o) -> e }.toMap
    // reference: y_t = sum_{i<=t}(1-a)^(t-i) x_i / sum_{i<=t}(1-a)^(t-i)
    val expected = rows.groupBy(_._1).flatMap { case (k, ks) =>
      val sorted = ks.sortBy(_._2)
      var num = 0.0; var den = 0.0
      sorted.map { case (_, o, v) =>
        num = num * (1 - alpha) + v
        den = den * (1 - alpha) + 1.0
        (k, o) -> num / den
      }
    }
    assert(got.keySet == expected.keySet)
    for ((key, exp) <- expected)
      assert(math.abs(got(key) - exp) < 1e-9, s"ewm mismatch at $key")
  }

  test("ewmStats var/std match the pandas bias=false weight definition") {
    val r = new Random(9)
    val alpha = 0.3
    val rows = for {
      k <- 0 until 4
      i <- 0 until 30
    } yield (k.toLong, i.toDouble, r.nextDouble() * 50)
    val df = rows.toDF("k", "ord", "v")
    val got = Windows.ewmStats(df, "k", "ord", "v", alpha)
      .select("key", "ord", "ewm_var", "ewm_std")
      .collect()
      .map(r0 => (r0.getLong(0), r0.getDouble(1)) ->
        (if (r0.isNullAt(2)) None else Some((r0.getDouble(2), r0.getDouble(3)))))
      .toMap
    // reference: explicit weights w_i = (1-a)^(t-i);
    // var = (Σw x² - (Σw x)²/Σw) / (Σw - Σw²/Σw)   [bias=false]
    for ((k, ks) <- rows.groupBy(_._1)) {
      val sorted = ks.sortBy(_._2).map(_._3)
      for (t <- sorted.indices) {
        val w = (0 to t).map(i => math.pow(1 - alpha, t - i))
        val xs = sorted.take(t + 1)
        val sw = w.sum; val sw2 = w.map(x => x * x).sum
        val swx = w.zip(xs).map { case (a, b) => a * b }.sum
        val swx2 = w.zip(xs).map { case (a, b) => a * b * b }.sum
        val gotV = got((k, t.toDouble))
        if (t == 0) assert(gotV.isEmpty, s"first row of key $k must be null")
        else {
          val expVar = (swx2 - swx * swx / sw) / (sw - sw2 / sw)
          val (gv, gs) = gotV.get
          assert(math.abs(gv - expVar) < 1e-8, s"ewm_var mismatch at ($k,$t)")
          assert(math.abs(gs - math.sqrt(expVar)) < 1e-8, s"ewm_std mismatch at ($k,$t)")
        }
      }
    }
  }

  test("ewmStats skips nulls (pandas ignore_na): accumulators carry across") {
    val alpha = 0.5
    // (key, ord, value): nulls mid-stream, at key start, and at key end
    val rows: Seq[(Long, Double, Option[Double])] = Seq(
      (1L, 0.0, Some(1.0)), (1L, 1.0, None), (1L, 2.0, Some(3.0)),
      (1L, 3.0, Some(2.0)), (1L, 4.0, None),
      (2L, 0.0, None), (2L, 1.0, Some(5.0)))
    val df = rows.toDF("k", "ord", "v")
    val got = Windows.ewmStats(df, "k", "ord", "v", alpha)
      .select("key", "ord", "ewm", "ewm_var")
      .collect()
      .map(r0 => (r0.getLong(0), r0.getDouble(1)) ->
        ((if (r0.isNullAt(2)) None else Some(r0.getDouble(2))),
          (if (r0.isNullAt(3)) None else Some(r0.getDouble(3)))))
      .toMap
    // replay: nulls contribute nothing and do not decay the weights
    // (ignore_na=True relative positioning); a null row re-emits the
    // running mean/var, or null before the first/second observation
    for ((k, ks) <- rows.groupBy(_._1)) {
      var num = 0.0; var den = 0.0; var sumsq = 0.0; var den2 = 0.0
      var nObs = 0
      for ((_, o, vOpt) <- ks.sortBy(_._2)) {
        vOpt.foreach { x =>
          num = num * (1 - alpha) + x
          den = den * (1 - alpha) + 1.0
          sumsq = sumsq * (1 - alpha) + x * x
          den2 = den2 * (1 - alpha) * (1 - alpha) + 1.0
          nObs += 1
        }
        val expMean = if (nObs == 0) None else Some(num / den)
        val expVar =
          if (nObs < 2) None
          else Some((sumsq - num * num / den) / (den - den2 / den))
        val (gm, gv) = got((k, o))
        assert(gm.isDefined == expMean.isDefined && gv.isDefined == expVar.isDefined,
          s"null shape mismatch at ($k,$o): got ($gm,$gv) want ($expMean,$expVar)")
        expMean.foreach(e => assert(math.abs(gm.get - e) < 1e-9, s"mean at ($k,$o)"))
        expVar.foreach(e => assert(math.abs(gv.get - e) < 1e-9, s"var at ($k,$o)"))
      }
    }
  }

  test("rolling skew/kurt/median/weighted match pandas hand values") {
    val df = (1 to 5).map(i => (1L, i.toLong, i.toDouble)).toDF("k", "ord", "v")
    val w5 = Windows.rolling(Windows.spec(Seq("k"), Seq("ord")), 5)
    val last = df.select($"ord",
        Windows.rollingSkew($"v", w5).as("sk"),
        Windows.rollingKurt($"v", w5).as("ku"),
        Windows.rollingMedian($"v", w5).as("md"))
      .orderBy($"ord").collect().last
    // pandas: Series([1,2,3,4,5]).rolling(5).skew() → 0, .kurt() → -1.2
    assert(math.abs(last.getDouble(1)) < 1e-12)
    assert(math.abs(last.getDouble(2) - (-1.2)) < 1e-12)
    assert(last.getDouble(3) == 3.0)
    // zero-spread window → null skew (pandas NaN)
    val flat = Seq((1L, 1L, 2.0), (1L, 2L, 2.0), (1L, 3L, 2.0)).toDF("k", "ord", "v")
    val w3 = Windows.rolling(Windows.spec(Seq("k"), Seq("ord")), 3)
    assert(flat.select(Windows.rollingSkew($"v", w3)).collect().forall(_.isNullAt(0)))
    // triang(3) weighted mean: (10+2*20+30)/4 = 20; leading rows null
    val wm = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0)).toDF("k", "ord", "v")
      .select($"ord", Windows.weightedRollingMean($"v", Windows.triangWeights(3),
        Windows.spec(Seq("k"), Seq("ord"))).as("wm"))
      .orderBy($"ord").collect()
    assert(wm(0).isNullAt(1) && wm(1).isNullAt(1) && wm(2).getDouble(1) == 20.0)
  }

  test("shift and diff over an ordered window") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 13.0), (1L, 3L, 11.0), (2L, 1L, 5.0))
      .toDF("k", "ord", "v")
    val w = Windows.spec(Seq("k"), Seq("ord"))
    val got = df.select($"k", $"ord",
        Windows.shift($"v", 1, w).as("prev"),
        Windows.diff($"v", 1, w).as("d"),
        Windows.shift($"v", -1, w).as("next"))
      .orderBy($"k", $"ord")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 1L, None, None, Some(13.0)),
      (1L, 2L, Some(10.0), Some(3.0), Some(11.0)),
      (1L, 3L, Some(13.0), Some(-2.0), None),
      (2L, 1L, None, None, None)))
  }

  test("intervalJoin handles multi-bucket spans, boundaries, empty intervals") {
    import java.sql.Timestamp
    import graft.operators.Sessionize
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // == start: included
      (1L, 11L, ts("2024-01-01 12:59:59")), // inside a 3h interval
      (1L, 12L, ts("2024-01-01 13:00:00")), // == end: excluded
      (2L, 20L, ts("2024-01-01 10:30:00"))) // other key
      .toDF("k", "pid", "t")
    val intervals = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00")), // spans 3+ buckets
      (1L, 101L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00")), // empty
      (2L, 200L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "iid", "s", "e")
    val got = Sessionize.intervalJoin(points, intervals, "k", "t", "s", "e",
        bucketMicros = 3600000000L) // 1h buckets << 3h interval
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 100L), (11L, 100L), (20L, 200L)))
  }

  test("rolling / expanding / cumulative helpers") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 4.0), (1L, 4L, 8.0))
      .toDF("k", "ord", "v")
    val base = Windows.spec(Seq("k"), Seq("ord"))
    val got = df.select($"ord",
        sum($"v").over(Windows.rolling(base, 2)).as("roll2"),
        Windows.cumsum($"v", base).as("csum"),
        Windows.cummax($"v", base).as("cmax"),
        Windows.cummin($"v", base).as("cmin"),
        Windows.cumcount(base).as("cnt"))
      .orderBy($"ord")
      .as[(Long, Double, Double, Double, Double, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 1.0, 1.0, 1.0, 1.0, 1),
      (2L, 3.0, 3.0, 2.0, 1.0, 2),
      (3L, 6.0, 7.0, 4.0, 1.0, 3),
      (4L, 12.0, 15.0, 8.0, 1.0, 4)))
  }

  test("pctChange matches pandas pct_change(fill_method=None)") {
    // pandas: s.pct_change() over [8, 10, 5, 5] -> [NaN, 0.25, -0.5, 0.0]
    // (values chosen so the divisions are IEEE-exact)
    val df = Seq((1L, 1L, 8.0), (1L, 2L, 10.0), (1L, 3L, 5.0), (1L, 4L, 5.0))
      .toDF("k", "ord", "v")
    val got = graft.api.GraftFrame(df)
      .pctChange("v", "pct", 1, Seq("k"), Seq("ord"))
      .sortValues(Seq("ord")).df
      .select($"pct").as[Option[Double]].collect().toSeq
    assert(got == Seq(None, Some(0.25), Some(-0.5), Some(0.0)))
  }

  test("rolling corr/cov match pandas pairwise values") {
    // pandas: x.rolling(3).cov(y) / corr(y) on x=[1,2,3,4], y=[2,4,8,6]:
    // window [1,2,3]x[2,4,8]: cov=3.0, corr 3/(1*sqrt(9.333..))
    val df = Seq((1L, 1L, 1.0, 2.0), (1L, 2L, 2.0, 4.0),
      (1L, 3L, 3.0, 8.0), (1L, 4L, 4.0, 6.0)).toDF("k", "ord", "x", "y")
    val got = graft.api.GraftFrame(df)
      .rolling(Seq("k"), Seq("ord"), 3)
      .cov("x", "y", "cv")
      .rolling(Seq("k"), Seq("ord"), 3)
      .corr("x", "y", "cr")
      .sortValues(Seq("ord")).df
      .select($"ord", round($"cv", 9), round($"cr", 9))
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    val c3 = 3.0 / math.sqrt(1.0 * (28.0 / 3.0))
    val c4 = 1.0 / math.sqrt(1.0 * 4.0)
    def r9(d: Double) = math.rint(d * 1e9) / 1e9
    assert(got(2) == ((3L, Some(3.0), Some(r9(c3)))))
    assert(got(3) == ((4L, Some(1.0), Some(r9(c4)))))
  }

  test("rolling rankPct matches pandas rank(pct=True, method='average')") {
    // x = [5, 5, 3, 7], window 3:
    //   t1 [5]       -> 1/1 = 1.0
    //   t2 [5,5]     -> (0 + 3/2)/2 = 0.75
    //   t3 [5,5,3]   -> rank(3) = 1/3
    //   t4 [5,3,7]   -> rank(7) = 3/3 = 1.0
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 3.0), (1L, 4L, 7.0))
      .toDF("k", "ord", "x")
    val got = graft.api.GraftFrame(df)
      .rolling(Seq("k"), Seq("ord"), 3)
      .rankPct("x", "r")
      .sortValues(Seq("ord")).df
      .select($"r").as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.75, 1.0 / 3.0, 1.0))
  }

  test("tsFeatures matches a hand-computed series exactly") {
    // series (3,1,4,1,5): n=5, S=14; above-mean = c*5 > 14 → T,F,T,F,T
    val df = Seq((0L, 1L, 3L), (0L, 2L, 1L), (0L, 3L, 4L),
      (0L, 4L, 1L), (0L, 5L, 5L)).toDF("k", "o", "c")
    val r = graft.operators.Sessionize
      .tsFeatures(df, "k", Seq("o"), "c").collect().head
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("sum_c") == 14L)
    assert(r.getAs[Long]("abs_energy") == 52L) // 9+1+16+1+25
    assert(r.getAs[Long]("min_c") == 1L && r.getAs[Long]("max_c") == 5L)
    assert(r.getAs[Long]("med2") == 6L) // sorted (1,1,3,4,5): lo=hi=3
    assert(r.getAs[Long]("sum_abs_change") == 12L) // 2+3+3+4
    assert(r.getAs[Long]("count_above_mean") == 3L)
    assert(r.getAs[Long]("longest_strike_above_mean") == 1L) // T,F,T,F,T
    // deviations 5c−14 = (1,−9,6,−9,11): num = −9−54−54−99 = −216,
    // den = 1+81+36+81+121 = 320 → exact −0.675
    assert(r.getAs[Double]("ac1") == -216.0 / 320.0)
    assert(r.getAs[Long]("var_num") == 64L) // 5·52 − 14²
    assert(r.getAs[Double]("cid_ce") == math.sqrt(38.0)) // 4+9+9+16
    assert(r.getAs[Long]("c3_sum") == 36L) // 12+4+20
    assert(r.getAs[Long]("n_crossings") == 4L) // above-mean T,F,T,F,T
    // r13 additions on (3,1,4,1,5), mean 2.8: below = rows 2,4 (the 1s)
    assert(r.getAs[Long]("count_below_mean") == 2L)
    assert(r.getAs[Long]("longest_strike_below_mean") == 1L)
    assert(r.getAs[Long]("first_loc_max") == 5L) // max 5 at position 5
    assert(r.getAs[Long]("last_loc_min") == 4L)  // min 1 at 2 and 4
    assert(r.getAs[Long]("n_distinct") == 4L)    // {3,1,4,5}
    assert(r.getAs[Long]("n_peaks") == 1L)       // 4 > both neighbors
    // only 1 reoccurs (twice): points = 1·2, distinct values = 1
    assert(r.getAs[Long]("sum_reoccurring_points") == 2L)
    assert(r.getAs[Long]("sum_reoccurring_values") == 1L)
    // Σ(c_t − 2c_{t−1} + c_{t−2}) over t=3..5: telescopes to
    // (5−1) − (1−3) = 6
    assert(r.getAs[Long]("msd2_num") == 6L)
    // at-mean values count as NOT above (tsfresh np.diff(x > m)):
    // (2,4,3,3) → n=4, S=12, mean=3 exactly; above = F,T,F,F → 2 flips
    // (a strict sign-change rule would count only 1 — ADVICE r12)
    val atMean = Seq((2L, 1L, 2L), (2L, 2L, 4L), (2L, 3L, 3L),
      (2L, 4L, 3L)).toDF("k", "o", "c")
    val rm = graft.operators.Sessionize
      .tsFeatures(atMean, "k", Seq("o"), "c").collect().head
    assert(rm.getAs[Long]("n_crossings") == 2L)
    assert(rm.getAs[Long]("count_above_mean") == 1L)
    // at-mean rows (3,3) belong to NEITHER side: below counts only the 2
    assert(rm.getAs[Long]("count_below_mean") == 1L)
    assert(rm.getAs[Long]("longest_strike_below_mean") == 1L)
    // a constant series: zero deviations → null ac1, zero strikes,
    // null c3 (n < 3), zero variance/complexity/crossings
    val const = Seq((1L, 1L, 7L), (1L, 2L, 7L)).toDF("k", "o", "c")
    val rc = graft.operators.Sessionize
      .tsFeatures(const, "k", Seq("o"), "c").collect().head
    assert(rc.isNullAt(rc.fieldIndex("ac1")))
    assert(rc.getAs[Long]("longest_strike_above_mean") == 0L)
    assert(rc.getAs[Long]("med2") == 14L)
    assert(rc.getAs[Long]("var_num") == 0L)
    assert(rc.getAs[Double]("cid_ce") == 0.0)
    assert(rc.isNullAt(rc.fieldIndex("c3_sum")))
    assert(rc.getAs[Long]("n_crossings") == 0L)
    // (7,7): the value reoccurs — points 14, values 7; n < 3 → msd2 null
    assert(rc.getAs[Long]("sum_reoccurring_points") == 14L)
    assert(rc.getAs[Long]("sum_reoccurring_values") == 7L)
    assert(rc.isNullAt(rc.fieldIndex("msd2_num")))
  }

  test("tsFeatures wide mode equals narrow on small series, survives mega-series overflow") {
    // equality on the hand series: every integer feature identical
    val df = Seq((0L, 1L, 3L), (0L, 2L, 1L), (0L, 3L, 4L),
      (0L, 4L, 1L), (0L, 5L, 5L)).toDF("k", "o", "c")
    val narrow = graft.operators.Sessionize
      .tsFeatures(df, "k", Seq("o"), "c").collect().head
    val wide = graft.operators.Sessionize
      .tsFeatures(df, "k", Seq("o"), "c", wide = true).collect().head
    def num(r: Row, f: String): BigDecimal = r.get(r.fieldIndex(f)) match {
      case l: java.lang.Long => BigDecimal(l.longValue)
      case d: java.math.BigDecimal => BigDecimal(d)
    }
    for (f <- Seq("n", "sum_c", "abs_energy", "min_c", "max_c", "med2",
        "sum_abs_change", "count_above_mean", "c3_sum", "n_crossings",
        "var_num", "count_below_mean", "longest_strike_below_mean",
        "first_loc_max", "last_loc_min", "n_distinct", "n_peaks",
        "sum_reoccurring_points", "sum_reoccurring_values", "msd2_num"))
      assert(num(narrow, f) == num(wide, f), s"$f differs")
    assert(narrow.getAs[Double]("ac1") == wide.getAs[Double]("ac1"))
    assert(narrow.getAs[Double]("cid_ce") == wide.getAs[Double]("cid_ce"))
    // mega-series: alternating ±1000 over 30k rows → Σ(c·n−s)² =
    // n³·10⁶ ≈ 2.7e19 > Long.MaxValue: the narrow path raises ANSI
    // overflow LOUDLY, the wide path returns the exact closed form
    // (s = 0, dev_t = 1000n·(−1)^t → ac1 = −(n−1)·n²/(n·n²) = −(n−1)/n)
    val n = 30000
    val mega = (0 until n).map(t =>
      (9L, t.toLong, if (t % 2 == 0) 1000L else -1000L)).toDF("k", "o", "c")
    intercept[Exception] {
      graft.operators.Sessionize
        .tsFeatures(mega, "k", Seq("o"), "c").collect()
    }
    val rw = graft.operators.Sessionize
      .tsFeatures(mega, "k", Seq("o"), "c", wide = true).collect().head
    assert(rw.getAs[Double]("ac1") == -(n - 1).toDouble / n)
    // var_num = n·Σc² − S² = n·(n·10⁶) − 0 = n²·10⁶
    assert(BigDecimal(rw.getDecimal(rw.fieldIndex("var_num"))) ==
      BigDecimal(BigInt(n) * BigInt(n) * 1000000))
  }
}
