package graft

import org.apache.spark.sql.functions._
import graft.api.GraftFrame
import graft.operators.{Sessionize, Windows}

/** Hand-computed expectations for the round-6 reshape/alignment operators:
  * combine_first, compare, crosstab, pivot_table margins, linear
  * interpolation, calendar resample, pct rank / cumcount, winsorize,
  * unigram stats. (Their oracle queries cover the fixture-scale paths; these
  * specs pin the semantics on tiny literal frames, edge cases included.)
  */
class ReshapeSpec extends SparkSpecBase {
  import spark.implicits._

  test("combineFirst patches nulls, keeps left-only and right-only rows") {
    val a = GraftFrame(Seq(
      (1L, Some(10.0), "x"), (2L, None, "y"), (3L, Some(30.0), "z"))
      .toDF("k", "v", "tag"))
    val b = GraftFrame(Seq(
      (2L, 99.0), (3L, 77.0), (4L, 44.0)).toDF("k", "v"))
    val got = a.combineFirst(b, Seq("k")).df
      .select("k", "v", "tag").as[(Long, Option[Double], Option[String])]
      .collect().sortBy(_._1)
    assert(got === Seq(
      (1L, Some(10.0), Some("x")),   // left only
      (2L, Some(99.0), Some("y")),   // hole patched from right
      (3L, Some(30.0), Some("z")),   // left value wins
      (4L, Some(44.0), None)))       // right only; left-only column null
  }

  test("updateFrom overwrites with other's non-nulls, keeps self's row set") {
    val self = GraftFrame(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"))
    val other = GraftFrame(Seq(
      (2L, Some(99.0)), (3L, Option.empty[Double]), (9L, Some(77.0))).toDF("k", "v"))
    val got = self.updateFrom(other, Seq("k")).df
      .orderBy("k").as[(Long, Double)].collect()
    // row 2 overwritten, row 3's null in other does NOT erase, row 9 ignored
    assert(got.toSeq === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("validIndexBounds finds the non-null order span") {
    val df = GraftFrame(Seq(
      (1L, Option.empty[Double]), (2L, Some(5.0)), (3L, Some(6.0)),
      (4L, Option.empty[Double])).toDF("o", "v"))
    val got = df.validIndexBounds("o", "v").df.as[(Long, Long)].head()
    assert(got === ((2L, 3L)))
  }

  test("compareFrames keeps only differing rows as self/other pairs") {
    val self = GraftFrame(Seq((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "c"))
      .toDF("k", "v", "s"))
    val other = GraftFrame(Seq((1L, 1.0, "a"), (2L, 2.5, "b"), (3L, 3.0, "C"))
      .toDF("k", "v", "s"))
    val got = self.compareFrames(other, Seq("k"), Seq("v", "s")).df
      .orderBy("k")
      .select("k", "v_self", "v_other", "s_self", "s_other")
      .as[(Long, Double, Double, String, String)].collect()
    // row 1 is identical -> dropped; 2 differs in v, 3 differs in s
    assert(got === Seq((2L, 2.0, 2.5, "b", "b"), (3L, 3.0, 3.0, "c", "C")))
  }

  test("compareFrames treats null vs value as a difference (null-safe)") {
    val self = GraftFrame(Seq((1L, Some(1.0)), (2L, Option.empty[Double]))
      .toDF("k", "v"))
    val other = GraftFrame(Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("k", "v"))
    val got = self.compareFrames(other, Seq("k"), Seq("v")).df
    assert(got.count() === 1)  // row 2 (null == null) must NOT surface
    assert(got.select("k").as[Long].head() === 1L)
  }

  test("crosstab fills missing cells with zero over the explicit universe") {
    val df = GraftFrame(Seq(("r1", "a"), ("r1", "a"), ("r1", "b"), ("r2", "b"))
      .toDF("r", "c"))
    val got = df.crosstab("r", "c", Seq("a", "b", "z")).df
      .orderBy("r").select("r", "a", "b", "z")
      .as[(String, Long, Long, Long)].collect()
    assert(got === Seq(("r1", 2L, 1L, 0L), ("r2", 0L, 1L, 1L * 0)))
  }

  test("pivotTableMargins: margin row and column equal the grand totals") {
    val df = GraftFrame(Seq(
      ("x", "F", 1.0), ("x", "O", 2.0), ("y", "F", 3.0)).toDF("idx", "st", "v"))
    val got = df.pivotTableMargins("idx", "st", "v", Seq("F", "O")).df
      .orderBy("idx")
      .select("idx", "F", "O", "All")
      .as[(String, Option[Double], Option[Double], Option[Double])].collect()
    assert(got === Seq(
      ("All", Some(4.0), Some(2.0), Some(6.0)),
      ("x", Some(1.0), Some(2.0), Some(3.0)),
      ("y", Some(3.0), None, Some(3.0))))  // empty cell stays null like pandas
  }

  test("interpolateLinear: interior linear, leading null, trailing ffill") {
    val df = Seq(
      (1L, 1L, Option.empty[Double]),  // leading null -> stays null
      (1L, 2L, Some(10.0)),
      (1L, 3L, None), (1L, 4L, None),  // interior run: 10 -> 40 over 3 steps
      (1L, 5L, Some(40.0)),
      (1L, 6L, None))                  // trailing -> carries 40
      .toDF("k", "o", "v")
    val got = Windows.interpolateLinear(df, Seq("k"), Seq("o"), "v", "i")
      .orderBy("o").select("i").as[Option[Double]].collect()
    assert(got === Seq(None, Some(10.0), Some(20.0), Some(30.0), Some(40.0), Some(40.0)))
  }

  test("resampleDaily completes the calendar and ffills the sum") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 5L),
      (1L, "2024-01-01 11:00:00", 7L),
      (1L, "2024-01-04 09:00:00", 2L))  // 2-day gap
      .toDF("k", "ts", "v")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Sessionize.resampleDaily(df, "k", "ts", col("v"))
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("cnt"),
        col("sum_val"), col("sum_ffill"))
      .as[(String, Long, Option[Long], Long)].collect()
    assert(got === Seq(
      ("2024-01-01", 2L, Some(12L), 12L),
      ("2024-01-02", 0L, None, 12L),   // gap day: cnt 0, null sum, ffill
      ("2024-01-03", 0L, None, 12L),
      ("2024-01-04", 1L, Some(2L), 2L)))
  }

  test("resampleCalendar month grid steps calendar months, not 30 days") {
    val df = Seq(
      (1L, "2023-11-15 10:00:00", 3L),
      (1L, "2024-02-03 10:00:00", 7L))  // gap: Dec, Jan
      .toDF("k", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val got = Sessionize.resampleCalendar(df, "k", "ts", col("v"), "month")
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("cnt"), col("sum_ffill"))
      .as[(String, Long, Long)].collect()
    assert(got.map(_._1).toSeq ===
      Seq("2023-11-01", "2023-12-01", "2024-01-01", "2024-02-01"))
    assert(got.map(_._2).toSeq === Seq(1L, 0L, 0L, 1L))
    assert(got.map(_._3).toSeq === Seq(3L, 3L, 3L, 7L))
  }

  test("resampleCalendar month_end/quarter/year grids label pandas-style") {
    val df = Seq(
      (1L, "2023-11-15 10:00:00", 3L),
      (1L, "2024-02-03 10:00:00", 7L),
      (1L, "2025-06-20 10:00:00", 1L))
      .toDF("k", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    // '1M': month buckets labelled with the month's LAST day (leap Feb!)
    val me = Sessionize.resampleCalendar(df, "k", "ts", col("v"), "month_end")
      .orderBy("day").select(date_format(col("day"), "yyyy-MM-dd"))
      .as[String].collect()
    assert(me.take(4).toSeq ===
      Seq("2023-11-30", "2023-12-31", "2024-01-31", "2024-02-29"))
    assert(me.length === 20 && me.last === "2025-06-30")
    // '1QS': quarter starts, exact across unequal month lengths
    val q = Sessionize.resampleCalendar(df, "k", "ts", col("v"), "quarter")
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("cnt"))
      .as[(String, Long)].collect()
    assert(q.map(_._1).toSeq === Seq("2023-10-01", "2024-01-01", "2024-04-01",
      "2024-07-01", "2024-10-01", "2025-01-01", "2025-04-01"))
    assert(q.map(_._2).toSeq === Seq(1L, 1L, 0L, 0L, 0L, 0L, 1L))
    // '1YS': year starts, gap year filled with cnt=0 + ffill
    val y = Sessionize.resampleCalendar(df, "k", "ts", col("v"), "year")
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("cnt"), col("sum_ffill"))
      .as[(String, Long, Long)].collect()
    assert(y.toSeq === Seq(("2023-01-01", 1L, 3L), ("2024-01-01", 1L, 7L),
      ("2025-01-01", 1L, 1L)))
  }

  test("anchored resample offsets: W-WED right labels, YE Dec-31 labels, YS-JUL fiscal years") {
    import graft.operators.Sessionize
    // 2024-01-01 is a Monday; 2024-01-03 a Wednesday
    val df = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 1L),
      ("k", java.sql.Timestamp.valueOf("2024-01-03 05:00:00"), 2L),
      ("k", java.sql.Timestamp.valueOf("2024-01-04 05:00:00"), 4L),
      ("k", java.sql.Timestamp.valueOf("2024-01-17 05:00:00"), 8L))
      .toDF("k", "ts", "v")
    val wk = Sessionize.resampleCalendar(df, "k", "ts", col("v"), "W-WED")
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("cnt"), col("sum_val"))
      .as[(String, Long, Option[Long])].collect().toSeq
    // Jan 1 + Jan 3 label to Wed Jan 3 (a Wednesday labels itself);
    // Jan 4 to Jan 10; Jan 17 to Jan 17 with a cnt=0 gap week between
    assert(wk === Seq(("2024-01-03", 2L, Some(3L)),
      ("2024-01-10", 1L, Some(4L)), ("2024-01-17", 1L, Some(8L))))
    val yrs = Seq(
      ("k", java.sql.Timestamp.valueOf("2023-06-30 00:00:00"), 1L),
      ("k", java.sql.Timestamp.valueOf("2023-07-01 00:00:00"), 2L),
      ("k", java.sql.Timestamp.valueOf("2024-06-30 00:00:00"), 4L),
      ("k", java.sql.Timestamp.valueOf("2024-07-02 00:00:00"), 8L))
      .toDF("k", "ts", "v")
    val ye = Sessionize.resampleCalendar(yrs, "k", "ts", col("v"), "year_end")
      .orderBy("day").select(date_format(col("day"), "yyyy-MM-dd"), col("sum_val"))
      .as[(String, Option[Long])].collect().toSeq
    assert(ye === Seq(("2023-12-31", Some(3L)), ("2024-12-31", Some(12L))))
    // fiscal years starting July: FY23 = [2022-07-01, 2023-07-01) etc.
    val fy = Sessionize.resampleCalendar(yrs, "k", "ts", col("v"), "YS-JUL")
      .orderBy("day").select(date_format(col("day"), "yyyy-MM-dd"), col("sum_val"))
      .as[(String, Option[Long])].collect().toSeq
    assert(fy === Seq(("2022-07-01", Some(1L)), ("2023-07-01", Some(6L)),
      ("2024-07-01", Some(8L))))
    // quarter end: Q2-2023 labels Jun 30, Q3 Sep 30 (grid ran on starts)
    val qe = Sessionize.resampleCalendar(yrs, "k", "ts", col("v"), "quarter_end")
      .orderBy("day").select(date_format(col("day"), "yyyy-MM-dd"), col("sum_val"))
      .as[(String, Option[Long])].collect().toSeq
    assert(qe.head === ("2023-06-30", Some(1L)) &&
      qe(1) === ("2023-09-30", Some(2L)), s"qe=$qe")
    // Feb-anchored fiscal quarters start Feb/May/Aug/Nov: Jun 30 -> May 1
    val qs = Sessionize.resampleCalendar(yrs, "k", "ts", col("v"), "QS-FEB")
      .orderBy("day").select(date_format(col("day"), "yyyy-MM-dd"), col("sum_val"))
      .as[(String, Option[Long])].collect().toSeq
    assert(qs.head === ("2023-05-01", Some(3L)), s"qs=$qs")
    val e = intercept[IllegalArgumentException](
      Sessionize.resampleCalendar(df, "k", "ts", col("v"), "W-XYZ"))
    assert(e.getMessage.contains("W-MON"))
  }

  test("resampleAgg: chosen aggregates on the gap-free grid, end labels apply") {
    import graft.operators.Sessionize
    val df = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 10L),
      ("k", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 4L),
      // February empty; March has two rows
      ("k", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 7L),
      ("k", java.sql.Timestamp.valueOf("2024-03-30 00:00:00"), 1L))
      .toDF("k", "ts", "v")
    val got = Sessionize.resampleAgg(df, "k", "ts", "month_end",
        Seq("n" -> count(lit(1)), "vmin" -> min(col("v")), "vmax" -> max(col("v"))))
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("n"), col("vmin"), col("vmax"))
      .as[(String, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(got === Seq(
      ("2024-01-31", Some(2L), Some(4L), Some(10L)),
      ("2024-02-29", None, None, None), // gap month: null bin (leap-aware label)
      ("2024-03-31", Some(2L), Some(1L), Some(7L))))
  }

  test("rank method='average'/'max' reproduce pandas tie rules") {
    val df = Seq(1L -> 10.0, 2L -> 20.0, 3L -> 20.0, 4L -> 20.0, 5L -> 30.0)
      .toDF("id", "v")
    // pandas: [1, 3, 3, 3, 5] avg; [1, 4, 4, 4, 5] max
    val avg = GraftFrame(df).rank("r", Nil, Seq(col("v")), "average")
      .df.orderBy("id").select("r").as[Double].collect().toSeq
    assert(avg === Seq(1.0, 3.0, 3.0, 3.0, 5.0))
    val mx = GraftFrame(df).rank("r", Nil, Seq(col("v")), "max")
      .df.orderBy("id").select("r").as[Long].collect().toSeq
    assert(mx === Seq(1L, 4L, 4L, 4L, 5L))
    // desc order columns work (tie groups via the rank value)
    val avgD = GraftFrame(df).rank("r", Nil, Seq(col("v").desc), "average")
      .df.orderBy("id").select("r").as[Double].collect().toSeq
    assert(avgD === Seq(5.0, 3.0, 3.0, 3.0, 1.0))
    // pct variants: exact rationals over the non-null count
    val avgPct = GraftFrame(df).rankPct("r", Nil, Seq(col("v")), "average")
      .df.orderBy("id").select("r").as[Double].collect().toSeq
    assert(avgPct === Seq(0.2, 0.6, 0.6, 0.6, 1.0))
    val maxPct = GraftFrame(df).rankPct("r", Nil, Seq(col("v")), "max")
      .df.orderBy("id").select("r").as[Double].collect().toSeq
    assert(maxPct === Seq(0.2, 0.8, 0.8, 0.8, 1.0))
    // null order keys stay null and don't shift the non-null ranking
    val withNull = Seq((1L, Some(10.0)), (2L, None), (3L, Some(20.0)))
      .toDF("id", "v")
    val np = GraftFrame(withNull).rankPct("r", Nil, Seq(col("v")), "average")
      .df.orderBy("id").select("r").as[Option[Double]].collect().toSeq
    assert(np === Seq(Some(0.5), None, Some(1.0)))
  }

  test("corrMatrixSpearman: monotone invariance, sign, and scipy tie value") {
    // y = x³ is a monotone transform -> rho(x,y) = 1 exactly;
    // z = -x -> rho(x,z) = -1; ranks are exact so the values are too
    val df = GraftFrame(Seq(1.0, 3.0, 2.0, 5.0, 4.0, 9.0, 7.0)
      .map(x => (x, x * x * x, -x)).toDF("x", "y", "z"))
    val got = df.corrMatrixSpearman(Seq("x", "y", "z")).df
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("x", "y")) === 1.0 && got(("x", "z")) === -1.0 &&
      got(("y", "z")) === -1.0)
    // tie case, hand-computed (scipy.stats.spearmanr agrees):
    // x=[1,2,2,3] -> avg ranks [1, 2.5, 2.5, 4]; y=[1,3,2,4] -> [1,3,2,4]
    // pearson of those = 4.5 / sqrt(4.5 * 5) = 3/sqrt(10)
    val tied = GraftFrame(Seq((1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0))
      .toDF("x", "y"))
    val rho = tied.corrMatrixSpearman(Seq("x", "y")).df
      .select("rho").as[Double].head()
    assert(math.abs(rho - 3.0 / math.sqrt(10.0)) < 1e-12, s"rho=$rho")
    // rows with any null drop (listwise): the null row can't perturb rho
    val withNull = GraftFrame(Seq((Some(1.0), Some(1.0)), (Some(2.0), None),
      (Some(3.0), Some(2.0)), (Some(4.0), Some(3.0))).toDF("x", "y"))
    val rho2 = withNull.corrMatrixSpearman(Seq("x", "y")).df
      .select("rho").as[Double].head()
    assert(rho2 === 1.0)
  }

  test("arithAligned applies pandas fill_value cell rules") {
    val l = GraftFrame(Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0))
      .toDF("k", "v", "c"))
    val r = GraftFrame(Seq((2L, 5.0), (3L, 7.0)).toDF("k", "v"))
    // fill_value=0: one-sided cells fill, both-missing stays null
    val filled = l.addAligned(r, Seq("k"), Some(0.0)).df.orderBy("k")
      .select("k", "v", "c").as[(Long, Option[Double], Option[Double])]
      .collect()
    assert(filled.toSeq === Seq(
      (1L, Some(10.0), Some(100.0)),   // right missing -> v + 0, c + 0
      (2L, Some(25.0), Some(200.0)),   // both present for v; c right-missing
      (3L, Some(7.0), None)))          // left row missing; c missing BOTH sides
    // no fill_value: one-sided cells are null (pandas NaN)
    val bare = l.addAligned(r, Seq("k")).df.orderBy("k")
      .select("v").as[Option[Double]].collect()
    assert(bare.toSeq === Seq(None, Some(25.0), None))
    // other ops route through the same alignment
    val sub = l.subAligned(r, Seq("k"), Some(0.0)).df.orderBy("k")
      .select("v").as[Double].collect()
    assert(sub.toSeq === Seq(10.0, 15.0, -7.0))
    val e = intercept[IllegalArgumentException](
      l.arithAligned(r, Seq("k"), "xor"))
    assert(e.getMessage.contains("add|sub|mul|div"))
  }

  test("series alignment (axis=0), implicit setIndex keys, column broadcast (axis=1)") {
    val l = GraftFrame(Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0))
      .toDF("k", "v", "c")).setIndex("k")
    val s = GraftFrame(Seq((2L, 5.0), (3L, 7.0)).toDF("k", "s"))
    // keys come from setIndex (no on=); the one series value hits EVERY
    // numeric column; fill covers one-sided cells
    val sub = l.arithAlignedSeries(s, "sub", fillValue = Some(0.0))
      .df.orderBy("k").select("k", "v", "c")
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(sub.toSeq === Seq(
      (1L, Some(10.0), Some(100.0)),  // series missing -> v - 0, c - 0
      (2L, Some(15.0), Some(195.0)),
      (3L, Some(-7.0), Some(-7.0)))) // frame row missing -> 0 - s
    // without fill, one-sided cells are null
    val bare = l.arithAlignedSeries(s, "sub").df.orderBy("k")
      .select("v").as[Option[Double]].collect()
    assert(bare.toSeq === Seq(None, Some(15.0), None))
    // no keys anywhere -> loud failure
    val e = intercept[IllegalArgumentException](
      GraftFrame(l.df).arithAlignedSeries(s, "sub"))
    assert(e.getMessage.contains("setIndex"))
    // aligned output keeps its keys as the declared index, so a chained
    // axis=1 broadcast never treats them as value columns
    val chained = l.arithAlignedSeries(s, "sub", fillValue = Some(0.0))
      .arithColumnBroadcast(Map("v" -> 10.0), "mul")
      .df.orderBy("k").select("k", "v", "c")
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(chained.toSeq === Seq(
      (1L, Some(100.0), None),   // c not in the map, no fill -> null
      (2L, Some(150.0), None),
      (3L, Some(-70.0), None)))
    // pow/mod route through the same aligned family
    val p = GraftFrame(Seq((1L, 3.0)).toDF("k", "v"))
      .powAligned(GraftFrame(Seq((1L, 2.0)).toDF("k", "v")), Seq("k"))
      .df.select("v").as[Double].head()
    assert(p === 9.0)
    val m = GraftFrame(Seq((1L, -7.0)).toDF("k", "v"))
      .modAligned(GraftFrame(Seq((1L, 3.0)).toDF("k", "v")), Seq("k"))
      .df.select("v").as[Double].head()
    assert(m === 2.0) // python sign-of-divisor mod
    // reversed binop: rsub = other - this
    val rs = GraftFrame(Seq((1L, 3.0)).toDF("k", "v"))
      .arithAligned(GraftFrame(Seq((1L, 10.0)).toDF("k", "v")), Seq("k"), "rsub")
      .df.select("v").as[Double].head()
    assert(rs === 7.0)
    // aligned comparisons: pandas NaN semantics — missing on either side
    // compares false (eq/lt), true for ne
    val cl = GraftFrame(Seq((1L, 5.0), (2L, 5.0)).toDF("k", "v"))
    val cr = GraftFrame(Seq((2L, 5.0), (3L, 9.0)).toDF("k", "v"))
    val cres = cl.compareAligned(cr, Seq("eq", "ne", "lt"), Seq("k"))
      .df.orderBy("k").select("k", "v_eq", "v_ne", "v_lt")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(cres === Seq((1L, false, true, false), (2L, true, false, false),
      (3L, false, true, false)))
  }

  test("arithPositional aligns on the implicit row position (default RangeIndex)") {
    // different lengths: the longer frame's tail fills (or nulls)
    val l = GraftFrame(Seq(10.0, 20.0, 30.0).toDF("v"))
    val r = GraftFrame(Seq(1.0, 2.0).toDF("v"))
    val filled = l.arithPositional(r, "add", fillValue = Some(0.0))
      .df.orderBy("row_pos").select("row_pos", "v")
      .as[(Long, Option[Double])].collect().toSeq
    assert(filled === Seq((0L, Some(11.0)), (1L, Some(22.0)), (2L, Some(30.0))))
    val bare = l.arithPositional(r, "add").df.orderBy("row_pos")
      .select("v").as[Option[Double]].collect().toSeq
    assert(bare === Seq(Some(11.0), Some(22.0), None))
    // the position key survives as the declared index for chaining
    val out = l.arithPositional(r, "add", fillValue = Some(0.0))
    assert(out.index === Seq("row_pos"))
    // a declared index on either side is a loud error — that's the
    // arithAligned path
    val e = intercept[IllegalArgumentException](
      l.setIndex("v").arithPositional(r, "add"))
    assert(e.getMessage.contains("arithAligned"))
    // positional comparisons: tail positions compare false (ne true)
    val cmp = l.comparePositional(GraftFrame(Seq(10.0, 21.0).toDF("v")),
        Seq("eq", "ne"))
      .df.orderBy("row_pos").select("v_eq", "v_ne")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(cmp === Seq((true, false), (false, true), (false, true)))
  }

  test("declared index propagates through index-preserving transformations") {
    val f = GraftFrame(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")).setIndex("k")
    assert(f.assign("w" -> (f("v") * 2)).index === Seq("k"))
    assert(f.query("v > 5").index === Seq("k"))
    assert(f.filter(f("v") > 5).index === Seq("k"))
    assert(f.eval("w", "v + 1").index === Seq("k"))
    assert(f.insert(1, "w", f("v")).index === Seq("k"))
    assert(f.drop("v").index === Seq("k"))
    // rename maps index names through the mapping
    assert(f.rename("k" -> "kk").index === Seq("kk"))
    assert(f.addPrefix("p_").index === Seq("p_k"))
    assert(f.addSuffix("_s").index === Seq("k_s"))
    // dropping an index column clears the whole declared index
    assert(f.select("v").index === Nil)
    assert(f.drop("k").index === Nil)
    // rank keeps the index on every method branch (ADVICE r9)
    for (m <- Seq("min", "dense", "first", "max", "average"))
      assert(f.rank("r", Seq.empty, Seq(f("v")), m).index === Seq("k"), m)
    // the rest of the column-preserving family
    assert(f.sortValues(Seq("v")).index === Seq("k"))
    assert(f.head(1).index === Seq("k"))
    assert(f.fillna(Map("v" -> 0.0)).index === Seq("k"))
    assert(f.dropna().index === Seq("k"))
    assert(f.dropnaThresh(1).index === Seq("k"))
    assert(f.astype("v" -> "long").index === Seq("k"))
    assert(f.clip("v", 0.0, 5.0).index === Seq("k"))
  }

  test("covMatrix matches hand-computed sample covariances") {
    val df = GraftFrame(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y"))
    val got = df.covMatrix(Seq("x", "y")).df
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got(("x", "x")) - 1.0) < 1e-12)   // var([1,2,3]) = 1
    assert(math.abs(got(("x", "y")) - 2.0) < 1e-12)   // cov = 2
    assert(math.abs(got(("y", "y")) - 4.0) < 1e-12)
  }

  test("rankPct is rank/n and cumcount is the 0-based group position") {
    val df = GraftFrame(Seq((1L, 10.0), (1L, 10.0), (1L, 30.0), (1L, 40.0))
      .toDF("k", "v"))
    val pct = df.rankPct("p", Seq("k"), Seq(col("v")), "min").df
      .orderBy("v").select("p").as[Double].collect()
    assert(pct === Seq(0.25, 0.25, 0.75, 1.0))  // pandas rank(pct=True, method='min')
    val cc = df.groupby("k").cumcount("cc", Seq("v")).df
      .orderBy("v", "cc").select("cc").as[Long].collect()
    assert(cc === Seq(0L, 1L, 2L, 3L))
  }

  test("rankPct nulls out null order keys and divides by the non-null count") {
    val df = GraftFrame(Seq(
      (1L, Option.empty[Double]), (1L, Some(10.0)), (1L, Some(20.0)))
      .toDF("k", "v"))
    val got = df.rankPct("p", Seq("k"), Seq(col("v")), "min").df
      .orderBy(col("v").asc_nulls_first).select("p")
      .as[Option[Double]].collect()
    assert(got.toSeq === Seq(None, Some(0.5), Some(1.0)))  // pandas semantics
  }

  test("pivotTableMargins keeps a genuine null index distinct from All") {
    val df = GraftFrame(Seq(
      (Some("x"), "F", 1.0), (Option.empty[String], "F", 9.0)).toDF("idx", "st", "v"))
    val got = df.pivotTableMargins("idx", "st", "v", Seq("F")).df
      .select("idx", "All").as[(Option[String], Option[Double])].collect().toMap
    assert(got(Some("All")) === Some(10.0))  // grand total
    assert(got(Some("x")) === Some(1.0))
    assert(got(None) === Some(9.0))          // the null data group survives as null
  }

  test("mergeValidated passes trivially on an empty validated side") {
    val empty = GraftFrame(Seq.empty[(Long, String)].toDF("k", "x"))
    val r = GraftFrame(Seq((1L, 1.0)).toDF("k", "y"))
    assert(empty.mergeValidated(r, Seq("k"), validate = "1:1").df.count() === 0)
  }

  test("updateFrom rejects a non-unique other side like pandas") {
    val self = GraftFrame(Seq((1L, 1.0)).toDF("k", "v"))
    val dup = GraftFrame(Seq((1L, 2.0), (1L, 3.0)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] { self.updateFrom(dup, Seq("k")) }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("winsorize passes null-group rows through unclipped") {
    val df = GraftFrame(Seq(
      (Some("g"), 1.0), (Some("g"), 100.0), (Option.empty[String], 5.0))
      .toDF("k", "v"))
    val out = df.winsorize("v", "w", 0.05, 0.95, by = Seq("k")).df
    assert(out.count() === 3)  // the null-keyed row is preserved
    assert(out.filter(col("k").isNull).select("w").as[Double].head() === 5.0)
  }

  test("winsorize clips at the group quantiles") {
    // group g: values 1..20 -> p05 = 1.95, p95 = 19.05 (linear interpolation)
    val df = GraftFrame((1 to 20).map(i => ("g", i.toDouble)).toDF("k", "v"))
    val got = df.winsorize("v", "w", 0.05, 0.95, by = Seq("k")).df
      .orderBy("v").select("w").as[Double].collect()
    assert(math.abs(got.head - 1.95) < 1e-9)
    assert(math.abs(got.last - 19.05) < 1e-9)
    assert(got(9) === 10.0)  // interior values untouched
  }

  test("mergeValidated: 1:1 passes on unique keys, throws on dup side") {
    val l = GraftFrame(Seq((1L, "a"), (2L, "b")).toDF("k", "x"))
    val r = GraftFrame(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "y"))
    assert(l.mergeValidated(r, Seq("k"), validate = "1:1").df.count() === 2)
    val rDup = GraftFrame(Seq((1L, 10.0), (1L, 11.0)).toDF("k", "y"))
    val e = intercept[IllegalArgumentException] {
      l.mergeValidated(rDup, Seq("k"), validate = "1:1")
    }
    assert(e.getMessage.contains("right side has duplicate keys"))
    // m:1 constrains only the right side -> dup LEFT is fine
    val lDup = GraftFrame(Seq((1L, "a"), (1L, "a2")).toDF("k", "x"))
    assert(lDup.mergeValidated(r, Seq("k"), validate = "m:1").df.count() === 2)
  }

  test("dropnaThresh keeps rows with at least thresh non-nulls") {
    val df = GraftFrame(Seq(
      (1L, Some(1.0), Some("a")), (2L, None, Some("b")), (3L, None, None))
      .toDF("k", "v", "s"))
    val kept = df.dropnaThresh(2, Seq("v", "s")).df.select("k").as[Long].collect()
    assert(kept.toSeq === Seq(1L))
    val kept1 = df.dropnaThresh(1, Seq("v", "s")).df.select("k").as[Long].collect().sorted
    assert(kept1.toSeq === Seq(1L, 2L))
  }

  test("duplicatedKeep: last marks all but the final row, none marks all dups") {
    val df = GraftFrame(Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "o"))
    val last = df.duplicatedKeep(Seq("k"), "o", "last").df
      .orderBy("o").select("duplicated").as[Boolean].collect()
    assert(last.toSeq === Seq(true, false, false))
    val none = df.duplicatedKeep(Seq("k"), "o", "none").df
      .orderBy("o").select("duplicated").as[Boolean].collect()
    assert(none.toSeq === Seq(true, true, false))
  }

  test("json round-trip preserves rows and schema-compatible values") {
    val out = "/root/repo/target/json_spec"
    val df = GraftFrame(Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name"))
    df.toJson(out, singleFile = true)
    val back = graft.api.GraftSession(spark).readJson(out)
      .astype("id" -> "long").df
      .orderBy("id").as[(Long, String)].collect()
    assert(back.toSeq === Seq((1L, "alpha"), (2L, "beta")))
  }

  test("asofJoinPriorTol nulls matches older than the tolerance") {
    val left = Seq((1L, "2024-01-01 00:10:00", 100L), (1L, "2024-01-01 02:00:00", 101L))
      .toDF("k", "ts", "lid").withColumn("ts", to_timestamp(col("ts")))
    val right = Seq((1L, "2024-01-01 00:05:00", 7L))
      .toDF("k", "ts", "rid").withColumn("ts", to_timestamp(col("ts")))
    val got = Sessionize.asofJoinPriorTol(left, right, "k", "ts", "rid",
        toleranceMicros = 600L * 1000000L)  // 10 min
      .orderBy("lid").select("lid", "asof_rid")
      .as[(Long, Option[Long])].collect()
    // first left row: 5 min gap -> match; second: ~2h -> nulled by tolerance
    assert(got === Seq((100L, Some(7L)), (101L, None)))
  }

  test("transitionCounts matches the hand-computed journey matrix") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "buy"),
      (2L, 4L, "view"), (2L, 5L, "view"), (2L, 6L, "click"))
      .toDF("user_id", "event_id", "et")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_interval(0, 0, 0, 0, 0, 0, event_id)"))
    val got = Sessionize.transitionCounts(ev, "user_id", "ts", "event_id", "et")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(
      ("view", "click") -> 2L, ("click", "buy") -> 1L, ("view", "view") -> 1L))
  }

  test("funnelSteps: ordered, windowed, strictly-after step matching") {
    import java.sql.Timestamp
    import graft.operators.Sessionize
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      (2L, ts(0), "view"), (2L, ts(5), "purchase"), (2L, ts(10), "click"),
      (3L, ts(0), "click"),                       // never saw step 1
      (4L, ts(0), "view"), (4L, ts(7200), "click")) // outside the window
      .toDF("user_id", "ts", "event_type")
    val got = Sessionize.funnelSteps(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 3600L)
      .orderBy($"step").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("decomposeAdditive: components reconstruct the observed series") {
    // 4 weeks of a pure weekly pattern: cnt depends only on day-of-week
    val rows = (0 until 28).flatMap { d =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      val n = (d % 7) + 1 // 1..7 by weekday position
      (0 until n).map(i => (1L, java.sql.Timestamp.valueOf(day.atTime(10, i))))
    }
    val ev = rows.toDF("user_id", "ts")
    val got = Sessionize.decomposeAdditive(ev, "user_id", "ts", period = 7)
      .orderBy("day")
      .select("cnt", "trend", "seasonal", "resid")
      .collect()
    got.foreach { r =>
      if (!r.isNullAt(1)) {
        // trend of a pure period-7 series is the flat mean 4.0
        assert(math.abs(r.getDouble(1) - 4.0) < 1e-9)
        // additive identity: cnt = trend + seasonal + resid
        val recon = r.getDouble(1) + r.getDouble(2) + r.getDouble(3)
        assert(math.abs(recon - r.getLong(0)) < 1e-9)
        // residual of a noiseless seasonal series vanishes
        assert(math.abs(r.getDouble(3)) < 1e-9)
      }
    }
    assert(got.count(!_.isNullAt(1)) === 28 - 6) // 3 null edges each side
  }

  test("hashingTf buckets are stable and counts sum to the token count") {
    val df = Seq((1L, "a b a c"), (2L, "a")).toDF("id", "text")
    val tf = graft.functions.TextFunctions.hashingTf(df, "id", "text", dim = 8)
      .as[(Long, Long, Long)].collect()
    assert(tf.forall(r => r._2 >= 0 && r._2 < 8))
    assert(tf.filter(_._1 == 1L).map(_._3).sum === 4L)
    // same token -> same bucket across docs
    val aBuckets = tf.filter(r => r._3 >= 1).groupBy(_._1)
    val b1 = tf.filter(_._1 == 1L).map(_._2).toSet
    val b2 = tf.filter(_._1 == 2L).map(_._2).toSet
    assert(b2.subsetOf(b1), "doc 2's only token 'a' must hash like doc 1's 'a'")
  }

  test("unigramStats: entropy of a uniform 2-word doc is 1 bit, ttr exact") {
    val df = Seq((1L, "a b a b"), (2L, "x x x x")).toDF("id", "text")
    val got = graft.functions.TextFunctions.unigramStats(df, "id", "text")
      .orderBy("id")
      .select("tokens", "types", "ttr", "entropy")
      .as[(Long, Long, Double, Double)].collect()
    assert(got(0) === ((4L, 2L, 0.5, 1.0)))   // H(uniform over 2) = 1 bit
    assert(got(1)._4 === 0.0)                 // single-type doc: H = 0 exactly
  }

  test("transpose rejects non-numeric value columns loudly") {
    // the cast-to-double cell model would silently null a string column —
    // both transpose paths must name the offender instead (ADVICE r7)
    val df = Seq(("a", 1.0, "red"), ("b", 2.0, "blue")).toDF("k", "x", "tag")
    val e = intercept[IllegalArgumentException](GraftFrame(df).transpose("k"))
    assert(e.getMessage.contains("tag") && e.getMessage.contains("string"))
    val e2 = intercept[IllegalArgumentException](
      GraftFrame(df).transposeSmall("k"))
    assert(e2.getMessage.contains("tag"))
    // all-numeric frames (incl. int columns) still transpose
    val ok = GraftFrame(Seq(("a", 1, 2.0)).toDF("k", "i", "x"))
      .transpose("k").df
    assert(ok.columns.toSeq == Seq("column", "a"))
  }

  test("transpose: distributed path matches transposeSmall on a small frame") {
    val df = Seq(("a", 1.0, 10.0), ("b", 2.0, 20.0), ("c", 3.0, 30.0))
      .toDF("k", "x", "y")
    val wide = GraftFrame(df).transpose("k").df.orderBy("column")
    val small = GraftFrame(df).transposeSmall("k").df.orderBy("column")
    assert(wide.columns.toSeq == small.columns.toSeq)
    assert(wide.collect().toSeq == small.collect().toSeq)
  }

  test("transpose lifts the 10k wall: 12k distinct ids come back as columns") {
    val n = 12000
    val df = spark.range(n).select(
      format_string("id%06d", col("id")).as("k"),
      col("id").cast("double").as("x"),
      (col("id") * 2).cast("double").as("y"))
    val out = GraftFrame(df).transpose("k").df
    assert(out.columns.length == n + 1)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("x").getAs[Double]("id000007") == 7.0)
    assert(rows("y").getAs[Double]("id011999") == 23998.0)
    // duplicate-id parity with pivot/first: value present, not an error
    val dup = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0)).toDF("k", "x")
    val d = GraftFrame(dup).transpose("k").df.collect().head
    assert(d.getAs[Double]("a") == 1.0 && d.getAs[Double]("b") == 2.0)
    // width guard fails loudly
    val e = intercept[IllegalArgumentException] {
      GraftFrame(df).transpose("k", maxCols = 100)
    }
    assert(e.getMessage.contains("columns"))
  }
}
