package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over batch event tables: sessionization, tumbling /
  * sliding windows, as-of joins. The streaming variants (true
  * Structured Streaming with watermarks) live in graft.streaming; these
  * declarative forms produce identical results on static data and are what
  * a backfill over 100 TB of history would run.
  */
object Sessionize {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSeconds`. Returns the input
    * plus (session_id) — the classic lag + cumulative-sum formulation, one
    * shuffle on the user key. */
  def assignSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    // Compare in microseconds (Spark's native timestamp precision): a
    // second-truncated comparison would mis-classify gaps falling inside
    // (gapSeconds, gapSeconds+1) on sub-second timestamps.
    val isNew = when(prevTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__new_session", isNew)
      .withColumn("session_seq",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Tumbling event-time window start as epoch seconds (engine-neutral:
    * integer arithmetic only, reproducible in any SQL engine). */
  def tumblingStartEpoch(ts: org.apache.spark.sql.Column, widthSeconds: Long) =
    floor(unix_timestamp(ts) / widthSeconds) * widthSeconds

  /** Scale-safe interval (range) join: every (point, interval) pair of the
    * same key with start <= ts < end. Both sides are bucketed on
    * floor(epoch / bucketMicros); an interval spanning k buckets replicates
    * k times, and the join runs on (key, bucket) with an exact containment
    * filter — turning the unbounded theta-join into an equi-join whose
    * blow-up is bounded by interval length / bucket width (pick the bucket
    * near the typical interval length). Intervals with end <= start are
    * dropped (empty).
    *
    * points: (key, ts, ...); intervals: (key, start, end, ...). */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketMicros: Long): DataFrame = {
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(tsCol)) / bucketMicros))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(unix_micros(col(startCol)) / bucketMicros),
          floor((unix_micros(col(endCol)) - 1) / bucketMicros))))
    p.join(iv, Seq(keyCol, "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** As-of join: for each left row, the latest right row of the same key
    * with right.ts <= left.ts. Implemented by unioning both sides tagged,
    * and carrying the last right value forward with last(ignoreNulls) over
    * the key-ordered window — one shuffle, no range explosion, the standard
    * scalable formulation (cf. Spark's own AsOfJoin logical node and
    * pandas merge_asof semantics; absent from the reference, which has no
    * ordered join at all — SURVEY §2.4).
    *
    * left: (key, ts, left cols...) right: (key, ts, payload)
    * Returns left rows + `asof_<payload>` column. */
  def asofJoinPrior(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right.select(
        col(keyCol), col(tsCol),
        lit(0).as("__side"), col(payloadCol).as("__payload"))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.toSeq.map(col): _*).union(l)
    // order right rows before left rows at identical ts (side 0 first)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSelf = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(s"asof_$payloadCol",
        when(col("__side") === 1, last(col("__payload"), ignoreNulls = true).over(w))
          .otherwise(last(col("__payload"), ignoreNulls = true).over(wSelf)))
      .filter(col("__side") === 1)
      .drop("__side", "__payload")
  }

  /** [[asofJoinPrior]] with pandas merge_asof's `tolerance=`: the prior
    * match only counts when it is at most `toleranceMicros` old, otherwise
    * the payload is null (row kept, like pandas). Same single-shuffle
    * tagged union — the matched right timestamp rides along in a struct
    * payload and the tolerance is one comparison at the end. */
  def asofJoinPriorTol(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCol: String,
      toleranceMicros: Long): DataFrame = {
    val packed = right.select(col(keyCol), col(tsCol),
      struct(col(payloadCol).as("p"), col(tsCol).as("rts")).as("__pt"))
    asofJoinPrior(left, packed, keyCol, tsCol, "__pt")
      .withColumn(s"asof_$payloadCol",
        when(unix_micros(col(tsCol)) -
          unix_micros(col("asof___pt").getField("rts")) <= toleranceMicros,
          col("asof___pt").getField("p")))
      .drop("asof___pt")
  }

  /** As-of join, forward direction (pandas merge_asof
    * direction='forward'): for each left row, the EARLIEST right row of
    * the same key with right.ts >= left.ts. Same single-shuffle tagged
    * union as [[asofJoinPrior]], mirrored: right rows order AFTER left
    * rows at identical ts (exact matches allowed), and the first non-null
    * payload in the following frame is carried back. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(0))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right.select(
        col(keyCol), col(tsCol),
        lit(1).as("__side"), col(payloadCol).as("__payload"))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.toSeq.map(col): _*).union(l)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(1, Window.unboundedFollowing)
    unioned
      .withColumn(s"asof_$payloadCol",
        first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__payload")
  }

  /** As-of join, nearest direction (pandas merge_asof
    * direction='nearest'): whichever of the prior and forward matches is
    * closer in time wins; prior wins exact ties. Composes the two
    * single-shuffle passes and compares the µs distances. Right must
    * carry a ts payload column for the distance; this variant returns the
    * matched right TIMESTAMP as `asof_<payloadCol>` plus the chosen
    * payload. */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCol: String): DataFrame = {
    // carry (payload, right_ts) as one struct payload through both passes
    val packed = right.select(col(keyCol), col(tsCol),
      struct(col(payloadCol).as("p"), col(tsCol).as("rts")).as("__pk"))
    val prior = asofJoinPrior(left, packed, keyCol, tsCol, "__pk")
      .withColumnRenamed("asof___pk", "__prior")
    val both = asofJoinForward(prior, packed, keyCol, tsCol, "__pk")
      .withColumnRenamed("asof___pk", "__fwd")
    val dPrior = unix_micros(col(tsCol)) - unix_micros(col("__prior.rts"))
    val dFwd = unix_micros(col("__fwd.rts")) - unix_micros(col(tsCol))
    val chosen = when(col("__prior").isNull, col("__fwd"))
      .when(col("__fwd").isNull, col("__prior"))
      .when(dPrior <= dFwd, col("__prior"))
      .otherwise(col("__fwd"))
    both
      .withColumn(s"asof_$payloadCol", chosen.getField("p"))
      .drop("__prior", "__fwd")
  }

  /** Daily retention cohorts: users grouped by first-seen day; for each
    * cohort and day-offset k ≤ maxDays, how many distinct users were
    * active. Two partial-aggregatable passes (distinct user-days, then
    * per-(cohort, k) distinct users) plus one shuffle join on the user —
    * the standard cohort-table formulation. */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxDays: Int): DataFrame = {
    val days = events
      .select(col(userCol), to_date(col(tsCol)).as("day")).distinct()
    val first = days.groupBy(col(userCol)).agg(min(col("day")).as("cohort"))
    days.join(first, Seq(userCol))
      .withColumn("k", datediff(col("day"), col("cohort")).cast("long"))
      .filter(col("k") <= maxDays)
      .groupBy(col("cohort"), col("k"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Time-bucketed OHLC resampling (pandas resample().ohlc()): per key and
    * fixed window, the first/max/min/last of `valCol`. Open/close are
    * deterministic struct-min/max over (event time, idCol, value) — one
    * partial/final aggregate, no window sort. */
  def ohlc(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      widthSeconds: Long): DataFrame = {
    val t = unix_micros(col(tsCol))
    val bucket = (floor(t / (widthSeconds * 1000000L)) * widthSeconds).cast("long")
    events
      .groupBy(col(keyCol), bucket.as("w_start"))
      .agg(
        min(struct(t.as("t"), col(idCol).as("i"), col(valCol).as("v")))
          .getField("v").as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max(struct(t.as("t"), col(idCol).as("i"), col(valCol).as("v")))
          .getField("v").as("close"),
        count(lit(1)).as("n"))
  }

  /** pandas resample('1D') with calendar completion (asfreq semantics):
    * per key, daily aggregates on a GAP-FREE day grid from the key's first
    * to last observed day. Empty days appear with cnt = 0, a null `sum`
    * (pandas' asfreq hole), and `sum_ffill` = the previous observed day's
    * sum (pandas resample().ffill()).
    *
    * Scale shape: the day grid is generated per key from a 2-column
    * min/max aggregate (`sequence` + explode — rows ∝ keys × span days,
    * never a global calendar cross-join), the daily aggregate is
    * partial+final, and the grid join + ffill share the per-key
    * partitioning. `sumCol` goes through the caller's column (cast to
    * exact DECIMAL upstream for bit-exact oracles). */
  def resampleDaily(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      sumCol: Column): DataFrame =
    resampleCalendar(events, keyCol, tsCol, sumCol, "day")

  /** [[resampleDaily]] generalized over the calendar unit — pandas
    * resample('1D' | '1W' | '1MS' | '1M' | '1QS' | '1YS' | '1H' |
    * '1min' | '15min'; reference dataframe/datasource/date_range.py frequency
    * table): buckets are date_trunc(unit) starts (ISO Monday weeks;
    * epoch-aligned quarter hours), the per-key grid steps by one unit,
    * month/quarter/year grids handle unequal month lengths because
    * `sequence` steps calendar months, not fixed durations.
    * `month_end` is pandas '1M': bucketing is by calendar month and the
    * bucket LABEL is the month's last day. Sub-daily units keep the
    * bucket as a TIMESTAMP (the `day` output column name is kept for
    * API stability). */
  def resampleCalendar(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      sumCol: Column,
      unit: String): DataFrame = {
    val (bucket, step, relabel) = calendarBucketSpec(unit, tsCol)
    val perBucket = events
      .groupBy(col(keyCol), bucket.as("day"))
      .agg(count(lit(1)).as("cnt"), sum(sumCol).as("sum_val"))
    val grid = events
      .groupBy(col(keyCol))
      .agg(min(bucket).as("__d0"), max(bucket).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), step)).as("day"))
    val joined = grid.join(perBucket, Seq(keyCol, "day"), "left")
    val wBack = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    relabel(joined.select(col(keyCol), col("day"),
      coalesce(col("cnt"), lit(0L)).as("cnt"),
      col("sum_val"),
      last(col("sum_val"), ignoreNulls = true).over(wBack).as("sum_ffill")))
  }

  /** pandas resample(unit).agg(...) — the [[resampleCalendar]] gap-free
    * grid with CALLER-CHOSEN aggregates instead of the fixed
    * cnt/sum/ffill triple: each (name, aggExpr) lands per bucket, grid
    * holes carry nulls (pandas NaN on empty bins). Same unit grammar
    * (including the anchored offsets) and the same scale shape: one
    * partial+final aggregate + the per-key grid join. */
  def resampleAgg(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      unit: String,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "resampleAgg needs at least one aggregate")
    val (bucket, step, relabel) = calendarBucketSpec(unit, tsCol)
    val perBucket = events
      .groupBy(col(keyCol), bucket.as("day"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val grid = events
      .groupBy(col(keyCol))
      .agg(min(bucket).as("__d0"), max(bucket).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), step)).as("day"))
    relabel(grid.join(perBucket, Seq(keyCol, "day"), "left"))
  }

  /** The calendar-unit grammar shared by the resample family: bucket
    * expression, grid step, and the post-ffill label rewrite (end-labeled
    * units grid on period STARTS — ends don't step uniformly). */
  private def calendarBucketSpec(unit: String, tsCol: String)
      : (Column, Column, DataFrame => DataFrame) = {
    val weekAnchor = "(?i)^W-(MON|TUE|WED|THU|FRI|SAT|SUN)$".r
    val ysAnchor = "(?i)^YS-([A-Z]{3})$".r
    val qsAnchor = "(?i)^QS-([A-Z]{3})$".r
    require(
      Set("day", "week", "month", "month_end", "quarter", "quarter_end",
        "year", "year_end", "hour", "minute", "15min")(unit) ||
        weekAnchor.matches(unit) || ysAnchor.matches(unit) ||
        qsAnchor.matches(unit),
      "unit must be day|week|month|month_end|quarter|quarter_end|year|" +
        "year_end|hour|minute|15min or an anchored W-MON..W-SUN / " +
        s"YS-JAN..YS-DEC / QS-JAN..QS-DEC: $unit")
    val d = col(tsCol).cast("date")
    val bucket = unit match {
      case "hour" => date_trunc("hour", col(tsCol))
      case "minute" => date_trunc("minute", col(tsCol))
      case "15min" =>
        // epoch-aligned 900 s buckets via integer arithmetic (a double
        // floor(x/900) could misround at bucket boundaries)
        val secs = unix_timestamp(col(tsCol))
        timestamp_seconds(secs - pmod(secs, lit(900L)))
      case "month_end" => date_trunc("month", col(tsCol)).cast("date")
      case "year_end" => date_trunc("year", col(tsCol)).cast("date")
      case "quarter_end" => date_trunc("quarter", col(tsCol)).cast("date")
      // pandas 'W-XXX' (right-closed, right-labeled): the bin label is
      // the first anchor weekday >= the date — next_day is STRICTLY
      // after, so probe from the previous day
      case weekAnchor(a) => next_day(date_sub(d, 1), a.capitalize)
      // pandas 'AS-XXX' / 'YS-XXX': the most recent month-anchor 1st <= d
      case ysAnchor(mon) =>
        val m = Sessionize.monthNumber(mon)
        make_date(year(d) - when(month(d) < m, 1).otherwise(0), lit(m), lit(1))
      // pandas 'QS-XXX': quarter starts at months {m, m+3, m+6, m+9}
      // (mod 12) — step back (months-since-anchor mod 3) from the month
      case qsAnchor(mon) =>
        val m = Sessionize.monthNumber(mon)
        add_months(date_trunc("month", col(tsCol)).cast("date"),
          pmod(month(d) - lit(m), lit(12)) % lit(3) * lit(-1))
      case u => date_trunc(u, col(tsCol)).cast("date")
    }
    val step = unit match {
      case "15min" => expr("INTERVAL 15 MINUTE")
      case "month_end" => expr("INTERVAL 1 MONTH")
      // a quarter is exactly 3 calendar months; stepping months (not a
      // fixed duration) keeps quarter starts exact across month lengths
      case "quarter" => expr("INTERVAL 3 MONTH")
      case "year_end" => expr("INTERVAL 1 YEAR")
      case "quarter_end" => expr("INTERVAL 3 MONTH")
      case weekAnchor(_) => expr("INTERVAL 1 WEEK")
      case ysAnchor(_) => expr("INTERVAL 1 YEAR")
      case qsAnchor(_) => expr("INTERVAL 3 MONTH")
      case u => expr(s"INTERVAL 1 ${u.toUpperCase}")
    }
    // '1M' labels each month bucket with its LAST day (grid/ffill run on
    // month starts, which last_day maps monotonically); '1Y'/'1A'
    // likewise labels each year with its Dec 31; '1Q' with the quarter's
    // last day (Sep 30 + 3 months = Dec 30 — ends don't step uniformly)
    val relabel: DataFrame => DataFrame = unit match {
      case "month_end" => _.withColumn("day", last_day(col("day")))
      case "year_end" =>
        _.withColumn("day", make_date(year(col("day")), lit(12), lit(31)))
      case "quarter_end" =>
        _.withColumn("day", last_day(add_months(col("day"), 2)))
      case _ => identity
    }
    (bucket, step, relabel)
  }

  /** JAN..DEC → 1..12 (the YS- anchor grammar). */
  private[operators] def monthNumber(mon: String): Int = {
    val months = Vector("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
      "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
    val i = months.indexOf(mon.toUpperCase)
    require(i >= 0, s"unknown month anchor: $mon (use JAN..DEC)")
    i + 1
  }

  /** Markov transition counts over per-key event sequences: how often
    * `typeCol` value A is immediately followed by B within a key (the
    * product-analytics "user journey" matrix). One lead window over the
    * key partitioning, one partial+final count — no self-join. */
  def transitionCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Additive seasonal decomposition of the per-key daily count series
    * (statsmodels seasonal_decompose(model='additive') on the moving-
    * average method): trend = centered `period`-day moving average (null
    * until the window is full, as there), seasonal = the mean detrended
    * value per position-in-period (day of week for period=7), residual =
    * observed − trend − seasonal. Built entirely from the calendar-complete
    * [[resampleCalendar]] grid + window/group aggregates — one shuffle on
    * the key, one on (key, position). */
  def decomposeAdditive(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      period: Int = 7): DataFrame = {
    val daily = resampleCalendar(events, keyCol, tsCol, lit(1L), "day")
      .select(col(keyCol), col("day"), col("cnt"))
    val half = (period - 1) / 2
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(-half, period - 1 - half)
    // explicit sum/count division (not avg) so both engines divide the
    // same exact integers
    val trend = when(count(lit(1)).over(w) === period,
      sum(col("cnt")).over(w).cast("double") / lit(period.toDouble))
    val staged = daily
      .withColumn("trend", trend)
      // seasonal position = day index modulo the period (for period=7 the
      // classes coincide with weekdays; for other periods this keeps the
      // decomposition honest instead of silently grouping by weekday)
      .withColumn("__pos",
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(period)))
      .withColumn("__det", col("cnt").cast("double") - col("trend"))
    val wPos = Window.partitionBy(col(keyCol), col("__pos"))
    // seasonal means sum exact scaled integers (floor(det·1e6 + 0.5)
    // longs): a raw double sum over the position class depends on
    // summation order — run-to-run and engine-to-engine nondeterminism
    // for a decomposition that should be replayable
    staged
      .withColumn("seasonal",
        sum(floor(col("__det") * lit(1000000.0) + lit(0.5)).cast("long"))
          .over(wPos).cast("double") / lit(1000000.0) /
          count(col("__det")).over(wPos))
      .select(col(keyCol), col("day"), col("cnt"), col("trend"),
        col("seasonal"),
        (col("cnt").cast("double") - col("trend") - col("seasonal")).as("resid"))
  }

  /** Two-step funnel: per user, how many `fromType` events were followed
    * by at least one `toType` event within `windowSeconds` — the standard
    * product-analytics conversion query, built on [[intervalJoin]]'s
    * bucketed equi-join (no range cross-product; the window is the
    * interval, the `toType` events are the points).
    *
    * Returns (userCol, n_from, n_converted, conv_rate). */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      fromType: String,
      toType: String,
      windowSeconds: Long): DataFrame = {
    val intervals = events.filter(col(typeCol) === fromType)
      .select(col(userCol), col(idCol).as("__from_id"),
        col(tsCol).as("__f_start"),
        (col(tsCol) + expr(s"INTERVAL $windowSeconds SECONDS")).as("__f_end"))
    val points = events.filter(col(typeCol) === toType)
      .select(col(userCol), col(tsCol).as("__p_ts"))
    val converted = intervalJoin(points, intervals, userCol,
        "__p_ts", "__f_start", "__f_end", bucketMicros = windowSeconds * 1000000L)
      .groupBy(col(userCol))
      .agg(countDistinct(col("__from_id")).as("n_converted"))
    events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(count(lit(1)).as("n_from"))
      .join(converted, Seq(userCol), "left")
      .select(col(userCol),
        col("n_from"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"),
        (coalesce(col("n_converted"), lit(0L)).cast("double") /
          col("n_from").cast("double")).as("conv_rate"))
  }

  /** k-step funnel within a whole-funnel window (the multi-step
    * generalization of [[funnel]]): per user, t₁ is the FIRST step-1
    * event; step i is reached at the first step-i event STRICTLY after
    * t_{i−1} and within `windowSeconds` of t₁. Returns one row per step:
    * (step 1-based, step_name, users reached).
    *
    * Shape: k−1 chained (filter → user-keyed join → min aggregate)
    * rounds — every round shuffles only the users still alive and the
    * events of ONE step type, so the funnel narrows the data monotonely;
    * no windows, no per-user event collection. */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.size >= 2, "funnelSteps needs at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val byType = events.select(col(userCol), col(tsCol).as("__ts"), col(typeCol))
    var reached = byType.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col("__ts")).as("__t1"))
      .withColumn("__t_prev", col("__t1"))
    val perStep = scala.collection.mutable.ArrayBuffer(
      (1, steps.head, reached))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      reached = byType.filter(col(typeCol) === s)
        .join(reached.select(col(userCol), col("__t1"), col("__t_prev")),
          Seq(userCol))
        .filter(col("__ts") > col("__t_prev") &&
          col("__ts") <= col("__t1") + expr(s"INTERVAL $windowSeconds SECONDS"))
        .groupBy(col(userCol))
        .agg(min(col("__t1")).as("__t1"), min(col("__ts")).as("__t_prev"))
      perStep += ((i + 1, s, reached))
    }
    perStep.map { case (i, s, d) =>
      d.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("step"), lit(s).as("step_name"), col("users"))
    }.reduce(_.unionByName(_))
  }

  /** Per-key autocorrelation function at lags 1..maxLag (statsmodels
    * acf, pandas Series.autocorr generalized): with x̄ the full-series
    * mean per key,
    *   r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)².
    * Observations are ordered by `orderCol` within each key; spacing
    * regularity is the caller's contract (resample to a grid first for
    * calendar lags — see [[resampleCalendar]]).
    *
    * Shape: one per-key mean aggregate joined back (broadcast — one row
    * per key), ONE window producing all maxLag leads off a single sort,
    * one per-key aggregate folding every lag's numerator plus the shared
    * denominator, then an in-row explode to (key, lag, acf) — cost is
    * independent of maxLag in shuffles. Returns (keyCol, lag, acf). */
  def acf(df: DataFrame, keyCol: String, orderCol: String, xCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val x = col(xCol).cast("double")
    val stats = df.groupBy(col(keyCol)).agg(avg(x).as("__m"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val withLeads = (1 to maxLag).foldLeft(
      df.select(col(keyCol), col(orderCol), x.as("__x"))) { (d, k) =>
      d.withColumn(s"__lead_$k", lead(col("__x"), k).over(w))
    }
    val dev = col("__x") - col("__m")
    // numerators/denominator sum exact scaled integers (see
    // decomposeAdditive): the mean itself is exact (integer-valued sums),
    // per-row products are deterministic IEEE, only the cross-row Σ was
    // order-dependent
    def sInt(c: Column) =
      sum(floor(c * lit(1000000.0) + lit(0.5)).cast("long"))
    val aggs = (1 to maxLag).map { k =>
      sInt(dev * (col(s"__lead_$k") - col("__m"))).as(s"__num_$k")
    }
    val g = withLeads.join(broadcast(stats), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(sInt(dev * dev).as("__den"), aggs: _*)
    val pairs = (1 to maxLag).map(k => struct(
      lit(k).cast("long").as("lag"),
      (col(s"__num_$k").cast("double") / col("__den").cast("double")).as("acf")))
    g.select(col(keyCol), explode(array(pairs: _*)).as("__p"))
      .select(col(keyCol), col("__p.lag").as("lag"), col("__p.acf").as("acf"))
  }

  /** tsfresh-style per-key series features (reference
    * mars/learn/contrib/tsfresh/core.py — the contrib module fans
    * per-series tsfresh extraction out by key; this is the same shape
    * with the canonical exactly-computable features native). Input
    * `intCol` must be an exact INTEGER-valued column (e.g. cents via
    * the dec12 convention): every sum is then order-free BIGINT
    * arithmetic and the whole output gates UNROUNDED.
    *
    * Output per key: n, sum_c, abs_energy (Σc²), min_c, max_c, med2
    * (lo+hi middle order statistics — 2×median, kept integral),
    * sum_abs_change (Σ|Δc| in series order), count_above_mean,
    * longest_strike_above_mean, ac1 — the lag-1 autocorrelation from
    * n-scaled deviations: Σ(n·c_t−S)(n·c_{t+1}−S) / Σ(n·c_t−S)²,
    * var_num = n·Σc² − S² (the n²-scaled population variance, exact),
    * cid_ce = √Σ(Δc)² (tsfresh's complexity estimate — √ of an exact
    * integer, bit-identical on any IEEE engine), c3_sum =
    * Σ c_t·c_{t+1}·c_{t+2} (tsfresh c3 numerator at lag 1), and
    * n_crossings — flips of the boolean (c > mean) between consecutive
    * observations, exactly tsfresh number_crossing_m at m = mean
    * (np.diff(x > m) nonzero): a value landing ON the mean — reachable
    * with integer cents — counts as not-above, matching tsfresh, where
    * a strict sign-change rule would skip it. r13 additions (all exact
    * integers): count_below_mean / longest_strike_below_mean (the
    * below-mean mirrors; at-mean rows belong to NEITHER side),
    * first_loc_max / last_loc_min (1-based series positions of the
    * first maximum / last minimum: tsfresh normalizes 0-based argmin/
    * argmax positions, so first_loc_max = first_location_of_maximum·n + 1
    * and last_loc_min = last_location_of_minimum·n — both recovered as
    * exact integers; ADVICE r13 fixed this doc, code and gates were
    * already consistent), n_distinct
    * (ratio_value_number_to_time_series_length's numerator), n_peaks
    * (tsfresh number_peaks at support 1: strictly above both immediate
    * neighbors), sum_reoccurring_points / sum_reoccurring_values
    * (tsfresh sum_of_reoccurring_data_points / _values: Σ v·count and
    * Σ v over values appearing ≥ 2 times), and msd2_num =
    * Σ (c_t − 2c_{t−1} + c_{t−2}) — tsfresh
    * mean_second_derivative_central's numerator ×2 kept integral
    * (divide by 2(n−2) downstream; the sum telescopes to
    * (c_n−c_{n−1}) − (c_1−c_0), a cheap linearity signal).
    * Everything is exact BIGINT up to |c|·n ≲ 3e9 per key; the
    * quadratic deviation sums Σ(c·n−S)² bound tighter — n³·c² ≲ 9e18,
    * i.e. |c| ≈ 1000 caps a series at ~15k rows. Beyond that pass
    * `wide = true` (the r13 mega-series cell lesson: a 10× skew cell
    * overflowed LONG in ANSI mode): every product and cross-row sum
    * lifts to DECIMAL(38,0) — still exact integers, good to
    * n³·c² < 1e38 (mega-series of ~1e9 rows at cents magnitudes), the
    * integer feature columns come back as DECIMAL(38,0), and ac1/cid_ce
    * stay DOUBLE. ~2× cost on the lifted sums; the BIGINT default
    * remains the oracle path. Mean-relative tests multiply through by
    * n (c·n > S) so no rational ever materializes.
    *
    * Shape: one count/sum aggregate broadcast back (a row per key),
    * one series-order window (lag + strike islands), one value-order
    * window (the median ranks), one final aggregation — all
    * partitioned by the key, the connected scale shape. */
  def tsFeatures(df: DataFrame, keyCol: String, orderCols: Seq[String],
      intCol: String, wide: Boolean = false): DataFrame = {
    require(orderCols.nonEmpty, "tsFeatures needs a total series order")
    // wide mode: exact DECIMAL(38,0) arithmetic — ANSI decimal overflow
    // still fails LOUDLY past 1e38, it never wraps or nulls silently
    val c = col(intCol).cast(
      if (wide) org.apache.spark.sql.types.DecimalType(38, 0)
      else org.apache.spark.sql.types.LongType)
    val stats = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(c).as("__s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val wv = Window.partitionBy(col(keyCol))
      .orderBy((col("__c") +: orderCols.map(col)): _*)
    val base = df
      .select((col(keyCol) +: orderCols.map(col)) :+ c.as("__c"): _*)
      .join(broadcast(stats), Seq(keyCol))
    val above = col("__c") * col("__n") > col("__s")
    val below = col("__c") * col("__n") < col("__s")
    val ranked = base
      .withColumn("__prev", lag(col("__c"), 1).over(w))
      .withColumn("__prev2", lag(col("__c"), 2).over(w))
      .withColumn("__next", lead(col("__c"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cumAbove",
        sum(when(above, 1L).otherwise(0L)).over(w))
      .withColumn("__cumBelow",
        sum(when(below, 1L).otherwise(0L)).over(w))
      .withColumn("__rnv", row_number().over(wv))
      // per-value occurrence stats for the reoccurring-value features:
      // one extra keyed window over (key, value)
      .withColumn("__cntc", count(lit(1)).over(
        Window.partitionBy(col(keyCol), col("__c"))))
      .withColumn("__rnc", row_number().over(
        Window.partitionBy(col(keyCol), col("__c"))
          .orderBy(orderCols.map(col): _*)))
    // islands of consecutive above-mean rows share (__rn − __cumAbove);
    // the below-mean mirror shares (__rn − __cumBelow)
    def strikeAgg(cond: Column, cum: Column, out: String) =
      ranked.filter(cond)
        .groupBy(col(keyCol), (col("__rn") - cum).as("__isl"))
        .agg(count(lit(1)).as("__len"))
        .groupBy(col(keyCol))
        .agg(max(col("__len")).as(out))
    val strikes = strikeAgg(above, col("__cumAbove"), "longest_strike_above_mean")
    val strikesBelow = strikeAgg(below, col("__cumBelow"), "longest_strike_below_mean")
    val dev = col("__c") * col("__n") - col("__s")
    val devPrev = col("__prev") * col("__n") - col("__s")
    val agg = ranked.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__c")).as("sum_c"),
        sum(col("__c") * col("__c")).as("abs_energy"),
        min(col("__c")).as("min_c"),
        max(col("__c")).as("max_c"),
        // Spark `/` on longs is DOUBLE division — the middle ranks use
        // exact floor division (exact in double for any real n)
        (sum(when(col("__rnv") ===
            floor((col("__n") + 1L) / lit(2.0)).cast("long"), col("__c"))) +
          sum(when(col("__rnv") ===
            (floor(col("__n") / lit(2.0)).cast("long") + 1L), col("__c"))))
          .as("med2"),
        sum(abs(col("__c") - col("__prev"))).as("sum_abs_change"),
        sum(when(above, 1L).otherwise(0L)).as("count_above_mean"),
        sum(dev * devPrev).as("__ac_num"),
        sum(dev * dev).as("__ac_den"),
        sum((col("__c") - col("__prev")) * (col("__c") - col("__prev")))
          .as("__sq_change"),
        sum(col("__c") * col("__prev") * col("__prev2")).as("c3_sum"),
        sum(when(devPrev.isNull, lit(null).cast("long")).otherwise(
          when((dev > 0L) =!= (devPrev > 0L), 1L).otherwise(0L)))
          .as("n_crossings"),
        sum(when(below, 1L).otherwise(0L)).as("count_below_mean"),
        // first occurrence of the maximum / last occurrence of the
        // minimum, as 1-based SERIES positions (tsfresh reports them
        // normalized by n — divide by `n` downstream if the ratio is
        // wanted; the integer stays exact). Lexicographic struct
        // max/min: (max c, then smallest rn) / (min c, then largest rn).
        (-max(struct(col("__c").as("v"), (-col("__rn")).as("nr")))
          .getField("nr")).cast("long").as("first_loc_max"),
        (-min(struct(col("__c").as("v"), (-col("__rn")).as("nr")))
          .getField("nr")).cast("long").as("last_loc_min"),
        countDistinct(col("__c")).as("n_distinct"),
        // tsfresh number_peaks at support 1: strictly above both
        // immediate neighbors (series endpoints can't be peaks)
        sum(when(col("__prev").isNotNull && col("__next").isNotNull &&
            col("__c") > col("__prev") && col("__c") > col("__next"),
          1L).otherwise(0L)).as("n_peaks"),
        sum(when(col("__cntc") >= 2L, col("__c")))
          .as("sum_reoccurring_points"),
        sum(when(col("__cntc") >= 2L && col("__rnc") === 1, col("__c")))
          .as("sum_reoccurring_values"),
        sum(col("__c") - lit(2L) * col("__prev") + col("__prev2"))
          .as("msd2_num"))
    agg.join(strikes, Seq(keyCol), "left")
      .join(strikesBelow, Seq(keyCol), "left")
      .na.fill(0L, Seq("longest_strike_above_mean",
        "longest_strike_below_mean", "n_crossings"))
      .withColumn("ac1",
        when(col("__ac_den") === 0L, lit(null).cast("double"))
          .otherwise(col("__ac_num").cast("double") / col("__ac_den").cast("double")))
      .withColumn("var_num",
        col("n") * col("abs_energy") - col("sum_c") * col("sum_c"))
      .withColumn("cid_ce", sqrt(coalesce(col("__sq_change"), lit(0L))
        .cast("double")))
      .drop("__ac_num", "__ac_den", "__sq_change")
  }
}
