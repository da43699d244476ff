package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Moving-window operators in the pandas style of the reference:
  * rolling/expanding/ewm aggregation, shift/diff, cumulative ops.
  *
  * Reference surface: rolling (mars/dataframe/window/rolling/core.py:32),
  * expanding (window/expanding/aggregation.py:119), ewm
  * (window/ewm/aggregation.py:207), shift (base/shift.py:31), diff
  * (base/diff.py:29), cumulative reductions (reduction/cum*.py:21).
  *
  * Ordering convention (SURVEY §7.1): the reference's implicit pandas row
  * index does not exist in Spark — every order-sensitive op takes explicit
  * partition + order columns. The reference itself relaxes index guarantees
  * under parallelism (Note [Index of Merge],
  * mars/dataframe/merge/tests/test_merge_execution.py:44-50).
  *
  * Scale: all but ewm are native window frames — Spark shuffles once on the
  * partition key and sorts within partitions; with thousands of keys this
  * parallelizes across the cluster. ewm is a per-key sequential recurrence
  * computed by a sorted group iterator (flatMapGroups) — linear work per
  * key, distributed across keys.
  */
object Windows {

  def spec(partitionBy: Seq[String], orderBy: Seq[String]): WindowSpec = {
    val base = if (partitionBy.isEmpty) Window.partitionBy() else
      Window.partitionBy(partitionBy.map(col): _*)
    base.orderBy(orderBy.map(col): _*)
  }

  /** Fixed row-count rolling window [current-(n-1), current]. */
  def rolling(w: WindowSpec, n: Int): WindowSpec =
    w.rowsBetween(-(n - 1), Window.currentRow)

  /** Centered rolling window (pandas rolling(center=True)): the frame
    * spans ⌊(n−1)/2⌋ preceding to ⌈(n−1)/2⌉ following rows. */
  def rollingCentered(w: WindowSpec, n: Int): WindowSpec =
    w.rowsBetween(-((n - 1) / 2), n - 1 - (n - 1) / 2)

  /** pandas min_periods: null the aggregate until the frame holds at
    * least `k` rows (pandas rolling(n) defaults to min_periods=n). */
  def minPeriods(agg: Column, w: WindowSpec, k: Int): Column =
    if (k <= 1) agg else when(count(lit(1)).over(w) >= k, agg)

  /** Expanding window [start, current]. */
  def expanding(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Windowed Pearson correlation + sample covariance from EXACT integer
    * window sums (pandas expanding()/rolling().corr()/cov(); reference
    * window/expanding, window/rolling): native streamed-moment
    * corr/var_samp windows drift ~1e-4 across engines at money
    * magnitudes, so both statistics derive from (n, Σx, Σy, Σx², Σy²,
    * Σxy) accumulated in DECIMAL(38) — order-free and exact — with ONE
    * cast to double per factor at the end:
    *   cov = (nΣxy − ΣxΣy) / (n(n−1)),
    *   corr = (nΣxy − ΣxΣy) / √((nΣx²−Σx²ᵗᵒᵗ)(nΣy²−Σy²ᵗᵒᵗ)).
    * `x`/`y` must be integral (quantize money to cents first); null
    * where the frame has n ≤ 1 (cov) or a zero-variance side (corr) —
    * pandas semantics. */
  def corrCovExact(x: Column, y: Column, w: WindowSpec): (Column, Column) = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val xd = x.cast(d38)
    val yd = y.cast(d38)
    val n = count(lit(1)).over(w)
    val nd = n.cast(d38)
    val sx = sum(xd).over(w)
    val sy = sum(yd).over(w)
    val sxx = sum((xd * xd).cast(d38)).over(w)
    val syy = sum((yd * yd).cast(d38)).over(w)
    val sxy = sum((xd * yd).cast(d38)).over(w)
    val num = (nd * sxy - sx * sy).cast(DoubleType)
    val f1 = (nd * sxx - sx * sx).cast(DoubleType)
    val f2 = (nd * syy - sy * sy).cast(DoubleType)
    val corrC = when(f1 > 0.0 && f2 > 0.0, num / sqrt(f1 * f2))
    val covC = when(n > 1,
      num / (n.cast(DoubleType) * (n.cast(DoubleType) - lit(1.0))))
    (corrC, covC)
  }

  /** Time-offset rolling window: `rangeBetween` over epoch MICROseconds of
    * `tsCol` — pandas rolling('3d') equivalent. Microsecond resolution
    * matters: ranging over whole seconds (the r2 form) silently
    * included/excluded rows when a window boundary fell inside a second of
    * sub-second data — the same truncation bug class Sessionize fixed in r1. */
  def rollingTime(partitionBy: Seq[String], tsCol: String, seconds: Long): WindowSpec = {
    val base = if (partitionBy.isEmpty) Window.partitionBy() else
      Window.partitionBy(partitionBy.map(col): _*)
    base.orderBy(unix_micros(col(tsCol).cast("timestamp")))
      .rangeBetween(-seconds * 1000000L, 0)
  }

  def shift(c: Column, periods: Int, w: WindowSpec): Column =
    if (periods >= 0) lag(c, periods).over(w) else lead(c, -periods).over(w)

  def diff(c: Column, periods: Int, w: WindowSpec): Column =
    c - shift(c, periods, w)

  /** Weighted rolling mean over the trailing `weights.size` rows — pandas
    * rolling(win_type=...).mean(): Σ w_j·x_{t-j} / Σw, null until the
    * window is full (lag null propagation = pandas min_periods=window).
    * Weights are given oldest→newest; a sum of lags, fully codegen'd. */
  def weightedRollingMean(c: Column, weights: Seq[Double], w: WindowSpec): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val n = weights.size
    val terms = weights.zipWithIndex.map { case (wt, j) =>
      lag(c, n - 1 - j).over(w) * lit(wt)
    }
    terms.reduce(_ + _) / lit(weights.sum)
  }

  /** Triangular win_type weights of width n: 1,2,…,⌈n/2⌉,…,2,1. */
  def triangWeights(n: Int): Seq[Double] =
    (1 to n).map(i => math.min(i, n + 1 - i).toDouble)

  /** Gaussian win_type weights of width n with the given std. */
  def gaussianWeights(n: Int, std: Double): Seq[Double] = {
    val mid = (n - 1) / 2.0
    (0 until n).map(i => math.exp(-0.5 * math.pow((i - mid) / std, 2)))
  }

  /** Rolling exact interpolated median over a window frame. */
  def rollingMedian(c: Column, w: WindowSpec): Column =
    percentile(c, lit(0.5)).over(w)

  /** Rolling SAMPLE skew (pandas rolling.skew, adjusted Fisher–Pearson G1)
    * from raw moment sums over the frame — engine builtins disagree on the
    * adjustment (Spark skewness is population g1), so the moments are
    * derived explicitly like op_agg_stats; null for n < 3 or zero spread. */
  def rollingSkew(c: Column, w: WindowSpec): Column = {
    val x = c.cast("double")
    val n = count(x).over(w).cast("double")
    val m = sum(x).over(w) / n
    val s2 = sum(x * x).over(w)
    val s3 = sum(x * x * x).over(w)
    val m2c = s2 / n - m * m
    val m3c = s3 / n - lit(3.0) * m * (s2 / n) + lit(2.0) * m * m * m
    val g1 = m3c / (m2c * sqrt(m2c))
    when(n >= 3.0 && m2c > 0.0,
      g1 * sqrt(n * (n - lit(1.0))) / (n - lit(2.0)))
  }

  /** Rolling SAMPLE excess kurtosis (pandas rolling.kurt, adjusted G2) from
    * raw moment sums; null for n < 4 or zero spread. */
  def rollingKurt(c: Column, w: WindowSpec): Column = {
    val x = c.cast("double")
    val n = count(x).over(w).cast("double")
    val m = sum(x).over(w) / n
    val s2 = sum(x * x).over(w)
    val s3 = sum(x * x * x).over(w)
    val s4 = sum(x * x * x * x).over(w)
    val m2c = s2 / n - m * m
    val m4c = s4 / n - lit(4.0) * m * (s3 / n) +
      lit(6.0) * m * m * (s2 / n) - lit(3.0) * m * m * m * m
    val g2 = m4c / (m2c * m2c) - lit(3.0)
    when(n >= 4.0 && m2c > 0.0,
      ((n + lit(1.0)) * g2 + lit(6.0)) * (n - lit(1.0)) /
        ((n - lit(2.0)) * (n - lit(3.0))))
  }

  /** pandas DataFrame.interpolate(method='linear') over an explicit
    * partition+order (reference base/fillna neighborhood — mars wraps the
    * pandas interpolate surface): interior null runs are filled by linear
    * interpolation between the surrounding non-null values at their ROW
    * positions, leading nulls stay null, trailing nulls carry the last
    * valid value forward — pandas' default limit_direction='forward'
    * semantics. Four ignore-null window lookups over ONE sort (two frame
    * directions of the same partitioning); no per-group materialization. */
  def interpolateLinear(df: DataFrame, partitionBy: Seq[String],
      orderBy: Seq[String], valueCol: String, out: String): DataFrame = {
    val base = spec(partitionBy, orderBy)
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // phase 1: materialize the row position (window functions cannot nest
    // inside another window's argument); phase 2 shares phase 1's sort —
    // one shuffle, one WindowExec group
    val staged = df
      .withColumn("__rn", row_number().over(base).cast("double"))
      .withColumn("__v", col(valueCol).cast("double"))
    val marked = when(col("__v").isNotNull, col("__rn"))
    val prevV = last(col("__v"), ignoreNulls = true).over(back)
    val prevRn = last(marked, ignoreNulls = true).over(back)
    val nextV = first(col("__v"), ignoreNulls = true).over(fwd)
    val nextRn = first(marked, ignoreNulls = true).over(fwd)
    staged
      .withColumn(out,
        when(col("__v").isNotNull, col("__v"))
          .when(prevV.isNull, lit(null).cast("double"))
          .when(nextV.isNull, prevV)
          .otherwise(prevV + (nextV - prevV) * (col("__rn") - prevRn) /
            (nextRn - prevRn)))
      .drop("__rn", "__v")
  }

  def cumsum(c: Column, w: WindowSpec): Column = sum(c).over(expanding(w))
  /** numpy nancumsum / nancumprod (reference
    * tensor/reduction/nancumsum.py, nancumprod.py): NaN contributes the
    * identity (0 / 1), and the output at a NaN position is the running
    * total — numpy semantics, unlike SQL SUM which skips NULLs but
    * poisons on NaN. */
  def nancumsum(c: Column, w: WindowSpec): Column =
    sum(when(isnan(c), lit(0.0)).otherwise(c)).over(expanding(w))
  def nancumprod(c: Column, w: WindowSpec): Column =
    graft.functions.aggregates.product(
      when(isnan(c), lit(1.0)).otherwise(c)).over(expanding(w))
  def cummax(c: Column, w: WindowSpec): Column = max(c).over(expanding(w))
  def cummin(c: Column, w: WindowSpec): Column = min(c).over(expanding(w))
  def cumcount(w: WindowSpec): Column = row_number().over(w)

  /** Exponentially-weighted moving mean per key (pandas
    * `ewm(alpha).mean()` with adjust=true, the default):
    *   y_t = sum_{i<=t} (1-a)^(t-i) x_i / sum_{i<=t} (1-a)^(t-i).
    *
    * Scale design: one hash shuffle on the key, an external (spillable)
    * sort within partitions on (key, order), then a streaming recurrence
    * carried across group boundaries inside `mapPartitions` — no per-group
    * materialization, so a hot key streams through constant memory instead
    * of building an in-heap array. Numerically stable (no (1-a)^(-i)
    * blowup); key and order keep their native types.
    *
    * Output: (key, ord, value double, ewm double).
    */
  def ewmMean(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double): DataFrame =
    ewmStats(df, keyCol, orderCol, valueCol, alpha)
      .drop("ewm_var", "ewm_std")

  /** Exponentially-weighted mean, variance and std per key (pandas
    * `ewm(alpha).mean()/.var()/.std()` with adjust=true, bias=false — the
    * reference aggregates all three from one pass,
    * mars/dataframe/window/ewm/aggregation.py:207). The streamed recurrence
    * carries four accumulators:
    *   num   = Σ (1-a)^(t-i) x_i        den  = Σ (1-a)^(t-i)
    *   sumsq = Σ (1-a)^(t-i) x_i²       den2 = Σ (1-a)^(2(t-i))
    * mean = num/den; unbiased var = (sumsq - num²/den) / (den - den2/den)
    * (null for the first row of a key, where the correction denominator is
    * 0 — pandas emits NaN there); std = sqrt(var).
    *
    * Same scale shape as the r2 ewmMean: one hash shuffle on the key, a
    * spillable sort, constant-memory streaming across group boundaries.
    * Output: (key, ord, value double, ewm, ewm_var, ewm_std).
    */
  def ewmStats(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double): DataFrame = {
    val proj = df.select(
      col(keyCol).as("key"),
      col(orderCol).as("ord"),
      col(valueCol).cast("double").as("value"))
    val outSchema = StructType(proj.schema.fields ++ Seq(
      StructField("ewm", DoubleType),
      StructField("ewm_var", DoubleType),
      StructField("ewm_std", DoubleType)))
    implicit val rowEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val oneMinus = 1.0 - alpha
    val oneMinusSq = oneMinus * oneMinus
    proj
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var first = true
        var num = 0.0
        var den = 0.0
        var sumsq = 0.0
        var den2 = 0.0
        rows.map { r =>
          val k = r.get(0)
          if (!started || k != curKey) {
            started = true; curKey = k
            num = 0.0; den = 0.0; sumsq = 0.0; den2 = 0.0; first = true
          } else first = false
          if (r.isNullAt(2)) {
            // pandas ewm ignore_na: a null contributes nothing and the
            // accumulators carry across it unchanged; the row itself gets
            // null stats (mean too, before any observation arrives).
            val mean: Any = if (den == 0.0) null else num / den
            val v: Any =
              if (first || den == 0.0 || den - den2 / den == 0.0) null
              else (sumsq - num * num / den) / (den - den2 / den)
            val s: Any =
              if (v == null) null else math.sqrt(v.asInstanceOf[Double])
            Row(r.get(0), r.get(1), null, mean, v, s)
          } else {
            val wasEmpty = den == 0.0
            val x = r.getDouble(2)
            num = num * oneMinus + x
            den = den * oneMinus + 1.0
            sumsq = sumsq * oneMinus + x * x
            den2 = den2 * oneMinusSq + 1.0
            val v: Any =
              if (first || wasEmpty) null
              else (sumsq - num * num / den) / (den - den2 / den)
            val s: Any = if (v == null) null else math.sqrt(v.asInstanceOf[Double])
            Row(r.get(0), r.get(1), x, num / den, v, s)
          }
        }
      }
  }
}
