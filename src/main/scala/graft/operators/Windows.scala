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

  /** Expanding window [start, current]. */
  def expanding(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

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

  def cumsum(c: Column, w: WindowSpec): Column = sum(c).over(expanding(w))
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
          val x = r.getDouble(2)
          num = num * oneMinus + x
          den = den * oneMinus + 1.0
          sumsq = sumsq * oneMinus + x * x
          den2 = den2 * oneMinusSq + 1.0
          val v: Any =
            if (first) null
            else (sumsq - num * num / den) / (den - den2 / den)
          val s: Any = if (first) null else math.sqrt(v.asInstanceOf[Double])
          Row(r.get(0), r.get(1), x, num / den, v, s)
        }
      }
  }
}
