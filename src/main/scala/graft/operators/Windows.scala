package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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

  /** Time-offset rolling window: `rangeBetween` over epoch seconds of
    * `tsCol` — pandas rolling('3d') equivalent. */
  def rollingTime(partitionBy: Seq[String], tsCol: String, seconds: Long): WindowSpec = {
    val base = if (partitionBy.isEmpty) Window.partitionBy() else
      Window.partitionBy(partitionBy.map(col): _*)
    base.orderBy(unix_timestamp(col(tsCol))).rangeBetween(-seconds, 0)
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
    * Computed as a streaming recurrence over each key's rows in ascending
    * `orderCol` order inside flatMapGroups — numerically stable (no
    * (1-a)^(-i) blowup), one shuffle on the key, linear per key.
    *
    * Input is projected to (key, ord, value); output schema:
    * (key string, ord double, value double, ewm double).
    */
  def ewmMean(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double): DataFrame = {
    val spark = df.sparkSession
    val proj = df.select(
      col(keyCol).cast("string").as("key"),
      col(orderCol).cast("double").as("ord"),
      col(valueCol).cast("double").as("value"))
    val outSchema = StructType(proj.schema.fields :+ StructField("ewm", DoubleType))
    implicit val rowEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    proj
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroups { (_: String, rows: Iterator[Row]) =>
        val sorted = rows.toArray.sortBy(_.getDouble(1))
        var num = 0.0
        var den = 0.0
        val oneMinus = 1.0 - alpha
        sorted.iterator.map { r =>
          num = num * oneMinus + r.getDouble(2)
          den = den * oneMinus + 1.0
          Row(r.getString(0), r.getDouble(1), r.getDouble(2), num / den)
        }
      }
  }
}
