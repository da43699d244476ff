package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The pandas `Series.dt` accessor surface (reference base/datetimes.py:31,
  * auto-generated over every pandas dt property/method,
  * base/accessor.py:237-257), mapped onto Spark's datetime expressions.
  * All integer-valued properties are cast to long so cross-engine
  * comparisons see identical types.
  */
object DtAccessor {
  def year(c: Column): Column = org.apache.spark.sql.functions.year(c).cast("long")
  def month(c: Column): Column = org.apache.spark.sql.functions.month(c).cast("long")
  def day(c: Column): Column = dayofmonth(c).cast("long")
  def hour(c: Column): Column = org.apache.spark.sql.functions.hour(c).cast("long")
  def minute(c: Column): Column = org.apache.spark.sql.functions.minute(c).cast("long")
  def second(c: Column): Column = org.apache.spark.sql.functions.second(c).cast("long")
  def microsecond(c: Column): Column = pmod(unix_micros(c), lit(1000000L))

  /** pandas dayofweek: Monday=0. Spark dayofweek: Sunday=1. */
  def dayofweek(c: Column): Column = pmod(org.apache.spark.sql.functions.dayofweek(c) + 5, lit(7)).cast("long")
  def dayofyear(c: Column): Column = org.apache.spark.sql.functions.dayofyear(c).cast("long")
  def isocalendarWeek(c: Column): Column = weekofyear(c).cast("long")
  def quarter(c: Column): Column = org.apache.spark.sql.functions.quarter(c).cast("long")
  def daysInMonth(c: Column): Column = dayofmonth(last_day(c)).cast("long")

  def isMonthStart(c: Column): Column = dayofmonth(c) === 1
  def isMonthEnd(c: Column): Column = to_date(c) === last_day(c)
  def isQuarterStart(c: Column): Column =
    dayofmonth(c) === 1 && pmod(org.apache.spark.sql.functions.month(c) - 1, lit(3)) === 0
  def isYearStart(c: Column): Column = org.apache.spark.sql.functions.dayofyear(c) === 1
  def isLeapYear(c: Column): Column = {
    val y = org.apache.spark.sql.functions.year(c)
    (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)
  }

  /** dt.date / dt.normalize. */
  def date(c: Column): Column = to_date(c)
  def normalize(c: Column): Column = date_trunc("day", c)

  /** dt.floor to a unit: 'day' | 'hour' | 'minute' | 'month' | ... */
  def floorTo(c: Column, unit: String): Column = date_trunc(unit, c)

  /** dt.strftime — Spark pattern syntax (the reference passes through to
    * the underlying engine's format strings the same way). */
  def strftime(c: Column, fmt: String): Column = date_format(c, fmt)

  /** dt.to_period('M') as the first day of the period. */
  def toPeriodMonth(c: Column): Column = trunc(c, "month")

  /** Offsets (pandas Timedelta arithmetic / tshift). */
  def addDays(c: Column, n: Int): Column = date_add(c, n)
  def addMonths(c: Column, n: Int): Column = org.apache.spark.sql.functions.add_months(c, n)

  /** Difference in whole days (pandas (a - b).dt.days). */
  def daysBetween(a: Column, b: Column): Column = datediff(a, b).cast("long")

  // ---- tail of the pandas surface (r3): period/boundary/naming/rounding

  def weekday(c: Column): Column = dayofweek(c) // pandas alias

  def isQuarterEnd(c: Column): Column =
    to_date(c) === last_day(c) &&
      pmod(org.apache.spark.sql.functions.month(c), lit(3)) === 0

  def isYearEnd(c: Column): Column =
    org.apache.spark.sql.functions.month(c) === 12 && dayofmonth(c) === 31

  /** dt.month_name() / day_name() (en locale, like the reference default). */
  def monthName(c: Column): Column = date_format(c, "MMMM")
  def dayName(c: Column): Column = date_format(c, "EEEE")

  def toPeriodQuarter(c: Column): Column = trunc(c, "quarter")
  def toPeriodYear(c: Column): Column = trunc(c, "year")

  private def unitMicros(unit: String): Long = unit match {
    case "second" => 1000000L
    case "minute" => 60000000L
    case "hour" => 3600000000L
    case "day" => 86400000000L
    case u => throw new IllegalArgumentException(s"unsupported round unit: $u")
  }

  /** dt.ceil to a fixed-width unit (second/minute/hour/day): next boundary
    * unless already on one. Pure integer epoch-µs arithmetic (pmod) — no
    * double division, so boundaries are exact and engine-portable. */
  def ceilTo(c: Column, unit: String): Column = {
    val u = unitMicros(unit)
    val us = unix_micros(c)
    val rem = pmod(us, lit(u))
    timestamp_micros(us - rem + when(rem > 0L, lit(u)).otherwise(lit(0L)))
  }

  /** dt.round to a fixed-width unit, half-up at the midpoint — integer
    * epoch-µs arithmetic like [[ceilTo]]. */
  def roundTo(c: Column, unit: String): Column = {
    val u = unitMicros(unit)
    val us = unix_micros(c)
    val rem = pmod(us, lit(u))
    timestamp_micros(us - rem + when(rem >= u / 2, lit(u)).otherwise(lit(0L)))
  }

  /** Timedelta total_seconds from a microsecond-long delta (SURVEY §1.4:
    * timedeltas are µs longs). */
  def totalSeconds(microsDelta: Column): Column =
    microsDelta.cast("double") / 1000000.0
}
