package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One registered query: the Spark implementation plus (optionally) the
  * equivalent DuckDB SQL for the driver's differential oracle.
  *
  * Oracle-compare conventions (see FIXTURES.md):
  *  - every query ends in a deterministic total-order `ORDER BY`, identical
  *    on both sides;
  *  - money aggregates go through exact decimal arithmetic
  *    (`CAST(x AS DECIMAL(p,s))`) and are cast back to DOUBLE at the end, so
  *    Spark and DuckDB produce bit-identical doubles regardless of the
  *    floating-point summation order;
  *  - derived integer columns are BIGINT on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Shared column helpers enforcing the exact-decimal convention. */
object QHelpers {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name)

  /** Table as a [[graft.api.GraftFrame]] — queries routed through the
    * user-facing fluent API (proving it emits the same Catalyst plans). */
  def gt(spark: SparkSession, dir: String, name: String): graft.api.GraftFrame =
    graft.api.GraftFrame(graft.Tables.load(spark, dir, name))

  /** Money column as exact decimal — prices are 2-decimal values stored as
    * double; the nearest DECIMAL(12,2) is unambiguous and engine-independent. */
  def dec12(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small ratio column (discount/tax in [0,1.1]) as exact decimal. */
  def dec3(c: Column): Column = c.cast(DecimalType(3, 2))

  val oneDec: Column = lit(1).cast(DecimalType(3, 2))

  /** l_extendedprice * (1 - l_discount), exact. */
  def discPrice(price: Column, discount: Column): Column =
    dec12(price) * (oneDec - dec3(discount))

  /** Exact decimal sum surfaced as double (bit-identical across engines). */
  def sumD(c: Column): Column = sum(c).cast("double")

  /** SQL fragment mirroring [[discPrice]]. */
  def sqlDiscPrice(price: String = "l_extendedprice", discount: String = "l_discount"): String =
    s"CAST($price AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($discount AS DECIMAL(3,2)))"
}
