package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named, oracle-checkable query: a Spark plan plus (optionally) the
  * equivalent DuckDB SQL the driver replays on the same parquet tables.
  */
case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers for cross-engine determinism.
  *
  * Floating-point aggregation order differs between engines/partitions, so
  * every SUM/AVG over a double column is computed over DECIMAL(25,4)-cast
  * inputs in BOTH engines (exact, order-independent) and cast back to
  * DOUBLE — bit-identical results regardless of partitioning.
  */
object Dsl {
  def dec(c: Column): Column = c.cast(DecimalType(25, 4))
  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Exact average: decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** DuckDB twin of [[dsum]]. */
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(25,4))) AS DOUBLE)"
  /** DuckDB twin of [[davg]]. */
  def davgSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(25,4))) AS DOUBLE)/COUNT(*)"

  // Products of doubles (price * (1-disc) * ...) can land near a decimal
  // rounding tie, where the two engines' double->decimal casts disagree.
  // Instead each FACTOR is cast to decimal — safe, because the source data
  // is exactly 2-decimal — and the multiplication happens in exact decimal
  // arithmetic in both engines.
  /** Money column (2 decimals in the data) as exact decimal. */
  def dmoney(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Small fraction expression (discount/tax adjustments) as exact decimal. */
  def dfrac(c: Column): Column = c.cast(DecimalType(8, 6))
  /** lineitem revenue term: extendedprice * (1 - discount), exact. */
  def revenue(price: Column, discount: Column): Column =
    dmoney(price) * dfrac(lit(1.0) - discount)
  /** Exact decimal product sum, as double.
    *
    * The sum's true value has at most 6 decimals (2-decimal money times a
    * ≤4-decimal fraction), so the intermediate cast to scale 6 is exact;
    * from there the decimal→double conversion is a correctly-rounded
    * division of an integer < 2^53 in both engines (at the larger scale 10
    * the two engines' conversions can differ by 1 ulp).
    */
  def psum(product: Column): Column =
    sum(product).cast(DecimalType(38, 6)).cast(DoubleType)

  // DuckDB-side decimals built from INTEGER UNITS (r16, verdict ask
  // #6): a double→decimal cast whose decimal SURFACES in the result (or
  // feeds a decimal-domain comparison) inherits the cast's
  // version-dependent rounding — DuckDB has drifted on half-ulp ties
  // across releases. The source data is exactly k-decimal, so
  // ROUND(x·10^k) is an exact BIGINT and the scale shift multiplies by
  // an exact decimal LITERAL: the same value, built drift-free.
  def dmoneySql(x: String): String =
    s"CAST(CAST(ROUND(($x) * 100) AS BIGINT) * 0.0100 AS DECIMAL(18,4))"
  def dfracSql(x: String): String =
    s"CAST(CAST(ROUND(($x) * 1000000) AS BIGINT) * 0.000001 AS DECIMAL(8,6))"
  def revenueSql: String = s"${dmoneySql("l_extendedprice")} * ${dfracSql("1 - l_discount")}"
  def psumSql(x: String): String = s"CAST(CAST(SUM($x) AS DECIMAL(38,6)) AS DOUBLE)"
}
