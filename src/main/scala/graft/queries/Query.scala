package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One engine query: a Spark implementation plus (where SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables. Queries without an
  * oracle get the driver's weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

/** Cross-engine-deterministic numeric helpers.
  *
  * Double sums are order-dependent, and Spark's partial/final aggregation
  * order differs from DuckDB's — so any hash-compared aggregate of a double
  * column is routed through an exact DECIMAL cast (the test data carries
  * 2-decimal money and 4-decimal rates; see FIXTURES.md) and only the final
  * exact value is cast back to double. Both engines then produce bit-identical
  * results regardless of summation order or parallelism.
  */
object Num {
  // Widths are kept tight so chained decimal multiplies stay under both
  // engines' 38-digit cap (DuckDB widens multiply by w1+w2).
  val Money: DecimalType = DecimalType(12, 2) // prices, balances, quantities
  val Rate: DecimalType  = DecimalType(6, 4)  // discount, tax

  /** Exact sum of a money-scale double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact sum of an arbitrary decimal-typed expression, as double. */
  def dsumExpr(e: Column): Column = sum(e).cast(DoubleType)

  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  def revenue(price: Column, discount: Column): Column =
    price.cast(Money) * (lit(1).cast(Rate) - discount.cast(Rate))

  /** charge term: extendedprice * (1 - discount) * (1 + tax), exact decimal. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    revenue(price, discount) * (lit(1).cast(Rate) + tax.cast(Rate))
}
