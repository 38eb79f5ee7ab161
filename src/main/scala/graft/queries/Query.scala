package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One engine query: a Spark implementation plus (where SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables. Queries without an
  * oracle get the driver's weaker rows-only check.
  *
  * Note on trailing `orderBy`: queries whose output is one row per input
  * row end in a global sort SOLELY so the cross-engine hash compare is
  * deterministic. It is verification plumbing, not part of the operator's
  * semantics — a production consumer of the same plan drops the final sort
  * (and Catalyst with it, the range-partition exchange). Aggregate queries'
  * small-result sorts are post-shuffle and cost nothing at scale.
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
  * column is routed through an exact DECIMAL cast and only the final exact
  * value is cast back to double. Both engines then produce bit-identical
  * results regardless of summation order or parallelism.
  *
  * PRECONDITION for [[Num.dsum]]/[[Num.revenue]]/[[Num.charge]]: the input
  * double column must carry at most 2 (money) / 4 (rate) decimal digits —
  * true for every money/rate column in the fixtures (FIXTURES.md §3). A
  * double with more precision would be silently HALF_UP-rounded by the cast;
  * mirror the same CAST in the DuckDB oracle so both engines round alike.
  * Per-row double arithmetic (no aggregation) needs none of this: identical
  * IEEE-754 inputs and one expression tree give bit-identical results.
  */
object Num {
  // Widths are kept tight so chained decimal multiplies stay under both
  // engines' 38-digit cap (DuckDB widens multiply by w1+w2).
  val Money: DecimalType = DecimalType(12, 2) // prices, balances, quantities
  val Rate: DecimalType  = DecimalType(6, 4)  // discount, tax

  /** Exact sum of a money-scale double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact sum of an arbitrary decimal-typed expression, as double. The sum
    * is first rounded to scale 2: a high-scale decimal's unscaled value can
    * exceed 2^53, where DuckDB's (unscaled→double)/10^scale conversion
    * double-rounds while Spark's BigDecimal path rounds once — a 1-ulp
    * hash mismatch. At scale 2 both paths are exact-then-one-division.
    * Mirror `CAST(round(SUM(..), 2) AS DOUBLE)` in oracles — NOT a decimal
    * downcast: DuckDB's decimal→decimal cast truncates toward zero while
    * Spark's rounds HALF_UP; DuckDB's `round()` is half-away-from-zero,
    * which matches Spark.
    */
  def dsumExpr(e: Column): Column = sum(e).cast(DecimalType(38, 2)).cast(DoubleType)

  /** Exact mean of a money-scale double column: exact decimal sum, one
    * double division by the exact count — deterministic in both engines.
    */
  def davg(c: Column): Column =
    sum(c.cast(Money)).cast(DoubleType) / count(lit(1))

  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  def revenue(price: Column, discount: Column): Column =
    price.cast(Money) * (lit(1).cast(Rate) - discount.cast(Rate))

  /** charge term: extendedprice * (1 - discount) * (1 + tax), exact decimal. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    revenue(price, discount) * (lit(1).cast(Rate) + tax.cast(Rate))

  /** Scale-2 exact second-order moment sum, as double. Scale 2, NOT 4: at
    * scale 4 a large corpus's Σx² crosses 2^53 unscaled, where DuckDB's
    * (unscaled→double)/10^scale conversion double-rounds while Spark
    * rounds once (the dsumExpr hazard, observed live on q_corr). Mirror
    * `CAST(round(SUM(x*x), 2) AS DOUBLE)` in oracles.
    */
  def m2(e: Column): Column =
    sum(e).cast(org.apache.spark.sql.types.DecimalType(38, 2)).cast(DoubleType)

  /** Pearson correlation from aggregated moment columns (n, Σx, Σy, Σx²,
    * Σy², Σxy as produced by [[m2]]) — ONE definition shared by q_corr and
    * q_autocorr so the expression tree (and this guard) can't drift.
    * Degenerate groups are pinned to NULL: after scale-2 rounding,
    * n·Σx² − (Σx)² can go NEGATIVE on tiny/constant groups (e.g. a single
    * pair with x=1.15: round(1.3225,2) − 1.3225 < 0), where Spark's
    * sqrt(neg) is NaN but DuckDB ERRORS — mirror
    * `CASE WHEN vx <= 0 OR vy <= 0 THEN NULL ELSE ... END` in oracles.
    */
  def pearson(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column, sxy: Column): Column = {
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    when(vx <= 0 || vy <= 0, lit(null).cast(DoubleType))
      .otherwise((n * sxy - sx * sy) / (sqrt(vx) * sqrt(vy)))
  }

  /** The [[pearson]] guard+formula as oracle SQL over moment column names. */
  def pearsonSql(n: String, sx: String, sy: String, sxx: String, syy: String, sxy: String): String =
    s"CASE WHEN $n * $sxx - $sx * $sx <= 0 OR $n * $syy - $sy * $sy <= 0 THEN NULL " +
      s"ELSE ($n * $sxy - $sx * $sy) / (sqrt($n * $sxx - $sx * $sx) * sqrt($n * $syy - $sy * $sy)) END"
}

/** The ONE exact-dedup key, shared by q_fingerprint and q_dedup_exact so
  * they can never diverge. The whitespace class is explicit because Java's
  * `\s` includes vertical tab (\x0B) while DuckDB's RE2 `\s` does not —
  * the literal class is identical in both engines.
  */
object Fingerprint {
  private val Ws = """[ \t\n\x0B\f\r]+"""

  /** md5 over whitespace-normalized lowercase text. */
  def of(text: Column): Column =
    md5(regexp_replace(lower(text), Ws, " ").cast("binary"))

  /** The same expression for the DuckDB oracle. */
  val sql: String = """md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"""
}
