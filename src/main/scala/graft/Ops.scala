package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the query registry.
  *
  * The central trick: every "money-style" SUM that an oracle checks goes
  * through a DECIMAL cast *before* aggregation, in both Spark and the DuckDB
  * oracle SQL. Decimal addition is exact and associative, so the result is
  * independent of partitioning / summation order — a plain double SUM over
  * 60k values can drift by ~1e-4 absolute between engines (enough to flip a
  * 2-decimal rounding), while the decimal sum is bit-stable at any scale.
  * The final cast back to double is a single deterministic conversion.
  * This mirrors what a production engine does for auditable money columns
  * and costs nothing at scale (decimal sums are still map-side combinable).
  */
object Ops {
  /** A registered query: (session, sf data dir) => result frame. */
  type Q = (SparkSession, String) => DataFrame

  /** Order-independent exact sum of a money-ish double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact sum for wide products (x*y style) needing more integer digits. */
  def dsumWide(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided by count, rounded. */
  def dmean(c: Column, scale: Int = 4): Column =
    round(dsum(c, 4) / count(lit(1)), scale)

  /** Exact interpolated percentile (matches DuckDB quantile_cont). */
  def pct(c: Column, p: Double): Column = percentile(c, lit(p))
}
