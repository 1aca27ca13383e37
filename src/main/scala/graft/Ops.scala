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

  /** The decimal-exact aggregates below run through the r14 native kernels
    * ([[graft.functions.DecSumAgg]] / [[graft.functions.PercentileAgg]]) —
    * bit-identical to the builtin `sum(cast(… as decimal))` / `percentile`
    * chains (pinned in NativeAggEqualitySpec), 3-5× cheaper per row, same
    * state and shuffle bytes at scale. They resolve via the session
    * function registry; registration is idempotent and wired here, in
    * [[Tables]], and in [[GraftExtensions]]. */
  private def registered(c: Column): Column = {
    SparkSession.getActiveSession.foreach(graft.functions.GraftNativeAggs.register)
    c
  }

  /** Order-independent exact sum of a money-ish double column
    * (= `sum(cast(c as decimal(18, scale))).cast(double)`, bit-exact). */
  def dsum(c: Column, scale: Int = 2): Column =
    registered(call_function("graft_dec_sum", c, lit(18), lit(scale))
      .cast(DoubleType))

  /** Exact sum for wide products (x*y style) needing more integer digits
    * (= `sum(cast(c as decimal(30, scale))).cast(double)`, bit-exact). */
  def dsumWide(c: Column, scale: Int = 6): Column =
    registered(call_function("graft_dec_sum", c, lit(30), lit(scale))
      .cast(DoubleType))

  /** Deterministic mean: exact decimal sum divided by count, rounded. */
  def dmean(c: Column, scale: Int = 4): Column =
    round(dsum(c, 4) / count(lit(1)), scale)

  /** Exact interpolated percentile (matches DuckDB quantile_cont;
    * = the builtin `percentile(c, p)`, bit-exact). */
  def pct(c: Column, p: Double): Column =
    registered(call_function("graft_percentile", c.cast(DoubleType), lit(p)))
}
