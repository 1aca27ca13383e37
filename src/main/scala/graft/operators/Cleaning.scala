package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.time.LocalDate

/** Ingest-side cleaning operators.
  *
  * Re-expresses the semantics of the reference's clean/ingest stage
  * (`ex02_data_ingestion/src/main/scala/Ex02DataIngestion.scala:33-88`) as
  * reusable, schema-agnostic Spark operators:
  *
  *   - [[castProjection]]  — the explicit cast block (Ex02DataIngestion.scala:50-68, P1)
  *     expressed as ONE `select` so Catalyst sees a single Project node.
  *   - [[monthWindow]]     — the half-open month predicate
  *     (Ex02DataIngestion.scala:33-42,72-77, P2): rows outside [start, start+1 month)
  *     are dropped, not reassigned — the batch twin of a watermark-with-drop.
  *   - [[nullGuards]]      — null / non-negative guards (Ex02DataIngestion.scala:80-87, P3),
  *     with the reference's asymmetry preserved: `keepNullable` columns may be
  *     null (ingest keeps null passenger_count; the ML stage drops it, P5).
  *
  * All of these are pure Column predicates/projections, so they push down into
  * the parquet scan (visible as PushedFilters in `.explain`) — at 100 TB the
  * filter runs inside the scan, not after it.
  */
object Cleaning {

  /** One-node cast projection: (column -> target type) applied as a single select.
    * Unknown column names fail eagerly (like the reference's `withColumn(col(...))`
    * style, which fails analysis on a typo'd name). */
  def castProjection(df: DataFrame, casts: Seq[(String, DataType)]): DataFrame = {
    val castMap = casts.toMap
    val unknown = castMap.keySet -- df.columns.toSet
    require(unknown.isEmpty, s"castProjection: unknown columns $unknown")
    val cols = df.columns.map { c =>
      castMap.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Half-open month predicate [first-of-month, first-of-next-month) on `tsCol`. */
  def monthWindowPredicate(tsCol: Column, year: Int, month: Int): Column = {
    val start = LocalDate.of(year, month, 1)
    val end = start.plusMonths(1)
    tsCol >= lit(start.toString).cast(TimestampType) &&
      tsCol < lit(end.toString).cast(TimestampType)
  }

  def monthWindow(df: DataFrame, tsCol: String, year: Int, month: Int): DataFrame =
    df.filter(monthWindowPredicate(col(tsCol), year, month))

  /** Half-open arbitrary window [start, end) — generalization used by backfill. */
  def timeWindow(df: DataFrame, tsCol: String, startIso: String, endIso: String): DataFrame =
    df.filter(col(tsCol) >= lit(startIso).cast(TimestampType) &&
      col(tsCol) < lit(endIso).cast(TimestampType))

  /** Null / non-negative guards.
    *
    * @param requiredNonNull  columns that must be non-null
    * @param nonNegative      columns that must be non-null AND >= 0
    * @param keepNullable     columns that may be null, but if present must be >= 0
    *                         (the reference's passenger_count rule,
    *                         Ex02DataIngestion.scala:87)
    */
  def nullGuards(df: DataFrame,
                 requiredNonNull: Seq[String] = Nil,
                 nonNegative: Seq[String] = Nil,
                 keepNullable: Seq[String] = Nil): DataFrame = {
    val preds =
      requiredNonNull.map(c => col(c).isNotNull) ++
        nonNegative.map(c => col(c).isNotNull && col(c) >= 0) ++
        keepNullable.map(c => col(c).isNull || col(c) >= 0)
    preds.reduceOption(_ && _).map(df.filter).getOrElse(df)
  }

  /** CASE-WHEN bucketing (error_analysis.py:229-234, P8): thresholds are the
    * upper bounds of each labeled bucket; values >= last threshold get `rest`.
    * Bounds are sorted ascending here so caller order can't shadow a bucket;
    * null inputs fall through to `rest` (matches the reference's CASE). */
  def bucketize(c: Column, bounds: Seq[(Double, String)], rest: String): Column =
    bounds.sortBy(_._1).foldRight(lit(rest): Column) { case ((ub, label), acc) =>
      when(c < ub, label).otherwise(acc)
    }

  /** Retention ratio of a cleaning step: cleaned/raw, the quality-gate input
    * (full_pipeline_dag.py:130-181). Computed as one aggregate over the raw
    * frame with the predicate inlined — a single scan, no second job. */
  def retention(raw: DataFrame, keep: Column): DataFrame =
    raw.agg(
      count(lit(1)).as("raw_rows"),
      coalesce(sum(when(keep, 1L).otherwise(0L)), lit(0L)).as("kept_rows"),
      // empty input => retention 1.0 (vacuously nothing was dropped), never null
      coalesce(round(sum(when(keep, 1.0).otherwise(0.0)) / count(lit(1)), 6),
        lit(1.0)).as("retention")
    )
}
