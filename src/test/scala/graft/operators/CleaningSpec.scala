package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("monthWindow keeps [first, next-first) half-open edges") {
    val df = Seq(
      ts("2023-12-31 23:59:59.999999"), // before
      ts("2024-01-01 00:00:00.0"),      // first instant: kept
      ts("2024-01-15 12:00:00.0"),      // middle: kept
      ts("2024-01-31 23:59:59.999999"), // last instant: kept
      ts("2024-02-01 00:00:00.0"),      // next month first instant: dropped
    ).toDF("ts")
    val kept = Cleaning.monthWindow(df, "ts", 2024, 1).collect().map(_.getTimestamp(0))
    assert(kept.toSet === Set(ts("2024-01-01 00:00:00.0"),
      ts("2024-01-15 12:00:00.0"), ts("2024-01-31 23:59:59.999999")))
  }

  test("timeWindow generalizes the month window to arbitrary half-open backfill ranges") {
    val df = Seq(
      ts("2024-01-31 23:59:59.0"), ts("2024-02-01 00:00:00.0"),
      ts("2024-03-15 12:00:00.0"), ts("2024-04-01 00:00:00.0"),
    ).toDF("ts")
    val kept = Cleaning.timeWindow(df, "ts", "2024-02-01", "2024-04-01")
      .collect().map(_.getTimestamp(0))
    assert(kept.toSet === Set(ts("2024-02-01 00:00:00.0"), ts("2024-03-15 12:00:00.0")))
  }

  test("nullGuards keeps nullable passenger-count-style column null but rejects negatives") {
    val df = Seq(
      (Some(1L), Some(5.0)),   // fine
      (None, Some(5.0)),       // null nullable col: kept (reference asymmetry)
      (Some(-1L), Some(5.0)),  // negative nullable col: dropped
      (Some(1L), None),        // null required col: dropped
      (Some(1L), Some(-2.0)),  // negative required col: dropped
    ).toDF("pcount", "total")
    val out = Cleaning.nullGuards(df,
      nonNegative = Seq("total"), keepNullable = Seq("pcount")).collect()
    assert(out.length === 2)
    assert(out.map(r => Option(r.get(0))).toSet === Set(Some(1L), None))
  }

  test("castProjection applies one cast per column and rejects unknown names") {
    val df = Seq(("1", "2.5")).toDF("a", "b")
    val out = Cleaning.castProjection(df, Seq("a" -> IntegerType, "b" -> DoubleType))
    assert(out.schema.map(f => f.name -> f.dataType) ===
      Seq("a" -> IntegerType, "b" -> DoubleType))
    assert(out.head.getInt(0) === 1 && out.head.getDouble(1) === 2.5)
    intercept[IllegalArgumentException] {
      Cleaning.castProjection(df, Seq("nope" -> IntegerType))
    }
  }

  test("bucketize respects bounds, shadow-proofs ordering, nulls fall to rest") {
    val df = Seq(Some(5.0), Some(10.0), Some(29.99), Some(30.0), Some(100.0), None)
      .toDF("price")
    // deliberately unsorted bounds: bucketize must sort them
    val out = df.select(Cleaning.bucketize(col("price"),
      Seq(30.0 -> "medium", 10.0 -> "low"), "high").as("b"))
      .collect().map(_.getString(0))
    assert(out === Array("low", "medium", "medium", "high", "high", "high"))
  }

  test("retention computes single-scan ratio and survives empty input") {
    val df = Seq(1.0, 2.0, -1.0, 3.0).toDF("v")
    val r = Cleaning.retention(df, col("v") > 0).head
    assert(r.getLong(0) === 4 && r.getLong(1) === 3 && r.getDouble(2) === 0.75)
    val e = Cleaning.retention(df.filter(lit(false)), col("v") > 0).head
    assert(e.getLong(0) === 0 && e.getLong(1) === 0 && e.getDouble(2) === 1.0)
  }
}
