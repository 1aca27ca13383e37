package graft.warehouse

import graft.{SparkSpec, Tables}
import graft.ml.ModelRegistry
import graft.operators.Cleaning
import graft.sources.Sources

import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("SCD2 apply versions changes, suppresses no-ops, and is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.types.DateType
    val current = Seq(
      (1, "alpha", 10), (2, "beta", 20),
    ).toDF("k", "name", "grp")
      .withColumn("valid_from", lit("2024-01-01").cast(DateType))
      .withColumn("valid_to", lit(null).cast(DateType))
    val changes = Seq(
      (1, "alpha-v2", 10, "2024-06-01"), // changed -> close + new version
      (2, "beta", 20, "2024-06-01"),     // identical -> suppressed
      (3, "gamma", 30, "2024-06-01"),    // new key -> first version
    ).toDF("k", "name", "grp", "eff")
    val applied = StarSchema.scd2Apply(current, changes, "k", Seq("name", "grp"), "eff")
    val rows = applied.orderBy("k", "valid_from").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getDate(4)).map(_.toString)))
    assert(rows.toSeq === Seq(
      (1, "alpha", Some("2024-06-01")),   // closed old version
      (1, "alpha-v2", None),              // new open version
      (2, "beta", None),                  // untouched (no-op change)
      (3, "gamma", None)))                // first version of new key
    // re-delivering the same change batch creates nothing new
    val again = StarSchema.scd2Apply(applied, changes, "k", Seq("name", "grp"), "eff")
    assert(again.count() === applied.count())
  }

  test("SCD1 merge is latest-wins (older incoming never clobbers) and idempotent") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val target = Seq(
      (1L, ts("2024-06-01 00:00:00"), 10.0),
      (2L, ts("2024-06-01 00:00:00"), 20.0),
    ).toDF("k", "ts", "v")
    val incoming = Seq(
      (1L, ts("2024-01-01 00:00:00"), 11.0), // OLDER restatement -> ignored
      (2L, ts("2024-07-01 00:00:00"), 22.0), // newer -> replaces
      (3L, ts("2024-07-01 00:00:00"), 33.0), // new key -> inserts
    ).toDF("k", "ts", "v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val merged = StarSchema.scd1Merge(target, incoming, "k", "ts")
    assert(snap(merged) === Seq((1L, 10.0), (2L, 22.0), (3L, 33.0)))
    // re-delivering the same batch converges (incoming wins exact ties)
    val again = StarSchema.scd1Merge(merged, incoming, "k", "ts")
    assert(snap(again) === snap(merged))
  }

  test("dim_time keys are consistent between builder and fact-side encoding") {
    val ev = Tables(spark, sf001).events
    val dt = StarSchema.dimTime(ev, "ts")
    // every fact row's computed time_id must resolve in the dimension
    val unresolved = ev
      .withColumn("time_id", hour(col("ts")) * 3600 + minute(col("ts")) * 60)
      .join(dt, Seq("time_id"), "left_anti")
    assert(unresolved.count() === 0)
    // key uniqueness (the PK contract of dw_creation.sql:14-19)
    assert(dt.count() === dt.select("time_id").distinct().count())
  }

  test("dim_date covers exactly the distinct order dates") {
    val o = Tables(spark, sf001).orders
    val dd = StarSchema.dimDate(o, "o_orderdate")
    assert(dd.count() === o.select(to_date(col("o_orderdate"))).distinct().count())
  }

  test("backfill re-run converges: double-run of a month equals single run") {
    val out = new java.io.File("target/tmp/backfill_test").getAbsolutePath
    def runMonth(m: String): Unit = {
      val Array(y, mo) = m.split("-").map(_.toInt)
      val cleaned = Cleaning.monthWindow(Tables(spark, sf001).events, "ts", y, mo)
        .withColumn("month", lit(m))
      Sources.partitionedOverwrite(cleaned, out, Seq("month"))
    }
    val months = ModelRegistry.monthRange("2024-01", "2024-01")
    StarSchema.backfillMonths(months)(runMonth)
    val once = spark.read.parquet(out).count()
    StarSchema.backfillMonths(months ++ months)(runMonth) // sloppy re-run
    val twice = spark.read.parquet(out).count()
    assert(once === twice && once > 0)
  }

  test("SCD2 point-in-time entry: events split across versions at the boundary") {
    val out = graft.SparkEntry.queries("j12_scd2_pit")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    val t = graft.Tables(spark, sf001)
    import org.apache.spark.sql.functions._
    val key5 = t.events.filter(pmod(col("user_id"), lit(25L)) === 5L)
    val before = key5.filter(to_date(col("ts")) < lit("2024-01-15")).count()
    val after = key5.count() - before
    // the renamed version catches exactly the at-or-after-effective events
    assert(out.getOrElse("NATION_5_RENAMED", 0L) === after)
    assert(before > 0 && after > 0, "the feed must straddle the rename date")
    // no event ever double-joins: per-version counts sum to the feed size
    assert(out.values.sum === t.events.count())
    // the unseen key 99's version matches nothing (inner join) — absent
    assert(!out.contains("NATION_99"))
  }
}
