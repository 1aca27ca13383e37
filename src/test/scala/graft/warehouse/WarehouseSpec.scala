package graft.warehouse

import graft.{SparkSpec, Tables}
import graft.ml.ModelRegistry
import graft.operators.Cleaning
import graft.sources.Sources

import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

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
}
