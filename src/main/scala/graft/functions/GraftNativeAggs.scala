package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration for the r14 native exact aggregates (idempotent).
  * Wired into [[graft.Tables]] (every registry query's first touch point),
  * [[graft.Ops]] (lazily, via the active session) and
  * [[graft.GraftExtensions]] (the --conf deployment path), so the kernels
  * resolve in any session that can reach a graft query. */
object GraftNativeAggs {
  def register(spark: SparkSession): Unit = {
    DecSumAgg.register(spark)
    PercentileAgg.register(spark)
    GraftSqDistDec.register(spark)
  }
}
