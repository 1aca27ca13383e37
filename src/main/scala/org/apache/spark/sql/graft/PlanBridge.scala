package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{SparkSession => ClassicSession, Dataset => ClassicDataset}
import org.apache.spark.sql.execution.SparkStrategy

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] node into a DataFrame, and installing a planner strategy
  * on a live session. Spark deliberately keeps `Dataset.ofRows` internal —
  * library extensions (Delta, Iceberg, spark-rapids all do the same) place a
  * small bridge inside the `org.apache.spark.sql` package namespace rather
  * than forking the planner. Everything else in graft uses only public API.
  */
object PlanBridge {

  /** DataFrame over an arbitrary (to-be-analyzed) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Idempotently add an extra planner strategy to the session (the
    * runtime-registration twin of
    * `SparkSessionExtensions.injectPlannerStrategy`). */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[ClassicSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
