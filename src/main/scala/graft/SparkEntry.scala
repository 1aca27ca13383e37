package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Ops.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Thin registry: every module exposes `entries` (name -> query) and
  * `oracles` (name -> DuckDB SQL); this object concatenates them. A name in
  * `queries` without an oracle gets the driver's weaker rows-only check
  * (used for seed-/approximation-specific operators).
  */
object SparkEntry {

  /** Flagship: the A5 pricing-summary aggregate (TPC-H Q1 shape — the same
    * groupBy/agg pattern as the reference's KPI queries, app.py:239-252). */
  def entry(spark: SparkSession): DataFrame =
    analytics.CoreQueries.entries("a5_two_key_group")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, Q] =
    analytics.CoreQueries.entries ++
      analytics.ExtendedQueries.entries ++
      analytics.Behavior.entries ++
      analytics.Graph.entries ++
      analytics.RobustStats.entries ++
      analytics.Drift.entries ++
      operators.Incremental.entries ++
      warehouse.Layout.entries ++
      warehouse.StarSchema.entries ++
      functions.TextOps.entries ++
      functions.CatalogFunctions.entries ++
      operators.Dedup.entries ++
      operators.Curation.entries ++
      operators.Similarity.entries ++
      operators.Multimodal.entries ++
      operators.Skew.entries ++
      operators.Linkage.entries ++
      operators.RuntimeFilters.entries ++
      operators.AsOfJoin.entries ++
      operators.RangeJoin.entries ++
      warehouse.Bucketing.entries ++
      quality.Gates.entries ++
      streaming.EventStream.entries ++
      sources.Sources.entries ++
      sources.Tiles.entries ++
      ml.FarePipeline.entries

  def oracleSql: Map[String, String] =
    analytics.CoreQueries.oracles ++
      analytics.ExtendedQueries.oracles ++
      analytics.Behavior.oracles ++
      analytics.Graph.oracles ++
      analytics.RobustStats.oracles ++
      analytics.Drift.oracles ++
      operators.Incremental.oracles ++
      warehouse.Layout.oracles ++
      warehouse.StarSchema.oracles ++
      functions.TextOps.oracles ++
      functions.CatalogFunctions.oracles ++
      operators.Dedup.oracles ++
      operators.Curation.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      operators.Skew.oracles ++
      operators.Linkage.oracles ++
      operators.RuntimeFilters.oracles ++
      operators.AsOfJoin.oracles ++
      operators.RangeJoin.oracles ++
      warehouse.Bucketing.oracles ++
      quality.Gates.oracles ++
      streaming.EventStream.oracles ++
      sources.Sources.oracles ++
      sources.Tiles.oracles ++
      ml.FarePipeline.oracles
}
