package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors over the harness testdata directory (TESTDATA.md).
  *
  * Plays the role of the reference's zone/path layer
  * (`ex01_data_retrieval/src/main/scala/Ex01DataRetrieval.scala:57-58`,
  * `ex05_ml_prediction_service/src/spark_io.py:133-135`): one place that knows
  * where tables live, so operators stay path-free. Reads are plain
  * `spark.read.parquet` — Catalyst handles column pruning and predicate
  * pushdown into the scan, which is the scale-critical property (SURVEY §4).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
