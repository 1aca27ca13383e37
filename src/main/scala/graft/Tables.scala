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
  // Memoized: repeated accessor calls must return the SAME DataFrame
  // instance, so `t.customer("c_custkey")` resolves against the exact plan
  // used in a join (fresh reads get fresh expr IDs, which semi/anti joins
  // reject as ambiguous).
  private val cache = scala.collection.mutable.Map.empty[String, DataFrame]
  private def t(name: String): DataFrame =
    cache.getOrElseUpdate(name, spark.read.parquet(s"$dir/$name.parquet"))

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** The events feed is written with TIMESTAMP(NANOS) parquet type, which
    * Spark's vectorized reader rejects outright. Read nanos as long
    * (SPARK-40819 legacy flag) and rebuild a microsecond timestamp with an
    * exact integral division — the feed carries no sub-microsecond values.
    * The cast blocks parquet filter pushdown on `ts`; at scale this table
    * would be re-encoded to TIMESTAMP_MICROS at the bronze->silver hop
    * (the reference's clean/ingest stage) precisely to keep pushdown. */
  def events: DataFrame = cache.getOrElseUpdate("events", {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  })
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
