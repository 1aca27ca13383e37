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
  // Every registry query's first touch point: make the native exact
  // aggregates (graft_dec_sum / graft_percentile / graft_sqdist_dec)
  // resolvable in this session before any Ops helper builds a call to
  // them. Idempotent, registry-only — no plan or data effect.
  graft.functions.GraftNativeAggs.register(spark)

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

  /** The events feed's `ts` encoding has varied across testdata
    * generations, so the loader adapts to whichever physical type is on
    * disk and always hands operators a session-zone `TimestampType`:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright —
    *    read nanos as long (SPARK-40819 legacy flag) and rebuild a
    *    microsecond timestamp with exact integral division (the feed has
    *    no sub-microsecond values). The rebuild blocks parquet filter
    *    pushdown on `ts`; at scale this table would be re-encoded at the
    *    bronze->silver hop precisely to keep pushdown.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    *    TIMESTAMP_NTZ — cast to TimestampType (a no-op under the
    *    session's pinned UTC zone, and DuckDB reads the same naive
    *    micros, so oracle comparisons stay exact).
    *  - already TimestampType: pass through untouched (pushdown intact). */
  def events: DataFrame = cache.getOrElseUpdate("events", {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
  })
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Encoding-adaptive `ts` normalization (see [[Tables.events]]). Shared
    * with the file-based streaming reads in StreamingSpec, which stream the
    * same feed and must apply the identical rebuild; works on streaming
    * frames too (pure projection). */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ->TZ cast reinterprets the naive micros IN THE SESSION
        // ZONE — exact only under the UTC zone every Graft session pins
        // (ADVICE r8: from any other zone it would silently shift every
        // event timestamp and break oracle comparisons). Fail fast rather
        // than corrupt.
        val zone = raw.sparkSession.conf.get("spark.sql.session.timeZone")
        require(zone == "UTC",
          s"normalizeEventsTs needs spark.sql.session.timeZone=UTC to cast " +
            s"TIMESTAMP_NTZ losslessly (session has '$zone'); set the zone " +
            "or read the feed through GraftSession")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
