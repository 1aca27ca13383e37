package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory tuned for the graft engine.
  *
  * Mirrors the session-construction role of the reference's
  * `ex02_data_ingestion/src/main/scala/Ex02DataIngestion.scala:96-98` and
  * `ex05_ml_prediction_service/src/spark_io.py` session helpers, re-expressed
  * for Spark 4.x with the settings that matter at large scale:
  *
  *   - AQE on (runtime re-plan: skew-join handling, partition coalescing)
  *   - explicit shuffle partitioning (32 for local[32]; on a 1000-executor
  *     cluster this would be sized to ~2-3x total cores via `shufflePartitions`)
  *   - broadcast threshold left at default 10MB — every dimension table in the
  *     engine (region/nation/supplier/customer at test scale; taxi-zone-lookup
  *     style dims in the reference, cf. SURVEY §2.3) is far below it.
  */
object GraftSession {

  /** Production builder for a real cluster: same semantics as [[local]] but
    * sized for many executors. Config-only (no master hardcoded — supplied
    * by spark-submit), so the whole engine moves from local[32] to a
    * 1000-executor deployment without code changes:
    *
    *  - shuffle partitions ~2-3x total cores (caller passes the number);
    *    AQE coalescing shrinks small stages back down at runtime
    *  - advisory partition size bounds task memory (spill-aware: a 64 MiB
    *    target post-shuffle partition fits executor memory with headroom)
    *  - maxPartitionBytes keeps scan tasks balanced over 100 TB of parquet
    *  - the graft native functions ride in via GraftExtensions
    */
  def clusterBuilder(shufflePartitions: Int,
                     appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  /** Local session for tests/bench. `cores` threads, one JVM. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            shufflePartitions: Int = 32,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.warehouse.dir", "target/tmp/warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
