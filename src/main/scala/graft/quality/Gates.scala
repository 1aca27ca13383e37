package graft.quality

import graft.Tables
import graft.Ops.Q
import graft.operators.Cleaning
import graft.sources.Sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gates: the Spark twin of the reference's runtime checks
  * (`ex06_airflow/dags/full_pipeline_dag.py:59-60,130-181,392-411,504-524`
  * and `src/logging_config.py:118-170`).
  *
  * Pure functions over single-scan aggregates — a gate never costs more
  * than one conditional aggregate over the batch it guards.
  */
object Gates {

  /** Retention thresholds (full_pipeline_dag.py:59-60). */
  val FailBelow = 0.80
  val WarnBelow = 0.90

  /** Status of a retention ratio: FAIL < 0.80 <= WARN < 0.90 <= PASS. */
  def retentionStatus(ratio: Double): String =
    if (ratio < FailBelow) "FAIL" else if (ratio < WarnBelow) "WARN" else "PASS"

  /** Column form for use inside aggregates. */
  def retentionStatusCol(ratio: Column): Column =
    when(ratio < FailBelow, "FAIL").when(ratio < WarnBelow, "WARN").otherwise("PASS")

  /** Row-floor check (staging/fact >= 1000 rows,
    * full_pipeline_dag.py:392-411,504-524). */
  def floorStatus(rows: Long, floor: Long = 1000L): String =
    if (rows >= floor) "PASS" else "FAIL"

  /** Retention gate over a raw frame + keep predicate: single scan,
    * returns (raw_rows, kept_rows, retention, status). */
  def retentionGate(raw: DataFrame, keep: Column): DataFrame =
    Cleaning.retention(raw, keep)
      .withColumn("status", retentionStatusCol(col("retention")))

  /** Row floor gate as a 1-row frame. */
  def floorGate(df: DataFrame, floor: Long = 1000L): DataFrame =
    df.agg(count(lit(1)).as("n_rows"))
      .withColumn("floor", lit(floor))
      .withColumn("status", when(col("n_rows") >= floor, "PASS").otherwise("FAIL"))

  /** SLA status of one task duration: Airflow SLA semantics — a breach is
    * reported, never fatal (`full_pipeline_dag.py:308,363,501,574` attaches
    * SLAs to the reference's 4 heavy tasks). */
  def slaStatus(durationSec: Double, slaSec: Double): String =
    if (durationSec <= slaSec) "OK" else "SLA_MISS"

  /** Wall-clock a stage (an action, a write) for SLA accounting. */
  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Attach ZERO-COST pipeline observability to a frame: `Dataset.observe`
    * computes the named aggregates inside the existing job (no second scan —
    * the accumulator rides the rows already flowing) and exposes them via
    * the completed QueryExecution. The production pattern for "log row
    * counts and null rates of every batch you write" at 100 TB, where a
    * separate metrics query would double the read. Read the result with
    * [[observedMetrics]] after an action has run. */
  def withObservedMetrics(df: DataFrame, name: String, keep: Column): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(keep, 1L).otherwise(0L)).as("n_kept"))

  /** Pull one observation's metrics row out of a materialized frame.
    * The action must have run through THIS frame's own execution
    * (`collect`/`toLocalIterator`) — `df.write` and `df.rdd` plan a fresh
    * QueryExecution, so for write jobs read the metrics via a
    * `QueryExecutionListener` (the streaming path delivers them through
    * `StreamingQueryListener` the same way). */
  def observedMetrics(df: DataFrame, name: String): Map[String, Any] = {
    val row = df.queryExecution.observedMetrics(name)
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  /** SLA report over (task, measured duration, sla) triples. */
  def slaGate(spark: SparkSession, tasks: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    tasks.map { case (n, d, s) => (n, d, s, slaStatus(d, s)) }
      .toDF("task", "duration_sec", "sla_sec", "status")
  }

  /** Data-availability short-circuit (the ShortCircuitOperator twin,
    * `full_pipeline_dag.py:101-127,279-283`): probe passes → RUN, else SKIP
    * the month and exit clean. The probe runs once, driver-side (an HTTP
    * HEAD or FS-exists — never a Spark job). The CLI maps SKIP to exit
    * code 2 (`cli/Main.scala`), mirroring `ml_pipeline.py:533-540`. */
  def availabilityGate(spark: SparkSession, feed: String, probe: => Boolean): DataFrame = {
    import spark.implicits._
    val ok = probe
    Seq((feed, ok, if (ok) "RUN" else "SKIP")).toDF("feed", "available", "action")
  }

  /** k-anonymity risk audit over a quasi-identifier tuple: every QI combo
    * shared by fewer than k rows re-identifies its members when joined
    * with an external dataset — the compliance complement of the PII
    * scrub ([[graft.functions.TextOps]]) and GDPR erasure accounting.
    * Reports each risky combo with its member count plus the suppression
    * cost (rows that must be generalized or dropped to reach k). One
    * keyed counting aggregate + a count-filter — QI-combo-sized output,
    * map-side combinable, the same single-shuffle shape at any corpus
    * size. */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty && k > 1, s"need QI columns and k > 1")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") < k)
      .withColumn("k", lit(k))
      .withColumn("suppression_cost", col("n_rows"))
  }

  /** l-diversity risk audit — the follow-up attack k-anonymity misses: a
    * QI group can hold k rows and STILL leak if all k share one sensitive
    * value (the homogeneity attack — "everyone in that zip+age bucket has
    * the same diagnosis"). Flags every QI combo whose sensitive column
    * carries fewer than l distinct values, with the group size and the
    * observed diversity. Distinct-count per group is one shuffle on the QI
    * key with map-side partial distinct — same scale shape as
    * [[kAnonymityAudit]]; output is QI-combo-sized. */
  def lDiversityAudit(df: DataFrame, quasiIds: Seq[String],
                      sensitive: String, l: Int): DataFrame = {
    require(quasiIds.nonEmpty && l > 1, s"need QI columns and l > 1")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
      .withColumn("l", lit(l))
  }

  // ---------------------------------------------------------------- entries

  /** The ingest retention gate applied to the events feed with the
    * reference's cleaning predicate shape (value sane + ids present). */
  private val retentionGateQ: Q = (s, dir) =>
    retentionGate(Tables(s, dir).events,
      col("value").isNotNull && col("value") >= 0 && col("user_id").isNotNull)

  private val floorGateQ: Q = (s, dir) => floorGate(Tables(s, dir).events)

  /** Both gate outcomes in one frame: the present feed probes RUN, the
    * absent one probes SKIP. */
  private val availabilityGateQ: Q = (s, dir) =>
    availabilityGate(s, "events", Sources.pathExists(s, s"$dir/events.parquet"))
      .unionAll(availabilityGate(s, "missing_feed",
        Sources.pathExists(s, s"$dir/__no_such_feed__.parquet")))
      .orderBy("feed")

  /** Two genuinely timed stages under generous SLAs (deterministically OK)
    * plus one synthetic breach; only the deterministic (task, status)
    * columns are graded — durations vary run to run. */
  private val slaGateQ: Q = (s, dir) => {
    val (_, dScan) = timed(Tables(s, dir).events.agg(count(lit(1))).head())
    val (_, dDim) = timed(
      Tables(s, dir).orders.select(to_date(col("o_orderdate"))).distinct().count())
    slaGate(s, Seq(
      ("events_scan", dScan, 300.0),
      ("dim_date_build", dDim, 300.0),
      ("synthetic_breach", 2.5, 1.0)))
      .select("task", "status").orderBy("task")
  }

  /** QI tuple = (nation, segment, coarse balance bucket) — the classic
    * "zip + gender + birth-date" shape at table scale. */
  private val kAnonymityQ: Q = (s, dir) =>
    kAnonymityAudit(
      Tables(s, dir).customer.withColumn("balance_bucket",
        floor(col("c_acctbal") / 2000).cast(org.apache.spark.sql.types.LongType)),
      Seq("c_nationkey", "c_mktsegment", "balance_bucket"), k = 5)
      .orderBy("c_nationkey", "c_mktsegment", "balance_bucket")

  /** QI tuple = (nation, coarse balance bucket); sensitive = market
    * segment. A bucket whose members all shop one segment leaks the
    * segment of anyone whose nation+balance is known. */
  private val lDiversityQ: Q = (s, dir) =>
    lDiversityAudit(
      Tables(s, dir).customer.withColumn("balance_bucket",
        floor(col("c_acctbal") / 2000).cast(org.apache.spark.sql.types.LongType)),
      Seq("c_nationkey", "balance_bucket"), sensitive = "c_mktsegment", l = 3)
      .orderBy("c_nationkey", "balance_bucket")

  val entries: Map[String, Q] = Map(
    "q_k_anonymity" -> kAnonymityQ,
    "q_l_diversity" -> lDiversityQ,
    "q_retention_gate" -> retentionGateQ,
    "q_floor_gate" -> floorGateQ,
    "q_availability_gate" -> availabilityGateQ,
    "q_sla_gate" -> slaGateQ,
  )

  val oracles: Map[String, String] = Map(
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(floor(c_acctbal / 2000) AS BIGINT) AS balance_bucket,
        |       count(*) AS n_rows, CAST(5 AS INT) AS k,
        |       count(*) AS suppression_cost
        |FROM customer
        |GROUP BY 1, 2, 3 HAVING count(*) < 5
        |ORDER BY c_nationkey, c_mktsegment, balance_bucket""".stripMargin,
    "q_l_diversity" ->
      """SELECT c_nationkey,
        |       CAST(floor(c_acctbal / 2000) AS BIGINT) AS balance_bucket,
        |       count(*) AS n_rows,
        |       count(DISTINCT c_mktsegment) AS n_sensitive,
        |       CAST(3 AS INT) AS l
        |FROM customer
        |GROUP BY 1, 2 HAVING count(DISTINCT c_mktsegment) < 3
        |ORDER BY c_nationkey, balance_bucket""".stripMargin,
    "q_sla_gate" ->
      """SELECT * FROM (VALUES
        |  ('dim_date_build', 'OK'), ('events_scan', 'OK'),
        |  ('synthetic_breach', 'SLA_MISS'))
        |  AS t(task, status)
        |ORDER BY task""".stripMargin,
    "q_availability_gate" ->
      """SELECT * FROM (VALUES
        |  ('events', true, 'RUN'), ('missing_feed', false, 'SKIP'))
        |  AS t(feed, available, action)
        |ORDER BY feed""".stripMargin,
    "q_retention_gate" ->
      """WITH a AS (
        |  SELECT count(*) AS raw_rows,
        |         CAST(sum(CASE WHEN value IS NOT NULL AND value >= 0
        |                        AND user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept_rows
        |  FROM events)
        |SELECT raw_rows, kept_rows,
        |       round(kept_rows * 1.0 / raw_rows, 6) AS retention,
        |       CASE WHEN kept_rows * 1.0 / raw_rows < 0.80 THEN 'FAIL'
        |            WHEN kept_rows * 1.0 / raw_rows < 0.90 THEN 'WARN'
        |            ELSE 'PASS' END AS status
        |FROM a""".stripMargin,
    "q_floor_gate" ->
      """SELECT count(*) AS n_rows, CAST(1000 AS BIGINT) AS floor,
        |       CASE WHEN count(*) >= 1000 THEN 'PASS' ELSE 'FAIL' END AS status
        |FROM events""".stripMargin,
  )
}
