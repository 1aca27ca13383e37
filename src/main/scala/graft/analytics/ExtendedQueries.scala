package graft.analytics

import graft.{Ops, Tables}
import graft.Ops.{Q, dsum, dsumWide}
import graft.operators.Cleaning
import graft.sources.Sources
import graft.ml.ModelRegistry

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Second wave of the analytics surface: the SQL-view query path (S7), the
  * composed clean-ingest pipeline (VERDICT r2 item 10), rollup/pivot
  * aggregates, and the reference's top-error collect+label pattern (T4). */
object ExtendedQueries {

  /** The deterministic "prediction error" used by the error-analysis ops —
    * one definition shared by a11/a14/t4. */
  private def withErr(li: DataFrame): DataFrame =
    li.withColumn("err", col("l_extendedprice") - (col("l_quantity") * 1000.0 + 500.0))

  /** T4 driver-side cause inference (error_analysis.py:101-159): plain Scala
    * over the <=10 collected top-error rows — intentionally NOT distributed,
    * mirroring the reference's design (cheap on 10 rows, readable logic). */
  def inferLikelyCause(quantity: Double, discount: Double): String =
    if (quantity >= 40) "high_quantity"
    else if (discount >= 0.08) "high_discount"
    else "unmodeled"

  // ---------------------------------------------------------------- entries

  /** S7 — the spark.sql-over-registered-views query surface
    * (the replacement for the reference's PostgreSQL dashboard reads,
    * app.py:136-145). Identical SQL runs as the DuckDB oracle. */
  private val sqlViewsQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** Composed clean-ingest pipeline (Ex02DataIngestion.scala:45-118):
    * cast -> month window -> null guards -> partitioned overwrite sink
    * (written twice: idempotence) -> read back -> KPI aggregate. */
  private val cleanIngestQ: Q = (s, dir) => {
    val cleaned = Cleaning.nullGuards(
      Cleaning.monthWindow(
        Cleaning.castProjection(Tables(s, dir).events,
          Seq("user_id" -> LongType, "value" -> DoubleType)),
        "ts", 2024, 1),
      requiredNonNull = Seq("ts", "event_type"),
      nonNegative = Seq("value"))
      .withColumn("day", to_date(col("ts")))
    val out = {
      val d = new java.io.File("target/tmp/clean_events"); d.mkdirs(); d.getAbsolutePath
    }
    Sources.partitionedOverwrite(cleaned, out, Seq("day"))
    Sources.partitionedOverwrite(cleaned, out, Seq("day")) // idempotent re-run
    s.read.parquet(out).agg(
      count(lit(1)).as("n_rows"),
      dsum(col("value")).as("total_value"),
      count_distinct(col("day")).as("n_days"))
  }

  /** The reference's Airflow DAG as ONE graded run card
    * (full_pipeline_dag.py:59-181, 279-283, 392-411): availability
    * short-circuit → month clean with retention thresholds → staging row
    * floor → warehouse day-coverage check → dashboard KPI → ML-quality
    * feature floor. Every stage is a single-scan aggregate; statuses use
    * the same FAIL<0.8≤WARN<0.9≤PASS and floor rules the gates expose
    * individually, so the card is the composition, not new logic. The
    * scalars are one-row aggregates collected driver-side (metadata,
    * never data) and re-emitted as the 6-row card the orchestrator logs. */
  private val dagRunQ: Q = (s, dir) => {
    import s.implicits._
    val t = Tables(s, dir)
    val rawMonth = Cleaning.monthWindow(
      Cleaning.castProjection(t.events,
        Seq("user_id" -> LongType, "value" -> DoubleType)), "ts", 2024, 1)
    val cleaned = Cleaning.nullGuards(rawMonth,
      requiredNonNull = Seq("ts", "event_type"),
      nonNegative = Seq("value"))
    val nRawAll = t.events.count()
    val rawStats = rawMonth.agg(count(lit(1)).as("n"),
      count_distinct(to_date(col("ts"))).as("days")).head()
    val (nRawMonth, rawDays) = (rawStats.getLong(0), rawStats.getLong(1))
    val nClean = cleaned.count()
    val stats = cleaned.agg(
      count_distinct(to_date(col("ts"))).as("n_days"),
      Ops.dsum(col("value")).as("total_value")).head()
    val (nDays, totalValue) = (stats.getLong(0), stats.getDouble(1))
    val retention = BigDecimal(nClean.toDouble / nRawMonth)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nFeatures = t.lineitem.filter(col("l_quantity") > 0 &&
      col("l_extendedprice") >= 0 && col("l_shipdate").isNotNull).count()
    Seq(
      ("1_availability", if (nRawAll > 0) "RUN" else "SKIP",
        nRawAll, null.asInstanceOf[java.lang.Double]),
      ("2_clean_month", graft.quality.Gates.retentionStatus(retention),
        nClean, java.lang.Double.valueOf(retention)),
      ("3_staging_floor", graft.quality.Gates.floorStatus(nClean),
        nClean, null.asInstanceOf[java.lang.Double]),
      // coverage: cleaning must not lose a whole day of the feed
      ("4_warehouse_days", if (nDays == rawDays) "PASS" else "FAIL",
        nDays, null.asInstanceOf[java.lang.Double]),
      ("5_dashboard_kpi", "OK", nClean,
        java.lang.Double.valueOf(totalValue)),
      ("6_ml_features", graft.quality.Gates.floorStatus(nFeatures),
        nFeatures, null.asInstanceOf[java.lang.Double]),
    ).toDF("task", "status", "n_rows", "metric").orderBy("task")
  }

  /** A16 — ROLLUP aggregate (beyond-parity; subtotal rows carry NULL keys). */
  private val rollupQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .withColumn("o_year", year(col("o_orderdate")))
      .rollup("o_year", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(asc_nulls_first("o_year"), asc_nulls_first("o_orderpriority"))

  /** A22 — CUBE: all grouping-set combinations of (year, priority). */
  private val cubeQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .withColumn("o_year", year(col("o_orderdate")))
      .cube("o_year", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(asc_nulls_first("o_year"), asc_nulls_first("o_orderpriority"))

  /** A28 — explicit GROUPING SETS: the general form [[rollupQ]]/[[cubeQ]]
    * specialize — per-year totals, per-priority totals, and the grand
    * total, WITHOUT the (year, priority) cross detail a cube would also
    * emit. Same single-shuffle Expand-based plan as rollup/cube. */
  private val groupingSetsQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .withColumn("o_year", year(col("o_orderdate")))
      .groupingSets(
        Seq(Seq(col("o_year")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(asc_nulls_first("o_year"), asc_nulls_first("o_orderpriority"))

  /** J11 — FULL OUTER join: reconciliation of two keyed sets where BOTH
    * sides can be unmatched (the segment's customer list vs the order
    * feed). The unmatched-side accounting is the audit query of any
    * two-system reconciliation. Shuffled hash/sort-merge on the key — full
    * outer can't broadcast either side, which is exactly why it exists as
    * its own entry. */
  private val fullOuterQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    val c = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = t.orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .agg(
        count(when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, 1))
          .as("n_both"),
        count(when(col("o_custkey").isNull, 1)).as("n_cust_only"),
        count(when(col("c_custkey").isNull, 1)).as("n_ord_only"))
  }

  /** Q — correlated EXISTS/NOT EXISTS through the SQL surface: per segment,
    * customers with at least one URGENT order vs customers with none.
    * Catalyst decorrelates both subqueries into semi/anti joins on the
    * customer key — the same physical shape as [[j5/j6]], reached from
    * declarative SQL. */
  private val existsSubqueryQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_mktsegment,
        |       count(CASE WHEN EXISTS (
        |         SELECT 1 FROM orders
        |         WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |         THEN 1 END) AS n_with_urgent,
        |       count(CASE WHEN NOT EXISTS (
        |         SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |         THEN 1 END) AS n_never_ordered
        |FROM customer
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** A30 — date-spine gap fill: daily revenue as a DENSE series over the
    * full [min, max] order-date range, absent days zero-filled — the
    * resample step every time-series consumer (dashboards, forecasting
    * features) needs. The spine is generated DISTRIBUTEDLY from the data's
    * own bounds (`sequence` over a one-row min/max aggregate, exploded) —
    * no driver-side date loop, no literal calendar; the left join back to
    * the daily aggregate broadcasts whichever side AQE finds smaller. */
  private val dateSpineFillQ: Q = (s, dir) => {
    val orders = Tables(s, dir).orders
    val daily = orders.groupBy(col("o_orderdate").as("d"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val spine = orders
      .agg(min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("d"))
    spine.join(daily, Seq("d"), "left")
      .select(col("d"), coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("d")
  }

  /** Q — recursive CTE through the SQL surface (new in Spark 4): a month
    * spine generated by RECURSION from the data's own bounds, left-joined
    * to monthly order counts — the recursive twin of
    * [[dateSpineFillQ]]'s sequence-explode form. Shows the iterative SQL
    * construct itself; for dense spines the explode form plans better (no
    * per-step union), which is why both exist. */
  private val recursiveCteQ: Q = (s, dir) => {
    Tables(s, dir).orders.createOrReplaceTempView("orders")
    s.sql(
      """WITH RECURSIVE b AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS mn,
        |         date_trunc('month', max(o_orderdate)) AS mx
        |  FROM orders),
        |months(m, mx) AS (
        |  SELECT mn, mx FROM b
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx)
        |SELECT months.m AS month, count(o.o_orderkey) AS n
        |FROM months LEFT JOIN orders o
        |  ON date_trunc('month', o.o_orderdate) = months.m
        |GROUP BY 1 ORDER BY month""".stripMargin)
  }

  /** Q — LATERAL correlated subquery (top-2 orders per market segment):
    * the SQL spelling of per-group top-k. Catalyst plans the correlated
    * limit as a LateralJoin; the window/`WindowGroupLimit` form
    * (`t3_topk_rank`) stays the scale path — this entry pins that the
    * declarative SQL surface accepts the construct at all. */
  private val lateralJoinQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    s.sql(
      """SELECT seg.c_mktsegment, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) seg,
        |LATERAL (
        |  SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders o JOIN customer cc ON o.o_custkey = cc.c_custkey
        |  WHERE cc.c_mktsegment = seg.c_mktsegment
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
        |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** A17 — pivot (wide conditional aggregate) on order status. */
  private val pivotQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  /** T4 — top-k collect + driver-side cause labeling
    * (error_analysis.py:295-313): TakeOrderedAndProject brings back 10 rows,
    * plain Scala labels them, result re-enters Spark as a literal frame. */
  private val topErrorsQ: Q = (s, dir) => {
    import s.implicits._
    val top = withErr(Tables(s, dir).lineitem)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), round(abs(col("err")), 4).as("abs_err"))
      .orderBy(desc("abs_err"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(10)
      .collect()
    top.zipWithIndex.map { case (r, i) =>
      (i + 1, r.getLong(0), r.getInt(1), r.getDouble(4),
        inferLikelyCause(r.getDouble(2), r.getDouble(3)))
    }.toSeq.toDF("rank", "l_orderkey", "l_linenumber", "abs_err", "likely_cause")
  }

  /** M8 — sliding train/test window surfaced as data. Oracle-graded since
    * r9: the window derivation is pure month arithmetic (no RNG, no model
    * state), so DuckDB re-derives the exact (window_for, role, month) rows
    * — including the year wraps the ScalaTest pin covers. */
  private val slidingWindowQ: Q = (s, dir) => {
    import s.implicits._
    Seq("2023-02", "2024-01", "2024-12").flatMap { m =>
      val (train, test) = ModelRegistry.slidingWindow(m)
      train.map(t => (test, "train", t)) :+ ((test, "test", test))
    }.toDF("window_for", "role", "month").orderBy("window_for", "role", "month")
  }

  /** A13 — summary()-shaped profile computed as a TYPED frame (VERDICT r3
    * item 10: the string-typed builtin summary() was rows-only; this twin is
    * oracle-checked). One scan: a single multi-column aggregate, reshaped to
    * one row per column via stack. stddev from exact decimal sum/sumsq (the
    * a9 machinery) so the value is partition-order-stable. The builtin
    * `.summary()` itself stays covered in QuerySpec. */
  private val summaryQ: Q = (s, dir) => {
    val q = col("l_quantity"); val p = col("l_extendedprice")
    def stddevOf(s1: org.apache.spark.sql.Column, s2: org.apache.spark.sql.Column) =
      round(sqrt((s2 - s1 * s1 / col("n")) / (col("n") - 1)), 4)
    Tables(s, dir).lineitem.agg(
      count(lit(1)).as("n"),
      dsum(q, 4).as("q_s1"), dsumWide(q * q).as("q_s2"),
      min(q).as("q_min"), max(q).as("q_max"),
      dsum(p, 4).as("p_s1"), dsumWide(p * p).as("p_s2"),
      min(p).as("p_min"), max(p).as("p_max"))
      .select(col("n"),
        round(col("q_s1") / col("n"), 4).as("q_mean"),
        stddevOf(col("q_s1"), col("q_s2")).as("q_std"),
        col("q_min"), col("q_max"),
        round(col("p_s1") / col("n"), 4).as("p_mean"),
        stddevOf(col("p_s1"), col("p_s2")).as("p_std"),
        col("p_min"), col("p_max"))
      .select(expr(
        """stack(2,
          |  'l_extendedprice', n, p_mean, p_std, p_min, p_max,
          |  'l_quantity',      n, q_mean, q_std, q_min, q_max)
          |AS (column_name, n, mean_v, stddev_v, min_v, max_v)""".stripMargin))
      .orderBy("column_name")
  }

  /** A18 — exact multi-column distinct counts (the HLL-sketch twin
    * `approx_count_distinct` is exercised rows-only as a19). */
  private val distinctCountsQ: Q = (s, dir) =>
    Tables(s, dir).lineitem.agg(
      count_distinct(col("l_orderkey")).as("n_orders"),
      count_distinct(col("l_partkey")).as("n_parts"),
      count_distinct(col("l_suppkey")).as("n_supps"))

  /** A19 — approx_count_distinct: the mergeable single-pass sketch used at
    * 100 TB where exact distinct would shuffle every key. TOLERANCE-GRADED
    * (VERDICT r7 item 3): emits the exact distinct counts (oracle-
    * reproducible) plus flags pinning the HLL++ estimate at rsd=0.01 to
    * within ±2% relative of exact — 2σ of the configured standard error,
    * and the sketch is deterministic per dataset so the gate is stable.
    * Exact and sketch run in the same single aggregation pass. */
  private val approxDistinctQ: Q = (s, dir) => {
    val eps = 0.02
    Tables(s, dir).lineitem.agg(
      count_distinct(col("l_orderkey")).as("n_orders_exact"),
      count_distinct(col("l_partkey")).as("n_parts_exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("__ao"),
      approx_count_distinct(col("l_partkey"), 0.01).as("__ap"))
      .select(col("n_orders_exact"), col("n_parts_exact"),
        (abs(col("__ao") - col("n_orders_exact"))
          <= lit(eps) * col("n_orders_exact")).as("orders_within_eps"),
        (abs(col("__ap") - col("n_parts_exact"))
          <= lit(eps) * col("n_parts_exact")).as("parts_within_eps"))
  }

  /** A23 — MERGEABLE distinct sketches (Datasketches HLL): per-group
    * sketches unioned into a global estimate. This is the cross-batch
    * pattern a19's one-shot approx_count_distinct can't do — at 100 TB you
    * persist one small sketch per partition/day and union them at query
    * time instead of rescanning history. TOLERANCE-GRADED (VERDICT r7
    * item 3): emits the exact distinct count (oracle-reproducible) plus
    * two pins — the merged-union estimate within ±2% of exact (lgK=12 →
    * rsd ≈ 1.6%, and the sketch is deterministic per dataset), and
    * merge-consistency: union-of-group-sketches within ±0.5% of the
    * direct whole-table sketch. NOT exact equality: the register contents
    * ARE losslessly merged at equal lgK, but Spark's union gadget runs in
    * HLL_8 and the estimate after back-conversion can differ in the last
    * digits from the direct HLL_4 sketch once past sparse mode (measured
    * 1488 vs 1492 on sf0.01's 1500 true distincts — 0.27%). */
  /** A49 — sketch set-ALGEBRA: audience overlap between two order
    * segments by HLL inclusion-exclusion, |A∩B| ≈ est(A)+est(B)−est(A∪B).
    * The 100-TB shape this stands for: per-segment sketches are built
    * once (here both in ONE pass over a per-customer rollup, via
    * null-skipping conditional `hll_sketch_agg`) and any pairwise overlap
    * is then sketch arithmetic on KB-sized states — no re-scan, no
    * distinct-join of two 100-TB segment extracts. Graded the a23 way:
    * the exact per-segment/union/intersect counts are DuckDB-reproducible
    * columns, and the sketch estimate must land within ±5% OF THE UNION
    * (inclusion-exclusion compounds three ~1.6%-rsd estimates, so the
    * honest tolerance is union-relative, not intersect-relative; measured
    * |err| ≈ 21 on a 1500-wide union at sf0.01). */
  private val hllIntersectQ: Q = (s, dir) => {
    val eps = 0.05
    val per = Tables(s, dir).orders
      .groupBy("o_custkey")
      .agg(
        max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("a"),
        max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("b"))
    per.agg(
      sum(col("a")).as("n_a"),
      sum(col("b")).as("n_b"),
      sum(greatest(col("a"), col("b"))).as("n_union"),
      sum(col("a") * col("b")).as("n_intersect"),
      hll_sketch_agg(when(col("a") === 1, col("o_custkey"))).as("sk_a"),
      hll_sketch_agg(when(col("b") === 1, col("o_custkey"))).as("sk_b"))
      .select(
        col("n_a"), col("n_b"), col("n_union"), col("n_intersect"),
        ((abs(hll_sketch_estimate(col("sk_a")) + hll_sketch_estimate(col("sk_b"))
          - hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          - col("n_intersect"))) <= lit(eps) * col("n_union"))
          .as("intersect_within_eps"))
  }

  private val hllMergeQ: Q = (s, dir) => {
    val o = Tables(s, dir).orders
    val eps = 0.02
    val mergeEps = 0.005
    val perGroup = o.groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_merged"))
    val direct = o.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("n_direct"),
      count_distinct(col("o_custkey")).as("n_exact"))
    merged.crossJoin(direct)
      .select(col("n_exact"),
        (abs(col("n_merged") - col("n_exact"))
          <= lit(eps) * col("n_exact")).as("merged_within_eps"),
        (abs(col("n_merged") - col("n_direct"))
          <= lit(mergeEps) * col("n_direct")).as("merge_consistent"))
  }

  /** A41 — mergeable Count-Min frequency sketch (the heavy-hitter /
    * frequency twin of a23's HLL distinct sketch): per-split sketches are
    * built distributed, merged driver-side — CMS merge is exact
    * cell-wise table addition, so union-of-parts must equal the one-shot
    * sketch's estimates EXACTLY (pinned as a flag, unlike the HLL case
    * where Spark's union gadget converts representations) — then probed
    * for every value of the low-cardinality key. TOLERANCE-GRADED like
    * a23: emits the exact per-key counts (oracle-reproducible) plus the
    * CMS guarantees as flags: est ≥ exact always, est ≤ exact + εN at the
    * graded ε. The key-domain collect is DOMAIN-sized (5 event types),
    * never data-sized; at 100 TB the per-day/per-partition sketches
    * persist as small binaries and this merge+probe runs on that
    * metadata, no history rescan. */
  private val cmsQ: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir).events
    val eps = 0.001
    val skAgg = count_min_sketch(col("event_type"),
      lit(eps), lit(0.99), lit(42))
    val halves = e.withColumn("__h", pmod(col("event_id"), lit(2)))
      .groupBy("__h").agg(skAgg.as("sk")).collect()
      .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
    val merged = halves.reduce { (a, b) => a.mergeInPlace(b); a }
    val direct = CountMinSketch.readFrom(e.agg(skAgg).head.getAs[Array[Byte]](0))
    val exact = e.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val total = exact.map(_._2).sum
    exact.map { case (k, n) =>
      val est = merged.estimateCount(k)
      (k, n, est >= n && est <= n + math.ceil(eps * total).toLong,
        est == direct.estimateCount(k))
    }.toDF("event_type", "n_exact", "est_within_eps", "merge_consistent")
  }

  /** A42 — contingency table through the `DataFrameStatFunctions.crosstab`
    * surface (event type × day-of-week): the second key's values pivot
    * into columns — an EDA pass's quick-look association table. Under the
    * hood this is a pivot aggregate: one keyed shuffle with map-side
    * partials, output columns bounded by the dow domain (7), so it scales
    * exactly like a plain group-by. */
  private val crosstabQ: Q = (s, dir) =>
    Tables(s, dir).events
      .select(col("event_type"), dayofweek(to_date(col("ts"))).as("dow"))
      .stat.crosstab("event_type", "dow")
      .orderBy("event_type_dow")

  /** W5 — relative-rank window family (percent_rank / cume_dist). */
  private val percentRankQ: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(asc("o_totalprice"), asc("o_orderkey"))
    Tables(s, dir).orders
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select("o_orderkey", "o_orderpriority", "pr", "cd")
      .orderBy("o_orderkey")
  }

  /** A20 — collected-set aggregate, emitted as a joined string so the
    * comparison is array-representation-agnostic. */
  private val collectSetQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_orderpriority")
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** A21 — typed Aggregator surface via functions.udaf: quantity-weighted
    * mean price per return flag. The two accumulated double sums are
    * order-dependent, but their ratio's error (~1e-10) is far below the
    * 4-decimal rounding, so the oracle hash is stable. */
  private val weightedMeanQ: Q = (s, dir) => {
    import org.apache.spark.sql.Encoders
    val wm = udaf(graft.functions.TypedAggs.WeightedMean,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(round(wm(col("l_extendedprice"), col("l_quantity")), 4).as("wmean_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** W6 — RANGE-frame rolling window: 7-day revenue over the daily series.
    * The frame key is integer days-since-epoch so Spark's numeric
    * rangeBetween and the SQL RANGE INTERVAL form agree. A global window
    * over the (small, pre-aggregated) daily series — never over the fact. */
  private val rolling7dQ: Q = (s, dir) => {
    val daily = Tables(s, dir).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(datediff(col("day"), lit("1970-01-01").cast(DateType)))
      .rangeBetween(-6, 0)
    daily.withColumn("rev7", round(sum(col("rev")).over(w), 2))
      .select(col("day"), col("rev"), col("rev7"))
      .orderBy("day")
  }

  /** A24 — Pearson correlation matrix (long form) from exact DECIMAL
    * moments: r is a pure function of 10 order-independent sums, so the
    * result is bit-deterministic across engines and partitionings — unlike
    * the streaming `corr` aggregate, whose low bits depend on merge order.
    * One scan, one partial-agg reduce to a single row; the pair rows are
    * exploded from that row without touching the driver. */
  private val correlationQ: Q = (s, dir) => {
    val (q, p, d) = (col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val m = Tables(s, dir).lineitem.agg(
      count(lit(1)).as("n"),
      dsum(q).as("sq"), dsum(p).as("sp"), dsum(d).as("sd"),
      dsumWide(q * q).as("sqq"), dsumWide(p * p).as("spp"), dsumWide(d * d).as("sdd"),
      dsumWide(q * p).as("sqp"), dsumWide(q * d).as("sqd"), dsumWide(p * d).as("spd"))
    def r(sxy: Column, sx: Column, sy: Column, sxx: Column, syy: Column) = {
      val n = col("n").cast(DoubleType)
      // NULL when either column is constant (zero variance): r is
      // undefined there, and the unguarded form diverges between engines
      // (Spark sqrt(0)/ANSI-zero-div vs DuckDB sqrt error) — same
      // degenerate-input contract as RobustStats.zscoreOutliers
      val denom2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
      round(when(denom2 > 0, (n * sxy - sx * sy) / sqrt(denom2)), 6)
    }
    m.select(col("n"), explode(array(
      struct(lit("quantity_extendedprice").as("pair"),
        r(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp")).as("r")),
      struct(lit("quantity_discount").as("pair"),
        r(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd")).as("r")),
      struct(lit("extendedprice_discount").as("pair"),
        r(col("spd"), col("sp"), col("sd"), col("spp"), col("sdd")).as("r")))).as("x"))
      .select(col("x.pair").as("pair"), col("n"), col("x.r").as("r"))
      .orderBy("pair")
  }

  /** A31 — OLS regression aggregates (slope / intercept / r²) of
    * extendedprice on quantity, from the SAME exact decimal moments as
    * [[correlationQ]] — the closed-form twin of `regr_slope`/`regr_r2`,
    * whose built-in streaming implementations carry merge-order low-bit
    * noise. One scan, one partial-agg reduce. */
  private val regressionAggQ: Q = (s, dir) => {
    val (x, y) = (col("l_quantity"), col("l_extendedprice"))
    val m = Tables(s, dir).lineitem.agg(
      count(lit(1)).as("n"),
      dsum(x).as("sx"), dsum(y).as("sy"),
      dsumWide(x * x).as("sxx"), dsumWide(y * y).as("syy"),
      dsumWide(x * y).as("sxy"))
    val n = col("n").cast(DoubleType)
    val num = n * col("sxy") - col("sx") * col("sy")
    // NULL when a column is constant (zero variance): the fit is
    // undefined and ANSI mode would raise on the zero division — the
    // shared degenerate-input contract (see a24/zscoreOutliers)
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    val slope = when(vx > 0, num / vx)
    // r² as the direct ratio (no sqrt-then-square): bit-identical to the
    // oracle's formulation, not just equal-after-rounding
    val r2 = when(vx > 0 && vy > 0, (num * num) / (vx * vy))
    m.select(col("n"), round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / n, 6).as("intercept"),
      round(r2, 6).as("r2"))
  }

  /** A32 — population skewness and excess kurtosis from the same exact
    * DECIMAL raw-moment sums ([[correlationQ]] discipline): the shape
    * profile of a numeric column, engine-deterministic where the built-in
    * `skewness`/`kurtosis` streaming aggregates carry merge-order noise. */
  private val skewKurtosisQ: Q = (s, dir) => {
    val x = col("l_quantity")
    val m = Tables(s, dir).lineitem.agg(
      count(lit(1)).as("n"), dsum(x).as("s1"),
      dsumWide(x * x).as("s2"), dsumWide(x * x * x).as("s3"),
      dsumWide(x * x * x * x).as("s4"))
    val n = col("n").cast(DoubleType)
    val m1 = col("s1") / n
    val v = col("s2") / n - m1 * m1
    // NULL shape stats for a zero-variance column (ANSI zero division /
    // pow-of-negative-epsilon guard — the a24 degenerate-input contract)
    val skew = when(v > 0, (col("s3") / n - lit(3.0) * m1 * (col("s2") / n) +
      lit(2.0) * m1 * m1 * m1) / pow(v, 1.5))
    val kurt = when(v > 0, (col("s4") / n - lit(4.0) * m1 * (col("s3") / n) +
      lit(6.0) * m1 * m1 * (col("s2") / n) -
      lit(3.0) * m1 * m1 * m1 * m1) / (v * v) - lit(3.0))
    m.select(col("n"), round(m1, 6).as("mean_v"), round(v, 6).as("variance"),
      round(skew, 6).as("skewness"), round(kurt, 6).as("excess_kurtosis"))
  }

  /** F9 — bitwise aggregate family (bit_and / bit_or / bit_xor) over the
    * line numbers per return flag: the flag-mask folding pattern of a
    * permissions/feature-bits table. */
  private val bitAggsQ: Q = (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(bit_and(col("l_linenumber")).as("b_and"),
        bit_or(col("l_linenumber")).as("b_or"),
        bit_xor(col("l_linenumber")).as("b_xor"))
      .orderBy("l_returnflag")

  /** A33 — boolean aggregate family (bool_and / bool_or + conditional
    * count) per order priority: the invariants-hold/any-violation audit
    * shape. */
  private val boolAggsQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_orderpriority")
      .agg(bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"),
        count(when(col("o_totalprice") > 200000.0, 1)).as("n_over_200k"))
      .orderBy("o_orderpriority")

  /** U5 — union by NAME with missing-column fill (`unionByName(...,
    * allowMissingColumns = true)`): the schema-evolution union — two feeds
    * with different column orders and one feed missing a column align by
    * name, absent fields NULL-filled, where positional UNION would
    * silently mis-zip. */
  private val unionByNameQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    val a = t.customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val b = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_name"), col("c_custkey")) // reordered, no acctbal
    a.unionByName(b, allowMissingColumns = true)
      .groupBy(col("c_acctbal").isNull.as("from_short_feed"))
      .agg(count(lit(1)).as("n"), count_distinct(col("c_custkey")).as("n_keys"))
      .orderBy("from_short_feed")
  }

  /** F10 — map function family: per priority build a status→count map
    * (`map_from_entries` over a collected struct list), look keys up with
    * `element_at`, and profile it (`map_keys` cardinality) — the
    * dictionary-shaped aggregate a JSON-ish report layer emits. The final
    * map never leaves the engine as an opaque blob: all outputs are plain
    * columns, so the oracle is the flat conditional-count twin. */
  private val mapFuncsQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .groupBy("o_orderpriority")
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("o_orderstatus"), col("n")))))
        .as("m"))
      .select(col("o_orderpriority"),
        size(map_keys(col("m"))).as("n_statuses"),
        coalesce(element_at(col("m"), "F"), lit(0L)).as("n_f"),
        coalesce(element_at(col("m"), "O"), lit(0L)).as("n_o"))
      .orderBy("o_orderpriority")

  /** F11 — higher-order-function family (filter / exists / forall /
    * aggregate) over each doc's token array: the lambda surface
    * [[graft.functions.GraftVocabHits]] accelerates, exercised directly. */
  private val hofFuncsQ: Q = (s, dir) => {
    val ts = col("__ts")
    Tables(s, dir).documents
      .withColumn("__ts", split(col("text"), " "))
      .select(col("doc_id"),
        size(filter(ts, t => length(t) > 4)).as("n_long"),
        exists(ts, t => t === "the").as("has_the"),
        forall(ts, t => length(t) > 1).as("all_multichar"),
        aggregate(ts, lit(0L), (acc, t) => acc + length(t)).as("char_sum"))
      .orderBy("doc_id")
  }

  /** P12 — regexp_extract_all: every digit run and every word out of the
    * priority code — the multi-match extraction primitive of a
    * log-scrubbing pass (the single-match and replace forms are covered by
    * `text_pii_scrub`/`f5`). */
  private val regexExtractAllQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .select(col("o_orderkey"),
        regexp_extract_all(col("o_orderpriority"), lit("[0-9]+"), lit(0)).as("runs"),
        regexp_extract_all(col("o_orderpriority"), lit("[A-Z]+"), lit(0)).as("words"))
      .select(col("o_orderkey"), size(col("runs")).as("n_runs"),
        array_join(col("runs"), ",").as("digit_runs"),
        array_join(col("words"), ",").as("word_runs"))
      .orderBy("o_orderkey")

  /** Q — right-to-be-forgotten erasure audit: given a deletion-request
    * list (every 100th customer here), report the order rows removed and
    * kept — the compliance accounting a GDPR/CCPA pass must emit. The
    * request list is dim-sized and broadcasts; the fact table anti-joins
    * it in one pass (the erased write itself is the same anti-join with a
    * partitioned-overwrite sink — `s5`'s mechanics). */
  private val gdprErasureQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    val requests = t.customer.filter(col("c_custkey") % 100 === 0)
      .select(col("c_custkey"))
    val flagged = t.orders.join(broadcast(requests),
      t.orders("o_custkey") === requests("c_custkey"), "left")
    flagged.agg(
      count(lit(1)).as("n_before"),
      count(when(col("c_custkey").isNotNull, 1)).as("n_removed"),
      count(when(col("c_custkey").isNull, 1)).as("n_after"))
  }

  /** A34 — percent-of-total: each priority's revenue share, the ratio of a
    * keyed aggregate to the global one. The share divides the (5-row)
    * aggregate by an unpartitioned window sum OVER THAT AGGREGATE — the
    * single-partition window runs over group-count rows, never the fact
    * table ([[graft.functions.TextOps]] prefix-sum rule). */
  private val percentOfTotalQ: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    Tables(s, dir).orders
      .groupBy("o_orderpriority")
      .agg(dsum(col("o_totalprice")).as("revenue"))
      .withColumn("share",
        round(col("revenue") / sum("revenue").over(Window.partitionBy()), 6))
      .orderBy("o_orderpriority")
  }

  /** P13 — error-safe (`try_`) function family: try_divide by a nullable
    * derived zero, try_to_number on the priority's digit prefix, try_cast
    * of a sometimes-nonnumeric string — NULL on failure instead of a
    * runtime error, the ingest-hardening mode for dirty feeds. */
  private val tryFuncsQ: Q = (s, dir) =>
    Tables(s, dir).orders
      .select(col("o_orderkey"),
        try_divide(col("o_totalprice"), (col("o_orderkey") % 3).cast(DoubleType))
          .as("div3"),
        try_to_number(substring(col("o_orderpriority"), 1, 1), lit("9"))
          .cast(LongType).as("prio_num"),
        expr("try_cast(o_orderstatus AS INT)").as("status_num"))
      .select(col("o_orderkey"), round(col("div3"), 4).as("div3"),
        col("prio_num"), col("status_num"))
      .orderBy("o_orderkey")

  /** A35 — revenue concentration: the share of total revenue held by the
    * top-10 customers — the whale-dependence KPI. One keyed aggregate to
    * per-customer revenue, one rank window OVER THAT AGGREGATE (customer
    * count ≪ fact count; single-partition is fine at any corpus scale
    * because the windowed frame is the group list, and even that can fall
    * back to TakeOrderedAndProject for the top slice), then one
    * conditional re-aggregate — no second scan of the fact table. */
  private val topShareQ: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val perCust = Tables(s, dir).orders
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("revenue"))
    perCust
      .withColumn("__rk", row_number().over(
        Window.orderBy(desc("revenue"), asc("o_custkey"))))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(when(col("__rk") <= 10, col("revenue")).otherwise(0.0)), 2)
          .as("top10_revenue"),
        round(sum(col("revenue")), 2).as("total_revenue"),
        round(sum(when(col("__rk") <= 10, col("revenue")).otherwise(0.0))
          / sum(col("revenue")), 6).as("top10_share"))
  }

  /** A36 — Gini coefficient of customer revenue: the inequality measure of
    * the [[topShareQ]] concentration story, via the rank formulation
    * G = (2·Σ i·x_(i)) / (n·Σx) − (n+1)/n over revenues sorted ascending.
    * Same altitude as a35: the rank window runs over the per-customer
    * aggregate, never the fact table; the weighted sum is DECIMAL so the
    * result is partitioning-independent. */
  private val giniQ: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val perCust = Tables(s, dir).orders
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val n = col("n").cast(DoubleType)
    perCust
      .withColumn("__i", row_number().over(
        Window.orderBy(asc("revenue"), asc("o_custkey"))))
      .agg(count(lit(1)).as("n"),
        dsumWide(col("__i") * col("revenue")).as("iw"),
        dsum(col("revenue")).as("tot"))
      .select(col("n"),
        round(lit(2.0) * col("iw") / (n * col("tot")) - (n + 1.0) / n, 6)
          .as("gini"))
  }

  /** A25 — deterministic grouped mode: most frequent status per priority,
    * ties broken toward the smallest value (engine built-in `mode()`s
    * break ties arbitrarily, so the rank formulation IS the operator).
    * One keyed count + a WindowGroupLimit-able rank — no global sort. */
  private val modeQ: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(s, dir).orders
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
    counts.withColumn("__rk", row_number().over(
      Window.partitionBy("o_orderpriority")
        .orderBy(desc("n"), asc("o_orderstatus"))))
      .filter(col("__rk") === 1)
      .select(col("o_orderpriority"), col("o_orderstatus").as("mode_status"),
        col("n").as("mode_n"))
      .orderBy("o_orderpriority")
  }

  /** A26 — fixed-width histogram of extendedprice: 24 bins of 5000 with an
    * overflow bin. Single keyed count agg; the bin id is a per-row codegen
    * expression, so the histogram of 100 TB is one map-side-combining pass. */
  private val histogramQ: Q = (s, dir) =>
    Tables(s, dir).lineitem
      .withColumn("bin", least(floor(col("l_extendedprice") / 5000), lit(23.0))
        .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("mass"))
      .orderBy("bin")

  val entries: Map[String, Q] = Map(
    "a24_correlation" -> correlationQ,
    "a31_regression_agg" -> regressionAggQ,
    "a32_skew_kurtosis" -> skewKurtosisQ,
    "a33_bool_aggs" -> boolAggsQ,
    "f9_bit_aggs" -> bitAggsQ,
    "f10_map_funcs" -> mapFuncsQ,
    "f11_hof_funcs" -> hofFuncsQ,
    "p12_regex_extract_all" -> regexExtractAllQ,
    "u5_union_by_name" -> unionByNameQ,
    "q_gdpr_erasure" -> gdprErasureQ,
    "a34_percent_of_total" -> percentOfTotalQ,
    "a35_top_share" -> topShareQ,
    "a36_gini" -> giniQ,
    "p13_try_funcs" -> tryFuncsQ,
    "a25_mode" -> modeQ,
    "a26_histogram" -> histogramQ,
    "a21_weighted_mean" -> weightedMeanQ,
    "w6_rolling_7d" -> rolling7dQ,
    "w5_percent_rank" -> percentRankQ,
    "a20_collect_set" -> collectSetQ,
    "a18_count_distinct" -> distinctCountsQ,
    "a19_approx_distinct" -> approxDistinctQ,
    "a23_hll_mergeable" -> hllMergeQ,   // tolerance-graded vs exact (r8)
    "a49_hll_intersect" -> hllIntersectQ, // sketch set-algebra, union-relative tolerance
    "a41_cms_frequency" -> cmsQ,        // tolerance-graded vs exact
    "a42_crosstab" -> crosstabQ,
    "s7_sql_views" -> sqlViewsQ,
    "pipeline_clean_ingest" -> cleanIngestQ,
    "pipeline_dag_run" -> dagRunQ,
    "a16_rollup" -> rollupQ,
    "a17_pivot" -> pivotQ,
    "a22_cube" -> cubeQ,
    "a28_grouping_sets" -> groupingSetsQ,
    "a30_date_spine_fill" -> dateSpineFillQ,
    "j11_full_outer" -> fullOuterQ,
    "q_exists_subquery" -> existsSubqueryQ,
    "q_recursive_cte" -> recursiveCteQ,
    "q_lateral_join" -> lateralJoinQ,
    "t4_top_errors_labeled" -> topErrorsQ,
    "ml_sliding_window" -> slidingWindowQ,
    "a13_summary_builtin" -> summaryQ,
  )

  val oracles: Map[String, String] = Map(
    // pure month arithmetic (r9): DuckDB re-derives the train/test window
    // rows exactly, year wraps included
    "ml_sliding_window" ->
      """WITH m(window_for) AS (VALUES ('2023-02'), ('2024-01'), ('2024-12')),
        |t AS (
        |  SELECT window_for, 'train' AS role,
        |         strftime(CAST(window_for || '-01' AS DATE)
        |                  - k * INTERVAL 1 MONTH, '%Y-%m') AS month
        |  FROM m, unnest([3, 2, 1]) AS u(k)
        |  UNION ALL
        |  SELECT window_for, 'test', window_for FROM m)
        |SELECT window_for, role, month FROM t
        |ORDER BY window_for, role, month""".stripMargin,
    "a32_skew_kurtosis" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s3,
        |    CAST(sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s4
        |  FROM lineitem),
        |d AS (SELECT n, s1 / n AS m1, s2 / n - (s1 / n) * (s1 / n) AS v,
        |             s2, s3, s4 FROM m)
        |SELECT n, round(m1, 6) AS mean_v, round(v, 6) AS variance,
        |  round(CASE WHEN v > 0
        |    THEN (s3 / n - 3.0 * m1 * (s2 / n) + 2.0 * m1 * m1 * m1)
        |         / pow(v, 1.5) END, 6) AS skewness,
        |  round(CASE WHEN v > 0
        |    THEN (s4 / n - 4.0 * m1 * (s3 / n) + 6.0 * m1 * m1 * (s2 / n)
        |          - 3.0 * m1 * m1 * m1 * m1) / (v * v) - 3.0 END, 6)
        |    AS excess_kurtosis
        |FROM d""".stripMargin,
    "a33_bool_aggs" ->
      """SELECT o_orderpriority,
        |       bool_and(o_totalprice > 1000.0) AS all_over_1k,
        |       bool_or(o_totalprice > 400000.0) AS any_over_400k,
        |       count(CASE WHEN o_totalprice > 200000.0 THEN 1 END) AS n_over_200k
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "f9_bit_aggs" ->
      """SELECT l_returnflag,
        |       CAST(bit_and(l_linenumber) AS INT) AS b_and,
        |       CAST(bit_or(l_linenumber) AS INT) AS b_or,
        |       CAST(bit_xor(l_linenumber) AS INT) AS b_xor
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "f10_map_funcs" ->
      """SELECT o_orderpriority,
        |       CAST(count(DISTINCT o_orderstatus) AS INT) AS n_statuses,
        |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "f11_hof_funcs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        |SELECT doc_id,
        |       CAST(len(list_filter(ts, t -> length(t) > 4)) AS INT) AS n_long,
        |       len(list_filter(ts, t -> t = 'the')) > 0 AS has_the,
        |       len(list_filter(ts, t -> NOT length(t) > 1)) = 0 AS all_multichar,
        |       CAST(list_sum(list_transform(ts, t -> length(t))) AS BIGINT) AS char_sum
        |FROM t ORDER BY doc_id""".stripMargin,
    "p12_regex_extract_all" ->
      """SELECT o_orderkey,
        |       CAST(len(regexp_extract_all(o_orderpriority, '[0-9]+')) AS INT)
        |         AS n_runs,
        |       array_to_string(regexp_extract_all(o_orderpriority, '[0-9]+'), ',')
        |         AS digit_runs,
        |       array_to_string(regexp_extract_all(o_orderpriority, '[A-Z]+'), ',')
        |         AS word_runs
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_gdpr_erasure" ->
      """WITH req AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0)
        |SELECT count(*) AS n_before,
        |       count(CASE WHEN req.c_custkey IS NOT NULL THEN 1 END)
        |         AS n_removed,
        |       count(CASE WHEN req.c_custkey IS NULL THEN 1 END) AS n_after
        |FROM orders LEFT JOIN req ON o_custkey = req.c_custkey""".stripMargin,
    "a36_gini" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT revenue,
        |         row_number() OVER (ORDER BY revenue ASC, o_custkey ASC) AS i
        |  FROM pc)
        |SELECT count(*) AS n,
        |       round(2.0 * CAST(sum(CAST(i * revenue AS DECIMAL(30,6)))
        |                        AS DOUBLE)
        |             / (count(*) * CAST(sum(CAST(revenue AS DECIMAL(18,2)))
        |                                AS DOUBLE))
        |             - (count(*) + 1.0) / count(*), 6) AS gini
        |FROM r""".stripMargin,
    "a35_top_share" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT revenue,
        |         row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rk
        |  FROM pc)
        |SELECT count(*) AS n_customers,
        |       round(sum(CASE WHEN rk <= 10 THEN revenue ELSE 0.0 END), 2)
        |         AS top10_revenue,
        |       round(sum(revenue), 2) AS total_revenue,
        |       round(sum(CASE WHEN rk <= 10 THEN revenue ELSE 0.0 END)
        |             / sum(revenue), 6) AS top10_share
        |FROM r""".stripMargin,
    "a34_percent_of_total" ->
      """WITH g AS (
        |  SELECT o_orderpriority,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, revenue,
        |       round(revenue / sum(revenue) OVER (), 6) AS share
        |FROM g ORDER BY o_orderpriority""".stripMargin,
    "p13_try_funcs" ->
      """SELECT o_orderkey,
        |       round(o_totalprice / nullif(o_orderkey % 3, 0), 4) AS div3,
        |       CAST(TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS BIGINT)
        |         AS prio_num,
        |       TRY_CAST(o_orderstatus AS INT) AS status_num
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "u5_union_by_name" ->
      """WITH u AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_name, NULL AS c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |SELECT c_acctbal IS NULL AS from_short_feed, count(*) AS n,
        |       count(DISTINCT c_custkey) AS n_keys
        |FROM u GROUP BY 1 ORDER BY from_short_feed""".stripMargin,
    "a31_regression_agg" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sxy
        |  FROM lineitem)
        |SELECT n,
        |  round(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
        |  round((sy - CASE WHEN n * sxx - sx * sx > 0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END * sx) / n, 6)
        |    AS intercept,
        |  round(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |    THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
        |FROM m""".stripMargin,
    "a24_correlation" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sqq,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS spp,
        |    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sdd,
        |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sqp,
        |    CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sqd,
        |    CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS spd
        |  FROM lineitem)
        |SELECT pair, n, r FROM (
        |  SELECT 'quantity_extendedprice' AS pair, n,
        |         round(CASE WHEN (n*sqq - sq*sq) * (n*spp - sp*sp) > 0
        |           THEN (n*sqp - sq*sp) / sqrt((n*sqq - sq*sq) * (n*spp - sp*sp)) END, 6) AS r
        |  FROM m
        |  UNION ALL
        |  SELECT 'quantity_discount', n,
        |         round(CASE WHEN (n*sqq - sq*sq) * (n*sdd - sd*sd) > 0
        |           THEN (n*sqd - sq*sd) / sqrt((n*sqq - sq*sq) * (n*sdd - sd*sd)) END, 6)
        |  FROM m
        |  UNION ALL
        |  SELECT 'extendedprice_discount', n,
        |         round(CASE WHEN (n*spp - sp*sp) * (n*sdd - sd*sd) > 0
        |           THEN (n*spd - sp*sd) / sqrt((n*spp - sp*sp) * (n*sdd - sd*sd)) END, 6)
        |  FROM m)
        |ORDER BY pair""".stripMargin,
    "a25_mode" ->
      """WITH c AS (
        |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |            ORDER BY n DESC, o_orderstatus) AS rk
        |  FROM c)
        |SELECT o_orderpriority, o_orderstatus AS mode_status, n AS mode_n
        |FROM r WHERE rk = 1 ORDER BY o_orderpriority""".stripMargin,
    "a26_histogram" ->
      """SELECT CAST(least(floor(l_extendedprice / 5000), 23) AS BIGINT) AS bin,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
        |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin,
    "a21_weighted_mean" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "w6_rolling_7d" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT day, rev,
        |       round(sum(rev) OVER (
        |         ORDER BY date_diff('day', DATE '1970-01-01', day)
        |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev7
        |FROM daily ORDER BY day""".stripMargin,
    "w5_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        |       round(percent_rank() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice, o_orderkey), 6) AS pr,
        |       round(cume_dist() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice, o_orderkey), 6) AS cd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "a20_collect_set" ->
      """SELECT o_orderpriority,
        |       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |       count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "a18_count_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin,
    // tolerance-graded sketches (VERDICT r7 item 3): the oracle reproduces
    // the exact answers and expects every within-bound flag to hold
    "a19_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders_exact,
        |       count(DISTINCT l_partkey) AS n_parts_exact,
        |       TRUE AS orders_within_eps,
        |       TRUE AS parts_within_eps
        |FROM lineitem""".stripMargin,
    "a23_hll_mergeable" ->
      """SELECT count(DISTINCT o_custkey) AS n_exact,
        |       TRUE AS merged_within_eps,
        |       TRUE AS merge_consistent
        |FROM orders""".stripMargin,
    "a49_hll_intersect" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS a,
        |         max(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS b
        |  FROM orders GROUP BY 1)
        |SELECT CAST(sum(a) AS BIGINT) AS n_a,
        |       CAST(sum(b) AS BIGINT) AS n_b,
        |       CAST(sum(CASE WHEN a = 1 OR b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
        |       CAST(sum(a * b) AS BIGINT) AS n_intersect,
        |       TRUE AS intersect_within_eps
        |FROM per""".stripMargin,
    "a41_cms_frequency" ->
      """SELECT event_type, count(*) AS n_exact,
        |       TRUE AS est_within_eps,
        |       TRUE AS merge_consistent
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // Spark dayofweek = DuckDB dayofweek()+1 (Sunday-first 1..7)
    "a42_crosstab" -> {
      val dows = (1 to 7).map(d =>
        s"""CAST(sum(CASE WHEN dayofweek(CAST(ts AS DATE)) + 1 = $d THEN 1 ELSE 0 END) AS BIGINT) AS "$d"""")
        .mkString(",\n       ")
      s"""SELECT event_type AS event_type_dow,
         |       $dows
         |FROM events GROUP BY 1 ORDER BY event_type_dow""".stripMargin
    },
    "s7_sql_views" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "pipeline_dag_run" ->
      """WITH raw AS (SELECT count(*) AS n FROM events),
        |rm AS (SELECT count(*) AS n,
        |              count(DISTINCT CAST(ts AS DATE)) AS days
        |       FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        |         AND ts <  TIMESTAMP '2024-02-01 00:00:00'),
        |cl AS (SELECT count(*) AS n,
        |              count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |                AS total_value
        |       FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        |         AND ts <  TIMESTAMP '2024-02-01 00:00:00'
        |         AND ts IS NOT NULL AND event_type IS NOT NULL
        |         AND value IS NOT NULL AND value >= 0),
        |mlf AS (SELECT count(*) AS n FROM lineitem
        |        WHERE l_quantity > 0 AND l_extendedprice >= 0
        |          AND l_shipdate IS NOT NULL),
        |r AS (SELECT round(cl.n * 1.0 / rm.n, 6) AS retention FROM cl, rm)
        |SELECT * FROM (
        |  SELECT '1_availability' AS task,
        |         CASE WHEN n > 0 THEN 'RUN' ELSE 'SKIP' END AS status,
        |         n AS n_rows, CAST(NULL AS DOUBLE) AS metric FROM raw
        |  UNION ALL
        |  SELECT '2_clean_month',
        |         CASE WHEN retention < 0.8 THEN 'FAIL'
        |              WHEN retention < 0.9 THEN 'WARN'
        |              ELSE 'PASS' END,
        |         cl.n, retention FROM cl, r
        |  UNION ALL
        |  SELECT '3_staging_floor',
        |         CASE WHEN n >= 1000 THEN 'PASS' ELSE 'FAIL' END,
        |         n, CAST(NULL AS DOUBLE) FROM cl
        |  UNION ALL
        |  SELECT '4_warehouse_days',
        |         CASE WHEN cl.n_days = rm.days THEN 'PASS' ELSE 'FAIL' END,
        |         cl.n_days, CAST(NULL AS DOUBLE) FROM cl, rm
        |  UNION ALL
        |  SELECT '5_dashboard_kpi', 'OK', n, total_value FROM cl
        |  UNION ALL
        |  SELECT '6_ml_features',
        |         CASE WHEN n >= 1000 THEN 'PASS' ELSE 'FAIL' END,
        |         n, CAST(NULL AS DOUBLE) FROM mlf
        |) ORDER BY task""".stripMargin,
    "pipeline_clean_ingest" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       count(DISTINCT CAST(ts AS DATE)) AS n_days
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        |  AND ts <  TIMESTAMP '2024-02-01 00:00:00'
        |  AND ts IS NOT NULL AND event_type IS NOT NULL
        |  AND value IS NOT NULL AND value >= 0""".stripMargin,
    "a16_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (1, 2)
        |ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "a17_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "a22_cube" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (1, 2)
        |ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "a28_grouping_sets" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY GROUPING SETS ((1), (2), ())
        |ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "a30_date_spine_fill" ->
      """WITH b AS (
        |  SELECT min(o_orderdate) AS mn, max(o_orderdate) AS mx FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM b),
        |daily AS (
        |  SELECT o_orderdate AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT spine.d, coalesce(daily.revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN daily USING (d) ORDER BY d""".stripMargin,
    "q_recursive_cte" ->
      """WITH RECURSIVE b AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS mn,
        |         date_trunc('month', max(o_orderdate)) AS mx
        |  FROM orders),
        |months(m, mx) AS (
        |  SELECT mn, mx FROM b
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx)
        |SELECT months.m AS month, count(o.o_orderkey) AS n
        |FROM months LEFT JOIN orders o
        |  ON date_trunc('month', o.o_orderdate) = months.m
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "q_lateral_join" ->
      """SELECT seg.c_mktsegment, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) seg,
        |LATERAL (
        |  SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders o JOIN customer cc ON o.o_custkey = cc.c_custkey
        |  WHERE cc.c_mktsegment = seg.c_mktsegment
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
        |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin,
    "j11_full_outer" ->
      """WITH c AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT count(CASE WHEN c.c_custkey IS NOT NULL
        |                   AND o.o_custkey IS NOT NULL THEN 1 END) AS n_both,
        |       count(CASE WHEN o.o_custkey IS NULL THEN 1 END) AS n_cust_only,
        |       count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_ord_only
        |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey""".stripMargin,
    "q_exists_subquery" ->
      """SELECT c_mktsegment,
        |       count(CASE WHEN EXISTS (
        |         SELECT 1 FROM orders
        |         WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |         THEN 1 END) AS n_with_urgent,
        |       count(CASE WHEN NOT EXISTS (
        |         SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |         THEN 1 END) AS n_never_ordered
        |FROM customer
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "a13_summary_builtin" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS q_s1,
        |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS q_s2,
        |         min(l_quantity) AS q_min, max(l_quantity) AS q_max,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS p_s1,
        |         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS p_s2,
        |         min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max
        |  FROM lineitem)
        |SELECT 'l_extendedprice' AS column_name, n,
        |       round(p_s1 / n, 4) AS mean_v,
        |       round(sqrt((p_s2 - p_s1 * p_s1 / n) / (n - 1)), 4) AS stddev_v,
        |       p_min AS min_v, p_max AS max_v
        |FROM a
        |UNION ALL
        |SELECT 'l_quantity' AS column_name, n,
        |       round(q_s1 / n, 4) AS mean_v,
        |       round(sqrt((q_s2 - q_s1 * q_s1 / n) / (n - 1)), 4) AS stddev_v,
        |       q_min AS min_v, q_max AS max_v
        |FROM a
        |ORDER BY column_name""".stripMargin,
    "t4_top_errors_labeled" ->
      """WITH e AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |         round(abs(l_extendedprice - (l_quantity * 1000.0 + 500.0)), 4) AS abs_err
        |  FROM lineitem),
        |top AS (
        |  SELECT * FROM e
        |  ORDER BY abs_err DESC, l_orderkey, l_linenumber LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY abs_err DESC, l_orderkey, l_linenumber) AS INT) AS rank,
        |       l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber, abs_err,
        |       CASE WHEN l_quantity >= 40 THEN 'high_quantity'
        |            WHEN l_discount >= 0.08 THEN 'high_discount'
        |            ELSE 'unmodeled' END AS likely_cause
        |FROM top ORDER BY rank""".stripMargin,
  )
}
