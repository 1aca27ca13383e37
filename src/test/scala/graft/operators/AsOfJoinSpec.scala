package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks latest right row at-or-before each left row, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 11:00:00"), 200.0),
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")), // before any quote -> null
      (11L, 1L, ts("2024-01-01 10:00:00")), // equal ts -> inclusive match 100
      (12L, 1L, ts("2024-01-01 11:59:59")), // between -> 100
      (13L, 1L, ts("2024-01-01 13:00:00")), // after both -> 120
      (14L, 2L, ts("2024-01-01 12:00:00")), // other key -> 200
      (15L, 3L, ts("2024-01-01 12:00:00")), // key with no quotes -> null
    ).toDF("trade_id", "user_id", "ts")
    val got = AsOfJoin.asOfBackward(trades, quotes, "user_id", "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      10L -> None, 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(120.0), 14L -> Some(200.0), 15L -> None))
  }

  test("a NULL-valued right row is a real match, not skipped (ADVICE r3)") {
    // quote at 11:00 has px=NULL: a trade at 11:30 must see that NULL, not
    // carry the older 100.0 forward (DuckDB ASOF semantics)
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double]),
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (20L, 1L, ts("2024-01-01 10:30:00")), // -> 100.0
      (21L, 1L, ts("2024-01-01 11:30:00")), // -> NULL (matched, value null)
    ).toDF("trade_id", "user_id", "ts")
    val got = AsOfJoin.asOfBackward(trades, quotes, "user_id", "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(20L -> Some(100.0), 21L -> None))
  }

  test("tier-c native exec agrees with the composed form (incl. NULL values)") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double]),
      (1L, ts("2024-01-01 12:00:00"), Some(120.0)),
      (2L, ts("2024-01-01 11:00:00"), Some(200.0)),
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")), // before any quote -> null
      (11L, 1L, ts("2024-01-01 10:00:00")), // equal ts inclusive -> 100
      (12L, 1L, ts("2024-01-01 11:30:00")), // -> NULL-valued quote, matched
      (13L, 1L, ts("2024-01-01 13:00:00")), // -> 120
      (14L, 2L, ts("2024-01-01 12:00:00")), // other key -> 200
      (15L, 3L, ts("2024-01-01 12:00:00")), // no quotes for key -> null
    ).toDF("trade_id", "user_id", "ts")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("trade_id", "px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val composed = res(AsOfJoin.asOfBackward(trades, quotes, "user_id", "ts", Seq("px")))
    val native = res(AsOfJoin.asOfBackwardNative(trades, quotes, "user_id", "ts", Seq("px")))
    assert(native === composed)
    assert(native(11L) === Some(100.0))
    assert(native(12L) === None) // matched row with NULL value, not carried-forward 100
    assert(native(15L) === None)
  }

  test("forward as-of picks earliest right row at-or-after, composed == native") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double]),
      (1L, ts("2024-01-01 12:00:00"), Some(120.0)),
      (2L, ts("2024-01-01 11:00:00"), Some(200.0)),
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")), // -> earliest future = 100
      (11L, 1L, ts("2024-01-01 11:00:00")), // equal ts inclusive -> NULL-valued match
      (12L, 1L, ts("2024-01-01 11:30:00")), // -> 120
      (13L, 1L, ts("2024-01-01 13:00:00")), // nothing after -> null
      (14L, 2L, ts("2024-01-01 10:00:00")), // other key -> 200
      (15L, 3L, ts("2024-01-01 10:00:00")), // no quotes for key -> null
    ).toDF("trade_id", "user_id", "ts")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("trade_id", "px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val expected = Map(
      10L -> Some(100.0), 11L -> None, 12L -> Some(120.0),
      13L -> None, 14L -> Some(200.0), 15L -> None)
    assert(res(AsOfJoin.asOfForward(trades, quotes, "user_id", "ts", Seq("px"))) === expected)
    assert(res(AsOfJoin.asOfForwardNative(trades, quotes, "user_id", "ts", Seq("px"))) === expected)
  }

  test("forward native matches composed on the events feed (self-as-of, real data)") {
    val ev = graft.Tables(spark, sf001).events
    val views = ev.filter($"event_type" === "view").select("event_id", "user_id", "ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value".as("nxt"))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "nxt").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val composed = res(AsOfJoin.asOfForward(views, purchases, "user_id", "ts", Seq("nxt")))
    val native = res(AsOfJoin.asOfForwardNative(views, purchases, "user_id", "ts", Seq("nxt")))
    assert(native.nonEmpty && native === composed)
  }

  test("native exec handles string keys (UTF8String buffer reuse) and multi-value carry") {
    // many interleaved string keys per partition force the exec to hold a
    // matched key across right-row advances — a stale UTF8String reference
    // into the reused row buffer would corrupt the comparison
    val syms = ('a' to 'z').map(_.toString)
    val quotes = syms.zipWithIndex.flatMap { case (s, i) =>
      (0 until 5).map(j => (s, ts(f"2024-01-01 ${8 + j}%02d:00:00"), i * 10.0 + j, j.toLong))
    }.toDF("sym", "ts", "px", "seq")
    val trades = syms.zipWithIndex.map { case (s, i) =>
      (i.toLong, s, ts("2024-01-01 10:30:00")) // latest quote at 10:00 -> j=2
    }.toDF("trade_id", "sym", "ts")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("trade_id", "px", "seq").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    val composed = res(AsOfJoin.asOfBackward(trades, quotes, "sym", "ts", Seq("px", "seq")))
    val native = res(AsOfJoin.asOfBackwardNative(trades, quotes, "sym", "ts", Seq("px", "seq")))
    assert(native === composed)
    assert(native.forall(_._3 === 2L), "every trade must see the 10:00 quote (j=2)")
  }

  test("native exec returns NULL (not 0) for unmatched rows with non-nullable value columns") {
    // Seq(...).toDF produces NON-nullable px/seq; an unmatched left row must
    // still read NULL — a projection bound against the raw nullability
    // would unbox the null pad to 0.0/0L instead
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 100.0, 7L))
      .toDF("user_id", "ts", "px", "seq")
    assert(!quotes.schema("px").nullable, "precondition: non-nullable value column")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 11:00:00")), // matched -> 100.0, 7
      (11L, 2L, ts("2024-01-01 11:00:00")), // no quotes for key -> NULL, NULL
    ).toDF("trade_id", "user_id", "ts")
    val got = AsOfJoin.asOfBackwardNative(trades, quotes, "user_id", "ts", Seq("px", "seq"))
      .select("trade_id", "px", "seq").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (10L, Some(100.0), Some(7L)),
      (11L, None, None)))
  }

  test("native as-of over bucketed tables plans with no exchange on the key") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    val ev = graft.Tables(spark2, sf001).events
    val wh = spark2.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("views_bkt", "purch_bkt").foreach { tbl =>
      spark2.sql(s"DROP TABLE IF EXISTS $tbl")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, tbl))
    }
    ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts").coalesce(1)
      .write.bucketBy(4, "user_id").sortBy("user_id", "ts").saveAsTable("views_bkt")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("last_purchase")).coalesce(1)
      .write.bucketBy(4, "user_id").sortBy("user_id", "ts").saveAsTable("purch_bkt")
    val native = AsOfJoin.asOfBackwardNative(
      spark2.table("views_bkt"), spark2.table("purch_bkt"),
      "user_id", "ts", Seq("last_purchase"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
    // the write-once/join-many claim: bucketed scans satisfy the exec's
    // required distribution, so EnsureRequirements inserts NO shuffle
    assert(!plan.contains("Exchange hashpartitioning(user_id"),
      s"bucketed inputs must not be re-shuffled:\n${plan.take(1200)}")
    // and the result matches the composed form on the same data
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "last_purchase").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1).toSeq
    val composed = res(AsOfJoin.asOfBackward(
      ev.filter(col("event_type") === "view").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("last_purchase")),
      "user_id", "ts", Seq("last_purchase")))
    assert(res(native) === composed)
  }

  test("broadcast as-of matches composed and never shuffles or sorts the left side") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double]),
      (1L, ts("2024-01-01 12:00:00"), Some(120.0)),
      (2L, ts("2024-01-01 11:00:00"), Some(200.0)),
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")),
      (11L, 1L, ts("2024-01-01 10:00:00")),
      (12L, 1L, ts("2024-01-01 11:30:00")), // NULL-valued quote, still a match
      (13L, 1L, ts("2024-01-01 13:00:00")),
      (14L, 2L, ts("2024-01-01 12:00:00")),
      (15L, 3L, ts("2024-01-01 12:00:00")),
    ).toDF("trade_id", "user_id", "ts")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("trade_id", "px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val composed = res(AsOfJoin.asOfBackward(trades, quotes, "user_id", "ts", Seq("px")))
    val bcast = AsOfJoin.asOfBackwardBroadcast(trades, quotes, "user_id", "ts", Seq("px"))
    assert(res(bcast) === composed)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan.take(600))
    assert(plan.contains("BroadcastExchange"), "right side must broadcast")
    // the 100-TB claim: no shuffle, no sort anywhere on the left branch
    assert(!plan.contains("Exchange hashpartitioning"),
      s"left side must not shuffle:\n${plan.take(1200)}")
    assert(!plan.contains("Sort "), s"left side must not sort:\n${plan.take(1200)}")
    // forward twin through the same exec
    val fwd = res(AsOfJoin.asOfForwardBroadcast(trades, quotes, "user_id", "ts", Seq("px")))
    assert(fwd === res(AsOfJoin.asOfForward(trades, quotes, "user_id", "ts", Seq("px"))))
  }

  test("multi-key as-of matches within the composite (sym, venue) group only") {
    val quotes = Seq(
      ("A", "X", ts("2024-01-01 10:00:00"), 100.0),
      ("A", "Y", ts("2024-01-01 10:30:00"), 105.0), // same sym, other venue
      ("B", "X", ts("2024-01-01 10:00:00"), 200.0),
    ).toDF("sym", "venue", "ts", "px")
    val trades = Seq(
      (1L, "A", "X", ts("2024-01-01 11:00:00")), // -> 100 (A/Y's 105 must NOT leak)
      (2L, "A", "Y", ts("2024-01-01 11:00:00")), // -> 105
      (3L, "B", "Y", ts("2024-01-01 11:00:00")), // B/Y has no quotes -> null
    ).toDF("trade_id", "sym", "venue", "ts")
    val got = AsOfJoin.asOfBackwardBy(trades, quotes, Seq("sym", "venue"), "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> Some(100.0), 2L -> Some(105.0), 3L -> None))
    // forward twin + tolerance compose with composite keys too
    val fwd = AsOfJoin.asOfForwardBy(trades, quotes, Seq("sym", "venue"), "ts", Seq("px"),
      tolerance = Some(3600L * 1000000))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fwd === Map(1L -> None, 2L -> None, 3L -> None)) // nothing at-or-after
  }

  test("tolerance bounds the match gap identically in composed, native and broadcast paths") {
    val hourMicros = 3600L * 1000000
    val quotes = Seq(
      (1L, ts("2024-01-01 06:00:00"), 60.0),  // stale for the 10:30 trade (4.5 h)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (2L, ts("2024-01-01 00:00:00"), 200.0), // stale for the 11:00 trade (11 h)
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // 10:00 quote, gap 30 min -> 100
      (11L, 1L, ts("2024-01-01 13:00:00")), // 10:00 quote, gap 3 h -> out of 2 h tol
      (12L, 2L, ts("2024-01-01 11:00:00")), // 00:00 quote, gap 11 h -> null
      (13L, 3L, ts("2024-01-01 11:00:00")), // no quotes -> null
    ).toDF("trade_id", "user_id", "ts")
    val tol = Some(2 * hourMicros)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("trade_id", "px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val expected = Map(10L -> Some(100.0), 11L -> None, 12L -> None, 13L -> None)
    assert(res(AsOfJoin.asOfBackward(trades, quotes, "user_id", "ts", Seq("px"), tol)) === expected)
    assert(res(AsOfJoin.asOfBackwardNative(trades, quotes, "user_id", "ts", Seq("px"), tol)) === expected)
    assert(res(AsOfJoin.asOfBackwardBroadcast(trades, quotes, "user_id", "ts", Seq("px"), tol)) === expected)
    // forward twin: next quote within 2 h
    val fwdExpected = Map(
      10L -> None,           // no future quote for key 1 after 10:30
      11L -> None, 12L -> None, 13L -> None)
    assert(res(AsOfJoin.asOfForward(trades, quotes, "user_id", "ts", Seq("px"), tol)) === fwdExpected)
    assert(res(AsOfJoin.asOfForwardNative(trades, quotes, "user_id", "ts", Seq("px"), tol)) === fwdExpected)
    // and with no tolerance the stale rows come back (sanity contrast)
    val untol = res(AsOfJoin.asOfBackward(trades, quotes, "user_id", "ts", Seq("px")))
    assert(untol === Map(10L -> Some(100.0), 11L -> Some(100.0),
      12L -> Some(200.0), 13L -> None))
  }

  test("broadcast hint on a binary key falls back to sort-merge and stays correct (ADVICE r5)") {
    // Array[Byte] has reference equality: the broadcast HashMap lookup would
    // miss every probe and emit all-NULL matches. The strategy must route
    // the hint to the sort-merge exec (interpreted ordering) instead.
    val quotes = Seq(
      (Array[Byte](1), ts("2024-01-01 10:00:00"), 100.0),
      (Array[Byte](1), ts("2024-01-01 12:00:00"), 120.0),
      (Array[Byte](2), ts("2024-01-01 11:00:00"), 200.0),
    ).toDF("k", "ts", "px")
    val trades = Seq(
      (10L, Array[Byte](1), ts("2024-01-01 11:00:00")), // -> 100
      (11L, Array[Byte](2), ts("2024-01-01 12:00:00")), // -> 200
      (12L, Array[Byte](3), ts("2024-01-01 12:00:00")), // no quotes -> null
    ).toDF("trade_id", "k", "ts")
    val bcast = AsOfJoin.asOfBackwardBroadcast(trades, quotes, "k", "ts", Seq("px"))
    val plan = bcast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastAsOfJoin"),
      s"binary key must not take the broadcast path:\n${plan.take(600)}")
    assert(plan.contains("AsOfJoin"), plan.take(600))
    val got = bcast.select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(10L -> Some(100.0), 11L -> Some(200.0), 12L -> None))
  }

  test("nearest as-of picks the smaller absolute gap; ties prefer at-or-before") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 11:00:00"), 200.0),
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")), // before any -> forward 100
      (11L, 1L, ts("2024-01-01 10:00:00")), // equal ts -> gap 0, 100
      (12L, 1L, ts("2024-01-01 10:30:00")), // 30m back vs 90m fwd -> 100
      (13L, 1L, ts("2024-01-01 11:00:00")), // exact tie 60m/60m -> backward 100
      (14L, 1L, ts("2024-01-01 11:30:00")), // 90m back vs 30m fwd -> 120
      (15L, 1L, ts("2024-01-01 13:00:00")), // after all -> backward 120
      (16L, 3L, ts("2024-01-01 12:00:00")), // key with no quotes -> null
    ).toDF("trade_id", "user_id", "ts")
    val near = AsOfJoin.asOfNearest(trades, quotes, "user_id", "ts", Seq("px"))
    val got = near.select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      10L -> Some(100.0), 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(100.0), 14L -> Some(120.0), 15L -> Some(120.0), 16L -> None))
    // both carries ride the same partitioning/ordering: ONE hash exchange,
    // not one per direction
    val plan = near.queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nShuffles == 1, s"expected 1 shuffle, got $nShuffles:\n${plan.take(800)}")
  }

  test("nearest as-of with tolerance nulls matches beyond the gap, both directions") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 100.0)).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // 30m back, inside 1h -> 100
      (11L, 1L, ts("2024-01-01 09:30:00")), // 30m fwd, inside -> 100
      (12L, 1L, ts("2024-01-01 12:00:00")), // 2h back, outside -> null
      (13L, 1L, ts("2024-01-01 08:00:00")), // 2h fwd, outside -> null
    ).toDF("trade_id", "user_id", "ts")
    val got = AsOfJoin.asOfNearest(trades, quotes, "user_id", "ts", Seq("px"),
      tolerance = Some(3600L * 1000000))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      10L -> Some(100.0), 11L -> Some(100.0), 12L -> None, 13L -> None))
  }

  test("native exec matches composed on the events feed (self-as-of, real data)") {
    val ev = graft.Tables(spark, sf001).events
    import org.apache.spark.sql.functions.col
    val views = ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "last_purchase").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val composed = res(AsOfJoin.asOfBackward(views, purchases, "user_id", "ts", Seq("last_purchase")))
    val native = res(AsOfJoin.asOfBackwardNative(views, purchases, "user_id", "ts", Seq("last_purchase")))
    assert(native === composed)
    assert(native.nonEmpty)
  }
}
