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
}
