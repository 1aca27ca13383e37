package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive inequality join on random data") {
    val rnd = new scala.util.Random(42)
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def t(offsetMin: Long) = new Timestamp(base + offsetMin * 60000L)

    // 300 points over ~20 days; 40 intervals of 1 min .. 3 days, some
    // overlapping, some empty, several not aligned to the bin width
    val points = (1 to 300).map(i => (i.toLong, t(rnd.nextInt(20 * 1440))))
      .toDF("pt_id", "ts")
    val intervals = (1 to 40).map { i =>
      val start = rnd.nextInt(20 * 1440)
      (s"iv$i", t(start), t(start + 1 + rnd.nextInt(3 * 1440)))
    }.toDF("window_id", "w_start", "w_end")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pt_id", "window_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    val binned = canon(RangeJoin.pointInInterval(
      points, intervals, "ts", "w_start", "w_end", binSeconds = 3600L))
    val naive = canon(points.crossJoin(intervals)
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end")))
    assert(binned === naive)
    assert(binned.nonEmpty, "generator produced no containments — weak test")
  }

  test("interval overlap equals the naive theta join; bin-spanning pairs appear once") {
    val rnd = new scala.util.Random(7)
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def t(offsetMin: Long) = new Timestamp(base + offsetMin * 60000L)

    // intervals up to 5 days against hourly bins: most overlapping pairs
    // share MANY bins — the overlap-start-bin filter must emit each exactly
    // once for the multiset equality below to hold
    val left = (1 to 60).map { i =>
      val s = rnd.nextInt(20 * 1440)
      (s"l$i", t(s), t(s + 1 + rnd.nextInt(5 * 1440)))
    }.toDF("l_id", "l_start", "l_end")
    val right = (1 to 60).map { i =>
      val s = rnd.nextInt(20 * 1440)
      (s"r$i", t(s), t(s + 1 + rnd.nextInt(5 * 1440)))
    }.toDF("r_id", "r_start", "r_end")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_id", "r_id").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq

    val binned = canon(RangeJoin.intervalOverlap(
      left, right, "l_start", "l_end", "r_start", "r_end", binSeconds = 3600L))
    val naive = canon(left.crossJoin(right)
      .filter(col("l_start") < col("r_end") && col("r_start") < col("l_end")))
    assert(binned === naive) // sorted multiset equality => no dup, no miss
    assert(binned.nonEmpty && binned.size < 3600, "degenerate generator")
  }

  test("points or intervals with NULL bounds never match") {
    val points = Seq((1L, Some(Timestamp.valueOf("2024-03-01 12:00:00"))),
      (2L, None: Option[Timestamp])).toDF("pt_id", "ts")
    val intervals = Seq(
      ("w_ok", Some(Timestamp.valueOf("2024-03-01 00:00:00")),
        Some(Timestamp.valueOf("2024-03-02 00:00:00"))),
      ("w_null", None: Option[Timestamp],
        Some(Timestamp.valueOf("2024-03-02 00:00:00")))
    ).toDF("window_id", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(points, intervals, "ts", "w_start", "w_end")
      .select("pt_id", "window_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "w_ok")))
  }
}
