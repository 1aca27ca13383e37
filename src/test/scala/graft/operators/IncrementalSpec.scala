package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {

  test("merged snapshot+delta state equals the full recompute, any merge order") {
    val s = spark
    import s.implicits._
    val rows = (1 to 100).map(i => (s"g${i % 3}", i * 1.5)).toDF("g", "v")
    val parts = Seq(
      rows.filter(col("v") <= 50),
      rows.filter(col("v") > 50 && col("v") <= 120),
      rows.filter(col("v") > 120))
      .map(Incremental.aggState(_, "g", "v"))
    val full = Incremental.finalizeAggState(
      Incremental.aggState(rows, "g", "v"), "g").orderBy("g").collect()
    // merge in two different orders — associativity/commutativity contract
    for (perm <- Seq(parts, parts.reverse)) {
      val merged = Incremental.finalizeAggState(
        Incremental.mergeAggState(perm, "g"), "g").orderBy("g").collect()
      assert(merged.toSeq === full.toSeq)
    }
  }

  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val neu = Seq((2L, 20.0), (3L, 31.0), (4L, 40.0)).toDF("k", "v")
    val d = Incremental.snapshotDiff(old, neu, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("change-log apply: latest version wins, D deletes, I inserts, rest untouched") {
    val s = spark
    import s.implicits._
    val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("k", "v")
    val log = Seq(
      (2L, 21.0, 1L, "U"), (2L, 22.0, 2L, "U"),   // out-of-order safe: v2 wins
      (3L, 0.0, 1L, "D"),                          // delete
      (5L, 50.0, 1L, "I"),                         // insert under a fresh key
      (4L, 41.0, 1L, "U"), (4L, 0.0, 2L, "D"))     // update then delete => gone
      .toDF("k", "v", "version", "op")
    val out = Incremental.applyChangeLog(snap, log, "k", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 10.0, 2L -> 22.0, 5L -> 50.0))
  }
}
