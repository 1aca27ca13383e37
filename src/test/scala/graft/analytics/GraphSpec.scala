package graft.analytics

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private def edges(rows: (String, String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst", "w")
  }

  test("pagerank: symmetric two-node cycle is the stationary fixed point") {
    // A<->B with equal weight: p=(0.5, 0.5) satisfies
    // p' = 0.15/2 + 0.85*0.5 = 0.5 exactly, every iteration
    val out = Graph.pageRank(edges(("A", "B", 1L), ("B", "A", 1L)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("A") === 0.5 && out("B") === 0.5)
  }

  test("pagerank: weighted out-edges split mass by ratio, total conserved") {
    // B and C only link back to A; A splits 3:1 between B and C.
    // No dangling nodes -> total mass stays 1 (up to the 12dp rounding).
    val out = Graph.pageRank(edges(
      ("A", "B", 3L), ("A", "C", 1L), ("B", "A", 1L), ("C", "A", 1L)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out("B") > out("C"), "the 3x-weighted edge must rank B above C")
    assert(out("A") > out("B"), "A receives everything and must rank first")
  }

  test("pagerank: dangling node leaks mass, sink still outranks the source") {
    val out = Graph.pageRank(edges(("A", "B", 1L)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("B") > out("A"))
    assert(out.values.sum < 1.0, "dangling B leaks mass by construction")
    // A gets teleport mass only: 0.15/2
    assert(math.abs(out("A") - 0.075) < 1e-9)
  }

  test("pagerank on the sf0.001 transition graph: one rank per event type") {
    val t = graft.Tables(spark, sf001)
    val e = Graph.transitionEdges(t.events, "user_id", "ts", "event_type",
      "event_id")
    val ranks = Graph.pageRank(e).collect()
    val nTypes = t.events.select("event_type").distinct().count()
    assert(ranks.length.toLong === nTypes)
    assert(ranks.forall(_.getDouble(1) > 0.0))
    // every type both sends and receives on this feed: mass conserved
    assert(math.abs(ranks.map(_.getDouble(1)).sum - 1.0) < 1e-6)
  }
}
