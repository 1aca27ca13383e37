package graft

import graft.quality.Gates

/** Driver-contract smoke + gate-logic tests. */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has a unique name and every oracle has a query") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    assert(qs.size > 70, s"expected full registry, got ${qs.size}")
  }

  test("all registered queries execute at sf0.001 (excluding the slow ML trainer)") {
    val skip = Set("ml_gbt_metrics") // exercised separately in MlSpec
    val failures = SparkEntry.queries.filterNot(q => skip(q._1)).flatMap {
      case (name, fn) =>
        try { fn(spark, sf001).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("retention gate statuses follow FAIL<0.80<=WARN<0.90<=PASS") {
    assert(Gates.retentionStatus(0.79) === "FAIL")
    assert(Gates.retentionStatus(0.80) === "WARN")
    assert(Gates.retentionStatus(0.89) === "WARN")
    assert(Gates.retentionStatus(0.90) === "PASS")
    assert(Gates.retentionStatus(1.0) === "PASS")
    assert(Gates.floorStatus(999) === "FAIL")
    assert(Gates.floorStatus(1000) === "PASS")
  }
}
