package graft.operators

import graft.{SparkSpec, Tables}

import org.apache.spark.sql.functions._

/** Contract pins for the Bloom runtime-filter join: exactness (the oracle
  * re-checks it per round, this pins it in the suite), the no-false-negative
  * superset property, and the property that makes it worth running at all —
  * the prefilter must actually DROP most of the non-matching fact. */
class RuntimeFiltersSpec extends SparkSpec {

  private lazy val t = Tables(spark, sf001)
  private lazy val dim = t.orders
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"), col("o_orderstatus"))

  test("bloom-prefiltered join result equals the plain join bit-for-bit") {
    val filtered = RuntimeFilters.bloomPrefilterJoin(t.lineitem, dim,
        "l_orderkey", "o_orderkey", expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
      .orderBy("l_orderkey", "l_linenumber").collect()
    val plain = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
      .orderBy("l_orderkey", "l_linenumber").collect()
    assert(filtered.toSeq == plain.toSeq)
  }

  test("prefilter survivors: superset of true matches, strict subset of fact") {
    val survivors = RuntimeFilters.prefilterSurvivors(t.lineitem, dim,
        "l_orderkey", "o_orderkey", expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).toSet
    val trueKeys = t.lineitem
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).toSet
    val allKeys = t.lineitem.select("l_orderkey").distinct().count()
    assert(trueKeys.subsetOf(survivors), "Bloom produced a false negative")
    // ~20% of orders are urgent; at fpp=1% the survivor set must stay well
    // under half the fact keys or the filter isn't paying for itself
    assert(survivors.size < allKeys / 2,
      s"prefilter kept ${survivors.size} of $allKeys keys — not selective")
  }

  test("sketch budget guard refuses an over-size driver sketch") {
    val e = intercept[IllegalArgumentException] {
      RuntimeFilters.bloomPrefilterJoin(t.lineitem, dim,
        "l_orderkey", "o_orderkey",
        expectedItems = 10000000000L, fpp = 0.001, maxSketchBytes = 1 << 20)
    }
    assert(e.getMessage.contains("DRIVER"))
  }
}
