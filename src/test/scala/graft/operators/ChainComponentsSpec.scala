package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChainComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("pointer jumping labels a 300-node chain correctly in few rounds") {
    val edges = (0 until 299).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges, maxRounds = 15,
      pathCompression = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 300)
    assert(labels.values.forall(_ == 0L), "every node joins component 0")
  }
}
