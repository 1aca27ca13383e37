package graft.sources

import graft.{SparkSpec, Tables}
import graft.operators.Skew
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpec {

  test("sizedWrite caps rows per output file and preserves the data") {
    val t = graft.Tables(spark, sf001)
    val out = "target/tmp/sized_orders"
    Sources.sizedWrite(t.orders, out, maxRecordsPerFile = 500L,
      sortCols = Seq("o_orderdate"))
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    // every file respects the cap, and nothing was lost or duplicated
    files.foreach { f =>
      assert(spark.read.parquet(f.getAbsolutePath).count() <= 500L, f.getName)
    }
    assert(spark.read.parquet(out).count() === t.orders.count())
  }

  test("mergeSchema read unifies evolving parquet schemas (schema evolution)") {
    import spark.implicits._
    val dir = new java.io.File("target/tmp/evolving").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // month 1 wrote (id, a); month 2 added column b — the standard additive
    // schema evolution of a long-lived feed
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/m=1")
    Seq((2L, "y", 9.5)).toDF("id", "a", "b").write.parquet(s"$dir/m=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("a", "b", "id", "m"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[Any]("b") == null)  // old files null-pad the new col
    assert(rows(1).getAs[Double]("b") === 9.5)
  }

  test("fetchIfAbsent downloads once and skips on re-run (S1 idempotence)") {
    val src = Files.createTempFile(Paths.get("target"), "src-", ".bin")
    Files.write(src, Array.fill[Byte](1024)(7))
    val dest = Retrieval.monthPath("target/tmp/raw", "yellow", 2024, 3)
    Files.deleteIfExists(Paths.get(dest))
    val first = Retrieval.fetchIfAbsent(src.toUri, dest)
    assert(first === Retrieval.Fetched(1024L))
    val second = Retrieval.fetchIfAbsent(src.toUri, dest)
    assert(second === Retrieval.Skipped)
    assert(Files.size(Paths.get(dest)) === 1024L)
  }

  test("monthPath follows the yellow/YYYY/MM layout") {
    assert(Retrieval.monthPath("/raw", "yellow", 2024, 3) ===
      "/raw/yellow/2024/03/data.parquet")
  }

  test("salted join is row-identical to the plain join") {
    val t = Tables(spark, sf001)
    val dim = t.orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = t.lineitem.join(dim, "l_orderkey")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(t.lineitem, dim, "l_orderkey", 8, "l_linenumber")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("path probe distinguishes existing from missing tables") {
    assert(Sources.pathExists(spark, s"$sf001/lineitem.parquet"))
    assert(!Sources.pathExists(spark, s"$sf001/nonexistent.parquet"))
  }

  test("fetch policy: missing source skips without fetching or retrying") {
    var fetched = 0
    var probes = 0
    val r = Retrieval.fetchWithPolicy(
      () => { probes += 1; Retrieval.Missing },
      () => { fetched += 1; Retrieval.Fetched(1L) },
      sleep = _ => fail("must not back off on a 404"))
    assert(r === Retrieval.SkippedMissing)
    assert(probes === 1 && fetched === 0)
  }

  test("fetch policy: transient failures retry with exponential backoff") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var probes = 0
    val r = Retrieval.fetchWithPolicy(
      () => { probes += 1
        if (probes < 3) Retrieval.Transient("503") else Retrieval.Available },
      () => Retrieval.Fetched(42L),
      maxAttempts = 5, backoffMs = 100L, sleep = sleeps += _)
    assert(r === Retrieval.Completed(3, Retrieval.Fetched(42L)))
    assert(sleeps.toSeq === Seq(100L, 200L)) // backoffMs * 2^(attempt-1)
  }

  test("fetch policy: gives up loudly after maxAttempts transient probes") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r = Retrieval.fetchWithPolicy(
      () => Retrieval.Transient("502"),
      () => fail("must not fetch when the probe never clears"),
      maxAttempts = 3, backoffMs = 10L, sleep = sleeps += _)
    assert(r === Retrieval.GaveUp(3, "502"))
    assert(sleeps.toSeq === Seq(10L, 20L)) // no sleep after the final attempt
  }
}
