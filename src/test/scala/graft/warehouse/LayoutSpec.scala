package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("morton code is a bijection: de-interleaving recovers both coordinates") {
    val s = spark
    import s.implicits._
    val pts = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    val z = pts.withColumn("z", Layout.zValue(col("x"), col("y"), 16))
    // distinct z count == point count => injective on the domain
    assert(z.select("z").distinct().count() === 32L * 32)
    // recover x (even bits) and y (odd bits)
    val back = (0 until 16).map { i =>
      (shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)) * lit(1L << i),
        shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)) * lit(1L << i))
    }
    val rec = z.withColumn("xr", back.map(_._1).reduce(_ + _))
      .withColumn("yr", back.map(_._2).reduce(_ + _))
    assert(rec.filter(col("xr") =!= col("x") || col("yr") =!= col("y")).count() === 0)
  }

  test("z-order tiles bound BOTH dimensions tighter than a 1-D sort bounds the second") {
    val t = graft.Tables(spark, sf001)
    val tiles = Layout.zOrderTileStats(
      t.lineitem.select("l_partkey", "l_suppkey"), "l_partkey", "l_suppkey", 32)
      .collect()
    assert(tiles.length === 32)
    val (xLo, xHi) = (tiles.map(_.getAs[Long]("x_min")).min,
      tiles.map(_.getAs[Long]("x_max")).max)
    val (yLo, yHi) = (tiles.map(_.getAs[Long]("y_min")).min,
      tiles.map(_.getAs[Long]("y_max")).max)
    // average tile bounding-box area must be far below the full domain area
    // (a 1-D sort on x gives y-span ≈ full domain in every tile)
    val domainArea = (xHi - xLo + 1).toDouble * (yHi - yLo + 1)
    val meanArea = tiles.map(r =>
      (r.getAs[Long]("x_max") - r.getAs[Long]("x_min") + 1).toDouble *
        (r.getAs[Long]("y_max") - r.getAs[Long]("y_min") + 1)).sum / tiles.length
    assert(meanArea < domainArea / 4,
      s"z-order tiles should cluster both dims: mean box $meanArea vs domain $domainArea")
  }

  test("zOrderFileStats: range-exchange shape, disjoint z-ranges, no global window") {
    val t = graft.Tables(spark, sf001)
    val li = t.lineitem.select("l_partkey", "l_suppkey")
    // the production layout plans a range exchange + per-partition sort,
    // never a single-task global Window/ntile
    val plan = Layout.zOrderCluster(li, "l_partkey", "l_suppkey", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
    val files = Layout.zOrderFileStats(li, "l_partkey", "l_suppkey", 16).collect()
    // every row lands in exactly one file
    assert(files.map(_.getAs[Long]("n")).sum === li.count())
    // range partitioning on __z gives pairwise-disjoint, ordered z-ranges
    val byFile = files.sortBy(_.getAs[Int]("file"))
    byFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("z_max") <= b.getAs[Long]("z_min"),
          s"files ${a.getAs[Int]("file")} and ${b.getAs[Int]("file")} overlap in z")
      case _ =>
    }
  }

  test("compaction plan: size-descending running-sum packing, per partition") {
    val s = spark
    import s.implicits._
    // partition p: sizes 70, 60, 30, 20, 10 against target 100:
    // before-me prefix sums 0, 70, 130, 160, 180 -> bins 0, 0, 1, 1, 1
    val inv = Seq(
      ("p", "f1", 70L), ("p", "f2", 60L), ("p", "f3", 30L),
      ("p", "f4", 20L), ("p", "f5", 10L),
      ("q", "g1", 250L), ("q", "g2", 10L),
    ).toDF("part", "file", "size")
    val out = Layout.compactionPlan(inv, "part", "file", "size", 100L)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("p", 0)) === ((2L, 130L)))
    assert(out(("p", 1)) === ((3L, 60L)))
    // the oversized file fills bins 0-2 alone; g2 starts at prefix 250
    assert(out(("q", 0)) === ((1L, 250L)))
    assert(out(("q", 2)) === ((1L, 10L)))
  }

  test("prune plan: skip / full / partial decisions from zone maps alone") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1, 0L, 9L),    // entirely below [10, 30) -> skip
      (2, 5L, 15L),   // straddles lo            -> partial
      (3, 10L, 29L),  // contained               -> full
      (4, 25L, 35L),  // straddles hi            -> partial
      (5, 30L, 40L),  // min == hi (half-open)   -> skip
      (6, 50L, 60L),  // entirely above          -> skip
    ).toDF("part", "min_v", "max_v")
      .withColumn("n_rows", lit(100L))
    val out = Layout.prunePlan(rows, "v", lit(10L), lit(30L))
      .select("part", "decision").as[(Int, String)].collect().toMap
    assert(out === Map(1 -> "skip", 2 -> "partial", 3 -> "full",
      4 -> "partial", 5 -> "skip", 6 -> "skip"))
  }

  test("z-order 2-D prune: disjoint on either axis skips, contained on both is full") {
    val s = spark
    import s.implicits._
    val tiles = Seq(
      // tile, x_min, x_max, y_min, y_max against box [10,20] x [10,20]
      (1, 0L, 5L, 10L, 20L),    // x disjoint          -> skip
      (2, 10L, 20L, 25L, 30L),  // y disjoint          -> skip
      (3, 12L, 18L, 12L, 18L),  // contained both axes -> full
      (4, 5L, 15L, 12L, 18L),   // x straddles         -> partial
      (5, 12L, 18L, 15L, 25L),  // y straddles         -> partial
    ).toDF("tile", "x_min", "x_max", "y_min", "y_max")
      .withColumn("n", lit(10L))
    val out = Layout.zOrderPrunePlan(tiles, 10L, 20L, 10L, 20L)
      .select("tile", "decision").as[(Int, String)].collect().toMap
    assert(out === Map(1 -> "skip", 2 -> "skip", 3 -> "full",
      4 -> "partial", 5 -> "partial"))
  }

  test("bloom manifest: bounded, no false negatives, out-prunes the zone map on a scattered key") {
    val s = spark
    import s.implicits._
    val bits = 4096
    val hashes = 3
    val li = graft.Tables(spark, sf001).lineitem
    val part = date_trunc("month", col("l_shipdate")).cast("date")
    val m = Layout.bloomManifest(li, part, "l_orderkey", bits, hashes)
    // the position set saturates at `bits` regardless of rows — the
    // property that keeps the manifest metadata-sized
    assert(m.select(max(size(col("bloom")))).as[Int].head() <= bits)
    val keysDf = (1L to 24L).toDF("key")
    val probed = m.crossJoin(broadcast(keysDf))
      .withColumn("minmax_hit",
        col("key") >= col("min_l_orderkey") && col("key") <= col("max_l_orderkey"))
      .withColumn("bloom_hit",
        forall(Layout.bloomPositions(col("key"), bits, hashes),
          p => array_contains(col("bloom"), p)))
    // structural guarantee: a tile truly containing the key always survives
    val violations = li.filter(col("l_orderkey").between(1L, 24L))
      .select(col("l_orderkey").as("key"), part.as("part")).distinct()
      .join(probed.select(col("part"), col("key"), col("bloom_hit")),
        Seq("part", "key"))
      .filter(!col("bloom_hit")).count()
    assert(violations === 0L, "bloom probes must never false-negative")
    // effectiveness: orderkeys scatter across every ship month, so the
    // zone map reads nearly everything while the bloom skips absent keys
    val (bloomTiles, minmaxTiles) = probed.agg(
        sum(when(col("bloom_hit"), 1L).otherwise(0L)),
        sum(when(col("minmax_hit"), 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    assert(bloomTiles < minmaxTiles,
      s"bloom should out-prune the zone map: bloom=$bloomTiles minmax=$minmaxTiles")
  }

  test("hilbert index matches the canonical 4x4 curve table") {
    val s = spark
    import s.implicits._
    // xy2d reference values (the standard bit-transform, d2xy-invertible)
    val expected = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (1, 1) -> 2L, (0, 1) -> 3L,
      (0, 2) -> 4L, (0, 3) -> 5L, (1, 3) -> 6L, (1, 2) -> 7L,
      (2, 2) -> 8L, (2, 3) -> 9L, (3, 3) -> 10L, (3, 2) -> 11L,
      (3, 1) -> 12L, (2, 1) -> 13L, (2, 0) -> 14L, (3, 0) -> 15L)
    val pts = (for (x <- 0 until 4; y <- 0 until 4) yield (x, y)).toDF("x", "y")
    val got = Layout.withHilbert(pts, col("x"), col("y"), bits = 2, out = "d")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("hilbert adjacency: consecutive indices are grid-adjacent (morton is not)") {
    val s = spark
    import s.implicits._
    val n = 16 // bits = 4, exhaustive 256-cell grid
    val pts = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
    val idx = Layout.withHilbert(pts, col("x"), col("y"), bits = 4, out = "d")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 4))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // bijection onto [0, n*n)
    assert(idx.map(_._3).sorted.toSeq === (0L until (n.toLong * n)))
    val byD = idx.map(t => t._3 -> ((t._1, t._2))).toMap
    val byZ = idx.map(t => t._4 -> ((t._1, t._2))).toMap
    def manhattan(a: (Int, Int), b: (Int, Int)) =
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
    // every consecutive Hilbert pair is a unit step — the locality
    // guarantee behind perimeter-bound tile bounding boxes
    assert((0L until (n.toLong * n - 1)).forall(d =>
      manhattan(byD(d), byD(d + 1)) == 1))
    // Morton violates it at every quadrant seam (e.g. z=1 -> z=2 jumps)
    assert((0L until (n.toLong * n - 1)).exists(z =>
      manhattan(byZ(z), byZ(z + 1)) > 1))
  }
}
