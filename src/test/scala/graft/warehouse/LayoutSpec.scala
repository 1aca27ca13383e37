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

  // ------------------------------------------------------- transaction log

  private def toyLog = {
    val s = spark
    import s.implicits._
    // two files added at v0; f1 compacted away at v1 into c; c removed at v2
    Seq(
      (0, "add", "f1", "p", 10L, 100L),
      (0, "add", "f2", "p", 20L, 200L),
      (1, "remove", "f1", "p", 10L, 100L),
      (1, "add", "c", "p", 10L, 100L),
      (2, "remove", "c", "p", 10L, 100L),
    ).toDF("version", "action", "file", "part", "n_rows", "bytes")
  }

  test("snapshotAt: latest action per file wins, removes drop out") {
    def files(v: Int) = Layout.snapshotAt(toyLog, v)
      .select("file").collect().map(_.getString(0)).toSet
    assert(files(0) === Set("f1", "f2"))
    assert(files(1) === Set("f2", "c")) // f1 replaced by its compaction
    assert(files(2) === Set("f2"))      // c deleted
  }

  test("time-travel census: compaction keeps rows, delete drops them") {
    val c = Layout.timeTravelCensus(toyLog, Seq(0, 1, 2)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(c(0) === ((2L, 30L)))
    assert(c(1) === ((2L, 30L))) // file count same, rows invariant
    assert(c(2) === ((1L, 20L))) // the delete actually drops rows
  }

  test("vacuum plan: only files unreachable from every retained snapshot") {
    // retaining v1 and v2: f1 (gone since v1) is reclaimable; c is gone at
    // v2 but still live at retained v1, so the retention horizon saves it
    val del = Layout.vacuumPlan(toyLog, Seq(1, 2))
      .select("file").collect().map(_.getString(0)).toSet
    assert(del === Set("f1"))
    // retaining only v2 releases c as well
    val del2 = Layout.vacuumPlan(toyLog, Seq(2))
      .select("file").collect().map(_.getString(0)).toSet
    assert(del2 === Set("f1", "c"))
  }

  test("log checkpoint: replay-equivalent at and after v, unreachable before") {
    val ck = Layout.checkpointLog(toyLog, 1)
    def files(log: org.apache.spark.sql.DataFrame, v: Int) =
      Layout.snapshotAt(log, v).select("file").collect()
        .map(_.getString(0)).toSet
    // every version >= the checkpoint resolves identically through either log
    assert(files(ck, 1) === files(toyLog, 1))
    assert(files(ck, 2) === files(toyLog, 2))
    // the checkpoint is smaller: 2 live adds + 1 later action vs 5 actions
    assert(ck.count() === 3 && toyLog.count() === 5)
    // versions BEFORE the checkpoint are unreachable (the semantic cost a
    // retention policy accounts for before checkpointing)
    assert(files(ck, 0) === Set.empty[String])
  }

  test("commit conflicts: overlapping remove-sets collide, disjoint commit") {
    val s = spark
    import s.implicits._
    val a = Seq(("f1", "p1"), ("f2", "p2")).toDF("file", "part")
    val b = Seq(("f2", "p2"), ("f3", "p2")).toDF("file", "part")
    val out = Layout.commitConflicts(a, b).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out("p1") === ((1L, 0L, 0L, "disjoint")))
    assert(out("p2") === ((1L, 2L, 1L, "delete_delete")))
  }

  test("graded log entries: lifecycle invariants hold on sf0.001") {
    val tt = graft.SparkEntry.queries("layout_time_travel")(spark, sf001)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(tt.keySet === Set(0, 1, 2, 3))
    // v1 -> v2 is the compaction: rows and bytes invariant, files drop
    assert(tt(2)._2 === tt(1)._2 && tt(2)._3 === tt(1)._3)
    assert(tt(2)._1 < tt(1)._1)
    // v2 -> v3 is the delete: rows drop
    assert(tt(3)._2 < tt(2)._2)
    // vacuum with {2,3} retained reclaims exactly the compacted-away
    // bucket-0/1 files: the v3-deleted bucket-2 files stay protected
    val del = graft.SparkEntry.queries("layout_vacuum_plan")(spark, sf001)
      .select("file").collect().map(_.getString(0))
    assert(del.nonEmpty)
    assert(del.forall(f => f.endsWith("/b0") || f.endsWith("/b1")), del.take(5).mkString(","))
    // conflicts: collisions only from 1997 on (a sparse tail month may
    // lack a bucket-1 file and legitimately stay disjoint), and both
    // verdicts must actually occur
    val cf = graft.SparkEntry.queries("layout_commit_conflicts")(spark, sf001)
      .collect().map(r => (r.getDate(0).toString, r.getString(4)))
    assert(cf.forall { case (p, v) =>
      v == "disjoint" || p >= "1997-01-01" })
    assert(cf.exists(_._2 == "delete_delete") && cf.exists(_._2 == "disjoint"))
  }
}
