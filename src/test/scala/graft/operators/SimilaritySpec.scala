package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches hand-computed values") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(3.0f, 4.0f)),
    ).toDF("vec_id", "embedding")
    val a = Similarity.toDouble(col("a")); val b = Similarity.toDouble(col("b"))
    val out = df.select($"embedding".as("a")).crossJoin(df.select($"embedding".as("b")))
      .select(Similarity.cosine(a, b).as("c")).collect().map(_.getDouble(0))
    // 9 pairs; spot-check: orthogonal = 0, self = 1, (1,0)x(3,4) = 3/5
    assert(out.count(c => math.abs(c - 1.0) < 1e-12) >= 3)
    assert(out.count(c => math.abs(c) < 1e-12) === 2)
    assert(out.count(c => math.abs(c - 0.6) < 1e-12) === 2)
  }

  test("NativeDotRule rewrites the HOF dot shape to the codegen'd kernel") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(graft.plans.NativeDotRule))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ graft.plans.NativeDotRule
    val e = Tables(spark, sf001).embeddings.limit(5)
    val v = Similarity.toDouble(col("embedding"))
    val df = e.select(col("vec_id"), Similarity.dot(v, v).as("d"))
    // the public HOF API now optimizes to the native kernel...
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      df.queryExecution.optimizedPlan.toString.linesIterator.take(3).mkString("\n"))
    // ...with identical values (sequential left fold in both forms)
    val got = df.orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = e.select(col("vec_id"), col("embedding")).orderBy("vec_id").collect()
      .map { r =>
        val a = r.getSeq[Float](1).map(_.toDouble)
        r.getLong(0) -> a.foldLeft(0.0)((acc, x) => acc + x * x)
      }.toMap
    expected.foreach { case (id, exp) => assert(math.abs(got(id) - exp) < 1e-9) }
    // a non-dot fold (different zero) is left untouched
    val other = e.select(aggregate(zip_with(v, v, (x, y) => x * y),
      lit(1.0), (acc, x) => acc + x).as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("graft_dot matches the HOF fold on edge inputs: length mismatch and null elements (ADVICE r5)") {
    graft.functions.GraftDot.register(spark)
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (2L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0))), // unequal length
      (3L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))), // null element
    ).toDF("id", "a", "b")
    val got = df.select($"id", expr("graft_dot(a, b)").as("native"),
        Similarity.dot($"a", $"b").as("hof"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq.sortBy(_._1)
    // HOF semantics: zip_with pads/propagates nulls through the fold -> NULL
    assert(got === Seq(
      (1L, Some(11.0), Some(11.0)),
      (2L, None, None),
      (3L, None, None)))
  }

  test("int8 quantization stays in range and reconstructs within scale/2") {
    val e = Tables(spark, sf001).embeddings
    val q = Similarity.quantizeInt8(e, "vec_id", "embedding")
    // recompute the exact (unrounded) scale: the emitted one is rounded to
    // 6 decimals for the oracle, which shifts q*scale by up to 127*5e-7
    val exact = e
      .withColumn("__v", Similarity.toDouble(col("embedding")))
      .withColumn("s_exact", array_max(transform(col("__v"), v => abs(v))) / 127.0)
      .select(col("vec_id"), col("s_exact"),
        posexplode(col("__v")).as(Seq("pos", "v")))
    val joined = q.join(exact, Seq("vec_id", "pos"))
    val bad = joined.filter(
      abs(col("q")) > 127 ||
        abs(col("v") - col("q") * col("s_exact")) > col("s_exact") / 2 + 1e-9).count()
    assert(bad === 0)
    // a max-magnitude element must hit ±127 (symmetric scale is tight)
    assert(q.filter(abs(col("q")) === 127).count() > 0)
  }

  test("per-label centroids average in long form: centroid of one label is exact") {
    val df = Seq(
      (1L, Seq(1.0f, 3.0f), 7), (2L, Seq(3.0f, 5.0f), 7), (3L, Seq(10.0f, 0.0f), 8),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroids(df, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq === Seq((7, 0, 2.0), (7, 1, 4.0), (8, 0, 10.0), (8, 1, 0.0)))
  }

  test("brute-force top-k returns k ranked neighbors per query, no self-match") {
    val e = Tables(spark, sf001).embeddings
    val topk = Similarity.cosineTopK(e, e.filter($"vec_id" < 5), "vec_id", "embedding", 10)
    val rows = topk.collect()
    assert(rows.length === 5 * 10)
    assert(!rows.exists(r => r.getLong(0) === r.getLong(2)), "self-match leaked")
    // ranks are 1..10 per query and sims non-increasing within a query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq === (1 to 10))
      val sims = byRank.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("LSH cosine near-dup pairs are a subset of exact pairs with correct sims") {
    val e = Tables(spark, sf001).embeddings
    // exact pairs via the brute-force scorer (corpus vs corpus at tiny sf)
    val exact = Similarity.cosineTopK(e, e, "vec_id", "embedding", 50)
      .filter($"sim" >= 0.4).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1)))
      .toSet
    val lsh = Similarity.cosinePairsLsh(e, "vec_id", "embedding", 0.4, 64, planes = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(lsh.forall { case (p, _) => exact.contains(p) },
      "LSH returned a pair the exact scorer does not confirm")
    lsh.foreach { case (_, sim) => assert(sim >= 0.4 && sim <= 1.0) }
  }

  test("multi-table LSH cosine pairs: subset of exact, recall above the graded floor") {
    val e = Tables(spark, sf001).embeddings
    val exact = Similarity.cosinePairsExact(e, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.cosinePairsLshMulti(e, "vec_id", "embedding", 0.45, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi.subsetOf(exact),
      "multi-table LSH returned a pair the exact scorer does not confirm")
    assert(exact.isEmpty || multi.size.toDouble / exact.size >= 0.8,
      s"multi-table pair recall ${multi.size.toDouble / exact.size} below 0.8")
  }

  test("IVF top-k: high recall vs brute force with 4-of-16 bucket probes") {
    val e = Tables(spark, sf001).embeddings
    val brute = Similarity.cosineTopK(e, e.filter($"vec_id" < 5), "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.cosineTopKIvf(e, e.filter($"vec_id" < 5), "vec_id", "embedding",
      10, nCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.count(brute).toDouble / brute.size
    assert(recall > 0.2, s"IVF recall too low: $recall")
    assert(ivf.size === brute.size) // k neighbors per query either way
  }

  test("LSH top-k results are a subset of brute-force candidates with decent self-bucket recall") {
    val e = Tables(spark, sf001).embeddings
    val brute = Similarity.cosineTopK(e, e.filter($"vec_id" < 5), "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineTopKLsh(e, e.filter($"vec_id" < 5), "vec_id", "embedding",
      10, 64, planes = 2)
    val got = lsh.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: some overlap expected with 2 planes (4 buckets)
    val recall = got.count(brute).toDouble / brute.size
    assert(recall > 0.05, s"suspiciously low LSH recall $recall")
    assert(got.nonEmpty)
  }

  test("incremental ANN probe: prebuilt index, recall >= 0.95 vs brute force") {
    // VERDICT r7 item 7 — the online-retrieval shape: corpus index built
    // and materialized ONCE, a disjoint batch of new queries probes it.
    val e = Tables(spark, sf001).embeddings
    val corpus = e.filter($"vec_id" >= 20)
    val batch = e.filter($"vec_id" < 10)
    val index = Similarity.lshIndexMulti(corpus, "vec_id", "embedding",
      dim = 64).persist()
    index.count() // build the index artifact up front
    val brute = Similarity.cosineTopK(corpus, batch, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.cosineTopKLshIncremental(index, batch, "vec_id",
      "embedding", 10, dim = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.count(brute).toDouble / brute.size
    // the synthetic embeddings are the WORST regime for sign-LSH (top-10
    // sims ~0.25-0.30); OR-amplification (2 planes x 16 tables) still must
    // clear the contract bound here
    assert(recall >= 0.95, s"incremental ANN recall $recall below contract")
    // a second batch probes the SAME index object — no rebuild
    val batch2 = e.filter($"vec_id" >= 10 && $"vec_id" < 15)
    val got2 = Similarity.cosineTopKLshIncremental(index, batch2, "vec_id",
      "embedding", 10, dim = 64).collect()
    assert(got2.length === 5 * 10)
    index.unpersist()
  }

  test("incremental IVF probe: one quantizer fit, two batches, decent recall") {
    // the IVF twin of the incremental LSH shape: ivfIndex fits the coarse
    // quantizer ONCE; both batches probe the same index + centers artifact.
    val e = Tables(spark, sf001).embeddings
    val corpus = e.filter($"vec_id" >= 20)
    val batch = e.filter($"vec_id" < 10)
    val (index, centers) = Similarity.ivfIndex(corpus, "vec_id", "embedding")
    val cached = index.persist()
    cached.count()
    val brute = Similarity.cosineTopK(corpus, batch, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.cosineTopKIvfIncremental(cached, centers, batch,
      "vec_id", "embedding", 10, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // weak-similarity synthetic data spreads true neighbors across
    // centroids — 8-of-16 probes must still recover most of them
    val recall = got.count(brute).toDouble / brute.size
    assert(recall >= 0.6, s"incremental IVF recall $recall below bound")
    // second disjoint batch, same artifacts — no re-fit, full k per query
    val batch2 = e.filter($"vec_id" >= 10 && $"vec_id" < 15)
    val got2 = Similarity.cosineTopKIvfIncremental(cached, centers, batch2,
      "vec_id", "embedding", 10, nProbe = 8).collect()
    assert(got2.length === 5 * 10)
    cached.unpersist()
  }

  test("hybrid rerank: results come from the lexical candidate set, cosine-ordered") {
    val t = Tables(spark, sf001)
    val cand = graft.functions.TextOps
      .bm25TopK(t.documents, "doc_id", "text", Seq("hash", "join", "vector"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = Similarity.hybridRerank(t.documents, t.embeddings,
      "doc_id", "text", "vec_id", "embedding",
      Seq("hash", "join", "vector"), queryVecId = 0L, kCand = 50, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.length === 10)
    // dense rerank may only REORDER the lexical candidates, never add docs
    assert(out.forall { case (_, id, _) => cand(id) && id != 0L },
      "reranked doc outside the BM25 candidate set")
    // cosine non-increasing down the final ranking
    assert(out.sliding(2).forall { case Array(a, b) => a._3 >= b._3 })
  }

  test("centroid assign: total, deterministic, and beats chance on true labels") {
    val e = Tables(spark, sf001).embeddings
    val out = Similarity.centroidAssign(e, "vec_id", "label", "embedding")
      .collect()
    assert(out.length === e.count()) // exactly one assignment per vector
    val agree = out.count(r => r.getInt(1) == r.getInt(2)).toDouble / out.length
    // 5 labels => 0.2 by chance; the noisy synthetic clusters sit well above
    assert(agree > 0.3, s"assignment no better than chance: $agree")
    val again = Similarity.centroidAssign(e, "vec_id", "label", "embedding")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getInt(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getInt(2))).toSeq)
  }

  test("filtered top-k returns only same-label neighbors, a subset of unfiltered scores") {
    val e = Tables(spark, sf001).embeddings
    val queries = e.filter($"vec_id" < 5)
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.cosineTopKFiltered(e, queries, "vec_id", "embedding",
      "label", 5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(labels(r.getAs[Long]("neighbor_id")) === labels(r.getAs[Long]("query_id")),
        "filtered search must respect the label predicate")
    }
    // per query at most k results, ranks contiguous from 1
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rs.length))
    }
  }

  test("semantic dedup pairs stay within their cluster and above threshold") {
    val e = Tables(spark, sf001).embeddings
    val assign = Similarity.centroidAssign(e, "vec_id", "label", "embedding")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val out = Similarity.semanticDedupPairs(e, "vec_id", "label",
      "embedding", 0.3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (c, a, b, sim) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(a < b, "pairs must be canonical-oriented")
      assert(assign(a) === c && assign(b) === c,
        "a pair must live inside one assigned cluster")
      assert(sim >= 0.3 - 1e-4)
    }
  }

  test("zero vectors don't crash cosine search under ANSI mode — they rank nowhere") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f)),   // zero norm: undefined cosine
      (2L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id",
      "embedding", 5).collect()
    // no DIVIDE_BY_ZERO; the zero vector's null sim ranks after real ones
    val ranked = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id"))
    assert(ranked.head === 2L, s"real neighbor must rank first: ${ranked.toSeq}")
  }

  test("quantized L2: zero self-distance, symmetry, ascending ranks") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.euclideanTopKQuantized(vecs, vecs, "vec_id",
      "embedding", 3).collect()
    val d = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      -> r.getAs[Long]("dist2")).toMap
    assert(d((0L, 1L)) === 0L, "identical vectors must quantize to distance 0")
    assert(d((0L, 2L)) === d((2L, 0L)), "distance must be symmetric")
    // per-query dist2 non-decreasing in rank
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("dist2"))
      assert(byRank.sorted.toSeq === byRank.toSeq)
    }
  }

  test("kmeans: two separated blobs recover their clusters exactly") {
    val s = spark
    import s.implicits._
    // seeds are the 2 smallest ids: id 0 (blob A), id 1 (blob B) — one
    // seed lands in each blob, so Lloyd must separate them perfectly
    val vecs = Seq(
      (0L, Array(0.0f, 0.1f)), (1L, Array(10.0f, 9.9f)),
      (2L, Array(0.1f, 0.0f)), (3L, Array(10.1f, 10.0f)),
      (4L, Array(0.2f, 0.1f)), (5L, Array(9.9f, 10.1f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansLloyd(vecs, "vec_id", "embedding", k = 2,
      iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) === out(2L) && out(2L) === out(4L))
    assert(out(1L) === out(3L) && out(3L) === out(5L))
    assert(out(0L) !== out(1L))
    // seed 0 keeps cluster 0, seed 1 keeps cluster 1 (ids are the seeds)
    assert(out(0L) === 0 && out(1L) === 1)
  }

  test("kmeans: deterministic across runs, one row per vector") {
    val e = Tables(spark, sf001).embeddings
    val a = Similarity.kmeansLloyd(e, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val b = Similarity.kmeansLloyd(e, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq, "fixed seeding + decimal sums => bit-equal")
    assert(a.length.toLong === e.count())
    assert(a.map(_._2).distinct.length > 1, "multiple clusters must be used")
  }

  test("graft_pq_adc: matches a hand-computed lookup sum, NULLs on corrupt codes") {
    graft.functions.GraftPqAdc.register(spark)
    val tab = Seq(Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 30.0))
    val rows = Seq(
      (1L, tab, Seq[Option[Int]](Some(2), Some(0))),   // 3.0 + 10.0
      (2L, tab, Seq[Option[Int]](Some(0), Some(3))),   // code out of range
      (3L, tab, Seq[Option[Int]](Some(1), None)),      // null code element
      (4L, tab, Seq[Option[Int]](Some(1))),            // m mismatch
    ).toDF("id", "qtab", "codes")
    val got = rows.select($"id", expr("graft_pq_adc(qtab, codes)").as("adc"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> Some(13.0), 2L -> None, 3L -> None, 4L -> None))
  }

  test("PQ codes: m entries per vector, every code inside its codebook") {
    val e = Tables(spark, sf001).embeddings
    val cb = Similarity.pqCodebooks(e, "vec_id", "embedding", m = 8, nCodes = 16)
    assert(cb.length === 8)
    cb.foreach { book => assert(book.length === 16 && book.forall(_.length === 8)) }
    val codes = Similarity.pqIndex(e, "vec_id", "embedding", cb).collect()
    assert(codes.length.toLong === e.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === 8)
      cs.zipWithIndex.foreach { case (c, s) =>
        assert(c >= 0 && c < cb(s).length, s"code $c out of range in subspace $s")
      }
    }
    // deterministic: training + encode are pure functions of the corpus
    val cb2 = Similarity.pqCodebooks(e, "vec_id", "embedding", m = 8, nCodes = 16)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq === cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PQ-ADC with exact refine finds an exact twin vector as top-1") {
    val s = spark
    import s.implicits._
    // 16 corpus vectors in two well-separated directions + vector 99 an
    // exact COPY of query 0's vector: after the ADC shortlist + float
    // refine, the copy must rank first with cosine 1
    val base = (0L to 15L).map { i =>
      val bump = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array.tabulate(8)(d => if (d < 4) bump + i * 0.01f else 0.3f * d))
    }
    val corpus = (base :+ ((99L, base.head._2.clone()))).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopKPq(corpus,
        corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        k = 3, m = 4, nCodes = 4, overfetch = 4)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.head.getAs[Long]("neighbor_id") === 99L)
    assert(math.abs(out.head.getAs[Double]("sim") - 1.0) < 1e-9)
  }

  test("PQ-ADC recall on sf0.001 stays above the graded floor") {
    val e = Tables(spark, sf001).embeddings
    val q = e.filter(col("vec_id") < 10)
    val approx = Similarity.cosineTopKPq(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    val overlap = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = overlap.toDouble / nExact
    info(f"PQ-ADC recall@10 on sf0.001: $recall%.3f ($overlap of $nExact)")
    // graded-entry floor (pqTopKBound) with no slack: this IS the pin
    assert(recall >= 0.5, f"recall $recall%.3f under the graded floor 0.5")
  }

  test("IVFADC recall on sf0.001 stays above the graded floor") {
    val e = Tables(spark, sf001).embeddings
    val q = e.filter(col("vec_id") < 10)
    val approx = Similarity.cosineTopKIvfPq(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    val overlap = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = overlap.toDouble / nExact
    info(f"IVFADC recall@10 on sf0.001: $recall%.3f ($overlap of $nExact)")
    assert(recall >= 0.3, f"recall $recall%.3f under the graded floor 0.3")
    // refine is exact: every returned sim must equal the brute-force cosine
    val full = Similarity.cosineTopKIvfPq(e, q, "vec_id", "embedding", 10)
    val brute = Similarity.cosineTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val mismatched = full.join(brute, Seq("query_id", "neighbor_id"))
      .filter(abs(col("sim") - col("bsim")) > 1e-9).count()
    assert(mismatched === 0L, "refined sims must be the exact cosine")
  }

  test("residual IVFADC recall on sf0.001 stays above the graded floor, refine exact") {
    val e = Tables(spark, sf001).embeddings
    val q = e.filter(col("vec_id") < 10)
    val approx = Similarity.cosineTopKIvfPqResidual(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    val overlap = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = overlap.toDouble / nExact
    info(f"residual IVFADC recall@10 on sf0.001: $recall%.3f ($overlap of $nExact)")
    assert(recall >= 0.3, f"recall $recall%.3f under the graded floor 0.3")
    val full = Similarity.cosineTopKIvfPqResidual(e, q, "vec_id", "embedding", 10)
    val brute = Similarity.cosineTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val mismatched = full.join(brute, Seq("query_id", "neighbor_id"))
      .filter(abs(col("sim") - col("bsim")) > 1e-9).count()
    assert(mismatched === 0L, "refined sims must be the exact cosine")
  }

  test("residual encoding beats flat codes on a CLUSTERED corpus (its target regime)") {
    // The graded entries run on the weak-similarity synthetic embeddings,
    // where cells barely concentrate (mean cos to centroid ~0.14) and
    // residuals spread WIDER than the unit vectors — there residual
    // encoding measurably loses (see cosineTopKIvfPqResidual's scaladoc).
    // This pin covers the regime the technique exists for: a corpus of 16
    // tight direction clusters (mean cos to center ~0.95), where per-cell
    // residuals are short and the same codebook budget quantizes them far
    // better. overfetch=1 removes the exact-refine safety net so the ADC
    // ranking quality itself decides recall.
    val dim = 64; val nClusters = 16; val perCluster = 32
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = for (c <- 0 until nClusters; i <- 0 until perCluster) yield {
      val v = unit(centers(c).map(x => x + 0.05 * rnd.nextGaussian()))
      ((c * perCluster + i).toLong, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") % perCluster === 0) // one query per cluster
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / nExact
    val flat = recall(Similarity.cosineTopKIvfPq(
      e, q, "vec_id", "embedding", 10, overfetch = 1))
    val residual = recall(Similarity.cosineTopKIvfPqResidual(
      e, q, "vec_id", "embedding", 10, overfetch = 1))
    info(f"clustered corpus recall@10 — flat: $flat%.3f residual: $residual%.3f")
    assert(residual > flat,
      f"residual $residual%.3f should beat flat $flat%.3f on clustered data")
  }

  test("incremental PQ probe: one encode, cached index, recall above the floor") {
    val e = Tables(spark, sf001).embeddings
    val corpus = e.filter(col("vec_id") >= 20)
    val q1 = e.filter(col("vec_id") < 10)
    val q2 = e.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 8, nCodes = 32)
    val index = Similarity.pqIndex(corpus, "vec_id", "embedding", cb).persist()
    index.count() // materialize once
    try {
      // the probe's ADC stage must read the CACHED code frame, not re-encode
      val probe = Similarity.cosineTopKPqRefined(index, cb, corpus, q1,
        "vec_id", "embedding", 10, overfetch = 8)
      assert(probe.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
        "ADC scan should read the persisted index")
      // two disjoint batches against the one index, both above the floor
      for (q <- Seq(q1, q2)) {
        val approx = Similarity.cosineTopKPqRefined(index, cb, corpus, q,
          "vec_id", "embedding", 10, overfetch = 8)
          .select(col("query_id"), col("neighbor_id"))
        val exact = Similarity.cosineTopK(corpus, q, "vec_id", "embedding", 10)
          .select(col("query_id"), col("neighbor_id"))
        val n = exact.count()
        val o = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        val recall = o.toDouble / n
        info(f"incremental PQ recall@10: $recall%.3f ($o of $n)")
        assert(recall >= 0.5, f"recall $recall%.3f under the graded floor 0.5")
      }
    } finally index.unpersist()
  }

  test("centroid silhouette: orthogonal clusters score 1, identical clusters 0") {
    // two tight orthogonal clusters: own-centroid sim 1, other 0 ->
    // silhouette (1-0)/(1-0) = 1 for every vector
    val tight = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, 1.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val t = Similarity.centroidSilhouette(tight, "vec_id", "label", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(t === Map(0 -> ((2L, 1.0)), 1 -> ((2L, 1.0))))
    // both labels hold the SAME vector: every sim is 1, the runner-up
    // distance degenerates to 0 -> the CASE guard pins silhouette 0; the
    // sim tie assigns BOTH vectors to label 0 (smallest-label tiebreak),
    // so the degenerate clustering collapses to a single output row
    val degenerate = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val d = Similarity.centroidSilhouette(degenerate, "vec_id", "label",
      "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(d.toSeq === Seq((0, 2L, 0.0)))
  }

  test("MMR rerank skips the near-duplicate that pure top-k keeps") {
    // query 0 points along x; 10/11 are near-identical twins at sim ~0.90,
    // 12 sits at sim 0.88 on the OTHER side (cc(10,12) ~ 0.585). Pure
    // top-2 = the twins; MMR's second pick must be 12: the twin scores
    // 0.75*0.90 - 0.25*1.0 = 0.425 while the diverse candidate scores
    // 0.75*0.88 - 0.25*0.585 = 0.514 — diversity wins exactly when the
    // relevance gap is smaller than (1 - cc)/3 at lambda = 0.75.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (10L, Seq(0.9f, 0.436f)), (11L, Seq(0.9f, 0.4359f)),
      (12L, Seq(0.88f, -0.475f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(df, df.filter($"vec_id" === 0L),
      "vec_id", "embedding", kCand = 3, kSel = 2, lam = 0.75)
      .collect().map(r => (r.getInt(2), r.getLong(1))).toMap
    assert(out(1) === 10L, s"first pick should be the most similar: $out")
    assert(out(2) === 12L, s"second pick must be the DIVERSE candidate: $out")
  }

  test("MMR rerank: a pair-less query (kCand=1) still emits its pick_order=1 row") {
    // ADVICE r12 (medium): the r12 inner join on the pair aggregate
    // dropped any query whose candidate set had <2 entries — no
    // candidate-pair rows, no ccAgg row, query vanished. The left-join
    // form must emit the pure-relevance step-1 pick, like the r10 form.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (10L, Seq(0.9f, 0.436f)), (11L, Seq(0.9f, 0.4359f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(df, df.filter($"vec_id" === 0L),
      "vec_id", "embedding", kCand = 1, kSel = 2, lam = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length === 1, s"expected exactly the step-1 row, got ${out.toSeq}")
    assert(out(0) === ((0L, 11L, 1)), s"wrong pick: ${out.toSeq}") // 11 is the top-1 (slightly shorter vector => higher cosine)
    // and a non-integral id column is rejected with a NAMED contract error
    val bad = Seq(("a", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(bad, bad, "vec_id", "embedding", 1, 1, 0.75)
    }
    assert(ex.getMessage.contains("integral id"))
  }

  test("IVF index persistence: a reloaded index serves bit-identical results") {
    // the restart leg of the retrieval story: build -> write (bucket-
    // partitioned parquet + centroid table) -> reload cold -> probe. The
    // quantizer fit is seeded and parquet doubles are lossless, so the
    // reloaded probe must equal the in-memory one EXACTLY, not just in
    // recall.
    val e = Tables(spark, sf001).embeddings
    val q = e.filter($"vec_id" < 5)
    val root = new java.io.File("target/tmp/ivf_persist_spec").getAbsolutePath
    Similarity.ivfIndexPersist(e, "vec_id", "embedding", root)
    val (index, centers) = Similarity.ivfIndexLoad(spark, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val reloaded = rows(Similarity.cosineTopKIvfIncremental(
      index, centers, q, "vec_id", "embedding", 10))
    val inMemory = rows(Similarity.cosineTopKIvf(
      e, q, "vec_id", "embedding", 10))
    assert(reloaded === inMemory,
      "reloaded-index probe must be bit-identical to the just-built index")
  }

  test("IVF index persistence: the probe prunes the bucket-partitioned scan") {
    // the 100-TB claim made concrete: the index store is partitioned by
    // bucket, the probe assignment is driver-known, and the literal
    // bucket IN-filter must land in the scan's PartitionFilters line —
    // one probe READS nProbe-union/nCentroids of the index, it does not
    // scan-then-discard.
    val e = Tables(spark, sf001).embeddings
    val q = e.filter($"vec_id" < 2)
    val root = new java.io.File("target/tmp/ivf_persist_spec").getAbsolutePath
    Similarity.ivfIndexPersist(e, "vec_id", "embedding", root)
    val (index, centers) = Similarity.ivfIndexLoad(spark, root)
    val p = Similarity.cosineTopKIvfIncremental(
        index, centers, q, "vec_id", "embedding", 10)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.filter(_.contains("PartitionFilters"))
      .find(_.contains("bucket"))
    assert(pf.nonEmpty && pf.get.contains("bucket"),
      s"expected a bucket PartitionFilters prune on the index scan:\n${p.take(1500)}")
  }

  test("serving path carries only query-keyed top-k Exchanges (census audit, r12)") {
    // the SERVING path is what a production probe re-runs per batch; the
    // build/grading harness runs once. Pin that the reloaded-index probe
    // plans with at most the ANN family's adjudicated shape: query-keyed
    // heap-aggregation Exchanges (partial+final graft_topk), candidate
    // joins all broadcast — no corpus reshuffle per query batch.
    val e = Tables(spark, sf001).embeddings
    val q = e.filter($"vec_id" < 5)
    val root = new java.io.File("target/tmp/ivf_persist_spec").getAbsolutePath
    Similarity.ivfIndexPersist(e, "vec_id", "embedding", root)
    val (index, centers) = Similarity.ivfIndexLoad(spark, root)
    val plan = Similarity.cosineTopKIvfIncremental(
        index, centers, q, "vec_id", "embedding", 10)
      .queryExecution.executedPlan.toString()
    // shuffle Exchanges only; BroadcastExchange is the cheap path we WANT
    val shuffles = plan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.size <= 2,
      s"reloaded-index serving path plans ${shuffles.size} shuffle Exchanges:\n${plan.take(2000)}")
    shuffles.foreach { l =>
      assert(l.contains("hashpartitioning(query_id") || l.contains("SinglePartition"),
        s"serving-path Exchange is not query-keyed: $l")
    }
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "serving-path joins must broadcast, not reshuffle the index")
  }
}
