package graft

import graft.operators.Cleaning
import graft.warehouse.StarSchema
import graft.ml.ModelRegistry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.time.LocalDateTime

/** Property tests for the engine's core contracts (SURVEY §5.4): the
  * idempotence/totality laws the reference documents
  * (RAPPORT_PROJET_BIGDATA.md:584-591) but never property-tests.
  * (ScalaCheck generators sampled directly — the scalatestplus bridge is
  * not in the offline dependency cache.) */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling in place of scalatestplus forAll. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(42L)).get.foreach(f)

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(p => f(p._1, p._2))

  private val anyTs: Gen[LocalDateTime] = for {
    y <- Gen.choose(2020, 2025); m <- Gen.choose(1, 12)
    d <- Gen.choose(1, java.time.YearMonth.of(y, m).lengthOfMonth())
    h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
  } yield LocalDateTime.of(y, m, d, h, mi, s)

  test("month-window totality: every timestamp lands in exactly ONE month window") {
    forAll(anyTs) { t =>
      val windows = for (y <- 2020 to 2025; m <- 1 to 12) yield (y, m)
      val hits = windows.count { case (y, m) =>
        val start = LocalDateTime.of(y, m, 1, 0, 0)
        !t.isBefore(start) && t.isBefore(start.plusMonths(1))
      }
      assert(hits === 1)
    }
  }

  test("bucketize totality: every value maps to exactly one label") {
    val bounds = Seq(10.0 -> "low", 30.0 -> "medium", 60.0 -> "high")
    val spark = SparkSpec.session
    import spark.implicits._
    val vs = Gen.listOfN(300, Gen.choose(-1000.0, 1000.0))
      .apply(Gen.Parameters.default, Seed(42L)).get
    val got = vs.toDF("x")
      .select(col("x"), Cleaning.bucketize(col("x"), bounds, "rest").as("b"))
      .collect()
    got.foreach { r =>
      val v = r.getDouble(0)
      val expected =
        if (v < 10) "low" else if (v < 30) "medium" else if (v < 60) "high" else "rest"
      assert(r.getString(1) === expected, s"value $v")
    }
  }

  test("sliding window wraps year boundaries (model_registry.py:107-115 case)") {
    assert(ModelRegistry.slidingWindow("2023-02") ===
      (Seq("2022-11", "2022-12", "2023-01"), "2023-02"))
    assert(ModelRegistry.slidingWindow("2024-01") ===
      (Seq("2023-10", "2023-11", "2023-12"), "2024-01"))
    forAll2(Gen.choose(2000, 2030), Gen.choose(1, 12)) { (y, m) =>
      val (train, test) = ModelRegistry.slidingWindow(f"$y%04d-$m%02d")
      assert(train.length === 3)
      // months are consecutive and end right before the test month
      val all = train :+ test
      all.sliding(2).foreach { case Seq(a, b) =>
        assert(java.time.YearMonth.parse(a).plusMonths(1) ===
          java.time.YearMonth.parse(b))
      }
    }
  }

  test("month range is inclusive and rejects inverted ranges") {
    assert(ModelRegistry.monthRange("2023-11", "2024-02") ===
      Seq("2023-11", "2023-12", "2024-01", "2024-02"))
    intercept[IllegalArgumentException] {
      ModelRegistry.monthRange("2024-02", "2023-11")
    }
  }

  test("idempotent append: loading the same batch twice equals loading once") {
    val spark = SparkSpec.session
    import spark.implicits._
    val batch = Seq((1L, "a"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val empty = batch.filter(lit(false))
    val first = StarSchema.idempotentAppend(batch, empty, Seq("k"))
    assert(first.count() === 3) // in-batch dedup
    val second = StarSchema.idempotentAppend(batch, first, Seq("k"))
    assert(second.count() === 0) // re-load adds nothing
  }

  test("as-of joins: native exec == composed == brute-force on random inputs") {
    val spark = SparkSpec.session
    import spark.implicits._
    import graft.operators.AsOfJoin
    // random (key, ts, value) tables with deliberate key overlap, duplicate
    // timestamps, and keys present on only one side
    val rowGen = for {
      k <- Gen.choose(0L, 6L)
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(-100, 100)
    } yield (k, t, v.toDouble)
    val caseGen = Gen.zip(Gen.listOfN(30, rowGen), Gen.listOfN(30, rowGen))
    forAll(caseGen, n = 8) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
      val right = rRows.map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000), v) }
      val lDf = left.toDF("row_id", "k", "ts")
      val rDf = right.toDF("k", "ts", "v")
      // brute force references mirror the composed form's payload tiebreak:
      // backward takes last() over ascending (ts, payload) => MAX payload at
      // a tied ts; forward takes first() => MIN payload at a tied ts
      def bruteBack(id: Long, k: Long, t: Long): Option[Double] = {
        val c = right.filter(r => r._1 == k && r._2.getTime <= t * 1000)
        if (c.isEmpty) None else Some(c.maxBy(r => (r._2.getTime, r._3))._3)
      }
      def bruteFwd(id: Long, k: Long, t: Long): Option[Double] = {
        val c = right.filter(r => r._1 == k && r._2.getTime >= t * 1000)
        if (c.isEmpty) None else Some(c.minBy(r => (r._2.getTime, r._3))._3)
      }
      def res(df: org.apache.spark.sql.DataFrame) =
        df.select("row_id", "v").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
      val cb = res(AsOfJoin.asOfBackward(lDf, rDf, "k", "ts", Seq("v")))
      val nb = res(AsOfJoin.asOfBackwardNative(lDf, rDf, "k", "ts", Seq("v")))
      val cf = res(AsOfJoin.asOfForward(lDf, rDf, "k", "ts", Seq("v")))
      val nf = res(AsOfJoin.asOfForwardNative(lDf, rDf, "k", "ts", Seq("v")))
      val bb = res(AsOfJoin.asOfBackwardBroadcast(lDf, rDf, "k", "ts", Seq("v")))
      val bf = res(AsOfJoin.asOfForwardBroadcast(lDf, rDf, "k", "ts", Seq("v")))
      left.foreach { case (id, k, ts) =>
        val t = ts.getTime / 1000
        // composed forms implement the documented payload tiebreak exactly
        assert(cb(id) === bruteBack(id, k, t), s"composed backward row $id")
        assert(cf(id) === bruteFwd(id, k, t), s"composed forward row $id")
        // the native exec's tie choice is 'any tied row' — values agree
        // whenever the brute-force match is unique at its timestamp
        val backTies = right.count(r => r._1 == k &&
          cb(id).isDefined && r._2.getTime == right.filter(x => x._1 == k &&
            x._2.getTime <= t * 1000).map(_._2.getTime).max)
        if (backTies <= 1) {
          assert(nb(id) === cb(id), s"native backward row $id")
          assert(bb(id) === cb(id), s"broadcast backward row $id")
        }
        val fwdCand = right.filter(x => x._1 == k && x._2.getTime >= t * 1000)
        val fwdTies = if (fwdCand.isEmpty) 0
          else fwdCand.count(_._2.getTime == fwdCand.map(_._2.getTime).min)
        if (fwdTies <= 1) {
          assert(nf(id) === cf(id), s"native forward row $id")
          assert(bf(id) === cf(id), s"broadcast forward row $id")
        }
      }
    }
  }

  test("promotion contract: candidate wins iff >=2 of 3 metrics improve") {
    import ModelRegistry.{Metrics, shouldPromote}
    val cur = Metrics(rmse = 5.0, mae = 2.0, r2 = 0.9)
    assert(shouldPromote(Metrics(4.0, 1.5, 0.95), cur))   // 3 wins
    assert(shouldPromote(Metrics(4.0, 1.5, 0.85), cur))   // 2 wins
    assert(!shouldPromote(Metrics(4.0, 2.5, 0.85), cur))  // 1 win
    assert(!shouldPromote(Metrics(6.0, 2.5, 0.85), cur))  // 0 wins
  }

  test("bm25: engine scores equal a plain-Scala reference on random corpora") {
    val spark = SparkSpec.session
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x")
    val docGen = Gen.chooseNum(1, 12)
      .flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(3, 8).flatMap(n => Gen.listOfN(n, docGen))
    val terms = Seq("alpha", "gamma")
    val (k1, b) = (1.2, 0.75)
    forAll(corpusGen, n = 12) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // plain-Scala reference, straight from the formula
      val tokenized = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val nDocs = docs.size
      val avgdl = tokenized.map(_._2.size).sum.toDouble / nDocs
      val dfOf = terms.map(t =>
        t -> tokenized.count(_._2.contains(t))).toMap
      val expect = tokenized.flatMap { case (id, toks) =>
        val s = terms.map { t =>
          val tf = toks.count(_ == t)
          if (tf == 0) 0.0 else {
            val idf = math.log((nDocs - dfOf(t) + 0.5) / (dfOf(t) + 0.5) + 1.0)
            idf * tf * (k1 + 1.0) /
              (tf + k1 * (1.0 - b + b * toks.size / avgdl))
          }
        }.sum
        if (s == 0.0) None
        else Some(id -> math.round(s * 10000.0) / 10000.0)
      }.toMap
      val got = graft.functions.TextOps
        .bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text", terms, nDocs)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(got === expect, s"corpus: $texts")
    }
  }

  test("bounded top-k heap law: any chunking + merge order equals sort-take-k") {
    // the algebraic-aggregate contract behind graft_topk: partial heaps
    // over arbitrary partition boundaries, merged in arbitrary order, give
    // exactly the (score desc, tag asc) prefix — the law that makes the
    // Partial/Final split safe under any shuffle layout. Narrow tag/score
    // ranges force score ties so the tag tie-break is exercised.
    def drain(h: graft.functions.TopKHeap): List[(Double, Long)] =
      (0 until h.size).map(i => (h.scores(i), h.tags(i))).toList
        .sortBy { case (s, t) => (-s, t) }
    val pairGen = Gen.zip(
      Gen.choose(0, 20).map(_.toDouble / 2.0), Gen.choose(0L, 15L))
    forAll(Gen.zip(Gen.listOf(pairGen), Gen.choose(1, 8)), n = 300) { case (xs, k) =>
      val ref = xs.sortBy { case (s, t) => (-s, t) }.take(k)
      val chunkSize = 1 + (xs.length % 5)
      val partials = xs.grouped(chunkSize).map { ch =>
        val h = new graft.functions.TopKHeap(k)
        ch.foreach { case (s, t) => h.insert(s, t) }
        h
      }.toList
      // merge right-to-left (a different order than Spark's left fold)
      val merged = partials.reverse.foldLeft(new graft.functions.TopKHeap(k)) {
        (acc, h) =>
          (0 until h.size).foreach(i => acc.insert(h.scores(i), h.tags(i)))
          acc
      }
      assert(drain(merged) === ref, s"k=$k xs=$xs")
    }
  }
  test("transaction log: snapshotAt and any checkpoint replay match a reference fold") {
    val spark = SparkSpec.session
    import spark.implicits._
    import graft.warehouse.Layout
    // random logs over 6 files x 5 versions with adds and removes; at most
    // one action per (version, file) so latest-action-wins is well-defined
    val actionGen = for {
      v <- Gen.choose(0, 4)
      f <- Gen.choose(0, 5)
      add <- Gen.oneOf(true, false)
      r <- Gen.choose(1L, 100L)
    } yield (v, if (add) "add" else "remove", s"f$f", "p", r, r * 10)
    val logGen = Gen.listOfN(15, actionGen).map(as =>
      as.groupBy(a => (a._1, a._3)).map(_._2.head).toList)
    forAll(logGen, n = 5) { actions =>
      val log = actions.toDF("version", "action", "file", "part", "n_rows", "bytes")
      // reference fold: a file is live at asOf iff its latest action with
      // version <= asOf is an add
      def refLive(asOf: Int): Set[String] =
        actions.filter(_._1 <= asOf).groupBy(_._3)
          .collect { case (f, as) if as.maxBy(_._1)._2 == "add" => f }.toSet
      def live(df: org.apache.spark.sql.DataFrame, v: Int): Set[String] =
        Layout.snapshotAt(df, v).select("file").collect()
          .map(_.getString(0)).toSet
      for (v <- Seq(0, 2, 4)) {
        assert(live(log, v) === refLive(v), s"snapshotAt($v) on $actions")
        // replay equivalence: a checkpoint at ANY w <= v is invisible at v
        for (w <- 0 to v by 2) {
          assert(live(Layout.checkpointLog(log, w), v) === refLive(v),
            s"checkpoint($w) replayed to $v on $actions")
        }
      }
    }
  }
}
