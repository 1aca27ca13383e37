package graft.functions

import graft.SparkSpec

/** Hand-computed expectations for the Gopher quality rules and repetition
  * signals (the corpus-scale behavior is oracle-checked by the driver; this
  * pins the per-rule arithmetic on crafted docs). */
class TextOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("gopher rules: counts, ratios and keep flag on crafted docs") {
    val d = docs(
      1L -> "the cat sat",
      2L -> "a # b ... c")
    val out = TextOps.gopherRules(d, "doc_id", "text")
      .orderBy("doc_id").collect()

    val r1 = out(0)
    assert(r1.getAs[Int]("n_words") === 3)
    assert(r1.getAs[Double]("mean_word_len") === 3.0)
    assert(r1.getAs[Double]("symbol_ratio") === 0.0)
    assert(r1.getAs[Double]("alpha_word_frac") === 1.0)
    assert(r1.getAs[Int]("stop_hits") === 1)
    assert(!r1.getAs[Boolean]("keep")) // word count below the [50, 100k] band

    val r2 = out(1)
    assert(r2.getAs[Int]("n_words") === 5)
    // one '#' + one '...' over 5 words
    assert(r2.getAs[Double]("symbol_ratio") === 0.4)
    // 'a', 'b', 'c' are alphabetic; '#' and '...' are not
    assert(r2.getAs[Double]("alpha_word_frac") === 0.6)
    assert(r2.getAs[Int]("stop_hits") === 0)
    assert(!r2.getAs[Boolean]("keep"))
  }

  test("gopher keep flag accepts a long clean english doc") {
    val body = Seq.tabulate(60)(i => s"word$i").mkString(" ")
    val d = docs(1L -> s"the cat must have come to be with that dog and $body")
    val r = TextOps.gopherRules(d, "doc_id", "text").collect().head
    assert(r.getAs[Int]("n_words") >= 50 && r.getAs[Boolean]("keep"))
  }

  test("native vocab-hits kernel is bit-identical to the HOF form on real docs") {
    import org.apache.spark.sql.functions.col
    val real = graft.Tables(spark, sf001).documents
    val en = TextOps.langMarkers.toMap.apply("en")
    val rows = real.select(col("doc_id"),
      TextOps.vocabHits(col("text"), en).as("native"),
      TextOps.vocabHitsHof(col("text"), en).as("hof"),
      TextOps.langScores(TextOps.tokens(col("text"))).as("s_native"),
      TextOps.langScoresHof(TextOps.tokens(col("text"))).as("s_hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2), s"doc ${r.getLong(0)} vocab hits differ")
      assert(r.getSeq[Int](3) === r.getSeq[Int](4), s"doc ${r.getLong(0)} lang scores differ")
    }
  }

  test("NativeVocabHitsRule rewrites the plain size(filter(In)) shape to the kernel") {
    import org.apache.spark.sql.functions._
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(graft.plans.NativeVocabHitsRule))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ graft.plans.NativeVocabHitsRule
    val en = TextOps.langMarkers.toMap.apply("en")
    val d = graft.Tables(spark, sf001).documents
    // user code written with plain built-ins, no graft API in sight
    val df = d.select(col("doc_id"),
      size(filter(split(col("text"), " "), t => t.isin(en: _*))).as("hits"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_vocab_hits"),
      df.queryExecution.optimizedPlan.toString.linesIterator.take(3).mkString("\n"))
    // identical values to the un-rewritten HOF
    val got = df.orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exp = d.select(col("doc_id"), TextOps.vocabHitsHof(col("text"), en).as("h"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === exp && got.nonEmpty)
    // a filter on a non-literal vocabulary is left untouched
    val dyn = d.select(size(filter(split(col("text"), " "),
      t => t === col("lang"))).as("n"))
    assert(!dyn.queryExecution.optimizedPlan.toString.contains("graft_vocab_hits"))
  }

  test("repetition stats: top-word/bigram and distinct-word shares") {
    val d = docs(
      1L -> "x x y",
      2L -> "z")
    val out = TextOps.repetitionStats(d, "doc_id", "text")
      .orderBy("doc_id").collect()

    val r1 = out(0)
    assert(r1.getAs[Double]("top_word_frac") === 0.666667)
    assert(r1.getAs[Double]("distinct_word_frac") === 0.666667)
    assert(r1.getAs[Double]("top_bigram_frac") === 0.5) // 'x x' and 'x y' once each

    val r2 = out(1)
    assert(r2.getAs[Double]("top_word_frac") === 1.0)
    assert(r2.getAs[Double]("distinct_word_frac") === 1.0)
    assert(r2.getAs[Double]("top_bigram_frac") === 0.0) // no bigram in a 1-token doc
  }
}
