package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    // group "a": 9 values near 10 plus one far outlier; group "b": flat
    (Seq.fill(9)(("a", 10.0)) ++ Seq(("a", 1000.0)) ++
      (1 to 8).map(i => ("b", i.toDouble)))
      .toDF("g", "v")
  }

  test("zscore outliers: flags exactly the planted point, symmetric data has none") {
    val out = RobustStats.zscoreOutliers(df, "g", "v", 2.5)
      .collect().map(r => r.getString(0) -> r).toMap
    // one planted outlier at z = 9*sqrt(..)/.. — definitely beyond 2.5
    assert(out("a").getAs[Long]("n_outliers") === 1L)
    // uniform 1..8 has max |z| = 3.5/2.29 ≈ 1.53 < 2.5
    assert(out("b").getAs[Long]("n_outliers") === 0L)
    assert(out("b").getAs[Long]("n") === 8L)
  }

  test("MAD resists the outlier the mean cannot") {
    val out = RobustStats.medianAbsDeviation(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // group a: median 10 (outlier invisible), deviations are 0 ×9 and 990 —
    // median deviation 0
    assert(out("a").getAs[Double]("median_price") === 10.0)
    assert(out("a").getAs[Double]("mad") === 0.0)
    // group b: median 4.5, deviations {3.5,2.5,1.5,0.5}×2 — median 2.0
    assert(out("b").getAs[Double]("mad") === 2.0)
  }

  test("degenerate zero-variance group has no outliers and a null max z") {
    val s = spark
    import s.implicits._
    val flat = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val row = RobustStats.zscoreOutliers(flat, "g", "v", 2.5).collect().head
    // no spread => no outliers; the guard also keeps ANSI mode (Spark 4
    // default) from raising DIVIDE_BY_ZERO on the unguarded expression
    assert(row.getAs[Long]("n") === 3L)
    assert(row.getAs[Long]("n_outliers") === 0L)
    assert(row.isNullAt(row.fieldIndex("max_absz")))
  }

  test("winsorized mean is bounded by the clip band and counts clips") {
    val out = RobustStats.winsorizedMean(df, "g", "v", 0.05, 0.95)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_clipped_high") === 1L)
    val m = a.getAs[Double]("winsorized_mean")
    assert(m >= a.getAs[Double]("p_lo") && m <= a.getAs[Double]("p_hi"))
    // clipping the 1000 down must pull the mean far below the raw 109.0
    assert(m < 109.0)
  }

  test("equi-depth histogram: contiguous ascending bins, counts near-equal") {
    val s = spark
    import s.implicits._
    // heavily skewed values — the case a fixed-width histogram collapses on
    val skewed = (1 to 400).map(i => math.pow(1.02, i)).toDF("v")
    val bins = RobustStats.eqDepthHistogram(skewed, "v", 8)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Int]("bin")).toSeq === (0 until 8))
    assert(bins.map(_.getAs[Long]("n")).sum === 400L)
    // equal depth: every bin within ±1 of 50 rows despite the skew
    assert(bins.forall(r => math.abs(r.getAs[Long]("n") - 50L) <= 1))
    // bin ranges tile the value domain in order: lo asc, hi(i) == lo(i+1)
    val lohi = bins.map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    assert(lohi.forall { case (lo, hi) => lo <= hi })
    assert(lohi.sliding(2).forall { case Array((_, h), (l, _)) => h == l })
  }

  test("closed-form OLS recovers a noise-free planted model exactly") {
    val s = spark
    import s.implicits._
    // y = 10 + 2*x1 - 3*x2, zero noise: exact recovery, R2 = 1
    val rows = for { x1 <- 1 to 6; x2 <- 1 to 4 }
      yield (x1.toDouble, x2.toDouble, 10.0 + 2 * x1 - 3 * x2)
    val df = rows.toDF("x1", "x2", "y")
    val r = RobustStats.olsClosedForm(df, "y", "x1", "x2").collect().head
    assert(r.getLong(0) === 24L)
    assert(r.getDouble(1) === 10.0 && r.getDouble(2) === 2.0
      && r.getDouble(3) === -3.0 && r.getDouble(4) === 1.0)
    // a rank-deficient design (x2 = 2*x1) yields NULL betas, not a crash
    val degen = (1 to 8).map(i => (i.toDouble, 2.0 * i, i * 3.0))
      .toDF("x1", "x2", "y")
    val d = RobustStats.olsClosedForm(degen, "y", "x1", "x2").collect().head
    assert(d.isNullAt(1) && d.isNullAt(2) && d.isNullAt(3))
  }

  test("benford audit: leading digit from the integer string, law column pinned") {
    val s = spark
    import s.implicits._
    // values crafted so digits are unambiguous, incl. an exact power of 10
    // (the floor(log10) trap) and a sub-1 value that must be excluded
    val df = Seq(1000.0, 999.99, 123.4, 100.0, 25.0, 2.5, 0.7)
      .toDF("v")
    val out = RobustStats.benfordAudit(df, "v")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out.keySet === Set(1, 2, 9))
    assert(out(1)._1 === 3L && out(2)._1 === 2L && out(9)._1 === 1L)
    def law(d: Int) = BigDecimal(math.log10(1.0 + 1.0 / d))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1)._2 === law(1) && out(9)._2 === law(9))
  }

  test("k-fold OLS: leave-fold-out moments equal a literal refit without the fold") {
    val s = spark
    import s.implicits._
    // planted linear model with deterministic pseudo-noise, 3 folds by key
    val rows = (1 to 120).map { i =>
      val x1 = (i % 7).toDouble; val x2 = (i % 5).toDouble
      (i.toLong, x1, x2, 4.0 + 1.5 * x1 - 2.0 * x2 + (i % 9) / 10.0)
    }
    val df = rows.toDF("k", "x1", "x2", "y")
    val cv = RobustStats.kFoldOls(df, "y", "x1", "x2", col("k") % 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(cv.keySet === Set(0L, 1L, 2L))
    // fold 0's coefficients must equal an independent full fit on folds 1+2
    val refit = RobustStats.olsClosedForm(
      df.filter(col("k") % 3 =!= 0), "y", "x1", "x2").collect().head
    assert(cv(0).getDouble(3) === refit.getDouble(1), "beta0")
    assert(cv(0).getDouble(4) === refit.getDouble(2), "beta1")
    assert(cv(0).getDouble(5) === refit.getDouble(3), "beta2")
    // train/test partition the frame in every fold
    cv.values.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === 120L)
    }
  }

  test("conformal interval: ~1-alpha coverage on the disjoint half, planted noise") {
    val s = spark
    import s.implicits._
    // |noise| uniform on {0.0, 0.1, ..., 0.9} -> the 0.9-quantile interval
    // should cover ~90% of the test half
    // magnitude keyed on i/2 so the parity split is independent of it:
    // both halves see residuals uniform over {0.0, ..., 0.9}
    val df = (1 to 400).map { i =>
      (i.toLong, 10.0 + ((i / 2) % 10) * 0.1 * (if (i % 4 < 2) 1 else -1))
    }.toDF("k", "y").withColumn("pred", lit(10.0))
    val r = RobustStats.conformalInterval(df, "y", "pred",
      col("k") % 2 === 0, alpha = 0.1).collect().head
    val qhat = r.getDouble(1)
    val coverage = r.getDouble(3)
    assert(r.getLong(0) === 200L && r.getLong(2) === 200L)
    assert(qhat >= 0.8 && qhat <= 0.9, s"qhat=$qhat")
    assert(coverage >= 0.85 && coverage <= 1.0, s"coverage=$coverage")
  }

  test("ridge-IRLS logistic recovers a separable planted rule within shrinkage") {
    val s = spark
    import s.implicits._
    // y = 1 iff x > 0 with a wide margin: plain IRLS diverges (weights->0),
    // ridge keeps the step bounded; recovery means beta1 >> 0 and the fit
    // classifies the training set perfectly by sign
    val df = ((1 to 100).map(i => (i / 10.0, 1.0)) ++
      (1 to 100).map(i => (-i / 10.0, 0.0))).toList.toDF("x", "y")
    val r = RobustStats.logregIrls(df, iters = 4, lambda = 1.0).collect().head
    assert(r.getLong(0) === 200L && r.getLong(1) === 100L)
    val (b0, b1, ll) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(b1 > 1.0, s"separating slope not recovered: beta1=$b1")
    assert(math.abs(b0) < 1.0, s"symmetric data should give ~0 intercept: $b0")
    assert(ll < 0.2, s"log-loss should be small on separable data: $ll")
  }

  test("IRLS on zero-signal data shrinks to the base-rate intercept") {
    val s = spark
    import s.implicits._
    // x carries no information: beta1 ~ 0, sigmoid(beta0) ~ base rate 0.25
    val df = (1 to 400).map(i =>
      ((i % 7).toDouble, if (i % 4 == 0) 1.0 else 0.0)).toList.toDF("x", "y")
    val r = RobustStats.logregIrls(df, iters = 4, lambda = 1.0).collect().head
    val (b0, b1) = (r.getDouble(2), r.getDouble(3))
    val p = 1.0 / (1.0 + math.exp(-b0))
    assert(math.abs(b1) < 0.05, s"no-signal slope should be ~0: $b1")
    assert(math.abs(p - 0.25) < 0.05, s"sigmoid(intercept)=$p should be ~0.25")
  }
}
