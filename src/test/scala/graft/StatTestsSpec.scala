package graft

import org.apache.spark.sql.functions._
import graft.learn.StatTests

/** scipy.stats parity checks for the hypothesis-test module. The
  * statistics are differentially verified against DuckDB in LearnQ
  * (learn_ttest_*, learn_chisquare, learn_gtest, learn_ks2,
  * learn_rankdata*); here we pin the special-function p-value math
  * against CLOSED FORMS (no scipy in the build environment):
  *  - χ² survival with even dof: Q(x;2) = e^{−x/2}, Q(x;4) = e^{−x/2}(1+x/2)
  *  - Student-t two-sided with df=1 (Cauchy): p = 1 − (2/π)·atan|t|;
  *    df=2: p = 1 − |t|/√(2+t²)
  *  - I_x(a,1) = x^a, I_x(1,b) = 1 − (1−x)^b
  * plus hand-computed scipy doc examples for the statistics themselves.
  */
class StatTestsSpec extends SparkSpecBase {
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol

  test("lnGamma matches factorials and the half-integer closed form") {
    // Γ(n) = (n−1)!
    assert(approx(StatTests.lnGamma(5.0), math.log(24.0), 1e-12))
    assert(approx(StatTests.lnGamma(10.0), math.log(362880.0), 1e-9))
    // Γ(1/2) = √π
    assert(approx(StatTests.lnGamma(0.5), 0.5 * math.log(math.Pi), 1e-12))
    // Γ(3/2) = √π/2
    assert(approx(StatTests.lnGamma(1.5), math.log(math.sqrt(math.Pi) / 2.0), 1e-12))
  }

  test("regIncBeta matches its closed forms and symmetry") {
    for (x <- Seq(0.05, 0.3, 0.5, 0.77, 0.99)) {
      assert(approx(StatTests.regIncBeta(1.0, 1.0, x), x, 1e-12))
      assert(approx(StatTests.regIncBeta(2.5, 1.0, x), math.pow(x, 2.5), 1e-12))
      assert(approx(StatTests.regIncBeta(1.0, 3.0, x), 1.0 - math.pow(1.0 - x, 3.0), 1e-12))
      // I_x(a,b) = 1 − I_{1−x}(b,a)
      assert(approx(StatTests.regIncBeta(2.0, 3.5, x),
        1.0 - StatTests.regIncBeta(3.5, 2.0, 1.0 - x), 1e-12))
    }
  }

  test("chi2Sf matches the even-dof closed forms") {
    for (x <- Seq(0.5, 2.0, 3.84, 7.9)) {
      assert(approx(StatTests.chi2Sf(x, 2.0), math.exp(-x / 2.0), 1e-10))
      assert(approx(StatTests.chi2Sf(x, 4.0), math.exp(-x / 2.0) * (1.0 + x / 2.0), 1e-10))
      assert(approx(StatTests.chi2Sf(x, 6.0),
        math.exp(-x / 2.0) * (1.0 + x / 2.0 + x * x / 8.0), 1e-10))
    }
  }

  test("studentTwoSidedP matches the df=1 (Cauchy) and df=2 closed forms") {
    for (t <- Seq(0.5, 1.0, 1.7320508075688772, 3.0)) {
      assert(approx(StatTests.studentTwoSidedP(t, 1.0),
        1.0 - 2.0 / math.Pi * math.atan(t), 1e-10))
      assert(approx(StatTests.studentTwoSidedP(t, 2.0),
        1.0 - t / math.sqrt(2.0 + t * t), 1e-10))
      // symmetry in t
      assert(StatTests.studentTwoSidedP(-t, 5.0) == StatTests.studentTwoSidedP(t, 5.0))
    }
    assert(approx(StatTests.studentTwoSidedP(0.0, 7.0), 1.0, 1e-12))
  }

  test("kolmogorovSf is a proper survival function with known pivots") {
    assert(StatTests.kolmogorovSf(0.0) == 1.0)
    assert(StatTests.kolmogorovSf(10.0) < 1e-12)
    // monotone decreasing
    val xs = (1 to 40).map(_ * 0.1)
    val vals = xs.map(StatTests.kolmogorovSf)
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    // the classical α=0.05 critical value λ≈1.358
    val p = StatTests.kolmogorovSf(1.3581015)
    assert(p > 0.045 && p < 0.055, s"K-sf(1.358)=$p")
  }

  test("ttest_1samp: scipy semantics on a hand-checked sample") {
    // data [1,2,3], popmean 1 → mean 2, var 1, t = 1/√(1/3) = √3, df 2
    // two-sided p (df=2 closed form) = 1 − √3/√5
    val df = Seq(1L, 2L, 3L).toDF("x")
    val r = StatTests.ttest1Samp(df, "x", 1.0).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("s1") == 6L)
    assert(r.getAs[Long]("s2") == 14L)
    assert(approx(r.getAs[Double]("statistic"), math.sqrt(3.0), 1e-12))
    assert(approx(r.getAs[Double]("pvalue"), 1.0 - math.sqrt(3.0 / 5.0), 1e-10))
  }

  test("ttest_1samp: fractional inputs go through exact decimal sums") {
    // [1.5, 2.5, 3.5] popmean 2 → mean 2.5, var 1, t = 0.5/√(1/3)
    val df = Seq(1.5, 2.5, 3.5).toDF("x")
    val r = StatTests.ttest1Samp(df, "x", 2.0).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(approx(r.getAs[Double]("statistic"), 0.5 * math.sqrt(3.0), 1e-12))
  }

  test("ttest_rel equals ttest_1samp on the difference") {
    val df = Seq((3L, 1L), (5L, 2L), (7L, 3L)).toDF("a", "b")
    // diffs [2,3,4]: mean 3, var 1, t = 3/√(1/3) = 3√3
    val r = StatTests.ttestRel(df, "a", "b").head()
    assert(approx(r.getAs[Double]("statistic"), 3.0 * math.sqrt(3.0), 1e-12))
  }

  test("ttest_ind: pooled and Welch match the hand-computed forms") {
    // a=[1,2,3,4] (m 2.5, v 5/3), b=[2,4,6,8] (m 5, v 20/3), n=4 each
    // pooled: svar 25/6, t = −2.5/√(25/12) = −√3, df 6
    // Welch: same t (equal n), df = (25/12)²/((5/12)²/3 + (20/12)²/3)
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++ Seq(2L, 4L, 6L, 8L).map(("b", _)))
      .toDF("g", "x")
    val pooled = StatTests.ttestInd(df, "x", "g", "a", "b", equalVar = true).head()
    assert(pooled.getAs[Long]("n1") == 4L && pooled.getAs[Long]("n2") == 4L)
    assert(approx(pooled.getAs[Double]("statistic"), -math.sqrt(3.0), 1e-12))
    assert(approx(pooled.getAs[Double]("dof"), 6.0, 1e-12))
    val welch = StatTests.ttestInd(df, "x", "g", "a", "b", equalVar = false).head()
    assert(approx(welch.getAs[Double]("statistic"), -math.sqrt(3.0), 1e-12))
    val vn1 = (5.0 / 3.0) / 4.0; val vn2 = (20.0 / 3.0) / 4.0
    val dfW = (vn1 + vn2) * (vn1 + vn2) / (vn1 * vn1 / 3.0 + vn2 * vn2 / 3.0)
    assert(approx(welch.getAs[Double]("dof"), dfW, 1e-9))
  }

  test("chisquare / G-test reproduce the scipy doc example") {
    // scipy.stats.power_divergence([16,18,16,14,12,12]): χ²=2.0;
    // λ=0 (G-test) statistic ≈ 2.006573 (2Σo·ln(o/e), e=88/6)
    val obs = Seq(16L, 18L, 16L, 14L, 12L, 12L).toDF("obs")
    val chi = StatTests.chisquare(obs, "obs").head()
    assert(chi.getAs[Long]("k") == 6L)
    // quantized at 1e-6 per term → within 6e-6 of exact
    assert(approx(chi.getAs[Double]("statistic"), 2.0, 1e-5))
    assert(approx(chi.getAs[Double]("dof"), 5.0, 1e-12))
    val e = 88.0 / 6.0
    val gExact = Seq(16.0, 18.0, 16.0, 14.0, 12.0, 12.0)
      .map(o => 2.0 * o * math.log(o / e)).sum
    val g = StatTests.powerDivergence(obs, "obs", lambda = 0.0).head()
    assert(approx(g.getAs[Double]("statistic"), gExact, 1e-5))
    // Cressie–Read λ=2/3 runs the generic branch
    val crExact = Seq(16.0, 18.0, 16.0, 14.0, 12.0, 12.0)
      .map(o => 2.0 / ((2.0 / 3.0) * (5.0 / 3.0)) * o * (math.pow(o / e, 2.0 / 3.0) - 1.0)).sum
    val cr = StatTests.powerDivergence(obs, "obs", lambda = 2.0 / 3.0).head()
    assert(approx(cr.getAs[Double]("statistic"), crExact, 1e-5))
  }

  test("ks_2samp: exact integer statistic on a hand-checked pair") {
    // x=[1,2,3], y=[2,3,4]: D = 1/3 → d_num = D·9 = 3
    val x = Seq(1L, 2L, 3L).toDF("v")
    val y = Seq(2L, 3L, 4L).toDF("v")
    val r = StatTests.ks2Samp(x, "v", y, "v").head()
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Long]("d_num") == 3L)
    assert(approx(r.getAs[Double]("statistic"), 1.0 / 3.0, 1e-15))
    // identical samples → D = 0, p = 1
    val same = StatTests.ks2Samp(x, "v", x, "v").head()
    assert(same.getAs[Long]("d_num") == 0L)
    assert(approx(same.getAs[Double]("pvalue"), 1.0, 1e-12))
  }

  test("ks_1samp: hand-checked D against the uniform(0,1) CDF") {
    // x = [0.1, 0.4, 0.7], F(x) = x: ecdf steps at 1/3, 2/3, 1
    // D+ candidates: 1/3−0.1, 2/3−0.4, 1−0.7 = 0.3 (max);
    // D− candidates: 0.1−0, 0.4−1/3, 0.7−2/3 → 0.1
    val df = Seq(0.1, 0.4, 0.7).toDF("x")
    val r = StatTests.ks1Samp(df, "x", c => c).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(approx(r.getAs[Double]("statistic"), 0.3, 1e-15))
    val dMinus = StatTests.ks1Samp(df, "x", c => c, "less").head()
    assert(approx(dMinus.getAs[Double]("statistic"), 0.1, 1e-15))
    val dPlus = StatTests.ks1Samp(df, "x", c => c, "greater").head()
    assert(approx(dPlus.getAs[Double]("statistic"), 0.3, 1e-15))
    // one-sided asymptotic p = e^{−2nD²}
    assert(approx(dPlus.getAs[Double]("pvalue"), math.exp(-2.0 * 3.0 * 0.09), 1e-12))
  }

  test("spearman: ±1 on monotonic data, ties handled via average ranks") {
    val mono = Seq((1L, 10.0), (2L, 20.0), (3L, 35.0), (4L, 70.0)).toDF("x", "y")
    assert(approx(StatTests.spearman(mono, "x", "y").head().getAs[Double]("statistic"),
      1.0, 1e-12))
    val anti = Seq((1L, 9.0), (2L, 7.0), (3L, 5.0), (4L, 1.0)).toDF("x", "y")
    assert(approx(StatTests.spearman(anti, "x", "y").head().getAs[Double]("statistic"),
      -1.0, 1e-12))
    // scipy.stats.spearmanr([1,2,3,4,5], [5,6,7,8,7]) = 0.8207826816681233
    val tied = Seq((1L, 5.0), (2L, 6.0), (3L, 7.0), (4L, 8.0), (5L, 7.0)).toDF("x", "y")
    assert(approx(StatTests.spearman(tied, "x", "y").head().getAs[Double]("statistic"),
      0.8207826816681233, 1e-12))
  }

  test("mannwhitneyu: hand-checked U, U-symmetry, and tie correction") {
    // x=[1,2,4], y=[3,5,6]: pooled ranks 1..6; R1 = 1+2+4 = 7,
    // U1 = 7 − 3·4/2 = 1 → u2 = 2
    val x = Seq(1L, 2L, 4L).toDF("v")
    val y = Seq(3L, 5L, 6L).toDF("v")
    val r = StatTests.mannWhitneyU(x, "v", y, "v").head()
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Long]("u2") == 2L)
    assert(approx(r.getAs[Double]("statistic"), 1.0, 1e-15))
    // U1(x,y) + U1(y,x) = n1·n2
    val rSwap = StatTests.mannWhitneyU(y, "v", x, "v").head()
    assert(r.getAs[Long]("u2") + rSwap.getAs[Long]("u2") == 2L * 9L)
    val p = r.getAs[Double]("pvalue")
    // asymptotic two-sided with continuity: z = (1 − 4.5 + 0.5)/√5.25
    val zExp = (1.0 - 4.5 + 0.5) / math.sqrt(5.25)
    assert(p > 0.0 && p < 1.0)
    assert(math.abs(p - erfcRef(math.abs(zExp) / math.sqrt(2.0))) < 1.5e-7)
    // ties across the samples use average pooled ranks
    val xt = Seq(1L, 2L, 2L).toDF("v")
    val yt = Seq(2L, 3L, 3L).toDF("v")
    // pooled [1,2,2,2,3,3]: ranks 1, 3, 3, 3, 5.5, 5.5 → R1 = 7, U1 = 1
    val rt = StatTests.mannWhitneyU(xt, "v", yt, "v").head()
    assert(rt.getAs[Long]("u2") == 2L)
  }

  private def erfcRef(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val poly = t * (0.254829592 + t * (-0.284496736 +
      t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    poly * math.exp(-x * x)
  }

  test("rankdata: all five scipy tie methods on [1,2,2,3]") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)).toDF("id", "v")
    def ranksOf(method: String, rankCol: String): Map[Long, Long] =
      StatTests.rankdata(df, "v", method, orderCols = Seq("id"))
        .select($"id", col(rankCol)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // average (doubled): [1, 2.5, 2.5, 4] → rank2 [2, 5, 5, 8]
    assert(ranksOf("average", "rank2") == Map(1L -> 2L, 2L -> 5L, 3L -> 5L, 4L -> 8L))
    assert(ranksOf("min", "rank") == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
    assert(ranksOf("max", "rank") == Map(1L -> 1L, 2L -> 3L, 3L -> 3L, 4L -> 4L))
    assert(ranksOf("dense", "rank") == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L))
    // ordinal breaks the tie by appearance order (id)
    assert(ranksOf("ordinal", "rank") == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("rankdata is partitioning-invariant (the prefix stitch is exact)") {
    val base = (1 to 500).map(i => (i.toLong, (i % 37).toLong))
    val one = StatTests.rankdata(base.toDF("id", "v").coalesce(1), "v", "average")
      .select($"id", $"rank2").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val many = StatTests.rankdata(base.toDF("id", "v").repartition(7), "v", "average")
      .select($"id", $"rank2").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one == many)
  }

  test("f_oneway: scipy value on a hand case; k=2 equals pooled t²") {
    // f_oneway([1,2,3,4],[2,4,6,8],[5,5,5,5]): means 2.5/5/5, grand 25/6
    // → SSb = 50/3, SSw = 25, F = (SSb/2)/(SSw/9) = 3 exactly;
    // p = I_{9/15}(4.5, 1) = 0.10038772833369619 (independent betainc)
    val df3 = (Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(2, 4, 6, 8).map(("b", _)) ++
      Seq(5, 5, 5, 5).map(("c", _))).toDF("g", "x")
    val r = StatTests.fOneway(df3, "x", "g").collect().head
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_total") == 12L)
    assert(math.abs(r.getAs[Double]("statistic") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ss_between") - 50.0 / 3.0) < 1e-10)
    assert(math.abs(r.getAs[Double]("ss_within") - 25.0) < 1e-10)
    assert(math.abs(r.getAs[Double]("pvalue") - 0.10038772833369619) < 1e-9)
    // two groups: F must equal the pooled two-sample t² with p agreeing
    val df2 = (Seq(1, 2, 3, 4, 5).map(("a", _)) ++
      Seq(3, 5, 7, 9, 11).map(("b", _))).toDF("g", "x")
    val f2 = StatTests.fOneway(df2, "x", "g").collect().head
    val t2 = StatTests.ttestInd(df2, "x", "g", "a", "b").collect().head
    val tt = t2.getAs[Double]("statistic")
    assert(math.abs(f2.getAs[Double]("statistic") - tt * tt) < 1e-10)
    assert(math.abs(f2.getAs[Double]("pvalue") - t2.getAs[Double]("pvalue")) < 1e-9)
  }

  test("wilcoxon: hand-ranked signed-rank statistic, zeros dropped, ties counted") {
    // pairs with diffs d = [-2, 4, -6, 8, 10, 0]: the zero drops (n=5),
    // |d| = [2,4,6,8,10] all distinct → ranks 1..5; W+ = 2+4+5 = 11,
    // W- = 4, T = 4. scipy.stats.wilcoxon(mode='approx',
    // correction=False): z = (4 - 7.5)/sqrt(13.75) = -0.9439
    val xs = Seq(1.0, 5.0, 1.0, 9.0, 11.0, 3.0)
    val ys = Seq(3.0, 1.0, 7.0, 1.0, 1.0, 3.0)
    val df = xs.zip(ys).toDF("x", "y")
    val r = StatTests.wilcoxon(df, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("w2plus") == 22L, "2·W+ = 22")
    assert(r.getAs[Long]("t2") == 8L, "2·min(W+,W-) = 8")
    assert(r.getAs[Long]("ties") == 0L)
    val z = r.getAs[Double]("zstat")
    assert(math.abs(z - (4.0 - 7.5) / math.sqrt(13.75)) < 1e-12)
    // p = erfc(|z|/√2): two-sided normal
    assert(math.abs(r.getAs[Double]("pvalue") -
      StatTests.regGammaQ(0.5, z * z / 2.0)) < 1e-15)
    // tied |d| engage the tie correction
    val dft = Seq((3.0, 1.0), (1.0, 3.0), (5.0, 3.0), (0.0, 2.0))
      .toDF("x", "y") // d = 2, -2, 2, -2 → all |d|=2, t=4 → ties=60
    val rt = StatTests.wilcoxon(dft, "x", "y").collect().head
    assert(rt.getAs[Long]("ties") == 60L)
  }

  test("kruskal: no-tie closed form and scipy two-group example") {
    // kruskal([1,3,5,7],[2,4,6,8]): pooled ranks interleave; no ties.
    // R1 = 1+3+5+7 = 16, R2 = 2+4+6+8 = 20, N=8 →
    // H = 12/(8·9)·(16²/4 + 20²/4) − 3·9 = (12/72)·164 − 27 = 0.3333…
    val df = (Seq(1, 3, 5, 7).map(("a", _)) ++ Seq(2, 4, 6, 8).map(("b", _)))
      .toDF("g", "x")
    val r = StatTests.kruskal(df, "x", "g").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("ties") == 0L)
    assert(math.abs(r.getAs[Double]("statistic") - 1.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("pvalue") -
      StatTests.chi2Sf(1.0 / 3.0, 1.0)) < 1e-15)
  }

  test("kendallTau: perfect order, perfect reversal, ties, and the guard") {
    val up = (1 to 20).map(i => (i.toDouble, (i * 2).toDouble)).toDF("x", "y")
    assert(math.abs(StatTests.kendallTau(up, "x", "y")
      .collect().head.getAs[Double]("statistic") - 1.0) < 1e-12)
    val down = (1 to 20).map(i => (i.toDouble, (21 - i).toDouble)).toDF("x", "y")
    assert(math.abs(StatTests.kendallTau(down, "x", "y")
      .collect().head.getAs[Double]("statistic") + 1.0) < 1e-12)
    // scipy kendalltau([1,2,3,4],[1,3,2,4]) = 2/3 (c=5, d=1, no ties)
    val mid = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)).toDF("x", "y")
    val m = StatTests.kendallTau(mid, "x", "y").collect().head
    assert(m.getAs[Long]("concordant") == 5L && m.getAs[Long]("discordant") == 1L)
    assert(math.abs(m.getAs[Double]("statistic") - 2.0 / 3.0) < 1e-12)
    intercept[IllegalArgumentException] {
      StatTests.kendallTau((1 to 30).map(i => (i.toDouble, i.toDouble))
        .toDF("x", "y"), "x", "y", maxRows = 10)
    }
  }

  test("dagostino: symmetry, platykurtic sign, the K² identity, shift invariance") {
    // a perfectly symmetric sample has m3 = 0 EXACTLY (integer sums) →
    // y = 0, and scipy's y == 0 → 1 substitution kicks in:
    // Z = δ·ln(1/α + √(1/α² + 1)), NOT 0 (scipy.stats.skewtest source)
    val sym = ((1 to 60) ++ (1 to 60).map(v => 122 - v))
      .map(v => ("g", v.toLong)).toDF("grp", "v")
    val rs = StatTests.dagostino(sym, "v", "grp").collect().head
    val nD = 120.0
    val b2t = 3.0 * (nD * nD + 27.0 * nD - 70.0) * (nD + 1.0) * (nD + 3.0) /
      ((nD - 2.0) * (nD + 5.0) * (nD + 7.0) * (nD + 9.0))
    val w2t = -1.0 + math.sqrt(2.0 * (b2t - 1.0))
    val deltaT = 1.0 / math.sqrt(0.5 * math.log(w2t))
    val alphaT = math.sqrt(2.0 / (w2t - 1.0))
    val zExp = deltaT * math.log(1.0 / alphaT +
      math.sqrt(1.0 / alphaT * (1.0 / alphaT) + 1.0))
    assert(approx(rs.getAs[Double]("z_skew"), zExp, 1e-9))
    val pSym = rs.getAs[Double]("p_skew")
    assert(pSym > 0.0 && pSym < 1.0)
    // uniform integers are platykurtic: b2 ≈ 1.8 < 3 → z_kurt < 0; and
    // the omnibus identity K² = z_skew² + z_kurt², p_k2 = exp(−K²/2)
    val uni = (1 to 200).map(v => ("g", (v % 50).toLong)).toDF("grp", "v")
    val ru = StatTests.dagostino(uni, "v", "grp").collect().head
    assert(ru.getAs[Double]("z_kurt") < -1.0)
    val z1 = ru.getAs[Double]("z_skew"); val z2 = ru.getAs[Double]("z_kurt")
    assert(approx(ru.getAs[Double]("k2"), z1 * z1 + z2 * z2, 1e-12))
    assert(approx(ru.getAs[Double]("p_k2"),
      math.exp(-ru.getAs[Double]("k2") / 2.0), 1e-15))
    // location shift leaves the standardized moments (hence Zs) invariant
    val shifted = (1 to 200).map(v => ("g", (v % 50).toLong + 1000L)).toDF("grp", "v")
    val rh = StatTests.dagostino(shifted, "v", "grp").collect().head
    assert(approx(rh.getAs[Double]("z_skew"), z1, 1e-6))
    assert(approx(rh.getAs[Double]("z_kurt"), z2, 1e-6))
    // non-integral value column is rejected loudly
    intercept[IllegalArgumentException] {
      StatTests.dagostino(Seq(("g", 1.5)).toDF("grp", "v"), "v", "grp")
    }
  }
}
