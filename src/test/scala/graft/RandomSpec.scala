package graft

import org.apache.spark.sql.functions._
import graft.api.GraftSession

/** Moment checks for the random-distribution sources (reference
  * mt.random.*): each family's sample mean/variance must sit within a few
  * standard errors of the closed-form moments. Seeded generators make every
  * assertion deterministic. The inverse-CDF arithmetic itself is
  * differential-checked by the op_random_invcdf oracle query.
  */
class RandomSpec extends SparkSpecBase {

  private lazy val g = GraftSession(spark)
  private val n = 20000L

  private def meanVar(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val r = df.agg(avg(col("value")), var_samp(col("value"))).collect().head
    (r.getDouble(0), r.getDouble(1))
  }

  private def checkMoments(name: String, df: org.apache.spark.sql.DataFrame,
      mean: Double, variance: Double, tol: Double): Unit = {
    val (m, v) = meanVar(df)
    assert(math.abs(m - mean) < tol, s"$name mean $m != $mean ± $tol")
    assert(math.abs(v - variance) < tol * 6, s"$name var $v != $variance")
  }

  test("inverse-CDF families match closed-form moments") {
    checkMoments("weibull(2,3)", g.randomWeibull(n, 2.0, 3.0).df,
      3.0 * math.sqrt(math.Pi) / 2, 9.0 * (1.0 - math.Pi / 4), 0.05)
    // pareto(3) (Lomax): mean 1/(a-1)=0.5, var a/((a-1)^2 (a-2)) = 0.75
    checkMoments("pareto(3)", g.randomPareto(n, 3.0).df, 0.5, 0.75, 0.1)
    // gumbel(0,1): mean γ≈0.5772, var π²/6
    checkMoments("gumbel", g.randomGumbel(n).df,
      0.5772156649, math.Pi * math.Pi / 6, 0.05)
    checkMoments("laplace(0,1)", g.randomLaplace(n).df, 0.0, 2.0, 0.05)
    // logistic(0,1): mean 0, var π²/3
    checkMoments("logistic", g.randomLogistic(n).df,
      0.0, math.Pi * math.Pi / 3, 0.06)
    // rayleigh(1): mean sqrt(π/2), var (4-π)/2
    checkMoments("rayleigh", g.randomRayleigh(n).df,
      math.sqrt(math.Pi / 2), (4 - math.Pi) / 2, 0.05)
    // power(3): mean a/(a+1), var a/((a+1)^2 (a+2))
    checkMoments("power(3)", g.randomPower(n, 3.0).df, 0.75, 3.0 / 80, 0.03)
    // triangular(0,1,4): mean (a+b+c)/3, var (a²+b²+c²-ab-ac-bc)/18
    checkMoments("triangular", g.randomTriangular(n, 0.0, 1.0, 4.0).df,
      5.0 / 3, 13.0 / 18, 0.05)
    // geometric(0.3): mean 1/p, var (1-p)/p²
    checkMoments("geometric(0.3)",
      g.randomGeometric(n, 0.3).df.select(col("value").cast("double").as("value")),
      1.0 / 0.3, 0.7 / 0.09, 0.1)
  }

  test("commons-math sampled families match closed-form moments") {
    checkMoments("gamma(3,2)", g.randomGamma(n, 3.0, 2.0).df, 6.0, 12.0, 0.15)
    // beta(2,5): mean 2/7, var ab/((a+b)²(a+b+1))
    checkMoments("beta(2,5)", g.randomBeta(n, 2.0, 5.0).df,
      2.0 / 7, 10.0 / (49 * 8), 0.01)
    checkMoments("chisq(4)", g.randomChisquare(n, 4.0).df, 4.0, 8.0, 0.15)
    checkMoments("t(8)", g.randomStudentT(n, 8.0).df, 0.0, 8.0 / 6, 0.05)
    // F(8, 10): mean d2/(d2-2) = 1.25
    checkMoments("f(8,10)", g.randomF(n, 8.0, 10.0).df, 1.25,
      2 * 100 * 16.0 / (8 * 64 * 6), 0.1)
    checkMoments("poisson(6)", g.randomPoisson(n, 6.0).df, 6.0, 6.0, 0.15)
    checkMoments("binomial(20,0.3)", g.randomBinomial(n, 20, 0.3).df,
      6.0, 20 * 0.3 * 0.7, 0.15)
  }

  test("discrete/transform tail families match closed-form moments") {
    // negative binomial r=4, p=0.4: mean r(1-p)/p = 6, var r(1-p)/p² = 15
    checkMoments("negbinomial(4,0.4)", g.randomNegBinomial(n, 4, 0.4).df,
      6.0, 15.0, 0.2)
    // hypergeometric N=50, K=20, n=10: mean nK/N = 4
    checkMoments("hypergeo(50,20,10)", g.randomHypergeometric(n, 50, 20, 10).df,
      4.0, 10.0 * (20.0 / 50) * (30.0 / 50) * (40.0 / 49), 0.05)
    // wald(3, 9): mean μ = 3, var μ³/λ = 3
    checkMoments("wald(3,9)", g.randomWald(n, 3.0, 9.0).df, 3.0, 3.0, 0.1)
    // zipf: values in [1, nElements], frequencies monotone non-increasing
    val z = g.randomZipf(n, 10, 2.0).df
    val counts = z.groupBy(col("value")).count()
      .orderBy(col("value")).collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(counts.head._1 >= 1.0 && counts.last._1 <= 10.0)
    assert(counts.head._2 > counts.last._2 * 5, "zipf head should dominate tail")
  }

  test("dirichlet rows live on the simplex with alpha-proportional means") {
    val alpha = Seq(2.0, 3.0, 5.0)
    val df = g.randomDirichlet(5000, alpha).df
    val sums = df.select(aggregate(col("value"), lit(0.0), (a, x) => a + x))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
    val means = (1 to 3).map { i =>
      df.select(avg(element_at(col("value"), i))).collect().head.getDouble(0)
    }
    alpha.zip(means).foreach { case (a, m) =>
      assert(math.abs(m - a / 10.0) < 0.02, s"dirichlet mean $m != ${a / 10.0}")
    }
  }

  test("multivariate normal matches mean and covariance") {
    val mean = Seq(1.0, -2.0)
    val cov = Seq(Seq(2.0, 0.8), Seq(0.8, 1.0))
    val df = g.randomMultivariateNormal(20000, mean, cov).df
      .select(element_at(col("value"), 1).as("x"), element_at(col("value"), 2).as("y"))
    val r = df.agg(avg(col("x")), avg(col("y")), var_samp(col("x")),
      var_samp(col("y")), covar_samp(col("x"), col("y"))).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 0.05)
    assert(math.abs(r.getDouble(1) + 2.0) < 0.05)
    assert(math.abs(r.getDouble(2) - 2.0) < 0.12)
    assert(math.abs(r.getDouble(3) - 1.0) < 0.08)
    assert(math.abs(r.getDouble(4) - 0.8) < 0.08)
  }

  test("tail families (vonmises/logseries/noncentral) match closed-form moments") {
    // vonmises(0.5, 4): symmetric about μ=0.5, support within [-π, π]
    val vm = g.randomVonmises(n, 0.5, 4.0).df
    val (vmm, _) = meanVar(vm)
    assert(math.abs(vmm - 0.5) < 0.05, s"vonmises mean $vmm != 0.5")
    val ex = vm.agg(min(col("value")), max(col("value"))).collect().head
    assert(ex.getDouble(0) >= -math.Pi && ex.getDouble(1) <= math.Pi)
    // logseries(0.5): mean -p/((1-p)ln(1-p)) ≈ 1.442695, var ≈ 0.80403
    checkMoments("logseries(0.5)", g.randomLogseries(n, 0.5).df,
      1.4426950408889634, 0.80403, 0.05)
    // noncentral χ²(3, 2): mean df+λ = 5, var 2(df+2λ) = 14
    checkMoments("ncx2(3,2)", g.randomNoncentralChisquare(n, 3.0, 2.0).df,
      5.0, 14.0, 0.15)
    // noncentral F(8, 12, 3): mean d2(d1+λ)/(d1(d2-2)) = 12·11/(8·10) = 1.65
    val (fm, _) = meanVar(g.randomNoncentralF(n, 8.0, 12.0, 3.0).df)
    assert(math.abs(fm - 1.65) < 0.1, s"ncF mean $fm != 1.65")
  }

  test("multinomial rows sum to trials with p-proportional means") {
    val df = g.randomMultinomial(5000, 20, Seq(0.2, 0.3, 0.5)).df
    val sums = df.select(aggregate(col("value"), lit(0.0), (a, x) => a + x))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect()
    assert(sums.forall(_ == 20.0), "every multinomial row must sum to trials")
    val means = (1 to 3).map(i =>
      df.select(avg(element_at(col("value"), i))).collect().head.getDouble(0))
    Seq(4.0, 6.0, 10.0).zip(means).foreach { case (e, m) =>
      assert(math.abs(m - e) < 0.15, s"multinomial mean $m != $e")
    }
  }

  test("choice/permutation/shuffle: deterministic bijections and samples") {
    val p = g.permutation(1000, seed = 3L).df
    assert(p.select("value").distinct().count() == 1000)
    assert(p.select("pos").distinct().count() == 1000)
    val mm = p.agg(min(col("pos")), max(col("pos")),
      min(col("value")), max(col("value"))).collect().head
    assert((mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3)) ==
      ((0L, 999L, 0L, 999L)))
    val p2 = g.permutation(1000, seed = 3L).df.orderBy("pos").collect().toSeq
    assert(p.orderBy("pos").collect().toSeq == p2, "same seed → same permutation")
    val p3 = g.permutation(1000, seed = 4L).df.orderBy("pos").collect().toSeq
    assert(p2 != p3, "different seed → different permutation")

    val rc = g.randomChoice(20000, Seq("a", "b", "c"), Seq(0.2, 0.3, 0.5)).df
    val freq = rc.groupBy("value").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(freq("a") / 20000.0 - 0.2) < 0.02)
    assert(math.abs(freq("c") / 20000.0 - 0.5) < 0.02)

    import graft.api.GraftFrame
    val base = g.range(0, 100).df.withColumnRenamed("id", "k")
    val noRep = GraftFrame(base).choiceRows(10, "k", seed = 5L).df.collect()
    assert(noRep.length == 10 && noRep.map(_.getLong(0)).distinct.length == 10)
    val withRep = GraftFrame(base).choiceRows(250, "k", seed = 5L,
      withReplacement = true).df.collect().map(_.getLong(0))
    assert(withRep.length == 250 && withRep.forall(v => v >= 0 && v < 100))
    assert(withRep.distinct.length > 50, "250 draws over 100 rows should repeat")
    val sh = GraftFrame(base).shuffleRows("k", seed = 9L).df.collect().map(_.getLong(0)).toSeq
    assert(sh.sorted == (0L until 100L) && sh != (0L until 100L),
      "shuffle permutes without loss")
  }

  test("timedeltaRange generates evenly spaced deltas") {
    val td = g.timedeltaRange(5, 1500000L).df.orderBy("td_us")
      .select("td_us").collect().map(_.getLong(0)).toSeq
    assert(td == Seq(0L, 1500000L, 3000000L, 4500000L, 6000000L))
  }

  test("sampled generation is deterministic for a fixed seed and slicing") {
    val a = g.randomGamma(1000, 2.0, 1.0, seed = 7L).df
      .orderBy("id").select("value").collect().map(_.getDouble(0)).toSeq
    val b = g.randomGamma(1000, 2.0, 1.0, seed = 7L).df
      .orderBy("id").select("value").collect().map(_.getDouble(0)).toSeq
    assert(a == b)
    val c = g.randomGamma(1000, 2.0, 1.0, seed = 8L).df
      .orderBy("id").select("value").collect().map(_.getDouble(0)).toSeq
    assert(a != c)
  }

  test("numpy standard_*/legacy aliases delegate to their sources exactly") {
    def vals(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.orderBy("id").select("value").collect().map(_.getDouble(0)).toSeq
    assert(vals(g.standardGamma(500, 2.5, seed = 3L).df) ==
      vals(g.randomGamma(500, 2.5, 1.0, seed = 3L).df))
    assert(vals(g.standardT(500, 6.0, seed = 3L).df) ==
      vals(g.randomStudentT(500, 6.0, seed = 3L).df))
    assert(vals(g.standardExponential(500, seed = 3L).df) ==
      vals(g.randomExponential(500, 1.0, seed = 3L).df))
    assert(vals(g.standardCauchy(500, seed = 3L).df) ==
      vals(g.randomCauchy(500, 0.0, 1.0, seed = 3L).df))
    // random_integers is INCLUSIVE of hi (numpy legacy): both bounds hit
    val ri = g.randomIntegers(4000, 1, 3, seed = 5L).df
      .select("value").collect().map(_.getLong(0)).toSet
    assert(ri == Set(1L, 2L, 3L))
  }
}
