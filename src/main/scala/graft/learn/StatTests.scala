package graft.learn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** scipy.stats-parity hypothesis tests, re-expressed as distributed
  * aggregations (reference mars/tensor/stats: ttest.py, ks.py,
  * power_divergence.py, chisquare.py, rankdata.py — the reference
  * delegates the statistic math to scipy over tiled tensors; here each
  * test is one or two Catalyst aggregates over a column).
  *
  * Determinism contract (CLAUDE.md scaled-integer convention): every
  * cross-row sum that feeds a statistic is exact — BIGINT sums for
  * integral inputs, DECIMAL(38) sums otherwise — so the statistic is
  * identical under any partitioning / any row order. The downstream
  * per-row double arithmetic (divisions, sqrt) is deterministic IEEE.
  *
  * p-values need the regularized incomplete beta/gamma and Kolmogorov
  * survival functions, which have no Spark builtin and no fixed-form
  * Column expression (iterative continued fractions). They run as scalar
  * UDFs applied to the ONE aggregated row per test — never on a per-row
  * hot path — using the classical public algorithms (Lentz continued
  * fractions / power series, as in Abramowitz–Stegun §6.2/§6.5 and any
  * standard numerics text).
  *
  * 100 TB shape: ttest/chisquare are single partial+final aggregates
  * (one exchange); ks2Samp is groupBy-value (one exchange to distinct
  * values) then a range-partitioned prefix-sum stitch (bucket summaries
  * only cross the driver-free tiny window, same pattern as
  * GraftFrame.checkMonotonic); rankdata joins per-value rank blocks back
  * on the value key (one shuffle join), never a global single-partition
  * window over the data.
  */
object StatTests {

  // ------------------------------------------------------------------
  // scalar special functions (pure driver/executor math, public algos)
  // ------------------------------------------------------------------

  /** ln Γ(x), Lanczos approximation (g=7, n=9 coefficients — the
    * standard public parameterization), ~15 significant digits. */
  def lnGamma(x: Double): Double = {
    if (x.isNaN || x <= 0.0) return Double.NaN
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b) — power series inside the
    * convergence region, Lentz's continued fraction otherwise. */
  def regIncBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lnFront = a * math.log(x) + b * math.log1p(-x) -
      math.log(a) - (lnGamma(a) + lnGamma(b) - lnGamma(a + b))
    if (x > (a + 1.0) / (a + b + 2.0)) {
      1.0 - regIncBeta(b, a, 1.0 - x)
    } else {
      // Lentz continued fraction for the beta cf
      val tiny = 1e-300
      var f = 1.0; var cc = 1.0; var d = 0.0
      var i = 0
      var done = false
      while (i <= 300 && !done) {
        val m = i / 2
        val numer =
          if (i == 0) 1.0
          else if (i % 2 == 0) m * (b - m) * x / ((a + 2.0 * m - 1.0) * (a + 2.0 * m))
          else -(a + m) * (a + b + m) * x / ((a + 2.0 * m) * (a + 2.0 * m + 1.0))
        d = 1.0 + numer * d
        if (math.abs(d) < tiny) d = tiny
        d = 1.0 / d
        cc = 1.0 + numer / cc
        if (math.abs(cc) < tiny) cc = tiny
        val delta = cc * d
        f *= delta
        if (math.abs(1.0 - delta) < 1e-15) done = true
        i += 1
      }
      math.exp(lnFront) * (f - 1.0)
    }
  }

  /** Regularized lower incomplete gamma P(a, x) (series for x < a+1,
    * else 1 − continued-fraction Q). */
  def regGammaP(a: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x < a + 1.0) {
      var ap = a
      var sum = 1.0 / a
      var del = sum
      var i = 0
      while (i < 500 && math.abs(del) >= math.abs(sum) * 1e-16) {
        ap += 1.0
        del *= x / ap
        sum += del
        i += 1
      }
      sum * math.exp(-x + a * math.log(x) - lnGamma(a))
    } else 1.0 - regGammaQ(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x), Lentz continued fraction. */
  def regGammaQ(a: Double, x: Double): Double = {
    if (x <= 0.0) return 1.0
    if (x < a + 1.0) return 1.0 - regGammaP(a, x)
    val tiny = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / tiny
    var d = 1.0 / b
    var h = d
    var i = 1
    var done = false
    while (i <= 500 && !done) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b
      if (math.abs(d) < tiny) d = tiny
      c = b + an / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val delta = d * c
      h *= delta
      if (math.abs(delta - 1.0) < 1e-15) done = true
      i += 1
    }
    math.exp(-x + a * math.log(x) - lnGamma(a)) * h
  }

  /** Two-sided Student-t survival p-value: I_{df/(df+t²)}(df/2, 1/2). */
  def studentTwoSidedP(t: Double, dof: Double): Double =
    if (t.isNaN || dof <= 0.0) Double.NaN
    else regIncBeta(dof / 2.0, 0.5, dof / (dof + t * t))

  /** χ² survival function Q(k/2, x/2). */
  def chi2Sf(x: Double, k: Double): Double =
    if (x.isNaN || k <= 0.0) Double.NaN
    else if (x <= 0.0) 1.0
    else regGammaQ(k / 2.0, x / 2.0)

  /** Kolmogorov distribution survival 2 Σ (−1)^{j−1} e^{−2 j² λ²}
    * (the asymptotic two-sample KS p-value at λ = √(n1·n2/(n1+n2))·D,
    * scipy's mode='asymp'). */
  def kolmogorovSf(lambda: Double): Double = {
    if (lambda.isNaN) return Double.NaN
    if (lambda <= 0.0) return 1.0
    var sum = 0.0
    var j = 1
    var term = Double.MaxValue
    while (j <= 100 && math.abs(term) > 1e-17) {
      term = 2.0 * (if (j % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * j * j * lambda * lambda)
      sum += term
      j += 1
    }
    math.min(1.0, math.max(0.0, sum))
  }

  // single-row p-value UDFs (see object doc: no builtin, one row per test)
  private val tPvalUdf = udf((t: Double, dof: Double) => studentTwoSidedP(t, dof))
  private val chi2PvalUdf = udf((x: Double, k: Double) => chi2Sf(x, k))
  private val ksPvalUdf = udf((d: Double, n1: Long, n2: Long) => {
    val en = n1.toDouble * n2.toDouble / (n1.toDouble + n2.toDouble)
    kolmogorovSf(math.sqrt(en) * d)
  })

  // ------------------------------------------------------------------
  // exact-sum plumbing
  // ------------------------------------------------------------------

  private def isIntegral(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }

  /** (n, Σx, Σx²) with exact, order-free accumulation: BIGINT sums for
    * integral columns; DECIMAL(38) sums (Spark/DuckDB decimal addition is
    * exact) for fractional columns quantized at 1e-6 — the repo-wide
    * scaled-integer determinism convention applied at aggregate level. */
  private def exactMoments(df: DataFrame, valueCol: String): DataFrame = {
    val c = df(valueCol)
    if (isIntegral(df.schema(valueCol).dataType)) {
      df.agg(
        count(c).as("n"),
        sum(c.cast(LongType)).as("s1"),
        sum(c.cast(LongType) * c.cast(LongType)).as("s2"))
    } else {
      val q = c.cast(DecimalType(24, 6))
      df.agg(
        count(c).as("n"),
        sum(q).cast(DoubleType).as("s1"),
        sum((q * q).cast(DecimalType(38, 12))).cast(DoubleType).as("s2"))
    }
  }

  /** t statistic from exact moments; shared by the three t-tests. */
  private def tFromMoments(n: Column, s1: Column, s2: Column, popmean: Column): (Column, Column) = {
    val nd = n.cast(DoubleType)
    val s1d = s1.cast(DoubleType)
    val s2d = s2.cast(DoubleType)
    val mean = s1d / nd
    val variance = (s2d - s1d * s1d / nd) / (nd - lit(1.0))
    val t = (mean - popmean) / sqrt(variance / nd)
    (t, nd - lit(1.0))
  }

  // ------------------------------------------------------------------
  // t-tests (reference mars/tensor/stats/ttest.py:119+)
  // ------------------------------------------------------------------

  /** scipy.stats.ttest_1samp (two-sided). One partial+final aggregate;
    * output is a single row (n, s1, s2, mean, statistic, dof, pvalue). */
  def ttest1Samp(df: DataFrame, valueCol: String, popmean: Double): DataFrame = {
    val m = exactMoments(df, valueCol)
    val (t, dof) = tFromMoments(col("n"), col("s1"), col("s2"), lit(popmean))
    m.select(
      col("n"), col("s1"), col("s2"),
      (col("s1").cast(DoubleType) / col("n").cast(DoubleType)).as("mean"),
      t.as("statistic"), dof.as("dof"),
      tPvalUdf(t, dof).as("pvalue"))
  }

  /** scipy.stats.ttest_rel (paired, two-sided): the 1-sample test on the
    * per-row difference — exact when both columns are integral. */
  def ttestRel(df: DataFrame, col1: String, col2: String): DataFrame = {
    val diffed = df.select((df(col1) - df(col2)).as("__d"))
    ttest1Samp(diffed, "__d", 0.0)
  }

  /** scipy.stats.ttest_ind over a two-valued group column (two-sided).
    * equalVar=true pools the variance (Student); false is Welch with the
    * Welch–Satterthwaite dof (ttest.py:42-60 mirrors the same two
    * denominators). One grouped aggregate + a 2-row pivot — no second
    * scan of the data. */
  def ttestInd(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String, equalVar: Boolean = true): DataFrame = {
    val c = df(valueCol)
    val g = df(groupCol)
    val integral = isIntegral(df.schema(valueCol).dataType)
    val (x, x2): (Column, Column) =
      if (integral) (c.cast(LongType), c.cast(LongType) * c.cast(LongType))
      else {
        val q = c.cast(DecimalType(24, 6))
        (q.cast(DecimalType(38, 12)), (q * q).cast(DecimalType(38, 12)))
      }
    val side = when(g === lit(groupA), lit(1)).when(g === lit(groupB), lit(2))
    val grouped = df
      .select(side.as("__side"), x.as("__x"), x2.as("__x2"))
      .where(col("__side").isNotNull)
      .agg(
        count(when(col("__side") === 1, lit(1))).as("n1"),
        sum(when(col("__side") === 1, col("__x"))).cast(DoubleType).as("s1a"),
        sum(when(col("__side") === 1, col("__x2"))).cast(DoubleType).as("s2a"),
        count(when(col("__side") === 2, lit(1))).as("n2"),
        sum(when(col("__side") === 2, col("__x"))).cast(DoubleType).as("s1b"),
        sum(when(col("__side") === 2, col("__x2"))).cast(DoubleType).as("s2b"))
    val n1 = col("n1").cast(DoubleType); val n2 = col("n2").cast(DoubleType)
    val m1 = col("s1a") / n1; val m2 = col("s1b") / n2
    val v1 = (col("s2a") - col("s1a") * col("s1a") / n1) / (n1 - 1.0)
    val v2 = (col("s2b") - col("s1b") * col("s1b") / n2) / (n2 - 1.0)
    val (dof, denom) =
      if (equalVar) {
        val d = n1 + n2 - 2.0
        val svar = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / d
        (d, sqrt(svar * (lit(1.0) / n1 + lit(1.0) / n2)))
      } else {
        val vn1 = v1 / n1; val vn2 = v2 / n2
        val d = (vn1 + vn2) * (vn1 + vn2) /
          (vn1 * vn1 / (n1 - 1.0) + vn2 * vn2 / (n2 - 1.0))
        (coalesce(d, lit(1.0)), sqrt(vn1 + vn2))
      }
    val t = (m1 - m2) / denom
    grouped.select(
      col("n1"), col("n2"),
      m1.as("mean1"), m2.as("mean2"),
      t.as("statistic"), dof.as("dof"),
      tPvalUdf(t, dof).as("pvalue"))
  }

  /** scipy.stats.ttest_ind_from_stats (reference tensor/stats/ttest.py
    * ttest_ind_from_stats): the independent two-sample test computed
    * from per-row SUMMARY statistics (mean, std, nobs per side) rather
    * than raw samples — vectorized, one test per input row, so a frame
    * of thousands of (experiment, variant) summary rows runs every
    * test in a single scan with no shuffle at all. Appends statistic,
    * dof, pvalue. equalVar selects Student (pooled) vs Welch, same two
    * denominators as [[ttestInd]]. */
  def ttestIndFromStats(df: DataFrame, mean1: String, std1: String,
      nobs1: String, mean2: String, std2: String, nobs2: String,
      equalVar: Boolean = true): DataFrame = {
    val m1 = col(mean1).cast(DoubleType); val m2 = col(mean2).cast(DoubleType)
    val n1 = col(nobs1).cast(DoubleType); val n2 = col(nobs2).cast(DoubleType)
    val v1 = col(std1).cast(DoubleType) * col(std1).cast(DoubleType)
    val v2 = col(std2).cast(DoubleType) * col(std2).cast(DoubleType)
    val (dof, denom) =
      if (equalVar) {
        val d = n1 + n2 - 2.0
        val svar = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / d
        (d, sqrt(svar * (lit(1.0) / n1 + lit(1.0) / n2)))
      } else {
        val vn1 = v1 / n1; val vn2 = v2 / n2
        val d = (vn1 + vn2) * (vn1 + vn2) /
          (vn1 * vn1 / (n1 - 1.0) + vn2 * vn2 / (n2 - 1.0))
        (coalesce(d, lit(1.0)), sqrt(vn1 + vn2))
      }
    val t = (m1 - m2) / denom
    df.withColumn("statistic", t)
      .withColumn("dof", dof)
      .withColumn("pvalue", tPvalUdf(col("statistic"), col("dof")))
  }

  // ------------------------------------------------------------------
  // chisquare / power_divergence (power_divergence.py:52)
  // ------------------------------------------------------------------

  /** scipy.stats.power_divergence over a frame of category counts.
    * `expCol=None` uses the uniform expectation Σobs/k. λ selects the
    * family (1=Pearson χ², 0=G-test log-likelihood, −1 modified
    * log-likelihood, −1/2 Freeman–Tukey, 2/3 Cressie–Read). Per-category
    * terms are quantized to 1e-6 and summed as BIGINTs — the statistic is
    * identical under any category order or partitioning (CLAUDE.md
    * order-free-sum convention, applied in the operator because the
    * statistic is user-facing). */
  def powerDivergence(df: DataFrame, obsCol: String, expCol: Option[String] = None,
      lambda: Double = 1.0, ddof: Int = 0): DataFrame = {
    // lazy uniform expectation: total/k joined in as a broadcast scalar
    // (no driver action — the whole test stays one lazy plan)
    val base = expCol match {
      case Some(ec) =>
        df.select(df(obsCol).cast(DoubleType).as("__o"), df(ec).cast(DoubleType).as("__e"))
      case None =>
        val tot = df.agg(sum(df(obsCol).cast(DoubleType)).as("__tot"), count(lit(1)).as("__kk"))
        df.select(df(obsCol).cast(DoubleType).as("__o"))
          .crossJoin(broadcast(tot))
          .select(col("__o"), (col("__tot") / col("__kk").cast(DoubleType)).as("__e"))
    }
    val o = col("__o"); val e = col("__e")
    val term =
      if (lambda == 1.0) (o - e) * (o - e) / e
      else if (lambda == 0.0) lit(2.0) * o * log(o / e)
      else if (lambda == -1.0) lit(2.0) * e * log(e / o)
      else lit(2.0 / (lambda * (lambda + 1.0))) * o * (pow(o / e, lambda) - lit(1.0))
    val scaled = floor(term * 1e6 + lit(0.5)).cast(LongType)
    val agg = base.select(scaled.as("__t")).agg(
      (sum(col("__t")).cast(DoubleType) / 1e6).as("statistic"),
      count(lit(1)).as("k"))
    val dof = (col("k") - lit(1 + ddof)).cast(DoubleType)
    agg.select(
      col("k"), col("statistic"), dof.as("dof"),
      chi2PvalUdf(col("statistic"), dof).as("pvalue"))
  }

  /** scipy.stats.chisquare = power_divergence at λ=1 (chisquare.py:24). */
  def chisquare(df: DataFrame, obsCol: String, expCol: Option[String] = None,
      ddof: Int = 0): DataFrame =
    powerDivergence(df, obsCol, expCol, lambda = 1.0, ddof = ddof)

  // ------------------------------------------------------------------
  // two-sample Kolmogorov–Smirnov (ks.py:361 ks_2samp)
  // ------------------------------------------------------------------

  /** scipy.stats.ks_2samp (two-sided, asymptotic p-value). The statistic
    * is computed EXACTLY in integers: D·n1·n2 = max over distinct values
    * of |cum1·n2 − cum2·n1| — no floating point until the final division,
    * so the result is identical under any partitioning and directly
    * oracle-able as a BIGINT.
    *
    * Shape: union → groupBy(value) [one exchange, output = distinct
    * values] → range-partitioned per-bucket prefix sums stitched with a
    * bucket-summary window (≤ #partitions rows) — the checkMonotonic
    * pattern; no global single-partition window over the data. */
  def ks2Samp(df1: DataFrame, col1: String, df2: DataFrame, col2: String): DataFrame = {
    val a = df1.select(df1(col1).cast(DoubleType).as("__v"), lit(1L).as("__c1"), lit(0L).as("__c2"))
    val b = df2.select(df2(col2).cast(DoubleType).as("__v"), lit(0L).as("__c1"), lit(1L).as("__c2"))
    val counts = a.unionAll(b)
      .groupBy(col("__v"))
      .agg(sum(col("__c1")).as("__c1"), sum(col("__c2")).as("__c2"))
    val stitched = prefixStitch(counts, "__v", Seq("__c1", "__c2"))
      .select((col("__c1_before") + col("__c1")).as("__f1"),
        (col("__c2_before") + col("__c2")).as("__f2"))
    val n = counts.agg(sum(col("__c1")).as("n1"), sum(col("__c2")).as("n2"))
    // cum·n products can pass 2^63 at full scale — go through DECIMAL(38,0)
    // (exact 128-bit, mirroring DuckDB's HUGEINT intermediate) and narrow
    // the final max back to BIGINT (|D|·n1·n2 ≤ n1·n2; still guarded)
    val d38 = DecimalType(38, 0)
    val dNum = stitched.crossJoin(broadcast(n))
      .select(abs(col("__f1").cast(d38) * col("n2").cast(d38) -
          col("__f2").cast(d38) * col("n1").cast(d38)).as("__d"),
        col("n1"), col("n2"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("__d")).cast(LongType).as("d_num"))
    val stat = col("d_num").cast(DoubleType) /
      (col("n1").cast(DoubleType) * col("n2").cast(DoubleType))
    dNum.select(
      col("n1"), col("n2"), col("d_num"),
      stat.as("statistic"),
      ksPvalUdf(stat, col("n1"), col("n2")).as("pvalue"))
  }

  /** scipy.stats.ks_1samp (goodness of fit vs a given continuous CDF,
    * asymptotic p-value; ks.py:389). Per DISTINCT value with ordinal
    * rank block [before+1, before+cnt]:
    *   D+ ≥ (before+cnt)/n − F(v),  D− ≥ F(v) − before/n
    * and D = max over values — a max of per-row deterministic doubles,
    * order-free by construction. `alternative` ∈ two-sided|less|greater
    * (scipy: 'less' reports D−, 'greater' D+). Same shape as rankdata:
    * groupBy value + prefix stitch, no data-wide window. */
  def ks1Samp(df: DataFrame, valueCol: String, cdf: Column => Column,
      alternative: String = "two-sided"): DataFrame = {
    require(Set("two-sided", "less", "greater")(alternative), alternative)
    val blocks = rankBlocks(df.select(df(valueCol).cast(DoubleType).as("__v")), "__v")
    val n = blocks.groupBy().agg(max(col("__before") + col("__cnt")).as("n"))
    val f = cdf(col("__v"))
    val nd = col("n").cast(DoubleType)
    val dPlus = (col("__before") + col("__cnt")).cast(DoubleType) / nd - f
    val dMinus = f - col("__before").cast(DoubleType) / nd
    val gap = alternative match {
      case "two-sided" => greatest(dPlus, dMinus)
      case "greater"   => dPlus
      case "less"      => dMinus
    }
    val agg = blocks.crossJoin(broadcast(n))
      .groupBy(col("n")).agg(max(gap).as("statistic"))
    // one-sided asymptotic p = e^{−2nD²}; two-sided = Kolmogorov sf
    val pv =
      if (alternative == "two-sided")
        udf((d: Double, nn: Long) => kolmogorovSf(math.sqrt(nn.toDouble) * d))
          .apply(col("statistic"), col("n"))
      else
        udf((d: Double, nn: Long) =>
          math.min(1.0, math.exp(-2.0 * nn.toDouble * d * d)))
          .apply(col("statistic"), col("n"))
    agg.select(col("n"), col("statistic"), pv.as("pvalue"))
  }

  /** Spearman rank correlation (pandas corr(method='spearman') — a Spark
    * upside: the reference's corr tiles Pearson only,
    * mars/dataframe/statistics/corr.py `_check_supported_methods`).
    * Average-tie ranks from [[rankdata]] are doubled → all four moment
    * sums are exact integers (DECIMAL(38) against overflow at scale);
    * Pearson is affine-invariant so ρ(2·rank) = ρ(rank). */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val withRx = rankdata(df, xCol, "average").withColumnRenamed("rank2", "__rx")
    val withBoth = rankdata(withRx, yCol, "average").withColumnRenamed("rank2", "__ry")
    val d38 = DecimalType(38, 0)
    val rx = col("__rx").cast(d38); val ry = col("__ry").cast(d38)
    val m = withBoth.agg(
      count(lit(1)).as("n"),
      sum(rx).cast(DoubleType).as("sx"),
      sum(ry).cast(DoubleType).as("sy"),
      sum(rx * rx).cast(DoubleType).as("sxx"),
      sum(ry * ry).cast(DoubleType).as("syy"),
      sum(rx * ry).cast(DoubleType).as("sxy"))
    val nd = col("n").cast(DoubleType)
    val rho = (nd * col("sxy") - col("sx") * col("sy")) /
      sqrt((nd * col("sxx") - col("sx") * col("sx")) *
        (nd * col("syy") - col("sy") * col("sy")))
    m.select(col("n"), rho.as("statistic"))
  }

  /** Mann–Whitney U rank-sum test (scipy.stats.mannwhitneyu, two-sided,
    * normal approximation with tie correction — an upside beyond the
    * reference's stats module, natural here because the rank machinery
    * is shared). U1 = R1 − n1(n1+1)/2 where R1 sums sample-1 average
    * ranks over the pooled data; 2·U1 is an exact integer (doubled
    * ranks), emitted as `u2`. Shape: one pooled groupBy(value) with
    * per-side counts + the prefix stitch — no data-wide window. */
  def mannWhitneyU(df1: DataFrame, col1: String, df2: DataFrame, col2: String): DataFrame = {
    val a = df1.select(df1(col1).cast(DoubleType).as("__v"), lit(1L).as("__c1"), lit(0L).as("__c2"))
    val b = df2.select(df2(col2).cast(DoubleType).as("__v"), lit(0L).as("__c1"), lit(1L).as("__c2"))
    val counts = a.unionAll(b)
      .groupBy(col("__v"))
      .agg(sum(col("__c1")).as("__n1v"), sum(col("__c2")).as("__n2v"))
      .withColumn("__cnt", col("__n1v") + col("__n2v"))
    val blocks = prefixStitch(counts, "__v", Seq("__cnt"))
    // doubled average rank of the tie block: 2·before + cnt + 1;
    // R1·2 = Σ n1v · rank2 ; tie term Σ (cnt³ − cnt) feeds the variance
    val d38 = DecimalType(38, 0)
    val rank2 = lit(2L) * col("__cnt_before") + col("__cnt") + lit(1L)
    val agg = blocks.agg(
      sum(col("__n1v")).as("n1"),
      sum(col("__n2v")).as("n2"),
      sum(col("__n1v").cast(d38) * rank2.cast(d38)).as("__r1x2"),
      sum((col("__cnt").cast(d38) * col("__cnt").cast(d38) * col("__cnt").cast(d38) -
        col("__cnt").cast(d38))).as("__ties"))
    val n1 = col("n1").cast(DoubleType); val n2 = col("n2").cast(DoubleType)
    val u2 = col("__r1x2") - (col("n1").cast(d38) * (col("n1").cast(d38) + lit(1)))
    val u1 = u2.cast(DoubleType) / lit(2.0)
    val nTot = n1 + n2
    val tieAdj = col("__ties").cast(DoubleType) / (nTot * (nTot - lit(1.0)))
    val sigma = sqrt(n1 * n2 / lit(12.0) * (nTot + lit(1.0) - tieAdj))
    val mu = n1 * n2 / lit(2.0)
    // two-sided normal approx with 0.5 continuity correction (scipy
    // method='asymptotic', use_continuity=True)
    val z = (u1 - mu - lit(0.5) * signum(u1 - mu)) / sigma
    val pv = udf((zz: Double) => {
      val x = math.abs(zz) / math.sqrt(2.0)
      // erfc via the A&S 7.1.26 polynomial (documented 1.5e-7 bound)
      val t = 1.0 / (1.0 + 0.3275911 * x)
      val poly = t * (0.254829592 + t * (-0.284496736 +
        t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
      math.min(1.0, poly * math.exp(-x * x))
    }).apply(z)
    agg.select(col("n1"), col("n2"),
      u2.cast(LongType).as("u2"),
      u1.as("statistic"), pv.as("pvalue"))
  }

  /** scipy.stats.f_oneway over a group column, any k ≥ 2 groups (upside
    * beyond the reference's stats module — same exact-moment machinery
    * as ttest): one grouped aggregate computes per-group (n, Σx, Σx²)
    * exactly (BIGINT for integral inputs), then the k-row group table
    * reduces to N/ΣΣx/ΣΣx² (exact, order-free) plus Σ (Σx_g)²/n_g — a
    * cross-group DOUBLE sum, folded in sorted group order so the F
    * statistic is bit-deterministic and engine-replayable (the ordered-
    * fold convention). F = (SSb/(k−1)) / (SSw/(N−k)); two-sided p from
    * the F survival I_{d2/(d2+d1·F)}(d2/2, d1/2). */
  def fOneway(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val c = df(valueCol)
    val integral = isIntegral(df.schema(valueCol).dataType)
    val (x, x2): (Column, Column) =
      if (integral) (c.cast(LongType), c.cast(LongType) * c.cast(LongType))
      else {
        val q = c.cast(DecimalType(24, 6))
        (q.cast(DecimalType(38, 12)), (q * q).cast(DecimalType(38, 12)))
      }
    // per-group sums stay EXACT (decimal) through both aggregation
    // levels — only the ssg fold and the final closed form go double
    val perGroup = df
      .select(df(groupCol).cast(StringType).as("__g"), x.as("__x"), x2.as("__x2"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).cast(DecimalType(38, 12)).as("__s1"),
        sum(col("__x2")).cast(DecimalType(38, 12)).as("__s2"))
    val folded = perGroup.agg(
      count(lit(1)).as("k"),
      sum(col("__n")).as("n_total"),
      sum(col("__s1")).cast(DoubleType).as("__S1"),
      sum(col("__s2")).cast(DoubleType).as("__S2"),
      // Σ (Σx_g)²/n_g in sorted group order — deterministic left fold
      aggregate(
        array_sort(collect_list(struct(col("__g"),
          (col("__s1").cast(DoubleType) * col("__s1").cast(DoubleType) /
            col("__n").cast(DoubleType)).as("t")))),
        lit(0.0), (acc, s) => acc + s.getField("t")).as("__ssg"))
    val nd = col("n_total").cast(DoubleType)
    val kd = col("k").cast(DoubleType)
    val ssb = col("__ssg") - col("__S1") * col("__S1") / nd
    val ssw = col("__S2") - col("__ssg")
    val d1 = kd - lit(1.0)
    val d2 = nd - kd
    val f = (ssb / d1) / (ssw / d2)
    folded.select(col("k"), col("n_total"),
      ssb.as("ss_between"), ssw.as("ss_within"),
      f.as("statistic"), d1.as("dof1"), d2.as("dof2"),
      fPvalUdf(f, d1, d2).as("pvalue"))
  }

  private val fPvalUdf = udf((f: Double, d1: Double, d2: Double) =>
    if (f.isNaN || d1 <= 0 || d2 <= 0) Double.NaN
    else if (f <= 0.0) 1.0
    else regIncBeta(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f)))

  /** scipy.stats.wilcoxon (paired signed-rank; zero_method='wilcox',
    * two-sided normal approximation without continuity correction —
    * scipy mode='approx', correction=False). Zero differences drop,
    * |d| ranks come from [[rankdata]]'s doubled average ranks, so the
    * signed-rank sums are exact BIGINTs at any scale; the tie-corrected
    * variance and z replay with identical shape in any engine. Emits
    * `w2plus` = 2·W⁺ and `t2` = 2·min(W⁺, W⁻) exact, plus z and p. */
  def wilcoxon(df: DataFrame, col1: String, col2: String): DataFrame = {
    val d = (df(col1).cast(DoubleType) - df(col2).cast(DoubleType))
    val nz = df.select(d.as("__d")).where(col("__d") =!= 0.0)
      .withColumn("__ad", abs(col("__d")))
    val ranked = rankdata(nz, "__ad", "average")
    val d38 = DecimalType(38, 0)
    val tieCounts = nz.groupBy(col("__ad")).agg(count(lit(1)).as("__t"))
      .agg(sum(col("__t").cast(d38) * col("__t").cast(d38) * col("__t").cast(d38) -
        col("__t").cast(d38)).as("ties"))
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum(when(col("__d") > 0, col("rank2")).otherwise(lit(0L))).cast(d38)
        .as("w2plus"))
      .crossJoin(broadcast(tieCounts))
    val nd = col("n").cast(DoubleType)
    val w2minus = col("n").cast(d38) * (col("n").cast(d38) + lit(1)) - col("w2plus")
    val t2 = least(col("w2plus"), w2minus)
    val mu2 = nd * (nd + lit(1.0)) / lit(2.0) // 2·n(n+1)/4
    val sigma2 = sqrt(nd * (nd + lit(1.0)) * (lit(2.0) * nd + lit(1.0)) / lit(6.0)
      - col("ties").cast(DoubleType) / lit(12.0)) // 2·σ
    val z = (t2.cast(DoubleType) - mu2) / sigma2
    val pv = udf((zz: Double) =>
      if (zz.isNaN) Double.NaN else regGammaQ(0.5, zz * zz / 2.0)).apply(z)
    agg.select(col("n"),
      col("w2plus").cast(LongType).as("w2plus"),
      t2.cast(LongType).as("t2"),
      col("ties").cast(LongType).as("ties"),
      z.as("zstat"), pv.as("pvalue"))
  }

  /** Kruskal–Wallis H (scipy.stats.kruskal — the rank ANOVA, any k ≥ 2
    * groups; shares [[rankdata]]'s prefix stitch): pooled doubled
    * average ranks make each group's rank sum an exact BIGINT; the one
    * cross-group double term Σ R_g²/n_g folds in sorted group order
    * (deterministic, engine-replayable). Tie-corrected
    * H = [12/(N(N+1))·ΣR_g²/n_g − 3(N+1)] / (1 − Σ(t³−t)/(N³−N));
    * p = χ²-sf(H, k−1). */
  def kruskal(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val base = df.select(df(valueCol).cast(DoubleType).as("__v"),
      df(groupCol).cast(StringType).as("__g"))
    val ranked = rankdata(base, "__v", "average")
    val perGroup = ranked.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("rank2").cast(d38)).as("__r2"))
    val ties = base.groupBy(col("__v")).agg(count(lit(1)).as("__t"))
      .agg(sum(col("__t").cast(d38) * col("__t").cast(d38) * col("__t").cast(d38) -
        col("__t").cast(d38)).as("ties"))
    val folded = perGroup.agg(
      count(lit(1)).as("k"),
      sum(col("__n")).as("n_total"),
      // Σ R_g²/n_g with R_g = R2_g/2, folded in sorted group order
      aggregate(
        array_sort(collect_list(struct(col("__g"),
          (col("__r2").cast(DoubleType) * col("__r2").cast(DoubleType) /
            (lit(4.0) * col("__n").cast(DoubleType))).as("t")))),
        lit(0.0), (acc, s) => acc + s.getField("t")).as("__srg"))
      .crossJoin(broadcast(ties))
    val nd = col("n_total").cast(DoubleType)
    val hRaw = lit(12.0) / (nd * (nd + lit(1.0))) * col("__srg") -
      lit(3.0) * (nd + lit(1.0))
    val tieAdj = lit(1.0) -
      col("ties").cast(DoubleType) / (nd * nd * nd - nd)
    val h = hRaw / tieAdj
    val kd = col("k").cast(DoubleType)
    val pv = udf((hh: Double, dof: Double) => chi2Sf(hh, dof)).apply(h, kd - 1.0)
    folded.select(col("k"), col("n_total"),
      col("ties").cast(LongType).as("ties"),
      h.as("statistic"), pv.as("pvalue"))
  }

  /** D'Agostino skewtest + Anscombe–Glynn kurtosistest + the combined
    * D'Agostino–Pearson K² omnibus (scipy.stats skewtest / kurtosistest /
    * normaltest), one row per group. The data pass is ONE partial+final
    * aggregate of exact BIGINT power sums S1..S4 (integral value column
    * required — the same exactness contract as the t family); everything
    * after is scalar arithmetic replayed shape-for-shape by the oracle:
    * biased moments m2..m4 from the power sums, g1 = m3/(m2·√m2),
    * b2 = m4/m2², the published Z transforms, K² = Z₁² + Z₂², p_skew /
    * p_kurt via the A&S erfc polynomial ([[graft.functions.Special
    * .normalTwoSidedP]]) and p_k2 = exp(−K²/2) (the χ²₂ tail in closed
    * form). Requires n ≥ 20 per group (scipy's own warning threshold —
    * the Z approximations degrade below it); S4 needs Σx⁴ < 2⁶³, i.e.
    * |x| ≤ 50 holds to ~1.4e12 rows per group — quantize/scale wider
    * inputs first. */
  def dagostino(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    require(isIntegral(df.schema(valueCol).dataType),
      s"dagostino: $valueCol must be integral (exact power-sum contract)")
    import graft.functions.Special
    val v = df(valueCol).cast(LongType)
    val g = df.groupBy(df(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
      // fail loudly below the hard validity floor (scipy skewtest raises
      // for n < 8; below it the beta2/aa terms go negative and every Z
      // would silently be NaN). Guard lives INSIDE nd so Catalyst cannot
      // prune it; n in [8, 20) still computes, per the scaladoc warning.
      .withColumn("nd",
        when(col("n") < 8, raise_error(concat(
          lit("dagostino: group "), col("grp").cast(StringType),
          lit(" has n = "), col("n").cast(StringType),
          lit(" < 8 — Z approximations undefined (scipy raises); " +
            "filter small groups first"))))
          .otherwise(col("n").cast(DoubleType)))
      .withColumn("s1d", col("s1").cast(DoubleType))
      .withColumn("s2d", col("s2").cast(DoubleType))
      .withColumn("s3d", col("s3").cast(DoubleType))
      .withColumn("s4d", col("s4").cast(DoubleType))
      .withColumn("mean", col("s1d") / col("nd"))
      .withColumn("m2", col("s2d") / col("nd") - col("mean") * col("mean"))
      .withColumn("m3", col("s3d") / col("nd") -
        lit(3.0) * col("mean") * (col("s2d") / col("nd")) +
        lit(2.0) * col("mean") * col("mean") * col("mean"))
      .withColumn("m4", col("s4d") / col("nd") -
        lit(4.0) * col("mean") * (col("s3d") / col("nd")) +
        lit(6.0) * (col("mean") * col("mean")) * (col("s2d") / col("nd")) -
        lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      .withColumn("g1", col("m3") / (col("m2") * sqrt(col("m2"))))
      .withColumn("b2", col("m4") / (col("m2") * col("m2")))
    val nd = col("nd")
    // --- skewtest (D'Agostino 1970, the exact scipy op sequence —
    //     including scipy's y == 0 → 1 substitution, so an exactly
    //     symmetric sample gets Z = δ·asinh(1/α), not 0)
    val sk = g
      .withColumn("y", col("g1") *
        sqrt((nd + lit(1.0)) * (nd + lit(3.0)) / (lit(6.0) * (nd - lit(2.0)))))
      .withColumn("y", when(col("y") === 0.0, lit(1.0)).otherwise(col("y")))
      .withColumn("beta2",
        lit(3.0) * (nd * nd + lit(27.0) * nd - lit(70.0)) *
          (nd + lit(1.0)) * (nd + lit(3.0)) /
          ((nd - lit(2.0)) * (nd + lit(5.0)) * (nd + lit(7.0)) * (nd + lit(9.0))))
      .withColumn("w2", lit(-1.0) + sqrt(lit(2.0) * (col("beta2") - lit(1.0))))
      .withColumn("delta", lit(1.0) / sqrt(lit(0.5) * log(col("w2"))))
      .withColumn("alpha", sqrt(lit(2.0) / (col("w2") - lit(1.0))))
      .withColumn("z1", col("delta") *
        log(col("y") / col("alpha") +
          sqrt(col("y") / col("alpha") * (col("y") / col("alpha")) + lit(1.0))))
    // --- kurtosistest (Anscombe–Glynn 1983, the exact scipy op sequence)
    val kt = sk
      .withColumn("eb2", lit(3.0) * (nd - lit(1.0)) / (nd + lit(1.0)))
      .withColumn("vb2", lit(24.0) * nd * (nd - lit(2.0)) * (nd - lit(3.0)) /
        ((nd + lit(1.0)) * (nd + lit(1.0)) * (nd + lit(3.0)) * (nd + lit(5.0))))
      .withColumn("xt", (col("b2") - col("eb2")) / sqrt(col("vb2")))
      .withColumn("sqb1",
        lit(6.0) * (nd * nd - lit(5.0) * nd + lit(2.0)) /
          ((nd + lit(7.0)) * (nd + lit(9.0))) *
          sqrt(lit(6.0) * (nd + lit(3.0)) * (nd + lit(5.0)) /
            (nd * (nd - lit(2.0)) * (nd - lit(3.0)))))
      .withColumn("aa", lit(6.0) + lit(8.0) / col("sqb1") *
        (lit(2.0) / col("sqb1") +
          sqrt(lit(1.0) + lit(4.0) / (col("sqb1") * col("sqb1")))))
      .withColumn("term1", lit(1.0) - lit(2.0) / (lit(9.0) * col("aa")))
      .withColumn("denom", lit(1.0) +
        col("xt") * sqrt(lit(2.0) / (col("aa") - lit(4.0))))
      .withColumn("term2",
        when(col("denom") === 0.0, lit(Double.NaN)).otherwise(
          when(col("denom") < 0.0, lit(-1.0)).otherwise(lit(1.0)) *
            pow((lit(1.0) - lit(2.0) / col("aa")) / abs(col("denom")), lit(1.0 / 3.0))))
      .withColumn("z2", (col("term1") - col("term2")) /
        sqrt(lit(2.0) / (lit(9.0) * col("aa"))))
    kt.withColumn("k2", col("z1") * col("z1") + col("z2") * col("z2"))
      .select(col("grp"), col("n"), col("s1"), col("s2"), col("s3"), col("s4"),
        col("g1"), col("b2"),
        col("z1").as("z_skew"), col("z2").as("z_kurt"), col("k2"),
        Special.normalTwoSidedP(col("z1")).as("p_skew"),
        Special.normalTwoSidedP(col("z2")).as("p_kurt"),
        exp(-col("k2") / lit(2.0)).as("p_k2"))
  }

  /** Kendall τ-b (scipy.stats.kendalltau; upside — the reference's corr
    * supports pearson only): all-pairs concordance over a self-join on
    * the [[rankdata]]-free row index. O(n²) pairs by definition — hard
    * `maxRows` guard (same contract as pdist/silhouette); at corpus
    * scale compute τ on a deterministic sample. Every count is an exact
    * BIGINT; τ-b's tie denominators replay exactly. z uses the
    * no-tie normal approximation (scipy's tau-b p with ties differs
    * slightly; documented). */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
      maxRows: Int = 5000): DataFrame = {
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"kendallTau is O(n²) pairs by definition: > $maxRows rows — sample " +
        "first (deterministic PortableHash sample) or raise maxRows deliberately")
    val idx = graft.api.GraftFrame(df.select(
      df(xCol).cast(DoubleType).as("__x"),
      df(yCol).cast(DoubleType).as("__y"))).withRowIndex("__i").df
    val a = idx.select(col("__i").as("__ia"), col("__x").as("__xa"), col("__y").as("__ya"))
    val b = idx.select(col("__i").as("__ib"), col("__x").as("__xb"), col("__y").as("__yb"))
    val pairs = a.join(b, col("__ia") < col("__ib"))
    val sx = signum(col("__xb") - col("__xa"))
    val sy = signum(col("__yb") - col("__ya"))
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      count(when(sx * sy > 0, lit(1))).as("concordant"),
      count(when(sx * sy < 0, lit(1))).as("discordant"),
      count(when(sx === 0 && sy =!= 0, lit(1))).as("tx"),
      count(when(sy === 0 && sx =!= 0, lit(1))).as("ty"))
    val c = col("concordant").cast(DoubleType)
    val d = col("discordant").cast(DoubleType)
    val tx = col("tx").cast(DoubleType); val ty = col("ty").cast(DoubleType)
    val tau = (c - d) / sqrt((c + d + tx) * (c + d + ty))
    val nd = lit(n.toDouble)
    val z = lit(3.0) * (c - d) /
      sqrt(nd * (nd - lit(1.0)) * (lit(2.0) * nd + lit(5.0)) / lit(2.0))
    val pv = udf((zz: Double) =>
      if (zz.isNaN) Double.NaN else regGammaQ(0.5, zz * zz / 2.0)).apply(z)
    agg.select(col("n_pairs"), col("concordant"), col("discordant"),
      col("tx"), col("ty"), tau.as("statistic"), z.as("zstat"),
      pv.as("pvalue"))
  }

  // ------------------------------------------------------------------
  // rankdata (rankdata.py:19)
  // ------------------------------------------------------------------

  /** Range-partitioned global prefix sums over `orderCol` for each of
    * `sumCols` (emitted as `<col>_before` = sum strictly before the row's
    * value block) — the checkMonotonic stitch generalized. */
  private[learn] def prefixStitch(df: DataFrame, orderCol: String,
      sumCols: Seq[String]): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    val within = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"${c}_cum", sum(col(c)).over(wIn))
    }
    val aggCols = sumCols.map(c => max(col(s"${c}_cum")).as(s"${c}_tot"))
    val totals = within.groupBy(col("__pid")).agg(aggCols.head, aggCols.tail: _*)
    val wB = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("__pid") +: sumCols.map(c =>
      coalesce(sum(col(s"${c}_tot")).over(wB), lit(0L)).as(s"${c}_off")): _*)
    val joined = within.join(broadcast(offsets), "__pid")
    sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_before",
        col(s"${c}_cum") + col(s"${c}_off") - col(c))
    }
  }

  /** Per-DISTINCT-value rank blocks [__v, __before, __cnt, __dense]:
    * `__before` ordinal ranks precede the value's tie block, `__cnt` tie
    * size, `__dense` 1-based distinct index. groupBy(value) → range
    * partition → per-bucket window + ≤#partitions-row summary window
    * (the checkMonotonic stitch) → broadcast join back on bucket id. */
  private def rankBlocks(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.groupBy(df(valueCol).as("__v")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__one", lit(1L))
    prefixStitch(counts, "__v", Seq("__cnt", "__one")).select(
      col("__v"),
      col("__cnt_before").as("__before"),
      col("__cnt"),
      (col("__one_before") + lit(1L)).as("__dense"))
  }

  /** scipy.stats.rankdata: per-row ranks with tie methods average / min /
    * max / dense (row-order-free) and ordinal (needs a row order — pass
    * `orderCols` as the appearance order; scipy's stable argsort).
    *
    * Shape: groupBy(value) → per-value [cumBefore, cnt, denseIdx] via the
    * range-partitioned prefix stitch → one shuffle join back on the value
    * key. Never a global data-wide window; the per-value rank block table
    * has one row per DISTINCT value. `average` is returned doubled
    * (`rank2 = 2·rank`, always integral) so the output stays exact. */
  def rankdata(df: DataFrame, valueCol: String, method: String = "average",
      orderCols: Seq[String] = Nil): DataFrame = {
    require(Set("average", "min", "max", "dense", "ordinal")(method),
      s"method must be average|min|max|dense|ordinal: $method")
    if (method == "ordinal") {
      require(orderCols.nonEmpty, "ordinal ranks need orderCols (appearance order)")
      // global ordinal over (value, appearance order): sort + zipWithIndex
      // (per-partition counts, no collect — the rowIndex bridge pattern)
      val sorted = df.orderBy(df(valueCol) +: orderCols.map(df(_)): _*)
      val schema = sorted.schema.add(StructField("rank", LongType, nullable = false))
      val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      return df.sparkSession.createDataFrame(ranked, schema)
    }
    val blocks = rankBlocks(df, valueCol)
    val rankCol = method match {
      case "min"     => col("__before") + lit(1L)
      case "max"     => col("__before") + col("__cnt")
      case "dense"   => col("__dense")
      // average = before + (cnt+1)/2; doubled to stay in BIGINT
      case "average" => lit(2L) * col("__before") + col("__cnt") + lit(1L)
    }
    val out = df.join(blocks, df(valueCol) === blocks("__v"))
      .select(df.columns.map(df(_)) :+
        rankCol.as(if (method == "average") "rank2" else "rank"): _*)
    out
  }
}
