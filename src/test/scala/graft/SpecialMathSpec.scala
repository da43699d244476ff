package graft

import org.apache.spark.sql.functions._
import graft.functions.Special

/** r18 optimization round: the native `graft_special` kernels
  * ([[graft.functions.SpecialMath]]) must be BIT-identical to the staged
  * Column trees they replace — the DuckDB oracle mirrors replay the
  * Column arithmetic, so any drift here is an oracle break. Every pin
  * compares Double.compare == 0 (no tolerance) over grids that cover the
  * SpecialQ gate input domains (the same formulas over q ∈ [1, 50],
  * linenumber ∈ [1, 7]) plus off-grid sweeps.
  */
class SpecialMathSpec extends SparkSpecBase {
  import spark.implicits._

  private def assertBitEqual(rows: Array[(org.apache.spark.sql.Row, org.apache.spark.sql.Row)],
      n: Int, what: String): Unit =
    rows.foreach { case (a, b) =>
      (0 until n).foreach { i =>
        assert(java.lang.Double.compare(a.getDouble(i), b.getDouble(i)) == 0,
          s"$what diverged at col $i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }

  // the SpecialQ gate grid: q = l_quantity ∈ 1..50, ln = l_linenumber ∈ 1..7
  private lazy val grid = (for {
    q <- 1 to 50
    ln <- 1 to 7
  } yield (q.toDouble, ln.toDouble)).toDF("q", "ln")

  private def nk(kernel: String, args: org.apache.spark.sql.Column*) =
    call_function("graft_special", (lit(kernel) +: args.toSeq): _*)

  test("native wofz/voigt/modfresnel == Column trees bit-for-bit") {
    val df = grid.select(
      (($"q" - 25.0) / 2.0).as("wx"),
      ($"ln" * 2.5).as("wy1"),
      ($"ln" / 8.0).as("wy2"),
      (($"q" - 25.0) / 4.0).as("mx"))
    val col0 = {
      val a = Special.wofzStaged(df, $"wx", $"wy1", "re1", "im1")
      val b = Special.wofzStaged(a, $"wx", $"wy2", "re2", "im2")
      val c = Special.voigtProfileStaged(b, $"wx", lit(1.5), lit(0.5), "vp")
      val d = Special.modfresnelStaged(c, $"mx")
      d.select($"re1", $"im1", $"re2", $"im2", $"vp",
        $"mf_kre", $"mf_kim", $"mf_fre", $"mf_fim")
    }
    val nat = df.select(
      nk("wofzRe", $"wx", $"wy1"), nk("wofzIm", $"wx", $"wy1"),
      nk("wofzRe", $"wx", $"wy2"), nk("wofzIm", $"wx", $"wy2"),
      nk("voigtProfile", $"wx", lit(1.5), lit(0.5)),
      nk("modfresnelKre", $"mx"), nk("modfresnelKim", $"mx"),
      nk("modfresnelFre", $"mx"), nk("modfresnelFim", $"mx"))
    assertBitEqual(col0.collect().zip(nat.collect()), 9, "wofz family")
  }

  test("native betainc/gammainc forward + inverse == Column trees bit-for-bit") {
    val df = grid.select(
      ($"q" / 16.0 + 1.0).as("ba"),
      ((lit(51.0) - $"q") / 16.0 + 1.0).as("bb"),
      ((($"ln" * 13 % 83) + 8) / 99.0).as("pp"),
      ($"q" / 16.0 + 0.5).as("ga"),
      ($"q" / 50.0 * 0.98 + 0.01).as("bx"),
      ($"q" / 5.0).as("gx"),
      ($"q" / 25.0).as("lam"))
    val col0 = {
      val inv = Special.betaincInvNewton(df, Seq(
        ("d", $"ba", $"bb", $"pp"), ("s", $"bb", $"ba", lit(1.0) - $"pp")))
      val ginv = Special.gammaincInvNewton(inv, Seq(
        ("p", $"ga", $"pp", false), ("u", $"ga", $"pp", true)))
      ginv.select($"binv_d", $"binv_s", $"ginv_p", $"ginv_u",
        Special.betaincReg($"ba", $"bb", $"bx").as("bi"),
        Special.gammaincP($"ga", $"gx").as("gp"),
        Special.gammaincQ($"ga", $"gx").as("gq"),
        Special.kolmogorovSfFixed($"lam").as("ks"))
    }
    val nat = df.select(
      nk("betaincinv", $"ba", $"bb", $"pp"),
      nk("betaincinv", $"bb", $"ba", lit(1.0) - $"pp"),
      nk("gammaincinv", $"ga", $"pp", lit(0.0)),
      nk("gammaincinv", $"ga", $"pp", lit(1.0)),
      nk("betaincReg", $"ba", $"bb", $"bx"),
      nk("gammaincP", $"ga", $"gx"),
      nk("gammaincQ", $"ga", $"gx"),
      nk("kolmogorovSf", $"lam"))
    assertBitEqual(col0.collect().zip(nat.collect()), 8, "betainc/gammainc")
  }

  test("native Carlson / ellipInc == Column trees bit-for-bit") {
    val df = grid.select(
      ($"q" / 8.0 + 0.1).as("x1"),
      ($"q" / 4.0 + 1.0).as("y1"),
      lit(3.0).as("z1"),
      ($"q" / 10.0 + 0.5).as("p1"),
      ($"q" / 8.0 + 0.2).as("rcx"),
      ($"q" / 5.0 + 0.1).as("rcy"),
      ($"q" * 0.03).as("phi"),
      ($"q" / 64.0).as("m"))
    val col0 = {
      val fd = Special.carlsonFD(df, Seq(("fd", $"x1", $"y1", $"z1", true)))
      val rj = Special.carlsonRJ(fd, Seq(("rj", $"x1", $"y1", $"z1", $"p1")))
      val inc = Special.ellipInc(rj, Seq(("a", $"phi", $"m", true)))
      inc.select($"rf_fd", $"rd_fd", $"rj_rj",
        Special.ellipRc($"rcx", $"rcy").as("rc"),
        $"kinc_a", $"einc_a")
    }
    val nat = df.select(
      nk("carlsonRf", $"x1", $"y1", $"z1"),
      nk("carlsonRd", $"x1", $"y1", $"z1"),
      nk("carlsonRj", $"x1", $"y1", $"z1", $"p1"),
      nk("ellipRc", $"rcx", $"rcy"),
      nk("ellipKinc", $"phi", $"m"),
      nk("ellipEinc", $"phi", $"m"))
    assertBitEqual(col0.collect().zip(nat.collect()), 6, "carlson family")
  }

  test("native large/branched Bessel == staged Column trees bit-for-bit") {
    val df = grid.select(
      ($"q" / 1.4 + 0.5).as("bx"),
      ($"q" / 1.4 + 4.5).as("bx2"),
      ((($"ln" % 7) + 1.0) / 8.0).as("bf"),
      (lit(0.1) + lit(0.8) * ($"ln" % 5)).as("va"),
      (lit(0.2) + lit(0.3) * ($"ln" % 3)).as("vf"),
      ($"q" * 0.4 + 0.3).as("xs"))
    val col0 = {
      val a = Special.besselYvLargeStaged(df, 18, $"bf", $"bx", "y18")
      val b = Special.besselKveLargeStaged(a, 18, $"bf", $"bx", "k18")
      val c = Special.besselYvLargeStaged(b, 2, $"bf", $"bx", "y2")
      val d = Special.besselKveLargeStaged(c, 2, $"bf", $"bx", "k2")
      val e = Special.besselJvLargeStaged(d, 8, $"bf", $"bx2", "j8")
      val f = Special.besselIveLargeStaged(e, 8, $"bf", $"bx2", "i8")
      f.select($"y18", $"k18", $"y2", $"k2", $"j8", $"i8",
        Special.besselJvExt($"va", $"xs").as("jv"),
        Special.besselYvExt($"vf", $"xs").as("yv"),
        Special.besselIveExt($"va", $"xs").as("ive"),
        Special.besselKveExt($"vf", $"xs").as("kve"))
    }
    val nat = df.select(
      nk("besselYvLarge", lit(18.0), $"bf", $"bx"),
      nk("besselKveLarge", lit(18.0), $"bf", $"bx"),
      nk("besselYvLarge", lit(2.0), $"bf", $"bx"),
      nk("besselKveLarge", lit(2.0), $"bf", $"bx"),
      nk("besselJvLarge", lit(8.0), $"bf", $"bx2"),
      nk("besselIveLarge", lit(8.0), $"bf", $"bx2"),
      nk("besselJvExt", $"va", $"xs"),
      nk("besselYvExt", $"vf", $"xs"),
      nk("besselIveExt", $"va", $"xs"),
      nk("besselKveExt", $"vf", $"xs"))
    assertBitEqual(col0.collect().zip(nat.collect()), 10, "bessel family")
  }

  test("native hypergeometric 2F1/1F1 == Column trees bit-for-bit") {
    val df = grid.select(
      (lit(0.3) + lit(0.2) * ($"ln" % 3)).as("ha"),
      ($"q" / 30.0 + 0.25).as("hb"),
      ($"q" / 20.0 + 1.5).as("hc"),
      (-($"q" / 25.0)).as("hz"),
      (lit(0.3) + lit(0.2) * ($"ln" % 3) + 0.35 + $"q" / 200.0).as("fb"),
      (lit(0.3) + lit(0.2) * ($"ln" % 3) + 0.95 + $"q" / 40.0).as("fc"),
      (-($"q" / 2.0 + 2.5)).as("fz"),
      ($"q" / 60.0 + 0.2).as("pb"),
      (lit(0.7) + $"q" / 180.0).as("pz"),
      (lit(0.4) + lit(0.15) * ($"ln" % 3)).as("ka"),
      (lit(1.1) + lit(0.25) * ($"ln" % 4) + $"q" / 100.0).as("kb"),
      (($"q" - 25.5) * 2.4).as("kx"))
    val col0 = df.select(
      Special.hyp2f1Ext($"ha", $"hb", $"hc", $"hz").as("neg"),
      Special.hyp2f1Far($"ha", $"fb", $"fc", $"fz").as("far"),
      Special.hyp2f1Near1($"ha", $"pb", $"ha" + $"pb" + 0.4, $"pz").as("near"),
      Special.hyp1f1Ext($"ka", $"kb", $"kx").as("m"))
    val nat = df.select(
      nk("hyp2f1Ext", $"ha", $"hb", $"hc", $"hz"),
      nk("hyp2f1Far", $"ha", $"fb", $"fc", $"fz"),
      nk("hyp2f1Near1", $"ha", $"pb", $"ha" + $"pb" + 0.4, $"pz"),
      nk("hyp1f1Ext", $"ka", $"kb", $"kx"))
    assertBitEqual(col0.collect().zip(nat.collect()), 4, "hypergeometric")
  }

  test("native kernels survive null inputs and reject unknown names") {
    val df = Seq((Some(1.5), Option.empty[Double])).toDF("a", "b")
    val r = df.select(nk("gammalnPos", $"a"), nk("gammalnPos", $"b")).head()
    assert(!r.isNullAt(0) && r.isNullAt(1))
    intercept[Exception] {
      df.select(nk("noSuchKernel", $"a")).head()
    }
  }
}
