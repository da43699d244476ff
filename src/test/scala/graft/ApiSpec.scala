package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{GraftFrame, GraftSession}

/** Tests for the fluent API surface not already exercised end-to-end by the
  * oracle-checked queries: merge suffixes, concat with missing columns,
  * map(dict), dummies, insert, describe, monotonic check, weighted sample,
  * groupby.apply, mapChunk, and the generator sources.
  */
class ApiSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val g = GraftSession(spark)

  test("merge disambiguates shared non-key columns with suffixes") {
    val l = GraftFrame(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "v"))
    val r = GraftFrame(Seq((1L, "x", 1.5), (3L, "y", 2.5)).toDF("k", "tag", "w"))
    val m = l.merge(r, on = Seq("k"), how = "inner")
    assert(m.columns.toSet == Set("k", "tag_x", "tag_y", "v", "w"))
    assert(m.df.collect().toSeq == Seq(Row(1L, "a", 10.0, "x", 1.5)))
    val outer = l.merge(r, on = Seq("k"), how = "full_outer")
    assert(outer.df.count() == 3)
  }

  test("merge indicator marks row provenance like pandas") {
    val l = GraftFrame(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val r = GraftFrame(Seq((2L, 9.0), (3L, 8.0)).toDF("k", "w"))
    val m = l.merge(r, on = Seq("k"), how = "full_outer", indicator = true)
      .sortValues(Seq("k")).df.select("k", "_merge").as[(Long, String)].collect().toSeq
    assert(m == Seq((1L, "left_only"), (2L, "both"), (3L, "right_only")))
  }

  test("merge with left_on/right_on keeps both key columns") {
    val l = GraftFrame(Seq((1L, 10.0)).toDF("lk", "v"))
    val r = GraftFrame(Seq((1L, "x")).toDF("rk", "w"))
    val m = l.merge(r, leftOn = Seq("lk"), rightOn = Seq("rk"))
    assert(m.df.collect().toSeq == Seq(Row(1L, 10.0, 1L, "x")))
  }

  test("concatRows null-fills missing columns like pandas outer concat") {
    val a = GraftFrame(Seq((1L, "a")).toDF("k", "s"))
    val b = GraftFrame(Seq((2L, 5.0)).toDF("k", "x"))
    val c = a.concatRows(b).sortValues(Seq("k"))
    assert(c.columns.toSet == Set("k", "s", "x"))
    assert(c.df.collect().toSeq ==
      Seq(Row(1L, "a", null), Row(2L, null, 5.0)))
  }

  test("whereMask keeps matching rows and replaces the rest") {
    val f = GraftFrame(Seq((1L, 10.0), (2L, -5.0)).toDF("k", "v"))
      .whereMask("v", col("v") > 0, lit(0.0))
    assert(f.df.orderBy("k").select("v").as[Double].collect().toSeq == Seq(10.0, 0.0))
  }

  test("mapValues applies a dict with default") {
    val f = GraftFrame(Seq(("a"), ("b"), ("z")).toDF("c"))
      .mapValues("c", "mapped", Map("a" -> 1, "b" -> 2), default = Some(-1))
    assert(f.df.orderBy("c").select("mapped").as[Int].collect().toSeq == Seq(1, 2, -1))
  }

  test("getDummies emits one-hot columns") {
    val f = GraftFrame(Seq(("a"), ("b"), ("a")).toDF("c"))
      .getDummies("c", Seq("a", "b"), prefix = "is_")
    val rows = f.df.orderBy("c").select("is_a", "is_b").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 0L), (1L, 0L), (0L, 1L)))
  }

  test("insert places a column positionally") {
    val f = GraftFrame(Seq((1L, 2L)).toDF("a", "c")).insert(1, "b", lit(9L))
    assert(f.columns == Seq("a", "b", "c"))
  }

  test("describe computes count/mean/std/quartiles") {
    val f = GraftFrame((1 to 100).map(_.toDouble).toDF("x")).describe(Seq("x"))
    val r = f.df.collect().head
    assert(r.getAs[Double]("x_count") == 100.0)
    assert(math.abs(r.getAs[Double]("x_mean") - 50.5) < 1e-12)
    assert(r.getAs[Double]("x_min") == 1.0 && r.getAs[Double]("x_max") == 100.0)
    assert(math.abs(r.getAs[Double]("x_p50") - 50.5) < 1e-12)
  }

  test("PandasExpr translates the pandas eval/query dialect onto SQL") {
    import graft.functions.PandasExpr.translate
    assert(translate("a and not b or c") == "((`a` AND (NOT `b`)) OR `c`)")
    assert(translate("(x > 1) & (y < 2) | ~z") ==
      "(((`x` > 1) AND (`y` < 2)) OR (NOT `z`))")
    assert(translate("a ** 2 ** 3") == "power(`a`, power(2, 3))") // right-assoc
    assert(translate("-a ** 2") == "(- power(`a`, 2))")           // python: -(a**2)
    assert(translate("a // 7 + 1") == "(floor(`a` / 7) + 1)")
    assert(translate("a % 3") == "pmod(`a`, 3)") // python sign semantics
    // behavioral: python -7 % 2 == 1 (sign of the divisor), unlike SQL %
    val mod = Seq(Tuple1(-7L)).toDF("a")
      .select(expr(translate("a % 2"))).as[Long].head()
    assert(mod == 1L)
    assert(translate("k in [1, 2] and s not in ('x',)") ==
      "((`k` IN (1, 2)) AND (`s` NOT IN ('x')))")
    assert(translate("`col with space` == None") == "(`col with space` = null)")
    assert(translate("flag == True or flag == False") ==
      "((`flag` = true) OR (`flag` = false))")
    assert(translate("abs(x - 1.5e2) > sqrt(y)") ==
      "(abs((`x` - 1.5e2)) > sqrt(`y`))")
    intercept[IllegalArgumentException](translate("a @local"))
    intercept[IllegalArgumentException](translate("a b"))
    // chained comparisons are Python-only semantics (a<b<c means a<b and
    // b<c); a silent left-associative parse would emit (a<b)<c — reject
    val chained = intercept[IllegalArgumentException](translate("a < b < c"))
    assert(chained.getMessage.contains("chained"))
    intercept[IllegalArgumentException](translate("a == b == c"))
    intercept[IllegalArgumentException](translate("x < y in [1, 2]"))
    // the and-split spelling still works
    assert(translate("a < b and b < c") == "((`a` < `b`) AND (`b` < `c`))")
  }

  test("evalPandas / queryPandas run a ported pandas expression") {
    val df = Seq((1L, 4.0, true), (2L, 9.0, false), (3L, 16.0, true))
      .toDF("id", "v", "f")
    val out = GraftFrame(df)
      .queryPandas("(v > 3) & f or id in [2]")
      .evalPandas("r", "v ** 0.5 + id // 2")
      .df.orderBy("id").select("id", "r").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2.0), (2L, 4.0), (3L, 5.0)))
  }

  test("fft matches the naive DFT, inverts exactly, and satisfies Parseval") {
    import graft.functions.Fft
    val rnd = new scala.util.Random(3)
    val n = 16
    val xs = Array.fill(n)(rnd.nextDouble() * 10 - 5)
    val re = xs.clone(); val im = new Array[Double](n)
    Fft.transform(re, im, inverse = false)
    // naive O(n²) DFT
    for (k <- 0 until n) {
      val (dr, di) = (0 until n).foldLeft((0.0, 0.0)) { case ((a, b), t) =>
        val ang = -2 * math.Pi * k * t / n
        (a + xs(t) * math.cos(ang), b + xs(t) * math.sin(ang))
      }
      assert(math.abs(re(k) - dr) < 1e-9 && math.abs(im(k) - di) < 1e-9,
        s"bin $k: fft (${re(k)}, ${im(k)}) vs dft ($dr, $di)")
    }
    // Parseval: Σx² = (1/N)Σ|X|²
    val lhs = xs.map(x => x * x).sum
    val rhs = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(lhs - rhs) < 1e-9)
    // round trip
    Fft.transform(re, im, inverse = true)
    xs.indices.foreach { i =>
      assert(math.abs(re(i) - xs(i)) < 1e-10 && math.abs(im(i)) < 1e-10)
    }
    // column form + power spectrum + non-power-of-2 guard
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0))).toDF("xs")
    val p = df.select(Fft.powerSpectrum(col("xs"))).as[Seq[Double]].head()
    assert(math.abs(p.head - 100.0) < 1e-9) // |Σx|² = 10²
    val bad = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("xs")
    val e = intercept[Exception] {
      bad.select(Fft.fftReal(col("xs"))).collect()
    }
    assert(e.getMessage.contains("power of 2"))
    // null contract: null array -> null output; null ELEMENT fails loudly
    val withNull = Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0)), Tuple1(null: Seq[Double]))
      .toDF("xs")
    val outs = withNull.select(Fft.powerSpectrum(col("xs")).as("p"),
        Fft.fftReal(col("xs")).as("f"))
      .collect()
    assert(outs.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
    val nullElem = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 3.0, 4.0)))
      .toDF("xs")
    val ne = intercept[Exception] {
      nullElem.select(Fft.fftReal(col("xs"))).collect()
    }
    assert(ne.getMessage.contains("null element"))
  }

  test("fftn matches the naive N-D DFT, reduces to fft/fft2, and inverts") {
    import graft.functions.Fft
    val rnd = new scala.util.Random(7)
    val shape = Array(2, 4, 8) // three axes (the r8 de-scope this closes)
    val total = shape.product
    val xs = Array.fill(total)(rnd.nextDouble() * 10 - 5)
    val re = xs.clone(); val im = new Array[Double](total)
    Fft.transformN(re, im, shape, inverse = false)
    // naive 3-D DFT over the row-major decomposition
    def coords(f: Int) = (f / 32, (f / 8) % 4, f % 8)
    for (kf <- 0 until total) {
      val (k1, k2, k3) = coords(kf)
      var dr = 0.0; var di = 0.0
      for (nf <- 0 until total) {
        val (n1, n2, n3) = coords(nf)
        val ang = -2 * math.Pi * (n1 * k1 / 2.0 + n2 * k2 / 4.0 + n3 * k3 / 8.0)
        dr += xs(nf) * math.cos(ang); di += xs(nf) * math.sin(ang)
      }
      assert(math.abs(re(kf) - dr) < 1e-8 && math.abs(im(kf) - di) < 1e-8,
        s"bin $kf: fftn (${re(kf)}, ${im(kf)}) vs dft ($dr, $di)")
    }
    // inverse round trip (scales 1/total like numpy ifftn)
    Fft.transformN(re, im, shape, inverse = true)
    xs.indices.foreach { i =>
      assert(math.abs(re(i) - xs(i)) < 1e-10 && math.abs(im(i)) < 1e-10)
    }
    // 1-axis fftn == plain fft; 2-axis fftn == fft2 on the same data
    val re1 = xs.take(16).toArray; val im1 = new Array[Double](16)
    Fft.transformN(re1, im1, Array(16), inverse = false)
    val re1b = xs.take(16).toArray; val im1b = new Array[Double](16)
    Fft.transform(re1b, im1b, inverse = false)
    assert(re1.sameElements(re1b) && im1.sameElements(im1b))
    val re2 = xs.take(32).toArray; val im2 = new Array[Double](32)
    Fft.transformN(re2, im2, Array(4, 8), inverse = false)
    val m = Array.tabulate(4, 8)((r, c) => xs(r * 8 + c))
    val mi = Array.fill(4)(new Array[Double](8))
    Fft.transform2(m, mi, inverse = false)
    for (r <- 0 until 4; c <- 0 until 8) {
      assert(math.abs(re2(r * 8 + c) - m(r)(c)) < 1e-12 &&
        math.abs(im2(r * 8 + c) - mi(r)(c)) < 1e-12)
    }
    // column form: shape/length mismatch fails loudly
    val badN = Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(2, 4))).toDF("xs", "shape")
    val eN = intercept[Exception] {
      badN.select(Fft.fftnReal(col("xs"), col("shape"))).collect()
    }
    assert(eN.getMessage.contains("product(shape)"))
  }

  test("rfftnReal / rfft2Real keep exactly the non-negative last-axis bins") {
    import graft.functions.Fft
    val xs = (1 to 16).map(_.toDouble)
    val df = Seq(Tuple1(xs)).toDF("xs")
    val full = df.select(Fft.fftnReal(col("xs"),
      typedlit(Seq(2, 2, 4))).as("f")).select(col("f.re"), col("f.im"))
      .collect()(0)
    val half = df.select(Fft.rfftnReal(col("xs"), Seq(2, 2, 4)).as("f"))
      .select(col("f.re"), col("f.im")).collect()(0)
    val keptIdx = (0 until 16).filter(_ % 4 <= 2)
    assert(half.getSeq[Double](0).size === 12)
    assert(half.getSeq[Double](0) === keptIdx.map(full.getSeq[Double](0)))
    assert(half.getSeq[Double](1) === keptIdx.map(full.getSeq[Double](1)))
    // matrix form: rfft2 rows are the fft2 rows truncated to cols/2+1
    val m = Seq(Tuple1(Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(5.0, 6.0, 7.0, 8.0))))
      .toDF("m")
    val f2 = m.select(Fft.fft2Real(col("m")).as("f"))
      .select(col("f.re")).collect()(0)
      .getSeq[scala.collection.Seq[Double]](0).map(_.toList).toList
    val r2 = m.select(Fft.rfft2Real(col("m")).as("f"))
      .select(col("f.re")).collect()(0)
      .getSeq[scala.collection.Seq[Double]](0).map(_.toList).toList
    assert(r2.map(_.size) === List(3, 3))
    assert(r2 === f2.map(_.take(3)))
  }

  test("fftLong (distributed four-step) matches the per-row FFT bin-exact-ish") {
    import graft.functions.Fft
    val rnd = new scala.util.Random(5)
    val n = 64
    val xs = Array.fill(n)(rnd.nextDouble() * 10 - 5)
    // single-row reference through the radix-2 engine
    val ref = {
      val re = xs.clone(); val im = new Array[Double](n)
      Fft.transform(re, im, inverse = false)
      re.zip(im)
    }
    // long-form distributed path: (pos, re, im) rows over 8 partitions
    val longForm = spark.sparkContext
      .parallelize(xs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0.0) }, 8)
      .toDF("pos", "re", "im")
    val got = Fft.fftLong(longForm, "pos", "re", "im", n)
      .orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == n)
    got.foreach { case (p, re, im) =>
      val (rr, ri) = ref(p.toInt)
      assert(math.abs(re - rr) < 1e-9 && math.abs(im - ri) < 1e-9,
        s"bin $p: distributed ($re, $im) vs single-row ($rr, $ri)")
    }
    // a missing position fails loudly instead of transforming garbage
    val holed = longForm.filter(col("pos") =!= 3L)
    val e = intercept[Exception] {
      Fft.fftLong(holed, "pos", "re", "im", n).collect()
    }
    assert(e.getMessage.contains("expected"))
    // inverse round trip: ifft(fft(x)) == x through both distributed passes
    val spectrum = Fft.fftLong(longForm, "pos", "re", "im", n)
    val back = Fft.fftLong(spectrum, "pos", "re", "im", n, inverse = true)
      .orderBy("pos").collect()
    back.foreach { r =>
      val p = r.getLong(0).toInt
      assert(math.abs(r.getDouble(1) - xs(p)) < 1e-9 &&
        math.abs(r.getDouble(2)) < 1e-9,
        s"inverse round trip bin $p: (${r.getDouble(1)}, ${r.getDouble(2)})")
    }
  }

  test("numpy.fft family: rfft/irfft/hfft/ihfft, freq grids, shifts, fft2") {
    import graft.functions.Fft
    val rnd = new scala.util.Random(11)
    val n = 8
    val xs = Seq.fill(n)(rnd.nextDouble() * 10 - 5)
    val df = Seq(Tuple1(xs)).toDF("xs")
    // rfft == first n/2+1 bins of the full transform
    val full = {
      val re = xs.toArray; val im = new Array[Double](n)
      Fft.transform(re, im, inverse = false)
      re.zip(im)
    }
    val half = df.select(Fft.rfft(col("xs")).as("f"))
      .select(col("f.re"), col("f.im")).as[(Seq[Double], Seq[Double])].head()
    assert(half._1.length == n / 2 + 1)
    half._1.indices.foreach { k =>
      assert(math.abs(half._1(k) - full(k)._1) < 1e-9 &&
        math.abs(half._2(k) - full(k)._2) < 1e-9, s"rfft bin $k")
    }
    // irfft(rfft(x)) == x
    val back = df.select(Fft.rfft(col("xs")).as("f"))
      .select(Fft.irfft(col("f.re"), col("f.im"))).as[Seq[Double]].head()
    assert(back.length == n)
    back.indices.foreach(i => assert(math.abs(back(i) - xs(i)) < 1e-9))
    // hfft(ihfft(x)) == x (numpy round-trip identity for real x, even n)
    val hback = df.select(Fft.ihfft(col("xs")).as("h"))
      .select(Fft.hfft(col("h.re"), col("h.im"))).as[Seq[Double]].head()
    assert(hback.length == n)
    hback.indices.foreach(i => assert(math.abs(hback(i) - xs(i)) < 1e-9))
    // frequency grids match numpy reference values exactly
    val (fr8, rfr8) = df.select(
        Fft.fftfreq(lit(8), lit(0.5)).as("a"),
        Fft.rfftfreq(lit(8), lit(1.0)).as("b"))
      .as[(Seq[Double], Seq[Double])].head()
    assert(fr8 == Seq(0.0, 0.25, 0.5, 0.75, -1.0, -0.75, -0.5, -0.25))
    assert(rfr8 == Seq(0.0, 0.125, 0.25, 0.375, 0.5))
    val fr5 = df.select(Fft.fftfreq(lit(5), lit(1.0))).as[Seq[Double]].head()
    assert(fr5 == Seq(0.0, 0.2, 0.4, -0.4, -0.2))
    // shifts: numpy values + inverse identity at odd AND even lengths
    val sdf = Seq((Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L), Seq(0L, 1L, 2L, 3L, 4L)))
      .toDF("even", "odd")
    val (se, so) = sdf.select(Fft.fftshift(col("even")), Fft.fftshift(col("odd")))
      .as[(Seq[Long], Seq[Long])].head()
    assert(se == Seq(4L, 5L, 6L, 7L, 0L, 1L, 2L, 3L))
    assert(so == Seq(3L, 4L, 0L, 1L, 2L))
    val (ie, io) = sdf.select(
        Fft.ifftshift(Fft.fftshift(col("even"))),
        Fft.ifftshift(Fft.fftshift(col("odd"))))
      .as[(Seq[Long], Seq[Long])].head()
    assert(ie == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(io == Seq(0L, 1L, 2L, 3L, 4L))
    // fft2 matches the 2-D DFT definition on a 4×4; ifft2 round-trips
    val m = Seq.fill(4)(Seq.fill(4)(rnd.nextDouble() * 4 - 2))
    val mdf = Seq(Tuple1(m)).toDF("m")
    val f2 = mdf.select(Fft.fft2Real(col("m")).as("f"))
    val (g2re, g2im) = f2.select(col("f.re"), col("f.im"))
      .as[(Seq[Seq[Double]], Seq[Seq[Double]])].head()
    for (k1 <- 0 until 4; k2 <- 0 until 4) {
      var (dr, di) = (0.0, 0.0)
      for (a <- 0 until 4; b <- 0 until 4) {
        val ang = -2 * math.Pi * (k1 * a / 4.0 + k2 * b / 4.0)
        dr += m(a)(b) * math.cos(ang); di += m(a)(b) * math.sin(ang)
      }
      assert(math.abs(g2re(k1)(k2) - dr) < 1e-9 &&
        math.abs(g2im(k1)(k2) - di) < 1e-9, s"fft2 bin ($k1,$k2)")
    }
    val m2 = f2.select(Fft.ifft2(col("f.re"), col("f.im")).as("b"))
      .select(col("b.re")).as[Seq[Seq[Double]]].head()
    for (a <- 0 until 4; b <- 0 until 4)
      assert(math.abs(m2(a)(b) - m(a)(b)) < 1e-9, s"ifft2 round trip ($a,$b)")
    // ragged matrix fails loudly
    val ragged = Seq(Tuple1(Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))).toDF("m")
    val re = intercept[Exception] {
      ragged.select(Fft.fft2Real(col("m"))).collect()
    }
    assert(re.getMessage.contains("ragged"))
  }

  test("zarr v2 roundtrip: multi-chunk, edge padding, exact doubles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zarr").toString
    val n = 1000
    val df = spark.range(n).select(
      (col("id") * 1.5).as("x"),
      (col("id") * col("id")).cast("double").as("y"),
      lit(math.Pi).as("z"))
    // chunkRows=128 → 8 chunks, last one padded (1000 = 7*128 + 104)
    val (rows, cols) = GraftFrame(df).toZarr(dir, Seq("x", "y", "z"),
      chunkRows = 128)
    assert(rows == n.toLong && cols == 3)
    assert(new java.io.File(dir, ".zarray").exists())
    assert(new java.io.File(dir, "7.0").exists())
    val back = graft.api.GraftSession(spark)
      .readZarr(dir, Seq("x", "y", "z")).df
      .orderBy("row_index").collect()
    assert(back.length == n)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong)
      assert(r.getDouble(1) == i * 1.5)
      assert(r.getDouble(2) == i.toDouble * i)
      assert(r.getDouble(3) == math.Pi)
    }
    // chunk files store full padded size: 128 rows * 3 cols * 8 bytes
    assert(new java.io.File(dir, "7.0").length() == 128L * 3 * 8)
    // profile guard: a compressed .zarray is rejected loudly
    val badDir = java.nio.file.Files.createTempDirectory("graft_zarr_bad")
    java.nio.file.Files.write(badDir.resolve(".zarray"),
      """{"zarr_format":2,"shape":[1,1],"chunks":[1,1],"dtype":"<f8",
        |"order":"C","compressor":{"id":"blosc"},"fill_value":0.0}"""
        .stripMargin.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      graft.sources.Zarr.read(spark, badDir.toString)
    }
    assert(e.getMessage.contains("profile"))
  }

  test("zarr profile guards: order F, column chunking, filters, empty array") {
    def metaDir(meta: String): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_zarr_guard")
      java.nio.file.Files.write(d.resolve(".zarray"), meta.getBytes("UTF-8"))
      d.toString
    }
    // a valid FOREIGN zarr v2 array outside the profile must fail loudly,
    // not decode transposed/misaligned (ADVICE r7)
    val fOrder = metaDir(
      """{"zarr_format":2,"shape":[4,2],"chunks":[4,2],"dtype":"<f8",
        |"order":"F","compressor":null,"filters":null,"fill_value":0.0}"""
        .stripMargin)
    assert(intercept[IllegalArgumentException](
      graft.sources.Zarr.read(spark, fOrder)).getMessage.contains("order"))
    val colChunked = metaDir(
      """{"zarr_format":2,"shape":[4,2],"chunks":[4,1],"dtype":"<f8",
        |"order":"C","compressor":null,"filters":null,"fill_value":0.0}"""
        .stripMargin)
    assert(intercept[IllegalArgumentException](
      graft.sources.Zarr.read(spark, colChunked))
      .getMessage.contains("column-chunked"))
    val filtered = metaDir(
      """{"zarr_format":2,"shape":[4,2],"chunks":[4,2],"dtype":"<f8",
        |"order":"C","compressor":null,"filters":[{"id":"delta"}],
        |"fill_value":0.0}""".stripMargin)
    assert(intercept[IllegalArgumentException](
      graft.sources.Zarr.read(spark, filtered)).getMessage.contains("filter"))
    // an empty frame roundtrips: no chunk file exists, read returns 0 rows
    val emptyDir = java.nio.file.Files.createTempDirectory("graft_zarr_empty")
      .toString
    val (rows0, cols0) = GraftFrame(
      spark.range(0).select(col("id").cast("double").as("x")))
      .toZarr(emptyDir, Seq("x"))
    assert(rows0 == 0L && cols0 == 1)
    val back0 = graft.sources.Zarr.read(spark, emptyDir, Seq("x"))
    assert(back0.count() == 0L)
    assert(back0.columns.toSeq == Seq("row_index", "x"))
  }

  test("evalPandas assignment program chains targets like pandas eval") {
    val df = Seq((2.0, 3.0), (4.0, 5.0)).toDF("a", "b")
    val out = GraftFrame(df).evalPandas(
      """s = a + b
        |r = s ** 2 - 1
        |flag = (r > 30) & (a == 4)""".stripMargin)
      .df.orderBy("a").select("s", "r", "flag")
      .as[(Double, Double, Boolean)].collect()
    assert(out.toSeq == Seq((5.0, 24.0, false), (9.0, 80.0, true)))
    // == never splits as an assignment; bad targets fail loudly
    intercept[IllegalArgumentException] {
      graft.functions.PandasExpr.translateAssignments("a + b")
    }
    intercept[IllegalArgumentException] {
      graft.functions.PandasExpr.translateAssignments("a.b = 1")
    }
  }

  test("checkMonotonic detects increasing sequences") {
    val inc = GraftFrame(Seq((1L, 1.0), (2L, 2.0), (3L, 2.0)).toDF("o", "v"))
      .checkMonotonic("o", "v").df.collect().head
    assert(inc.getBoolean(0) && !inc.getBoolean(1))
  }

  test("sampleWeighted returns n rows biased toward heavy weights") {
    val rows = (1 to 1000).map(i => (i.toLong, if (i <= 100) 100.0 else 0.01))
    val f = GraftFrame(rows.toDF("id", "w")).sampleWeighted(50, "w", seed = 1)
    val ids = f.df.select("id").as[Long].collect()
    assert(ids.length == 50)
    // heavy ids (1..100, weight 10000x) should dominate the sample
    assert(ids.count(_ <= 100) >= 45, s"only ${ids.count(_ <= 100)} heavy rows sampled")
  }

  test("groupby.applyGroups streams per-group transforms") {
    val f = GraftFrame(Seq((1L, 10.0), (1L, 30.0), (2L, 5.0)).toDF("k", "v"))
    val out = f.groupby("k").applyGroups(
      StructType(Seq(StructField("k", LongType), StructField("demeaned", DoubleType)))) {
      (key, rows) =>
        val vs = rows.map(_.getDouble(1)).toSeq
        val m = vs.sum / vs.size
        vs.iterator.map(v => Row(key.getLong(0), v - m))
    }
    val got = out.df.orderBy("k", "demeaned").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, -10.0), (1L, 10.0), (2L, 0.0)))
  }

  test("mapChunk transforms partitions with explicit schema") {
    val f = GraftFrame(Seq((1L), (2L)).toDF("x")).mapChunk(
      StructType(Seq(StructField("doubled", LongType)))) { it =>
      it.map(r => Row(r.getLong(0) * 2))
    }
    assert(f.df.orderBy("doubled").as[Long].collect().toSeq == Seq(2L, 4L))
  }

  test("agg registry covers mode and median") {
    val f = GraftFrame(Seq((1L, 5.0), (1L, 5.0), (1L, 9.0)).toDF("k", "v"))
    val r = f.groupby("k").agg(("m", "mode", "v"), ("med", "median", "v"))
      .df.collect().head
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 5.0)
  }

  test("ptp and weighted average, frame-level and grouped") {
    val f = GraftFrame(Seq((1L, 2.0, 1.0), (1L, 6.0, 3.0), (2L, 10.0, 2.0))
      .toDF("k", "v", "w"))
    assert(f.ptp(Seq("v")).df.head().getDouble(0) == 8.0)
    // (2·1 + 6·3 + 10·2) / 6
    assert(math.abs(f.averageWeighted("v", "w", "wa").df.head().getDouble(0)
      - 40.0 / 6.0) < 1e-12)
    val grouped = f.groupby("k").averageWeighted("v", "w", "wa")
      .sortValues(Seq("k")).df.collect()
    assert(grouped(0).getDouble(1) == 5.0) // (2·1 + 6·3) / 4
    assert(grouped(1).getDouble(1) == 10.0) // 10·2 / 2
    assert(f.groupby("k").ptp("v", "p").sortValues(Seq("k")).df
      .collect().map(_.getDouble(1)).toSeq == Seq(4.0, 0.0))
  }

  test("groupby agg registry covers product/all/any/sem") {
    val f = GraftFrame(Seq((1L, 2.0, true), (1L, 3.0, false), (2L, 4.0, true))
      .toDF("k", "v", "b"))
    val got = f.groupby("k").agg(
      ("prod", "product", "v"), ("anyb", "any", "b"), ("allb", "all", "b"))
      .sortValues(Seq("k")).df.collect().toSeq
    assert(got == Seq(Row(1L, 6.0, true, false), Row(2L, 4.0, true, true)))
  }

  test("dateRange generates daily dates distributed") {
    val d = g.dateRange("2024-01-01", 5, 2).df.orderBy("date")
      .select(col("date").cast("string")).as[String].collect().toSeq
    assert(d == Seq("2024-01-01", "2024-01-03", "2024-01-05", "2024-01-07", "2024-01-09"))
  }

  test("random sources are seeded and in-range") {
    val u = g.randomUniform(1000, Seq("a", "b"), seed = 7).df
    val stats = u.agg(min("a"), max("a"), avg("a"), corr("a", "b")).collect().head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) < 1.0)
    assert(math.abs(stats.getDouble(2) - 0.5) < 0.05)
    assert(math.abs(stats.getDouble(3)) < 0.1) // independent columns
    val n = g.randomInt(1000, 5, 10, "v", seed = 3).df
      .agg(min("v"), max("v")).collect().head
    assert(n.getLong(0) >= 5L && n.getLong(1) <= 9L)
  }

  test("describeObject counts, uniques, and breaks top ties deterministically") {
    val df = Seq("b", "b", "a", "a", "c", null).map(Tuple1(_)).toDF("s")
    val r = GraftFrame(df).describeObject("s").df.collect().head
    // a and b tie at freq 2 → lexicographically smallest wins
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    assert(r.getString(2) == "a" && r.getLong(3) == 2L)
  }

  test("withRowIndex numbers rows 0..n-1 in the frame's sort order") {
    val df = Seq(("c", 3), ("a", 1), ("b", 2)).toDF("k", "v")
    val got = GraftFrame(df).sortValues(Seq("k")).withRowIndex().df
      .select("k", "row_index").as[(String, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
    // multi-partition: indices stay contiguous across partition boundaries
    val big = spark.range(1000).toDF("id").repartition(7)
    val idx = GraftFrame(big).sortValues(Seq("id")).withRowIndex("i").df
      .filter(col("id") =!= col("i")).count()
    assert(idx == 0L, "row index must equal position in sorted order")
  }

  test("saltedJoin equals the plain join on skewed data") {
    val hot = (1L to 900L).map(i => (1L, i)) ++ (1L to 100L).map(i => (2L, i))
    val l = GraftFrame(hot.toDF("k", "v"))
    val r = GraftFrame(Seq((1L, "x"), (2L, "y")).toDF("k", "tag"))
    val plain = l.merge(r, on = Seq("k")).df
      .select("k", "v", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = l.saltedJoin(r, Seq("k"), saltFactor = 8).df
      .select("k", "v", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    // right/full outer would duplicate unmatched right rows saltFactor
    // times — rejected up front
    intercept[IllegalArgumentException] {
      l.saltedJoin(r, Seq("k"), saltFactor = 8, how = "right")
    }
    intercept[IllegalArgumentException] {
      l.saltedJoin(r, Seq("k"), saltFactor = 8, how = "full")
    }
  }

  test("tensor creation sources: linspace, zeros/ones, eye, at lookup") {
    val ls = g.linspace(0.0, 1.0, 5).df.orderBy("id")
      .select("value").as[Double].collect().toSeq
    assert(ls == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    assert(g.ones(4, Seq("a", "b")).df.agg(sum($"a") + sum($"b"))
      .as[Double].collect().head == 8.0)
    val eye = g.eye(3).df.orderBy("id").select("vec")
      .as[Seq[Double]].collect().toSeq
    assert(eye == Seq(Seq(1.0, 0, 0), Seq(0, 1.0, 0), Seq(0, 0, 1.0)))
    val f = GraftFrame(Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    assert(f.at("k", 2L, "v") == "y")
    intercept[IllegalArgumentException] { f.at("k", 9L, "v") }
  }

  test("nlargest/nsmallest return the extreme rows") {
    val f = GraftFrame((1L to 50L).toDF("v"))
    assert(f.nlargest(3, "v").df.as[Long].collect().sorted.toSeq == Seq(48L, 49L, 50L))
    assert(f.nsmallest(2, "v").df.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("ilocSlice returns the exact positional range over the total order") {
    val f = GraftFrame((1L to 100L).reverse.toDF("v"))
    val got = f.ilocSlice(10, 15, Seq("v")).df.orderBy("v")
      .as[Long].collect().toSeq
    assert(got == (11L to 15L).toSeq)
  }

  test("align conforms both frames to the same key universe") {
    val l = GraftFrame(Seq((1L, "a"), (2L, "b")).toDF("k", "lv"))
    val r = GraftFrame(Seq((2L, 20.0), (3L, 30.0)).toDF("k", "rv"))
    val (la, ra) = l.align(r, Seq("k"), join = "outer")
    val lRows = la.df.orderBy("k").as[(Long, Option[String])].collect().toSeq
    val rRows = ra.df.orderBy("k").as[(Long, Option[Double])].collect().toSeq
    assert(lRows == Seq((1L, Some("a")), (2L, Some("b")), (3L, None)))
    assert(rRows == Seq((1L, None), (2L, Some(20.0)), (3L, Some(30.0))))
    val (li, ri) = l.align(r, Seq("k"), join = "inner")
    assert(li.df.select("k").as[Long].collect().toSeq == Seq(2L))
    assert(ri.df.select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("concatCols outer-aligns columns on keys") {
    val a = GraftFrame(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"))
    val b = GraftFrame(Seq((2L, "p"), (3L, "q")).toDF("k", "y"))
    val got = a.concatCols(Seq(b), Seq("k"), join = "outer")
      .sortValues(Seq("k")).df
      .as[(Long, Option[Double], Option[String])].collect().toSeq
    assert(got == Seq((1L, Some(10.0), None), (2L, Some(20.0), Some("p")),
      (3L, None, Some("q"))))
  }

  test("qcut propagates nulls instead of assigning the top bucket") {
    val df = (Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, null))
      .toDF("x")
    val out = GraftFrame(df).qcut("x", "bucket", q = 4).df
    val nullRows = out.filter(col("x").isNull).select("bucket").collect()
    assert(nullRows.length == 1 && nullRows.head.isNullAt(0))
    assert(out.filter(col("x").isNotNull && col("bucket").isNull).count() == 0)
  }

  test("saltedAgg equals direct aggregation for algebraic functions") {
    val hot = (1L to 1000L).map(i => (i % 3, i))
    val f = GraftFrame(hot.toDF("k", "v"))
    val direct = f.groupby("k").agg(("s", "sum", "v"), ("c", "count", "v"))
      .sortValues(Seq("k")).df.as[(Long, Long, Long)].collect().toSeq
    val saltedS = f.groupby("k").saltedAgg("v", "sum", "s", saltFactor = 8)
      .sortValues(Seq("k")).df.as[(Long, Long)].collect().toSeq
    val saltedC = f.groupby("k").saltedAgg("v", "count", "c", saltFactor = 8)
      .sortValues(Seq("k")).df.as[(Long, Long)].collect().toSeq
    assert(saltedS == direct.map(t => (t._1, t._2)))
    assert(saltedC == direct.map(t => (t._1, t._3)))
  }

  test("pipe chains frame transformations") {
    val f = GraftFrame(Seq(1L, 2L, 3L).toDF("v"))
      .pipe(_.query("v > 1"))
      .pipe(_.assign("v2" -> col("v") * 2))
    assert(f.df.orderBy("v").select("v2").as[Long].collect().toSeq == Seq(4L, 6L))
  }

  test("aggCols accepts arbitrary aggregate columns including custom UDAFs") {
    import graft.functions.aggregates
    val f = GraftFrame(Seq((1L, 2.0), (1L, 3.0), (2L, 4.0)).toDF("k", "v"))
    val got = f.groupby("k").aggCols(
        ("prod", aggregates.product(col("v"))),
        ("rng", max(col("v")) - min(col("v"))))
      .sortValues(Seq("k")).df.as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 6.0, 1.0), (2L, 4.0, 0.0)))
  }

  test("exponential and lognormal sources match distribution moments") {
    val e = g.randomExponential(20000, rate = 2.0, seed = 5).df
      .agg(avg("value"), min("value")).collect().head
    assert(math.abs(e.getDouble(0) - 0.5) < 0.02) // mean = 1/rate
    assert(e.getDouble(1) >= 0.0)
    val ln = g.randomLognormal(20000, mu = 0.0, sigma = 0.25, seed = 6).df
      .agg(expr("avg(ln(value))"), expr("stddev_samp(ln(value))")).collect().head
    assert(math.abs(ln.getDouble(0)) < 0.01)
    assert(math.abs(ln.getDouble(1) - 0.25) < 0.01)
  }

  test("sketches: count-min overestimates within bound, bloom has no false negatives") {
    val f = GraftFrame((1L to 1000L).map(i => i % 100).toDF("v"))
    val cms = f.countMinSketch("v", eps = 0.001, confidence = 0.99)
    // every value 0..99 occurs 10 times; CMS never underestimates
    (0L until 100L).foreach(v => assert(cms.estimateCount(v) >= 10))
    val bloom = f.bloomFilter("v", expectedItems = 100)
    (0L until 100L).foreach(v => assert(bloom.mightContain(v)))
    val q = f.quantileApprox("v", Seq(0.5), relativeError = 0.01)
    assert(q.head >= 45.0 && q.head <= 55.0)
    val hll = f.groupby("v").agg(("n", "approx_nunique", "v")).df.count()
    assert(hll == 100)
  }

  test("csv round-trip preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val f = GraftFrame(Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v"))
    f.toCsv(s"$dir/out", header = true, singleFile = true)
    val back = g.readCsv(s"$dir/out", header = true)
      .sortValues(Seq("k")).df.collect().toSeq
    assert(back == Seq(Row(1L, "a", 1.5), Row(2L, "b", 2.5)))
  }

  test("bfill fills backward within groups") {
    val f = GraftFrame(Seq(
      (1L, 1L, None: Option[Double]), (1L, 2L, Some(5.0)), (1L, 3L, None))
      .toDF("k", "o", "v"))
    val got = f.bfill(Seq("k"), Seq("o"), Seq("v"))
      .sortValues(Seq("o")).df.select("v").as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(5.0), Some(5.0), None))
  }

  test("clip bounds values") {
    val f = GraftFrame(Seq(-5.0, 0.5, 99.0).toDF("v")).clip("v", 0.0, 1.0)
    assert(f.df.orderBy("v").as[Double].collect().toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("groupby.sampleFrac is deterministic and roughly proportional") {
    val f = GraftFrame((1L to 2000L).map(i => (i % 4, i)).toDF("k", "v"))
    val s1 = f.groupby("k").sampleFrac(0.25, seed = 3).df.count()
    val s2 = f.groupby("k").sampleFrac(0.25, seed = 3).df.count()
    assert(s1 == s2)
    assert(s1 > 350 && s1 < 650, s"sampled $s1 of 2000 at frac 0.25")
  }

  test("session sql surface runs over registered views") {
    g.registerTables("/root/testdata/sf0.001")
    val n = g.sql("SELECT COUNT(*) AS n FROM nation").df.as[Long].collect().head
    assert(n > 0)
  }

  test("toDatetime / toNumeric coerce failures to null") {
    val f = GraftFrame(Seq(("2024-03-05", "12.5"), ("garbage", "x")).toDF("d", "n"))
      .toDatetime("d", "ts").toNumeric("n", "num")
    val rows = f.df.select("ts", "num").collect()
    assert(rows(0).getTimestamp(0) != null && rows(0).getDouble(1) == 12.5)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("rank supports pandas min/dense/first tie methods") {
    val f = GraftFrame(Seq((1L, 10.0), (2L, 10.0), (3L, 20.0)).toDF("id", "v"))
    val r = f.rank("r_min", Nil, Seq(col("v")), "min")
      .rank("r_dense", Nil, Seq(col("v")), "dense")
      .rank("r_first", Nil, Seq(col("v"), col("id")), "first")
      .sortValues(Seq("id")).df
      .select("r_min", "r_dense", "r_first").as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 1L), (1L, 1L, 2L), (3L, 2L, 3L)))
  }

  test("groupby.sampleN returns at most n deterministic rows per group") {
    val f = GraftFrame((1L to 100L).map(i => (i % 5, i)).toDF("k", "v"))
    val s1 = f.groupby("k").sampleN(3, seed = 9).df.collect().toSet
    val s2 = f.groupby("k").sampleN(3, seed = 9).df.collect().toSet
    assert(s1 == s2) // deterministic
    val counts = f.groupby("k").sampleN(3, seed = 9).df
      .groupBy("k").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 3L))
  }

  test("matvec projects rows through a literal matrix") {
    import graft.functions.VectorFunctions
    val f = Seq(Tuple1(Seq(1f, 2f, 3f))).toDF("v")
    val got = f.select(VectorFunctions.matvec(
        Seq(Seq(1.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)), col("v")).as("p"))
      .as[Seq[Double]].collect().head
    assert(got == Seq(1.0, 6.0))
  }

  test("orc round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val f = graft.api.GraftFrame(
      Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "x"))
    f.toOrc(s"$dir/out")
    val back = graft.api.GraftSession(spark).readOrc(s"$dir/out")
    // ORC read-back relaxes nullability; names and types must survive
    assert(back.df.schema.map(f0 => (f0.name, f0.dataType)) ==
      f.df.schema.map(f0 => (f0.name, f0.dataType)))
    assert(back.df.orderBy("id").collect().toSeq ==
      f.df.orderBy("id").collect().toSeq)
  }

  test("execution surface: execute/fetch/persist/unpersist round-trip") {
    val f = graft.api.GraftFrame(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(f.execute().fetch(10).length == 2)
    val p = f.persist("MEMORY_ONLY")
    p.df.count()
    assert(p.df.storageLevel.useMemory)
    p.unpersist()
    assert(f.localCheckpoint().fetch(1).length == 1)
  }

  test("argmax takes the first tie; topKValues sorts descending") {
    import graft.functions.VectorFunctions
    val f = Seq(Tuple1(Seq(2f, 5f, 1f, 5f))).toDF("v")
    val got = f.select(
        VectorFunctions.argmax(col("v")).as("i"),
        VectorFunctions.topKValues(col("v"), 3).as("t"))
      .as[(Long, Seq[Float])].collect().head
    assert(got == ((1L, Seq(5f, 5f, 2f))))
  }

  test("toParquet round-trip with partitioning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val f = GraftFrame(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "part"))
    f.toParquet(s"$dir/out", partitionBy = Seq("part"))
    val back = g.readParquet(s"$dir/out").df
    assert(back.count() == 3)
    assert(back.filter(col("part") === "a").count() == 2)
  }

  test("tail returns the last n rows in ascending order") {
    val f = GraftFrame((1L to 100L).toDF("id")).tail(3, Seq("id"))
    assert(f.df.select("id").as[Long].collect().toSeq == Seq(98L, 99L, 100L))
  }

  test("reindex conforms to a key frame with fill") {
    val data = GraftFrame(Seq((1L, 10.0), (3L, 30.0)).toDF("k", "v"))
    val keys = GraftFrame(Seq(1L, 2L, 3L).toDF("k"))
    val r = data.reindex(keys, Seq("k"), fillValue = Some(0.0))
      .sortValues(Seq("k")).df.as[(Long, Double)].collect().toSeq
    assert(r == Seq((1L, 10.0), (2L, 0.0), (3L, 30.0)))
  }

  test("groupby.transform broadcasts the group aggregate onto rows") {
    val f = GraftFrame(Seq((1L, 2.0), (1L, 4.0), (2L, 6.0)).toDF("k", "v"))
    val got = f.groupby("k").transform("mean", "v", "v_mean")
      .sortValues(Seq("k", "v")).df.select("v_mean").as[Double].collect().toSeq
    assert(got == Seq(3.0, 3.0, 6.0))
  }

  test("jdbc round-trip through embedded Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val f = GraftFrame(Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v"))
    f.toJdbc(url, "roundtrip")
    val back = g.readJdbc(url, "roundtrip").sortValues(Seq("k")).df.collect().toSeq
    assert(back == Seq(Row(1L, "a", 1.5), Row(2L, "b", 2.5)))
  }

  test("fromRows creates a distributed frame from local rows") {
    val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
    val f = g.fromRows(Seq(Row(1L, "a"), Row(2L, "b")), schema, numPartitions = 2)
    assert(f.df.count() == 2 && f.df.rdd.getNumPartitions == 2)
  }

  test("astypeCategory dictionary-encodes with a sorted code table") {
    val f = GraftFrame(Seq(("x", 1L), ("z", 2L), ("y", 3L), ("x", 4L),
      (null.asInstanceOf[String], 5L)).toDF("cat", "k"))
    val (encoded, categories) = f.astypeCategory("cat")
    val table = categories.sortValues(Seq("code")).df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(table == Seq((0L, "x"), (1L, "y"), (2L, "z")),
      "codes are dense ranks of the sorted distinct categories")
    val codes = encoded.sortValues(Seq("k")).df
      .select("cat_code").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(codes == Seq(0L, 2L, 1L, 0L, -1L), "null category → null code (pandas -1 analog)")
    // the encode join must be broadcast — no shuffle of the fact side
    val plan = encoded.df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"category join should broadcast:\n$plan")
  }

  test("jdbc partitioned scan splits the read across partitions") {
    val url = "jdbc:derby:memory:graftdb2;create=true"
    val f = GraftFrame((1L to 40L).map(i => (i, i * 2.0)).toDF("k", "v"))
    f.toJdbc(url, "parted")
    val back = g.readJdbc(url, "parted", partitionColumn = Some("k"),
      lowerBound = 1L, upperBound = 41L, numPartitions = 4)
    assert(back.df.rdd.getNumPartitions == 4,
      "reference read_sql(partition_col, num_partitions) → partitioned JDBC scan")
    assert(back.df.count() == 40)
  }

  test("setIndex / setAxis / selectDtypes reshape the column axis") {
    val f = GraftFrame(Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("k", "s", "v"))
    assert(f.setIndex("v").df.columns.toSeq == Seq("v", "k", "s"),
      "set_index moves the index columns to the front")
    assert((f.resetIndex() eq f) || f.resetIndex().df.columns.sameElements(f.df.columns))
    assert(f.setAxis(Seq("a", "b", "c")).df.columns.toSeq == Seq("a", "b", "c"))
    intercept[IllegalArgumentException] { f.setAxis(Seq("only_two", "names")) }
    assert(f.selectDtypes(include = Seq("double", "long")).df.columns.toSeq == Seq("k", "v"))
    assert(f.selectDtypes(exclude = Seq("string")).df.columns.toSeq == Seq("k", "v"))
    intercept[IllegalArgumentException] { f.selectDtypes(include = Seq("date")) }
  }

  test("readText scans lines with file provenance and stable content ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_text").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "a.txt").toPath, "alpha\nbeta\n")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "b.txt").toPath, "gamma\n")
    val f = g.readText(dir.getAbsolutePath)
    val rows = f.df.collect()
    assert(rows.length == 3)
    assert(f.columns == Seq("source_file", "text", "doc_id"))
    assert(rows.forall(r => r.getString(0).nonEmpty && !r.isNullAt(2)))
    assert(rows.map(_.getLong(2)).distinct.length == 3, "content ids unique here")
  }

  test("readBinaryFiles ingests opaque media bytes with provenance and glob pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.jpg").toPath,
      Array[Byte](-1, -40, -1, 1, 2, 3)) // JFIF-ish magic + payload
    java.nio.file.Files.write(new java.io.File(dir, "b.wav").toPath,
      Array[Byte](82, 73, 70, 70))
    val all = g.readBinaryFiles(dir.getAbsolutePath).df.collect()
    assert(all.length == 2)
    assert(all.forall(r => r.getAs[Array[Byte]]("content").nonEmpty &&
      r.getAs[Long]("length") == r.getAs[Array[Byte]]("content").length))
    val jpg = g.readBinaryFiles(dir.getAbsolutePath, "*.jpg").df.collect()
    assert(jpg.length == 1 && jpg.head.getAs[Long]("length") == 6L)
    assert(jpg.head.getAs[Array[Byte]]("content").take(3).toSeq ==
      Seq(-1.toByte, -40.toByte, -1.toByte), "bytes arrive untouched")
  }

  test("idxmax/idxmin break value ties deterministically by id") {
    val f = GraftFrame(Seq(
      ("a", 5.0, 1L), ("a", 5.0, 9L), ("a", 1.0, 3L), ("a", 1.0, 2L),
      ("b", 7.0, 4L)).toDF("k", "v", "id"))
    val up = f.groupby("k").idxmax("v", "id", "imax").sortValues(Seq("k")).df
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(up == Seq(("a", 9L), ("b", 4L)), "ties -> largest id")
    val dn = f.groupby("k").idxmin("v", "id", "imin").sortValues(Seq("k")).df
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dn == Seq(("a", 2L), ("b", 4L)), "ties -> smallest id")
    // pandas skipna: a null value must never win idxmin (a (null, id)
    // struct would sort below every real value)
    val withNull = GraftFrame(Seq(("a", Some(5.0), 1L), ("a", None, 9L),
      ("a", Some(3.0), 3L)).toDF("k", "v", "id"))
    val mn = withNull.groupby("k").idxmin("v", "id", "imin").df
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(mn == Seq(("a", 3L)), "null values are skipped, not treated as minimum")
  }

  test("dot broadcasts the small side and shuffles only on the id") {
    val a = GraftFrame(Seq((1L, 1.0, 2.0), (2L, 3.0, 4.0)).toDF("id", "f1", "f2"))
    val b = GraftFrame(Seq(("f1", 1.0, 0.0), ("f2", 0.0, 1.0), ("f3", 9.0, 9.0))
      .toDF("key", "o1", "o2"))
    // b's extra dimension f3 has no match in a — inner join drops it
    val out = a.dot(b, "id", "key").sortValues(Seq("id")).df
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 1.0, 2.0), (2L, 3.0, 4.0)),
      "identity weights reproduce the inputs")
    val plan = a.dot(b, "id", "key").df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weights must broadcast:\n$plan")
  }

  test("fromRecords builds a frame from heterogeneous maps with nulls") {
    val gs = GraftSession(spark)
    val recs = Seq(Map[String, Any]("id" -> 1L, "name" -> "a"),
      Map[String, Any]("id" -> 2L))
    val df = gs.fromRecords(recs, Seq("id" -> LongType, "name" -> StringType)).df
    val got = df.orderBy("id").collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(got.toSeq == Seq((1L, false), (2L, true)))
  }

  test("corrwith: perfect linear relation gives corr 1, inverse gives -1") {
    val a = GraftFrame(Seq((1L, 1.0, 3.0), (2L, 2.0, 2.0), (3L, 3.0, 1.0))
      .toDF("k", "x", "y"))
    val b = GraftFrame(Seq((1L, 10.0, 30.0), (2L, 20.0, 20.0), (3L, 30.0, 10.0))
      .toDF("k", "x", "y"))
    val got = a.corrwith(b, Seq("k"), Seq("x", "y")).df
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(got("x") - 1.0) < 1e-12)
    assert(math.abs(got("y") - 1.0) < 1e-12) // y is also linear in b's y
  }

  test("groupby.nth: 0-based position, negative from the end, short groups drop") {
    val df = GraftFrame(Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
      ("b", 1, 40.0), ("b", 2, 50.0)).toDF("g", "t", "v"))
    val n1 = df.groupby("g").nth(1, Seq(col("t"))).df
      .select("g", "v").as[(String, Double)].collect().toMap
    assert(n1 == Map("a" -> 20.0, "b" -> 50.0))
    val n2 = df.groupby("g").nth(2, Seq(col("t"))).df
      .select("g", "v").as[(String, Double)].collect().toMap
    assert(n2 == Map("a" -> 30.0), "group b has no 3rd row")
    val last = df.groupby("g").nth(-1, Seq(col("t"))).df
      .select("g", "v").as[(String, Double)].collect().toMap
    assert(last == Map("a" -> 30.0, "b" -> 50.0))
    val secondLast = df.groupby("g").nth(-2, Seq(col("t"))).df
      .select("g", "v").as[(String, Double)].collect().toMap
    assert(secondLast == Map("a" -> 20.0, "b" -> 40.0))
  }

  test("betweenTime keeps the inclusive window and wraps over midnight") {
    val rows = Seq(
      (1L, "2024-03-01 06:29:59"), (2L, "2024-03-01 06:30:00"),
      (3L, "2024-03-01 12:00:00"), (4L, "2024-03-01 18:45:00"),
      (5L, "2024-03-01 18:45:01"), (6L, "2024-03-01 23:30:00"),
      (7L, "2024-03-02 02:59:59"), (8L, "2024-03-02 03:00:01"))
    val df = GraftFrame(rows.toDF("id", "s")
      .select($"id", to_timestamp($"s").as("ts")))
    val day = df.betweenTime("ts", "06:30", "18:45")
      .df.select("id").as[Long].collect().toSet
    assert(day == Set(2L, 3L, 4L), "inclusive bounds, 06:29:59/18:45:01 out")
    val night = df.betweenTime("ts", "22:00", "03:00")
      .df.select("id").as[Long].collect().toSet
    assert(night == Set(6L, 7L), "wraps over midnight; 03:00:01 out")
    assert(df.atTime("ts", "12:00").df.select("id").as[Long].collect().toSet
      == Set(3L))
  }

  test("corrScalar dispatches pearson/spearman/kendall like pandas method=") {
    // y = x³ is monotone but nonlinear: rank methods say 1, pearson < 1
    val df = GraftFrame((1 to 15).map(i =>
      (i.toDouble, math.pow(i.toDouble, 3))).toDF("x", "y"))
    def stat(m: String) =
      df.corrScalar("x", "y", m).df.collect().head.getDouble(0)
    assert(math.abs(stat("spearman") - 1.0) < 1e-12)
    assert(math.abs(stat("kendall") - 1.0) < 1e-12)
    val p = stat("pearson")
    assert(p > 0.9 && p < 0.9999, s"pearson on a convex curve: $p")
    intercept[IllegalArgumentException] { df.corrScalar("x", "y", "cosine") }
  }

  test("autocorr: lag-1 of a linear series is 1, alternating series is -1") {
    val lin = GraftFrame((1 to 20).map(i => ("g", i, i.toDouble)).toDF("g", "t", "v"))
    val l = lin.autocorr(Seq("g"), "t", "v").df.collect().head.getDouble(1)
    assert(math.abs(l - 1.0) < 1e-12, s"linear: $l")
    val alt = GraftFrame((1 to 20).map(i => ("g", i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("g", "t", "v"))
    val a2 = alt.autocorr(Seq("g"), "t", "v").df.collect().head.getDouble(1)
    assert(math.abs(a2 + 1.0) < 1e-12, s"alternating: $a2")
  }

  test("modeDet picks the most frequent value, ties to the smallest") {
    val df = GraftFrame(Seq(("a", 3L), ("a", 3L), ("a", 7L), ("a", 7L),
      ("a", 9L), ("b", 5L)).toDF("g", "v"))
    val got = df.modeDet(Seq("g"), "v").sortValues(Seq("g"))
      .df.as[(String, Long)].collect().toSeq
    // group a: 3 and 7 tie at count 2 → smallest (3); group b: 5
    assert(got == Seq(("a", 3L), ("b", 5L)))
  }

  test("quantileInterp matches the pandas interpolation methods by hand") {
    val df = GraftFrame(Seq(1.0, 2.0, 3.0, 4.0).toDF("x"))
    // q = 0.25: h = 0.75 → lower 1, higher 2, nearest rint(.75)=1 → 2
    val r1 = df.quantileInterp("x", 0.25).df.collect().head
    assert(r1.getAs[Long]("n") == 4L)
    assert(r1.getAs[Double]("lo") == 1.0 && r1.getAs[Double]("hi") == 2.0)
    assert(r1.getAs[Double]("near") == 2.0 && r1.getAs[Double]("mid") == 1.5)
    // q = 0.5: h = 1.5 → lower 2, higher 3; banker's rint(1.5) = 2 → 3
    val r2 = df.quantileInterp("x", 0.5).df.collect().head
    assert(r2.getAs[Double]("lo") == 2.0 && r2.getAs[Double]("hi") == 3.0)
    assert(r2.getAs[Double]("near") == 3.0 && r2.getAs[Double]("mid") == 2.5)
    // duplicates: the k-th VALUE is order-of-ties independent
    val dup = GraftFrame(Seq(5.0, 5.0, 5.0, 9.0).toDF("x"))
    val r3 = dup.quantileInterp("x", 0.5).df.collect().head
    assert(r3.getAs[Double]("lo") == 5.0 && r3.getAs[Double]("hi") == 5.0)
    intercept[IllegalArgumentException] { df.quantileInterp("x", 1.5) }
  }

  test("MultiIndex level ops: swap/reorder/drop/xs/groupbyLevel semantics") {
    val f = GraftFrame(Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 30.0))
      .toDF("g", "k", "v")).setIndex("g", "k")
    // swap exchanges level order (metadata + front columns)
    val sw = f.swapLevel()
    assert(sw.index == Seq("k", "g") && sw.columns.take(2) == Seq("k", "g"))
    // negative positions address from the end, pandas-style
    assert(f.swapLevel(0, -1).index == Seq("k", "g"))
    // reorder must be a permutation
    intercept[IllegalArgumentException] { f.reorderLevels(Seq("g", "g")) }
    // droplevel removes the level AND its column; last level refuses
    val dl = f.dropLevel("g")
    assert(dl.index == Seq("k") && !dl.columns.contains("g"))
    intercept[IllegalArgumentException] { dl.dropLevel("k") }
    // xs filters at the level and drops it
    val x = f.xs("a", "g")
    assert(!x.columns.contains("g") && x.df.count() == 2)
    // groupbyLevel addresses by position over the DECLARED order
    val gl = f.swapLevel().groupbyLevel(1).agg(("n", "count", "v"))
      .df.orderBy("g").collect()
    assert(gl.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
    // unstack pivots the chosen level into columns
    val us = f.unstackLevel("k", "v", Seq(1, 2))
    assert(us.index == Seq("g") && us.columns.toSet == Set("g", "1", "2"))
    val usA = us.df.filter($"g" === "a").collect().head
    assert(usA.getDouble(1) == 10.0 && usA.getDouble(2) == 20.0)
    val usB = us.df.filter($"g" === "b").collect().head
    assert(usB.getDouble(1) == 30.0 && usB.isNullAt(2)) // absent cell → null
    // duplicate (rest, level) pairs raise LOUDLY at evaluation time
    // (pandas ValueError; ADVICE r12 — no silent min)
    val dup = GraftFrame(Seq(("a", 1L, 10.0), ("a", 1L, 11.0))
      .toDF("g", "k", "v")).setIndex("g", "k")
    val ex = intercept[Exception] {
      dup.unstackLevel("k", "v", Seq(1)).df.collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(msgs.contains("duplicate index entries"), msgs.take(500))
    // out-of-range and non-index levels fail loudly
    intercept[IllegalArgumentException] { f.xs("a", 5) }
    intercept[IllegalArgumentException] { f.xs("a", "v") }
  }

  test("widthCap grows with the executor fleet, floors at the single-box bound") {
    import graft.api.GraftSession.widthCap
    // single box (local[32]): 4·32 = 128 ≪ 4096 → the bookkeeping bound
    assert(widthCap(32) == 4096L)
    assert(widthCap(1024) == 4096L) // 4·1024 = 4096 exactly — boundary
    // a real fleet: 2000 core slots → 8000 concurrent-wave budget
    assert(widthCap(2000) == 8000L)
  }

  test("scaleShuffleWidth floors at the gate width and scales with bytes") {
    import java.nio.file.Files
    val before = spark.sessionState.conf.numShufflePartitions
    try {
      // small corpus (the sf0.1 gate shape): bytes/128MB = 0 → floor
      val small = Files.createTempDirectory("graft_width_small")
      Files.write(small.resolve("t.parquet"), new Array[Byte](1024))
      assert(graft.api.GraftSession.scaleShuffleWidth(spark,
        small.toString) == before)
      // 10 GB corpus (sparse files — ext4 reports apparent size):
      // 10 GiB / 128 MiB = 80 partitions
      val big = Files.createTempDirectory("graft_width_big")
      for (i <- 0 until 10) {
        val raf = new java.io.RandomAccessFile(
          big.resolve(s"t$i.parquet").toFile, "rw")
        try raf.setLength(1L << 30) finally raf.close()
      }
      spark.conf.set("spark.sql.shuffle.partitions", before.toString)
      assert(graft.api.GraftSession.scaleShuffleWidth(spark,
        big.toString) == 80)
      // missing dir → floor, no throw
      spark.conf.set("spark.sql.shuffle.partitions", before.toString)
      assert(graft.api.GraftSession.scaleShuffleWidth(spark,
        "/nonexistent/graft") == before)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before.toString)
  }

  test("fluent ppjoinPairs and bpeTokens round-trip (r15 VERDICT #9)") {
    val docs = GraftFrame(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")))
    // ppjoinPairs == the operator call, column-for-column
    val viaFrame = docs.ppjoinPairs("text", "doc_id").df
    val direct = graft.operators.Dedup.ppjoinPairs(docs.df, "text", "doc_id")
    assert(viaFrame.columns.toSeq ===
      Seq("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard"))
    assert(viaFrame.count() == direct.count())
    // bpeTokens == the oracled replace-chain column on the pinned table
    val withTokens = docs.bpeTokens("text", "bpe").df
    val expect = docs.df.withColumn("bpe",
      graft.functions.TextFunctions.bpeTokenCount(
        org.apache.spark.sql.functions.col("text")))
    assert(withTokens.columns.contains("bpe"))
    assert(withTokens.exceptAll(expect).isEmpty && expect.exceptAll(withTokens).isEmpty)
  }

  test("fluent bpeTokenIds / bpePretokenized / packSequencesByLen round-trip (r16)") {
    import org.apache.spark.sql.functions.{col, size}
    val docs = GraftFrame(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")))
    // bpeTokenIds == the function call; ids 1:1 with the token count
    val withIds = docs.bpeTokenIds("text", "ids").df
    val counted = docs.bpeTokens("text", "bpe").df
    val joined = withIds.select(col("doc_id"), size(col("ids")).as("n"))
      .join(counted.select(col("doc_id"), col("bpe")), "doc_id")
    assert(joined.filter(col("n") =!= col("bpe")).isEmpty)
    // pretokenized column feeds the same paths (insertion-only transform)
    val pre = docs.bpePretokenized("text", "pre").df
    assert(pre.columns.contains("pre") && pre.count() == docs.df.count())
    // packSequencesByLen(size(ids)) == packSequences when lengths agree:
    // pack by the whitespace token count expressed as a length column
    val byLen = docs.bpeTokenIds("text", "ids")
      .packSequencesByLen(
        graft.functions.TextFunctions.tokenCount(col("text")),
        "doc_id", capacity = 256, nShards = 4).df
      .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
    val byText = docs.packSequences("text", "doc_id", 256, 4).df
      .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
    assert(byLen.exceptAll(byText).isEmpty && byText.exceptAll(byLen).isEmpty)
  }

  test("fluent bpeDecode / packSequencesEmit: loader surface round-trips (r17)") {
    import org.apache.spark.sql.functions.{col, expr, length, regexp_replace, trim}
    val docs = GraftFrame(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(80))
    val sp = Vector("</s>", "<ws>")
    val ws = Some("<ws>")
    // fluent encode -> fluent decode inverts modulo collapsed whitespace
    val rt = docs.bpeTokenIds("text", "ids", specials = sp, wordSep = ws)
      .bpeDecode("ids", "back", specials = sp, wordSep = ws).df
      .filter(col("back") =!=
        trim(regexp_replace(col("text"), "[ \t\n\r]+", " ")))
    assert(rt.isEmpty, "fluent decode(encode(x)) diverged")
    // fluent packSequencesEmit emits loader-ready columns
    val packs = docs.bpeTokenIds("text", "ids", specials = sp)
      .packSequencesEmit("ids", "doc_id", capacity = 256, nShards = 4,
        eosId = 0).df
    assert(Seq("shard", "pack_id", "ids", "doc_spans", "n_docs", "n_tokens")
      .forall(packs.columns.contains))
    assert(packs.filter(expr("size(ids) > 256")).isEmpty,
      "pack exceeded capacity")
    assert(packs.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0) == 80L)
  }
}
