package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.{functions => F}

/** Per-row fast Fourier transform over an `array<double>` column
  * (reference mars/tensor/fft/ — opcodes 601–630 — computes tensor-axis
  * FFTs by delegating chunks to numpy.fft; the Spark-idiomatic slice of
  * that surface is the batched per-row transform, where each row holds
  * one signal — per-user event series, audio frames, embedding spectra —
  * and a million rows transform in parallel with zero shuffle. A
  * cross-partition single-axis FFT of one giant tensor would need
  * butterfly exchanges between chunks; that remains de-scoped, as
  * SURVEY §2.14 records).
  *
  * Iterative radix-2 Cooley–Tukey, power-of-2 lengths, twiddles computed
  * directly per stage (`cos/sin(ang·j)` — no cumulative rotation error).
  * The UDF carve-out is deliberate: an FFT is an inherently imperative
  * loop with no builtin/codegen equivalent (same justification as the
  * NFC-normalize UDF, the only other one in the repo).
  */
object Fft {
  final case class Complex2(re: Seq[Double], im: Seq[Double])

  /** Null contract for the UDFs below: a null input array yields a null
    * output (SQL missing-data semantics, matching numpy.fft on masked
    * input); a null ELEMENT is rejected loudly — silently unboxing it
    * would read 0.0 and corrupt the spectrum with no error. */
  private def checkedArray(xs: Seq[java.lang.Double], what: String): Array[Double] = {
    val out = new Array[Double](xs.length)
    var i = 0
    xs.foreach { v =>
      require(v != null, s"fft: null element at index $i in $what array")
      out(i) = v.doubleValue(); i += 1
    }
    out
  }

  private[graft] def transform(re: Array[Double], im: Array[Double],
      inverse: Boolean): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"fft length must be a power of 2: $n")
    // bit-reversal permutation
    var j = 0
    var i = 0
    while (i < n - 1) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var m = n >> 1
      while (m >= 1 && j >= m) { j -= m; m >>= 1 }
      j += m
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val half = len >> 1
      var base = 0
      while (base < n) {
        var k = 0
        while (k < half) {
          val wr = math.cos(ang * k)
          val wi = math.sin(ang * k)
          val i0 = base + k
          val i1 = i0 + half
          val xr = re(i1) * wr - im(i1) * wi
          val xi = re(i1) * wi + im(i1) * wr
          re(i1) = re(i0) - xr
          im(i1) = im(i0) - xi
          re(i0) = re(i0) + xr
          im(i0) = im(i0) + xi
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (inverse) {
      var p = 0
      while (p < n) { re(p) /= n; im(p) /= n; p += 1 }
    }
  }

  /** FFT of a real-valued signal column → struct(re, im). */
  val fftReal: Column => Column = {
    val f = udf((xs: Seq[java.lang.Double]) => {
      if (xs == null) null
      else {
        val re = checkedArray(xs, "signal")
        val im = new Array[Double](re.length)
        transform(re, im, inverse = false)
        Complex2(re.toSeq, im.toSeq)
      }
    })
    f(_)
  }

  /** Inverse FFT of struct(re, im) → struct(re, im). */
  val ifft: (Column, Column) => Column = {
    val f = udf((res: Seq[java.lang.Double], ims: Seq[java.lang.Double]) => {
      if (res == null || ims == null) null
      else {
        val re = checkedArray(res, "re")
        val im = checkedArray(ims, "im")
        transform(re, im, inverse = true)
        Complex2(re.toSeq, im.toSeq)
      }
    })
    (a, b) => f(a, b)
  }

  /** Distributed single-axis FFT of ONE long signal in long form
    * (posCol, reCol, imCol rows, length `n` a power of 2) — closes the
    * cross-partition FFT de-scope (reference mars/tensor/fft/, opcodes
    * 601–630, which butterfly-exchanges between tensor chunks).
    *
    * Four-step (Bailey) decomposition, N = n1·n2 with n1,n2 ≈ √N:
    * writing input index n = i1·n2 + g and output index k = k2·n1 + k1,
    *   X[k2·n1 + k1] = Σ_g W_n2^{g·k2} · W_N^{g·k1} ·
    *                      (Σ_i1 x[i1·n2 + g] · W_n1^{i1·k1})
    * so the transform is: (1) an n1-point FFT within each of the n2
    * residue groups g, (2) a per-row twiddle by W_N^{g·k1}, (3) an
    * n2-point FFT within each of the n1 groups k1. Spark shape: TWO
    * hash-partitioned group-aggregates (collect the ≈√N-point group,
    * transform in-task, posexplode back) and one narrow projection
    * between them — no butterfly exchanges, no driver collection. At
    * N = 2^40 a group is 2^20 complex points = 16 MiB per task: the
    * per-task memory is the square root of the signal, which is the
    * whole point of the decomposition. */
  def fftLong(df: org.apache.spark.sql.DataFrame, posCol: String,
      reCol: String, imCol: String, n: Long,
      inverse: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(n >= 2 && (n & (n - 1)) == 0, s"fft length must be a power of 2: $n")
    val k = java.lang.Long.numberOfTrailingZeros(n)
    val n1 = 1L << ((k + 1) / 2) // per-group FFT size (the larger half)
    val n2 = n / n1
    // the inverse is the same decomposition under conjugation: both group
    // transforms run inverse (their 1/n1 · 1/n2 scalings compose to the
    // 1/N the inverse DFT needs) and the twiddle angle flips sign
    def groupFft(expect: Int) = udf((xs: Seq[org.apache.spark.sql.Row]) => {
      require(xs.length == expect,
        s"fftLong: group has ${xs.length} points, expected $expect " +
          "(signal must cover positions 0..n-1 exactly once)")
      val re = new Array[Double](expect)
      val im = new Array[Double](expect)
      var q = 0
      while (q < expect) {
        // struct(i, re, im) sorted by i via sort_array
        val r = xs(q); re(q) = r.getDouble(1); im(q) = r.getDouble(2); q += 1
      }
      Fft.transform(re, im, inverse)
      re.indices.map(j => (re(j), im(j)))
    })
    val fft1 = groupFft(n1.toInt)
    val fft2 = groupFft(n2.toInt)
    val p = col(posCol).cast("long")
    // step 1: n1-point FFT per residue group g = pos mod n2
    val s1 = df
      .select((p % n2).as("g"), (p / n2).cast("int").as("i"),
        col(reCol).cast("double").as("re"), col(imCol).cast("double").as("im"))
      .groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("i"), col("re"), col("im"))))
        .as("xs"))
      .select(col("g"), posexplode(fft1(col("xs"))))
      .select(col("g"), col("pos").cast("long").as("k1"),
        col("col._1").as("re"), col("col._2").as("im"))
    // step 2: twiddle by W_N^{g·k1} (g·k1 < N, so the angle argument
    // stays small and exact in a double)
    val theta = lit((if (inverse) 2.0 else -2.0) * math.Pi / n) *
      (col("g") * col("k1")).cast("double")
    val tw = s1.select(col("k1"), col("g").cast("int").as("i"),
      (col("re") * cos(theta) - col("im") * sin(theta)).as("re"),
      (col("re") * sin(theta) + col("im") * cos(theta)).as("im"))
    // step 3: n2-point FFT per k1 group; output index k = k2·n1 + k1
    tw.groupBy(col("k1"))
      .agg(sort_array(collect_list(struct(col("i"), col("re"), col("im"))))
        .as("xs"))
      .select(col("k1"), posexplode(fft2(col("xs"))))
      .select((col("pos").cast("long") * n1 + col("k1")).as(posCol),
        col("col._1").as(reCol), col("col._2").as(imCol))
  }

  /** Power spectrum |X_k|² of a real signal — the periodogram feature
    * column a pipeline actually joins on. */
  val powerSpectrum: Column => Column = {
    val f = udf((xs: Seq[java.lang.Double]) => {
      if (xs == null) null
      else {
        val re = checkedArray(xs, "signal")
        val im = new Array[Double](re.length)
        transform(re, im, inverse = false)
        re.indices.map(k => re(k) * re(k) + im(k) * im(k))
      }
    })
    f(_)
  }

  // --- the rest of the numpy.fft per-row family (reference
  // mars/tensor/fft/rfft.py:30, irfft.py:30, hfft.py:30, ihfft.py:28,
  // fftfreq.py:33, rfftfreq.py:30, fftshift.py:28, ifftshift.py:28 — each
  // delegates a chunk to the matching numpy.fft routine). Everything below
  // COMPOSES from the two imperative kernels above with codegen'd array
  // HOFs (slice/concat/reverse/transform) — no new UDFs: the half-spectrum
  // family is pure index algebra around a full FFT, and the grid/shift
  // helpers are pure arithmetic, exactly the "functions, not UDFs" rule.

  /** Real FFT: the non-redundant first n/2+1 bins of `fftReal`
    * (numpy.fft.rfft). The full transform runs once (deterministic UDF —
    * Catalyst subexpression elimination shares it across the two slices). */
  val rfft: Column => Column = { c =>
    val f = fftReal(c)
    val m = (F.size(c) / 2).cast("int") + 1
    F.struct(F.slice(f.getField("re"), F.lit(1), m).as("re"),
      F.slice(f.getField("im"), F.lit(1), m).as("im"))
  }

  /** Inverse real FFT (numpy.fft.irfft): rebuild the full Hermitian
    * spectrum from the m = n/2+1 stored bins — interior bins mirror
    * conjugated, full[n−k] = conj(half[k]) — then run the full inverse
    * and keep the real part. Output length n = 2·(m−1). */
  val irfft: (Column, Column) => Column = { (reCol, imCol) =>
    val mid = F.size(reCol) - 2 // interior bins 2..m-1 (1-based slice args)
    val fullRe = F.concat(reCol, F.reverse(F.slice(reCol, F.lit(2), mid)))
    val fullIm = F.concat(imCol,
      F.transform(F.reverse(F.slice(imCol, F.lit(2), mid)), x => -x))
    ifft(fullRe, fullIm).getField("re")
  }

  /** Hermitian FFT (numpy.fft.hfft): the spectrum of a signal known to be
    * Hermitian-symmetric in time is real; numpy's identity
    * hfft(a) = irfft(conj(a)) · n with n = 2·(m−1). */
  val hfft: (Column, Column) => Column = { (reCol, imCol) =>
    val n = ((F.size(reCol) - 1) * 2).cast("double")
    F.transform(irfft(reCol, F.transform(imCol, x => -x)), x => x * n)
  }

  /** Inverse Hermitian FFT (numpy.fft.ihfft) of a real signal:
    * ihfft(a) = conj(rfft(a)) / n. */
  val ihfft: Column => Column = { c =>
    val f = rfft(c)
    val n = F.size(c).cast("double")
    F.struct(F.transform(f.getField("re"), x => x / n).as("re"),
      F.transform(f.getField("im"), x => -x / n).as("im"))
  }

  /** Sample-frequency grid (numpy.fft.fftfreq): [0, 1, …, ⌈n/2⌉−1,
    * −⌊n/2⌋, …, −1] / (d·n). Pure sequence+transform — exact rationals
    * when d·n is a power of two. */
  def fftfreq(n: Column, d: Column): Column = {
    val nl = n.cast("long")
    F.transform(F.sequence(F.lit(0L), nl - 1), i =>
      F.when(i < ((nl + 1) / 2).cast("long"), i).otherwise(i - nl).cast("double") /
        (d.cast("double") * nl.cast("double")))
  }

  /** Half-spectrum frequency grid (numpy.fft.rfftfreq): [0 … n/2] / (d·n). */
  def rfftfreq(n: Column, d: Column): Column = {
    val nl = n.cast("long")
    F.transform(F.sequence(F.lit(0L), (nl / 2).cast("long")), i =>
      i.cast("double") / (d.cast("double") * nl.cast("double")))
  }

  /** Move the zero-frequency bin to the center (numpy.fft.fftshift —
    * a right-rotation by ⌊n/2⌋, any length): two slices and a concat. */
  val fftshift: Column => Column = { c =>
    val n = F.size(c)
    val s = (n / 2).cast("int")
    F.concat(F.slice(c, n - s + 1, s), F.slice(c, F.lit(1), n - s))
  }

  /** Inverse of [[fftshift]] (numpy.fft.ifftshift — a right-rotation by
    * ⌈n/2⌉; identical to fftshift for even n, differs for odd). */
  val ifftshift: Column => Column = { c =>
    val n = F.size(c)
    val s = n - (n / 2).cast("int")
    F.concat(F.slice(c, n - s + 1, s), F.slice(c, F.lit(1), n - s))
  }

  // --- 2-D per-row FFT (reference mars/tensor/fft/fft2.py:30 /
  // ifft2.py:30) over a natural matrix column; >2-axis tensors go
  // through the flat+shape fftnReal/ifftn pair below (r9). One UDF pair
  // with the same justification as the 1-D kernels: a row-and-column
  // butterfly loop has no builtin equivalent.

  final case class Complex2M(re: Seq[Seq[Double]], im: Seq[Seq[Double]])

  /** In-place 2-D transform: 1-D FFT of every row, then of every column
    * (the DFT separates axis-by-axis). Rectangular power-of-2 shapes. */
  private[graft] def transform2(re: Array[Array[Double]],
      im: Array[Array[Double]], inverse: Boolean): Unit = {
    val rows = re.length
    require(rows > 0, "fft2: empty matrix")
    val cols = re(0).length
    var r = 0
    while (r < rows) {
      require(re(r).length == cols && im(r).length == cols,
        s"fft2: ragged matrix — row $r has ${re(r).length} columns, expected $cols")
      transform(re(r), im(r), inverse)
      r += 1
    }
    val colRe = new Array[Double](rows)
    val colIm = new Array[Double](rows)
    var cIx = 0
    while (cIx < cols) {
      var q = 0
      while (q < rows) { colRe(q) = re(q)(cIx); colIm(q) = im(q)(cIx); q += 1 }
      transform(colRe, colIm, inverse)
      q = 0
      while (q < rows) { re(q)(cIx) = colRe(q); im(q)(cIx) = colIm(q); q += 1 }
      cIx += 1
    }
  }

  private def checkedMatrix(m: Seq[Seq[java.lang.Double]],
      what: String): Array[Array[Double]] =
    m.map(row => checkedArray(row, what)).toArray

  /** 2-D FFT of a real matrix column `array<array<double>>` → struct of
    * re/im matrices (numpy.fft.fft2 on one image/patch per row). */
  val fft2Real: Column => Column = {
    val f = udf((m: Seq[Seq[java.lang.Double]]) => {
      if (m == null) null
      else {
        val re = checkedMatrix(m, "matrix")
        val im = re.map(row => new Array[Double](row.length))
        transform2(re, im, inverse = false)
        Complex2M(re.map(_.toSeq).toSeq, im.map(_.toSeq).toSeq)
      }
    })
    f(_)
  }

  /** Inverse 2-D FFT of struct matrices → struct(re, im). */
  val ifft2: (Column, Column) => Column = {
    val f = udf((res: Seq[Seq[java.lang.Double]], ims: Seq[Seq[java.lang.Double]]) => {
      if (res == null || ims == null) null
      else {
        val re = checkedMatrix(res, "re")
        val im = checkedMatrix(ims, "im")
        require(re.length == im.length,
          s"ifft2: re has ${re.length} rows, im has ${im.length}")
        transform2(re, im, inverse = true)
        Complex2M(re.map(_.toSeq).toSeq, im.map(_.toSeq).toSeq)
      }
    })
    (a, b) => f(a, b)
  }

  // --- N-D per-row FFT (reference mars/tensor/fft/fftn.py:30 /
  // ifftn.py:30 — closes the r8 ">2-axis fftn" de-scope): an N-D tensor
  // lives in a frame column as a FLAT row-major array + shape (frames
  // have no nested-N column type); the DFT separates per axis, so the
  // 1-D kernel runs along every axis in turn (same separability fft2
  // already uses for 2). Inverse scales 1/len per axis = 1/total overall,
  // matching numpy.fft.ifftn.

  final case class ComplexN(re: Seq[Double], im: Seq[Double])

  /** In-place N-D transform over a flat row-major tensor. Every dim must
    * be a power of two. Lines along axis `a` sit at stride
    * `inner = Π shape(a+1..)`; iterate (outer, inner) offsets. */
  private[graft] def transformN(re: Array[Double], im: Array[Double],
      shape: Array[Int], inverse: Boolean): Unit = {
    require(shape.nonEmpty, "fftn: empty shape")
    val total = shape.product
    require(total == re.length && total == im.length,
      s"fftn: flat length ${re.length} != product(shape) = $total")
    var inner = 1
    var axis = shape.length - 1
    while (axis >= 0) {
      val len = shape(axis)
      val outer = total / (len * inner)
      val lr = new Array[Double](len)
      val li = new Array[Double](len)
      var o = 0
      while (o < outer) {
        var i = 0
        while (i < inner) {
          val base = o * len * inner + i
          var k = 0
          while (k < len) {
            lr(k) = re(base + k * inner); li(k) = im(base + k * inner); k += 1
          }
          transform(lr, li, inverse)
          k = 0
          while (k < len) {
            re(base + k * inner) = lr(k); im(base + k * inner) = li(k); k += 1
          }
          i += 1
        }
        o += 1
      }
      inner *= len
      axis -= 1
    }
  }

  /** N-D FFT of a real flat row-major tensor + shape → struct of flat
    * re/im (numpy.fft.fftn on one tensor per row). */
  val fftnReal: (Column, Column) => Column = {
    val f = udf((xs: Seq[java.lang.Double], shape: Seq[Int]) => {
      if (xs == null || shape == null) null
      else {
        val re = checkedArray(xs, "tensor")
        val im = new Array[Double](re.length)
        transformN(re, im, shape.toArray, inverse = false)
        ComplexN(re.toSeq, im.toSeq)
      }
    })
    (a, b) => f(a, b)
  }

  /** numpy.fft.rfftn (reference mars/tensor/fft/rfftn.py:28; rfft2.py:28
    * is the 2-axis case): the real-input N-D transform keeps only the
    * non-negative last-axis frequencies — Hermitian symmetry makes the
    * other half redundant, so this is the FULL kernel truncated to flat
    * indices whose last-axis coordinate ≤ d/2 (numpy's d/2 + 1 bins).
    * Composed by an order-preserving filter over the flat spectrum — no
    * new UDF; the shape is a plan-time literal like fftnReal call sites. */
  def rfftnReal(xs: Column, shapeLit: Seq[Int]): Column = {
    require(shapeLit.nonEmpty && shapeLit.forall(_ > 0),
      s"rfftn needs a positive shape: $shapeLit")
    val f = fftnReal(xs, F.typedlit(shapeLit))
    val dLast = shapeLit.last
    val half = dLast / 2
    def trunc(a: Column) = {
      val z = F.zip_with(a, F.sequence(F.lit(0), F.size(a) - 1),
        (v, i) => F.struct(v.as("v"), i.as("i")))
      F.transform(
        F.filter(z, s => F.pmod(s.getField("i"), F.lit(dLast)) <= half),
        s => s.getField("v"))
    }
    F.struct(trunc(f.getField("re")).as("re"),
      trunc(f.getField("im")).as("im"))
  }

  /** numpy.fft.rfft2 over the natural matrix encoding (reference
    * mars/tensor/fft/rfft2.py:28): each spectrum row truncated to its
    * first ⌊cols/2⌋+1 bins. */
  val rfft2Real: Column => Column = { c =>
    val f = fft2Real(c)
    def trunc(m: Column) = F.transform(m, r =>
      F.slice(r, F.lit(1),
        ((F.size(r) - F.pmod(F.size(r), F.lit(2))) / F.lit(2))
          .cast("int") + F.lit(1)))
    F.struct(trunc(f.getField("re")).as("re"),
      trunc(f.getField("im")).as("im"))
  }

  /** Inverse N-D FFT of flat re/im + shape → struct(re, im). */
  val ifftn: (Column, Column, Column) => Column = {
    val f = udf((res: Seq[java.lang.Double], ims: Seq[java.lang.Double],
        shape: Seq[Int]) => {
      if (res == null || ims == null || shape == null) null
      else {
        val re = checkedArray(res, "re")
        val im = checkedArray(ims, "im")
        require(re.length == im.length,
          s"ifftn: re has ${re.length} elements, im has ${im.length}")
        transformN(re, im, shape.toArray, inverse = true)
        ComplexN(re.toSeq, im.toSeq)
      }
    })
    (a, b, c) => f(a, b, c)
  }
}
