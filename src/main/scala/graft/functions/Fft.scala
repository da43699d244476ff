package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

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
}
