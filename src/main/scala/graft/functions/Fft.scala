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
