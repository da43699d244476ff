package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Tests for the multimodal plumbing: schema contract, deterministic stub
  * features, resize math, frame sampling. The codec layer is a stub (no
  * image/audio libs in this environment); these tests pin down the
  * engine-side batch shape a real codec would drop into.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mediaRow(id: Long, bytes: Array[Byte], modality: String,
      w: Integer, h: Integer, nFrames: Integer): Row =
    Row(id, null, bytes, modality, Row(w, h, null, nFrames))

  private def mediaDf(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), Multimodal.mediaSchema)

  test("imageFeatures produces deterministic embeddings with resize metadata") {
    val df = mediaDf(
      mediaRow(1L, Array[Byte](1, 2, 3), "image", 1024, 512, null),
      mediaRow(2L, Array[Byte](9, 9), "image", 100, 200, null),
      mediaRow(3L, Array[Byte](5), "video", null, null, 10))
    val feats = Multimodal.imageFeatures(df, dim = 8, maxSide = 256)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 2) // video filtered out
    val e1 = rows(0).getAs[scala.collection.Seq[Float]]("embedding").toSeq
    assert(e1.length == 8)
    assert(rows(0).getAs[Int]("out_w") == 256 && rows(0).getAs[Int]("out_h") == 128)
    assert(rows(1).getAs[Int]("out_w") == 100 && rows(1).getAs[Int]("out_h") == 200)
    // determinism: same bytes → same embedding on a second run
    val again = Multimodal.imageFeatures(df, dim = 8, maxSide = 256)
      .orderBy("media_id").collect()(0)
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    assert(e1 == again)
  }

  test("imageDecodeFeatures really decodes JVM-native formats, stub-falls-back otherwise") {
    // a 64x32 PNG generated in-test: left half black, right half white
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = mediaDf(
      mediaRow(1L, png(64, 32), "image", 1, 1, null), // meta dims WRONG on purpose
      mediaRow(2L, Array[Byte](1, 2, 3), "image", 100, 200, null)) // not an image
    val rows = Multimodal.imageDecodeFeatures(df, grid = 2, maxSide = 16)
      .orderBy("media_id").collect()
    // real decode: true bitstream dims override metadata; left cells
    // black (0), right cells white (1)
    assert(rows(0).getAs[Boolean]("decoded"))
    assert(rows(0).getAs[Int]("w") == 64 && rows(0).getAs[Int]("h") == 32)
    assert(rows(0).getAs[Int]("out_w") == 16 && rows(0).getAs[Int]("out_h") == 8)
    val e = rows(0).getAs[scala.collection.Seq[Float]]("embedding").toSeq
    assert(e.length == 4)
    assert(math.abs(e(0)) < 1e-6 && math.abs(e(2)) < 1e-6, s"left cells: $e")
    assert(math.abs(e(1) - 1.0f) < 1e-6 && math.abs(e(3) - 1.0f) < 1e-6, s"right cells: $e")
    // undecodable bytes: stub fallback, metadata dims, decoded = false
    assert(!rows(1).getAs[Boolean]("decoded"))
    assert(rows(1).getAs[Int]("w") == 100 && rows(1).getAs[Int]("h") == 200)
    assert(rows(1).getAs[scala.collection.Seq[Float]]("embedding").length == 4)
  }

  test("decodeWavPcm roundtrips PCM16 exactly and mixes multi-channel/8-bit forms") {
    import Multimodal.{decodeWavPcm, wavPcm16Bytes}
    // mono 16-bit: lossless roundtrip, samples bit-identical
    val samples = Array.tabulate(300)(k => (((k * 37) % 2001) - 1000).toShort)
    val Some((rate, ch, got)) = decodeWavPcm(wavPcm16Bytes(samples, 8000))
    assert(rate == 8000 && ch == 1)
    assert(got.toSeq == samples.map(_.toInt).toSeq)
    // stereo 16-bit via the JDK's own writer: truncating mean mixdown
    val fmt = new javax.sound.sampled.AudioFormat(4000f, 16, 2, true, false)
    val l = Array[Short](100, -100, 7)
    val r = Array[Short](201, -300, -8)
    val inter = l.zip(r).flatMap { case (a, b) =>
      Array((a & 0xff).toByte, ((a >> 8) & 0xff).toByte,
        (b & 0xff).toByte, ((b >> 8) & 0xff).toByte)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(inter), fmt, 3),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((r2, ch2, mixed)) = decodeWavPcm(bos.toByteArray)
    assert(r2 == 4000 && ch2 == 2)
    // (100+201)/2 = 150 (truncate), (-100-300)/2 = -200, (7-8)/2 = 0
    assert(mixed.toSeq == Seq(150, -200, 0))
    // garbage bytes → None (fallback), never a throw
    assert(decodeWavPcm(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("audioDecodeFeatures: exact integer features, spectral centroid, metadata fallback") {
    import Multimodal.wavPcm16Bytes
    // a pure tone at FFT bin 8 of 256 @ rate 8192: centroid ≈ 8
    val n = 256
    val tone = Array.tabulate(n)(k =>
      (8000.0 * math.sin(2 * math.Pi * 8 * k / n)).toShort)
    val df = mediaDf(
      mediaRow(1L, wavPcm16Bytes(tone, 8192), "audio", null, null, null),
      mediaRow(2L, Array[Byte](9, 9, 9), "audio", null, null, 4096),
      mediaRow(3L, Array[Byte](1), "image", 4, 4, null))
    val rows = Multimodal.audioDecodeFeatures(df, fftSize = 256)
      .orderBy("media_id").collect()
    assert(rows.length == 2) // image filtered out
    val t0 = rows(0)
    assert(t0.getAs[Boolean]("decoded"))
    assert(t0.getAs[Int]("sample_rate") == 8192)
    assert(t0.getAs[Long]("n_samples") == 256L)
    assert(t0.getAs[Long]("duration_us") == 256L * 1000000L / 8192L)
    // sine crosses zero twice per period, 8 periods; boundary effects ±1
    val zc = t0.getAs[Long]("n_zero_cross")
    assert(zc >= 15L && zc <= 17L, zc.toString)
    assert(math.abs(t0.getAs[Double]("spec_centroid") - 8.0) < 0.5,
      t0.getAs[Double]("spec_centroid").toString)
    // exact-integer features recomputed independently
    assert(t0.getAs[Long]("sum_abs") == tone.map(v => math.abs(v.toLong)).sum)
    assert(t0.getAs[Long]("energy") == tone.map(v => v.toLong * v).sum)
    assert(t0.getAs[Long]("min_s") == tone.min.toLong)
    assert(t0.getAs[Long]("max_s") == tone.max.toLong)
    // undecodable: metadata carried, zeroed features, decoded=false
    val t1 = rows(1)
    assert(!t1.getAs[Boolean]("decoded"))
    assert(t1.getAs[Long]("n_samples") == 4096L)
    assert(t1.getAs[Int]("sample_rate") == 0) // meta sample_rate null here
    assert(t1.getAs[Long]("energy") == 0L)
  }

  test("audioChunks frames audio into sample ranges") {
    val df = mediaDf(mediaRow(7L, null, "audio", null, null, 44100 * 5 + 100))
    val chunks = Multimodal.audioChunks(df, sampleRate = 44100, chunkSeconds = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_sample", "end_sample")
      .as[(Int, Long, Long)].collect().toSeq
    assert(chunks == Seq(
      (0, 0L, 88200L), (1, 88200L, 176400L), (2, 176400L, 220600L)))
  }

  test("AVI DIB roundtrip is pixel-exact; MJPEG decodes via imageio; garbage falls back") {
    import Multimodal.{aviBytes, decodeAviGrayFrames, dib24GrayFrame}
    // 3 frames of 6x4 arithmetic gray: lossless roundtrip
    val (w, h) = (6, 4)
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h)(p => (f * 40 + p * 7) % 256))
    val avi = aviBytes(frames.map(dib24GrayFrame(_, w, h)), w, h,
      compressed = false)
    val Some((dw, dh, got)) = decodeAviGrayFrames(avi)
    assert(dw == w && dh == h && got.length == 3)
    for (f <- 0 until 3) assert(got(f).toSeq == frames(f).toSeq, s"frame $f")
    // MJPEG: a real JPEG frame through the same container — dims exact,
    // values within JPEG tolerance of the solid gray source
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    val mjpeg = aviBytes(Seq(jbos.toByteArray), 8, 8, compressed = true)
    val Some((mw, mh, mg)) = decodeAviGrayFrames(mjpeg)
    assert(mw == 8 && mh == 8 && mg.length == 1)
    assert(mg.head.forall(v => math.abs(v - 128) <= 4), mg.head.take(8).toSeq)
    // not an AVI → None
    assert(decodeAviGrayFrames(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("videoDecodeFeatures: exact sampled-frame stats, metadata fallback") {
    import Multimodal.{aviBytes, dib24GrayFrame}
    val (w, h) = (4, 2)
    val frames = (0 until 5).map(f =>
      Array.tabulate(w * h)(p => (f * 10 + p) % 256))
    val avi = aviBytes(frames.map(dib24GrayFrame(_, w, h)), w, h,
      compressed = false)
    val df = mediaDf(
      mediaRow(1L, avi, "video", w, h, 5),
      mediaRow(2L, Array[Byte](7, 7), "video", 3, 3, 4), // unparseable
      mediaRow(3L, Array[Byte](1), "audio", null, null, null))
    val rows = Multimodal.videoDecodeFeatures(df, everyN = 2)
      .orderBy("media_id", "frame_idx").collect()
    // doc 1: sampled frames 0, 2, 4 with exact sums Σ(f·10 + p)
    val r1 = rows.filter(_.getLong(0) == 1L)
    assert(r1.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4))
    for (r <- r1) {
      val f = r.getAs[Int]("frame_idx")
      assert(r.getAs[Boolean]("decoded"))
      assert(r.getAs[Int]("w") == w && r.getAs[Int]("h") == h)
      assert(r.getAs[Int]("n_frames") == 5)
      assert(r.getAs[Long]("gray_sum") == frames(f).map(_.toLong).sum)
      assert(r.getAs[Long]("gray_min") == frames(f).min.toLong)
      assert(r.getAs[Long]("gray_max") == frames(f).max.toLong)
    }
    // doc 2: metadata fallback — frames 0, 2 from meta.n_frames = 4
    val r2 = rows.filter(_.getLong(0) == 2L)
    assert(r2.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(r2.forall(r => !r.getAs[Boolean]("decoded") &&
      r.getAs[Int]("w") == 3 && r.getAs[Long]("gray_sum") == 0L))
    // audio row filtered out
    assert(rows.forall(_.getLong(0) != 3L))
  }

  test("MJPEG videoDecodeFeatures: decode parity with ImageIO + pinned lossy band (r13 VERDICT #7)") {
    import Multimodal.aviBytes
    // known gray frames (smooth gradients — JPEG-friendly content),
    // encoded with ImageIO's OWN JPEG writer into '00dc' MJPEG chunks
    val (w, h) = (16, 12)
    val srcLuma = (0 until 3).map(f =>
      Array.tabulate(w * h) { p =>
        val x = p % w
        math.min(255, x * 12 + f * 24)
      })
    def jpegBytes(luma: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = luma(y * w + x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val payloads = srcLuma.map(jpegBytes)
    // reference: decode each payload independently with ImageIO and the
    // operator's own luma formula — the operator must add ZERO error on
    // top of the codec (exact decode parity, not just "close")
    def refLuma(jpeg: Array[Byte]): Array[Int] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      Array.tabulate(img.getWidth * img.getHeight) { p =>
        val rgb = img.getRGB(p % img.getWidth, p / img.getWidth)
        (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
      }
    }
    val refs = payloads.map(refLuma)
    val avi = aviBytes(payloads, w, h, compressed = true)
    val df = mediaDf(mediaRow(1L, avi, "video", w, h, 3))
    val rows = Multimodal.videoDecodeFeatures(df, everyN = 1)
      .orderBy("frame_idx").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val f = r.getAs[Int]("frame_idx")
      assert(r.getAs[Boolean]("decoded") && r.getAs[Int]("w") == w &&
        r.getAs[Int]("h") == h && r.getAs[Int]("n_frames") == 3)
      // exact parity with the independent ImageIO decode
      assert(r.getAs[Long]("gray_sum") == refs(f).map(_.toLong).sum,
        s"frame $f sum != independent ImageIO decode")
      assert(r.getAs[Long]("gray_min") == refs(f).min.toLong &&
        r.getAs[Long]("gray_max") == refs(f).max.toLong)
      // pinned LOSSY band vs the pre-encode source: JPEG at ImageIO's
      // default quality keeps a smooth gray gradient within ±6 mean
      // luma (measured headroom ~2; 6 pins against quantizer drift
      // across JDK builds without masking real regressions)
      val srcMean = srcLuma(f).map(_.toLong).sum.toDouble / (w * h)
      val gotMean = r.getAs[Long]("gray_sum").toDouble / (w * h)
      assert(math.abs(gotMean - srcMean) <= 6.0,
        s"frame $f mean drifted: src=$srcMean decoded=$gotMean")
    }
  }

  test("videoFrameSample explodes sampled frame indices") {
    val df = mediaDf(mediaRow(5L, null, "video", null, null, 10))
    val frames = Multimodal.videoFrameSample(df, everyN = 3)
      .orderBy("frame_idx").as[(Long, Int)].collect().toSeq
    assert(frames == Seq((5L, 0), (5L, 3), (5L, 6), (5L, 9)))
  }
}
