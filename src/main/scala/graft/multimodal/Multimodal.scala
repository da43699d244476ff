package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: images / audio /
  * video travel as opaque `binary` columns with a typed metadata struct,
  * and decode / feature-extract / resize / frame-sample run as
  * partition-wise batch transforms (`mapPartitions` — the Scala analog of
  * mapInPandas batches).
  *
  * IMAGE decode is REAL since r12: the JDK's javax.imageio readers
  * (PNG/JPEG/BMP/GIF ship with every JVM) drive [[imageDecodeFeatures]] —
  * true bitstream dimensions + a mean-pooled luminance grid, with the
  * deterministic [[Codecs]] stub as the fallback for bytes no installed
  * reader accepts (and as the documented swap point for exotic codecs).
  * AUDIO decode is REAL since r13 by the same route: javax.sound.sampled
  * reads WAV/AIFF/AU PCM with zero external codecs ([[decodeWavPcm]] →
  * [[audioDecodeFeatures]]: exact-integer sample features + an FFT
  * spectral centroid), metadata fallback for compressed formats
  * (mp3/flac/opus need libraries this container can't ship). VIDEO
  * decode stays stubbed — with the framing/sampling arithmetic real and
  * tested; swapping in a real decoder is a one-function change.
  *
  * Scale design: binary payloads never pass through a shuffle — decode and
  * feature extraction are narrow per-partition maps over the scan, and only
  * the (small) extracted features continue into joins/aggregations.
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory for large
  * blobs; very large media should additionally store blob pointers rather
  * than inline bytes, which this schema supports (the `uri` field).
  */
object Multimodal {

  /** Canonical media-column schema: inline bytes or a storage pointer,
    * plus modality metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("data", BinaryType, nullable = true),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** STUB codec layer — deterministic fakes standing in for real decoders.
    * Each fake derives its output purely from the input bytes, so tests are
    * reproducible and the pipeline shape is identical to production. */
  object Codecs {
    /** STUB for image decode + embed (e.g. JPEG → CNN features): returns
      * `dim` floats mixed from the byte content. */
    def imageEmbedStub(data: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L
      data.foreach(b => h = h * 31 + b)
      Array.tabulate(dim) { i =>
        val z = mix64(h + i)
        (z.toDouble / Long.MaxValue.toDouble).toFloat
      }
    }

    /** STUB for image resize: returns the would-be (width, height) after
      * fitting into maxSide, from metadata only. */
    def resizeDims(width: Int, height: Int, maxSide: Int): (Int, Int) = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(width, height))
      (math.max(1, (width * scale).round.toInt), math.max(1, (height * scale).round.toInt))
    }

    /** STUB for video frame sampling: frame indices 0, n, 2n, ... */
    def sampleFrameIdx(nFrames: Int, everyN: Int): Seq[Int] =
      0 until nFrames by everyN

    private def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** REAL image decode via the JDK's own javax.imageio (PNG/JPEG/BMP/GIF
    * readers ship with every JVM — no external codec needed, r12): the
    * actual bitstream's (width, height) plus a grid×grid mean-pooled
    * luminance embedding in [0, 1]. Returns None for bytes no installed
    * reader accepts — [[imageDecodeFeatures]] falls back to the stub
    * there, which remains the documented swap point for exotic codecs.
    * Per-pixel getRGB is fine at thumbnail scale; a production swap for
    * giant frames reads the raster buffer directly. */
  def decodeLumaGrid(data: Array[Byte], grid: Int): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](grid * grid)
        val counts = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          val gy = math.min(grid - 1, y * grid / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            val gi = gy * grid + math.min(grid - 1, x * grid / w)
            sums(gi) += luma
            counts(gi) += 1
            x += 1
          }
          y += 1
        }
        Some((w, h, Array.tabulate(grid * grid)(i =>
          if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)))
      }
    } catch {
      // NonFatal only (ADVICE r12): a fatal error (OOM on a huge frame,
      // stack overflow) must propagate and fail the task — swallowing it
      // as "undecodable" would silently mislabel rows
      case scala.util.control.NonFatal(_) => None
    }

  /** Decode images partition-wise with the REAL JDK decoder: output
    * (media_id, w, h, out_w, out_h, embedding[grid²], decoded). Bytes no
    * reader accepts keep metadata dims and the stub embedding with
    * decoded = false — the pipeline never drops rows on codec gaps.
    * Same scale shape as [[imageFeatures]]: narrow per-partition map,
    * payloads never shuffle. */
  def imageDecodeFeatures(media: DataFrame, grid: Int = 4,
      maxSide: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("w", IntegerType),
      StructField("h", IntegerType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("decoded", BooleanType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media
      .filter(col("modality") === "image" && col("data").isNotNull)
      .select("media_id", "data", "meta.width", "meta.height")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("data")
          decodeLumaGrid(bytes, grid) match {
            case Some((w, h, emb)) =>
              val (ow, oh) = Codecs.resizeDims(w, h, maxSide)
              Row(r.getLong(0), w, h, ow, oh, emb.toSeq, true)
            case None =>
              // missing metadata dims default to 0 EXPLICITLY (ADVICE
              // r12 — getAs[Int] would unbox null to 0 silently);
              // resizeDims clamps outputs to >= 1
              val w = if (r.isNullAt(2)) 0 else r.getAs[Int]("width")
              val h = if (r.isNullAt(3)) 0 else r.getAs[Int]("height")
              val (ow, oh) = Codecs.resizeDims(w, h, maxSide)
              Row(r.getLong(0), w, h, ow, oh,
                Codecs.imageEmbedStub(bytes, grid * grid).toSeq, false)
          }
        }
      }
  }

  /** Decode + feature-extract images partition-wise: input rows following
    * [[mediaSchema]], output (media_id, embedding array<float>, w, h).
    * Batch shape: one iterator pass per partition, no shuffle. */
  def imageFeatures(media: DataFrame, dim: Int = 16, maxSide: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media
      .filter(col("modality") === "image" && col("data").isNotNull)
      .select("media_id", "data", "meta.width", "meta.height")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("data")
          val (w, h) = Codecs.resizeDims(r.getAs[Int]("width"), r.getAs[Int]("height"), maxSide)
          Row(r.getLong(0), Codecs.imageEmbedStub(bytes, dim).toSeq, w, h)
        }
      }
  }

  /** Canonical 16-bit mono little-endian PCM WAV container around raw
    * samples — the synthesis half of the audio roundtrip: tests and the
    * ext_multimodal_audio gate build WAVs here, then decode through the
    * REAL javax.sound path. PCM16 is lossless, so decoded samples equal
    * the synthesized ones exactly — which is what makes the decode
    * differentially checkable at all. */
  def wavPcm16Bytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)            // PCM
      .putShort(1.toShort)            // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2.toShort)            // block align
      .putShort(16.toShort)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL audio decode via the JDK's own javax.sound.sampled (WAV/AIFF/AU
    * PCM readers ship with every JVM — zero external codecs, the r12
    * image pattern applied to audio): (sampleRate, channels, mono int
    * samples). Multi-channel frames are averaged with truncating integer
    * division (exact, engine-replayable). Returns None for bytes no
    * installed reader accepts or non-PCM encodings —
    * [[audioDecodeFeatures]] falls back to metadata there, which remains
    * the documented swap point for exotic codecs (mp3/flac/opus need
    * external libraries this container can't ship). */
  def decodeWavPcm(data: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        if ((enc != PCM_SIGNED && enc != PCM_UNSIGNED) ||
            (bits != 16 && bits != 8)) None
        else {
          val channels = fmt.getChannels
          val frameSize = fmt.getFrameSize
          val bytesPerSample = bits / 8
          val bytes = in.readAllBytes()
          val frames = bytes.length / frameSize
          val out = new Array[Int](frames)
          var f = 0
          while (f < frames) {
            var acc = 0L
            var c = 0
            while (c < channels) {
              val off = f * frameSize + c * bytesPerSample
              val v =
                if (bytesPerSample == 2) {
                  val raw =
                    if (fmt.isBigEndian)
                      (bytes(off).toInt << 8) | (bytes(off + 1) & 0xff)
                    else
                      (bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)
                  if (enc == PCM_UNSIGNED) (raw & 0xffff) - 32768 else raw
                } else {
                  if (enc == PCM_UNSIGNED) (bytes(off) & 0xff) - 128
                  else bytes(off).toInt
                }
              acc += v
              c += 1
            }
            out(f) = (acc / channels).toInt // truncating mono mixdown
            f += 1
          }
          Some((math.round(fmt.getSampleRate), channels, out))
        }
      } finally in.close()
    } catch {
      // NonFatal only — same contract as the image decoder: fatal
      // errors fail the task rather than mislabel rows as undecodable
      case scala.util.control.NonFatal(_) => None
    }

  /** |X|-weighted mean bin of a `fftSize`-point FFT over the first
    * `fftSize` samples (zero-padded; DC bin excluded) — the classic
    * spectral-centroid feature, via the same per-row radix-2 kernel the
    * FFT operators use. libm enters here, so this column is spec-pinned
    * (MultimodalSpec), not oracled. */
  private def spectralCentroid(s: Array[Int], fftSize: Int): Double = {
    if (s.isEmpty) return 0.0
    val re = new Array[Double](fftSize)
    val im = new Array[Double](fftSize)
    var i = 0
    while (i < fftSize && i < s.length) { re(i) = s(i).toDouble; i += 1 }
    graft.functions.Fft.transform(re, im, inverse = false)
    var num = 0.0
    var den = 0.0
    var k = 1
    while (k < fftSize / 2) {
      val mag = math.sqrt(re(k) * re(k) + im(k) * im(k))
      num += k * mag
      den += mag
      k += 1
    }
    if (den == 0.0) 0.0 else num / den
  }

  /** Decode audio partition-wise with the REAL JDK decoder: output
    * (media_id, sample_rate, n_samples, duration_us, sum_abs, energy,
    * min_s, max_s, n_zero_cross, spec_centroid, decoded). The integer
    * features are exact BIGINT folds over the decoded samples —
    * order-free, so ext_multimodal_audio gates them UNROUNDED against a
    * DuckDB replay of the synthesis arithmetic; zero crossings count
    * flips of (sample > 0), the tsfresh convention. duration_us =
    * n·10⁶/rate by integer floor division. Bytes no reader accepts keep
    * metadata sample_rate/n_frames with zeroed sample features and
    * decoded = false — the pipeline never drops rows on codec gaps.
    * Same scale shape as [[imageDecodeFeatures]]: narrow per-partition
    * map, payloads never shuffle, only small features continue. */
  def audioDecodeFeatures(media: DataFrame, fftSize: Int = 256): DataFrame = {
    require(fftSize > 0 && (fftSize & (fftSize - 1)) == 0,
      s"fftSize must be a power of 2: $fftSize")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_us", LongType),
      StructField("sum_abs", LongType),
      StructField("energy", LongType),
      StructField("min_s", LongType),
      StructField("max_s", LongType),
      StructField("n_zero_cross", LongType),
      StructField("spec_centroid", DoubleType),
      StructField("decoded", BooleanType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media
      .filter(col("modality") === "audio" && col("data").isNotNull)
      .select("media_id", "data", "meta.sample_rate", "meta.n_frames")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("data")
          decodeWavPcm(bytes) match {
            case Some((rate, _, s)) =>
              var sumAbs = 0L
              var energy = 0L
              var mn = Long.MaxValue
              var mx = Long.MinValue
              var zc = 0L
              var i = 0
              while (i < s.length) {
                val v = s(i).toLong
                sumAbs += math.abs(v)
                energy += v * v
                if (v < mn) mn = v
                if (v > mx) mx = v
                if (i > 0 && ((s(i) > 0) != (s(i - 1) > 0))) zc += 1
                i += 1
              }
              val n = s.length.toLong
              Row(r.getLong(0), rate, n,
                if (rate == 0) 0L else n * 1000000L / rate,
                sumAbs, energy,
                if (n == 0) 0L else mn, if (n == 0) 0L else mx,
                zc, spectralCentroid(s, fftSize), true)
            case None =>
              val rate = if (r.isNullAt(2)) 0 else r.getAs[Int]("sample_rate")
              val n = (if (r.isNullAt(3)) 0 else r.getAs[Int]("n_frames")).toLong
              Row(r.getLong(0), rate, n,
                if (rate == 0) 0L else n * 1000000L / rate,
                0L, 0L, 0L, 0L, 0L, 0.0, false)
          }
        }
      }
  }

  /** Chunk audio into fixed-duration windows from metadata: one row per
    * chunk with its sample offset range — the framing step before a
    * (stubbed) decode. `data` length stands in for total samples when
    * n_frames metadata is absent. */
  def audioChunks(media: DataFrame, sampleRate: Int, chunkSeconds: Int): DataFrame = {
    val samplesPerChunk = sampleRate * chunkSeconds
    media
      .filter(col("modality") === "audio")
      .select(col("media_id"),
        coalesce(col("meta.n_frames"), length(col("data"))).as("n_samples"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(floor((col("n_samples") - 1) / samplesPerChunk), lit(0)).cast("int"))))
      .select(col("media_id"), col("chunk_idx"),
        (col("chunk_idx") * samplesPerChunk).as("start_sample"),
        least(col("n_samples"), (col("chunk_idx") + 1) * samplesPerChunk).as("end_sample"))
  }

  /** Frame-sample videos: explodes sampled frame indices per video —
    * metadata-only (pointer-based decode happens downstream per frame). */
  def videoFrameSample(media: DataFrame, everyN: Int): DataFrame =
    media
      .filter(col("modality") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyN))))
      .select("media_id", "frame_idx")
}
