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
  * decode is REAL since r13 for AVI containers
  * ([[decodeAviGrayFrames]] → [[videoDecodeFeatures]]): a RIFF walk
  * plus two frame codecs — uncompressed 24-bit DIB (lossless, pure
  * integer, exactly gateable) and MJPEG via javax.imageio; H.264-class
  * codecs keep the metadata fallback (external libraries this
  * container can't ship — swapping one in is a one-function change).
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

  /** Canonical AVI container around per-frame payloads — the synthesis
    * half of the video roundtrip (mirrors [[wavPcm16Bytes]]): RIFF
    * 'AVI ' → hdrl(avih + strl(strh/strf)) → movi with one chunk per
    * frame. `compressed = false` writes '00db' uncompressed 24-bit DIB
    * frames (LOSSLESS — the decode must reproduce every pixel exactly,
    * which is what makes ext_multimodal_video gateable);
    * `compressed = true` writes '00dc' chunks holding the payload as-is
    * (callers pass JPEG bytes — the MJPEG layout; decoded via
    * javax.imageio, spec-pinned not oracled since JPEG is lossy). */
  def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
      compressed: Boolean): Array[Byte] = {
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); b.array()
    }
    def u16(v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(v.toShort); b.array()
    }
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fourcc(cc) ++ u32(body.length) ++ body ++ pad
    }
    def list(formType: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ u32(body.length + 4) ++ fourcc(formType) ++ body
    val handler = if (compressed) "MJPG" else "DIB "
    val avih = chunk("avih",
      u32(40000) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(frames.length) ++
      u32(0) ++ u32(1) ++ u32(0) ++ u32(w) ++ u32(h) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc(handler) ++ u32(0) ++ u16(0) ++ u16(0) ++
      u32(0) ++ u32(1) ++ u32(25) ++ u32(0) ++ u32(frames.length) ++
      u32(0) ++ u32(-1) ++ u32(0) ++
      u16(0) ++ u16(0) ++ u16(w) ++ u16(h))
    val strf = chunk("strf",
      u32(40) ++ u32(w) ++ u32(h) ++ u16(1) ++ u16(24) ++
      u32(if (compressed) 0x47504A4D /* 'MJPG' LE */ else 0) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val cc = if (compressed) "00dc" else "00db"
    val movi = list("movi", frames.flatMap(f => chunk(cc, f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    bos.write(fourcc("RIFF")); bos.write(u32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** Pack a gray frame (row-major, top-down, one int 0..255 per pixel)
    * as uncompressed 24-bit DIB data (bottom-up rows, BGR, 4-byte row
    * padding) — the '00db' payload [[aviBytes]] expects. */
  def dib24GrayFrame(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(gray.length == w * h, s"expected $w*$h pixels, got ${gray.length}")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](rowBytes * h)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // DIB rows are bottom-up
      var x = 0
      while (x < w) {
        val v = (gray(srcRow * w + x) & 0xff).toByte
        val off = y * rowBytes + x * 3
        out(off) = v; out(off + 1) = v; out(off + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL video decode of AVI containers with zero external codecs (the
    * r12/r13 image/audio pattern completed for video): a RIFF walk finds
    * the stream format and the movi frame chunks; '00db' uncompressed
    * 24-bit DIB frames decode to exact integer gray values
    * ((299·R + 587·G + 114·B)/1000, truncating — lossless for gray
    * content, so the gate can replay every pixel), and '00dc' frames go
    * through javax.imageio (MJPEG — any JPEG/PNG payload the JVM
    * reads). Returns (w, h, per-frame gray arrays, row-major top-down);
    * None for bytes that aren't a parseable AVI or hold frames no
    * reader accepts. Real-world codecs (H.264 &c.) need external
    * libraries this container can't ship — that fallback path keeps
    * metadata and the stub, never drops rows. */
  def decodeAviGrayFrames(data: Array[Byte]): Option[(Int, Int, Seq[Array[Int]])] =
    try {
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      if (bb.remaining < 12 || cc() != "RIFF") return None
      bb.getInt // riff size
      if (cc() != "AVI ") return None
      var w = 0; var h = 0; var bits = 0; var compression = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = cc()
          val sz = bb.getInt
          val next = bb.position() + sz + (sz & 1)
          if (id == "RIFF" || id == "LIST") {
            cc() // form type — recurse into the body
            walk(bb.position() + sz - 4)
          } else {
            if (id == "strf" && sz >= 40) {
              val p0 = bb.position()
              bb.getInt // biSize
              w = bb.getInt; h = bb.getInt
              bb.getShort // planes
              bits = bb.getShort.toInt
              compression = bb.getInt
              bb.position(p0)
            } else if (id.endsWith("db") || id.endsWith("dc")) {
              val f = new Array[Byte](sz); bb.get(f)
              frames += f
            }
          }
          bb.position(math.min(next, end))
        }
      }
      walk(data.length)
      if (w <= 0 || h <= 0 || frames.isEmpty) None
      else {
        val rowBytes = ((w * 3 + 3) / 4) * 4
        val decoded = frames.map { f =>
          if (compression == 0 && bits == 24 && f.length >= rowBytes * h) {
            val g = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              val srcRow = h - 1 - y
              var x = 0
              while (x < w) {
                val off = srcRow * rowBytes + x * 3
                val b = f(off) & 0xff; val gr = f(off + 1) & 0xff
                val r = f(off + 2) & 0xff
                g(y * w + x) = (299 * r + 587 * gr + 114 * b) / 1000
                x += 1
              }
              y += 1
            }
            Some(g)
          } else {
            // compressed chunk — the JVM's own readers (MJPEG = JPEG)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f))
            if (img == null) None
            else {
              val fw = img.getWidth; val fh = img.getHeight
              val g = new Array[Int](fw * fh)
              var y = 0
              while (y < fh) {
                var x = 0
                while (x < fw) {
                  val rgb = img.getRGB(x, y)
                  g(y * fw + x) = (299 * ((rgb >> 16) & 0xff) +
                    587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                  x += 1
                }
                y += 1
              }
              Some(g)
            }
          }
        }
        if (decoded.exists(_.isEmpty)) None
        else Some((w, h, decoded.map(_.get).toSeq))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode + frame-sample videos partition-wise with the REAL AVI
    * parser: one output row per SAMPLED frame (indices 0, everyN,
    * 2·everyN, … — [[Codecs.sampleFrameIdx]]) carrying exact integer
    * gray statistics: (media_id, frame_idx, w, h, n_frames, gray_sum,
    * gray_min, gray_max, decoded). Lossless DIB frames make these
    * BIGINT-oracle-able (ext_multimodal_video); MJPEG frames produce
    * the same shape, spec-pinned. Unparseable containers fall back to
    * metadata frame counts/dims with zeroed stats and decoded = false —
    * never drops rows. Same scale shape as the image/audio paths:
    * narrow per-partition map, payloads never shuffle. */
  def videoDecodeFeatures(media: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1: $everyN")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("w", IntegerType),
      StructField("h", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("gray_sum", LongType),
      StructField("gray_min", LongType),
      StructField("gray_max", LongType),
      StructField("decoded", BooleanType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media
      .filter(col("modality") === "video" && col("data").isNotNull)
      .select("media_id", "data", "meta.width", "meta.height", "meta.n_frames")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]]("data")
          decodeAviGrayFrames(bytes) match {
            case Some((w, h, frames)) =>
              Codecs.sampleFrameIdx(frames.length, everyN).map { fi =>
                val g = frames(fi)
                var s = 0L; var mn = 255L; var mx = 0L
                var i = 0
                while (i < g.length) {
                  val v = g(i).toLong
                  s += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                Row(id, fi, w, h, frames.length, s,
                  if (g.isEmpty) 0L else mn, if (g.isEmpty) 0L else mx, true)
              }
            case None =>
              val w = if (r.isNullAt(2)) 0 else r.getAs[Int]("width")
              val h = if (r.isNullAt(3)) 0 else r.getAs[Int]("height")
              val nf = if (r.isNullAt(4)) 0 else r.getAs[Int]("n_frames")
              Codecs.sampleFrameIdx(nf, everyN).map(fi =>
                Row(id, fi, w, h, nf, 0L, 0L, 0L, false))
          }
        }
      }
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
