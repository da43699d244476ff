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
  * AUDIO/VIDEO decode stays stubbed — no codec libraries in this
  * container — with the framing/sampling arithmetic real and tested;
  * swapping in a real decoder is a one-function change per modality.
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
