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
  * The actual codec calls are STUBBED — this container has no image/audio
  * libraries — behind [[Codecs]], with a deterministic fake implementation
  * so the Spark-side plumbing (schema contract, batching, partitioning,
  * output shape) is real and testable. Swapping in a real decoder is a
  * one-function change per modality.
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
