package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal zarr v2 tensor store (reference mars/tensor/datastore/
  * to_zarr.py:64 and datasource/from_zarr.py:47, which wrap the zarr
  * library; zarr v2 itself is a *specification* — a `.zarray` JSON
  * document plus one raw binary file per chunk — so a clean-room profile
  * is implementable on the bare JVM, unlike HDF5/TileDB whose native
  * libraries cannot ship in this zero-egress build).
  *
  * Profile written (and the only one read back — anything else fails
  * loudly): dtype `<f8` (little-endian float64), order `C`, 2-D shape,
  * `compressor: null`, `filters: null`, `fill_value: 0.0`. Any zarr
  * implementation (zarr-python, tensorstore, xarray) reads these arrays
  * directly.
  *
  * Scale shape: rows are indexed once (zipWithIndex — per-partition
  * count job, no shuffle), then ONE hash exchange groups each row block
  * with its chunk id and every chunk file is written by exactly one
  * task — chunk files map 1:1 onto object-store objects, the layout
  * zarr was designed for. The read side parallelizes over chunk files
  * and decodes each in one task. Only the tiny `.zarray` JSON touches
  * the driver.
  */
object Zarr {

  /** Write `valueCols` of `df` (row order = current frame order) as a
    * 2-D zarr array at `path` (a directory). Returns (rows, cols). */
  def write(df: DataFrame, path: String, valueCols: Seq[String],
      chunkRows: Int = 65536): (Long, Int) = {
    require(valueCols.nonEmpty, "zarr write needs at least one value column")
    require(chunkRows > 0, s"chunkRows must be positive: $chunkRows")
    val c = valueCols.length
    require(chunkRows.toLong * c * 8 <= Int.MaxValue,
      s"chunk of $chunkRows rows x $c cols exceeds the 2 GiB buffer bound " +
        "- lower chunkRows")
    val mat = df.select(valueCols.map(col(_).cast("double")): _*)
    val indexed = mat.rdd.zipWithIndex()
    indexed.cache()
    try {
      val n = indexed.count()
      val nChunks = math.max(1L, (n + chunkRows - 1) / chunkRows).toInt
      Files.createDirectories(Paths.get(path))
      // one task per chunk: group rows by chunk id, write padded C-order
      // little-endian float64 bytes (edge chunks store FULL size in v2,
      // padded with the fill value)
      indexed
        .map { case (row, i) =>
          (i / chunkRows, (i % chunkRows,
            Array.tabulate(c)(j => if (row.isNullAt(j)) 0.0 else row.getDouble(j))))
        }
        .partitionBy(new org.apache.spark.HashPartitioner(nChunks))
        .mapPartitions { it =>
          // Invariant: chunk ids are 0..nChunks-1 and HashPartitioner over
          // small Long keys is a bijection mod nChunks, so each partition
          // holds EXACTLY one chunk id. Rows stream straight into the one
          // chunk buffer (no partition materialization); the require makes
          // the invariant loud if a future partitioner change breaks it.
          if (it.isEmpty) Iterator.empty
          else {
            val buf = ByteBuffer.allocate(chunkRows * c * 8)
              .order(ByteOrder.LITTLE_ENDIAN)
            var chunk = -1L
            it.foreach { case (ch, (pos, vals)) =>
              if (chunk == -1L) chunk = ch
              else require(ch == chunk,
                s"zarr write invariant violated: chunks $ch and $chunk " +
                  "landed in one partition")
              var j = 0
              while (j < c) {
                buf.putDouble((pos.toInt * c + j) * 8, vals(j)); j += 1
              }
            }
            Files.write(Paths.get(path, s"$chunk.0"), buf.array())
            Iterator.single(chunk)
          }
        }
        .count() // force the write job
      val meta =
        s"""{
           |  "zarr_format": 2,
           |  "shape": [$n, $c],
           |  "chunks": [$chunkRows, $c],
           |  "dtype": "<f8",
           |  "order": "C",
           |  "compressor": null,
           |  "filters": null,
           |  "fill_value": 0.0
           |}""".stripMargin
      Files.write(Paths.get(path, ".zarray"), meta.getBytes("UTF-8"))
      (n, c)
    } finally { indexed.unpersist(false); () }
  }

  /** Read a 2-D zarr array written by [[write]] (or any zarr writer
    * using the same profile) back as (row_index, c0..c{k-1}). */
  def read(spark: SparkSession, path: String,
      colNames: Seq[String] = Nil): DataFrame = {
    val meta = new String(
      Files.readAllBytes(Paths.get(path, ".zarray")), "UTF-8")
    def longs(key: String): Seq[Long] = {
      val m = s""""$key"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalArgumentException(
          s"zarr: no '$key' in .zarray at $path"))
      m.group(1).split(',').map(_.trim.toLong).toSeq
    }
    require(meta.contains("\"<f8\""),
      s"zarr: only the <f8 profile is supported; .zarray was: $meta")
    require("\"compressor\"\\s*:\\s*null".r.findFirstIn(meta).nonEmpty,
      "zarr: compressed chunks are outside the supported profile")
    // a valid foreign array outside the profile must fail loudly, not
    // decode silently transposed (order 'F') or misaligned (column
    // chunking, filter pipeline)
    require("\"order\"\\s*:\\s*\"C\"".r.findFirstIn(meta).nonEmpty,
      "zarr: only C (row-major) order is in the supported profile")
    require("\"filters\"\\s*:\\s*null".r.findFirstIn(meta).nonEmpty,
      "zarr: filter pipelines are outside the supported profile")
    val Seq(n, c) = longs("shape")
    val chunks = longs("chunks")
    require(chunks.length == 2 && chunks(1) == c,
      s"zarr: column-chunked arrays are outside the supported profile " +
        s"(chunks=$chunks must span all $c columns)")
    val chunkRows = chunks.head
    val nChunks = math.max(1L, (n + chunkRows - 1) / chunkRows).toInt
    val names =
      if (colNames.nonEmpty) colNames
      else (0 until c.toInt).map(j => s"c$j")
    require(names.length == c.toInt,
      s"zarr: ${names.length} column names for $c columns")
    val schema = StructType(StructField("row_index", LongType, nullable = false) +:
      names.map(StructField(_, DoubleType, nullable = false)))
    // zero-row arrays have no chunk files at all (the writer's write job
    // produces none) — short-circuit instead of reading a missing 0.0
    if (n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val rows = spark.sparkContext
      .parallelize(0 until nChunks, math.min(nChunks, 64))
      .flatMap { chunk =>
        val bytes = Files.readAllBytes(Paths.get(path, s"$chunk.0"))
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val first = chunk.toLong * chunkRows
        val last = math.min(n, first + chunkRows)
        (first until last).iterator.map { i =>
          val pos = (i - first).toInt
          Row.fromSeq(i +: (0 until c.toInt).map(j =>
            buf.getDouble((pos * c.toInt + j) * 8)))
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
