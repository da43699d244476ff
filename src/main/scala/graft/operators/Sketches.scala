package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable distributed sketches.
  *
  * Spark's built-in `stat.countMinSketch` / `stat.bloomFilter` (already
  * exposed through the agg registry and `graft_might_contain`) hash with
  * engine-private functions, so their contents can only be spot-checked.
  * This count-min uses the PortableHash md5 family instead: every cell of
  * the sketch — and therefore every estimate — is reproducible in any SQL
  * engine, which makes the sketch itself differential-testable and makes
  * cross-system pipelines (build the sketch in Spark, probe it elsewhere)
  * deterministic.
  *
  * Reference surface: approximate corpus statistics at the scale where
  * exact per-key counts don't fit (the reference's incremental-index /
  * approximate paths, e.g. mars/learn/contrib and the dataframe nunique
  * approximations); count-min is the standard heavy-hitter sketch for a
  * 100 TB token stream.
  *
  * Scale shape: the build is one explode(depth) → partial+final count
  * aggregate keyed (row, bucket) — map-side combine caps shuffle volume at
  * depth × width × partitions regardless of token count; the result is a
  * depth × width table. Estimation joins candidates to the sketch on the
  * (row, bucket) key and takes a min over depth rows per candidate.
  */
object Sketches {

  /** 60-bit md5 of (row tag ++ value), bucketed to [0, width). */
  private def cmBucket(row: Int, value: Column, width: Int): Column =
    pmod(conv(substring(md5(
      concat(lit(s"cm$row|"), value).cast("binary")), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Exploded (row, bucket) cell stream for one value column — shared by
    * the batch build and the streaming form in
    * [[graft.streaming.StreamOps.streamingCountMin]]. */
  private[graft] def cmCells(value: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    explode(array((0 until depth).map(r => struct(
      lit(r.toLong).as("row"), cmBucket(r, value, width).as("bucket"))): _*))
  }

  /** Build a depth × width count-min sketch over `valueCol`. Returns
    * (row, bucket, c) — only non-empty cells; absent cells are zero. */
  def countMinBuild(df: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 256): DataFrame =
    df.select(cmCells(col(valueCol), depth, width).as("__cell"))
      .groupBy(col("__cell.row").as("row"), col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for `candidates` against a built sketch: the classic
    * min over depth rows — an upper bound on the true count, biased only
    * upward by collisions (≤ n/width per row in expectation). */
  def countMinEstimate(sketch: DataFrame, candidates: DataFrame,
      valueCol: String, depth: Int = 4, width: Int = 256): DataFrame = {
    val probes = (0 until depth).map(r => struct(
      lit(r.toLong).as("row"), cmBucket(r, col(valueCol), width).as("bucket")))
    candidates
      .select(col(valueCol), explode(array(probes: _*)).as("__p"))
      .select(col(valueCol), col("__p.row").as("row"), col("__p.bucket").as("bucket"))
      .join(sketch, Seq("row", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
