package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table registry for the driver-generated test data.
  *
  * Mirrors the reference's TPC-H loader surface
  * (reference: benchmarks/tpch/loader.py:22-280) — each table is a single
  * parquet file under `sfDir`. At cluster scale these would be partitioned
  * directories; `spark.read.parquet` handles both identically, and all
  * filters/projections push down to the scan via Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as TIMESTAMP(NANOS) in some fixture builds
      // (which Spark rejects outright) and plain timestamp[us] in others, so
      // normalize adaptively to Spark's native microsecond TimestampType:
      //  - int64 nanos (read via nanosAsLong) -> DIV 1000 -> timestamp_micros
      //  - TIMESTAMP_NTZ (us, isAdjustedToUTC=false) -> cast; the session
      //    timezone is pinned to UTC, so the cast is epoch-preserving
      // DuckDB sees the same integers via epoch_us(), so oracle comparisons
      // stay exact in every case.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => // TIMESTAMP_NTZ
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (`lineitem`, `orders`, ...) so
    * `spark.sql` queries can run against the same names the DuckDB oracle
    * uses. Idempotent per session+dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
