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
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects outright;
      // read the raw int64 nanos and surface a microsecond TimestampType
      // (Spark's native precision). DuckDB sees the same integers via
      // epoch_us(), so oracle comparisons stay exact.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (`lineitem`, `orders`, ...) so
    * `spark.sql` queries can run against the same names the DuckDB oracle
    * uses. Idempotent per session+dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
