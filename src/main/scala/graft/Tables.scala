package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (`lineitem`, `orders`, ...) so
    * `spark.sql` queries can run against the same names the DuckDB oracle
    * uses. Idempotent per session+dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
