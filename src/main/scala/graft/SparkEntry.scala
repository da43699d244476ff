package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries are registered declaratively as [[graft.queries.Q]] values in
  * the suite objects; each carries its Spark implementation and (when
  * SQL-expressible) the DuckDB oracle SQL used by the driver's differential
  * correctness gate.
  */
object SparkEntry {

  /** Every registered query suite, concatenated. Names must be unique. */
  lazy val registry: Vector[Q] =
    Tpch.all ++ OpsRelational.all ++ OpsWindows.all ++ OpsExtra.all ++
      OpsReshape.all ++ Ext.all ++ LearnQ.all ++ TensorQ.all ++
      SpecialQ.all ++ Probes.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
