package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: benchmark ONE registered query with per-rep wall times.
  *
  * Usage: graft.BenchOne <queryName> [reps]
  *   env SPARK_GRAFT_SF_DIR  — table directory (default sf0.1)
  *   env SPARK_GRAFT_CPUS    — local[N] (default 32)
  *   env GRAFT_EXPLAIN=1     — also print the formatted physical plan
  *
  * Same session config as [[Bench]] so numbers are comparable; not part of
  * the frozen headline set (this is an iteration tool, not the driver
  * benchmark).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE widens the shuffle ceiling for scale drives
    // (AQE never raises it — the 1000× q09 lesson, PERF.md)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // width ∝ corpus bytes by default (floor = the configured width, so
    // sf0.1 stays 32); an explicit SPARK_GRAFT_SHUFFLE pins it manually
    if (!sys.env.contains("SPARK_GRAFT_SHUFFLE"))
      graft.api.GraftSession.scaleShuffleWidth(spark, sfDir)

    if (sys.env.get("GRAFT_STAGES").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = for {
              s <- si.submissionTime; c <- si.completionTime
            } yield (c - s) / 1e3
            println(f"  stage ${si.stageId}%4d  tasks=${si.numTasks}%4d  " +
              f"wall=${wall.getOrElse(-1.0)}%7.3fs  ${si.name.takeWhile(_ != '\n').take(90)}")
          }
        })
    }

    def force(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up (codegen/parquet footers), same as Bench
    SparkEntry.queries("q06")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    val times = (1 to reps).map(_ => force())
    println(f"$name: min=${times.min}%.3f  " +
      times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    spark.stop()
  }
}
