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

    // GRAFT_METRICS=1: also report the memory envelope per rep (peak
    // per-task execution memory, shuffle bytes, spill) — the columns
    // the constrained-heap scale cells are judged on (PERF.md method:
    // wall-clock alone hides tail latency when 31 cores idle)
    val metrics = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, Long].withDefaultValue(0L))
    if (sys.env.get("GRAFT_METRICS").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) metrics.updateAndGet { acc =>
              acc ++ Map(
                "shuffle_read" -> (acc("shuffle_read") + m.shuffleReadMetrics.totalBytesRead),
                "shuffle_write" -> (acc("shuffle_write") + m.shuffleWriteMetrics.bytesWritten),
                "mem_spill" -> (acc("mem_spill") + m.memoryBytesSpilled),
                "disk_spill" -> (acc("disk_spill") + m.diskBytesSpilled),
                "peak_task_mem" -> math.max(acc("peak_task_mem"), m.peakExecutionMemory))
            }
          }
        })
    }
    def force(): (Double, Map[String, Long]) = {
      metrics.set(Map.empty[String, Long].withDefaultValue(0L))
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the async listener bus before snapshot
      (dt, metrics.get())
    }
    // warm-up (codegen/parquet footers), same as Bench
    SparkEntry.queries("q06")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    val runs = (1 to reps).map(_ => force())
    val times = runs.map(_._1)
    println(f"$name: min=${times.min}%.3f  " +
      times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    if (sys.env.get("GRAFT_METRICS").contains("1")) {
      val best = runs.minBy(_._1)._2
      val cells = best.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString(",")
      println("{\"query\":\"" + name + "\",\"envelope\":{" + cells + "}}")
    }
    spark.stop()
  }
}
