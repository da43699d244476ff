package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // optional trailing query names restrict the dump (dev iteration);
    // the driver's 2-arg invocation runs everything
    val only = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides for topology drives (e.g.
    // local-cluster[2,4,4096] — separate executor JVMs, real network
    // shuffles; the r14 topology-independence certification): the
    // default local[$cpus] is the driver's gate contract, untouched
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // r18 (VERDICT r17 item 6): the memory-sink streaming parity gates use
    // Spark's TEMPORARY checkpoints (no explicit checkpointLocation), which
    // land under java.io.tmpdir — spinning-disk fsyncs of per-batch state
    // deltas and commit logs dominated the ~65 s streaming share of the
    // battery. Checkpoint state for those gates is pure per-run scratch, so
    // point the session default at tmpfs when one exists, under a
    // PER-PROCESS unique dir (a reused name would resume a previous run's
    // state store — the opposite of a parity gate) that is deleted on exit.
    // The crash-REPLAY gates pass their own explicit checkpointLocation
    // (real disk dirs) and are untouched; GRAFT_STREAM_CKPT overrides.
    val scratchCkpt: Option[String] = sys.env.get("GRAFT_STREAM_CKPT")
      .orElse {
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite)
          Some(s"/dev/shm/graft_ckpt_${ProcessHandle.current().pid()}_${System.nanoTime()}")
        else None
      }
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    scratchCkpt.foreach(builder.config("spark.sql.streaming.checkpointLocation", _))
    val spark = builder.getOrCreate()
    scratchCkpt.foreach { dir =>
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          import scala.jdk.CollectionConverters._
          val p = Paths.get(dir)
          if (Files.exists(p))
            Files.walk(p).iterator().asScala.toVector.reverse
              .foreach(Files.deleteIfExists(_))
        } catch { case _: Throwable => () }
      }))
    }
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // full dumps prune result dirs of queries no longer in the registry —
    // a stale dir from an older binary reads as a bogus [no-oracle] row
    // in the differential (bit us twice in r10 with the retired probe)
    if (only.isEmpty) {
      val live = SparkEntry.queries.keySet
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && !live(f.getName))
        .foreach { d =>
          System.err.println(s"[verify] pruning stale result dir: ${d.getName}")
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d.toPath).iterator().asScala
            .toVector.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
        }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
