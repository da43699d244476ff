package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` output for named queries to
  * files (plan-evidence capture for optimization rounds;
  * `sbt "runMain graft.DevExplain plans/r17 _before q01 q03"` — pass
  * `headline` to expand to the Bench headline set).
  *
  * Same session config as [[Bench]] so the captured plans are the plans
  * the bench actually runs (extension expressions, AQE, runtime bloom).
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error(
      "usage: DevExplain <outDir> <suffix> <query|headline> ..."))
    val suffix = args.lift(1).getOrElse("_before")
    val names = args.drop(2).flatMap {
      case "headline" =>
        (1 to 22).map(i => f"q$i%02d") ++
          Seq("ext_dedup_exact", "ext_dedup_jaccard", "ext_dedup_minhash",
            "ext_ann_topk", "ext_token_count", "ext_fingerprint",
            "op_events_session", "op_events_tumbling")
      case n => Seq(n)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.contains("SPARK_GRAFT_SHUFFLE"))
      graft.api.GraftSession.scaleShuffleWidth(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // queryExecution.explainString == what explain("formatted") prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), txt)
      println(s"wrote $outDir/$name$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
