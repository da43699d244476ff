package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print executed plans for named queries (plan-audit aid;
  * `sbt "runMain graft.DevPlans q03 op_qcut"`). */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.treeString.take(5000))
    }
    spark.stop()
  }
}
