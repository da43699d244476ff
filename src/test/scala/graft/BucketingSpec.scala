package graft

import org.apache.spark.sql.functions._
import graft.api.GraftFrame

/** Bucketed-table co-location: joining two tables bucketed on the same key
  * with the same bucket count must plan WITHOUT a shuffle exchange — the
  * pattern that amortizes the one-time shuffle of a 100 TB fact table
  * across every subsequent join.
  */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed join plans without shuffle exchanges") {
    val a = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i % 50, i * 2)).toDF("k", "vb")
    GraftFrame(a).toBucketedTable("bucketed_a", 4, Seq("k"))
    GraftFrame(b).toBucketedTable("bucketed_b", 4, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must be a co-located sort-merge join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 20000) // 50 keys × 20 × 20
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("groupBy on the bucket key avoids the aggregation exchange") {
    val a = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
    GraftFrame(a).toBucketedTable("bucketed_g", 4, Seq("k"))
    try {
      val agg = spark.table("bucketed_g").groupBy("k").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bucketed_g")
  }
}
