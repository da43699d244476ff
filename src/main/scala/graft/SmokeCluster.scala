package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-deployment smoke (r13 VERDICT #6, documented in DEPLOY.md):
  * validates the pieces of the engine that depend on DEPLOYMENT wiring
  * rather than code — the extension jar being on the executor
  * classpath, the warehouse supporting bucketed saveAsTable /
  * insertInto / rename (the persisted-LSH-index contract), and the
  * width heuristics — against an ARBITRARY master URL.
  *
  * Usage: graft.SmokeCluster [masterUrl] [warehouseDir]
  *   masterUrl     default local[4] (spark-submit --master overrides:
  *                 pass "submit" to keep the submitted master)
  *   warehouseDir  default target/smoke_warehouse
  *
  * Prints one JSON line {"smoke":"ok",...} and exits 0; any failed
  * check raises (nonzero exit). Safe to run repeatedly — tables are
  * namespaced graft_smoke_* and dropped at the start of each run.
  */
object SmokeCluster {
  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local[4]")
    val warehouse = args.lift(1).getOrElse("target/smoke_warehouse")
    val b = graft.api.GraftSession.clusterBuilder()
      .appName("graft-smoke")
      .config("spark.sql.warehouse.dir", warehouse)
      // smoke data is tiny; the production 2000 default would spray
      // empty tasks (a real job keeps it / calls scaleShuffleWidth)
      .config("spark.sql.shuffle.partitions", "8")
    val spark =
      (if (master == "submit") b else b.master(master)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // 1. extension wiring: GraftExtensions must have injected the
      // native functions (a missing --conf spark.sql.extensions or a
      // jar absent from executors silently falls back to HOF paths —
      // correct but slower; the smoke's job is to catch that loudly)
      val fns = Seq("graft_minhash", "graft_cosine")
        .map(f => f -> spark.catalog.functionExists(f)).toMap
      require(fns.values.forall(identity),
        s"GraftExtensions not active: $fns — check spark.sql.extensions " +
          "and that the graft jar is on driver AND executor classpaths")

      // 2. executor-side codegen + shuffle round-trip
      val docs = spark.range(200).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(w =>
          concat(lit("w"), ((col("id") % 40) * (w + 1) % 97))): _*).as("text"))
      val dedup = graft.operators.Dedup.minhashDedupPairs(
        docs, "text", "doc_id").count()

      // 3. the persisted-index contract end to end: bucketed
      // saveAsTable, params/ledger metadata, insertInto append,
      // bucketed-scan join, compaction's drop + rename swap
      import spark.implicits._
      graft.operators.Dedup.dropIndex(spark, "graft_smoke_idx")
      graft.operators.Dedup.minhashIndexPersist(
        docs.filter($"doc_id" < 120), "text", "doc_id",
        "graft_smoke_idx", buckets = 4)
      require(graft.operators.Dedup.minhashIndexAppend(
        docs.filter($"doc_id" >= 120 && $"doc_id" < 160),
        "text", "doc_id", "graft_smoke_idx"), "append did not run")
      val probe = graft.operators.Dedup.minhashDedupPairsAgainstIndex(
        docs.filter($"doc_id" >= 160), "text", "doc_id",
        "graft_smoke_idx")
      val pairsBefore = probe.count()
      graft.operators.Dedup.minhashIndexCompact(spark, "graft_smoke_idx")
      val pairsAfter = graft.operators.Dedup.minhashDedupPairsAgainstIndex(
        docs.filter($"doc_id" >= 160), "text", "doc_id",
        "graft_smoke_idx").count()
      require(pairsBefore == pairsAfter,
        s"compaction changed results: $pairsBefore -> $pairsAfter")
      graft.operators.Dedup.dropIndex(spark, "graft_smoke_idx")

      // 4. width heuristics resolve on this cluster's parallelism
      val cap = spark.sparkContext.defaultParallelism
      println(s"""{"smoke":"ok","master":"${spark.sparkContext.master}",""" +
        s""""extensions":true,"dedup_pairs":$dedup,""" +
        s""""index_pairs":$pairsAfter,"default_parallelism":$cap}""")
    } finally spark.stop()
  }
}
