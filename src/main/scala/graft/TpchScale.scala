package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FK-consistent TPC-H corpus scaler (r10, VERDICT task 4): stages a K×
  * copy of the sf0.1 fixture under target/scale_tpch/x<K> so the 22-query
  * suite can be differentially verified (graft.Verify + dev/compare.py)
  * and benchmarked (graft.Bench) a decade beyond the driver's corpus.
  *
  * Staging trick (same family as [[ScaleBench.stage]]): every copy i
  * strides ALL entity keys by i·10M — custkey, orderkey, partkey,
  * suppkey, event/user ids, doc/vec ids — so each copy is a closed
  * FK-consistent replica and joins never cross copies; nation/region are
  * shared dimensions (25/5 rows) exactly as real deployments share them.
  * Document texts get the per-copy word tag (disjoint shingle spaces →
  * dedup work scales linearly by construction); value columns are
  * untouched so aggregates see the base distributions. Every table lands
  * as ONE parquet file named <table>.parquet — the same layout
  * dev/compare.py and the driver's DuckDB gate read.
  *
  * Total-order caveat this staging respects: the 22 oracle queries all
  * ORDER BY a total key set that includes strided entity keys (or
  * aggregate over shared dimensions), so K identical value copies cannot
  * introduce cross-engine tie ambiguity.
  *
  * Usage: graft.TpchScale [k=10] → prints the staged dir.
  */
object TpchScale {

  private val BaseDir = "/root/testdata/sf0.1"
  private val Stride = 10000000L

  /** Key columns strided per copy, by table; all other columns pass
    * through unchanged. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Nil, // shared dimension: copied once
    "region" -> Nil)

  def stage(spark: SparkSession, k: Int): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = s"/root/repo/target/scale_tpch/x$k"
    val marker = Paths.get(dir, "_staged.marker")
    val srcLineitem = Paths.get(s"$BaseDir/lineitem.parquet")
    val stamp = s"${Files.size(srcLineitem)}:" +
      s"${Files.getLastModifiedTime(srcLineitem).toMillis}:$k:v1"
    if (Files.exists(marker) &&
        new String(Files.readAllBytes(marker)) == stamp) return dir
    Files.createDirectories(Paths.get(dir))
    for ((table, keys) <- keyCols) {
      val base = Tables.load(spark, BaseDir, table)
      val scaled =
        if (keys.isEmpty) base
        else (0 until k).map { i =>
          val strided = keys.foldLeft(base)((d, c) =>
            d.withColumn(c, col(c) + lit(i * Stride)))
          if (table == "documents" && i > 0)
            // disjoint shingle spaces per copy (see ScaleBench.stage)
            strided.withColumn("text", array_join(
              transform(split(col("text"), " "),
                w => concat(w, lit(s"q${i}z"))), " "))
          else strided
        }.reduce(_ unionAll _)
      // one file per table — the layout compare.py / the driver read.
      // coalesce(1) would collapse the whole union into ONE task (the
      // k scan+tag projections run serially inside it); past ~100
      // copies that serializes gigabytes of compute, so large stagings
      // compute wide and gather through a single-partition shuffle —
      // the writer task then just drains shuffle blocks.
      val single =
        if (k > 100) scaled.repartition(1) else scaled.coalesce(1)
      val tmp = Paths.get(dir, s"__tmp_$table")
      single.write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val partFile = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      Files.move(partFile, Paths.get(dir, s"$table.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.walk(tmp).iterator().asScala.toVector.reverse
        .foreach(Files.deleteIfExists(_))
    }
    Files.write(marker, stamp.getBytes)
    dir
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(stage(spark, k))
    spark.stop()
  }
}
