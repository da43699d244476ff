package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling-curve harness (r9, VERDICT task 1): measures the five
  * flagship pipelines at 1×/10×/100× of the sf0.1 corpus and reports
  * per-decade log-log slopes, turning the 100 TB plan-shape arguments
  * into measured exponents.
  *
  * Scaled corpora are synthesized by unioning K re-keyed copies of the
  * fixture (ids shifted by a 1 M stride). Document texts get a per-copy
  * word tag (`q<k>z` appended to every word, k ≥ 1), which makes the
  * copies' shingle spaces DISJOINT: each copy reproduces the base
  * corpus's internal near-dup structure, and no cross-copy shingle or
  * band collisions exist — so total true work scales linearly with K by
  * construction and a measured slope above 1 exposes engine overheads,
  * not an artifact of planting K-times-denser duplicate clusters.
  * Embeddings are re-keyed only (runtime is value-independent; queries
  * stay the base vec_id < 10 set, so ANN work is 10 × corpus).
  *
  * Usage: graft.ScaleBench [scales=1,10,100] [reps=2]
  * Writes scaled corpora under target/scale/x<K>/ (restaged when the
  * fixture changes) and prints one JSON line per (pipeline, scale) plus
  * a slope summary.
  */
object ScaleBench {

  private val BaseDir = "/root/testdata/sf0.1"
  private val Stride = 1000000L

  private def stage(spark: SparkSession, k: Int): String = {
    import java.nio.file.{Files, Paths}
    val dir = s"/root/repo/target/scale/x$k"
    val marker = Paths.get(dir, "_staged.marker")
    val srcDocs = Paths.get(s"$BaseDir/documents.parquet")
    val srcEmb = Paths.get(s"$BaseDir/embeddings.parquet")
    val stamp = s"${Files.size(srcDocs)}:${Files.getLastModifiedTime(srcDocs).toMillis}:" +
      s"${Files.size(srcEmb)}:${Files.getLastModifiedTime(srcEmb).toMillis}:$k:v1"
    if (Files.exists(marker) &&
        new String(Files.readAllBytes(marker)) == stamp) return dir
    val docs = spark.read.parquet(srcDocs.toString)
    val emb = spark.read.parquet(srcEmb.toString)
    val scaledDocs = (0 until k).map { i =>
      val tagged =
        if (i == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"q${i}z"))),
          " ")
      docs.select((col("doc_id") + lit(i * Stride)).as("doc_id"),
        tagged.as("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    val scaledEmb = (0 until k).map { i =>
      emb.select((col("vec_id") + lit(i * Stride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionAll _)
    scaledDocs.repartition(math.max(2, k)).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    scaledEmb.repartition(math.max(2, k)).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    Files.write(marker, stamp.getBytes)
    dir
  }

  /** The five flagship pipelines, each forced with a count(). */
  private def pipelines: Seq[(String, (SparkSession, String) => Long)] = {
    import graft.operators.{Components, Dedup, Similarity}
    Seq(
      "minhash_dedup" -> { (s: SparkSession, dir: String) =>
        Dedup.minhashDedupPairs(Tables.load(s, dir, "documents"),
          "text", "doc_id", n = 3, threshold = 0.8,
          bands = 16, rowsPerBand = 4).count()
      },
      "lsh_portable_cands" -> { (s: SparkSession, dir: String) =>
        Dedup.minhashCandidatesPortable(Tables.load(s, dir, "documents"),
          "text", "doc_id").count()
      },
      "cc_star" -> { (s: SparkSession, dir: String) =>
        val pairs = Dedup.minhashDedupPairs(Tables.load(s, dir, "documents"),
          "text", "doc_id", n = 3, threshold = 0.8,
          bands = 16, rowsPerBand = 4)
        Components.connectedComponentsStar(pairs, "doc_a", "doc_b").count()
      },
      "ann_topk" -> { (s: SparkSession, dir: String) =>
        val e = Tables.load(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        Similarity.bruteForceTopK(queries, corpus, k = 5).count()
      },
      "curation6" -> { (s: SparkSession, dir: String) =>
        SparkEntry.queries("ext_curation6")(s, dir).count()
      },
      "stream_dedup" -> { (s: SparkSession, dir: String) =>
        // streaming first-seen dedup over the staged files in ~4
        // micro-batches — the ingest-time filter's throughput curve
        val path = s"$dir/documents.parquet"
        val schema = s.read.parquet(path).schema
        val nFiles = new java.io.File(path).listFiles()
          .count(f => f.getName.startsWith("part-"))
        val perTrigger = math.max(1, nFiles / 4)
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", perTrigger).parquet(path)
        val sink = s"scale_dedup_${streamSinkSeq.incrementAndGet()}"
        val q = graft.streaming.StreamOps.streamingExactDedup(stream)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          s.table(sink).count()
        } finally q.stop()
      })
  }

  private val streamSinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
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
    spark.sparkContext.setLogLevel("WARN")

    val dirs = scales.map(k => k -> stage(spark, k)).toMap
    val results = collection.mutable.Map[(String, Int), Double]()
    for ((name, fn) <- pipelines; k <- scales) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, dirs(k))
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val best = times.map(_._1).min
      results((name, k)) = best
      println(f"""{"pipeline":"$name","scale":$k,"sec":$best%.3f,""" +
        s""""rows":${times.head._2},"reps":${times.map(t => f"${t._1}%.2f").mkString("[", ",", "]")}}""")
    }
    // per-decade slopes: s = log(t_b/t_a) / log(b/a); slope 1 = linear
    println("pipeline          " + scales.sliding(2).map { case Seq(a, b) =>
      f"slope_${a}x_${b}x" }.mkString("  "))
    for ((name, _) <- pipelines) {
      val slopes = scales.sliding(2).map { case Seq(a, b) =>
        val s = math.log(results((name, b)) / results((name, a))) /
          math.log(b.toDouble / a)
        f"$s%12.2f"
      }.mkString("  ")
      println(f"$name%-18s$slopes")
    }
    spark.stop()
  }
}
