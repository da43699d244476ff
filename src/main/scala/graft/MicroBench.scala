package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmarks mirroring the ONLY absolute timings the reference
  * publishes (BASELINE.md; reference README.rst:76-113):
  *
  *  1. Monte-Carlo π over N = 2×10⁸ points — numpy 22.5 s, Mars 3.77 s on
  *     a single multicore machine (generation included, as there).
  *  2. `df.sum()` over 1×10⁸ rows × 4 float64 columns — pandas 11 s,
  *     Mars 2.75 s (frame pre-materialized, sum alone timed, as there).
  *
  * Not part of the driver contract or the frozen Bench headline — run
  * manually; PERF.md records the measured numbers next to the reference's.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // 1. Monte-Carlo π, N = 2e8 (generation + reduction, like the reference)
    val n = 200000000L
    val (pi, tPi) = time {
      val hits = spark.range(n)
        .select((rand(1) * 2 - 1).as("x"), (rand(2) * 2 - 1).as("y"))
        .filter($"x" * $"x" + $"y" * $"y" <= 1.0)
        .count()
      4.0 * hits / n
    }

    // 1b. the same π via 20 mr.spawn-style remote calls (reference
    //     README.rst:180-187: serial 12.4 s, Mars 3.99 s) — each call runs
    //     a driver-side-written function on an executor
    val (piSpawn, tSpawn) = time {
      val perCall = n / 20
      val hits = graft.remote.Spawn.spawnMap(spark, (0 until 20).map(_.toLong)) { seed =>
        val rng = new java.util.Random(seed)
        var h = 0L; var i = 0L
        while (i < perCall) {
          val x = rng.nextDouble() * 2 - 1; val y = rng.nextDouble() * 2 - 1
          if (x * x + y * y <= 1.0) h += 1
          i += 1
        }
        h
      }.sum
      4.0 * hits / n
    }

    // 2. sum over 1e8 rows x 4 doubles; frame materialized first, sum timed
    val wide = spark.range(100000000L)
      .select(rand(10).as("a"), rand(11).as("b"), rand(12).as("c"), rand(13).as("d"))
      .persist()
    wide.count() // materialize outside the timed region
    val (_, tSum) = time {
      wide.agg(sum($"a"), sum($"b"), sum($"c"), sum($"d")).collect()
    }
    wide.unpersist()

    println(f"""{"pi":$pi%.6f,"pi_sec":$tPi%.2f,"pi_spawn":$piSpawn%.6f,"pi_spawn_sec":$tSpawn%.2f,"sum4_sec":$tSum%.2f}""")
    spark.stop()
  }
}
