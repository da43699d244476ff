package graft.remote

import org.apache.spark.sql.SparkSession

import scala.reflect.ClassTag

/** The reference's `mars.remote` namespace (`mr.spawn`,
  * mars/remote/core.py:42,187): arbitrary-function parallelism. In Mars a
  * spawned function becomes a RemoteFunction operand scheduled like any
  * chunk; on Spark the same contract is `parallelize(...).map` — each call
  * runs once on some executor, results collect to the driver like
  * `mr.ExecutableTuple.execute().fetch()`.
  *
  * Nested spawns (Mars supports spawning from inside a spawned fn) are NOT
  * supported — Spark tasks cannot submit jobs; restructure as a two-stage
  * spawn from the driver, which is also how such pipelines shard at scale.
  */
object Spawn {

  /** Run `fn` over `args` in parallel on the cluster, one task per element
    * (capped by defaultParallelism), returning results in input order. */
  def spawnMap[A, B: ClassTag](spark: SparkSession, args: Seq[A])(fn: A => B): Seq[B] = {
    val sc = spark.sparkContext
    val parallelism = math.min(math.max(args.size, 1), sc.defaultParallelism)
    sc.parallelize(args.toIndexedSeq.zipWithIndex, parallelism)
      .map { case (a, i) => (i, fn(a)) }
      .collect()
      .sortBy(_._1)
      .map(_._2)
      .toSeq
  }

  /** Fire-and-collect a fixed list of independent thunks (the
    * `mr.spawn(f); mr.spawn(g)` pattern). */
  def spawn[B: ClassTag](spark: SparkSession, thunks: Seq[() => B]): Seq[B] =
    spawnMap(spark, thunks.indices)(i => thunks(i)())
}
