package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Dedup

import scala.util.Random

/** Native-expression vs HOF equivalence: the codegen'd graft_cosine /
  * graft_minhash must produce bit-identical values to the declarative
  * higher-order-function forms they accelerate (the session here registers
  * GraftExtensions, so call_function resolves the native path).
  */
class PlansSpec extends SparkSpecBase {
  import spark.implicits._

  test("extension functions are registered in the session") {
    assert(spark.catalog.functionExists("graft_cosine"))
    assert(spark.catalog.functionExists("graft_minhash"))
  }

  test("graft_cosine is bit-identical to the HOF fold") {
    val r = new Random(31)
    val rows = (1 to 200).map(_ =>
      (Seq.fill(64)(r.nextGaussian().toFloat), Seq.fill(64)(r.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
    val diffs = df.select(
        (call_function("graft_cosine", $"a", $"b") -
          VectorFunctions.cosine($"a", $"b")).as("d"))
      .agg(max(abs($"d"))).as[Double].collect().head
    assert(diffs == 0.0, s"native vs HOF cosine diverged by $diffs")
  }

  test("graft_minhash is bit-identical to the HOF fold") {
    val r = new Random(37)
    val docs = (1 to 100).map(i =>
      (i.toLong, Seq.fill(50)("w" + r.nextInt(300)).mkString(" ")))
      .toDF("doc_id", "text")
    val hashed = TextFunctions.hashedShingles($"text", 3)
    val cmp = docs.select(
        call_function("graft_minhash", hashed, lit(64), lit(42L)).as("native"),
        Dedup.minhashSignature(hashed, 64, 42L).as("hof"))
      .filter(not($"native" <=> $"hof"))
    assert(cmp.count() == 0)
  }

  test("graft_euclidean is bit-identical to the HOF fold") {
    val r = new Random(33)
    val rows = (1 to 200).map(_ =>
      (Seq.fill(64)(r.nextGaussian().toFloat), Seq.fill(64)(r.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
    val diffs = df.select(
        (call_function("graft_euclidean", $"a", $"b") -
          VectorFunctions.euclidean($"a", $"b")).as("d"))
      .agg(max(abs($"d"))).as[Double].collect().head
    assert(diffs == 0.0, s"native vs HOF euclidean diverged by $diffs")
  }

  test("graft_simhash is bit-identical to the HOF fold") {
    val r = new Random(43)
    val docs = (1 to 100).map(i =>
      (i.toLong, Seq.fill(30)("t" + r.nextInt(200)).mkString(" ")))
      .toDF("doc_id", "text")
    val tokenHashes = transform(TextFunctions.words($"text"), t => xxhash64(t))
    val cmp = docs.select(
        call_function("graft_simhash", tokenHashes).as("native"),
        Dedup.simhash64($"text").as("hof"))
      .filter($"native" =!= $"hof")
    assert(cmp.count() == 0)
  }

  test("native cosine survives both codegen and interpreted paths") {
    // interpreted path: force eval through a filter on a literal frame
    val df = Seq((Seq(1f, 0f), Seq(1f, 0f)), (Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
    val sims = df.select(call_function("graft_cosine", $"a", $"b").as("s"))
      .as[Double].collect().sorted.toSeq
    assert(sims == Seq(0.0, 1.0))
  }
}
