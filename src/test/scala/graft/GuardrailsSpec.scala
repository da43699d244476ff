package graft

import org.apache.spark.sql.functions._
import graft.api.GraftFrame
import graft.operators.{Curation, Sessionize, Similarity}

/** Error-path contracts: operators with preconditions must fail fast with
  * messages that name the problem — not produce silently-wrong plans.
  */
class GuardrailsSpec extends SparkSpecBase {
  import spark.implicits._

  private val tiny = GraftFrame(Seq((1L, 1.0)).toDF("k", "v"))

  test("chunkWords rejects overlap >= chunkSize") {
    val e = intercept[IllegalArgumentException] {
      Curation.chunkWords(tiny.df.withColumn("text", lit("a b")),
        "text", "k", chunkSize = 4, overlap = 4)
    }
    assert(e.getMessage.contains("overlap"))
  }

  test("resampleCalendar rejects unknown units") {
    val df = tiny.df.withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
    val e = intercept[IllegalArgumentException] {
      Sessionize.resampleCalendar(df, "k", "ts", col("v"), "hour")
    }
    assert(e.getMessage.contains("unit"))
  }

  test("rankPct and rank reject unknown methods") {
    val e = intercept[IllegalArgumentException] {
      tiny.rankPct("p", Seq("k"), Seq(col("v")), "average")
    }
    assert(e.getMessage.contains("rank method"))
  }

  test("pqFit rejects a dim that does not divide into subspaces") {
    val corpus = Seq((1L, Seq.fill(10)(1.0f))).toDF("cid", "cvec")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqFit(corpus, dim = 10, m = 4)
    }
    assert(e.getMessage.contains("subspaces"))
  }

  test("winsorize rejects inverted quantile bounds") {
    val e = intercept[IllegalArgumentException] {
      tiny.winsorize("v", "w", 0.9, 0.1)
    }
    assert(e.getMessage.contains("pLow"))
  }

  test("mergeValidated rejects unknown validate specs") {
    val e = intercept[IllegalArgumentException] {
      tiny.mergeValidated(tiny, Seq("k"), validate = "2:2")
    }
    assert(e.getMessage.contains("unknown validate"))
  }

  test("saltedJoin still rejects right/full outer joins") {
    val e = intercept[IllegalArgumentException] {
      tiny.saltedJoin(tiny, Seq("k"), saltFactor = 4, how = "full_outer")
    }
    assert(e.getMessage.toLowerCase.contains("salted"))
  }

  test("duplicatedKeep rejects unknown keep modes") {
    val e = intercept[IllegalArgumentException] {
      tiny.duplicatedKeep(Seq("k"), "v", keep = "middle")
    }
    assert(e.getMessage.contains("keep"))
  }

  test("hashingTf rejects a non-positive dimension") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.functions.TextFunctions.hashingTf(df, "id", "text", dim = 0)
    }
    assert(e.getMessage.contains("dim"))
  }
}
