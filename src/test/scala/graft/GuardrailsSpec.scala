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

  test("r8 operators fail fast on bad preconditions") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.substringSpanDedup(docs, "text", "doc_id", n = 1)
    }
    assert(e1.getMessage.contains("n >= 2"))
    val e2 = intercept[IllegalArgumentException] {
      Sessionize.funnelSteps(Seq((1L, 1L, "a")).toDF("u", "ts", "t"),
        "u", "ts", "t", Seq("a"), 10L)
    }
    assert(e2.getMessage.contains("at least 2"))
    val e3 = intercept[IllegalArgumentException] {
      Sessionize.funnelSteps(Seq((1L, 1L, "a")).toDF("u", "ts", "t"),
        "u", "ts", "t", Seq("a", "a"), 10L)
    }
    assert(e3.getMessage.contains("distinct"))
    val e4 = intercept[IllegalArgumentException] {
      Curation.linearTextScore(docs, "text", "doc_id",
        Map(99 -> 1.0), bias = 0.0, dim = 64)
    }
    assert(e4.getMessage.contains("buckets"))
    val e5 = intercept[IllegalArgumentException] {
      graft.operators.Sketches.countMinBuild(docs, "text", depth = 0)
    }
    assert(e5.getMessage.contains("sketch shape"))
    val e6 = intercept[IllegalArgumentException] {
      Sessionize.acf(Seq((1L, 1L, 1.0)).toDF("k", "t", "x"), "k", "t", "x", 0)
    }
    assert(e6.getMessage.contains("maxLag"))
    val e7 = intercept[IllegalArgumentException] {
      Curation.shardAssign(docs, "doc_id", 0)
    }
    assert(e7.getMessage.contains("nShards"))
    val e8 = intercept[IllegalArgumentException] {
      Sessionize.tsFeatures(Seq((1L, 1L, 1L)).toDF("k", "o", "c"),
        "k", Nil, "c")
    }
    assert(e8.getMessage.contains("total series order"))
  }

  test("weightedSample fails fast on null / non-positive weights") {
    val docs = Seq((1L, 2.0), (2L, -1.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Curation.weightedSample(docs, "w", "id", 1).collect()
    }
    assert(e.getMessage.contains("must be > 0"), e.getMessage)
    val nulls = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "w")
    val e2 = intercept[Exception] {
      Curation.weightedSample(nulls, "w", "id", 1).collect()
    }
    assert(e2.getMessage.contains("must be > 0"), e2.getMessage)
    // valid weights still sample exactly k rows
    val ok = Seq((1L, 5.0), (2L, 1.0), (3L, 0.5)).toDF("id", "w")
    assert(Curation.weightedSample(ok, "w", "id", 2).count() == 2)
  }

  test("silhouetteByCluster guards the all-pairs join behind maxRows") {
    val pts = (0 until 30).map(i =>
      (i.toLong, Array(i.toFloat, 0f), i % 3)).toDF("id", "v", "l")
    val e = intercept[IllegalArgumentException] {
      graft.learn.Learn.silhouetteByCluster(pts, "id", "v", "l", maxRows = 10)
        .collect()
    }
    assert(e.getMessage.contains("O(n²)"), e.getMessage)
    // sampleN path stays under the guard and still scores every label
    val s = graft.learn.Learn
      .silhouetteByCluster(pts, "id", "v", "l", maxRows = 10, sampleN = 9)
      .collect()
    assert(s.map(_.getAs[Long]("n")).sum == 9)
  }

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
      Sessionize.resampleCalendar(df, "k", "ts", col("v"), "5sec")
    }
    assert(e.getMessage.contains("unit"))
  }

  test("rankPct and rank reject unknown methods") {
    // 'average' and 'max' are supported since r9 — probe a real unknown
    val e = intercept[IllegalArgumentException] {
      tiny.rankPct("p", Seq("k"), Seq(col("v")), "median")
    }
    assert(e.getMessage.contains("rank method"))
    val e2 = intercept[IllegalArgumentException] {
      tiny.rank("p", Seq("k"), Seq(col("v")), "median")
    }
    assert(e2.getMessage.contains("rank method"))
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

  test("isolation forest: null features are excluded from fit, scored null") {
    import graft.learn.IsolationForest
    val df = Seq((1L, Some(1.0), Some(2.0)), (2L, None, Some(3.0)),
      (3L, Some(2.0), Some(1.0)), (4L, Some(3.0), Some(4.0)),
      (5L, Some(0.5), Some(2.5))).toDF("id", "x", "y")
    val m = IsolationForest.fit(df, Seq("x", "y"), "id",
      numTrees = 5, sampleSize = 4, seed = 2L)
    val scored = IsolationForest.score(m, df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(scored(2L).isEmpty)
    assert(Seq(1L, 3L, 4L, 5L).forall(scored(_).exists(s => s > 0 && s < 1)))
  }

  test("trapz guards the ordered-fold buffer behind maxPoints") {
    val pts = (1 to 100).map(i => (i * 1.0, i * 2.0)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.learn.Learn.trapz(pts, "x", "y", maxPoints = 50L)
    }
    assert(e.getMessage.contains("maxPoints"))
    // under the guard it still integrates
    assert(graft.learn.Learn.trapz(pts, "x", "y").collect().head.getDouble(0)
      > 0.0)
  }

  test("blockwiseOls and meshgrid fail fast on bad shapes") {
    import spark.implicits._
    val train = Seq((1L, 1.0, 2.0)).toDF("id", "x", "y")
    val test = Seq((2L, 1.0)).toDF("id", "x")
    val e1 = intercept[IllegalArgumentException] {
      graft.learn.Learn.blockwiseOls(train, test, "id", "x", "y",
        nBlocks = 1, threshold = 0.0)
    }
    assert(e1.getMessage.contains("nBlocks"))
    val e2 = intercept[IllegalArgumentException] {
      graft.learn.Learn.blockwiseOls(train, test, "id", "x", "y",
        nBlocks = 100, threshold = 0.0)
    }
    assert(e2.getMessage.contains("nBlocks"))
    val e3 = intercept[IllegalArgumentException] {
      graft.api.GraftSession(spark).meshgrid(0.0, 1.0, 0, 0.0, 1.0, 5)
    }
    assert(e3.getMessage.contains("meshgrid"))
  }
}
