package graft

import org.apache.spark.sql.functions._
import graft.api.GraftFrame
import graft.operators.{Sessionize, Windows}

/** Plan-shape regression guards: the scale arguments in PERF.md claim
  * specific shuffle counts for the round-6 operators — these specs pin
  * them so a refactor that silently adds an exchange fails loudly.
  * (Counting is on the pre-execution physical plan string; BroadcastExchange
  * is counted separately from shuffle exchanges.)
  */
class PlanShapeSpec extends SparkSpecBase {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  private val events = (0 until 200).map(i =>
    (i.toLong % 7, i.toLong, if (i % 5 == 0) None else Some(i * 1.5)))

  test("interpolateLinear: one shuffle, both window phases share the sort") {
    val df = events.toDF("k", "o", "v")
    val out = Windows.interpolateLinear(df, Seq("k"), Seq("o"), "v", "i")
    assert(shuffles(out) == 1, out.queryExecution.executedPlan.toString.take(500))
    // both WindowExec nodes hang off ONE sort
    val plan = out.queryExecution.executedPlan.toString
    assert("Window ".r.findAllIn(plan).size >= 1)
    assert("Sort ".r.findAllIn(plan).size <= 2) // staging sort only (+AQE variance)
  }

  test("winsorize: cutoff aggregate joins back without a data re-shuffle") {
    val df = GraftFrame((1 to 500).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v"))
    val out = df.winsorize("v", "w", 0.05, 0.95, by = Seq("g")).df
    // one partial+final percentile aggregate (1 shuffle); the join back to
    // the data must be a broadcast, not a second hash shuffle of the rows
    assert(shuffles(out) <= 2)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
      || shuffles(out) == 1)
  }

  test("rankPct and cumcount share the groupby partitioning (one shuffle)") {
    val df = GraftFrame(events.map(e => (e._1, e._2)).toDF("k", "o"))
    val out = df.rankPct("p", Seq("k"), Seq(col("o")), "min")
      .groupby("k").cumcount("cc", Seq("o")).df
    assert(shuffles(out) == 1,
      out.queryExecution.executedPlan.toString.take(500))
  }

  test("substringSpanDedup: gram-rank + doc exchanges only, agg reuses the window sort") {
    import graft.operators.Dedup
    val docs = (1 to 60).map(i => (i.toLong, ((1 to 30).map(w => s"w${(i * w) % 40}")).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.substringSpanDedup(docs, "text", "doc_id", n = 8)
    val plan = out.queryExecution.executedPlan.toString
    // one exchange on the gram hash, one on the doc id (union side); the
    // reassembly aggregate must NOT re-exchange after the coverage window,
    // and the id join back must broadcast at this size
    assert(shuffles(out) <= 3, plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }

  test("gopherFlags is a pure projection — zero exchanges") {
    import graft.operators.Curation
    val docs = Seq((1L, "the a word list here")).toDF("doc_id", "text")
    val out = Curation.gopherFlags(docs, "text", "doc_id")
    assert(shuffles(out) == 0, out.queryExecution.executedPlan.toString.take(500))
  }

  test("the special-function families are pure projections — zero exchanges") {
    import graft.functions.Special
    val df = Seq(1.5, 2.5).toDF("x")
    val out = df.select(
      Special.besselJ0(col("x")), Special.besselK1(col("x")),
      Special.ellipk(col("x") / 10.0), Special.fresnelC(col("x")),
      Special.dawsn(col("x")), Special.airyAi(col("x")),
      Special.gammaincP(col("x") + 1.0, col("x")),
      Special.betaincReg(col("x"), col("x"), col("x") / 10.0))
    assert(shuffles(out) == 0,
      out.queryExecution.executedPlan.toString.take(500))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), plan.take(300))
  }

  test("blockwiseOls broadcasts the models frame to the test side") {
    import graft.learn.Learn
    val train = (1 to 120).map(i => (i.toLong, i % 13 + 1.0, 3.0 * (i % 13)))
      .toDF("id", "x", "y")
    val test = (1 to 20).map(i => (1000L + i, i + 0.5)).toDF("id", "x")
    val out = Learn.blockwiseOls(train, test, "id", "x", "y", 4, 10.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("axisStats and groupedOls are single partial+final aggregates") {
    import graft.learn.Learn
    val vecs = (1 to 50).map(i => (i.toLong, Seq(i.toFloat, (i * 2).toFloat)))
      .toDF("id", "embedding")
    assert(shuffles(Learn.axisStats(vecs, "embedding")) == 1)
    val xy = (1 to 100).map(i => (s"g${i % 3}", i.toDouble, i * 2.0 + 1))
      .toDF("k", "x", "y")
    assert(shuffles(Learn.groupedOls(xy, "k", "x", "y")) == 1)
  }

  test("cooMatmul: contraction join + (i,j) aggregate, no broadcast of big sides") {
    import graft.learn.Learn
    val a = (1 to 200).map(i => (i.toLong % 20, i.toLong % 10, i.toLong)).toDF("i", "k", "v")
    val b = (1 to 200).map(i => (i.toLong % 10, i.toLong % 5, i.toLong)).toDF("k", "j", "v")
    val out = Learn.cooMatmul(a, "i", "k", "v", b, "k", "j", "v")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(shuffles(out) <= 3, plan.take(500))
  }

  test("repartitionBy pre-partitioning is reused by a following groupBy") {
    val df = GraftFrame(events.toDF("k", "o", "v")).repartitionBy(8, "k").df
    val out = df.groupBy("k").count()
    // the explicit key exchange is the ONLY one — the aggregate reuses it
    assert(shuffles(out) == 1,
      out.queryExecution.executedPlan.toString.take(500))
  }

  test("checkMonotonic: data-side window is bucket-partitioned, not global") {
    val df = (0 until 5000).map(i => (i.toLong, i * 2.0)).toDF("o", "v")
    val out = GraftFrame(df).checkMonotonic("o", "v").df
    val plan = out.queryExecution.executedPlan.toString
    // the frame enters via a range exchange on the order column …
    assert(plan.contains("Exchange rangepartitioning(__o"),
      plan.take(800))
    // … and every window whose sort key is the order column also carries
    // the bucket id in its partition spec (a global data window would
    // read "windowspecdefinition(__o ... ASC" with no partition columns)
    assert(!plan.contains("windowspecdefinition(__o"),
      "data rows must never cross a single-task global window:\n" + plan.take(1200))
    val r = out.collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("trapz: data windows are bucket-partitioned, no global data window") {
    val df = (0 until 5000).map(i => (i * 1.0, i * 2.0)).toDF("x", "y")
    val out = graft.learn.Learn.trapz(df, "x", "y")
    val plan = out.queryExecution.executedPlan.toString
    // points enter via a range exchange on x; per-bucket lag windows carry
    // the bucket id — a data-wide single-task window would plan as
    // "windowspecdefinition(__x ..." with no partition columns
    assert(plan.contains("Exchange rangepartitioning(__x"), plan.take(800))
    assert(!plan.contains("windowspecdefinition(__x"),
      "data rows must never cross a single-task global window:\n" + plan.take(1200))
    // only bucket summaries (≤ #partitions rows) reach the boundary join,
    // and it broadcasts
    assert(plan.contains("BroadcastExchange"), plan.take(800))
  }

  test("isolation forest scoring is a narrow pass — zero exchanges") {
    val df = (0 until 2000).map(i => (i.toLong, i * 1.0, (i % 13) * 1.0))
      .toDF("id", "x", "y")
    val model = graft.learn.IsolationForest.fit(df, Seq("x", "y"), "id",
      numTrees = 10, sampleSize = 64, seed = 5L)
    val out = graft.learn.IsolationForest.score(model, df)
    assert(shuffles(out) == 0,
      out.queryExecution.executedPlan.toString.take(800))
  }

  test("mixture and token-budget samplers: window + valve stats only, broadcast joins") {
    import graft.operators.Curation
    val docs = (1 to 2000).map(i => (i.toLong, s"d${i % 5}", 100L))
      .toDF("doc_id", "source", "tok")
    val mix = Curation.mixtureSample(docs, "source", "doc_id",
      Map("d0" -> 1.0, "d1" -> 1.0), totalN = 100L)
    val tokb = Curation.tokenBudgetSample(docs, "source", "doc_id", "tok",
      Map("d0" -> 5000L))
    for (out <- Seq(mix, tokb)) {
      val plan = out.queryExecution.executedPlan.toString
      // r10 skew valve: the per-domain window plus the valve's stats
      // aggregate are the only exchanges; the domain dim table comes
      // back as a BROADCAST join (never a shuffled join), and the
      // target/budget assignment stays a when-chain projection
      assert(shuffles(out) <= 2, plan.take(800))
      assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        plan.take(800))
    }
    // explicit opt-out restores the bare single-exchange window shape
    val bare = Curation.mixtureSample(docs, "source", "doc_id",
      Map("d0" -> 1.0, "d1" -> 1.0), totalN = 100L,
      skewThreshold = Long.MaxValue)
    val bplan = bare.queryExecution.executedPlan.toString
    assert(shuffles(bare) == 1, bplan.take(800))
    assert(!bplan.contains("Join"), bplan.take(800))
  }

  test("temperatureSample plans like mixtureSample; weights collect is one aggregate") {
    import graft.operators.Curation
    val docs = (1 to 2000).map(i => (i.toLong, s"d${i % 5}"))
      .toDF("doc_id", "source")
    val out = Curation.temperatureSample(docs, "source", "doc_id",
      alpha = 0.5, totalN = 100L)
    val plan = out.queryExecution.executedPlan.toString
    // after the (bounded, guarded) weights collect, the sample itself is
    // the mixtureSample-with-valve shape: domain window + valve stats,
    // broadcast-only joins
    assert(shuffles(out) <= 2, plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(800))
  }

  test("mega-domain sampler windows see a thinned prefix, never the full domain") {
    import graft.operators.Curation
    // one domain dwarfs the rest; threshold forces the valve on
    val docs = ((1 to 30000).map(i => (i.toLong, "mega", 10L)) ++
      (1 to 50).map(i => (100000L + i, "tail", 10L)))
      .toDF("doc_id", "source", "tok")
    val capped = Curation.domainCap(docs, "source", "doc_id", cap = 20,
      skewThreshold = 1000L)
    val exact = Curation.domainCap(docs, "source", "doc_id", cap = 20,
      skewThreshold = Long.MaxValue)
    // identical selection — the valve is exact, not approximate
    val a = capped.select("doc_id").as[Long].collect().toSet
    val b = exact.select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(capped.filter($"source" === "mega").count() === 20)
    // the valve's thinning filter runs BEFORE the window: survivors of
    // the mega domain are a small prefix (expected 4*20 + 64 = ~144 of
    // 30000), so the single window task is bounded
    val mix = Curation.mixtureSample(docs, "source", "doc_id",
      Map("mega" -> 1.0, "tail" -> 1.0), totalN = 60L, skewThreshold = 1000L)
    val mixBare = Curation.mixtureSample(docs, "source", "doc_id",
      Map("mega" -> 1.0, "tail" -> 1.0), totalN = 60L,
      skewThreshold = Long.MaxValue)
    assert(mix.select("doc_id").as[Long].collect().toSet ===
      mixBare.select("doc_id").as[Long].collect().toSet)
    val tokb = Curation.tokenBudgetSample(docs, "source", "doc_id", "tok",
      Map("mega" -> 300L, "tail" -> 200L), skewThreshold = 1000L)
    val tokbBare = Curation.tokenBudgetSample(docs, "source", "doc_id", "tok",
      Map("mega" -> 300L, "tail" -> 200L), skewThreshold = Long.MaxValue)
    assert(tokb.select("doc_id").as[Long].collect().toSet ===
      tokbBare.select("doc_id").as[Long].collect().toSet)
    // and the plan proves the pre-window filter exists (broadcast join
    // feeding a Filter below the Window, no shuffled join anywhere)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("valve stays exact when EVERY domain crosses the threshold") {
    import graft.operators.Curation
    // the 150M-doc skew-cell regime in miniature (PERF.md r10): no
    // domain is under the threshold, so the valve pre-thins all of
    // them — selection must still be identical to the plain window
    val docs = (1 to 3).flatMap(d =>
      (1 to 5000).map(i => (d * 1000000L + i, s"d$d", 7L)))
      .toDF("doc_id", "source", "tok")
    val capped = Curation.domainCap(docs, "source", "doc_id", cap = 40,
      skewThreshold = 1000L, oversample = 4.0)
    val exact = Curation.domainCap(docs, "source", "doc_id", cap = 40,
      skewThreshold = Long.MaxValue)
    assert(capped.select("doc_id").as[Long].collect().toSet ===
      exact.select("doc_id").as[Long].collect().toSet)
    assert(capped.groupBy("source").count().as[(String, Long)]
      .collect().toMap.values.toSet === Set(40L))
    val tokb = Curation.tokenBudgetSample(docs, "source", "doc_id", "tok",
      Map("d1" -> 350L, "d2" -> 700L, "d3" -> 70L), skewThreshold = 1000L)
    val tokbBare = Curation.tokenBudgetSample(docs, "source", "doc_id", "tok",
      Map("d1" -> 350L, "d2" -> 700L, "d3" -> 70L),
      skewThreshold = Long.MaxValue)
    assert(tokb.select("doc_id").as[Long].collect().toSet ===
      tokbBare.select("doc_id").as[Long].collect().toSet)
  }

  test("c4Clean and baggingSample are shuffle-free projections") {
    import graft.operators.Curation
    import graft.learn.Learn
    val docs = (1 to 500).map(i => (i.toLong, s"line one is long enough now.\nshort $i"))
      .toDF("doc_id", "text")
    val c4 = Curation.c4Clean(docs, "text", "doc_id")
    assert(shuffles(c4) == 0,
      c4.queryExecution.executedPlan.toString.take(500))
    val bag = Learn.baggingSample(docs, "doc_id", nEstimators = 4)
    assert(shuffles(bag) == 0,
      bag.queryExecution.executedPlan.toString.take(500))
    assert(!bag.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("urlDedup: keep-decision aggregate + semi-join only, bodies never sort") {
    import graft.operators.Dedup
    val docs = (1 to 500).map(i => (i.toLong, s"http://a.com/p/${i % 100}"))
      .toDF("doc_id", "url")
    val out = Dedup.urlDedup(docs, "url", "doc_id")
    val plan = out.queryExecution.executedPlan.toString
    // same budget as exactTextDedup: the min-id aggregate (2 exchanges,
    // partial+final) and the semi-join back; no window, no global sort
    assert(shuffles(out) <= 3, plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("arithAligned: one full-outer equi-join, cells stay projections") {
    val l = GraftFrame((1 to 500).map(i => (i.toLong, i * 1.0)).toDF("k", "v"))
    val r = GraftFrame((200 to 700).map(i => (i.toLong, i * 2.0)).toDF("k", "v"))
    val out = l.addAligned(r, Seq("k"), Some(0.0)).df
    val plan = out.queryExecution.executedPlan.toString
    // the full outer align is the only data movement (SMJ = 2 side
    // exchanges); the fill/both-null cell rules must plan as projections,
    // never a second pass
    assert(shuffles(out) <= 2, plan.take(800))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert("SortMergeJoin.*FullOuter".r.findAllIn(plan).nonEmpty
      || plan.contains("FullOuter"), plan.take(800))
  }

  test("series alignment and comparisons: one key join, cells stay projections") {
    val l = GraftFrame((1 to 500).map(i => (i.toLong, i * 1.0)).toDF("k", "v"))
      .setIndex("k")
    val s = GraftFrame((200 to 700).map(i => (i.toLong, i * 2.0)).toDF("k", "s"))
    val ser = l.arithAlignedSeries(s, "sub", fillValue = Some(0.0)).df
    assert(shuffles(ser) <= 2, ser.queryExecution.executedPlan.toString.take(800))
    assert(!ser.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val cmp = l.compareAligned(GraftFrame(s.df.toDF("k", "v")),
      Seq("eq", "ne", "lt")).df
    assert(shuffles(cmp) <= 2, cmp.queryExecution.executedPlan.toString.take(800))
    // axis=1 column broadcast is a PURE projection — zero exchanges
    val bc = l.arithColumnBroadcast(Map("v" -> 2.0), "mul").df
    assert(shuffles(bc) == 0, bc.queryExecution.executedPlan.toString.take(800))
  }

  test("jaccard pair generation stays in codegen generators (no interpreted HOF fan-out)") {
    val docs = (0 until 200).map(i =>
      (i.toLong, s"alpha beta gamma delta tok$i word${i % 7} end${i % 3}"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.1)
    val plan = out.queryExecution.executedPlan.toString
    // the r9 pair path: chained Generate(posexplode) nodes + the i<j
    // position filter — the r8 transform(slice(...)) shape planned an
    // interpreted higher-order lambda per PAIR and dominated the stage
    // (PERF.md r9). (The shingle GENERATION still uses a per-row
    // transform over small word arrays — that one is fine.)
    assert("Generate posexplode".r.findAllIn(plan).size >= 2, plan.take(1200))
    assert("Filter \\(j#\\d+ > i#\\d+\\)".r.findAllIn(plan).nonEmpty,
      plan.take(1200))
  }

  test("fftLong: two group-FFT exchanges, no window, no cartesian") {
    val df = (0 until 64).map(i => (i.toLong, i * 1.0, 0.0)).toDF("pos", "re", "im")
    val out = graft.functions.Fft.fftLong(df, "pos", "re", "im", 64L)
    val plan = out.queryExecution.executedPlan.toString
    // four-step FFT = exactly the two residue-group aggregates; the
    // twiddle stage must be a projection between them (a window or an
    // extra exchange here breaks the √N-per-task argument in PERF.md)
    assert(shuffles(out) == 2, plan.take(800))
    assert(!plan.contains("WindowExec") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }

  test("resampleCalendar grid generation never plans a cartesian product") {
    val df = Seq((1L, "2024-01-01 10:00:00", 5L), (2L, "2024-02-01 10:00:00", 2L))
      .toDF("k", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val out = Sessionize.resampleCalendar(df, "k", "ts", col("v"), "day")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "resample grid must join on (key, day), not cross-join a calendar")
  }

  test("cdist broadcasts the small side and never shuffles the stream side") {
    val a = (0 until 100).map(i => (i.toLong, Array(i.toFloat, 1.0f))).toDF("aid", "avec")
    val b = (0 until 5).map(i => (i.toLong, Array(i.toFloat, 2.0f))).toDF("bid", "bvec")
    val out = graft.learn.Distance.cdist(a, b, "cityblock")
    val plan = out.queryExecution.executedPlan.toString
    assert(shuffles(out) == 0, plan.take(800))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(800))
  }

  test("dataset generators are shuffle-free range projections") {
    val blobs = graft.learn.Datasets.makeBlobs(spark, 1000,
      Seq(Seq(0.0, 0.0), Seq(4.0, 4.0)), seed = 1L)
    val reg = graft.learn.Datasets.makeRegression(spark, 1000, Seq(1.0, 2.0), seed = 1L)
    assert(shuffles(blobs) == 0, blobs.queryExecution.executedPlan.toString.take(500))
    assert(shuffles(reg) == 0, reg.queryExecution.executedPlan.toString.take(500))
    // and fully expression-based: no UDF nodes anywhere in the plan
    assert(!blobs.queryExecution.executedPlan.toString.contains("BatchEvalPython"))
  }

  test("quantileInterp: prefix-sum selection, no global data sort") {
    val df = GraftFrame((1 to 2000).map(i => ((i * 37) % 1000).toDouble).toDF("x"))
    val out = df.quantileInterp("x", 0.3).df
    val plan = out.queryExecution.executedPlan.toString
    // one value-count aggregate + one range partition of DISTINCT values
    // + tiny pid/total aggregates; the broadcast subtrees repeat the
    // shared lineage in the plan STRING (runtime reuses them), so the
    // count is bounded loosely — the real pins are: no global limit, and
    // every window runs over distinct-value/pid rows, never raw data
    assert(shuffles(out) <= 12, plan.take(800))
    assert(!plan.contains("GlobalLimit"), plan.take(400))
    assert("Window".r.findAllIn(plan).size <= 4)
  }

  test("modeDet: two hash aggregates, no sort, no window") {
    val df = GraftFrame((1 to 900).map(i => (s"g${i % 3}", (i % 7).toLong))
      .toDF("g", "v"))
    val out = df.modeDet(Seq("g"), "v").df
    val plan = out.queryExecution.executedPlan.toString
    assert(shuffles(out) <= 2, plan.take(800))
    assert(!plan.contains("Window"), plan.take(400))
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("portable MinHash banding is a zero-exchange projection until the candidate join") {
    val docs = (1 to 50).map(i => (i.toLong, s"word$i alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val banded = graft.operators.Dedup.minhashBandsPortable(docs, "text", "doc_id")
    val plan = banded.queryExecution.executedPlan.toString
    assert(shuffles(banded) == 0, plan.take(800))
    assert(!plan.contains("BatchEvalPython"))
  }

  test("dagostino: one grouped power-sum aggregate, scalar tail") {
    val df = (1 to 600).map(i => (s"g${i % 3}", (i % 50).toLong)).toDF("g", "v")
    val out = graft.learn.StatTests.dagostino(df, "v", "g")
    val plan = out.queryExecution.executedPlan.toString
    assert(shuffles(out) == 1, plan.take(800))
    assert(!plan.contains("Window"))
  }

  /** The persisted-LSH no-exchange pin, shared by the build-once and the
    * append-path tests: an Exchange whose input IS an index scan (only
    * row-preserving unary ops between) = the index itself being
    * re-shuffled — the bucket layout exists precisely to avoid that.
    * Downstream exchanges of DERIVED candidate pairs (past a join or an
    * aggregate) are legitimate small-data movements. */
  private def assertIndexExchangeFree(out: org.apache.spark.sql.DataFrame,
      prefix: String, expectedScans: Int = 2): Unit = {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    val plan = out.queryExecution.executedPlan
    def scanBehindUnary(p: SparkPlan): Seq[String] = p match {
      case f: FileSourceScanExec =>
        Seq(f.tableIdentifier.map(_.table).getOrElse(""))
      case u if u.children.size == 1 &&
          !u.getClass.getSimpleName.contains("Aggregate") =>
        scanBehindUnary(u.children.head)
      case _ => Nil
    }
    val offending = plan.collect { case e: Exchange =>
      scanBehindUnary(e.child).filter(_.startsWith(prefix))
    }.flatten
    assert(offending.isEmpty,
      s"history side shuffles: $offending\n${plan.toString.take(1200)}")
    // both bucketed tables actually feed the plan
    val scans = plan.collect { case f: FileSourceScanExec =>
      f.tableIdentifier.map(_.table).getOrElse("") }
    assert(scans.count(_.startsWith(prefix)) == expectedScans, scans.mkString(","))
  }

  private def lshDocs = (1 to 80).map(i => (i.toLong,
    (1 to 12).map(w => s"w${(i * w) % 60}").mkString(" ")))
    .toDF("doc_id", "text")

  private def withSmjStaticPlan(body: => Unit): Unit = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force sort-merge (no broadcast) and a static plan: the
      // exchange-free bucketed read must stand on its own — at real
      // scale the history side is far too big to broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      body
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("multimodal decode paths are zero-exchange narrow maps (payloads never shuffle)") {
    import graft.multimodal.Multimodal
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, null, Array[Byte](1, 2), "image",
          org.apache.spark.sql.Row(4: Integer, 4: Integer, null, null)),
        org.apache.spark.sql.Row(2L, null, Array[Byte](3), "audio",
          org.apache.spark.sql.Row(null, null, 8000: Integer, 16: Integer)),
        org.apache.spark.sql.Row(3L, null, Array[Byte](4), "video",
          org.apache.spark.sql.Row(2: Integer, 2: Integer, null, 4: Integer))
      ), 2), Multimodal.mediaSchema)
    for (out <- Seq(
        Multimodal.imageDecodeFeatures(media, grid = 2),
        Multimodal.audioDecodeFeatures(media, fftSize = 64),
        Multimodal.videoDecodeFeatures(media, everyN = 2))) {
      val plan = out.queryExecution.executedPlan.toString
      assert(shuffles(out) == 0, plan.take(600))
      assert(!plan.contains("BatchEvalPython"))
    }
  }

  test("persisted LSH index: no exchange above the history-side scans") {
    import graft.operators.Dedup
    val docs = lshDocs
    Seq("graft_px_bands", "graft_px_shingles", "graft_px_params", "graft_px_batches")
      .foreach(nm => spark.sql(s"DROP TABLE IF EXISTS $nm"))
    Dedup.minhashIndexPersist(docs.filter($"doc_id" <= 60),
      "text", "doc_id", "graft_px", buckets = 4)
    try withSmjStaticPlan {
      val out = Dedup.minhashDedupPairsAgainstIndex(
        docs.filter($"doc_id" > 60), "text", "doc_id", "graft_px")
      assertIndexExchangeFree(out, "graft_px")
      out.write.mode("overwrite").format("noop").save() // executes
      // a banding mismatch vs the persisted params fails LOUDLY
      // (ADVICE r12 — silent recall loss is undetectable downstream)
      val ex = intercept[IllegalArgumentException] {
        Dedup.minhashDedupPairsAgainstIndex(
          docs.filter($"doc_id" > 60), "text", "doc_id", "graft_px",
          bands = 8, rowsPerBand = 8)
      }
      assert(ex.getMessage.contains("banding mismatch"))
    } finally {
      Seq("graft_px_bands", "graft_px_shingles", "graft_px_params", "graft_px_batches")
        .foreach(nm => spark.sql(s"DROP TABLE IF EXISTS $nm"))
    }
  }

  test("persisted PPJoin prefix index: no exchange above the three history-side scans") {
    import graft.operators.Dedup
    val docs = lshDocs
    Dedup.dropPpjoinIndex(spark, "graft_ppx")
    Dedup.ppjoinIndexPersist(docs.filter($"doc_id" <= 60),
      "text", "doc_id", "graft_ppx", buckets = 4, n = 3, threshold = 0.8)
    try withSmjStaticPlan {
      val out = Dedup.ppjoinPairsAgainstIndex(
        docs.filter($"doc_id" > 60), "text", "doc_id", "graft_ppx")
      // df + prefix + shingle store all feed through bucketed scans
      assertIndexExchangeFree(out, "graft_ppx", expectedScans = 3)
      out.write.mode("overwrite").format("noop").save() // executes
      // querying BELOW the index's prefix-cut floor would silently lose
      // recall (the stored prefixes are too short) — must fail loudly
      val ex = intercept[IllegalArgumentException] {
        Dedup.ppjoinPairsAgainstIndex(
          docs.filter($"doc_id" > 60), "text", "doc_id", "graft_ppx",
          threshold = 0.5)
      }
      assert(ex.getMessage.contains("prefix-cut floor"))
    } finally Dedup.dropPpjoinIndex(spark, "graft_ppx")
  }

  test("PPJoin index delete: the rewrite keeps all three scans exchange-free") {
    import graft.operators.Dedup
    val docs = lshDocs
    Dedup.dropPpjoinIndex(spark, "graft_ppdx")
    Dedup.ppjoinIndexPersist(docs.filter($"doc_id" <= 60),
      "text", "doc_id", "graft_ppdx", buckets = 4, n = 3, threshold = 0.8)
    Dedup.ppjoinIndexDelete(spark, "graft_ppdx",
      docs.filter($"doc_id" <= 20).select($"doc_id"))
    try withSmjStaticPlan {
      val out = Dedup.ppjoinPairsAgainstIndex(
        docs.filter($"doc_id" > 60), "text", "doc_id", "graft_ppdx")
      // the bucketed __rw rewrite must preserve the no-exchange layout
      assertIndexExchangeFree(out, "graft_ppdx", expectedScans = 3)
      out.write.mode("overwrite").format("noop").save() // executes
    } finally Dedup.dropPpjoinIndex(spark, "graft_ppdx")
  }

  test("persisted LSH index append: insertInto keeps the bucket layout exchange-free") {
    import graft.operators.Dedup
    val docs = lshDocs
    val tbls = Seq("graft_pa_bands", "graft_pa_shingles", "graft_pa_params", "graft_pa_batches")
    tbls.foreach { nm =>
      spark.sql(s"DROP TABLE IF EXISTS $nm")
      // the in-memory catalog is fresh per JVM but the warehouse DIR
      // persists — a crashed earlier run leaves an orphan location that
      // fails the persist with LOCATION_ALREADY_EXISTS
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), nm)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala
          .toVector.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    // build from the first 40 docs, append 41..60 — the combined index
    // must behave exactly like a from-scratch build over docs <= 60
    Dedup.minhashIndexPersist(docs.filter($"doc_id" <= 40),
      "text", "doc_id", "graft_pa", buckets = 4)
    Dedup.minhashIndexAppend(
      docs.filter($"doc_id" > 40 && $"doc_id" <= 60),
      "text", "doc_id", "graft_pa")
    try withSmjStaticPlan {
      // r16 (VERDICT #3): the append clash check's phase-1 probe is an
      // id-ONLY store scan — a no-clash append must never read (let
      // alone hash) the shs_i column of the whole history (static plan:
      // an AQE root would hide the scans from collect)
      val probe = Dedup.appendIdIntersection(spark, "graft_pa",
        docs.filter($"doc_id" > 60).select($"doc_id".as("index_id")))
      val probeScans = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.tableIdentifier.exists(_.table == "graft_pa_shingles") =>
          f.requiredSchema.fieldNames.toSeq
      }
      assert(probeScans.nonEmpty && probeScans.forall(_ == Seq("index_id")),
        s"phase-1 clash probe reads more than index_id: $probeScans")
      val out = Dedup.minhashDedupPairsAgainstIndex(
        docs.filter($"doc_id" > 60), "text", "doc_id", "graft_pa")
      assertIndexExchangeFree(out, "graft_pa")
      // appended buckets really landed in the bucket layout: every
      // bands-table file name carries its bucket id, and the post-append
      // table has more than one file for the 4 buckets
      val pairs = out.select("new_id", "index_id", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fromScratch = Dedup.minhashDedupPairsAgainst(
          docs.filter($"doc_id" > 60), docs.filter($"doc_id" <= 60),
          "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == fromScratch,
        s"append diverged: only-index=${pairs -- fromScratch} only-scratch=${fromScratch -- pairs}")
      assert(pairs.nonEmpty) // the fixture plants shared-shingle docs
    } finally {
      tbls.foreach(nm => spark.sql(s"DROP TABLE IF EXISTS $nm"))
    }
  }

  private def tableFileCount(name: String): Int = {
    val loc = java.nio.file.Paths.get(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).location.toString))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(loc).iterator().asScala
      .count(_.getFileName.toString.startsWith("part-"))
  }

  test("persisted LSH index compaction: files collapse, layout stays exchange-free, results identical") {
    import graft.operators.Dedup
    val docs = lshDocs
    Dedup.dropIndex(spark, "graft_pc")
    Dedup.minhashIndexPersist(docs.filter($"doc_id" <= 40),
      "text", "doc_id", "graft_pc", buckets = 4)
    // four daily appends fragment every bucket
    (0 until 4).foreach { k =>
      Dedup.minhashIndexAppend(
        docs.filter($"doc_id" > 40 + 5 * k && $"doc_id" <= 45 + 5 * k),
        "text", "doc_id", "graft_pc")
    }
    try {
      def pairs() = Dedup.minhashDedupPairsAgainstIndex(
          docs.filter($"doc_id" > 60), "text", "doc_id", "graft_pc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fragmented = pairs()
      val filesBefore = tableFileCount("graft_pc_bands")
      Dedup.minhashIndexCompact(spark, "graft_pc")
      val filesAfter = tableFileCount("graft_pc_bands")
      // 5 write jobs → ≥5 files; compaction = exactly 1 file per bucket
      assert(filesBefore > 4 && filesAfter == 4,
        s"bands files: $filesBefore -> $filesAfter (buckets = 4)")
      // query(compacted) ≡ query(fragmented), layout still exchange-free
      withSmjStaticPlan {
        val out = Dedup.minhashDedupPairsAgainstIndex(
          docs.filter($"doc_id" > 60), "text", "doc_id", "graft_pc")
        assertIndexExchangeFree(out, "graft_pc")
      }
      assert(pairs() == fragmented && fragmented.nonEmpty)
      // the ledger survives compaction (replay-skip must keep working)
      assert(Dedup.indexBatchLedgered(spark, "graft_pc", 0L))
    } finally Dedup.dropIndex(spark, "graft_pc")
  }

  test("persisted LSH index delete: retired docs vanish, layout stays exchange-free") {
    import graft.operators.Dedup
    val docs = lshDocs
    Dedup.dropIndex(spark, "graft_pd")
    Dedup.minhashIndexPersist(docs.filter($"doc_id" <= 60),
      "text", "doc_id", "graft_pd", buckets = 4)
    try {
      Dedup.minhashIndexDelete(spark, "graft_pd",
        docs.filter($"doc_id" > 30 && $"doc_id" <= 60).select($"doc_id"))
      val out = Dedup.minhashDedupPairsAgainstIndex(
        docs.filter($"doc_id" > 60), "text", "doc_id", "graft_pd")
      withSmjStaticPlan {
        assertIndexExchangeFree(Dedup.minhashDedupPairsAgainstIndex(
          docs.filter($"doc_id" > 60), "text", "doc_id", "graft_pd"), "graft_pd")
      }
      val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fromScratch = Dedup.minhashDedupPairsAgainst(
          docs.filter($"doc_id" > 60), docs.filter($"doc_id" <= 30),
          "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == fromScratch,
        s"delete diverged: only-index=${pairs -- fromScratch} only-scratch=${fromScratch -- pairs}")
      assert(pairs.forall(_._2 <= 30), s"retired doc resurfaced: $pairs")
    } finally Dedup.dropIndex(spark, "graft_pd")
  }

  test("minhashIndexAppend replay contract: ledgered batch is a no-op, shingles never duplicate") {
    import graft.operators.Dedup
    val docs = lshDocs
    Dedup.dropIndex(spark, "graft_pi")
    Dedup.minhashIndexPersist(docs.filter($"doc_id" <= 40),
      "text", "doc_id", "graft_pi", buckets = 4)
    try {
      val batch = docs.filter($"doc_id" > 40 && $"doc_id" <= 60)
      assert(Dedup.minhashIndexAppend(batch, "text", "doc_id", "graft_pi", batchId = 7L))
      val shAfterFirst = spark.table("graft_pi_shingles").count()
      // replay of a COMPLETED batch: no-op (false), nothing re-written
      assert(!Dedup.minhashIndexAppend(batch, "text", "doc_id", "graft_pi", batchId = 7L))
      assert(spark.table("graft_pi_shingles").count() == shAfterFirst)
      // replay where the ledger row was LOST (new id, same docs): the
      // anti-join keeps the shingle store duplicate-free
      assert(Dedup.minhashIndexAppend(batch, "text", "doc_id", "graft_pi", batchId = 8L))
      assert(spark.table("graft_pi_shingles").count() == shAfterFirst)
      val sh = spark.table("graft_pi_shingles")
      assert(sh.select("index_id").distinct().count() == sh.count())
      // auto-assigned ids continue past the ledger max
      assert(Dedup.indexLedger(spark, "graft_pi") == Set(0L, 7L, 8L))
    } finally Dedup.dropIndex(spark, "graft_pi")
  }
}
