package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

import scala.util.Random

/** Differential tests for similarity search: exact brute-force ranking vs a
  * driver-side reference computation, and LSH recall vs the brute-force
  * baseline on clustered synthetic embeddings.
  */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  private def randVec(r: Random, dim: Int): Seq[Float] =
    Seq.fill(dim)(r.nextGaussian().toFloat)

  test("vector functions match driver-side math") {
    val a = Seq(1f, 2f, 3f)
    val b = Seq(-1f, 0.5f, 2f)
    val df = Seq((a, b)).toDF("a", "b")
    val (dot, cos, euc) = df.select(
        VectorFunctions.dotD(col("a"), col("b")),
        VectorFunctions.cosine(col("a"), col("b")),
        VectorFunctions.euclidean(col("a"), col("b")))
      .as[(Double, Double, Double)].collect().head
    assert(math.abs(dot - 6.0) < 1e-12)
    assert(math.abs(cos - cosine(a, b)) < 1e-12)
    val expEuc = math.sqrt(a.zip(b).map { case (x, y) => math.pow(x - y, 2) }.sum)
    assert(math.abs(euc - expEuc) < 1e-12)
  }

  test("bruteForceTopK returns the exact cosine ranking") {
    val r = new Random(3)
    val dim = 16
    val corpus = (0 until 40).map(i => (i.toLong, randVec(r, dim)))
    val corpusDf = corpus.toDF("cid", "cvec")
    val queries = corpus.take(3).map { case (id, v) => (id, v) }
      .toDF("qid", "qvec")
    val got = Similarity.bruteForceTopK(queries, corpusDf, k = 5)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // reference ranking computed on the driver with the same rounding +
    // tie-break rule (round(cos,4) desc, cid asc)
    val expected = corpus.take(3).map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (cid, cv) =>
          (cid, BigDecimal(cosine(qv, cv)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(5).map(_._1).toSeq
    }.toMap
    assert(got == expected)
  }

  test("nearDupPairsLsh finds the exact near-dup pairs on clustered vectors") {
    val r = new Random(21)
    val dim = 32
    // 40 base vectors + near-identical copies (tiny noise): the dup pairs
    // are the ground truth; unrelated pairs sit far below the threshold
    val bases = (0 until 40).map(i => (i.toLong, randVec(r, dim).map(_ * 5f)))
    val dups = bases.map { case (id, v) =>
      (id + 1000L, v.zip(randVec(r, dim)).map { case (x, n) => x + 0.001f * n })
    }
    val corpus = (bases ++ dups).toDF("cid", "cvec")
    val lsh = Similarity.nearDupPairsLsh(corpus, dim, threshold = 0.999, nBits = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.nearDupPairsExact(corpus, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == bases.map { case (id, _) => (id, id + 1000L) }.toSet)
    assert(lsh == exact)
  }

  test("ivfTopK achieves high recall on clustered embeddings") {
    val r = new Random(17)
    val dim = 32
    val centers = (0 until 8).map(_ => randVec(r, dim).map(_ * 10f))
    val members = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 25
    } yield ((ci * 25 + j).toLong,
      c.zip(randVec(r, dim)).map { case (x, n) => x + 0.1f * n })
    val corpus = members.toDF("cid", "cvec")
    val queries = members.filter(_._1 % 25 == 0).map { case (id, v) => (id, v) }
      .toDF("qid", "qvec")
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, corpus, k = 5, nlist = 8, nprobe = 2)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall below 0.9")
  }

  test("kneighborsGraph: exact matches brute; IVF path finds every twin at rank 1") {
    val r = new Random(23)
    val dim = 32
    // 40 base vectors + identical twins under +100 ids
    val base = (0 until 40).map(i => (i.toLong, randVec(r, dim)))
    val twins = base.map { case (id, v) => (id + 100L, v) }
    val corpus = (base ++ twins).toDF("cid", "cvec")
    // exact graph ≡ bruteForceTopK reshaped, weight = 1 − sim
    val g = Similarity.kneighborsGraph(corpus, k = 3, mode = "distance",
      exact = true)
    val top1 = g.filter(col("rank") === 1)
      .select(col("row"), col("col"), col("weight"))
      .as[(Long, Long, Double)].collect()
    top1.foreach { case (row, c, w) =>
      val twin = if (row < 100L) row + 100L else row - 100L
      assert(c == twin, s"row $row: expected twin $twin, got $c")
      assert(w == 0.0, s"twin distance must be 0, got $w")
    }
    // IVF scale path: identical twins share the nearest cell, so every
    // rank-1 neighbor is still the twin (corpus never broadcasts)
    val ivf = Similarity.kneighborsGraph(corpus, k = 1, mode = "connectivity",
      exact = false, nlist = 8, nprobe = 2)
      .select(col("row"), col("col")).as[(Long, Long)].collect().toMap
    (0 until 40).foreach { i =>
      assert(ivf(i.toLong) == i + 100L, s"ivf twin of $i: ${ivf(i.toLong)}")
      assert(ivf(i + 100L) == i.toLong, s"ivf twin of ${i + 100}")
    }
    // connectivity weights are 1.0; bad mode raises loudly
    intercept[IllegalArgumentException] {
      Similarity.kneighborsGraph(corpus, k = 1, mode = "euclidean")
    }
  }

  test("ivfFit builds once and ivfProbe reuses the index across query batches") {
    val r = new Random(29)
    val dim = 16
    val centers = (0 until 4).map(_ => randVec(r, dim).map(_ * 10f))
    val members = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 30
    } yield ((ci * 30 + j).toLong,
      c.zip(randVec(r, dim)).map { case (x, n) => x + 0.1f * n })
    val corpus = members.toDF("cid", "cvec")
    val index = Similarity.ivfFit(corpus, nlist = 4, seed = 42L)
    assert(index.centroids.count() == 4)
    val q1 = members.take(3).toDF("qid", "qvec")
    val q2 = members.slice(30, 33).toDF("qid", "qvec")
    // two probes against ONE fitted index (no refit — the r2 ivfTopK refit
    // the corpus per call); results are deterministic and repeatable
    val a1 = Similarity.ivfProbe(index, q1, k = 3, nprobe = 2)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    val a2 = Similarity.ivfProbe(index, q2, k = 3, nprobe = 2)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    val a1again = Similarity.ivfProbe(index, q1, k = 3, nprobe = 2)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a1 == a1again)
    assert(a1.nonEmpty && a2.nonEmpty && (a1.map(_._1) & a2.map(_._1)).isEmpty)
  }

  test("pqProbe: an identical twin is always the ADC top-1") {
    // twin codes are the per-subspace argmin, so the twin's ADC distance is
    // globally minimal (see pqProbe doc) — deterministic, not probabilistic
    val r = new Random(3)
    val dim = 16
    val base = (0 until 40).map(i => (i.toLong, randVec(r, dim).map(_ * 5f)))
    val corpus = (base ++ base.take(5).map { case (id, v) => (id + 1000, v) })
      .toDF("cid", "cvec")
    val queries = base.take(5).map { case (id, v) => (id, v) }.toDF("qid", "qvec")
    val index = Similarity.pqFit(corpus, dim = dim, m = 4, kCodes = 8)
    val top1 = Similarity.pqProbe(index, queries, k = 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    (0 until 5).foreach { i =>
      assert(top1(i.toLong) === i.toLong + 1000,
        s"twin of $i must be ADC top-1, got ${top1(i.toLong)}")
    }
  }

  test("pqProbe recall vs brute force on clustered embeddings") {
    val r = new Random(17)
    val dim = 32
    val centers = (0 until 8).map(_ => randVec(r, dim).map(_ * 10f))
    val members = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 15
    } yield ((ci * 15 + j).toLong,
      c.zip(randVec(r, dim)).map { case (x, n) => x + 0.1f * n })
    val corpus = members.toDF("cid", "cvec")
    val queries = members.filter(_._1 % 15 == 0).toDF("qid", "qvec")
    val index = Similarity.pqFit(corpus, dim = dim, m = 8, kCodes = 16)
    // ADC top-5 must stay within the query's own cluster: quantization
    // error is far below the inter-cluster separation
    val got = Similarity.pqProbe(index, queries, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
    got.foreach { case (q, c) =>
      assert(q / 15 === c / 15, s"PQ neighbor $c of query $q left the cluster")
    }
    // encoded corpus is m small ints per vector — the compression claim
    val codes = index.encoded.select("codes").as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
  }

  test("lshTopK achieves high recall on clustered embeddings") {
    // 10 well-separated cluster centers, 20 members each with small noise —
    // the realistic near-dup regime LSH bucketing is designed for.
    val r = new Random(11)
    val dim = 32
    val centers = (0 until 10).map(_ => randVec(r, dim).map(_ * 10f))
    val members = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 20
    } yield ((ci * 20 + j).toLong,
      c.zip(randVec(r, dim)).map { case (x, n) => x + 0.1f * n })
    val corpus = members.toDF("cid", "cvec")
    val queries = members.filter(_._1 % 20 == 0).map { case (id, v) => (id, v) }
      .toDF("qid", "qvec")
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, corpus, dim = dim, k = 5, nBits = 8)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // same-cluster vectors share hyperplane signs with overwhelming
    // probability at this separation; deterministic seed => stable value
    assert(recall >= 0.9, s"LSH recall $recall below 0.9")
  }

  test("semanticDedup keeps one representative per planted twin pair") {
    val r = new Random(11)
    val dim = 16
    val base = (0L until 30L).map(i => (i, randVec(r, dim)))
    // twins: identical vectors under shifted ids — must always share a
    // cell (identical cosine to every pivot) and collapse to one kept doc
    val corpus = (base ++ base.map { case (i, v) => (i + 100L, v) })
      .toDF("cid", "cvec")
    val out = Similarity.semanticDedup(corpus, k = 4, tau = 0.999)
      .select("cid", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 60)
    val byId = out.map(t => t._1 -> t).toMap
    base.foreach { case (i, _) =>
      val (low, high) = (byId(i), byId(i + 100L))
      assert(low._2 == high._2, s"twins $i/${i + 100} split cells")
      assert(low._3, s"lower twin $i must be kept")
      assert(!high._3, s"higher twin ${i + 100} must be dropped")
    }
  }

  test("semanticDedup at tau=1.0+noise keeps everything distinct") {
    val r = new Random(12)
    val corpus = (0L until 25L).map(i => (i, randVec(r, 16))).toDF("cid", "cvec")
    val out = Similarity.semanticDedup(corpus, k = 3, tau = 0.999)
    // random gaussian vectors are nowhere near cosine 0.999 of each other
    assert(out.filter(!col("keep")).count() == 0)
    assert(out.select("cluster").distinct().count() <= 3)
  }

  test("semanticDecontaminate flags exactly the benchmark neighborhood") {
    val r = new Random(7)
    val vecs = (0L until 40L).map(i => (i, randVec(r, 16)))
    val corpus = vecs.toDF("cid", "cvec")
    // benchmark = copies of vectors 0..9 (cosine exactly 1.0 to them)
    val bench = vecs.take(10).map(_._2).toDF("bvec")
    val out = Similarity.semanticDecontaminate(corpus, bench, 0.999)
      .select("cid", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out.size == 40)
    (0L until 40L).foreach { i =>
      assert(out(i) == (i < 10L), s"vector $i flagged=${out(i)}")
    }
    // scale shape: bench broadcasts, corpus never self-joins or shuffles
    // beyond the (cid, partial-max) aggregate
    val plan = Similarity.semanticDecontaminate(corpus, bench, 0.999)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }
}
