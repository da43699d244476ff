package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.api.GraftFrame
import graft.operators.{Dedup, Windows}

/** Property-based differential tests: operators compared against
  * Scala-collections reference implementations on randomized small frames —
  * the reference's randomized-input execution-test pattern
  * (mars/dataframe/merge/tests/test_merge_execution.py:60-66) with
  * ScalaCheck doing the case generation.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  /** Deterministic forAll: 8 sampled cases per property from fixed seeds
    * (scalatestplus isn't in the offline cache, so generators are driven
    * directly). */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to 8).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 8).foreach { i =>
      body(
        g1.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)),
        g2.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong + 100)))
    }

  private val rowGen: Gen[(Long, Long, Double)] = for {
    k <- Gen.choose(0L, 4L)
    o <- Gen.choose(0L, 50L)
    v <- Gen.choose(-100, 100).map(_.toDouble)
  } yield (k, o, v)

  private val frameGen: Gen[List[(Long, Long, Double)]] =
    Gen.nonEmptyListOf(rowGen)

  test("groupby sum/count/min/max match Scala groupBy") {
    forAll(frameGen) { rows =>
      val df = rows.toDF("k", "o", "v")
      val got = GraftFrame(df).groupby("k")
        .agg(("s", "sum", "v"), ("c", "count", "v"), ("mn", "min", "v"), ("mx", "max", "v"))
        .df.as[(Long, Double, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2 * 1e6).round / 1e6, r._3, r._4, r._5)).toMap
      val exp = rows.groupBy(_._1).map { case (k, g) =>
        val vs = g.map(_._3)
        k -> (((vs.sum * 1e6).round / 1e6), g.size.toLong, vs.min, vs.max)
      }
      assert(got == exp)
    }
  }

  test("merge inner equals Scala join on key") {
    forAll(frameGen, frameGen) { (l, r) =>
      val lDf = l.map(t => (t._1, t._3)).toDF("k", "lv")
      val rDf = r.map(t => (t._1, t._3)).toDF("k", "rv")
      val got = GraftFrame(lDf).merge(GraftFrame(rDf), on = Seq("k"))
        .df.as[(Long, Double, Double)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val exp = (for {
        (lk, lv) <- l.map(t => (t._1, t._3))
        (rk, rv) <- r.map(t => (t._1, t._3)) if lk == rk
      } yield (lk, lv, rv)).groupBy(identity).view.mapValues(_.size).toMap
      assert(got == exp)
    }
  }

  test("dropDuplicates keep-first matches Scala minBy per key") {
    forAll(frameGen) { rows =>
      val df = rows.toDF("k", "o", "v")
      val got = Dedup.dropDuplicates(df, Seq("k"), "o")
        .select("k", "o").as[(Long, Long)].collect().toSet
      // keep rows whose order equals the per-key minimum (all of them on ties,
      // matching the semi-join semantics)
      val minPerKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val exp = rows.filter(t => t._2 == minPerKey(t._1)).map(t => (t._1, t._2)).toSet
      assert(got == exp)
    }
  }

  test("cumsum over a window matches Scala scanLeft") {
    forAll(frameGen) { rows =>
      // make (k, o) a total order by deduping
      val uniq = rows.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      val df = uniq.toDF("k", "o", "v")
      val got = df.select($"k", $"o",
          Windows.cumsum($"v", Windows.spec(Seq("k"), Seq("o"))).as("cs"))
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3 * 1e6).round / 1e6)).toMap
      val exp = uniq.groupBy(_._1).flatMap { case (k, g) =>
        val sorted = g.sortBy(_._2)
        sorted.zip(sorted.scanLeft(0.0)(_ + _._3).tail)
          .map { case (t, cs) => (k, t._2) -> ((cs * 1e6).round / 1e6) }
      }
      assert(got == exp)
    }
  }

  test("merge full_outer covers exactly the key union") {
    forAll(frameGen, frameGen) { (l, r) =>
      val lDf = l.map(t => (t._1, t._3)).toDF("k", "lv").dropDuplicates("k")
      val rDf = r.map(t => (t._1, t._3)).toDF("k", "rv").dropDuplicates("k")
      val keys = GraftFrame(lDf).merge(GraftFrame(rDf), on = Seq("k"), how = "full_outer")
        .df.select("k").as[Long].collect().toSet
      assert(keys == (l.map(_._1) ++ r.map(_._1)).toSet)
    }
  }

  test("fillna replaces exactly the nulls") {
    forAll(frameGen) { rows =>
      val df = rows.map(t => (t._1, if (t._3 < 0) None else Some(t._3)))
        .toDF("k", "v")
      val filled = GraftFrame(df).fillna(Map("v" -> -999.0))
        .df.as[(Long, Double)].collect().toSeq.sorted
      val exp = rows.map(t => (t._1, if (t._3 < 0) -999.0 else t._3)).sorted
      assert(filled == exp)
    }
  }

  test("shift matches Scala sliding over sorted groups") {
    forAll(frameGen) { rows =>
      val uniq = rows.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      val df = uniq.toDF("k", "o", "v")
      val got = df.select($"k", $"o",
          Windows.shift($"v", 1, Windows.spec(Seq("k"), Seq("o"))).as("prev"))
        .as[(Long, Long, Option[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val exp = uniq.groupBy(_._1).flatMap { case (k, g) =>
        val sorted = g.sortBy(_._2)
        sorted.zip(None +: sorted.map(t => Some(t._3)).init)
          .map { case (t, prev) => (k, t._2) -> prev }
      }
      assert(got == exp)
    }
  }

  test("groupby ffill matches Scala scan of last non-null") {
    forAll(frameGen) { rows =>
      val uniq = rows.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      val df = uniq.map(t => (t._1, t._2, if (t._3 < 0) None else Some(t._3)))
        .toDF("k", "o", "v")
      val got = GraftFrame(df).ffill(Seq("k"), Seq("o"), Seq("v"))
        .df.as[(Long, Long, Option[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val exp = uniq.groupBy(_._1).flatMap { case (k, g) =>
        val sorted = g.sortBy(_._2)
        var last: Option[Double] = None
        sorted.map { t =>
          if (t._3 >= 0) last = Some(t._3)
          (k, t._2) -> last
        }
      }
      assert(got == exp)
    }
  }

  test("PortableHash buckets are uniform for arbitrary arithmetic stripes") {
    import graft.functions.PortableHash
    // any fixed stride (the killer input class for the r2 residue bucket)
    // must land ~uniformly across 100 buckets
    forAll(org.scalacheck.Gen.choose(1L, 1000L)) { stride =>
      val keys = (0L until 2000L).map(_ * stride)
      val buckets = keys.toDF("k")
        .select(PortableHash.bucket(col("k"), 100).as("b"))
        .groupBy("b").count().collect().map(_.getLong(1))
      // 2000 keys over 100 buckets → mean 20; no bucket should hog > 3×
      assert(buckets.max <= 60, s"stride $stride skewed: max bucket ${buckets.max}")
      assert(buckets.length >= 80, s"stride $stride hit only ${buckets.length} buckets")
    }
    // determinism + range
    val h = (0L to 100L).toDF("k")
      .select(PortableHash.hash32(col("k")).as("h")).as[Long].collect()
    assert(h.forall(v => v >= 0L && v < 4294967296L))
    val h2 = (0L to 100L).toDF("k")
      .select(PortableHash.hash32(col("k")).as("h")).as[Long].collect()
    assert(h.toSeq == h2.toSeq)
  }

  test("melt then pivot-first restores the original values") {
    forAll(frameGen) { rows =>
      val uniq = rows.groupBy(_._2).map(_._2.head).toList // unique ids
      val df = uniq.map(t => (t._2, t._3, t._3 * 2)).toDF("id", "a", "b")
      val melted = GraftFrame(df).melt(Seq("id"), Seq("a", "b"), "var", "val")
      val restored = melted.df.groupBy("id").pivot("var", Seq("a", "b"))
        .agg(first("val"))
        .as[(Long, Double, Double)].collect().toSet
      assert(restored == uniq.map(t => (t._2, t._3, t._3 * 2)).toSet)
    }
  }

  test("graft_collect_capped equals collect_list for under-cap groups, NULL above") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 500L)))
    forAll(gen) { rows =>
      val df = rows.toDF("k", "id").repartition(5)
      val cap = 7
      val capped = df.groupBy($"k")
        .agg(call_function("graft_collect_capped", $"id", lit(cap)).as("ids"))
        .collect().map(r => r.getLong(0) ->
          Option(r.getSeq[Long](1)).map(_.sorted)).toMap
      val expected = rows.groupBy(_._1).map { case (k, vs) =>
        k -> (if (vs.size > cap) None else Some(vs.map(_._2).sorted))
      }
      assert(capped == expected,
        "capped collect must equal the full list below the cap and NULL above")
    }
  }

  test("property: interpolateLinear preserves non-nulls and brackets fills") {
    val gen = for {
      rows <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 2L)
        v <- Gen.option(Gen.choose(-50, 50).map(_.toDouble))
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
    forAll(gen) { rows =>
      val df = rows.toDF("k", "o", "v")
      val got = Windows.interpolateLinear(df, Seq("k"), Seq("o"), "v", "i")
        .select("k", "o", "v", "i")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      got.foreach { case (k, o, v, i) =>
        v.foreach(x => assert(i.contains(x), "non-null inputs must pass through"))
        if (v.isEmpty && i.isDefined) {
          // a filled value must lie within the span of the key's non-nulls
          val vals = rows.filter(_._1 == k).flatMap(_._3)
          assert(i.get >= vals.min - 1e-9 && i.get <= vals.max + 1e-9,
            s"fill $i out of range [${vals.min}, ${vals.max}] at ($k, $o)")
        }
      }
      // leading nulls stay null per key
      rows.groupBy(_._1).foreach { case (k, ks) =>
        val sorted = ks.sortBy(_._2)
        val firstValid = sorted.indexWhere(_._3.isDefined)
        sorted.take(math.max(firstValid, 0)).foreach { case (_, o, _) =>
          val out = got.find(r => r._1 == k && r._2 == o).get
          assert(out._4.isEmpty, s"leading null at ($k, $o) must stay null")
        }
      }
    }
  }

  test("property: chunkWords chunks reconstruct the document") {
    val gen = for {
      n <- Gen.choose(1, 60)
    } yield (1 to n).map(i => s"t$i").toList
    forAll(gen) { words =>
      val chunkSize = 10; val overlap = 3; val stride = chunkSize - overlap
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.operators.Curation
        .chunkWords(df, "text", "doc_id", chunkSize, overlap)
        .orderBy("chunk_idx")
        .select("chunk_idx", "chunk").as[(Long, String)].collect()
      // dropping the first `overlap` words of every chunk after the first
      // reconstructs the document exactly
      val rebuilt = chunks.zipWithIndex.flatMap { case ((_, c), i) =>
        val ws = c.split(" ").toSeq
        if (i == 0) ws else ws.drop(overlap)
      }
      // trailing chunk may re-cover words when len < last start + chunkSize;
      // reconstruction therefore compares as a set AND a prefix property
      assert(rebuilt.toSet == words.toSet, "chunks must cover every word")
      assert(rebuilt.take(words.length).toSeq == words.toSeq,
        s"chunk order must preserve the document for n=${words.length}")
      // every chunk except possibly the last has exactly chunkSize tokens
      chunks.dropRight(1).foreach { case (_, c) =>
        assert(c.split(" ").length == chunkSize)
      }
    }
  }

  test("transpose is an involution on distinct-id frames") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 30L))) { ids0 =>
      val ids = ids0.distinct
      val df = ids.map(i => (s"r$i", i * 1.5, i * i.toDouble)).toDF("k", "x", "y")
      val once = GraftFrame(df).transpose("k")
      val twice = once.transpose("column").df
      // transposing twice restores the original cells (column order = sorted ids)
      val back = twice.orderBy("column").collect()
        .map(r => r.getString(0) -> r).toMap
      ids.foreach { i =>
        assert(back(s"r$i").getAs[Double]("x") == i * 1.5)
        assert(back(s"r$i").getAs[Double]("y") == i * i.toDouble)
      }
    }
  }

  test("quantileTransform: uniform output is rank-monotone with midrank ties") {
    forAll(frameGen) { rows =>
      val df = rows.toDF("k", "o", "v")
      val got = GraftFrame(df).quantileTransform("v", "u").df
        .select("v", "u").as[(Double, Double)].collect()
      val n = rows.length.toDouble
      val byV = rows.map(_._3)
      got.foreach { case (v, u) =>
        val below = byV.count(_ < v)
        val eq = byV.count(_ == v)
        assert(u == (below + eq / 2.0) / n, s"midrank mismatch at $v")
        assert(u > 0.0 && u < 1.0)
      }
      // equal values share u; larger values get strictly larger u
      val m = got.toMap
      byV.distinct.sorted.sliding(2).foreach {
        case Seq(a, b) => assert(m(a) < m(b))
        case _ =>
      }
    }
  }

  test("ilocPositional matches Scala indexing incl. negatives") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 200L))) { xs0 =>
      val xs = xs0.distinct.sorted
      val df = xs.map(Tuple1(_)).toDF("x")
      val picks = Seq(0L, xs.length / 2L, -1L).distinct
      val got = GraftFrame(df).sortValues(Seq("x")).ilocPositional(picks)
        .df.as[Long].collect().sorted.toSeq
      val want = picks.map(p => if (p >= 0) xs(p.toInt) else xs(xs.length + p.toInt))
        .distinct.sorted
      assert(got == want)
    }
  }

  test("property: prfSupport and multilabelConfusion match a collections reference") {
    import graft.learn.Learn
    val pairGen = Gen.listOfN(60,
      Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.oneOf("a", "b", "c")))
    forAll(pairGen) { pairs =>
      val df = pairs.toDF("yt", "yp")
      val classes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
      val n = pairs.length.toLong
      val got = Learn.prfSupport(df, "yt", "yp").orderBy($"cls").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
      val want = classes.map { c =>
        val tp = pairs.count(p => p._1 == c && p._2 == c).toLong
        val sup = pairs.count(_._1 == c).toLong
        val np = pairs.count(_._2 == c).toLong
        (c, sup,
          if (np > 0) tp.toDouble / np else 0.0,
          if (sup > 0) tp.toDouble / sup else 0.0)
      }
      assert(got == want)
      val cm = Learn.multilabelConfusion(df, "yt", "yp").orderBy($"cls")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val wantCm = classes.map { c =>
        val tp = pairs.count(p => p._1 == c && p._2 == c).toLong
        val fn = pairs.count(_._1 == c).toLong - tp
        val fp = pairs.count(_._2 == c).toLong - tp
        (c, n - tp - fn - fp, fp, fn, tp)
      }
      assert(cm == wantCm)
    }
  }

  test("property: array base ops match Scala-collection semantics incl. edges") {
    import graft.functions.VectorFunctions
    val arrGen = Gen.listOf(Gen.chooseNum(-50.0, 50.0))
    val kGen = Gen.chooseNum(0, 12)
    forAll(arrGen, kGen) { (xs, k) =>
      val df = Seq(Tuple1(xs)).toDF("a")
      val got = df.select(
        VectorFunctions.roll($"a", k).as("roll"),
        VectorFunctions.flip($"a").as("flip"),
        VectorFunctions.tile($"a", 2).as("tile"),
        VectorFunctions.repeatElems($"a", 3).as("rep"),
        VectorFunctions.ediff1d($"a").as("diff")).collect()(0)
      val n = xs.length
      val rollWant =
        if (n == 0) Nil
        else { val s = ((k % n) + n) % n; xs.takeRight(s) ++ xs.dropRight(s) }
      assert(got.getSeq[Double](0).toList == rollWant)
      assert(got.getSeq[Double](1).toList == xs.reverse)
      assert(got.getSeq[Double](2).toList == xs ++ xs)
      assert(got.getSeq[Double](3).toList == xs.flatMap(x => List(x, x, x)))
      assert(got.getSeq[Double](4).toList ==
        (if (n < 2) Nil else xs.sliding(2).map(p => p(1) - p(0)).toList))
    }
    // searchsorted: insertion points on a sorted array, both sides
    val sorted = Seq(Tuple1(Seq(1.0, 2.0, 2.0, 5.0))).toDF("a")
    val r = sorted.select(
      VectorFunctions.searchSorted($"a", lit(2.0)).as("right"),
      VectorFunctions.searchSorted($"a", lit(2.0), left = true).as("left"),
      VectorFunctions.searchSorted($"a", lit(0.0)).as("lo"),
      VectorFunctions.searchSorted($"a", lit(9.0)).as("hi")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 1L, 0L, 4L)))
  }

  test("property: array_split covers every element with numpy's uneven rule") {
    import graft.functions.VectorFunctions
    val nGen = Gen.chooseNum(0, 40)
    val kGen = Gen.chooseNum(1, 7)
    forAll(nGen, kGen) { (n, k) =>
      val xs = (1 to n).map(_.toDouble)
      val got = Seq(Tuple1(xs)).toDF("a")
        .select(VectorFunctions.arraySplit($"a", k).as("p"))
        .collect()(0).getSeq[scala.collection.Seq[Double]](0)
      assert(got.length == k)
      assert(got.flatten.toList == xs.toList, "concatenation restores the row")
      val base = n / k; val rem = n % k
      got.zipWithIndex.foreach { case (part, i) =>
        assert(part.length == (if (i < rem) base + 1 else base),
          s"part $i of n=$n k=$k")
      }
    }
  }

  test("insertAt/deleteAt/argsortRow: numpy edge conventions") {
    import graft.functions.VectorFunctions._
    val df = Seq(Tuple1(Seq(30.0, 10.0, 20.0, 10.0))).toDF("a")
    val got = df.select(
      insertAt($"a", 1, lit(99.0)).as("ins"),
      insertAt($"a", -1, lit(99.0)).as("insNeg"),
      insertAt($"a", 100, lit(99.0)).as("insClamp"),
      deleteAt($"a", -1).as("delNeg"),
      argsortRow($"a").as("srt")).collect()(0)
    assert(got.getSeq[Double](0).toList == List(30.0, 99.0, 10.0, 20.0, 10.0))
    assert(got.getSeq[Double](1).toList == List(30.0, 10.0, 20.0, 99.0, 10.0),
      "numpy insert at -1 puts the value before the last element")
    assert(got.getSeq[Double](2).toList == List(30.0, 10.0, 20.0, 10.0, 99.0),
      "past-the-end positions clamp to append")
    assert(got.getSeq[Double](3).toList == List(30.0, 10.0, 20.0))
    assert(got.getSeq[Long](4).toList == List(1L, 3L, 2L, 0L),
      "stable: the tied 10.0s keep original order (index 1 before 3)")
    intercept[Exception] {
      df.select(deleteAt($"a", 7)).collect()
    }
    // empty row: argsort of [] is []
    val empty = Seq(Tuple1(Seq.empty[Double])).toDF("a")
    assert(empty.select(argsortRow($"a")).collect()(0).getSeq[Long](0).isEmpty)
  }

  test("tensor indexing ops: take/compress/extract/flatnonzero/clip/where") {
    import graft.functions.VectorFunctions._
    val df = Seq(Tuple1(Seq(3.0, -1.0, 0.0, 7.0, -5.0))).toDF("a")
    val cond = transform($"a", x => x > 0.0)
    val got = df.select(
      take($"a", Seq(0, 3, -1, -5)).as("tk"),
      compress($"a", Seq(true, false, true)).as("cm"),
      compress($"a", Seq(false, false)).as("cm0"),
      extract(cond, $"a").as("ex"),
      flatnonzero($"a").as("nz"),
      clipArray($"a", -2.0, 2.0).as("cl"),
      whereArray(cond, $"a", clipArray($"a", 0.0, 0.0)).as("wh")).collect()(0)
    assert(got.getSeq[Double](0).toList == List(3.0, 7.0, -5.0, 3.0),
      "take with positive, negative, and from-the-end indices")
    assert(got.getSeq[Double](1).toList == List(3.0, 0.0),
      "compress keeps masked positions; short mask drops the tail")
    assert(got.getSeq[Double](2).toList == Nil, "all-false mask is empty")
    assert(got.getSeq[Double](3).toList == List(3.0, 7.0))
    assert(got.getSeq[Long](4).toList == List(0L, 1L, 3L, 4L),
      "flatnonzero skips the exact zero")
    assert(got.getSeq[Double](5).toList == List(2.0, -1.0, 0.0, 2.0, -2.0))
    assert(got.getSeq[Double](6).toList == List(3.0, 0.0, 0.0, 7.0, 0.0),
      "where(cond, a, 0) zeroes the non-positive slots")
    // length-mismatch contracts fail loudly instead of null-padding
    val bad = Seq((Seq(1.0, 2.0), Seq(true))).toDF("a", "c")
    intercept[Exception] {
      bad.select(extract($"c", $"a")).collect()
    }
  }

  test("tensor indexing part 2: choose/unravelIndex/cooFillDiagonal") {
    import graft.functions.VectorFunctions._
    import graft.learn.Learn
    val df = Seq(Tuple1(Seq(0L, 2L, 1L))).toDF("sel")
    // choices A=[10,20,30], B=[40,50,60], C=[70,80,90]:
    // out[k] = choices[sel[k]][k] -> [A[0], C[1], B[2]] = [10, 80, 60]
    val abc = Seq(Seq(10.0, 20.0, 30.0), Seq(40.0, 50.0, 60.0),
      Seq(70.0, 80.0, 90.0)).map(s => array(s.map(lit): _*))
    assert(df.select(choose($"sel", abc)).collect()(0)
      .getSeq[Double](0).toList == List(10.0, 80.0, 60.0))
    intercept[Exception] {
      Seq(Tuple1(Seq(3L))).toDF("sel")
        .select(choose($"sel", abc)).collect() // selector out of range
    }
    // numpy.unravel_index(17, (2,3,4)) == (1, 1, 1); 23 -> (1, 2, 3)
    val flat = Seq(17L, 23L, 0L).toDF("f")
    assert(flat.select(unravelIndex($"f", Seq(2L, 3L, 4L))).collect()
      .map(_.getSeq[Long](0).toList).toList ==
      List(List(1L, 1L, 1L), List(1L, 2L, 3L), List(0L, 0L, 0L)))
    intercept[Exception] {
      Seq(Tuple1(24L)).toDF("f")
        .select(unravelIndex($"f", Seq(2L, 3L, 4L))).collect()
    }
    // fill_diagonal: [1,1] present (overwritten), [0,0]/[2,2] absent
    // (inserted); off-diagonal untouched
    val m = Seq((1L, 1L, 5.0), (0L, 2L, 9.0)).toDF("i", "j", "v")
    val filled = Learn.cooFillDiagonal(m, n = 3L, value = 7.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(filled === Map((1L, 1L) -> 7.0, (0L, 2L) -> 9.0,
      (0L, 0L) -> 7.0, (2L, 2L) -> 7.0))
  }

  test("frexp/ldexp roundtrip; argtopk/topk order; nancum identities") {
    import graft.functions.{Ufuncs, VectorFunctions}
    // numpy: frexp(8.0) == (0.5, 4) — the exact-power-of-two boundary
    // the log2-ulp correction exists for; frexp(0.7) == (0.7, 0);
    // frexp(-3.0) == (-0.75, 2); frexp(0.0) == (0.0, 0)
    val f = Seq(8.0, 0.7, -3.0, 0.0, 1e-300, 6.25e17).toDF("x")
      .select($"x", Ufuncs("frexp_mant")($"x").as("m"),
        Ufuncs("frexp_exp")($"x").as("e"))
    val rows = f.collect().map(r => r.getDouble(0) ->
      (r.getDouble(1), r.getLong(2))).toMap
    assert(rows(8.0) === ((0.5, 4L)))
    assert(rows(0.7) === ((0.7, 0L)))
    assert(rows(-3.0) === ((-0.75, 2L)))
    assert(rows(0.0) === ((0.0, 0L)))
    // mantissa range contract + exact roundtrip on every input
    f.filter($"x" =!= 0.0).collect().foreach { r =>
      assert(math.abs(r.getDouble(1)) >= 0.5 && math.abs(r.getDouble(1)) < 1.0)
    }
    assert(f.select(Ufuncs("ldexp", $"m", $"e") === $"x")
      .collect().forall(_.getBoolean(0)))
    // argtopk: descending values, ascending-index ties
    val at = Seq(Tuple1(Seq(3.0, 9.0, 1.0, 9.0, 5.0))).toDF("a")
      .select(VectorFunctions.argtopkRow($"a", 3).as("i"),
        VectorFunctions.topkRow($"a", 3).as("v")).collect()(0)
    assert(at.getSeq[Long](0).toList == List(1L, 3L, 4L))
    assert(at.getSeq[Double](1).toList == List(9.0, 9.0, 5.0))
    // nancumsum/nancumprod: numpy([1, nan, 2]) -> sums [1,1,3],
    // products [1,1,2]
    import graft.operators.Windows
    val w = Windows.spec(Seq("g"), Seq("k"))
    val nc = Seq((1L, 1L, 1.0), (1L, 2L, Double.NaN), (1L, 3L, 2.0))
      .toDF("g", "k", "x")
      .select($"k", Windows.nancumsum($"x", w).as("s"),
        Windows.nancumprod($"x", w).as("p"))
      .orderBy($"k").collect()
    assert(nc.map(_.getDouble(1)).toList == List(1.0, 1.0, 3.0))
    assert(nc.map(_.getDouble(2)).toList == List(1.0, 1.0, 2.0))
  }

  test("spacing/nextafter match java.lang.Math bit-for-bit on normals") {
    import graft.functions.Ufuncs
    // mixed exponents, binade boundaries (1.0, 4.0, 0.5), negatives
    val xs = Seq(1.0, 4.0, 0.5, -0.5, 0.7, -3.0, 123456.789, 1e-300,
      6.25e17, -2.0)
    val rows = xs.toDF("x").select($"x",
      Ufuncs("spacing")($"x").as("sp"),
      Ufuncs("nextafter", $"x", lit(1e308)).as("up"),
      Ufuncs("nextafter", $"x", lit(-1e308)).as("dn"),
      Ufuncs("nextafter", $"x", $"x").as("self"))
      .collect().map(r => r.getDouble(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    xs.foreach { x =>
      val (sp, up, dn, self) = rows(x)
      // numpy spacing = ulp measured away from zero, sign of x
      assert(sp == (if (x < 0) -Math.ulp(x) else Math.ulp(x)), s"spacing($x)")
      assert(up == Math.nextAfter(x, Double.PositiveInfinity), s"up($x)")
      assert(dn == Math.nextAfter(x, Double.NegativeInfinity), s"dn($x)")
      assert(self == x, s"self($x)")
      // roundtrip: one step up then one step down is the identity
      assert(Math.nextAfter(up, Double.NegativeInfinity) == x)
    }
    // the distributed roundtrip itself
    val rt = xs.toDF("x").select(
      (Ufuncs("nextafter", Ufuncs("nextafter", $"x", lit(1e308)),
        lit(-1e308)) === $"x").as("ok")).collect()
    assert(rt.forall(_.getBoolean(0)))
  }

  test("aligned-binop algebra: reversed ops, commutativity, comparison duality") {
    val pairGen: Gen[(List[(Long, Double)], List[(Long, Double)])] = {
      val side = Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 15L)
        v <- Gen.choose(1, 50).map(_.toDouble) // positive: safe for div/mod
      } yield (k, v)).map(_.distinctBy(_._1))
      Gen.zip(side, side)
    }
    forAll(pairGen) { case (la, ra) =>
      val l = GraftFrame(la.toDF("k", "v"))
      val r = GraftFrame(ra.toDF("k", "v"))
      def cells(f: GraftFrame): Map[Long, Option[Double]] =
        f.df.select("k", "v").collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
      // rOP(l, r) == OP(r, l) cell-for-cell, with and without fill
      for (fill <- Seq(None, Some(1.0)); op <- Seq("sub", "div", "mod")) {
        assert(cells(l.arithAligned(r, Seq("k"), "r" + op, fill)) ==
          cells(r.arithAligned(l, Seq("k"), op, fill)),
          s"r$op(l,r) != $op(r,l) fill=$fill")
      }
      // add/mul commute
      for (op <- Seq("add", "mul")) {
        assert(cells(l.arithAligned(r, Seq("k"), op, Some(0.0))) ==
          cells(r.arithAligned(l, Seq("k"), op, Some(0.0))), s"$op not commutative")
      }
      // comparison duality: lt(l,r) == gt(r,l); ne == !eq on every key
      def bools(f: GraftFrame, c: String): Map[Long, Boolean] =
        f.df.select(col("k"), col(c)).collect()
          .map(row => row.getLong(0) -> row.getBoolean(1)).toMap
      val fwd = l.compareAligned(r, Seq("eq", "ne", "lt"), Seq("k"))
      val bwd = r.compareAligned(l, Seq("gt"), Seq("k"))
      assert(bools(fwd, "v_lt") == bools(bwd, "v_gt"), "lt(l,r) != gt(r,l)")
      val eqm = bools(fwd, "v_eq"); val nem = bools(fwd, "v_ne")
      assert(eqm.keySet == nem.keySet && eqm.forall { case (k, b) => nem(k) == !b },
        "ne is not eq's negation")
      // a Series of the same keyed values subtracts to zero on shared keys
      val series = GraftFrame(ra.toDF("k", "s"))
      val z = cells(r.setIndex("k").arithAlignedSeries(series, "sub"))
      ra.foreach { case (k, _) => assert(z(k).contains(0.0), s"self-sub at $k") }
    }
  }

  test("anchored week labels land on the anchor weekday, within 6 days ahead") {
    import graft.operators.Sessionize
    val dayGen: Gen[List[Int]] =
      Gen.nonEmptyListOf(Gen.choose(0, 3650)) // ~10y of epoch days
    forAll(dayGen) { offsets =>
      val df = offsets.distinct.map(o => ("k", o)).toDF("k", "off")
        .select($"k", expr("timestamp_seconds(CAST(off AS BIGINT) * 86400)").as("ts"),
          lit(1L).as("v"))
      for ((anchor, dow) <- Seq(("W-MON", 1), ("W-FRI", 5))) {
        val labels = Sessionize.resampleCalendar(df, "k", "ts", $"v", anchor)
          .filter($"cnt" > 0)
          .select(dayofweek($"day"), datediff($"day", lit("1970-01-01")))
          .as[(Int, Int)].collect()
        // Spark dayofweek: 1=Sunday..7=Saturday; anchor MON=2, FRI=6
        labels.foreach { case (d, _) => assert(d == dow + 1, s"$anchor label dow=$d") }
        // every observed day maps to a label 0..6 days AHEAD (right label)
        val lblSet = labels.map(_._2).toSet
        offsets.distinct.foreach { o =>
          assert((0 to 6).exists(j => lblSet.contains(o + j)),
            s"day $o has no $anchor label within 6 days ahead")
        }
      }
    }
  }

  // ------------------------------------------------------ aligned binops
  // r10 (VERDICT task 7): the aligned family's documented cell rules vs a
  // Scala-collections mirror on null-heavy / duplicate-key / empty frames
  // — drift the fixture oracles can't catch.

  private type ARow = (Long, Option[Double], Option[Double])

  private val alignedRowGen: Gen[ARow] = for {
    k <- Gen.choose(0L, 3L) // tiny key space forces dups AND missing keys
    a <- Gen.option(Gen.choose(-50, 50).map(_.toDouble))
    b <- Gen.option(Gen.choose(-50, 50).map(_.toDouble))
  } yield (k, a, b)

  /** Frames may be EMPTY (listOf, not nonEmptyListOf). */
  private val alignedFrameGen: Gen[List[ARow]] = Gen.listOf(alignedRowGen)

  /** Full-outer pairing with duplicate keys: both sides present → cross
    * product per key; one side absent → the other side vs missing. */
  private def outerPairs(l: List[ARow], r: List[ARow])
      : List[(Long, Option[ARow], Option[ARow])] = {
    val keys = (l.map(_._1) ++ r.map(_._1)).distinct
    keys.flatMap { k =>
      val ls = l.filter(_._1 == k); val rs = r.filter(_._1 == k)
      if (ls.nonEmpty && rs.nonEmpty)
        for (a <- ls; b <- rs) yield (k, Some(a), Some(b))
      else ls.map(a => (k, Some(a), Option.empty[ARow])) ++
        rs.map(b => (k, Option.empty[ARow], Some(b)))
    }
  }

  /** The documented cell rule: both missing → null; else fill one-sided
    * cells when fillValue is given, null otherwise. A null VALUE in a
    * present row counts as missing, exactly like an absent row. */
  private def cellRule(op: (Double, Double) => Double, lv: Option[Double],
      rv: Option[Double], fv: Option[Double]): Option[Double] =
    if (lv.isEmpty && rv.isEmpty) None
    else fv match {
      case Some(f) => Some(op(lv.getOrElse(f), rv.getOrElse(f)))
      case None => for { x <- lv; y <- rv } yield op(x, y)
    }

  private def multiset[A](xs: Seq[A]): Map[A, Int] =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  test("arithAligned cell rules match the Scala mirror on nulls/dups/empties") {
    val ops = Seq[(String, (Double, Double) => Double)](
      "add" -> (_ + _), "sub" -> (_ - _), "mul" -> (_ * _),
      "rsub" -> ((a, b) => b - a))
    forAll(alignedFrameGen, alignedFrameGen) { (l, r) =>
      // left carries (a, b); right carries (a, c): a shared, b left-only,
      // c right-only (one-frame columns behave as all-missing other side)
      val lDf = l.toDF("k", "a", "b")
      val rDf = r.toDF("k", "a", "c")
      for ((opName, opFn) <- ops; fv <- Seq(None, Some(0.0), Some(2.0))) {
        val got = GraftFrame(lDf)
          .arithAligned(GraftFrame(rDf), Seq("k"), opName, fv)
          .df.select("k", "a", "b", "c")
          .as[(Long, Option[Double], Option[Double], Option[Double])]
          .collect().toSeq
        val exp = outerPairs(l, r).map { case (k, lo, ro) =>
          (k,
            cellRule(opFn, lo.flatMap(_._2), ro.flatMap(_._2), fv),
            cellRule(opFn, lo.flatMap(_._3), None, fv),
            cellRule(opFn, None, ro.flatMap(_._3), fv))
        }
        assert(multiset(got) == multiset(exp),
          s"op=$opName fv=$fv l=$l r=$r")
      }
    }
  }

  test("compareAligned NaN rules match the Scala mirror on nulls/dups/empties") {
    forAll(alignedFrameGen, alignedFrameGen) { (l, r) =>
      val lDf = l.map(t => (t._1, t._2)).toDF("k", "v")
      val rDf = r.map(t => (t._1, t._2)).toDF("k", "v")
      val got = GraftFrame(lDf)
        .compareAligned(GraftFrame(rDf), Seq("eq", "ne", "lt", "ge"), Seq("k"))
        .df.select("k", "v_eq", "v_ne", "v_lt", "v_ge")
        .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
      val exp = outerPairs(l.map(t => (t._1, t._2, None: Option[Double])),
          r.map(t => (t._1, t._2, None: Option[Double]))).map { case (k, lo, ro) =>
        val lv = lo.flatMap(_._2); val rv = ro.flatMap(_._2)
        // missing on either side: eq/lt/ge false, ne true (NaN != x)
        val eq = (for { x <- lv; y <- rv } yield x == y).getOrElse(false)
        val lt = (for { x <- lv; y <- rv } yield x < y).getOrElse(false)
        val ge = (for { x <- lv; y <- rv } yield x >= y).getOrElse(false)
        (k, eq, !eq, lt, ge)
      }
      assert(multiset(got) == multiset(exp), s"l=$l r=$r")
    }
  }

  test("arithAlignedSeries matches the Scala mirror (series hits every column)") {
    val seriesGen: Gen[List[(Long, Option[Double])]] =
      Gen.listOf(for {
        k <- Gen.choose(0L, 3L)
        v <- Gen.option(Gen.choose(-50, 50).map(_.toDouble))
      } yield (k, v))
    forAll(alignedFrameGen, seriesGen) { (l, s0) =>
      // a series must be unique-keyed (pandas reindex would raise too);
      // keep the first row per key
      val s = s0.groupBy(_._1).view.mapValues(_.head._2).toList
        .map { case (k, v) => (k, v) }.sortBy(_._1)
      val lDf = l.toDF("k", "a", "b")
      val sDf = s.toDF("k", "s")
      for (fv <- Seq(None, Some(0.0))) {
        val got = GraftFrame(lDf)
          .arithAlignedSeries(GraftFrame(sDf), "sub", Seq("k"), fv)
          .df.select("k", "a", "b")
          .as[(Long, Option[Double], Option[Double])].collect().toSeq
        val exp = outerPairs(l, s.map(t => (t._1, t._2, None: Option[Double])))
          .map { case (k, lo, ro) =>
            val sv = ro.flatMap(_._2)
            (k, cellRule(_ - _, lo.flatMap(_._2), sv, fv),
              cellRule(_ - _, lo.flatMap(_._3), sv, fv))
          }
        assert(multiset(got) == multiset(exp), s"fv=$fv l=$l s=$s")
      }
    }
  }
}
