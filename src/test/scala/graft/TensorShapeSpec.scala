package graft

import org.apache.spark.sql.functions._
import graft.learn.TensorShape

/** Hand-checked cases for the COO shape-manipulation family — a tiny
  * dense 2×3 / 2×2×2 tensor where every expected cell is written out,
  * so axis-permutation and re-basing bugs can't cancel the way a
  * composed round trip could. The registry queries (TensorQ) gate the
  * same ops differentially at fixture scale.
  */
class TensorShapeSpec extends SparkSpecBase {
  import spark.implicits._

  // dense 2×3: v = 10i + j, every cell present
  private def m23 = (for { i <- 0L to 1L; j <- 0L to 2L }
    yield (i, j, (10 * i + j).toDouble)).toDF("i", "j", "v")

  private def cells(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("i").cast("long"), col("j").cast("long"),
      col("v").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("swapaxes transposes the 2×3") {
    assert(cells(TensorShape.swapaxes(m23, Seq("i", "j"), 0, 1)) ==
      Set((0L, 0L, 0.0), (1L, 0L, 1.0), (2L, 0L, 2.0),
        (0L, 1L, 10.0), (1L, 1L, 11.0), (2L, 1L, 12.0)))
  }

  test("moveaxis in 3-d places the source axis exactly at `to`") {
    // 2×2×2: v = 4i + 2j + k
    val t3 = (for { i <- 0L to 1L; j <- 0L to 1L; k <- 0L to 1L }
      yield (i, j, k, (4 * i + 2 * j + k).toDouble)).toDF("i", "j", "k", "v")
    // moveaxis(2 → 0): out (k, i, j)
    val moved = TensorShape.moveaxis(t3, Seq("i", "j", "k"), 2, 0)
      .select(col("i").cast("long"), col("j").cast("long"),
        col("k").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(moved == (for { i <- 0L to 1L; j <- 0L to 1L; k <- 0L to 1L }
      yield (k, i, j, (4 * i + 2 * j + k).toDouble)).toSet)
    // rollaxis(axis=0, start=3) == moveaxis(0 → 2): out (j, k, i)
    val rolled = TensorShape.rollaxis(t3, Seq("i", "j", "k"), 0, 3)
      .select(col("i").cast("long"), col("j").cast("long"),
        col("k").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rolled == (for { i <- 0L to 1L; j <- 0L to 1L; k <- 0L to 1L }
      yield (j, k, i, (4 * i + 2 * j + k).toDouble)).toSet)
  }

  test("ravel C-order flat index and flip reflections") {
    val flat = TensorShape.ravel(m23, Seq("i", "j"), Seq(2L, 3L))
      .select(col("flat").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(flat == Set((0L, 0.0), (1L, 1.0), (2L, 2.0),
      (3L, 10.0), (4L, 11.0), (5L, 12.0)))
    assert(cells(TensorShape.flip(m23, Seq("i", "j"), 1, 3L)) ==
      Set((0L, 2L, 0.0), (0L, 1L, 1.0), (0L, 0L, 2.0),
        (1L, 2L, 10.0), (1L, 1L, 11.0), (1L, 0L, 12.0)))
  }

  test("roll wraps negative shifts through pmod") {
    assert(cells(TensorShape.roll(m23, Seq("i", "j"), 1, -1L, 3L)) ==
      Set((0L, 2L, 0.0), (0L, 0L, 1.0), (0L, 1L, 2.0),
        (1L, 2L, 10.0), (1L, 0L, 11.0), (1L, 1L, 12.0)))
  }

  test("splitAxis labels pieces and re-bases the split axis") {
    val parts = TensorShape.splitAxis(m23, Seq("i", "j"), 1, Seq(2L))
      .select(col("part").cast("long"), col("i").cast("long"),
        col("j").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(parts == Set(
      (0L, 0L, 0L, 0.0), (0L, 0L, 1L, 1.0), (1L, 0L, 0L, 2.0),
      (0L, 1L, 0L, 10.0), (0L, 1L, 1L, 11.0), (1L, 1L, 0L, 12.0)))
  }

  test("takeAxis honors duplicates and request order") {
    assert(cells(TensorShape.takeAxis(m23, Seq("i", "j"), 0, Seq(1L, 1L, 0L))) ==
      Set((0L, 0L, 10.0), (0L, 1L, 11.0), (0L, 2L, 12.0),
        (1L, 0L, 10.0), (1L, 1L, 11.0), (1L, 2L, 12.0),
        (2L, 0L, 0.0), (2L, 1L, 1.0), (2L, 2L, 2.0)))
  }

  test("squeeze raises loudly when the axis is not length 1") {
    val bad = Seq((0L, 1L, 1.0)).toDF("i", "j", "v") // j = 1 off-hyperplane
    val ex = intercept[Exception] {
      TensorShape.squeeze(bad, Seq("i", "j"), 1).collect()
    }
    assert(ex.getMessage.contains("squeeze") ||
      ex.getCause != null && ex.getCause.getMessage.contains("squeeze"))
  }

  test("concatAxis offsets later operands by cumulative sizes") {
    val b = Seq((0L, 0L, 99.0)).toDF("i", "j", "v") // sparse 1x3 row
    val stacked = cells(TensorShape.concatAxis(Seq(m23, b), Seq("i", "j"), 0,
      Seq(Seq(2L, 3L), Seq(1L, 3L))))
    assert(stacked.contains((2L, 0L, 99.0)) && stacked.size == 7)
  }

  test("concatAxis rejects ragged off-axis lengths (numpy contract)") {
    val b = Seq((0L, 0L, 99.0)).toDF("i", "j", "v")
    val ex = intercept[IllegalArgumentException] {
      TensorShape.concatAxis(Seq(m23, b), Seq("i", "j"), 0,
        Seq(Seq(2L, 3L), Seq(1L, 1L)))
    }
    assert(ex.getMessage.contains("off-axis"))
  }

  test("fan-out ops multiply rows by exactly the replication factor") {
    assert(TensorShape.broadcastToAxis(m23, Seq("i", "j"), "b", 4L).count() == 24L)
    assert(TensorShape.tileAxis(m23, Seq("i", "j"), 1, 2L, 3L).count() == 12L)
    val rep = TensorShape.repeatAxis(m23, Seq("i", "j"), 0, 2L)
    assert(rep.count() == 12L)
    // repeat is consecutive: source row 1 lands at output rows 2 and 3
    assert(rep.filter(col("i") === 2L || col("i") === 3L)
      .filter(col("j") === 0L).select(col("v")).as[Double]
      .collect().toSeq == Seq(10.0, 10.0))
  }

  test("atleast_2d/3d follow numpy's axis-placement rules") {
    val vec = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("j", "v")
    // (3,) → (1,3): leading axis prepended
    val (v2, i2) = TensorShape.atleast2d(vec, Seq("j"), "i")
    assert(i2 == Seq("i", "j"))
    assert(cells(v2) == Set((0L, 0L, 1.0), (0L, 1L, 2.0), (0L, 2L, 3.0)))
    // (3,) → (1,3,1); (2,3) → (2,3,1): trailing axis appended
    val (v3, i3) = TensorShape.atleast3d(vec, Seq("j"), ("i", "m"))
    assert(i3 == Seq("i", "j", "m"))
    assert(v3.select(sum(col("m")).cast("long")).head().getLong(0) == 0L)
    val (m3, mi3) = TensorShape.atleast3d(m23, Seq("i", "j"), ("p", "m"))
    assert(mi3 == Seq("i", "j", "m") &&
      m3.count() == 6L &&
      m3.select(max(col("m")).cast("long")).head().getLong(0) == 0L)
    // already 2-d: unchanged
    assert(TensorShape.atleast2d(m23, Seq("i", "j"), "p")._2 == Seq("i", "j"))
  }

  test("broadcast_arrays replicates length-1 axes and rejects mismatches") {
    val row = Seq((0L, 100.0), (1L, 200.0), (2L, 300.0)).toDF("j", "v")
    val (ba, bb, shape) = TensorShape.broadcastArrays(
      m23, Seq("i", "j"), Seq(2L, 3L),
      row, Seq("j"), Seq(3L), Seq("i", "j"))
    assert(shape == Seq(2L, 3L))
    assert(cells(ba) == cells(m23)) // already the full shape
    // the vector replicates across the new leading axis
    assert(cells(bb) == Set(
      (0L, 0L, 100.0), (0L, 1L, 200.0), (0L, 2L, 300.0),
      (1L, 0L, 100.0), (1L, 1L, 200.0), (1L, 2L, 300.0)))
    // incompatible non-1 axis lengths raise loudly
    intercept[IllegalArgumentException] {
      TensorShape.broadcastArrays(m23, Seq("i", "j"), Seq(2L, 3L),
        row, Seq("j"), Seq(4L), Seq("i", "j"))
    }
  }
}
