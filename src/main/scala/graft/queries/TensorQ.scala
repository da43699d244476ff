package graft.queries

import org.apache.spark.sql.functions._
import graft.learn.TensorShape
import QHelpers._

/** Coverage queries for the numpy shape-manipulation family over COO
  * tensor frames (reference mars/tensor/base and mars/tensor/merge —
  * swapaxes/moveaxis/rollaxis/ravel/squeeze/expand_dims/flip/roll,
  * the stack/split families, take/compress/argwhere,
  * broadcast_to/tile/repeat). All index arithmetic is exact BIGINT,
  * so every query gates bit-exactly.
  *
  * Shared base operands (built in-query from lineitem/part): a 3-d COO
  * a3 (7×5×3), its 2-d slice a2 (7×5), and a second 2-d operand b2
  * (4×5) — integer-valued throughout.
  */
object TensorQ {

  /** DuckDB CTE for the 3-d operand. */
  private val sqlA3 =
    """a AS (SELECT l_orderkey % 7 AS i, l_partkey % 5 AS j,
      |             l_suppkey % 3 AS k,
      |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
      |      FROM lineitem GROUP BY 1, 2, 3)""".stripMargin

  /** DuckDB CTE for the 2-d operand. */
  private val sqlA2 =
    """a AS (SELECT l_orderkey % 7 AS i, l_partkey % 5 AS j,
      |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
      |      FROM lineitem GROUP BY 1, 2)""".stripMargin

  private val sqlB2 =
    """b AS (SELECT p_partkey % 4 AS i, p_size % 5 AS j,
      |             CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS v
      |      FROM part GROUP BY 1, 2)""".stripMargin

  private def a3(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy(($"l_orderkey" % 7).as("i"), ($"l_partkey" % 5).as("j"),
        ($"l_suppkey" % 3).as("k"))
      .agg(sum($"l_quantity".cast("long")).as("v"))
  }

  private def a2(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy(($"l_orderkey" % 7).as("i"), ($"l_partkey" % 5).as("j"))
      .agg(sum($"l_quantity".cast("long")).as("v"))
  }

  private def b2(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    t(spark, dir, "part")
      .groupBy(($"p_partkey" % 4).as("i"), ($"p_size" % 5).as("j"))
      .agg(sum($"p_size".cast("long")).as("v"))
  }

  val all: Vector[Q] = Vector(

    // --- swapaxes / moveaxis / rollaxis (base/swapaxes.py,
    //     moveaxis.py, rollaxis.py): three axis permutations of the
    //     same 3-d operand, tagged, each a pure projection. rollaxis
    //     exercises numpy's start > axis off-by-one (start=3 → target
    //     position 2).
    Q("learn_tensor_axes",
      s"""WITH $sqlA3
         |SELECT tag, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
         |       CAST(k AS BIGINT) AS k, v FROM (
         |  SELECT 'swap02' AS tag, k AS i, j, i AS k, v FROM a
         |  UNION ALL
         |  SELECT 'move20' AS tag, k AS i, i AS j, j AS k, v FROM a
         |  UNION ALL
         |  SELECT 'roll03' AS tag, j AS i, k AS j, i AS k, v FROM a) u
         |ORDER BY tag, i, j, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a3(spark, dir)
      val idx = Seq("i", "j", "k")
      def tagd(tag: String, f: org.apache.spark.sql.DataFrame) =
        f.select(lit(tag).as("tag"), $"i".cast("long").as("i"),
          $"j".cast("long").as("j"), $"k".cast("long").as("k"), $"v")
      tagd("swap02", TensorShape.swapaxes(a, idx, 0, 2))
        .unionByName(tagd("move20", TensorShape.moveaxis(a, idx, 2, 0)))
        .unionByName(tagd("roll03", TensorShape.rollaxis(a, idx, 0, 3)))
        .orderBy($"tag", $"i", $"j", $"k")
    },

    // --- ravel C-order + the expand_dims→squeeze round trip
    //     (base/ravel.py, expand_dims.py, squeeze.py): flat = 15i+3j+k
    //     for shape (7,5,3); the round trip is the identity, so the
    //     'rt' rows replay the identical flat expression — a real gate
    //     on squeeze's axis-drop and expand_dims' axis-insert both
    //     being position-exact.
    Q("learn_tensor_ravel",
      s"""WITH $sqlA3
         |SELECT tag, CAST(flat AS BIGINT) AS flat, v FROM (
         |  SELECT 'ravel' AS tag, i * 15 + j * 3 + k AS flat, v FROM a
         |  UNION ALL
         |  SELECT 'rt' AS tag, i * 15 + j * 3 + k AS flat, v FROM a) u
         |ORDER BY tag, flat""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a3(spark, dir)
      val idx = Seq("i", "j", "k")
      val shape = Seq(7L, 5L, 3L)
      val direct = TensorShape.ravel(a, idx, shape)
        .select(lit("ravel").as("tag"), $"flat", $"v")
      val roundTrip = TensorShape.ravel(
        TensorShape.squeeze(
          TensorShape.expandDims(a, idx, 1, "m"), Seq("i", "m", "j", "k"), 1),
        idx, shape)
        .select(lit("rt").as("tag"), $"flat", $"v")
      direct.unionByName(roundTrip).orderBy($"tag", $"flat")
    },

    // --- flip / fliplr / flipud / roll (base/flip*.py, roll.py) over
    //     the 7×5 operand: index reflections and modular shifts, all
    //     projections; the negative-shift roll goes through pmod.
    Q("learn_tensor_flip",
      s"""WITH $sqlA2
         |SELECT tag, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, v FROM (
         |  SELECT 'ud' AS tag, 6 - i AS i, j, v FROM a
         |  UNION ALL
         |  SELECT 'lr' AS tag, i, 4 - j AS j, v FROM a
         |  UNION ALL
         |  SELECT 'rp' AS tag, (i + 3) % 7 AS i, j, v FROM a
         |  UNION ALL
         |  SELECT 'rn' AS tag, i, ((j - 2) % 5 + 5) % 5 AS j, v FROM a) u
         |ORDER BY tag, i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a2(spark, dir)
      val idx = Seq("i", "j")
      def tagd(tag: String, f: org.apache.spark.sql.DataFrame) =
        f.select(lit(tag).as("tag"), $"i".cast("long").as("i"),
          $"j".cast("long").as("j"), $"v")
      tagd("ud", TensorShape.flip(a, idx, 0, 7))
        .unionByName(tagd("lr", TensorShape.flip(a, idx, 1, 5)))
        .unionByName(tagd("rp", TensorShape.roll(a, idx, 0, 3, 7)))
        .unionByName(tagd("rn", TensorShape.roll(a, idx, 1, -2, 5)))
        .orderBy($"tag", $"i", $"j")
    },

    // --- the stack family (merge/vstack.py, hstack.py, dstack.py,
    //     column_stack.py): vstack offsets axis 0 by a's height 7
    //     (widths 5 = 5 agree); hstack and dstack need equal axis-0
    //     lengths (numpy raises on ragged operands — r11 ADVICE), so
    //     they pair a's first 4 rows (4x5) with b (4x5): hstack offsets
    //     axis 1 by width 5, dstack expands both to depth-1 and
    //     concatenates along the new axis. column_stack stacks two 1-d
    //     slices (a at j=0 / j=1) along a new axis 1. 2-d results carry
    //     d = 0 so one tagged union gates all four.
    Q("learn_tensor_stack",
      s"""WITH $sqlA2, $sqlB2
         |SELECT tag, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
         |       CAST(d AS BIGINT) AS d, v FROM (
         |  SELECT 'v' AS tag, i, j, 0 AS d, v FROM a
         |  UNION ALL
         |  SELECT 'v' AS tag, i + 7 AS i, j, 0 AS d, v FROM b
         |  UNION ALL
         |  SELECT 'h' AS tag, i, j, 0 AS d, v FROM a WHERE i < 4
         |  UNION ALL
         |  SELECT 'h' AS tag, i, j + 5 AS j, 0 AS d, v FROM b
         |  UNION ALL
         |  SELECT 'd' AS tag, i, j, 0 AS d, v FROM a WHERE i < 4
         |  UNION ALL
         |  SELECT 'd' AS tag, i, j, 1 AS d, v FROM b
         |  UNION ALL
         |  SELECT 'cs' AS tag, i, 0 AS j, 0 AS d, v FROM a WHERE j = 0
         |  UNION ALL
         |  SELECT 'cs' AS tag, i, 1 AS j, 0 AS d, v FROM a WHERE j = 1) u
         |ORDER BY tag, i, j, d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a2(spark, dir)
      val b = b2(spark, dir)
      val idx = Seq("i", "j")
      def tag2(tag: String, f: org.apache.spark.sql.DataFrame) =
        f.select(lit(tag).as("tag"), $"i".cast("long").as("i"),
          $"j".cast("long").as("j"), lit(0L).as("d"), $"v")
      def tag3(tag: String, f: org.apache.spark.sql.DataFrame) =
        f.select(lit(tag).as("tag"), $"i".cast("long").as("i"),
          $"j".cast("long").as("j"), $"d".cast("long").as("d"), $"v")
      val a4 = a.filter($"i" < 4)
      val vst = tag2("v", TensorShape.concatAxis(Seq(a, b), idx, 0,
        Seq(Seq(7L, 5L), Seq(4L, 5L))))
      val hst = tag2("h", TensorShape.concatAxis(Seq(a4, b), idx, 1,
        Seq(Seq(4L, 5L), Seq(4L, 5L))))
      val dst = tag3("d", TensorShape.concatAxis(
        Seq(TensorShape.expandDims(a4, idx, 2, "d"),
          TensorShape.expandDims(b, idx, 2, "d")),
        Seq("i", "j", "d"), 2, Seq(Seq(4L, 5L, 1L), Seq(4L, 5L, 1L))))
      val v0 = a.filter($"j" === 0).select($"i", $"v")
      val v1 = a.filter($"j" === 1).select($"i", $"v")
      val cst = tag2("cs", TensorShape.concatAxis(
        Seq(TensorShape.expandDims(v0, Seq("i"), 1, "j"),
          TensorShape.expandDims(v1, Seq("i"), 1, "j")),
        idx, 1, Seq(Seq(7L, 1L), Seq(7L, 1L))))
      vst.unionByName(hst).unionByName(dst).unionByName(cst)
        .orderBy($"tag", $"i", $"j", $"d")
    },

    // --- split family (base/split.py; vsplit/hsplit are axis 0/1):
    //     interior cut points label each cell with its piece and
    //     re-base the split axis to piece-local coordinates — one
    //     projection, no data movement (the reference materializes one
    //     sub-tensor per piece; filtering `part` here is the same).
    Q("learn_tensor_split",
      s"""WITH $sqlA2
         |SELECT tag, CAST(part AS BIGINT) AS part, CAST(i AS BIGINT) AS i,
         |       CAST(j AS BIGINT) AS j, v FROM (
         |  SELECT 'vs' AS tag,
         |         CASE WHEN i >= 5 THEN 2 WHEN i >= 2 THEN 1 ELSE 0 END AS part,
         |         i - CASE WHEN i >= 5 THEN 5 WHEN i >= 2 THEN 2 ELSE 0 END AS i,
         |         j, v FROM a
         |  UNION ALL
         |  SELECT 'hs' AS tag,
         |         CASE WHEN j >= 3 THEN 1 ELSE 0 END AS part,
         |         i, j - CASE WHEN j >= 3 THEN 3 ELSE 0 END AS j, v FROM a) u
         |ORDER BY tag, part, i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a2(spark, dir)
      val idx = Seq("i", "j")
      def tagd(tag: String, f: org.apache.spark.sql.DataFrame) =
        f.select(lit(tag).as("tag"), $"part".cast("long").as("part"),
          $"i".cast("long").as("i"), $"j".cast("long").as("j"), $"v")
      tagd("vs", TensorShape.splitAxis(a, idx, 0, Seq(2L, 5L)))
        .unionByName(tagd("hs", TensorShape.splitAxis(a, idx, 1, Seq(3L))))
        .orderBy($"tag", $"part", $"i", $"j")
    },

    // --- take with duplicate positions + boolean compress
    //     (indexing/take.py, compress.py): the positions list is the
    //     broadcast side; output index = request position, so row 3
    //     appears twice under different output indices.
    Q("learn_tensor_take",
      s"""WITH $sqlA2
         |SELECT tag, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, v FROM (
         |  SELECT 'take' AS tag, s.o AS i, a.j, a.v
         |  FROM a JOIN (VALUES (3, 0), (0, 1), (3, 2), (6, 3)) s(p, o)
         |    ON a.i = s.p
         |  UNION ALL
         |  SELECT 'comp' AS tag, a.i, s.o AS j, a.v
         |  FROM a JOIN (VALUES (0, 0), (2, 1), (4, 2)) s(p, o)
         |    ON a.j = s.p) u
         |ORDER BY tag, i, j, v""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a2(spark, dir)
      val idx = Seq("i", "j")
      def tagd(tag: String, f: org.apache.spark.sql.DataFrame) =
        f.select(lit(tag).as("tag"), $"i".cast("long").as("i"),
          $"j".cast("long").as("j"), $"v")
      tagd("take", TensorShape.takeAxis(a, idx, 0, Seq(3L, 0L, 3L, 6L)))
        .unionByName(tagd("comp", TensorShape.compressAxis(a, idx, 1,
          Seq(true, false, true, false, true))))
        .orderBy($"tag", $"i", $"j", $"v")
    },

    // --- argwhere (indexing/argwhere.py): index tuples of non-zero
    //     cells in row-major order. The operand's values are signed
    //     (suppkey mod 11 − 5 summed) so true zeros occur and the
    //     v ≠ 0 filter is exercised, not vacuous.
    Q("learn_tensor_argwhere",
      """WITH a AS (SELECT l_orderkey % 9 AS i, l_partkey % 6 AS j,
        |             CAST(SUM(CAST(l_suppkey AS BIGINT) % 11 - 5) AS BIGINT) AS v
        |           FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j
        |FROM a WHERE v <> 0
        |ORDER BY i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = t(spark, dir, "lineitem")
        .groupBy(($"l_orderkey" % 9).as("i"), ($"l_partkey" % 6).as("j"))
        .agg(sum($"l_suppkey".cast("long") % 11 - 5).as("v"))
      TensorShape.argwhere(a, Seq("i", "j"))
        .select($"i".cast("long").as("i"), $"j".cast("long").as("j"))
        .orderBy($"i", $"j")
    },

    // --- broadcast_to / tile / repeat (base/broadcast_to.py, tile.py,
    //     repeat.py): executor-side fan-outs — broadcast_to replicates
    //     under a new leading axis b∈[0,3), tile lays 2 copies of axis
    //     1 end to end (j + 5r), repeat triples each axis-0 index in
    //     place (3i + r). Output rows = 3×+2×+3× the operand — the
    //     inherent output size; no exchange anywhere.
    Q("learn_tensor_fanout",
      s"""WITH $sqlA2
         |SELECT tag, CAST(b AS BIGINT) AS b, CAST(i AS BIGINT) AS i,
         |       CAST(j AS BIGINT) AS j, v FROM (
         |  SELECT 'bc' AS tag, r.range AS b, i, j, v
         |  FROM a CROSS JOIN range(0, 3) r
         |  UNION ALL
         |  SELECT 'tile' AS tag, 0 AS b, i, j + 5 * r.range AS j, v
         |  FROM a CROSS JOIN range(0, 2) r
         |  UNION ALL
         |  SELECT 'rep' AS tag, 0 AS b, i * 3 + r.range AS i, j, v
         |  FROM a CROSS JOIN range(0, 3) r) u
         |ORDER BY tag, b, i, j""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a2(spark, dir)
      val idx = Seq("i", "j")
      val bc = TensorShape.broadcastToAxis(a, idx, "b", 3L)
        .select(lit("bc").as("tag"), $"b".cast("long").as("b"),
          $"i".cast("long").as("i"), $"j".cast("long").as("j"), $"v")
      def tagd(tag: String, f: org.apache.spark.sql.DataFrame) =
        f.select(lit(tag).as("tag"), lit(0L).as("b"),
          $"i".cast("long").as("i"), $"j".cast("long").as("j"), $"v")
      bc.unionByName(tagd("tile", TensorShape.tileAxis(a, idx, 1, 2L, 5L)))
        .unionByName(tagd("rep", TensorShape.repeatAxis(a, idx, 0, 3L)))
        .orderBy($"tag", $"b", $"i", $"j")
    },

    // --- modf + left_shift/right_shift (tensor/arithmetic/modf.py,
    //     left_shift.py, right_shift.py): modf is exact IEEE
    //     truncation arithmetic (identical shape both sides, compared
    //     UNROUNDED); the shifts are BIGINT-exact. x = q/4 − 6.125
    //     sweeps signed fractional values.
    Q("op_modf_shift",
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN x < 0 THEN ceil(x) ELSE floor(x) END
        |    + CAST(0.0 AS DOUBLE) AS m_int,
        |  x - CASE WHEN x < 0 THEN ceil(x) ELSE floor(x) END
        |    + CAST(0.0 AS DOUBLE) AS m_frac,
        |  CAST(l_orderkey << CAST(l_linenumber % 5 AS INT) AS BIGINT) AS shl,
        |  CAST(l_orderkey >> CAST(l_linenumber % 3 AS INT) AS BIGINT) AS shr
        |FROM (SELECT l_orderkey, l_linenumber,
        |        CAST(l_quantity AS DOUBLE) / 4.0 - 6.125 AS x
        |      FROM lineitem WHERE l_orderkey < 600) base
        |ORDER BY l_orderkey, l_linenumber, shl, m_int, m_frac""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.Ufuncs
      t(spark, dir, "lineitem").filter($"l_orderkey" < 600)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_quantity".cast("double") / 4.0 - 6.125).as("x"))
        .select($"l_orderkey", $"l_linenumber",
          (Ufuncs("modf_int")($"x") + lit(0.0)).as("m_int"),
          (Ufuncs("modf_frac")($"x") + lit(0.0)).as("m_frac"),
          Ufuncs("left_shift", $"l_orderkey", $"l_linenumber" % 5).as("shl"),
          Ufuncs("right_shift", $"l_orderkey", $"l_linenumber" % 3).as("shr"))
        // (m_int, m_frac) together determine x, breaking the 400+
        // duplicate (l_orderkey, l_linenumber) ties in the fixture —
        // shl/shr are constant across such ties (r11 ADVICE).
        .orderBy($"l_orderkey", $"l_linenumber", $"shl", $"m_int", $"m_frac")
    },

    // --- nanmedian / nan-skipping quantile (reduction/nanmedian.py):
    //     nulls planted at l_linenumber = 3 exercise the skip path;
    //     values are small integers so the even-n linear interpolation
    //     (mean of the two middles) is exact in both engines.
    Q("op_nanmedian",
      """SELECT g, CAST(COUNT(v) AS BIGINT) AS n_valid,
        |  median(v) AS med
        |FROM (SELECT l_suppkey % 8 AS g,
        |        CASE WHEN l_linenumber = 3 THEN NULL
        |             ELSE CAST(l_quantity AS DOUBLE) END AS v
        |      FROM lineitem) base
        |GROUP BY g ORDER BY g""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .select(($"l_suppkey" % 8).as("g"),
          when($"l_linenumber" === 3, lit(null).cast("double"))
            .otherwise($"l_quantity".cast("double")).as("v"))
        .groupBy($"g")
        .agg(count($"v").as("n_valid"),
          expr("percentile(v, 0.5)").as("med"))
        .orderBy($"g")
    },

    // --- partition / argpartition (base/partition.py,
    //     argpartition.py): the deterministic three-way split at the
    //     kth order statistic under (value, id) — side 1 is exactly
    //     the per-group 6th-smallest, sides 0/2 its strict
    //     predecessors/successors; ids in the output make the same
    //     rows the argpartition answer.
    Q("learn_partition",
      """SELECT g, side, id, v FROM (
        |  SELECT g, id, v,
        |    CASE WHEN pos < 5 THEN 0 WHEN pos = 5 THEN 1 ELSE 2 END AS side
        |  FROM (SELECT g, id, v,
        |          row_number() OVER (PARTITION BY g ORDER BY v, id) - 1 AS pos
        |        FROM (SELECT l_suppkey % 10 AS g,
        |                CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
        |                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |              FROM lineitem WHERE l_suppkey < 60
        |              GROUP BY 1, 2) cells) ranked) s
        |ORDER BY g, side, id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cells = t(spark, dir, "lineitem").filter($"l_suppkey" < 60)
        .groupBy(($"l_suppkey" % 10).as("g"),
          ($"l_orderkey" * 10 + $"l_linenumber").cast("long").as("id"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
      TensorShape.partitionSplit(cells, Seq("g"), "id", "v", 5L)
        .select($"g", $"side", $"id", $"v")
        .orderBy($"g", $"side", $"id")
    },

    // --- ndindex / indices (base/ndindex.py, indices.py): the C-order
    //     coordinate grid of a shape, generated DISTRIBUTEDLY as
    //     range(∏shape) → unravel_index — no driver-side iterator, so
    //     a trillion-cell grid is still one lazy range scan. Gated on
    //     shape (4,3,2) against the integer div/mod replay.
    Q("learn_ndindex",
      """SELECT CAST(flat // 6 AS BIGINT) AS i,
        |       CAST((flat // 2) % 3 AS BIGINT) AS j,
        |       CAST(flat % 2 AS BIGINT) AS k
        |FROM (SELECT range AS flat FROM range(0, 24)) t
        |ORDER BY i, j, k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions
      val coords = VectorFunctions.unravelIndex(col("id"), Seq(4L, 3L, 2L))
      spark.range(24)
        .select(coords.getItem(0).as("i"), coords.getItem(1).as("j"),
          coords.getItem(2).as("k"))
        .orderBy($"i", $"j", $"k")
    },

    // --- atleast_2d/3d + broadcast_arrays (base/atleast_2d.py,
    //     atleast_3d.py, broadcast_arrays.py): numpy's axis-placement
    //     rules over COO frames — 'a3d' appends a trailing length-1
    //     axis to the 7×5 operand; 'v3d' sandwiches the 6-vector into
    //     (1,6,1); 'ba'/'bb' broadcast the 7×5 matrix against a
    //     5-row-vector to the common (7,5) (the vector replicates
    //     executor-side via explode — rows ×7, no shuffle). All index
    //     arithmetic exact BIGINT → bit-exact gate.
    Q("learn_tensor_atleast",
      s"""WITH $sqlA2,
         |w AS (SELECT l_suppkey % 6 AS j,
         |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
         |      FROM lineitem GROUP BY 1),
         |r AS (SELECT p_partkey % 5 AS j,
         |             CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS v
         |      FROM part GROUP BY 1)
         |SELECT tag, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
         |       CAST(m AS BIGINT) AS m, v FROM (
         |  SELECT 'a3d' AS tag, i, j, 0 AS m, v FROM a
         |  UNION ALL
         |  SELECT 'v3d' AS tag, 0 AS i, j, 0 AS m, v FROM w
         |  UNION ALL
         |  SELECT 'ba' AS tag, i, j, 0 AS m, v FROM a
         |  UNION ALL
         |  SELECT 'bb' AS tag, g.gi AS i, r.j, 0 AS m, r.v
         |  FROM r CROSS JOIN (SELECT unnest(range(0, 7)) AS gi) g) u
         |ORDER BY tag, i, j, m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = a2(spark, dir)
      val vec = t(spark, dir, "lineitem")
        .groupBy(($"l_suppkey" % 6).as("j"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
      val row = t(spark, dir, "part")
        .groupBy(($"p_partkey" % 5).as("j"))
        .agg(sum($"p_size".cast("long")).as("v"))
      val (a3d, _) = TensorShape.atleast3d(a, Seq("i", "j"), ("p", "m"))
      val (v3d, _) = TensorShape.atleast3d(vec, Seq("j"), ("i", "m"))
      val (ba, bb, outShape) = TensorShape.broadcastArrays(
        a, Seq("i", "j"), Seq(7L, 5L),
        row, Seq("j"), Seq(5L), Seq("i", "j"))
      assert(outShape == Seq(7L, 5L))
      def tagd(tag: String, f: org.apache.spark.sql.DataFrame,
          withM: Boolean) =
        f.select(lit(tag).as("tag"), col("i").cast("long").as("i"),
          col("j").cast("long").as("j"),
          (if (withM) col("m") else lit(0L)).cast("long").as("m"),
          col("v"))
      tagd("a3d", a3d, withM = true)
        .unionByName(tagd("v3d", v3d, withM = true))
        .unionByName(tagd("ba", ba, withM = false))
        .unionByName(tagd("bb", bb, withM = false))
        .orderBy($"tag", $"i", $"j", $"m")
    })
}
