package graft.learn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** numpy shape-manipulation surface over COO tensor frames (reference
  * mars/tensor/base/ — one operand file per function: ravel.py,
  * swapaxes.py, moveaxis.py, squeeze.py, flip*.py, roll.py, split.py,
  * vstack.py and siblings; mars/tensor/merge/ for the stack family).
  *
  * Representation: a COO frame has one BIGINT column per axis (caller
  * names them, e.g. i, j, k) and a value column `v`; absent cells are
  * implicit zeros. The reference re-tiles dense chunks for each of
  * these ops; in COO form every one of them is *index arithmetic* —
  * a projection, a filter, or a union with index offsets — so each op
  * is zero-shuffle and scan-speed at any scale (the 100 TB cost is the
  * scan; nothing here ever exchanges). Shapes are not carried by the
  * frame, so shape-dependent ops take explicit axis lengths, exactly
  * like the reference operands carry `shape` on the Tileable.
  *
  * Everything is exact BIGINT arithmetic end-to-end → every op in this
  * file is bit-exactly oracle-able.
  */
object TensorShape {

  private def idxCols(idx: Seq[String]): Seq[Column] = idx.map(col)

  /** numpy swapaxes (base/swapaxes.py): exchange two axes — a pure
    * projection that renames the two index columns. */
  def swapaxes(a: DataFrame, idx: Seq[String], ax1: Int, ax2: Int): DataFrame = {
    require(ax1 >= 0 && ax1 < idx.size && ax2 >= 0 && ax2 < idx.size,
      s"swapaxes: axes out of range for ${idx.size}-d: $ax1, $ax2")
    val order = idx.indices.map { k =>
      if (k == ax1) ax2 else if (k == ax2) ax1 else k
    }
    a.select(order.map(src => col(idx(src))).zip(idx)
      .map { case (c, name) => c.as(name) } :+ col("v"): _*)
  }

  /** numpy moveaxis (base/moveaxis.py): move one axis to a new
    * position, others keep relative order — projection only. */
  def moveaxis(a: DataFrame, idx: Seq[String], from: Int, to: Int): DataFrame = {
    require(from >= 0 && from < idx.size && to >= 0 && to < idx.size,
      s"moveaxis: axes out of range for ${idx.size}-d: $from, $to")
    val rest = idx.indices.filterNot(_ == from)
    val order = (rest.take(to) :+ from) ++ rest.drop(to)
    a.select(order.map(src => col(idx(src))).zip(idx)
      .map { case (c, name) => c.as(name) } :+ col("v"): _*)
  }

  /** numpy rollaxis (base/rollaxis.py): roll `axis` until it lies at
    * `start` — the legacy cousin of moveaxis with numpy's off-by-one
    * rule (start > axis inserts BEFORE start, so the effective target
    * is start − 1). */
  def rollaxis(a: DataFrame, idx: Seq[String], axis: Int, start: Int): DataFrame =
    moveaxis(a, idx, axis, if (start > axis) start - 1 else start)

  /** numpy ravel, C order (base/ravel.py): flat = Σ i_k · stride_k with
    * row-major strides from `shape`. One projection; the flat index is
    * exact BIGINT for products < 2^63. */
  def ravel(a: DataFrame, idx: Seq[String], shape: Seq[Long],
      out: String = "flat"): DataFrame = {
    require(idx.size == shape.size && shape.forall(_ > 0),
      s"ravel: shape $shape must match ${idx.size} axes and be positive")
    val strides = shape.scanRight(1L)(_ * _).tail // C-order strides
    val flat = idx.zip(strides)
      .map { case (c, s) => col(c) * lit(s) }
      .reduce(_ + _)
    a.select(flat.cast("long").as(out), col("v"))
  }

  /** numpy squeeze (base/squeeze.py): drop a length-1 axis. The COO
    * contract is checked loudly — a cell off the hyperplane means the
    * axis was not length 1. */
  def squeeze(a: DataFrame, idx: Seq[String], axis: Int): DataFrame = {
    require(axis >= 0 && axis < idx.size, s"squeeze: bad axis $axis")
    val guard = when(col(idx(axis)) =!= 0L,
      raise_error(concat(lit(s"squeeze: axis $axis not length 1 at index "),
        col(idx(axis)).cast("string")))).otherwise(col("v"))
    a.select(idx.zipWithIndex.collect { case (c, k) if k != axis => col(c) } :+
      guard.as("v"): _*)
  }

  /** numpy expand_dims (base/expand_dims.py): insert a length-1 axis at
    * `pos` named `name` — a projection adding a constant-0 index. */
  def expandDims(a: DataFrame, idx: Seq[String], pos: Int, name: String): DataFrame = {
    require(pos >= 0 && pos <= idx.size, s"expand_dims: bad position $pos")
    val cols = (idx.take(pos).map(col) :+ lit(0L).as(name)) ++
      idx.drop(pos).map(col)
    a.select(cols :+ col("v"): _*)
  }

  /** numpy flip along one axis (base/flip.py; fliplr.py = axis 1,
    * flipud.py = axis 0): i → n−1−i, a pure projection. */
  def flip(a: DataFrame, idx: Seq[String], axis: Int, n: Long): DataFrame = {
    require(axis >= 0 && axis < idx.size && n > 0,
      s"flip: bad axis $axis or length $n")
    a.select(idx.zipWithIndex.map { case (c, k) =>
      if (k == axis) (lit(n - 1) - col(c)).as(c) else col(c)
    } :+ col("v"): _*)
  }

  /** numpy roll along one axis (base/roll.py): i → (i + shift) mod n,
    * shift may be negative — pmod keeps the result in [0, n). */
  def roll(a: DataFrame, idx: Seq[String], axis: Int, shift: Long, n: Long): DataFrame = {
    require(axis >= 0 && axis < idx.size && n > 0,
      s"roll: bad axis $axis or length $n")
    a.select(idx.zipWithIndex.map { case (c, k) =>
      if (k == axis) pmod(col(c) + lit(shift), lit(n)).as(c) else col(c)
    } :+ col("v"): _*)
  }

  /** The stack family (merge/vstack.py, hstack.py, dstack.py,
    * column_stack.py, concatenate.py): concatenate COO frames along
    * `axis` by offsetting that axis with the cumulative lengths of the
    * earlier operands. `shapes` gives each operand's FULL shape so the
    * numpy contract — all non-concat axis lengths equal — is enforced
    * up front (r11 ADVICE: the old sizes-only form silently accepted
    * ragged operands numpy would raise on). A union of projections —
    * no shuffle, and at scale the union is exactly as parallel as its
    * inputs. */
  def concatAxis(frames: Seq[DataFrame], idx: Seq[String], axis: Int,
      shapes: Seq[Seq[Long]]): DataFrame = {
    require(frames.nonEmpty && frames.size == shapes.size,
      s"concatAxis: ${frames.size} frames but ${shapes.size} shapes")
    require(axis >= 0 && axis < idx.size, s"concatAxis: bad axis $axis")
    require(shapes.forall(_.size == idx.size),
      s"concatAxis: every shape must have ${idx.size} dims, got $shapes")
    for (k <- idx.indices if k != axis) {
      val lens = shapes.map(_(k)).distinct
      require(lens.size == 1,
        s"concatAxis: off-axis $k lengths differ across operands: " +
          s"${shapes.map(_(k))} (numpy concatenate would raise)")
    }
    val sizes = shapes.map(_(axis))
    val offsets = sizes.scanLeft(0L)(_ + _)
    frames.zip(offsets).map { case (f, off) =>
      f.select(idx.zipWithIndex.map { case (c, k) =>
        if (k == axis) (col(c) + lit(off)).as(c) else col(c)
      } :+ col("v"): _*)
    }.reduce(_ unionByName _)
  }

  /** numpy split / array_split / vsplit / hsplit / dsplit
    * (base/split.py and siblings) — in COO form one labeled frame:
    * `part` = which piece, the split axis re-based to the piece-local
    * index. `bounds` are the interior cut points (ascending). A single
    * projection; callers wanting separate frames filter on `part`. */
  def splitAxis(a: DataFrame, idx: Seq[String], axis: Int,
      bounds: Seq[Long]): DataFrame = {
    require(axis >= 0 && axis < idx.size, s"splitAxis: bad axis $axis")
    require(bounds == bounds.sorted && bounds.distinct == bounds,
      s"splitAxis: bounds must be strictly ascending: $bounds")
    val ax = col(idx(axis))
    val part = bounds.foldLeft(lit(0L)) { (acc, b) =>
      when(ax >= b, acc + 1L).otherwise(acc)
    }
    val rebase = bounds.foldLeft(lit(0L)) { (acc, b) =>
      when(ax >= b, lit(b)).otherwise(acc)
    }
    a.select(part.as("part") +: idx.zipWithIndex.map { case (c, k) =>
      if (k == axis) (ax - rebase).as(c) else col(c)
    } :+ col("v"): _*)
  }

  /** numpy argwhere (indexing/argwhere.py): index tuples of the
    * non-zero cells in row-major order — for COO that is the index
    * projection of cells with v ≠ 0 (callers order by the axes). */
  def argwhere(a: DataFrame, idx: Seq[String]): DataFrame =
    a.filter(col("v") =!= 0).select(idxCols(idx): _*)

  /** numpy take along one axis (indexing/take.py): gather positions
    * `positions` (in order) — the output axis index is the POSITION in
    * the request, duplicates allowed, like numpy fancy indexing. The
    * positions list broadcasts; the tensor side never shuffles. */
  def takeAxis(a: DataFrame, idx: Seq[String], axis: Int,
      positions: Seq[Long]): DataFrame = {
    require(axis >= 0 && axis < idx.size, s"takeAxis: bad axis $axis")
    val spark = a.sparkSession
    import spark.implicits._
    val sel = positions.zipWithIndex
      .map { case (p, o) => (p, o.toLong) }.toDF("__src", "__out")
    a.join(broadcast(sel), col(idx(axis)) === col("__src"))
      .select(idx.zipWithIndex.map { case (c, k) =>
        if (k == axis) col("__out").as(c) else col(c)
      } :+ col("v"): _*)
  }

  /** numpy compress / boolean-mask extract along an axis
    * (indexing/compress.py, extract.py): keep the selected indices and
    * re-base to the compacted coordinate — equivalent to takeAxis of
    * the true positions. */
  def compressAxis(a: DataFrame, idx: Seq[String], axis: Int,
      mask: Seq[Boolean]): DataFrame =
    takeAxis(a, idx, axis,
      mask.zipWithIndex.collect { case (true, p) => p.toLong })

  /** numpy broadcast_to a new leading axis of length `n`
    * (base/broadcast_to.py): replicate every cell for each new-axis
    * value — sequence + explode so the fan-out happens executor-side
    * (rows × n, the inherent output size; no shuffle). */
  def broadcastToAxis(a: DataFrame, idx: Seq[String], name: String,
      n: Long): DataFrame = {
    require(n > 0, s"broadcastToAxis: need n > 0: $n")
    a.select(explode(sequence(lit(0L), lit(n - 1))).as(name) +:
      (idxCols(idx) :+ col("v")): _*)
  }

  /** numpy tile along one axis (base/tile.py): reps copies laid end to
    * end — i → i + r·n for r in [0, reps). Same executor-side fan-out
    * shape as broadcast_to. */
  def tileAxis(a: DataFrame, idx: Seq[String], axis: Int, reps: Long,
      n: Long): DataFrame = {
    require(axis >= 0 && axis < idx.size && reps > 0 && n > 0,
      s"tileAxis: bad axis/reps/n: $axis/$reps/$n")
    a.select(explode(sequence(lit(0L), lit(reps - 1))).as("__r") +:
        (idxCols(idx) :+ col("v")): _*)
      .select(idx.zipWithIndex.map { case (c, k) =>
        if (k == axis) (col(c) + col("__r") * lit(n)).as(c) else col(c)
      } :+ col("v"): _*)
  }

  /** numpy partition / argpartition (base/partition.py,
    * argpartition.py) per group: numpy only promises the kth-position
    * element is in sorted place with smaller values before and larger
    * after — the deterministic, engine-portable form of that contract
    * is the three-way split under the total order (value, id):
    * side 0 = the kth element's strict predecessors, 1 = the kth
    * element itself, 2 = its successors. argpartition is the same rows
    * read as ids. One window per group — at scale this is the standard
    * per-key window shape (mega-key groups go through the documented
    * prefix valve like every other ordered-prefix window). */
  def partitionSplit(a: DataFrame, group: Seq[String], id: String,
      valueCol: String, kth: Long): DataFrame = {
    require(kth >= 0, s"partitionSplit: kth must be ≥ 0: $kth")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group.map(col): _*)
      .orderBy(col(valueCol).asc, col(id).asc)
    val pos = row_number().over(w).cast("long") - 1L
    a.withColumn("side",
      when(pos < kth, 0L).when(pos === kth, 1L).otherwise(2L))
  }

  /** numpy repeat along one axis (base/repeat.py): each index repeated
    * `reps` times consecutively — i → i·reps + r. */
  def repeatAxis(a: DataFrame, idx: Seq[String], axis: Int,
      reps: Long): DataFrame = {
    require(axis >= 0 && axis < idx.size && reps > 0,
      s"repeatAxis: bad axis/reps: $axis/$reps")
    a.select(explode(sequence(lit(0L), lit(reps - 1))).as("__r") +:
        (idxCols(idx) :+ col("v")): _*)
      .select(idx.zipWithIndex.map { case (c, k) =>
        if (k == axis) (col(c) * lit(reps) + col("__r")).as(c) else col(c)
      } :+ col("v"): _*)
  }

  /** numpy atleast_2d (base/atleast_2d.py): promote to ≥ 2 axes by
    * PREPENDING a length-1 axis ((N,) → (1,N)) — a pure projection.
    * Returns the frame plus its new index order. */
  def atleast2d(a: DataFrame, idx: Seq[String],
      name: String): (DataFrame, Seq[String]) =
    if (idx.size >= 2) (a, idx)
    else (expandDims(a, idx, 0, name), name +: idx)

  /** numpy atleast_3d (base/atleast_3d.py): numpy's placement rules —
    * (M,N) APPENDS ((M,N) → (M,N,1)); (N,) becomes (1,N,1). Pure
    * projections. `names` supplies the leading/trailing axis names. */
  def atleast3d(a: DataFrame, idx: Seq[String],
      names: (String, String)): (DataFrame, Seq[String]) =
    idx.size match {
      case n if n >= 3 => (a, idx)
      case 2 => (expandDims(a, idx, 2, names._2), idx :+ names._2)
      case _ =>
        val (d2, i2) = atleast2d(a, idx, names._1)
        (expandDims(d2, i2, i2.size, names._2), i2 :+ names._2)
    }

  /** numpy broadcast_arrays (base/broadcast_arrays.py): expand both
    * COO operands to the common broadcast shape. Shorter operands gain
    * leading length-1 axes (numpy's right-aligned rule); each length-1
    * axis facing length n replicates EXECUTOR-side
    * (explode(sequence(0, n−1)) — rows × n is the inherent output
    * size; no shuffle, scan-parallel at any scale like
    * [[broadcastToAxis]]). Both outputs carry `outIdx` as their index
    * columns; the common shape is returned alongside. */
  def broadcastArrays(a: DataFrame, aIdx: Seq[String], aShape: Seq[Long],
      b: DataFrame, bIdx: Seq[String], bShape: Seq[Long],
      outIdx: Seq[String]): (DataFrame, DataFrame, Seq[Long]) = {
    require(aIdx.size == aShape.size && bIdx.size == bShape.size,
      "broadcastArrays: index/shape rank mismatch")
    val rank = math.max(aShape.size, bShape.size)
    require(outIdx.size == rank,
      s"broadcastArrays: outIdx must have rank $rank: $outIdx")
    val aS = Seq.fill(rank - aShape.size)(1L) ++ aShape
    val bS = Seq.fill(rank - bShape.size)(1L) ++ bShape
    val out = aS.zip(bS).map { case (x, y) =>
      require(x == y || x == 1L || y == 1L,
        s"broadcast_arrays: incompatible axis lengths $x vs $y")
      math.max(x, y)
    }
    def expand(df: DataFrame, idx: Seq[String], mine: Seq[Long]): DataFrame = {
      val pad = rank - idx.size
      val padded = df.select(
        (0 until pad).map(k => lit(0L).as(outIdx(k))) ++
          idx.zipWithIndex.map { case (c, k) => col(c).as(outIdx(pad + k)) } :+
          col("v"): _*)
      out.zip(mine).zipWithIndex.foldLeft(padded) { case (d, ((n, m), k)) =>
        if (m == n) d
        else d.select(d.columns.toSeq.map { c =>
          if (c == outIdx(k)) explode(sequence(lit(0L), lit(n - 1))).as(c)
          else col(c)
        }: _*)
      }
    }
    (expand(a, aIdx, aS), expand(b, bIdx, bS), out)
  }
}
