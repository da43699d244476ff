package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions (no UDFs).
  *
  * Reference surface: pairwise cosine/euclidean distances + top-k
  * (mars/learn/metrics/pairwise/, mars/opcodes.py:2200-2204) and KNN
  * (mars/learn/neighbors/).
  *
  * All arithmetic is double-precision with a sequential left-to-right fold
  * (`aggregate`), so results are bit-deterministic and reproducible across
  * engines that fold the same way — which the DuckDB oracle does via
  * list_sum(list_transform(...)).
  */
object VectorFunctions {

  /** Elementwise product folded to a double dot product. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSqD(a: Column): Column = dotD(a, a)

  /** Row-wise argmax (mt.argmax(axis=1)): 0-based index of the first
    * occurrence of the maximum — numpy's tie rule. Pure expression. */
  def argmax(a: Column): Column =
    (array_position(a, array_max(a)) - 1).cast("long")

  /** Row-wise top-k values, descending (mt.topk along axis=1): sort +
    * reverse + slice, all inside the row — no shuffle, no UDF. */
  def topKValues(a: Column, k: Int): Column =
    slice(reverse(array_sort(a)), 1, k)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(normSqD(a)) * sqrt(normSqD(b)))

  /** Euclidean distance in double precision. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Random-hyperplane signature for cosine LSH: `nBits` deterministic
    * pseudo-random hyperplanes (seeded hash-based coefficients), packed into
    * a string of sign bits. Two vectors with high cosine similarity share
    * most sign bits.
    *
    * The nBits×dim coefficient matrix is a single `typedlit` array-of-arrays
    * literal, and the per-bit dot product is a zip_with/aggregate fold — so
    * plan size is O(1) in both dim and nBits (the naive unrolled form is
    * dim×nBits expression nodes, a plan-size bomb at embedding dims ≥ 768). */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val coefs = typedlit((0 until nBits).map { b =>
      (0 until dim).map { j =>
        // coef in [-1, 1), splitmix-mixed from (seed, bit, dim index)
        mix64(seed + b.toLong * 1000003L + j.toLong).toDouble / Long.MaxValue.toDouble
      }
    })
    val bits = transform(coefs, row =>
      when(
        aggregate(
          zip_with(row, vec, (c, x) => c * x.cast("double")),
          lit(0.0),
          (acc, v) => acc + v) >= 0,
        lit("1")).otherwise(lit("0")))
    array_join(bits, "")
  }

  /** Dense matrix-vector product as a pure expression: `matrix` is a
    * k×dim literal (typedlit, one Literal node), the result a length-k
    * array<double>. The expression-level `dot` of the reference
    * (arithmetic/dot.py:30) — per-row projection at scan speed with no
    * shuffle; also the building block for custom PCA/whitening projections. */
  def matvec(matrix: Seq[Seq[Double]], vec: Column): Column = {
    val m = typedlit(matrix)
    transform(m, row =>
      aggregate(zip_with(row, vec, (c, x) => c * x.cast("double")),
        lit(0.0), (acc, v) => acc + v))
  }

  // ---- tensor/base per-row array manipulation (reference mars/tensor/
  //      base/: roll.py, flip.py, tile.py, repeat.py, ediff1d.py,
  //      searchsorted.py) — pure array expressions, no UDFs, no shuffle.

  /** numpy roll along the row axis: cyclic shift right by k (any sign or
    * magnitude — reduced mod length like numpy). Empty arrays pass
    * through. */
  def roll(a: Column, k: Int): Column = {
    val n = size(a)
    val s = pmod(lit(k), n)
    when(n === 0 || s === 0, a)
      .otherwise(concat(slice(a, n - s + 1, s), slice(a, lit(1), n - s)))
  }

  /** numpy flip along the row axis. */
  def flip(a: Column): Column = reverse(a)

  /** numpy tile: the whole array repeated k times end-to-end. */
  def tile(a: Column, k: Int): Column =
    flatten(array_repeat(a, k))

  /** numpy repeat: each element repeated k times in place. */
  def repeatElems(a: Column, k: Int): Column =
    flatten(transform(a, x => array_repeat(x, k)))

  /** numpy ediff1d: consecutive differences a[i+1] − a[i] as a zip of the
    * tail slice with the init slice — preserves the element type and is
    * naturally empty for arrays shorter than 2 (a `sequence(2, n)` index
    * walk would count DOWN for n < 2). */
  def ediff1d(a: Column): Column = {
    val m = greatest(size(a) - 1, lit(0))
    zip_with(slice(a, lit(2), m), slice(a, lit(1), m), (x, y) => x - y)
  }

  /** numpy searchsorted over a sorted row array: insertion index for v,
    * side='right' (count of elements ≤ v); `side='left'` is the strict
    * variant. */
  def searchSorted(sortedArr: Column, v: Column, left: Boolean = false): Column =
    size(filter(sortedArr,
      x => if (left) x < v else x <= v)).cast("long")

  /** numpy take over the row axis (reference tensor/indexing/getitem.py
    * fancy indexing / numpy take): literal index list, negative indices
    * count from the end like numpy. Out-of-range indices fail loudly
    * (ANSI element_at), matching numpy's IndexError. */
  def take(a: Column, idx: Seq[Int]): Column = {
    require(idx.nonEmpty, "take needs at least one index")
    array(idx.map(i => element_at(a, if (i >= 0) i + 1 else i)): _*)
  }

  /** numpy compress over the row axis (reference
    * tensor/indexing/compress.py): keep a[i] where the literal mask is
    * true; like numpy, the mask may be shorter than the row (the tail is
    * dropped) but a mask longer than the row fails loudly. */
  def compress(a: Column, mask: Seq[Boolean]): Column = {
    val kept = mask.zipWithIndex.collect { case (true, i) =>
      element_at(a, i + 1)
    }
    if (kept.isEmpty) slice(a, 1, 0) else array(kept: _*)
  }

  /** numpy extract (reference tensor/indexing/extract.py): elements of
    * `a` where the parallel condition array is true — the column-valued
    * sibling of [[compress]]'s literal mask. Rows where the arrays have
    * different lengths fail loudly (zip_with would silently null-pad). */
  def extract(cond: Column, a: Column): Column = {
    val checked = when(size(cond) === size(a), cond).otherwise(
      raise_error(concat(lit("extract: condition length "),
        size(cond).cast("string"), lit(" != array length "),
        size(a).cast("string"))))
    val z = zip_with(checked, a, (c, x) => struct(c.as("c"), x.as("x")))
    transform(filter(z, s => s.getField("c")), s => s.getField("x"))
  }

  /** numpy flatnonzero (reference tensor/indexing/flatnonzero.py):
    * 0-based indices of the non-zero (and non-null) elements. */
  def flatnonzero(a: Column): Column =
    filter(transform(a, (x, i) => when(x =!= 0, i.cast("long"))),
      i => i.isNotNull)

  /** numpy clip, elementwise over a row array (reference
    * tensor/arithmetic/clip.py:154; the frame-level scalar clip lives on
    * GraftFrame). */
  def clipArray(a: Column, lo: Double, hi: Double): Column = {
    require(lo <= hi, s"clip needs lo <= hi, got $lo > $hi")
    transform(a, x => least(greatest(x, lit(lo)), lit(hi)))
  }

  /** numpy where(cond, a, b), elementwise over three parallel row arrays
    * (reference tensor/base/where.py). Length mismatches fail loudly. */
  def whereArray(cond: Column, a: Column, b: Column): Column = {
    val checked = when(size(cond) === size(a) && size(a) === size(b), cond)
      .otherwise(raise_error(concat(
        lit("whereArray: lengths differ: cond="), size(cond).cast("string"),
        lit(" a="), size(a).cast("string"),
        lit(" b="), size(b).cast("string"))))
    val ab = zip_with(a, b, (x, y) => struct(x.as("x"), y.as("y")))
    zip_with(checked, ab, (c, s) =>
      when(c, s.getField("x")).otherwise(s.getField("y")))
  }

  /** numpy choose (reference tensor/indexing/choose.py): out[k] =
    * choices[sel[k]][k] — per-element selection among N parallel
    * arrays. Out-of-range selectors fail loudly (numpy mode='raise'). */
  def choose(sel: Column, choices: Seq[Column]): Column = {
    require(choices.nonEmpty, "choose needs at least one choice array")
    val opts = array(choices: _*)
    transform(sel, (s, i) =>
      when(s >= 0 && s < choices.length,
        element_at(element_at(opts, s.cast("int") + 1), i + 1))
        .otherwise(raise_error(concat(lit("choose: selector "),
          s.cast("string"), lit(s" out of range [0, ${choices.length})")))))
  }

  /** numpy unravel_index, C order (reference
    * tensor/indexing/unravel_index.py): coordinates of a flat index in
    * `shape`, coord_k = (flat / stride_k) % shape_k with row-major
    * strides. Flat indices outside [0, prod(shape)) fail loudly. */
  def unravelIndex(flat: Column, shape: Seq[Long]): Column = {
    require(shape.nonEmpty && shape.forall(_ > 0),
      s"unravelIndex needs a positive shape: $shape")
    val total = shape.product
    require(total <= (1L << 53), s"shape too large for exact math: $shape")
    val checked = when(flat >= 0 && flat < total, flat.cast("long"))
      .otherwise(raise_error(concat(lit("unravel_index: "),
        flat.cast("string"), lit(s" out of range [0, $total)"))))
    val strides = shape.tails.toSeq.tail.map(_.product)
    // exact integer division: subtract the remainder first so the double
    // divide is of a multiple of st (quotient ≤ 2^53 → exact)
    array(strides.zip(shape).map { case (st, dim) =>
      pmod(((checked - pmod(checked, lit(st))) / lit(st)).cast("long"),
        lit(dim))
    }: _*)
  }

  // ---- tensor/base editing + order (reference mars/tensor/base/:
  //      insert.py, delete.py, array_split.py, argsort.py/sort.py) —
  //      pure slice/concat/struct-sort expressions, no UDFs.

  /** numpy insert at a literal position (negative counts from the end;
    * positions beyond the ends clamp, numpy's convention). */
  def insertAt(a: Column, pos: Int, v: Column): Column = {
    val n = size(a)
    val p =
      if (pos >= 0) least(lit(pos), n)
      else greatest(n + lit(pos), lit(0))
    concat(slice(a, lit(1), p), array(v), slice(a, p + 1, n - p))
  }

  /** numpy delete at a literal position (negative from the end);
    * out-of-range fails loudly like numpy's IndexError. */
  def deleteAt(a: Column, pos: Int): Column = {
    val n = size(a)
    val p0 = if (pos >= 0) lit(pos) else n + lit(pos)
    val p = when(p0 >= 0 && p0 < n, p0).otherwise(raise_error(concat(
      lit(s"deleteAt: index $pos out of range for length "), n.cast("string"))))
    concat(slice(a, lit(1), p), slice(a, p + 2, n - p - 1))
  }

  /** numpy array_split into k parts: the first (n mod k) parts carry
    * ⌈n/k⌉ elements, the rest ⌊n/k⌋ — uneven lengths allowed, unlike
    * strict split. Returns an array of k subarrays. */
  def arraySplit(a: Column, k: Int): Column = {
    require(k >= 1, s"array_split needs k >= 1: $k")
    val n = size(a)
    // Column `/` is double division — floor back to the integer quotient
    val base = floor(n / lit(k)).cast("int")
    val rem = n % k
    transform(sequence(lit(0), lit(k - 1)), i =>
      slice(a, i * base + least(i, rem) + 1,
        when(i < rem, base + 1).otherwise(base)))
  }

  /** numpy argsort over a row array: 0-based indices sorting ascending,
    * ties stable by original position (struct sort orders by value then
    * index — the same lexicographic rule any engine applies). */
  /** mars argtopk / topk (reference tensor/base/argtopk.py, topk.py):
    * indices (0-based) / values of the k largest elements, descending
    * value with ascending-index ties (deterministic; PSRS-free — per
    * row the array is small by contract). k > len returns all, like
    * slice. NaNs compare neither greater nor less, so they keep index
    * order at the tail of equal runs — fixtures carry none. */
  private def topPairs(a: Column, k: Int): Column = {
    require(k >= 1, s"topk needs k >= 1: $k")
    val pairs = zip_with(a, sequence(lit(0), size(a) - 1),
      (v, i) => struct(v.as("v"), i.as("i")))
    val sorted = array_sort(pairs, (l, r) =>
      when(l.getField("v") > r.getField("v"), -1)
        .when(l.getField("v") < r.getField("v"), 1)
        .otherwise((l.getField("i") - r.getField("i")).cast("int")))
    slice(sorted, 1, k)
  }

  def argtopkRow(a: Column, k: Int): Column =
    transform(topPairs(a, k), s => s.getField("i").cast("long"))

  def topkRow(a: Column, k: Int): Column =
    transform(topPairs(a, k), s => s.getField("v"))

  def argsortRow(a: Column): Column =
    when(size(a) === 0, array().cast("array<long>")).otherwise(
      transform(
        array_sort(zip_with(a, sequence(lit(0), size(a) - 1),
          (v, i) => struct(v.as("v"), i.as("i")))),
        s => s.getField("i").cast("long")))

  // ---- tensor reduction comparisons (reference mars/tensor/reduction/
  //      allclose.py, array_equal.py; nanargmax.py/nanargmin.py) —
  //      per-row expressions; reduce across rows with bool_and/every.

  /** numpy allclose over two parallel row arrays: every pair within
    * |a−b| ≤ atol + rtol·|b| (numpy defaults); false on length
    * mismatch like a failed broadcast. */
  def allcloseRows(a: Column, b: Column, rtol: Double = 1e-5,
      atol: Double = 1e-8): Column =
    size(a) === size(b) &&
      forall(zip_with(a, b, (x, y) =>
        abs(x.cast("double") - y.cast("double")) <=
          lit(atol) + lit(rtol) * abs(y.cast("double"))), c => c)

  /** numpy array_equal over two row arrays: same shape, same elements. */
  def arrayEqualRows(a: Column, b: Column): Column =
    size(a) === size(b) &&
      forall(zip_with(a, b, (x, y) => x === y), c => c)

  /** numpy nanargmax/nanargmin: 0-based index of the extreme non-NaN
    * element (ties → first, numpy convention); null for all-NaN rows. */
  def nanArgmax(a: Column): Column = {
    val clean = filter(a, x => !isnan(x.cast("double")))
    val m = array_max(clean)
    when(size(clean) > 0, array_position(a, m).cast("long") - 1L)
  }
  def nanArgmin(a: Column): Column = {
    val clean = filter(a, x => !isnan(x.cast("double")))
    val m = array_min(clean)
    when(size(clean) > 0, array_position(a, m).cast("long") - 1L)
  }

  // ---- tensor/base set routines (reference mars/tensor/base/: unique.py
  //      per-row axis, in1d.py, setdiff1d.py; numpy also defines
  //      intersect1d/union1d in the same family) — numpy returns SORTED
  //      deduplicated results, so every op ends in sort∘distinct.

  /** numpy unique over a row array: sorted distinct elements. */
  def unique1d(a: Column): Column = array_sort(array_distinct(a))

  /** numpy in1d (reference tensor/base/in1d.py): boolean mask of which
    * elements of `a` appear in `b`. */
  def in1d(a: Column, b: Column): Column =
    transform(a, x => array_contains(b, x))

  /** numpy intersect1d: sorted unique elements present in both arrays. */
  def intersect1d(a: Column, b: Column): Column =
    array_sort(array_distinct(array_intersect(a, b)))

  /** numpy setdiff1d (reference tensor/base/setdiff1d.py): sorted unique
    * elements of `a` not in `b`. */
  def setdiff1d(a: Column, b: Column): Column =
    array_sort(array_distinct(array_except(a, b)))

  /** numpy union1d: sorted unique elements of either array. */
  def union1d(a: Column, b: Column): Column =
    array_sort(array_distinct(concat(a, b)))

  /** splitmix64 finalizer — deterministic pseudo-random 64-bit mix. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
