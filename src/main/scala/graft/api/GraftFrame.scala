package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import graft.functions.aggregates
import graft.operators.{Curation, Dedup, Sessionize, Windows}

/** The engine's user-facing frame: a pandas-flavored fluent API over
  * `DataFrame` covering the reference's ~170-operator dataframe surface
  * (mars/dataframe/core.py:2243). Every method is a thin declarative
  * emission of Column expressions / DataFrame transformations — Catalyst
  * remains the planner and optimizer, so predicate pushdown, column
  * pruning, join selection and AQE all apply to chains built through this
  * API exactly as to raw Spark code.
  *
  * Ordering convention (SURVEY §7.1): there is no implicit pandas row
  * index; order-sensitive operators (shift, diff, rolling, cumulative,
  * per-group head, dedup keep=first) take explicit partition/order columns.
  * The reference
  * itself relaxes index guarantees under parallelism (Note [Index of Merge],
  * mars/dataframe/merge/tests/test_merge_execution.py:44-50).
  *
  * Declared-index propagation (r10, ADVICE r9): the [[setIndex]]-declared
  * index survives every transformation that keeps ALL of its columns —
  * select/assign/eval/query/filter/rename (names mapped)/insert/drop/
  * prefix/suffix/sortValues/head/fillna/dropna(Thresh)/astype/clip and
  * the rank family — and is cleared whenever an index
  * column is dropped or the shape changes (reshape, groupby, joins other
  * than the aligned family, which re-declare their keys). So aligned
  * binops behave identically regardless of which of these methods ran in
  * between.
  */
final case class GraftFrame(df: DataFrame, index: Seq[String] = Nil) {

  /** Result frame keeping the declared index iff every index column is
    * still present (partial survival would silently change aligned-op
    * keys, so it clears instead). */
  private def sameIndex(d: DataFrame): GraftFrame = {
    val cols = d.columns.toSet
    GraftFrame(d, if (index.nonEmpty && index.forall(cols)) index else Nil)
  }

  // ---------------------------------------------------------------- access
  /** Column by name (pandas `df[col]`, reference indexing/getitem.py:44). */
  def apply(name: String): Column = df(name)
  def columns: Seq[String] = df.columns.toSeq
  def schema: StructType = df.schema

  // ------------------------------------------------------- projection §2.3
  /** Column subset (reference indexing/getitem.py:266). */
  def select(cols: String*): GraftFrame = sameIndex(df.select(cols.map(df(_)): _*))
  def selectCols(cols: Column*): GraftFrame = sameIndex(df.select(cols: _*))

  /** `df[c] = expr` (reference indexing/setitem.py:35). */
  def assign(pairs: (String, Column)*): GraftFrame =
    sameIndex(pairs.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })

  /** String-expression assign — the reference's `df.eval` (base/eval.py:263);
    * Catalyst is the expression engine. */
  def eval(name: String, sqlExpr: String): GraftFrame =
    sameIndex(df.withColumn(name, expr(sqlExpr)))

  /** Row filter from a SQL boolean expression — the reference's `df.query`
    * (base/eval.py:263 with DataFrameBoolEvalToQuery). */
  def query(sqlExpr: String): GraftFrame = sameIndex(df.filter(sqlExpr))

  /** [[eval]] accepting the pandas/Python expression dialect (`and/or/
    * not`, `&/|/~`, `**`, `//`, `in [..]`, True/None, backtick columns) —
    * the reference parses the same dialect from the Python ast
    * (base/eval.py:73-111); here [[graft.functions.PandasExpr]] translates
    * it onto Catalyst so ported notebook expressions run unchanged. */
  def evalPandas(name: String, pyExpr: String): GraftFrame =
    eval(name, graft.functions.PandasExpr.translate(pyExpr))

  /** [[query]] accepting the pandas/Python expression dialect. */
  def queryPandas(pyExpr: String): GraftFrame =
    query(graft.functions.PandasExpr.translate(pyExpr))

  /** pandas `df.eval("c = a + b")` assignment form, one assignment per
    * line; later lines see earlier targets, exactly like pandas
    * multiline eval (reference base/eval.py ast.Assign branch). */
  def evalPandas(program: String): GraftFrame =
    graft.functions.PandasExpr.translateAssignments(program)
      .foldLeft(this) { case (f, (target, sqlExpr)) => f.eval(target, sqlExpr) }

  def filter(cond: Column): GraftFrame = sameIndex(df.filter(cond))

  /** Conditional replace keeping shape (reference indexing/where.py:28):
    * pandas `where` keeps rows satisfying cond, replaces others. */
  def whereMask(col: String, cond: Column, other: Column): GraftFrame =
    assign(col -> when(cond, df(col)).otherwise(other))

  /** Drop columns (reference base/drop.py:29). */
  def drop(cols: String*): GraftFrame = sameIndex(df.drop(cols: _*))

  /** Rename columns (reference indexing/rename.py:26); declared-index
    * names follow the mapping. */
  def rename(mapping: (String, String)*): GraftFrame = {
    val m = mapping.toMap
    GraftFrame(
      mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) },
      index.map(n => m.getOrElse(n, n)))
  }

  def addPrefix(p: String): GraftFrame =
    GraftFrame(df.toDF(df.columns.toSeq.map(p + _): _*), index.map(p + _))
  def addSuffix(s: String): GraftFrame =
    GraftFrame(df.toDF(df.columns.toSeq.map(_ + s): _*), index.map(_ + s))

  /** set_index (reference indexing/set_index.py): the engine's index IS a
    * set of ordinary columns (SURVEY §7.1) — setting the index moves the
    * named columns to the front AND records them as the frame's declared
    * index, which the aligned binary ops ([[arithAligned]],
    * [[arithAlignedSeries]]) use as their implicit join keys when no
    * explicit `on` is given (r9 — pandas alignment semantics without the
    * implicit-index machinery). */
  def setIndex(cols: String*): GraftFrame = {
    val rest = df.columns.filterNot(cols.contains)
    GraftFrame(df.select((cols ++ rest).map(df(_)): _*), cols.toSeq)
  }

  /** reset_index(drop=true) — the index columns stay as ordinary columns;
    * only the declared-index marker is cleared. With drop=false semantics
    * use [[withRowId]]-style explicit ids instead (there is no implicit
    * row order to restore). */
  def resetIndex(): GraftFrame = GraftFrame(df)

  // ------------------------------------------------- MultiIndex levels
  // (reference core.py:275 MultiIndex; SURVEY §1.4 divergence closed in
  // r12 for the LEVEL surface): the declared index is an ORDERED list of
  // columns, so pandas' hierarchical levels are positions in that list.
  // Levels address by position or by name, exactly like pandas.

  /** Level name at `level` (Int position or String name), validated. */
  private def levelName(level: Any): String = level match {
    case i: Int =>
      require(index.nonEmpty, "no declared index — call setIndex first")
      val p = if (i < 0) index.size + i else i
      require(p >= 0 && p < index.size,
        s"level $i out of range for ${index.size} index levels")
      index(p)
    case s: String =>
      require(index.contains(s), s"'$s' is not an index level ($index)")
      s
    case other => sys.error(s"level must be Int or String, got $other")
  }

  /** swaplevel(i, j) (pandas DataFrame.swaplevel): exchange two levels
    * in the declared order. Pure metadata + a front-column reorder. */
  def swapLevel(i: Any = 0, j: Any = 1): GraftFrame = {
    val (a, b) = (levelName(i), levelName(j))
    reorderLevels(index.map(n => if (n == a) b else if (n == b) a else n))
  }

  /** reorder_levels(order): new level order (positions or names) — must
    * be a permutation of the declared index. */
  def reorderLevels(order: Seq[Any]): GraftFrame = {
    val names = order.map(levelName)
    require(names.sorted == index.sorted && names.size == index.size,
      s"reorder_levels needs a permutation of $index, got $names")
    val rest = df.columns.filterNot(names.contains)
    GraftFrame(df.select((names ++ rest).map(df(_)): _*), names)
  }

  /** droplevel(level): remove one index level and its column entirely
    * (pandas semantics — the data in that level is discarded). Refuses
    * to drop the last level (a frame always keeps ≥ 0 levels; dropping
    * the only one is reset_index + drop, say that instead). */
  def dropLevel(level: Any): GraftFrame = {
    val n = levelName(level)
    require(index.size > 1,
      "cannot droplevel the only index level — use resetIndex().drop(...)")
    GraftFrame(df.drop(n), index.filterNot(_ == n))
  }

  /** xs(key, level): cross-section — rows where the level equals `key`,
    * with the matched level dropped (pandas drop_level=True default). */
  def xs(key: Any, level: Any): GraftFrame = {
    val n = levelName(level)
    val filtered = df.filter(df(n) === lit(key))
    if (index.size > 1) GraftFrame(filtered.drop(n), index.filterNot(_ == n))
    else GraftFrame(filtered.drop(n))
  }

  /** groupby(level=...) (pandas level-addressed grouping): group on the
    * named/positioned index levels. */
  def groupbyLevel(levels: Any*): GraftGroupBy =
    GraftGroupBy(df, levels.map(levelName))

  /** unstack(level): pivot one index level into columns for a single
    * value column — the remaining levels stay as the row key. `values`
    * is the explicit column universe (deterministic schema, no discovery
    * pass — the same contract as [[pivotTable]]). Duplicate (rest,
    * level) pairs are a pandas ValueError ("Index contains duplicate
    * entries, cannot reshape") — enforced LOUDLY here too (ADVICE r12):
    * each pivot cell aggregates (min, count) and the projection raises
    * at evaluation time when any cell holds > 1 row, instead of
    * silently taking min. */
  def unstackLevel(level: Any, valueCol: String, values: Seq[Any]): GraftFrame = {
    val n = levelName(level)
    val rest = index.filterNot(_ == n)
    require(rest.nonEmpty, "unstack needs ≥ 2 index levels")
    val p = df.groupBy(rest.map(df(_)): _*).pivot(n, values)
      .agg(min(df(valueCol)).as("__v"), count(lit(1)).as("__ct"))
    val out = p.select(rest.map(col) ++ values.map { v =>
      val s = v.toString
      // resolve via the DataFrame, not col(): a pivot value holding
      // column-reference metacharacters ('.', '`') would otherwise be
      // parsed as a nested-field path (ADVICE r13)
      when(p(s"${s}___ct") > 1L, raise_error(lit(
          s"unstack: duplicate index entries for level value '$s'")))
        .otherwise(p(s"${s}___v")).as(s)
    }: _*)
    GraftFrame(out, rest)
  }

  /** rename_axis / set_axis over columns (reference
    * indexing/rename_axis.py, set_axis.py): positional column renames. */
  def setAxis(names: Seq[String]): GraftFrame = {
    require(names.length == df.columns.length,
      s"set_axis needs ${df.columns.length} names, got ${names.length}")
    GraftFrame(df.toDF(names: _*))
  }

  /** Column subset by Spark type name (reference base/select_dtypes.py):
    * include/exclude match the `DataType.typeName` (e.g. "double", "long",
    * "string", "timestamp", "date", "decimal"). */
  def selectDtypes(include: Seq[String] = Nil, exclude: Seq[String] = Nil): GraftFrame = {
    def tn(f: org.apache.spark.sql.types.StructField) = f.dataType.typeName.takeWhile(_ != '(')
    val kept = df.schema.fields.filter { f =>
      (include.isEmpty || include.contains(tn(f))) && !exclude.contains(tn(f))
    }.map(_.name)
    require(kept.nonEmpty, s"select_dtypes removed every column (include=$include exclude=$exclude)")
    GraftFrame(df.select(kept.map(df(_)): _*))
  }

  /** Per-column data size (reference base/memory_usage.py, deep=True):
    * variable-width columns sum their byte lengths, fixed-width columns
    * count non-null values × the type's width. One distributed aggregate —
    * the reference runs the same per-chunk pandas memory_usage then sums. */
  def memoryUsage(): DataFrame = {
    import org.apache.spark.sql.types._
    val aggs = df.schema.fields.map { f =>
      val bytes = f.dataType match {
        case StringType | BinaryType => sum(coalesce(octet_length(df(f.name)), lit(0)))
        case dt => count(df(f.name)) * lit(dt.defaultSize)
      }
      bytes.cast("long").as(f.name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    GraftFrame(wide).melt(Nil, df.columns.toSeq, "column", "bytes").df
  }

  /** numpy digitize / searchsorted (tensor shape ops, opcodes.py:401-446):
    * index of the bin each value falls in given ascending edges —
    * right-open intervals like numpy's default (count of edges <= x). */
  def digitize(colName: String, out: String, edges: Seq[Double]): GraftFrame = {
    require(edges == edges.sorted, "digitize edges must be ascending")
    assign(out -> size(org.apache.spark.sql.functions.filter(typedlit(edges),
      e => df(colName).cast("double") >= e)).cast("long"))
  }

  /** dtype casts by column (reference base/astype.py:32). */
  def astype(casts: (String, String)*): GraftFrame =
    sameIndex(casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, d(c).cast(t)) })

  /** astype('category') — dictionary-encode a string column exactly like
    * the reference's two-pass category gathering (base/astype.py:32,
    * TO_CATEGORY_CHUNK): pass 1 collects the distinct category table with
    * sorted dense codes, pass 2 broadcast-joins the codes back. Returns
    * (frame + `<col>_code` int column, category table (code, value)).
    * Scale: the category table is small by definition (it's a dict encode);
    * the join is an explicit broadcast — no shuffle of the fact side. The
    * sorted-order window runs only over the distinct categories. */
  def astypeCategory(colName: String): (GraftFrame, GraftFrame) = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(colName))
    val categories = df.select(colName).where(df(colName).isNotNull).distinct()
      .withColumn("code", (row_number().over(w) - 1).cast("long"))
      .select(col("code"), col(colName).as("category"))
    val encoded = df.join(
      broadcast(categories.withColumnRenamed("category", colName)),
      Seq(colName), "left")
      .withColumnRenamed("code", s"${colName}_code")
    (GraftFrame(encoded), GraftFrame(categories))
  }

  /** pandas between_time over an explicit timestamp column (the
    * DatetimeIndex method, reference tseries surface; the implicit-index
    * form maps onto the explicit column per SURVEY §7.1): keep rows
    * whose UTC time-of-day lies in [start, end] inclusive (pandas
    * default bounds); start > end wraps across midnight. Times are
    * "HH:mm" or "HH:mm:ss". Pure filter — scan speed, pushdown-safe. */
  def betweenTime(tsCol: String, start: String, end: String): GraftFrame = {
    def secs(s: String): Int = {
      val p = s.split(":")
      require(p.length == 2 || p.length == 3, s"time must be HH:mm[:ss]: $s")
      p(0).toInt * 3600 + p(1).toInt * 60 + (if (p.length > 2) p(2).toInt else 0)
    }
    val tod = pmod(unix_timestamp(df(tsCol)), lit(86400L))
    val (a, b) = (secs(start), secs(end))
    val cond =
      if (a <= b) tod >= a && tod <= b
      else tod >= a || tod <= b
    GraftFrame(df.filter(cond))
  }

  /** pandas at_time: rows at exactly this UTC time-of-day. */
  def atTime(tsCol: String, time: String): GraftFrame =
    betweenTime(tsCol, time, time)

  /** pandas to_datetime (reference tseries/to_datetime.py:37): parse with
    * an explicit format, null on failure like errors='coerce'. */
  def toDatetime(colName: String, out: String, fmt: String = "yyyy-MM-dd"): GraftFrame =
    assign(out -> try_to_timestamp(df(colName), lit(fmt)))

  /** pandas to_numeric with errors='coerce' (reference base/to_numeric.py):
    * try_cast semantics — unparseable values become null. */
  def toNumeric(colName: String, out: String): GraftFrame =
    assign(out -> df(colName).try_cast("double"))

  /** pandas rank over explicit partition/order (reference: sort-based rank;
    * Spark ranking windows are free capability — SURVEY §2.7).
    * method: "min" (pandas rank ties→min), "dense", "first" (row_number),
    * "max" (ties→max = min-rank + tie-group size − 1), and pandas'
    * DEFAULT "average" (min + (ties−1)/2 — an exact .0/.5 double since
    * the tie count is an integer, so it stays oracle-exact). max/average
    * add one count window over (partition, order-key) tie groups —
    * same partitioning, no extra shuffle. */
  def rank(out: String, partitionBy: Seq[String], orderBy: Seq[Column],
      method: String = "min"): GraftFrame = {
    val w = (if (partitionBy.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionBy.map(df(_)): _*)).orderBy(orderBy: _*)
    method match {
      case "min" =>
        assign(out -> org.apache.spark.sql.functions.rank().over(w).cast("long"))
      case "dense" => assign(out -> dense_rank().over(w).cast("long"))
      case "first" => assign(out -> row_number().over(w).cast("long"))
      case "max" | "average" =>
        // tie-group size via the min-rank VALUE (rows tie ⟺ equal rank),
        // so asc/desc order columns need no unwrapping; the count window
        // shares the rank window's partitioning — no extra shuffle
        val withR = df.withColumn("__tmprank",
          org.apache.spark.sql.functions.rank().over(w).cast("long"))
        val ties = count(lit(1)).over(Window.partitionBy(
          (partitionBy.map(col) :+ col("__tmprank")): _*))
        val r =
          if (method == "max") col("__tmprank") + ties - 1L
          else col("__tmprank").cast("double") +
            (ties - 1L).cast("double") / lit(2.0)
        GraftFrame(withR.withColumn(out, r).drop("__tmprank"), index)
      case m => throw new IllegalArgumentException(s"unknown rank method: $m")
    }
  }

  /** pandas rank(pct=True): rank divided by the NON-NULL group size — an
    * exact rational (long/long) so both engines produce identical doubles.
    * Rows whose order key is null get a null pct, and non-null ranks are
    * shifted down by the null count (Spark sorts nulls first; pandas
    * excludes NaN from ranking entirely). `method` as in [[rank]]. */
  def rankPct(out: String, partitionBy: Seq[String], orderBy: Seq[Column],
      method: String = "min"): GraftFrame = {
    val part = if (partitionBy.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionBy.map(df(_)): _*)
    val w = part.orderBy(orderBy: _*)
    val valid = orderBy.map(_.isNotNull).reduce(_ && _)
    val nValid = sum(when(valid, 1L).otherwise(0L)).over(part)
    val nNull = count(lit(1)).over(part) - nValid
    method match {
      case "max" | "average" =>
        // ties via the min-rank value (same trick as [[rank]]); pct stays
        // an exact rational (integers + a half) over the non-null count
        val withR = df
          .withColumn("__tmpnv", nValid)
          .withColumn("__tmpsh", nNull)
          .withColumn("__tmpok", valid)
          .withColumn("__tmprank",
            org.apache.spark.sql.functions.rank().over(w).cast("long"))
        val ties = count(lit(1)).over(Window.partitionBy(
          (partitionBy.map(col) :+ col("__tmprank")): _*))
        val adj =
          if (method == "max")
            (col("__tmprank") - col("__tmpsh") + ties - 1L).cast("double")
          else (col("__tmprank") - col("__tmpsh")).cast("double") +
            (ties - 1L).cast("double") / lit(2.0)
        GraftFrame(withR.withColumn(out,
            when(col("__tmpok"), adj / col("__tmpnv").cast("double")))
          .drop("__tmpnv", "__tmpsh", "__tmpok", "__tmprank"), index)
      case _ =>
        val (r, shift) = method match {
          // nulls-first ordering gives null rows the lowest ranks; the
          // shift restores the pandas 1..m ranking over non-null rows only
          case "min" => (org.apache.spark.sql.functions.rank(), nNull)
          case "dense" => (dense_rank(), when(nNull > 0, 1L).otherwise(0L))
          case "first" => (row_number(), nNull)
          case m => throw new IllegalArgumentException(s"unknown rank method: $m")
        }
        assign(out -> when(valid,
          (r.over(w).cast("long") - shift).cast("double") / nValid.cast("double")))
    }
  }

  /** Positional column insert (reference indexing/insert.py:28). */
  def insert(pos: Int, name: String, value: Column): GraftFrame = {
    val (before, after) = df.columns.splitAt(pos)
    sameIndex(df.select(
      (before.map(df(_)) ++ Seq(value.as(name)) ++ after.map(df(_))).toSeq: _*))
  }

  // ------------------------------------------------------------ joins §2.4
  /** pandas merge (reference merge/merge.py:167, API :903): equi-join on
    * shared or per-side columns with suffix disambiguation. Broadcast /
    * shuffle choice is left to Catalyst+AQE (the reference's MergeMethod
    * auto-choice, merge.py:692); pass `broadcastRight = true` to force the
    * hint for a known-small right side. */
  def merge(
      right: GraftFrame,
      on: Seq[String] = Nil,
      how: String = "inner",
      leftOn: Seq[String] = Nil,
      rightOn: Seq[String] = Nil,
      suffixes: (String, String) = ("_x", "_y"),
      broadcastRight: Boolean = false,
      indicator: Boolean = false): GraftFrame = {
    val rTagged = if (indicator) right.df.withColumn("__r_present", lit(1)) else right.df
    val lTagged = if (indicator) df.withColumn("__l_present", lit(1)) else df
    val r0 = if (broadcastRight) broadcast(rTagged) else rTagged
    val joined =
      if (on.nonEmpty || (leftOn.isEmpty && rightOn.isEmpty)) {
        val keys = if (on.nonEmpty) on else df.columns.intersect(right.df.columns).toSeq
        // disambiguate non-key shared columns with pandas-style suffixes
        val shared = df.columns.intersect(right.df.columns).toSet -- keys.toSet
        val l1 = shared.foldLeft(lTagged)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
        val r1 = shared.foldLeft(r0)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
        l1.join(r1, keys, how)
      } else {
        require(leftOn.length == rightOn.length, "left_on/right_on length mismatch")
        val cond = leftOn.zip(rightOn).map { case (l, r) => lTagged(l) === r0(r) }
          .reduce(_ && _)
        lTagged.join(r0, cond, how)
      }
    GraftFrame(
      if (indicator)
        joined.withColumn("_merge",
          when(col("__l_present").isNotNull && col("__r_present").isNotNull, "both")
            .when(col("__l_present").isNotNull, "left_only")
            .otherwise("right_only"))
          .drop("__l_present", "__r_present")
      else joined)
  }

  /** pandas merge(validate=): eagerly checks key multiplicity BEFORE the
    * join — "1:1"/"one_to_one" requires both sides unique on the keys,
    * "1:m" the left side, "m:1" the right. The check is one max-count
    * aggregate per constrained side (an action, like pandas' validation
    * pass); it throws IllegalArgumentException naming the offending side
    * rather than silently fanning out rows. */
  def mergeValidated(right: GraftFrame, on: Seq[String], how: String = "inner",
      validate: String = "1:1"): GraftFrame = {
    def unique(d: DataFrame, side: String): Unit = {
      // empty side -> null max -> trivially unique
      val maxDup = Option(d.groupBy(on.map(d(_)): _*).count()
        .agg(max(col("count"))).head().get(0)).fold(0L)(_.asInstanceOf[Long])
      require(maxDup <= 1L,
        s"merge validate=$validate: $side side has duplicate keys (max group size $maxDup)")
    }
    validate match {
      case "1:1" | "one_to_one" => unique(df, "left"); unique(right.df, "right")
      case "1:m" | "one_to_many" => unique(df, "left")
      case "m:1" | "many_to_one" => unique(right.df, "right")
      case "m:m" | "many_to_many" => ()
      case v => throw new IllegalArgumentException(s"unknown validate: $v")
    }
    merge(right, on = on, how = how)
  }

  /** Row concat (reference merge/concat.py:41 axis=0): unionByName with
    * missing columns null-filled, like pandas concat's outer column union. */
  def concatRows(others: GraftFrame*): GraftFrame =
    GraftFrame(others.foldLeft(df)((acc, o) =>
      acc.unionByName(o.df, allowMissingColumns = true)))

  /** pandas concat(keys=) — row concat with a provenance label per input
    * frame (the hierarchical-index level becomes an ordinary `key`
    * column, SURVEY §7.1's columns-as-index model). `frames` pairs each
    * key with its frame; this frame is not implicitly included. */
  def concatRowsKeys(frames: Seq[(String, GraftFrame)],
      keyName: String = "key"): GraftFrame = {
    require(frames.nonEmpty, "concatRowsKeys needs at least one (key, frame)")
    val tagged = frames.map { case (k, f) =>
      f.df.withColumn(keyName, lit(k))
    }
    GraftFrame(tagged.reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /** Column concat (pandas concat axis=1; reference merge/concat.py:41
    * axis=1): frames aligned on explicit `on` keys (the engine has no
    * implicit row index — SURVEY §7.1). join="outer" keeps the union of
    * keys (missing side null-filled, like pandas), "inner" the
    * intersection. Non-key column names must be distinct across frames, as
    * in pandas. */
  def concatCols(others: Seq[GraftFrame], on: Seq[String],
      join: String = "outer"): GraftFrame = {
    val how = join match {
      case "outer" => "full_outer"
      case "inner" => "inner"
      case j => throw new IllegalArgumentException(s"concat join must be outer|inner: $j")
    }
    GraftFrame(others.foldLeft(df)((acc, o) => acc.join(o.df, on, how)))
  }

  /** Two-frame align (pandas df.align; reference indexing/align.py:44):
    * both frames conformed to the SAME key set — union of keys for
    * join="outer", intersection for "inner", one side's keys for
    * "left"/"right" — with missing rows null-filled. Returns
    * (left aligned, right aligned); both sides share `on` column names. */
  def align(right: GraftFrame, on: Seq[String],
      join: String = "outer"): (GraftFrame, GraftFrame) = {
    val lKeys = df.select(on.map(df(_)): _*)
    val rKeys = right.df.select(on.map(right.df(_)): _*)
    val keyUniverse = join match {
      case "outer" => lKeys.union(rKeys).distinct()
      case "inner" => lKeys.intersect(rKeys)
      case "left" => lKeys.distinct()
      case "right" => rKeys.distinct()
      case j => throw new IllegalArgumentException(s"align join must be outer|inner|left|right: $j")
    }
    (GraftFrame(keyUniverse.join(df, on, "left")),
      GraftFrame(keyUniverse.join(right.df, on, "left")))
  }

  def crossJoin(right: GraftFrame): GraftFrame = GraftFrame(df.crossJoin(right.df))

  /** pandas combine_first (reference merge/concat.py neighborhood;
    * DataFrame.combine_first in the pandas surface the reference wraps):
    * key-aligned full outer union where THIS frame's values win and
    * `other` patches the holes — per shared column a null-coalesce, plus
    * rows only present on either side. One shuffle (the outer join);
    * columns unique to either frame are kept as-is. */
  def combineFirst(other: GraftFrame, on: Seq[String]): GraftFrame = {
    val shared = df.columns.filterNot(on.contains)
      .intersect(other.df.columns.filterNot(on.contains)).toSeq
    val l = shared.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + "__cf_l"))
    val r = shared.foldLeft(other.df)((d, c) => d.withColumnRenamed(c, c + "__cf_r"))
    val patched = shared.foldLeft(l.join(r, on, "full_outer"))((d, c) =>
      d.withColumn(c, coalesce(col(c + "__cf_l"), col(c + "__cf_r")))
        .drop(c + "__cf_l", c + "__cf_r"))
    GraftFrame(patched)
  }

  /** Index-aligned arithmetic (pandas `df.add(other, fill_value=)` and
    * friends; reference dataframe/arithmetic/core.py — the 832-LoC
    * DataFrameIndexAlign machinery): the two frames are OUTER-aligned on
    * the index columns `on`, and `op` is applied cell-wise over the UNION
    * of their numeric value columns. Pandas missing-data semantics:
    *  - a cell present on exactly one side uses `fillValue` for the other
    *    side when given, else the result is null (pandas NaN);
    *  - a cell missing on BOTH sides is null regardless of `fillValue`;
    *  - a column present in only one frame behaves as all-missing on the
    *    other side (so it fills, like pandas).
    * Non-numeric non-key columns are outside the numeric-arithmetic
    * surface and are dropped (pandas would emit all-NaN columns for
    * mixed object frames; dropping is the honest engine behavior).
    *
    * Scale shape: ONE full-outer equi-join shuffle on the index columns;
    * every cell rule is a per-row projection on top. Output cells are
    * double (the common numeric type of the aligned arithmetic).
    * `op`: add | sub | mul | div | floordiv | mod | pow. */
  def arithAligned(other: GraftFrame, on: Seq[String] = Nil, op: String,
      fillValue: Option[Double] = None): GraftFrame = {
    val keys = alignKeys(on, "arithAligned")
    val lCols = GraftFrame.numericValueCols(df, keys)
    val rCols = GraftFrame.numericValueCols(other.df, keys)
    val allCols = lCols ++ rCols.filterNot(lCols.contains)
    require(allCols.nonEmpty, "arithAligned: no numeric value columns")
    val opFn = GraftFrame.alignedOp(op)
    val l = lCols.foldLeft(df.select((keys ++ lCols).map(df(_)): _*))(
      (d, c) => d.withColumnRenamed(c, c + "__bl"))
    val r = rCols.foldLeft(other.df.select((keys ++ rCols).map(other.df(_)): _*))(
      (d, c) => d.withColumnRenamed(c, c + "__br"))
    val joined = l.join(r, keys, "full_outer")
    val cells = allCols.map { c =>
      val lv = (if (lCols.contains(c)) col(c + "__bl")
        else lit(null)).cast("double")
      val rv = (if (rCols.contains(c)) col(c + "__br")
        else lit(null)).cast("double")
      GraftFrame.alignedCell(opFn, lv, rv, fillValue).as(c)
    }
    // the align keys become the result's declared index (pandas keeps the
    // aligned index), so chained aligned ops keep working implicitly
    GraftFrame(joined.select(keys.map(col) ++ cells: _*), keys)
  }

  /** pandas aligned comparison ops — df.eq/ne/lt/le/gt/ge(other): the
    * same outer key align as [[arithAligned]], one boolean column per
    * (value column, op) named `<col>_<op>`. Missing-cell semantics follow
    * pandas NaN comparisons: a cell absent on EITHER side compares false
    * for eq/lt/le/gt/ge, and ne is eq's negation (NaN != x is True).
    * No fill_value — pandas raises there too. */
  def compareAligned(other: GraftFrame, ops: Seq[String],
      on: Seq[String] = Nil): GraftFrame = {
    val keys = alignKeys(on, "compareAligned")
    require(ops.nonEmpty, "compareAligned needs at least one op")
    val lCols = GraftFrame.numericValueCols(df, keys)
    val rCols = GraftFrame.numericValueCols(other.df, keys)
    val allCols = lCols ++ rCols.filterNot(lCols.contains)
    require(allCols.nonEmpty, "compareAligned: no numeric value columns")
    val l = lCols.foldLeft(df.select((keys ++ lCols).map(df(_)): _*))(
      (d, c) => d.withColumnRenamed(c, c + "__bl"))
    val r = rCols.foldLeft(other.df.select((keys ++ rCols).map(other.df(_)): _*))(
      (d, c) => d.withColumnRenamed(c, c + "__br"))
    val joined = l.join(r, keys, "full_outer")
    val cells = for (c <- allCols; op <- ops) yield {
      val lv = (if (lCols.contains(c)) col(c + "__bl")
        else lit(null)).cast("double")
      val rv = (if (rCols.contains(c)) col(c + "__br")
        else lit(null)).cast("double")
      val eq = coalesce(lv === rv, lit(false))
      val cmp = op match {
        case "eq" => eq
        case "ne" => !eq
        case "lt" => coalesce(lv < rv, lit(false))
        case "le" => coalesce(lv <= rv, lit(false))
        case "gt" => coalesce(lv > rv, lit(false))
        case "ge" => coalesce(lv >= rv, lit(false))
        case o => throw new IllegalArgumentException(
          s"compareAligned op must be eq|ne|lt|le|gt|ge: $o")
      }
      cmp.as(s"${c}_$op")
    }
    GraftFrame(joined.select(keys.map(col) ++ cells: _*), keys)
  }

  /** pandas `df.op(series, axis=0)` — `other` is a Series: a frame with
    * the index keys plus exactly ONE numeric value column. After an outer
    * key align, every numeric column of this frame combines with the
    * series value row-wise under the same missing-cell rules as
    * [[arithAligned]]. Keys default to the [[setIndex]]-declared index.
    * Scale shape: one full-outer equi-join on the keys (broadcast-able
    * when the series is small), then per-row projections. */
  def arithAlignedSeries(other: GraftFrame, op: String,
      on: Seq[String] = Nil, fillValue: Option[Double] = None): GraftFrame = {
    val keys = alignKeys(on, "arithAlignedSeries")
    val sCols = GraftFrame.numericValueCols(other.df, keys)
    require(sCols.size == 1,
      s"arithAlignedSeries: other must carry exactly one numeric value " +
        s"column (a Series), got ${sCols.mkString(", ")}")
    val vCols = GraftFrame.numericValueCols(df, keys)
    require(vCols.nonEmpty, "arithAlignedSeries: no numeric value columns")
    val opFn = GraftFrame.alignedOp(op)
    val l = vCols.foldLeft(df.select((keys ++ vCols).map(df(_)): _*))(
      (d, c) => d.withColumnRenamed(c, c + "__bl"))
    val r = other.df.select((keys.map(other.df(_)) :+
      other.df(sCols.head).cast("double").as("__sv")): _*)
    val joined = l.join(r, keys, "full_outer")
    val cells = vCols.map { c =>
      GraftFrame.alignedCell(opFn, col(c + "__bl").cast("double"),
        col("__sv"), fillValue).as(c)
    }
    GraftFrame(joined.select(keys.map(col) ++ cells: _*), keys)
  }

  /** pandas `df.op(series, axis=1)` — the series is indexed BY COLUMN
    * NAME (one scalar per column): a pure projection, no shuffle at any
    * scale. Columns absent from `values` behave as missing on the right
    * (fill when `fillValue` is given, else null — pandas NaN). */
  def arithColumnBroadcast(values: Map[String, Double], op: String,
      fillValue: Option[Double] = None, on: Seq[String] = Nil): GraftFrame = {
    // same key discipline as alignKeys (ADVICE r9): without a declared
    // index a numeric key column would silently be op-applied/nulled as
    // a value column — fail loudly instead
    val keys = alignKeys(on, "arithColumnBroadcast")
    val vCols = GraftFrame.numericValueCols(df, keys)
    require(vCols.nonEmpty, "arithColumnBroadcast: no numeric value columns")
    val opFn = GraftFrame.alignedOp(op)
    val cells = vCols.map { c =>
      val rv = values.get(c) match {
        case Some(v) => lit(v)
        case None => lit(null).cast("double")
      }
      GraftFrame.alignedCell(opFn, df(c).cast("double"), rv, fillValue).as(c)
    }
    val passthrough = df.columns.toSeq.filterNot(vCols.contains).map(df(_))
    GraftFrame(df.select(passthrough ++ cells: _*), keys)
  }

  /** pandas default-RangeIndex alignment (r10, VERDICT task 3; reference
    * mars/dataframe/align.py:48 plus the arithmetic/core.py machinery):
    * when NEITHER frame declares an index, pandas aligns binops on the
    * implicit row POSITION. Both frames get a materialized position
    * ([[withRowIndex]] — deterministic whenever the upstream order is,
    * e.g. after [[sortValues]] or a single-file read) and the
    * [[arithAligned]] cell rules apply over that position key; the
    * result keeps the position as `posCol` and declares it as the
    * index. Length mismatch behaves exactly like pandas: the longer
    * frame's tail aligns against missing cells (fill_value when given,
    * else null).
    *
    * Scale shape: two narrow per-partition zipWithIndex passes + ONE
    * full-outer equi-join on the position — no extra shuffles. */
  def arithPositional(other: GraftFrame, op: String,
      fillValue: Option[Double] = None,
      posCol: String = "row_pos"): GraftFrame = {
    require(index.isEmpty && other.index.isEmpty,
      "arithPositional is the no-declared-index (default RangeIndex) " +
        s"path, but an index is declared " +
        s"(${(index ++ other.index).distinct.mkString(", ")}) — " +
        "use arithAligned / the *Aligned family instead")
    withRowIndex(posCol).arithAligned(other.withRowIndex(posCol),
      Seq(posCol), op, fillValue)
  }

  /** Positional aligned comparisons — [[compareAligned]] over the
    * implicit row position, completing the default-RangeIndex family
    * next to [[arithPositional]]. Same missing-cell semantics (absent
    * or longer-tail cells compare false; ne is eq's negation). */
  def comparePositional(other: GraftFrame, ops: Seq[String],
      posCol: String = "row_pos"): GraftFrame = {
    require(index.isEmpty && other.index.isEmpty,
      "comparePositional is the no-declared-index (default RangeIndex) " +
        "path — use compareAligned with on=/setIndex keys instead")
    withRowIndex(posCol).compareAligned(other.withRowIndex(posCol),
      ops, Seq(posCol))
  }

  /** Keys for the aligned binops: explicit `on` wins, else the
    * [[setIndex]]-declared index. */
  private def alignKeys(on: Seq[String], what: String): Seq[String] = {
    val keys = if (on.nonEmpty) on else index
    require(keys.nonEmpty,
      s"$what needs index columns: pass on=, or declare them with setIndex")
    keys
  }

  /** pandas df.add(other, fill_value=) — see [[arithAligned]]. */
  def addAligned(other: GraftFrame, on: Seq[String],
      fillValue: Option[Double] = None): GraftFrame =
    arithAligned(other, on, "add", fillValue)

  /** pandas df.sub(other, fill_value=) — see [[arithAligned]]. */
  def subAligned(other: GraftFrame, on: Seq[String],
      fillValue: Option[Double] = None): GraftFrame =
    arithAligned(other, on, "sub", fillValue)

  /** pandas df.mul(other, fill_value=) — see [[arithAligned]]. */
  def mulAligned(other: GraftFrame, on: Seq[String],
      fillValue: Option[Double] = None): GraftFrame =
    arithAligned(other, on, "mul", fillValue)

  /** pandas df.div(other, fill_value=) — see [[arithAligned]]. */
  def divAligned(other: GraftFrame, on: Seq[String],
      fillValue: Option[Double] = None): GraftFrame =
    arithAligned(other, on, "div", fillValue)

  /** pandas df.mod(other, fill_value=) — see [[arithAligned]]. */
  def modAligned(other: GraftFrame, on: Seq[String] = Nil,
      fillValue: Option[Double] = None): GraftFrame =
    arithAligned(other, on, "mod", fillValue)

  /** pandas df.pow(other, fill_value=) — see [[arithAligned]]. */
  def powAligned(other: GraftFrame, on: Seq[String] = Nil,
      fillValue: Option[Double] = None): GraftFrame =
    arithAligned(other, on, "pow", fillValue)

  /** pandas df.floordiv(other, fill_value=) — see [[arithAligned]]. */
  def floordivAligned(other: GraftFrame, on: Seq[String] = Nil,
      fillValue: Option[Double] = None): GraftFrame =
    arithAligned(other, on, "floordiv", fillValue)

  /** pandas DataFrame.update: `other`'s NON-NULL values overwrite this
    * frame's values on key-aligned rows; rows only in `other` are ignored
    * and this frame's row set is unchanged (a left join — the mirror
    * priority of [[combineFirst]]). */
  def updateFrom(other: GraftFrame, on: Seq[String]): GraftFrame = {
    // pandas raises on a non-unique other index — a dup key would fan out
    // this frame's rows through the left join, breaking the contract above
    val maxDup = Option(other.df.groupBy(on.map(other.df(_)): _*).count()
      .agg(max(col("count"))).head().get(0)).fold(0L)(_.asInstanceOf[Long])
    require(maxDup <= 1L,
      s"updateFrom: other side has duplicate keys (max group size $maxDup)")
    val shared = df.columns.filterNot(on.contains)
      .intersect(other.df.columns.filterNot(on.contains)).toSeq
    val r = other.df.select((on ++ shared).map(other.df(_)): _*)
    val r1 = shared.foldLeft(r)((d, c) => d.withColumnRenamed(c, c + "__up"))
    val patched = shared.foldLeft(df.join(r1, on, "left"))((d, c) =>
      d.withColumn(c, coalesce(col(c + "__up"), col(c))).drop(c + "__up"))
    GraftFrame(patched)
  }

  /** pandas DataFrame.compare: rows of the key-aligned inner join where any
    * compared column differs (null-safe inequality), emitted as
    * (col+suffix_self, col+suffix_other) pairs. Equal rows vanish, like
    * pandas' default keep_shape=False. One equi-join shuffle. */
  def compareFrames(other: GraftFrame, on: Seq[String], cols: Seq[String],
      suffixes: (String, String) = ("_self", "_other")): GraftFrame = {
    val l = df.select((on ++ cols).map(df(_)): _*)
    val r = other.df.select((on ++ cols).map(other.df(_)): _*)
    val l1 = cols.foldLeft(l)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r1 = cols.foldLeft(r)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    val j = l1.join(r1, on, "inner")
    val anyDiff = cols.map(c =>
      !(col(c + suffixes._1) <=> col(c + suffixes._2))).reduce(_ || _)
    GraftFrame(j.filter(anyDiff).select(
      (on.map(col) ++ cols.flatMap(c =>
        Seq(col(c + suffixes._1), col(c + suffixes._2)))): _*))
  }

  /** pandas crosstab: row-key × column-key count matrix. Pass the column
    * universe explicitly for a deterministic schema with no discovery pass;
    * with `colValues` empty Spark collects the distinct values first
    * (fine for low-cardinality columns only — same caveat as pandas,
    * where the whole result is in memory anyway). One partial+final
    * aggregate; absent cells are 0. */
  def crosstab(rowCol: String, colCol: String,
      colValues: Seq[Any] = Nil): GraftFrame = {
    val g = df.groupBy(df(rowCol))
    val p = if (colValues.nonEmpty) g.pivot(colCol, colValues) else g.pivot(colCol)
    val counted = p.agg(count(lit(1)))
    val fillCols = counted.columns.filterNot(_ == rowCol).toSeq
    GraftFrame(counted.na.fill(0L, fillCols))
  }

  /** pandas crosstab(normalize='all'|'index'|'columns'): the [[crosstab]]
    * counts divided by the grand total, each row's total, or each
    * column's total — exact long/long rational divisions, so the result
    * is oracle-exact. 'columns' adds one tiny aggregate over the count
    * matrix (rows ∝ distinct row keys, never the data). */
  def crosstabNormalized(rowCol: String, colCol: String, normalize: String,
      colValues: Seq[Any] = Nil): GraftFrame = {
    val counts = crosstab(rowCol, colCol, colValues).df
    val cellCols = counts.columns.filterNot(_ == rowCol).toSeq
    val out = normalize match {
      case "all" =>
        val w = Window.partitionBy()
        val total = cellCols.map(c => sum(col(c)).over(w)).reduce(_ + _)
        counts.select(col(rowCol) +: cellCols.map(c =>
          (col(c).cast("double") / total.cast("double")).as(c)): _*)
      case "index" =>
        val rowTotal = cellCols.map(col).reduce(_ + _)
        counts.select(col(rowCol) +: cellCols.map(c =>
          (col(c).cast("double") / rowTotal.cast("double")).as(c)): _*)
      case "columns" =>
        val w = Window.partitionBy()
        counts.select(col(rowCol) +: cellCols.map(c =>
          (col(c).cast("double") /
            sum(col(c)).over(w).cast("double")).as(c)): _*)
      case n => throw new IllegalArgumentException(
        s"normalize must be all|index|columns: $n")
    }
    GraftFrame(out)
  }

  /** pandas pipe: apply a frame-to-frame function in a chain. */
  def pipe(f: GraftFrame => GraftFrame): GraftFrame = f(this)

  /** Stable 0-based global row index in the frame's CURRENT partition
    * order — the bridge for pandas' implicit positional index (reference
    * indexing/iloc.py:251; this engine otherwise requires explicit order
    * columns, the documented SURVEY §7.1 relaxation). Deterministic
    * whenever the upstream order is (after [[sortValues]], or a
    * single-file read); rows keep their partition, only a per-partition
    * count job and a narrow map are added — no shuffle, no collect.
    * Once materialized, every positional op (iloc, shift, asof) works on
    * it as an ordinary order column. */
  def withRowIndex(name: String = "row_index"): GraftFrame = {
    val schema = df.schema.add(name, org.apache.spark.sql.types.LongType,
      nullable = false)
    val rows = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    GraftFrame(df.sparkSession.createDataFrame(rows, schema))
  }

  /** Salted equi-join for heavily skewed keys: the skewed (left) side gets
    * a random salt in [0, saltFactor), the right side is replicated across
    * every salt value, and the join key becomes (key, salt) — splitting a
    * hot key's rows over saltFactor tasks. AQE's skew-join handles most
    * cases automatically; this is the explicit valve for pathological keys
    * AQE can't split (e.g. one key ≫ everything else).
    *
    * Results equal the plain join only for join types that never emit
    * unmatched RIGHT rows — the replicated right side would emit each
    * unmatched row saltFactor times under right/full outer joins, so those
    * are rejected. */
  def saltedJoin(right: GraftFrame, on: Seq[String], saltFactor: Int,
      how: String = "inner", seed: Long = 42L): GraftFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    require(Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")(how),
      s"saltedJoin supports inner/left/semi/anti joins only (got '$how'): " +
        "the replicated right side would duplicate unmatched right rows")
    val salted = df.withColumn("__salt",
      (pmod(hash((df.columns.map(df(_)) :+ rand(seed)).toSeq: _*), lit(saltFactor))).cast("int"))
    val replicated = right.df.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    GraftFrame(salted.join(replicated, on :+ "__salt", how).drop("__salt"))
  }

  /** As-of backward join (pandas merge_asof; absent from the reference —
    * SURVEY §2.4 — provided as an engine extension). */
  def asofJoinPrior(right: GraftFrame, key: String, ts: String, payload: String): GraftFrame =
    GraftFrame(Sessionize.asofJoinPrior(df, right.df, key, ts, payload))

  // ---------------------------------------------------------- groupby §2.6
  /** Deferred grouped frame (reference groupby/core.py:47). */
  def groupby(cols: String*): GraftGroupBy = GraftGroupBy(df, cols)

  // ----------------------------------------------------- sort/limit §2.8
  /** sort_values (reference sort/sort_values.py:29). Spark's sort is the
    * sampled range-partitioned sort the reference implements by hand as
    * PSRS (sort/psrs.py). `naPosition` matches pandas 'first'/'last'. */
  def sortValues(by: Seq[String], ascending: Seq[Boolean] = Nil,
      naPosition: String = "last"): GraftFrame = {
    val asc = if (ascending.isEmpty) Seq.fill(by.size)(true) else ascending
    val cols = by.zip(asc).map { case (c, a) =>
      (a, naPosition) match {
        case (true, "last") => df(c).asc_nulls_last
        case (true, _) => df(c).asc_nulls_first
        case (false, "last") => df(c).desc_nulls_last
        case (false, _) => df(c).desc_nulls_first
      }
    }
    sameIndex(df.orderBy(cols: _*))
  }

  /** head(n) (reference indexing/iloc.py:251 / HeadPushDown — Catalyst's
    * LimitPushDown does the pushdown). */
  def head(n: Int): GraftFrame = sameIndex(df.limit(n))

  /** tail(n) over an explicit order (no implicit row index — SURVEY §7.1):
    * the last n rows by `by` ascending. A reversed TakeOrdered, so it never
    * materializes more than n rows per partition. */
  def tail(n: Int, by: Seq[String]): GraftFrame = {
    val reversed = df.orderBy(by.map(df(_).desc): _*).limit(n)
    GraftFrame(reversed.orderBy(by.map(df(_)): _*))
  }

  /** Scalar lookup by key (pandas at/iat; reference indexing/at.py:83):
    * the single value of `valueCol` where `keyCol` equals `key`. Pushes the
    * key predicate to the scan; fails if the key is absent or ambiguous. */
  def at(keyCol: String, key: Any, valueCol: String): Any = {
    val rows = df.filter(df(keyCol) === lit(key)).select(df(valueCol)).take(2)
    require(rows.length == 1, s"at($keyCol=$key): ${rows.length} rows, expected 1")
    rows.head.get(0)
  }

  /** Positional row slice [start, end) over an explicit total order —
    * pandas `iloc[start:end]` (reference indexing/iloc.py; SURVEY §7.3
    * de-scoped the general positional form, this is the ordered-slice core
    * users actually hit). Scale-safe: a sampled range-partitioned sort +
    * RDD zipWithIndex (per-partition offsets from one lightweight count
    * job) — no single-task global window at any size. */
  def ilocSlice(start: Long, end: Long, orderBy: Seq[String]): GraftFrame = {
    require(start >= 0 && end >= start, s"invalid slice [$start, $end)")
    val sorted = df.orderBy(orderBy.map(df(_)): _*)
    val schema = sorted.schema
    val indexed = sorted.rdd.zipWithIndex()
      .filter { case (_, i) => i >= start && i < end }
      .map(_._1)
    GraftFrame(df.sparkSession.createDataFrame(indexed, schema))
  }

  /** General positional iloc over an explicit total order (reference
    * indexing/iloc.py:251): arbitrary position lists, negative positions
    * counted from the end — pandas `df.iloc[[0, 5, -1]]`. Same two-pass
    * zipWithIndex shape as [[ilocSlice]]; the position set rides along as
    * a closure (it is client-supplied and small by construction). */
  def iloc(positions: Seq[Long], orderBy: Seq[String]): GraftFrame = {
    val sorted = df.orderBy(orderBy.map(df(_)): _*)
    val resolved: Set[Long] =
      if (positions.forall(_ >= 0)) positions.toSet
      else {
        val n = sorted.count()
        positions.map(p => if (p >= 0) p else n + p).toSet
      }
    val schema = sorted.schema
    val indexed = sorted.rdd.zipWithIndex()
      .filter { case (_, i) => resolved(i) }
      .map(_._1)
    GraftFrame(df.sparkSession.createDataFrame(indexed, schema))
  }

  /** Positional iloc in the frame's CURRENT order — the pandas-faithful
    * form, composing [[withRowIndex]]'s implicit-index bridge with the
    * position filter: `df.iloc[[0, 5, -1]]` with no order columns.
    * Deterministic whenever the frame's order is (post-sort, single
    * sorted file); same zipWithIndex cost class as [[iloc]]. */
  def ilocPositional(positions: Seq[Long]): GraftFrame = {
    val indexed = withRowIndex("__ri")
    val resolved: Set[Long] =
      if (positions.forall(_ >= 0)) positions.toSet
      else {
        val n = indexed.df.count()
        positions.map(p => if (p >= 0) p else n + p).toSet
      }
    GraftFrame(indexed.df
      .filter(col("__ri").isInCollection(resolved))
      .drop("__ri"))
  }

  /** Keep the lower triangle of a row-vector matrix frame (reference
    * mt.tril, the tensor-base triangle family): vec[j] survives where
    * j ≤ id + k, the rest zero. Pure per-row projection — no exchange. */
  def trilMask(idCol: String, vecCol: String, k: Int = 0): GraftFrame =
    GraftFrame(df.withColumn(vecCol, transform(df(vecCol), (x, j) =>
      when(j <= df(idCol).cast("int") + k, x).otherwise(lit(0.0)))))

  /** Upper-triangle counterpart (reference mt.triu): j ≥ id + k. */
  def triuMask(idCol: String, vecCol: String, k: Int = 0): GraftFrame =
    GraftFrame(df.withColumn(vecCol, transform(df(vecCol), (x, j) =>
      when(j >= df(idCol).cast("int") + k, x).otherwise(lit(0.0)))))

  /** Extract the main diagonal of a row-vector matrix frame (reference
    * mt.diag of a 2-D input): out = vec[id]. */
  def diagonal(idCol: String, vecCol: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out,
      element_at(df(vecCol), df(idCol).cast("int") + 1)))

  /** Deterministic scalar mode per group (reference reduction surface's
    * mode; pandas Series.mode returns ALL modal values — the scalar form
    * here resolves ties to the SMALLEST value so the answer reproduces
    * across engines and partitionings, unlike the built-in `mode` whose
    * tie pick is arbitrary). Numeric value columns only (the tie rule
    * negates). Two partial+final aggregates, no sort. */
  def modeDet(keys: Seq[String], valueCol: String): GraftFrame = {
    val counts = df.groupBy((keys :+ valueCol).map(df(_)): _*)
      .agg(count(lit(1)).as("__c"))
    GraftFrame(counts.groupBy(keys.map(col): _*)
      .agg(max(struct(col("__c"), (-col(valueCol)).as("__nv")))
        .getField("__nv").as("__nv"))
      .select((keys.map(col) :+ (-col("__nv")).as(s"${valueCol}_mode")): _*))
  }

  /** pandas quantile(interpolation=) beyond 'linear' (reference
    * statistics/quantile.py interpolation=): the exact k-th order
    * statistics h = (n−1)q, k ∈ {⌊h⌋, ⌈h⌉, rint(h)} selected via
    * distributed value-count prefix sums — the [[quantileTransform]]
    * machinery (range partition + partition-offset stitch), NO global
    * sort and no single-task rank. One row out: (n, lo = 'lower',
    * hi = 'higher', near = 'nearest', mid = 'midpoint'). 'nearest'
    * follows numpy's banker's rounding at exact .5, like pandas. */
  def quantileInterp(valueCol: String, q: Double): GraftFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantileInterp: q must be in [0, 1]: $q")
    val g = df.filter(df(valueCol).isNotNull)
      .groupBy(df(valueCol).cast("double").as("__v")).agg(count(lit(1)).as("__c"))
      .repartitionByRange(col("__v"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g.withColumn("__bl", coalesce(sum(col("__c")).over(wLocal), lit(0L)))
    val wPid = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid")).agg(sum(col("__c")).as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(wPid), lit(0L)))
    val total = offsets.agg(sum(col("__pc")).as("__n"))
    val cum = local
      .join(broadcast(offsets.select(col("__pid"), col("__off"))), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn("__start", col("__bl") + col("__off"))
    val h = (col("__n").cast("double") - lit(1.0)) * lit(q)
    def at(k: Column) = min(when(col("__start") <= k &&
      k < col("__start") + col("__c"), col("__v")))
    val res = cum.agg(max(col("__n")).as("n"),
        at(floor(h).cast("long")).as("lo"),
        at(ceil(h).cast("long")).as("hi"),
        at(rint(h).cast("long")).as("near"))
      .withColumn("mid", (col("lo") + col("hi")) / 2.0)
    GraftFrame(res)
  }

  /** sklearn QuantileTransformer / rank-based quantile normalization
    * (reference mars/learn/preprocessing neighborhood; the standard
    * feature-pipeline step): each value maps to its exact global midrank
    * u = (#smaller + #equal/2) / n ∈ (0, 1), optionally pushed through
    * the logistic inverse CDF (`ln(u/(1-u))`). The normal target needs
    * Φ⁻¹, which neither engine exposes — logistic is the closed-form
    * heavy-tail alternative.
    *
    * Scale shape: distinct values aggregate first (the only data-sized
    * shuffle), then the checkMonotonic bucketing — range-partition the
    * distinct values, per-bucket cumulative counts under a bucket-local
    * window, stitch with per-bucket offsets (≤ shuffle.partitions rows
    * through a tiny global window) — and one value-keyed join back.
    * Never a global single-task rank over the data. Exact rationals:
    * u is bit-identical on any engine, no rounding. Nulls pass through
    * with a null transform. */
  def quantileTransform(valueCol: String, out: String,
      distribution: String = "uniform"): GraftFrame = {
    require(Set("uniform", "logistic")(distribution),
      s"distribution must be uniform|logistic: $distribution")
    val g = df.filter(df(valueCol).isNotNull)
      .groupBy(df(valueCol).as("__v")).agg(count(lit(1)).as("__c"))
      .repartitionByRange(col("__v"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g.withColumn("__bl", coalesce(sum(col("__c")).over(wLocal), lit(0L)))
    val wPid = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid")).agg(sum(col("__c")).as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(wPid), lit(0L)))
    val total = offsets.agg(sum(col("__pc")).as("__n"))
    val u = (col("__bl") + col("__off")).cast("double") +
      col("__c").cast("double") / lit(2.0)
    val uMap = local
      .join(broadcast(offsets.select(col("__pid"), col("__off"))), Seq("__pid"))
      .crossJoin(broadcast(total))
      .select(col("__v"), (u / col("__n").cast("double")).as("__u"))
    val transformed = distribution match {
      case "uniform" => col("__u")
      case "logistic" => log(col("__u") / (lit(1.0) - col("__u")))
    }
    GraftFrame(df
      .join(uMap, df(valueCol) === col("__v"), "left")
      .withColumn(out, transformed)
      .drop("__v", "__u"))
  }

  /** Conform to a given key frame (reference indexing/reindex.py:49 /
    * align, indexing/align.py:44): left join from the new keys, missing
    * rows null-filled (or `fillValue`). `keys` must be the key frame's
    * column subset shared with this frame. */
  def reindex(keyFrame: GraftFrame, keys: Seq[String],
      fillValue: Option[Any] = None): GraftFrame = {
    val joined = keyFrame.df.select(keys.map(keyFrame.df(_)): _*)
      .join(df, keys, "left")
    GraftFrame(fillValue match {
      case Some(v: Long) => joined.na.fill(v)
      case Some(v: Double) => joined.na.fill(v)
      case Some(v: String) => joined.na.fill(v)
      case _ => joined
    })
  }

  // ------------------------------------------------------------ dedup §2.9
  /** drop_duplicates keep=first-by-order (reference
    * base/drop_duplicates.py:35; subset_tree strategy ≈ the semi-join
    * here, base/_duplicate.py:32). */
  def dropDuplicates(subset: Seq[String], keepFirstBy: String): GraftFrame =
    GraftFrame(Dedup.dropDuplicates(df, subset, keepFirstBy))

  /** Keep-first dedup as a single min_by aggregation — preferable to
    * [[dropDuplicates]] when rows are narrow (one shuffle of the rows vs
    * two scans + semi-join). `keepFirstBy` must be unique per key. */
  def dropDuplicatesNarrow(subset: Seq[String], keepFirstBy: String): GraftFrame =
    GraftFrame(Dedup.dropDuplicatesNarrow(df, subset, keepFirstBy))

  /** Positional-agnostic dedup (any row per key). */
  def dropDuplicatesAny(subset: Seq[String]): GraftFrame =
    GraftFrame(df.dropDuplicates(subset))

  // ---------------------------------------------- corpus curation (Ext)
  /** Benchmark decontamination — see
    * [[graft.operators.Curation.decontaminate]]. */
  def decontaminate(bench: GraftFrame, textCol: String, idCol: String,
      n: Int = 3, minOverlap: Int = 1): GraftFrame =
    GraftFrame(Curation.decontaminate(df, bench.df, textCol, idCol, n, minOverlap))

  /** Exact per-domain cap — see [[graft.operators.Curation.domainCap]]. */
  def domainCap(domainCol: String, idCol: String, cap: Int): GraftFrame =
    GraftFrame(Curation.domainCap(df, domainCol, idCol, cap))

  /** Gopher quality-rule flags — see
    * [[graft.operators.Curation.gopherFlags]]. */
  def gopherFlags(textCol: String, idCol: String): GraftFrame =
    GraftFrame(Curation.gopherFlags(df, textCol, idCol))

  /** C4 line+document cleaning rules —
    * [[graft.operators.Curation.c4Clean]]. */
  def c4Clean(textCol: String, idCol: String): GraftFrame =
    GraftFrame(Curation.c4Clean(df, textCol, idCol))

  /** URL canonicalization + keep-first dedup —
    * [[graft.operators.Dedup.urlDedup]]. */
  def urlDedup(urlCol: String, idCol: String): GraftFrame =
    GraftFrame(graft.operators.Dedup.urlDedup(df, urlCol, idCol))

  /** Linear quality-classifier inference — see
    * [[graft.operators.Curation.linearTextScore]]. */
  def qualityClassifierScore(textCol: String, idCol: String,
      weights: Map[Int, Double], bias: Double, dim: Int = 64): GraftFrame =
    GraftFrame(Curation.linearTextScore(df, textCol, idCol, weights, bias, dim))

  /** Exact duplicated-substring removal — see
    * [[graft.operators.Dedup.substringSpanDedup]]. */
  def substringSpanDedup(textCol: String, idCol: String, n: Int = 8): GraftFrame =
    GraftFrame(Dedup.substringSpanDedup(df, textCol, idCol, n))

  /** Deterministic shard assignment — see
    * [[graft.operators.Curation.shardAssign]]. */
  def shardAssign(idCol: String, nShards: Int): GraftFrame =
    GraftFrame(Curation.shardAssign(df, idCol, nShards))

  /** Sharded training-data export — see
    * [[graft.operators.Curation.writeShards]]. */
  def writeShards(idCol: String, nShards: Int, path: String): Unit =
    Curation.writeShards(df, idCol, nShards, path)

  /** Stratified per-domain sampling — see
    * [[graft.operators.Curation.stratifiedSample]]. */
  def stratifiedSample(domainCol: String, idCol: String,
      fracs: Map[String, Double], defaultFrac: Double): GraftFrame =
    GraftFrame(Curation.stratifiedSample(df, domainCol, idCol, fracs, defaultFrac))

  /** Mixture-matching sample (exact per-domain target counts) — see
    * [[graft.operators.Curation.mixtureSample]]. */
  def mixtureSample(domainCol: String, idCol: String,
      weights: Map[String, Double], totalN: Long): GraftFrame =
    GraftFrame(Curation.mixtureSample(df, domainCol, idCol, weights, totalN))

  /** Temperature-based re-mixing (p_d ∝ n_d^α) — see
    * [[graft.operators.Curation.temperatureSample]]. */
  def temperatureSample(domainCol: String, idCol: String, alpha: Double,
      totalN: Long): GraftFrame =
    GraftFrame(Curation.temperatureSample(df, domainCol, idCol, alpha, totalN))

  /** Token-budget sample (per-domain first-fit prefix) — see
    * [[graft.operators.Curation.tokenBudgetSample]]. */
  def tokenBudgetSample(domainCol: String, idCol: String, tokenCol: String,
      budgets: Map[String, Long]): GraftFrame =
    GraftFrame(Curation.tokenBudgetSample(df, domainCol, idCol, tokenCol, budgets))

  /** Importance resampling — see
    * [[graft.operators.Curation.importanceResample]]. */
  def importanceResample(weightCol: String, idCol: String): GraftFrame =
    GraftFrame(Curation.importanceResample(df, weightCol, idCol))

  /** Context-window sequence packing — see
    * [[graft.operators.Curation.packSequences]]. */
  def packSequences(textCol: String, idCol: String, capacity: Int,
      nShards: Int): GraftFrame =
    GraftFrame(Curation.packSequences(df, textCol, idCol, capacity, nShards))

  /** Sequence packing by an arbitrary token-length expression (r16) —
    * e.g. `size(col("ids"))` so packing consumes the BPE id stream
    * end-to-end; see [[graft.operators.Curation.packSequencesByLen]]. */
  def packSequencesByLen(lenCol: Column, idCol: String, capacity: Int,
      nShards: Int): GraftFrame =
    GraftFrame(Curation.packSequencesByLen(df, lenCol, idCol, capacity, nShards))

  /** Materialized packed sequences — per-pack id arrays with EOS
    * separators and doc-boundary spans, what a data loader reads (r17);
    * see [[graft.operators.Curation.packSequencesEmit]]. */
  def packSequencesEmit(idsCol: String, idCol: String, capacity: Int,
      nShards: Int, eosId: Int): GraftFrame =
    GraftFrame(Curation.packSequencesEmit(df, idsCol, idCol, capacity,
      nShards, eosId))

  /** Per-row duplicate flag over subset keys (reference
    * base/duplicated.py:25); true for every row beyond the first by
    * `orderCol` within the key. */
  def duplicated(subset: Seq[String], orderCol: String): GraftFrame = {
    val w = Window.partitionBy(subset.map(df(_)): _*).orderBy(df(orderCol))
    GraftFrame(df.withColumn("duplicated", row_number().over(w) > 1))
  }

  /** pandas duplicated(keep=): "first" marks later occurrences, "last"
    * marks earlier ones (reverse-order row_number over the same single
    * shuffle), "none"/false marks EVERY member of a >1 group (a count
    * window — no order needed, pandas keep=False). */
  def duplicatedKeep(subset: Seq[String], orderCol: String,
      keep: String): GraftFrame = keep match {
    case "first" => duplicated(subset, orderCol)
    case "last" =>
      val w = Window.partitionBy(subset.map(df(_)): _*).orderBy(df(orderCol).desc)
      GraftFrame(df.withColumn("duplicated", row_number().over(w) > 1))
    case "none" | "false" =>
      val w = Window.partitionBy(subset.map(df(_)): _*)
      GraftFrame(df.withColumn("duplicated", count(lit(1)).over(w) > 1))
    case k => throw new IllegalArgumentException(s"keep must be first|last|none: $k")
  }

  /** isin filter (reference base/isin.py:31). */
  def isin(colName: String, values: Seq[Any]): GraftFrame =
    GraftFrame(df.filter(df(colName).isin(values: _*)))

  // --------------------------------------------------- missing data §2.10
  /** fillna with per-column values (reference missing/fillna.py:36). */
  def fillna(values: Map[String, Any]): GraftFrame = sameIndex(df.na.fill(values))

  /** dropna (reference missing/dropna.py:33). how: "any"/"all". */
  def dropna(how: String = "any", subset: Seq[String] = Nil): GraftFrame =
    sameIndex(if (subset.isEmpty) df.na.drop(how) else df.na.drop(how, subset))

  /** pandas dropna(thresh=): keep rows with at least `thresh` non-null
    * values among `subset` (all columns when empty). */
  def dropnaThresh(thresh: Int, subset: Seq[String] = Nil): GraftFrame =
    sameIndex(if (subset.isEmpty) df.na.drop(thresh)
      else df.na.drop(thresh, subset))

  /** Group-wise forward fill (reference groupby/fill.py:149) — window
    * last(ignoreNulls) over the preceding frame, one shuffle on the key. */
  def ffill(partitionBy: Seq[String], orderBy: Seq[String], cols: Seq[String]): GraftFrame = {
    val w = Windows.expanding(Windows.spec(partitionBy, orderBy))
    GraftFrame(cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(d(c), ignoreNulls = true).over(w))))
  }

  /** Group-wise backward fill (reference groupby/fill.py:149 bfill):
    * first non-null over the following frame. */
  def bfill(partitionBy: Seq[String], orderBy: Seq[String], cols: Seq[String]): GraftFrame = {
    val w = Windows.spec(partitionBy, orderBy)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    GraftFrame(cols.foldLeft(df)((d, c) =>
      d.withColumn(c, first(d(c), ignoreNulls = true).over(w))))
  }

  /** pandas clip: bound values to [lower, upper]. */
  /** pandas first_valid_index / last_valid_index over an explicit order
    * column: the smallest / largest order value whose `valueCol` is
    * non-null — one min/max aggregate, no sort. */
  def validIndexBounds(orderCol: String, valueCol: String): GraftFrame =
    GraftFrame(df.agg(
      min(when(df(valueCol).isNotNull, df(orderCol))).as("first_valid"),
      max(when(df(valueCol).isNotNull, df(orderCol))).as("last_valid")))

  /** pandas interpolate(method='linear') over an explicit partition+order
    * (see [[graft.operators.Windows.interpolateLinear]]). */
  def interpolate(partitionBy: Seq[String], orderBy: Seq[String],
      valueCol: String, out: String): GraftFrame =
    GraftFrame(Windows.interpolateLinear(df, partitionBy, orderBy, valueCol, out))

  /** tsfresh-style per-key series features over an exact integer column
    * ([[graft.operators.Sessionize.tsFeatures]]; `wide = true` for
    * mega-series past the BIGINT quadratic bound). */
  def tsFeatures(keyCol: String, orderCols: Seq[String], intCol: String,
      wide: Boolean = false): GraftFrame =
    GraftFrame(Sessionize.tsFeatures(df, keyCol, orderCols, intCol, wide))

  /** LOSSLESS exact-similarity self-join — every (doc_a, doc_b) pair at
    * jaccard >= `threshold` over word `n`-gram shingles, via prefix+
    * length+positional filtering ([[graft.operators.Dedup.ppjoinPairs]];
    * the LSH path [[graft.operators.Dedup.minhashDedupPairs]] remains
    * the default at extreme scale — exactness costs ~5–25× beyond 100×,
    * PERF.md r14). */
  def ppjoinPairs(textCol: String, idCol: String, n: Int = 3,
      threshold: Double = 0.8): GraftFrame =
    GraftFrame(graft.operators.Dedup.ppjoinPairs(df, textCol, idCol, n, threshold))

  /** Appends a real-BPE token-count column over a merge table
    * ([[graft.functions.TextFunctions.bpeTokenCountFast]]: the native
    * merge-loop encoder when GraftExtensions is registered — plan size
    * O(1) in the vocabulary — else the replace-chain at gate-scale
    * tables). Default merges: the committed [[graft.functions.PinnedBpe]]
    * table (the oracled ext_bpe_tokens path). */
  def bpeTokens(textCol: String, out: String,
      merges: Seq[(String, String)] = graft.functions.PinnedBpe.merges): GraftFrame =
    GraftFrame(df.withColumn(out, graft.functions.TextFunctions
      .bpeTokenCountFast(df.sparkSession, df(textCol), merges)), index)

  /** The full BPE subword sequence as an array<string> column — the
    * token stream packing/chunking consumes
    * ([[graft.functions.TextFunctions.bpeTokenize]]). */
  def bpeTokenSeq(textCol: String, out: String,
      merges: Seq[(String, String)] = graft.functions.PinnedBpe.merges): GraftFrame =
    GraftFrame(df.withColumn(out, graft.functions.TextFunctions
      .bpeTokenize(df.sparkSession, df(textCol), merges)), index)

  /** The BPE token-ID stream as an array<int> column (r16) — ids against
    * a [[graft.functions.BpeVocab]] built from (merges, alphabet,
    * specials), with special-token passthrough and the char→unk→loud
    * OOV ladder ([[graft.functions.TextFunctions.bpeEncodeIds]]).
    * Feed `packSequencesByLen(size(ids))` to pack by real token ids. */
  def bpeTokenIds(textCol: String, out: String,
      merges: Seq[(String, String)] = graft.functions.PinnedBpe.merges,
      alphabet: Seq[String] = graft.functions.BpeVocab.asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      unk: Option[String] = None,
      byteFallback: Boolean = false,
      wordSep: Option[String] = None): GraftFrame =
    GraftFrame(df.withColumn(out, graft.functions.TextFunctions
      .bpeEncodeIds(df.sparkSession, df(textCol), merges, alphabet,
        specials, unk, byteFallback, wordSep)), index)

  /** BPE DECODE — an array<int> id column back to text (r17), the
    * inverse of [[bpeTokenIds]] on the same vocab; designate `wordSep`
    * (a special) at ENCODE time for the whitespace-collapsing round
    * trip ([[graft.functions.TextFunctions.bpeDecodeIds]]). */
  def bpeDecode(idsCol: String, out: String,
      merges: Seq[(String, String)] = graft.functions.PinnedBpe.merges,
      alphabet: Seq[String] = graft.functions.BpeVocab.asciiAlphabet,
      specials: Seq[String] = Vector.empty,
      unk: Option[String] = None,
      byteFallback: Boolean = false,
      wordSep: Option[String] = None): GraftFrame =
    GraftFrame(df.withColumn(out, graft.functions.TextFunctions
      .bpeDecodeIds(df.sparkSession, df(idsCol), merges, alphabet,
        specials, unk, byteFallback, wordSep)), index)

  /** GPT-2-style regex pretokenization of a text column (r16) —
    * category-pure letter/digit/punct runs; compose before any BPE
    * path ([[graft.functions.TextFunctions.bpePretokenize]]). */
  def bpePretokenized(textCol: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, graft.functions.TextFunctions
      .bpePretokenizeFast(df.sparkSession, df(textCol))), index)

  /** pandas resample('1D') with calendar completion per key (see
    * [[graft.operators.Sessionize.resampleDaily]]). */
  def resampleDaily(keyCol: String, tsCol: String, sumCol: Column): GraftFrame =
    GraftFrame(Sessionize.resampleDaily(df, keyCol, tsCol, sumCol))

  /** pandas resample over a calendar unit ("day" | "week" | "month") —
    * see [[graft.operators.Sessionize.resampleCalendar]]. */
  def resampleCalendar(keyCol: String, tsCol: String, sumCol: Column,
      unit: String): GraftFrame =
    GraftFrame(Sessionize.resampleCalendar(df, keyCol, tsCol, sumCol, unit))

  /** pandas resample(unit).agg(name -> aggExpr, ...) — caller-chosen
    * aggregates on the gap-free calendar grid (holes carry nulls). */
  def resampleAgg(keyCol: String, tsCol: String, unit: String,
      aggs: (String, Column)*): GraftFrame =
    GraftFrame(Sessionize.resampleAgg(df, keyCol, tsCol, unit, aggs))

  def clip(colName: String, lower: Double, upper: Double): GraftFrame =
    assign(colName -> least(greatest(df(colName), lit(lower)), lit(upper)))

  /** Regex replace in a string column (reference missing/replace.py:38). */
  def replaceRegex(colName: String, pattern: String, repl: String): GraftFrame =
    assign(colName -> regexp_replace(df(colName), pattern, repl))

  /** Value mapping through a literal dict (reference base/map.py:32) — a
    * when-chain, codegen'd; rows with unmapped values get `default`
    * (pandas maps them to NaN). */
  def mapValues(colName: String, out: String, mapping: Map[Any, Any],
      default: Option[Any] = None): GraftFrame = {
    val c = mapping.foldLeft[Option[Column]](None) {
      case (acc, (k, v)) =>
        val branch = when(df(colName) === lit(k), lit(v))
        Some(acc.fold(branch)(_.when(df(colName) === lit(k), lit(v))))
    }.get
    assign(out -> default.fold(c)(d => c.otherwise(lit(d))))
  }

  // -------------------------------------------------------- reshape §2.10
  /** melt / wide-to-long (reference base/melt.py:27). */
  def melt(ids: Seq[String], values: Seq[String],
      varName: String = "variable", valName: String = "value"): GraftFrame =
    GraftFrame(df.unpivot(ids.map(df(_)).toArray, values.map(df(_)).toArray, varName, valName))

  /** explode list column to rows (reference base/explode.py:27). */
  def explodeCol(colName: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, explode(df(colName))))

  /** Matrix product `this · other` (reference arithmetic/dot.py): this is
    * (idCol × value columns), other is keyed by `keyCol` whose values are
    * this frame's value-column NAMES, with one output column per result
    * dimension. Returns (idCol × other's value columns).
    *
    * Scale shape: both sides unpivot to COO triples; `other` (k×m, one row
    * per shared dimension) broadcasts, so the multiply is a narrow map and
    * the only shuffle is the final sum on idCol — the standard distributed
    * tall-matrix × small-matrix product. A huge right side should instead
    * be pre-melted and joined on its own partitioning. */
  def dot(other: GraftFrame, idCol: String, keyCol: String): GraftFrame = {
    val valueCols = df.columns.filterNot(_ == idCol).toSeq
    val outCols = other.df.columns.filterNot(_ == keyCol).toSeq
    val a = melt(Seq(idCol), valueCols, "__dim", "__v").df
    val b = other.melt(Seq(keyCol), outCols, "__out", "__w").df
      .withColumnRenamed(keyCol, "__dim")
    GraftFrame(a.join(broadcast(b), Seq("__dim"))
      .groupBy(col(idCol)).pivot("__out", outCols)
      .agg(sum(col("__v") * col("__w"))))
  }

  /** pivot_table with known category values (reference base/get_dummies.py
    * and pandas pivot; values must be enumerated for a deterministic
    * schema, which also keeps the plan a single partial+final aggregate). */
  def pivotTable(index: Seq[String], column: String, values: Seq[Any],
      agg: Column, fillValue: Option[Any] = None): GraftFrame = {
    val p = df.groupBy(index.map(df(_)): _*).pivot(column, values).agg(agg)
    GraftFrame(fillValue match {
      case Some(v: Long) => p.na.fill(v, values.map(_.toString))
      case Some(v: Double) => p.na.fill(v, values.map(_.toString))
      case Some(v: String) => p.na.fill(v, values.map(_.toString))
      case _ => p
    })
  }

  /** pandas pivot_table(margins=True): wide sum table with an "All" margin
    * column and an "All" margin row. Expressed as ONE aggregate: conditional
    * sums per pivot value over `cube(index)` — the cube's grand-total
    * grouping set IS the margin row, so margins cost no second scan and no
    * union. `colValues` must be the explicit column universe (deterministic
    * schema, no discovery pass). */
  def pivotTableMargins(index: String, column: String, valueCol: String,
      colValues: Seq[String], marginsName: String = "All"): GraftFrame = {
    val aggs = colValues.map(v =>
      sum(when(df(column) === v, df(valueCol))).as(v)) ++ Seq(
      sum(df(valueCol)).as(marginsName),
      // distinguishes the grand-total grouping set from a genuine NULL
      // index value (both surface index=NULL after cube)
      grouping(df(index)).as("__margin"))
    val g = df.cube(df(index)).agg(aggs.head, aggs.tail: _*)
    GraftFrame(g
      .withColumn(index,
        when(col("__margin") === 1, lit(marginsName))
          .otherwise(col(index).cast("string")))
      .drop("__margin"))
  }

  /** Winsorize: clip a column at per-group exact interpolated quantiles
    * (scipy/pandas clip(lower=q(pLow), upper=q(pHigh)) composition). The
    * quantiles are one partial+final aggregate per group joined back —
    * no global window; with `by` empty the two cutoffs broadcast as a
    * single row. Cutoffs are rounded to `roundTo` decimals so boundary
    * behavior is reproducible across engines (same contract as qcut). */
  def winsorize(valueCol: String, out: String, pLow: Double, pHigh: Double,
      by: Seq[String] = Nil, roundTo: Int = 6): GraftFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh, "need 0 <= pLow < pHigh <= 1")
    val lo = round(percentile(df(valueCol), lit(pLow)), roundTo).as("__wlo")
    val hi = round(percentile(df(valueCol), lit(pHigh)), roundTo).as("__whi")
    val joined =
      if (by.isEmpty) df.crossJoin(broadcast(df.agg(lo, hi)))
      // left join: rows with a null group key (no cutoffs computable for
      // them) pass through unclipped instead of vanishing
      else df.join(df.groupBy(by.map(df(_)): _*).agg(lo, hi), by, "left")
    GraftFrame(joined
      .withColumn(out,
        when(col("__wlo").isNull, col(valueCol))
          .otherwise(least(greatest(col(valueCol), col("__wlo")), col("__whi"))))
      .drop("__wlo", "__whi"))
  }

  /** One-hot indicator columns (reference base/get_dummies.py). */
  def getDummies(colName: String, values: Seq[String], prefix: String = ""): GraftFrame =
    GraftFrame(values.foldLeft(df)((d, v) =>
      d.withColumn(s"$prefix$v", when(d(colName) === v, 1L).otherwise(0L))))

  /** Fixed-bin cut with interval labels (reference base/cut.py:43).
    * `bins` are ascending edges; values outside get null like pandas. */
  def cut(colName: String, out: String, bins: Seq[Double],
      labels: Seq[String] = Nil): GraftFrame = {
    require(bins.size >= 2 && bins == bins.sorted, "bins must be ascending edges")
    val lbs = if (labels.nonEmpty) labels
      else bins.sliding(2).map(w => s"(${w(0)}, ${w(1)}]").toSeq
    require(lbs.size == bins.size - 1, "labels must have bins-1 entries")
    val c = bins.sliding(2).zip(lbs.iterator).foldLeft[Column](lit(null)) {
      case (acc, (w, lb)) =>
        when(df(colName) > w(0) && df(colName) <= w(1), lit(lb)).otherwise(acc)
    }
    assign(out -> c)
  }

  /** Quantile binning (reference base/qcut.py). Scale-safe: exact
    * interpolated quantile cutoffs are computed with a single partial+final
    * aggregate and broadcast back — no global single-task window (the ntile
    * formulation funnels every row through one task at 100 TB). Cutoffs are
    * rounded to `roundTo` decimals so boundary assignment is reproducible
    * across engines. */
  def qcut(colName: String, out: String, q: Int, roundTo: Int = 6): GraftFrame = {
    require(q >= 2, s"qcut needs q >= 2, got $q")
    val probs = (1 until q).map(_.toDouble / q)
    val cutoffs = df.agg(
      transform(percentile(df(colName), typedlit(probs)),
        x => round(x, roundTo)).as("__cuts"))
    val joined = df.crossJoin(broadcast(cutoffs))
    // fold from the highest cutoff down so the smallest bucket's test ends
    // up outermost (a value below c1 must land in bucket 1, not q-1)
    val bucket = ((q - 2) to 0 by -1).foldLeft[Column](lit(q.toLong)) {
      case (acc, i) =>
        when(df(colName) <= element_at(col("__cuts"), i + 1), lit((i + 1).toLong))
          .otherwise(acc)
    }
    // nulls propagate (pandas qcut maps NaN → NaN, not the top bucket)
    GraftFrame(joined
      .withColumn(out, when(df(colName).isNotNull, bucket))
      .drop("__cuts"))
  }

  // ------------------------------------------------------------ stats §2.13
  /** describe (reference base/describe.py:34): count/mean/std/min/quartiles/
    * max per numeric column, exact quantiles like the reference. */
  /** pandas describe() for object/string columns — the
    * describe(include='all') half (reference base/describe.py): non-null
    * count, unique count, top (most frequent value) and its freq, from
    * ONE value-count aggregate + one reduce. `top` ties break to the
    * lexicographically-smallest most-frequent value — pandas' own
    * "first observed" has no distributed meaning, so the deterministic
    * total order replaces it (documented divergence). */
  def describeObject(colName: String): GraftFrame = {
    val counts = df.filter(df(colName).isNotNull)
      .groupBy(df(colName).as("__v")).agg(count(lit(1)).as("__c"))
    GraftFrame(counts.agg(
      sum(col("__c")).cast("long").as("cnt"),
      count(lit(1)).as("uniq"),
      min_by(col("__v"), struct((-col("__c")).as("nc"), col("__v"))).as("top"),
      max(col("__c")).as("freq")))
  }

  def describe(cols: Seq[String]): GraftFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(df(c)).cast("double").as(s"${c}_count"),
        avg(df(c)).as(s"${c}_mean"),
        stddev_samp(df(c)).as(s"${c}_std"),
        min(df(c)).cast("double").as(s"${c}_min"),
        percentile(df(c), lit(0.25)).as(s"${c}_p25"),
        percentile(df(c), lit(0.5)).as(s"${c}_p50"),
        percentile(df(c), lit(0.75)).as(s"${c}_p75"),
        max(df(c)).cast("double").as(s"${c}_max"))
    }
    GraftFrame(df.agg(aggs.head, aggs.tail: _*))
  }

  /** Grouped describe (pandas groupby().describe()): the same eight
    * summary statistics per key, one partial+final aggregate. */
  def describeBy(keys: Seq[String], cols: Seq[String]): GraftFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(df(c)).cast("double").as(s"${c}_count"),
        avg(df(c)).as(s"${c}_mean"),
        stddev_samp(df(c)).as(s"${c}_std"),
        min(df(c)).cast("double").as(s"${c}_min"),
        percentile(df(c), lit(0.25)).as(s"${c}_p25"),
        percentile(df(c), lit(0.5)).as(s"${c}_p50"),
        percentile(df(c), lit(0.75)).as(s"${c}_p75"),
        max(df(c)).cast("double").as(s"${c}_max"))
    }
    GraftFrame(df.groupBy(keys.map(df(_)): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** value_counts (reference base/value_counts.py:31). `normalize` adds the
    * count/total proportion via a 1-row broadcast (no global window). */
  def valueCounts(colName: String, normalize: Boolean = false): GraftFrame = {
    val counts = df.groupBy(df(colName)).agg(count(lit(1)).as("count"))
    val out =
      if (!normalize) counts
      else counts
        .crossJoin(broadcast(df.agg(count(lit(1)).as("__total"))))
        .withColumn("proportion",
          col("count").cast("double") / col("__total").cast("double"))
        .drop("__total")
    GraftFrame(out.orderBy(col("count").desc, df(colName)))
  }

  /** Mean absolute deviation about the mean (pandas mad; reference
    * reduction surface). Two partial+final aggregates joined through a
    * 1-row broadcast — no global window, scale-safe. */
  def mad(cols: Seq[String]): GraftFrame = {
    val means = df.agg(
      avg(df(cols.head)).as(s"__m_${cols.head}"),
      cols.tail.map(c => avg(df(c)).as(s"__m_$c")): _*)
    val joined = df.crossJoin(broadcast(means))
    val aggs = cols.map(c =>
      avg(abs(joined(c) - col(s"__m_$c"))).as(s"${c}_mad"))
    GraftFrame(joined.agg(aggs.head, aggs.tail: _*))
  }

  /** Peak-to-peak (max − min) per column (reference
    * mars/tensor/statistics/ptp.py:23 / pandas Series.ptp). One
    * partial+final aggregate. */
  def ptp(cols: Seq[String]): GraftFrame = {
    val aggs = cols.map(c => (max(df(c)) - min(df(c))).as(s"${c}_ptp"))
    GraftFrame(df.agg(aggs.head, aggs.tail: _*))
  }

  /** Weighted average Σw·x / Σw (reference
    * mars/tensor/statistics/average.py:24, numpy average(weights=)). A
    * single partial+final aggregate; with decimal/integer inputs the two
    * sums are exact, so the result is partitioning-invariant up to the one
    * final division. */
  def averageWeighted(valueCol: String, weightCol: String, out: String): GraftFrame =
    GraftFrame(df.agg(
      (sum(df(valueCol) * df(weightCol)).cast("double") /
        sum(df(weightCol)).cast("double")).as(out)))

  /** nunique across columns (reference reduction/nunique.py:118). */
  def nunique(cols: Seq[String]): GraftFrame =
    GraftFrame(df.agg(
      countDistinct(df(cols.head)).as(s"${cols.head}_nunique"),
      cols.tail.map(c => countDistinct(df(c)).as(s"${c}_nunique")): _*))

  /** pandas Series.corr(other, method=): 'pearson' is the native moment
    * aggregate; 'spearman' routes through the exact doubled-average-rank
    * moments (graft.learn.StatTests.spearman) and 'kendall' through the
    * guarded all-pairs τ-b (StatTests.kendallTau, O(n²) — its maxRows
    * contract applies). The reference's corr REFUSES non-pearson methods
    * (statistics/corr.py _check_supported_methods), so both rank methods
    * are upside surface. One-row frame (`statistic`). */
  def corrScalar(x: String, y: String, method: String = "pearson"): GraftFrame =
    method match {
      case "pearson" =>
        GraftFrame(df.agg(corr(df(x), df(y)).as("statistic")))
      case "spearman" =>
        GraftFrame(graft.learn.StatTests.spearman(df, x, y).select(col("statistic")))
      case "kendall" =>
        GraftFrame(graft.learn.StatTests.kendallTau(df, x, y).select(col("statistic")))
      case m => throw new IllegalArgumentException(
        s"corr method must be pearson|spearman|kendall: $m")
    }

  /** Full pairwise Pearson correlation matrix over numeric columns
    * (pandas df.corr; reference statistics/corr.py:29 computes the same
    * cross-moment sums): ONE partial+final aggregate produces every
    * pairwise moment — no per-pair passes, no MLlib vector assembly. Output
    * rows (col_a, col_b, corr) for a ≤ b. */
  def corrMatrix(cols: Seq[String]): GraftFrame = {
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (cols(i), cols(j))
    val aggs = cols.flatMap(c => Seq(
      avg(df(c)).as(s"__m_$c"),
      stddev_samp(df(c)).as(s"__s_$c"))) ++
      pairs.map { case (a, b) =>
        covar_samp(df(a), df(b)).as(s"__cv_${a}__$b")
      }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        (col(s"__cv_${a}__$b") / (col(s"__s_$a") * col(s"__s_$b"))).as("corr"))
    }
    GraftFrame(stats
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.corr")))
  }

  /** pandas df.corr(method='spearman') (scipy.stats.spearmanr matrix):
    * Pearson over EXACT average ranks. Ranks are carried as integer
    * DOUBLE-ranks r2 = 2·below + count (average rank × 2 — always an
    * integer, so the moment sums are exact DECIMAL(38,0) on any engine
    * and the matrix is oracle-able at round-4 like the grouped-OLS
    * closed form; a raw covar_samp over rank doubles would be an
    * order-dependent float sum). Rows with a null in ANY column are
    * dropped first (scipy's listwise matrix; pandas' pairwise-complete
    * differs — documented divergence).
    *
    * Scale shape: per column, the [[quantileTransform]] bucketed
    * two-pass (distinct values → range-partitioned cumulative counts →
    * value-keyed join back — never a single-task global rank), then ONE
    * partial+final moment aggregate for all pairs. DECIMAL(38,0) holds
    * Σ r2² = 4n³ exactly to n ≈ 2.9e12 rows. */
  def corrMatrixSpearman(cols: Seq[String]): GraftFrame = {
    require(cols.size >= 2, "corrMatrixSpearman needs at least two columns")
    val complete = df.filter(cols.map(df(_).isNotNull).reduce(_ && _))
    val ranked = cols.foldLeft(complete)((d, c) =>
      GraftFrame.doubleRank(d, c, s"__r2_$c"))
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    def r2(c: String) = col(s"__r2_$c").cast(dec)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = Seq(count(lit(1)).cast(dec).as("__n")) ++
      cols.flatMap(c => Seq(
        sum(r2(c)).as(s"__s_$c"),
        sum(r2(c) * r2(c)).as(s"__ss_$c"))) ++
      pairs.map { case (a, b) =>
        sum(r2(a) * r2(b)).as(s"__sp_${a}__$b")
      }
    val stats = ranked.agg(aggs.head, aggs.tail: _*)
    val nd = col("__n").cast("double")
    val rows = pairs.map { case (a, b) =>
      val num = nd * col(s"__sp_${a}__$b").cast("double") -
        col(s"__s_$a").cast("double") * col(s"__s_$b").cast("double")
      val den = sqrt(
        (nd * col(s"__ss_$a").cast("double") -
          col(s"__s_$a").cast("double") * col(s"__s_$a").cast("double")) *
        (nd * col(s"__ss_$b").cast("double") -
          col(s"__s_$b").cast("double") * col(s"__s_$b").cast("double")))
      struct(lit(a).as("col_a"), lit(b).as("col_b"), (num / den).as("rho"))
    }
    GraftFrame(stats
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.rho")))
  }

  /** pandas df.cov(): full pairwise sample-covariance matrix from the
    * same single-aggregate shape as [[corrMatrix]] — all cross-moments in
    * one partial+final pass, matrix exploded from the 1-row result. */
  def covMatrix(cols: Seq[String]): GraftFrame = {
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      covar_samp(df(a), df(b)).as(s"__cv_${a}__$b")
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__cv_${a}__$b").as("cov"))
    }
    GraftFrame(stats
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.cov")))
  }

  /** pandas df.corrwith(other) (reference statistics/corr.py:286): align
    * the two frames on the key columns (one shuffle join — or broadcast if
    * one side is small, left to AQE), then compute the Pearson correlation
    * of every shared numeric column in ONE partial+final aggregate. Output
    * rows (column, corr). */
  def corrwith(other: GraftFrame, on: Seq[String], cols: Seq[String]): GraftFrame = {
    val l = df.select((on ++ cols).map(df(_)): _*)
    val r0 = other.df
    val r = r0.select(on.map(r0(_)) ++ cols.map(c => r0(c).as(s"__o_$c")): _*)
    val j = l.join(r, on)
    val aggs = cols.map(c => corr(j(c), j(s"__o_$c")).as(c))
    val stats = j.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(lit(c).as("column"), col(c).as("corr")))
    GraftFrame(stats.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column"), col("r.corr")))
  }

  /** pandas Series.autocorr(lag) (reference statistics/corr.py:378),
    * grouped: corr(x_t, x_{t-lag}) per group over an explicit order — one
    * partitioned window lag (no single-task global window) and one
    * aggregate. corr skips rows whose lag is null (the first `lag` rows of
    * each group), matching pandas' pairwise-complete semantics. */
  def autocorr(partitionCols: Seq[String], orderCol: String, valueCol: String,
      lagN: Int = 1, out: String = "autocorr"): GraftFrame = {
    require(partitionCols.nonEmpty,
      "autocorr needs partition columns (a global series order is a single task at scale)")
    val w = Window.partitionBy(partitionCols.map(df(_)): _*).orderBy(df(orderCol))
    val lagged = df.withColumn("__lag", lag(df(valueCol), lagN).over(w))
    GraftFrame(lagged.groupBy(partitionCols.map(lagged(_)): _*)
      .agg(corr(col(valueCol), col("__lag")).as(out)))
  }

  /** pandas nlargest / nsmallest: top-n rows by a column — a distributed
    * TakeOrdered, never a full sort of the output. */
  def nlargest(n: Int, colName: String): GraftFrame =
    GraftFrame(df.orderBy(df(colName).desc).limit(n))
  def nsmallest(n: Int, colName: String): GraftFrame =
    GraftFrame(df.orderBy(df(colName).asc).limit(n))

  /** Monotonicity check over an explicit order (reference
    * base/check_monotonic.py).
    *
    * Scale shape: monotonicity is adjacency-local, so the frame is
    * range-partitioned on the order column (contiguous, sorted bucket
    * ranges), each bucket checks its own adjacent pairs under a window
    * partitioned by bucket id — parallel, never a global single-task
    * sort — and buckets are stitched by comparing each bucket's
    * last-by-order value with the next bucket's first-by-order value.
    * Only the per-bucket summaries (≤ shuffle.partitions rows) cross a
    * global window. */
  def checkMonotonic(orderCol: String, valueCol: String): GraftFrame = {
    val ranged = df.select(df(orderCol).as("__o"), df(valueCol).as("__v"))
      .repartitionByRange(col("__o"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(col("__o"))
    val prev = lag(col("__v"), 1).over(w)
    val perBucket = ranged
      .withColumn("__up", coalesce(col("__v") >= prev, lit(true)))
      .withColumn("__dn", coalesce(col("__v") <= prev, lit(true)))
      .groupBy(col("__pid"))
      .agg(
        bool_and(col("__up")).as("__bup"),
        bool_and(col("__dn")).as("__bdn"),
        min_by(col("__v"), col("__o")).as("__first"),
        max_by(col("__v"), col("__o")).as("__last"))
    // bucket ranges are ordered by __pid (RangePartitioner contract), so a
    // lag over bucket summaries supplies the cross-boundary adjacent pair
    val wb = Window.orderBy(col("__pid"))
    val lastPrev = lag(col("__last"), 1).over(wb)
    GraftFrame(perBucket
      .select(
        (col("__bup") && coalesce(col("__first") >= lastPrev, lit(true))).as("__up"),
        (col("__bdn") && coalesce(col("__first") <= lastPrev, lit(true))).as("__dn"))
      .agg(bool_and(col("__up")).as("increasing"), bool_and(col("__dn")).as("decreasing")))
  }

  // --------------------------------------------------------- sketches §2.13
  /** Count-min frequency sketch built distributed (merge-combine per
    * partition); eps/confidence size the sketch. The approximate-frequency
    * answer for heavy-hitter analysis at 100 TB. */
  def countMinSketch(colName: String, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)

  /** Bloom filter built distributed — membership pre-filters for joins
    * (the reference's bloom_filter op, base/bloom_filter.py:36; the runtime
    * join variant is the session config). */
  def bloomFilter(colName: String, expectedItems: Long,
      fpp: Double = 0.03): org.apache.spark.util.sketch.BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  /** Approximate quantiles via the distributed Greenwald-Khanna sketch —
    * the at-scale companion to the exact `quantile`/`describe`. */
  def quantileApprox(colName: String, probs: Seq[Double],
      relativeError: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(colName, probs.toArray, relativeError).toSeq

  // --------------------------------------------------------- sampling §2.11
  /** Bernoulli sample (reference indexing/sample.py:41 frac=). */
  def sample(frac: Double, seed: Long = 42L): GraftFrame =
    GraftFrame(df.sample(withReplacement = false, frac, seed))

  /** Weighted sample of n rows without replacement
    * (reference indexing/sample.py:41 weights=): Efraimidis–Spirakis keys
    * pow(u, 1/w) ≡ log(u)/w, then a distributed top-n — one TakeOrdered,
    * no driver-side pass, skew-free at any scale. */
  def sampleWeighted(n: Int, weightCol: String, seed: Long = 42L): GraftFrame =
    sampleWeightedBy(n, log(rand(seed)) / df(weightCol))

  /** [[sampleWeighted]] with deterministic uniforms drawn from a hash of
    * `keyCol` instead of rand(): the same rows come out on every run and on
    * every engine (the ES priority ln(u)/w is reproducible because u is an
    * exact dyadic rational — see [[graft.functions.PortableHash.uniform01]]).
    * Weights must be strictly positive. */
  def sampleWeightedHash(n: Int, weightCol: String, keyCol: String): GraftFrame =
    sampleWeightedBy(n,
      log(graft.functions.PortableHash.uniform01(df(keyCol))) / df(weightCol))

  private def sampleWeightedBy(n: Int, esKey: Column): GraftFrame =
    GraftFrame(df.withColumn("__es_key", esKey)
      .orderBy(col("__es_key").desc)
      .limit(n)
      .drop("__es_key"))

  /** Deterministic hash sample: stable across runs and engines. Buckets come
    * from the avalanche hash in [[graft.functions.PortableHash]] — the r2
    * residue-modulo formulation sampled 0% or 100% of residue-striped key
    * sets and overflowed ANSI arithmetic for keys ≥ ~3.5e9. */
  def sampleHash(colName: String, pct: Int): GraftFrame =
    GraftFrame(df.filter(graft.functions.PortableHash.bucket(df(colName), 100) < pct))

  /** Deterministic row shuffle (reference mt.random.shuffle applied to a
    * frame): total order by the portable avalanche hash of (key + seed) —
    * a sampled range-partitioned sort, reproducible across runs/engines. */
  def shuffleRows(keyCol: String, seed: Long = 42L): GraftFrame =
    GraftFrame(df.orderBy(
      graft.functions.PortableHash.uniform01(df(keyCol) + lit(seed)), df(keyCol)))

  /** numpy random.choice over frame rows. Without replacement: the first k
    * of a [[shuffleRows]] order (a TakeOrdered — no full sort materialized).
    * With replacement: k hash-uniform draws of a positional index joined
    * back through zipWithIndex (two narrow passes + one shuffle join; the
    * one `count()` action is the price of positional semantics, as in
    * ilocSlice). */
  def choiceRows(k: Int, keyCol: String, seed: Long = 42L,
      withReplacement: Boolean = false): GraftFrame = {
    require(k >= 0, s"choiceRows k must be >= 0: $k")
    if (!withReplacement)
      GraftFrame(df.orderBy(
          graft.functions.PortableHash.uniform01(df(keyCol) + lit(seed)), df(keyCol))
        .limit(k))
    else {
      val spark = df.sparkSession
      val cnt = df.count()
      require(cnt > 0, "choiceRows with replacement on an empty frame")
      val schema = df.schema.add(org.apache.spark.sql.types.StructField(
        "__ridx", org.apache.spark.sql.types.LongType, nullable = false))
      val indexed = spark.createDataFrame(
        df.orderBy(df(keyCol)).rdd.zipWithIndex().map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ i)
        }, schema)
      val draws = spark.range(0, k).toDF("__draw")
        .select(floor(graft.functions.PortableHash.uniform01(col("__draw") + lit(seed))
          * cnt).cast("long").as("__ridx"))
      GraftFrame(draws.join(indexed, Seq("__ridx"), "inner").drop("__ridx"))
    }
  }

  // ------------------------------------------------------------- UDF §2.12
  /** Partition-wise UDF — the reference's map_chunk (base/map_chunk.py:51),
    * its primary escape hatch: an iterator transform per partition with an
    * explicit output schema (the reference requires dtypes too when
    * inference fails, map_chunk.py:351). */
  def mapChunk(outSchema: StructType)(f: Iterator[Row] => Iterator[Row]): GraftFrame = {
    implicit val enc = RowEncoder.encoderFor(outSchema)
    GraftFrame(df.mapPartitions(f))
  }

  /** Row-wise apply (reference base/apply.py:69) — a special case of
    * mapChunk; prefer Column expressions wherever possible (they codegen). */
  def applyRows(outSchema: StructType)(f: Row => Row): GraftFrame =
    mapChunk(outSchema)(_.map(f))

  // ---------------------------------------------------------- windows §2.7
  /** Rolling window aggregation builder (reference
    * window/rolling/core.py:32). */
  def rolling(partitionBy: Seq[String], orderBy: Seq[String], n: Int): GraftRolling =
    GraftRolling(df, Windows.rolling(Windows.spec(partitionBy, orderBy), n))

  /** pandas rolling(center=True, min_periods=k): centered frame, null
    * until k rows are in frame. */
  def rollingCentered(partitionBy: Seq[String], orderBy: Seq[String],
      n: Int, minPeriods: Int = 1): GraftRolling =
    GraftRolling(df, Windows.rollingCentered(Windows.spec(partitionBy, orderBy), n),
      minPeriods)

  /** Expanding window builder (reference window/expanding/aggregation.py:119). */
  def expanding(partitionBy: Seq[String], orderBy: Seq[String]): GraftRolling =
    GraftRolling(df, Windows.expanding(Windows.spec(partitionBy, orderBy)))

  /** Time-offset rolling window — pandas rolling('90d')
    * (reference window/rolling/core.py:187 time-offset mode). */
  def rollingTime(partitionBy: Seq[String], tsCol: String, seconds: Long): GraftRolling =
    GraftRolling(df, Windows.rollingTime(partitionBy, tsCol, seconds))

  /** Weighted rolling mean — pandas rolling(win_type=...).mean() with
    * explicit weights (see Windows.triangWeights / gaussianWeights);
    * null until the trailing window is full, like min_periods=window. */
  def rollingWeighted(colName: String, out: String, weights: Seq[Double],
      partitionBy: Seq[String], orderBy: Seq[String]): GraftFrame =
    assign(out -> Windows.weightedRollingMean(
      df(colName), weights, Windows.spec(partitionBy, orderBy)))

  /** Whole-frame aggregation with the same named-spec registry as
    * groupby.agg (reference reduction/aggregation.py:86 frame-level agg). */
  def agg(specs: (String, String, String)*): GraftFrame = {
    val cols = specs.map { case (out, fn, c) => GraftGroupBy.aggExpr(df, fn, c).as(out) }
    GraftFrame(df.agg(cols.head, cols.tail: _*))
  }

  /** ewm mean (reference window/ewm/aggregation.py:207). */
  def ewmMean(key: String, order: String, value: String, alpha: Double): GraftFrame =
    GraftFrame(Windows.ewmMean(df, key, order, value, alpha))

  /** ewm mean + unbiased var + std in one streamed pass (reference
    * window/ewm/aggregation.py:207 aggregates all three). */
  def ewmStats(key: String, order: String, value: String, alpha: Double): GraftFrame =
    GraftFrame(Windows.ewmStats(df, key, order, value, alpha))

  /** shift/diff over explicit partition+order (reference base/shift.py:31,
    * base/diff.py:29). */
  def shift(colName: String, out: String, periods: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): GraftFrame =
    assign(out -> Windows.shift(df(colName), periods, Windows.spec(partitionBy, orderBy)))

  def diff(colName: String, out: String, periods: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): GraftFrame =
    assign(out -> Windows.diff(df(colName), periods, Windows.spec(partitionBy, orderBy)))

  /** Fractional change vs `periods` rows back: x/lag(x, periods) − 1, null
    * while the lag is undefined — pandas pct_change with fill_method=None
    * (reference base/pct_change.py:27, which composes exactly this
    * shift-divide). Same single window sort as shift/diff. */
  def pctChange(colName: String, out: String, periods: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): GraftFrame = {
    val prev = Windows.shift(df(colName), periods, Windows.spec(partitionBy, orderBy))
    assign(out -> (df(colName).cast("double") / prev.cast("double") - lit(1.0)))
  }

  // ------------------------------------------------- partitioning §2.10
  /** rebalance to n partitions (reference base/rebalance.py:25) — a full
    * round-robin exchange, the same operation the reference performs. */
  def rebalance(n: Int): GraftFrame = GraftFrame(df.repartition(n))

  /** rechunk without a shuffle where possible (reference base/rechunk.py:32):
    * coalesce merges co-located partitions. */
  def rechunk(n: Int): GraftFrame = GraftFrame(df.coalesce(n))

  /** Hash-partition on key columns (pre-partitioning so a following
    * join/agg on the same keys plans no extra exchange). */
  def repartitionBy(n: Int, cols: String*): GraftFrame =
    GraftFrame(df.repartition(n, cols.map(df(_)): _*))

  /** Distributed transpose (reference base/transpose.py): id values become
    * columns, value columns become rows. The data path is fully
    * distributed — melt to (id, column, value) long form, ONE
    * partial-aggregatable shuffle building a per-output-row map (each
    * partition pre-merges its own id→value entries, so no single task
    * ever holds more than the output row it owns), then a projection
    * into the wide schema. Only the id LABELS are collected, because the
    * output schema needs them — exactly what the reference does with the
    * axis index.
    *
    * The honest scale bound is the output WIDTH, not the input size: a
    * transposed row is inherently one column per input row, and no
    * engine escapes that (the reference tiles it, but a 1e9-column frame
    * is still unusable). `maxCols` guards it loudly; past ~1e5 use the
    * long form (melt) directly. */
  def transpose(idCol: String, maxCols: Int = 100000): GraftFrame = {
    val ids = df.select(df(idCol).cast("string").as("__id")).distinct()
      .orderBy(col("__id")).limit(maxCols + 1).collect().map(_.getString(0))
    require(!ids.contains(null),
      s"transpose id column '$idCol' contains null — a null cannot name " +
        "an output column (drop or fill it first)")
    require(ids.length <= maxCols,
      s"transpose output would exceed $maxCols columns (one per distinct " +
        s"'$idCol') — a frame that wide is unusable; work on the melted " +
        "long form instead or raise maxCols deliberately")
    val valueCols = df.columns.filterNot(_ == idCol).toSeq
    requireNumericValueCols(valueCols)
    val melted = df.select(
        (df(idCol).cast("string").as("__id") +:
          valueCols.map(c => df(c).cast("double").as(c))): _*)
      .unpivot(Array(col("__id")), valueCols.map(col).toArray, "column", "value")
      // duplicate ids keep their first value (pivot/first parity) so the
      // map build below never sees a duplicate key
      .groupBy(col("column"), col("__id")).agg(first(col("value")).as("value"))
    val agg = melted.groupBy(col("column"))
      .agg(map_from_entries(
        collect_list(struct(col("__id"), col("value")))).as("__m"))
    // widen imperatively: a declarative n-column projection (element_at
    // per id) costs Catalyst O(n²) in analysis/codegen past ~10k columns
    // (measured: ~30 s at 12k); reading the map per row is O(n) flat.
    // The distributed work — melt, dedup, map-merge shuffle — all
    // happened declaratively above; this is only the final row shaping.
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("column",
        org.apache.spark.sql.types.StringType) +:
        ids.toSeq.map(id => org.apache.spark.sql.types.StructField(
          id, org.apache.spark.sql.types.DoubleType)))
    val idSeq = ids.toSeq
    val rows = agg.rdd.map { r =>
      val m = r.getMap[String, Any](1)
      org.apache.spark.sql.Row.fromSeq(r.getString(0) +: idSeq.map(m.getOrElse(_, null)))
    }
    GraftFrame(df.sparkSession.createDataFrame(rows, schema))
  }

  /** Small-frame transpose (kept for parity with r1–r6 call sites; the
    * distributed path is [[transpose]]): id values become
    * columns, value columns become rows. Collects the (small) id set on the
    * driver to fix the output schema — like the reference, which needs the
    * full axis labels to transpose; do not call on large frames. A hard
    * row-count guard fails loudly instead of OOMing the driver when a
    * mis-aimed call hits a big frame. */
  /** The transposed cells are double-typed; a non-numeric value column
    * would be silently nulled by the cast — reject loudly instead
    * (pandas transpose keeps objects; this engine's transpose is the
    * numeric-matrix form, so mixed frames must drop/convert first). */
  private def requireNumericValueCols(valueCols: Seq[String]): Unit = {
    val numeric = Set("byte", "short", "integer", "long",
      "float", "double", "decimal", "boolean")
    val bad = df.schema.fields
      .filter(f => valueCols.contains(f.name))
      .filterNot(f => numeric.exists(f.dataType.typeName.startsWith))
      .map(f => s"${f.name}: ${f.dataType.typeName}")
    require(bad.isEmpty,
      s"transpose value columns must be numeric — non-numeric columns " +
        s"would be silently nulled by the double cast: ${bad.mkString(", ")} " +
        "(drop them or cast explicitly first)")
  }

  def transposeSmall(idCol: String, maxRows: Int = 10000): GraftFrame = {
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"transposeSmall is a small-frame operator: > $maxRows rows " +
        "(its output schema is one column per input row; transpose of a " +
        "large frame has no scalable formulation — see reference base/transpose.py)")
    val ids = df.select(df(idCol)).orderBy(df(idCol)).collect().map(_.get(0).toString)
    val valueCols = df.columns.filterNot(_ == idCol).toSeq
    requireNumericValueCols(valueCols)
    val melted = df.select(
        (df(idCol).cast("string").as("__id") +:
          valueCols.map(c => df(c).cast("double").as(c))): _*)
      .unpivot(Array(col("__id")), valueCols.map(col).toArray, "column", "value")
    GraftFrame(melted.groupBy("column").pivot("__id", ids.toSeq).agg(first(col("value"))))
  }

  // ------------------------------------------- execution surface (mars
  // .execute()/.persist()/.fetch(), mars/core/entity/tileables.py — Spark
  // is lazy the same way the reference is; these force/cache/pull)
  /** Trigger computation and return this handle (mars `.execute()`).
    * In Spark the materialized result lives in the shuffle files /
    * cache of the lineage rather than a chunk store; chain `.persist()`
    * first when later reuse should skip recompute. */
  def execute(): GraftFrame = { df.count(); this }

  /** Cache at MEMORY_AND_DISK (mars `.persist()`). */
  def persist(): GraftFrame = GraftFrame(df.persist())

  /** Cache at a named storage level, e.g. "MEMORY_ONLY", "DISK_ONLY". */
  def persist(level: String): GraftFrame =
    GraftFrame(df.persist(org.apache.spark.storage.StorageLevel.fromString(level)))

  /** Release a cached frame. */
  def unpersist(): GraftFrame = GraftFrame(df.unpersist())

  /** Truncate lineage via a local checkpoint (mars chunk materialization
    * boundary — stops Catalyst re-deriving a long pipeline's plan). */
  def localCheckpoint(): GraftFrame = GraftFrame(df.localCheckpoint())

  /** Pull up to `n` rows to the driver (mars `.fetch()`); bounded by
    * construction — use sinks for full results. */
  def fetch(n: Int = 1000): Array[org.apache.spark.sql.Row] = df.take(n)

  // ------------------------------------------------------------ sinks §2.2
  /** to_parquet (reference datastore/to_parquet.py:44). */
  def toParquet(path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** to_csv (reference datastore/to_csv.py:41). `singleFile` mirrors the
    * reference's one-file mode (TO_CSV_STAT two-phase, to_csv.py:432) via
    * coalesce(1) — only for modest results, as there. */
  def toCsv(path: String, header: Boolean = true, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite").option("header", header).csv(path)
  }

  /** ORC sink (to_orc) — same partitionBy contract as [[toParquet]]. */
  def toOrc(path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Store numeric columns as a 2-D zarr v2 array (mars `to_zarr`,
    * reference tensor/datastore/to_zarr.py:64) — see
    * [[graft.sources.Zarr]] for the chunk layout and profile. */
  def toZarr(path: String, valueCols: Seq[String],
      chunkRows: Int = 65536): (Long, Int) =
    graft.sources.Zarr.write(df, path, valueCols, chunkRows)

  /** Store numeric columns as a contiguous float64 HDF5 dataset (mars
    * `to_hdf5`, reference tensor/datastore/to_hdf5.py:56) — see
    * [[graft.sources.Hdf5]] for the clean-room format profile. */
  def toHdf5(path: String, valueCols: Seq[String],
      dataset: String = "data"): (Long, Int) =
    graft.sources.Hdf5.write(df, path, valueCols, dataset)

  /** JSON-lines sink (pandas to_json(orient='records', lines=True)). */
  def toJson(path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite").json(path)
  }

  /** Persist as a bucketed (+ optionally sorted) table: repeated joins or
    * aggregations on `keys` then run with NO shuffle — the pre-partitioning
    * the reference achieves with aligned chunking, and the standard Spark
    * answer to "co-locate the 100 TB fact tables once, join them many
    * times". Both sides of a join must share the bucket count. */
  def toBucketedTable(name: String, buckets: Int, keys: Seq[String],
      sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sorted) w.sortBy(keys.head, keys.tail: _*) else w)
      .format("parquet").saveAsTable(name)
  }

  /** to_sql (reference datastore/to_sql.py:60). */
  def toJdbc(url: String, table: String,
      properties: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, properties)
}

/** Deferred grouped frame (reference groupby/core.py:47-100;
  * RelationalGroupedDataset is the Spark analog). Aggregations compile to
  * partial+final hash aggregation — the reference's tree/shuffle/auto
  * strategies (groupby/aggregation.py:887) collapse into Catalyst+AQE.
  */
final case class GraftGroupBy(df: DataFrame, keys: Seq[String]) {
  private def grouped = df.groupBy(keys.map(df(_)): _*)

  /** Named aggregation: (outName, function, column). Functions cover the
    * reference's bound-method surface (groupby/__init__.py:46-64) plus
    * product, str_concat, all, any from the reduction modules. */
  def agg(specs: (String, String, String)*): GraftFrame = {
    val cols = specs.map { case (out, fn, c) => GraftGroupBy.aggExpr(df, fn, c).as(out) }
    GraftFrame(grouped.agg(cols.head, cols.tail: _*))
  }

  /** Aggregation with arbitrary aggregate Columns — the escape hatch for
    * user Aggregators (reference CustomReduction,
    * reduction/custom_reduction.py:23: register any
    * `org.apache.spark.sql.expressions.Aggregator` via `udaf` and pass the
    * resulting column here). */
  def aggCols(cols: (String, Column)*): GraftFrame = {
    val named = cols.map { case (out, c) => c.as(out) }
    GraftFrame(grouped.agg(named.head, named.tail: _*))
  }

  /** pandas groupby().corr() for one column pair — per-group Pearson
    * from EXACT moment sums in one partial+final aggregate (the grouped
    * OLS shape), then the closed form on doubles cast from the exact
    * sums: deterministic same-shape arithmetic on any engine, so the
    * result is oracle-able at round-4. Pass DECIMAL-cast columns
    * (e.g. through the dec12 convention) for exact sums; zero-variance
    * groups return null (0/0 guarded). */
  def corr(x: Column, y: Column, out: String = "corr"): GraftFrame = {
    val m = grouped.agg(
      functions.count(lit(1)).cast("double").as("__n"),
      functions.sum(x).cast("double").as("__sx"),
      functions.sum(y).cast("double").as("__sy"),
      functions.sum(x * y).cast("double").as("__sxy"),
      functions.sum(x * x).cast("double").as("__sxx"),
      functions.sum(y * y).cast("double").as("__syy"))
    val den2 = (col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
      (col("__n") * col("__syy") - col("__sy") * col("__sy"))
    val rho = when(den2 > 0.0,
      (col("__n") * col("__sxy") - col("__sx") * col("__sy")) / sqrt(den2))
    GraftFrame(m.select(keys.map(col) :+ rho.as(out): _*))
  }

  /** pandas groupby.filter: keep every ROW of groups whose aggregate
    * satisfies the predicate (e.g. `count >= 3`). One window aggregate
    * over the group keys — no join back, no second scan. */
  def filterGroups(aggExprName: String, valueCol: String)(
      pred: Column => Column): GraftFrame = {
    val w = Window.partitionBy(keys.map(df(_)): _*)
    val agg = GraftGroupBy.aggExpr(df, aggExprName, valueCol).over(w)
    GraftFrame(df.withColumn("__ga", agg).filter(pred(col("__ga"))).drop("__ga"))
  }

  /** Index of the max/min value per group (pandas groupby.idxmax; tensor
    * argmax, opcodes.py:301-354). Deterministic tie-break: the LARGEST id
    * among tied values (struct ordering compares value, then id) — the
    * same total order an `ORDER BY v DESC, id DESC` oracle replays.
    * One partial/final max aggregate; no window, no second pass. */
  def idxmax(valueCol: String, idCol: String, out: String): GraftFrame =
    aggCols(out -> org.apache.spark.sql.functions
      .max(when(df(valueCol).isNotNull, struct(df(valueCol), df(idCol))))
      .getField(idCol))

  /** Index of the min value per group; ties → the SMALLEST id. */
  def idxmin(valueCol: String, idCol: String, out: String): GraftFrame =
    // null values must be masked BEFORE the struct: a (null, id) struct
    // sorts below every real value and would win the min, where pandas
    // idxmin skips NaN rows entirely
    aggCols(out -> org.apache.spark.sql.functions
      .min(when(df(valueCol).isNotNull, struct(df(valueCol), df(idCol))))
      .getField(idCol))

  def sum(cols: String*): GraftFrame = agg(cols.map(c => (s"${c}_sum", "sum", c)): _*)
  def mean(cols: String*): GraftFrame = agg(cols.map(c => (s"${c}_mean", "mean", c)): _*)
  def min(cols: String*): GraftFrame = agg(cols.map(c => (s"${c}_min", "min", c)): _*)
  def max(cols: String*): GraftFrame = agg(cols.map(c => (s"${c}_max", "max", c)): _*)
  def count(): GraftFrame = agg(("count", "count", keys.head))
  def nunique(cols: String*): GraftFrame =
    agg(cols.map(c => (s"${c}_nunique", "nunique", c)): _*)

  /** Per-group top-n by order (reference groupby/head.py:30). */
  def head(n: Int, orderBy: Seq[Column]): GraftFrame = {
    val w = Window.partitionBy(keys.map(df(_)): _*).orderBy(orderBy: _*)
    GraftFrame(df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn"))
  }

  /** pandas groupby.nth(n) over an explicit order (reference
    * groupby/getitem.py nth surface): the single n-th row per group,
    * 0-based; negative n counts from the group's end. One row_number
    * window (reversed for negative n — pass PLAIN ascending columns).
    * No group materialization. */
  def nth(n: Int, orderBy: Seq[Column]): GraftFrame = {
    val ord = if (n >= 0) orderBy else orderBy.map(_.desc)
    val pos = if (n >= 0) n + 1 else -n
    val w = Window.partitionBy(keys.map(df(_)): _*).orderBy(ord: _*)
    GraftFrame(df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === pos).drop("__rn"))
  }

  /** Per-group Bernoulli fraction sample, deterministic via row hashing —
    * reproducible across runs and engines (reference groupby/sample.py
    * frac=). */
  def sampleFrac(frac: Double, seed: Long = 42L): GraftFrame = {
    val pct = (frac * 100).toInt
    GraftFrame(df.filter(
      pmod(hash((df.columns.map(df(_)) :+ lit(seed)).toSeq: _*), lit(100)) < pct))
  }

  /** Per-group deterministic sample of up to n rows: hash-ordered
    * row_number, no rand() (reference groupby/sample.py). */
  def sampleN(n: Int, seed: Long = 42L): GraftFrame = {
    val w = Window.partitionBy(keys.map(df(_)): _*)
      .orderBy(hash((df.columns.map(df(_)) :+ lit(seed)).toSeq: _*))
    GraftFrame(df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn"))
  }

  /** pandas groupby.cumcount: 0-based position of each row within its
    * group over an explicit order (reference groupby/cum.py — cumcount is
    * the row index the reference gets for free from pandas; here it is a
    * row_number window minus one). */
  def cumcount(out: String, orderBy: Seq[String]): GraftFrame =
    GraftFrame(df.withColumn(out,
      row_number().over(Windows.spec(keys, orderBy)).cast("long") - 1L))

  /** Group-wise cumulative sum (reference groupby/cum.py:154). */
  def cumsum(valueCol: String, out: String, orderBy: Seq[String]): GraftFrame =
    GraftFrame(df.withColumn(out,
      Windows.cumsum(df(valueCol), Windows.spec(keys, orderBy))))

  /** Group-wise mean absolute deviation about the group mean (pandas
    * groupby.mad): group means then one more aggregate over the join —
    * both hash aggregates are partial+final, no per-group window buffer. */
  def mad(valueCol: String, out: String): GraftFrame = {
    val means = df.groupBy(keys.map(df(_)): _*).agg(avg(df(valueCol)).as("__m"))
    GraftFrame(df.join(means, keys)
      .groupBy(keys.map(col): _*)
      .agg(avg(abs(col(valueCol) - col("__m"))).as(out)))
  }

  /** Grouped peak-to-peak (reference ptp.py:23 with axis/groupby). */
  def ptp(valueCol: String, out: String): GraftFrame =
    GraftFrame(df.groupBy(keys.map(df(_)): _*)
      .agg((functions.max(df(valueCol)) - functions.min(df(valueCol))).as(out)))

  /** Grouped weighted average Σw·x / Σw (reference average.py:24). */
  def averageWeighted(valueCol: String, weightCol: String, out: String): GraftFrame =
    GraftFrame(df.groupBy(keys.map(df(_)): _*)
      .agg((functions.sum(df(valueCol) * df(weightCol)).cast("double") /
        functions.sum(df(weightCol)).cast("double")).as(out)))

  /** Two-phase salted aggregation for skewed group keys: partial aggregate
    * on (key, salt) splits a hot key over `saltFactor` tasks, then the
    * partials merge per key. Only algebraic functions (sum/count/min/max)
    * decompose this way; for them results equal the direct aggregation.
    * Spark's own partial aggregation usually makes this unnecessary — the
    * explicit form exists for aggregations whose map-side combine is
    * defeated (e.g. high-cardinality composite states). */
  def saltedAgg(valueCol: String, fn: String, out: String,
      saltFactor: Int = 16, seed: Long = 42L): GraftFrame = {
    require(Set("sum", "count", "min", "max")(fn), s"non-algebraic fn: $fn")
    val salted = df.withColumn("__salt", pmod(hash(rand(seed)), lit(saltFactor)))
    val partial = salted.groupBy((keys :+ "__salt").map(salted(_)): _*)
      .agg(GraftGroupBy.aggExpr(df, fn, valueCol).as("__p"))
    val finalFn = fn match {
      case "count" => "sum" // counts merge by summing
      case other => other
    }
    GraftFrame(partial.groupBy(keys.map(partial(_)): _*)
      .agg(GraftGroupBy.aggExpr(partial, finalFn, "__p").as(out)))
  }

  /** Same-shape group transform (reference groupby/transform.py:28): the
    * group aggregate broadcast back onto every row — a partition-only
    * window, no row order needed. */
  def transform(fn: String, valueCol: String, out: String): GraftFrame = {
    val w = Window.partitionBy(keys.map(df(_)): _*)
    GraftFrame(df.withColumn(out, GraftGroupBy.aggExpr(df, fn, valueCol).over(w)))
  }

  /** Arbitrary per-group transform — the reference's groupby.apply
    * (groupby/apply.py:58) via sort-within-partition streaming (same
    * engine-level shape as Windows.ewmMean: one shuffle, spillable sort,
    * no per-group materialization beyond what `f` itself holds). */
  def applyGroups(outSchema: StructType)(
      f: (Row, Iterator[Row]) => Iterator[Row]): GraftFrame = {
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val keyIdx = keys.map(df.columns.indexOf(_))
    val out = df
      .repartition(keys.map(df(_)): _*)
      .sortWithinPartitions(keys.map(df(_)): _*)
      .mapPartitions { rows =>
        new Iterator[Row] {
          private val buf = rows.buffered
          private var cur: Iterator[Row] = Iterator.empty
          override def hasNext: Boolean = cur.hasNext || buf.hasNext
          override def next(): Row = {
            if (!cur.hasNext) {
              val keyRow = buf.head
              val keyVals = keyIdx.map(keyRow.get)
              val group = new scala.collection.mutable.ArrayBuffer[Row]()
              while (buf.hasNext && keyIdx.map(buf.head.get) == keyVals)
                group += buf.next()
              cur = f(Row.fromSeq(keyVals), group.iterator)
            }
            cur.next()
          }
        }
      }
    GraftFrame(out)
  }
}

object GraftGroupBy {
  /** Aggregate-function registry — the trivial ReductionCompiler analog
    * (reference reduction/core.py:790 decomposes into pre/agg/post; Spark's
    * partial+final aggregation does the same automatically for all of
    * these). */
  def aggExpr(df: DataFrame, fn: String, c: String): Column = fn match {
    case "sum" => sum(df(c))
    case "mean" | "avg" => avg(df(c))
    case "min" => min(df(c))
    case "max" => max(df(c))
    case "count" => count(lit(1))
    case "size" => count(lit(1))
    case "var" => var_samp(df(c))
    case "std" => stddev_samp(df(c))
    case "sem" => aggregates.sem(df(c))
    case "skew" => skewness(df(c))
    case "kurt" => kurtosis(df(c))
    case "nunique" => countDistinct(df(c))
    case "approx_nunique" => approx_count_distinct(df(c)) // HyperLogLog++
    case "product" | "prod" => aggregates.product(df(c))
    case "all" => bool_and(df(c))
    case "any" => bool_or(df(c))
    case "first" => first(df(c))
    case "last" => last(df(c))
    case "collect" => collect_list(df(c))
    case "mode" => mode(df(c))
    case "median" => percentile(df(c), lit(0.5))
    case "p25" => percentile(df(c), lit(0.25))
    case "p75" => percentile(df(c), lit(0.75))
    // tensor reduction tail (opcodes.py:301-354)
    case "count_nonzero" => count(when(df(c) =!= 0, 1))
    case "moment2" | "moment3" => {
      // kth central moment from raw-moment sums — one partial/final hash
      // agg pass, same derivation as Windows.rollingSkew
      val x = df(c).cast("double")
      val n = count(x).cast("double")
      val m = sum(x) / n
      if (fn == "moment2") sum(x * x) / n - m * m
      else sum(x * x * x) / n - lit(3.0) * m * (sum(x * x) / n) +
        lit(2.0) * m * m * m
    }
    case other => throw new IllegalArgumentException(s"unknown agg function: $other")
  }
}

/** Window-aggregation builder shared by rolling/expanding (reference
  * window/rolling/aggregation.py:42, window/aggregation.py:52). */
final case class GraftRolling(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
    minPeriods: Int = 1) {
  import org.apache.spark.sql.{functions => F}
  /** pandas min_periods: aggregates are null until the frame holds
    * `minPeriods` rows. */
  private def mp(agg: Column): Column = Windows.minPeriods(agg, w, minPeriods)
  def sum(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.sum(df(c)).over(w))))
  def mean(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.avg(df(c)).over(w))))
  def min(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.min(df(c)).over(w))))
  def max(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.max(df(c)).over(w))))
  def count(out: String): GraftFrame =
    GraftFrame(df.withColumn(out, F.count(lit(1)).over(w)))
  def varSamp(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.var_samp(df(c)).over(w))))
  def std(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.stddev_samp(df(c)).over(w))))
  def median(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(Windows.rollingMedian(df(c), w))))
  /** pandas rolling.quantile(q): exact interpolated percentile over the
    * frame (same engine contract as describe/qcut/winsorize). */
  def quantile(c: String, q: Double, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(percentile(df(c), lit(q)).over(w))))
  def skew(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(Windows.rollingSkew(df(c), w))))
  def kurt(c: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(Windows.rollingKurt(df(c), w))))
  /** pandas rolling.rank(pct=True, method='average'): average rank of
    * the current value inside its own window, as a fraction of the
    * window size — cnt_below + (cnt_ties + 1)/2, over n. Exact rationals
    * (counts and halves), engine-reproducible without rounding. */
  def rankPct(c: String, out: String): GraftFrame = {
    val arr = F.collect_list(df(c)).over(w)
    val below = F.aggregate(arr, F.lit(0.0),
      (acc, x) => acc + F.when(x < df(c), F.lit(1.0)).otherwise(F.lit(0.0)))
    val ties = F.aggregate(arr, F.lit(0.0),
      (acc, x) => acc + F.when(x === df(c), F.lit(1.0)).otherwise(F.lit(0.0)))
    GraftFrame(df.withColumn(out,
      mp((below + (ties + F.lit(1.0)) / F.lit(2.0)) /
        F.size(arr).cast("double"))))
  }
  def agg(cols: (String, Column)*): GraftFrame =
    GraftFrame(cols.foldLeft(df) { case (d, (out, c)) => d.withColumn(out, mp(c.over(w))) })
  /** Pairwise rolling Pearson correlation (pandas rolling.corr(other);
    * reference window/aggregation.py pairwise path). */
  def corr(x: String, y: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.corr(df(x), df(y)).over(w))))
  /** Pairwise rolling sample covariance (pandas rolling.cov(other)). */
  def cov(x: String, y: String, out: String): GraftFrame =
    GraftFrame(df.withColumn(out, mp(F.covar_samp(df(x), df(y)).over(w))))
}

/** Shared pieces of the aligned binary-op family (add/sub/.../pow over
  * key-aligned frames, Series, and column broadcasts). */
object GraftFrame {

  /** Numeric non-key columns, in frame order. */
  private[api] def numericValueCols(d: DataFrame,
      keys: Seq[String]): Seq[String] = {
    val numeric = Set("byte", "short", "integer", "long",
      "float", "double", "decimal")
    d.schema.fields
      .filter(f => !keys.contains(f.name) &&
        numeric.exists(f.dataType.typeName.startsWith))
      .map(_.name).toSeq
  }

  private[api] def alignedOp(op: String): (Column, Column) => Column =
    op match {
      case "add" => _ + _
      case "sub" => _ - _
      case "mul" => _ * _
      case "div" => _ / _
      case "floordiv" => (a, b) => floor(a / b)
      case "mod" => (a, b) => pmod(a, b) // python sign-of-divisor semantics
      case "pow" => (a, b) => pow(a, b)
      // pandas reversed binops (df.rsub(other) == other - df, etc.)
      case "radd" => (a, b) => b + a
      case "rsub" => (a, b) => b - a
      case "rmul" => (a, b) => b * a
      case "rdiv" => (a, b) => b / a
      case "rfloordiv" => (a, b) => floor(b / a)
      case "rmod" => (a, b) => pmod(b, a)
      case "rpow" => (a, b) => pow(b, a)
      case o => throw new IllegalArgumentException(
        s"aligned op must be add|sub|mul|div|floordiv|mod|pow or an " +
          s"r-reversed form: $o")
    }

  /** Exact integer DOUBLE-rank (2 × average rank = 2·count-below + tie
    * count, always an integer) of `valueCol` over the whole frame, joined
    * back as `out` — the quantileTransform bucketed two-pass (distinct
    * values → range-partitioned cumulative counts stitched with
    * per-bucket offsets → value-keyed join back) without the /n
    * normalization, so downstream moment sums stay exact integers. */
  private[api] def doubleRank(d: DataFrame, valueCol: String,
      out: String): DataFrame = {
    val g = d.groupBy(d(valueCol).as("__v")).agg(count(lit(1)).as("__c"))
      .repartitionByRange(col("__v"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g.withColumn("__bl",
      coalesce(sum(col("__c")).over(wLocal), lit(0L)))
    val wPid = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid")).agg(sum(col("__c")).as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(wPid), lit(0L)))
    val rankMap = local
      .join(broadcast(offsets.select(col("__pid"), col("__off"))), Seq("__pid"))
      .select(col("__v"),
        (lit(2L) * (col("__bl") + col("__off")) + col("__c")).as(out))
    d.join(rankMap, d(valueCol) === rankMap("__v")).drop("__v")
  }

  /** Pandas missing-cell rule: missing on BOTH sides → null regardless of
    * fill; present on one side uses the fill for the other when given,
    * else the op sees the null and yields null (pandas NaN). */
  private[api] def alignedCell(opFn: (Column, Column) => Column,
      lv: Column, rv: Column, fillValue: Option[Double]): Column = {
    val (lf, rf) = fillValue match {
      case Some(v) => (coalesce(lv, lit(v)), coalesce(rv, lit(v)))
      case None => (lv, rv)
    }
    when(lv.isNull && rv.isNull, lit(null).cast("double"))
      .otherwise(opFn(lf, rf))
  }
}
