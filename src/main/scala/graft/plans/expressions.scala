package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expressions for the vector/dedup hot loops.
  *
  * The higher-order-function formulations in [[graft.functions.VectorFunctions]]
  * and [[graft.operators.Dedup]] are correct and declarative, but Spark
  * evaluates HOF lambdas interpretively per element — for a 64-float cosine
  * that is ~200 boxed lambda invocations per row. These expressions compute
  * the same values (bit-identical: same float operations in the same order)
  * inside whole-stage codegen with tight primitive loops — the (b)-level
  * escape hatch of SURVEY §7.3, used only where the built-in operators
  * can't hit the required per-row throughput.
  *
  * Registered via [[GraftExtensions]] (`spark.sql.extensions`); callers fall
  * back to the HOF forms on sessions without the extension.
  */

/** cosine(a, b) over array<float> columns, double accumulation in ascending
  * index order — identical to the zip_with/aggregate fold it replaces. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** euclidean(a, b) over array<float> columns — same ascending-index double
  * accumulation as the zip_with/aggregate fold it replaces. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_euclidean"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EuclideanDistance =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over an array<long> of pre-hashed shingles: one tight
  * loop replacing the aggregate/transform fold. Arithmetic matches the HOF
  * form exactly: h = pmod(murmur3(shingle), p), sig_i = min over shingles
  * of (a_i * h + b_i) mod p. */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val P = 2147483647L // 2^31 - 1

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // same coefficient family as Dedup.minhashSignature
  private lazy val aCoefs: Array[Long] = Array.tabulate(numHashes)(i =>
    1L + 2L * Math.floorMod(mix64(seed + 2L * i), 1000000000L))
  private lazy val bCoefs: Array[Long] = Array.tabulate(numHashes)(i =>
    Math.floorMod(mix64(seed + 2L * i + 1), 1000000000L))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(P)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      // identical to pmod(hash(x).cast("long"), p): murmur3-of-long, int
      // result sign-extended to long, then positive mod
      val h32 = Murmur3_x86_32.hashLong(arr.getLong(j), 42).toLong
      val h = ((h32 % P) + P) % P
      var i = 0
      while (i < numHashes) {
        val v = (aCoefs(i) * h + bCoefs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCoefs", aCoefs, "long[]")
    val bRef = ctx.addReferenceObj("bCoefs", bCoefs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val h32 = ctx.freshName("h32")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${P}L);
         |int $m = $arr.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  long $h32 = (long) org.apache.spark.unsafe.hash.Murmur3_x86_32
         |    .hashLong($arr.getLong($j), 42);
         |  long $h = (($h32 % ${P}L) + ${P}L) % ${P}L;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of token hashes: per-bit ±1 votes
  * folded in one loop, bit set when the vote is non-negative — replacing
  * the 64-wide HOF vote-vector fold with identical results. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) != 0L) 1L else -1L)
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $votes = new long[64];
         |int $m = $arr.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  long $h = $arr.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) != 0L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Tokenizer-scale BPE token count (r15): `graft_bpe_count(text, mergesSpec)`
  * where `mergesSpec` is a FOLDABLE string literal — the merge table
  * serialized by [[graft.functions.BpeEncode.serialize]] (the bloom-bitset
  * literal convention: fit/train offline, embed the constant). The encoder
  * itself is the shared executor-side merge loop in
  * [[graft.functions.BpeEncode]]: plan size is O(1) in the vocabulary, so
  * a production 32k–50k merge table costs one reference object instead of
  * one plan node per merge (the replace-chain's limit). Counts are
  * IDENTICAL to [[graft.functions.TextFunctions.bpeTokenCount]] on the
  * same merges — BpeSpec pins it on adversarial strings + fixture docs.
  * The distinct-word cache is per-expression-instance (bounded), shared
  * by every row the instance evaluates. */
case class BpeTokenCount(text: Expression, mergesSpec: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = text
  override def right: Expression = mergesSpec
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!mergesSpec.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe_count mergesSpec must be a foldable literal " +
          "(BpeEncode.serialize the merge table and embed it)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val v = mergesSpec.eval()
    require(v != null, "graft_bpe_count mergesSpec must not be null")
    graft.functions.BpeEncode.parseRanks(v.toString)
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  override protected def nullSafeEval(t: Any, spec: Any): Any =
    graft.functions.BpeEncode.countDoc(t.toString, ranks, cache)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference objects keep the parsed rank table + word cache OUT of the
    // generated source (a 50k-merge table would otherwise be a 1 MB string
    // constant compiled per stage) and shared across rows
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    val cacheRef = ctx.addReferenceObj("bpeCache", cache,
      "java.util.concurrent.ConcurrentHashMap<String, Long>")
    nullSafeCodeGen(ctx, ev, (t, _) => {
      s"""
         |${ev.value} = graft.functions.BpeEncode.countDoc(
         |  $t.toString(), $ranksRef, $cacheRef);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokenCount =
    copy(text = newLeft, mergesSpec = newRight)
}

/** Tokenizer-scale BPE ENCODING (r15): `graft_bpe_tokenize(text,
  * mergesSpec)` → the document's full subword sequence as
  * array<string> — the flat token stream an LLM pipeline feeds to
  * packing/chunking, where [[BpeTokenCount]] only counts it. Same
  * foldable-literal merge table, same [[graft.functions.BpeEncode]]
  * merge loop (sequences, not just lengths, are pinned ≡ the replace
  * chain — BpeSpec — and oracle-gated via ext_bpe_encode); the
  * distinct-word cache holds symbol arrays. */
case class BpeTokenize(text: Expression, mergesSpec: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = text
  override def right: Expression = mergesSpec
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokenize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!mergesSpec.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe_tokenize mergesSpec must be a foldable literal " +
          "(BpeEncode.serialize the merge table and embed it)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val v = mergesSpec.eval()
    require(v != null, "graft_bpe_tokenize mergesSpec must not be null")
    graft.functions.BpeEncode.parseRanks(v.toString)
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  override protected def nullSafeEval(t: Any, spec: Any): Any =
    BpeTokenize.toArrayData(
      graft.functions.BpeEncode.tokenizeDoc(t.toString, ranks, cache))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    val cacheRef = ctx.addReferenceObj("bpeSymCache", cache,
      "java.util.concurrent.ConcurrentHashMap<String, String[]>")
    nullSafeCodeGen(ctx, ev, (t, _) => {
      s"""
         |${ev.value} = graft.plans.BpeTokenize.toArrayData(
         |  graft.functions.BpeEncode.tokenizeDoc($t.toString(), $ranksRef, $cacheRef));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokenize =
    copy(text = newLeft, mergesSpec = newRight)
}

object BpeTokenize {
  /** Java-callable bridge for codegen: symbol strings → ArrayData. */
  def toArrayData(syms: Array[String]): ArrayData = {
    val n = syms.length
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(syms(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Tokenizer-scale BPE token-ID encoding (r16): `graft_bpe_ids(text,
  * mergesSpec, vocabSpec)` → array<int> — the id stream a training
  * pipeline feeds to packing/models. Both specs are FOLDABLE literals
  * ([[graft.functions.BpeEncode.serialize]] /
  * [[graft.functions.BpeVocab.serialize]] — the bloom-bitset literal
  * convention), parsed once into reference objects: plan size O(1) in
  * both the merge table and the vocabulary. Specials pass through
  * whole-word; OOV follows the [[graft.functions.BpeVocab]] contract
  * (char fallback → unk → loud). Differentially gated by ext_bpe_ids
  * (DuckDB replays the id map as a CASE table over the replayed token
  * stream); sequence/ids consistency is BpeSpec-pinned. */
case class BpeEncodeIds(text: Expression, mergesSpec: Expression,
    vocabSpec: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def first: Expression = text
  override def second: Expression = mergesSpec
  override def third: Expression = vocabSpec
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_ids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!mergesSpec.foldable || !vocabSpec.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe_ids mergesSpec and vocabSpec must be foldable literals " +
          "(BpeEncode.serialize / BpeVocab.serialize and embed them)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val v = mergesSpec.eval()
    require(v != null, "graft_bpe_ids mergesSpec must not be null")
    graft.functions.BpeEncode.parseRanks(v.toString)
  }

  @transient private lazy val vocab: graft.functions.BpeVocab.Table = {
    val v = vocabSpec.eval()
    require(v != null, "graft_bpe_ids vocabSpec must not be null")
    graft.functions.BpeVocab.parse(v.toString)
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  override protected def nullSafeEval(t: Any, m: Any, v: Any): Any =
    BpeEncodeIds.toArrayData(
      graft.functions.BpeEncode.encodeIdsDoc(t.toString, ranks, vocab, cache))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocab,
      "graft.functions.BpeVocab.Table")
    val cacheRef = ctx.addReferenceObj("bpeIdCache", cache,
      "java.util.concurrent.ConcurrentHashMap<String, int[]>")
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      s"""
         |${ev.value} = graft.plans.BpeEncodeIds.toArrayData(
         |  graft.functions.BpeEncode.encodeIdsDoc(
         |    $t.toString(), $ranksRef, $vocabRef, $cacheRef));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeEncodeIds =
    copy(text = newFirst, mergesSpec = newSecond, vocabSpec = newThird)
}

object BpeEncodeIds {
  /** Java-callable bridge for codegen: primitive int ids → ArrayData. */
  def toArrayData(ids: Array[Int]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(ids)
}

/** Native GPT-2-style pretokenizer (r16): `graft_bpe_pretok(text)` —
  * the `([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+)` → " $1 " category-run
  * split as ONE codegen'd scan ([[graft.functions.BpeEncode.pretokenize]]).
  * Output is byte-identical to the regexp_replace form (BpeSpec pins
  * it; ext_bpe_pretok gates it against the RE2 mirror cross-engine),
  * at a fraction of java.util.regex's cost — the regex pass costs
  * ~2.7× the whole BPE merge loop at 100× (PERF.md r16). */
case class BpePretokenizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_pretok"

  override protected def nullSafeEval(t: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.functions.BpeEncode.pretokenize(t.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.BpeEncode.pretokenize($t.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpePretokenizeExpr =
    copy(child = newChild)
}

/** BPE DECODE (r17): `graft_bpe_decode(ids, vocabSpec)` → string — the
  * inverse of `graft_bpe_ids` ([[graft.functions.BpeEncode.decodeIds]]):
  * id → symbol through the vocab's deterministic id order, byte-fallback
  * runs reassembled to UTF-8, the word-boundary special rendered as one
  * space, other specials passed through verbatim, out-of-vocabulary ids
  * LOUD. vocabSpec is one foldable literal parsed once (the
  * `graft_bpe_ids` convention). Gated by the ext_bpe_decode round-trip
  * (decode(encode(x)) vs the whitespace-collapsed text, UNROUNDED) and
  * the reverse-CASE DuckDB replay ([[graft.functions.BpeVocab.sqlSymCase]]). */
case class BpeDecodeIds(ids: Expression, vocabSpec: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = ids
  override def right: Expression = vocabSpec
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType), StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!vocabSpec.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe_decode vocabSpec must be a foldable literal " +
          "(BpeVocab.serialize and embed it)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val vocab: graft.functions.BpeVocab.Table = {
    val v = vocabSpec.eval()
    require(v != null, "graft_bpe_decode vocabSpec must not be null")
    graft.functions.BpeVocab.parse(v.toString)
  }

  override protected def nullSafeEval(a: Any, v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.functions.BpeEncode.decodeIds(
        a.asInstanceOf[ArrayData].toIntArray(), vocab))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocab,
      "graft.functions.BpeVocab.Table")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.BpeEncode.decodeIds($a.toIntArray(), $vocabRef));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeDecodeIds =
    copy(ids = newLeft, vocabSpec = newRight)
}

/** Native single-pass text normalization (r17 optimization round):
  * `graft_text_normalize(loweredText)` — the
  * `trim(regexp_replace(regexp_replace(lower(x), "[^a-z0-9 ]", ""), " +", " "))`
  * chain as ONE codegen'd byte scan over the ALREADY-LOWERED string
  * ([[graft.functions.TextScan.normalizeLowered]]; callers pass
  * `lower(text)`). Byte-identical to the two-regexp form (TextScanSpec
  * pins it; the ext_dedup_exact oracle gates it cross-engine against the
  * DuckDB regex mirror): every kept char is ASCII and every dropped code
  * point's UTF-8 bytes are individually dropped. At 100× the two
  * java.util.regex passes were 40% of the whole headline bench
  * (ext_dedup_exact 112 s — PERF.md r17 optimization section). */
case class TextNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_text_normalize"

  override protected def nullSafeEval(t: Any): Any =
    graft.functions.TextScan.normalizeLowered(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.functions.TextScan.normalizeLowered($t);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TextNormalizeExpr =
    copy(child = newChild)
}

/** Native BPE-ish token count (r17 optimization round):
  * `graft_retok_count(text)` — the
  * `regexp_count(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")` alternation as
  * one codegen'd scan ([[graft.functions.TextScan.retokCount]]; letter
  * RUNS, single digits, single other non-ws code points). Count-identical
  * to the regex (TextScanSpec pins it; ext_token_count gates it against
  * the DuckDB regexp_extract_all mirror cross-engine). */
case class RetokCountExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_retok_count"

  override protected def nullSafeEval(t: Any): Any =
    graft.functions.TextScan.retokCount(t.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.functions.TextScan.retokCount($t.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RetokCountExpr =
    copy(child = newChild)
}

/** Native punctuation-count (r17 optimization round):
  * `graft_punct_count(text)` — `regexp_count(text, "[^A-Za-z0-9\s]")` as
  * one codegen'd scan ([[graft.functions.TextScan.punctCount]]).
  * Count-identical to the regex (TextScanSpec pins it; the curation
  * quality-score oracles gate it cross-engine). */
case class PunctCountExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_punct_count"

  override protected def nullSafeEval(t: Any): Any =
    graft.functions.TextScan.punctCount(t.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.functions.TextScan.punctCount($t.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PunctCountExpr =
    copy(child = newChild)
}

/** Native shingle hashing (r18 optimization round):
  * `graft_shingle_hashes(text, n)` — the
  * `array_distinct(transform(shingles(text, n), xxhash64))` chain as ONE
  * codegen'd scan ([[graft.functions.TextScan.shingleHashes]]): the HOF
  * form evaluated two INTERPRETED lambdas per shingle (string build +
  * hash) in the hottest dedup scan path. Value-exact to the HOF form
  * (TextScanSpec pins it): same split-on-single-space word boundaries,
  * same XXH64/seed-42 over the identical joined bytes (consecutive words
  * are contiguous in the source, so the join IS the source range), same
  * first-occurrence distinct order. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"graft_shingle_hashes n must be >= 1: $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    ShingleHashesExpr.toArrayData(graft.functions.TextScan.shingleHashes(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.plans.ShingleHashesExpr.toArrayData(
         |  graft.functions.TextScan.shingleHashes($t, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashesExpr {
  /** Java-callable bridge for codegen: primitive longs → ArrayData. */
  def toArrayData(hs: Array[Long]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(hs)
}
