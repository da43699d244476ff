package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions
  * (enable with `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * This is the engine's only custom Catalyst surface: per SURVEY §4 every
  * optimizer/physical capability the reference hand-rolls (pushdown, join
  * strategy, adaptive re-planning, spill) is already built into
  * Catalyst/AQE, so no custom Rule or Strategy is needed — only scalar
  * expressions where interpreted HOF evaluation can't hit the required
  * per-row throughput.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_euclidean"),
      new ExpressionInfo(classOf[EuclideanDistance].getName, "graft_euclidean"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_euclidean(a, b) takes two arrays")
        EuclideanDistance(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash(tokenHashes) takes one array")
        SimHash64(children(0))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_collect_capped"),
      new ExpressionInfo(classOf[CollectCappedLongList].getName, "graft_collect_capped"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_collect_capped(idCol, cap) takes two args")
        val cap = children(1).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(s"cap: $other")
        }
        CollectCappedLongList(children(0), cap)
      }))

    // Spark's Bloom-filter probe expression is built in but not exposed in
    // the public function registry (it backs the runtime-filter rewrite).
    // Registering it lets the curation operators run a bloom PREFILTER
    // before an exact verify join — the candidates-then-verify shape every
    // dedup operator here uses. The bloom binary argument must be foldable
    // (a literal), which callers satisfy by fitting the filter with the
    // distributed stat.bloomFilter aggregate and embedding the bitset.
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_might_contain(bloomBinary, longValue) takes two args")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "graft_bpe_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bpe_count(text, mergesSpec) takes two args")
        BpeTokenCount(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_tokenize"),
      new ExpressionInfo(classOf[BpeTokenize].getName, "graft_bpe_tokenize"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bpe_tokenize(text, mergesSpec) takes two args")
        BpeTokenize(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_pretok"),
      new ExpressionInfo(classOf[BpePretokenizeExpr].getName, "graft_bpe_pretok"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_bpe_pretok(text) takes one arg")
        BpePretokenizeExpr(children(0))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_ids"),
      new ExpressionInfo(classOf[BpeEncodeIds].getName, "graft_bpe_ids"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_bpe_ids(text, mergesSpec, vocabSpec) takes three args")
        BpeEncodeIds(children(0), children(1), children(2))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_decode"),
      new ExpressionInfo(classOf[BpeDecodeIds].getName, "graft_bpe_decode"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bpe_decode(ids, vocabSpec) takes two args")
        BpeDecodeIds(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_shingle_hashes(text, n) takes two args")
        val n = children(1).eval() match {
          case num: Number => num.intValue()
          case other => throw new IllegalArgumentException(s"n: $other")
        }
        ShingleHashesExpr(children(0), n)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_minhash(hashedShingles, numHashes, seed) takes three args")
        val numHashes = children(1).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(s"numHashes: $other")
        }
        val seed = children(2).eval() match {
          case n: Number => n.longValue()
          case other => throw new IllegalArgumentException(s"seed: $other")
        }
        MinHashSignature(children(0), numHashes, seed)
      }))

    // CONTRACT (ADVICE r17): the input must ALREADY be lowercased —
    // callers go through TextFunctions.normalizeFast, which wraps the
    // argument in lower(); a direct SQL caller passing raw text gets
    // uppercase letters DELETED (bytes outside [a-z0-9 ]), not lowered.
    ext.injectFunction((
      new FunctionIdentifier("graft_text_normalize"),
      new ExpressionInfo(classOf[TextNormalizeExpr].getName, null,
        "graft_text_normalize",
        "_FUNC_(loweredText) - single-pass [a-z0-9 ] strip + space-collapse" +
          " + trim twin of the two-regexp normalize() chain. CONTRACT: the" +
          " input must already be lowercased (call lower() first, as" +
          " normalizeFast does); raw uppercase bytes are deleted, not" +
          " lowered.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_text_normalize(loweredText) takes one arg")
        TextNormalizeExpr(children(0))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_retok_count"),
      new ExpressionInfo(classOf[RetokCountExpr].getName, "graft_retok_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_retok_count(text) takes one arg")
        RetokCountExpr(children(0))
      }))

    // r18 optimization round: native special-function kernels — ONE
    // expression node replaying a staged Column kernel bit-exactly
    // (SpecialMath transcription contract). First argument is the
    // foldable kernel name; the rest are the kernel's double inputs.
    ext.injectFunction((
      new FunctionIdentifier("graft_special"),
      new ExpressionInfo(classOf[SpecialKernelExpr].getName, "graft_special"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty, "graft_special('<kernel>', args…)")
        val kernel = children.head.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case s: String => s
          case other => throw new IllegalArgumentException(
            s"graft_special kernel name must be a string literal: $other")
        }
        SpecialKernelExpr(kernel, children.tail)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_punct_count"),
      new ExpressionInfo(classOf[PunctCountExpr].getName, "graft_punct_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_punct_count(text) takes one arg")
        PunctCountExpr(children(0))
      }))
  }
}
