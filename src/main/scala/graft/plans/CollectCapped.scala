package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_collect_capped(idCol, cap)` — collect_list with a hard per-group
  * buffer bound: groups keep at most `cap + 1` elements; a group that
  * exceeds the cap evaluates to NULL (callers filter those groups out).
  *
  * This is the memory-safe building block for exact n-gram-Jaccard dedup's
  * document-frequency cap (reference strategy:
  * mars/dataframe/base/_duplicate.py:32-42 drops over-frequent keys before
  * pairing). The built-in `collect_list` materializes the FULL per-key list
  * before any filter can drop it — at 100 TB a stop-phrase shingle with
  * df=10^8 builds a multi-GB aggregation buffer in one task just to be
  * discarded. Here every buffer (map-side partial, shuffle block, reduce
  * merge) is bounded at `cap + 1` longs, and the whole df-cap costs a
  * single shuffle — no pre-count pass over the corpus, no join.
  *
  * Truncation at `cap + 1` never loses answer data: a group truncated at
  * `cap + 1` is by definition over the cap and evaluates to NULL; a group
  * with total size <= cap is never truncated (its merged length cannot
  * reach `cap + 1`), so surviving lists are always complete.
  */
case class CollectCappedLongList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  require(cap >= 1, s"graft_collect_capped cap must be >= 1, got $cap")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_collect_capped requires a BIGINT id column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  override def update(
      buffer: mutable.ArrayBuffer[Long], input: InternalRow): mutable.ArrayBuffer[Long] = {
    // Stop growing once over-cap is proven (length == cap + 1): the group's
    // result is NULL regardless of what else arrives.
    if (buffer.length <= cap) {
      val v = child.eval(input)
      if (v != null) buffer += v.asInstanceOf[Long]
    }
    buffer
  }

  override def merge(
      a: mutable.ArrayBuffer[Long],
      b: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val need = cap + 1 - a.length
    if (need > 0) a ++= b.take(need)
    a
  }

  override def eval(buffer: mutable.ArrayBuffer[Long]): Any =
    if (buffer.length > cap) null else new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(java.lang.Long.BYTES * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new mutable.ArrayBuffer[Long](bytes.length / java.lang.Long.BYTES)
    while (bb.remaining() >= java.lang.Long.BYTES) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedLongList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedLongList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCappedLongList =
    copy(child = newChild)
}
