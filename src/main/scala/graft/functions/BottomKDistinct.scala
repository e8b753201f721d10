package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Bounded bottom-k-DISTINCT aggregate over a long column: the k smallest
 * distinct values per group, returned as an ascending `array<long>`
 * (shorter than k when the group's distinct count is).
 *
 * This is the build kernel of the KMV/theta sketch family
 * ([[graft.operators.Sketches]]): state is AT MOST k longs regardless of
 * input cardinality, and it participates in partial aggregation — each map
 * task combines locally and ships one ≤k-element buffer per group, so the
 * shuffle moves O(groups·k) longs instead of the distinct value domain.
 * The composed alternative (`distinct` + window `row_number ≤ k`, which the
 * DuckDB oracles replay, and which `SketchesSpec` pins this aggregate
 * against) shuffles every distinct value twice — the thing a sketch exists
 * to avoid at 100 TB.
 *
 * Merge is set-union-then-truncate, which makes the aggregate itself the
 * sketch MERGE operator too: bottom-k of a union of per-part bottom-k's
 * equals bottom-k of the whole (the k smallest of the whole survive every
 * per-part truncation) — the property `SketchesSpec` asserts exactly.
 *
 * Buffer: a TreeSet (sorted + distinct + O(log k) max eviction). Boxing is
 * acceptable: the set never exceeds k (≤ a few hundred) elements and most
 * input rows short-circuit on the `x >= last` comparison without touching
 * the set.
 */
case class BottomKDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"bottom_k_distinct requires k >= 1 (got $k)")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit =
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last()) { if (buf.add(x)) { buf.pollLast(); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k_distinct requires bigint input, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKDistinct =
    copy(child = newChild)

  override def prettyName: String = "bottom_k_distinct"
}
