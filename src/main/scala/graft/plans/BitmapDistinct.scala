package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact distinct count over a bounded non-negative long domain as a
  * mergeable BITMAP aggregate — the custom-aggregate surface
  * (TypedImperativeAggregate: per-partition update, binary
  * serialize/merge across the shuffle, final eval).
  *
  * At 100 TB this is the standard exact alternative to HLL for id
  * spaces that fit a bitmap (user ids, entity keys): partial bitmaps
  * are fixed-size, merge is a word-wise OR, and the shuffle moves one
  * bitmap per group instead of one row per distinct value — unlike
  * `count(DISTINCT x)`, which Spark plans as an expand + two shuffles
  * on (group, value). Values outside [0, maxBound) throw rather than
  * silently corrupt the count.
  */
case class BitmapDistinct(
    child: Expression,
    maxBound: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x >= 0 && x < maxBound,
        s"BitmapDistinct: value $x outside [0, $maxBound)")
      buf.set(x.toInt)
    }
    buf
  }

  override def merge(buf: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    buf.or(other)
    buf
  }

  override def eval(buf: java.util.BitSet): Any = buf.cardinality().toLong

  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren.head)
}

object BitmapDistinct {
  /** Aggregate column: exact distinct count of a long column known to
    * lie in [0, maxBound). */
  def distinctCount(c: Column, maxBound: Int): Column =
    ColumnBridge.column(
      BitmapDistinct(ColumnBridge.expression(c), maxBound).toAggregateExpression())
}
