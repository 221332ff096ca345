package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_capped(value, cap)` — collect_list with a hard buffer
  * bound: as soon as a group exceeds `cap` elements the buffer is
  * dropped and the group is tombstoned, evaluating to NULL.
  *
  * This is the scale-safe building block for inverted-index pair
  * generation (stop-shingle filtering in `Dedup.q31`): a plain
  * `collect_list` + `filter(size <= cap)` still materializes the full
  * posting list for a boilerplate shingle — at document frequency 10⁶
  * that is a 10⁶-element array in ONE aggregation buffer, on the map
  * side AND through the shuffle. Here the buffer never holds more
  * than cap+1 values anywhere in the plan: partial aggregates
  * tombstone hot keys map-side, merges of tombstones stay tombstones,
  * and the shuffle carries a null instead of the array.
  *
  * Buffer order is accumulation order (nondeterministic under
  * parallel merge) — callers needing determinism sort the result
  * (`sort_array`), same as `collect_list`.
  */
case class CollectCapped(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCapped.Buf] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("cap must be a literal")
    else capExpr.eval() match {
      case n: Number if n.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cap must be an integer >= 1, got $other")
    }

  override def createAggregationBuffer(): CollectCapped.Buf =
    new CollectCapped.Buf(false, mutable.ArrayBuffer.empty)

  override def update(buf: CollectCapped.Buf, input: InternalRow): CollectCapped.Buf = {
    if (!buf.overflow) {
      val v = child.eval(input)
      if (v != null) {
        buf.items += InternalRow.copyValue(v)
        if (buf.items.length > cap) { buf.overflow = true; buf.items.clear() }
      }
    }
    buf
  }

  override def merge(buf: CollectCapped.Buf, other: CollectCapped.Buf): CollectCapped.Buf = {
    if (buf.overflow || other.overflow ||
        buf.items.length + other.items.length > cap) {
      buf.overflow = true; buf.items.clear()
    } else buf.items ++= other.items
    buf
  }

  override def eval(buf: CollectCapped.Buf): Any =
    if (buf.overflow) null else new GenericArrayData(buf.items.toArray)

  // serialize as a single-field UnsafeRow holding (overflow is encoded
  // as a null array) — the same trick Spark's own Collect uses
  @transient private lazy val ser =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: CollectCapped.Buf): Array[Byte] = {
    val arr = if (buf.overflow) null else new GenericArrayData(buf.items.toArray)
    ser.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): CollectCapped.Buf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) new CollectCapped.Buf(true, mutable.ArrayBuffer.empty)
    else {
      val arr = row.getArray(0)
      val items = mutable.ArrayBuffer.empty[Any]
      var i = 0
      val et = child.dataType
      while (i < arr.numElements()) {
        items += InternalRow.copyValue(arr.get(i, et))
        i += 1
      }
      new CollectCapped.Buf(false, items)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectCapped =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectCapped =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CollectCapped =
    copy(child = cs(0), capExpr = cs(1))
}

object CollectCapped {
  final class Buf(var overflow: Boolean, val items: mutable.ArrayBuffer[Any])
}
