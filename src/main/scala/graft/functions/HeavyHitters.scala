package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * `TypedImperativeAggregate` — the mergeable-summary path to "top
  * items by frequency" at 100 TB: each task keeps ≤ k counters,
  * partial sketches merge associatively map-side, and the shuffle
  * carries k (item, count) pairs per partition instead of the full
  * distinct-item relation a groupBy-count-sort needs.
  *
  * Guarantees (Misra–Gries / mergeable-summaries): every item with
  * true frequency > N/(k+1) is present in the output, and each
  * reported `count_lo` is a lower bound within N/(k+1) of the true
  * count. `HeavyHittersSpec` asserts both against exact counts.
  */
case class HeavyHitters(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count_lo", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters needs STRING input, got ${child.dataType}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    else kExpr.eval() match {
      // fail at analysis time, not inside the lazy val mid-aggregate:
      // k=0 would make shrink() evict every counter on every update
      case n: Number if n.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"k must be an integer >= 1, got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Keep ≤ k counters: subtract the (k+1)-th largest count from all
    * and drop non-positive (the batched Misra–Gries decrement — for a
    * single overflow this is "decrement everything by the min").
    */
  private def shrink(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > k) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = buf.iterator.collect {
        case (i, c) if c - cut <= 0 => i
      }.toList
      dead.foreach(buf.remove)
      buf.mapValuesInPlace((_, c) => c - cut)
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.updateWith(item) { c => Some(c.getOrElse(0L) + 1L) }
      shrink(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.updateWith(item) { p => Some(p.getOrElse(0L) + c) }
    }
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c)): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HeavyHitters =
    copy(child = cs(0), kExpr = cs(1))
}
