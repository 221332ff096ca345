package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of an int64 key against a driver-built Bloom
  * filter, as a native codegen expression — the screen that lets a
  * high-volume stream drop rows that provably cannot survive a later
  * join, BEFORE the exchange that would shuffle them (q122's wedge
  * stream: most wedges never close; the Bloom of the canonical edge
  * set rejects them in the map stage at ~10 bits/edge).
  *
  * The filter object rides the expression (Spark's sketch
  * `BloomFilter` is Serializable; codegen references it via
  * `addReferenceObj`, so the probe is one virtual call inside
  * whole-stage codegen — no UDF, no serialization per row). Error is
  * one-sided by construction: `mightContainLong` never answers false
  * for a present key, so a screen built over the join's build side
  * can only pass EXTRA rows (later dropped by the real join), never
  * lose one — results are byte-identical with and without it.
  */
case class BloomContainsLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains_long"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains_long needs a BIGINT key, got $t")
    }

  override def nullSafeEval(key: Any): Any =
    java.lang.Boolean.valueOf(
      bloom.mightContainLong(key.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, k => s"$ref.mightContainLong($k)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomContainsLong = copy(child = newChild)
}
