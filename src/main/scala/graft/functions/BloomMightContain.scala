package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership test against a driver-built [[BloomFilter]].
  *
  * The serialized sketch travels with the expression (an executor task
  * deserializes it once, lazily) and codegen calls [[test]] directly on the
  * expression reference — no UDF boxing, stays inside whole-stage codegen.
  * Hashing is consistent with `Dataset.stat.bloomFilter` on string columns:
  * both sides hash the UTF-8 bytes, so an item put on the build side can
  * never be a false NEGATIVE here (false positives are expected and must be
  * handled by the caller — e.g. [[graft.operators.Decontaminate]] re-verifies
  * survivors with an exact join).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  def test(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(v: Any): Any =
    test(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BloomMightContain]]'s sibling for LONG keys — the join-key case.
  * Hashing is consistent with `Dataset.stat.bloomFilter` on integral
  * columns (both sides hash the long value), so build-side members can
  * never be false negatives here. */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain_long"

  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("graftBloomL", this, classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
