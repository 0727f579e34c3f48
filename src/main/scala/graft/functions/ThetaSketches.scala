package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch (the DataSketches KMV family already on Spark's classpath)
  * as a native mergeable aggregate — the SET-ALGEBRA member of the sketch
  * suite: where HLL answers "how many distinct", a theta sketch of each
  * side answers |A ∪ B|, |A ∩ B| and |A \ B| directly by sketch set
  * operations (Dasgupta et al., "Theta-Sketch Framework", 2016), without
  * the inclusion-exclusion error blow-up of differencing HLL counts
  * (graft's X57 overlap estimator).
  *
  * Determinism: a theta sketch is the set of the k smallest item hashes
  * under a fixed seed — a pure function of the input SET, independent of
  * row order and partitioning; compact serialization is canonical
  * (ordered), so stream == batch == any shuffle layout, byte-for-byte.
  * Below k distinct items the sketch IS the hashed set and every estimate
  * (including after intersect / aNotB) is EXACT — the oracle-checkable
  * regime; above k the relative standard error is ~1/sqrt(k).
  *
  * Shuffle shape: one <= 8·k-byte compact blob per group per partition,
  * map-side combined.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.getBytes)
      case l: java.lang.Long => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Union-merge a BINARY theta sketch column ([[ThetaSketchAgg]] output) —
  * the rollup aggregate. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_union"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Static set-operation / readout helpers for binary theta sketch columns
  * (StaticInvoke targets — codegen'd, no UDF). Each set op returns ANOTHER
  * compact sketch, so expressions compose: estimate(anotb(union(a,b), c)). */
object ThetaOps {

  private def wrap(bytes: Array[Byte]) = Sketches.wrapSketch(Memory.wrap(bytes))

  /** Distinct estimate of a sketch (exact below its nominal k). */
  def thetaEstimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  /** A ∩ B as a compact sketch. */
  def thetaIntersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection().intersect(wrap(a), wrap(b)).toByteArray

  /** A \ B as a compact sketch. */
  def thetaAnotb(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).toByteArray

  /** A ∪ B as a compact sketch. */
  def thetaUnionPair(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildUnion().union(wrap(a), wrap(b)).toByteArray
}
