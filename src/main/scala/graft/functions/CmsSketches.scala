package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count–Min frequency sketch (Cormode–Muthukrishnan, J.Alg 2005; Spark's
  * own `org.apache.spark.util.sketch.CountMinSketch`, the implementation
  * behind `DataFrameStatFunctions.countMinSketch`) as a native mergeable
  * aggregate — the POINT-FREQUENCY member of the sketch family next to
  * HLL++ (distinct), GK/KLL (quantiles) and Misra–Gries (top items):
  * "how often does THIS item occur in a 100 TB column", answerable for any
  * item after one pass, in O(depth × width) space per group.
  *
  * Guarantees (spec-pinned): estimate >= true count always (counters only
  * ever add), and estimate <= true count + eps·N with probability
  * 1 − confidence-complement, eps = 2/width per the published bounds.
  * Unlike KLL's randomized compactors the CMS is fully DETERMINISTIC for a
  * fixed (depth, width, seed) — counter arrays are sums of per-row hash
  * hits — and merge is counter-wise addition: associative, commutative,
  * order-independent. A streaming complete-mode aggregate therefore equals
  * the batch sketch BYTE-FOR-BYTE, and in the no-collision regime (distinct
  * count ≪ width) every estimate is EXACT — the oracle-checkable regime the
  * gate queries pin, same play as Misra–Gries' k >= distinct-count regime.
  *
  * Shuffle shape: one (depth × width × 8 B) blob per group per partition,
  * map-side combined — row count never crosses the wire.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  require(depth >= 1, s"depth must be >= 1, got $depth")
  require(width >= 1, s"width must be >= 1, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_sketch"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    child.eval(input) match {
      case null            => ()
      case s: UTF8String   => buf.addBinary(s.getBytes)
      case l: java.lang.Long    => buf.addLong(l)
      case i: java.lang.Integer => buf.addLong(i.toLong)
      case other           => buf.addBinary(UTF8String.fromString(other.toString).getBytes)
    }
    buf
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: CountMinSketch): Any = CmsOps.toBytes(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = CmsOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch = CmsOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge a BINARY CMS column ([[CmsSketchAgg]] output) — the rollup
  * aggregate: counter-wise sums, so a rolled-up sketch is IDENTICAL to
  * sketching the union stream (no degradation, unlike randomized sketches).
  * All inputs must share (depth, width, seed); Spark's `mergeInPlace`
  * enforces it. */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  require(depth >= 1, s"depth must be >= 1, got $depth")
  require(width >= 1, s"width must be >= 1, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_merge"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.mergeInPlace(CmsOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: CountMinSketch): Any = CmsOps.toBytes(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = CmsOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch = CmsOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Static readout helpers for binary CMS columns (StaticInvoke targets —
  * codegen'd, no UDF). */
object CmsOps {

  def toBytes(sk: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    sk.writeTo(bos)
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** Estimated occurrence count of a string item (upper-biased: >= truth,
    * <= truth + eps·N w.h.p.). */
  def cmsEstimate(bytes: Array[Byte], item: UTF8String): Long =
    fromBytes(bytes).estimateCount(item.getBytes)

  /** Exact number of item occurrences the sketch absorbed. */
  def cmsTotal(bytes: Array[Byte]): Long =
    fromBytes(bytes).totalCount()
}
