package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS'16; the Apache
  * DataSketches implementation already on Spark's classpath for its HLL
  * functions) as a native mergeable aggregate — the QUANTILE twin of the
  * HLL distinct-count cube ([[graft.operators.Sketches.sketchCube]]):
  * materialize one binary sketch column per fine-grained group once, then
  * answer any coarser-grained quantile rollup by MERGING sketches, never
  * re-touching the raw data.
  *
  * Guarantees (spec-pinned): normalized rank error <= ~1.65% at the default
  * k = 200 (single-sided, 99% confidence per the published KLL bounds), and
  * merge does not degrade the bound — a rolled-up estimate obeys the same
  * epsilon as sketching the coarse grain directly. Estimates are
  * approximate and the compactor uses random offsets, so outputs are
  * error-bounded rather than bit-reproducible: rows-only driver check +
  * bound specs, exactly like the HLL cube.
  *
  * Both aggregates are TypedImperativeAggregates: partial (map-side
  * combined), associatively merged, so at most one ~3 KB sketch per group
  * per partition crosses the shuffle regardless of row count.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge a BINARY KLL sketch column ([[KllSketchAgg]] output) — the rollup
  * aggregate. Register merge is associative and commutative, so map-side
  * combine applies and the rolled-up sketch equals sketching the union
  * stream (up to the sketch's own randomized compaction). */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_merge"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Static readout helpers for binary KLL sketch columns (StaticInvoke
  * targets — codegen'd, no UDF). */
object KllOps {

  /** Quantile estimates at the given ranks; nulls for an empty sketch. */
  def kllQuantiles(bytes: Array[Byte], probs: ArrayData): ArrayData = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    val n = probs.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (sk.isEmpty) null else sk.getQuantile(probs.getDouble(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Stream length the sketch has absorbed (exact). */
  def kllN(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}
