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

  /** Parse a serialized Spark CountMinSketch into (depth, width, table)
    * counters. Layout per the public `CountMinSketchImpl#writeTo`:
    * version int, totalCount long, depth int, width int, hashA[depth]
    * longs, table[depth][width] longs. Every row of a CMS sums to
    * totalCount (each add increments exactly one cell per row) — checked
    * here so a format drift fails loudly, never silently. */
  private def parseTable(bytes: Array[Byte]): Array[Array[Long]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1, s"unsupported CountMinSketch serialization version $version")
    val total = in.readLong()
    val depth = in.readInt()
    val width = in.readInt()
    var i = 0
    while (i < depth) { in.readLong(); i += 1 } // hashA, unused here
    val table = Array.ofDim[Long](depth, width)
    i = 0
    while (i < depth) {
      var j = 0
      var rowSum = 0L
      while (j < width) { val v = in.readLong(); table(i)(j) = v; rowSum += v; j += 1 }
      require(rowSum == total,
        s"CMS row $i sums to $rowSum, expected totalCount=$total — format drift?")
      i += 1
    }
    table
  }

  /** Inner-product (join-size) estimate from two CMS over the SAME
    * (depth, width, seed): est = min over rows of Σ_w t1[r][w]·t2[r][w]
    * (Cormode–Muthukrishnan §4.2) — an upper bound on Σ_k f1(k)·f2(k),
    * EXACT when some row hashes both key sets collision-free. This is the
    * classic join-cardinality advisor: predict |A ⋈ B| on a key from two
    * one-pass sketches without touching either table again. */
  def cmsInnerProduct(a: Array[Byte], b: Array[Byte]): Long = {
    val ta = parseTable(a)
    val tb = parseTable(b)
    require(ta.length == tb.length && ta.head.length == tb.head.length,
      s"sketch shapes differ: ${ta.length}x${ta.head.length} vs ${tb.length}x${tb.head.length}")
    var best = Long.MaxValue
    var i = 0
    while (i < ta.length) {
      var s = 0L
      var j = 0
      while (j < ta(i).length) { s += ta(i)(j) * tb(i)(j); j += 1 }
      if (s < best) best = s
      i += 1
    }
    best
  }
}
