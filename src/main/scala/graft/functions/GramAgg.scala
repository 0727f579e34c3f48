package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Second-moment (Gram) accumulator over a fixed-dimension `array<float>`
  * embedding column — the sufficient statistics for covariance/PCA in ONE
  * partial-aggregated pass: count, per-dimension sums, and the upper
  * triangle of Σ x·xᵀ. This is the distributed-PCA kernel every published
  * implementation reduces to (e.g. the covariance step of Halko et al.'s
  * randomized SVD, or Spark MLlib's `computeCovariance`): the row-scale
  * work is embarrassingly parallel accumulation, and only d(d+3)/2+1
  * doubles per partition ever cross the shuffle — for d = 64 that is
  * ~17 KB regardless of corpus size. The d² eigen-solve then runs on the
  * driver where it belongs.
  *
  * An exploded pair formulation (posexplode × posexplode) would fan every
  * row out d² times before aggregating — 4096× the input at d = 64; this
  * aggregate exists precisely to keep that off the table.
  *
  * Buffer layout: [n, s_0..s_{d−1}, p_(0,0), p_(0,1), …, p_(d−1,d−1)]
  * (upper triangle row-major). Null and wrong-length vectors are skipped.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")

  private val tri = dim * (dim + 1) / 2
  private val len = 1 + dim + tri

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_gram"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val xs = new Array[Double](dim)
        var i = 0
        while (i < dim) { xs(i) = arr.getFloat(i).toDouble; i += 1 }
        buf(0) += 1.0
        i = 0
        while (i < dim) { buf(1 + i) += xs(i); i += 1 }
        var k = 1 + dim
        i = 0
        while (i < dim) {
          var j = i
          while (j < dim) { buf(k) += xs(i) * xs(j); k += 1; j += 1 }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    var i = 0
    while (i < len) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](len)
    var i = 0
    while (i < len) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
