package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-rows aggregate — a k-slot leaderboard as a MERGEABLE
  * summary, the order-statistic sibling of [[MisraGries]] (frequency) and
  * the sketch aggregates (distinct/quantiles): "the k most extreme rows of
  * this column" with O(k) state per group regardless of input size.
  *
  * The buffer is a size-k tree of (score, id) pairs under the total order
  * (score desc, id asc); insertion and merge are set-union-then-trim, so
  * the result is the exact top-k of the union — associative, commutative,
  * and DETERMINISTIC (no floating-point accumulation, selection only).
  * That makes it safe as a Structured Streaming complete-mode aggregate:
  * state-store partials merge across micro-batches in any order and
  * stream == batch EXACTLY, unlike a rank window which needs the whole
  * input sorted. The map-side partial already holds <= k rows, so the
  * shuffle carries k rows per partition per group — the same bounded-heap
  * shape as [[graft.plans.TopKPerKeyPlan]], but usable where an aggregate
  * is required (streaming state, rollup/cube, sketch-style reuse).
  *
  * Output: array<struct<score double, id bigint>> sorted (score desc,
  * id asc) — deterministic for hash comparison.
  */
case class TopRowsAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_top_rows"

  // iteration order worst -> best: ascending score, descending id on ties,
  // so first() is always the element to evict
  private def cmp: Comparator[(Double, Long)] = new Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val s = java.lang.Double.compare(a._1, b._1)
      if (s != 0) s else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](cmp)

  private def add(buf: java.util.TreeSet[(Double, Long)], score: Double, id: Long): Unit = {
    buf.add((score, id))
    if (buf.size > k) buf.pollFirst()
  }

  override def update(
      buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      add(buf, s.asInstanceOf[Number].doubleValue(), i.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); add(buf, s, i) }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) { val (s, id) = it.next(); out(i) = InternalRow(s, id); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopRowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopRowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
