package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native mergeable aggregate — the
  * third sketch family next to HLL++ (distinct) and GK (quantiles):
  * "which items dominate this 100 TB column" with a fixed `k`-counter
  * summary per partition, merged associatively (Agarwal et al., "Mergeable
  * Summaries", PODS'12), so the shuffle carries at most `k` counters per
  * partition regardless of cardinality.
  *
  * Guarantees (spec-pinned): every item with true frequency > n/(k+1) is
  * present in the output; each reported `count_lo` underestimates the true
  * count by at most n/(k+1). When `k` >= the column's distinct count no
  * eviction ever fires and counts are EXACT — the oracle-checkable regime.
  *
  * Output: array<struct<item string, count_lo bigint>> sorted by (count_lo
  * desc, item asc) — deterministic for hash comparison.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lo", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  private def add(buf: mutable.HashMap[UTF8String, Long], item: UTF8String, w: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + w)
      case None if buf.size < k => buf.update(item.clone(), w)
      case None =>
        // decrement-all by min(w, current minimum survivor count)
        var remaining = w
        while (remaining > 0) {
          val dec = math.min(remaining, buf.valuesIterator.min)
          buf.mapValuesInPlace((_, c) => c - dec)
          buf.filterInPlace((_, c) => c > 0)
          remaining -= dec
          if (buf.size < k) {
            // Only claim a slot if the item has weight left: when the
            // decrement consumed it exactly (remaining == 0), inserting
            // would store a zero counter that survives serialize/merge and
            // wastes one of the k slots on a spurious count_lo = 0 entry.
            if (remaining > 0) buf.update(item.clone(), remaining)
            remaining = 0
          }
        }
    }
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) => add(buf, item, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
