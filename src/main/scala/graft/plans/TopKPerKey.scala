package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native top-k-per-key: the whole-operator extension path
  * (LogicalPlan -> Strategy -> SparkPlan, injected via
  * SparkSessionExtensions).
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(o))
  * .filter(rn <= k)`) must SORT every key's full row set before it can rank.
  * This operator keeps a bounded k-heap per key instead: a map-side pass
  * shrinks every partition to <= k rows per key BEFORE the shuffle, the
  * shuffle moves only those survivors, and a reduce-side pass merges heaps.
  * At 100 TB with small k that turns a full shuffle + per-key sort into a
  * k-bounded shuffle with no sort at all — the same partial/final shape as
  * a hash aggregate.
  *
  * @param rankAttr when set, the final pass appends a 1-based rank column
  *                 (the row's position in the key's sort order) — the native
  *                 replacement for `row_number()` output, computed over the
  *                 <= k survivors only (never over the full key group).
  */
final case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // the rank column originates here, not from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner rule: logical TopKPerKey -> partial exec + final exec. The final
  * node requires a clustered distribution on the keys, so EnsureRequirements
  * inserts exactly one hash shuffle between the two — after the partial pass
  * has already cut each partition to k rows per key. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, partial = false,
        TopKPerKeyExec(keys, order, k, None, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val emitRank = rankAttr.isDefined
    val outputAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(sortOrder, childOutput)
      // per key: a max-heap (reverse ordering) of the k best rows; the heap
      // head is the worst survivor and is evicted on a better arrival
      val heaps = new java.util.HashMap[UnsafeRow, JPriorityQueue[UnsafeRow]]()
      val reverse = rowOrdering.reverse
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new JPriorityQueue[UnsafeRow](limit + 1, (a, b) => reverse.compare(a, b))
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      if (!emitRank) {
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      } else {
        // final pass with rank: each heap holds the key's <= k survivors;
        // sort those few rows (bounded by k, not the group size) and append
        // the 1-based position as the rank column
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = heap.toArray(new Array[UnsafeRow](heap.size))
          java.util.Arrays.sort(rows, (a: UnsafeRow, b: UnsafeRow) => rowOrdering.compare(a, b))
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            proj(joined(r, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }
}
