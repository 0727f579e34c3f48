package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("native top-k matches the window formulation on real data") {
    val orders = Tables.orders(spark, sf).select("o_orderpriority", "o_orderkey", "o_totalprice")
    val native = Relational
      .topKPerKey(orders, Seq("o_orderpriority"), Seq("o_totalprice" -> true, "o_orderkey" -> false), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey")
    val windowed = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(native == windowed)
  }

  test("plan: partial + final exec pair, one shuffle, zero sorts") {
    val orders = Tables.orders(spark, sf).select("o_orderpriority", "o_orderkey", "o_totalprice")
    val df = Relational
      .topKPerKey(orders, Seq("o_orderpriority"), Seq("o_totalprice" -> true), k = 3)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("\\(\\d+\\) TopKPerKey".r.findAllIn(p).size == 2, s"expected partial+final exec:\n$p")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, s"expected exactly one shuffle:\n$p")
    assert(!p.contains("Sort"), s"native top-k must not sort:\n$p")
  }

  test("handles ties, duplicate rows, and k larger than the group") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 5.0),
      ("b", 5L, 1.0)).toDF("k", "id", "v")
    // total order via (v desc, id asc): ties on v broken by id
    val out = Relational.topKPerKey(df, Seq("k"), Seq("v" -> true, "id" -> false), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 5L)))
  }

  test("TopKRewriteRule: user-written row_number()<=k window filters plan to the native operator") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      ("a", 5), ("a", 3), ("a", 9), ("a", 1), ("b", 7), ("b", 2))
      .toDF("k", "v").repartition(3)
    val w = Window.partitionBy("k").orderBy(col("v").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"window idiom not rewritten:\n$p")
    assert(!p.contains("Window"), s"Window survived the rewrite:\n$p")
    // results identical to the window semantics, rank included
    val rows = q.orderBy("k", "rn").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == Seq(("a", 1, 1), ("a", 3, 2), ("b", 2, 1), ("b", 7, 2)))
    // rn = 1 rewrites too
    val first = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(first.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(first.collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("a", 1), ("b", 2)))
  }

  test("TopKRewriteRule only strips a WindowGroupLimit it subsumes (same spec, limit >= k)") {
    import org.apache.spark.sql.catalyst.expressions.RowNumber
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow, WindowGroupLimit}
    import org.apache.spark.sql.expressions.Window
    import graft.plans.{TopKPerKeyPlan, TopKRewriteRule}
    val df = Seq(("a", 5), ("a", 3), ("b", 7)).toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(col("v").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    // hand-insert a WindowGroupLimit below the Window with the given limit;
    // collapse the analyzer's stacked Projects first — in the real pipeline
    // CollapseProject runs before graft's rule sees the plan
    def withWgl(limit: Int): LogicalPlan =
      org.apache.spark.sql.catalyst.optimizer.CollapseProject(
        q.queryExecution.analyzed.transform {
          case win @ LWindow(_, ps, os, child, _) =>
            win.copy(child = WindowGroupLimit(ps, os, RowNumber(), limit, child))
        })
    // limit >= k: subsumed — rewrite fires and the WGL is gone
    val rewritten = TopKRewriteRule(withWgl(2))
    assert(rewritten.collectFirst { case t: TopKPerKeyPlan => t }.isDefined,
      s"subsumed WGL should not block the rewrite:\n$rewritten")
    assert(rewritten.collectFirst { case wgl: WindowGroupLimit => wgl }.isEmpty,
      s"subsumed WGL should be stripped:\n$rewritten")
    // limit < k: NOT equivalent (the WGL keeps fewer rows than the filter
    // wants) — the plan must be left untouched
    val kept = TopKRewriteRule(withWgl(1))
    assert(kept.collectFirst { case t: TopKPerKeyPlan => t }.isEmpty,
      s"narrower WGL must not be discarded by the rewrite:\n$kept")
    assert(kept.collectFirst { case wgl: WindowGroupLimit => wgl }.isDefined)
  }

  test("TopKRewriteRule leaves non-equivalent shapes alone") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 5), ("a", 5), ("a", 3), ("b", 7)).toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(col("v").asc)
    // rank() can emit more than k rows on ties — must NOT rewrite
    val ranked = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 1)
    assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(ranked.count() == 2) // one rank-1 row per key (3 for a, 7 for b)
    // rn = 2 selects exactly the second row, not the top 2 — must NOT rewrite
    val second = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 2)
    assert(!second.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(second.collect().map(r => (r.getString(0), r.getInt(1))).toSet == Set(("a", 5)))
  }
}
