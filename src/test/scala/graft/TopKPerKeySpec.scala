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
}
