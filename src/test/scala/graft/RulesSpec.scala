package graft

import org.apache.spark.sql.functions._

import graft.operators.Rules

class RulesSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Rules.Rule("low", col("v") > 10, 1, "YELLOW"),
    Rules.Rule("high", col("v") > 100, 3, "RED"),
    Rules.Rule("mid", col("v") > 50, 2, "ORANGE"))

  test("highest-priority matching rule wins regardless of declaration order") {
    val df = Seq(5, 20, 60, 200).toDF("v")
    val out = Rules.applyRules(df, rules).orderBy("v").collect()
    assert(out.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, Some("YELLOW"), Some("ORANGE"), Some("RED")))
  }

  test("splitConsistent partitions rows by whether any rule fired") {
    val df = Seq(5, 20, 60, 200).toDF("v")
    val (cons, incons) = Rules.splitConsistent(df, rules)
    assert(cons.count() == 1 && incons.count() == 3)
    assert(cons.columns.toSeq == Seq("v")) // flag column dropped on the clean side
  }
}
