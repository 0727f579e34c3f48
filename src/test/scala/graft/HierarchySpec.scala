package graft

import graft.operators.Hierarchy

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("flatten names each requested path level via broadcast joins") {
    val facts = Seq((1L, "R1/N11/C7"), (2L, "R2/N21/C9")).toDF("id", "path")
    val dim = Seq(("R1", "Africa"), ("R2", "Asia"), ("N11", "Kenya"), ("N21", "Japan"))
      .toDF("uid", "uname")
    val out = Hierarchy
      .flatten(facts, dim, "path", "uid", "uname", Seq(1 -> "region", 2 -> "nation"))
      .orderBy("id")
      .collect()
    assert(out(0).getString(2) == "Africa" && out(0).getString(3) == "Kenya")
    assert(out(1).getString(2) == "Asia" && out(1).getString(3) == "Japan")
  }

  test("flatten leaves unmatched levels null (left join semantics)") {
    val facts = Seq((1L, "R9/N11/C7")).toDF("id", "path")
    val dim = Seq(("N11", "Kenya")).toDF("uid", "uname")
    val row = Hierarchy
      .flatten(facts, dim, "path", "uid", "uname", Seq(1 -> "region", 2 -> "nation"))
      .head
    assert(row.isNullAt(2))
    assert(row.getString(3) == "Kenya")
  }
}
