package graft

import org.apache.spark.sql.functions._

import graft.operators.Reshape

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private val long = Seq(
    ("u1", "ind1_cocA", 1.0),
    ("u1", "ind1_cocB", 2.0),
    ("u2", "ind1_cocA", 3.0),
    ("u1", "ind1_cocA", 4.0)).toDF("unit", "key", "value")

  test("pivotWide sums per key with a known-key universe") {
    val out = Reshape
      .pivotWide(long, Seq("unit"), "key", col("value"), Seq("ind1_cocA", "ind1_cocB"))
      .orderBy("unit")
      .collect()
    assert(out(0).getDouble(1) == 5.0) // u1 cocA: 1+4
    assert(out(0).getDouble(2) == 2.0)
    assert(out(1).getDouble(1) == 3.0)
    assert(out(1).isNullAt(2)) // u2 has no cocB
  }

  test("unpivotLong melts value columns back to rows") {
    val wide = Seq(("u1", 5.0, 2.0)).toDF("unit", "a", "b")
    val out = Reshape.unpivotLong(wide, Seq("unit"), Seq("a", "b"), "k", "v")
      .orderBy("k")
      .collect()
    assert(out.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("a", 5.0), ("b", 2.0)))
  }

  test("meltIndicators tags each prefix block with its indicator id") {
    val wide = Seq(("u1", 1.0, 2.0, 3.0)).toDF("unit", "tx_new_a", "tx_new_b", "tx_curr_a")
    val out = Reshape
      .meltIndicators(wide, Seq("unit"), Seq("tx_new" -> 10, "tx_curr" -> 20))
      .orderBy("indicateur", "variable")
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(3)).toSeq == Seq(10, 10, 20))
    assert(out.map(_.getString(1)).toSeq == Seq("tx_new_a", "tx_new_b", "tx_curr_a"))
  }

  test("oneHot: sanitized indicators, null row all-zero, collision and cardinality guards") {
    val df = Seq((1, "red"), (2, "Green-2"), (3, null), (4, "red"))
      .toDF("id", "cat")
    val out = Reshape.oneHot(df, "cat").orderBy("id").collect()
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("id", "cat", "cat_green_2", "cat_red"))
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 1L), (1L, 0L), (0L, 0L), (0L, 1L)))
    // known vocabulary skips discovery and fixes the schema even for
    // values absent from the data
    val known = Reshape.oneHot(df, "cat", knownValues = Seq("red", "blue"))
    assert(known.columns.toSeq == Seq("id", "cat", "cat_blue", "cat_red"))
    assert(known.agg(sum(col("cat_blue"))).head.getLong(0) == 0L)
    intercept[IllegalArgumentException] {
      Reshape.oneHot(df.withColumn("cat", col("id").cast("string")), "cat",
        maxCategories = 2)
    }
    intercept[IllegalArgumentException] {
      Reshape.oneHot(Seq((1, "a b"), (2, "a_b")).toDF("id", "cat"), "cat")
    }
  }
}
