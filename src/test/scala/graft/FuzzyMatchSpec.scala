package graft

import graft.operators.FuzzyMatch

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private val canon = Seq("KENYA", "FRANCE", "GERMANY", "ARGENTINA").toDF("name")

  test("bestMatch picks the closest canonical name per row") {
    val dirty = Seq((1L, "KENIA"), (2L, "FRANC"), (3L, "GERMANIE")).toDF("id", "raw")
    val out = FuzzyMatch.bestMatch(dirty, "raw", canon, "name")
      .orderBy("id")
      .collect()
    assert(out.map(_.getString(2)).toSeq == Seq("KENYA", "FRANCE", "GERMANY"))
    assert(out.forall(_.getDouble(3) > 0.5))
  }

  test("bestMatch threshold drops rows with no candidate above it") {
    val dirty = Seq((1L, "KENIA"), (2L, "zzzzzzzzzz")).toDF("id", "raw")
    val out = FuzzyMatch.bestMatch(dirty, "raw", canon, "name", threshold = 0.6)
    assert(out.count() == 1)
    assert(out.head.getLong(0) == 1L)
  }
}
