package graft

import graft.operators.FuzzyMatch

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private val canon = Seq("KENYA", "FRANCE", "GERMANY", "ARGENTINA").toDF("name")

  test("bestMatch picks the closest canonical name per key") {
    val dirty = Seq((1L, "KENIA"), (2L, "FRANC"), (3L, "GERMANIE")).toDF("id", "raw")
    val out = FuzzyMatch.bestMatch(dirty, Seq("id"), "raw", canon, "name")
      .orderBy("id")
      .collect()
    assert(out.map(_.getString(2)).toSeq == Seq("KENYA", "FRANCE", "GERMANY"))
    assert(out.forall(_.getDouble(3) > 0.5))
  }

  test("bestMatch threshold drops rows with no candidate above it") {
    val dirty = Seq((1L, "KENIA"), (2L, "zzzzzzzzzz")).toDF("id", "raw")
    val out = FuzzyMatch.bestMatch(dirty, Seq("id"), "raw", canon, "name", threshold = 0.6)
    assert(out.count() == 1)
    assert(out.head.getLong(0) == 1L)
  }

  test("bestMatch preserves duplicate-keyed rows as one aggregate per key, distinct keys separately") {
    // two rows with DIFFERENT keys but identical values: both must survive
    // (the old window-partition-by-all-columns formulation collapsed them)
    val dirty = Seq((1L, "KENIA"), (2L, "KENIA")).toDF("id", "raw")
    val out = FuzzyMatch.bestMatch(dirty, Seq("id"), "raw", canon, "name")
    assert(out.count() == 2)
  }

  test("bestMatch ties break to the lexicographically smallest candidate") {
    val cands = Seq("BB", "AA").toDF("name")
    // "AB" is levenshtein distance 1 from both -> deterministic pick of AA
    val dirty = Seq((1L, "AB")).toDF("id", "raw")
    val out = FuzzyMatch.bestMatch(dirty, Seq("id"), "raw", cands, "name").collect()
    assert(out.head.getString(2) == "AA")
  }
}
