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

  test("deletion_neighborhood: exact variant set, self included, depth honored") {
    import org.apache.spark.sql.functions.{col, lit}
    val d1 = Seq("abc").toDF("s")
      .select(graft.functions.deletion_neighborhood(col("s"), 1))
      .head.getSeq[String](0)
    assert(d1.toSet == Set("abc", "ab", "ac", "bc"))
    val d2 = Seq("ab").toDF("s")
      .select(graft.functions.deletion_neighborhood(col("s"), 2))
      .head.getSeq[String](0)
    assert(d2.toSet == Set("ab", "a", "b", ""))
  }

  test("editDistanceJoin finds exactly the pairs within the distance — every edit kind") {
    val left = Seq(
      (1L, "kenya"), (2L, "nigeria"), (3L, "ghana")).toDF("id", "name")
    val right = Seq(
      (10L, "kenia"),   // substitution of kenya (dist 1)
      (11L, "kenyaa"),  // insertion (dist 1)
      (12L, "keny"),    // deletion (dist 1)
      (13L, "nigeria"), // exact (dist 0)
      (14L, "zambia")   // far from everything
    ).toDF("id", "name")
    val out = FuzzyMatch
      .editDistanceJoin(left, right, "id", "name", "id", "name", maxDist = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(4)))
      .toSet
    assert(out == Set((1L, 10L, 1), (1L, 11L, 1), (1L, 12L, 1), (2L, 13L, 0)))
  }

  test("editDistanceJoin is an equi-join on variants — no cartesian in the plan") {
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
    val p = FuzzyMatch.editDistanceJoin(df, df, "id", "name", "id", "name", maxDist = 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit-distance join must meet on variant keys:\n$p")
  }

  test("linkageScore: all-agree is a match, all-disagree a non-match, weights hand-checked") {
    import graft.operators.FuzzyMatch.{linkageScore, LinkageField}
    val pairs = Seq(
      (1L, true, true), (2L, true, false), (3L, false, false))
      .toDF("id", "a1", "a2")
    val fields = Seq(LinkageField("a1", 0.9, 0.1), LinkageField("a2", 0.8, 0.1))
    val out = linkageScore(pairs, fields, upper = 4.0, lower = 0.0)
      .orderBy("id").collect()
      .map(r => (r.getAs[Double]("link_weight"), r.getAs[String]("link_class")))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (a1, d1) = (r6(math.log(9.0) / math.log(2.0)), r6(math.log(1.0 / 9.0) / math.log(2.0)))
    val (a2, d2) = (r6(math.log(8.0) / math.log(2.0)), r6(math.log(2.0 / 9.0) / math.log(2.0)))
    assert(out(0) == ((r6(a1 + a2), "match")))
    assert(out(1) == ((r6(a1 + d2), "possible")))
    assert(out(2) == ((r6(d1 + d2), "non_match")))
  }

  test("sortedNeighborhoodPairs: exact neighbor set, bucket-boundary pairs included") {
    // sort order by (key, id): ids 10,20,30,40,50 — window 3 pairs each row
    // with the next 2; shuffled input and many partitions must not matter
    val df = Seq(
      (30L, "b"), (10L, "a"), (50L, "c"), (20L, "a"), (40L, "b"))
      .toDF("id", "key").repartition(7)
    val got = FuzzyMatch.sortedNeighborhoodPairs(df, "id", Seq("key"), window = 3)
      .orderBy("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (10L, 20L, 1L), (10L, 30L, 2L),
      (20L, 30L, 1L), (20L, 40L, 2L),
      (30L, 40L, 1L), (30L, 50L, 2L),
      (40L, 50L, 1L)))
  }

  test("soundexCode: NARA classics, H/W rules, first-letter dedup, null edge") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      "Tymczak" -> "T522", "Pfister" -> "P236", "Honeyman" -> "H555",
      "Robert" -> "R163", "Rupert" -> "R163", "Ashcraft" -> "A261",
      "Washington" -> "W252", "Gutierrez" -> "G362", "Jackson" -> "J250",
      "PHP" -> "P000",     // same code across H collapses, even vs letter 1
      "BAB" -> "B100",     // vowel-separated repeat stays
      "HN" -> "H500",      // H first letter: its 7 never peels a real code
      "O'Brien-2" -> "O165") // non-letters stripped before coding
    val df = rows.map(_._1).toDF("name")
    val got = df.select(col("name"),
        FuzzyMatch.soundexCode(col("name")).as("code"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (n, want) =>
      assert(got(n) == want, s"$n: got ${got(n)}, want $want")
    }
    val empty = Seq("123", "").toDF("name")
      .select(FuzzyMatch.soundexCode(col("name"))).collect()
    assert(empty.forall(_.isNullAt(0)))
    // blocking join pairs the homophones and nothing else
    val l = Seq((1L, "Robert"), (2L, "Tymczak")).toDF("id1", "n1")
    val r = Seq((10L, "Rupert"), (20L, "Gutierrez")).toDF("id2", "n2")
    val pairs = FuzzyMatch.phoneticBlockJoin(l, r, "n1", "n2")
      .select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 10L)))
  }

  test("phoneticBlockJoin maxBlock drops a planted degenerate block, keeps the rest") {
    // 10k left rows that ALL soundex to the same code (single-letter names
    // code to X000) — the Σ|block_L|·|block_R| blowup shape — plus one
    // healthy homophone pair that must survive the cap
    val l = ((1 to 10000).map(i => (i.toLong, "A")) :+ (0L, "Robert"))
      .toDF("id1", "n1").repartition(8)
    val r = ((1 to 10000).map(i => (i.toLong + 100000, "A")) :+ (10L, "Rupert"))
      .toDF("id2", "n2").repartition(8)
    val capped = FuzzyMatch.phoneticBlockJoin(l, r, "n1", "n2", maxBlock = Some(100L))
      .select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1)))
    // sub-quadratic by construction: the 10^8-pair block is gone entirely
    assert(capped.toSeq == Seq((0L, 10L)))
    // uncapped keeps the degenerate block (documented escape hatch) — count
    // on a small slice to prove the cap (not the soundex) did the pruning
    val uncapped = FuzzyMatch.phoneticBlockJoin(
      l.limit(50).filter($"id1" > 0), r.limit(50).filter($"id2" > 0),
      "n1", "n2", maxBlock = None)
    assert(uncapped.count() >= 49L * 49L, "uncapped must keep the block")
  }

  test("sortedNeighborhoodPairs: pair count is exactly sum over gaps on larger input") {
    val n = 200
    val w = 5
    val df = (1 to n).map(i => (i.toLong, i % 13)).toDF("id", "key").repartition(9)
    val cnt = FuzzyMatch.sortedNeighborhoodPairs(df, "id", Seq("key"), window = w).count()
    // each gap g in 1..w-1 contributes n-g pairs
    assert(cnt == (1 until w).map(n - _).sum.toLong)
  }
}
