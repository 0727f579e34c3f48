package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSplit respects fractions approximately and exactly reproduces") {
    val df = spark.range(10000).toDF("id")
    val split = Sampling.deterministicSplit(df, "id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000L) < 500, counts.toString)
    assert(math.abs(counts("valid") - 1000L) < 300, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 300, counts.toString)
    // exact reproducibility
    val again = Sampling.deterministicSplit(df, "id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    assert(split.except(again).count() == 0 && again.except(split).count() == 0)
  }

  test("deterministicSplit assignment is stable under corpus growth (no leakage)") {
    val small = spark.range(100).toDF("id")
    val large = spark.range(1000).toDF("id")
    val f = Seq("train" -> 0.8, "test" -> 0.2)
    val a = Sampling.deterministicSplit(small, "id", f).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.deterministicSplit(large, "id", f)
      .filter(col("id") < 100).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "adding rows must not move existing rows across splits")
  }

  test("deterministicSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(spark.range(1).toDF("id"), "id", Seq("a" -> 0.5))
    }
  }

  test("stratifiedSample caps each stratum and is deterministic") {
    val df = Seq.tabulate(200)(i => (if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("stratum", "id")
    val s1 = Sampling.stratifiedSample(df, Seq("stratum"), "id", perKey = 5)
      .orderBy("stratum", "id").collect()
    assert(s1.length == 10)
    assert(s1.count(_.getString(0) == "a") == 5)
    val s2 = Sampling.stratifiedSample(df, Seq("stratum"), "id", perKey = 5)
      .orderBy("stratum", "id").collect()
    assert(s1.toSeq == s2.toSeq)
    // a stratum smaller than perKey survives whole
    val tiny = Seq(("c", 1L), ("c", 2L)).toDF("stratum", "id")
    assert(Sampling.stratifiedSample(tiny, Seq("stratum"), "id", perKey = 5).count() == 2)
  }

  test("packSequences: per-shard greedy cumsum packing, hand-computed") {
    import org.apache.spark.sql.Row
    // shard 0 tokens in id order: 300, 300, 200 -> cums 300, 600, 800
    //   chunk_id = floor(before/512): 0, 0, 1; chunk_pos = before mod 512: 0, 300, 88
    // shard 1: 600 (oversized), 100 -> before 0, 600 -> chunks 0, 1; pos 0, 88
    val df = Seq(
      (0L, 0L, 300L), (2L, 0L, 300L), (4L, 0L, 200L),
      (1L, 1L, 600L), (3L, 1L, 100L)).toDF("id", "shard", "tok")
    val out = Sampling.packSequences(df, "shard", "id", "tok", budget = 512L)
      .select("id", "chunk_id", "chunk_pos").orderBy("id").collect()
    assert(out.toSeq == Seq(
      Row(0L, 0L, 0L), Row(1L, 0L, 0L), Row(2L, 0L, 300L),
      Row(3L, 1L, 88L), Row(4L, 1L, 88L)))
  }

  test("packText materializes chunks in pack order with separators") {
    import org.apache.spark.sql.Row
    val df = Seq(
      (0L, 0L, 300L, "docA"), (2L, 0L, 300L, "docB"), (4L, 0L, 200L, "docC"))
      .toDF("id", "shard", "tok", "text")
    val out = Sampling.packText(
      Sampling.packSequences(df, "shard", "id", "tok", budget = 512L),
      "shard", "id", "tok", "text", sep = " | ")
      .orderBy("shard", "chunk_id").collect()
    assert(out.toSeq == Seq(
      Row(0L, 0L, 2L, 600L, "docA | docB"),
      Row(0L, 1L, 1L, 200L, "docC")))
  }

  test("weightedMix: whole epochs exact, fractional deterministic, unknown sources dropped") {
    val df = (0L until 300L).map(i => (i, i % 3 match {
      case 0 => "web"; case 1 => "books"; case _ => "junk" })).toDF("id", "src")
    val out = Sampling.weightedMix(df, "src", "id",
      Map("web" -> 0.5, "books" -> 2.0))
    val bySrc = out.groupBy("src").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!bySrc.contains("junk"), "unweighted source must be dropped")
    assert(bySrc("books") == 200L, s"weight 2.0 must mean exactly 2 epochs: $bySrc")
    // fraction 0.5 over 100 web rows: hash-thinned, roughly half, exactly reproducible
    assert(bySrc("web") > 25 && bySrc("web") < 75, s"web fraction wildly off: $bySrc")
    val again = Sampling.weightedMix(df, "src", "id", Map("web" -> 0.5, "books" -> 2.0))
      .orderBy("id", "epoch").collect().toSeq
    assert(again == out.orderBy("id", "epoch").collect().toSeq)
    // epochs are 1..n per row
    val ep = out.filter(col("src") === "books").groupBy("id")
      .agg(org.apache.spark.sql.functions.collect_set("epoch").as("e"))
      .head.getSeq[Long](1).sorted
    assert(ep == Seq(1L, 2L))
  }

  test("temperatureWeights: alpha=1 is identity, alpha<1 lifts the tail, q sums to 1") {
    // 90/10 split across two sources
    val df = (Seq.fill(90)("web") ++ Seq.fill(10)("books")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    val id1 = Sampling.temperatureWeights(df, "src", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(id1("web") == 1.0 && id1("books") == 1.0, id1.toString)
    val t = Sampling.temperatureWeights(df, "src", alpha = 0.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // alpha=0.5: q_books ∝ sqrt(0.1)=0.3162, q_web ∝ sqrt(0.9)=0.9487
    assert(t("books")._2 > 1.0 && t("web")._2 < 1.0, t.toString)
    assert(math.abs(t("books")._1 + t("web")._1 - 1.0) < 1e-5)
    assert(math.abs(t("books")._1 - 0.3162 / (0.3162 + 0.9487)) < 1e-3)
  }

  test("negativeSample: k draws per query, items from the universe, repartition-stable") {
    val queries = Seq(101L, 202L, 303L).toDF("qid")
    val items = (1L to 37L).toDF("item")
    def run(parts: Int) = Sampling.negativeSample(
      queries.repartition(parts), "qid", items.repartition(parts), "item", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(2)
    assert(a.size == 9, "3 queries x 3 draws")
    assert(a.forall(t => t._3 >= 1L && t._3 <= 37L))
    assert(a.map(_._1) == Set(101L, 202L, 303L))
    assert(run(7) == a, "sample must not depend on partitioning")
  }

  test("dsirScores: target-domain docs outscore off-domain, exact token counts, partition-stable") {
    val raw = Seq(
      (1L, "cats purr and cats nap on warm windowsills"),
      (2L, "the cats chase feather toys and purr loudly"),
      (3L, "submarine engines burn heavy diesel fuel offshore"),
      (4L, "diesel turbines power the offshore drilling platform")).toDF("id", "text")
    val target = Seq(
      (10L, "cats purr on the windowsill"),
      (11L, "sleepy cats nap all afternoon")).toDF("id", "text")
    def run(parts: Int) = Sampling.dsirScores(
      raw.repartition(parts), target, "id", "text", numBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    val got = run(2)
    val byId = got.map(t => t._1 -> t).toMap
    // exact token counts (whitespace words, minLen=1)
    assert(byId(1L)._2 == 8L && byId(3L)._2 == 7L, got.toString)
    // the paper's separation: cat docs above diesel docs
    val catMin = math.min(byId(1L)._3, byId(2L)._3)
    val dieselMax = math.max(byId(3L)._3, byId(4L)._3)
    assert(catMin > dieselMax, s"cat docs must outscore: $got")
    // quantized log-ratios -> bit-stable across partitionings
    assert(run(5) == got, "scores must not depend on partitioning")
  }

  test("deterministicShuffle: seed-pure order; epochs differ; interleave spreads sources") {
    val df = (1L to 60L).map(i => (i, if (i <= 54) "big" else "small"))
      .toDF("id", "src").repartition(3)
    val e1 = Sampling.deterministicShuffle(df, Seq("id"), "epoch1")
      .orderBy("training_order").collect().map(_.getAs[Long]("id")).toSeq
    // pure function of (id, seed): same again, bit for bit
    val e1b = Sampling.deterministicShuffle(df.repartition(7), Seq("id"), "epoch1")
      .orderBy("training_order").collect().map(_.getAs[Long]("id")).toSeq
    assert(e1 == e1b)
    assert(e1 != (1L to 60L).toSeq, "md5 order must not be identity")
    val e2 = Sampling.deterministicShuffle(df, Seq("id"), "epoch2")
      .orderBy("training_order").collect().map(_.getAs[Long]("id")).toSeq
    assert(e1 != e2, "a new seed is a new epoch order")
    // interleave: the 10% source appears once per ~10 positions, never clumped
    val inter = Sampling.deterministicShuffle(df, Seq("id"), "epoch1", Some("src"))
      .orderBy("training_order").collect().map(_.getAs[String]("src")).toSeq
    val smallPos = inter.zipWithIndex.filter(_._1 == "small").map(_._2)
    assert(smallPos.size == 6)
    // within-rank-major order puts the k-th small doc right after the k-th big doc:
    // positions 1, 3, 5, ... pattern depends on rank pairing -> assert spread:
    // no two smalls adjacent and the first small appears in the first 3 slots
    assert(smallPos.zip(smallPos.tail).forall { case (x, y) => y - x >= 2 })
    assert(smallPos.head <= 2)
  }

  test("neymanAllocation: variance-heavy strata win budget; exact total; invariant") {
    // stratum a: 4 points sd 0 (constant) -> weight 0
    // stratum b: 4 points spread sd s_b; stratum c: same sd, DOUBLE the size
    // -> c gets ~2x b's allocation, a only remainder crumbs (here 0)
    val rows =
      Seq.fill(4)(("a", 5.0)) ++
        Seq(("b", 0.0), ("b", 0.0), ("b", 10.0), ("b", 10.0)) ++
        Seq.fill(2)(Seq(("c", 0.0), ("c", 0.0), ("c", 10.0), ("c", 10.0))).flatten
    val df = rows.toDF("k", "v").repartition(3)
    val got = Sampling.neymanAllocation(df, Seq("k"), "v", totalSample = 90L)
      .orderBy("k").collect()
    val byK = got.map(r => r.getString(0) ->
      (r.getAs[Long]("n_pop"), r.getAs[Long]("n_alloc"))).toMap
    assert(got.map(_.getAs[Long]("n_alloc")).sum == 90L, "must sum exactly")
    assert(byK("a")._2 == 0L, "zero-variance stratum earns nothing")
    // sd uses n-1: sd_b = sqrt(100/3) > sd_c = sqrt(200/7), so the exact
    // weights are 4*5.7735=23.094 vs 8*5.3452=42.762 -> 32 and 58 of 90
    assert(byK("b")._2 == 32L && byK("c")._2 == 58L, s"exact Neyman split: $byK")
    assert(byK("c")._2 > byK("b")._2, "bigger stratum at similar sd wins more budget")
    assert(got.find(_.getString(0) == "a").get.getAs[Double]("sd") == 0.0)
    val g7 = Sampling.neymanAllocation(df.repartition(7), Seq("k"), "v", 90L)
      .orderBy("k").collect().map(_.getAs[Long]("n_alloc")).toSeq
    assert(g7 == got.map(_.getAs[Long]("n_alloc")).toSeq)
  }

  test("neymanAllocation degenerate inputs: all-constant strata fall back proportional; sd never NaN") {
    // every stratum constant -> every Neyman weight is 0; the documented
    // contract (allocations sum to the budget) must hold via the
    // proportional-to-n_pop fallback instead of NULLing n_alloc (r10 ADVICE)
    val rows = Seq.fill(6)(("a", 5.0)) ++ Seq.fill(3)(("b", 7.0)) ++ Seq(("c", 9.0))
    val got = Sampling.neymanAllocation(rows.toDF("k", "v").repartition(3),
      Seq("k"), "v", totalSample = 20L).orderBy("k").collect()
    val byK = got.map(r => r.getString(0) -> r.getAs[Long]("n_alloc")).toMap
    assert(got.map(_.getAs[Long]("n_alloc")).sum == 20L, "budget must still sum exactly")
    assert(byK("a") == 12L && byK("b") == 6L && byK("c") == 2L,
      s"proportional 6:3:1 split of 20: $byK")
    // sd reads 0.0 (clamped), never NaN, for constant strata; single-row NULL
    assert(got.filter(_.getAs[Long]("n_pop") > 1).forall(_.getAs[Double]("sd") == 0.0))
  }
}
