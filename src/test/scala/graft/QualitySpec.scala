package graft

import org.apache.spark.sql.functions.col

import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("quality report: exact metrics and verdicts on planted defects") {
    val df = Seq(
      (1, Some("a"), 10.0),
      (2, None, 50.0),
      (2, Some("b"), 200.0),
      (3, Some("zz"), 5.0)).toDF("id", "name", "score")
    val rep = Quality.report(df, Seq(
      Complete("name", 0.9),
      MinAtLeast("score", 1.0),
      MaxAtMost("score", 100.0),
      InSet("name", Seq("a", "b"), 0.5),
      MatchesRegex("name", "^[ab]$", 0.5),
      RowCountBetween(2, 10),
      Unique(Seq("id"))))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    assert(rep == Set(
      ("complete", "name", 0.75, false), // one null of four
      ("min_at_least", "score", 5.0, true),
      ("max_at_most", "score", 200.0, false), // planted outlier
      ("in_set", "name", 0.5, true), // null counts as outside the set
      ("matches_regex", "name", 0.5, true),
      ("row_count_between", "*", 4.0, true),
      ("unique", "id", 0.5, false))) // ids 1,3 unique; the two id=2 rows are not
  }

  test("fk containment: null keys and missing parents are both orphans") {
    val child = Seq(Some(1), Some(2), None, Some(9)).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val rep = Quality.report(
      child, Seq(FkContained(Seq("fk"), parent, Seq("pk"), 0.9))).collect()
    assert(rep.length == 1)
    assert(rep(0).getString(0) == "fk_contained")
    assert(rep(0).getDouble(2) == 0.5)
    assert(!rep(0).getBoolean(3))
  }

  test("benford: exact shares, digit extraction through signs/decimals/scientific, zero/null dropped") {
    val df = Seq(
      Some(1.0), Some(-1.5), Some(0.019), // all lead with 1
      Some(2.0), Some(0.00002),           // lead with 2 (second via sci-notation)
      Some(9999.0),                       // leads with 9
      Some(0.0), None                     // dropped
    ).toDF("v")
    val out = Quality.benford(df, "v").orderBy("digit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("observed_pct")))
    assert(out.toSeq == Seq(("1", 3L, 0.5), ("2", 2L, 2.0 / 6.0), ("9", 1L, 1.0 / 6.0)))
    val dev1 = Quality.benford(df, "v").filter(col("digit") === "1")
      .head.getAs[Double]("deviation")
    assert(math.abs(dev1 - (0.5 - math.log10(2.0))) < 1e-12)
  }

  test("a fully clean table passes every check at threshold 1.0") {
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val rep = Quality.report(df, Seq(
      Complete("v"), Unique(Seq("id")), RowCountBetween(2, 2),
      FkContained(Seq("id"), Seq(1, 2, 3).toDF("id"), Seq("id"))))
      .collect()
    assert(rep.forall(_.getBoolean(3)), rep.mkString(", "))
    assert(rep.map(_.getString(0)).toSeq ==
      Seq("complete", "row_count_between", "unique", "fk_contained"))
  }

  test("joinFanout predicts the exact join output size per key") {
    import org.apache.spark.sql.Row
    val l = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "a")
    val r = Seq((1L, "p"), (1L, "q"), (1L, "r"), (3L, "s")).toDF("k2", "b")
    val out = Quality.joinFanout(l, r, Seq("k" -> "k2")).orderBy("k").collect()
    assert(out.toSeq == Seq(Row(1L, 2L, 3L, 6L))) // key 2/3 unmatched -> absent
    // the prediction matches the real join
    assert(l.join(r, l("k") === r("k2")).count() ==
      out.map(_.getLong(3)).sum)
  }

  test("functionalDependencies: held and violated FDs report correctly") {
    import org.apache.spark.sql.Row
    val df = Seq(
      (1L, "A", "u"), (1L, "A", "u"), (2L, "B", "u"), (2L, "C", "v"))
      .toDF("id", "grade", "site")
    val out = Quality.functionalDependencies(df, Seq("id" -> "grade", "site" -> "grade"))
      .orderBy("determinant").collect()
    // id 2 maps to B and C -> violated; site u maps to {A,B}, v -> {C}
    assert(out.toSeq == Seq(
      Row("id", "grade", 2L, 1L, 2L, false),
      Row("site", "grade", 2L, 1L, 2L, false)))
    val held = Quality.functionalDependencies(df, Seq("id" -> "id")).head
    assert(held.getAs[Boolean]("holds") && held.getAs[Long]("violating_keys") == 0L)
  }

  test("srmCheck: stable assignment, exact GOF chi2, declared zero-arm kept") {
    import graft.operators.Quality
    val units = (1 to 400).map(i => s"u$i").toDF("unit")
    val arms = Seq(("A", 1), ("B", 1), ("C", 2))
    val r1 = Quality.srmCheck(units, "unit", arms, salt = "s1")
      .collect().map(x => x.getString(0) -> x).toMap
    // deterministic & partition-invariant; duplicates collapse at the unit grain
    val r2 = Quality.srmCheck(
      units.union(units).repartition(7), "unit", arms, salt = "s1")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(arms.forall { case (a, _) =>
      r1(a).getAs[Long]("n_observed") == r2(a).getAs[Long]("n_observed") })
    assert(arms.map { case (a, _) => r1(a).getAs[Long]("n_observed") }.sum == 400L)
    // hash-balanced arms: expected shares ~1:1:2, chi2 small, dof = 2
    assert(r1("C").getAs[Double]("n_expected") == 200.0)
    assert(r1("A").getAs[Long]("dof") == 2L)
    assert(r1("A").getAs[Double]("chi2") < 16.0) // p~3e-4 bound: hash is fair
    // hand replay of the chi2 from the observed counts
    val obs = arms.map { case (a, _) => r1(a).getAs[Long]("n_observed") }
    val expChi = arms.zip(obs).map { case ((_, w), o) =>
      val num = (o * 4L - 400L * w).toDouble
      math.floor(num * num / (400L * w * 4L).toDouble * 1e9 + 0.5) / 1e9
    }.sum
    assert(math.abs(r1("A").getAs[Double]("chi2") - expChi) < 1e-9)
    // a declared arm nobody landed in still reports, with n_observed = 0
    val tiny = Seq("x").toDF("unit")
    val rt = Quality.srmCheck(tiny, "unit", arms, salt = "s1")
      .collect().map(x => x.getString(0) -> x.getAs[Long]("n_observed")).toMap
    assert(rt.size == 3 && rt.values.sum == 1L && rt.values.count(_ == 0L) == 2)
  }

  test("exponentialMechanism: Gumbel-max replay, determinism, utility dominance") {
    import graft.operators.Quality
    val cands = Seq(("a", 10L), ("b", 12L), ("c", 9L)).toDF("k", "u")
    def gumbel(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(13), 16)
      -math.log(-math.log((h.toDouble + 0.5) / 4503599627370496.0))
    }
    // hand replay of the noisy argmax at eps=1, sens=1
    val expect = Seq(("a", 10L), ("b", 12L), ("c", 9L))
      .maxBy { case (k, u) => u.toDouble * 0.5 + gumbel(k) }._1
    val r = Quality.exponentialMechanism(cands, Seq("k"), "u", epsilon = 1.0).head
    assert(r.getAs[String]("k") == expect, r.toString)
    assert(r.getAs[Double]("epsilon") == 1.0 && r.getAs[Double]("sensitivity") == 1.0)
    // deterministic under repartitioning
    val r2 = Quality.exponentialMechanism(
      cands.repartition(5), Seq("k"), "u", epsilon = 1.0).head
    assert(r2.getAs[String]("k") == r.getAs[String]("k"))
    // a dominant utility wins at any reasonable epsilon (score gap >> Gumbel range here)
    val dom = Quality.exponentialMechanism(
      Seq(("a", 10L), ("winner", 10000L)).toDF("k", "u"), Seq("k"), "u",
      epsilon = 1.0).head
    assert(dom.getAs[String]("k") == "winner" && dom.getAs[Long]("utility") == 10000L)
    // a different seed may pick differently; the guards stay loud
    intercept[IllegalArgumentException] {
      Quality.exponentialMechanism(cands, Seq("k"), "u", epsilon = 0.0)
    }
    intercept[IllegalArgumentException] {
      Quality.exponentialMechanism(cands, Seq("k"), "u", 1.0, sensitivity = -1.0)
    }
  }

  test("noisyCounts: deterministic Laplace release, clamped at 0, scale honest") {
    import graft.operators.Quality
    val df = (Seq.fill(100)("big") ++ Seq.fill(1)("tiny")).toDF("g")
    val r1 = Quality.noisyCounts(df, Seq("g"), epsilon = 0.5)
      .collect().map(x => x.getString(0) -> x).toMap
    // deterministic: identical call reproduces identical releases
    val r2 = Quality.noisyCounts(df.repartition(7), Seq("g"), epsilon = 0.5)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r1("big").getAs[Long]("n_released") == r2("big").getAs[Long]("n_released"))
    assert(r1.values.forall(_.getAs[Double]("noise_scale") == 2.0))
    // hand replay: the md5 draw through the inverse CDF
    def released(key: String, n: Long, b: Double): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(13), 16)
      val v = (h.toDouble + 0.5) / 4503599627370496.0 - 0.5
      val noise = -b * math.signum(v) * math.log(1.0 - 2.0 * math.abs(v))
      math.max(math.floor(n.toDouble + noise + 0.5).toLong, 0L)
    }
    assert(r1("big").getAs[Long]("n_released") == released("big", 100L, 2.0))
    assert(r1("tiny").getAs[Long]("n_released") == released("tiny", 1L, 2.0))
    // a tiny count with huge noise scale can only clamp to >= 0
    val loose = Quality.noisyCounts(df.filter(col("g") === "tiny"), Seq("g"), epsilon = 0.01)
      .head.getAs[Long]("n_released")
    assert(loose >= 0L)
    // changing the seed changes the draw (almost surely)
    val seeded = Quality.noisyCounts(df, Seq("g"), epsilon = 0.01, seed = "other")
      .collect().map(x => x.getString(0) -> x.getAs[Long]("n_released")).toMap
    val base = Quality.noisyCounts(df, Seq("g"), epsilon = 0.01)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("n_released")).toMap
    assert(seeded != base)
  }

  test("kAnonymity reports exactly the sub-k combos; empty when the property holds") {
    val df = (Seq.fill(5)(("US", "a")) ++ Seq.fill(2)(("US", "b")) ++ Seq.fill(1)(("FR", "a")))
      .toDF("country", "seg")
    val viol = Quality.kAnonymity(df, Seq("country", "seg"), k = 3)
      .orderBy("country", "seg").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(viol.toSeq == Seq(("FR", "a", 1L), ("US", "b", 2L)))
    assert(Quality.kAnonymity(df, Seq("country", "seg"), k = 2).count() == 1L)
    assert(Quality.kAnonymity(df.filter(col("seg") === "a").filter(col("country") === "US"),
      Seq("country"), k = 5).isEmpty)
  }

  test("lDiversity flags quasi-groups whose sensitive column lacks l distinct values") {
    val df = Seq(
      ("US", "a", 1L), ("US", "a", 2L), ("US", "a", 3L),  // diverse (3 bands)
      ("US", "b", 7L), ("US", "b", 7L), ("US", "b", 7L),  // k-anonymous but 1 band
      ("FR", "a", 1L), ("FR", "a", 2L)).toDF("country", "seg", "band")
    val out = Quality.lDiversity(df, Seq("country", "seg"), "band", l = 3)
      .orderBy("country", "seg").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("FR", "a", 2L, 2L, false),
      ("US", "a", 3L, 3L, true),
      ("US", "b", 3L, 1L, false)))
  }

  test("schemaContract flags missing, mismatched, and unexpected columns") {
    val df = Seq((1L, "x", 2.0)).toDF("id", "name", "score")
    val rep = Quality.schemaContract(df, Seq(
        "id" -> "bigint", "name" -> "int", "absent" -> "date"))
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(rep == Map(
      "id" -> "ok", "name" -> "type_mismatch",
      "absent" -> "missing", "score" -> "unexpected"))
    // id ok + name/score unexpected — purely metadata, no table scan
    assert(Quality.schemaContract(df, Seq("id" -> "bigint")).count() == 3L)
  }

  test("calibration: a perfectly calibrated score gives zero gaps, a biased one does not") {
    import org.apache.spark.sql.functions.sum
    // 100 rows per score in {0.25, 0.75}; positives exactly score*100
    val rows = (0 until 100).flatMap { i =>
      Seq((0.25, i < 25), (0.75, i < 75))
    }
    val out = Quality.calibration(rows.toDF("score", "y").repartition(5),
        "score", col("y"), bins = 4)
      .orderBy("bin").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Double]("gap") < 1e-12, s"calibrated score must have ~0 gap: $r")
    }
    // invert the labels: gap = |0.25 - 0.75| = 0.5 in each bin, ECE = 0.5
    val bad = Quality.calibration(rows.toDF("score", "y").withColumn("y", !col("y")),
      "score", col("y"), bins = 4)
    val ece = bad.agg(sum(col("ece_term"))).head().getDouble(0)
    assert(math.abs(ece - 0.5) < 1e-12, s"ECE of the inverted labels must be 0.5, got $ece")
  }

  test("tCloseness: exact TVD against the corpus mix, including absent sensitive values") {
    // corpus: 6 x, 6 y (p = .5/.5); group A = 4×x only, group B = 2×x 6×y
    val df = (Seq.fill(4)(("A", "x")) ++ Seq.fill(2)(("B", "x")) ++
      Seq.fill(6)(("B", "y"))).toDF("grp", "s")
    val out = Quality.tCloseness(df, Seq("grp"), "s", t = 0.3)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // A: ½(|1−.5| + |0−.5|) = 0.5 — the |0−p| term needs the grid row for
    // the sensitive value the group never exhibits
    assert(out.toSeq == Seq(("A", 4L, 0.5, false), ("B", 8L, 0.25, true)))
  }

  test("sourceAblation: hand-computed leave-one-out means; single source => NULLs") {
    import graft.operators.Quality
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 4.0)).toDF("src", "v").repartition(3)
    val out = Quality.sourceAblation(df, "src", "v")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // total mean 7/3; without A = 4; without B = 1.5
    assert(out(0)._1 == "A" && out(0)._2 == 2L && out(0)._3 == 1.5)
    assert(out(0)._4 == 4.0 && out(0)._5 == -1.666667)
    assert(out(1)._1 == "B" && out(1)._4 == 1.5 && out(1)._5 == 0.833333)
    val solo = Quality.sourceAblation(Seq(("A", 1.0)).toDF("src", "v"), "src", "v").head
    assert(solo.isNullAt(solo.fieldIndex("mean_without")))
  }

  test("captureRecapture: Chapman closed form, zero-overlap finite, dup-tolerant") {
    // captures 1..60 and 41..100: n1=n2=60, m=20 → N̂ = 61·61/21 − 1
    val a = (1L to 60L).map(Tuple1(_)).toDF("k")
    val b = (41L to 100L).map(Tuple1(_)).toDF("k")
    val r = Quality.captureRecapture(a.repartition(3), b.repartition(4), "k").head
    assert(r.getAs[Long]("n1") == 60L && r.getAs[Long]("n2") == 60L)
    assert(r.getAs[Long]("overlap") == 20L)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("n_hat") == r6(61.0 * 61.0 / 21.0 - 1.0))
    // disjoint captures: the +1 correction keeps the estimate finite
    val z = Quality.captureRecapture(
      (1L to 5L).map(Tuple1(_)).toDF("k"), (6L to 10L).map(Tuple1(_)).toDF("k"), "k").head
    assert(z.getAs[Long]("overlap") == 0L && z.getAs[Double]("n_hat") == 35.0)
    assert(z.getAs[Double]("se") == r6(math.sqrt(36.0 * 5.0 * 5.0 / 2.0)))
    // duplicate captures of the same key count once
    val dup = Quality.captureRecapture(
      Seq(1L, 1L, 2L).map(Tuple1(_)).toDF("k"), Seq(2L, 2L).map(Tuple1(_)).toDF("k"), "k").head
    assert(dup.getAs[Long]("n1") == 2L && dup.getAs[Long]("overlap") == 1L)
  }

  test("randomizedResponse: deterministic coin, debias identity, recovers the rate") {
    // truth rate exactly 0.8 over 2000 units
    val df = (1L to 2000L).map(k => (k, k % 5L != 0L)).toDF("id", "truth")
    val r = Quality.randomizedResponse(df.repartition(6), "id", "truth", p = 0.75).head
    assert(r.getAs[Long]("n") == 2000L)
    assert(r.getAs[Double]("true_rate") == 0.8)
    // the debias identity holds on the released numbers themselves
    val lam = r.getAs[Double]("lambda_hat")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("pi_hat") == r6((lam + 0.75 - 1.0) / 0.5))
    // estimator lands near the true rate (4 SEs is ~1-in-16k by chance)
    assert(math.abs(r.getAs[Double]("pi_hat") - 0.8) <= 4.0 * r.getAs[Double]("se"),
      r.toString)
    assert(r.getAs[Double]("epsilon") == 1.098612)
    // repartitioning never changes the release (the coin is per-unit)
    val r2 = Quality.randomizedResponse(df.repartition(13), "id", "truth", p = 0.75).head
    assert(r2.getAs[Long]("n_yes_reported") == r.getAs[Long]("n_yes_reported"))
    // p <= 0.5 carries no signal: rejected
    intercept[IllegalArgumentException] {
      Quality.randomizedResponse(df, "id", "truth", p = 0.5)
    }
  }

  test("functionalDependencyAudit: g3 repair count, NULL-lhs exclusion, holding pair") {
    import spark.implicits._
    val df = Seq(
      (Option(1), "A", "k1"), (Option(1), "A", "k1"),
      (Option(2), "A", "k2"), (Option(2), "B", "k2"),
      (Option.empty[Int], "C", "k3")).toDF("id", "v", "k")
    val out = Quality.functionalDependencyAudit(df.repartition(3),
      Seq("id" -> "v", "k" -> "v")).orderBy("lhs").collect()
    val a = out(0) // id -> v: lhs 2 maps to {A, B}
    assert(a.getAs[String]("lhs") == "id")
    assert(a.getAs[Long]("n_rows") == 4L && a.getAs[Long]("n_lhs_null") == 1L)
    assert(a.getAs[Long]("n_lhs_values") == 2L && a.getAs[Long]("n_violating_lhs") == 1L)
    assert(a.getAs[Long]("g3_rows") == 1L && a.getAs[Double]("g3_ratio") == 0.25)
    assert(!a.getAs[Boolean]("holds"))
    val b = out(1) // k -> v: k2 maps to {A, B} too... use the planted key col
    assert(b.getAs[String]("lhs") == "k")
    assert(b.getAs[Long]("n_rows") == 5L && b.getAs[Long]("n_violating_lhs") == 1L)
  }
}