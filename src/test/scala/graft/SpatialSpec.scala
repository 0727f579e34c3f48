package graft

import org.apache.spark.sql.functions._

import graft.operators.{Segments, Spatial, Temporal}

/** Round-7 wave: spatial grid join, Kaplan–Meier survival, seasonal
  * decomposition, ECDF segment scores. */
class SpatialSpec extends SparkSpec {

  test("geometricMedian: outlier drags the centroid but not the median") {
    import spark.implicits._
    // tight cluster at (0,0)-ish plus one far outlier
    val pts = Seq((0L, 0L), (10L, 0L), (0L, 10L), (10L, 10L), (100000L, 100000L))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = Spatial.geometricMedian(pts, Seq("g"), "x", "y", iters = 8).head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("centroid_x") == 20004L, "centroid chases the outlier")
    assert(r.getAs[Long]("median_x") <= 100L && r.getAs[Long]("median_y") <= 100L,
      s"median must stay at the cluster, got (${r.getAs[Long]("median_x")}, ${r.getAs[Long]("median_y")})")
    // single-point group: weight guard keeps the point itself
    val one = Seq(("o", 7L, 9L)).toDF("g", "x", "y")
    val o = Spatial.geometricMedian(one, Seq("g"), "x", "y").head
    assert(o.getAs[Long]("median_x") == 7L && o.getAs[Long]("median_y") == 9L)
  }
  import spark.implicits._

  private def bruteForce(
      probe: Seq[(Int, Double, Double)],
      points: Seq[(Int, Double, Double)],
      radiusKm: Double): Set[(Int, Int)] =
    (for {
      (pid, plat, plon) <- probe
      (qid, qlat, qlon) <- points
      dlat = math.toRadians(qlat - plat) / 2
      dlon = math.toRadians(qlon - plon) / 2
      a = math.sin(dlat) * math.sin(dlat) +
        math.cos(math.toRadians(plat)) * math.cos(math.toRadians(qlat)) *
          math.sin(dlon) * math.sin(dlon)
      d = 2 * Spatial.EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
      if d <= radiusKm
    } yield (pid, qid)).toSet

  test("radiusJoin equals brute force, including across the antimeridian") {
    // clusters near the ±180 seam, the equator, and mid-latitudes, plus
    // isolated far-away points that must not match
    val probe = Seq(
      (1, 0.0, 179.8), (2, 55.0, -179.9), (3, -30.0, 10.0), (4, 59.9, 0.0))
    val points = Seq(
      (11, 0.1, -179.9),  // ~36 km from probe 1, across the seam
      (12, 55.2, 179.7),  // across the seam from probe 2
      (13, -30.5, 10.5), (14, 59.0, 1.0),
      (15, 10.0, 100.0), (16, -59.0, -100.0)) // isolated
    val radius = 300.0
    val expected = bruteForce(probe, points, radius)
    val got = Spatial.radiusJoin(
        probe.toDF("pid", "plat", "plon"), points.toDF("qid", "qlat", "qlon"),
        "plat", "plon", "qlat", "qlon", radius, maxAbsLat = 60.0)
      .select("pid", "qid").as[(Int, Int)].collect().toSet
    assert(got === expected)
    assert(expected.contains((1, 11)) && expected.contains((2, 12)),
      "fixture must actually exercise the antimeridian")
  }

  test("radiusJoin emits no duplicate pairs even on a tiny wrapped grid") {
    // radius so large the longitude ring collapses to very few cells —
    // the wrapped 3×3 neighborhood would self-overlap without dedup
    val probe = Seq((1, 10.0, 0.0)).toDF("pid", "plat", "plon")
    val points = Seq((11, 12.0, 5.0), (12, -20.0, 160.0)).toDF("qid", "qlat", "qlon")
    val out = Spatial.radiusJoin(probe, points, "plat", "plon", "qlat", "qlon",
      radiusKm = 8000.0, maxAbsLat = 30.0)
    val rows = out.select("pid", "qid").as[(Int, Int)].collect().toSeq
    assert(rows.distinct === rows)
    assert(rows.contains((1, 11)))
  }

  test("haversineKm matches a published reference distance") {
    // Paris <-> New York is ~5837 km by great circle (public almanac figure)
    val df = Seq((48.8566, 2.3522, 40.7128, -74.0060)).toDF("a", "b", "c", "d")
    val km = df.select(Spatial.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(math.abs(km - 5837.0) < 10.0, s"got $km")
  }

  test("bboxJoin: grid + reference-point dedup equals brute force, once per pair") {
    // rect A spans MANY cells and overlaps B across several of them — the
    // reference-point rule must still report the pair exactly once; C
    // touches B's edge (counts); D is disjoint
    val l = Seq(
      ("A", 0L, 9000L, 0L, 9000L),
      ("C", 5000L, 6000L, 9000L, 9500L)).toDF("lid", "xlo", "xhi", "ylo", "yhi")
    val r = Seq(
      ("B", 1000L, 8000L, 1000L, 9000L),
      ("D", 20000L, 21000L, 0L, 100L)).toDF("rid", "rxlo", "rxhi", "rylo", "ryhi")
    val out = Spatial.bboxJoin(l.repartition(2), r.repartition(2),
        ("xlo", "xhi", "ylo", "yhi"), ("rxlo", "rxhi", "rylo", "ryhi"),
        cellSize = 1000L)
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.sorted.toSeq == Seq(("A", "B"), ("C", "B")),
      s"got ${out.toSeq} — multi-cell overlaps must dedup to one row")
  }

  test("kaplanMeier reproduces the hand-computed product-limit estimate") {
    // classic toy: durations 1,2+,3,4+,5 (+ = censored)
    val df = Seq(
      (1L, true), (2L, false), (3L, true), (4L, false), (5L, true))
      .toDF("dur", "event")
    val out = Temporal.kaplanMeier(df, "dur", "event")
      .orderBy("duration")
      .select("duration", "d_events", "n_risk", "survival")
      .as[(Long, Long, Long, Double)].collect()
    // S(1) = 4/5 = 0.8; S(3) = 0.8 * (1 - 1/3) = 0.533333; S(5) = 0 (d = n)
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Array((1L, 1L, 5L), (2L, 0L, 4L), (3L, 1L, 3L), (4L, 0L, 2L), (5L, 1L, 1L)))
    assert(out(0)._4 === 0.8)
    assert(out(1)._4 === 0.8) // censoring step leaves S unchanged
    assert(math.abs(out(2)._4 - 0.533333) < 1e-9)
    assert(out(4)._4 === 0.0) // everyone-at-risk-leaves step underflows to 0
    // Nelson–Aalen cumulative hazard off the same scaffolding:
    // H = 1/5, 1/5, 1/5+1/3, same, +1/1
    val haz = Temporal.kaplanMeier(df, "dur", "event")
      .orderBy("duration").select("cum_hazard").as[Double].collect()
    assert(haz(0) === 0.2 && haz(1) === 0.2)
    assert(math.abs(haz(2) - (0.2 + 1.0 / 3)) < 1e-6)
    assert(math.abs(haz(4) - (0.2 + 1.0 / 3 + 1.0)) < 1e-6)
  }

  test("kalmanLevel: constant series is a fixed point, gain hits steady state") {
    import spark.implicits._
    val const = (1 to 30).map(t => ("k", t, 42L)).toDF("g", "t", "v")
    val r = Temporal.kalmanLevel(const, Seq("g"), "t", "v", q = 1.0, r = 1.0).head
    assert(r.getAs[Double]("level") == 42.0) // zero innovations never move x
    assert(r.getAs[Double]("innovation") == 0.0)
    // steady-state gain for Q=R=1 solves K = (P+1)/(P+2) with P=(1-K)(P+1):
    // K* = (√5−1)/2 ≈ 0.618034
    assert(math.abs(r.getAs[Double]("gain") - 0.618034) < 1e-5)
    // a step jump pulls the level most of the way up within a few ticks
    val jump = ((1 to 20).map(t => ("k", t, 0L)) ++
      (21 to 25).map(t => ("k", t, 100L))).toDF("g", "t", "v")
    val j = Temporal.kalmanLevel(jump, Seq("g"), "t", "v", q = 1.0, r = 1.0).head
    assert(j.getAs[Double]("level") > 95.0 && j.getAs[Double]("level") < 100.0)
  }

  test("holtWinters: a perfectly periodic series keeps level/trend fixed") {
    import spark.implicits._
    // x alternates 1,2 with period 2: l0 = 1.5, b0 = 0, seas = (-.5, .5);
    // every fold step reproduces the state exactly ⇒ forecast = 1.5 - .5
    val df = (1 to 6).map(t => ("k", t, if (t % 2 == 1) 1L else 2L))
      .toDF("g", "t", "v")
    val r = Temporal.holtWinters(df, Seq("g"), "t", "v",
      period = 2, alpha = 0.3, beta = 0.1, gamma = 0.2).head
    assert(r.getAs[Long]("n") == 6L)
    assert(math.abs(r.getAs[Double]("level") - 1.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("trend")) < 1e-12)
    assert(math.abs(r.getAs[Double]("forecast") - 1.0) < 1e-12)
    // shorter than two periods: dropped
    val short = (1 to 3).map(t => ("k", t, t.toLong)).toDF("g", "t", "v")
    assert(Temporal.holtWinters(short, Seq("g"), "t", "v", 2, 0.3, 0.1, 0.2)
      .count() == 0L)
  }

  test("dtw_distance: warped copies are 0, constant offsets pay per step") {
    import spark.implicits._
    import graft.functions.dtw_distance
    val df = Seq((
      Seq(1L, 2L, 3L), Seq(1L, 2L, 2L, 3L), // time-warped copy
      Seq(0L, 0L, 0L), Seq(1L, 1L)          // flat offset by 1
    )).toDF("a", "b", "c", "d2")
    val r = df.select(
      dtw_distance(col("a"), col("b")).as("warp"),
      dtw_distance(col("c"), col("d2")).as("flat"),
      dtw_distance(col("a"), col("a")).as("self")).head
    assert(r.getAs[Long]("warp") == 0L)
    assert(r.getAs[Long]("flat") == 3L) // 3 DP cells, unit cost each
    assert(r.getAs[Long]("self") == 0L)
  }

  test("ccf finds the planted +1 lead and matches hand values") {
    import spark.implicits._
    // y spikes at t=3, x at t=4: x aligns with y at lag +1
    val df = (1 to 6).map(t =>
      (t, if (t == 4) 1L else 0L, if (t == 3) 1L else 0L)).toDF("t", "x", "y")
    val out = Temporal.ccf(df, Nil, "t", "x", "y", maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") -> r.getAs[Double]("ccf")).toMap
    assert(out(1) == 0.966667) // (1 - 1/3 + 5/36) / (5/6)
    assert(out(0) == -0.2)     // adjacent spikes anti-correlate at lag 0
    assert(out(1) > out(-1))
    // identical series: lag-0 cross-correlation is 1
    val same = (1 to 8).map(t => (t, t.toLong, t.toLong)).toDF("t", "x", "y")
    val s0 = Temporal.ccf(same, Nil, "t", "x", "y", maxLag = 1)
      .filter(col("lag") === 0).head.getAs[Double]("ccf")
    assert(s0 == 1.0)
  }

  test("logRank reproduces the hand-computed two-group statistic") {
    import spark.implicits._
    // A: 1(ev) 3(ev) 5(cens); B: 2(ev) 4(cens) 6(ev)
    // t=1: eA=3/6=.5 vA=.25; t=2: eA=2/5=.4 vA=.24; t=3: eA=2/4=.5 vA=.25
    // t=6: eA=0, n=1 so vA=0  ⇒  O=2 E=1.4 V=0.74 chi2=.36/.74
    val df = Seq(
      ("A", 1L, true), ("A", 3L, true), ("A", 5L, false),
      ("B", 2L, true), ("B", 4L, false), ("B", 6L, true))
      .toDF("g", "dur", "event")
    val r = Temporal.logRank(df, "dur", "event", "g", "A", "B").head
    assert(r.getAs[Long]("observed_a") == 2L)
    assert(math.abs(r.getAs[Double]("expected_a") - 1.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("variance_a") - 0.74) < 1e-9)
    assert(math.abs(r.getAs[Double]("chi2") - 0.486486) < 1e-6)
  }

  test("logRank on two identical curves is exactly zero") {
    import spark.implicits._
    val df = (Seq("A", "B").flatMap(g => Seq((g, 2L, true), (g, 4L, true),
      (g, 6L, false)))).toDF("g", "dur", "event")
    val r = Temporal.logRank(df, "dur", "event", "g", "A", "B").head
    assert(r.getAs[Double]("chi2") == 0.0)
  }

  test("seasonalDecompose recovers a planted weekly pattern exactly") {
    // value = 1000·(t/7 rounded trend is linear) + phase bump; a linear
    // ramp's centered 7-MA is the ramp itself, so seasonal = bump - mean(bumps)
    val bumps = Array(70L, -35L, 0L, 14L, -21L, 28L, -56L) // sum = 0
    val rows = (0 until 70).map { t =>
      (t, 1000L * t + bumps(t % 7), t % 7)
    }
    val out = Temporal.seasonalDecompose(
        rows.toDF("t", "v", "phase"), "t", "v", "phase", period = 7)
      .orderBy("t")
      .select("t", "trend", "seasonal", "remainder")
      .as[(Int, Option[Double], Double, Option[Double])].collect()
    // edges: first/last 3 rows carry no trend/remainder
    assert(out.take(3).forall(r => r._2.isEmpty && r._4.isEmpty))
    assert(out.takeRight(3).forall(r => r._2.isEmpty && r._4.isEmpty))
    out.drop(3).dropRight(3).foreach { case (t, trend, seasonal, rem) =>
      assert(trend.get === 1000.0 * t, s"t=$t")       // exact: ramp MA = ramp
      assert(seasonal === bumps(t % 7).toDouble, s"t=$t") // mean-zero bumps
      assert(math.abs(rem.get) < 1e-9, s"t=$t")
    }
  }

  test("nearestWithin returns the argmin per probe and drops out-of-range probes") {
    val probe = Seq((1, 10.0, 10.0), (2, -40.0, 100.0)).toDF("pid", "plat", "plon")
    val points = Seq((11, 10.5, 10.0), (12, 10.1, 10.1), (13, 80.0, 0.0))
      .toDF("qid", "qlat", "qlon")
    val out = Spatial.nearestWithin(probe, points, "pid", "plat", "plon",
        "qlat", "qlon", radiusKm = 300.0, tieCol = "qid", maxAbsLat = 85.0)
      .select("pid", "qid").as[(Int, Int)].collect().toSeq
    assert(out === Seq((1, 12))) // 12 is nearer than 11; probe 2 has no match
  }

  test("geohash matches the published reference vectors") {
    // Niemeyer's canonical example + the Wikipedia vector
    assert(Spatial.geohash(42.605, -5.603, 5) === "ezs42")
    assert(Spatial.geohash(57.64911, 10.40744, 11) === "u4pruydqqvj")
    assert(Spatial.geohash(0.0, 0.0, 1) === "s")
    // SQL surface
    val got = spark.sql("SELECT graft_geohash(42.605D, -5.603D, 5)").as[String].head()
    assert(got === "ezs42")
  }

  test("gini matches the hand formula, is 0 at equality, tie-stable") {
    val df = Seq(1L, 2L, 3L, 4L).map(v => ("a", v)).toDF("k", "v")
    val out = graft.operators.Sketches.gini(df, Seq("k"), "v")
      .as[(String, Long, Double)].head()
    // sorted 1,2,3,4: sum(i*x)=30, n=4, S=10 -> (60-50)/40 = 0.25
    assert(out === (("a", 4L, 0.25)))
    val eq = Seq(5L, 5L, 5L, 5L).map(v => ("a", v)).toDF("k", "v")
    assert(graft.operators.Sketches.gini(eq, Seq("k"), "v")
      .as[(String, Long, Double)].head()._3 === 0.0)
    // ties: grouped-histogram identity must equal the per-row rank formula
    val tied = Seq(1L, 1L, 2L, 2L, 2L, 7L).map(v => ("a", v)).toDF("k", "v")
    val g = graft.operators.Sketches.gini(tied, Seq("k"), "v")
      .as[(String, Long, Double)].head()._3
    val xs = Seq(1L, 1L, 2L, 2L, 2L, 7L).sorted
    val n = xs.length; val s = xs.sum
    val si = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expected = (2.0 * si - (n + 1) * s).toDouble / (n.toLong * s)
    assert(math.abs(g - expected) < 5e-7) // gini output rounds at 6 dp
  }

  test("theilSen is robust to an outlier and selects an exact slope element") {
    val df = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 100L))
      .map { case (x, y) => ("a", x, y) }.toDF("k", "x", "y")
    val out = graft.operators.Sketches.theilSen(df, Seq("k"), "x", "y")
      .as[(String, Long, Double)].head()
    // slopes sorted: [2, 2, 2, 33.33, 49, 96]; lower median (3rd of 6) = 2
    assert(out === (("a", 6L, 2.0)))
  }

  test("weightedMedian is the smallest value reaching half the total weight") {
    val df = Seq((1L, 1L), (2L, 1L), (3L, 10L)).map { case (v, w) => ("a", v, w) }
      .toDF("k", "v", "w")
    val out = graft.operators.Sketches.weightedMedian(df, Seq("k"), "v", "w")
      .as[(String, Long, Long)].head()
    assert(out === (("a", 3L, 12L)))
    val even = Seq((1L, 5L), (2L, 5L)).map { case (v, w) => ("a", v, w) }
      .toDF("k", "v", "w")
    assert(graft.operators.Sketches.weightedMedian(even, Seq("k"), "v", "w")
      .as[(String, Long, Long)].head() === (("a", 1L, 10L))) // lower median
  }

  test("bhAdjust reproduces the hand-computed step-up q-values and rejects") {
    val tests = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.2))
      .toDF("id", "p")
    val out = graft.operators.Quality.bhAdjust(tests, "id", "p", alpha = 0.05)
      .orderBy("rank")
      .select("id", "rank", "q_value", "reject")
      .as[(String, Long, Double, Boolean)].collect()
    // raw p*m/i: .04, .04, .04, .2; reverse-min envelope: .04, .04, .04, .2
    assert(out.map(_._1).toSeq === Seq("t1", "t2", "t3", "t4"))
    assert(out.map(_._3).toSeq === Seq(0.04, 0.04, 0.04, 0.2))
    assert(out.map(_._4).toSeq === Seq(true, true, true, false))
  }

  test("byAdjust applies the harmonic penalty — always at least as conservative as BH") {
    // m=4, H4 = 1 + 1/2 + 1/3 + 1/4 = 25/12: BY q = BH q * H4 (same
    // envelope shape here since raws scale uniformly)
    val tests = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.2))
      .toDF("id", "p")
    val by = graft.operators.Quality.byAdjust(tests, "id", "p", alpha = 0.05)
      .orderBy("rank").select("q_value", "reject")
      .as[(Double, Boolean)].collect()
    val h4 = 25.0 / 12.0
    assert(math.abs(by(0)._1 - 0.04 * h4) < 1e-9)
    assert(math.abs(by(3)._1 - math.min(1.0, 0.2 * h4)) < 1e-9)
    // 0.04*H4 = .0833 > alpha .05: the dependence tax flips the rejects
    assert(by.map(_._2).toSeq === Seq(false, false, false, false))
    val bh = graft.operators.Quality.bhAdjust(tests, "id", "p")
      .orderBy("rank").select("q_value").as[Double].collect()
    assert(by.map(_._1).zip(bh).forall { case (b, h) => b >= h })
  }

  test("holmAdjust: hand step-down values, Bonferroni bound, monotone cummax") {
    // p = [.01, .02, .03, .2], m = 4: raw (m-i+1)*p = .04, .06, .06, .2;
    // forward cummax = .04, .06, .06, .2
    val tests = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.2))
      .toDF("id", "p")
    val out = graft.operators.Quality.holmAdjust(tests, "id", "p", alpha = 0.05)
      .orderBy("rank").select("id", "p_adj", "reject")
      .as[(String, Double, Boolean)].collect()
    assert(out.map(_._1).toSeq === Seq("t1", "t2", "t3", "t4"))
    assert(out.map(_._2).toSeq === Seq(0.04, 0.06, 0.06, 0.2))
    assert(out.map(_._3).toSeq === Seq(true, false, false, false))
    // the smallest p always gets the full Bonferroni factor m·p
    assert(out.head._2 == 0.04)
    // cummax keeps the envelope monotone when a later raw value dips:
    // p = [.01, .04, .045] -> raw .03, .08, .045 -> cummax .03, .08, .08
    val dip = graft.operators.Quality.holmAdjust(
      Seq(("a", 0.01), ("b", 0.04), ("c", 0.045)).toDF("id", "p"), "id", "p")
      .orderBy("rank").select("p_adj").as[Double].collect()
    assert(dip.toSeq === Seq(0.03, 0.08, 0.08))
    // clamps at 1
    val big = graft.operators.Quality.holmAdjust(
      Seq(("a", 0.6), ("b", 0.9)).toDF("id", "p"), "id", "p")
      .orderBy("rank").select("p_adj").as[Double].collect()
    assert(big.toSeq === Seq(1.0, 1.0))
  }

  test("bhAdjust envelope is monotone when a later raw value dips") {
    // p = [.01, .04, .045]: raw = .03, .06, .045 -> envelope .03, .045, .045
    val tests = Seq(("a", 0.01), ("b", 0.04), ("c", 0.045)).toDF("id", "p")
    val q = graft.operators.Quality.bhAdjust(tests, "id", "p")
      .orderBy("rank").select("q_value").as[Double].collect().toSeq
    assert(q.map(v => math.round(v * 1e9) / 1e9) === Seq(0.03, 0.045, 0.045))
  }

  test("trimmedMean drops floor(n·frac) from each side, exact on ties") {
    val df = (1L to 10L).map(v => ("a", v)).toDF("k", "v")
    val out = graft.operators.Sketches.trimmedMean(df, Seq("k"), "v", 0.2)
      .as[(String, Long, Long, Double)].head()
    assert(out === (("a", 10L, 2L, 5.5))) // keep 3..8
    // heavy ties straddling the cut: brute comparison
    val vals = Seq(1L, 1L, 1L, 2L, 2L, 3L, 9L, 9L, 9L, 9L)
    val brute = vals.sorted.drop(2).dropRight(2)
    val got = graft.operators.Sketches.trimmedMean(
        vals.map(v => ("a", v)).toDF("k", "v"), Seq("k"), "v", 0.2)
      .as[(String, Long, Long, Double)].head()
    assert(got._4 === brute.sum.toDouble / brute.size)
  }

  test("interpolateLinear fills gaps proportionally, leaves edges null") {
    // t: 0, 10, 20, 30, 40; values 100, null, null, 400, null
    val df = Seq(
      (1L, 0L, Some(100L)), (2L, 10L, None), (3L, 20L, None),
      (4L, 30L, Some(400L)), (5L, 40L, None))
      .map { case (id, t, v) => ("k", id, t, v) }.toDF("g", "id", "t", "v")
    val out = Temporal.interpolateLinear(df, Seq("g"), Seq("t", "id"), "t", "v")
      .orderBy("id").select("value_interp").as[Option[Double]].collect().toSeq
    assert(out === Seq(Some(100.0), Some(200.0), Some(300.0), Some(400.0), None))
    // equal-timestamp neighbors fall back to v_prev, not NaN
    val dup = Seq((1L, 5L, Some(7L)), (2L, 5L, None), (3L, 5L, Some(9L)))
      .map { case (id, t, v) => ("k", id, t, v) }.toDF("g", "id", "t", "v")
    val o2 = Temporal.interpolateLinear(dup, Seq("g"), Seq("t", "id"), "t", "v")
      .orderBy("id").select("value_interp").as[Option[Double]].collect().toSeq
    assert(o2 === Seq(Some(7.0), Some(7.0), Some(9.0)))
  }

  test("peakConcurrency finds the max overlap and its first instant") {
    val iv = Seq((0L, 10L), (5L, 20L), (15L, 30L), (40L, 41L))
      .toDF("s", "e")
    val out = Temporal.peakConcurrency(iv, "s", "e")
      .as[(Long, Long)].head()
    assert(out === ((2L, 5L))) // [5,10] and [15,20] both reach 2; first at t=5
    // inclusive ends: back-to-back [0,5],[5,9] DO overlap at t=5
    val touch = Seq((0L, 5L), (5L, 9L)).toDF("s", "e")
    assert(Temporal.peakConcurrency(touch, "s", "e").as[(Long, Long)].head() === ((2L, 5L)))
    // [0,4],[5,9] do not
    val apart = Seq((0L, 4L), (5L, 9L)).toDF("s", "e")
    assert(Temporal.peakConcurrency(apart, "s", "e").as[(Long, Long)].head()._1 === 1L)
  }

  test("topShare takes exactly ceil(n·p/100) rows, splitting tie blocks") {
    import graft.operators.Sketches
    // 10 rows: one 100, nine 10s. top-10% = 1 row -> 100/190
    val df = (Seq(100L) ++ Seq.fill(9)(10L)).map(v => ("a", v)).toDF("k", "v")
    val r = Sketches.topShare(df, Seq("k"), "v", Seq(10, 20, 100))
      .select("share_top_10", "share_top_20", "share_top_100")
      .as[(Double, Double, Double)].head()
    assert(r._1 === 100.0 / 190)
    assert(r._2 === 110.0 / 190) // 2 rows: the 100 + ONE of the tied 10s
    assert(r._3 === 1.0)
  }

  test("momentStats matches driver-side skewness/kurtosis on a small set") {
    import graft.operators.Sketches
    val vals = Seq(1L, 2L, 2L, 3L, 3L, 3L, 9L)
    val out = Sketches.momentStats(vals.map(v => ("a", v)).toDF("k", "v"), Seq("k"), "v")
      .as[(String, Long, Double, Double, Double, Double)].head()
    val n = vals.size.toDouble
    val m1 = vals.sum / n
    val m2 = vals.map(v => math.pow(v - m1, 2)).sum / n
    val m3 = vals.map(v => math.pow(v - m1, 3)).sum / n
    val m4 = vals.map(v => math.pow(v - m1, 4)).sum / n
    assert(out._2 === 7L)
    assert(math.abs(out._3 - m1) < 1e-6)
    assert(math.abs(out._4 - m2) < 1e-6)
    assert(math.abs(out._5 - m3 / (m2 * math.sqrt(m2))) < 1e-6)
    assert(math.abs(out._6 - (m4 / (m2 * m2) - 3.0)) < 1e-6)
  }

  test("globalRunningSum equals the single-window cumsum at any partitioning") {
    import graft.operators.Relational
    val df = (1L to 500L).map(i => (i, i % 13)).toDF("id", "v")
    val expected = (1L to 500L).scanLeft(0L)((acc, i) => acc + i % 13).tail
    for (parts <- Seq(1, 3, 16)) {
      val got = Relational.globalRunningSum(
          df, Seq(col("id")), "v", numPartitions = Some(parts))
        .orderBy("id").select("running_sum").as[Long].collect().toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("ecdfScore buckets are tie-stable and exactly ceil(B·cum/n)") {
    // 10 rows, metric with heavy ties: value 1 ×6, value 2 ×3, value 3 ×1
    val df = (Seq.fill(6)(1) ++ Seq.fill(3)(2) ++ Seq(3)).zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("id", "m")
    val out = Segments.ecdfScore(df, "m", "s", buckets = 5)
      .select("m", "s").as[(Int, Int)].collect().toSet
    // cum(1)=6 -> ceil(30/10)=3; cum(2)=9 -> ceil(45/10)=5; cum(3)=10 -> 5
    assert(out === Set((1, 3), (2, 5), (3, 5)))
    val desc = Segments.ecdfScore(df, "m", "s", buckets = 5, descending = true)
      .select("m", "s").as[(Int, Int)].collect().toSet
    assert(desc === Set((1, 3), (2, 1), (3, 1)))
  }

  test("abcClasses: integer 80/95 cut lines, boundary item included in A") {
    val df = Seq(("p1", 80L), ("p2", 10L), ("p3", 6L), ("p4", 3L), ("p5", 1L))
      .toDF("item", "cents")
    val out = Segments.abcClasses(df.repartition(3), Seq("item"), "cents")
      .orderBy(col("cents").desc, col("item"))
      .select("item", "cum_cents", "abc_class").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // total 100: cum 80 ≤ 80% -> A (exact boundary stays A); 90 ≤ 95 -> B;
    // 96, 99, 100 -> C
    assert(out.toSeq == Seq(
      ("p1", 80L, "A"), ("p2", 90L, "B"), ("p3", 96L, "C"),
      ("p4", 99L, "C"), ("p5", 100L, "C")))
  }

  test("pointInPolygonJoin: square + concave cases, half-open boundary, bbox prune") {
    import spark.implicits._
    def ring(vs: (Long, Long)*) =
      array(vs.map { case (x, y) => struct(lit(x).as("x"), lit(y).as("y")) }: _*)
    val polys = Seq("sq", "ell").toDF("pid").select(
      col("pid"),
      when(col("pid") === "sq", ring((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L)))
        // L-shape: notch in the upper right
        .otherwise(ring((20L, 0L), (24L, 0L), (24L, 2L), (22L, 2L), (22L, 4L), (20L, 4L)))
        .as("vertices"))
    val pts = Seq(
      (1L, 5L, 5L),    // square interior
      (2L, 15L, 5L),   // between the polygons (inside neither bbox)
      (3L, 0L, 5L),    // ON the square's left edge: inside (half-open rule)
      (4L, 10L, 5L),   // ON the square's right edge: outside (half-open rule)
      (5L, 23L, 3L),   // in the L's notch: bbox says maybe, ray cast says no
      (6L, 21L, 3L),   // L interior (upper arm)
      (7L, 23L, 1L))   // L interior (lower arm)
      .toDF("id", "x", "y")
    val out = Spatial.pointInPolygonJoin(pts, "x", "y", polys, "vertices")
      .select(col("id"), col("pid")).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "sq"), (3L, "sq"), (6L, "ell"), (7L, "ell")))
  }

  test("moranI: clustered values positive, alternating negative, constant NULL") {
    import spark.implicits._
    // two spatial clusters; similar values within each -> strong positive I
    val clustered = Seq(
      (1L, 0.0, 0.0, 100L), (2L, 0.0, 0.3, 110L), (3L, 0.3, 0.15, 105L),
      (4L, 10.0, 10.0, 10L), (5L, 10.0, 10.3, 15L), (6L, 10.3, 10.15, 12L))
      .toDF("id", "lat", "lon", "x")
    val pos = Spatial.moranI(clustered.repartition(3), "id", "lat", "lon", "x",
      epsKm = 100.0).head
    assert(pos.getAs[Long]("n") == 6L && pos.getAs[Long]("n_pairs") == 12L)
    assert(pos.getAs[Double]("moran_i") > 0.5, pos.toString)
    assert(pos.getAs[Double]("e_i") == -0.2)
    // high/low alternating along a line: every neighbor pair dissimilar
    val alt = Seq(
      (1L, 0.0, 0.0, 100L), (2L, 0.0, 0.5, 0L),
      (3L, 0.0, 1.0, 100L), (4L, 0.0, 1.5, 0L))
      .toDF("id", "lat", "lon", "x")
    val neg = Spatial.moranI(alt, "id", "lat", "lon", "x", epsKm = 60.0).head
    assert(neg.getAs[Double]("moran_i") < -0.5, neg.toString)
    // constant values: no variance to correlate
    val flat = Spatial.moranI(
      clustered.withColumn("x", lit(5L)), "id", "lat", "lon", "x", 100.0).head
    assert(flat.isNullAt(flat.fieldIndex("moran_i")))
  }

  test("dbscan: core/border/noise roles, two clusters, smallest-label assignment") {
    import spark.implicits._
    // trio A,B,C mutually within 100km (core at minPts=3); D within eps of
    // B only (2 neighbors incl self -> border); E isolated; second trio F,G,H
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.0, 0.5), (3L, 0.25, 0.25),
      (4L, 0.0, 1.3), (5L, 10.0, 10.0),
      (6L, 5.0, 5.0), (7L, 5.0, 5.5), (8L, 5.25, 5.25))
      .toDF("id", "lat", "lon")
    val out = Spatial.dbscan(pts.repartition(4), "id", "lat", "lon",
      epsKm = 100.0, minPts = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (4L, "border", 1L), (5L, "noise", -1L),
      (6L, "core", 6L), (7L, "core", 6L), (8L, "core", 6L)), out.mkString(","))
    // minPts=1 degenerates to single-linkage: everyone cores into a cluster
    val single = Spatial.dbscan(pts, "id", "lat", "lon", 100.0, 1)
      .filter(col("role") =!= "core").count()
    assert(single == 0L)
    // a border point between TWO clusters takes the smaller label: id 7
    // touches core 4 (cluster 1) and core 10 (cluster 10) but has only 3
    // neighbors incl self at minPts=4
    val bridge = Seq(
      (1L, 0.0, 0.0), (2L, 0.0, 0.2), (3L, 0.0, 0.4), (4L, 0.0, 0.6),
      (10L, 0.0, 2.3), (11L, 0.0, 2.5), (12L, 0.0, 2.7), (13L, 0.0, 2.9),
      (7L, 0.0, 1.45))
      .toDF("id", "lat", "lon")
    val b = Spatial.dbscan(bridge, "id", "lat", "lon", 100.0, 4)
      .filter(col("id") === 7L).head
    assert(b.getAs[String]("role") == "border" && b.getAs[Long]("cluster") == 1L)
  }

  test("radiusJoin: maxCell drops a planted dense cell whole, sparse cells unaffected") {
    import spark.implicits._
    // 50 points piled at the origin (one grid cell at 100 km radius) plus
    // two isolated points far away — the dense-city Σ|cell|² shape
    val dense = (1L to 50L).map(i => (i, 0.001 * i, 0.001 * i))
    val sparse = Seq((100L, 30.0, 30.0), (101L, 30.1, 30.1))
    val pts = (dense ++ sparse).toDF("id", "lat", "lon")
    val probe = (dense ++ sparse).toDF("pid", "plat", "plon")
    val uncapped = Spatial.radiusJoin(probe, pts, "plat", "plon", "lat", "lon", 100.0)
    // dense block contributes 50*50 pairs, sparse pair contributes 2*2
    assert(uncapped.count() == 2500L + 4L)
    val capped = Spatial.radiusJoin(probe, pts, "plat", "plon", "lat", "lon", 100.0,
      maxCell = Some(10L))
    val rows = capped.select(col("pid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the hot cell dropped WHOLE from the points side; the sparse pairs
    // survive exactly (including probes from the dense area finding nothing)
    assert(rows.forall { case (_, p) => p >= 100L }, rows.take(5).mkString(","))
    assert(rows.length == 4, s"expected the 4 sparse pairs, got ${rows.length}")
  }

  test("radiusJoin: adaptive hot-cell guard raises on a planted dense cell, with the count") {
    import spark.implicits._
    // 1000 points piled into one grid cell + 2 sparse ones: the cell
    // clears BOTH guard terms (1000 > floor 10 and > 8·√1002 ≈ 253)
    val dense = (1L to 1000L).map(i => (i, 0.0001 * i, 0.0001 * i))
    val sparse = Seq((10000L, 30.0, 30.0), (10001L, 30.1, 30.1))
    val pts = (dense ++ sparse).toDF("id", "lat", "lon")
    val probe = (dense ++ sparse).toDF("pid", "plat", "plon")
    // default floor (10k) far above the planted 1000: passes exactly
    assert(Spatial.radiusJoin(probe, pts, "plat", "plon", "lat", "lon", 100.0)
      .count() == 1000000L + 4L)
    // a floor below the dense cell RAISES (fails loudly instead of
    // silently fanning out), and the message carries the measured count
    val e = intercept[Exception] {
      Spatial.radiusJoin(probe, pts, "plat", "plon", "lat", "lon", 100.0,
        hotCellLimit = 10L).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("hotCellLimit") && msg.contains("1000"), msg.take(300))
    // ADAPTIVE side (r14): a 50-point cell in a 52-point corpus is merely
    // proportional density — under 8·√52 ≈ 58 — so even a floor of 10
    // does NOT raise; the guard scales with the corpus instead of
    // breaking healthy dense workloads at a fixed count
    val dense50 = (1L to 50L).map(i => (i, 0.001 * i, 0.001 * i))
    val pts50 = (dense50 ++ sparse).toDF("id", "lat", "lon")
    val probe50 = (dense50 ++ sparse).toDF("pid", "plat", "plon")
    assert(Spatial.radiusJoin(probe50, pts50, "plat", "plon", "lat", "lon", 100.0,
      hotCellLimit = 10L).count() == 2504L)
    // guard off (<= 0) or an explicit maxCell contract: no raise
    assert(Spatial.radiusJoin(probe, pts, "plat", "plon", "lat", "lon", 100.0,
      hotCellLimit = 0L).count() == 1000000L + 4L)
    assert(Spatial.radiusJoin(probe, pts, "plat", "plon", "lat", "lon", 100.0,
      maxCell = Some(10L), hotCellLimit = 10L).count() == 4L)
    // consumers thread the knob: dbscan raises on the same planted cell
    val e2 = intercept[Exception] {
      Spatial.dbscan(pts, "id", "lat", "lon", 100.0, 3, hotCellLimit = 10L)
        .count()
    }
    val msg2 = Option(e2.getMessage).getOrElse("") +
      Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("hotCellLimit"), msg2.take(300))
  }

  test("dbscan: non-integral id column is rejected up front") {
    import spark.implicits._
    val pts = Seq(("a", 0.0, 0.0), ("b", 0.0, 0.5)).toDF("id", "lat", "lon")
    val e = intercept[IllegalArgumentException] {
      Spatial.dbscan(pts, "id", "lat", "lon", 100.0, 1)
    }
    assert(e.getMessage.contains("integral id"))
  }
}
