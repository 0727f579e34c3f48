package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left time") {
    val left = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L)).toDF("lid", "k", "lt")
    val right = Seq((1L, 1L, 5L), (2L, 1L, 40L), (3L, 1L, 60L), (4L, 2L, 50L)).toDF("rid", "k", "rt")
    val out = Temporal
      .asofJoin(left, right, Seq("k"), "lt", "rt", "rid", Seq("rid" -> "matched_rid", "rt" -> "matched_rt"))
      .orderBy("lid")
      .collect()
    // lid=100 (t=50): latest right <= 50 is rid=2 (t=40)
    assert(out(0).getAs[Long]("matched_rid") == 2L)
    // lid=101 (t=10): rid=1 (t=5)
    assert(out(1).getAs[Long]("matched_rid") == 1L)
    // lid=102 (t=50): rid=4 at exactly t=50 -> inclusive
    assert(out(2).getAs[Long]("matched_rid") == 4L)
  }

  test("asofJoin keeps unmatched left rows with nulls and breaks ties by max tiebreak") {
    val left = Seq((100L, 1L, 3L), (101L, 3L, 50L)).toDF("lid", "k", "lt")
    val right = Seq((1L, 1L, 5L), (7L, 3L, 50L), (8L, 3L, 50L)).toDF("rid", "k", "rt")
    val out = Temporal
      .asofJoin(left, right, Seq("k"), "lt", "rt", "rid", Seq("rid" -> "matched_rid"))
      .orderBy("lid")
      .collect()
    assert(out(0).isNullAt(out(0).fieldIndex("matched_rid"))) // no right row <= 3
    assert(out(1).getAs[Long]("matched_rid") == 8L) // tie at t=50 -> max rid
  }

  test("rangeJoin bins facts against a broadcast dimension, left-outer") {
    val facts = Seq((1L, 5.0), (2L, 75.0), (3L, 999.0)).toDF("id", "v")
    val bins = Seq(("low", 0.0, 50.0), ("mid", 50.0, 150.0)).toDF("tier", "lo", "hi")
    val out = Temporal.rangeJoin(facts, bins, "v", "lo", "hi").orderBy("id").collect()
    assert(out(0).getAs[String]("tier") == "low")
    assert(out(1).getAs[String]("tier") == "mid")
    assert(out(2).isNullAt(out(2).fieldIndex("tier"))) // out of every bin
  }

  test("intervalJoin pairs keyed rows within the time bounds only") {
    val left = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 12:00:00")),
      (12L, 2L, ts("2024-01-01 10:00:00"))).toDF("lid", "user_id", "lt")
    val right = Seq(
      (20L, 1L, ts("2024-01-01 10:15:00")), // in [lt, lt+30m] of lid=10
      (21L, 1L, ts("2024-01-01 10:45:00")), // past the horizon of lid=10
      (22L, 3L, ts("2024-01-01 10:15:00"))) // wrong key
      .toDF("rid", "user_id", "rt")
    val out = Temporal
      .intervalJoin(left, right, Seq("user_id"), "lt", "rt", 0L, 1800L)
      .select("lid", "rid")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 20L)))
  }

  test("mergeIntervals: overlap, engulfed, touching and disjoint cases; per-key isolation") {
    val iv = Seq(
      // key a: [1,5] + [3,8] overlap; [2,4] engulfed; [8,10] touches -> one island [1,10]
      ("a", 1L, 5L), ("a", 3L, 8L), ("a", 2L, 4L), ("a", 8L, 10L),
      // then a gap -> [20, 25] alone
      ("a", 20L, 25L),
      // key b independent
      ("b", 4L, 6L))
      .toDF("k", "s", "e")
      .repartition(4)
    val out = Temporal.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "island_idx")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 1L, 1L, 10L, 4L),
      ("a", 2L, 20L, 25L, 1L),
      ("b", 1L, 4L, 6L, 1L)))
    // tolerance bridges the gap
    val bridged = Temporal.mergeIntervals(iv, Seq("k"), "s", "e", tolerance = 10L)
      .filter(col("k") === "a").collect()
    assert(bridged.length == 1)
  }

  test("timeWeightedAvg weights each sample by its holding time; ties carry zero duration") {
    val df = Seq(
      // u1: v=10 holds 2s, v=20 holds 8s -> twap = (10*2 + 20*8) / 10 = 18
      ("u1", ts("2024-01-01 00:00:00"), 10.0, 1L),
      ("u1", ts("2024-01-01 00:00:02"), 20.0, 2L),
      ("u1", ts("2024-01-01 00:00:10"), 99.0, 3L), // last sample drops
      // u2: two samples at the SAME instant (tie), then one 4s later:
      // tie order pinned by id — id=5 is last, so its value holds the 4s
      ("u2", ts("2024-01-01 00:00:00"), 7.0, 4L),
      ("u2", ts("2024-01-01 00:00:00"), 3.0, 5L),
      ("u2", ts("2024-01-01 00:00:04"), 1.0, 6L))
      .toDF("k", "t", "v", "id")
    val out = Temporal.timeWeightedAvg(df, Seq("k"), "t", "v", tiebreakCols = Seq("id"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out(0) == (("u1", 18.0, 2L)))
    assert(out(1) == (("u2", 3.0, 2L))) // (7*0 + 3*4s) / 4s
  }

  test("mergeIntervals property: islands cover exactly the union of inputs (100 random sets)") {
    val r = new scala.util.Random(41)
    (1 to 5).foreach { _ =>
      val iv = (1 to 100).map { _ =>
        val s = r.nextInt(500).toLong
        ("k", s, s + 1 + r.nextInt(30))
      }
      val df = iv.toDF("k", "s", "e").repartition(4)
      val islands = Temporal.mergeIntervals(df, Seq("k"), "s", "e")
        .collect().map(row => (row.getLong(2), row.getLong(3)))
      // brute-force covered set of integer points
      val expected = iv.flatMap { case (_, s, e) => s to e }.toSet
      val got = islands.flatMap { case (s, e) => s to e }.toSet
      assert(got == expected, "islands must cover exactly the input union")
      // islands must not overlap or share an endpoint (closed-interval
      // semantics: touching ENDPOINTS merge; integer-adjacent starts do not)
      val sorted = islands.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 > e1, "overlapping islands should have merged")
        case _ => ()
      }
    }
  }

  test("rollingZScore flags a planted spike against its trailing window, self-excluded") {
    import java.sql.Timestamp
    val rows = Seq(10.0, 12.0, 11.0, 9.0, 10.5, 100.0, 10.2).zipWithIndex.map {
      case (v, i) => ("a", new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }
    val df = rows.toDF("k", "ts", "event_id", "v").repartition(4)
    val out = Temporal.rollingZScore(df, Seq("k"), Seq("ts", "event_id"), "v",
      lookback = 20, k = 3.0, minObs = 5)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_ => r.getDouble(5)), r.getBoolean(6)))
    // first 5 rows: trailing window < minObs -> z null, not outliers
    assert(out.take(5).forall { case (_, z, f) => z.isEmpty && !f })
    // the spike scores against [10,12,11,9,10.5]: mean 10.5, huge z
    val (_, zSpike, fSpike) = out(5)
    assert(fSpike && zSpike.exists(_ > 3.0), s"spike must flag: $zSpike")
    // the row AFTER the spike is normal vs a window that now contains the
    // spike (self-exclusion means the spike inflates sd, not its own z)
    val (_, zAfter, fAfter) = out(6)
    assert(!fAfter && zAfter.exists(z => math.abs(z) < 3.0))
  }

  test("rollingAgg RANGE frame bounds by index value, not row position") {
    val df = Seq((1L, 0, 10.0), (1L, 1, 20.0), (1L, 10, 40.0)).toDF("k", "pos", "v")
    val out = Temporal
      .rollingAgg(df, Seq("k"), "pos", lookback = 5, Seq((sum(col("v")), "roll")))
      .orderBy("pos")
      .collect()
    assert(out.map(_.getAs[Double]("roll")).toSeq == Seq(10.0, 30.0, 40.0))
    // pos=10 window is [5,10]: rows at pos 0,1 fall outside even though they
    // are the two preceding rows
  }

  test("scd2FromCdc: versions chain per key, deletes close but emit nothing") {
    import spark.implicits._
    val changes = Seq(
      (1L, "a", "U", 1L), (1L, "b", "U", 3L), (1L, "c", "U", 7L), // three open versions
      (2L, "x", "U", 2L), (2L, "x", "D", 5L),                     // deleted: no current row
      (3L, "z", "I", 4L))                                         // single current version
      .toDF("k", "v", "op", "seq")
    val out = Temporal.scd2FromCdc(changes, Seq("k"), "seq", "op")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "a", 1L, Some(3L), false),
      (1L, "b", 3L, Some(7L), false),
      (1L, "c", 7L, None, true),
      (2L, "x", 2L, Some(5L), false), // interval closed by the tombstone
      (3L, "z", 4L, None, true)))
  }

  test("cusum: prefix form equals the textbook recursion, alarm on a planted shift") {
    // flat at 10 for 10 steps, then shifted to 14 for 10 steps
    val xs = Seq.fill(10)(10.0) ++ Seq.fill(10)(14.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("g", "t", "v")
    val out = Temporal.cusum(df, Seq("t"), "v",
      target = 10.0, slack = 1.0, threshold = 20.0, keyCols = Seq("g"))
      .orderBy("t").collect()
      .map(r => (r.getAs[Double]("cusum_pos"), r.getAs[Boolean]("alarm_pos")))
    // textbook recursion S+_t = max(0, S+_{t-1} + (x - 11))
    var s = 0.0
    val expect = xs.map { x => s = math.max(0.0, s + (x - 11.0)); s }
    assert(out.map(_._1).toSeq == expect, out.mkString(", "))
    // 3 per shifted step: alarm crosses 20 at the 7th shifted point (21.0)
    assert(out.count(_._2) == 4 && out.indexWhere(_._2) == 16)
  }

  test("cusum matches the recursion on 500 random points, both sides, multiple keys") {
    val rnd = new scala.util.Random(23)
    val rows = for (g <- Seq("a", "b"); t <- 0 until 250)
      yield (g, t.toLong, (rnd.nextInt(4000) - 2000) / 100.0) // exact cents in [-20, 20)
    val out = Temporal.cusum(rows.toDF("g", "t", "v"), Seq("t"), "v",
      target = 0.0, slack = 0.5, threshold = 30.0, keyCols = Seq("g"))
      .orderBy("g", "t").collect()
      .map(r => (r.getString(0), r.getAs[Double]("cusum_pos"), r.getAs[Double]("cusum_neg")))
    for (g <- Seq("a", "b")) {
      var (sp, sn) = (0.0, 0.0)
      val got = out.filter(_._1 == g)
      rows.filter(_._1 == g).sortBy(_._2).zipWithIndex.foreach { case ((_, _, x), i) =>
        sp = math.max(0.0, sp + (x - 0.5))
        sn = math.max(0.0, sn - (x + 0.5))
        assert(math.abs(got(i)._2 - sp) < 1e-9 && math.abs(got(i)._3 - sn) < 1e-9,
          s"$g at $i: got ${got(i)}, want ($sp, $sn)")
      }
    }
  }

  test("ewma: hand-computed adjusted weights, lookback truncation, null gaps") {
    // alpha = 0.5, lookback = 3 -> weights 1, 0.5, 0.25
    val df = Seq(
      ("a", 1L, Some(4.0)), ("a", 2L, Some(8.0)), ("a", 3L, Some(12.0)),
      ("a", 4L, Some(0.0)),            // t1 falls out of the 3-wide window
      ("b", 1L, Some(10.0)), ("b", 2L, None), ("b", 3L, Some(20.0)))
      .toDF("g", "t", "value").repartition(5)
    val out = Temporal.ewma(df, Seq("g"), Seq("t"), "value", alpha = 0.5, lookback = 3)
      .orderBy("g", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      ("a", 1L, Some(4.0)),                      // 4/1
      ("a", 2L, Some(6.666667)),                 // (8+2)/1.5
      ("a", 3L, Some(9.714286)),                 // (12+4+1)/1.75
      ("a", 4L, Some(4.571429)),                 // (0+6+2)/1.75
      ("b", 1L, Some(10.0)),
      ("b", 2L, Some(10.0)),                     // value null: 0.5*10 / 0.5
      ("b", 3L, Some(18.0))))                    // (20 + 0 + 0.25*10) / 1.25
  }

  test("rollingCorr: perfect/anti/degenerate frames, window truncation") {
    // y = 2x -> corr 1 once 2 points exist; z = -x -> corr -1; const -> null
    val df = Seq.tabulate(5)(i =>
      ("up", i.toLong, i.toLong, 2L * i)) ++ Seq.tabulate(5)(i =>
      ("dn", i.toLong, i.toLong, -i.toLong)) ++ Seq.tabulate(3)(i =>
      ("cc", i.toLong, i.toLong, 7L))
    val out = Temporal.rollingCorr(
      df.toDF("g", "t", "x", "y").repartition(4),
      Seq("g"), Seq("t"), "x", "y", lookback = 3)
      .orderBy("g", "t").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // first row of each series: single point -> degenerate -> null
    assert(out.filter(_._1 == "up").map(_._3).toSeq ==
      Seq(None, Some(1.0), Some(1.0), Some(1.0), Some(1.0)))
    assert(out.filter(_._1 == "dn").map(_._3).toSeq ==
      Seq(None, Some(-1.0), Some(-1.0), Some(-1.0), Some(-1.0)))
    assert(out.filter(_._1 == "cc").map(_._3).forall(_.isEmpty))
  }

  test("rollingCorr matches driver-side Pearson on a random 3-wide window") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(50)(i => ("g", i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val got = Temporal.rollingCorr(rows.toDF("g", "t", "x", "y").repartition(6),
      Seq("g"), Seq("t"), "x", "y", lookback = 4)
      .orderBy("t").collect().map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    rows.indices.foreach { i =>
      val fr = rows.slice(math.max(0, i - 3), i + 1)
      val n = fr.size.toDouble
      val (sx, sy) = (fr.map(_._3).sum.toDouble, fr.map(_._4).sum.toDouble)
      val (sxx, syy, sxy) = (fr.map(p => p._3 * p._3).sum.toDouble,
        fr.map(p => p._4 * p._4).sum.toDouble, fr.map(p => p._3 * p._4).sum.toDouble)
      val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
      if (dx > 0 && dy > 0) {
        val want = (n * sxy - sx * sy) / math.sqrt(dx * dy)
        assert(math.abs(got(i).get - want) < 1e-6, s"row $i")
      } else assert(got(i).isEmpty, s"row $i should be degenerate")
    }
  }

  test("rollingCorr borrowed-tail fast path equals the plain keyed window bit-for-bit") {
    val rnd = new scala.util.Random(11)
    // 3 low-cardinality keys x 400 rows: with 8 range partitions each slice
    // carries >= lookback-1 rows, so the fast path engages; numPartitions=1
    // fails the partition-count guard and takes the plain keyed window
    val rows = Seq.tabulate(1200)(i =>
      (s"k${i % 3}", i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "t", "x", "y")
    def run(parts: Int) = Temporal.rollingCorr(
      df, Seq("g"), Seq("t"), "x", "y", lookback = 7, numPartitions = Some(parts))
      .select("g", "t", "corr").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val plain = run(1)
    assert(run(8) == plain, "fast path must equal the keyed window")
    assert(run(5) == plain)
  }

  test("ohlcBars picks open/close on the (ts, tie) total order and sums exactly") {
    // two ticks share the opening timestamp: the tie column must decide
    val rows = Seq(
      ("a", 1, 10L, 2L, 50.0, 5000L), ("a", 1, 10L, 1L, 30.0, 3000L),
      ("a", 1, 20L, 3L, 80.0, 8000L), ("a", 1, 20L, 4L, 20.0, 2000L),
      ("b", 1, 15L, 5L, 7.0, 700L))
      .toDF("k", "bucket", "ts", "id", "v", "cents")
    val got = Temporal.ohlcBars(rows.repartition(4), Seq("k"), "bucket", "ts", "id", "v", "cents")
      .orderBy("k").collect()
    val a = got(0)
    assert(a.getAs[Double]("open") == 30.0)   // id=1 wins the ts tie
    assert(a.getAs[Double]("close") == 20.0)  // id=4 wins the DESC tie
    assert(a.getAs[Double]("high") == 80.0 && a.getAs[Double]("low") == 20.0)
    assert(a.getAs[Long]("volume") == 4L && a.getAs[Long]("sum_value") == 18000L)
    val b = got(1)
    assert(b.getAs[Double]("open") == 7.0 && b.getAs[Double]("close") == 7.0)
  }

  test("acf recovers the exact alternating-series autocorrelation") {
    // x = 1,2,1,2,… has mean 1.5, acf(1) = −1, acf(2) = +1 exactly
    val rows = Seq.tabulate(40)(i => ("g", i.toLong, (1 + i % 2).toLong))
    val got = Temporal.acf(rows.toDF("g", "t", "x").repartition(5),
      Seq("g"), "t", "x", maxLag = 2)
      .orderBy("lag").collect()
    assert(got.map(_.getAs[Long]("n")).toSeq == Seq(40L, 40L))
    val acf1 = got(0).getAs[Double]("acf")
    val acf2 = got(1).getAs[Double]("acf")
    // finite-series estimator: denominator is the FULL series sum of
    // squares, numerator only the n−k overlap, so |acf| < 1 by (n−k)/n
    assert(math.abs(acf1 - (-39.0 / 40.0)) < 1e-9, s"acf1=$acf1")
    assert(math.abs(acf2 - 38.0 / 40.0) < 1e-9, s"acf2=$acf2")
  }

  test("arYuleWalker: sinusoid recovers (2cosθ, −1); constant-series NULLs; invariant") {
    // a sampled cosine satisfies x_{t+1} = 2cosθ·x_t − x_{t−1} exactly, so
    // Yule–Walker on it approaches phi1 = 2cosθ ≈ 1.732, phi2 = −1 (θ=π/6)
    // the finite-series estimator shrinks r_k by ~(n−k)/n, which the
    // 1/(1−r1²) factor amplifies near r1→1 — n=960 keeps the bias small
    val theta = math.Pi / 6
    val n = 960
    val rows = Seq.tabulate(n)(i =>
      ("g", i.toLong, math.round(1000.0 * math.cos(theta * i))))
    val got = Temporal.arYuleWalker(rows.toDF("g", "t", "x").repartition(5),
      Seq("g"), "t", "x", horizon = 3).head
    assert(got.getAs[Long]("n") == n.toLong)
    val phi1 = got.getAs[Double]("phi1"); val phi2 = got.getAs[Double]("phi2")
    assert(math.abs(phi1 - 2 * math.cos(theta)) < 0.05, s"phi1=$phi1")
    assert(math.abs(phi2 - (-1.0)) < 0.05, s"phi2=$phi2")
    // the forecast continues the wave: next true value is cos(θ·n)
    val f1 = got.getAs[Double]("f1")
    assert(math.abs(f1 - 1000.0 * math.cos(theta * n)) < 60.0, s"f1=$f1")
    // bit-identical across partitionings
    val g2 = Temporal.arYuleWalker(rows.toDF("g", "t", "x").repartition(11),
      Seq("g"), "t", "x", horizon = 3).head
    assert(g2.getAs[Double]("phi1") == phi1 && g2.getAs[Double]("f1") == f1)
    // zero-variance series: coefficients and forecasts all NULL
    val const = Seq.tabulate(10)(i => ("c", i.toLong, 7L))
    val cg = Temporal.arYuleWalker(const.toDF("g", "t", "x"),
      Seq("g"), "t", "x", horizon = 2).head
    assert(cg.isNullAt(cg.fieldIndex("phi1")) && cg.isNullAt(cg.fieldIndex("f2")))
  }

  test("seasonalPower: weekly wave reads ~full power at 7, off-period doesn't; flat NULL") {
    val weekly = (0 until 70).map(t =>
      ("w", t.toLong, 100L + math.round(50.0 * math.cos(2 * math.Pi * t / 7))))
    val fiveDay = (0 until 70).map(t =>
      ("f", t.toLong, 100L + math.round(50.0 * math.cos(2 * math.Pi * t / 5))))
    val flat = (0 until 70).map(t => ("c", t.toLong, 100L))
    val df = (weekly ++ fiveDay ++ flat).toDF("k", "t", "x").repartition(4)
    val got = Temporal.seasonalPower(df, Seq("k"), "t", "x", period = 7)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("amplitude"), r.getAs[java.lang.Double]("power_frac"))).toMap
    assert(math.abs(got("w")._1 - 50.0) < 1.0, s"amplitude ${got("w")._1}")
    assert(got("w")._2 > 0.95, s"weekly power ${got("w")._2}")
    assert(got("f")._2 < 0.05, s"off-period power ${got("f")._2}")
    assert(got("c")._2 == null, "flat series must NULL the variance share")
    val g7 = Temporal.seasonalPower(df.repartition(9), Seq("k"), "t", "x", period = 7)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("amplitude")).toMap
    assert(g7("w") == got("w")._1)
  }

  test("grangerCausality: planted y-drives-x design; constant series NULLs") {
    // x_t = 2·y_{t−1} + bounded noise, y_t exogenous: y must Granger-cause
    // x overwhelmingly, and not the reverse
    val rows = (0 until 80).map { t =>
      val y = ((t * 7) % 13).toDouble
      val yPrev = (((t - 1) * 7 % 13 + 13) % 13).toDouble
      val x = if (t == 0) 0.0 else 2.0 * yPrev + ((t * 37) % 11) / 11.0
      (t.toLong, x, y)
    }
    val got = Temporal.grangerCausality(rows.toDF("t", "x", "y"), "t", "x", "y")
      .orderBy("direction").collect()
    val xy = got(0); val yx = got(1)
    assert(xy.getAs[String]("direction") == "x->y" &&
      yx.getAs[String]("direction") == "y->x")
    assert(math.abs(yx.getAs[Double]("beta_cross") - 2.0) < 0.05,
      s"cross beta ${yx.getAs[Double]("beta_cross")}")
    assert(yx.getAs[Double]("f") > 50.0, s"f(y->x)=${yx.getAs[Double]("f")}")
    assert(yx.getAs[Double]("f") > 10.0 * math.max(xy.getAs[Double]("f"), 1.0))
    // degenerate design: constant series → det 0 → NULL readouts
    val const = (0 until 10).map(t => (t.toLong, 3.0, 4.0))
    val c = Temporal.grangerCausality(const.toDF("t", "x", "y"), "t", "x", "y")
      .collect()
    assert(c.forall(r => r.isNullAt(r.fieldIndex("f"))))
  }

  test("mannKendall: monotone series hits the closed form; constants NULL; invariant") {
    // strictly increasing, no ties: S = n(n-1)/2, Var = n(n-1)(2n+5)/18
    val up = (1 to 20).map(i => ("u", i.toLong, i.toLong))
    val const = (1 to 10).map(i => ("c", i.toLong, 7L))
    val df = (up ++ const).toDF("k", "t", "x").repartition(4)
    val got = Temporal.mannKendall(df, Seq("k"), "t", "x")
      .orderBy("k").collect()
    val c = got(0); val u = got(1)
    assert(u.getAs[Long]("s") == 190L && u.getAs[Long]("n") == 20L)
    assert(u.getAs[Double]("var_s") == 950.0)
    assert(math.abs(u.getAs[Double]("z") - 189.0 / math.sqrt(950.0)) < 1e-6)
    assert(u.getAs[Int]("trend") == 1)
    // constant series: S = 0, the tie correction kills the variance, z NULL
    assert(c.getAs[Long]("s") == 0L && c.getAs[Double]("var_s") == 0.0)
    assert(c.isNullAt(c.fieldIndex("z")) && c.getAs[Int]("trend") == 0)
    val g7 = Temporal.mannKendall(df.repartition(7), Seq("k"), "t", "x")
      .orderBy("k").collect()
    assert(g7(1).getAs[Double]("z") == u.getAs[Double]("z"))
    // a single-observation key yields no i<j pairs — it must still surface
    // (n=1, s=0, var_s=0, z NULL) instead of vanishing from the output
    val one = Temporal.mannKendall(
      (up :+ (("solo", 1L, 42L))).toDF("k", "t", "x"), Seq("k"), "t", "x")
      .filter(col("k") === "solo").collect()
    assert(one.length == 1)
    assert(one(0).getAs[Long]("n") == 1L && one(0).getAs[Long]("s") == 0L)
    assert(one(0).getAs[Double]("var_s") == 0.0 &&
      one(0).isNullAt(one(0).fieldIndex("z")))
  }

  test("backtestSeasonalNaive: periodic series scores zero; hand MASE; invariant") {
    // period-2 series 10,20,10,20,... : seasonal-naive is PERFECT on the
    // holdout (mae 0, mase 0) while the lag-1 naive scale is 10
    val per = (1 to 12).map(i => ("p", i.toLong, if (i % 2 == 1) 10L else 20L))
    val dfP = per.toDF("k", "t", "v").repartition(3)
    val p = Temporal.backtestSeasonalNaive(dfP, Seq("k"), "t", "v",
      period = 2, holdout = 4).head
    assert(p.getAs[Long]("n_test") == 4L)
    assert(p.getAs[Double]("mae") == 0.0 && p.getAs[Double]("mase") == 0.0)
    // trending series 1..12, m=2, h=2: forecast errors |11-9|=2, |12-10|=2
    // -> mae 2, rmse 2; in-sample naive (t=2..10) steps of 1 -> scale 1,
    // mase = 2
    val tr = (1 to 12).map(i => ("t", i.toLong, i.toLong))
    val r = Temporal.backtestSeasonalNaive(tr.toDF("k", "t", "v"), Seq("k"), "t", "v",
      period = 2, holdout = 2).head
    assert(r.getAs[Double]("mae") == 2.0 && r.getAs[Double]("rmse") == 2.0)
    assert(r.getAs[Double]("mase") == 2.0)
    // constant series: zero naive scale -> NULL mase, mae 0
    val const = (1 to 8).map(i => ("c", i.toLong, 5L))
    val c = Temporal.backtestSeasonalNaive(const.toDF("k", "t", "v"), Seq("k"), "t", "v",
      period = 2, holdout = 2).head
    assert(c.getAs[Double]("mae") == 0.0 && c.isNullAt(c.fieldIndex("mase")))
    val g7 = Temporal.backtestSeasonalNaive(dfP.repartition(7), Seq("k"), "t", "v",
      period = 2, holdout = 4).head
    assert(g7.getAs[Double]("mase") == 0.0)
  }

  test("rmst: hand step integral; horizon truncation; censoring extends; invariant") {
    // events at t=1 (S->0.5) and t=3 (S->0), tau=10:
    // RMST = 1 (S=1 head) + 0.5*(3-1) + 0*(10-3) = 2
    val df = Seq(("k", 1L, true), ("k", 3L, true)).toDF("g", "dur", "ev")
      .repartition(3)
    val r = Temporal.rmst(df, "dur", "ev", horizon = 10L, Seq("g")).head
    assert(r.getAs[Double]("rmst") == 2.0 && r.getAs[Long]("n_times") == 2L)
    // tau=2 truncates the second step: 1 + 0.5*(2-1) = 1.5
    val t2 = Temporal.rmst(df, "dur", "ev", horizon = 2L, Seq("g")).head
    assert(t2.getAs[Double]("rmst") == 1.5)
    // censoring instead of an event at t=3: S stays 0.5 to the horizon,
    // RMST = 1 + 0.5*(10-1) = 5.5
    val cen = Seq(("k", 1L, true), ("k", 3L, false)).toDF("g", "dur", "ev")
    val c = Temporal.rmst(cen, "dur", "ev", horizon = 10L, Seq("g")).head
    assert(c.getAs[Double]("rmst") == 5.5)
    val g7 = Temporal.rmst(df.repartition(7), "dur", "ev", horizon = 10L, Seq("g")).head
    assert(g7.getAs[Double]("rmst") == 2.0)
  }

  test("var1: exact recovery of a noiseless coupled recursion; constant series NULLs") {
    // the data IS the model: x' = 2 + .5x − .25y, y' = 1 + .25x + .5y
    var x = 10.0; var y = 5.0
    val rows = (0 until 50).map { t =>
      val r = (t.toLong, x, y)
      val nx = 2.0 + 0.5 * x - 0.25 * y
      val ny = 1.0 + 0.25 * x + 0.5 * y
      x = nx; y = ny
      r
    }
    val got = Temporal.var1(rows.toDF("t", "x", "y"), "t", "x", "y")
      .orderBy("equation").collect()
    val ex = got(0); val ey = got(1)
    assert(ex.getAs[String]("equation") == "x" && ex.getAs[Long]("n") == 49L)
    assert(math.abs(ex.getAs[Double]("beta0") - 2.0) < 1e-3)
    assert(math.abs(ex.getAs[Double]("beta1") - 0.5) < 1e-3)
    assert(math.abs(ex.getAs[Double]("beta2") + 0.25) < 1e-3)
    assert(ex.getAs[Double]("r2") > 0.999999)
    assert(math.abs(ey.getAs[Double]("beta1") - 0.25) < 1e-3)
    // the forecast continues the recursion: after the loop, x holds x_50
    assert(math.abs(ex.getAs[Double]("f1") - x) < 1e-3, s"f1=${ex.getAs[Double]("f1")} vs $x")
    assert(math.abs(ey.getAs[Double]("f1") - y) < 1e-3)
    // degenerate: constant series has zero-variance design -> NULLs
    val const = (0 until 10).map(t => (t.toLong, 3.0, 4.0))
    val c = Temporal.var1(const.toDF("t", "x", "y"), "t", "x", "y").collect()
    assert(c.forall(_.isNullAt(2)))
  }

  test("aalenJohansen: hand-solved CIFs conserve mass; censoring holds curves flat") {
    // t=1 cause1, t=2 cause2, t=3 censored, t=4 cause1 (n=4):
    // CIF1 = .25,.25,.25,.75  CIF2 = 0,.25,.25,.25  S = .75,.5,.5,0
    val df = Seq((1L, 1), (2L, 2), (3L, 0), (4L, 1)).toDF("dur", "cause")
    val got = Temporal.aalenJohansen(df.repartition(3), "dur", "cause")
      .orderBy("duration").collect()
    assert(got.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 2L, 1L))
    assert(got.map(_.getAs[Double]("cif1")).toSeq == Seq(0.25, 0.25, 0.25, 0.75))
    assert(got.map(_.getAs[Double]("cif2")).toSeq == Seq(0.0, 0.25, 0.25, 0.25))
    assert(got.map(_.getAs[Double]("survival")).toSeq == Seq(0.75, 0.5, 0.5, 0.0))
    // conservation at every step: CIF1 + CIF2 + S = 1
    got.foreach { r =>
      val tot = r.getAs[Double]("cif1") + r.getAs[Double]("cif2") +
        r.getAs[Double]("survival")
      assert(math.abs(tot - 1.0) < 1e-9, s"mass leak at ${r.getAs[Long]("duration")}")
    }
    val g7 = Temporal.aalenJohansen(df.repartition(7), "dur", "cause")
      .orderBy("duration").collect()
    assert(g7.map(_.getAs[Double]("cif1")).toSeq ==
      got.map(_.getAs[Double]("cif1")).toSeq)
  }

  test("lttbDownsample: endpoints kept, planted spike survives, short series intact") {
    // flat series with one huge spike at x=57: any downsample that loses
    // it is wrong — LTTB's whole reason to exist
    val rows = (0 until 200).map(x => ("s", x.toLong, if (x == 57) 5000L else 10L))
    val out = Temporal.lttbDownsample(
        rows.toDF("k", "x", "y").repartition(4), Seq("k"), "x", "y", threshold = 20)
      .orderBy("x").select("x", "y").as[(Long, Long)].collect()
    assert(out.length == 20)
    assert(out.head._1 == 0L && out.last._1 == 199L, "endpoints must be kept")
    assert(out.exists(_._2 == 5000L), s"spike erased: ${out.toSeq}")
    // series shorter than the threshold passes through complete
    val short = (0 until 5).map(x => ("s", x.toLong, x.toLong * 2))
    val thru = Temporal.lttbDownsample(
        short.toDF("k", "x", "y"), Seq("k"), "x", "y", threshold = 20)
      .orderBy("x").select("x", "y").as[(Long, Long)].collect()
    assert(thru.toSeq == short.map(t => (t._2, t._3)).toSeq)
  }

  test("flooredRunningBalance equals the sequential max(0, b+d) recursion") {
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 0 until 4; t <- 0 until 50)
      yield (k.toLong, t.toLong, rnd.nextInt(21) - 10L)
    val got = Temporal.flooredRunningBalance(
        rows.toDF("k", "t", "d").repartition(5), Seq("k"), Seq(col("t")), "d")
      .orderBy("k", "t").select("k", "t", "balance")
      .as[(Long, Long, Long)].collect()
    val expected = rows.groupBy(_._1).flatMap { case (k, g) =>
      var b = 0L
      g.sortBy(_._2).map { case (_, t, d) => b = math.max(0L, b + d); (k, t, b) }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(got.toSeq == expected, "Lindley reflection must equal the recursion")
  }

  test("changepoint: planted mean shift is found exactly; constant series ties to k=1") {
    val shift = ((1 to 10).map(t => ("a", t, 0L)) ++ (11 to 20).map(t => ("a", t, 100L)))
    val r = Temporal.changepoint(shift.toDF("k", "t", "v").repartition(4), Seq("k"), "t", "v")
      .head
    assert(r.getAs[Long]("cp_index") == 10L && r.getAs[Int]("cp_at") == 10)
    assert(r.getAs[Double]("mean_left") == 0.0 && r.getAs[Double]("mean_right") == 100.0)
    // gain at the true split: n_l·n_r/n·(Δmean)² = 10·10/20·100² = 50000
    assert(r.getAs[Double]("gain") == 50000.0)
    val const = (1 to 8).map(t => ("c", t, 7L))
    val c = Temporal.changepoint(const.toDF("k", "t", "v"), Seq("k"), "t", "v").head
    assert(c.getAs[Double]("gain") == 0.0 && c.getAs[Long]("cp_index") == 1L,
      "all-zero gains must tie-break to the earliest split")
    // single-row keys have no candidate split
    val single = Seq(("s", 1, 5L)).toDF("k", "t", "v")
    assert(Temporal.changepoint(single, Seq("k"), "t", "v").count() == 0L)
  }

  test("holtSmooth: bit-exact against the hand recursion; single point keeps its level") {
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 18.0, 17.0, 21.0)
    val (alpha, beta) = (0.3, 0.1)
    var (l, b) = (xs.head, 0.0)
    xs.tail.foreach { x =>
      val nl = alpha * x + (1.0 - alpha) * (l + b)
      b = beta * (nl - l) + (1.0 - beta) * b
      l = nl
    }
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("k", "t", "x")
    val r = Temporal.holtSmooth(df.repartition(3), Seq("k"), "t", "x", alpha, beta).head
    assert(r.getAs[Double]("level") == l && r.getAs[Double]("trend") == b,
      "declarative aggregate() recursion must match the sequential one bit-for-bit")
    assert(r.getAs[Double]("forecast") == l + b)
    val single = Seq(("s", 0, 42.0)).toDF("k", "t", "x")
    val s1 = Temporal.holtSmooth(single, Seq("k"), "t", "x", alpha, beta).head
    assert(s1.getAs[Double]("level") == 42.0 && s1.getAs[Double]("trend") == 0.0)
  }

  test("seasonalStrength: pure weekly pattern scores ~1 seasonal; pure ramp ~1 trend") {
    def series(vals: Int => Long, n: Int) =
      (0 until n).map(i => (i, (i % 7), vals(i))).toDF("t", "phase", "v")
    // strong weekly cycle, no trend: seasonal strength ~1, trend ~0-ish
    val cyc = Temporal.seasonalStrength(
      series(i => 1000L + (i % 7) * 500L, 70), "t", "v", "phase", 7).head
    assert(cyc.getAs[Double]("seasonal_strength") > 0.99, cyc.toString)
    // pure linear ramp: the weekly component is flat -> trend strength ~1
    val ramp = Temporal.seasonalStrength(
      series(i => 100L * i, 70), "t", "v", "phase", 7).head
    assert(ramp.getAs[Double]("trend_strength") > 0.99, ramp.toString)
    assert(ramp.getAs[Long]("n") == 64L) // 70 minus the half-window edges
  }

  test("durbinWatson: alternating residuals near 4, smooth curvature below 2, exact fit NULL") {
    // y alternates 10,0,... : residuals flip sign every step -> DW near 4;
    // exact value replayed by the hand OLS + quantized-residual chain
    val n = 10
    val ys = (1 to n).map(i => if (i % 2 == 1) 10L else 0L)
    val alt = ys.zipWithIndex.map { case (y, i) => ("a", i + 1, y) }.toDF("k", "t", "v")
    val ra = Temporal.durbinWatson(alt, Seq("k"), "t", "v").head
    assert(ra.getAs[Long]("n") == n.toLong)
    val (sx, sy) = ((1 to n).map(_.toLong).sum, ys.sum)
    val sxx = (1 to n).map(i => i.toLong * i).sum
    val sxy = ys.zipWithIndex.map { case (y, i) => (i + 1) * y }.sum
    val den0 = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy).toDouble / den0
    val icept = (sy * den0 - (n * sxy - sx * sy) * sx).toDouble / (n.toLong * den0)
    val eq = ys.zipWithIndex.map { case (y, i) =>
      math.floor((y.toDouble - icept - slope * (i + 1)) * 1e6 + 0.5).toLong
    }
    val num = eq.sliding(2).map { case Seq(p, c) => (c - p) * (c - p) }.sum
    val expected = num.toDouble / eq.map(e => e * e).sum
    assert(ra.getAs[Double]("dw") == math.rint(expected * 1e6) / 1e6 ||
      math.abs(ra.getAs[Double]("dw") - expected) < 1e-6)
    assert(ra.getAs[Double]("dw") > 3.0) // sign-flipping residuals
    // convex series y = t^2: residuals of the line are serially correlated
    val curve = (1 to 20).map(i => ("c", i, (i * i).toLong)).toDF("k", "t", "v")
    assert(Temporal.durbinWatson(curve, Seq("k"), "t", "v").head.getAs[Double]("dw") < 1.0)
    // exact linear data: zero residual energy -> NULL, not 0/0
    val line = (1 to 8).map(i => ("l", i, (3 * i + 7).toLong)).toDF("k", "t", "v")
    val rl = Temporal.durbinWatson(line, Seq("k"), "t", "v").head
    assert(rl.isNullAt(rl.fieldIndex("dw")))
  }

  test("crostonForecast: bit-exact hand recursion; zeros only advance the interval clock") {
    val alpha = 0.3
    // series 0,2,0,0,5,0: seed at pos 2 (z=2, p=2); next demand at pos 5
    // with q_in=3: z=.3*5+.7*2, p=.3*3+.7*2; trailing zero changes nothing
    val xs = Seq(0.0, 2.0, 0.0, 0.0, 5.0, 0.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("k", "t", "x")
    val r = Temporal.crostonForecast(df.repartition(3), Seq("k"), "t", "x", alpha).head
    val z = 0.3 * 5.0 + (1.0 - 0.3) * 2.0
    val p = 0.3 * 3.0 + (1.0 - 0.3) * 2.0
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("n_demands") == 2L)
    assert(r.getAs[Double]("size_level") == z && r.getAs[Double]("interval_level") == p,
      "declarative aggregate() recursion must match the sequential one bit-for-bit")
    assert(r.getAs[Double]("forecast") == z / p)
    assert(r.getAs[Double]("sba") == (1.0 - 0.3 / 2.0) * (z / p))
    // constant nonzero demand every period: z = x, p = 1, forecast = x
    val dense = (0 until 5).map(i => ("d", i, 4.0)).toDF("k", "t", "x")
    val rd = Temporal.crostonForecast(dense, Seq("k"), "t", "x", alpha).head
    assert(rd.getAs[Double]("forecast") == 4.0 && rd.getAs[Double]("interval_level") == 1.0)
    // no demand at all -> NULL state, NULL forecast
    val zero = (0 until 4).map(i => ("z", i, 0.0)).toDF("k", "t", "x")
    val rz = Temporal.crostonForecast(zero, Seq("k"), "t", "x", alpha).head
    assert(rz.isNullAt(rz.fieldIndex("forecast")) && rz.getAs[Long]("n_demands") == 0L)
  }

  test("pacf: AR(1) geometric acf collapses to lag-1 support; kernel matches hand Durbin") {
    // kernel level: rho = 0.5^k is exactly AR(1) -> pacf = [0.5, 0, 0]
    val rhos = Array(0.5, 0.25, 0.125)
    val got = graft.functions.VectorOps.pacf(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rhos))
    assert((0 until 3).map(got.getDouble).toSeq == Seq(0.5, 0.0, 0.0))
    // hand Durbin on a non-trivial vector
    val r2 = Array(0.6, 0.5)
    val p2 = graft.functions.VectorOps.pacf(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(r2))
    val expected2 = (0.5 - 0.6 * 0.6) / (1.0 - 0.6 * 0.6)
    assert(p2.getDouble(0) == 0.6 && p2.getDouble(1) == expected2)
    // operator level: white-noise-ish series yields 7 lags per key
    val rnd = new scala.util.Random(7)
    val rows = for (t <- 0 until 200) yield ("k", t, rnd.nextInt(100).toLong)
    val out = Temporal.pacf(rows.toDF("g", "t", "x"), Seq("g"), "t", "x", 7)
      .orderBy("lag").collect()
    assert(out.length == 7 && out.map(_.getAs[Long]("lag")).toSeq == (1L to 7L))
    assert(out.forall(r => math.abs(r.getAs[Double]("pacf")) <= 1.0))
  }

  test("hurstRS: strong trend near 1, alternating series far below random walk") {
    val trend = (0 until 64).map(i => ("t", i, (i * 100).toLong))
    val alt = (0 until 64).map(i => ("a", i, if (i % 2 == 0) 0L else 100L))
    val out = Temporal.hurstRS(
        (trend ++ alt).toDF("k", "i", "v").repartition(4), Seq("k"), "i", "v",
        sizes = Seq(4, 8, 16))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_sizes"), r.getAs[Double]("hurst")))
    assert(out.length == 2 && out.forall(_._2 == 3L))
    val (hAlt, hTrend) = (out(0)._3, out(1)._3)
    assert(hTrend > 0.9, s"pure trend must give H near 1, got $hTrend")
    assert(hAlt < 0.3, s"alternating series must give small H, got $hAlt")
    // constant series: every block has zero variance -> no surviving sizes
    val const = (0 until 32).map(i => ("c", i, 5L))
    assert(Temporal.hurstRS(const.toDF("k", "i", "v"), Seq("k"), "i", "v",
      Seq(4, 8)).count() == 0L)
  }

  test("saxWords: step series reads aadd, constant series cccc, short series dropped") {
    val step = (0 until 8).map(i => ("s", i, if (i < 4) 0L else 100L))
    val const = (0 until 8).map(i => ("c", i, 7L))
    val short3 = (0 until 3).map(i => ("x", i, i.toLong))
    val out = Temporal.saxWords(
        (step ++ const ++ short3).toDF("k", "t", "v").repartition(4),
        Seq("k"), "t", "v", segments = 4)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // step: mu=50 sigma=50, segment means 0,0,100,100 -> z=-1,-1,1,1
    assert(out.toSeq == Seq(("c", 8L, "cccc"), ("s", 8L, "aadd")))
  }

  test("forecastBacktest: hand-computed MAEs; short series gets NULL seasonal columns") {
    // series 10, 12, 9, 15: naive errors 2,3,6 -> mae 11/3; season=2
    // errors |9-10|=1, |15-12|=3 -> mae 2; mase = (11/3)/2
    val df = Seq(("a", 1, 10L), ("a", 2, 12L), ("a", 3, 9L), ("a", 4, 15L),
      ("b", 1, 5L), ("b", 2, 7L)).toDF("k", "t", "v")
    val out = Temporal.forecastBacktest(df.repartition(3), Seq("k"), "t", "v", season = 2)
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getAs[Long]("n") == 4L)
    assert(a.getAs[Double]("mae_naive") == math.rint(11.0 / 3.0 * 1e6) / 1e6)
    assert(a.getAs[Double]("mae_snaive") == 2.0)
    assert(a.getAs[Double]("mase") == math.rint(11.0 / 3.0 / 2.0 * 1e6) / 1e6)
    val b = out(1) // only 2 points: one naive error, zero seasonal at m=2
    assert(b.getAs[Double]("mae_naive") == 2.0)
    assert(b.isNullAt(b.fieldIndex("mae_snaive")) && b.isNullAt(b.fieldIndex("mase")))
  }

  test("maxDrawdown: exact peak-to-trough on a planted curve, zero when monotone") {
    val rows = Seq(
      ("a", 1, 10L), ("a", 2, 7L), ("a", 3, 12L), ("a", 4, 4L), ("a", 5, 9L),
      ("b", 1, 1L), ("b", 2, 2L), ("b", 3, 3L))
    val out = Temporal.maxDrawdown(
        rows.toDF("k", "t", "level").repartition(4),
        Seq("k"), Seq(col("t")), "level")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: peaks 10,10,12,12,12 -> drawdowns 0,3,0,8,3 -> max 8
    assert(out.toSeq == Seq(("a", 8L, 12L, 5L), ("b", 0L, 3L, 3L)))
  }

  test("nearestEventJoin: direction picks, tolerance cut, tie conventions") {
    val lefts = Seq((1L, 100L, 10L), (1L, 200L, 11L), (1L, 300L, 12L),
      (1L, 400L, 13L), (1L, 500L, 14L))
      .toDF("k", "lt", "lid")
    val rights = Seq((1L, 90L, 1L), (1L, 105L, 2L), (1L, 195L, 3L),
      (1L, 195L, 8L), (1L, 220L, 4L), (1L, 390L, 5L), (1L, 410L, 6L),
      (1L, 500L, 9L))
      .toDF("k", "rt", "rid")
    val out = Temporal.nearestEventJoin(lefts.repartition(3), rights,
      Seq("k"), "lt", "rt", "rid", Seq("rid" -> "match_id"), tolerance = 50L)
      .orderBy("lid").collect()
      .map(r => (r.getAs[Long]("lid"),
        if (r.isNullAt(r.fieldIndex("match_id"))) -1L else r.getAs[Long]("match_id"),
        if (r.isNullAt(r.fieldIndex("nearest_gap"))) -1L else r.getAs[Long]("nearest_gap"),
        Option(r.getAs[String]("direction")).getOrElse("none")))
    assert(out(0) == ((10L, 2L, 5L, "after")), out.mkString(","))   // 105 beats 90
    assert(out(1) == ((11L, 8L, 5L, "before")))  // equal-instant pair: largest tb
    assert(out(2) == ((12L, -1L, -1L, "none")))  // nothing within 50
    assert(out(3) == ((13L, 5L, 10L, "before"))) // equidistant: backward preferred
    assert(out(4) == ((14L, 9L, 0L, "before")))  // same instant counts backward
  }

  test("nearestEventJoin: NULL value on the nearest event stays NULL (one-struct carry)") {
    // nearest right row (t=105) has a NULL value; an older row (t=90) has 7.
    // Every output column must come from the SAME matched row, so match_v
    // reads NULL while nearest_time still points at 105.
    val lefts = Seq((1L, 100L)).toDF("k", "lt")
    val rights = Seq((1L, 90L, 1L, Some(7L)), (1L, 105L, 2L, None))
      .toDF("k", "rt", "rid", "rv")
    val r = Temporal.nearestEventJoin(lefts, rights.repartition(2),
      Seq("k"), "lt", "rt", "rid",
      Seq("rid" -> "match_id", "rv" -> "match_v"), tolerance = 50L).head
    assert(r.getAs[Long]("match_id") == 2L)
    assert(r.getAs[Long]("nearest_time") == 105L)
    assert(r.isNullAt(r.fieldIndex("match_v")))
  }

  test("kaplanMeierGreenwood: hand bands, censored step inherits, d=n kills se, CI clamps") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // event at 1, censored at 2, event at 3
    val df = Seq((1L, true), (2L, false), (3L, true)).toDF("dur", "ev")
    val rows = Temporal.kaplanMeierGreenwood(df.repartition(3), "dur", "ev")
      .orderBy("duration").collect()
    val s1 = math.exp(math.log(1 - 1.0 / 3))
    val se1 = math.sqrt(s1 * s1 * (1.0 / (3.0 * 2.0)))
    assert(rows(0).getAs[Long]("n_risk") == 3L)
    assert(rows(0).getAs[Double]("survival") == r6(s1))
    assert(rows(0).getAs[Double]("se") == r6(se1))
    assert(rows(0).getAs[Double]("ci_lo") == r6(math.max(0.0, s1 - 1.959964 * se1)))
    assert(rows(0).getAs[Double]("ci_hi") == r6(math.min(1.0, s1 + 1.959964 * se1)))
    // a censored-only step adds no event: curve and band both carry over
    assert(rows(1).getAs[Double]("survival") == r6(s1))
    assert(rows(1).getAs[Double]("se") == r6(se1))
    // last subject leaves: S = 0, Greenwood term is 1/0 -> NULL band
    assert(rows(2).getAs[Double]("survival") == 0.0)
    assert(rows(2).isNullAt(rows(2).fieldIndex("se")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("ci_hi")))
    // upper clamp: 1 event then 9 censored -> S=0.9, S+1.96se > 1 -> 1.0
    val big = (Seq((1L, true)) ++ Seq.fill(9)((2L, false))).toDF("dur", "ev")
    val b = Temporal.kaplanMeierGreenwood(big, "dur", "ev")
      .orderBy("duration").collect()(0)
    assert(b.getAs[Double]("ci_hi") == 1.0)
  }

  test("chowTest: planted level shift yields a huge F; no-break line yields NULL (zero SSE)") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // y = x below the break, y = x + 10 above: each side fits exactly
    // (SSE 0) while the pooled line cannot
    val shifted = (0 until 20).map(i =>
      (i.toDouble, i.toDouble, if (i < 10) i.toDouble else i + 10.0))
    val out = Temporal.chowTest(shifted.toDF("t", "x", "y").repartition(3),
      "t", "x", "y", breakPoint = 10.0).head
    assert(out.getAs[Long]("n1") == 10L && out.getAs[Long]("n2") == 10L)
    assert(out.getAs[Double]("sse_split") == 0.0)
    assert(out.isNullAt(out.fieldIndex("f_stat")), "zero split SSE pins F NULL")
    assert(out.getAs[Double]("sse_pooled") > 100.0)
    // noisy break: both SSEs positive, F large and hand-replayable
    val noisy = (0 until 20).map { i =>
      val bump = if (i % 2 == 0) 0.5 else -0.5
      (i.toDouble, i.toDouble, (if (i < 10) i.toDouble else i + 10.0) + bump)
    }
    val o2 = Temporal.chowTest(noisy.toDF("t", "x", "y").repartition(3),
      "t", "x", "y", breakPoint = 10.0).head
    assert(o2.getAs[Double]("f_stat") > 50.0)
    // pure line, same noise, no break: F collapses toward ~0-ish scale
    val line = noisy.map { case (t, x, y) => (t, x, if (t < 10) y else y - 10.0) }
    val o3 = Temporal.chowTest(line.toDF("t", "x", "y"), "t", "x", "y", 10.0).head
    assert(o3.getAs[Double]("f_stat") < 1.0)
    // a sub-3-row segment is undefined
    val tiny = Temporal.chowTest(shifted.toDF("t", "x", "y"), "t", "x", "y", 18.5).head
    assert(tiny.isNullAt(tiny.fieldIndex("f_stat")))
  }

  test("hampelFilter: flags the spike a prior spike would mask for the z-score") {
    import java.sql.Timestamp
    // window holds a previous 100-spike: rolling z-score's sd inflates and
    // the second spike (60) hides below k·sd; the median/MAD pair doesn't care
    val vals = Seq(10.0, 12.0, 11.0, 9.0, 10.5, 100.0, 10.2, 11.1, 60.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("a", new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }
    val df = rows.toDF("k", "ts", "event_id", "v").repartition(4)
    val h = Temporal.hampelFilter(df, Seq("k"), Seq("ts", "event_id"), "v",
      lookback = 20, k = 3.0, minObs = 5)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(2), Option(r.get(r.fieldIndex("median"))).map(_ => r.getAs[Double]("median")),
        r.getAs[Boolean]("is_outlier")))
    assert(h.take(5).forall { case (_, m, f) => m.isEmpty && !f })
    assert(h(5)._3, "the first spike must flag")
    assert(!h(6)._3 && !h(7)._3)
    assert(h(8)._3, "the second spike must flag despite the first in-window")
    // the z-score twin is masked on the same data — the robustness contract
    val z = Temporal.rollingZScore(df, Seq("k"), Seq("ts", "event_id"), "v",
      lookback = 20, k = 3.0, minObs = 5)
      .orderBy("event_id").collect().map(_.getAs[Boolean]("is_outlier"))
    assert(!z(8), "rolling z-score must be masked here for the contrast to hold")
    // all-equal history: MAD 0, any deviation flags, equality does not
    val flat = (0 until 6).map(i =>
      ("b", new Timestamp(1700000000000L + i * 60000L), i.toLong, 5.0)) :+
      (("b", new Timestamp(1700000000000L + 6 * 60000L), 6L, 5.2))
    val f = Temporal.hampelFilter(flat.toDF("k", "ts", "event_id", "v"),
      Seq("k"), Seq("ts", "event_id"), "v", lookback = 20, k = 3.0, minObs = 5)
      .orderBy("event_id").collect()
    assert(!f(5).getAs[Boolean]("is_outlier"))  // equals the median
    assert(f(6).getAs[Boolean]("is_outlier"))   // any deviation off a flat window
  }
}