package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("kMeansGrid: hand-traced two-cluster run — init, migration, requantized means") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (100L, 0L), (101L, 0L), (100L, 1L))
      .toDF("x", "y")
    // init c0=(0,0), c1=(0,1); round 1 pulls c0 to (51,0)/c1 to (50,1);
    // round 2 migrates the small points to c1=(0,0), c0=(100,0); the final
    // assignment leaves 3 points and inertia 2 on each side
    val out = Similarity.kMeansGrid(pts.repartition(3), Seq("x", "y"), k = 2, iters = 2)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0, 3L, 100L, 0L, 2L), (1, 3L, 0L, 0L, 2L)))
  }

  // 4-dim toy corpus: vec 2 is a scaled copy of vec 1 (cosine 1.0), vec 3
  // orthogonal-ish, vec 4 negated.
  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 2.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, -1.0f, 0.0f))).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks exact cosine neighbors") {
    val out = Similarity
      .bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding", k = 3)
      .orderBy("rnk")
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L))
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(2)) < 1e-12)
    assert(math.abs(out(2).getDouble(2) + 1.0) < 1e-12)
  }

  test("lshTopK finds an identical-direction vector (same bucket in every table)") {
    val out = Similarity
      .lshTopK(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding", k = 3, tables = 4, bits = 8)
      .collect()
    // vec 2 is exactly collinear with the query -> identical signatures -> must be found
    assert(out.exists(r => r.getLong(1) == 2L && math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }

  test("ivfTopK recovers brute-force top-1 for most queries at modest nProbe") {
    val rnd = new scala.util.Random(3)
    val dim = 16
    val corpus = (0 until 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", k = 1, nCells = 8, nProbe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = brute.count { case (q, v) => ivf.get(q).contains(v) }
    assert(agree >= 7, s"IVF top-1 agreement $agree/10 too low (brute=$brute ivf=$ivf)")
  }

  test("quantizedTopK agrees with brute force at high rate; rerank scores are exact floats") {
    val rnd = new scala.util.Random(5)
    val dim = 16
    val corpus = (0 until 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).map(t => t._1 -> t).toMap
    val sq = Similarity.quantizedTopK(corpus, queries, "vec_id", "embedding", k = 1, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).map(t => t._1 -> t).toMap
    val agree = brute.count { case (q, t) => sq.get(q).contains(t) }
    // int8 over 16 dims keeps ordering for clear winners; rerank=8 widens
    // the shortlist; where they agree the scores must be bit-identical
    // (the rerank re-scores on the original floats)
    assert(agree >= 8, s"quantized top-1 agreement $agree/10 too low (brute=$brute sq=$sq)")
  }

  test("embeddingNearDup surfaces planted duplicate pairs above threshold") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val base = (0 until 40).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val planted = (0 until 5).map { i =>
      val (_, v) = base(i)
      (1000L + i, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDup(corpus, "vec_id", "embedding", threshold = 0.95, tables = 8, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 5).count(i => pairs.contains((i.toLong, 1000L + i)))
    assert(found >= 4, s"planted pairs found $found/5: $pairs")
  }

  test("lshTopK high recall on planted near-duplicates over a random corpus") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val baseVecs = (0 until 50).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    // plant: vec 1000+i = tiny perturbation of vec i for i < 10
    val planted = (0 until 10).map { i =>
      val (_, v) = baseVecs(i)
      (1000L + i, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }
    val corpus = (baseVecs ++ planted).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" >= 1000L)
    val found = Similarity
      .lshTopK(corpus, queries, "vec_id", "embedding", k = 1, tables = 8, bits = 8)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val recall = (0 until 10).count(i => found.get(1000L + i).contains(i.toLong))
    assert(recall >= 8, s"recall $recall/10 too low: $found")
  }

  test("assignClusters: nearest centroid wins, equidistant ties take the lowest index") {
    val centroids = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0))
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),   // near centroid 0, d²=1
      (2L, Array(9.0f, 0.0f)),   // near centroid 1, d²=1
      (3L, Array(5.0f, 0.0f)))   // equidistant (25/25) -> cluster 0
      .toDF("vec_id", "embedding")
    val out = Similarity.assignClusters(df, "embedding", centroids)
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"), r.getAs[Double]("dist_sq")))
    assert(out.toSeq == Seq((1L, 0, 1.0), (2L, 1, 1.0), (3L, 0, 25.0)))
  }

  test("rankingMetrics: hand-computed precision/recall/MRR/NDCG") {
    // query qa: ranked docs 1,2,3; relevant {2,4}. hits=1 (doc 2 at rank 2)
    //   p@3 = 1/3, recall = 1/2, mrr = 1/2
    //   dcg = 1/log2(3); idcg = 1/log2(2) + 1/log2(3)  (min(k, n_rel)=2 terms)
    // query qb: ranked docs 5,6; relevant {5,6}: perfect  -> all 1.0
    val results = Seq(
      ("qa", 1L, 1), ("qa", 2L, 2), ("qa", 3L, 3),
      ("qb", 5L, 1), ("qb", 6L, 2)).toDF("q", "d", "r")
    val truth = Seq(("qa", 2L), ("qa", 4L), ("qb", 5L), ("qb", 6L)).toDF("q", "d")
    val out = Similarity.rankingMetrics(results, truth, "q", "d", "r", k = 3)
      .orderBy("query_id").collect()
    def quant(r: Int) = math.floor(1000000.0 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qa = out(0)
    assert((qa.getLong(1), qa.getLong(2)) == ((2L, 1L)))
    assert(qa.getDouble(3) == r6(1.0 / 3.0) && qa.getDouble(4) == 0.5 && qa.getDouble(5) == 0.5)
    assert(qa.getDouble(6) == r6(quant(2).toDouble / (quant(1) + quant(2)).toDouble))
    val qb = out(1)
    assert(qb.getDouble(3) == r6(2.0 / 3.0) && qb.getDouble(4) == 1.0 &&
      qb.getDouble(5) == 1.0 && qb.getDouble(6) == 1.0)
  }

  test("rankingMetrics closes the ANN eval loop: brute truth scores IVF at full recall") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 60).map(i => (i.toLong, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 4)
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 3)
      .select($"query_id", $"vec_id")
    val ivf = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", k = 3,
      nCells = 4, nProbe = 4)
    val m = Similarity.rankingMetrics(ivf, brute, "query_id", "vec_id", "rnk", k = 3)
      .orderBy("query_id").collect()
    // probing every cell makes IVF exact, so the harness must report perfect scores
    assert(m.forall(r => r.getAs[Double]("recall_at_k") == 1.0 &&
      r.getAs[Double]("ndcg_at_k") == 1.0), m.mkString(", "))
  }

  test("meanPoolEmbeddings averages per dimension in order") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f, 3.0f)),
      ("a", Array(3.0f, 2.0f, 1.0f)),
      ("b", Array(10.0f, 20.0f, 30.0f))).toDF("g", "vec")
    val out = graft.operators.Similarity.meanPoolEmbeddings(df, Seq("g"), "vec")
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) == Seq(2.0, 2.0, 2.0))
    assert(out(1).getSeq[Double](1) == Seq(10.0, 20.0, 30.0))
  }

  test("rrfFuse merges rankings by reciprocal rank and counts list membership") {
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val r2 = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(r1, r2), "id", "rank", k0 = 60)
      .orderBy(org.apache.spark.sql.functions.col("rrf_score").desc, org.apache.spark.sql.functions.col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // 10 and 20 are symmetric (ranks {1,2}): identical score, id breaks the tie
    val s12 = BigDecimal(1.0 / 61.0 + 1.0 / 62.0).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._1 == 10L && out(1)._1 == 20L)
    assert(math.abs(out(0)._2 - s12) < 1e-12 && math.abs(out(1)._2 - s12) < 1e-12)
    assert(out(0)._3 == 2L)
    // single-list tail: 30 (rank 3 in r1) and 40 (rank 3 in r2) tie as well
    assert(out.drop(2).map(_._1).toSeq == Seq(30L, 40L))
    assert(out.drop(2).forall(_._3 == 1L))
  }

  test("kCenterSample farthest-first picks one exemplar per planted cluster") {
    // three tight, well-separated clusters on one axis; quarter-exact
    // coordinates so the middle-cluster tie is EXACT in float/double
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.25f, 0.0f)), (3L, Array(0.5f, 0.0f)),
      (10L, Array(100.0f, 0.0f)), (11L, Array(100.25f, 0.0f)),
      (20L, Array(200.0f, 0.0f)), (21L, Array(200.25f, 0.0f))).toDF("id", "vec")
    val out = Similarity.kCenterSample(pts.repartition(3), "id", "vec", k = 3)
      .orderBy("selection_order").collect()
    // starts at min id, then the two far clusters before any near-dup
    assert(out(0).getLong(1) == 1L && out(0).isNullAt(2))
    assert(out(1).getLong(1) == 21L)  // farthest point overall (x=200.25)
    assert(out(2).getLong(1) == 10L)  // then the middle cluster (tie -> min id)
    // covering radius is non-increasing
    assert(out(1).getDouble(2) >= out(2).getDouble(2))
  }

  test("mmrRerank suppresses the duplicate until diversity is exhausted") {
    // two same-direction high-relevance vectors and one orthogonal slightly-lower one:
    // plain top-k would take both copies; MMR interleaves the orthogonal
    val cands = Seq(
      (1L, 10.0, Array(1.0f, 0.0f)),
      (2L, 9.9, Array(1.0f, 0.0f)),      // duplicate direction of 1
      (3L, 9.0, Array(0.0f, 1.0f))).toDF("id", "rel", "vec")
    val out = Similarity.mmrRerank(cands, "id", "rel", "vec", k = 3, lambda = 0.5)
      .orderBy("selection_order").collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 3L, 2L))
    val tooMany = Seq.tabulate(20)(i => (i.toLong, 1.0, Array(1.0f))).toDF("id", "rel", "vec")
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(tooMany, "id", "rel", "vec", k = 2, maxCandidates = 10)
    }
  }

  test("centroidSeparation: tight far clusters score ~1, planted stray flagged") {
    // label 0 near origin, label 1 near (10, 0); one label-0 stray sits at
    // (10, 1) — closer to centroid 1 by any measure
    val rows = Seq(
      (1L, 0, Array(0.0f, 0.1f)), (2L, 0, Array(0.1f, -0.1f)), (3L, 0, Array(-0.1f, 0.0f)),
      (4L, 1, Array(10.0f, 0.1f)), (5L, 1, Array(9.9f, -0.1f)), (6L, 1, Array(10.1f, 0.0f)),
      (7L, 0, Array(10.0f, 1.0f)))
    val out = Similarity.centroidSeparation(
        rows.toDF("vec_id", "label", "embedding").repartition(3),
        "vec_id", "embedding", "label")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val l0 = out(0); val l1 = out(1)
    assert(l0._2 == 4L && l1._2 == 3L)
    assert(l1._3 > 0.9, s"tight far cluster must score near 1, got ${l1._3}")
    assert(l0._4 == 1L, "the planted stray must be the one misassignment")
    assert(l1._4 == 0L)
    assert(l0._3 < l1._3, "the stray must drag label 0's average down")
  }

  test("pca keeps neighborhoods intact when the data IS low-rank") {
    // 30 vectors in an exact 2-D subspace of 8-d: PCA-2 is lossless, so
    // reduced-space cosine must reproduce full-space neighbors exactly
    val rows = (0 until 30).map { i =>
      val a = math.cos(i * 0.7).toFloat; val b = math.sin(i * 1.3).toFloat
      (i.toLong, Array(a, b, a + b, a - b, 2 * a, 2 * b, a + 2 * b, 2 * a - b))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(3)
    val m = Similarity.pcaFit(df, "embedding", dim = 8, k = 2)
    assert(m.explainedVariance(2) > 0.999999, "rank-2 data must be fully explained")
    val red = Similarity.pcaProjectAll(df, "embedding", m, roundTo = 9)
    // full-space vs reduced-space EUCLIDEAN nearest neighbor (the metric
    // projection preserves — pairwise distances are translation-invariant
    // under the centering, exact for rank <= k)
    def nn(vals: Array[(Long, Array[Double])], q: Long): Long = {
      val qv = vals.find(_._1 == q).get._2
      vals.filter(_._1 != q).minBy { case (id, v) =>
        (v.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum, id)
      }._1
    }
    val fullV = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val redV = red.select("vec_id", "pcs").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    (0L to 5L).foreach { q =>
      assert(nn(fullV, q) == nn(redV, q), s"neighbor of $q must survive reduction")
    }
  }

  test("pcaFit at production width: 64-d low-rank recall@10 is perfect") {
    // The 64-d tolerance-adaptive path q_pca_ann used to exercise before
    // its r14 pinned-rotation rescope: 80 vectors in an exact rank-4
    // subspace of 64-d, so PCA-4 reduced Euclidean top-10 must equal the
    // full-space top-10 for every probe (ties broken by id both sides).
    val rnd = new scala.util.Random(7)
    val basis = Array.fill(4, 64)(rnd.nextGaussian())
    val rows = (0 until 80).map { i =>
      val c = Array.tabulate(4)(j => rnd.nextGaussian() * (4.0 - j))
      val v = Array.tabulate(64)(d =>
        (0 until 4).map(j => c(j) * basis(j)(d)).sum.toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding").repartition(5)
    val m = Similarity.pcaFit(df, "embedding", dim = 64, k = 4)
    assert(m.explainedVariance(4) > 0.999999, "rank-4 data must be fully explained")
    val red = Similarity.pcaProjectAll(df, "embedding", m, roundTo = 9)
    def top10(vals: Array[(Long, Array[Double])], q: Long): Seq[Long] = {
      val qv = vals.find(_._1 == q).get._2
      vals.filter(_._1 != q).sortBy { case (id, v) =>
        (v.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum, id)
      }.take(10).map(_._1).toSeq
    }
    val fullV = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val redV = red.select("vec_id", "pcs").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    (0L to 7L).foreach { q =>
      val t = top10(fullV, q).toSet
      val r = top10(redV, q).toSet
      assert(t.intersect(r).size == 10, s"recall@10 of probe $q must be 1.0")
    }
  }

  test("jacobiEigen: exact decomposition of a known symmetric matrix") {
    val (evals, evecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = evals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-10 && math.abs(sorted(1) - 3.0) < 1e-10)
    // eigenvector for eigenvalue 3 is (1,1)/sqrt(2) up to sign
    val i3 = evals.indexWhere(e => math.abs(e - 3.0) < 1e-10)
    val v3 = Array(evecs(0)(i3), evecs(1)(i3))
    assert(math.abs(math.abs(v3(0)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(v3(0) - v3(1)) < 1e-10)
  }

  test("pcaFit/pcaProjectAll: planted anisotropic data recovers axes and scores") {
    // 4-d vectors: big variance along e0, small along e1, none along e2/e3
    val rows = Seq(-3f, -1f, 1f, 3f).zip(Seq(0.5f, -0.5f, -0.5f, 0.5f))
      .zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, Array(a, b, 0f, 0f))
      }
    val df = rows.toDF("vec_id", "embedding").repartition(3)
    val m = Similarity.pcaFit(df, "embedding", dim = 4, k = 2)
    // component 1 = ±e0, sign-normalized to +e0; component 2 = ±e1 -> +e1
    assert(math.abs(m.components(0)(0) - 1.0) < 1e-9)
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-9)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(math.abs(m.eigenvalues(0) - 5.0) < 1e-9)    // var of {-3,-1,1,3}
    assert(math.abs(m.eigenvalues(1) - 0.25) < 1e-9)   // var of {±0.5}
    assert(m.explainedVariance(2) > 0.999999)
    // scores are the centered coordinates along each axis
    val pcs = Similarity.pcaProjectAll(df, "embedding", m)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](2))
    assert(pcs.map(_.head).toSeq == Seq(-3.0, -1.0, 1.0, 3.0))
    assert(pcs.map(_(1)).toSeq == Seq(0.5, -0.5, -0.5, 0.5))
  }

  test("ivfTopKPinned: probed-cell candidates only, partition-invariant, recall<1 by design") {
    import spark.implicits._
    // 2-d toy space, 2 pinned centroids on the axes: vectors cluster by
    // dominant coordinate
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val rows = Seq(
      (0L, Array(1.0f, 0.1f)), (1L, Array(0.9f, 0.2f)), (2L, Array(0.8f, 0.05f)),
      (10L, Array(0.1f, 1.0f)), (11L, Array(0.2f, 0.9f)))
    val df = rows.toDF("vec_id", "embedding").repartition(3)
    val q = df.filter($"vec_id" === 0L)
    // nProbe=1: only cell-0 members are candidates — 10/11 invisible even
    // though their exact cosine is computable (the IVF recall contract)
    val got1 = Similarity.ivfTopKPinned(df, q, "vec_id", "embedding",
        k = 4, centroids = cents, nProbe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got1 == Set(1L, 2L), got1.toString)
    // nProbe=2 probes both cells: full candidate set
    val got2 = Similarity.ivfTopKPinned(df, q, "vec_id", "embedding",
        k = 4, centroids = cents, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 2L, 10L, 11L), got2.toString)
    // partitioning-invariant (pinned centroids, rounded cell ranking)
    val got7 = Similarity.ivfTopKPinned(df.repartition(7), q, "vec_id", "embedding",
        k = 4, centroids = cents, nProbe = 1)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getInt(3)))
    val base = Similarity.ivfTopKPinned(df, q, "vec_id", "embedding",
        k = 4, centroids = cents, nProbe = 1)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got7.toSeq == base.toSeq)
  }

  test("pcaFitReplay: recovers planted axes, partition-invariant, sweep-deterministic") {
    // same planted anisotropic data as the pcaFit spec: big variance along
    // e0, small along e1, none along e2/e3
    val rows = Seq(-3f, -1f, 1f, 3f).zip(Seq(0.5f, -0.5f, -0.5f, 0.5f))
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, Array(a, b, 0f, 0f)) }
    val df = rows.toDF("vec_id", "embedding").repartition(3)
    val m = Similarity.pcaFitReplay(df, "embedding", dim = 4, k = 2)
    assert(math.abs(m.components(0)(0) - 1.0) < 1e-9)
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-9)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    // projections reproduce the centered coordinates (termQuant-exact)
    val pcs = Similarity.pcaProjectReplay(df, "embedding", m)
      .orderBy("vec_id").collect().map(_.getSeq[Double](2))
    assert(pcs.map(_.head).toSeq == Seq(-3.0, -1.0, 1.0, 3.0))
    assert(pcs.map(_(1)).toSeq == Seq(0.5, -0.5, -0.5, 0.5))
    // bit-identical model under a different partitioning (the integer
    // sufficient statistics are order-free; the Jacobi schedule is fixed)
    val m2 = Similarity.pcaFitReplay(df.repartition(7), "embedding", dim = 4, k = 2)
    assert(m.means.toSeq == m2.means.toSeq)
    assert(m.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m.eigenvalues.toSeq == m2.eigenvalues.toSeq)
  }

  test("jacobiEigenReplay: fixed sweeps converge on a known matrix, V orthonormal") {
    val (evals, evecs) = Similarity.jacobiEigenReplay(
      Array(Array(2.0, 1.0, 0.0), Array(1.0, 2.0, 0.0), Array(0.0, 0.0, 5.0)),
      sweeps = 12)
    assert(evals.sorted.zip(Seq(1.0, 3.0, 5.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-10
    }, evals.toSeq.toString)
    // columns orthonormal
    val d = 3
    for { i <- 0 until d; j <- i until d } {
      val dot = (0 until d).map(r => evecs(r)(i) * evecs(r)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-12, s"($i,$j) dot=$dot")
    }
  }

  test("clusterQuality: two planted square blobs give CH=150, DB=0.2") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (0L, 2L), (2L, 0L), (2L, 2L),
      (10L, 10L), (10L, 12L), (12L, 10L), (12L, 12L)).toDF("x", "y")
    val cents = Seq((0, Seq(1L, 1L)), (1, Seq(11L, 11L)))
    val r = Similarity.clusterQuality(pts, Seq("x", "y"), cents).head
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("w_ss") == 16L) // 8 points at dist² = 2
    // B = 400 exactly ⇒ CH = (400/1)/(16/6) = 150
    assert(r.getAs[Double]("calinski_harabasz") == 150.0)
    // s = √2 both sides, d = √200 ⇒ DB = 2√2/√200 = 0.2
    assert(r.getAs[Double]("davies_bouldin") == 0.2)
  }

  test("semDeDup: drops the nearer-to-centroid member of an intra-cluster duplicate pair") {
    import spark.implicits._
    // cluster 0 centroid (1,0), cluster 1 centroid (0,1); vecs 1 and 2 are
    // near-parallel (cos ~ 0.9999) in cluster 0 — vec 1 sits closer to the
    // centroid, so it drops; vec 3 (cluster 1) has no in-cluster duplicate;
    // vec 4 is in cluster 0 but orthogonal-ish to 1/2
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f)),
      (2L, Array(0.9f, 0.012f)),
      (3L, Array(0.05f, 0.9f)),
      (4L, Array(0.6f, -0.6f))).toDF("id", "vec")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val out = Similarity.semDeDup(vecs, "id", "vec", cents, threshold = 0.95)
      .select("id", "cluster", "kept")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out(1L)._1 == 0 && out(2L)._1 == 0 && out(3L)._1 == 1 && out(4L)._1 == 0)
    assert(!out(1L)._2, "vec 1 is nearer the centroid than its duplicate 2 - dropped")
    assert(out(2L)._2 && out(3L)._2 && out(4L)._2, out.toString)
    // kept set is exactly the paper's rule; raising the threshold past the
    // pair similarity (cos(1,2) ~ 0.999994) keeps everything
    val all = Similarity.semDeDup(vecs, "id", "vec", cents, threshold = 1.0)
      .filter(org.apache.spark.sql.functions.col("kept")).count()
    assert(all == 4L)
  }

  test("jlProject: unit vector reads the sign grid; distances preserved on average") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def sign(i: Int, j: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_${j}".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
    // e_3 scaled by 2: proj_j must be exactly sign(3,j)·2/√k
    val dim = 16; val k = 4
    val unit = Seq((1L, Array.tabulate(dim)(i => if (i == 3) 2.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val up = Similarity.jlProject(unit, "vec_id", "embedding", dim, k)
      .head.getAs[scala.collection.Seq[Double]]("proj")
    (0 until k).foreach { j =>
      assert(up(j) == sign(3, j) * 2.0 / math.sqrt(k.toDouble), s"j=$j got ${up(j)}")
    }
    // deterministic corpus: squared distances preserved on average (JL
    // with k=16 is coarse per-pair; the MEAN ratio concentrates)
    val vecs = (0L until 12L).map(id =>
      (id, Array.tabulate(64)(i => math.sin(id * 7.0 + i).toFloat)))
      .toDF("vec_id", "embedding")
    val proj = Similarity.jlProject(vecs, "vec_id", "embedding", 64, 16)
    val both = vecs.join(proj, "vec_id")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding"),
        r.getAs[scala.collection.Seq[Double]]("proj")))
    val ratios = for {
      (i1, e1, p1) <- both; (i2, e2, p2) <- both if i1 < i2
    } yield {
      val d0 = math.sqrt(e1.zip(e2).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum)
      val d1 = math.sqrt(p1.zip(p2).map { case (a, b) => (a - b) * (a - b) }.sum)
      d1 / d0
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.75 && mean < 1.25, s"mean ratio $mean")
    assert(ratios.forall(r => r > 0.3 && r < 2.2), s"outlier ratio in ${ratios.toSeq}")
    // bit-identical across partitionings
    val p7 = Similarity.jlProject(vecs.repartition(7), "vec_id", "embedding", 64, 16)
      .orderBy("vec_id").collect().map(_.getAs[scala.collection.Seq[Double]]("proj"))
    val p1b = proj.orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("proj"))
    assert(p7.toSeq.map(_.toSeq) == p1b.toSeq.map(_.toSeq))
  }

  test("pqTopK: exact regime equals brute force; tiny shortlist still finds the cluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 48 vectors in 8 corner clusters of an 8-d cube (+ tiny per-id jitter);
    // ids 0..7 hit distinct corners so the 8-codeword sample codebook spans them
    def vec(i: Int): Array[Float] = {
      val corner = i % 8
      Array.tabulate(8)(j =>
        ((if (((corner >> (j % 3)) & 1) == 1) 10f else -10f) + 0.01f * (i / 8) * (j + 1)))
    }
    val corpus = (0 until 48).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 2)
    // rerank*k covers the whole corpus: the exact rerank must equal brute force
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
      k = 3, m = 2, codes = 8, rerank = 20)
      .orderBy("query_id", "rnk").collect()
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rnk").collect()
    assert(pq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Long]("rnk"))).toSeq ==
      brute.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Long]("rnk"))).toSeq)
    // genuinely approximate regime: shortlist of 3 still surfaces a
    // same-cluster neighbor at rank 1 (ADC ranks the right cells first)
    val tight = Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
      k = 1, m = 2, codes = 8, rerank = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    assert(tight(0L) % 8 == 0 && tight(1L) % 8 == 1,
      s"rank-1 neighbors must share the query's cluster: $tight")
  }

  test("pqTopK: fitted codebook strictly beats a degenerate first-rows codebook on recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 20 planted clusters x ~10 points in 8-d, but ids 0..15 ALL sit in
    // cluster 0 — a first-`codes`-rows-by-id codebook (the pre-r12
    // behavior) collapses to 16 near-identical codewords per subspace,
    // so ADC cannot separate anything and the shortlist degenerates to
    // tie-broken low ids. The fitted per-subspace k-means must recover
    // the planted structure.
    def center(c: Int): Array[Float] =
      Array.tabulate(8)(j => (((c * 31 + j * 17) % 40) - 20).toFloat)
    def vec(i: Int): Array[Float] = {
      val c = if (i < 16) 0 else i % 20
      val base = center(c)
      Array.tabulate(8)(j => base(j) + 0.02f * ((i % 7) + 1) * (j + 1))
    }
    val corpus = (0 until 200).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(21L, 42L, 63L, 84L, 105L))
    def hits(out: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val brute = hits(Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", k = 5).collect())
    def recall(got: Map[Long, Set[Long]]): Double =
      brute.map { case (q, b) =>
        got.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size
      }.sum / brute.size
    val fitted = recall(hits(Similarity.pqTopK(
      corpus, queries, "vec_id", "embedding", k = 5, m = 4, codes = 16, rerank = 2)
      .collect()))
    val first16 = corpus.orderBy(col("vec_id")).limit(16).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding"))
    val degenerateCents = Array.tabulate(4, 16) { (s, c) =>
      Array.tabulate(2)(j => first16(c)(s * 2 + j).toDouble)
    }
    val degenerate = recall(hits(Similarity.pqSearch(
      corpus, queries, "vec_id", "embedding", k = 5, rerank = 2, degenerateCents)
      .collect()))
    assert(fitted > degenerate,
      s"fitted recall $fitted must beat degenerate $degenerate")
    assert(fitted >= 0.9, s"fitted recall $fitted below 0.9")
  }

  test("clusterQuality: coincident centroids still report CH/WSS with DB null") {
    import spark.implicits._
    // every centroid pair has zero separation — Davies–Bouldin is undefined
    // (its ratio divides by the centroid distance) but the CH/WSS row must
    // survive with davies_bouldin NULL, not vanish
    val pts = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("x", "y")
    val cents = Seq((0, Seq(0L, 0L)), (1, Seq(0L, 0L)))
    val rows = Similarity.clusterQuality(pts, Seq("x", "y"), cents).collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    val r = rows.head
    assert(r.getAs[Long]("n") == 3L)
    assert(!r.isNullAt(r.fieldIndex("w_ss")))
    assert(r.isNullAt(r.fieldIndex("davies_bouldin")))
  }

  test("rocchioRerank: feedback moves the query — the top hit flips toward relevance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),   // the raw query itself
      (1L, Array(1.0f, 0.0f)),   // raw nearest
      (2L, Array(0.0f, 1.0f)),   // judged relevant
      (3L, Array(0.8f, 0.6f)))   // becomes nearest after expansion
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    // no feedback (empty): behaves like plain brute force — d1 wins
    val noFb = Seq.empty[(Long, Long, Boolean)].toDF("qid", "doc", "rel")
    val plain = Similarity.rocchioRerank(corpus, queries, noFb,
      "vec_id", "embedding", "qid", "doc", "rel", k = 1).head
    assert(plain.getAs[Long]("vec_id") == 1L)
    // relevant = d2: q' = (1, 0.75); cos(q', d3) = 1.0 > cos(q', d1) = 0.8
    val fb = Seq((0L, 2L, true)).toDF("qid", "doc", "rel")
    val moved = Similarity.rocchioRerank(corpus, queries, fb,
      "vec_id", "embedding", "qid", "doc", "rel", k = 3)
      .orderBy("rnk").collect()
    assert(moved.head.getAs[Long]("vec_id") == 3L, moved.mkString(","))
    assert(math.abs(moved.head.getAs[Double]("sim") - 1.0) < 1e-9)
    // pushing away from d1 keeps d3 on top and demotes d1 further
    val fb2 = Seq((0L, 2L, true), (0L, 1L, false)).toDF("qid", "doc", "rel")
    val pushed = Similarity.rocchioRerank(corpus, queries, fb2,
      "vec_id", "embedding", "qid", "doc", "rel", k = 3)
      .orderBy("rnk").collect()
    assert(pushed.head.getAs[Long]("vec_id") == 3L)
  }
}
