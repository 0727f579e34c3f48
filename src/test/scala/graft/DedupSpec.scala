package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the sun " +
    "rises slowly over the quiet green valley near the old stone bridge"
  private val nearDup = base.replace("quiet", "calm") // one-token change
  private val unrelated = "database systems use cost based optimizers to choose join " +
    "orders and access paths for declarative relational queries at scale"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base), (5L, "  THE QUICK" + base.drop(9))
  ).toDF("doc_id", "text")

  test("exact dedup groups byte-identical (normalized) texts") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id").collect()
    // doc 1 and 4 identical; doc 5 differs only by case/leading space -> same key
    val m = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m(1L) == 3L) // docs 1, 4, 5 collapse
    assert(m(2L) == 1L)
    assert(m(3L) == 1L)
  }

  test("minHashLsh surfaces the planted near-duplicate pair and not unrelated docs") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", jaccardThreshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minHashBands emits exactly `bands` rows per doc") {
    val banded = Dedup.minHashBands(docs, "doc_id", "text", numHashes = 64, bands = 16)
    val counts = banded.groupBy("doc_id").count().collect().map(_.getLong(1)).distinct
    assert(counts.toSeq == Seq(16L))
  }

  test("simHashCandidates pairs near-duplicates within the hamming budget") {
    val out = Dedup.simHashCandidates(docs, "doc_id", "text", maxHamming = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out.contains((1L, 2L)))
    assert(!out.exists { case (a, b) => Set(a, b) == Set(1L, 3L) })
  }

  test("clusters assigns each connected component its minimum id") {
    val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L), (8L, 9L), (7L, 8L)).toDF("id1", "id2")
    val out = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("clusters converges on a long chain within maxIter") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val out = Dedup.clusters(chain, maxIter = 12).collect().map(_.getLong(1)).distinct
    assert(out.toSeq == Seq(1L))
  }

  test("clusters throws loudly instead of returning silently split clusters") {
    // a 30-link chain cannot finish label propagation in 3 rounds — the
    // r10 convergence contract: under-convergence is an error, not output
    val chain = (1L until 31L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalStateException](Dedup.clusters(chain, maxIter = 3))
    assert(e.getMessage.contains("did not converge"))
  }

  test("ngramJaccardTopK ranks the near-duplicate first for its query") {
    val top = Dedup.ngramJaccardTopK(docs, docs.filter($"doc_id" === 2L), "doc_id", "text", k = 2)
      .orderBy("rnk")
      .head
    assert(top.getLong(1) == 1L || top.getLong(1) == 4L) // base text docs
    assert(top.getDouble(2) > 0.7)
  }

  test("dropNearDuplicates keeps one representative per planted cluster, others untouched") {
    val base = "spark catalyst tungsten shuffle partition broadcast join aggregate window stream"
    val docs = Seq(
      (1L, base),                       // cluster {1,2,3} -> keep 1
      (2L, base + " extra"),
      (3L, "prefix " + base),
      (10L, "completely different words about training data pipelines at scale"),
      (11L, "another unrelated document with its own vocabulary entirely"))
      .toDF("id", "text")
    val kept = graft.operators.Dedup.dropNearDuplicates(docs, "id", "text",
      jaccardThreshold = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 10L, 11L), s"got $kept")
  }

  test("containmentJoin: directional quote detection matches brute force") {
    // doc 1 is fully quoted inside doc 2 (plus extra text); doc 3 unrelated;
    // doc 4 == doc 1 verbatim (mutual containment 1.0)
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, quote),
      (2L, s"intro words here $quote and a long tail of additional commentary follows now"),
      (3L, "completely different vocabulary about ships and harbors and tides"),
      (4L, quote)).toDF("id", "text")
    val got = graft.operators.Dedup.containmentJoin(docs, "id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over shingle sets
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val m = Map(1L -> sh(quote), 2L -> sh(s"intro words here $quote and a long tail of additional commentary follows now"),
      3L -> sh("completely different vocabulary about ships and harbors and tides"), 4L -> sh(quote))
    val want = (for {
      a <- m.keys; b <- m.keys if a != b
      c = m(a).intersect(m(b)).size.toDouble / m(a).size if c >= 0.8
    } yield (a, b, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got == want, s"got $got want $want")
    // directionality: 1 in 2 but NOT 2 in 1
    assert(got.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!got.exists(p => p._1 == 2L && p._2 == 1L))
  }

  test("containmentJoin: maxTokenDf bounds hot-shingle fanout, keeps rare-token pairs") {
    // every doc shares the same boilerplate shingles (corpus-wide hot
    // tokens); docs 1/2 additionally share a rare quote. Uncapped, the
    // boilerplate token indexes every doc; capped at df<=3 the hot tokens
    // drop from candidate generation but the rare-evidence pair survives.
    val boiler = "standard legal disclaimer text here"
    val quote = "rare alpha beta gamma delta epsilon"
    val docs = (3L to 12L).map(i => (i, s"$boiler unique$i filler$i words$i"))
      .toSeq :+ (1L, s"$boiler $quote") :+ (2L, s"$boiler $quote extra tail words appended")
    val dfDocs = docs.toDF("id", "text")
    val capped = graft.operators.Dedup.containmentJoin(
      dfDocs, "id", "text", threshold = 0.5, maxTokenDf = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the rare-quote containment pair survives the cap in both directions
    // that clear the threshold
    assert(capped.contains((1L, 2L)), s"got $capped")
    // boilerplate-only pairs (e.g. 3-4) carried ONLY hot-token evidence and
    // are dropped by the cap — bounded fanout instead of all-pairs
    assert(!capped.exists(p => p._1 >= 3L && p._2 >= 3L), s"got $capped")
    // sanity: uncapped finds the same rare pair (the cap only removes
    // hot-token-evidence pairs, never adds)
    val uncapped = graft.operators.Dedup.containmentJoin(
      dfDocs, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)))
    assert(capped.subsetOf(uncapped), s"capped $capped uncapped $uncapped")
  }

  test("duplicateFlowMatrix: planted cross-source pairs, canonical cells, means") {
    import graft.operators.Dedup
    // two identical docs across sources A/B, two identical within C, one loner
    val docs = Seq(
      (1L, "A", "w1 w2 w3 w4 w5 w6"),
      (2L, "B", "w1 w2 w3 w4 w5 w6"),
      (3L, "C", "x1 x2 x3 x4 x5 x6"),
      (4L, "C", "x1 x2 x3 x4 x5 x6"),
      (5L, "A", "totally different content here now ok"))
      .toDF("id", "src", "text")
    val out = Dedup.duplicateFlowMatrix(docs.repartition(3), "id", "text",
      "src", threshold = 0.7)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("A", "B", 1L, 1.0), ("C", "C", 1L, 1.0)),
      out.mkString(","))
  }
}
