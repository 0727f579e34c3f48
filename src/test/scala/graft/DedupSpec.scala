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
}
