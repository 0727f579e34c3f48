package graft

import graft.operators.TextAnalysis

/** Unigram-LM subword tokenizer (X365/X366): trainer + encoder on planted
  * corpora where the EM outcome is hand-checkable. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("trainUnigramLm learns the dominant multi-char piece on planted data") {
    // "abcabc" x10 + "abc" x5: the substring "abc" carries overwhelming
    // occurrence mass, so after EM it must survive pruning and both words
    // must segment into whole-"abc" pieces.
    val corpus = Seq(
      (Seq.fill(10)("abcabc") ++ Seq.fill(5)("abc")).mkString(" "))
      .toDF("text")
    val m = TextAnalysis.trainUnigramLm(corpus, "text",
      vocabSize = 4, seedSize = 12, maxPieceLen = 3, rounds = 3)
    val pieces = m.pieces.map(_._1)
    assert(pieces.contains("abc"), s"expected 'abc' kept, got $pieces")
    // chars always kept for coverage, even at vocabSize 4
    assert(Set("a", "b", "c").subsetOf(pieces.toSet), pieces.toString)
    // counts: "abc" lands on every best path -> 10*2 + 5*1 = 25
    val abc = m.pieces.find(_._1 == "abc").get
    assert(abc._2 == 25L, s"expected abc count 25, got ${abc._2}")
    val enc = TextAnalysis.unigramEncode(
      Seq((1L, "abcabc abc")).toDF("id", "text"), "id", "text", m)
      .collect().head
    assert(enc.getLong(1) == 3L, enc.toString) // [abc abc] [abc]
    assert(enc.getString(2) == "abc abc abc", enc.toString)
  }

  test("trainUnigramLm is partition-invariant and quantized-deterministic") {
    val docs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(3 + i % 4)(Seq("join", "joint", "point", "paint")(i % 4)).mkString(" ")))
      .toDF("doc_id", "text")
    val m1 = TextAnalysis.trainUnigramLm(docs, "text",
      vocabSize = 10, seedSize = 30, maxPieceLen = 4, rounds = 2)
    val m2 = TextAnalysis.trainUnigramLm(docs.repartition(7), "text",
      vocabSize = 10, seedSize = 30, maxPieceLen = 4, rounds = 2)
    assert(m1.pieces == m2.pieces, "model must not depend on partitioning")
    // every log-prob is an exact quantized long and the vocab is sorted
    assert(m1.pieces.map(_._1) == m1.pieces.map(_._1).sorted)
    assert(m1.pieces.forall(_._3 < 0L))
  }

  test("unigramEncode falls back to per-char pieces on unseen characters") {
    val corpus = Seq((Seq.fill(10)("abab").mkString(" "))).toDF("text")
    val m = TextAnalysis.trainUnigramLm(corpus, "text",
      vocabSize = 3, seedSize = 8, maxPieceLen = 2, rounds = 2)
    // "xy" shares no character with the training corpus: the encoder must
    // not throw, and must emit one piece per unseen char
    val out = TextAnalysis.unigramEncode(
      Seq((1L, "abab xy"), (2L, "")).toDF("id", "text"), "id", "text", m)
      .collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getString(2).endsWith("x y"), r1.toString)
    // empty doc: zero pieces, empty head
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getLong(1) == 0L && r2.getString(2) == "", r2.toString)
  }
}
