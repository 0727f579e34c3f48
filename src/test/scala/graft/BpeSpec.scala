package graft

import org.apache.spark.sql.functions._

import graft.functions.{bpe_token_count, bpe_tokens}
import graft.operators.TextAnalysis

/** Real word-level BPE: trainer + encoder, pinned to the hand-computed
  * merges of the classic Sennrich et al. (2016) example corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word frequencies: low*5 lower*2 newest*6 widest*3 (the paper's example)
  private val corpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("trainBpeMerges learns the hand-computed merge sequence with deterministic ties") {
    val merges = TextAnalysis.trainBpeMerges(corpus, "text", numMerges = 4)
    // pair counts round 1: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 ... ;
    // ties break pair-ascending: "e s" < "s t", then "es t"=9 dominates,
    // then (l,o)=7 ties (o,w)=7 -> "l o", then (lo,w)=7.
    assert(merges === Seq("e s", "es t", "l o", "lo w"))
  }

  test("bpe_tokens applies ranked merges greedily per word") {
    val merges = Seq("e s", "es t", "l o", "lo w")
    val got = Seq("lowest", "low low wider", "newest")
      .toDF("text")
      .select(bpe_tokens(col("text"), merges).as("toks"))
      .as[Seq[String]]
      .collect()
    // "lowest": l o w e s t -> es -> est -> lo -> low => [low, est]
    assert(got(0) === Seq("low", "est"))
    // unseen word "wider" only matches partial merges (no 'w i' rank)
    assert(got(1) === Seq("low", "low", "w", "i", "d", "e", "r"))
    assert(got(2) === Seq("n", "e", "w", "est"))
  }

  test("bpe_token_count shrinks as merges grow and floors at word count") {
    val text = Seq("newest newest lowest").toDF("text")
    val none = text.select(bpe_token_count(col("text"), Seq("x y")).as("n")).as[Long].head()
    assert(none === 18L) // pure characters
    val four = text.select(
      bpe_token_count(col("text"), Seq("e s", "es t", "l o", "lo w")).as("n")).as[Long].head()
    assert(four === 10L) // n e w est | n e w est | low est
  }

  test("maxVocab caps the collected dictionary at the top words by count") {
    // top-2 words by (count desc, word asc) = newest(6), low(5): training on
    // the capped dictionary must equal training on just those words
    val capped = TextAnalysis.trainBpeMerges(corpus, "text", numMerges = 4, maxVocab = 2)
    val manual = TextAnalysis.trainBpeMerges(
      Seq((Seq.fill(6)("newest") ++ Seq.fill(5)("low")).mkString(" ")).toDF("text"),
      "text", numMerges = 4)
    assert(capped === manual)
    assert(capped !== TextAnalysis.trainBpeMerges(corpus, "text", numMerges = 4))
  }

  test("minWordCount drops rare words from the dictionary before training") {
    // lower(2) is dropped at minWordCount=3; remaining corpus = low*5
    // newest*6 widest*3
    val got = TextAnalysis.trainBpeMerges(corpus, "text", numMerges = 4, minWordCount = 3)
    val manual = TextAnalysis.trainBpeMerges(
      Seq((Seq.fill(5)("low") ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
        .mkString(" ")).toDF("text"),
      "text", numMerges = 4)
    assert(got === manual)
  }

  test("trainer stops early when no pair reaches minPairCount") {
    val tiny = Seq("ab cd").toDF("text")
    val merges = TextAnalysis.trainBpeMerges(tiny, "text", numMerges = 10, minPairCount = 2)
    assert(merges.isEmpty)
  }

  test("encoder round-trips: concatenated tokens rebuild each word") {
    val merges = TextAnalysis.trainBpeMerges(corpus, "text", numMerges = 4)
    val words = Seq("lowest", "newest", "widest", "low").toDF("w")
    val ok = words
      .select(col("w"), array_join(bpe_tokens(col("w"), merges), "").as("rebuilt"))
      .filter(col("w") =!= col("rebuilt"))
      .count()
    assert(ok === 0L)
  }
}
