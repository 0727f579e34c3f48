package graft

import graft.operators.Topics

/** PLSA integer-EM topic model (X367): planted block structure must
  * separate, and the fit must be exactly reproducible. */
class TopicsSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: docs 0..19 speak {alpha beta}, docs
  // 20..39 speak {gamma delta} — PLSA with k=2 must put ~all of each
  // vocabulary's mass in one topic and assign the docs accordingly
  private def planted = (0L until 40L).map { i =>
    val words = if (i < 20) Seq("alpha", "beta") else Seq("gamma", "delta")
    (i, (Seq.fill(6)(words).flatten).mkString(" "))
  }.toDF("doc_id", "text")

  test("plsaFit separates a planted two-topic corpus") {
    val m = Topics.plsaFit(planted, "doc_id", "text", k = 2, rounds = 6)
    val wt = m.wordTopic.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // for each topic, its mass concentrates on ONE vocabulary block
    (0L to 1L).foreach { z =>
      val ab = wt((z, "alpha")) + wt((z, "beta"))
      val gd = wt((z, "gamma")) + wt((z, "delta"))
      val (hi, lo) = if (ab > gd) (ab, gd) else (gd, ab)
      assert(hi > 9000L && lo < 1000L,
        s"topic $z must concentrate on one block, got ab=$ab gd=$gd")
    }
    // the two topics pick DIFFERENT blocks
    val z0ab = wt((0L, "alpha")) + wt((0L, "beta"))
    val z1ab = wt((1L, "alpha")) + wt((1L, "beta"))
    assert((z0ab > 9000L) != (z1ab > 9000L), s"topics collapsed: $z0ab $z1ab")
    // dominant topics split the corpus exactly along the plant
    val doms = Topics.dominantTopic(m, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val firstBlock = doms.filter(_._1 < 20).values.toSet
    val secondBlock = doms.filter(_._1 >= 20).values.toSet
    assert(firstBlock.size == 1 && secondBlock.size == 1 &&
      firstBlock != secondBlock, s"doc assignment must follow the plant: $doms")
  }

  test("plsaFit is partition-invariant (pure integer arithmetic)") {
    val m1 = Topics.plsaFit(planted, "doc_id", "text", k = 2, rounds = 3)
    val m2 = Topics.plsaFit(planted.repartition(7), "doc_id", "text", k = 2, rounds = 3)
    val w1 = m1.wordTopic.orderBy("topic", "word").collect().toSeq
    val w2 = m2.wordTopic.orderBy("topic", "word").collect().toSeq
    assert(w1 == w2, "word-topic table must not depend on partitioning")
    val d1 = m1.docTopic.orderBy("doc_id", "topic").collect().toSeq
    val d2 = m2.docTopic.orderBy("doc_id", "topic").collect().toSeq
    assert(d1 == d2, "doc-topic table must not depend on partitioning")
  }

  test("plsaFit per-topic weights stay normalized after rounding") {
    val m = Topics.plsaFit(planted, "doc_id", "text", k = 2, rounds = 2)
    // each topic's word weights sum to ~scale (rounding slack < #words)
    m.wordTopic.groupBy("topic").sum("weight_q").collect().foreach { r =>
      val s = r.getLong(1)
      assert(math.abs(s - 10000L) <= 4L, s"topic ${r.getLong(0)} sums to $s")
    }
    m.docTopic.groupBy("doc_id").sum("weight_q").collect().foreach { r =>
      val s = r.getLong(1)
      assert(math.abs(s - 10000L) <= 2L, s"doc ${r.getLong(0)} sums to $s")
    }
  }
}
