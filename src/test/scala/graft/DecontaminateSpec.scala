package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, TextAnalysis}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: sliding word windows, short docs empty") {
    val out = Seq("a b c d", "a b", "").toDF("text")
      .select(Decontaminate.wordNgrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
    assert(out(2).isEmpty)
  }

  test("contaminationReport finds planted n-gram overlap exactly") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val train = Seq(
      (10L, "we saw the quick brown fox jumps yesterday"), // 2 hits: 2 distinct 4-grams
      (11L, "nothing shared here at all today friends"),
      (12L, "quick brown fox jumps quick brown fox jumps")) // 1 distinct gram, 2 occurrences
      .toDF("id", "text")
    val rep = Decontaminate.contaminationReport(train, "id", "text", bench, "text", n = 4)
      .orderBy("id").collect()
    assert(rep.toSeq == Seq(Row(10L, 2L, 2L), Row(12L, 2L, 1L)))
  }

  test("bloom prefilter never drops a true hit (agrees with exact join) and FPs are removed") {
    // tiny bloom (high FP pressure) + larger corpus: results must still equal
    // the pure exact-join formulation — the sketch is a prefilter, not the answer
    val bench = (0 until 20).map(i => (i.toLong, s"bench phrase number $i alpha beta gamma")).toDF("id", "text")
    val train = (0 until 200).map { i =>
      val text =
        if (i % 7 == 0) s"leading words bench phrase number ${i % 20} alpha beta gamma trailing"
        else s"clean document $i with no shared grams at all $i"
      (1000L + i, text)
    }.toDF("id", "text")
    val viaBloom = Decontaminate
      .contaminationReport(train, "id", "text", bench, "text", n = 4,
        expectedBenchGrams = 8, fpp = 0.5) // deliberately undersized sketch
      .orderBy("id").collect().toSeq
    val benchGrams = bench
      .select(explode(Decontaminate.wordNgrams(col("text"), 4)).as("g")).distinct()
    val exact = train
      .select(col("id"), explode(Decontaminate.wordNgrams(col("text"), 4)).as("g"))
      .join(benchGrams, "g")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"), count_distinct(col("g")).as("n_distinct_hits"))
      .orderBy("id").collect().toSeq
    assert(viaBloom == exact)
    assert(viaBloom.nonEmpty)
  }

  test("nearDupContamination catches verbatim and lightly-edited eval leakage, skips clean docs") {
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the quiet river bank today")
    ).toDF("eval_id", "text")
    val train = Seq(
      // verbatim copy: jaccard 1.0, certain LSH hit
      (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      // light edit (one word changed): high jaccard, the paraphrase case
      (2L, "the quick brown fox jumps over the lazy dog near the quiet river shore today"),
      // shares words but not 3-gram structure: must NOT be flagged
      (3L, "dog lazy the over jumps fox brown quick the bank river quiet near today the"),
      (4L, "completely unrelated text about training data pipelines at scale"))
      .toDF("doc_id", "text")
    val out = Decontaminate.nearDupContamination(
      train, "doc_id", "text", evalSet, "eval_id", "text", jaccardThreshold = 0.5)
      .orderBy("train_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._3 == 1.0)
    assert(out(1)._3 >= 0.5 && out(1)._3 < 1.0)
    assert(out.forall(_._2 == 100L))
  }

  test("decontaminate drops exactly the contaminated docs") {
    val bench = Seq((1L, "one two three four five")).toDF("id", "text")
    val train = Seq(
      (10L, "zz one two three four yy"),
      (11L, "totally different words entirely here now")).toDF("id", "text")
    val clean = Decontaminate.decontaminate(train, "id", "text", bench, "text", n = 4)
      .select("id").as[Long].collect().toSeq
    assert(clean == Seq(11L))
  }

  test("duplicateNgramStats: hand-computed fractions") {
    // doc 1: tokens a b a b a -> 2-grams: "a b","b a","a b","b a" =
    //   4 grams, 2 distinct -> dup_ngram_fraction = 0.5; every gram is a
    //   repeat (both distinct grams occur twice) -> dup_char_fraction = 1.0
    // doc 2: all 2-grams unique -> 0.0 fractions
    // doc 3: one token -> no grams -> absent
    val df = Seq(
      (1L, "a b a b a"),
      (2L, "p q r s"),
      (3L, "solo")).toDF("id", "text")
    val out = TextAnalysis.duplicateNgramStats(df, "id", "text", n = 2)
      .orderBy("id").collect()
    assert(out.toSeq == Seq(
      Row(1L, 4L, 0.5, 1.0),
      Row(2L, 3L, 0.0, 0.0)))
  }

  test("corpusOverlap: hand-computed gram counts and jaccard") {
    import org.apache.spark.sql.Row
    val a = Seq((1L, "x y z w")).toDF("id", "text")   // grams: "x y z", "y z w"
    val b = Seq((2L, "y z w v")).toDF("id", "text")   // grams: "y z w", "z w v"
    val out = graft.operators.Decontaminate.corpusOverlap(a, "text", b, "text", n = 3).head
    assert(out == Row(2L, 2L, 1L, 0.333333))
  }

  test("decontaminationSuite: verdict precedence on planted leak shapes") {
    val bench = Seq((100L, "a b c d e f g h")).toDF("eval_id", "text")
    val train = Seq(
      (1L, "a b c d e f g h"),                           // identical -> near_dup
      (2L, "x y a b c d e f g h z w q r s t u v"),       // all 5 grams, low jaccard
      (3L, "a b c d e q1 q2 q3 q4"),                     // 2 grams only
      (4L, "completely different words here now"))       // untouched
      .toDF("doc_id", "text")
    val out = Decontaminate.decontaminationSuite(
      train.repartition(3), "doc_id", "text", bench, "eval_id", "text",
      n = 4, minExactHits = 5L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((1L, 5L, 1.0, 1L, "near_dup")), out.mkString(","))
    assert(out(1)._1 == 2L && out(1)._2 == 5L && out(1)._5 == "exact_overlap")
    assert(out(1)._3 == -1.0, "low-jaccard doc must not carry a near-dup score")
    assert(out(2) == ((3L, 2L, -1.0, 0L, "clean")))
    assert(out(3) == ((4L, 0L, -1.0, 0L, "clean")))
  }
}
