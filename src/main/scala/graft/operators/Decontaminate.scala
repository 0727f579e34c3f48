package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** Test-set decontamination: find (and drop) training documents that share
  * word n-grams with a benchmark/eval corpus — the standard guard against
  * benchmark leakage in LLM training-data pipelines.
  *
  * Scale shape (the reason this is not just an n-gram join): the training
  * side is the 100 TB side. A Bloom filter over the benchmark's n-grams —
  * built distributed on the SMALL side, shipped to every task — prefilters
  * exploded training n-grams map-side inside whole-stage codegen, so the
  * only rows that reach the (broadcast) verification join are Bloom
  * survivors: true hits plus an `fpp` sliver of false positives. The exact
  * equality join then removes the false positives, so results are EXACT —
  * the sketch only buys the zero-shuffle discard of the overwhelmingly
  * clean majority. One tiny shuffle total (the per-doc aggregate of
  * contaminated rows).
  */
object Decontaminate {

  /** Lowercased word `n`-grams of `text` as an array column. Tokenization is
    * a plain single-space split (bit-for-bit reproducible in any engine);
    * docs shorter than `n` tokens yield an empty array, null text null
    * (identical once exploded, which every call site does). Delegates to
    * the native [[graft.functions.TextOps.wordNgrams]] — one codegen'd
    * static call per row, not an interpreted HOF lambda per gram. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    graft.functions.word_ngrams(text, n)
  }

  /** Distinct benchmark n-grams — the small side of the verification join. */
  private def benchGrams(bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    bench
      .select(explode(wordNgrams(col(benchTextCol), n)).as("__gram"))
      .distinct()

  /** Per-document contamination report over `train`: documents sharing at
    * least one word `n`-gram with `bench`, with hit counts.
    *
    * Output: (idCol, n_hits, n_distinct_hits) — `n_hits` counts every
    * contaminated n-gram occurrence, `n_distinct_hits` the distinct shared
    * grams. Clean documents are absent.
    *
    * `expectedBenchGrams`/`fpp` size the Bloom sketch; they affect only the
    * prefilter's selectivity, never the result. Building the sketch is one
    * bounded action on the benchmark side (small by contract).
    */
  def contaminationReport(
      train: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 4,
      expectedBenchGrams: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val grams = benchGrams(bench, benchTextCol, n)
    val bloom = grams.stat.bloomFilter("__gram", expectedBenchGrams, fpp)
    val bloomBytes = {
      val bos = new ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val mightContain =
      GraftSql.column(BloomMightContain(GraftSql.expression(col("__gram")), bloomBytes))
    train
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("__gram"))
      .filter(mightContain)
      .join(broadcast(grams), "__gram")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_hits"),
        count_distinct(col("__gram")).as("n_distinct_hits"))
  }

  /** Corpus-level n-gram overlap between two snapshots — the "how much new
    * content does this crawl actually add" measurement run before merging
    * dumps: distinct word n-grams per side, one co-partitioned full outer
    * join on the gram value (gram-keyed, scales with vocabulary not corpus
    * size), reduced to a single row of counts + Jaccard. */
  def corpusOverlap(
      a: DataFrame,
      aTextCol: String,
      b: DataFrame,
      bTextCol: String,
      n: Int = 3): DataFrame = {
    val ga = benchGrams(a, aTextCol, n).withColumn("__a", lit(1))
    val gb = benchGrams(b, bTextCol, n).withColumn("__b", lit(1))
    ga.join(gb, Seq("__gram"), "full_outer")
      .agg(
        count(col("__a")).as("grams_a"),
        count(col("__b")).as("grams_b"),
        count(when(col("__a").isNotNull && col("__b").isNotNull, lit(1))).as("grams_shared"),
        round(
          count(when(col("__a").isNotNull && col("__b").isNotNull, lit(1))).cast("double") /
            count(lit(1)), 6).as("jaccard"))
  }

  /** NEAR-DUPLICATE decontamination: training documents whose
    * whole-document similarity to ANY eval document crosses
    * `jaccardThreshold` — the published companion to exact n-gram overlap
    * (the GPT-3-appendix-style guard: paraphrased or lightly edited eval
    * leakage that exact 13-gram matching misses). MinHash bands on BOTH
    * corpora, cross-corpus candidate join on (band, band_key) — a
    * co-partitioned equality join, never a cartesian; the train side never
    * shuffles more than its banded keys — then the exact n-gram Jaccard
    * verify on candidates only, with the (small by contract) eval text
    * broadcast. Same recall math as [[Dedup.minHashLsh]]: a qualifying
    * pair escapes with probability (1-j^r)^bands.
    *
    * Returns (train_id, eval_id, jaccard) — one row per contaminated
    * (train doc, eval doc) pair at or above the threshold. */
  def nearDupContamination(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleK: Int = 3,
      jaccardThreshold: Double = 0.7): DataFrame = {
    val tb = Dedup.minHashBands(train, trainIdCol, trainTextCol, numHashes, bands, shingleK)
      .select(col(trainIdCol).as("train_id"), col("band"), col("band_key"))
    val eb = Dedup.minHashBands(bench, benchIdCol, benchTextCol, numHashes, bands, shingleK)
      .select(col(benchIdCol).as("eval_id"), col("band"), col("band_key"))
    val candidates = tb.join(broadcast(eb), Seq("band", "band_key"))
      .select("train_id", "eval_id")
      .distinct()
    candidates
      .join(train.select(col(trainIdCol).as("train_id"), col(trainTextCol).as("__tt")), "train_id")
      .join(
        broadcast(bench.select(col(benchIdCol).as("eval_id"), col(benchTextCol).as("__et"))),
        "eval_id")
      .withColumn("jaccard", graft.functions.ngram_jaccard(col("__tt"), col("__et"), shingleK))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("train_id"), col("eval_id"), col("jaccard"))
  }

  /** `train` minus contaminated documents (left-anti on the report ids). */
  def decontaminate(
      train: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 4,
      expectedBenchGrams: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame =
    train.join(
      contaminationReport(train, idCol, textCol, bench, benchTextCol, n, expectedBenchGrams, fpp)
        .select(col(idCol)),
      Seq(idCol),
      "left_anti")

  /** Combined decontamination report — BOTH leakage modalities against one
    * eval corpus in ONE plan, with a per-document verdict (the release
    * audit a training run actually wants; the GPT-3 appendix lesson is
    * that exact n-gram overlap and whole-document near-duplication catch
    * DIFFERENT leaks, so a pipeline that runs only one ships the other):
    * [[contaminationReport]]'s bloom-prefiltered exact n-gram hits and
    * [[nearDupContamination]]'s MinHash-blocked verified Jaccard, joined
    * per train document. Verdict precedence: `near_dup` (whole-document
    * paraphrase, the stronger signal) > `exact_overlap` (≥ `minExactHits`
    * distinct leaked n-grams) > `clean`.
    *
    * One row per TRAIN document: (id, exact_hits, max_jaccard,
    * n_near_matches, verdict); both modality plans keep their own scale
    * shapes (bench-bounded broadcasts, band-blocked candidates). */
  def decontaminationSuite(
      train: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int = 4,
      minExactHits: Long = 5L,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleK: Int = 3,
      jaccardThreshold: Double = 0.7): DataFrame = {
    require(minExactHits >= 1, s"minExactHits must be >= 1, got $minExactHits")
    val exact = contaminationReport(train, idCol, textCol, bench, benchTextCol, n)
      .select(col(idCol), col("n_distinct_hits"))
    val near = nearDupContamination(train, idCol, textCol,
        bench, benchIdCol, benchTextCol, numHashes, bands, shingleK,
        jaccardThreshold)
      .groupBy(col("train_id"))
      .agg(max(col("jaccard")).as("__maxj"), count(lit(1)).as("__nn"))
      .withColumnRenamed("train_id", idCol)
    train.select(col(idCol))
      .join(exact, Seq(idCol), "left")
      .join(near, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_distinct_hits"), lit(0L)).as("exact_hits"),
        round(col("__maxj"), 6).as("max_jaccard"),
        coalesce(col("__nn"), lit(0L)).as("n_near_matches"),
        when(col("__maxj").isNotNull, "near_dup")
          .when(coalesce(col("n_distinct_hits"), lit(0L)) >= minExactHits,
            "exact_overlap")
          .otherwise("clean").as("verdict"))
  }
}
