package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Topic modeling — the corpus-structure member of the text-analysis
  * family (what is this corpus ABOUT, per document and per term), kept
  * deliberately in the engine-replayable regime.
  *
  * [[plsaFit]] is PLSA (Hofmann 1999, the EM ancestor of LDA) with every
  * quantity an exact quantized LONG: deterministic hash init, E-step
  * posteriors and M-step normalizations all integer arithmetic with ONE
  * explicit round-half-up division rdiv(x, y) = (2x + y) div (2y) — no
  * transcendental anywhere (stronger than the ln-quantization gates:
  * nothing here can diverge by an ulp), so the fitted model replays
  * bit-for-bit in any SQL engine as unrolled-round joins + aggregates.
  * Documented divergence from Hofmann: posteriors quantize to 1e4 before
  * the M-step (hard-rounded EM) — the fixpoint differs from float EM by
  * < 1e-4 per cell but is exactly reproducible.
  *
  * Scale shape: the (doc, word) count table shuffles ONCE and
  * checkpoints; each round is (a) one broadcast join of the V×K
  * word-topic table (folded to z-ordered k-vectors per word) + one
  * co-partitioned join of the doc-topic k-vectors on d alone (r14: the
  * former (d, z) join shuffled the token-type rows k-fanned, and the
  * posterior denominator cost a (d, w) window — both are now per-row
  * array folds over the k-vectors, same integer ops in the same order),
  * (b) two partial aggregates (V×K and D×K grains) off the positionally
  * re-exploded posterior arrays. The doc-topic state NEVER
  * collects — it stays sharded by doc (D×K rows), which is what makes
  * this run at corpus scale; only the vocabulary-sized word-topic table
  * broadcasts. Long-sum bound: corpus tokens × 1e8 must stay under 2^63
  * (≈ 9e10 tokens) — beyond that, swap the M-step sums to decimal(38,0)
  * (documented, not needed at any test SF).
  */
object Topics {

  /** Round-half-up integer division of non-negative longs:
    * rdiv(x, y) = (2x + y) div (2y) — a native IntegralDivide, never
    * double `/` (which loses exactness past 2^53). */
  private def rdiv(x: Column, y: Column): Column = {
    import org.apache.spark.sql.GraftSql
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    GraftSql.column(IntegralDivide(
      GraftSql.expression(x * 2 + y), GraftSql.expression(y * 2)))
  }

  /** 60-bit md5 prefix of a string column — the repo's engine-portable
    * hash idiom (matches `('0x' || substr(md5(s), 1, 15))::BIGINT`). */
  private def md5_60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  final case class PlsaModel(wordTopic: DataFrame, docTopic: DataFrame)

  /** Fit PLSA by quantized integer EM. `idCol` must be integral (the
    * doc-topic init hashes it arithmetically so any engine replays it).
    * Returns word-topic (topic, word, weight_q — per-topic weights
    * summing ≈ scale) and doc-topic (idCol, topic, weight_q — per-doc). */
  def plsaFit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      rounds: Int = 4,
      scale: Long = 10000L): PlsaModel = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val s2 = scale // posterior quantization shares the weight scale
    val counts = df
      .select(col(idCol).cast("long").as("d"),
        explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("d"), col("w"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val zs = (0 until k).map(z => lit(z.toLong))
    val zcol = explode(array(zs: _*)).as("z")
    // deterministic init: word side from the md5-60 idiom, doc side from
    // a pure-arithmetic mix of (doc id, topic) — both engine-portable
    val vocab = counts.select(col("w")).distinct()
    val a0 = vocab.select(col("w"), zcol)
      .withColumn("a0",
        lit(1L) + pmod(md5_60(concat(col("w"), lit("#"), col("z"))), lit(1000L)))
    val aTot0 = a0.groupBy(col("z")).agg(sum(col("a0")).as("__t"))
    var wordTopic = a0.join(aTot0, "z")
      .select(col("z"), col("w"), rdiv(col("a0") * scale, col("__t")).as("a"))
      .localCheckpoint(true)
    val docs = counts.select(col("d")).distinct()
    val b0 = docs.select(col("d"), zcol)
      .withColumn("b0",
        lit(1L) + pmod(col("d") * 2654435761L + col("z") * 40503L, lit(1000L)))
    val bTot0 = b0.groupBy(col("d")).agg(sum(col("b0")).as("__t"))
    var docTopic = b0.join(bTot0, "d")
      .select(col("d"), col("z"), rdiv(col("b0") * scale, col("__t")).as("b"))
      .localCheckpoint(true)
    val nVocab = lit(vocab.count()) // bounded: vocabulary-scale scalar
    // E-step in ARRAY form (r14): the states fold to one z-ordered
    // k-vector per word / per doc, so each round joins `counts` ONCE on d
    // (un-fanned — the (d, z) equi-join shuffled k× the token-type rows)
    // and the posterior denominator is a per-row array fold instead of a
    // (d, w) window (one more k-fanned shuffle, now gone). All arithmetic
    // is the SAME integer ops in the same per-(d,w,z) order — u = a·b,
    // den = Σ_z u, rz = rdiv(u·s2, den) — so the fit is bit-identical;
    // the M-step below re-derives the row grain by posexplode (position
    // IS the topic id, arrays being z-sorted).
    def zArr(df: DataFrame, keyC: String, valC: String): DataFrame =
      df.groupBy(col(keyC)).agg(
        transform(
          array_sort(collect_list(struct(col("z"), col(valC)))),
          p => p.getField(valC)).as("__vs"))
    var r = 0
    while (r < rounds) {
      val wa = zArr(wordTopic, "w", "a").withColumnRenamed("__vs", "__as")
      val db = zArr(docTopic, "d", "b").withColumnRenamed("__vs", "__bs")
      val e = counts
        .join(broadcast(wa), "w")
        .join(db, "d")
        .withColumn("u", zip_with(col("__as"), col("__bs"), (a, b) => a * b))
        .withColumn("den", aggregate(col("u"), lit(0L), (acc, x) => acc + x))
        .withColumn("c",
          when(col("den") > 0,
            transform(col("u"), x => col("n") * rdiv(x * s2, col("den"))))
            .otherwise(array_repeat(col("n") * rdiv(lit(s2), lit(k.toLong)), k)))
        .select(col("d"), col("w"), col("c"))
        .localCheckpoint(true)
      val nw = e
        .select(col("w"), posexplode(col("c")).as(Seq("z", "__c")))
        .groupBy(col("z").cast("long").as("z"), col("w"))
        .agg(sum(col("__c")).as("nw"))
      val dz = nw.groupBy(col("z")).agg(sum(col("nw")).as("dzv"))
      wordTopic = nw.join(dz, "z")
        .select(col("z"), col("w"),
          when(col("dzv") > 0, rdiv(col("nw") * scale, col("dzv")))
            .otherwise(rdiv(lit(scale), nVocab)).as("a"))
        .localCheckpoint(true)
      val nd = e
        .select(col("d"), posexplode(col("c")).as(Seq("z", "__c")))
        .groupBy(col("d"), col("z").cast("long").as("z"))
        .agg(sum(col("__c")).as("nd"))
      val ndTot = nd.groupBy(col("d")).agg(sum(col("nd")).as("__t"))
      docTopic = nd.join(ndTot, "d")
        .select(col("d"), col("z"),
          when(col("__t") > 0, rdiv(col("nd") * scale, col("__t")))
            .otherwise(rdiv(lit(scale), lit(k.toLong))).as("b"))
        .localCheckpoint(true)
      r += 1
    }
    PlsaModel(
      wordTopic.select(col("z").as("topic"), col("w").as("word"),
        col("a").as("weight_q")),
      docTopic.select(col("d").as(idCol), col("z").as("topic"),
        col("b").as("weight_q")))
  }

  /** Dominant topic per document from a fitted model: argmax weight,
    * ties to the smallest topic id (max_by on (weight, −topic) — total
    * order, engine-deterministic). */
  def dominantTopic(model: PlsaModel, idCol: String): DataFrame =
    model.docTopic
      .groupBy(col(idCol))
      .agg(max(struct(col("weight_q"), (-col("topic")).as("__nt"))).as("__m"))
      .select(col(idCol),
        (-col("__m.__nt")).as("topic"),
        col("__m.weight_q").as("weight_q"))
}
