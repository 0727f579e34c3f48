package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

import graft.functions.{CmsOps, KllOps, TextOps, ThetaOps, VectorOps}

/** SQL-surface registration for graft's native expressions.
  *
  * Activate either programmatically (`SparkSession.builder.withExtensions(new
  * GraftExtensions)` — [[GraftSession]] does this) or via config
  * (`spark.sql.extensions=graft.GraftExtensions`), the standard Spark
  * extension mechanism. Every function lowers to the same `StaticInvoke`
  * expression as the Scala API in [[graft.functions]] — codegen'd, no UDF
  * registry, identical semantics in SQL and DataFrame code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def static(
      target: Class[_],
      method: String,
      dt: DataType)(args: Seq[Expression]): Expression =
    StaticInvoke(target, dt, method, args, propagateNull = true, returnNullable = false)

  private def fn(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo("graft.GraftExtensions", name, usage), builder)

  /** Extract a required literal-integer argument with a clear analysis-time
    * error: validates arity and foldability, accepts INT/BIGINT/SMALLINT/
    * TINYINT literals (SQL integer literals may arrive as any of these). */
  private def intArg(fname: String, args: Seq[Expression], i: Int, what: String): Int = {
    if (args.length <= i)
      throw new IllegalArgumentException(
        s"$fname: missing argument ${i + 1} ($what) — expected a literal integer")
    val e = args(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fname: argument ${i + 1} ($what) must be a literal integer, got non-foldable ${e.sql}")
    e.eval() match {
      case x: java.lang.Integer => x.intValue
      case x: java.lang.Long    => x.intValue
      case x: java.lang.Short   => x.intValue
      case x: java.lang.Byte    => x.intValue
      case other => throw new IllegalArgumentException(
        s"$fname: argument ${i + 1} ($what) must be a literal integer, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the native top-k-per-key physical operator
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // optimizer extension: user-written row_number()<=k window filters plan
    // to the native operator automatically
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    val longArray = ArrayType(LongType, containsNull = false)
    Seq(
      fn("graft_normalize_text", "accent-strip + sanitize + casefold",
        static(TextOps.getClass, "normalize", StringType)),
      fn("graft_token_set_ratio", "fuzzy token-set similarity in [0,100]",
        static(TextOps.getClass, "tokenSetRatio", IntegerType)),
      fn("graft_simhash64", "64-bit Charikar SimHash of whitespace tokens",
        static(TextOps.getClass, "simhash64", LongType)),
      fn("graft_hamming64", "hamming distance of two 64-bit hashes",
        static(TextOps.getClass, "hamming64", IntegerType)),
      fn("graft_minhash_sig", "MinHash signature (array<bigint>) over word shingles",
        static(TextOps.getClass, "minhashSig", longArray)),
      fn("graft_ngram_jaccard", "exact word k-shingle Jaccard similarity",
        static(TextOps.getClass, "ngramJaccard", DoubleType)),
      fn("graft_fingerprints", "winnowing fingerprint set (sorted array<bigint>)",
        static(TextOps.getClass, "fingerprints", longArray)),
      fn("graft_uuid5", "RFC 4122 name-based UUID v5 of (namespace_uuid, name)",
        static(TextOps.getClass, "uuid5", StringType)),
      fn("graft_uuid5_compact", "hyphenless uuid5 (reference generate_org_unit_uuid form)",
        static(TextOps.getClass, "uuid5Compact", StringType)),
      fn("graft_cosine_sim", "cosine similarity of two array<float> vectors",
        static(VectorOps.getClass, "cosineSim", DoubleType)),
      fn("graft_lsh_sig", "random-hyperplane LSH signature of an array<float> vector",
        static(VectorOps.getClass, "lshSig", LongType)),
      fn("graft_heavy_hitters", "Misra-Gries heavy hitters of a string column: array<struct<item,count_lo>>",
        args => graft.functions.MisraGries(args(0), intArg("graft_heavy_hitters", args, 1, "k"))),
      fn("graft_top_rows", "bounded top-k (score,id) leaderboard aggregate: array<struct<score,id>>",
        args => graft.functions.TopRowsAgg(args(0), args(1), intArg("graft_top_rows", args, 2, "k"))),
      fn("graft_shingle_set", "sorted distinct word k-shingle hash set (array<bigint>)",
        static(TextOps.getClass, "shingleSet", longArray)),
      fn("graft_word_ngrams", "positional word n-grams of lower(text), single-space split (array<string>)",
        static(TextOps.getClass, "wordNgrams", ArrayType(StringType, containsNull = false))),
      fn("graft_sorted_jaccard", "Jaccard of two sorted array<bigint> sets (merge pass)",
        static(TextOps.getClass, "sortedJaccard", DoubleType)),
      fn("graft_bpe_tokens", "word-level BPE encode against a ranked merge table (array<string>)",
        static(TextOps.getClass, "bpeTokens", ArrayType(StringType, containsNull = false))),
      fn("graft_fix_mojibake", "repair UTF-8-as-latin1/cp1252 mojibake, conservative ftfy-style",
        static(TextOps.getClass, "fixMojibake", StringType)),
      fn("graft_damerau_levenshtein", "unrestricted Damerau-Levenshtein distance (DuckDB-compatible)",
        static(TextOps.getClass, "damerauLevenshtein", IntegerType)),
      fn("graft_geohash", "standard base-32 geohash of (lat, lon, precision)",
        static(graft.operators.Spatial.getClass, "geohash", StringType)),
      fn("graft_jaro_sim", "Jaro similarity in [0,1] (DuckDB-compatible edges)",
        static(TextOps.getClass, "jaroSim", DoubleType)),
      fn("graft_jaro_winkler", "Jaro-Winkler similarity in [0,1] (prefix<=4, 0.7 boost threshold)",
        static(TextOps.getClass, "jaroWinkler", DoubleType)),
      fn("graft_kll_sketch", "mergeable KLL quantile sketch (binary) of a double column, k = arg 2",
        args => graft.functions.KllSketchAgg(args(0), intArg("graft_kll_sketch", args, 1, "k"))),
      fn("graft_kll_merge", "merge a binary KLL sketch column (rollup), k = arg 2",
        args => graft.functions.KllMergeAgg(args(0), intArg("graft_kll_merge", args, 1, "k"))),
      fn("graft_kll_quantiles", "quantile estimates (array<double>) of a binary KLL sketch at array<double> ranks",
        static(KllOps.getClass, "kllQuantiles", ArrayType(DoubleType))),
      fn("graft_kll_n", "exact stream length a binary KLL sketch has absorbed",
        static(KllOps.getClass, "kllN", LongType)),
      fn("graft_cms_sketch", "mergeable Count-Min frequency sketch (binary) of a string column: depth, width, seed = args 2-4",
        args => graft.functions.CmsSketchAgg(args(0),
          intArg("graft_cms_sketch", args, 1, "depth"),
          intArg("graft_cms_sketch", args, 2, "width"),
          intArg("graft_cms_sketch", args, 3, "seed"))),
      fn("graft_cms_merge", "merge a binary CMS column (rollup): depth, width, seed = args 2-4",
        args => graft.functions.CmsMergeAgg(args(0),
          intArg("graft_cms_merge", args, 1, "depth"),
          intArg("graft_cms_merge", args, 2, "width"),
          intArg("graft_cms_merge", args, 3, "seed"))),
      fn("graft_cms_estimate", "estimated occurrence count of a string item in a binary CMS",
        static(CmsOps.getClass, "cmsEstimate", LongType)),
      fn("graft_cms_total", "exact occurrences a binary CMS has absorbed",
        static(CmsOps.getClass, "cmsTotal", LongType)),
      fn("graft_theta_sketch", "mergeable theta sketch (binary) of a long/string column, lgK = arg 2",
        args => graft.functions.ThetaSketchAgg(args(0), intArg("graft_theta_sketch", args, 1, "lgK"))),
      fn("graft_theta_merge", "union-merge a binary theta sketch column (rollup), lgK = arg 2",
        args => graft.functions.ThetaUnionAgg(args(0), intArg("graft_theta_merge", args, 1, "lgK"))),
      fn("graft_theta_estimate", "distinct estimate of a binary theta sketch (exact below nominal k)",
        static(ThetaOps.getClass, "thetaEstimate", DoubleType)),
      fn("graft_theta_intersect", "A intersect B of two binary theta sketches, as a sketch",
        static(ThetaOps.getClass, "thetaIntersect", BinaryType)),
      fn("graft_theta_anotb", "A minus B of two binary theta sketches, as a sketch",
        static(ThetaOps.getClass, "thetaAnotb", BinaryType)),
      fn("graft_theta_union_pair", "A union B of two binary theta sketches, as a sketch",
        static(ThetaOps.getClass, "thetaUnionPair", BinaryType)),
      fn("graft_cms_inner", "join-size estimate: min-row inner product of two same-shape binary CMS",
        static(CmsOps.getClass, "cmsInnerProduct", LongType)),
      fn("graft_pav_fit", "PAV isotonic fit of array<struct<x:bigint,y:bigint>>: flat [x, fit, ...] doubles",
        static(graft.functions.VectorOps.getClass, "pavFit",
          ArrayType(DoubleType, containsNull = false))),
      fn("graft_dtw", "exact integer DTW distance between two array<bigint> series (-1 when empty)",
        static(graft.functions.VectorOps.getClass, "dtwDistance", LongType)),
    ).foreach { case (ident, info, builder) => ext.injectFunction((ident, info, builder)) }
  }
}
