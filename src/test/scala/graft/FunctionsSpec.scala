package graft

import org.apache.spark.sql.functions._

import graft.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).head.getAs[T]("r")

  test("normalize_text strips accents, punctuation, 'public', hyphens; lowercases") {
    val out = Seq("Hôpital Général de Référence — Saint-Luc (public)!")
      .toDF("s")
      .select(normalize_text(col("s")))
      .head
      .getString(0)
    assert(out == "hopital general de reference  saint luc ")
  }

  test("normalize_text is null-safe and stable on ascii") {
    val rows = Seq(Some("Abc-Def"), None).toDF("s")
      .select(normalize_text(col("s"))).collect()
    assert(rows(0).getString(0) == "abc def")
    assert(rows(1).isNullAt(0))
  }

  test("uuid5 matches the public RFC 4122 name-based test vectors (DNS namespace)") {
    // vectors from the reference implementation of uuid.uuid5 (NAMESPACE_DNS)
    val expected = Map(
      "python.org" -> "886313e1-3b8a-5372-9b90-0c9aee199e5d",
      "example.com" -> "cfbff0d1-9375-5685-968c-48ce8b15ae17",
      "" -> "4ebd0208-8328-5d69-8c44-ec50939c0967",
      "Customer#000000001" -> "f8c57d8e-6beb-58c2-80bb-d12696183869",
      "café" -> "5e2e2331-a683-5e18-b56d-666e31574b41")
    val got = expected.keys.toSeq.toDF("name")
      .select(col("name"), uuid5(col("name")).as("id"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(got == expected)
  }

  test("uuid5 honors a non-default namespace (URL)") {
    val urlNs = "6ba7b811-9dad-11d1-80b4-00c04fd430c8"
    assert(eval1[String](uuid5(lit("python.org"), urlNs)) ==
      "7af94e2b-4dd9-50f0-9c9a-8a48519bdef0")
  }

  test("uuid5 is null-safe") {
    val rows = Seq(Some("x"), None).toDF("s").select(uuid5(col("s"))).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("uuid5_compact is the reference's hyphenless generate_org_unit_uuid form") {
    // reference utils.py:431 returns str(uuid.uuid5(...)).replace('-','')
    assert(eval1[String](uuid5_compact(lit("python.org"))) ==
      "886313e13b8a53729b900c9aee199e5d")
    assert(eval1[String](uuid5_compact(lit("python.org"))) ==
      eval1[String](uuid5(lit("python.org"))).replace("-", ""))
  }

  test("uuid5 rejects a malformed (non-hex) namespace instead of hashing garbage") {
    val ex = intercept[Exception] {
      eval1[String](uuid5(lit("x"), "zzzzzzzz-zzzz-zzzz-zzzz-zzzzzzzzzzzz"))
    }
    assert(ex.getMessage != null)
  }

  test("token_set_ratio: permutations of the same token set score 100") {
    assert(eval1[Int](token_set_ratio(lit("fuzzy wuzzy was a bear"), lit("bear a was wuzzy fuzzy"))) == 100)
  }

  test("token_set_ratio: subset scores 100 (set semantics)") {
    assert(eval1[Int](token_set_ratio(lit("fuzzy was a bear"), lit("fuzzy fuzzy was a bear"))) == 100)
  }

  test("token_set_ratio: disjoint strings score low") {
    assert(eval1[Int](token_set_ratio(lit("alpha beta"), lit("gamma delta"))) < 40)
  }

  test("token_set_sorted_ratio: subset 100, hand two-leg value, disjoint 0, empty edges") {
    // set semantics carry over from the full ratio: permutation + subset = 100
    assert(eval1[Int](token_set_sorted_ratio(
      lit("fuzzy wuzzy was a bear"), lit("bear a was wuzzy fuzzy"))) == 100)
    assert(eval1[Int](token_set_sorted_ratio(
      lit("fuzzy was a bear"), lit("fuzzy fuzzy was a bear"))) == 100)
    // hand value: inter={b}, diffA={a}, diffB={c d}: t0="b" (1), t1="b a" (3),
    // t2="b c d" (5) -> max(2/4, 2/6)*100 = 50
    assert(eval1[Int](token_set_sorted_ratio(lit("a b"), lit("b c d"))) == 50)
    // disjoint: intersection leg is empty, both ratios 0 (the full ratio's
    // LCS leg is exactly the piece this variant drops)
    assert(eval1[Int](token_set_sorted_ratio(lit("alpha beta"), lit("gamma delta"))) == 0)
    // both empty after tokenization: pinned 100
    assert(eval1[Int](token_set_sorted_ratio(lit("  "), lit(""))) == 100)
    // never exceeds the full ratio (the dropped leg only ever raises the max)
    val pairs = Seq(("spark join", "join table spark"), ("x y z", "z q"), ("", "a"))
    pairs.foreach { case (a, b) =>
      assert(eval1[Int](token_set_sorted_ratio(lit(a), lit(b))) <=
        eval1[Int](token_set_ratio(lit(a), lit(b))), s"($a, $b)")
    }
  }

  test("fix_mojibake repairs latin-1 and cp1252 mangling, unwinds double encoding, spares clean text") {
    val cases = Seq(
      // UTF-8 'é' (C3 A9) read as latin-1
      ("cafÃ©", "café"),
      // UTF-8 ’ (E2 80 99) read as cp1252: 0x80 is '€', 0x99 is '™'
      ("donâ€™t", "don’t"),
      // double-encoded é unwinds in two rounds
      ("cafÃÂ©", "café"),
      // genuine accented text re-encodes to INVALID utf-8 -> untouched
      ("café", "café"),
      // pure ascii untouched
      ("hello world", "hello world"),
      // emoji (astral, unmappable) -> untouched
      ("ok 😀", "ok 😀"))
    cases.foreach { case (in, expected) =>
      assert(eval1[String](fix_mojibake(lit(in))) == expected, s"input: $in")
    }
  }

  test("jaro_winkler matches the textbook vectors (Winkler 1990) and DuckDB exactly") {
    // pinned against DuckDB jaro_winkler_similarity (same floored
    // half-transpositions, 0.7 boost threshold, prefix cap 4)
    val cases = Seq(
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("xyzw", "xyzw_suffix_very_long_here", 0.8307692307692308), // prefix capped at 4
      ("appel", "applé", 0.8755555555555556), // non-ascii compares as UTF-8 bytes ('applé' = 6)
      ("abc", "abc", 1.0))
    cases.foreach { case (a, b, expected) =>
      assert(eval1[Double](jaro_winkler(lit(a), lit(b))) == expected, s"$a / $b")
    }
  }

  test("jaro_winkler applies the prefix bonus only above the 0.7 boost threshold") {
    // jaro('ab','az') = 2/3 <= 0.7: shared prefix earns nothing
    assert(eval1[Double](jaro_winkler(lit("ab"), lit("az"))) == 2.0 / 3.0)
    assert(eval1[Double](jaro_sim(lit("ab"), lit("az"))) == 2.0 / 3.0)
  }

  test("jaro transpositions floor (rapidfuzz convention); empty sides score 0") {
    // 3 mismatched matched-positions -> floor(3/2) = 1 transposition
    assert(eval1[Double](jaro_sim(lit("abcdef"), lit("bcadef"))) == 0.9444444444444445)
    assert(eval1[Double](jaro_sim(lit(""), lit("abc"))) == 0.0)
    assert(eval1[Double](jaro_sim(lit(""), lit(""))) == 0.0)
    // null-safe
    val r = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("simhash64: near-identical docs are close in hamming, unrelated far") {
    val d1 = "the quick brown fox jumps over the lazy dog in the morning sun"
    val d2 = "the quick brown fox jumps over the lazy cat in the morning sun"
    val d3 = "completely different words about database query optimization plans"
    val near = eval1[Int](hamming64(simhash64(lit(d1)), simhash64(lit(d2))))
    val far = eval1[Int](hamming64(simhash64(lit(d1)), simhash64(lit(d3))))
    assert(near < far)
    assert(near <= 8)
  }

  test("minhash_sig: identical docs share the whole signature; near docs most of it") {
    val d1 = "a b c d e f g h i j k l m n o p"
    val d2 = "a b c d e f g h i j k l m n o q"
    val sig1 = Seq(1).toDF("x").select(minhash_sig(lit(d1), 64, 3).as("s")).head.getSeq[Long](0)
    val sig1b = Seq(1).toDF("x").select(minhash_sig(lit(d1), 64, 3).as("s")).head.getSeq[Long](0)
    val sig2 = Seq(1).toDF("x").select(minhash_sig(lit(d2), 64, 3).as("s")).head.getSeq[Long](0)
    assert(sig1 == sig1b)
    val agree = sig1.zip(sig2).count { case (a, b) => a == b }
    assert(agree > 32, s"only $agree/64 hashes agree for near-duplicates")
  }

  test("ngram_jaccard: exact values on hand-computable shingle sets") {
    // k=1 token shingles: {a,b,c} vs {b,c,d} -> 2/4
    assert(eval1[Double](ngram_jaccard(lit("a b c"), lit("b c d"), 1)) == 0.5)
    assert(eval1[Double](ngram_jaccard(lit("a b c"), lit("a b c"), 2)) == 1.0)
    assert(eval1[Double](ngram_jaccard(lit("a b"), lit("c d"), 1)) == 0.0)
  }

  test("fingerprint_set: deterministic, sorted, subset-stable") {
    val text = "one two three four five six seven eight nine ten"
    val fp1 = Seq(1).toDF("x").select(fingerprint_set(lit(text), 3, 4).as("f")).head.getSeq[Long](0)
    val fp2 = Seq(1).toDF("x").select(fingerprint_set(lit(text), 3, 4).as("f")).head.getSeq[Long](0)
    assert(fp1 == fp2)
    assert(fp1 == fp1.sorted)
    assert(fp1.nonEmpty)
  }

  test("deterministic_id equals md5 of the lowercased trimmed key") {
    val out = Seq("  Customer#42 ").toDF("s").select(deterministic_id(col("s"))).head.getString(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("customer#42".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == expected)
  }

  test("multi_replace applies replacements in order") {
    val out = Seq("aa bb").toDF("s")
      .select(multi_replace(col("s"), Seq("aa" -> "bb", "bb" -> "cc")))
      .head.getString(0)
    // first aa->bb turns the string into "bb bb", then bb->cc hits both
    assert(out == "cc cc")
  }

  test("standardize_label: first matching contains-key wins, default otherwise") {
    val c = standardize_label(col("s"), Seq("Fem" -> "F", "Masc" -> "M"), "NA")
    val out = Seq("Feminin", "Masculin", "???").toDF("s").select(c).collect().map(_.getString(0))
    assert(out.toSeq == Seq("F", "M", "NA"))
  }

  test("cosine_sim_float matches the higher-order cosine_sim bit-for-bit") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 2.0f))).toDF("a", "b")
    val Array(hof, native) = df
      .select(cosine_sim(col("a"), col("b")), cosine_sim_float(col("a"), col("b")))
      .head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(hof == native)
  }

  test("lsh_sig: deterministic and within bit range") {
    val df = Seq(Tuple1(Array(0.5f, -1.0f, 2.0f, 0.1f))).toDF("v")
    val s1 = df.select(lsh_sig(col("v"), 0, 12)).head.getLong(0)
    val s2 = df.select(lsh_sig(col("v"), 0, 12)).head.getLong(0)
    val other = df.select(lsh_sig(col("v"), 1, 12)).head.getLong(0)
    assert(s1 == s2)
    assert(s1 >= 0 && s1 < (1L << 12))
    assert(other >= 0 && other < (1L << 12))
  }

  test("l2_normalize produces unit vectors, zero vectors pass through") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("id", "vec")
      .select(org.apache.spark.sql.functions.col("id"),
        graft.functions.l2_normalize(org.apache.spark.sql.functions.col("vec")).as("u"))
      .orderBy("id").collect()
    assert(df(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(df(1).getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("damerau_levenshtein: unrestricted semantics (DuckDB-verified vectors)") {
    // expected values cross-checked against DuckDB damerau_levenshtein
    val cases = Seq(
      ("CA", "ABC", 2),          // the unrestricted-vs-OSA separator (OSA says 3)
      ("ab", "ba", 1),
      ("kitten", "sitting", 3),
      ("abcdef", "abcfad", 3),
      ("", "abc", 3),
      ("aa", "", 2),
      ("same", "same", 0),
      ("a cat", "an act", 2))
    val df = cases.zipWithIndex.map { case ((a, b, _), i) => (i, a, b) }.toDF("i", "a", "b")
    val got = df.select(col("i"), damerau_levenshtein(col("a"), col("b")).as("d"))
      .orderBy("i").collect().map(_.getInt(1))
    assert(got.toSeq == cases.map(_._3), s"got ${got.toSeq}")
    // never exceeds plain Levenshtein; SQL surface registered
    val lev = df.select(levenshtein(col("a"), col("b"))).orderBy().collect()
    val viaSql = spark.sql(
      "SELECT graft_damerau_levenshtein('CA', 'ABC')").head().getInt(0)
    assert(viaSql == 2)
  }

  test("gram_clip_stats: word grams — hand clip/tot/ref values, multiplicity clipping") {
    // cand "the cat the cat sat", ref "the cat the dog": unigrams
    // clip = min counts per token: the(2), cat(1), sat(0), +dog unmatched = 3
    val got = Seq(("the cat the cat sat", "the cat the dog")).toDF("c", "r")
      .select(gram_clip_stats(col("c"), col("r"), 1, 2, word = true).as("s"))
      .head.getSeq[Long](0)
    assert(got == Seq(3L, 5L, 4L, 2L, 4L, 3L),
      s"got $got") // bigrams: "the cat"(min(2,1)=1) + "cat the"(min(1,1)=1)
  }

  test("gram_clip_stats: char grams strip spaces, lowercase, code-point windows") {
    // chrF convention: "ab cd" -> "abcd"; bigrams abcd: {ab, bc, cd}
    val got = Seq(("AB cd", "zab CD")).toDF("c", "r")
      .select(gram_clip_stats(col("c"), col("r"), 2, 2, word = false).as("s"))
      .head.getSeq[Long](0)
    // cand bigrams {ab,bc,cd} vs ref "zabcd" {za,ab,bc,cd}: clip 3, tot 3, ref 4
    assert(got == Seq(3L, 3L, 4L), s"got $got")
    // astral chars count as ONE code point (🎉 = U+1F389, 2 UTF-16 units)
    val astral = Seq(("a🎉b", "🎉b")).toDF("c", "r")
      .select(gram_clip_stats(col("c"), col("r"), 1, 2, word = false).as("s"))
      .head.getSeq[Long](0)
    // unigrams: a,🎉,b vs 🎉,b -> clip 2 tot 3 ref 2; bigrams: a🎉,🎉b vs 🎉b -> clip 1 tot 2 ref 1
    assert(astral == Seq(2L, 3L, 2L, 1L, 2L, 1L), s"got $astral")
  }

  test("gram_clip_stats: short/empty texts yield zero-count orders; null propagates") {
    val short = Seq(("ab", "ab")).toDF("c", "r")
      .select(gram_clip_stats(col("c"), col("r"), 1, 3, word = false).as("s"))
      .head.getSeq[Long](0)
    assert(short == Seq(2L, 2L, 2L, 1L, 1L, 1L, 0L, 0L, 0L), s"got $short")
    // empty string in WORD mode is one empty token (split(" ", -1) twin)
    val emptyWord = Seq(("", "")).toDF("c", "r")
      .select(gram_clip_stats(col("c"), col("r"), 1, 1, word = true).as("s"))
      .head.getSeq[Long](0)
    assert(emptyWord == Seq(1L, 1L, 1L), s"got $emptyWord")
    val withNull = Seq((Some("ab"), None: Option[String])).toDF("c", "r")
      .select(gram_clip_stats(col("c"), col("r"), 1, 1, word = false).as("s"))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("gram_clip_stats matches the explode/join formulation on real corpus text") {
    // cross-check the kernel against the independent per-n SQL-HOF plan it
    // replaced, on a slice of the documents table (both sides non-trivial)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(40)
    val pairs = docs.as("c")
      .join(docs.as("r"), col("r.doc_id") === col("c.doc_id") + 1)
      .select(col("c.doc_id").as("id"), col("c.text").as("cand"),
        col("r.text").as("ref"))
    val n = 3
    def gramCounts(t: String, cn: String) = pairs
      .select(col("id"), regexp_replace(lower(col(t)), " ", "").as("__t"))
      .select(col("id"),
        explode(when(length(col("__t")) >= n,
          transform(sequence(lit(1), length(col("__t")) - (n - 1)),
            i => col("__t").substr(i, lit(n))))
          .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as(cn))
    val viaJoin = gramCounts("cand", "cc")
      .join(gramCounts("ref", "cr"), Seq("id", "g"), "full_outer")
      .agg(
        sum(least(coalesce(col("cc"), lit(0L)), coalesce(col("cr"), lit(0L)))),
        sum(coalesce(col("cc"), lit(0L))),
        sum(coalesce(col("cr"), lit(0L))))
      .head
    val viaKernel = pairs
      .select(gram_clip_stats(col("cand"), col("ref"), n, n, word = false).as("s"))
      .agg(sum(element_at(col("s"), 1)), sum(element_at(col("s"), 2)),
        sum(element_at(col("s"), 3)))
      .head
    assert(viaKernel == viaJoin, s"kernel $viaKernel vs join $viaJoin")
  }
}
