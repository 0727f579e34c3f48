package graft

class ExtensionsSpec extends SparkSpec {

  test("graft functions are callable from plain SQL") {
    val row = spark.sql(
      """SELECT graft_normalize_text('Hôpital Général') AS norm,
        |       graft_token_set_ratio('a b c', 'c b a') AS tsr,
        |       graft_hamming64(graft_simhash64('x y z'), graft_simhash64('x y z')) AS ham,
        |       graft_ngram_jaccard('a b c', 'b c d', 1) AS jac
        |""".stripMargin).head
    assert(row.getString(0) == "hopital general")
    assert(row.getInt(1) == 100)
    assert(row.getInt(2) == 0)
    assert(row.getDouble(3) == 0.5)
  }

  test("SQL and DataFrame APIs produce identical values") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val viaSql = spark.sql("SELECT graft_simhash64('the quick brown fox')").head.getLong(0)
    val viaDf = spark.range(1)
      .select(simhash64(lit("the quick brown fox"))).head.getLong(0)
    assert(viaSql == viaDf)
  }

  test("uuid5 SQL surface: canonical and reference-compact forms agree") {
    val row = spark.sql(
      """SELECT graft_uuid5('6ba7b810-9dad-11d1-80b4-00c04fd430c8', 'python.org') AS canon,
        |       graft_uuid5_compact('6ba7b810-9dad-11d1-80b4-00c04fd430c8', 'python.org') AS compact
        |""".stripMargin).head
    assert(row.getString(0) == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
    assert(row.getString(1) == row.getString(0).replace("-", ""))
  }

  test("array-typed SQL functions work on vector literals") {
    val sim = spark.sql(
      "SELECT graft_cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float)))")
      .head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
    val sig = spark.sql(
      "SELECT graft_lsh_sig(array(cast(0.5 as float), cast(-1.0 as float)), 0, 8)").head.getLong(0)
    assert(sig >= 0 && sig < 256)
  }

  test("r5 SQL surface: shingle sets, sorted jaccard, BPE encode") {
    val row = spark.sql(
      """SELECT graft_sorted_jaccard(graft_shingle_set('a b c d', 3),
        |                            graft_shingle_set('a b c d', 3)) AS self_jac,
        |       graft_bpe_tokens('lowest', array('e s', 'es t', 'l o', 'lo w')) AS toks
        |""".stripMargin).head
    assert(row.getDouble(0) == 1.0)
    assert(row.getSeq[String](1) == Seq("low", "est"))
  }

  test("jaro similarity functions via SQL") {
    val row = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw, graft_jaro_sim('abcdef', 'bcadef') AS j").head
    assert(row.getDouble(0) == 0.9611111111111111)
    assert(row.getDouble(1) == 0.9444444444444445)
  }

  test("graft_heavy_hitters aggregates via SQL") {
    import spark.implicits._
    Seq("a", "a", "b", "a", "c").toDF("w").createOrReplaceTempView("hh_in")
    val out = spark.sql(
      "SELECT explode(graft_heavy_hitters(w, 8)) AS e FROM hh_in")
      .selectExpr("e.item", "e.count_lo").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test("graft_top_rows aggregates via SQL") {
    import spark.implicits._
    Seq((1.0, 10L), (5.0, 11L), (3.0, 12L), (5.0, 9L)).toDF("v", "id")
      .createOrReplaceTempView("tr_in")
    val out = spark.sql(
      "SELECT explode(graft_top_rows(v, id, 3)) AS e FROM tr_in")
      .selectExpr("e.score", "e.id").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((5.0, 9L), (5.0, 11L), (3.0, 12L)))
  }

  test("graft_kll sketch/merge/readout via SQL") {
    import spark.implicits._
    Seq.tabulate(1000)(i => (s"g${i % 2}", i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_in")
    val cube = spark.sql(
      "SELECT g, graft_kll_sketch(v, 200) AS kll FROM kll_in GROUP BY g")
    cube.createOrReplaceTempView("kll_cube")
    val out = spark.sql(
      """SELECT graft_kll_n(m) AS n, graft_kll_quantiles(m, array(0.5d)) AS q
         FROM (SELECT graft_kll_merge(kll, 200) AS m FROM kll_cube)""").head()
    assert(out.getLong(0) == 1000L)
    val median = out.getSeq[Double](1).head
    // KLL rank error at k=200 is ~1.65%; the true median of 0..999 is ~500
    assert(math.abs(median - 500.0) <= 30.0, s"median estimate $median")
  }

  test("graft_cms sketch/merge/estimate/total via SQL") {
    import spark.implicits._
    Seq.tabulate(600)(i => (s"g${i % 3}", s"w${i % 6}")).toDF("g", "w")
      .createOrReplaceTempView("cms_in")
    spark.sql(
      "SELECT g, graft_cms_sketch(w, 5, 8192, 42) AS sk FROM cms_in GROUP BY g")
      .createOrReplaceTempView("cms_cube")
    val out = spark.sql(
      """SELECT graft_cms_total(m) AS total, graft_cms_estimate(m, 'w3') AS est
         FROM (SELECT graft_cms_merge(sk, 5, 8192, 42) AS m FROM cms_cube)""").head()
    assert(out.getLong(0) == 600L)
    assert(out.getLong(1) == 100L) // exact in the no-collision regime
    // join-size advisor: every w occurs 100/group -> inner product of two
    // single-group sketches over the same 6 words = 6 * 200*200... use
    // two distinct groups: each has 200 rows, words w0..w5 uniformly
    val inner = spark.sql(
      """SELECT graft_cms_inner(a.sk, b.sk) AS est
         FROM (SELECT sk FROM cms_cube WHERE g = 'g0') a,
              (SELECT sk FROM cms_cube WHERE g = 'g1') b""").head().getLong(0)
    // g0 holds w0,w3 (100 each); g1 holds w1,w4 — disjoint words -> 0?
    // i%3 groups vs i%6 words: g0 has w0,w3; g1 has w1,w4 -> no overlap
    assert(inner == 0L, s"disjoint word sets must give 0, got $inner")
    val innerSelf = spark.sql(
      """SELECT graft_cms_inner(a.sk, a.sk) AS est
         FROM (SELECT sk FROM cms_cube WHERE g = 'g0') a""").head().getLong(0)
    assert(innerSelf == 2L * 100 * 100, s"self inner product = sum f^2, got $innerSelf")
  }

  test("graft_pav_fit via SQL") {
    val out = spark.sql(
      """SELECT graft_pav_fit(array(
           named_struct('x', 1L, 'y', 1L), named_struct('x', 2L, 'y', 3L),
           named_struct('x', 3L, 'y', 2L), named_struct('x', 4L, 'y', 4L))) AS f""")
      .head().getSeq[Double](0)
    assert(out == Seq(1.0, 1.0, 2.0, 2.5, 3.0, 2.5, 4.0, 4.0))
  }

  test("graft_dtw via SQL") {
    val out = spark.sql(
      "SELECT graft_dtw(array(1L, 2L, 3L), array(1L, 2L, 2L, 3L)) AS d," +
        " graft_dtw(array(0L, 0L, 0L), array(1L, 1L)) AS f").head()
    assert(out.getLong(0) == 0L && out.getLong(1) == 3L)
  }

  test("graft_theta sketch/set-ops via SQL") {
    import spark.implicits._
    (Seq.tabulate(50)(i => ("a", i.toLong)) ++ Seq.tabulate(50)(i => ("b", (i + 30).toLong)))
      .toDF("g", "v").createOrReplaceTempView("theta_in")
    spark.sql("SELECT g, graft_theta_sketch(v, 12) AS sk FROM theta_in GROUP BY g")
      .createOrReplaceTempView("theta_cube")
    val out = spark.sql(
      """SELECT CAST(graft_theta_estimate(graft_theta_intersect(a.sk, b.sk)) AS BIGINT) AS n_both,
                CAST(graft_theta_estimate(graft_theta_anotb(a.sk, b.sk)) AS BIGINT) AS a_only,
                CAST(graft_theta_estimate(graft_theta_union_pair(a.sk, b.sk)) AS BIGINT) AS either
         FROM (SELECT sk FROM theta_cube WHERE g = 'a') a,
              (SELECT sk FROM theta_cube WHERE g = 'b') b""").head()
    assert(out.getLong(0) == 20L && out.getLong(1) == 30L && out.getLong(2) == 80L)
  }
}
