package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution against a canonical list.
  *
  * Reference utils.py:434 `find_best_match` / utils.py:462 `match_org_unit_chu`:
  * fuzzywuzzy `extractOne` of a name against the canonical org-unit list with
  * a score threshold — a Python loop per input name.
  *
  * graft shape: broadcast the (small) canonical list, evaluate a codegen'd
  * similarity expression over the broadcast product, then reduce to the best
  * candidate per input key with a `min_by(payload, (-sim, cand))` hash
  * aggregate. The aggregate is partial (map-side combine), so the shuffle
  * carries ONE row per input key per partition — never the |facts| x
  * |candidates| scored rows a window formulation would move — and duplicate
  * input keys aggregate instead of silently collapsing by whole-row value.
  */
object FuzzyMatch {

  /** Normalized Levenshtein similarity in [0,1]: 1 - dist/maxLen. */
  def levenshteinSim(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") / greatest(length(a), length(b)).cast("double")

  /** All pairs within Levenshtein distance `maxDist` between two tables —
    * WITHOUT a cartesian product and WITHOUT broadcasting either side: the
    * SymSpell reduction (each side explodes to its deletion-neighborhood
    * variants; strings within distance d provably share a depth-d variant),
    * so candidate generation is a co-partitioned equi-join on variant
    * strings, then an exact `levenshtein` verify. This is the fuzzy join
    * that scales when BOTH sides are fact-sized — [[bestMatch]]'s broadcast
    * scorer needs a dimension-sized candidate list.
    *
    * Output: (left id, right id, left value, right value, dist). */
  def editDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftCol: String,
      rightId: String,
      rightCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist must be 1 or 2, got $maxDist")
    def exploded(df: DataFrame, id: String, v: String, idAs: String, vAs: String): DataFrame =
      df.select(
        col(id).as(idAs),
        col(v).as(vAs),
        explode(graft.functions.deletion_neighborhood(col(v), maxDist)).as("__variant"))
    exploded(left, leftId, leftCol, "left_id", "left_val")
      .join(exploded(right, rightId, rightCol, "right_id", "right_val"), Seq("__variant"))
      .select("left_id", "left_val", "right_id", "right_val")
      .dropDuplicates("left_id", "right_id")
      .withColumn("dist", levenshtein(col("left_val"), col("right_val")))
      .filter(col("dist") <= maxDist)
  }

  /** For each distinct key of `df`, the best `candidates` row by `sim` (ties
    * broken by candidate value ascending), keeping matches with
    * `sim >= threshold` (keys with no candidate above it are dropped, like
    * the reference's thresholded extractOne). Non-key columns are carried
    * from the winning row.
    *
    * @param df          input rows; `queryCol` is the dirty name
    * @param keyCols     columns identifying an input entity (e.g. its id) —
    *                    the aggregate reduces to one output row per key
    * @param candidates  canonical list; must be broadcast-small
    * @param candCol     canonical name column
    * @param sim         (query, candidate) => similarity Column in [0,1]
    */
  def bestMatch(
      df: DataFrame,
      keyCols: Seq[String],
      queryCol: String,
      candidates: DataFrame,
      candCol: String,
      sim: (Column, Column) => Column = levenshteinSim,
      threshold: Double = 0.0): DataFrame = {
    val carryCols = df.columns.toSeq.filterNot(keyCols.contains)
    val scored = df
      .join(broadcast(candidates.select(col(candCol).as("__cand"))))
      .withColumn("__sim", sim(col(queryCol), col("__cand")))
      .filter(col("__sim") >= threshold)
    // min_by over (-sim, cand): max similarity, ties to the lexicographically
    // smallest candidate — a declarative aggregate with a partial phase
    val payload = struct(
      carryCols.map(col) ++ Seq(col("__cand").as("matched"), col("__sim").as("match_score")): _*)
    scored
      .groupBy(keyCols.map(col): _*)
      .agg(min_by(payload, struct((-col("__sim")).as("s"), col("__cand"))).as("__best"))
      .select(
        keyCols.map(col) ++
          carryCols.map(n => col(s"__best.$n").as(n)) ++
          Seq(col("__best.matched").as("matched"), col("__best.match_score").as("match_score")): _*)
  }

  /** One comparison field of a probabilistic linkage: `agreeCol` is a
    * boolean agreement column already present on the pair, `m` the
    * probability it agrees on a TRUE match, `u` on a random non-match. */
  final case class LinkageField(agreeCol: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m/u must be in (0,1), got ($m, $u)")
  }

  /** Fellegi–Sunter probabilistic record-linkage scoring (JASA 1969) — the
    * decision layer over blocked candidate pairs that classical fuzzy
    * matching lacks: each field contributes `log2(m/u)` on agreement and
    * `log2((1−m)/(1−u))` on disagreement, the total weight thresholds into
    * match / possible / non_match. A pure projection over the pair table
    * (the expensive part — blocking — is the caller's equi-join, same
    * candidate-generation discipline as everything else here). Per-field
    * weights are constant-folded literals ROUNDED AT 6 dp before the sum,
    * so total weights are exact sums of identical decimal literals on any
    * engine. Appends (link_weight, link_class). */
  def linkageScore(
      pairs: DataFrame,
      fields: Seq[LinkageField],
      upper: Double,
      lower: Double): DataFrame = {
    require(fields.nonEmpty, "linkageScore needs at least one field")
    require(upper >= lower, s"upper ($upper) must be >= lower ($lower)")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val weight = fields.map { f =>
      val aw = r6(math.log(f.m / f.u) / math.log(2.0))
      val dw = r6(math.log((1 - f.m) / (1 - f.u)) / math.log(2.0))
      when(col(f.agreeCol), lit(aw)).otherwise(lit(dw))
    }.reduce(_ + _)
    pairs
      .withColumn("link_weight", round(weight, 6))
      .withColumn(
        "link_class",
        when(col("link_weight") >= upper, "match")
          .when(col("link_weight") >= lower, "possible")
          .otherwise("non_match"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the classic
    * O(n·w) candidate generator for record linkage: sort the corpus by a
    * fuzzy key, pair every record with its next `window−1` neighbors in
    * that order. Scale shape: the global total order comes from
    * [[Relational.globalRowNumbers]] (range partition + per-partition
    * index — NO single-partition window), and the neighbor pairing is an
    * EQUI-join on a rank bucket of width `window−1` (each left row probes
    * its own bucket and the next one — ×2 replication instead of a range
    * join), filtered to 1 ≤ dist ≤ window−1. Ties in the sort key break by
    * id, so the pair set is deterministic on any engine and partitioning.
    *
    * Returns (id1, id2, dist) with id1 the earlier record in sort order —
    * feed the pairs to [[linkageScore]] after joining attributes back. */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      sortCols: Seq[String],
      window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val gap = (window - 1).toLong
    val ranked = Relational.globalRowNumbers(
      df.select(col(idCol) +: sortCols.map(col): _*),
      sortCols.map(col) :+ col(idCol),
      rowNumCol = "__rn")
    val a = ranked.select(col(idCol).as("id1"), col("__rn").as("__ra"))
      .withColumn("__bk", explode(array(
        expr(s"__ra div $gap"), expr(s"__ra div $gap") + 1)))
    val b = ranked.select(col(idCol).as("id2"), col("__rn").as("__rb"))
      .withColumn("__bk", expr(s"__rb div $gap"))
    // each right row owns ONE bucket and each left row probes two DISTINCT
    // buckets, so the join emits every qualifying pair exactly once — no
    // dedup pass needed
    a.join(b, "__bk")
      .filter((col("__rb") - col("__ra")).between(1L, gap))
      .select(col("id1"), col("id2"), (col("__rb") - col("__ra")).as("dist"))
  }

  /** Portable American Soundex — the classic phonetic BLOCKING key of
    * record linkage (same sound, different spelling ⇒ same block), built
    * as a pure codegen'd column chain so ANY engine derives the identical
    * code: strip non-letters, translate letters to digit codes (H/W → 7),
    * collapse same-code-across-H/W runs, drop the 7s, collapse adjacent
    * repeats, drop the first letter's own code and the vowel 0s, then
    * letter + first 3 digits zero-padded. Each collapse is a chain of
    * per-digit `d7+d` / `dd+` replaces — NO regex backreferences, because
    * RE2-based engines (DuckDB et al.) don't support them, and the whole
    * point of this variant over the JVM-private builtin is that the SQL
    * oracle replays it verbatim. Deviations from `soundex()` are
    * documented contract: non-letters are stripped BEFORE coding (the
    * builtin resets its run state on them), and all-non-letter input
    * yields NULL (the builtin echoes the input).
    *
    * NARA classics pinned in spec: Tymczak→T522, Pfister→P236,
    * Honeyman→H555, Robert/Rupert→R163. */
  def soundexCode(c: Column): Column = {
    val letters = upper(regexp_replace(c, "[^A-Za-z]", ""))
    val full = translate(letters,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230127022455012623017202")
    val hw = (1 to 6).foldLeft(full)((s, d) =>
      regexp_replace(s, s"${d}7+$d", d.toString))
    val no7 = regexp_replace(hw, "7", "")
    val dedup = (0 to 6).foldLeft(no7)((s, d) =>
      regexp_replace(s, s"$d$d+", d.toString))
    // the first letter's code leads the string unless it was an H/W (a 7,
    // already dropped) — peel exactly that one code before the readout
    val tail = when(substring(full, 1, 1) === "7", dedup)
      .otherwise(substring(dedup, 2, 1000000))
    val digits = regexp_replace(tail, "0", "")
    when(length(letters) > 0,
      concat(substring(letters, 1, 1), rpad(substring(digits, 1, 3), 3, "0")))
  }

  /** Phonetic blocked join: equi-join `left` and `right` on the
    * [[soundexCode]] of their name columns — the O(n) blocking pass that
    * replaces the quadratic all-pairs comparison in a linkage pipeline
    * (compose with [[linkageScore]] downstream). A plain co-partitioned
    * hash join on a 4-char key.
    *
    * Block skew is NOT bounded by the phonetic alphabet alone: real-world
    * name columns concentrate on degenerate codes (empty/short names all
    * soundex alike), and the join's cost is Σ|block_L|·|block_R| — one hot
    * code goes quadratic at scale. `maxBlock` therefore routes BOTH sides
    * through [[Relational.capGroupSize]] on the soundex key before the
    * join: any block larger than `maxBlock` rows on either side is dropped
    * whole (a block that big is phonetically meaningless for linkage
    * anyway), with the dropped-group counts logged to stderr. The default
    * is generous — at 10k rows/side a single block is 10^8 comparisons;
    * pass None only when the name distribution is known clean. */
  def phoneticBlockJoin(
      left: DataFrame,
      right: DataFrame,
      leftName: String,
      rightName: String,
      maxBlock: Option[Long] = Some(10000L)): DataFrame = {
    def side(df: DataFrame, name: String): DataFrame = {
      val keyed = df.withColumn("soundex_key", soundexCode(col(name)))
        .filter(col("soundex_key").isNotNull)
      maxBlock.fold(keyed)(m => Relational.capGroupSize(keyed, Seq("soundex_key"), m))
    }
    side(left, leftName).join(side(right, rightName), "soundex_key")
  }
}
