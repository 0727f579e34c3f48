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
}
