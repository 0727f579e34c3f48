package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution against a canonical list.
  *
  * Reference utils.py:434 `find_best_match` / utils.py:462 `match_org_unit_chu`:
  * fuzzywuzzy `extractOne` of a name against the canonical org-unit list with
  * a score threshold — a Python loop per input name.
  *
  * graft shape: broadcast the (small) canonical list, evaluate a codegen'd
  * similarity expression over the cross product, argmax per input row via a
  * window. Facts never shuffle for the candidate generation; the only
  * shuffle is the per-key argmax, which AQE sizes.
  */
object FuzzyMatch {

  /** Normalized Levenshtein similarity in [0,1]: 1 - dist/maxLen. */
  def levenshteinSim(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") / greatest(length(a), length(b)).cast("double")

  /** For each row of `df`, the best `candidates` row by `sim` (ties broken by
    * candidate key ascending), keeping matches with `sim >= threshold`.
    *
    * @param df          input rows; `queryCol` is the dirty name
    * @param candidates  canonical list; must be broadcast-small
    * @param candCol     canonical name column
    * @param sim         (query, candidate) => similarity Column in [0,1]
    */
  def bestMatch(
      df: DataFrame,
      queryCol: String,
      candidates: DataFrame,
      candCol: String,
      sim: (Column, Column) => Column = levenshteinSim,
      threshold: Double = 0.0): DataFrame = {
    val keyCols = df.columns.map(col).toSeq
    val joined = df
      .join(broadcast(candidates.select(col(candCol).as("__cand"))))
      .withColumn("__sim", sim(col(queryCol), col("__cand")))
      .filter(col("__sim") >= threshold)
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__sim").desc, col("__cand").asc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed("__cand", "matched")
      .withColumnRenamed("__sim", "match_score")
  }
}
