package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/statistical summaries — the sketch family a 100 TB pipeline
  * leans on when exact answers would shuffle the world.
  *
  * Everything here is a thin, named wrapper over Spark's built-in sketch
  * aggregates (HyperLogLog++, GK quantiles): they are already partial
  * (map-side combined), mergeable, and codegen'd — re-implementing them
  * would only lose those properties.
  */
object Sketches {

  /** Approximate distinct count (HyperLogLog++) per group.
    * `rsd` = target relative standard deviation. */
  def approxDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** Exact distinct count per group, for sketch-error measurement. */
  def exactDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("exact_distinct"))

  /** Approximate quantiles (Greenwald-Khanna) per group; accuracy is
    * 1/`relativeError`. */
  def approxQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probabilities: Seq[Double],
      relativeError: Double = 0.01): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile_approx(
          col(valueCol),
          array(probabilities.map(lit): _*),
          lit((1.0 / relativeError).toInt)).as("approx_quantiles"))

  /** Exact interpolated percentiles aggregate (SQL `percentile`): the
    * oracle-checkable twin of [[approxQuantiles]]. Exact percentile sorts
    * within groups — use the approx variant when groups are huge. */
  def exactPercentiles(valueCol: String, probabilities: Seq[Double]): Column =
    percentile(col(valueCol), array(probabilities.map(lit): _*))
}
