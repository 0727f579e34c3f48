package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative-filtering predictors beyond the co-occurrence/cosine
  * readouts (q_copurchase / q_item_cosine live in SparkEntry).
  *
  * The reference's integration surface has no recommender, but a
  * training-data platform curates interaction logs; Slope One is the
  * canonical "predict the missing cell" baseline that stays EXACT-RATIONAL
  * end to end — which is what lets it hash-gate cross-engine where matrix
  * factorization never could.
  */
object Recommend {

  /** Weighted Slope One (Lemire & Maclachlan 2005): for items i, j the
    * deviation dev(j,i) = Σ_u (r_uj − r_ui) / c_ji over co-raters, and the
    * prediction for user u's unrated item j is
    * P(u,j) = Σ_{i∈S(u)} (D_ji + r_ui·c_ji) / Σ c_ji
    * — note the re-association: keeping the raw deviation SUM D_ji (exact
    * long) instead of the per-pair ratio makes the entire prediction ONE
    * division of exact integers, bit-identical on any engine.
    *
    * Shapes: one per-user self-join builds the deviation matrix (bounded
    * by the item domain² when items are categories; cap user baskets
    * upstream for open item domains), one join of each user's ratings
    * against the deviation matrix + a partial agg predicts every missing
    * cell, existing cells leave by anti-join.
    *
    * @param ratings (userCol, itemCol, valueCol) — one row per cell,
    *                valueCol integral (quantize upstream)
    * @return (user, item, n_pairs, prediction) for unrated cells with
    *         at least one co-rated neighbor item
    */
  def slopeOne(
      ratings: DataFrame,
      userCol: String,
      itemCol: String,
      valueCol: String,
      dp: Int = 6): DataFrame = {
    val r = ratings.select(
      col(userCol).as("__u"), col(itemCol).as("__i"),
      col(valueCol).cast("long").as("__r"))
    val dev = r
      .join(r.select(col("__u"), col("__i").as("__j"), col("__r").as("__rj")),
        Seq("__u"))
      .filter(col("__i") =!= col("__j"))
      .groupBy(col("__j"), col("__i"))
      .agg(sum(col("__rj") - col("__r")).as("__D"), count(lit(1)).as("__c"))
    val pred = r
      .join(dev, Seq("__i"))
      .groupBy(col("__u"), col("__j"))
      .agg(
        sum(col("__c")).as("__den"),
        sum(col("__D") + col("__r") * col("__c")).as("__num"))
      .join(r.select(col("__u"), col("__i").as("__j")), Seq("__u", "__j"),
        "left_anti")
    pred.select(
      col("__u").as(userCol), col("__j").as(itemCol),
      col("__den").as("n_pairs"),
      round(col("__num").cast("double") / col("__den").cast("double"), dp)
        .as("prediction"))
  }
}
