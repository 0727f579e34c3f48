package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered event-funnel analytics over an event log (the product-analytics
  * staple: how many users progressed signup → activation → purchase). */
object Funnel {

  /** Greedy ordered funnel: a user reaches step i when, scanning their
    * events in time order, an event of type `steps(i)` occurs at-or-after
    * the moment steps 0..i-1 completed. The greedy earliest-completion scan
    * is exact for reachability (completing a prefix as early as possible
    * never forfeits a later step).
    *
    * Shape: ONE partial hash aggregate collects each user's step-relevant
    * events (bounded by per-user activity, not corpus size — the same
    * contract as sessionization), the per-user scan is a codegen'd
    * `aggregate` fold over the sorted array, and the final step counts
    * reduce to a single row unpivoted with a narrow explode. No window, no
    * iterated self-joins — at 100 TB the only shuffle is the per-user
    * aggregate. Ties (same user, same timestamp, different types) resolve
    * by (ts, type) struct order in the sort.
    *
    * Returns (step_idx, step, n_users) — n_users reaching each step. */
  def funnel(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val perUser = df
      .filter(col(typeCol).isin(steps: _*))
      .select(
        col(userCol),
        struct(col(tsCol).as("ts"), col(typeCol).as("et")).as("__e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
    val depth = aggregate(
      col("__evs"),
      lit(0),
      (d, e) =>
        steps.zipWithIndex
          .foldLeft(when(lit(false), d)) { case (acc, (s, i)) =>
            acc.when(d === i && e("et") === s, i + 1)
          }
          .otherwise(d))
    depthCounts(perUser.select(depth.as("__depth")), steps)
  }

  /** Reduce per-user reached depths (column `__depth`) to one row per funnel
    * step with the user count that reached it — shared by the batch fold
    * above and the streaming state-machine twin
    * ([[graft.streaming.Events.funnelStream]]). */
  private[graft] def depthCounts(depths: DataFrame, steps: Seq[String]): DataFrame = {
    val stepReach = steps.indices.map(i =>
      sum(when(col("__depth") >= i + 1, 1L).otherwise(0L)).as(s"__r$i"))
    depths
      .agg(stepReach.head, stepReach.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(
          lit(i + 1).as("step_idx"),
          lit(s).as("step"),
          col(s"__r$i").as("n_users"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
  }
}
