package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model TRAINING loops — the distributed fitting step of the
  * pipeline families whose scoring side already exists (target encoding,
  * DSIR, perplexity, conformal): fixed iteration schedules over partial
  * aggregates, weights quantized so every engine replays the fit
  * bit-for-bit. */
object Models {

  /** Distributed logistic regression by a FIXED quantized batch
    * gradient-descent schedule — the in-engine propensity/quality
    * classifier (the fit half the scoring operators assume): an intercept
    * plus the caller's pre-scaled features, `iterations` full-batch GD
    * steps at rate `lr`.
    *
    * PageRank's iteration discipline applied to model fitting: weights
    * STORE as 1e-9-unit longs on the driver (k+1 scalars — domain-bounded
    * by contract); each step is ONE partial aggregate computing all
    * gradient components, with per-row terms floor((p−y)·x_j·1e6+0.5)
    * summed as exact longs, and the update
    * w_q ← w_q − floor(lr·g_q·1000/n + 0.5) an identical double chain in
    * any engine — so the whole fit is bit-identical across partitionings
    * and replayable in SQL as unrolled CTEs. Per-iteration cost: one scan
    * + one k-column partial agg; nothing but 1-row results ever moves.
    *
    * Features must be pre-scaled to O(1) (the caller's contract — |z|
    * then stays in exp's well-conditioned range and p never saturates to
    * an exact 0/1, which would make the log-loss readout infinite).
    * Labels are booleans.
    *
    * Returns ONE row: (n, w0 … wk as 1e-9-exact doubles — w0 the
    * intercept, then `featureCols` order — log_loss, accuracy). */
  def logisticRegression(
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      iterations: Int = 8,
      lr: Double = 0.5): DataFrame = {
    require(featureCols.nonEmpty, "at least one feature required")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(lr > 0, s"lr must be > 0, got $lr")
    val k = featureCols.length + 1
    val base = df.select(
      when(col(labelCol), 1.0).otherwise(0.0).as("__y") +:
        (lit(1.0) +: featureCols.map(c => col(c).cast("double")))
          .zipWithIndex.map { case (f, j) => f.as(s"__x$j") }: _*)
    val n = base.count()
    require(n > 0, "cannot fit on an empty DataFrame")
    var wq = Array.fill(k)(0L)
    def z: Column = (0 until k)
      .map(j => lit(wq(j) / 1e9) * col(s"__x$j"))
      .reduceLeft(_ + _)
    def p: Column = lit(1.0) / (lit(1.0) + exp(-z))
    for (_ <- 1 to iterations) {
      val g = base.agg(
        sum(floor((p - col("__y")) * col("__x0") * 1e6 + 0.5).cast("long")).as("g0"),
        (1 until k).map(j =>
          sum(floor((p - col("__y")) * col(s"__x$j") * 1e6 + 0.5).cast("long")).as(s"g$j")): _*)
        .head()
      wq = wq.zipWithIndex.map { case (w, j) =>
        w - math.floor(lr * g.getLong(j) * 1000.0 / n + 0.5).toLong
      }
    }
    val metrics = base.agg(
      count(lit(1)).as("n"),
      sum(floor(when(col("__y") === 1.0, log(p)).otherwise(log(lit(1.0) - p))
        * 1e6 + 0.5).cast("long")).as("__ll"),
      sum(when((p >= 0.5).cast("double") === col("__y"), 1L).otherwise(0L)).as("__ok"))
    metrics.select(
      col("n") +:
        (0 until k).map(j => lit(wq(j) / 1e9).as(s"w$j")) :+
        (-col("__ll").cast("double") / 1e6 / col("n").cast("double")).as("log_loss") :+
        (col("__ok").cast("double") / col("n").cast("double")).as("accuracy"): _*)
  }
}
