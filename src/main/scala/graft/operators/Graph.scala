package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as repeated co-partitioned joins — the
  * "iterate a join + partial agg to a fixed point" family
  * ([[Dedup.clusters]] is the min-label instance; this is the weighted
  * one).
  */
object Graph {

  /** Fixed-iteration PageRank (Brin & Page 1998, the classic
    * `0.15 + 0.85 · Σ rank(u)/outdeg(u)` form) over a DIRECTED edge list —
    * symmetrize first for an undirected graph. Each iteration is one
    * edges⋈ranks co-partitioned join + one partial aggregate by
    * destination, with `localCheckpoint` truncating lineage per round —
    * the same scale shape as connected components, never a
    * matrix/cartesian.
    *
    * ENGINE-DETERMINISTIC by the quantized-long recipe: per-edge
    * contributions quantize to exact 1e-12ths (longs) before the
    * order-dependent sum, and each iteration's rank re-quantizes at 1e-9
    * through the identical floor(x·s + 0.5) primitive — so any engine
    * (and any partitioning) lands on bit-identical ranks, which is what
    * lets a SQL oracle replay the iteration exactly.
    *
    * @param edges    (srcCol, dstCol) rows; every node must appear as a
    *                 source at least once (no dangling-node redistribution
    *                 — symmetrized graphs satisfy this by construction)
    * @return (id, rank) — one row per node
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v"))
    val deg = e.groupBy(col("__u").as("id")).agg(count(lit(1)).as("__outdeg"))
      .localCheckpoint(true)
    // outdeg folded into the edge table ONCE — each iteration then costs a
    // single ranks join + partial agg instead of re-joining deg (and
    // re-scanning the edge source) every round
    val eDeg = e.join(deg.select(col("id").as("__u"), col("__outdeg")), "__u")
      .localCheckpoint(true)
    var ranks = deg.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("id", "__u"), "__u")
        .select(
          col("__v").as("id"),
          floor(col("rank") / col("__outdeg") * 1e12 + 0.5).cast("long").as("__cq"))
        .groupBy(col("id"))
        .agg(sum(col("__cq")).as("__s"))
      ranks = deg
        .join(contribs, Seq("id"), "left")
        .select(
          col("id"),
          (floor(
            (lit(1.0 - damping) + lit(damping) *
              (coalesce(col("__s"), lit(0L)).cast("double") / 1e12)) * 1e9 + 0.5) / 1e9)
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
