package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Customer/entity segmentation scores — the RFM family (recency /
  * frequency / monetary quintiles, the classic direct-marketing
  * segmentation; public knowledge, e.g. Hughes, *Strategic Database
  * Marketing*).
  *
  * The naive formulation is `ntile(5) OVER (ORDER BY metric)` — a global
  * single-partition sort AND tie-order-dependent (ntile splits equal
  * values by arbitrary row order, so two runs can disagree). Both problems
  * fall away by scoring off the ECDF instead: bucket = ⌈B·cum/n⌉ where
  * `cum` counts rows with value <= v. That is (a) tie-stable — equal
  * values always land in the same bucket, (b) exact integer arithmetic end
  * to end, and (c) scalable — the ordered window runs on the DISTINCT
  * value histogram (bounded by the metric's resolution; quantize upstream
  * if the metric is continuous), then broadcasts back.
  */
object Segments {

  /** Attach `scoreCol` ∈ 1..buckets to every row: the ECDF bucket of
    * `metricCol`, computed as ceil(buckets·cum/n) in exact integer
    * arithmetic (`(b·cum + n − 1) div n` — never a float boundary).
    * `descending=true` flips the scale (lowest metric → highest score),
    * the right orientation for recency.
    */
  def ecdfScore(
      df: DataFrame,
      metricCol: String,
      scoreCol: String,
      buckets: Int = 5,
      descending: Boolean = false): DataFrame =
    df.join(
      broadcast(ecdfScoreMap(df, metricCol, scoreCol, buckets, descending)),
      Seq(metricCol))

  /** The metric → score mapping behind [[ecdfScore]] (one row per DISTINCT
    * metric value), exposed so a caller scoring several metrics of the SAME
    * frame can derive every map from one shared input and attach them with
    * broadcast joins, instead of chaining ecdfScore calls whose histograms
    * re-derive the whole upstream per metric (r14: q_rfm's chained fold
    * carried 138 Exchanges; scoring off one materialized aggregate carries
    * 4). */
  def ecdfScoreMap(
      df: DataFrame,
      metricCol: String,
      scoreCol: String,
      buckets: Int = 5,
      descending: Boolean = false): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val hist = df.groupBy(col(metricCol)).agg(count(lit(1)).as("__c"))
    // the histogram's cumulative counts run partition-parallel (X145's
    // two-pass prefix) — no single-partition window at any cardinality
    val cdf = Relational.globalRunningSum(hist, Seq(col(metricCol)), "__c", "__cum")
      .crossJoin(broadcast(hist.agg(sum(col("__c")).as("__n"))))
    val cum = col("__cum")
    val n = col("__n")
    // exact ceil-division on longs; quotient can never sit within a float
    // ulp of the wrong integer because everything stays integral
    val asc = floor((lit(buckets.toLong) * cum + n - lit(1L)) / n).cast("int")
    val score = if (descending) lit(buckets + 1) - asc else asc
    cdf.select(col(metricCol), score.as(scoreCol))
  }

  /** Full RFM readout from an order log: per entity, recency (days since
    * last order, measured from the max order date in the log), frequency
    * (order count), monetary (exact quantized sum), and 1..5 ECDF quintile
    * scores for each (recency scored descending — recent = 5).
    *
    * One aggregate to entity grain, three histogram broadcasts back —
    * the fact table shuffles once.
    */
  def rfm(
      orders: DataFrame,
      entityCol: String,
      dateCol: String,
      amountCentsCol: String): DataFrame = {
    val asOf = orders.agg(max(col(dateCol).cast("date")).as("__as_of"))
    val perEntity = orders
      .groupBy(col(entityCol))
      .agg(
        max(col(dateCol).cast("date")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(amountCentsCol).cast("long")).as("monetary_cents"))
      .crossJoin(broadcast(asOf))
      .withColumn("recency_days", datediff(col("__as_of"), col("__last")).cast("long"))
      .drop("__as_of", "__last")
    // materialize the entity aggregate once (lazy, inside this query's own
    // execution): all three score maps AND the probe side read it, and a
    // chained ecdfScore fold re-derived the whole orders aggregate per
    // histogram (r14: 138 Exchanges → 4). Entity grain, so holding it is
    // bounded by the entity count, not the order log.
    val entities = perEntity.localCheckpoint(false)
    // score maps derive from the SAME frame (attached score columns never
    // change a metric's value multiset, so scoring from `entities` is
    // value-identical to the old chained fold)
    val scored = Seq(
      ("recency_days", "r_score", true),
      ("frequency", "f_score", false),
      ("monetary_cents", "m_score", false))
      .foldLeft(entities) { case (acc, (m, s, desc)) =>
        acc.join(
          broadcast(ecdfScoreMap(entities, m, s, buckets = 5, descending = desc)),
          Seq(m))
      }
    scored.withColumn(
      "rfm",
      concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string")))
  }

  /** Pareto / ABC inventory classification (Dickie 1951, the 80/15/5
    * rule): items ranked by `valueCentsCol` descending, class A while the
    * running share of total value stays ≤ `aPct`%, B while ≤ `bPct`%, C
    * for the tail. The boundary test is an exact integer cross-multiply —
    * `cum·100 ≤ total·pct` on decimal(38,0), never a float share — so an
    * item sitting exactly on the 80% line classifies identically on every
    * engine and every partitioning.
    *
    * The descending running sum rides [[Relational.globalRunningSum]]'s
    * two-pass prefix (range partition → local window → broadcast partition
    * offsets): no single-partition global window at any item cardinality.
    * `keyCols` break ties between equal-valued items so the cumulative
    * order is total. */
  def abcClasses(
      items: DataFrame,
      keyCols: Seq[String],
      valueCentsCol: String,
      aPct: Int = 80,
      bPct: Int = 95): DataFrame = {
    require(aPct > 0 && aPct < bPct && bPct < 100,
      s"need 0 < aPct < bPct < 100, got aPct=$aPct bPct=$bPct")
    val order = col(valueCentsCol).desc +: keyCols.map(col(_).asc)
    val cum = Relational.globalRunningSum(
      items, order, valueCentsCol, "cum_cents")
    val total = items.agg(sum(col(valueCentsCol).cast("long")).as("__total"))
    val c100 = col("cum_cents").cast("decimal(38,0)") * 100
    val t = col("__total").cast("decimal(38,0)")
    cum.crossJoin(broadcast(total))
      .withColumn("abc_class",
        when(c100 <= t * aPct, "A")
          .when(c100 <= t * bPct, "B")
          .otherwise("C"))
      .drop("__total")
  }
}
