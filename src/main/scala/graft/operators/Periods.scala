package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Period calculus: the reference's trimester/month/period handling. */
object Periods {

  /** `"YYYYMM"` string -> first-of-month DATE.
    * Reference utils.py:386 (`strptime "%Y%m"` then cast to Date). */
  def periodToDate(period: Column): Column =
    to_date(concat(period.cast("string"), lit("01")), "yyyyMMdd")

  /** Trimester label -> its three `YYYYMM` periods.
    * Reference pipeline.py:380 `generate_extraction_periods`. */
  def trimesterMonths(year: Int, trimester: Int): Seq[String] = {
    require(trimester >= 1 && trimester <= 4, s"invalid trimester $trimester")
    val start = (trimester - 1) * 3 + 1
    (start until start + 3).map(m => f"$year%04d$m%02d")
  }

  /** Replicate each row once per quarter-end suffix, rewriting `periodCol`
    * from the year-end period to each quarter's period.
    *
    * Reference pipeline.py:241-256: NAOMI yearly data is cross-joined with
    * the quarter suffixes present in the extraction window. Implemented as
    * `explode` over a literal array — a narrow Generate node (no join, no
    * shuffle, no broadcast needed), which is the plan you want when fanning
    * out 100 TB by a tiny constant factor.
    */
  def replicateQuarters(df: DataFrame, periodCol: String, year: Int, suffixes: Seq[String]): DataFrame =
    df.withColumn("__suffix", explode(array(suffixes.map(lit): _*)))
      .withColumn(
        periodCol,
        regexp_replace(col(periodCol), lit(s"${year}12"), concat(lit(year.toString), col("__suffix"))))
      .drop("__suffix")

  /** Prorate an interval-scoped value across the calendar months it spans
    * (revenue recognition / budget spreading): each [start, end] DATE
    * interval (closed, inclusive) explodes to its month spine — a narrow
    * Generate over `sequence()`, no join, no shuffle — and the value splits
    * by day-count overlap. The per-month shares are exact integer-day
    * ratios, so they re-sum to the original value up to rounding. */
  def prorateByMonth(
      df: DataFrame,
      startCol: String,
      endCol: String,
      valueCol: String): DataFrame = {
    val s = col(startCol).cast("date")
    val e = col(endCol).cast("date")
    val totalDays = (datediff(e, s) + 1).cast("double")
    val monthStart = col("__month")
    val monthEnd = last_day(col("__month"))
    val overlap =
      (datediff(least(e, monthEnd), greatest(s, monthStart)) + 1).cast("double")
    df
      .withColumn(
        "__month",
        explode(sequence(trunc(s, "month"), trunc(e, "month"), expr("INTERVAL 1 MONTH"))))
      .withColumn("month", col("__month"))
      .withColumn("overlap_days", overlap.cast("long"))
      .withColumn(
        "prorated",
        col(valueCol).cast("double") * overlap / totalDays)
      .drop("__month")
  }

  /** Rolling 6-month window bounds keyed to a quarter end — reference
    * extract_pec_data.py:193-198 `periods_map`. */
  def sixMonthWindow(year: Int, quarterSuffix: String): (String, String) = quarterSuffix match {
    case "03" => (s"${year - 1}10", s"${year}03")
    case "06" => (s"${year}01", s"${year}06")
    case "09" => (s"${year}04", s"${year}09")
    case "12" => (s"${year}07", s"${year}12")
    case other => throw new IllegalArgumentException(s"not a quarter suffix: $other")
  }
}
