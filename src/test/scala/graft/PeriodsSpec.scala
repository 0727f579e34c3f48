package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Periods

class PeriodsSpec extends SparkSpec {
  import spark.implicits._

  test("periodToDate parses YYYYMM to first-of-month") {
    val out = Seq("202403", "199912").toDF("p")
      .select(Periods.periodToDate(col("p")).as("d"))
      .orderBy("d")
      .collect()
    assert(out(0).getDate(0) == Date.valueOf("1999-12-01"))
    assert(out(1).getDate(0) == Date.valueOf("2024-03-01"))
  }

  test("trimesterMonths expands a trimester to its three periods") {
    assert(Periods.trimesterMonths(2024, 1) == Seq("202401", "202402", "202403"))
    assert(Periods.trimesterMonths(2024, 4) == Seq("202410", "202411", "202412"))
    intercept[IllegalArgumentException](Periods.trimesterMonths(2024, 5))
  }

  test("replicateQuarters fans each year-end row out to all quarters") {
    val df = Seq((1L, "202412")).toDF("id", "period")
    val out = Periods.replicateQuarters(df, "period", 2024, Seq("03", "06", "09", "12"))
      .orderBy("period")
      .collect()
    assert(out.map(_.getString(1)).toSeq == Seq("202403", "202406", "202409", "202412"))
  }

  test("prorateByMonth splits value by day overlap and re-sums exactly") {
    // Jan 20 .. Mar 10 (closed): 12 days Jan, 29 days Feb (2024 leap), 10 days Mar = 51
    val df = Seq((1L, Date.valueOf("2024-01-20"), Date.valueOf("2024-03-10"), 510.0))
      .toDF("id", "s", "e", "v")
    val out = Periods.prorateByMonth(df, "s", "e", "v")
      .orderBy("month").collect()
      .map(r => (r.getAs[Date]("month").toString, r.getAs[Long]("overlap_days"), r.getAs[Double]("prorated")))
    assert(out.toSeq == Seq(
      ("2024-01-01", 12L, 120.0),
      ("2024-02-01", 29L, 290.0),
      ("2024-03-01", 10L, 100.0)))
    // single-month interval keeps everything
    val one = Periods.prorateByMonth(
      Seq((2L, Date.valueOf("2024-05-05"), Date.valueOf("2024-05-09"), 42.0)).toDF("id", "s", "e", "v"),
      "s", "e", "v").collect()
    assert(one.length == 1 && one(0).getAs[Double]("prorated") == 42.0)
  }

  test("sixMonthWindow bounds are keyed to the quarter end") {
    assert(Periods.sixMonthWindow(2024, "03") == ("202310", "202403"))
    assert(Periods.sixMonthWindow(2024, "12") == ("202407", "202412"))
    intercept[IllegalArgumentException](Periods.sixMonthWindow(2024, "05"))
  }
}
